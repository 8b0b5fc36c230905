"""Synthetic Common-Crawl-style pages table (BASELINE.json input_hint).

Schema exactly ``(url string, warc_ts timestamp, html binary,
text string, lang string)``. Rows are generated fully deterministically
and *distributed* — ``spark.range(n)`` partitions the id space and each
row is a pure function of its id, so synthesis scales linearly with
executors and never funnels through the driver (the sandbox stand-in
for reading a 10^12-row Iceberg table).

Each page's ``text`` embeds exactly one ``located at <lat>, <lon>``
coordinate pair; device positions replicate the golden-fixture
neighborhood (FIXTURES.md §8) across a lat/lon grid with a
deliberately hot cell (10% of points in one cell) to exercise skew
handling. Floats are rendered with Python ``repr`` semantics (shortest
round-trip), so geoparse recovers the exact doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

# golden neighborhood (Brattleboro, VT — runtime_test.go coordinates),
# offset to grid-cell centers so the hot cluster doesn't straddle a
# cell boundary
BASE_LAT = 42.925
BASE_LON = -72.275
GRID_STEP_DEG = 0.02  # replicas spaced ~2.2 km
HOT_FRACTION = 10  # 1 in 10 rows land in the hot cell
XID_ALPHABET = "0123456789abcdefghijklmnopqrstuv"


def synthesize_pages(
    spark: SparkSession,
    n: int,
    n_devices: int = 1000,
    grid: int = 50,
    base_ts: int = 1700000000,
) -> DataFrame:
    """Deterministic pages DataFrame of ``n`` rows.

    Every expression is a Catalyst column over ``spark.range`` — fully
    parallel, no Python in the row path. Positions: row i belongs to
    device ``i % n_devices``; replica cell ``(i * 2654435761) % grid²``
    offsets the golden neighborhood; 1/10 of rows collapse into the
    hot cell 0 (skew).
    """
    df = spark.range(0, n).withColumnRenamed("id", "i")
    dev = F.col("i") % n_devices
    mix = (F.col("i") * F.lit(2654435761)) % F.lit(grid * grid)
    hot = (F.col("i") % HOT_FRACTION) == 0
    cell = F.when(hot, F.lit(0)).otherwise(mix)
    gy = (cell / grid).cast("long")
    gx = cell % grid
    # deterministic intra-cell jitter from the row id (integer arithmetic)
    jlat = ((F.col("i") * 7919) % 20000 - 10000) / 10_000_000.0
    jlon = ((F.col("i") * 104729) % 20000 - 10000) / 10_000_000.0
    lat = F.lit(BASE_LAT) + gy * GRID_STEP_DEG + jlat
    lon = F.lit(BASE_LON) + gx * GRID_STEP_DEG + jlon

    device_idx = dev.cast("long")
    # 20-char id in the xid alphabet: 'd' + zero pad + base32 of index
    dev_id = F.concat(
        F.lit("d"),
        F.lpad(F.lower(F.conv(device_idx.cast("string"), 10, 32)), 19, "0"),
    )
    url = F.concat(
        F.lit("https://fixture.test/"),
        dev_id,
        F.lit("/"),
        F.col("i").cast("string"),
    )
    text = F.concat(
        F.lit("page "),
        F.col("i").cast("string"),
        F.lit(" by device "),
        dev_id,
        F.lit(" located at "),
        lat.cast("string"),
        F.lit(", "),
        lon.cast("string"),
        F.lit(" speed "),
        (F.col("i") % 200).cast("string"),
        F.lit(" end."),
    )
    ts = F.timestamp_seconds(F.lit(base_ts) + F.col("i") % 86400)
    return df.select(
        url.alias("url"),
        ts.alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), "utf-8").alias("html"),
        text.alias("text"),
        F.lit("en").alias("lang"),
    )
