"""Join-based physical strategies for the spatial operators.

The engine's default plan broadcasts zones/rules and refines inside
``mapInPandas`` (engine/spark_pipeline.py) — right when the dimension
side fits in memory, which mirrors the reference's in-memory indexes.
This module provides the *relational* strategies for when it doesn't:

- ``points_in_zones_join``: explode zone covering cells → broadcast
  equi-join on the cell key → vectorized exact PIP refinement on the
  surviving (point, zone) candidates only. The refine stage sees just
  (lat, lon, ring) columns — column pruning keeps the scan minimal.
- ``near_pairs``: device-near-device radius self-join via k-ring cell
  expansion (shuffle hash join on the cell key).
- ``near_pairs_salted``: the hot-cell remedy. A dense cell makes the
  pair join quadratic *within one task*; bucketing each cell's rows
  into S salt buckets and joining on (cell, bucket_a, bucket_b) splits
  that cell's work across S² tasks — the two-level salting the
  north_rule calls for (AQE skew-join splits partitions, but cannot
  split a single key's quadratic blowup; salting can).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from spinix_spark.geo.cells import GridScheme
from spinix_spark.geo.geodesy import EARTH_RADIUS_M
from spinix_spark.geo.sqlgen import haversine_sql
from spinix_spark.engine.stores import Zone, zone_cells

# Polar-cap join keys — sentinels far outside every canonical cell-id
# band AND every out-of-band neighbor id (max legal id ≈ 1.2e16 at res
# 12; int64 max ≈ 9.2e18). A row whose search disc crosses a pole
# joins through the cap key instead of a (necessarily full-circle)
# longitude span.
CAP_NORTH_KEY = 10**18 + 1
CAP_SOUTH_KEY = 10**18 + 2

# Polar BAND keys (round-6: bounded near-pole key width). Inside the
# band (rows whose k-ring column span would exceed POLAR_BAND_MAX_COLS
# columns), the join key switches from grid cells to (colat ring,
# azimuth sector) with n_sec(ring) = min(cols, 4·(ring+1)) sectors —
# sector arc length stays ~(π/2)·cell_height regardless of latitude,
# so the per-row key fan-out is a small constant instead of the
# asin-widened ~cols/4 column span (ROADMAP #7 / round-5 verdict
# "What's wrong #1"). Encoding: BASE + ring·2^32 + sector; disjoint
# from cell ids and cap keys by construction.
POLAR_NORTH_BASE = 2 * 10**18
POLAR_SOUTH_BASE = 4 * 10**18
POLAR_BAND_MAX_COLS = 16


def polar_band_rows(scheme: GridScheme, radius_m: float) -> int:
    """Number of rows-from-the-pole that key by (ring, sector) instead
    of grid cells: the colatitude below which ``ceil(dlon/size)``
    exceeds POLAR_BAND_MAX_COLS, in row units. 0 = no band (radius so
    large the span never exceeds the budget — then k_lat dominates
    anyway). Both join sides MUST derive the band from the same
    (scheme, radius) so their keys agree."""
    import math

    sin_r = math.sin(radius_m / EARTH_RADIUS_M)
    s = math.sin(math.radians(POLAR_BAND_MAX_COLS * scheme.size))
    if sin_r >= s:
        # degenerate: radius ≥ ~MAX_COLS cells — span exceeds the
        # budget well below the pole; clamp the band to a quarter
        # hemisphere (correctness holds at any latitude, the sector
        # arc is latitude-proportional by construction)
        return scheme.rows // 4
    colat = math.degrees(math.asin(sin_r / s))
    return min(scheme.rows // 4, int(math.ceil(colat / scheme.size)))


def zones_cells_df(spark, zones: list[Zone], scheme: GridScheme) -> DataFrame:
    """Zone dimension exploded to one row per covering cell."""
    rows = []
    for z in zones:
        for c in zone_cells(z, scheme):
            rows.append((z.object_id, z.layer_id, int(c)))
    return spark.createDataFrame(rows, "object_id string, layer_id string, cell long")


def points_in_zones_join(
    points: DataFrame,
    zones: list[Zone],
    scheme: GridScheme,
    cell_col: str = "cell",
) -> DataFrame:
    """(point × zone) containment via cell equi-join + exact refine.

    Plan: points ⨝ broadcast(zone_cells) on cell (no shuffle on the
    fact side) → applyInPandas-style refine with the zone rings shipped
    in a broadcast variable → (url/doc id, object_id) match rows.
    """
    spark = points.sparkSession
    zdf = zones_cells_df(spark, zones, scheme)
    cand = points.join(F.broadcast(zdf), on=cell_col)

    rings_by_id = {z.object_id: [r.copy() for r in z.rings] for z in zones}
    b = spark.sparkContext.broadcast(rings_by_id)

    id_col = "url" if "url" in points.columns else points.columns[0]
    out_schema = StructType(
        [
            StructField(id_col, points.schema[id_col].dataType),
            StructField("object_id", StringType()),
            StructField("lat", DoubleType()),
            StructField("lon", DoubleType()),
        ]
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spinix_spark.geo.predicates import points_in_ring

        rings = b.value
        for pdf in batches:
            if pdf.empty:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            lat = pdf["lat"].to_numpy(np.float64)
            lon = pdf["lon"].to_numpy(np.float64)
            oids = pdf["object_id"].to_numpy(object)
            for oid in pd.unique(pdf["object_id"]):
                m = oids == oid
                hit = np.zeros(int(m.sum()), dtype=bool)
                for ring in rings.get(oid, []):
                    hit |= points_in_ring(lat[m], lon[m], ring)
                keep[np.nonzero(m)[0][hit]] = True
            yield pdf.loc[keep, [id_col, "object_id", "lat", "lon"]]

    return cand.select(id_col, "object_id", "lat", "lon").mapInPandas(
        refine, schema=out_schema
    )


def _with_neighbor_cells(
    df: DataFrame,
    scheme: GridScheme,
    cell_col: str,
    radius_m: float,
    lat_col: str = "a_lat",
) -> DataFrame:
    """Explode each row to its radius-covering search keys, globally
    correct:

    - latitude rings: ``k_lat = ceil(deg_r / size)`` rows either side;
    - longitude span PER ROW: ``ceil(asin(sin r / cos lat) / size)``
      columns — the exact max Δlon at distance r widens by 1/cos(lat)
      (a constant k silently undercovers away from the equator);
    - columns wrap modulo cols at the antimeridian;
    - a row whose disc crosses a pole (|lat| + deg_r ≥ 90) collapses
      to a single polar-cap key instead (its true partners span all
      longitudes; they all lie in the cap band and carry the cap key
      on the probe side — see ``_with_cap_probe_keys``).

    Plan shape: the key set is built as ONE per-row array and exploded
    ONCE. The first implementation chained two sequence-explodes
    (rows × columns) and measured 1.7× slower on the hot-cell bench —
    each Generate is a codegen stage break; the nested `transform` here
    is interpreted but touches only ~(2k+1)² tiny int expressions per
    input row (PLANS.md round-5 measurement)."""
    import math

    deg_r = math.degrees(radius_m / EARTH_RADIUS_M)
    k_lat = int(math.ceil(deg_r / scheme.size))
    sin_r = repr(math.sin(radius_m / EARTH_RADIUS_M))
    dlon = (
        f"DEGREES(ASIN(LEAST(GREATEST({sin_r} / "
        f"GREATEST(COS(RADIANS({lat_col})), 1e-12), -1.0), 1.0)))"
    )
    cap_n = f"({lat_col} + {deg_r!r} >= 90.0)"
    cap_s = f"({lat_col} - {deg_r!r} <= -90.0)"
    klon = f"CAST(CEIL({dlon} / {scheme.size!r}) AS INT)"
    cols = scheme.cols
    rows = scheme.rows
    band = polar_band_rows(scheme, radius_m)
    # wrap as an additive correction against the precomputed column
    # index (valid because klon < cols: at most one wrap either way)
    nb = (
        f"({cell_col} + dr * {cols} + dc"
        f" + CASE WHEN _co + dc < 0 THEN {cols}"
        f" WHEN _co + dc >= {cols} THEN -{cols} ELSE 0 END)"
    )
    grid_arr = (
        f"transform(sequence(-_kl, _kl), dc -> CAST({nb} AS BIGINT))"
    )

    def band_arr(base: int, cr: str) -> str:
        # azimuth sectors of colat ring `cr` touched by the row's
        # ±_kl column span: sector(co) = floor(co·n/cols) is monotone,
        # so the touched set is the contiguous floor-range (mod n,
        # length clamped at n). Per-ring fan-out is O(deg_r/size),
        # latitude-INDEPENDENT — the whole point of the band scheme.
        n = f"LEAST(CAST({cols} AS BIGINT), 4 * (({cr}) + 1))"
        lo = f"CAST(FLOOR((_co - _kl) * {n} / {cols}) AS BIGINT)"
        hi = f"CAST(FLOOR((_co + _kl) * {n} / {cols}) AS BIGINT)"
        return (
            f"transform(sequence({lo}, LEAST({hi}, {lo} + {n} - 1)), s ->"
            f" CAST({base} + ({cr}) * 4294967296 + pmod(s, {n}) AS BIGINT))"
        )

    if band > 0:
        per_row = (
            f"CASE"
            f" WHEN _ro + dr >= {rows} OR _ro + dr < 0"
            f" THEN slice(array(CAST(0 AS BIGINT)), 1, 0)"
            f" WHEN _ro + dr >= {rows - band}"
            f" THEN {band_arr(POLAR_NORTH_BASE, f'{rows - 1} - (_ro + dr)')}"
            f" WHEN _ro + dr < {band}"
            f" THEN {band_arr(POLAR_SOUTH_BASE, '_ro + dr')}"
            f" ELSE {grid_arr} END"
        )
    else:
        per_row = grid_arr
    keys = (
        f"CASE WHEN {cap_n} THEN array(CAST({CAP_NORTH_KEY} AS BIGINT))"
        f" WHEN {cap_s} THEN array(CAST({CAP_SOUTH_KEY} AS BIGINT))"
        f" ELSE flatten(transform(sequence(-{k_lat}, {k_lat}), dr ->"
        f" {per_row})) END"
    )
    return (
        df.withColumn(
            "_co", (F.col(cell_col) - F.lit(scheme.base)) % F.lit(cols)
        )
        .withColumn("_ro", F.expr(f"({cell_col} - {scheme.base}) DIV {cols}"))
        .withColumn("_kl", F.expr(klon))
        .withColumn("_ncell", F.explode(F.expr(keys)))
        .drop("_co", "_ro", "_kl")
    )


def _with_cap_probe_keys(
    df: DataFrame,
    scheme: GridScheme,
    radius_m: float,
    lat_col: str,
    cell_col: str,
) -> DataFrame:
    """Probe-side keys: the canonical key — the grid cell, or inside
    the polar band the (colat ring, azimuth sector) band key (must
    mirror ``_with_neighbor_cells``'s regime switch exactly, same
    ``polar_band_rows``) — plus the polar-cap key for rows in the cap
    band (within 2·deg_r of a pole — every true partner of a
    pole-crossing searcher lies in this band). Single scan:
    conditional key array + explode, no union."""
    import math

    deg_r = math.degrees(radius_m / EARTH_RADIUS_M)
    cols = scheme.cols
    rows = scheme.rows
    band = polar_band_rows(scheme, radius_m)
    if band > 0:
        ro = f"(({cell_col} - {scheme.base}) DIV {cols})"
        co = f"pmod({cell_col} - {scheme.base}, {cols})"

        def band_key(base: int, cr: str) -> str:
            n = f"LEAST(CAST({cols} AS BIGINT), 4 * (({cr}) + 1))"
            return (
                f"CAST({base} + ({cr}) * 4294967296"
                f" + CAST(FLOOR({co} * {n} / {cols}) AS BIGINT) AS BIGINT)"
            )

        canonical = F.expr(
            f"CASE WHEN {ro} >= {rows - band}"
            f" THEN {band_key(POLAR_NORTH_BASE, f'{rows - 1} - {ro}')}"
            f" WHEN {ro} < {band}"
            f" THEN {band_key(POLAR_SOUTH_BASE, ro)}"
            f" ELSE CAST({cell_col} AS BIGINT) END"
        )
    else:
        canonical = F.col(cell_col).cast("long")
    keys = F.array_compact(
        F.array(
            canonical,
            F.when(
                F.col(lat_col) >= F.lit(90.0 - 2.0 * deg_r),
                F.lit(CAP_NORTH_KEY).cast("long"),
            ),
            F.when(
                F.col(lat_col) <= F.lit(-90.0 + 2.0 * deg_r),
                F.lit(CAP_SOUTH_KEY).cast("long"),
            ),
        )
    )
    return df.withColumn("_ncell", F.explode(keys)).drop(cell_col)


def near_pairs(
    points: DataFrame,
    scheme: GridScheme,
    radius_m: float,
    id_col: str = "doc_id",
    cell_col: str = "cell",
) -> DataFrame:
    """Pairs within radius via wrapped k-ring cell join + exact
    haversine. Globally correct: per-row longitude span (1/cos lat),
    antimeridian column wrap, polar-cap key for pole-crossing discs —
    the exact haversine refine admits every candidate the cell join
    surfaces, and the cell join surfaces every true pair (asserted
    against the O(n²) trig oracle in tests)."""
    left = _with_neighbor_cells(
        points.select(
            F.col(id_col).alias("a_id"),
            F.col("lat").alias("a_lat"),
            F.col("lon").alias("a_lon"),
            F.col(cell_col),
        ),
        scheme,
        cell_col,
        radius_m,
        lat_col="a_lat",
    ).drop(cell_col)
    right = _with_cap_probe_keys(
        points.select(
            F.col(id_col).alias("b_id"),
            F.col("lat").alias("b_lat"),
            F.col("lon").alias("b_lon"),
            F.col(cell_col),
        ),
        scheme,
        radius_m,
        "b_lat",
        cell_col,
    )
    dist = F.expr(haversine_sql("a_lat", "a_lon", "b_lat", "b_lon"))
    return (
        left.join(right, "_ncell")
        .where(F.col("a_id") < F.col("b_id"))
        .where(dist <= radius_m)
        .select("a_id", "b_id", dist.alias("dist_m"))
    )


def near_pairs_salted(
    points: DataFrame,
    scheme: GridScheme,
    radius_m: float,
    n_salt: int = 8,
    id_col: str = "doc_id",
    cell_col: str = "cell",
) -> DataFrame:
    """Two-level salted radius self-join for hot-cell skew.

    Each row gets a deterministic salt bucket ``b = hash(id) mod S``;
    the join key becomes (neighbor_cell, b_left, b_right), with the
    left side exploding all S right-buckets and the right side keeping
    its own bucket — so a cell holding H rows runs as S² tasks of
    (H/S)² work instead of one H² task. Result set is identical to
    :func:`near_pairs` (asserted in tests)."""
    salted = points.withColumn("_b", F.pmod(F.xxhash64(F.col(id_col)), n_salt))
    left = _with_neighbor_cells(
        salted.select(
            F.col(id_col).alias("a_id"),
            F.col("lat").alias("a_lat"),
            F.col("lon").alias("a_lon"),
            F.col(cell_col),
            F.col("_b").alias("_ba"),
        ),
        scheme,
        cell_col,
        radius_m,
        lat_col="a_lat",
    ).drop(cell_col)
    left = left.withColumn(
        "_bb", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    right = _with_cap_probe_keys(
        salted.select(
            F.col(id_col).alias("b_id"),
            F.col("lat").alias("b_lat"),
            F.col("lon").alias("b_lon"),
            F.col(cell_col),
            F.col("_b").alias("_bb"),
        ),
        scheme,
        radius_m,
        "b_lat",
        cell_col,
    ).withColumn("_ba", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    dist = F.expr(haversine_sql("a_lat", "a_lon", "b_lat", "b_lon"))
    return (
        left.join(right, ["_ncell", "_ba", "_bb"])
        .where(F.col("a_id") < F.col("b_id"))
        .where(dist <= radius_m)
        .select("a_id", "b_id", dist.alias("dist_m"))
    )
