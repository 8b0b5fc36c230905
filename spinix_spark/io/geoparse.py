"""Geoparse: extract coordinates from page text — entirely JVM-side.

The extraction is a Catalyst ``regexp_extract`` + cast (whole-stage
codegen; no Python UDF on the 100 TB scan path), and the ``text``
column passes through *untouched* — the byte-identical-text-per-url
invariant (BASELINE.json input_hint) holds by construction and is
asserted in tests.

The reference has no geoparse stage (devices arrive as structured
updates); this is the graft's ingestion front — every page with a
recoverable ``located at <lat>, <lon>`` pair becomes a device update
(devices.go:27-48 schema), with the url as provenance and the page
device-id carrier parsed from the url path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

COORD_RE = r"located at (-?\d+(?:\.\d+)?(?:[eE]-?\d+)?), (-?\d+(?:\.\d+)?(?:[eE]-?\d+)?)"
_NUM = r"(-?\d+(?:\.\d+)?(?:[eE]-?\d+)?)"
SPEED_RE = r" speed " + _NUM


def geoparse_points(pages: DataFrame) -> DataFrame:
    """pages (url, warc_ts, html, text, lang) → device-update rows.

    Output columns: url, device_id, layer_id, lat, lon, datetime,
    speed, status, text (byte-identical passthrough). Rows without a
    coordinate pair are dropped (filter pushes to the scan).

    Regex-execution discipline (each form measured, PLANS.md): exactly
    ONE regexp_extract per output column and NO conditional guard
    around it — Catalyst neither common-subexpressions the same
    pattern across derived columns (a group-0-extract + split form ran
    it per column, 3× slower) nor inside conditional branches (a
    ``when(x != '', x)`` null guard re-ran it per reference, ~1.4×
    pipeline slowdown at 12M pages). ``try_cast`` provides the
    null-safety in the same single evaluation: non-matching rows yield
    '' from regexp_extract, which try_cast maps to NULL (ANSI CAST
    would throw — regression-tested).
    """
    lat = F.regexp_extract("text", COORD_RE, 1).try_cast("double")
    lon = F.regexp_extract("text", COORD_RE, 2).try_cast("double")
    device_id = F.regexp_extract("url", r"https?://[^/]+/([0-9a-v]{20})/", 1)
    speed = F.regexp_extract("text", SPEED_RE, 1).try_cast("double")
    return (
        pages.select(
            "url",
            device_id.alias("device_id"),
            F.lit("0" * 20).alias("layer_id"),
            lat.alias("lat"),
            lon.alias("lon"),
            F.unix_timestamp("warc_ts").alias("datetime"),
            speed.alias("speed"),
            F.lit(0).cast("int").alias("status"),
            "text",
        )
        .where(F.col("lat").isNotNull() & F.col("lon").isNotNull())
    )


def cell_column(scheme, lat_col: str = "lat", lon_col: str = "lon") -> Column:
    """Grid cell id as a Catalyst expression (JVM-side, codegen)."""
    return F.expr(scheme.sql_cell_expr(lat_col, lon_col))
