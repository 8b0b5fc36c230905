"""Raster ↔ vector tile layer: per-cell match aggregation.

The north-star extension: matches roll up into an H3-style cell raster
(``groupBy(cell).agg(...)`` — partial aggregation map-side, one shuffle
on the cell key), and any cell set converts to a GeoJSON
FeatureCollection of cell polygons — the vector side, mirroring the
reference's ``IndexToFeatureCollection`` (which converts H3 cells to
hex-polygon features, /root/reference/internal/geojson/index.go:112-127;
our cells are grid squares).

Writes are partitioned by a coarse cell prefix so storage partition
pruning works for spatial range queries over the tile table.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spinix_spark.geo.cells import GridScheme


def tile_rollup(
    points_with_cell: DataFrame,
    events: DataFrame,
    scheme: GridScheme,
) -> DataFrame:
    """events (url, rule_id, ...) × points (url, cell) → per-cell
    raster: match count, distinct devices, distinct rules.

    The join key is url (provenance); events are the small side after
    detection, so Spark broadcasts them under AQE. The rollup is a
    single shuffle keyed by cell.
    """
    ev = events.select("url", "rule_id", "device_id").alias("ev")
    pts = points_with_cell.select("url", "cell").alias("pt")
    joined = pts.join(ev, "url")
    return joined.groupBy("cell").agg(
        F.count("*").alias("n_matches"),
        F.approx_count_distinct("device_id").alias("n_devices"),
        F.approx_count_distinct("rule_id").alias("n_rules"),
    )


def point_density_raster(points_with_cell: DataFrame) -> DataFrame:
    """Plain point-density raster (groupBy cell) — map-side partial agg
    then one shuffle; the baseline tiling query."""
    return points_with_cell.groupBy("cell").agg(
        F.count("*").alias("n_points"),
        F.approx_count_distinct("device_id").alias("n_devices"),
    )


def cells_to_feature_collection(cells: list[int], scheme: GridScheme) -> str:
    """Vector side: cell ids → GeoJSON FeatureCollection of cell
    polygons (≙ IndexToFeatureCollection, index.go:112-127)."""
    feats = []
    for c in cells:
        b = scheme.cell_bbox(int(c))
        minlat, minlon, maxlat, maxlon = (float(x) for x in b)
        ring = [
            [minlon, minlat],
            [maxlon, minlat],
            [maxlon, maxlat],
            [minlon, maxlat],
            [minlon, minlat],
        ]
        feats.append(
            {
                "type": "Feature",
                "properties": {"cell": int(c)},
                "geometry": {"type": "Polygon", "coordinates": [ring]},
            }
        )
    return json.dumps({"type": "FeatureCollection", "features": feats})


def vector_tiles(raster: DataFrame, scheme: GridScheme) -> DataFrame:
    """Raster rows → vector rows with the cell polygon as GeoJSON text
    (Catalyst-only: bbox arithmetic + string build, no UDF)."""
    size = scheme.size
    cols = scheme.cols
    base = scheme.base
    c = F.col("cell") - F.lit(base)
    row = (c / cols).cast("long")
    col = c % cols
    minlat = row * size - 90.0
    minlon = col * size - 180.0
    maxlat = minlat + size
    maxlon = minlon + size

    def pt(lon, lat):
        return F.concat(F.lit("["), lon.cast("string"), F.lit(","), lat.cast("string"), F.lit("]"))

    ring = F.concat_ws(
        ",",
        pt(minlon, minlat),
        pt(maxlon, minlat),
        pt(maxlon, maxlat),
        pt(minlon, maxlat),
        pt(minlon, minlat),
    )
    geojson = F.concat(
        F.lit('{"type":"Polygon","coordinates":[['), ring, F.lit("]]}")
    )
    return raster.withColumn("geojson", geojson)


def write_tiles(raster: DataFrame, path: str, scheme: GridScheme, coarse_shift: int = 8) -> None:
    """Partitioned tile write: coarse cell prefix as the partition
    column → storage partition pruning for spatial range scans."""
    # integer DIV — cell ids are near 2^53; double division would lose
    # integer precision
    out = raster.withColumn("cell_prefix", F.expr(f"cell DIV {2**coarse_shift}"))
    out.write.mode("overwrite").partitionBy("cell_prefix").parquet(path)
