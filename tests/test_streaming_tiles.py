"""Streaming windowed tile rollup with watermark."""

from __future__ import annotations

import pandas as pd


def test_streaming_tile_rollup(spark, tmp_path):
    from pyspark.sql import functions as F

    from spinix_spark.geo.cells import DEFAULT_SCHEME
    from spinix_spark.streaming.detect_stream import streaming_tile_rollup

    src = str(tmp_path / "pts")
    pdf = pd.DataFrame(
        {
            "device_id": ["d1", "d2", "d1", "d3"],
            "lat": [42.925, 42.925, 42.925, 43.105],
            "lon": [-72.275, -72.275, -72.275, -72.105],
            "warc_ts": pd.to_datetime(
                [1700000000, 1700000010, 1700000070, 1700000070], unit="s"
            ),
        }
    )
    spark.createDataFrame(pdf).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
        .withColumn("cell", F.expr(DEFAULT_SCHEME.sql_cell_expr("lat", "lon")))
    )
    out = streaming_tile_rollup(stream, window_duration="1 minute")
    # complete mode: append-mode watermarked windows only emit once a
    # LATER batch advances the watermark past window end; a single
    # availableNow batch would emit nothing
    q = (
        out.writeStream.format("memory")
        .queryName("tiles_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM tiles_stream").collect()
    # 2 windows × hot cell + 1 window × second cell = 3 rows
    assert len(rows) == 3
    total = sum(r.n_points for r in rows)
    assert total == 4
