"""Checkpoint/resume + lineage manifest tests."""

from __future__ import annotations

import json
import os

from spinix_spark.run.checkpoint import ChunkedRunner


def test_chunked_runner_resume(spark, tmp_path):
    out = str(tmp_path / "out")
    calls = []

    def make_chunk(spark_, k, n_chunks):
        calls.append(k)
        return spark_.range(k * 10, (k + 1) * 10).withColumnRenamed("id", "v")

    def transform(df):
        return df.where("v % 2 = 0")

    runner = ChunkedRunner(out, n_chunks=4)
    s1 = runner.run(spark, make_chunk, transform)
    assert s1["chunks_run"] == 4 and s1["chunks_skipped"] == 0
    assert s1["rows_in"] == 40 and s1["rows_out"] == 20
    assert calls == [0, 1, 2, 3]

    # resume: everything already done → zero recompute
    calls.clear()
    runner2 = ChunkedRunner(out, n_chunks=4)
    s2 = runner2.run(spark, make_chunk, transform)
    assert s2["chunks_run"] == 0 and s2["chunks_skipped"] == 4
    assert calls == []

    # invalidate one manifest → only that chunk reruns
    os.remove(os.path.join(out, "_lineage", "chunk-00002.json"))
    s3 = ChunkedRunner(out, n_chunks=4).run(spark, make_chunk, transform)
    assert s3["chunks_run"] == 1 and calls == [2]

    # lineage carries rows/sec metrics per chunk
    lin = runner.lineage()
    assert len(lin) == 4
    assert all(m["status"] == "done" and m["rows_per_sec"] is not None for m in lin)


def test_chunked_runner_real_detect_pipeline(spark, tmp_path):
    """Checkpoint/resume over the REAL pipeline: pages → geoparse →
    detect per chunk (detect is row-local, hence chunkable). The
    resumed run recomputes nothing, and the unioned chunk output
    equals a single-shot run over the full input."""
    from pyspark.sql import functions as F

    from spinix_spark.engine.detect import Engine
    from spinix_spark.engine.spark_pipeline import detect_batch_spark, split_output
    from spinix_spark.engine.stores import zone_from_ring
    from spinix_spark.geo.rings import circle_ring
    from spinix_spark.io.geoparse import geoparse_points
    from spinix_spark.io.pages import BASE_LAT, BASE_LON, synthesize_pages

    N = 4000

    def mk_engine():
        e = Engine()
        e.zones.add(
            zone_from_ring(
                "c5vj26evvhfjvfseaulg", circle_ring(BASE_LAT, BASE_LON, 900.0, 6)
            )
        )
        e.add_rule(
            "device :radius 300m INTERSECTS polygon(c5vj26evvhfjvfseaulg)"
            " and speed range [30 .. 170]",
            rule_id="r" + "0" * 19,
        )
        return e

    def make_chunk(spark_, k, n_chunks):
        # chunk = contiguous id range of the page table (the 100 TB
        # analogue: an Iceberg partition / file group)
        lo, hi = k * N // n_chunks, (k + 1) * N // n_chunks
        pages = synthesize_pages(spark_, N)
        return pages.where(
            F.regexp_extract("url", r"/(\d+)$", 1).cast("long").between(lo, hi - 1)
        )

    def transform(pages):
        ev, _ = split_output(detect_batch_spark(geoparse_points(pages), mk_engine()))
        return ev.select("url", "device_id", "rule_id", "op")

    out = str(tmp_path / "out")
    runner = ChunkedRunner(out, n_chunks=4)
    s1 = runner.run(spark, make_chunk, transform)
    assert s1["chunks_run"] == 4

    # resume: zero recompute
    s2 = ChunkedRunner(out, n_chunks=4).run(spark, make_chunk, transform)
    assert s2["chunks_run"] == 0 and s2["chunks_skipped"] == 4

    # union-of-chunks == single-shot
    got = sorted(
        (r.url, r.device_id) for r in spark.read.parquet(out).collect()
    )
    ev, _ = split_output(
        detect_batch_spark(geoparse_points(synthesize_pages(spark, N)), mk_engine())
    )
    exp = sorted((r.url, r.device_id) for r in ev.collect())
    assert got == exp and len(exp) > 0


def test_package_zip(tmp_path):
    from spinix_spark.run.submit import package

    zp = package(str(tmp_path / "dist"))
    assert os.path.exists(zp)
    import zipfile

    with zipfile.ZipFile(zp) as z:
        names = z.namelist()
    assert "spinix_spark/engine/runtime.py" in names
    assert "spinix_spark/dsl/parser.py" in names
