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


def test_package_zip(tmp_path):
    from spinix_spark.run.submit import package

    zp = package(str(tmp_path / "dist"))
    assert os.path.exists(zp)
    import zipfile

    with zipfile.ZipFile(zp) as z:
        names = z.namelist()
    assert "spinix_spark/engine/runtime.py" in names
    assert "spinix_spark/dsl/parser.py" in names
