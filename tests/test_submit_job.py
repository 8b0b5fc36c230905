"""End-to-end run of the spark-submit job entry point
(spinix_spark/run/submit.py): chunked detection over synthetic pages
with lineage manifests, then a zero-recompute resume."""

from __future__ import annotations

import argparse
import json
import os

from spinix_spark.run.submit import run_job


def _args(out: str) -> argparse.Namespace:
    return argparse.Namespace(
        master="local[4]", out=out, n_pages=20_000, n_chunks=2
    )


def test_run_job_and_resume(spark, tmp_path):
    out = str(tmp_path / "events_out")
    s1 = run_job(_args(out))
    assert s1["chunks_run"] == 2 and s1["rows_out"] > 0
    # lineage manifests exist with rows/sec metrics
    lin_dir = os.path.join(out, "_lineage")
    # count manifests only (a Hadoop local FS may add sidecar files)
    manifests = sorted(
        f for f in os.listdir(lin_dir)
        if f.startswith("chunk-") and f.endswith(".json")
    )
    assert len(manifests) == 2
    m = json.load(open(os.path.join(lin_dir, manifests[0])))
    assert m["status"] == "done" and m["rows_per_sec"] is not None

    # resume: nothing recomputed
    s2 = run_job(_args(out))
    assert s2["chunks_run"] == 0 and s2["chunks_skipped"] == 2

    # output readable and well-formed
    events = spark.read.parquet(os.path.join(out, "chunk=0"))
    assert "rule_id" in events.columns and events.count() >= 0
