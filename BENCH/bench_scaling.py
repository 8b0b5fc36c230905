#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north_rule).

A real N-vs-4N-executor comparison is impossible in this sandbox, so —
per the task instructions — the same job runs at two parallelism
levels (local[8] and local[32]) on the same input, and we report
throughput at both plus scaling efficiency::

    eff = throughput(local[32]) / (4 × throughput(local[8]))

One JVM per level: each level runs in a fresh subprocess so executor
threads, shuffle partitions, and codegen caches don't leak between
measurements. Results land in BENCH/SCALING.json and are summarized in
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from bench import build_spark, run_geo_pipeline

cpus = sys.argv[1]
n_pages = int(sys.argv[2])
spark = build_spark(cpus)
# warmup: trigger JVM/codegen/python-worker spinup outside the timed region
run_geo_pipeline(spark, 20000)
t0 = time.time()
stats = run_geo_pipeline(spark, n_pages)
wall = time.time() - t0
print(json.dumps({{"cpus": int(cpus), "n_pages": n_pages, "wall_s": wall,
                   "pages_per_sec": n_pages / wall, "stats": stats}}))
spark.stop()
"""


def run_level(cpus: int, n_pages: int) -> dict:
    code = CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n_pages)],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=1200,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_pages = int(os.environ.get("SPARK_GRAFT_SCALING_PAGES", "600000"))
    lo = run_level(8, n_pages)
    hi = run_level(32, n_pages)
    eff = hi["pages_per_sec"] / (4.0 * lo["pages_per_sec"])
    result = {
        "n_pages": n_pages,
        "local8": lo,
        "local32": hi,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open(os.path.join(HERE, "SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
