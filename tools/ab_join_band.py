"""Interleaved A/B: polar-band join keys (round 6) vs round-5 code.

The round-6 change threads a per-ring regime CASE through the
single-explode k-ring key array (engine/joins.py). Mid-latitude data
never takes the band branch, but the branch is *evaluated* per
neighbor ring per row — this measures that overhead on the two
hottest join consumers at fact scale. Protocol per PLANS.md: fresh
JVM per (variant, run), variants interleaved, warmup pass inside each
process, repo selected via sys.path so the SAME script drives both
trees (tools/bench_hash_longdoc.py pattern).

Usage: python tools/ab_join_band.py <repo_path> <job> <n_pages>
  job ∈ {hot_cell, devices_at}
Prints one JSON line {"repo":..., "job":..., "wall_s":...}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo, job, n_pages = sys.argv[1], sys.argv[2], int(sys.argv[3])
    sys.path.insert(0, repo)
    os.chdir(repo)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('AB_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    import bench

    fn = {
        "hot_cell": bench.run_hot_cell_pairs,
        "devices_at": bench.run_devices_at_pages,
    }[job]
    fn(spark, max(n_pages // 10, 10_000))  # warmup at 1/10 scale
    t0 = time.time()
    out = fn(spark, n_pages)
    wall = time.time() - t0
    print(json.dumps({"repo": repo, "job": job, "n_pages": n_pages,
                      "wall_s": round(wall, 3), "out": out}))
    spark.stop()


if __name__ == "__main__":
    main()
