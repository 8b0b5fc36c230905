"""Adversarially polar-dense near_pairs A/B — the 100 TB concern the
round-6 band keys close: pre-band code explodes asin-widened column
spans (hundreds to thousands of keys per row near the pole); band
keys bound the fan-out to ~a dozen. Deterministic synthetic cap
corpus, fresh JVM, per-variant wall + exploded-key count.

Usage: python tools/ab_polar_dense.py <repo_path> <n_points>
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo, n = sys.argv[1], int(sys.argv[2])
    sys.path.insert(0, repo)
    os.chdir(repo)
    import numpy as np
    import pandas as pd
    from pyspark.sql import SparkSession

    from spinix_spark.engine.joins import _with_neighbor_cells, near_pairs
    from spinix_spark.geo.cells import GridScheme

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('AB_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "12g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    scheme = GridScheme(res=9)
    rng = np.random.default_rng(42)
    lat = 89.95 + rng.random(n) * 0.049  # [89.95, 89.999): cap-dense
    lon = rng.random(n) * 360.0 - 180.0
    pdf = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                        "lat": lat, "lon": lon})
    pdf["cell"] = scheme.cell_of(lat, lon)
    df = spark.createDataFrame(pdf).repartition(32).cache()
    df.count()

    keyed = _with_neighbor_cells(
        df.selectExpr("doc_id", "lat as a_lat", "lon as a_lon", "cell"),
        scheme, "cell", 250.0, lat_col="a_lat",
    )
    t0 = time.time()
    n_keys = keyed.count()
    t_keys = time.time() - t0

    t0 = time.time()
    n_pairs = near_pairs(df, scheme, 250.0).count()
    t_pairs = time.time() - t0
    print(json.dumps({
        "repo": repo, "n_points": n, "exploded_keys": int(n_keys),
        "keys_per_row": round(n_keys / n, 1), "keys_wall_s": round(t_keys, 2),
        "n_pairs": int(n_pairs), "pairs_wall_s": round(t_pairs, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
