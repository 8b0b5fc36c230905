"""Capture .explain('formatted') for the round-7-touched queries.

Usage: python tools/capture_plans.py <repo_root> <out_dir> <suffix>
Writes <out_dir>/<query>_<suffix>.txt for each declared query touched
this round, plus the (non-declared) bench lanes whose plans changed:
the fused LSH pair lane and the e2e near-dup drop-set lineage.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def main() -> None:
    repo, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, repo)
    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("plan-capture")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.01"

    import __spark_entry__ as entry

    qmap = entry.queries()
    declared = [
        "minhash_signatures",
        "minhash_lsh_pairs",
        "ngram_jaccard_lsh",
        "dedup_clusters",
        "dedup_keep_list",
        "dedup_filtered",
    ]

    def dump(name: str, df) -> None:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"captured {name}_{suffix}", flush=True)

    for name in declared:
        dump(name, qmap[name](spark, sf_dir))

    # bench lanes (not in queries()): fused pairs + near-dup drop set
    from spinix_spark.queries_text import neardup_drop_ids, spark_lsh_pairs_fused

    dump("minhash_lsh_pairs_fused", spark_lsh_pairs_fused(spark, sf_dir))

    from pyspark.sql import functions as F

    from spinix_spark.io.pages import synthesize_pages

    pages = synthesize_pages(spark, 10_000)
    corpus = (
        pages.where((F.col("lang") == "en") & (F.length("text") >= 30))
        .withColumn("doc_id", F.xxhash64("url"))
        .withColumn("n_chars", F.length("text"))
    )
    # NOTE: building the drop-set plan runs the CC loop's checkpoint
    # jobs eagerly; the captured plan is the final drop projection over
    # the converged labels (the per-round plan shape is documented in
    # OPTIMIZATION_r07.md)
    dump("e2e_neardup_drop", neardup_drop_ids(corpus))
    spark.stop()


if __name__ == "__main__":
    main()
