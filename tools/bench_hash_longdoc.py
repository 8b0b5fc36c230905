#!/usr/bin/env python
"""Interleaved A/B of the removal lineage's two signature pipelines on
a LONG-document corpus (VERDICT r4 item 6 → round-5 fusion):

- arm "md5": the oracle-parity pipeline — concatenated shingle
  strings, array_distinct, md5 token hash (``fast_hash=False``);
- arm "xxhash64": the fused hash-domain pipeline —
  ``xxhash64(w0, w1, w2)`` per window, no shingle strings, no
  distinct (``fast_hash=True``, the deployment default; measured
  14.5× here — an earlier token-family-only swap measured just ~8 %,
  so the FUSION is the win, not the hash).

~300 tokens/doc (~298 shingles, 10× the pages corpus) makes the
per-shingle cost a first-order term. Arms run interleaved (md5, xx,
md5, xx, ...) in ONE warmed session so host drift hits both equally
(PLANS.md measurement discipline).

Usage: python tools/bench_hash_longdoc.py [n_docs] [cpus]
Prints one JSON line; archive results into PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
CPUS = sys.argv[2] if len(sys.argv) > 2 else os.environ.get("SPARK_GRAFT_CPUS", "16")
TOKENS = 300
VOCAB = 1_000_003  # prime, large enough that shingles are doc-specific


def synthesize_longdocs(spark, n: int):
    """Deterministic distributed long-doc corpus: ~300 tokens/doc, with
    ~40% of docs being near-copies (first-k-token perturbation) of a
    cluster base — enough duplicate structure that the star-edge /
    CC stages do real work."""
    from pyspark.sql import functions as F

    base = (
        "CASE WHEN doc_id % 5 != 0 AND doc_id % 25 < 10 "
        "THEN doc_id - doc_id % 5 ELSE doc_id END"
    )
    perturb = "(doc_id % 5)"
    # token stream must be per-(base, position) pseudo-random: a linear
    # formula makes consecutive tokens differ by a constant, collapsing
    # every shingle to its first token (≤ VOCAB distinct shingles
    # corpus-wide → one giant near-dup cluster). xxhash64 here is
    # SYNTHESIS only — the measured hash families are inside
    # neardup_drop_ids.
    token = (
        f"concat('w', pmod(xxhash64("
        f"CASE WHEN j < {perturb} THEN doc_id ELSE ({base}) END, j), {VOCAB}))"
    )
    return (
        spark.range(n)
        .withColumnRenamed("id", "doc_id")
        .selectExpr(
            "doc_id",
            f"array_join(transform(sequence(0, {TOKENS - 1}), j -> {token}), ' ') AS text",
        )
        .withColumn("n_chars", F.length("text"))
    )


def main() -> None:
    from pyspark.sql import SparkSession

    from spinix_spark.queries_text import neardup_drop_ids

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("hash-longdoc-ab")
        .config("spark.sql.shuffle.partitions", str(2 * int(CPUS)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    # materialize the corpus: the A/B measures the removal lineage's
    # hash family, not the (HOF-heavy) synthesis expression
    corpus = synthesize_longdocs(spark, N_DOCS).localCheckpoint(eager=True)
    n_tokens = corpus.selectExpr("sum(size(split(text, ' '))) AS t").collect()[0].t

    # warm both arms (Python workers, codegen caches, JIT)
    warm = synthesize_longdocs(spark, 2_000).localCheckpoint(eager=True)
    for fast in (False, True):
        neardup_drop_ids(warm, fast_hash=fast).count()

    runs: dict[str, list[float]] = {"md5": [], "xxhash64": []}
    drops: dict[str, int] = {}
    for _ in range(3):
        for fast, name in ((False, "md5"), (True, "xxhash64")):
            t0 = time.time()
            n_drop = neardup_drop_ids(corpus, fast_hash=fast).count()
            runs[name].append(round(time.time() - t0, 2))
            drops[name] = int(n_drop)
    out = {
        "n_docs": N_DOCS,
        "tokens_per_doc": TOKENS,
        "total_tokens": int(n_tokens),
        "cpus": int(CPUS),
        "md5_s": runs["md5"],
        "xxhash64_s": runs["xxhash64"],
        "md5_best_s": min(runs["md5"]),
        "xxhash64_best_s": min(runs["xxhash64"]),
        "speedup_xx_vs_md5": round(min(runs["md5"]) / min(runs["xxhash64"]), 3),
        "n_dropped": drops,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
