"""Near-dup REMOVAL lineage invariants: the star-edge LSH construction
(linear in bucket size) must yield exactly the same duplicate clusters
as the pairwise band join, and the drop set must keep exactly one
canonical member per cluster. ANN recall sanity rides along (full
probe ⇒ recall 1.0, monotone in nprobe)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _labels(spark, edges_sql):
    from spinix_spark.queries_text import cc_two_phase

    return {
        (r.node, r.label)
        for r in cc_two_phase(spark.sql(edges_sql)).collect()
    }


def test_star_edges_same_components_as_pairwise(spark):
    from spinix_spark.queries_text import (
        _cached_signatures,
        _lsh_pairs_from_salted,
        _lsh_star_edges,
    )

    _cached_signatures(spark, SF_DIR)
    star = _labels(spark, _lsh_star_edges("mh_sig"))
    pairwise = _labels(spark, _lsh_pairs_from_salted("mh_sig"))
    assert star == pairwise and star


import pytest


@pytest.mark.parametrize("fast_hash", [False, True])
def test_drop_set_keeps_one_canonical_per_cluster(spark, fast_hash):
    from spinix_spark.io.derive import load_tables
    from spinix_spark.queries_text import (
        _SPARK_X,
        _fast_shingle_sig_sql,
        _lsh_star_edges,
        _minhash_sql_wide,
        cc_two_phase,
        neardup_drop_ids,
        spark_shingles,
    )

    load_tables(spark, SF_DIR, ["documents"])
    corpus = spark.table("documents").select("doc_id", "text", "n_chars")
    dropped = {
        r.doc_id
        for r in neardup_drop_ids(corpus, fast_hash=fast_hash).collect()
    }
    # recompute expected clusters with the SAME signature construction
    # (fast path = hash-domain fused shingles)
    sig = spark.sql(
        _fast_shingle_sig_sql("documents")
        if fast_hash
        else _minhash_sql_wide(spark_shingles(), _SPARK_X)
    )
    sig.createOrReplaceTempView("_t_sig")
    labels = cc_two_phase(spark.sql(_lsh_star_edges("_t_sig")))
    docs = spark.table("documents").select(
        F.col("doc_id").alias("node"), "n_chars"
    )
    clusters: dict = {}
    for r in labels.join(docs, "node").collect():
        clusters.setdefault(r.label, []).append((r.n_chars, r.node))
    assert clusters
    for label, members in clusters.items():
        keep = max(members, key=lambda t: (t[0], -t[1]))[1]
        others = {n for _c, n in members if n != keep}
        assert keep not in dropped
        assert others <= dropped
    # nothing outside the clusters is ever dropped
    member_ids = {n for ms in clusters.values() for _c, n in ms}
    assert dropped <= member_ids


def test_ann_recall_full_probe_is_exact(spark):
    from spinix_spark.queries_ann import NLIST, ann_recall_stats

    out = ann_recall_stats(
        spark, SF_DIR, nprobes=(1, NLIST), n_queries=5, iters=1
    )
    assert out[f"recall10_nprobe{NLIST}"] == 1.0
    assert out["recall10_nprobe1"] <= 1.0


def test_choose_nprobe_meets_target(spark):
    from spinix_spark.queries_ann import NLIST, choose_nprobe

    p, curve = choose_nprobe(
        spark, SF_DIR, target_recall=0.99, n_queries=5, iters=1
    )
    assert curve[f"recall10_nprobe{p}"] >= 0.99
    # full probe is always in the sweep, so a target of ≤1.0 resolves
    assert p <= NLIST
    # monotone in probe count (same scored pass, growing candidate set)
    vals = [curve[k] for k in sorted(curve, key=lambda s: int(s.rsplit("nprobe", 1)[1]))]
    assert vals == sorted(vals)


def test_star_edges_plan_is_single_equi_join(spark):
    """Plan-shape guard: the star-edge construction must stay ONE
    grouped-MIN + ONE equi-join — reintroducing the pairwise bucket
    self-join (O(bucket²) output) would show up as an extra Join."""
    from spinix_spark.io.derive import load_tables
    from spinix_spark.queries_text import _cached_signatures, _lsh_star_edges

    load_tables(spark, SF_DIR, ["documents"])
    _cached_signatures(spark, SF_DIR)
    plan = (
        spark.sql(_lsh_star_edges("mh_sig"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Join") == 1, plan
