"""Connected-components algorithms: the O(log)-round two-phase
(Large-Star/Small-Star) must produce exactly min-label propagation's
components, and must converge on chains whose diameter exceeds the
label-propagation cap (the case that loud-fails the simpler variant).
"""

from __future__ import annotations

import numpy as np
import pytest

from spinix_spark.queries_text import cc_two_phase, min_label_propagation


def _canon(df):
    return sorted((r.node, r.label) for r in df.collect())


def test_two_phase_long_chain_converges_fast(spark):
    """A 64-node chain (diameter 63) exceeds the label-propagation cap
    but the star alternation reaches its fixpoint in O(log) rounds."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "a_id long, b_id long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_propagation(edges, max_iterations=20)
    labels = cc_two_phase(edges, max_rounds=14)
    got = _canon(labels)
    assert got == [(i, 0) for i in range(64)]


def test_two_phase_matches_label_propagation_random(spark):
    """Random multi-component graphs: identical (node, label) sets from
    both algorithms."""
    rng = np.random.default_rng(9)
    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        n = 60
        pairs = set()
        for _ in range(70):
            a, b = int(rng.integers(0, n)), int(rng.integers(0, n))
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        edges = spark.createDataFrame(sorted(pairs), "a_id long, b_id long")
        a = _canon(cc_two_phase(edges))
        b = _canon(min_label_propagation(edges))
        assert a == b, f"seed={seed}"


def test_two_phase_string_ids(spark):
    """doc ids in the dedup pipeline are strings — ordering/min works
    lexicographically and both algorithms agree."""
    edges = spark.createDataFrame(
        [("d2", "d10"), ("d10", "d7"), ("x1", "x2")], "a_id string, b_id string"
    )
    a = _canon(cc_two_phase(edges))
    b = _canon(min_label_propagation(edges))
    assert a == b
    # lexicographic min: 'd10' < 'd2' < 'd7'
    assert ("d7", "d10") in a and ("x2", "x1") in a
