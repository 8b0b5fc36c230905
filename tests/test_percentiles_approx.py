"""approx_percentile (the 100 TB bounded-memory path) must track the
exact `percentile` gate query within tight tolerance at test scale —
both forms exposed side by side per-group."""

from __future__ import annotations

from spinix_spark.queries_analytics import (
    ANALYTICS_QUERIES,
    grouped_percentiles_approx,
)

SF_DIR = "/root/testdata/sf0.01"


def test_approx_percentiles_track_exact(spark):
    exact_fn, _sql = ANALYTICS_QUERIES["grouped_percentiles"]
    exact = {
        r.event_type: (float(r.p50), float(r.p90), int(r.n))
        for r in exact_fn(spark, SF_DIR).collect()
    }
    approx = {
        r.event_type: (float(r.p50), float(r.p90), int(r.n))
        for r in grouped_percentiles_approx(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx) and exact
    for et, (p50, p90, n) in exact.items():
        a50, a90, an = approx[et]
        assert an == n  # counts are exact on both paths
        # approx_percentile returns an actual group member; the exact
        # form interpolates — allow 1% relative slack
        assert abs(a50 - p50) <= max(0.01 * abs(p50), 1e-9), (et, a50, p50)
        assert abs(a90 - p90) <= max(0.01 * abs(p90), 1e-9), (et, a90, p90)
