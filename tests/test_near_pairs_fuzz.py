"""Randomized no-false-negative check for the global near-pair join.

The hand-placed NEAR_WORLD fixtures (test_antimeridian) pin known hard
cases; this fuzz concentrates random points in the three hostile
regions at once — the polar caps, the (ring, sector) band and its
boundary with the grid-cell regime, and the dateline — and asserts the
distributed join equals the brute O(n²) haversine oracle exactly.
A missing pair here is a prefilter false negative (SURVEY §2B.1
no-false-negative invariant); an extra pair is a refine bug.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from spinix_spark.geo.cells import GridScheme
from spinix_spark.geo.geodesy import haversine_m


def _brute_pairs(ids, lat, lon, radius_m):
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if float(haversine_m(lat[i], lon[i], lat[j], lon[j])) <= radius_m:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


def _world(seed: int, n_per: int = 18):
    rng = np.random.default_rng(seed)
    lats, lons = [], []
    # polar caps (discs may cross the pole), both hemispheres
    for sign in (1.0, -1.0):
        lats += list(sign * (90.0 - rng.random(n_per) * 0.004))
        lons += list(rng.random(n_per) * 360.0 - 180.0)
    # band edge at res 9 (band regime starts ≈ ±89.19): straddle it
    lats += list(89.19 + (rng.random(n_per) - 0.5) * 0.01)
    lons += list(rng.random(n_per) * 2.0 + 49.0)
    # dateline strip at mid-lat
    lats += list(10.0 + rng.random(n_per) * 0.01)
    lons += list(
        np.where(rng.random(n_per) < 0.5, 1, -1)
        * (180.0 - rng.random(n_per) * 0.003)
    )
    lat = np.array(lats)
    lon = np.array(lons)
    ids = list(range(len(lat)))
    return ids, lat, lon


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_near_pairs_random_hostile_regions(spark, seed):
    from spinix_spark.engine.joins import near_pairs

    scheme = GridScheme(res=9)
    ids, lat, lon = _world(seed)
    pdf = pd.DataFrame({"doc_id": ids, "lat": lat, "lon": lon})
    pdf["cell"] = scheme.cell_of(lat, lon)
    df = spark.createDataFrame(pdf).repartition(4)
    radius = 300.0
    got = {(r.a_id, r.b_id) for r in near_pairs(df, scheme, radius).collect()}
    exp = _brute_pairs(ids, lat, lon, radius)
    assert got == exp
    # the random worlds must be non-vacuous in every hostile region
    assert len(exp) > 0
