"""Property-based invariants (hypothesis) for the DSL and the geometry
kernel — complements the golden fixtures with randomized coverage."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spinix_spark.dsl import CompileError, ParseError, compile_spec, parse_spec
from spinix_spark.geo.geodesy import haversine_m, round_to_unit
from spinix_spark.geo.predicates import (
    points_in_ring,
    ring_contains_ring,
    ring_intersects_ring,
    segments_intersect,
)
from spinix_spark.geo.rings import circle_ring

XID = "c5vj26evvhfjvfseauk0"

lat_s = st.floats(min_value=-60, max_value=60, allow_nan=False)
lon_s = st.floats(min_value=-170, max_value=170, allow_nan=False)
radius_s = st.floats(min_value=10, max_value=50_000, allow_nan=False)


@settings(max_examples=60, deadline=None)
@given(lat_s, lon_s, radius_s, st.integers(min_value=4, max_value=16))
def test_circle_ring_invariants(lat, lon, r, steps):
    ring = circle_ring(lat, lon, r, steps)
    assert ring.shape == (steps + 2, 2)
    d = haversine_m(lat, lon, ring[:, 0], ring[:, 1])
    assert np.allclose(d, r, rtol=1e-9)
    # center is inside its own polygonized circle
    assert bool(points_in_ring(lat, lon, ring))


@settings(max_examples=60, deadline=None)
@given(lat_s, lon_s, radius_s)
def test_contains_implies_intersects(lat, lon, r):
    big = circle_ring(lat, lon, r, 12)
    small = circle_ring(lat, lon, r / 3, 12)
    assert bool(ring_contains_ring(big, small))
    assert bool(ring_intersects_ring(big, small))
    assert bool(ring_intersects_ring(small, big))  # symmetry


coord_s = st.tuples(
    st.integers(min_value=-50, max_value=50).map(float),
    st.integers(min_value=-50, max_value=50).map(float),
)


@settings(max_examples=100, deadline=None)
@given(coord_s, coord_s, coord_s, coord_s)
def test_segment_intersection_symmetry(p1, p2, q1, q2):
    """Symmetry holds exactly for grid coordinates (exact float
    arithmetic). At degenerate near-collinear float inputs the
    orientation predicate is order-sensitive at ulp scale — same as
    any double-based geometry kernel, including the reference's."""
    a = np.array(p1)
    b = np.array(p2)
    c = np.array(q1)
    d = np.array(q2)
    r1 = bool(segments_intersect(a, b, c, d))
    r2 = bool(segments_intersect(c, d, a, b))  # argument symmetry
    r3 = bool(segments_intersect(b, a, d, c))  # endpoint reversal
    assert r1 == r2 == r3
    # a segment always intersects itself
    assert bool(segments_intersect(a, b, a, b))


@settings(max_examples=60, deadline=None)
@given(st.floats(min_value=0, max_value=1e7, allow_nan=False))
def test_round50_invariants(v):
    r = float(round_to_unit(v))
    assert r % 50 == 0
    assert abs(r - v) <= 25.0


@settings(max_examples=40, deadline=None)
@given(
    st.sampled_from(["speed", "battery", "temperature", "humidity", "status"]),
    # non-negative only: a leading '-' in a list literal consumes a
    # parse-loop slot in the reference (parser.go:374-443), making
    # `[-1 .. 0]` a parse error there — replicated bug-for-bug here
    # (pinned below)
    st.integers(min_value=0, max_value=1000),
    st.integers(min_value=1, max_value=2000),
)
def test_dsl_range_roundtrip(kw, begin, width):
    spec = compile_spec(f"{kw} range [{begin} .. {begin + width}]")
    node = spec.nodes[0]
    assert node.begin == begin and node.end == begin + width
    with np.errstate(all="ignore"):
        try:
            compile_spec(f"{kw} range [{begin + width} .. {begin}]")
            raise AssertionError("reversed range must not compile")
        except CompileError:
            pass


def test_negative_range_bound_is_parse_error():
    """Pin the reference quirk: '-' inside a list literal shifts the
    '..' periods past the allowed loop positions → parse error
    (parser.go:374-443)."""
    import pytest

    with pytest.raises(ParseError):
        parse_spec("speed range [-1 .. 0]")


@settings(max_examples=40, deadline=None)
@given(st.text(alphabet="abcdefghijklmnop qrstuvwxyz0123456789", max_size=40))
def test_parser_never_crashes_unexpectedly(s):
    """Arbitrary input either parses or raises ParseError — never any
    other exception type."""
    try:
        parse_spec(s)
    except ParseError:
        pass
