"""Geodesic primitives, vectorized over NumPy arrays.

Replicates the numeric behavior the reference relies on (all public
formulas — the reference calls tidwall/geojson's ``geo`` helpers):

- great-circle distance: haversine on a sphere of radius 6371e3 m
  (used by /root/reference/runtime.go:1796, devices.go:109,
  object.go:50 via ``geo.DistanceTo``)
- destination point along a bearing (``geo.DestinationPoint``,
  /root/reference/region.go:250, region.go:324)
- 50 m rounding of distances before comparison
  (/root/reference/runtime.go:19-25, 2226-2228)
- region-size tiers + distance clamping
  (/root/reference/region.go:14-22, 209-215, 273-292)

Everything accepts scalars or ndarrays and stays in float64 so the same
expression evaluated in Spark SQL / DuckDB produces bit-identical
results (IEEE-754 double ops are deterministic given the same order).
"""

from __future__ import annotations

import math

import numpy as np

EARTH_RADIUS_M = 6371e3  # spherical earth radius used throughout

# Distances are rounded to the nearest 50 m before any comparison, and
# 50 m is the floor for Near-query radii and the "device actually
# moved" threshold (runtime.go:19-25, devices.go:109-119).
MIN_DIST_METERS = 50.0

# H3-resolution tiers of the reference (region.go:14-22). In this
# engine they only drive the @-candidate search-radius clamps, which
# ARE visible semantics for negated spatial verbs (runtime.go:1515-1525).
TINY_REGION_SIZE = 3
SMALL_REGION_SIZE = 2
LARGE_REGION_SIZE = 1
TINY_REGION_THRESHOLD_M = 50_000.0
SMALL_REGION_THRESHOLD_M = 100_000.0
LARGE_REGION_THRESHOLD_M = 300_000.0


def lon_to_frame(lon, frame_lon):
    """Representation of ``lon`` within ±180° of ``frame_lon`` — the
    ±360° shift that makes planar longitude arithmetic (rect tests,
    polygonized-circle PIP) wrap-correct at the antimeridian.

    BITWISE no-op when |lon - frame_lon| <= 180 (the mid-latitude hot
    path and every pre-round-5 fixture): the value is returned
    unchanged, not re-derived, so existing parity is untouched. Only
    points more than half a world apart in raw coordinates — i.e. a
    dateline-straddling pair — are shifted."""
    lon = np.asarray(lon, dtype=np.float64)
    f = np.asarray(frame_lon, dtype=np.float64)
    return np.where(
        lon - f > 180.0,
        lon - 360.0,
        np.where(f - lon > 180.0, lon + 360.0, lon),
    )


def haversine_m(lat_a, lon_a, lat_b, lon_b):
    """Great-circle distance in meters (vectorized)."""
    phi1 = np.radians(np.asarray(lat_a, dtype=np.float64))
    lam1 = np.radians(np.asarray(lon_a, dtype=np.float64))
    phi2 = np.radians(np.asarray(lat_b, dtype=np.float64))
    lam2 = np.radians(np.asarray(lon_b, dtype=np.float64))
    dphi = phi2 - phi1
    dlam = lam2 - lam1
    a = np.sin(dphi / 2.0) ** 2 + np.cos(phi1) * np.cos(phi2) * np.sin(dlam / 2.0) ** 2
    c = 2.0 * np.arctan2(np.sqrt(a), np.sqrt(1.0 - a))
    return EARTH_RADIUS_M * c


def destination_point(lat, lon, meters, bearing_deg):
    """Destination lat/lon from a start point, distance, and bearing.

    Standard spherical direct formula; matches the ring construction the
    reference uses for polygonized circles (region.go:246-271,
    ast.go:336-354).
    """
    delta = np.asarray(meters, dtype=np.float64) / EARTH_RADIUS_M
    theta = np.radians(np.asarray(bearing_deg, dtype=np.float64))
    phi1 = np.radians(np.asarray(lat, dtype=np.float64))
    lam1 = np.radians(np.asarray(lon, dtype=np.float64))
    phi2 = np.arcsin(
        np.sin(phi1) * np.cos(delta) + np.cos(phi1) * np.sin(delta) * np.cos(theta)
    )
    lam2 = lam1 + np.arctan2(
        np.sin(theta) * np.sin(delta) * np.cos(phi1),
        np.cos(delta) - np.sin(phi1) * np.sin(phi2),
    )
    return np.degrees(phi2), np.degrees(lam2)


def round_to_unit(v, unit: float = MIN_DIST_METERS):
    """round(v/unit)*unit with Go's math.Round (half away from zero).

    runtime.go:2226-2228. NumPy's ``np.round`` is half-to-even, so use
    floor(v/unit + 0.5) which equals math.Round for the non-negative
    distances this is applied to.
    """
    v = np.asarray(v, dtype=np.float64)
    return np.floor(v / unit + 0.5) * unit


def region_size_from_meters(meters: float) -> int:
    """Radius → region-size tier (region.go:209-215)."""
    if meters <= TINY_REGION_THRESHOLD_M:
        return TINY_REGION_SIZE
    if meters <= SMALL_REGION_THRESHOLD_M:
        return SMALL_REGION_SIZE
    return LARGE_REGION_SIZE


def normalize_distance(meters: float, region_size: int) -> float:
    """Clamp a search radius to its tier ceiling (region.go:273-292).

    Part of the visible semantics for ``@``-candidate negated verbs
    (SURVEY.md §2B.1): the candidate universe is everything within the
    clamped radius.
    """
    if meters < MIN_DIST_METERS:
        return MIN_DIST_METERS
    if region_size == TINY_REGION_SIZE and meters > TINY_REGION_THRESHOLD_M:
        return TINY_REGION_THRESHOLD_M
    if region_size == SMALL_REGION_SIZE and meters > SMALL_REGION_THRESHOLD_M:
        return SMALL_REGION_THRESHOLD_M
    if region_size == LARGE_REGION_SIZE and meters > LARGE_REGION_THRESHOLD_M:
        return LARGE_REGION_THRESHOLD_M
    return meters


def haversine_scalar(lat_a: float, lon_a: float, lat_b: float, lon_b: float) -> float:
    """Scalar haversine using ``math`` so driver-side code (rule
    compiler auto-centering, engine.go:137-188) doesn't pay ndarray
    overhead and matches the vectorized result bit-for-bit."""
    phi1 = math.radians(lat_a)
    lam1 = math.radians(lon_a)
    phi2 = math.radians(lat_b)
    lam2 = math.radians(lon_b)
    a = (
        math.sin((phi2 - phi1) / 2.0) ** 2
        + math.cos(phi1) * math.cos(phi2) * math.sin((lam2 - lam1) / 2.0) ** 2
    )
    c = 2.0 * math.atan2(math.sqrt(a), math.sqrt(1.0 - a))
    return EARTH_RADIUS_M * c
