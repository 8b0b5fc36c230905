"""Polygonized-circle ring construction, vectorized.

Replicates the reference's ring builder exactly (makeCircle,
/root/reference/region.go:245-270): for ``i in 0..steps`` the bearing
is the Go *integer* division ``(i * -360) / steps`` (clockwise), each
vertex is a geodesic destination point, and the first vertex is
appended once more at the end — so a ring has ``steps + 2`` vertices.
Buffered devices use 12 steps for ``:radius`` and 4 for ``:bbox``
(ast.go:336-354); rule geofences use 8 (region.go:24).

Rings are float64 arrays of shape (..., steps+2, 2) with lat in
[..., 0] and lon in [..., 1] (the reference stores Point{X: lat,
Y: lon}).
"""

from __future__ import annotations

import math

import numpy as np

from spinix_spark.geo.geodesy import EARTH_RADIUS_M, destination_point

RULE_CIRCLE_STEPS = 8  # region.go:24
RADIUS_STEPS = 12  # ast.go:338-343
BBOX_STEPS = 4


def circle_ring(lat, lon, meters: float, steps: int) -> np.ndarray:
    """Vectorized makeCircle: lat/lon scalars or (N,) arrays →
    (steps+2, 2) or (N, steps+2, 2) ring array."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    scalar = lat.ndim == 0
    if scalar:
        lat = lat[None]
        lon = lon[None]
    bearings = np.array(
        [float(math.trunc((i * -360) / steps)) for i in range(steps + 1)],
        dtype=np.float64,
    )
    # broadcast (N, 1) x (steps+1,) -> (N, steps+1)
    dlat, dlon = destination_point(
        lat[:, None], lon[:, None], float(meters), bearings[None, :]
    )
    ring = np.stack([dlat, dlon], axis=-1)  # (N, steps+1, 2)
    ring = np.concatenate([ring, ring[:, :1, :]], axis=1)  # close: (N, steps+2, 2)
    return ring[0] if scalar else ring


def ring_bbox(ring: np.ndarray) -> np.ndarray:
    """Ring (..., S, 2) → bbox (..., 4) as (minlat, minlon, maxlat, maxlon)."""
    mins = ring.min(axis=-2)
    maxs = ring.max(axis=-2)
    return np.concatenate([mins, maxs], axis=-1)


def rect_ring(bbox: np.ndarray) -> np.ndarray:
    """bbox (..., 4) → closed 5-vertex rect ring (..., 5, 2)."""
    minlat = bbox[..., 0]
    minlon = bbox[..., 1]
    maxlat = bbox[..., 2]
    maxlon = bbox[..., 3]
    pts = np.stack(
        [
            np.stack([minlat, minlon], axis=-1),
            np.stack([minlat, maxlon], axis=-1),
            np.stack([maxlat, maxlon], axis=-1),
            np.stack([maxlat, minlon], axis=-1),
            np.stack([minlat, minlon], axis=-1),
        ],
        axis=-2,
    )
    return pts


def rect_from_center(lat, lon, meters: float) -> np.ndarray:
    """Bounding rect of a circle (geo.RectFromCenter semantics used by
    calcRect, region.go:338-344): latitude span is the angular radius;
    longitude span accounts for latitude. Returns (..., 4) bbox
    (minlat, minlon, maxlat, maxlon)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    r = float(meters) / EARTH_RADIUS_M
    dlat = np.degrees(r)
    minlat = lat - dlat
    maxlat = lat + dlat
    latr = np.radians(lat)
    # delta-lon for a spherical cap at this latitude; clamp the asin
    # argument for poles/large radii
    sin_ratio = np.clip(np.sin(r) / np.maximum(np.cos(latr), 1e-12), -1.0, 1.0)
    dlon = np.degrees(np.arcsin(sin_ratio))
    minlon = lon - dlon
    maxlon = lon + dlon
    return np.stack([minlat, minlon, maxlat, maxlon], axis=-1)
