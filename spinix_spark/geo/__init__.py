from spinix_spark.geo.geodesy import (
    EARTH_RADIUS_M,
    MIN_DIST_METERS,
    destination_point,
    haversine_m,
    normalize_distance,
    region_size_from_meters,
    round_to_unit,
)
from spinix_spark.geo.rings import circle_ring, rect_ring, ring_bbox
from spinix_spark.geo.cells import GridScheme, DEFAULT_SCHEME

__all__ = [
    "EARTH_RADIUS_M",
    "MIN_DIST_METERS",
    "haversine_m",
    "destination_point",
    "round_to_unit",
    "normalize_distance",
    "region_size_from_meters",
    "circle_ring",
    "rect_ring",
    "ring_bbox",
    "GridScheme",
    "DEFAULT_SCHEME",
]
