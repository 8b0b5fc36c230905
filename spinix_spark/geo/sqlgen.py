"""SQL expression generators shared by the Spark plan and the DuckDB oracle.

For fixed geometries (a known polygon ring, a known center) the exact
spatial predicates are generated as *plain SQL expressions* from one
source of truth, so that:

- the Spark side stays inside whole-stage codegen (no Python, no UDF on
  the scan side — the 100 TB-scale hot path), and
- the DuckDB oracle runs the byte-identical expression text, making the
  driver's value-hash comparison meaningful.

Both engines evaluate IEEE-754 doubles with the same expression tree,
so results agree bit-for-bit except at ulp-boundary cases, which the
deterministic synthetic inputs avoid.

The formulas mirror geo/geodesy.py (haversine, R=6371e3) and
geo/predicates.py (ray-casting crossing count, boundary-exclusive in
this SQL form).
"""

from __future__ import annotations

from collections.abc import Sequence

EARTH_RADIUS_M = 6371e3


def haversine_sql(lat_a: str, lon_a: str, lat_b: str, lon_b: str) -> str:
    """Great-circle distance in meters between two lat/lon column exprs."""
    phi1 = f"RADIANS({lat_a})"
    phi2 = f"RADIANS({lat_b})"
    dphi_half = f"(RADIANS({lat_b}) - RADIANS({lat_a})) / 2.0"
    dlam_half = f"(RADIANS({lon_b}) - RADIANS({lon_a})) / 2.0"
    a = (
        f"(SIN({dphi_half}) * SIN({dphi_half})"
        f" + COS({phi1}) * COS({phi2}) * SIN({dlam_half}) * SIN({dlam_half}))"
    )
    return f"({EARTH_RADIUS_M!r} * 2.0 * ATAN2(SQRT({a}), SQRT(1.0 - {a})))"


def round50_sql(expr: str, unit: float = 50.0) -> str:
    """Half-away-from-zero rounding to 50 m (runtime.go:2226-2228);
    FLOOR(x/u + 0.5)*u matches Go math.Round for non-negative x.

    The unit is CAST to DOUBLE: Spark parses a bare ``50.0`` literal as
    DECIMAL(3,1), which would silently turn the product into a decimal
    and break cross-engine value parity."""
    u = f"CAST({unit!r} AS DOUBLE)"
    return f"(FLOOR({expr} / {u} + 0.5) * {u})"


def point_in_ring_sql(
    lat_col: str,
    lon_col: str,
    ring: Sequence[tuple[float, float]],
    inclusive: bool = False,
) -> str:
    """Ray-cast crossing-count point-in-polygon for a FIXED closed ring
    [(lat, lon), ...] (first == last). Returns a boolean SQL expr.

    Uses the identical straddle + x-intersection arithmetic as the
    vectorized kernel (geo/predicates.py:points_in_ring). With
    ``inclusive=True`` the kernel's on-edge clause (collinear + in
    edge bbox) is appended, making the SQL form bit-identical to the
    NumPy kernel including boundary points."""
    terms = []
    edge_terms = []
    for (ay, ax), (by, bx) in zip(ring[:-1], ring[1:]):
        if ay == by and ax == bx:
            continue
        straddle = f"(({ay!r} > {lat_col}) <> ({by!r} > {lat_col}))"
        xint = f"(({bx!r} - {ax!r}) * ({lat_col} - {ay!r}) / ({by!r} - {ay!r}) + {ax!r})"
        terms.append(
            f"(CASE WHEN {straddle} AND {lon_col} < {xint} THEN 1 ELSE 0 END)"
        )
        if inclusive:
            cross = (
                f"(({bx!r} - {ax!r}) * ({lat_col} - {ay!r})"
                f" - ({by!r} - {ay!r}) * ({lon_col} - {ax!r}))"
            )
            lo_x, hi_x = (ax, bx) if ax <= bx else (bx, ax)
            lo_y, hi_y = (ay, by) if ay <= by else (by, ay)
            edge_terms.append(
                f"({cross} = 0.0 AND {lon_col} >= {lo_x!r} AND {lon_col} <= {hi_x!r}"
                f" AND {lat_col} >= {lo_y!r} AND {lat_col} <= {hi_y!r})"
            )
    total = " + ".join(terms) if terms else "0"
    crossing = f"((({total}) % 2) = 1)"
    if inclusive and edge_terms:
        return f"({crossing} OR {' OR '.join(edge_terms)})"
    return crossing


def bbox_contains_sql(
    lat_col: str, lon_col: str, minlat: float, minlon: float, maxlat: float, maxlon: float
) -> str:
    return (
        f"({lat_col} >= {minlat!r} AND {lat_col} <= {maxlat!r}"
        f" AND {lon_col} >= {minlon!r} AND {lon_col} <= {maxlon!r})"
    )
