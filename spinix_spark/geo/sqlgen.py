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


def point_in_expr_ring_sql(
    lat_col: str,
    lon_col: str,
    verts: Sequence[tuple[str, str]],
    inclusive: bool = False,
) -> str:
    """point_in_ring_sql generalized to EXPRESSION vertices: ``verts``
    is a closed list of (lat_expr, lon_expr) SQL strings (first ==
    last). Same ray-cast + on-edge arithmetic as the constant-vertex
    form and the NumPy kernel; degenerate edges contribute nothing
    (straddle is false when both vertex lats compare equal)."""
    terms = []
    edge_terms = []
    for (ay, ax), (by, bx) in zip(verts[:-1], verts[1:]):
        straddle = f"(({ay} > {lat_col}) <> ({by} > {lat_col}))"
        xint = f"(({bx} - {ax}) * ({lat_col} - {ay}) / ({by} - {ay}) + {ax})"
        terms.append(
            f"(CASE WHEN {straddle} AND {lon_col} < {xint} THEN 1 ELSE 0 END)"
        )
        if inclusive:
            cross = (
                f"(({bx} - {ax}) * ({lat_col} - {ay})"
                f" - ({by} - {ay}) * ({lon_col} - {ax}))"
            )
            edge_terms.append(
                f"({cross} = 0.0"
                f" AND {lon_col} >= LEAST({ax}, {bx}) AND {lon_col} <= GREATEST({ax}, {bx})"
                f" AND {lat_col} >= LEAST({ay}, {by}) AND {lat_col} <= GREATEST({ay}, {by}))"
            )
    total = " + ".join(terms) if terms else "0"
    crossing = f"((({total}) % 2) = 1)"
    if inclusive and edge_terms:
        return f"({crossing} OR {' OR '.join(edge_terms)})"
    return crossing


def dest_point_sql(
    lat_col: str, lon_col: str, meters: float, bearing_deg: float
) -> tuple[str, str]:
    """Destination point along a constant bearing/distance from a
    lat/lon column pair — the SQL form of geodesy.destination_point
    with the distance/bearing trig precomputed to constants."""
    import math

    delta = float(meters) / EARTH_RADIUS_M
    cd = math.cos(delta)
    sd = math.sin(delta)
    theta = math.radians(float(bearing_deg))
    ct = math.cos(theta)
    st = math.sin(theta)
    sin_phi2 = (
        f"(SIN(RADIANS({lat_col})) * {cd!r}"
        f" + COS(RADIANS({lat_col})) * {sd!r} * {ct!r})"
    )
    lat2 = f"DEGREES(ASIN({sin_phi2}))"
    lon2 = (
        f"DEGREES(RADIANS({lon_col}) + ATAN2({st!r} * {sd!r} * COS(RADIANS({lat_col})),"
        f" {cd!r} - SIN(RADIANS({lat_col})) * {sin_phi2}))"
    )
    return lat2, lon2


def buffer_ring_verts_sql(
    lat_col: str, lon_col: str, meters: float, steps: int
) -> list[tuple[str, str]]:
    """Closed 12-gon/4-gon ring vertices around a lat/lon column pair —
    the SQL form of rings.circle_ring (same Go integer-division
    bearings, same closing duplicate)."""
    import math

    bearings = [float(math.trunc((i * -360) / steps)) for i in range(steps + 1)]
    verts = [dest_point_sql(lat_col, lon_col, meters, b) for b in bearings]
    verts.append(verts[0])
    return verts


def point_in_buffer_ring_sql(
    plat: str, plon: str, clat: str, clon: str, meters: float, steps: int,
    inclusive: bool = True,
) -> str:
    """Point (plat, plon) inside the polygonized circle of ``meters``
    around (clat, clon) — all four coordinates are SQL expressions.
    Bit-compatible with the kernel's circle_ring + points_in_ring up to
    libm last-ulp differences (PIP is robust to those off-edge)."""
    verts = buffer_ring_verts_sql(clat, clon, meters, steps)
    return point_in_expr_ring_sql(plat, plon, verts, inclusive=inclusive)


# --- higher-order-function ring predicates --------------------------------
# For PER-ROW rings (buffered devices) the edge-pair predicates are
# expressed over an array<struct<y,x>> ring column with Spark's
# aggregate/exists/forall lambdas: the predicate body appears ONCE in
# the SQL regardless of edge counts, so the Catalyst expression tree
# stays small (a fully-expanded 13×9-edge segment-test expression is
# ~100 KB of SQL per zone and OOMs analysis). Same arithmetic as
# geo/predicates.py, evaluated JVM-side (no Python workers).


def struct_ring_sql(verts: Sequence[tuple[str, str]]) -> str:
    """(lat_expr, lon_expr) list → array<struct<y: double, x: double>>."""
    items = ", ".join(
        f"struct(CAST({vy} AS DOUBLE) AS y, CAST({vx} AS DOUBLE) AS x)"
        for vy, vx in verts
    )
    return f"array({items})"


def const_ring_sql(ring) -> str:
    """Closed constant ring (S, 2) lat/lon array → array<struct<y,x>>."""
    return struct_ring_sql([(repr(float(p[0])), repr(float(p[1]))) for p in ring])


def hof_pip_sql(py: str, px: str, ring: str, n_verts: int) -> str:
    """Inclusive ray-cast point-in-polygon over an array<struct<y,x>>
    ring expression — predicates.points_in_ring term-for-term
    (crossing count + on-edge)."""
    e = n_verts - 1  # edges
    a = f"element_at({ring}, i)"
    b = f"element_at({ring}, i + 1)"
    straddle = f"(({a}.y > {py}) <> ({b}.y > {py}))"
    xint = f"(({b}.x - {a}.x) * ({py} - {a}.y) / ({b}.y - {a}.y) + {a}.x)"
    crossings = (
        f"(aggregate(sequence(1, {e}), 0, (acc, i) -> acc + "
        f"(CASE WHEN {straddle} AND {px} < {xint} THEN 1 ELSE 0 END)) % 2 = 1)"
    )
    cross0 = (
        f"(({b}.x - {a}.x) * ({py} - {a}.y) - ({b}.y - {a}.y) * ({px} - {a}.x))"
    )
    on_edge = (
        f"exists(sequence(1, {e}), i -> {cross0} = 0.0"
        f" AND {px} >= LEAST({a}.x, {b}.x) AND {px} <= GREATEST({a}.x, {b}.x)"
        f" AND {py} >= LEAST({a}.y, {b}.y) AND {py} <= GREATEST({a}.y, {b}.y))"
    )
    return f"({crossings} OR {on_edge})"


def _hof_seg_test(a1: str, a2: str, b1: str, b2: str) -> str:
    """Inclusive segment intersection of struct<y,x> endpoint exprs —
    predicates.segments_intersect arithmetic."""

    def orient(px, py, qx, qy, rx, ry):
        return f"(({qx} - {px}) * ({ry} - {py}) - ({qy} - {py}) * ({rx} - {px}))"

    ay, ax = f"{a1}.y", f"{a1}.x"
    by, bx = f"{a2}.y", f"{a2}.x"
    cy, cx = f"{b1}.y", f"{b1}.x"
    dy, dx = f"{b2}.y", f"{b2}.x"
    d1 = orient(ax, ay, bx, by, cx, cy)
    d2 = orient(ax, ay, bx, by, dx, dy)
    d3 = orient(cx, cy, dx, dy, ax, ay)
    d4 = orient(cx, cy, dx, dy, bx, by)
    proper = (
        f"((({d1} > 0 AND {d2} < 0) OR ({d1} < 0 AND {d2} > 0))"
        f" AND (({d3} > 0 AND {d4} < 0) OR ({d3} < 0 AND {d4} > 0)))"
    )

    def on_seg(oy, ox, sy1, sx1, sy2, sx2, d):
        return (
            f"({d} = 0.0"
            f" AND {ox} >= LEAST({sx1}, {sx2}) AND {ox} <= GREATEST({sx1}, {sx2})"
            f" AND {oy} >= LEAST({sy1}, {sy2}) AND {oy} <= GREATEST({sy1}, {sy2}))"
        )

    touch = " OR ".join(
        [
            on_seg(cy, cx, ay, ax, by, bx, d1),
            on_seg(dy, dx, ay, ax, by, bx, d2),
            on_seg(ay, ax, cy, cx, dy, dx, d3),
            on_seg(by, bx, cy, cx, dy, dx, d4),
        ]
    )
    return f"({proper} OR {touch})"


def hof_rings_cross_sql(ring_a: str, na: int, ring_b: str, nb: int) -> str:
    """Any edge of ring A intersects any edge of ring B (both
    array<struct<y,x>> exprs) — predicates.ring_edges_cross."""
    test = _hof_seg_test(
        f"element_at({ring_a}, i)",
        f"element_at({ring_a}, i + 1)",
        f"element_at({ring_b}, j)",
        f"element_at({ring_b}, j + 1)",
    )
    return (
        f"exists(sequence(1, {na - 1}), i -> "
        f"exists(sequence(1, {nb - 1}), j -> {test}))"
    )


def hof_ring_intersects_ring_sql(ring_a: str, na: int, ring_b: str, nb: int) -> str:
    """predicates.ring_intersects_ring: edges cross or either first
    vertex contained in the other ring."""
    cross = hof_rings_cross_sql(ring_a, na, ring_b, nb)
    b0 = f"element_at({ring_b}, 1)"
    a0 = f"element_at({ring_a}, 1)"
    b0_in_a = hof_pip_sql(f"{b0}.y", f"{b0}.x", ring_a, na)
    a0_in_b = hof_pip_sql(f"{a0}.y", f"{a0}.x", ring_b, nb)
    return f"({cross} OR {b0_in_a} OR {a0_in_b})"


def hof_ring_contains_pts_sql(ring: str, n_verts: int, pts: str) -> str:
    """Every struct<y,x> in ``pts`` (array expr) inside ``ring`` —
    the vertex test of predicates.ring_contains_ring."""
    pip = hof_pip_sql("p.y", "p.x", ring, n_verts)
    return f"forall({pts}, p -> {pip})"


def hof_line_intersects_ring_sql(line: str, nl: int, ring: str, nr: int) -> str:
    """Open polyline (array expr, nl verts) intersects ring —
    predicates.line_intersects_ring: segment crossings or any line
    vertex inside."""
    cross = hof_rings_cross_sql(line, nl, ring, nr)  # same edge walk
    pip_any = hof_pip_sql("p.y", "p.x", ring, nr)
    any_in = f"exists({line}, p -> {pip_any})"
    return f"({cross} OR {any_in})"


def orient_sql(ax: str, ay: str, bx: str, by: str, cx: str, cy: str) -> str:
    """2D orientation — exact operand order of predicates._orient
    (x = lon, y = lat)."""
    return f"(({bx} - {ax}) * ({cy} - {ay}) - ({by} - {ay}) * ({cx} - {ax}))"


def segments_intersect_sql(
    p1: tuple[str, str],
    p2: tuple[str, str],
    q1: tuple[str, str],
    q2: tuple[str, str],
) -> str:
    """Inclusive segment intersection, points as (lat_expr, lon_expr) —
    the SQL form of predicates.segments_intersect (proper crossing +
    collinear touch), identical arithmetic."""
    ay, ax = p1
    by, bx = p2
    cy, cx = q1
    dy, dx = q2
    d1 = orient_sql(ax, ay, bx, by, cx, cy)
    d2 = orient_sql(ax, ay, bx, by, dx, dy)
    d3 = orient_sql(cx, cy, dx, dy, ax, ay)
    d4 = orient_sql(cx, cy, dx, dy, bx, by)
    proper = (
        f"((({d1} > 0 AND {d2} < 0) OR ({d1} < 0 AND {d2} > 0))"
        f" AND (({d3} > 0 AND {d4} < 0) OR ({d3} < 0 AND {d4} > 0)))"
    )

    def on_seg(oy, ox, sy1, sx1, sy2, sx2, d):
        return (
            f"({d} = 0.0"
            f" AND {ox} >= LEAST({sx1}, {sx2}) AND {ox} <= GREATEST({sx1}, {sx2})"
            f" AND {oy} >= LEAST({sy1}, {sy2}) AND {oy} <= GREATEST({sy1}, {sy2}))"
        )

    touch = " OR ".join(
        [
            on_seg(cy, cx, ay, ax, by, bx, d1),
            on_seg(dy, dx, ay, ax, by, bx, d2),
            on_seg(ay, ax, cy, cx, dy, dx, d3),
            on_seg(by, bx, cy, cx, dy, dx, d4),
        ]
    )
    return f"({proper} OR {touch})"


def _edges_of(verts: Sequence[tuple[str, str]]):
    return list(zip(verts[:-1], verts[1:]))


def rings_cross_sql(
    verts_a: Sequence[tuple[str, str]], verts_b: Sequence[tuple[str, str]]
) -> str:
    """Any edge of ring A intersects any edge of ring B (closed vertex
    lists of (lat_expr, lon_expr))."""
    tests = [
        segments_intersect_sql(a1, a2, b1, b2)
        for a1, a2 in _edges_of(verts_a)
        for b1, b2 in _edges_of(verts_b)
    ]
    return "(" + " OR ".join(tests) + ")"


def ring_intersects_ring_sql(
    verts_a: Sequence[tuple[str, str]], verts_b: Sequence[tuple[str, str]]
) -> str:
    """predicates.ring_intersects_ring: edges cross, or either ring's
    first vertex lies in the other (covers containment)."""
    cross = rings_cross_sql(verts_a, verts_b)
    b0_in_a = point_in_expr_ring_sql(verts_b[0][0], verts_b[0][1], verts_a, inclusive=True)
    a0_in_b = point_in_expr_ring_sql(verts_a[0][0], verts_a[0][1], verts_b, inclusive=True)
    return f"({cross} OR {b0_in_a} OR {a0_in_b})"


def ring_contains_ring_sql(
    outer: Sequence[tuple[str, str]], inner: Sequence[tuple[str, str]]
) -> str:
    """predicates.ring_contains_ring: every inner vertex inside outer
    (inclusive)."""
    terms = [
        point_in_expr_ring_sql(vy, vx, outer, inclusive=True) for vy, vx in inner
    ]
    return "(" + " AND ".join(terms) + ")"


def line_intersects_ring_sql(
    line: Sequence[tuple[str, str]], ring: Sequence[tuple[str, str]]
) -> str:
    """predicates.line_intersects_ring: any line segment crosses a ring
    edge, or any line vertex is inside the ring."""
    cross = [
        segments_intersect_sql(a1, a2, b1, b2)
        for a1, a2 in _edges_of(line)
        for b1, b2 in _edges_of(ring)
    ]
    v_in = [point_in_expr_ring_sql(vy, vx, ring, inclusive=True) for vy, vx in line]
    return "(" + " OR ".join(cross + v_in) + ")"


def point_on_line_sql(
    lat_col: str, lon_col: str, line: Sequence[tuple[float, float]]
) -> str:
    """Point lies on any segment of an open constant polyline
    (predicates.point_on_line: collinear + inside segment bbox)."""
    terms = []
    for (ay, ax), (by, bx) in zip(line[:-1], line[1:]):
        cross = (
            f"(({bx!r} - {ax!r}) * ({lat_col} - {ay!r})"
            f" - ({by!r} - {ay!r}) * ({lon_col} - {ax!r}))"
        )
        lo_x, hi_x = (ax, bx) if ax <= bx else (bx, ax)
        lo_y, hi_y = (ay, by) if ay <= by else (by, ay)
        terms.append(
            f"({cross} = 0.0 AND {lon_col} >= {lo_x!r} AND {lon_col} <= {hi_x!r}"
            f" AND {lat_col} >= {lo_y!r} AND {lat_col} <= {hi_y!r})"
        )
    return "(" + " OR ".join(terms) + ")"


def lon_frame_sql(lon: str, frame_lon: str) -> str:
    """SQL form of geodesy.lon_to_frame: ``lon`` shifted by ±360° into
    the frame of ``frame_lon``. Evaluates to ``lon`` UNCHANGED (same
    expression value, no re-derivation) when |lon - frame_lon| <= 180,
    so mid-longitude comparisons stay bit-identical to the unframed
    form."""
    return (
        f"(CASE WHEN {lon} - {frame_lon} > 180.0 THEN {lon} - 360.0"
        f" WHEN {frame_lon} - {lon} > 180.0 THEN {lon} + 360.0"
        f" ELSE {lon} END)"
    )


def rect_from_center_pred_sql(
    a_lat: str, a_lon: str, b_lat: str, b_lon: str, meters: float
) -> str:
    """(b_lat, b_lon) inside rect_from_center((a_lat, a_lon), meters) —
    the exact candidacy test of Devices.Near (rings.rect_from_center:
    constant dlat, latitude-corrected dlon with the clamped arcsin).
    The candidate lon is framed to the center (±360° shift) so the
    unnormalized rect bounds test is wrap-correct at the antimeridian,
    mirroring the kernel's lon_to_frame(other.lon, batch.lon)."""
    import math

    r = float(meters) / EARTH_RADIUS_M
    dlat = repr(math.degrees(r))
    sin_r = repr(math.sin(r))
    dlon = (
        f"DEGREES(ASIN(LEAST(GREATEST({sin_r} / "
        f"GREATEST(COS(RADIANS({a_lat})), 1e-12), -1.0), 1.0)))"
    )
    b_lon_f = lon_frame_sql(b_lon, a_lon)
    return (
        f"({b_lat} >= {a_lat} - {dlat} AND {b_lat} <= {a_lat} + {dlat}"
        f" AND {b_lon_f} >= {a_lon} - {dlon} AND {b_lon_f} <= {a_lon} + {dlon})"
    )
