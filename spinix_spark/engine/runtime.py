"""Vectorized rule evaluation over a batch of device rows.

This is the computational core shared by the local engine and the Spark
``mapInPandas`` refinement stage: one compiled rule is evaluated
against N device rows at once with NumPy — no per-row Python in the
hot path (input_hint mandate).

Semantics replicate the reference's evaluater implementations
operator-for-operator (file:line cited per class below), including:

- the per-candidate existential negation semantics: ``match.Ok``
  latches true if ANY candidate satisfies the (possibly negated)
  predicate; every satisfying candidate id is appended to
  ``right_refs`` (runtime.go:1334-1341, 1632-1638; SURVEY.md §2A.1)
- the device-kind × verb × zone-kind predicate truth tables
  (runtime.go:1259-1333 for objects, 1530-1700 for devices)
- the ``@``-candidate search-radius clamps, which are visible
  semantics for negated verbs (runtime.go:1515-1525, devices.go:167-171)
- the left-to-right AND/OR fold with AND-skip and per-node Match
  capture (runtime.go:165-236)
- the distance comparators' last-candidate-wins ``Ok`` plus
  per-candidate ref collection (runtime.go:1795-1825 — replicated
  bug-for-bug)
- trigger state: check → evaluate → changeState (hits increment per
  evaluation, not per match — runtime.go:224-235)

Determinism note: the reference stamps state time with the wall clock
(``State.SetTime(time.Now())``, runtime.go:153) but evaluates trigger
windows against *device* time (``mapper.dateTime``). For reproducible
distributed runs this engine uses device event-time for both by
default; pass ``clock=`` to override.
"""

from __future__ import annotations

from dataclasses import dataclass

import math

import numpy as np
import pandas as pd

from spinix_spark.dsl import ast_nodes as ast
from spinix_spark.dsl.compiler import (
    CompiledSpec,
    EqualDevicesOp,
    EqualFloatOp,
    EqualIntOp,
    EqualObjectOp,
    EqualStrOp,
    EqualTimeOp,
    InFloatOp,
    InIntOp,
    InStringOp,
    RangeDateTimeOp,
    RangeFloatOp,
    RangeIntOp,
    RangeTimeOp,
    SpDDevicesOp,
    SpDevicesObjectOp,
    SpDevicesOp,
    SpObjectOp,
)
from spinix_spark.dsl.tokens import Token
from spinix_spark.engine.stores import (
    DeviceSnapshot,
    StateStore,
    Zone,
    ZoneStore,
    state_need_reset,
    state_reset,
)
from spinix_spark.geo.geodesy import (
    EARTH_RADIUS_M,
    MIN_DIST_METERS,
    SMALL_REGION_SIZE,
    SMALL_REGION_THRESHOLD_M,
    TINY_REGION_SIZE,
    TINY_REGION_THRESHOLD_M,
    haversine_m,
    lon_to_frame,
    normalize_distance,
    round_to_unit,
)
from spinix_spark.geo.predicates import (
    line_intersects_ring,
    point_on_line,
    points_equal,
    points_in_ring,
    rect_contains_point,
    rect_contains_rect,
    rect_intersects_rect,
    ring_contains_ring,
    ring_intersects_ring,
)
from spinix_spark.geo.rings import circle_ring, rect_from_center, rect_ring, ring_bbox


@dataclass
class Reference:
    """Storage handles passed through evaluation (≙ the reference's
    ``reference`` struct)."""

    zones: ZoneStore
    devices: DeviceSnapshot
    states: StateStore


@dataclass
class NodeResult:
    ok: np.ndarray  # bool (N,)
    left_kw: Token
    right_kw: Token
    op: Token
    left_is_target: bool = True  # Left.Refs = [target id] when ok
    right_refs: list[list[str]] | None = None  # per-device satisfied refs


class DeviceBatch:
    """Column view over a pandas DataFrame of device rows with golden
    defaults for absent attributes."""

    _FLOAT_COLS = (
        "speed",
        "battery",
        "temperature",
        "humidity",
        "luminosity",
        "pressure",
        "fuel_level",
        "alt",
    )
    _STR_COLS = ("model", "brand", "owner", "imei")

    def __init__(self, pdf: pd.DataFrame) -> None:
        self.pdf = pdf
        self.n = len(pdf)
        self.device_id = pdf["device_id"].to_numpy(dtype=object)
        self.layer_id = (
            pdf["layer_id"].to_numpy(dtype=object)
            if "layer_id" in pdf
            else np.full(self.n, "0" * 20, dtype=object)
        )
        self.lat = pdf["lat"].to_numpy(dtype=np.float64)
        self.lon = pdf["lon"].to_numpy(dtype=np.float64)
        self.datetime = (
            pdf["datetime"].to_numpy(dtype=np.int64)
            if "datetime" in pdf
            else np.zeros(self.n, dtype=np.int64)
        )
        self.status = (
            pdf["status"].to_numpy(dtype=np.int64)
            if "status" in pdf
            else np.zeros(self.n, dtype=np.int64)
        )
        self._cache: dict = {}

    def float_col(self, name: str) -> np.ndarray:
        if name == "status":
            return self.status.astype(np.float64)
        if name in self.pdf:
            # zero-fill nulls: the reference's device attributes are Go
            # value types (missing = zero value); this also matches the
            # SQL path's coalesce(col, 0.0). nan_to_num COPIES —
            # to_numpy may return a view of the backing pandas block,
            # and an in-place fill would mutate batch.pdf for every
            # other reader of the column.
            return np.nan_to_num(
                self.pdf[name].to_numpy(dtype=np.float64),
                nan=0.0,
                posinf=np.inf,  # only NaN is "missing"; keep ±inf as-is
                neginf=-np.inf,
            )
        return np.zeros(self.n, dtype=np.float64)

    def str_col(self, name: str) -> np.ndarray:
        if name in self.pdf:
            # zero-fill nulls BEFORE astype(str) — astype alone renders
            # None as 'None'; the reference's zero value (and the SQL
            # path's coalesce(col, '')) is the empty string
            return self.pdf[name].fillna("").astype(str).to_numpy(dtype=object)
        return np.full(self.n, "", dtype=object)

    def ts(self) -> pd.DatetimeIndex:
        if "ts" not in self._cache:
            self._cache["ts"] = pd.to_datetime(self.datetime, unit="s", utc=True)
        return self._cache["ts"]

    def rings(self, meters: float, steps: int) -> np.ndarray:
        key = ("rings", meters, steps)
        if key not in self._cache:
            self._cache[key] = circle_ring(self.lat, self.lon, meters, steps)
        return self._cache[key]


# --- attribute value mapper (runtime.go:2126-2224) ----------------------


def float_val(batch: DeviceBatch, kw: Token) -> np.ndarray:
    if kw is Token.FUELLEVEL:
        return batch.float_col("fuel_level")
    if kw is Token.PRESSURE:
        return batch.float_col("pressure")
    if kw is Token.LUMINOSITY:
        return batch.float_col("luminosity")
    if kw is Token.HUMIDITY:
        return batch.float_col("humidity")
    if kw is Token.TEMPERATURE:
        return batch.float_col("temperature")
    if kw is Token.BATTERY_CHARGE:
        return batch.float_col("battery")
    if kw is Token.STATUS:
        return batch.status.astype(np.float64)
    if kw is Token.SPEED:
        return batch.float_col("speed")
    ts = batch.ts()
    if kw is Token.YEAR:
        return ts.year.to_numpy(dtype=np.float64)
    if kw is Token.MONTH:
        return ts.month.to_numpy(dtype=np.float64)
    if kw is Token.WEEK:
        return ts.isocalendar().week.to_numpy().astype(np.float64)
    if kw is Token.DAY:
        return ts.day.to_numpy(dtype=np.float64)
    if kw is Token.HOUR:
        return ts.hour.to_numpy(dtype=np.float64)
    return np.zeros(batch.n, dtype=np.float64)


def int_val(batch: DeviceBatch, kw: Token) -> np.ndarray:
    # Go int(float64) truncates toward zero
    return np.trunc(float_val(batch, kw)).astype(np.int64)


# weekday/month renderings (time.Weekday/Month String(), runtime.go:
# 2206-2212) as lookup tables — pandas .strftime is per-element Python
# (it calls datetime.strftime row by row), a hot-path trap for string
# comparators over large Arrow batches; integer field extraction +
# NumPy fancy indexing is fully vectorized
_DAY_NAMES = np.array(
    ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday"],
    dtype=object,
)
_MONTH_NAMES = np.array(
    ["January", "February", "March", "April", "May", "June", "July",
     "August", "September", "October", "November", "December"],
    dtype=object,
)


def str_val(batch: DeviceBatch, kw: Token) -> np.ndarray:
    if kw is Token.MODEL:
        return batch.str_col("model")
    if kw is Token.BRAND:
        return batch.str_col("brand")
    if kw is Token.OWNER:
        return batch.str_col("owner")
    if kw is Token.IMEI:
        return batch.str_col("imei")
    ts = batch.ts()
    if kw is Token.MONTH:
        return _MONTH_NAMES[ts.month.to_numpy() - 1]
    if kw is Token.DAY:
        return _DAY_NAMES[ts.dayofweek.to_numpy()]
    if kw is Token.DATE:
        # UTC datetime64 truncated to days renders exactly "%Y-%m-%d"
        return ts.tz_localize(None).values.astype("datetime64[D]").astype(str).astype(object)
    if kw is Token.DATETIME:
        iso = ts.tz_localize(None).values.astype("datetime64[s]").astype(str)
        return np.char.add(iso, "Z").astype(object)
    return np.full(batch.n, "", dtype=object)


def _day_anchor(batch: DeviceBatch, hour: int, minute: int) -> np.ndarray:
    """Unix seconds of today-at-hh:mm in UTC per device
    (runtime.go:1904, 1044-1046)."""
    ts = batch.ts()
    midnight = ts.normalize().asi8 // 1_000_000_000
    return midnight + hour * 3600 + minute * 60


# --- zone predicates (object side of runtime.go:1259-1333) ---------------


def _part_mid_lon(part: np.ndarray) -> float:
    """Longitude frame anchor of one zone component (ring / line):
    the midpoint of its lon extent. Zone parts never straddle ±180°
    (RFC 7946 split convention; unnormalized lons allowed), so each
    part is continuous around its own mid."""
    lons = part[:, 1]
    return float(lons.min() + lons.max()) / 2.0


def zone_intersects_poly(zone: Zone, rings: np.ndarray) -> np.ndarray:
    """Buffered device rings vs zone — per zone part, the per-row
    target rings are rigidly shifted by ±360° into the part's frame
    (``_rings_to_frame``; bitwise no-op mid-longitude) so planar
    ring-ring math is wrap-correct at the antimeridian."""
    n = rings.shape[0]
    ring_lons = rings[..., 1].mean(axis=-1)
    out = np.zeros(n, dtype=bool)
    for zr in zone.rings:
        out |= ring_intersects_ring(
            _rings_to_frame(rings, ring_lons, _part_mid_lon(zr)), zr
        )
    for zl in zone.lines:
        out |= line_intersects_ring(
            zl, _rings_to_frame(rings, ring_lons, _part_mid_lon(zl))
        )
    if zone.points is not None:
        for p in np.atleast_2d(zone.points):
            out |= points_in_ring(
                np.full(n, p[0]),
                lon_to_frame(np.full(n, p[1]), ring_lons),
                rings,
            )
    return out


def zone_within_poly(zone: Zone, rings: np.ndarray) -> np.ndarray:
    n = rings.shape[0]
    ring_lons = rings[..., 1].mean(axis=-1)
    out = np.ones(n, dtype=bool)
    any_part = False
    for zr in zone.rings:
        out &= ring_contains_ring(
            _rings_to_frame(rings, ring_lons, _part_mid_lon(zr)), zr
        )
        any_part = True
    for zl in zone.lines:
        # frame every line vertex into each row's ring frame: (n, V)
        out &= points_in_ring(
            zl[:, 0],
            lon_to_frame(zl[None, :, 1], ring_lons[:, None]),
            rings[:, None, :, :],
        ).all(axis=-1)
        any_part = True
    if zone.points is not None:
        for p in np.atleast_2d(zone.points):
            out &= points_in_ring(
                np.full(n, p[0]),
                lon_to_frame(np.full(n, p[1]), ring_lons),
                rings,
            )
            any_part = True
    return out if any_part else np.zeros(n, dtype=bool)


def zone_intersects_rect(zone: Zone, rect: np.ndarray) -> np.ndarray:
    return zone_intersects_poly(zone, rect_ring(rect))


def zone_within_rect(zone: Zone, rect: np.ndarray) -> np.ndarray:
    # all-points-in-axis-aligned-rect ⇔ bbox within rect; the zone
    # bbox lon interval is rigidly shifted into each rect's frame
    # (exact ±360°, no-op mid-longitude) for dateline correctness
    rect = np.asarray(rect, dtype=np.float64)
    b = zone.bbox
    zc = (float(b[1]) + float(b[3])) / 2.0
    dl = lon_to_frame(zc, (rect[..., 1] + rect[..., 3]) / 2.0) - zc
    zb = np.empty(rect.shape)
    zb[..., 0] = b[0]
    zb[..., 2] = b[2]
    zb[..., 1] = b[1] + dl
    zb[..., 3] = b[3] + dl
    return rect_contains_rect(rect, zb)


def zone_intersects_point(zone: Zone, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Point device vs zone — the point lon is framed by ±360° into
    each zone part's frame (no-op mid-longitude); circle zones are
    exact haversine, inherently wrap/pole-correct."""
    n = lat.shape[0]
    out = np.zeros(n, dtype=bool)
    if zone.circle is not None:
        clat, clon, r = zone.circle
        return np.asarray(haversine_m(lat, lon, clat, clon) <= r)
    for zr in zone.rings:
        out |= points_in_ring(lat, lon_to_frame(lon, _part_mid_lon(zr)), zr)
    for zl in zone.lines:
        out |= point_on_line(lat, lon_to_frame(lon, _part_mid_lon(zl)), zl)
    if zone.points is not None:
        for p in np.atleast_2d(zone.points):
            out |= points_equal(lat, lon_to_frame(lon, float(p[1])), p[0], p[1])
    return out


def zone_within_point(zone: Zone, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    # only a point object can be "within" a point
    if zone.kind in ("point", "multiPoint") and zone.points is not None:
        out = np.ones(lat.shape[0], dtype=bool)
        for p in np.atleast_2d(zone.points):
            out &= points_equal(lat, lon_to_frame(lon, float(p[1])), p[0], p[1])
        return out
    return np.zeros(lat.shape[0], dtype=bool)


def _zone_verb_mask(
    zone: Zone, op: Token, kind: Token, batch: DeviceBatch, meters: float, steps: int
) -> np.ndarray:
    """Truth table of spObjectOp (runtime.go:1259-1333) for one zone
    against every device in the batch."""
    if kind is Token.RADIUS:
        rings = batch.rings(meters, steps)
        if op is Token.INTERSECTS:
            return zone_intersects_poly(zone, rings)
        if op is Token.NINTERSECTS:
            return ~zone_intersects_poly(zone, rings)
        if op is Token.NEAR:
            return zone_within_poly(zone, rings) | zone_intersects_poly(zone, rings)
        if op is Token.NNEAR:
            return ~zone_within_poly(zone, rings) | ~zone_intersects_poly(zone, rings)
        if op is Token.IN:
            return zone_within_poly(zone, rings)
        if op is Token.NIN:
            return ~zone_within_poly(zone, rings)
    elif kind is Token.BBOX:
        rect = ring_bbox(batch.rings(meters, steps))
        if op is Token.INTERSECTS:
            return zone_intersects_rect(zone, rect)
        if op is Token.NINTERSECTS:
            return ~zone_intersects_rect(zone, rect)
        if op is Token.NEAR:
            return zone_within_rect(zone, rect) | zone_intersects_rect(zone, rect)
        if op is Token.NNEAR:
            return ~zone_within_rect(zone, rect) | ~zone_intersects_rect(zone, rect)
        if op is Token.IN:
            return zone_within_rect(zone, rect)
        if op is Token.NIN:
            return ~zone_within_rect(zone, rect)
    else:  # point device
        lat, lon = batch.lat, batch.lon
        if op is Token.INTERSECTS:
            return zone_intersects_point(zone, lat, lon)
        if op is Token.NINTERSECTS:
            return ~zone_intersects_point(zone, lat, lon)
        if op is Token.NEAR:
            return zone_intersects_point(zone, lat, lon) | zone_within_point(
                zone, lat, lon
            )
        if op is Token.NNEAR:
            return ~zone_intersects_point(zone, lat, lon) | ~zone_within_point(
                zone, lat, lon
            )
        if op is Token.IN:
            return zone_within_point(zone, lat, lon)
        if op is Token.NIN:
            return ~zone_within_point(zone, lat, lon)
    return np.zeros(batch.n, dtype=bool)


# --- device-vs-device predicates (runtime.go:1530-1700) ------------------


def _rings_to_frame(
    rings: np.ndarray, ring_lons: np.ndarray, frame_lon: float
) -> np.ndarray:
    """Per-target rings rigidly translated by ±360° into the frame of a
    candidate center, so planar ring-ring math is wrap-correct at the
    antimeridian. ``ring_lons`` are the centers the rings were built
    around. No copy (and bitwise no-op) when nothing straddles."""
    delta = lon_to_frame(ring_lons, frame_lon) - ring_lons
    if not np.any(delta):
        return rings
    shifted = rings.copy()
    shifted[..., 1] += delta[:, None]
    return shifted


def _dd_verb_mask(
    op: Token,
    target_kind: Token,
    target_rings: np.ndarray | None,
    batch: DeviceBatch,
    other_kind: Token,
    other_lat: float,
    other_lon: float,
    other_meters: float,
    other_steps: int,
    target_meters: float = 0.0,
) -> np.ndarray:
    """One candidate device vs all batch targets — planar polygonized
    rings (reference parity) with a GEODESIC override for polar rows:
    when either circle crosses a pole, planar lat/lon polygon math is
    undefined (the ring's lons jump ~180° across the pole), so RADIUS
    verbs there are decided by the true spherical circle —
    haversine-based intersect/contain. Bitwise no-op for every
    non-polar row."""
    res = _dd_verb_mask_planar(
        op, target_kind, target_rings, batch, other_kind,
        other_lat, other_lon, other_meters, other_steps,
    )
    if target_kind is Token.BBOX or other_kind is Token.BBOX:
        return res  # planar-rect semantics; poles documented unsupported
    t_m = float(target_meters) if target_rings is not None else 0.0
    o_m = float(other_meters) if other_kind is Token.RADIUS else 0.0
    if t_m <= 0.0 and o_m <= 0.0:
        return res  # point vs point: exact coordinate equality, pole-safe
    deg_t = math.degrees(t_m / EARTH_RADIUS_M)
    deg_o = math.degrees(o_m / EARTH_RADIUS_M)
    polar = (np.abs(batch.lat) + deg_t >= 90.0) | (
        np.abs(np.asarray(other_lat, dtype=np.float64)) + deg_o >= 90.0
    )
    if not np.any(polar):
        return res
    d = haversine_m(batch.lat, batch.lon, other_lat, other_lon)
    if target_rings is not None and other_kind is Token.RADIUS:
        inter = d <= t_m + o_m
        cont = d + o_m <= t_m  # target circle contains candidate circle
        geo = {
            Token.INTERSECTS: inter,
            Token.NINTERSECTS: ~inter,
            Token.NEAR: cont | inter,
            Token.NNEAR: ~cont | ~inter,
            Token.IN: cont,
            Token.NIN: ~cont,
        }[op]
    else:
        # one side is a point: every positive verb is the disc test
        # (mirrors the planar pin mapping branch for branch)
        pin = d <= max(t_m, o_m)
        geo = pin if op in (Token.INTERSECTS, Token.NEAR, Token.IN) else ~pin
    out = res.copy()
    out[polar] = np.broadcast_to(geo, out.shape)[polar]
    return out


def _dd_verb_mask_planar(
    op: Token,
    target_kind: Token,
    target_rings: np.ndarray | None,
    batch: DeviceBatch,
    other_kind: Token,
    other_lat: float,
    other_lon: float,
    other_meters: float,
    other_steps: int,
) -> np.ndarray:
    """Planar verb table (runtime.go:1530-1700), antimeridian-framed."""
    n = batch.n
    if other_kind in (Token.RADIUS, Token.BBOX):
        oring = circle_ring(other_lat, other_lon, other_meters, other_steps)
        # antimeridian: planar ring math needs one longitude frame —
        # shift target rings / batch lons into the candidate ring's
        # frame (exact ±360°; bitwise no-op mid-longitude)
        if target_rings is not None:
            target_rings = _rings_to_frame(target_rings, batch.lon, other_lon)
        batch_lon_f = lon_to_frame(batch.lon, other_lon)
        if other_kind is Token.RADIUS:
            if target_rings is not None:
                t_in = ring_intersects_ring(target_rings, oring)
                t_cont = ring_contains_ring(target_rings, oring)
                if op is Token.INTERSECTS:
                    return t_in
                if op is Token.NINTERSECTS:
                    return ~t_in
                if op is Token.NEAR:
                    return t_cont | t_in
                if op is Token.NNEAR:
                    return ~t_cont | ~t_in
                if op is Token.IN:
                    return t_cont
                if op is Token.NIN:
                    return ~t_cont
            else:
                pin = points_in_ring(batch.lat, batch_lon_f, oring)
                if op in (Token.INTERSECTS, Token.NEAR):
                    return pin
                if op in (Token.NINTERSECTS,):
                    return ~pin
                if op is Token.NNEAR:
                    return ~pin | ~pin
                if op is Token.IN:
                    return pin
                if op is Token.NIN:
                    return ~pin
        else:  # other BBOX
            if target_rings is not None:
                trect = ring_bbox(target_rings)
                orect = ring_bbox(oring)
                o_x_t = zone_like_ring_intersects_rect(oring, trect)
                t_cont_o = _ring_contains_rect(target_rings, orect)
                o_cont_t = _ring_contains_rect_single(oring, trect)
                if op is Token.INTERSECTS:
                    return o_x_t
                if op is Token.NINTERSECTS:
                    return ~o_x_t
                if op is Token.NEAR:
                    return t_cont_o | o_x_t
                if op is Token.NNEAR:
                    return ~t_cont_o | ~o_x_t
                if op is Token.IN:
                    return o_cont_t
                if op is Token.NIN:
                    return ~o_cont_t
            else:
                pin = points_in_ring(batch.lat, batch_lon_f, oring)
                if op in (Token.INTERSECTS, Token.NEAR, Token.IN):
                    return pin
                if op in (Token.NINTERSECTS, Token.NIN):
                    return ~pin
                if op is Token.NNEAR:
                    return ~pin
    else:  # other is a point
        if target_rings is not None:
            # frame the candidate's lon per target ring (each ring is
            # continuous around its own device's lon; a dateline
            # neighbor's raw lon sits a world away in planar coords)
            pin = points_in_ring(
                np.broadcast_to(np.asarray(other_lat, dtype=np.float64), (n,)),
                lon_to_frame(
                    np.broadcast_to(
                        np.asarray(other_lon, dtype=np.float64), (n,)
                    ),
                    batch.lon,
                ),
                target_rings,
            )
            if op in (Token.INTERSECTS, Token.NEAR, Token.IN):
                return pin
            if op in (Token.NINTERSECTS, Token.NIN):
                return ~pin
            if op is Token.NNEAR:
                return ~pin
        else:
            eq = points_equal(batch.lat, batch.lon, other_lat, other_lon)
            if op in (Token.INTERSECTS, Token.NEAR, Token.IN):
                return eq
            if op in (Token.NINTERSECTS, Token.NIN):
                return ~eq
            if op is Token.NNEAR:
                return ~eq
    return np.zeros(n, dtype=bool)


def zone_like_ring_intersects_rect(oring: np.ndarray, rect: np.ndarray) -> np.ndarray:
    """One candidate ring (S, 2) vs per-target rects (N, 4)."""
    return ring_intersects_ring(rect_ring(rect), oring)


def _ring_contains_rect(rings: np.ndarray, rect: np.ndarray) -> np.ndarray:
    """Per-target rings (N, S, 2) contain one rect (4,)."""
    return ring_contains_ring(rings, rect_ring(rect))


def _ring_contains_rect_single(ring: np.ndarray, rects: np.ndarray) -> np.ndarray:
    """One ring (S, 2) contains per-target rects (N, 4)."""
    return ring_contains_ring(ring, rect_ring(rects))


# --- two-phase filtering helpers ----------------------------------------

# Ops whose per-candidate predicate is TRUE when the candidate is far
# away (negated verbs): outside the bbox prefilter the exact predicate
# is known without computing it.
_FAR_TRUE_OPS = frozenset({Token.NINTERSECTS, Token.NNEAR, Token.NIN})


def _deg_pad(meters: float, ref_lat: float) -> tuple[float, float]:
    """Conservative degree padding for a metric reach at a latitude.

    dlat is linear; dlon uses the spherical-cap arcsin evaluated at
    the most poleward latitude the reach can touch, ×1.001 slack —
    a strict superset of the true lon excursion at EVERY latitude.
    (The pre-round-6 form capped the latitude at 84°, which UNDER-
    covered between ~84° and the polar cap — 1/cos(87°) ≈ 19× vs the
    capped 9.6× — a prefilter false-negative window.) A reach that
    crosses a pole spans all longitudes → dlon = 360."""
    import math as _math

    m = max(meters, 0.0) + 1.0
    dlat = m / 110574.0
    edge = abs(ref_lat) + dlat
    if edge >= 90.0:
        return dlat, 360.0
    s = _math.sin(m / EARTH_RADIUS_M) / _math.cos(_math.radians(edge))
    if s >= 1.0:
        return dlat, 360.0
    return dlat, _math.degrees(_math.asin(s)) * 1.001


def _zone_prefilter(zone: Zone, batch: DeviceBatch, meters: float) -> np.ndarray:
    """Cheap candidate mask: point within the zone bbox expanded by the
    device-buffer reach — the two-phase filter of the reference
    (R-tree bbox prefilter before exact geometry, devices.go:181-192).
    Point lons are framed by ±360° into the zone's frame (exact no-op
    mid-longitude) so the dateline doesn't split the expanded bbox;
    output-transparent: the mask only needs no-false-negatives (far
    rows take the verb's known far-field value)."""
    b = zone.bbox
    ref_lat = max(abs(float(b[0])), abs(float(b[2])))
    dlat, dlon = _deg_pad(meters, ref_lat)
    lon_f = lon_to_frame(batch.lon, (float(b[1]) + float(b[3])) / 2.0)
    return (
        (batch.lat >= b[0] - dlat)
        & (batch.lat <= b[2] + dlat)
        & (lon_f >= b[1] - dlon)
        & (lon_f <= b[3] + dlon)
    )


def _masked_zone_eval(
    zone: Zone,
    op: Token,
    kind: Token,
    batch: DeviceBatch,
    meters: float,
    steps: int,
    pre: np.ndarray,
) -> np.ndarray:
    """Exact predicate only on prefilter survivors; far rows take the
    op's known far-field value. Identical output to evaluating the full
    batch, at a fraction of the memory traffic."""
    out = np.full(batch.n, op in _FAR_TRUE_OPS)
    idx = np.nonzero(pre)[0]
    if idx.size == batch.n:
        return _zone_verb_mask(zone, op, kind, batch, meters, steps)
    if idx.size:
        sub = DeviceBatch(batch.pdf.iloc[idx])
        out[idx] = _zone_verb_mask(zone, op, kind, sub, meters, steps)
    return out


def _masked_dd_eval(
    op: Token,
    t_kind: Token,
    node_left,
    batch: DeviceBatch,
    other_kind: Token,
    other_lat: float,
    other_lon: float,
    other_meters: float,
    other_steps: int,
    pre: np.ndarray,
) -> np.ndarray:
    out = np.full(batch.n, op in _FAR_TRUE_OPS)
    idx = np.nonzero(pre)[0]
    full_rings = (
        batch.rings(node_left.meters(), node_left.steps())
        if t_kind in (Token.RADIUS, Token.BBOX)
        else None
    )
    if idx.size == batch.n:
        return _dd_verb_mask(
            op, t_kind, full_rings, batch, other_kind,
            other_lat, other_lon, other_meters, other_steps,
            target_meters=node_left.meters(),
        )
    if idx.size:
        sub = DeviceBatch(batch.pdf.iloc[idx])
        sub_rings = (
            sub.rings(node_left.meters(), node_left.steps())
            if t_kind in (Token.RADIUS, Token.BBOX)
            else None
        )
        out[idx] = _dd_verb_mask(
            op, t_kind, sub_rings, sub, other_kind,
            other_lat, other_lon, other_meters, other_steps,
            target_meters=node_left.meters(),
        )
    return out


# --- node evaluation -----------------------------------------------------


def _clamp_all_negated(meters: float) -> float:
    """Search-radius bump for negated verbs with ``@`` candidates
    (runtime.go:1515-1525 — sequential ifs, replicated exactly: a
    radius below the TINY threshold is raised exactly TO it, so the
    second branch only fires for radii that were already above)."""
    if meters < TINY_REGION_THRESHOLD_M:
        meters = TINY_REGION_THRESHOLD_M
    if meters > TINY_REGION_THRESHOLD_M:
        meters = SMALL_REGION_THRESHOLD_M
    return meters


def _eval_sp_object(
    node: SpObjectOp, batch: DeviceBatch, ref: Reference, layer: str
) -> NodeResult:
    n = batch.n
    ok = np.zeros(n, dtype=bool)
    refs: list[list[str]] = [[] for _ in range(n)]
    layer_ok = batch.layer_id == layer
    meters = node.left.meters()
    steps = node.left.steps()
    kind = node.left.kind

    if node.right.refs and not node.right.all:
        candidates: list[Zone] = []
        for rid in node.right.refs:
            z = ref.zones.lookup(rid)
            if z is not None and z.layer_id == layer:
                candidates.append(z)
        for z in candidates:
            pre = _zone_prefilter(z, batch, meters)
            mask = _masked_zone_eval(z, node.op, kind, batch, meters, steps, pre)
            mask &= layer_ok
            ok |= mask
            for i in np.nonzero(mask)[0]:
                refs[i].append(z.object_id)
    elif node.right.all and not node.right.refs:
        # ``@``: per-device candidate universe = Objects.Near's bbox
        # prefilter (object.go:115-151) — vectorized: one pass per zone
        # with a per-device candidacy mask, no per-row Python.
        search_m = (
            MIN_DIST_METERS
            if meters <= 0
            else normalize_distance(meters, SMALL_REGION_SIZE)
        )
        rects = rect_from_center(batch.lat, batch.lon, search_m)  # (N, 4)
        # Candidacy is visible semantics for negated verbs, so this
        # must stay in LOCKSTEP with the Catalyst form
        # (sql_compile._near_candidate_sql) and ZoneStore.near: the
        # zone's lon interval is rigidly shifted by ±360° into each
        # row's frame (exact no-op mid-longitude — zones never cross
        # ±180° per the RFC 7946 split convention, but the search rect
        # may overflow past it), and a search disc that crosses a pole
        # admits every zone touching the 2·deg_s polar band.
        deg_s = math.degrees(search_m / EARTH_RADIUS_M)
        cap_n = batch.lat + deg_s >= 90.0
        cap_s = batch.lat - deg_s <= -90.0
        for z in ref.zones.all_zones():
            if z.layer_id != layer:
                continue
            b = z.bbox
            zc = (float(b[1]) + float(b[3])) / 2.0
            dl = lon_to_frame(zc, batch.lon) - zc
            cand = (
                (rects[:, 0] <= b[2])
                & (rects[:, 2] >= b[0])
                & (rects[:, 1] <= b[3] + dl)
                & (rects[:, 3] >= b[1] + dl)
            )
            if float(b[2]) >= 90.0 - 2.0 * deg_s:
                cand |= cap_n
            if float(b[0]) <= -90.0 + 2.0 * deg_s:
                cand |= cap_s
            cand &= layer_ok
            if not cand.any():
                continue
            # exact predicate only on the candidate subset; non-candidates
            # are never examined (Objects.Near pruning — part of the
            # visible semantics for negated verbs, SURVEY.md §2B.1)
            mask = cand.copy()
            idx = np.nonzero(cand)[0]
            sub = DeviceBatch(batch.pdf.iloc[idx]) if idx.size < batch.n else batch
            sub_mask = _zone_verb_mask(z, node.op, kind, sub, meters, steps)
            if idx.size < batch.n:
                mask[idx] = sub_mask
                mask &= cand
            else:
                mask = cand & sub_mask
            ok |= mask
            for i in np.nonzero(mask)[0]:
                refs[i].append(z.object_id)
    return NodeResult(
        ok=ok,
        left_kw=Token.DEVICE,
        right_kw=node.right.kind,
        op=node.op,
        right_refs=refs,
    )


def _eval_sp_devices(
    node: SpDevicesOp,
    batch: DeviceBatch,
    ref: Reference,
    layer: str,
    member_mask: np.ndarray | None = None,
) -> NodeResult:
    n = batch.n
    ok = np.zeros(n, dtype=bool)
    refs: list[list[str]] = [[] for _ in range(n)]
    layer_ok = batch.layer_id == layer
    active = layer_ok if member_mask is None else (layer_ok & member_mask)

    target_meters = node.left.meters()
    t_kind = node.left.kind
    target_rings = (
        batch.rings(target_meters, node.left.steps())
        if t_kind in (Token.RADIUS, Token.BBOX)
        else None
    )
    other_kind = (
        node.right.kind if node.right.kind in (Token.RADIUS, Token.BBOX) else Token.DEVICE
    )
    other_meters = node.right.meters()
    other_steps = node.right.steps()

    if node.right.refs and not node.right.all:
        for rid in node.right.refs:
            other = ref.devices.lookup(rid)
            if other is None:
                continue
            cand_layer_ok = batch.layer_id == other.get("layer_id", "0" * 20)
            # two-phase: cheap reach prefilter around the candidate,
            # exact predicate only on survivors
            dlat, dlon = _deg_pad(
                target_meters + other_meters, float(other["lat"])
            )
            pre = (
                (np.abs(batch.lat - other["lat"]) <= dlat)
                & (
                    np.abs(batch.lon - lon_to_frame(other["lon"], batch.lon))
                    <= dlon
                )
            )
            # polar band: near a pole the lon pad can't express the
            # full-circle reach — admit cross-pole candidates (the
            # exact verb's geodesic polar branch decides)
            if abs(float(other["lat"])) + dlat >= 90.0:
                pre |= np.abs(batch.lat) + dlat >= 90.0 - dlat
            mask = (
                _masked_dd_eval(
                    node.op,
                    t_kind,
                    node.left,
                    batch,
                    other_kind,
                    other["lat"],
                    other["lon"],
                    other_meters,
                    other_steps,
                    pre,
                )
                & active
                & cand_layer_ok
            )
            ok |= mask
            for i in np.nonzero(mask)[0]:
                refs[i].append(rid)
    elif node.right.all and not node.right.refs:
        # ``@``: candidate universe = Devices.Near's bbox prefilter
        # (devices.go:166-199) with the negated-verb radius bump —
        # vectorized one pass per snapshot device.
        search_meters = target_meters
        if node.op in (Token.NINTERSECTS, Token.NNEAR):
            search_meters = _clamp_all_negated(search_meters)
        search_m = (
            MIN_DIST_METERS
            if search_meters <= 0
            else normalize_distance(search_meters, TINY_REGION_SIZE)
        )
        rects = rect_from_center(batch.lat, batch.lon, search_m)  # (N, 4)
        # polar widening: a search disc that crosses a pole reaches all
        # longitudes there — the rect's asin-clamped dlon (≤ 90°)
        # cannot express that, so rows in the cap admit every candidate
        # in the 2·deg_s polar band (superset; the exact verb decides)
        deg_s = math.degrees(search_m / EARTH_RADIUS_M)
        cap_n = batch.lat + deg_s >= 90.0
        cap_s = batch.lat - deg_s <= -90.0
        for other in ref.devices.all_devices():
            # rect lon bounds are unnormalized (center ± dlon, possibly
            # past ±180): frame the candidate lon per rect
            cand = rect_contains_point(
                rects, other["lat"], lon_to_frame(other["lon"], batch.lon)
            )
            if other["lat"] >= 90.0 - 2.0 * deg_s:
                cand |= cap_n
            if other["lat"] <= -90.0 + 2.0 * deg_s:
                cand |= cap_s
            cand &= active
            cand &= batch.layer_id == other.get("layer_id", "0" * 20)
            if not cand.any():
                continue
            # exact predicate only on candidate rows (non-candidates are
            # outside the pruned Near universe and contribute nothing)
            idx = np.nonzero(cand)[0]
            mask = np.zeros(n, dtype=bool)
            if idx.size < n:
                sub = DeviceBatch(batch.pdf.iloc[idx])
                sub_rings = (
                    sub.rings(target_meters, node.left.steps())
                    if t_kind in (Token.RADIUS, Token.BBOX)
                    else None
                )
                mask[idx] = _dd_verb_mask(
                    node.op, t_kind, sub_rings, sub, other_kind,
                    other["lat"], other["lon"], other_meters, other_steps,
                    target_meters=target_meters,
                )
            else:
                mask = cand & _dd_verb_mask(
                    node.op, t_kind, target_rings, batch, other_kind,
                    other["lat"], other["lon"], other_meters, other_steps,
                    target_meters=target_meters,
                )
            ok |= mask
            for i in np.nonzero(mask)[0]:
                refs[i].append(other["device_id"])
    return NodeResult(
        ok=ok,
        left_kw=Token.DEVICE,
        right_kw=Token.DEVICES,
        op=node.op,
        right_refs=refs,
    )


def _membership(batch: DeviceBatch, refs: list[str]) -> np.ndarray:
    if not refs:
        return np.zeros(batch.n, dtype=bool)
    return np.isin(batch.device_id.astype(str), refs)


def _devices_lit_to_device_lit(lit: ast.DevicesLit) -> ast.DeviceLit:
    return ast.DeviceLit(kind=lit.kind, unit=lit.unit, value=lit.value)


def _eval_sp_ddevices(
    node: SpDDevicesOp, batch: DeviceBatch, ref: Reference, layer: str
) -> NodeResult:
    left_ok = _membership(batch, node.left.refs)
    right_ok = _membership(batch, node.right.refs)
    both = left_ok & right_ok
    neither = ~left_ok & ~right_ok
    excluded = both | neither
    out = NodeResult(
        ok=np.zeros(batch.n, dtype=bool),
        left_kw=Token.DEVICE,
        right_kw=Token.DEVICES,
        op=node.op,
        right_refs=[[] for _ in range(batch.n)],
    )
    if node.left.all and node.right.all:
        return out

    def run(member: np.ndarray, left_lit: ast.DevicesLit, right_lit: ast.DevicesLit):
        member = member & ~excluded
        if not member.any():
            return
        sub_op = SpDevicesOp(
            left=_devices_lit_to_device_lit(left_lit), right=right_lit, op=node.op
        )
        res = _eval_sp_devices(sub_op, batch, ref, layer, member_mask=member)
        out.ok |= res.ok
        for i in np.nonzero(res.ok)[0]:
            out.right_refs[i] = res.right_refs[i]

    # devices(@) OP devices(my) → swap (runtime.go:1393-1398)
    if node.left.all:
        run(right_ok, node.right, node.left)
        return out
    run(left_ok, node.left, node.right)
    if not node.right.all:
        run(right_ok & ~left_ok, node.right, node.left)
    return out


def _eval_sp_devices_object(
    node: SpDevicesObjectOp, batch: DeviceBatch, ref: Reference, layer: str
) -> NodeResult:
    member = _membership(batch, node.left.refs)
    sub_op = SpObjectOp(
        left=_devices_lit_to_device_lit(node.left), right=node.right, op=node.op
    )
    res = _eval_sp_object(sub_op, batch, ref, layer)
    res.ok &= member
    res.right_refs = [
        r if m else [] for r, m in zip(res.right_refs, member)
    ]
    return res


_CMP = {
    Token.EQ: lambda a, b: a == b,
    Token.LT: lambda a, b: a < b,
    Token.GT: lambda a, b: a > b,
    Token.NE: lambda a, b: a != b,
    Token.LTE: lambda a, b: a <= b,
    Token.GTE: lambda a, b: a >= b,
}


def _eval_equal_object(
    node: EqualObjectOp, batch: DeviceBatch, ref: Reference
) -> NodeResult:
    n = batch.n
    ok = np.zeros(n, dtype=bool)
    refs: list[list[str]] = [[] for _ in range(n)]
    cmp = _CMP[node.op]
    target = node.left.meters()
    # last-candidate-wins Ok, per-candidate ref append (runtime.go:1795-1825)
    for rid in node.right.refs:
        z = ref.zones.lookup(rid)
        if z is None:
            continue
        clat, clon = z.center()
        distance = round_to_unit(haversine_m(batch.lat, batch.lon, clat, clon), MIN_DIST_METERS)
        mask = np.asarray(cmp(distance, target))
        ok = mask  # overwritten, not latched
        for i in np.nonzero(mask)[0]:
            refs[i].append(rid)
    return NodeResult(
        ok=ok,
        left_kw=Token.DEVICE,
        right_kw=node.right.kind,
        op=node.op,
        right_refs=refs,
    )


def _eval_equal_devices(
    node: EqualDevicesOp, batch: DeviceBatch, ref: Reference
) -> NodeResult:
    n = batch.n
    ok = np.zeros(n, dtype=bool)
    refs: list[list[str]] = [[] for _ in range(n)]
    cmp = _CMP[node.op]
    target = node.left.meters()
    for rid in node.right.refs:
        other = ref.devices.lookup(rid)
        if other is None:
            continue
        distance = round_to_unit(
            haversine_m(batch.lat, batch.lon, other["lat"], other["lon"]),
            MIN_DIST_METERS,
        )
        mask = np.asarray(cmp(distance, target))
        ok = mask
        for i in np.nonzero(mask)[0]:
            refs[i].append(rid)
    return NodeResult(
        ok=ok,
        left_kw=Token.DEVICE,
        right_kw=Token.DEVICES,
        op=node.op,
        right_refs=refs,
    )


def eval_node(node, batch: DeviceBatch, ref: Reference, layer: str) -> NodeResult:
    if isinstance(node, SpObjectOp):
        return _eval_sp_object(node, batch, ref, layer)
    if isinstance(node, SpDevicesOp):
        return _eval_sp_devices(node, batch, ref, layer)
    if isinstance(node, SpDDevicesOp):
        return _eval_sp_ddevices(node, batch, ref, layer)
    if isinstance(node, SpDevicesObjectOp):
        return _eval_sp_devices_object(node, batch, ref, layer)
    if isinstance(node, EqualObjectOp):
        return _eval_equal_object(node, batch, ref)
    if isinstance(node, EqualDevicesOp):
        return _eval_equal_devices(node, batch, ref)
    if isinstance(node, EqualIntOp):
        return NodeResult(
            ok=np.asarray(_CMP[node.op](int_val(batch, node.keyword), node.value)),
            left_kw=node.keyword,
            right_kw=Token.INT,
            op=node.op,
        )
    if isinstance(node, EqualFloatOp):
        return NodeResult(
            ok=np.asarray(_CMP[node.op](float_val(batch, node.keyword), node.value)),
            left_kw=node.keyword,
            right_kw=Token.FLOAT,
            op=node.op,
        )
    if isinstance(node, EqualStrOp):
        # NumPy unicode arrays compare lexicographically by code point,
        # identical to Python str comparison — vectorized, no per-row loop
        vals = np.asarray(str_val(batch, node.keyword), dtype="U")
        ok = np.asarray(_CMP[node.op](vals, node.value), dtype=bool)
        return NodeResult(ok=ok, left_kw=node.keyword, right_kw=Token.STRING, op=node.op)
    if isinstance(node, EqualTimeOp):
        bound = _day_anchor(batch, node.hour, node.minute)
        return NodeResult(
            ok=np.asarray(_CMP[node.op](batch.datetime, bound)),
            left_kw=node.keyword,
            right_kw=Token.TIME,
            op=node.op,
        )
    if isinstance(node, InIntOp):
        found = np.isin(int_val(batch, node.keyword), list(node.values))
        return NodeResult(
            ok=~found if node.negate else found,
            left_kw=node.keyword,
            right_kw=Token.INT,
            op=Token.NIN if node.negate else Token.IN,
        )
    if isinstance(node, InFloatOp):
        found = np.isin(float_val(batch, node.keyword), list(node.values))
        return NodeResult(
            ok=~found if node.negate else found,
            left_kw=node.keyword,
            right_kw=Token.FLOAT,
            op=Token.NIN if node.negate else Token.IN,
        )
    if isinstance(node, InStringOp):
        found = np.isin(str_val(batch, node.keyword).astype(str), list(node.values))
        return NodeResult(
            ok=~found if node.negate else found,
            left_kw=node.keyword,
            right_kw=Token.STRING,
            op=Token.NIN if node.negate else Token.IN,
        )
    if isinstance(node, RangeIntOp):
        v = int_val(batch, node.keyword)
        ok = (
            (v <= node.begin) | (v >= node.end)
            if node.negate
            else (v >= node.begin) & (v <= node.end)
        )
        return NodeResult(
            ok=ok,
            left_kw=node.keyword,
            right_kw=Token.INT,
            op=Token.NRANGE if node.negate else Token.RANGE,
        )
    if isinstance(node, RangeFloatOp):
        v = float_val(batch, node.keyword)
        ok = (
            (v <= node.begin) | (v >= node.end)
            if node.negate
            else (v >= node.begin) & (v <= node.end)
        )
        return NodeResult(
            ok=ok,
            left_kw=node.keyword,
            right_kw=Token.FLOAT,
            op=Token.NRANGE if node.negate else Token.RANGE,
        )
    if isinstance(node, RangeTimeOp):
        d1 = _day_anchor(batch, node.begin_h, node.begin_m)
        d2 = _day_anchor(batch, node.end_h, node.end_m)
        v = batch.datetime
        ok = (v <= d1) | (v >= d2) if node.negate else (v >= d1) & (v <= d2)
        return NodeResult(
            ok=ok,
            left_kw=node.keyword,
            right_kw=Token.TIME,
            op=Token.NRANGE if node.negate else Token.RANGE,
        )
    if isinstance(node, RangeDateTimeOp):
        v = batch.datetime
        ok = (
            (v <= node.begin_unix) | (v >= node.end_unix)
            if node.negate
            else (v >= node.begin_unix) & (v <= node.end_unix)
        )
        return NodeResult(
            ok=ok,
            left_kw=node.keyword,
            right_kw=Token.DATETIME,
            op=Token.NRANGE if node.negate else Token.RANGE,
        )
    raise TypeError(f"unknown node type: {type(node)!r}")


# --- spec evaluation (fold + trigger state, runtime.go:133-236) ----------


def _dwell_lit(node) -> ast.ObjectLit | None:
    """The node's ObjectLit iff it carries a live ``:time duration|
    after`` suffix on a spatial verb (dwell scope; see _apply_dwell).
    Comparator ops (EqualObjectOp) keep the reference's stateful-mark-
    only treatment even under ``eval_dwell``."""
    if isinstance(node, (SpObjectOp, SpDevicesObjectOp)):
        lit = node.right
        if lit.dur_typ in (Token.DURATION, Token.AFTER) and lit.dur_val > 0:
            return lit
    return None


def spec_has_dwell(spec: CompiledSpec) -> bool:
    return any(_dwell_lit(n) is not None for n in spec.nodes)


def _apply_dwell(
    spec: CompiledSpec,
    batch: DeviceBatch,
    ref: Reference,
    rule_id: str,
    node_results: list[NodeResult],
    layer_ok: np.ndarray,
) -> None:
    """Dwell-time gating for ``:time duration|after <dur>`` object
    suffixes — EXCEEDS the reference: spinix parses the suffix and
    marks the rule stateful (runtime.go:270-285, parser.go:499) but
    never calls ``State.LastVisit``/``SetLastVisit`` (state.go:237-247)
    from any evaluater, so the reference's own behavior is "suffix is
    a no-op". This engine implements the evaluation the stub implies,
    opt-in via ``eval_dwell`` so the default keeps reference row
    parity. Semantics, per (rule, device, node, object):

    - a *visit* opens at the first gated event where the node's
      spatial predicate holds for that object and CLEARS at the first
      gated event where it does not (events outside the rule bbox are
      never observed — same pruning discipline as the trigger fold);
    - ``duration D`` (level-triggered): the node matches the object at
      event time t iff the predicate holds and t - first_visit >= D;
    - ``after D`` (edge-triggered): same threshold, but only the first
      qualifying event of each visit matches.

    Visit state rides the per-(device, rule) trigger-state dict under
    ``visits`` ({"<node_idx>:<object_id>": first_visit}; the reference
    shape is State.objectsVisits, a per-objectID int64 map — the node
    index is prefixed so two dwell nodes over the same object cannot
    alias). An ``after`` node that fired stores -(first_visit + 1) —
    sign-safe for visits opened at unix ts 0, where a bare -first
    would alias 0 and lose the mark (ADVICE r6). Dwell
    state updates on every gated event regardless of the other nodes'
    outcomes (presence tracking is per node, not per rule result).
    The fold is sequential in the batch's row order — identical
    ordering contract to the trigger gate (callers feed (device_id,
    datetime)-sorted rows); requires real event timestamps.
    """
    n = batch.n
    for j, node in enumerate(spec.nodes):
        lit = _dwell_lit(node)
        if lit is None:
            continue
        res = node_results[j]
        refs = res.right_refs
        dur = float(lit.dur_val)
        edge = lit.dur_typ is Token.AFTER
        prefix = f"{j}:"
        explicit = (
            [prefix + r for r in lit.refs] if (lit.refs and not lit.all) else None
        )
        new_ok = np.zeros(n, dtype=bool)
        for i in range(n):
            if not layer_ok[i]:
                continue
            st = ref.states.lookup_or_make(str(batch.device_id[i]), rule_id)
            visits = st.get("visits")
            if not isinstance(visits, dict):
                visits = st["visits"] = {}
            # dwell timing is ALWAYS event time: a caller-supplied
            # trigger clock (e.g. wall clock) gives every row of a
            # batch the same `now`, so visits would never accumulate
            # event-time within a batch (ADVICE r6); the trigger gate
            # keeps its own clock semantics (fold below)
            now = int(batch.datetime[i])
            hit_keys = {prefix + o: o for o in (refs[i] if refs is not None else ())}
            # a miss clears the visit — only keys this node owns
            universe = (
                explicit
                if explicit is not None
                else [k for k in visits if k.startswith(prefix)]
            )
            for k in universe:
                if k in visits and k not in hit_keys:
                    del visits[k]
            ok_objs: list[str] = []
            for k, obj in hit_keys.items():
                fv = visits.get(k)
                if fv is None:
                    fv = visits[k] = now
                # fired mark = -(first+1): sign-safe when a visit opens
                # at unix ts 0 (-0 == 0 lost the mark — ADVICE r6)
                first = (-fv - 1) if fv < 0 else fv
                if now - first >= dur and not (edge and fv < 0):
                    ok_objs.append(obj)
                    if edge:
                        visits[k] = -(first + 1)
            new_ok[i] = bool(ok_objs)
            if refs is not None:
                refs[i] = ok_objs
        res.ok = new_ok


def eval_spec_full(
    spec: CompiledSpec,
    batch_pdf: pd.DataFrame,
    ref: Reference,
    rule_id: str,
    clock=None,
    eval_dwell: bool = False,
):
    """Low-level evaluation: returns
    ``(final_ok, node_results, recorded, gate)`` where ``gate`` is the
    layer∧trigger mask and ``recorded[j]`` marks devices for which
    node j's Match would be captured (AND-skip semantics,
    runtime.go:186-231). Callers build match rows columnar from these
    arrays — no per-row Python on the hot path."""
    batch = DeviceBatch(batch_pdf)
    n = batch.n
    if n == 0 or not spec.nodes:
        z = np.zeros(0, dtype=bool)
        return z, [], [], z

    layer_ok = batch.layer_id == spec.props.layer

    # trigger gate (stateful) — SEQUENTIAL per row, exactly the
    # reference's per-event ordering (Engine.Detect evaluates one
    # update at a time: checkTrigger then changeState,
    # runtime.go:103-163 + engine.go:190-225). Row i+1 of the same
    # device sees the state as updated by row i, so the outcome is a
    # deterministic fold over the batch's row order and — given
    # event-time-sorted input (detect_batch_spark sorts stateful
    # partitions by (device_id, datetime)) — independent of Arrow
    # batch boundaries and partition count.
    trigger_ok = np.ones(n, dtype=bool)
    if spec.is_stateful:
        for i in range(n):
            if not layer_ok[i]:
                continue
            st = ref.states.lookup_or_make(str(batch.device_id[i]), rule_id)
            now = int(clock(batch, i)) if clock else int(batch.datetime[i])
            if now > 0:
                st["now"] = now
            if state_need_reset(st, spec.props.reset_interval_s):
                state_reset(st)
                st["last_reset"] = st["now"]  # UpdateLastResetTime
            trigger_ok[i] = _check_trigger(spec, st)
            if trigger_ok[i]:
                # changeState (runtime.go:133-163) — immediately, so
                # the next event of this device sees it
                st["last_seen"] = st["now"]
                if spec.props.repeat in (ast.REPEAT_TIMES, ast.REPEAT_ONCE):
                    st["hits"] += 1
                ref.states.update(st)

    node_results = [eval_node(node, batch, ref, spec.props.layer) for node in spec.nodes]

    if eval_dwell:
        _apply_dwell(spec, batch, ref, rule_id, node_results, layer_ok)

    # left-to-right fold with AND-skip (runtime.go:186-231)
    acc = node_results[0].ok & layer_ok
    recorded = [np.ones(n, dtype=bool)]
    for i in range(1, len(node_results)):
        op = spec.ops[i - 1]
        if op is Token.AND:
            active = acc.copy()
            recorded.append(active)
            acc = acc & node_results[i].ok
        else:
            recorded.append(np.ones(n, dtype=bool))
            acc = acc | node_results[i].ok

    final_ok = acc & layer_ok & trigger_ok

    return final_ok, node_results, recorded, layer_ok & trigger_ok


def eval_spec(
    spec: CompiledSpec,
    batch_pdf: pd.DataFrame,
    ref: Reference,
    rule_id: str,
    clock=None,
    eval_dwell: bool = False,
) -> tuple[np.ndarray, list[list[dict]]]:
    """Evaluate one compiled rule against a batch.

    Returns (ok bool (N,), matches per device) where each match is a
    dict (ok, left_kw, right_kw, op, left_refs, right_refs) — the
    golden comparison tuple of assertRuntimeTestCase
    (runtime_test.go:196-237).
    """
    final_ok, node_results, recorded, gate = eval_spec_full(
        spec, batch_pdf, ref, rule_id, clock=clock, eval_dwell=eval_dwell
    )
    n = final_ok.shape[0]
    matches: list[list[dict]] = [[] for _ in range(n)]
    if n == 0:
        return final_ok, matches
    device_ids = batch_pdf["device_id"].to_numpy(dtype=object)

    any_hit = np.zeros(n, dtype=bool)
    for j, res in enumerate(node_results):
        any_hit |= recorded[j] & res.ok
    for i in np.nonzero(any_hit & gate)[0]:
        for j, res in enumerate(node_results):
            if recorded[j][i] and res.ok[i]:
                matches[i].append(
                    {
                        "ok": True,
                        "left_kw": str(res.left_kw),
                        "right_kw": str(res.right_kw),
                        "op": str(res.op),
                        "left_refs": [str(device_ids[i])]
                        if res.left_is_target
                        else [],
                        "right_refs": list(res.right_refs[i])
                        if res.right_refs is not None
                        else [],
                    }
                )
    return final_ok, matches


def _check_trigger(spec: CompiledSpec, st: dict) -> bool:
    """checkTrigger (runtime.go:111-131)."""
    repeat = spec.props.repeat
    if repeat == ast.REPEAT_EVERY:
        if st["last_seen"] == 0:
            return True
        return (st["now"] - st["last_reset"]) > int(spec.props.delay_s)
    if repeat == ast.REPEAT_TIMES:
        if (st["now"] - st["last_seen"]) < int(spec.props.interval_s):
            return False
        return st["hits"] < spec.props.times
    if repeat == ast.REPEAT_ONCE:
        return st["hits"] == 0
    return True
