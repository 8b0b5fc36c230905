"""Additional operator edge semantics pinned against the reference."""

from __future__ import annotations

import numpy as np
import pandas as pd

from spinix_spark.dsl import compile_spec
from spinix_spark.engine.runtime import Reference, eval_spec
from spinix_spark.engine.stores import (
    DeviceSnapshot,
    StateStore,
    ZoneStore,
    zone_from_ring,
)

NIL = "0" * 20
K0 = "c5vj26evvhfjvfseauk0"
OG = "c5vj26evvhfjvfseauog"
AULG = "c5vj26evvhfjvfseaulg"

G3_RING = np.array(
    [
        (42.9238589, -72.2800060),
        (42.9231989, -72.2802743),
        (42.9232461, -72.2790616),
        (42.9239689, -72.2787397),
        (42.9238746, -72.2799953),
        (42.9238589, -72.2800060),
    ]
)


def _refs():
    return Reference(zones=ZoneStore(), devices=DeviceSnapshot(), states=StateStore())


def _run(spec_str, target, refs):
    ok, matches = eval_spec(
        compile_spec(spec_str), pd.DataFrame([target]), refs, rule_id="r" + "0" * 19
    )
    return bool(ok[0]), matches[0]


def _dev(did, lat, lon, **kw):
    d = {"device_id": did, "layer_id": NIL, "lat": lat, "lon": lon, "datetime": 0}
    d.update(kw)
    return d


def test_membership_gate_excludes_non_listed_device():
    """spDevicesObjectOp: a device not in the left ref list never
    matches, even inside the zone (runtime.go:1168-1171)."""
    refs = _refs()
    refs.zones.add(zone_from_ring(AULG, G3_RING))
    in_zone = (42.9236075, -72.2792333)
    ok, _ = _run(f"devices({OG}) INTERSECTS polygon({AULG})", _dev(K0, *in_zone), refs)
    assert not ok
    ok, _ = _run(f"devices({K0}) INTERSECTS polygon({AULG})", _dev(K0, *in_zone), refs)
    assert ok


def test_ddevices_both_sides_membership_no_match():
    """spDDevicesOp: target in BOTH ref lists → no match
    (runtime.go:1383-1386)."""
    refs = _refs()
    refs.devices.insert_or_replace(_dev(K0, 42.92, -72.27))
    ok, _ = _run(
        f"devices({K0}) INTERSECTS devices({K0})", _dev(K0, 42.92, -72.27), refs
    )
    assert not ok


def test_point_in_polygon_is_false_for_IN_verb():
    """IN (within) for a point device vs a polygon object is always
    false — a polygon can never be 'within' a point
    (runtime.go:1326-1331 WithinPoint). INTERSECTS is the containment
    verb for point devices."""
    refs = _refs()
    refs.zones.add(zone_from_ring(AULG, G3_RING))
    in_zone = (42.9236075, -72.2792333)
    ok, _ = _run(f"device IN polygon({AULG})", _dev(K0, *in_zone), refs)
    assert not ok
    ok, _ = _run(f"device NIN polygon({AULG})", _dev(K0, *in_zone), refs)
    assert ok  # ¬within → true (existential negation)
    ok, _ = _run(f"device INTERSECTS polygon({AULG})", _dev(K0, *in_zone), refs)
    assert ok


def test_nnear_polygon_always_true_for_point_device():
    """NNEAR = ¬intersects ∨ ¬within; within is false for polygons, so
    NNEAR holds even inside the zone (runtime.go:1318-1322) —
    documented reference quirk, replicated."""
    refs = _refs()
    refs.zones.add(zone_from_ring(AULG, G3_RING))
    ok, _ = _run(
        f"device NNEAR polygon({AULG})", _dev(K0, 42.9236075, -72.2792333), refs
    )
    assert ok


def test_equal_devices_distance():
    refs = _refs()
    refs.devices.insert_or_replace(_dev(OG, 42.9229004, -72.2791582))
    target = _dev(K0, 42.9236468, -72.2793728)  # ~84 m away → rounds to 100
    ok, m = _run(f"device :radius 100m eq devices({OG})", target, refs)
    assert ok and m[0]["op"] == "eq" and m[0]["right_refs"] == [OG]
    ok, _ = _run(f"device :radius 150m eq devices({OG})", target, refs)
    assert not ok
    ok, _ = _run(f"device :radius 1km gt devices({OG})", target, refs)
    assert not ok  # 100 > 1000 false
    ok, _ = _run(f"device :radius 1km lt devices({OG})", target, refs)
    assert ok


def test_missing_refs_are_skipped():
    """Lookups of unknown devices/objects silently skip the candidate
    (runtime.go:1214-1221, 1471-1476)."""
    refs = _refs()
    ok, m = _run(f"devices({K0}) INTERSECTS devices({OG})", _dev(K0, 1.0, 2.0), refs)
    assert not ok and m == []
    ok, _ = _run(f"device INTERSECTS polygon({AULG})", _dev(K0, 1.0, 2.0), refs)
    assert not ok


def test_multi_zone_refs_collect_in_sorted_order():
    """e2sp sorts object refs (runtime.go:432); every satisfied
    candidate id lands in right_refs in iteration order."""
    refs = _refs()
    # two zones both containing the point; ids intentionally reversed
    z_hi = "c5vj26evvhfjvfseauo0"
    z_lo = "c5vj26evvhfjvfseaul0"
    refs.zones.add(zone_from_ring(z_hi, G3_RING))
    refs.zones.add(zone_from_ring(z_lo, G3_RING))
    ok, m = _run(
        f"device INTERSECTS polygon({z_hi}, {z_lo})",
        _dev(K0, 42.9236075, -72.2792333),
        refs,
    )
    assert ok
    assert m[0]["right_refs"] == sorted([z_lo, z_hi])
