"""Golden rule-evaluation fixtures, replayed verbatim from the
reference's operator test suite (/root/reference/runtime_test.go).

Each case: a list of DSL specs, a target device, a populate step
(peer devices / objects), and the expected single match tuple
``(ok, left_kw, right_kw, op)`` — the exact assertion set of
assertRuntimeTestCase (runtime_test.go:196-237). Specs are evaluated
through the vectorized engine kernel (eval_spec), the same code the
Spark refinement stage runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from spinix_spark.dsl import CompileError, compile_spec
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
KG = "c5vj26evvhfjvfseaukg"
AULG = "c5vj26evvhfjvfseaulg"


def make_device(device_id: str, lat: float, lon: float) -> dict:
    return {
        "device_id": device_id,
        "layer_id": NIL,
        "lat": lat,
        "lon": lon,
        "datetime": 0,
    }


def make_refs() -> Reference:
    return Reference(zones=ZoneStore(), devices=DeviceSnapshot(), states=StateStore())


def run_spec(spec_str: str, target: dict, refs: Reference):
    spec = compile_spec(spec_str)
    batch = pd.DataFrame([target])
    ok, matches = eval_spec(spec, batch, refs, rule_id="rule" + "0" * 16)
    return bool(ok[0]), matches[0]


def assert_case(specs, target, refs, expect):
    """expect: list of (left_kw, right_kw, op) or [] for no matches."""
    for s in specs:
        ok, matches = run_spec(s, target, refs)
        assert len(matches) == len(expect), f"{s}: got {matches}, want {expect}"
        for m, (lk, rk, op) in zip(matches, expect):
            assert m["ok"] is True, s
            assert m["left_kw"] == lk, f"{s}: left {m['left_kw']} != {lk}"
            assert m["right_kw"] == rk, f"{s}: right {m['right_kw']} != {rk}"
            assert m["op"] == op, f"{s}: op {m['op']} != {op}"


# G1 — IN device/devices (runtime_test.go:18-37)
def test_g1_in_devices_devices():
    refs = make_refs()
    refs.devices.insert_or_replace(make_device(OG, 42.9229004, -72.2791582))
    assert_case(
        [
            "device :radius 1km IN devices(@) :radius 100m",
            "device :radius 1km IN devices(@)",
            "device :bbox 1km IN devices(@)",
            f"devices({K0}) :radius 2km IN devices({OG})",
        ],
        make_device(K0, 42.9236468, -72.2793728),
        refs,
        [("device", "devices", "IN")],
    )


# G2 — NINTERSECTS devices/devices (runtime_test.go:39-77)
def test_g2_nintersects_devices_devices():
    refs = make_refs()
    refs.devices.insert_or_replace(make_device(OG, 42.9152319, -72.2498989))
    target = make_device(K0, 42.9246289, -72.2876353)
    assert_case(
        [
            f"devices({K0}) :radius 1km NINTERSECTS devices(@) :radius 1km",
            f"devices({K0}) :bbox 1km NINTERSECTS devices(@) :bbox 1km",
            f"devices({K0}) :radius 1km NINTERSECTS devices({OG}) :radius 500m",
            f"devices({K0}) NINTERSECTS devices({OG}) :radius 500m",
            f"devices({K0}) NINTERSECTS devices({OG}) :bbox 500m",
            f"devices({K0}) :bbox 500m NINTERSECTS devices({OG}) :bbox 500m",
            f"devices({K0}) :bbox 500m NINTERSECTS devices({OG})",
        ],
        target,
        refs,
        [("device", "devices", "NINTERSECTS")],
    )
    assert_case(
        [
            f"devices({K0}) NINTERSECTS devices({OG})",
            f"devices({K0})  NINTERSECTS devices(@)",
            f"devices({K0}) :radius 300m  NINTERSECTS devices(@)",
            f"devices({K0})  NINTERSECTS devices(@) :bbox 300m",
            f"devices({K0})  NINTERSECTS devices(@) :radius 300m",
        ],
        target,
        refs,
        [("device", "devices", "NINTERSECTS")],
    )


# G3 — INTERSECTS device/polygon (runtime_test.go:79-105)
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


def test_g3_intersects_devices_objects():
    refs = make_refs()
    refs.zones.add(zone_from_ring(AULG, G3_RING))
    assert_case(
        [
            f"devices({K0}) INTERSECTS polygon({AULG})",
            f"devices({K0}) :radius 1km INTERSECTS polygon(@)",
            f"polygon({AULG}) INTERSECTS devices({K0})",
        ],
        make_device(K0, 42.9236075, -72.2792333),
        refs,
        [("device", "polygon", "INTERSECTS")],
    )


# G4 — INTERSECTS devices/devices (runtime_test.go:107-159)
def test_g4_intersects_devices_devices():
    refs = make_refs()
    refs.devices.insert_or_replace(make_device(OG, 42.9236704, -72.2768608))
    target = make_device(K0, 42.9214863, -72.2759164)
    assert_case(
        [
            "device :radius 1km INTERSECTS devices(@) :radius 1km",
            f"devices(@) :radius 1km INTERSECTS devices({K0}) :radius 1km",
            f"devices({K0}) :radius 1km INTERSECTS devices(@) :radius 1km",
            f"devices({K0}) :bbox 1km INTERSECTS devices(@) :bbox 1km",
            f"devices({K0}) :radius 1km INTERSECTS devices({OG}) :radius 500m",
            f"devices({K0}) INTERSECTS devices({OG}) :radius 500m",
            f"devices({K0}) INTERSECTS devices({OG}) :bbox 500m",
            f"devices({K0}) :bbox 500m INTERSECTS devices({OG}) :bbox 500m",
            f"devices({K0}) :bbox 500m INTERSECTS devices({OG})",
        ],
        target,
        refs,
        [("device", "devices", "INTERSECTS")],
    )


def test_g4_identical_coords():
    refs = make_refs()
    refs.devices.insert_or_replace(make_device(OG, 42.9214863, -72.2759164))
    target = make_device(K0, 42.9214863, -72.2759164)
    assert_case(
        [
            f"devices({K0}) INTERSECTS devices({OG})",
            f"devices({K0})  INTERSECTS devices(@)",
            f"devices({K0}) :radius 300m  INTERSECTS devices(@)",
            f"devices({K0})  INTERSECTS devices(@) :bbox 300m",
            f"devices({K0})  INTERSECTS devices(@) :radius 300m",
        ],
        target,
        refs,
        [("device", "devices", "INTERSECTS")],
    )


def test_g4_layer_mismatch_no_match():
    refs = make_refs()
    target = make_device(K0, 42.9214863, -72.2759164)
    ok, matches = run_spec(
        f"devices({K0}) INTERSECTS devices({OG}) {{ :layer c5vj26evvhfjvfseaumg }}",
        target,
        refs,
    )
    assert not ok and matches == []


def test_g4_at_vs_at_compile_error():
    with pytest.raises(CompileError):
        compile_spec("devices(@) INTERSECTS devices(@)")


# G5 — NEAR devices/devices (runtime_test.go:161-194)
def test_g5_near_devices_devices():
    refs = make_refs()
    refs.devices.insert_or_replace(make_device(OG, 42.9240239, -72.2787075))
    refs.devices.insert_or_replace(make_device(KG, 42.9226333, -72.2732452))
    assert_case(
        [
            f"devices({K0}) :radius 500m NEAR devices(@)",
            f"devices({K0}) :bbox 500m NEAR devices(@) :bbox 10m",
            f"devices(@) NEAR devices({K0}) :radius 500m",
        ],
        make_device(K0, 42.9214863, -72.2794802),
        refs,
        [("device", "devices", "NEAR")],
    )


def test_g5_near_same_coords():
    refs = make_refs()
    refs.devices.insert_or_replace(make_device(OG, 42.9214863, -72.2794802))
    refs.devices.insert_or_replace(make_device(KG, 42.9214863, -72.2794802))
    assert_case(
        ["device NEAR devices(@)"],
        make_device(K0, 42.9214863, -72.2794802),
        refs,
        [("device", "devices", "NEAR")],
    )


# G7 — storage-semantics goldens (devices_test.go:12-40, object_test.go:10-54)
def test_g7_devices_near():
    refs = make_refs()
    refs.devices.insert_or_replace(make_device(K0, 42.9312947, -72.2845321))
    refs.devices.insert_or_replace(make_device(OG, 42.9316521, -72.2841567))
    found = refs.devices.near(42.9316717, -72.2846072, 1e9)
    assert len(found) == 2


def test_g7_objects_near():
    refs = make_refs()
    ring1 = np.array(
        [
            (42.9275594, -72.2779242),
            (42.9262828, -72.2796402),
            (42.9252853, -72.2769871),
            (42.9275594, -72.2779242),
        ]
    )
    ring2 = np.array(
        [
            (42.9290747, -72.2755705),
            (42.9279293, -72.2769013),
            (42.9272135, -72.2750986),
            (42.9290747, -72.2755705),
        ]
    )
    refs.zones.add(zone_from_ring(K0, ring1))
    refs.zones.add(zone_from_ring(OG, ring2))
    route = [
        (42.9283436, -72.2757292),
        (42.9286971, -72.2767643),
        (48.6619428, -72.2784912),
    ]
    hits = 0
    for lat, lon in route:
        hits += len(refs.zones.near(NIL, lat, lon, 500.0))
    assert hits == 4


# --- attribute operator semantics (ops #7-#17) ---------------------------


def _attr_device(**kw) -> dict:
    d = make_device(K0, 42.92, -72.27)
    d.update(kw)
    return d


def test_attribute_ops():
    refs = make_refs()
    # equalInt / equalFloat
    ok, m = run_spec("speed eq 42", _attr_device(speed=42.0), refs)
    assert ok and m[0]["op"] == "eq" and m[0]["right_kw"] == "INT"
    ok, _ = run_spec("speed eq 42", _attr_device(speed=42.5), refs)
    assert ok  # int view truncates 42.5 -> 42 (runtime.go:2189-2224)
    ok, _ = run_spec("speed eq 42.5", _attr_device(speed=42.5), refs)
    assert ok
    ok, _ = run_spec("speed lt 10", _attr_device(speed=10.0), refs)
    assert not ok
    # range + boundary-inclusive negation (runtime.go:1082-1088)
    ok, _ = run_spec("speed range [30 .. 120]", _attr_device(speed=30.0), refs)
    assert ok
    ok, _ = run_spec("speed nrange [30 .. 120]", _attr_device(speed=30.0), refs)
    assert ok  # NRANGE is v<=begin OR v>=end — boundaries match BOTH
    ok, _ = run_spec("speed nrange [30 .. 120]", _attr_device(speed=31.0), refs)
    assert not ok
    # in / nin
    ok, _ = run_spec("status in [1, 2, 3]", _attr_device(status=2), refs)
    assert ok
    ok, _ = run_spec("status nin [1, 2, 3]", _attr_device(status=5), refs)
    assert ok
    ok, m = run_spec('owner in ["alice", "bob"]', _attr_device(owner="alice"), refs)
    assert ok and m[0]["right_kw"] == "STRING"
    # string comparators
    ok, _ = run_spec('model eq "T1000"', _attr_device(model="T1000"), refs)
    assert ok
    ok, _ = run_spec('brand lt "b"', _attr_device(brand="a"), refs)
    assert ok


def test_datetime_ops():
    refs = make_refs()
    # 2023-06-15 13:30:00 UTC
    ts = 1686835800
    d = _attr_device(datetime=ts)
    ok, _ = run_spec("hour eq 13", d, refs)
    assert ok
    ok, _ = run_spec("year range [2022 .. 2024]", d, refs)
    assert ok
    ok, _ = run_spec("month eq 6", d, refs)
    assert ok
    ok, _ = run_spec('date eq "2023-06-15"', d, refs)
    assert ok
    ok, _ = run_spec("time range [12:00 .. 23:00]", d, refs)
    assert ok
    ok, _ = run_spec("time gt 14:00", d, refs)
    assert not ok
    ok, _ = run_spec(
        'datetime range ["2023-06-15T00:00:00Z" .. "2023-06-16T00:00:00Z"]', d, refs
    )
    assert ok
    ok, m = run_spec('month eq "June"', d, refs)
    assert ok and m[0]["right_kw"] == "STRING"
    ok, _ = run_spec('day eq "Thursday"', d, refs)
    assert ok


def test_and_or_fold():
    refs = make_refs()
    d = _attr_device(speed=50.0, status=1)
    ok, m = run_spec("speed range [30 .. 120] and status eq 1", d, refs)
    assert ok and len(m) == 2
    ok, m = run_spec("speed range [60 .. 120] and status eq 1", d, refs)
    assert not ok and len(m) == 0  # AND-skip: status node never evaluated? no —
    # node0 false -> skip node1 -> no matches recorded
    ok, m = run_spec("speed range [60 .. 120] or status eq 1", d, refs)
    assert ok and len(m) == 1  # only the true node contributes a match
    ok, m = run_spec(
        "speed range [60 .. 120] and status eq 1 or temperature eq 0", d, refs
    )
    assert ok  # left fold: (false AND x) OR true


def test_distance_comparator():
    refs = make_refs()
    refs.zones.add(zone_from_ring(AULG, G3_RING))
    # target ~ inside polygon; distance to center < 50 -> rounds to 0 or 50
    d = make_device(K0, 42.9236075, -72.2792333)
    # semantics: round50(dist(device, zone center)) <op> left.meters()
    # (runtime.go:1795-1814) — device ~30 m from center, so lt 1km holds
    ok, m = run_spec(f"device :radius 1km lt polygon({AULG})", d, refs)
    assert ok and m[0]["op"] == "lt" and m[0]["right_kw"] == "polygon"
    ok, _ = run_spec(f"device :radius 1km gte polygon({AULG})", d, refs)
    assert not ok


def test_trigger_once_state():
    refs = make_refs()
    spec = compile_spec(
        "status eq 1 { :center 42.92 -72.27 :radius 1km :trigger once }"
    )
    batch = pd.DataFrame([_attr_device(status=1, datetime=1000)])
    ok1, _ = eval_spec(spec, batch, refs, rule_id="r1")
    ok2, _ = eval_spec(spec, batch, refs, rule_id="r1")
    assert bool(ok1[0]) and not bool(ok2[0])  # fires once until reset


def test_trigger_every_state():
    refs = make_refs()
    spec = compile_spec(
        "status eq 1 { :center 42.92 -72.27 :radius 1km :trigger every 10s :reset after 24h }"
    )

    def at(ts):
        return pd.DataFrame([_attr_device(status=1, datetime=ts)])

    ok1, _ = eval_spec(spec, at(1000), refs, rule_id="r2")
    assert bool(ok1[0])  # first evaluation: lastSeen == 0 -> fire
    ok2, _ = eval_spec(spec, at(1005), refs, rule_id="r2")
    assert not bool(ok2[0])  # 5s since reset < 10s delay
    ok3, _ = eval_spec(spec, at(1011), refs, rule_id="r2")
    assert bool(ok3[0])  # 11s since lastReset > 10s
