"""Revival of the reference's disabled end-to-end Detect tests
(engine_test.go:22-120, commented out in the reference but documenting
intended behavior): a device walks a 5-point route against polygon
zones; case 1 (AND speed range) yields 0 events, case 2 (OR over two
polygons) yields 3 events. Refs are upgraded to valid xids (the
disabled suite predates xid-validated refs)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from spinix_spark.engine.detect import Engine
from spinix_spark.engine.stores import zone_from_ring

K0 = "c5vj26evvhfjvfseauk0"
ID1 = "c5vj26evvhfjvfseaul0"
ID2 = "c5vj26evvhfjvfseaum0"

# polyFromString blocks are (lon, lat); stored here as (lat, lon)
O1 = np.array(
    [
        (42.9312970, -72.2857655),
        (42.9303544, -72.2856582),
        (42.9306686, -72.2822902),
        (42.9317841, -72.2824833),
        (42.9313285, -72.2857441),
        (42.9312970, -72.2857655),
    ]
)
O2 = np.array(
    [
        (42.9320826, -72.2804024),
        (42.9308571, -72.2802737),
        (42.9311085, -72.2779998),
        (42.9323182, -72.2781928),
        (42.9320826, -72.2804239),
        (42.9320826, -72.2804024),
    ]
)

ROUTE = [
    (42.9318155, -72.2764766, 10.0),
    (42.9317998, -72.2771417, 25.0),
    (42.9315013, -72.2793513, 50.0),
    (42.9310400, -72.2829678, 120.0),
    (42.9308672, -72.2851988, 5.0),
]


def _walk(engine: Engine) -> list:
    events = []
    for i, (lat, lon, speed) in enumerate(ROUTE):
        batch = pd.DataFrame(
            [
                {
                    "device_id": K0,
                    "layer_id": "0" * 20,
                    "lat": lat,
                    "lon": lon,
                    "speed": speed,
                    "datetime": 1000 + i,
                    "imei": "qwe34q",
                }
            ]
        )
        ev = engine.detect_batch(batch)
        events.extend(ev.to_dict("records"))
    return events


def test_route_intersects_and_speed_no_match():
    engine = Engine()
    engine.zones.add(zone_from_ring(ID1, O1))
    engine.add_rule(
        f"device INTERSECTS objects({ID1}) AND speed RANGE [20 .. 30]"
        " { :center 42.9314328 -72.2812945 }"
    )
    assert _walk(engine) == []


def test_route_intersects_or_three_events():
    engine = Engine()
    engine.zones.add(zone_from_ring(ID1, O1))
    engine.zones.add(zone_from_ring(ID2, O2))
    engine.add_rule(
        f"device INTERSECTS objects({ID1}) OR device INTERSECTS objects({ID2})"
        " { :center 42.9314328 -72.2812945 }"
    )
    events = _walk(engine)
    assert len(events) == 3
    # the three in-zone route points, in route order
    hit_latlons = [
        (42.9315013, -72.2793513),
        (42.9310400, -72.2829678),
        (42.9308672, -72.2851988),
    ]
    assert [e["datetime"] for e in events] == [1002, 1003, 1004]
    refs = [m["right_refs"] for e in events for m in e["matches"]]
    assert refs == [[ID2], [ID1], [ID1]]


def test_rule_auto_expand_radius():
    """engine.go:154-188: with :center far from the zone and no radius,
    the rule circle triples until its bbox contains the referenced
    objects."""
    engine = Engine()
    engine.zones.add(zone_from_ring(ID1, O1))
    rule = engine.add_rule(
        f"device INTERSECTS objects({ID1}) {{ :center 42.9314328 -72.2812945 }}"
    )
    b = rule.bbox
    z = engine.zones.lookup(ID1).bbox
    assert z[0] >= b[0] and z[1] >= b[1] and z[2] <= b[2] and z[3] <= b[3]


def test_rule_auto_center_from_objects():
    """engine.go:137-152: no :center → derived from referenced
    objects' combined bbox."""
    engine = Engine()
    engine.zones.add(zone_from_ring(ID1, O1))
    rule = engine.add_rule(f"device INTERSECTS objects({ID1})")
    z = engine.zones.lookup(ID1).bbox
    assert z[0] <= rule.spec.props.center_lat <= z[2]
    assert z[1] <= rule.spec.props.center_lon <= z[3]


def test_rule_no_center_no_objects_errors():
    import pytest

    engine = Engine()
    with pytest.raises(ValueError):
        engine.add_rule("speed range [1 .. 10]")
