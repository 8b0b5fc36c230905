"""Zone-kind coverage for the spatial verbs: line, multiPoint, circle,
rect zones through the kernel (runtime.go dispatches every geojson
kind through the same Spatial() predicate interface)."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from spinix_spark.dsl import compile_spec
from spinix_spark.engine.runtime import Reference, eval_spec
from spinix_spark.engine.stores import (
    DeviceSnapshot,
    StateStore,
    ZoneStore,
    zone_from_geojson,
)

NIL = "0" * 20
K0 = "c5vj26evvhfjvfseauk0"
LID = "c5vj26evvhfjvfseaum0"


def _refs():
    return Reference(zones=ZoneStore(), devices=DeviceSnapshot(), states=StateStore())


def _run(spec_str, target, refs):
    ok, matches = eval_spec(
        compile_spec(spec_str), pd.DataFrame([target]), refs, rule_id="r" + "0" * 19
    )
    return bool(ok[0]), matches[0]


def _dev(lat, lon):
    return {"device_id": K0, "layer_id": NIL, "lat": lat, "lon": lon, "datetime": 0}


def test_line_zone_intersects_buffered_device():
    refs = _refs()
    # N-S line through lon -72.27
    line = {
        "type": "LineString",
        "coordinates": [[-72.27, 42.90], [-72.27, 42.95]],
    }
    refs.zones.add(zone_from_geojson(LID, NIL, json.dumps(line)))
    # device ~60 m west of the line with a 200 m ring → crosses
    ok, m = _run(f"device :radius 200m INTERSECTS line({LID})", _dev(42.92, -72.2707), refs)
    assert ok and m[0]["right_kw"] == "line"
    # 2 km away → no intersection
    ok, _ = _run(f"device :radius 200m INTERSECTS line({LID})", _dev(42.92, -72.2950), refs)
    assert not ok
    # point exactly on the line: IntersectsPoint via point_on_line
    ok, _ = _run(f"device INTERSECTS line({LID})", _dev(42.93, -72.27), refs)
    assert ok


def test_multipoint_zone():
    refs = _refs()
    mp = {
        "type": "MultiPoint",
        "coordinates": [[-72.27, 42.92], [-72.28, 42.93]],
    }
    refs.zones.add(zone_from_geojson(LID, NIL, json.dumps(mp)))
    # buffered device covering one member point → INTERSECTS
    ok, _ = _run(f"device :radius 300m INTERSECTS multiPoint({LID})", _dev(42.921, -72.27), refs)
    assert ok
    # point-device at the exact member coords → equality intersect
    ok, _ = _run(f"device INTERSECTS multiPoint({LID})", _dev(42.92, -72.27), refs)
    assert ok
    ok, _ = _run(f"device INTERSECTS multiPoint({LID})", _dev(42.99, -72.27), refs)
    assert not ok


def test_circle_zone_exact_contains():
    refs = _refs()
    circ = {"type": "Circle", "coordinates": [-72.27, 42.92], "radius": 500.0}
    refs.zones.add(zone_from_geojson(LID, NIL, json.dumps(circ)))
    # ~333 m north of center → inside (exact haversine, tidwall
    # Circle.Contains semantics)
    ok, _ = _run(f"device INTERSECTS circle({LID})", _dev(42.923, -72.27), refs)
    assert ok
    # ~1.1 km north → outside
    ok, _ = _run(f"device INTERSECTS circle({LID})", _dev(42.93, -72.27), refs)
    assert not ok


def test_rect_like_polygon_zone_bbox_verbs():
    refs = _refs()
    rect = {
        "type": "Polygon",
        "coordinates": [
            [
                [-72.28, 42.91],
                [-72.26, 42.91],
                [-72.26, 42.93],
                [-72.28, 42.93],
                [-72.28, 42.91],
            ]
        ],
    }
    refs.zones.add(zone_from_geojson(LID, NIL, json.dumps(rect)))
    # :bbox device fully inside the rect → IN (WithinRect on the zone
    # means zone within device rect; here test device-rect INTERSECTS)
    ok, _ = _run(f"device :bbox 500m INTERSECTS polygon({LID})", _dev(42.92, -72.27), refs)
    assert ok
    # zone within a huge device bbox → IN fires (zone ⊆ rect)
    ok, _ = _run(f"device :bbox 5km IN polygon({LID})", _dev(42.92, -72.27), refs)
    assert ok
    ok, _ = _run(f"device :bbox 100m IN polygon({LID})", _dev(42.92, -72.27), refs)
    assert not ok  # zone not within a 100 m bbox
