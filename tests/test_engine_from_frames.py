"""Engine.from_frames: the migration path for a reference user —
zones as GeoJSON rows + rules as DSL strings (FIXTURES.md §3/§4)."""

from __future__ import annotations

import json

import pandas as pd

from spinix_spark.engine.detect import Engine

K0 = "c5vj26evvhfjvfseauk0"
AULG = "c5vj26evvhfjvfseaulg"

G3_POLY_GEOJSON = json.dumps(
    {
        "type": "Polygon",
        "coordinates": [
            [
                [-72.2800060, 42.9238589],
                [-72.2802743, 42.9231989],
                [-72.2790616, 42.9232461],
                [-72.2787397, 42.9239689],
                [-72.2799953, 42.9238746],
                [-72.2800060, 42.9238589],
            ]
        ],
    }
)


def test_engine_from_frames_pandas():
    zones = pd.DataFrame(
        [
            {
                "object_id": AULG,
                "layer_id": "0" * 20,
                "kind": "polygon",
                "geojson": G3_POLY_GEOJSON,
            }
        ]
    )
    rules = pd.DataFrame(
        [
            {
                "rule_id": "r" + "0" * 19,
                "spec": f"devices({K0}) INTERSECTS polygon({AULG})",
            }
        ]
    )
    engine = Engine.from_frames(zones, rules)
    assert len(engine.zones) == 1 and len(engine.rules) == 1
    batch = pd.DataFrame(
        [
            {
                "device_id": K0,
                "layer_id": "0" * 20,
                "lat": 42.9236075,
                "lon": -72.2792333,
                "datetime": 1000,
            }
        ]
    )
    events = engine.detect_batch(batch)
    assert len(events) == 1
    assert events.iloc[0]["matches"][0]["right_refs"] == [AULG]


def test_engine_from_frames_spark(spark):
    zones = spark.createDataFrame(
        [(AULG, "0" * 20, "polygon", G3_POLY_GEOJSON)],
        "object_id string, layer_id string, kind string, geojson string",
    )
    rules = spark.createDataFrame(
        [("r" + "0" * 19, f"devices({K0}) INTERSECTS polygon({AULG})")],
        "rule_id string, spec string",
    )
    engine = Engine.from_frames(zones, rules)
    assert len(engine.zones) == 1 and len(engine.rules) == 1
