"""Keyed streaming detect: store-backed per-device state."""

from __future__ import annotations

import numpy as np
import pandas as pd

from spinix_spark.engine.detect import Engine
from spinix_spark.engine.stores import zone_from_ring
from spinix_spark.streaming.keyed_detect import keyed_stream_detect

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


def test_keyed_stream_detect_trigger_once(spark, tmp_path):
    # two devices; K0 sends 3 in-zone updates, OG sends 1 out-of-zone
    pdf = pd.DataFrame(
        {
            "device_id": [K0, K0, K0, OG],
            "url": [f"u{i}" for i in range(4)],
            "layer_id": ["0" * 20] * 4,
            "lat": [42.9236075, 42.9236075, 42.9236075, 10.0],
            "lon": [-72.2792333] * 3 + [10.0],
            "datetime": [1000, 1001, 1002, 1000],
            "speed": [0.0] * 4,
            "status": [0] * 4,
        }
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)

    engine = Engine()
    engine.zones.add(zone_from_ring(AULG, G3_RING))
    # trigger once: only the FIRST in-zone update fires per device
    engine.add_rule(
        f"device INTERSECTS polygon({AULG})"
        " { :center 42.9236 -72.2795 :radius 5km :trigger once }",
        rule_id="r" + "0" * 19,
    )

    out = keyed_stream_detect(stream, engine)
    q = (
        out.writeStream.format("memory")
        .queryName("keyed_events")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM keyed_events").collect()
    assert len(rows) == 1  # trigger-once suppressed updates 2 and 3
    assert rows[0].device_id == K0 and rows[0].right_refs == [AULG]
    assert rows[0].datetime == 1000  # the first (event-time ordered) update


def test_keyed_stream_rejects_device_vs_device(spark):
    """The keyed form has no cross-device snapshot: devices(...) verbs
    must raise loudly instead of silently matching nothing."""
    import pytest

    from spinix_spark.engine.detect import Engine
    from spinix_spark.streaming.keyed_detect import keyed_stream_detect

    eng = Engine()
    eng.add_rule(
        "device :radius 300m intersects devices(@)"
        " { :center 42.92 -72.27 :radius 50km }",
        rule_id="r" + "9" * 19,
    )
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    with pytest.raises(ValueError, match="stream_detect_scalable"):
        keyed_stream_detect(stream, eng)
