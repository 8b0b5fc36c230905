"""Fact-scale streaming detect: snapshot as parquet state, no driver
collect, devices(@) via the pair-join strategy, multi-partition."""

from __future__ import annotations

import pandas as pd

from spinix_spark.engine.detect import Engine
from spinix_spark.streaming.detect_stream import stream_detect_scalable

LAYER = "0" * 20
RULE = "device :radius 300m intersects devices(@) { :center 42.93 -72.27 :radius 50km }"


def _batch(i: int, lat, lon, n=4):
    return pd.DataFrame(
        {
            "url": [f"b{i}u{j}" for j in range(n)],
            "device_id": [f"d{j:019d}" for j in range(n)],
            "layer_id": [LAYER] * n,
            "lat": lat,
            "lon": lon,
            "datetime": [1700000000 + i * 100 + j for j in range(n)],
            "speed": [10.0] * n,
            "status": [1] * n,
        }
    )


def test_stream_detect_scalable_at_rule(spark, tmp_path):
    # batch 0: four devices clustered ~100 m apart; batch 1: two of
    # them move across town (they still see batch-0 positions of the
    # others in the snapshot — evaluate-then-insert)
    b0 = _batch(0, [42.9301, 42.9302, 42.9310, 42.9400], [-72.2701] * 4)
    b1 = _batch(1, [42.9303, 42.9600, 42.9311, 42.9401], [-72.2701] * 4)
    src = str(tmp_path / "src")
    spark.createDataFrame(b0).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    engine = Engine()
    engine.add_rule(RULE, rule_id="r" + "0" * 19)

    got: dict[int, list] = {}

    def sink(events, batch_id):
        got[batch_id] = events.collect()

    q = stream_detect_scalable(
        stream,
        engine,
        sink,
        work_dir=str(tmp_path / "work"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    # batch 0: empty snapshot → no events
    assert got.get(0, []) == [] or len(got[0]) == 0
    # batch 1: rows near the batch-0 cluster positions match; the
    # device that moved to 42.96 matches nothing
    ev = got[1]
    assert len(ev) > 0
    by_dev = {}
    for r in ev:
        by_dev.setdefault(r.device_id, set()).update(r.right_refs)
    d = [f"d{j:019d}" for j in range(4)]
    # d0 at 42.9303 is within 300 m of batch-0 d0/d1 (and d2 ~100m)
    assert d[0] in by_dev and by_dev[d[0]] >= {d[0], d[1]}
    assert d[1] not in by_dev  # moved to 42.96: nothing within 300 m
    assert d[3] in by_dev and d[3] in by_dev[d[3]]  # sees own old position

    # the snapshot state advanced on disk (one version per batch)
    import os

    versions = sorted(os.listdir(tmp_path / "work" / "snapshot"))
    assert versions == ["v0", "v1"]
    snap = spark.read.parquet(str(tmp_path / "work" / "snapshot" / "v1"))
    latest = {r.device_id: r.lat for r in snap.collect()}
    assert latest[d[1]] == 42.9600  # batch-1 position won


def test_stream_detect_scalable_trigger_state(spark, tmp_path):
    """Trigger state persists across micro-batches through the
    versioned parquet state table: a :trigger once attribute rule
    fires once per device in batch 0 and is fully suppressed in
    batch 1 — with no state ever collecting to the driver."""
    b0 = _batch(0, [42.93] * 4, [-72.27] * 4)
    b1 = _batch(1, [42.93] * 4, [-72.27] * 4)
    src = str(tmp_path / "src")
    spark.createDataFrame(b0).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    engine = Engine()
    engine.add_rule(
        "status eq 1 { :center 42.93 -72.27 :radius 5km :trigger once }",
        rule_id="r" + "1" * 19,
    )
    got: dict[int, int] = {}

    def sink(events, batch_id):
        got[batch_id] = events.count()

    q = stream_detect_scalable(
        stream,
        engine,
        sink,
        work_dir=str(tmp_path / "work"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    assert got[0] == 4  # once per device
    assert got[1] == 0  # carried state suppresses the replay
    st = spark.read.parquet(str(tmp_path / "work" / "state" / "v1"))
    rows = {(r.device_id, r.rule_id): r.hits for r in st.collect()}
    assert len(rows) == 4 and all(h == 1 for h in rows.values())


def test_stream_detect_scalable_version_retention(spark, tmp_path):
    """retain_versions bounds the on-disk snapshot/state history while
    each batch still evaluates against its predecessor (trigger state
    stays continuous across the pruned horizon)."""
    import os

    src = str(tmp_path / "src")
    n_batches = 5
    for i in range(n_batches):
        b = _batch(i, [42.93] * 4, [-72.27] * 4)
        spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    engine = Engine()
    engine.add_rule(
        "status eq 1 { :center 42.93 -72.27 :radius 5km :trigger 2 times interval 0s }",
        rule_id="r" + "2" * 19,
    )
    got = {}

    def sink(events, batch_id):
        got[batch_id] = events.count()

    q = stream_detect_scalable(
        stream, engine, sink,
        work_dir=str(tmp_path / "work"), checkpoint_dir=str(tmp_path / "ckpt"),
        retain_versions=2,
    )
    q.awaitTermination(240)
    # trigger continuity: 2-times quota is spent in batches 0+1, then 0
    assert [got[i] for i in range(n_batches)] == [4, 4, 0, 0, 0]
    # retention: only the last 3 versions (N-2 .. N) survive
    for table in ("snapshot", "state"):
        versions = sorted(os.listdir(tmp_path / "work" / table))
        assert versions == ["v2", "v3", "v4"], (table, versions)
