"""Structured Streaming detection.

The reference's hot path is one-device-at-a-time ``Engine.Detect``
(engine.go:190-225); its natural streaming form is a micro-batch
pipeline: each micro-batch is evaluated against the device-position
snapshot as of the previous batch (the evaluate-then-insert ordering,
engine.go:218-221), then merged into it. Two implementations:

- ``stream_detect``: ``writeStream.foreachBatch`` over the batch
  pipeline — exact batch semantics, carries the snapshot and trigger
  state across micro-batches on the driver (zones/rules stay
  broadcast). Checkpointing via the stream's checkpointLocation.
- ``stateful_trigger_stream``: a keyed ``applyInPandasWithState``
  stage for per-(device, rule) trigger state at scale — state lives in
  the state store, sharded by key, no driver round-trip.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from spinix_spark.engine.detect import Engine
from spinix_spark.engine.spark_pipeline import (
    detect_batch_spark,
    merge_state_rows,
    split_output,
)


# stream_detect / snapshot_from_points collect to the driver by design
# (dimension-scale demo forms); refuse loudly past this row count so the
# foot-gun can't silently OOM the driver at fact scale
COLLECT_GUARD_ROWS = 1_000_000


def stream_detect(
    points_stream: DataFrame,
    engine: Engine,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Run detection over a streaming points DataFrame — the
    DIMENSION-SCALE demo form: it maintains the device snapshot and
    trigger state on the driver (collects each micro-batch), which is
    only appropriate when the device universe is small. The fact-scale
    forms are :func:`stream_detect_scalable` (snapshot as parquet
    state, no fact-side collect) and keyed_detect.keyed_stream_detect
    (per-device trigger state in Spark's state store).

    ``sink(events_df, batch_id)`` receives each micro-batch's event
    rows. The engine's snapshot and trigger state advance between
    micro-batches (batch N sees positions as of batch N-1)."""
    state_rows: list[dict] = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal state_rows
        batch_df = batch_df.cache()
        n = batch_df.count()
        if n > COLLECT_GUARD_ROWS:
            raise ValueError(
                f"stream_detect micro-batch has {n} rows (> "
                f"{COLLECT_GUARD_ROWS}): this demo form collects each "
                "batch to the driver to advance the snapshot; use "
                "stream_detect_scalable (parquet-versioned snapshot, no "
                "driver collect) at this scale"
            )
        out = detect_batch_spark(batch_df, engine, state_rows=state_rows)
        events, states = split_output(out)
        sink(events, batch_id)
        state_rows = merge_state_rows(
            state_rows, [r.asDict() for r in states.collect()]
        )
        engine.devices.merge_batch(
            [r.asDict() for r in batch_df.collect()]
        )
        batch_df.unpersist()

    writer = points_stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _latest_version(
    spark, work_dir: str, table: str, batch_id: int
) -> tuple[int, DataFrame | None]:
    """Latest persisted version STRICTLY BELOW batch_id. Versions are
    keyed by batch_id, so on a checkpointed foreachBatch replay of
    batch N (crash after the vN write) this re-reads the pre-N state —
    the replay is idempotent instead of evaluating the batch against a
    snapshot containing its own rows / already-advanced trigger
    state."""
    import os

    base = os.path.join(work_dir, table)
    if not os.path.isdir(base):
        return -1, None
    versions = sorted(
        v
        for d in os.listdir(base)
        if d.startswith("v") and (v := int(d[1:])) < batch_id
    )
    if not versions:
        return -1, None
    v = versions[-1]
    return v, spark.read.parquet(os.path.join(base, f"v{v}"))


def _prune_versions(work_dir: str, table: str, keep_from: int) -> None:
    """Delete snapshot/state versions below ``keep_from`` — without
    retention the per-batch versioned tables grow with stream lifetime
    (each version is a full snapshot). Runs AFTER the batch's writes,
    so the version a concurrent replay could still need is governed by
    the caller's retain window, never the one just read."""
    import os
    import shutil

    base = os.path.join(work_dir, table)
    if not os.path.isdir(base):
        return
    for d in os.listdir(base):
        if d.startswith("v") and int(d[1:]) < keep_from:
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)


def stream_detect_scalable(
    points_stream: DataFrame,
    engine: Engine,
    sink: Callable[[DataFrame, int], None],
    work_dir: str,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
    at_salt: int = 0,
    retain_versions: int = 2,
):
    """Fact-scale micro-batch detection: NOTHING fact-sized ever
    reaches the driver.

    The device-position snapshot lives as a parquet table under
    ``work_dir`` (latest position per device), versioned per
    micro-batch: batch N is evaluated against version N-1 — the
    reference's evaluate-then-insert ordering (engine.go:218-221) —
    then ``snapshot_vN = latest(snapshot_v(N-1) ∪ batch)`` is written
    with DataFrame ops only (window + filter, one shuffle on
    device_id). ``devices(@)`` rules route through the pair-join
    strategy (engine/devices_at.py) against that snapshot DataFrame;
    zones/rules stay broadcast (dimension-sized).

    Trigger state rides the same mechanism: per-(device, rule) trigger
    states live in a second versioned parquet table and join the
    shuffle co-partitioned with their rows
    (detect_batch_spark(state_df=...)) — dirty emissions merge back
    with one shuffle (merge_state_df). The keyed
    applyInPandasWithState form (keyed_detect) remains for
    low-latency per-key streaming.

    ``retain_versions`` bounds the on-disk history: after batch N's
    writes, versions below N - retain_versions are deleted. The
    replay-idempotency contract (read newest version strictly below
    the replayed batch id) only ever needs the immediately-preceding
    version, so the default of 2 keeps a safety margin while the table
    footprint stays O(retain × snapshot) instead of O(stream lifetime).
    Pass retain_versions=None to keep every version (debugging/audit).
    """
    from spinix_spark.engine.devices_at import (
        at_ineligible_reasons,
        snapshot_df_from_points,
    )
    from spinix_spark.engine.spark_pipeline import merge_state_df

    # every @ rule must fit the pair-join strategy here (the kernel
    # fallback's broadcast snapshot is empty at fact scale — @ would
    # silently evaluate false). The probe mirrors the ACTUAL routing:
    # shape check + a Catalyst compile dry-run of the companion nodes.
    # Stateful @ rules are fine — they take _at_rule_events_stateful.
    reasons = at_ineligible_reasons(engine, points_stream.columns)
    if reasons:
        raise ValueError(
            "stream_detect_scalable: devices(@) rule(s) would fall back "
            "to the broadcast-kernel path, whose snapshot is empty at "
            "fact scale: " + "; ".join(reasons)
        )

    snap_cols = ["device_id", "layer_id", "lat", "lon", "datetime"]

    def process(batch_df: DataFrame, batch_id: int) -> None:
        import os

        spark = batch_df.sparkSession
        _v, snap = _latest_version(spark, work_dir, "snapshot", batch_id)
        _sv, state = _latest_version(spark, work_dir, "state", batch_id)
        out = detect_batch_spark(
            batch_df,
            engine,
            devices_df=snap
            if snap is not None
            else spark.createDataFrame([], "device_id string, layer_id string, lat double, lon double"),
            at_salt=at_salt,
            state_df=state,
        ).cache()  # one pipeline run feeds both the sink and the state table
        events, states = split_output(out)
        sink(events, batch_id)
        new_state = states if state is None else merge_state_df(state, states)
        new_state.write.mode("overwrite").parquet(
            os.path.join(work_dir, "state", f"v{batch_id}")
        )
        out.unpersist()
        have = [c for c in snap_cols if c in batch_df.columns]
        merged = batch_df.select(*have)
        if snap is not None:
            merged = snap.select(*have).unionByName(merged)
        new_snap = snapshot_df_from_points(merged)
        new_snap.write.mode("overwrite").parquet(
            os.path.join(work_dir, "snapshot", f"v{batch_id}")
        )
        if retain_versions is not None:
            _prune_versions(work_dir, "snapshot", batch_id - retain_versions)
            _prune_versions(work_dir, "state", batch_id - retain_versions)

    writer = points_stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


TRIGGER_STATE_SCHEMA = StructType(
    [
        StructField("last_seen", LongType()),
        StructField("last_reset", LongType()),
        StructField("hits", LongType()),
    ]
)

TRIGGER_OUT_SCHEMA = StructType(
    [
        StructField("device_id", StringType()),
        StructField("rule_id", StringType()),
        StructField("datetime", LongType()),
        StructField("fired", LongType()),
        StructField("hits", LongType()),
    ]
)


def make_trigger_fn(repeat: int, delay_s: float, interval_s: float, times: int, reset_interval_s: float):
    """Build the applyInPandasWithState update function implementing
    checkTrigger/changeState (runtime.go:103-163) for one rule's
    params. Keyed by (device_id, rule_id); event-time driven."""
    from spinix_spark.dsl import ast_nodes as ast

    def update(key, pdfs, state: GroupState):
        device_id, rule_id = key
        if state.exists:
            last_seen, last_reset, hits = state.get
        else:
            last_seen, last_reset, hits = 0, 0, 0
        rows = []
        for pdf in pdfs:
            for ts in sorted(int(t) for t in pdf["datetime"]):
                now = ts
                need = (
                    reset_interval_s == 0
                    or last_reset == 0
                    or (now - last_reset) >= int(reset_interval_s)
                )
                if need:
                    last_seen, hits = 0, 0
                    last_reset = now
                if repeat == ast.REPEAT_EVERY:
                    fire = last_seen == 0 or (now - last_reset) > int(delay_s)
                elif repeat == ast.REPEAT_TIMES:
                    fire = (now - last_seen) >= int(interval_s) and hits < times
                elif repeat == ast.REPEAT_ONCE:
                    fire = hits == 0
                else:
                    fire = True
                if fire:
                    last_seen = now
                    if repeat in (ast.REPEAT_TIMES, ast.REPEAT_ONCE):
                        hits += 1
                rows.append(
                    {
                        "device_id": device_id,
                        "rule_id": rule_id,
                        "datetime": now,
                        "fired": 1 if fire else 0,
                        "hits": hits,
                    }
                )
        state.update((last_seen, last_reset, hits))
        yield pd.DataFrame(rows)

    return update


def streaming_tile_rollup(
    points_stream: DataFrame,
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Windowed tile raster over a points stream with late-data
    handling: event-time watermark + tumbling window, grouped by
    (window, cell). State for closed windows is dropped by the
    watermark; the aggregation is partial map-side then keyed by
    (window, cell) — the streaming form of engine/tiles.py rollup."""
    from pyspark.sql import functions as F

    return (
        points_stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col("cell"))
        .agg(
            F.count("*").alias("n_points"),
            F.approx_count_distinct("device_id").alias("n_devices"),
        )
    )


def stateful_trigger_stream(matches_stream: DataFrame, trigger_fn) -> DataFrame:
    """Keyed trigger gating over a stream of per-(device, rule) match
    rows — state sharded by the grouping key in Spark's state store."""
    return matches_stream.groupBy("device_id", "rule_id").applyInPandasWithState(
        trigger_fn,
        outputStructType=TRIGGER_OUT_SCHEMA,
        stateStructType=TRIGGER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
