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

import posixpath
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
        # guard probe: limit(GUARD+1).count() short-circuits after
        # GUARD+1 rows instead of counting the whole batch — the probe
        # costs O(GUARD) regardless of batch size, and the cache it
        # seeds is reused by the detect scan below (one full pass).
        n = batch_df.limit(COLLECT_GUARD_ROWS + 1).count()
        if n > COLLECT_GUARD_ROWS:
            raise ValueError(
                f"stream_detect micro-batch exceeds {COLLECT_GUARD_ROWS} "
                "rows: this demo form collects each batch to the driver "
                "to advance the snapshot; use stream_detect_scalable "
                "(bucketed parquet snapshot, no driver collect) at this "
                "scale"
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


def _warn_triggerless_stateful(engine: Engine) -> None:
    """Surface the documented fast-path divergence up front: a
    trigger-less ``{...}`` props block is stateful (the reference
    advances last_seen per gated row), but the SQL/pair-join fast
    paths suppress those state rows unless
    ``synth_triggerless_states=True`` — events are unaffected (the
    gate is constant-true). Callers that read the STATE output of a
    fast-path run for such rules would otherwise silently miss rows
    depending on which physical strategy each rule took."""
    import warnings

    from spinix_spark.dsl import ast_nodes as ast

    ids = [
        r.rule_id
        for r in engine.rules.values()
        if r.spec.is_stateful and r.spec.props.repeat == ast.REPEAT_NONE
    ]
    if ids:
        warnings.warn(
            "trigger-less stateful rule(s) "
            + ", ".join(ids)
            + ": state rows are suppressed on the SQL/pair-join fast "
            "paths (events unaffected); pass synth_triggerless_states="
            "True to detect_batch_spark for exact kernel-parity state "
            "output",
            stacklevel=3,
        )


def stream_detect_scalable(
    points_stream: DataFrame,
    engine: Engine,
    sink: Callable[[DataFrame, int], None],
    work_dir: str,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
    at_salt: int = 0,
    retain_versions: int = 2,
    n_buckets: int = 256,
):
    """Fact-scale micro-batch detection: NOTHING fact-sized ever
    reaches the driver, and per-batch state I/O is O(delta), not
    O(device universe).

    The device-position snapshot lives as a hash-bucketed, per-bucket
    versioned parquet table under ``work_dir`` (latest position per
    device; :class:`~spinix_spark.streaming.state_table.
    BucketedVersionTable`). Batch N is evaluated against the table as
    of N-1 — the reference's evaluate-then-insert ordering
    (engine.go:218-221) — then ONLY the buckets containing batch-N
    devices are rewritten as ``latest(prior_bucket ∪ batch)`` (window
    + filter, one shuffle on device_id). All filesystem metadata goes
    through the Hadoop FileSystem API, so ``work_dir`` may be an
    ``s3a://``/``gs://``/``hdfs://`` path. ``devices(@)`` rules route
    through the pair-join strategy (engine/devices_at.py) against that
    snapshot DataFrame; zones/rules stay broadcast (dimension-sized).

    Trigger state rides the same mechanism: per-(device, rule) trigger
    states live in a second bucketed table (bucketed on device_id) and
    join the shuffle co-partitioned with their rows
    (detect_batch_spark(state_df=...)) — dirty emissions merge back
    into only their buckets (merge_state_df over the dirty subset).
    The keyed applyInPandasWithState form (keyed_detect) remains for
    low-latency per-key streaming.

    ``retain_versions`` bounds the on-disk history PER BUCKET: each
    bucket keeps its newest ``retain_versions + 1`` versions. The
    replay-idempotency contract (read newest version strictly below
    the replayed batch id, per bucket) only ever needs one predecessor,
    so the default of 2 keeps a safety margin while the footprint stays
    O(retain × table) instead of O(stream lifetime). Pass
    retain_versions=None to keep every version (debugging/audit).
    ``n_buckets`` is a layout constant for the stream's lifetime —
    only non-empty buckets materialise, so the 256 default costs
    nothing at small scale.
    """
    from spinix_spark.engine.devices_at import (
        at_ineligible_reasons,
        snapshot_df_from_points,
    )
    from spinix_spark.engine.spark_pipeline import merge_state_df
    from spinix_spark.streaming.state_table import BucketedVersionTable

    # every @ rule must fit the pair-join strategy here (the kernel
    # fallback's broadcast snapshot is empty at fact scale — @ would
    # silently evaluate false), and every explicit device ref must
    # resolve against a populated engine.devices. The probe mirrors
    # the ACTUAL routing: shape check + a Catalyst compile dry-run.
    # Stateful @ rules are fine — they take _at_rule_events_stateful.
    reasons = at_ineligible_reasons(engine, points_stream.columns)
    if reasons:
        raise ValueError(
            "stream_detect_scalable: rule(s) would evaluate against an "
            "empty broadcast device snapshot at fact scale: "
            + "; ".join(reasons)
        )
    _warn_triggerless_stateful(engine)

    snap_cols = ["device_id", "layer_id", "lat", "lon", "datetime"]

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        snap_t = BucketedVersionTable(
            spark, posixpath.join(work_dir, "snapshot"), n_buckets=n_buckets
        )
        state_t = BucketedVersionTable(
            spark, posixpath.join(work_dir, "state"), n_buckets=n_buckets
        )
        snap = snap_t.read_latest(batch_id)
        state = state_t.read_latest(batch_id)
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
        # trigger state: dirty buckets = buckets of this batch's dirty
        # emissions; merge_state_df restricted to those buckets is
        # identical to the full merge there, and untouched buckets keep
        # their older versions (no rewrite).
        state_t.merge_write(states, batch_id, merge=merge_state_df)
        out.unpersist()
        # snapshot: dirty buckets = buckets of batch devices
        have = [c for c in snap_cols if c in batch_df.columns]
        batch_pts = batch_df.select(*have)

        def snap_merge(prior, upd):
            return snapshot_df_from_points(prior.unionByName(upd))

        snap_t.merge_write(
            snapshot_df_from_points(batch_pts),
            batch_id,
            merge=snap_merge,
            select_cols=have,
        )
        if retain_versions is not None:
            snap_t.prune(retain_versions)
            state_t.prune(retain_versions)

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
