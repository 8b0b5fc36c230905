"""Keyed streaming detection: per-device state in Spark's state store.

``stream_detect`` (detect_stream.py) carries snapshot/trigger state on
the driver between micro-batches — fine for dimension-scale state.
This module is the fact-scale form: the stream is keyed by device_id
and evaluated in ``applyInPandasWithState``, so

- each device's last position and per-rule trigger state live in the
  state store, sharded by the grouping key (RocksDB/HDFS-backed on a
  real cluster, checkpointed with the query),
- updates for one device are processed in event-time order within the
  group, reproducing the reference's sequential evaluate-then-insert
  ordering per device (engine.go:218-221),
- zones + compiled rules ride a broadcast variable.

Scope (documented): zone rules, attribute rules, and trigger state.
Device-vs-device ``@`` verbs need a cross-device snapshot and route
through the micro-batch form or the pair-join operators instead
(engine/joins.py) — a keyed stream cannot see other keys by design.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from spinix_spark.engine.detect import Engine
from spinix_spark.engine.runtime import Reference, eval_spec
from spinix_spark.engine.stores import DeviceSnapshot, StateStore, ZoneStore

EVENT_SCHEMA = StructType(
    [
        StructField("device_id", StringType()),
        StructField("url", StringType()),
        StructField("rule_id", StringType()),
        StructField("left_kw", StringType()),
        StructField("right_kw", StringType()),
        StructField("op", StringType()),
        StructField("right_refs", ArrayType(StringType())),
        StructField("datetime", LongType()),
    ]
)

# state: packed trigger counters per rule (aligned to the broadcast
# rule order) — last_seen[i], last_reset[i], hits[i]
STATE_SCHEMA = StructType(
    [
        StructField("last_seen", ArrayType(LongType())),
        StructField("last_reset", ArrayType(LongType())),
        StructField("hits", ArrayType(LongType())),
    ]
)


def make_keyed_detect_fn(payload_broadcast):
    """Build the applyInPandasWithState update function. ``payload``:
    {"zones": ZoneStore, "rules": [(rule_id, CompiledSpec, bbox)]}."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (device_id,) = key
        p = payload_broadcast.value
        rules = p["rules"]
        n_rules = len(rules)
        if state.exists:
            last_seen, last_reset, hits = state.get
            last_seen, last_reset, hits = (
                list(last_seen),
                list(last_reset),
                list(hits),
            )
        else:
            last_seen = [0] * n_rules
            last_reset = [0] * n_rules
            hits = [0] * n_rules

        zones: ZoneStore = p["zones"]
        out_frames = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("datetime").reset_index(drop=True)
            for k, (rule_id, spec, bbox) in enumerate(rules):
                lat = pdf["lat"].to_numpy(np.float64)
                lon = pdf["lon"].to_numpy(np.float64)
                mask = (
                    (lat >= bbox[0])
                    & (lat <= bbox[2])
                    & (lon >= bbox[1])
                    & (lon <= bbox[3])
                )
                if not mask.any():
                    continue
                sub = pdf.loc[mask].reset_index(drop=True)
                # per-key state store seeded from the packed arrays
                states = StateStore()
                if spec.is_stateful:
                    states.load(
                        [
                            {
                                "device_id": device_id,
                                "rule_id": rule_id,
                                "now": 0,
                                "last_seen": last_seen[k],
                                "last_reset": last_reset[k],
                                "hits": hits[k],
                            }
                        ]
                    )
                ref = Reference(
                    zones=zones, devices=DeviceSnapshot(), states=states
                )
                # ONE vectorized evaluation: node predicates run as
                # NumPy over the whole sorted batch while the trigger
                # fold inside eval_spec_full is sequential per row in
                # this (event-time) order — identical to per-update
                # evaluation, without the per-row Python loop
                ok, matches = eval_spec(spec, sub, ref, rule_id)
                urls = (
                    sub["url"].astype(str)
                    if "url" in sub
                    else pd.Series([""] * len(sub))
                )
                for i in np.nonzero(ok)[0]:
                    for m in matches[i]:
                        out_frames.append(
                            {
                                "device_id": device_id,
                                "url": urls.iloc[i],
                                "rule_id": rule_id,
                                "left_kw": m["left_kw"],
                                "right_kw": m["right_kw"],
                                "op": m["op"],
                                "right_refs": m["right_refs"],
                                "datetime": int(sub.at[i, "datetime"]),
                            }
                        )
                if spec.is_stateful:
                    st = states.lookup_or_make(device_id, rule_id)
                    last_seen[k] = int(st["last_seen"])
                    last_reset[k] = int(st["last_reset"])
                    hits[k] = int(st["hits"])
        state.update((last_seen, last_reset, hits))
        if out_frames:
            yield pd.DataFrame(out_frames)

    return update


def keyed_stream_detect(points_stream: DataFrame, engine: Engine) -> DataFrame:
    """points stream → per-device keyed detection with store-backed
    trigger state. Returns the streaming events DataFrame; attach a
    writeStream sink + checkpointLocation to run.

    Raises on rules with device-vs-device nodes: a keyed stream cannot
    see other keys, so the per-key evaluation runs against an EMPTY
    device snapshot — ``devices(...)`` verbs would silently match
    nothing (and even constant candidates would be stale, since their
    positions update under other keys). Those rules route through
    stream_detect_scalable (pair-join @ strategy) instead."""
    from spinix_spark.dsl.compiler import (
        EqualDevicesOp,
        SpDDevicesOp,
        SpDevicesOp,
    )

    for r in engine.rules.values():
        for n in r.spec.nodes:
            if isinstance(n, (SpDevicesOp, SpDDevicesOp, EqualDevicesOp)):
                raise ValueError(
                    f"rule {r.rule_id}: device-vs-device nodes "
                    f"({type(n).__name__}) are outside keyed_stream_detect's "
                    "scope (per-key evaluation has no cross-device snapshot "
                    "— the verb would silently match nothing); use "
                    "stream_detect_scalable"
                )
    sc = points_stream.sparkSession.sparkContext
    payload = {
        "zones": engine.zones,
        "rules": [(r.rule_id, r.spec, r.bbox) for r in engine.rules.values()],
    }
    b = sc.broadcast(payload)
    fn = make_keyed_detect_fn(b)
    return points_stream.groupBy("device_id").applyInPandasWithState(
        fn,
        outputStructType=EVENT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
