"""Distributed detection: the Spark expression of Engine.Detect.

Plan shape (SURVEY.md §3.2 Spark equivalent):

    pages ──geoparse (codegen)──► points
    points ──cell col (codegen)──► rule-bbox prune (Catalyst filter,
        pushed to the scan) ──► mapInPandas(refine) ──► event rows

- The rule registry, zone store, and device-position snapshot are
  *broadcast* (dimension-sized, like the reference's in-memory
  indexes); the fact side (points) streams through in Arrow batches.
- The refinement stage calls the same vectorized kernel the golden
  tests exercise (engine/runtime.py:eval_spec) — NumPy over Arrow
  batches, no per-row Python.
- Rule pruning is a plain boolean column (OR of per-rule bbox
  predicates ≙ Rules.Walk, rule.go:229-249), so Catalyst pushes it
  into the parquet scan and partitions that intersect no rule's
  geofence are never refined.
- Stateful rules: points are hash-partitioned by device_id
  (repartition) so each (device, rule) state is owned by exactly one
  task; per-task StateStores are seeded from the previous batch's
  state rows and updated states are emitted alongside events
  (row_type = 'state'). This is the batch form; the streaming form
  (applyInPandasWithState) lives in spinix_spark/streaming/.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from spinix_spark.engine.detect import Engine
from spinix_spark.engine.runtime import Reference, eval_spec
from spinix_spark.engine.stores import DeviceSnapshot, StateStore

OUT_SCHEMA = StructType(
    [
        StructField("row_type", StringType()),  # 'event' | 'state'
        StructField("url", StringType()),
        StructField("device_id", StringType()),
        StructField("rule_id", StringType()),
        StructField("spec", StringType()),
        StructField("ok", BooleanType()),
        StructField("left_kw", StringType()),
        StructField("right_kw", StringType()),
        StructField("op", StringType()),
        StructField("right_refs", ArrayType(StringType())),
        StructField("datetime", LongType()),
        StructField("last_seen", LongType()),
        StructField("last_reset", LongType()),
        StructField("hits", LongType()),
        StructField("now", LongType()),
    ]
)


def _rule_prune_expr(engine: Engine) -> str:
    """OR of per-rule bbox predicates — Catalyst-pushable Rules.Walk."""
    parts = []
    for rule in engine.rules.values():
        b = rule.bbox
        parts.append(
            f"(lat >= {b[0]!r} AND lat <= {b[2]!r}"
            f" AND lon >= {b[1]!r} AND lon <= {b[3]!r})"
        )
    return " OR ".join(parts) if parts else "false"


def _has_stateful(engine: Engine) -> bool:
    return any(r.spec.is_stateful for r in engine.rules.values())


def detect_batch_spark(
    points: DataFrame,
    engine: Engine,
    state_rows: list[dict] | None = None,
) -> DataFrame:
    """Evaluate every registered rule over a points DataFrame.

    Returns the union output (row_type 'event' per golden match row +
    'state' for updated trigger states). Use :func:`split_output` to
    get (events, states).
    """
    sc = points.sparkSession.sparkContext
    payload = {
        "zones": engine.zones,
        "snapshot": engine.devices,
        "rules": [(r.rule_id, r.spec, r.bbox) for r in engine.rules.values()],
        "states": state_rows or [],
    }
    b = sc.broadcast(payload)

    pruned = points.where(F.expr(_rule_prune_expr(engine)))
    if _has_stateful(engine):
        pruned = pruned.repartition("device_id")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = b.value
        states = StateStore()
        states.load(p["states"])
        ref = Reference(zones=p["zones"], devices=p["snapshot"], states=states)
        for pdf in batches:
            if pdf.empty:
                continue
            out_rows: list[dict] = []
            lat = pdf["lat"].to_numpy(dtype=np.float64)
            lon = pdf["lon"].to_numpy(dtype=np.float64)
            for rule_id, spec, bbox in p["rules"]:
                mask = (
                    (lat >= bbox[0])
                    & (lat <= bbox[2])
                    & (lon >= bbox[1])
                    & (lon <= bbox[3])
                )
                if not mask.any():
                    continue
                sub = pdf.loc[mask].reset_index(drop=True)
                ok, matches = eval_spec(spec, sub, ref, rule_id)
                hit_idx = np.nonzero(ok)[0]
                if hit_idx.size == 0:
                    continue
                urls = (
                    sub["url"].to_numpy(dtype=object)
                    if "url" in sub
                    else np.full(len(sub), "", dtype=object)
                )
                dids = sub["device_id"].to_numpy(dtype=object)
                dts = (
                    sub["datetime"].to_numpy(dtype=np.int64)
                    if "datetime" in sub
                    else np.zeros(len(sub), dtype=np.int64)
                )
                for i in hit_idx:
                    for m in matches[i]:
                        out_rows.append(
                            {
                                "row_type": "event",
                                "url": urls[i],
                                "device_id": dids[i],
                                "rule_id": rule_id,
                                "spec": spec.source,
                                "ok": m["ok"],
                                "left_kw": m["left_kw"],
                                "right_kw": m["right_kw"],
                                "op": m["op"],
                                "right_refs": m["right_refs"],
                                "datetime": int(dts[i]),
                                "last_seen": 0,
                                "last_reset": 0,
                                "hits": 0,
                                "now": 0,
                            }
                        )
            for st in states.snapshot():
                out_rows.append(
                    {
                        "row_type": "state",
                        "url": "",
                        "device_id": st["device_id"],
                        "rule_id": st["rule_id"],
                        "spec": "",
                        "ok": True,
                        "left_kw": "",
                        "right_kw": "",
                        "op": "",
                        "right_refs": [],
                        "datetime": 0,
                        "last_seen": int(st["last_seen"]),
                        "last_reset": int(st["last_reset"]),
                        "hits": int(st["hits"]),
                        "now": int(st["now"]),
                    }
                )
            if out_rows:
                yield pd.DataFrame(out_rows)

    return pruned.mapInPandas(process, schema=OUT_SCHEMA)


def split_output(out: DataFrame) -> tuple[DataFrame, DataFrame]:
    events = out.where(F.col("row_type") == "event").drop(
        "row_type", "last_seen", "last_reset", "hits", "now"
    )
    states = out.where(F.col("row_type") == "state").select(
        "device_id", "rule_id", "last_seen", "last_reset", "hits", "now"
    )
    return events, states


def snapshot_from_points(points: DataFrame) -> DeviceSnapshot:
    """Latest position per device (InsertOrReplace set-form,
    devices.go:105-147): row_number over (device_id order by datetime
    desc) = 1, collected to a broadcastable snapshot."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("device_id").orderBy(F.col("datetime").desc())
    latest = (
        points.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    snap = DeviceSnapshot()
    cols = ["device_id", "layer_id", "lat", "lon", "datetime"]
    have = [c for c in cols if c in latest.columns]
    for row in latest.select(*have).collect():
        snap.insert_or_replace(row.asDict())
    return snap
