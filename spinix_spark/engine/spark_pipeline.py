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

import json
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

from spinix_spark.dsl.tokens import Token
from spinix_spark.engine.detect import Engine
from spinix_spark.engine.runtime import Reference, eval_spec_full, spec_has_dwell
from spinix_spark.engine.stores import DeviceSnapshot, StateStore
from spinix_spark.geo.geodesy import lon_to_frame

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
        # dwell visit map (JSON string; empty unless eval_dwell rules
        # ran — see runtime._apply_dwell)
        StructField("visits", StringType()),
    ]
)


def _bbox_pred(b, pad_lat: float = 0.0, pad_lon: float = 0.0) -> str:
    """Catalyst-pushable bbox containment. A rule circle centered near
    ±180° yields an UNNORMALIZED lon range (e.g. 179.5 .. 180.5, from
    the continuous 8-gon ring) — then the point lon is framed (±360°
    shift) to the box's center so west-side points still match. The
    framed CASE is emitted ONLY for overflowing boxes; every mid-lon
    rule keeps the plain comparison (identical SQL text and pushdown)."""
    lo_lat = float(b[0]) - pad_lat
    hi_lat = float(b[2]) + pad_lat
    lo_lon = float(b[1]) - pad_lon
    hi_lon = float(b[3]) + pad_lon
    lon_expr = "lon"
    if lo_lon < -180.0 or hi_lon > 180.0:
        from spinix_spark.geo.sqlgen import lon_frame_sql

        lon_expr = lon_frame_sql("lon", repr((lo_lon + hi_lon) / 2.0))
    return (
        f"(lat >= {lo_lat!r} AND lat <= {hi_lat!r}"
        f" AND {lon_expr} >= {lo_lon!r} AND {lon_expr} <= {hi_lon!r})"
    )


_POSITIVE_ZONE_OPS = (Token.IN, Token.INTERSECTS, Token.NEAR)

# every column the vectorized kernel can read (DeviceBatch fields +
# attribute mappers + event provenance) — anything else (page text,
# html, cell keys) is dead weight across the Arrow boundary and is
# pruned before mapInPandas
KERNEL_COLS = frozenset(
    {
        "url", "device_id", "layer_id", "lat", "lon", "datetime", "status",
        "speed", "battery", "temperature", "humidity", "luminosity",
        "pressure", "fuel_level", "alt", "model", "brand", "owner", "imei",
    }
)


def _rule_prune_expr_for(engine: Engine, rule) -> str:
    """Catalyst-pushable prune predicate for one rule.

    Base form is the rule's geofence bbox (≙ Rules.Walk,
    rule.go:229-249). When the rule's fold is all-AND and contains a
    non-negated zone op with explicit refs, zone proximity is a
    NECESSARY condition for a match, so the prune tightens to the
    union of that node's zone bboxes padded by the device-buffer
    reach — typically orders of magnitude fewer rows cross the Arrow
    boundary into the Python refinement stage. Negated verbs
    (NINTERSECTS/NIN/NNEAR) match on far-away rows by design
    (SURVEY.md §2A.1) so rules containing only those keep the wide
    bbox.

    Rules with a REAL trigger never tighten: the trigger state
    advances on every in-bbox layer-matching row regardless of node
    outcomes (checkTrigger/changeState run BEFORE node evaluation,
    runtime.go:103-163), so dropping a non-matching in-bbox row would
    change which later rows fire — tightening is only event-sound when
    the gate is constant-true. Dwell rules under ``eval_dwell`` never
    tighten either, even at repeat NONE: a non-matching in-bbox row is
    the event that CLEARS a visit (runtime._apply_dwell), so dropping
    it would let a stale first_visit anchor qualify later rows."""
    import math

    from spinix_spark.dsl import ast_nodes as ast
    from spinix_spark.dsl.compiler import SpDevicesObjectOp, SpObjectOp

    base = _bbox_pred(rule.bbox)
    if rule.spec.props.repeat != ast.REPEAT_NONE:
        return base
    if engine.eval_dwell and spec_has_dwell(rule.spec):
        return base
    if any(op is not Token.AND for op in rule.spec.ops):
        return base
    for node in rule.spec.nodes:
        if (
            isinstance(node, (SpObjectOp, SpDevicesObjectOp))
            and node.op in _POSITIVE_ZONE_OPS
            and node.right.refs
            and not node.right.all
        ):
            zones = [
                engine.zones.lookup(r)
                for r in node.right.refs
                if engine.zones.lookup(r) is not None
            ]
            if not zones:
                continue
            meters = node.left.meters() + 1.0
            parts = []
            for z in zones:
                ref_lat = max(abs(float(z.bbox[0])), abs(float(z.bbox[2])))
                pad_lat = meters / 110574.0
                coslat = math.cos(math.radians(min(ref_lat, 84.0)))
                pad_lon = meters / (111320.0 * max(coslat, 0.05))
                parts.append(_bbox_pred(z.bbox, pad_lat, pad_lon))
            return f"({base} AND ({' OR '.join(parts)}))"
    return base


def rules_prune_expr(engine: Engine) -> str:
    """OR over every rule's prune predicate — the standalone Rules.Walk
    filter (useful for pre-filtering a points table before any
    per-rule processing)."""
    parts = [_rule_prune_expr_for(engine, rule) for rule in engine.rules.values()]
    return " OR ".join(parts) if parts else "false"


def _sql_rule_events(points: DataFrame, engine: Engine, rule, plan) -> DataFrame:
    """All-Catalyst event rows for one compiled-to-SQL rule: prune →
    predicate/fold/refs columns → per-node filtered projections,
    unioned. Whole-stage codegen end to end."""
    points.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    cols = set(points.columns)
    url_sql = "url" if "url" in cols else "''"
    dt_sql = "CAST(datetime AS BIGINT)" if "datetime" in cols else "CAST(0 AS BIGINT)"
    pruned = points.where(F.expr(_rule_prune_expr_for(engine, rule)))
    if plan.prep:
        # buffered-device ring vertices etc. as named columns, so the
        # predicate expressions below stay codegen-sized
        pruned = pruned.selectExpr(
            "*", *[f"{sql} AS {name}" for name, sql in plan.prep]
        )
    sel = ["*", f"{plan.final_sql} AS _final"]
    for j, ns in enumerate(plan.nodes):
        sel.append(f"{ns.ok_sql} AS _ok{j}")
        sel.append(f"{plan.recorded_sql[j]} AS _rec{j}")
        sel.append(f"{ns.refs_sql} AS _refs{j}")
    base = pruned.selectExpr(*sel)
    spec_lit = rule.spec.source.replace("'", "''")
    outs = []
    for j, ns in enumerate(plan.nodes):
        outs.append(
            base.where(F.expr(f"_final AND _rec{j} AND _ok{j}")).selectExpr(
                "'event' AS row_type",
                f"{url_sql} AS url",
                "device_id",
                f"'{rule.rule_id}' AS rule_id",
                f"'{spec_lit}' AS spec",
                "true AS ok",
                f"'{ns.left_kw}' AS left_kw",
                f"'{ns.right_kw}' AS right_kw",
                f"'{ns.op}' AS op",
                f"_refs{j} AS right_refs",
                f"{dt_sql} AS datetime",
                "CAST(0 AS BIGINT) AS last_seen",
                "CAST(0 AS BIGINT) AS last_reset",
                "CAST(0 AS BIGINT) AS hits",
                "CAST(0 AS BIGINT) AS now",
                "CAST('' AS STRING) AS visits",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def _at_base_rows(
    points: DataFrame, engine: Engine, rule, at_node, devices_df: DataFrame,
    n_salt: int, join_how: str,
):
    """Shared front half of the devices(@) pair-join strategies:
    pruned + layer-filtered rows carrying ``_rowkey``, the companion
    nodes' prep columns, and the @ verdict joined on as ``_at_refs``
    (null ⇔ no candidate satisfied the verb). ``join_how='inner'``
    keeps only @-matching rows (stateless all-AND: non-matching rows
    can never emit); ``'left'`` keeps every gated row (stateful: the
    trigger fold must see non-matching rows too). Returns
    ``(joined, node_sqls)`` or None when a companion node is not
    Catalyst-compilable."""
    from spinix_spark.engine.devices_at import at_candidate_pairs, at_row_matches
    from spinix_spark.engine.sql_compile import compile_node_sql

    points.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    spec = rule.spec
    props = spec.props
    columns = set(points.columns)
    node_sqls = []
    for n in spec.nodes:
        if n is at_node:
            node_sqls.append(None)
        else:
            ns = compile_node_sql(n, engine, props, columns)
            if ns is None:
                return None
            node_sqls.append(ns)

    base = points.where(F.expr(_rule_prune_expr_for(engine, rule))).where(
        F.col("layer_id") == props.layer
    )
    key_cols = [
        c for c in ("url", "device_id", "datetime", "lat", "lon") if c in columns
    ]
    base = base.withColumn("_rowkey", F.xxhash64(*key_cols))
    prep = [p for ns in node_sqls if ns is not None for p in ns.prep]
    if prep:
        base = base.selectExpr("*", *[f"{sql} AS {name}" for name, sql in prep])
    pairs = at_candidate_pairs(base, devices_df, at_node, engine.scheme, n_salt=n_salt)
    joined = base.join(at_row_matches(pairs), "_rowkey", join_how)
    return joined, node_sqls


def _at_rule_events(
    points: DataFrame, engine: Engine, rule, at_node, devices_df: DataFrame,
    n_salt: int = 0,
) -> DataFrame | None:
    """Event rows for one STATELESS devices(@) rule via the fact-scale
    pair-join strategy (engine/devices_at.py): no snapshot broadcast,
    no driver collect, no per-snapshot-device Python loop. Returns None
    when a non-@ node is not Catalyst-compilable (caller falls back to
    the broadcast kernel path)."""
    res = _at_base_rows(points, engine, rule, at_node, devices_df, n_salt, "inner")
    if res is None:
        return None
    joined, node_sqls = res
    spec = rule.spec
    columns = set(points.columns)

    ok_sqls = ["true" if ns is None else ns.ok_sql for ns in node_sqls]
    acc = ok_sqls[0]
    recorded = ["true"]
    for j in range(1, len(ok_sqls)):
        recorded.append(acc)
        acc = f"({acc} AND {ok_sqls[j]})"

    url_sql = "url" if "url" in columns else "''"
    dt_sql = "CAST(datetime AS BIGINT)" if "datetime" in columns else "CAST(0 AS BIGINT)"
    spec_lit = spec.source.replace("'", "''")
    outs = []
    for j, n in enumerate(spec.nodes):
        ns = node_sqls[j]
        if ns is None:
            left_kw, right_kw, op_s, refs_sql = (
                "device", "devices", str(at_node.op), "_at_refs",
            )
        else:
            left_kw, right_kw, op_s, refs_sql = (
                ns.left_kw, ns.right_kw, ns.op, ns.refs_sql,
            )
        outs.append(
            joined.where(F.expr(f"({acc}) AND {recorded[j]} AND {ok_sqls[j]}")).selectExpr(
                "'event' AS row_type",
                f"{url_sql} AS url",
                "device_id",
                f"'{rule.rule_id}' AS rule_id",
                f"'{spec_lit}' AS spec",
                "true AS ok",
                f"'{left_kw}' AS left_kw",
                f"'{right_kw}' AS right_kw",
                f"'{op_s}' AS op",
                f"{refs_sql} AS right_refs",
                f"{dt_sql} AS datetime",
                "CAST(0 AS BIGINT) AS last_seen",
                "CAST(0 AS BIGINT) AS last_reset",
                "CAST(0 AS BIGINT) AS hits",
                "CAST(0 AS BIGINT) AS now",
                "CAST('' AS STRING) AS visits",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def _visits_json(st: dict) -> str:
    """Deterministic JSON form of a state row's dwell visit map for
    the DataFrame carry (empty map -> '' keeps pre-dwell rows
    byte-identical)."""
    v = st.get("visits")
    return json.dumps(v, separators=(",", ":"), sort_keys=True) if v else ""


def _seed_states_from_column(states: StateStore, pdf: pd.DataFrame) -> None:
    """Seed prior states that arrived attached to this batch's rows via
    the per-device ``_states`` struct array (the fact-scale state
    carry). First sighting wins — later Arrow batches must not clobber
    in-task mutations."""
    if "_states" not in pdf.columns:
        return
    seed: list[dict] = []
    for did, st_list in zip(pdf["device_id"], pdf["_states"]):
        if st_list is None or len(st_list) == 0:
            continue
        for st in st_list:
            seed.append(
                {
                    "device_id": str(did),
                    "rule_id": str(st["rule_id"]),
                    "last_seen": int(st["last_seen"]),
                    "last_reset": int(st["last_reset"]),
                    "hits": int(st["hits"]),
                    "now": int(st["now"]),
                    "visits": st["visits"] if "visits" in st else "",
                }
            )
    states.load_if_absent(seed)


def _join_state_carry(df: DataFrame, state_df: DataFrame) -> DataFrame:
    """Attach prior (device, rule) trigger states to rows as a
    per-device struct array — the fact-scale carry: states ride the
    device_id shuffle, no broadcast, no driver round-trip."""
    if "visits" not in state_df.columns:
        state_df = state_df.withColumn("visits", F.lit(""))
    sdf = state_df.groupBy("device_id").agg(
        F.collect_list(
            F.struct("rule_id", "last_seen", "last_reset", "hits", "now", "visits")
        ).alias("_states")
    )
    return df.join(sdf, "device_id", "left")


def _at_rule_events_stateful(
    points: DataFrame, engine: Engine, rule, at_node, devices_df: DataFrame,
    n_salt: int = 0, state_df: DataFrame | None = None,
    state_rows: list[dict] | None = None,
) -> DataFrame | None:
    """Event + state rows for one STATEFUL (real ``:trigger``)
    devices(@) rule at fact scale — the composition of the two existing
    mechanisms (reference semantics: runtime.go:103-163 + 1461-1483):

    1. the pair-join candidate strategy (engine/devices_at.py) computes
       the @ verdict relationally — snapshot stays a DataFrame, k-ring
       equi-join, exact-candidacy rect, vectorized refine; LEFT join so
       non-matching rows survive (the trigger consumes on them);
    2. companion nodes evaluate as Catalyst columns; the all-AND fold
       collapses to one ``_final`` boolean — all JVM-side;
    3. the sequential per-device trigger fold (checkTrigger/changeState
       in (device_id, datetime) order) runs in mapInPandas over a
       SLIM projection (url, device_id, datetime, _final, refs) — the
       only per-row Python is the inherently-sequential state machine,
       and prior states ride the same device_id shuffle
       (``state_df`` carry), so nothing fact-sized touches the driver.

    Plan note (measured, round 3 / PLANS.md): the @ ref arrays ride
    the device_id shuffle DELIBERATELY. The alternative — join only a
    boolean for the fold and re-attach refs to the fired output —
    makes the pair-refine stage a diamond consumed twice; Catalyst
    re-evaluates it (no exchange reuse across the mapInPandas stage),
    which measured ~35% slower end to end. One evaluation + arrays in
    one shuffle beats two evaluations.

    Returns None when a companion node is not Catalyst-compilable."""
    from spinix_spark.dsl import ast_nodes as ast
    from spinix_spark.engine.runtime import _check_trigger
    from spinix_spark.engine.stores import state_need_reset, state_reset

    res = _at_base_rows(points, engine, rule, at_node, devices_df, n_salt, "left")
    if res is None:
        return None
    joined, node_sqls = res
    spec = rule.spec
    columns = set(points.columns)

    ok_sqls = [
        "(_at_refs IS NOT NULL)" if ns is None else ns.ok_sql for ns in node_sqls
    ]
    final_sql = " AND ".join(f"({s})" for s in ok_sqls)
    refs_sqls = [
        "coalesce(_at_refs, array())" if ns is None else ns.refs_sql
        for ns in node_sqls
    ]
    url_sql = "url" if "url" in columns else "''"
    dt_sql = "CAST(datetime AS BIGINT)" if "datetime" in columns else "CAST(0 AS BIGINT)"
    sel = [
        f"{url_sql} AS url",
        "device_id",
        f"{dt_sql} AS _dt",
        f"coalesce({final_sql}, false) AS _final",
    ]
    sel += [f"{rs} AS _refs{j}" for j, rs in enumerate(refs_sqls)]
    slim = joined.selectExpr(*sel)
    if state_df is not None:
        slim = _join_state_carry(slim, state_df)
    # one owner task per device + deterministic per-device event order
    # (same discipline as the kernel's stateful branch)
    slim = slim.repartition("device_id").sortWithinPartitions(
        "device_id", "_dt", "url"
    )

    node_meta = [
        ("device", "devices", str(at_node.op))
        if ns is None
        else (ns.left_kw, ns.right_kw, ns.op)
        for ns in node_sqls
    ]
    rule_id = rule.rule_id
    spec_src = spec.source
    seed_rows = [dict(r) for r in (state_rows or [])]
    repeat = spec.props.repeat
    reset_interval_s = spec.props.reset_interval_s
    counts_hits = repeat in (ast.REPEAT_TIMES, ast.REPEAT_ONCE)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        states = StateStore()
        states.load(seed_rows)
        states.clear_dirty()
        for pdf in batches:
            if pdf.empty:
                continue
            _seed_states_from_column(states, pdf)
            n = len(pdf)
            dts = pdf["_dt"].to_numpy(dtype=np.int64)
            dids = pdf["device_id"].to_numpy(dtype=object)
            finals = (
                pdf["_final"].astype("boolean").fillna(False).to_numpy(dtype=bool)
            )
            emit = np.zeros(n, dtype=bool)
            for i in range(n):
                st = states.lookup_or_make(str(dids[i]), rule_id)
                now = int(dts[i])
                if now > 0:
                    st["now"] = now
                if state_need_reset(st, reset_interval_s):
                    state_reset(st)
                    st["last_reset"] = st["now"]
                trig = _check_trigger(spec, st)
                if trig:
                    st["last_seen"] = st["now"]
                    if counts_hits:
                        st["hits"] += 1
                    states.update(st)
                emit[i] = trig and finals[i]
            idx = np.nonzero(emit)[0]
            if idx.size == 0:
                continue
            urls = pdf["url"].to_numpy(dtype=object)
            frames = []
            for j, (left_kw, right_kw, op_s) in enumerate(node_meta):
                refs_series = pdf[f"_refs{j}"]
                frames.append(
                    pd.DataFrame(
                        {
                            "row_type": "event",
                            "url": urls[idx],
                            "device_id": dids[idx],
                            "rule_id": rule_id,
                            "spec": spec_src,
                            "ok": True,
                            "left_kw": left_kw,
                            "right_kw": right_kw,
                            "op": op_s,
                            "right_refs": [
                                list(refs_series.iloc[i]) for i in idx
                            ],
                            "datetime": dts[idx],
                            "last_seen": 0,
                            "last_reset": 0,
                            "hits": 0,
                            "now": 0,
                            "visits": "",
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)
        snap = states.dirty_snapshot()
        if snap:
            yield pd.DataFrame(
                {
                    "row_type": "state",
                    "url": "",
                    "device_id": [s["device_id"] for s in snap],
                    "rule_id": [s["rule_id"] for s in snap],
                    "spec": "",
                    "ok": True,
                    "left_kw": "",
                    "right_kw": "",
                    "op": "",
                    "right_refs": [[] for _ in snap],
                    "datetime": 0,
                    "last_seen": [int(s["last_seen"]) for s in snap],
                    "last_reset": [int(s["last_reset"]) for s in snap],
                    "hits": [int(s["hits"]) for s in snap],
                    "now": [int(s["now"]) for s in snap],
                    "visits": [_visits_json(s) for s in snap],
                }
            )

    return slim.mapInPandas(fold, schema=OUT_SCHEMA)


def _triggerless_state_rows(
    points: DataFrame, rule, state_df: DataFrame | None
) -> DataFrame:
    """State rows for a TRIGGER-LESS stateful spec (a ``{...}`` props
    block without ``:trigger``) evaluated on the SQL / pair-join paths.

    The reference calls changeState for every isStateful spec
    (runtime.go:133-163): with repeat NONE the gate is constant-true,
    so per gated row (rule bbox ∧ layer): maybe-reset, then
    ``last_seen = now``. Events are unaffected, but state output must
    match the kernel path. The fold is sequential per device, so it
    runs as applyInPandas over a two-column (device_id, datetime)
    projection — nothing else crosses Arrow."""
    from spinix_spark.engine.stores import state_need_reset, state_reset

    rule_id = rule.rule_id
    reset_interval_s = rule.spec.props.reset_interval_s
    layer = rule.spec.props.layer
    gated = points.where(F.expr(_bbox_pred(rule.bbox))).where(
        F.col("layer_id") == layer
    )
    dt_sql = (
        "CAST(datetime AS BIGINT)"
        if "datetime" in points.columns
        else "CAST(0 AS BIGINT)"
    )
    slim = gated.selectExpr("device_id", f"{dt_sql} AS _dt")
    if state_df is not None:
        slim = _join_state_carry(slim, state_df)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        states = StateStore()
        states.clear_dirty()
        for pdf in batches:
            if pdf.empty:
                continue
            _seed_states_from_column(states, pdf)
            dts = pdf["_dt"].to_numpy(dtype=np.int64)
            dids = pdf["device_id"].to_numpy(dtype=object)
            for i in range(len(pdf)):
                st = states.lookup_or_make(str(dids[i]), rule_id)
                now = int(dts[i])
                if now > 0:
                    st["now"] = now
                if state_need_reset(st, reset_interval_s):
                    state_reset(st)
                    st["last_reset"] = st["now"]
                st["last_seen"] = st["now"]
                states.update(st)
        snap = states.dirty_snapshot()
        if snap:
            yield pd.DataFrame(
                {
                    "row_type": "state",
                    "url": "",
                    "device_id": [s["device_id"] for s in snap],
                    "rule_id": [s["rule_id"] for s in snap],
                    "spec": "",
                    "ok": True,
                    "left_kw": "",
                    "right_kw": "",
                    "op": "",
                    "right_refs": [[] for _ in snap],
                    "datetime": 0,
                    "last_seen": [int(s["last_seen"]) for s in snap],
                    "last_reset": [int(s["last_reset"]) for s in snap],
                    "hits": [int(s["hits"]) for s in snap],
                    "now": [int(s["now"]) for s in snap],
                    "visits": [_visits_json(s) for s in snap],
                }
            )

    slim = slim.repartition("device_id").sortWithinPartitions("device_id", "_dt")
    return slim.mapInPandas(fold, schema=OUT_SCHEMA)


def detect_batch_spark(
    points: DataFrame,
    engine: Engine,
    state_rows: list[dict] | None = None,
    prefer_sql: bool = True,
    devices_df: DataFrame | None = None,
    at_salt: int = 0,
    state_df: DataFrame | None = None,
    synth_triggerless_states: bool = False,
) -> DataFrame:
    """Evaluate every registered rule over a points DataFrame.

    Returns the union output (row_type 'event' per golden match row +
    'state' for updated trigger states). Use :func:`split_output` to
    get (events, states).

    Per-rule physical strategy:
    1. ``devices_df`` given + rule is an all-AND devices(@) shape →
       fact-scale pair-join (engine/devices_at.py): the device snapshot
       stays a DataFrame (no broadcast, no driver collect). Rules with
       a real ``:trigger`` additionally route through the sequential
       per-device trigger fold (_at_rule_events_stateful).
    2. Rule compiles to pure Catalyst expressions
       (engine/sql_compile.py) → entirely JVM-side.
    3. Otherwise → vectorized-kernel mapInPandas path with the
       broadcast snapshot (engine.devices).
    All strategies produce identical rows (cross-path parity tested);
    ``prefer_sql=False`` forces the kernel path for 2/3.

    State carry between batches: ``state_df`` is the FACT-SCALE form
    (prior states ride the device_id shuffle as a co-partitioned
    join). The ``state_rows`` list is the dimension-scale convenience
    (it broadcasts from, and merges back on, the driver — bounded by
    touched (device, rule) keys, fine for small jobs, wrong at a huge
    device universe); prefer ``state_df`` + :func:`merge_state_df`.

    When ``devices_df`` is given but an @ rule falls OUTSIDE the
    pair-join shape, the kernel fallback would evaluate @ against the
    broadcast snapshot; if that snapshot is EMPTY the rule would
    silently match nothing, so this raises instead (populate
    engine.devices for the kernel fallback, or reshape the rule).

    TRIGGER-LESS stateful specs (a ``{...}`` props block without
    ``:trigger``): the reference still advances last_seen per gated
    row, and the kernel path reproduces that, but on the SQL/pair-join
    fast paths the state fold would cost a full Arrow pass over every
    gated row for state nobody reads (the gate is constant-true, so
    events never depend on it). By default those paths emit NO state
    rows for trigger-less specs; pass ``synth_triggerless_states=True``
    to synthesize them exactly (kernel-parity tested).
    """
    from spinix_spark.dsl import ast_nodes as ast
    from spinix_spark.dsl.compiler import SpDevicesOp
    from spinix_spark.engine.devices_at import (
        devices_at_node,
        empty_snapshot_ref_reasons,
    )
    from spinix_spark.engine.sql_compile import try_compile_rule_sql

    if devices_df is not None:
        # devices_df signals a fact-scale caller whose device universe
        # lives in the DataFrame — but explicit device refs still
        # resolve from engine.devices at compile time; empty means the
        # rule silently compiles to `false`. Refuse loudly instead.
        ref_reasons = empty_snapshot_ref_reasons(engine)
        if ref_reasons:
            raise ValueError(
                "detect_batch_spark(devices_df=...): "
                + "; ".join(ref_reasons)
            )

    sql_planned = []
    kernel_rules = []
    at_outs = []
    state_synth_rules = []
    for r in engine.rules.values():
        if engine.eval_dwell and spec_has_dwell(r.spec):
            # dwell gating is a sequential per-device fold over the
            # node's per-object hits — kernel path only (the SQL and
            # pair-join paths have no visit state)
            kernel_rules.append(r)
            continue
        if devices_df is not None and prefer_sql:
            at_node = devices_at_node(r, allow_stateful=True)
            if at_node is not None:
                if r.spec.props.repeat != ast.REPEAT_NONE:
                    ev = _at_rule_events_stateful(
                        points, engine, r, at_node, devices_df,
                        n_salt=at_salt, state_df=state_df,
                        state_rows=state_rows,
                    )
                else:
                    ev = _at_rule_events(
                        points, engine, r, at_node, devices_df, n_salt=at_salt
                    )
                    if (
                        ev is not None
                        and synth_triggerless_states
                        and r.spec.is_stateful
                    ):
                        state_synth_rules.append(r)
                if ev is not None:
                    at_outs.append(ev)
                    continue
        plan = (
            try_compile_rule_sql(engine, r, columns=points.columns)
            if prefer_sql
            else None
        )
        if plan is not None:
            sql_planned.append((r, plan))
            if synth_triggerless_states and r.spec.is_stateful:
                # trigger-less stateful: constant-true gate, but the
                # reference still advances last_seen per gated row
                state_synth_rules.append(r)
        else:
            if devices_df is not None and len(engine.devices) == 0 and any(
                isinstance(n, SpDevicesOp) and n.right.all and not n.right.refs
                for n in r.spec.nodes
            ):
                from spinix_spark.engine.devices_at import at_ineligible_reasons

                reasons = at_ineligible_reasons(engine, points.columns)
                why = "; ".join(
                    x for x in reasons if x.startswith(f"rule {r.rule_id}:")
                ) or f"rule {r.rule_id}: not Catalyst-compilable"
                raise ValueError(
                    "devices(@) rule fell back to the broadcast-kernel "
                    "path while the snapshot was supplied as a DataFrame "
                    "and engine.devices is EMPTY — @ would silently "
                    f"evaluate false everywhere. {why}. Populate "
                    "engine.devices (dimension scale) or reshape the "
                    "rule to the pair-join shape (all-AND, one @ node, "
                    "Catalyst-compilable companions)."
                )
            kernel_rules.append(r)

    at_outs += [
        _triggerless_state_rows(points, r, state_df) for r in state_synth_rules
    ]

    sql_outs = at_outs + [
        _sql_rule_events(points, engine, r, plan) for r, plan in sql_planned
    ]
    if not kernel_rules:
        if not sql_outs:
            return points.sparkSession.createDataFrame([], OUT_SCHEMA)
        out = sql_outs[0]
        for o in sql_outs[1:]:
            out = out.unionAll(o)
        return out

    sc = points.sparkSession.sparkContext
    payload = {
        "zones": engine.zones,
        "snapshot": engine.devices,
        "rules": [(r.rule_id, r.spec, r.bbox) for r in kernel_rules],
        "states": state_rows or [],
        "eval_dwell": engine.eval_dwell,
    }
    b = sc.broadcast(payload)

    kernel_prune = " OR ".join(
        _rule_prune_expr_for(engine, r) for r in kernel_rules
    )
    pruned = points.where(F.expr(kernel_prune)).select(
        *[c for c in points.columns if c in KERNEL_COLS]
    )
    if any(r.spec.is_stateful for r in kernel_rules):
        if state_df is not None:
            # FACT-SCALE state carry: prior (device, rule) states ride
            # the shuffle as a per-device struct array joined onto the
            # rows — no broadcast, no driver round-trip; the join and
            # the repartition below share the device_id partitioning
            if "visits" not in state_df.columns:
                state_df = state_df.withColumn("visits", F.lit(""))
            sdf = state_df.groupBy("device_id").agg(
                F.collect_list(
                    F.struct(
                        "rule_id", "last_seen", "last_reset", "hits", "now", "visits"
                    )
                ).alias("_states")
            )
            pruned = pruned.join(sdf, "device_id", "left")
        # one owner task per device + deterministic per-device event
        # order: trigger state folds sequentially over (device_id,
        # datetime) regardless of Arrow batch boundaries or partition
        # count (the reference's per-event Detect ordering)
        sort_cols = [c for c in ("device_id", "datetime", "url") if c in points.columns]
        pruned = pruned.repartition("device_id").sortWithinPartitions(*sort_cols)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = b.value
        states = StateStore()
        states.load(p["states"])  # seeded clean; only touched keys emit
        states.clear_dirty()
        ref = Reference(zones=p["zones"], devices=p["snapshot"], states=states)
        for pdf in batches:
            if pdf.empty:
                continue
            if "_states" in pdf.columns:
                # distributed state carry: seed prior states attached
                # to this batch's rows (first sighting wins — later
                # Arrow batches must not clobber in-task mutations)
                seed: list[dict] = []
                for did, st_list in zip(pdf["device_id"], pdf["_states"]):
                    if st_list is None or len(st_list) == 0:
                        continue
                    for st in st_list:
                        seed.append(
                            {
                                "device_id": str(did),
                                "rule_id": str(st["rule_id"]),
                                "last_seen": int(st["last_seen"]),
                                "last_reset": int(st["last_reset"]),
                                "hits": int(st["hits"]),
                                "now": int(st["now"]),
                                "visits": st["visits"] if "visits" in st else "",
                            }
                        )
                states.load_if_absent(seed)
            out_frames: list[pd.DataFrame] = []
            lat = pdf["lat"].to_numpy(dtype=np.float64)
            lon = pdf["lon"].to_numpy(dtype=np.float64)
            for rule_id, spec, bbox in p["rules"]:
                # frame lons to the (possibly unnormalized) box center
                # — wrap-correct for rules centered near ±180°, exact
                # no-op elsewhere (mirrors Engine.walk_rules)
                lon_f = lon_to_frame(
                    lon, (float(bbox[1]) + float(bbox[3])) / 2.0
                )
                mask = (
                    (lat >= bbox[0])
                    & (lat <= bbox[2])
                    & (lon_f >= bbox[1])
                    & (lon_f <= bbox[3])
                )
                if not mask.any():
                    continue
                sub = pdf.loc[mask].reset_index(drop=True)
                ok, node_results, recorded, _gate = eval_spec_full(
                    spec, sub, ref, rule_id, eval_dwell=p["eval_dwell"]
                )
                if not ok.any():
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
                # columnar match-row emission: one vectorized slice per
                # node instead of a per-event Python loop
                for j, res in enumerate(node_results):
                    idx = np.nonzero(ok & recorded[j] & res.ok)[0]
                    if idx.size == 0:
                        continue
                    refs_col = (
                        [list(res.right_refs[i]) for i in idx]
                        if res.right_refs is not None
                        else [[] for _ in range(idx.size)]
                    )
                    out_frames.append(
                        pd.DataFrame(
                            {
                                "row_type": "event",
                                "url": urls[idx],
                                "device_id": dids[idx],
                                "rule_id": rule_id,
                                "spec": spec.source,
                                "ok": True,
                                "left_kw": str(res.left_kw),
                                "right_kw": str(res.right_kw),
                                "op": str(res.op),
                                "right_refs": refs_col,
                                "datetime": dts[idx],
                                "last_seen": 0,
                                "last_reset": 0,
                                "hits": 0,
                                "now": 0,
                                "visits": "",
                            }
                        )
                    )
            if out_frames:
                yield pd.concat(out_frames, ignore_index=True)
        # state rows: ONE emission per task, dirty keys only. The
        # repartition("device_id") above means every row of a device
        # lands in exactly one task, so each touched (device, rule)
        # key is emitted by exactly one task — no duplicates, no
        # re-emission of broadcast-seeded prior states that this task
        # never owned (those are merged back by merge_state_rows on
        # the caller side).
        snap = states.dirty_snapshot()
        if snap:
            yield pd.DataFrame(
                {
                    "row_type": "state",
                    "url": "",
                    "device_id": [s["device_id"] for s in snap],
                    "rule_id": [s["rule_id"] for s in snap],
                    "spec": "",
                    "ok": True,
                    "left_kw": "",
                    "right_kw": "",
                    "op": "",
                    "right_refs": [[] for _ in snap],
                    "datetime": 0,
                    "last_seen": [int(s["last_seen"]) for s in snap],
                    "last_reset": [int(s["last_reset"]) for s in snap],
                    "hits": [int(s["hits"]) for s in snap],
                    "now": [int(s["now"]) for s in snap],
                    "visits": [_visits_json(s) for s in snap],
                }
            )

    out = pruned.mapInPandas(process, schema=OUT_SCHEMA)
    for o in sql_outs:
        out = out.unionAll(o)
    return out


def merge_state_df(prior: DataFrame, updated: DataFrame) -> DataFrame:
    """DataFrame form of :func:`merge_state_rows` — next-batch state =
    prior overlaid with this batch's dirty emissions, updated wins per
    (device_id, rule_id). One shuffle; nothing touches the driver."""
    from pyspark.sql.window import Window

    cols = ["device_id", "rule_id", "last_seen", "last_reset", "hits", "now", "visits"]
    if "visits" not in prior.columns:
        prior = prior.withColumn("visits", F.lit(""))
    if "visits" not in updated.columns:
        updated = updated.withColumn("visits", F.lit(""))
    allr = prior.select(*cols).withColumn("_prio", F.lit(0)).unionByName(
        updated.select(*cols).withColumn("_prio", F.lit(1))
    )
    w = Window.partitionBy("device_id", "rule_id").orderBy(F.col("_prio").desc())
    return (
        allr.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )


def merge_state_rows(prior: list[dict], updated: list[dict]) -> list[dict]:
    """Next-batch state = prior states overlaid with this batch's
    dirty emissions (updated wins per (device_id, rule_id) key).
    detect_batch_spark emits only the states its tasks touched, so
    untouched prior states must be carried forward by the caller."""
    merged = {(r["device_id"], r["rule_id"]): dict(r) for r in prior}
    for r in updated:
        merged[(r["device_id"], r["rule_id"])] = dict(r)
    return list(merged.values())


def split_output(out: DataFrame) -> tuple[DataFrame, DataFrame]:
    events = out.where(F.col("row_type") == "event").drop(
        "row_type", "last_seen", "last_reset", "hits", "now", "visits"
    )
    states = out.where(F.col("row_type") == "state").select(
        "device_id", "rule_id", "last_seen", "last_reset", "hits", "now", "visits"
    )
    return events, states


# snapshot_from_points collects the per-device latest rows to the
# driver (dimension-scale broadcastable snapshot); refuse past this
# device count — the fact-scale form is devices_at.snapshot_df_from_points
SNAPSHOT_GUARD_ROWS = 1_000_000


def snapshot_from_points(points: DataFrame) -> DeviceSnapshot:
    """Latest position per device (InsertOrReplace set-form,
    devices.go:105-147): row_number over (device_id order by datetime
    desc) = 1, collected to a broadcastable snapshot. DIMENSION-SCALE
    ONLY (one row per device on the driver) — at url-as-device
    cardinality use :func:`spinix_spark.engine.devices_at.
    snapshot_df_from_points`, which keeps the snapshot a DataFrame."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("device_id").orderBy(F.col("datetime").desc())
    latest = (
        points.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    ).cache()
    n = latest.count()
    if n > SNAPSHOT_GUARD_ROWS:
        latest.unpersist()
        raise ValueError(
            f"snapshot_from_points: {n} devices (> {SNAPSHOT_GUARD_ROWS}) "
            "would be collected to the driver; use "
            "devices_at.snapshot_df_from_points (DataFrame snapshot, no "
            "collect) at this scale"
        )
    snap = DeviceSnapshot()
    cols = ["device_id", "layer_id", "lat", "lon", "datetime"]
    have = [c for c in cols if c in latest.columns]
    for row in latest.select(*have).collect():
        snap.insert_or_replace(row.asDict())
    latest.unpersist()
    return snap
