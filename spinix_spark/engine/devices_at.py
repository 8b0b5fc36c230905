"""Fact-scale physical strategy for ``devices(@)`` rules.

The broadcast/kernel path (engine/spark_pipeline.py) evaluates
device-vs-all-devices verbs by looping the broadcast snapshot inside
each task — correct and reference-faithful while the snapshot is
dimension-sized, but O(snapshot) Python iterations per Arrow batch and
a driver-side ``.collect()`` to build the snapshot. At url-as-device
cardinality (the 100 TB shape) the snapshot IS fact-sized, so this
module provides the relational strategy instead:

    points ──cell key──► explode k-ring neighbor cells
           ──equi-join── devices_df (cell key, optional salt)
           ──candidacy (exact Devices.Near rect, devices.go:166-199)
           ──mapInPandas pairwise verb refine (vectorized kernel)
           ──groupBy row: ok = ANY candidate, refs = satisfied ids
           ──AND-fold with the rule's remaining (Catalyst) nodes
           ──event rows

Everything before the refine is whole-stage codegen; the refine sees
only (rowkey, a_lat, a_lon, b_id, b_lat, b_lon) pairs that already
passed the exact candidacy rect — the same candidate universe the
kernel's ``Devices.Near`` prefilter admits, so results are identical
(asserted by the cross-strategy parity test). Ref lists are emitted in
sorted order; the kernel emits snapshot-insertion order — the set is
identical, the order is an unspecified implementation detail.

Scope: stateless rules, all-AND fold, exactly one SpDevicesOp node
with ``right.all`` (any target buffer, point ``@`` candidates); the
other nodes must compile to Catalyst (engine/sql_compile.py). Rules
outside this shape keep the broadcast path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from spinix_spark.dsl.compiler import SpDevicesOp
from spinix_spark.dsl.tokens import Token
from spinix_spark.engine.runtime import _clamp_all_negated, _dd_verb_mask
from spinix_spark.geo.cells import GridScheme
from spinix_spark.geo.geodesy import (
    MIN_DIST_METERS,
    TINY_REGION_SIZE,
    normalize_distance,
)
from spinix_spark.geo.sqlgen import rect_from_center_pred_sql


def at_search_meters(node: SpDevicesOp) -> float:
    """The kernel's ``@`` search radius: target buffer reach with the
    negated-verb bump (runtime.go:1515-1525) and the TINY-tier clamp
    (devices.go:166-199)."""
    meters = node.left.meters()
    if node.op in (Token.NINTERSECTS, Token.NNEAR):
        meters = _clamp_all_negated(meters)
    return MIN_DIST_METERS if meters <= 0 else normalize_distance(meters, TINY_REGION_SIZE)


def devices_at_node(rule, allow_stateful: bool = False) -> SpDevicesOp | None:
    """The rule's single devices(@) node if the rule fits this
    strategy's shape, else None.

    ``allow_stateful=True`` admits rules with a real ``:trigger`` —
    their events still come from the same pair-join candidates, gated
    afterwards by the sequential per-device trigger fold
    (spark_pipeline._at_rule_events_stateful)."""
    from spinix_spark.dsl import ast_nodes as ast

    spec = rule.spec
    # any {...} props block marks the spec stateful (reference parity),
    # but without a :trigger the gate is constant-true and state rows
    # never influence events — only a real trigger needs the keyed fold
    if not allow_stateful and spec.props.repeat != ast.REPEAT_NONE:
        return None
    if any(op is not Token.AND for op in spec.ops):
        return None
    at_nodes = [
        n
        for n in spec.nodes
        if isinstance(n, SpDevicesOp) and n.right.all and not n.right.refs
    ]
    if len(at_nodes) != 1:
        return None
    node = at_nodes[0]
    # point candidates only (devices(@) carries no buffer in the DSL
    # grammar; defensive check)
    if node.right.kind in (Token.RADIUS, Token.BBOX):
        return None
    return node


def empty_snapshot_ref_reasons(engine) -> list[str]:
    """Rules whose explicit device refs would silently resolve to
    nothing because engine.devices is empty — one reason per rule,
    empty when the snapshot is populated or no rule uses refs.

    Explicit device refs (``devices(d1 d2)``, ``devices(A)`` vs
    ``devices(B)``, distance-to-device comparators) resolve positions
    from engine.devices AT COMPILE TIME
    (sql_compile._candidate_device_pred / EqualDevicesOp lookups),
    silently skipping missing refs (kernel parity with the reference's
    lookup behavior, runtime.go:1444-1712) — so against an EMPTY
    snapshot every such node compiles to ``false`` and the rule emits
    zero events with no error. Refs are dimension-sized by
    construction (named ids in the DSL text), so the fix at fact scale
    is to register exactly those devices in engine.devices, not to
    skip the check. Fact-scale entry points (detect_batch_spark with
    devices_df, stream_detect_scalable) refuse loudly on these."""
    from spinix_spark.dsl.compiler import EqualDevicesOp, SpDDevicesOp

    if len(engine.devices) != 0:
        return []
    reasons = []
    for r in engine.rules.values():
        ref_nodes = sorted(
            {
                type(n).__name__
                for n in r.spec.nodes
                if (isinstance(n, SpDevicesOp) and n.right.refs)
                or isinstance(n, (SpDDevicesOp, EqualDevicesOp))
            }
        )
        if ref_nodes:
            reasons.append(
                f"rule {r.rule_id}: {'/'.join(ref_nodes)} resolves "
                "explicit device ref(s) from engine.devices, which is "
                "EMPTY — the rule would silently match nothing; "
                "register the referenced devices (dimension-sized) in "
                "engine.devices"
            )
    return reasons


def at_ineligible_reasons(engine, columns) -> list[str]:
    """Why each registered devices(@) rule would FAIL the pair-join
    strategy and fall back to the broadcast-kernel path — one reason
    string per ineligible rule, empty when every @ rule is pair-join
    eligible.

    The kernel fallback evaluates @ against the broadcast snapshot
    (engine.devices); at fact scale that snapshot is empty and @ would
    silently evaluate false everywhere, so callers that supply the
    snapshot as a DataFrame (detect_batch_spark(devices_df=...),
    stream_detect_scalable) use this probe to refuse loudly instead.
    ``columns`` is the points schema the companion nodes must compile
    against (e.g. ``points_df.columns``)."""
    from spinix_spark.engine.sql_compile import compile_node_sql

    cols = set(columns)
    ref_reasons = empty_snapshot_ref_reasons(engine)
    flagged = {s.split(":", 1)[0] for s in ref_reasons}
    reasons = list(ref_reasons)
    for r in engine.rules.values():
        if f"rule {r.rule_id}" in flagged:
            continue
        has_at = any(
            isinstance(n, SpDevicesOp) and n.right.all and not n.right.refs
            for n in r.spec.nodes
        )
        if not has_at:
            continue
        node = devices_at_node(r, allow_stateful=True)
        if node is None:
            reasons.append(
                f"rule {r.rule_id}: devices(@) outside the pair-join shape "
                "(needs an all-AND fold with exactly one @ node)"
            )
            continue
        for n in r.spec.nodes:
            if n is node:
                continue
            if compile_node_sql(n, engine, r.spec.props, cols) is None:
                reasons.append(
                    f"rule {r.rule_id}: companion node {type(n).__name__} is "
                    "not Catalyst-compilable against the points schema "
                    f"{sorted(cols)}"
                )
                break
    return reasons


_PAIR_SCHEMA = StructType(
    [
        StructField("_rowkey", LongType()),
        StructField("b_id", StringType()),
    ]
)


def at_candidate_pairs(
    points: DataFrame,
    devices_df: DataFrame,
    node: SpDevicesOp,
    scheme: GridScheme,
    n_salt: int = 0,
) -> DataFrame:
    """(row, snapshot-device) pairs satisfying the exact verb — the
    distributed form of the kernel's per-snapshot-device loop.

    ``points`` must carry ``_rowkey`` (unique per row), lat, lon,
    layer_id, device_id. ``devices_df`` needs device_id, layer_id,
    lat, lon. ``n_salt`` > 0 splits hot cells two-level (see
    joins.near_pairs_salted).
    """
    import math

    from spinix_spark.geo.geodesy import EARTH_RADIUS_M

    search_m = at_search_meters(node)
    cell = F.expr(scheme.sql_cell_expr("lat", "lon"))

    # search/probe key construction is shared with the radius
    # self-join (engine/joins.py): per-row wrapped k-ring span
    # (latitude reach = angular radius; longitude widens by 1/cos lat),
    # single-explode key arrays, polar-cap keys for pole-crossing
    # discs — mirroring the kernel's rect universe + polar widening.
    from spinix_spark.engine.joins import (
        _with_cap_probe_keys,
        _with_neighbor_cells,
    )

    deg_s = math.degrees(search_m / EARTH_RADIUS_M)

    left = points.select(
        "_rowkey",
        F.col("device_id").alias("a_id"),
        F.col("layer_id").alias("a_layer"),
        F.col("lat").alias("a_lat"),
        F.col("lon").alias("a_lon"),
        "lat",
        cell.alias("_cell"),
    )
    left = _with_neighbor_cells(
        left, scheme, "_cell", search_m, lat_col="lat"
    ).drop("lat", "_cell")
    right = _with_cap_probe_keys(
        devices_df.select(
            F.col("device_id").alias("b_id"),
            F.col("layer_id").alias("b_layer"),
            F.col("lat").alias("b_lat"),
            F.col("lon").alias("b_lon"),
            cell.alias("_cell"),
        ),
        scheme,
        search_m,
        "b_lat",
        "_cell",
    )
    join_keys = ["_ncell"]
    if n_salt > 0:
        # Two-level salt with the EXPLODE on the snapshot side (round
        # 7): the fact side already fans out ~(2k+1)^2 k-ring keys per
        # row, so exploding it ×S again multiplied the big side's rows
        # for nothing (measured 4.3M vs 0.55M candidate-build rows at
        # 60k pages / S=8). Each fact row keeps ONE deterministic salt
        # (hash of its unique _rowkey) and each snapshot row replicates
        # over all S salts — every (row, device) pair still meets at
        # exactly one (_ncell, _bb) key, and a hot cell's work splits
        # across S sub-keys by the FACT-side multiplicity (the large
        # one: the snapshot holds at most one row per device). Pair
        # set identical (cross-strategy parity tests).
        left = left.withColumn("_bb", F.pmod(F.xxhash64("_rowkey"), n_salt))
        right = right.withColumn(
            "_bb", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
        )
        join_keys = ["_ncell", "_bb"]

    # candidacy = kernel universe: the framed rect test, widened at the
    # poles (cap row × band candidate) exactly as the kernel widens —
    # the exact verb (geodesic for polar rows) decides afterwards
    rect_pred = rect_from_center_pred_sql(
        "a_lat", "a_lon", "b_lat", "b_lon", search_m
    )
    polar_pred = (
        f"((a_lat + {deg_s!r} >= 90.0 AND b_lat >= {90.0 - 2.0 * deg_s!r})"
        f" OR (a_lat - {deg_s!r} <= -90.0 AND b_lat <= {-90.0 + 2.0 * deg_s!r}))"
    )
    cand = (
        left.join(right, join_keys)
        .where(F.col("a_layer") == F.col("b_layer"))
        .where(F.expr(f"({rect_pred} OR {polar_pred})"))
        .select("_rowkey", "a_id", "a_lat", "a_lon", "b_id", "b_lat", "b_lon")
    )

    op = node.op
    t_kind = node.left.kind
    t_meters = node.left.meters()
    t_steps = node.left.steps()

    if t_kind not in (Token.RADIUS, Token.BBOX):
        # point target vs point candidate: every verb reduces to
        # coordinate (in)equality (runtime.go:1662-1700) — stay in
        # Catalyst, no Python
        eq = (F.col("a_lat") == F.col("b_lat")) & (F.col("a_lon") == F.col("b_lon"))
        pred = ~eq if op in (Token.NINTERSECTS, Token.NIN, Token.NNEAR) else eq
        return cand.where(pred).select("_rowkey", "b_id")

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from spinix_spark.engine.runtime import DeviceBatch

        for pdf in batches:
            if pdf.empty:
                continue
            apdf = pd.DataFrame(
                {
                    "device_id": pdf["a_id"].to_numpy(object),
                    "lat": pdf["a_lat"].to_numpy(np.float64),
                    "lon": pdf["a_lon"].to_numpy(np.float64),
                }
            )
            batch = DeviceBatch(apdf)
            rings = batch.rings(t_meters, t_steps)
            pred = _dd_verb_mask(
                op,
                t_kind,
                rings,
                batch,
                Token.DEVICE,
                pdf["b_lat"].to_numpy(np.float64),
                pdf["b_lon"].to_numpy(np.float64),
                0.0,
                0,
                target_meters=t_meters,
            )
            yield pdf.loc[pred, ["_rowkey", "b_id"]]

    return cand.mapInPandas(refine, schema=_PAIR_SCHEMA)


def at_row_matches(pairs: DataFrame) -> DataFrame:
    """Per-row verdict: refs = sorted satisfied candidate ids (the set
    equals the kernel's; order is canonicalized)."""
    return (
        pairs.groupBy("_rowkey")
        .agg(F.sort_array(F.collect_set("b_id")).alias("_at_refs"))
    )


def snapshot_df_from_points(points: DataFrame) -> DataFrame:
    """Latest position per device as a DataFrame — the fact-scale form
    of spark_pipeline.snapshot_from_points (InsertOrReplace set form,
    devices.go:105-147) with NO driver collect: one shuffle on
    device_id, window row_number, done."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("device_id").orderBy(
        F.col("datetime").desc(), F.col("lat").desc(), F.col("lon").desc()
    )
    cols = [c for c in ("device_id", "layer_id", "lat", "lon", "datetime") if c in points.columns]
    return (
        points.select(*cols)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
