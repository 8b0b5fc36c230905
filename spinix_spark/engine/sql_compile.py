"""Rule → Catalyst compiler: the all-JVM fast path.

For eligible rules the entire evaluation — spatial predicates, the
attribute comparators, the left-to-right AND/OR fold with AND-skip
match capture, and the per-node ref collection — compiles to Catalyst
column expressions over the points scan. No Arrow boundary, no Python
workers: whole-stage codegen end to end, which is the plan you want on
a 1000-executor cluster whenever the rule shape allows it.

Eligible today (falls back to the vectorized-kernel mapInPandas path
otherwise, chosen per rule):

- stateless rules only (trigger state is a keyed stateful stage)
- spatial nodes: point-device (no ``:radius``/``:bbox`` buffer) versus
  explicit zone refs (polygon / multiPolygon / rect / circle / point)
  with any verb — the zone geometry is constant, so the exact
  predicate is a fixed expression: boundary-INCLUSIVE ray-cast PIP
  (identical arithmetic to geo/predicates.py, including the on-edge
  clause), exact haversine for circle zones, equality for point zones
- distance comparators (EqualObjectOp) with their 50 m rounding and
  the reference's last-candidate-wins Ok (runtime.go:1795-1825)
- every attribute op (int/float/string/time/datetime views of the
  device row, runtime.go:2126-2224)

Output rows are bit-identical to the kernel path (asserted by the
randomized cross-path parity test).
"""

from __future__ import annotations

from dataclasses import dataclass

from spinix_spark.dsl import ast_nodes as ast
from spinix_spark.dsl.compiler import (
    CompiledSpec,
    EqualFloatOp,
    EqualIntOp,
    EqualObjectOp,
    EqualStrOp,
    EqualTimeOp,
    InFloatOp,
    InIntOp,
    InStringOp,
    RangeDateTimeOp,
    RangeFloatOp,
    RangeIntOp,
    RangeTimeOp,
    SpObjectOp,
)
from spinix_spark.dsl.tokens import Token
from spinix_spark.geo.geodesy import MIN_DIST_METERS
from spinix_spark.geo.sqlgen import haversine_sql, point_in_ring_sql, round50_sql


@dataclass
class NodeSQL:
    ok_sql: str
    refs_sql: str  # array<string> expression
    left_kw: str
    right_kw: str
    op: str


_CMP_SQL = {
    Token.EQ: "=",
    Token.LT: "<",
    Token.GT: ">",
    Token.NE: "<>",
    Token.LTE: "<=",
    Token.GTE: ">=",
}

_FLOAT_COLS = {
    Token.FUELLEVEL: "fuel_level",
    Token.PRESSURE: "pressure",
    Token.LUMINOSITY: "luminosity",
    Token.HUMIDITY: "humidity",
    Token.TEMPERATURE: "temperature",
    Token.BATTERY_CHARGE: "battery",
    Token.SPEED: "speed",
}

_STR_COLS = {
    Token.MODEL: "model",
    Token.BRAND: "brand",
    Token.OWNER: "owner",
    Token.IMEI: "imei",
}

_TS = "to_timestamp(datetime)"  # session tz pinned to UTC by the caller

_DATE_FLOAT = {
    Token.YEAR: f"CAST(year({_TS}) AS DOUBLE)",
    Token.MONTH: f"CAST(month({_TS}) AS DOUBLE)",
    Token.WEEK: f"CAST(weekofyear({_TS}) AS DOUBLE)",
    Token.DAY: f"CAST(day({_TS}) AS DOUBLE)",
    Token.HOUR: f"CAST(hour({_TS}) AS DOUBLE)",
}

_DATE_STR = {
    Token.MONTH: f"date_format({_TS}, 'MMMM')",
    Token.DAY: f"date_format({_TS}, 'EEEE')",
    Token.DATE: f"date_format({_TS}, 'yyyy-MM-dd')",
    Token.DATETIME: f"date_format({_TS}, \"yyyy-MM-dd'T'HH:mm:ss'Z'\")",
}


def _float_sql(kw: Token, columns: set[str]) -> str | None:
    if kw is Token.STATUS:
        return "CAST(status AS DOUBLE)" if "status" in columns else "CAST(0 AS DOUBLE)"
    col = _FLOAT_COLS.get(kw)
    if col is not None:
        return f"CAST(coalesce({col}, 0.0) AS DOUBLE)" if col in columns else "CAST(0.0 AS DOUBLE)"
    expr = _DATE_FLOAT.get(kw)
    if expr is not None:
        return expr if "datetime" in columns else None
    return None


def _int_sql(kw: Token, columns: set[str]) -> str | None:
    f = _float_sql(kw, columns)
    # Go int(float64) truncates toward zero; Spark CAST(double AS BIGINT) too
    return None if f is None else f"CAST({f} AS BIGINT)"


def _str_sql(kw: Token, columns: set[str]) -> str | None:
    col = _STR_COLS.get(kw)
    if col is not None:
        return f"coalesce({col}, '')" if col in columns else "''"
    expr = _DATE_STR.get(kw)
    if expr is not None:
        return expr if "datetime" in columns else None
    return None


def _day_anchor_sql(h: int, m: int) -> str:
    # UTC midnight from unix seconds (datetimes are non-negative here)
    return f"((datetime DIV 86400) * 86400 + {h * 3600 + m * 60})"


def _sql_str(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def _zone_point_pred(zone, op: Token) -> str | None:
    """Per-zone predicate for a POINT device (truth table of
    runtime.go:1313-1333). Returns a boolean SQL expr or None if the
    zone kind is not expressible."""
    if zone.circle is not None:
        clat, clon, r = zone.circle
        inter = f"({haversine_sql('lat', 'lon', repr(clat), repr(clon))} <= {r!r})"
        within = "false"
    elif zone.kind in ("polygon", "multiPolygon", "rect") and zone.rings and not zone.lines and zone.points is None:
        preds = [
            point_in_ring_sql("lat", "lon", [(float(p[0]), float(p[1])) for p in ring], inclusive=True)
            for ring in zone.rings
        ]
        inter = "(" + " OR ".join(preds) + ")"
        within = "false"
    elif zone.kind in ("point", "multiPoint") and zone.points is not None and not zone.rings and not zone.lines:
        pts = [(float(p[0]), float(p[1])) for p in zone.points]
        eqs = [f"(lat = {a!r} AND lon = {b!r})" for a, b in pts]
        inter = "(" + " OR ".join(eqs) + ")"
        within = "(" + " AND ".join(eqs) + ")"
    else:
        return None
    if op is Token.INTERSECTS:
        return inter
    if op is Token.NINTERSECTS:
        return f"(NOT {inter})"
    if op is Token.NEAR:
        return f"({inter} OR {within})"
    if op is Token.NNEAR:
        return f"((NOT {inter}) OR (NOT {within}))"
    if op is Token.IN:
        return within
    if op is Token.NIN:
        return f"(NOT {within})"
    return None


def _refs_array_sql(pairs: list[tuple[str, str]]) -> str:
    """[(pred_sql, ref_id)] → array<string> of satisfied refs, in
    candidate iteration order."""
    cases = ", ".join(
        f"CASE WHEN {p} THEN {_sql_str(r)} ELSE NULL END" for p, r in pairs
    )
    return f"filter(array({cases}), x -> x IS NOT NULL)"


def compile_node_sql(node, engine, props, columns: set[str]) -> NodeSQL | None:
    if isinstance(node, SpObjectOp):
        if node.left.kind is not Token.DEVICE:
            return None  # buffered devices build per-row rings → kernel path
        if not node.right.refs or node.right.all:
            return None
        pairs: list[tuple[str, str]] = []
        for rid in node.right.refs:
            z = engine.zones.lookup(rid)
            if z is None or z.layer_id != props.layer:
                continue
            pred = _zone_point_pred(z, node.op)
            if pred is None:
                return None
            pairs.append((pred, rid))
        ok = "(" + " OR ".join(p for p, _ in pairs) + ")" if pairs else "false"
        refs = _refs_array_sql(pairs) if pairs else "array()"
        return NodeSQL(
            ok_sql=ok,
            refs_sql=refs,
            left_kw="device",
            right_kw=str(node.right.kind),
            op=str(node.op),
        )
    if isinstance(node, EqualObjectOp):
        cmp = _CMP_SQL[node.op]
        target = node.left.meters()
        pairs = []
        last_pred = "false"
        for rid in node.right.refs:
            z = engine.zones.lookup(rid)
            if z is None:
                continue
            clat, clon = z.center()
            dist = round50_sql(
                haversine_sql("lat", "lon", repr(float(clat)), repr(float(clon))),
                MIN_DIST_METERS,
            )
            pred = f"({dist} {cmp} CAST({target!r} AS DOUBLE))"
            pairs.append((pred, rid))
            last_pred = pred  # last-candidate-wins Ok (runtime.go:1795-1825)
        return NodeSQL(
            ok_sql=last_pred,
            refs_sql=_refs_array_sql(pairs) if pairs else "array()",
            left_kw="device",
            right_kw=str(node.right.kind),
            op=str(node.op),
        )
    if isinstance(node, (EqualIntOp, EqualFloatOp)):
        val = (
            _int_sql(node.keyword, columns)
            if isinstance(node, EqualIntOp)
            else _float_sql(node.keyword, columns)
        )
        if val is None:
            return None
        lit = repr(node.value) if isinstance(node, EqualFloatOp) else str(node.value)
        return NodeSQL(
            ok_sql=f"({val} {_CMP_SQL[node.op]} {lit})",
            refs_sql="array()",
            left_kw=str(node.keyword),
            right_kw="FLOAT" if isinstance(node, EqualFloatOp) else "INT",
            op=str(node.op),
        )
    if isinstance(node, EqualStrOp):
        val = _str_sql(node.keyword, columns)
        if val is None:
            return None
        return NodeSQL(
            ok_sql=f"({val} {_CMP_SQL[node.op]} {_sql_str(node.value)})",
            refs_sql="array()",
            left_kw=str(node.keyword),
            right_kw="STRING",
            op=str(node.op),
        )
    if isinstance(node, EqualTimeOp):
        if "datetime" not in columns:
            return None
        bound = _day_anchor_sql(node.hour, node.minute)
        return NodeSQL(
            ok_sql=f"(datetime {_CMP_SQL[node.op]} {bound})",
            refs_sql="array()",
            left_kw=str(node.keyword),
            right_kw="time",
            op=str(node.op),
        )
    if isinstance(node, (InIntOp, InFloatOp, InStringOp)):
        if isinstance(node, InStringOp):
            val = _str_sql(node.keyword, columns)
            items = ", ".join(_sql_str(v) for v in sorted(node.values))
        elif isinstance(node, InIntOp):
            val = _int_sql(node.keyword, columns)
            items = ", ".join(str(v) for v in sorted(node.values))
        else:
            val = _float_sql(node.keyword, columns)
            items = ", ".join(repr(v) for v in sorted(node.values))
        if val is None or not items:
            return None
        neg = "NOT " if node.negate else ""
        return NodeSQL(
            ok_sql=f"({neg}({val} IN ({items})))",
            refs_sql="array()",
            left_kw=str(node.keyword),
            right_kw="STRING" if isinstance(node, InStringOp) else (
                "INT" if isinstance(node, InIntOp) else "FLOAT"
            ),
            op="NIN" if node.negate else "IN",
        )
    if isinstance(node, (RangeIntOp, RangeFloatOp)):
        val = (
            _int_sql(node.keyword, columns)
            if isinstance(node, RangeIntOp)
            else _float_sql(node.keyword, columns)
        )
        if val is None:
            return None
        b = node.begin if isinstance(node, RangeIntOp) else repr(node.begin)
        e = node.end if isinstance(node, RangeIntOp) else repr(node.end)
        ok = (
            f"({val} <= {b} OR {val} >= {e})"
            if node.negate
            else f"({val} >= {b} AND {val} <= {e})"
        )
        return NodeSQL(
            ok_sql=ok,
            refs_sql="array()",
            left_kw=str(node.keyword),
            right_kw="INT" if isinstance(node, RangeIntOp) else "FLOAT",
            op="NRANGE" if node.negate else "RANGE",
        )
    if isinstance(node, RangeTimeOp):
        if "datetime" not in columns:
            return None
        d1 = _day_anchor_sql(node.begin_h, node.begin_m)
        d2 = _day_anchor_sql(node.end_h, node.end_m)
        ok = (
            f"(datetime <= {d1} OR datetime >= {d2})"
            if node.negate
            else f"(datetime >= {d1} AND datetime <= {d2})"
        )
        return NodeSQL(
            ok_sql=ok, refs_sql="array()", left_kw=str(node.keyword),
            right_kw="time", op="NRANGE" if node.negate else "RANGE",
        )
    if isinstance(node, RangeDateTimeOp):
        if "datetime" not in columns:
            return None
        ok = (
            f"(datetime <= {node.begin_unix} OR datetime >= {node.end_unix})"
            if node.negate
            else f"(datetime >= {node.begin_unix} AND datetime <= {node.end_unix})"
        )
        return NodeSQL(
            ok_sql=ok, refs_sql="array()", left_kw=str(node.keyword),
            right_kw="datetime", op="NRANGE" if node.negate else "RANGE",
        )
    return None


@dataclass
class RuleSQLPlan:
    nodes: list[NodeSQL]
    recorded_sql: list[str]
    final_sql: str
    layer_sql: str


def try_compile_rule_sql(engine, rule) -> RuleSQLPlan | None:
    """Compile a rule to pure Catalyst expressions, or None if any
    part needs the kernel path."""
    spec: CompiledSpec = rule.spec
    if spec.is_stateful:
        return None
    columns = {
        "url", "device_id", "layer_id", "lat", "lon", "datetime",
        "speed", "status",
    }
    nodes: list[NodeSQL] = []
    for node in spec.nodes:
        ns = compile_node_sql(node, engine, spec.props, columns)
        if ns is None:
            return None
        nodes.append(ns)

    layer_sql = f"(layer_id = {_sql_str(spec.props.layer)})"
    # left-to-right fold with AND-skip capture (runtime.go:186-231)
    acc = nodes[0].ok_sql
    recorded = ["true"]
    for j in range(1, len(nodes)):
        op = spec.ops[j - 1]
        if op is Token.AND:
            recorded.append(acc)
            acc = f"({acc} AND {nodes[j].ok_sql})"
        else:
            recorded.append("true")
            acc = f"({acc} OR {nodes[j].ok_sql})"
    final = f"({acc} AND {layer_sql})"
    return RuleSQLPlan(
        nodes=nodes, recorded_sql=recorded, final_sql=final, layer_sql=layer_sql
    )
