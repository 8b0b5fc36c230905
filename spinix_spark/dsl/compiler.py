"""Rule compiler: AST → flat operator list + props (the compiled IR).

Mirrors the reference compile pipeline (exprToSpec at
/root/reference/runtime.go:331-374): extract props, flatten the binary
tree into ``nodes[] + ops[]`` via an in-order walk (only leaf-pair
binaries become operator nodes; parenthesized grouping is intentionally
discarded — evaluation is a strict left-to-right fold, runtime.go:239-271),
then type-check/construct each operator via the makeOp dispatch
(runtime.go:376-1010) including its compile-time rejections
(``devices(@) OP devices(@)``, non-object tokens on the object side,
range begin>=end, malformed datetime bounds).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from spinix_spark.dsl import ast_nodes as ast
from spinix_spark.dsl.parser import (
    parse_date_unix,
    parse_go_duration,  # noqa: F401  (re-exported for engine use)
    parse_rfc3339_unix,
    parse_spec,
)
from spinix_spark.dsl.tokens import (
    NUMBER_TOKENS,
    OBJECT_TOKENS,
    STRING_TOKENS,
    TIME_TOKENS,
    Token,
)

NIL_XID = "0" * 20  # rs/xid nil id, the default layer

DEFAULT_RESET_INTERVAL_S = 24 * 3600.0


class CompileError(ValueError):
    pass


# --- compiled operator descriptors (≙ the reference's evaluater impls) ---


@dataclass
class SpObjectOp:
    """device (point/:radius 12-gon/:bbox rect) VERB geo-objects
    (runtime.go:1193-1353)."""

    left: ast.DeviceLit
    right: ast.ObjectLit
    op: Token


@dataclass
class SpDevicesOp:
    """device VERB devices (runtime.go:1444-1712)."""

    left: ast.DeviceLit
    right: ast.DevicesLit
    op: Token


@dataclass
class SpDDevicesOp:
    """devices(A) VERB devices(B) — membership gate on exactly one side,
    then delegates (runtime.go:1355-1431)."""

    left: ast.DevicesLit
    right: ast.DevicesLit
    op: Token


@dataclass
class SpDevicesObjectOp:
    """devices(list) VERB object — membership gate then SpObjectOp
    (runtime.go:1147-1191)."""

    left: ast.DevicesLit
    right: ast.ObjectLit
    op: Token


@dataclass
class EqualObjectOp:
    """distance-to-zone comparator, 50 m rounded (runtime.go:1764-1826)."""

    left: ast.DeviceLit
    right: ast.ObjectLit
    op: Token


@dataclass
class EqualDevicesOp:
    """distance-to-device comparator (runtime.go:1828-1889)."""

    left: ast.DeviceLit
    right: ast.DevicesLit
    op: Token


@dataclass
class EqualIntOp:
    keyword: Token
    value: int
    op: Token


@dataclass
class EqualFloatOp:
    keyword: Token
    value: float
    op: Token


@dataclass
class EqualStrOp:
    keyword: Token
    value: str
    op: Token


@dataclass
class EqualTimeOp:
    keyword: Token
    hour: int
    minute: int
    op: Token


@dataclass
class InIntOp:
    keyword: Token
    values: frozenset[int]
    negate: bool


@dataclass
class InFloatOp:
    keyword: Token
    values: frozenset[float]
    negate: bool


@dataclass
class InStringOp:
    keyword: Token
    values: frozenset[str]
    negate: bool


@dataclass
class RangeIntOp:
    keyword: Token
    begin: int
    end: int
    negate: bool


@dataclass
class RangeFloatOp:
    keyword: Token
    begin: float
    end: float
    negate: bool


@dataclass
class RangeTimeOp:
    keyword: Token
    begin_h: int
    begin_m: int
    end_h: int
    end_m: int
    negate: bool


@dataclass
class RangeDateTimeOp:
    keyword: Token
    begin_unix: int
    end_unix: int
    negate: bool


Node = (
    SpObjectOp
    | SpDevicesOp
    | SpDDevicesOp
    | SpDevicesObjectOp
    | EqualObjectOp
    | EqualDevicesOp
    | EqualIntOp
    | EqualFloatOp
    | EqualStrOp
    | EqualTimeOp
    | InIntOp
    | InFloatOp
    | InStringOp
    | RangeIntOp
    | RangeFloatOp
    | RangeTimeOp
    | RangeDateTimeOp
)


@dataclass
class SpecProps:
    reset_interval_s: float = 0.0
    times: int = 0
    repeat: int = ast.REPEAT_NONE
    interval_s: float = 0.0
    delay_s: float = 0.0
    center_lat: float = 0.0
    center_lon: float = 0.0
    expire_s: float = 0.0
    radius_m: float = 0.0
    layer: str = NIL_XID


@dataclass
class CompiledSpec:
    nodes: list[Node] = field(default_factory=list)
    ops: list[Token] = field(default_factory=list)
    is_stateful: bool = False
    props: SpecProps = field(default_factory=SpecProps)
    source: str = ""


# --- makeOp dispatch -----------------------------------------------------

_SPATIAL = (Token.INTERSECTS, Token.NINTERSECTS, Token.NEAR, Token.NNEAR)
_EQUALITY = (Token.EQ, Token.LT, Token.GT, Token.NE, Token.LTE, Token.GTE)


def _err(left, right, op, msg="illegal") -> CompileError:
    return CompileError(f"spinix/runtime: invalid expr: {left} {op} {right}: {msg}")


def make_op(left: ast.Expr, right: ast.Expr, op: Token) -> Node:
    if op in _SPATIAL:
        return _e2sp(left, right, op)
    if op is Token.IN:
        return _e2in(left, right, False)
    if op is Token.NIN:
        return _e2in(left, right, True)
    if op is Token.RANGE:
        return _e2range(left, right, False)
    if op is Token.NRANGE:
        return _e2range(left, right, True)
    if op in _EQUALITY:
        return _e2equal(left, right, op)
    raise CompileError(f"spinix/runtime: illegal expression {left} {op} {right}")


def _e2sp(left: ast.Expr, right: ast.Expr, op: Token) -> Node:
    if isinstance(left, ast.DeviceLit):
        if isinstance(right, ast.ObjectLit):
            if right.kind not in OBJECT_TOKENS:
                raise _err(left, right, op, f"got {right.kind}, expected object token")
            right.refs = sorted(right.refs)
            return SpObjectOp(left=left, right=right, op=op)
        if isinstance(right, ast.DevicesLit):
            return SpDevicesOp(left=left, right=right, op=op)
    elif isinstance(left, ast.ObjectLit):
        if left.kind not in OBJECT_TOKENS:
            raise _err(left, right, op, f"got {left.kind}, expected object token")
        left.refs = sorted(left.refs)
        if isinstance(right, ast.DevicesLit):
            right.refs = sorted(right.refs)
            return SpDevicesObjectOp(left=right, right=left, op=op)
        if isinstance(right, ast.DeviceLit):
            return SpObjectOp(left=right, right=left, op=op)
    elif isinstance(left, ast.DevicesLit):
        left.refs = sorted(left.refs)
        if isinstance(right, ast.ObjectLit):
            if right.all and left.all:
                raise _err(left, right, op)
            right.refs = sorted(right.refs)
            return SpDevicesObjectOp(left=left, right=right, op=op)
        if isinstance(right, ast.DevicesLit):
            if right.all and left.all:
                raise _err(left, right, op)
            right.refs = sorted(right.refs)
            return SpDDevicesOp(left=right, right=left, op=op)
        if isinstance(right, ast.DeviceLit):
            return SpDevicesOp(left=right, right=left, op=op)
    raise _err(left, right, op)


def _e2in(left: ast.Expr, right: ast.Expr, negate: bool) -> Node:
    op = Token.NIN if negate else Token.IN
    if isinstance(left, ast.IdentLit):
        if not isinstance(right, ast.ListLit) or right.kind is not Token.ILLEGAL:
            raise _err(left, right, op, "expected list [v, v, ...]")
        if right.typ is Token.INT:
            if left.kind not in NUMBER_TOKENS:
                raise _err(left, right, op, f"got {left.kind}, expected number token")
            return InIntOp(
                keyword=left.kind,
                values=frozenset(i.value for i in right.items),
                negate=negate,
            )
        if right.typ is Token.FLOAT:
            if left.kind not in NUMBER_TOKENS:
                raise _err(left, right, op, f"got {left.kind}, expected number token")
            return InFloatOp(
                keyword=left.kind,
                values=frozenset(i.value for i in right.items),
                negate=negate,
            )
        if right.typ in (Token.STRING, Token.IDENT):
            if left.kind not in STRING_TOKENS:
                raise _err(left, right, op, f"got {left.kind}, expected string token")
            return InStringOp(
                keyword=left.kind,
                values=frozenset(i.value for i in right.items),
                negate=negate,
            )
        raise _err(left, right, op)
    return _e2sp(left, right, op)


def _e2range(left: ast.Expr, right: ast.Expr, negate: bool) -> Node:
    op = Token.NRANGE if negate else Token.RANGE
    if isinstance(left, ast.IdentLit) and isinstance(right, ast.ListLit):
        if right.kind is not Token.RANGE:
            raise _err(left, right, op, "expected [start .. end]")
        if right.typ is Token.INT:
            if left.kind not in NUMBER_TOKENS:
                raise _err(left, right, op, f"got {left.kind}, expected number token")
            begin, end = right.items[0].value, right.items[1].value
            if begin > end:
                raise _err(left, right, op, "left operand is greater than right")
            if begin == end:
                raise _err(left, right, op, "left and right operands are equal")
            return RangeIntOp(keyword=left.kind, begin=begin, end=end, negate=negate)
        if right.typ is Token.FLOAT:
            if left.kind not in NUMBER_TOKENS:
                raise _err(left, right, op, f"got {left.kind}, expected number token")
            begin, end = right.items[0].value, right.items[1].value
            if begin > end:
                raise _err(left, right, op, "left operand is greater than right")
            if begin == end:
                raise _err(left, right, op, "left and right operands are equal")
            return RangeFloatOp(keyword=left.kind, begin=begin, end=end, negate=negate)
        if right.typ is Token.TIME:
            if left.kind not in TIME_TOKENS:
                raise _err(left, right, op, f"got {left.kind}, expected time")
            b, e = right.items[0], right.items[1]
            for t in (b, e):
                if t.hour < 0 or t.hour > 23:
                    raise _err(left, right, op, f"bad hour {t.hour}")
                if t.minute < 0 or t.minute > 59:
                    raise _err(left, right, op, f"bad minute {t.minute}")
            return RangeTimeOp(
                keyword=left.kind,
                begin_h=b.hour,
                begin_m=b.minute,
                end_h=e.hour,
                end_m=e.minute,
                negate=negate,
            )
        if right.typ is Token.STRING:
            if left.kind in (Token.DATE, Token.DATETIME):
                b, e = right.items[0], right.items[1]
                if isinstance(b, ast.StringLit) and isinstance(e, ast.StringLit):
                    parse = (
                        parse_date_unix
                        if left.kind is Token.DATE
                        else parse_rfc3339_unix
                    )
                    try:
                        begin_unix = parse(b.value.replace('"', ""))
                        end_unix = parse(e.value.replace('"', ""))
                    except ValueError:
                        raise _err(left, right, op) from None
                    if left.kind is Token.DATETIME and begin_unix == end_unix:
                        raise _err(left, right, op, "operands are equal")
                    if left.kind is Token.DATETIME and begin_unix > end_unix:
                        raise _err(left, right, op, "begin greater than end")
                    return RangeDateTimeOp(
                        keyword=left.kind,
                        begin_unix=begin_unix,
                        end_unix=end_unix,
                        negate=negate,
                    )
    raise _err(left, right, op)


def _e2equal(left: ast.Expr, right: ast.Expr, op: Token) -> Node:
    if isinstance(left, ast.DeviceLit):
        if isinstance(right, ast.ObjectLit):
            if right.kind not in OBJECT_TOKENS:
                raise _err(left, right, op, f"got {right.kind}, expected object token")
            return EqualObjectOp(left=left, right=right, op=op)
        if isinstance(right, ast.DevicesLit):
            return EqualDevicesOp(left=left, right=right, op=op)
    elif isinstance(left, ast.DevicesLit):
        if isinstance(right, ast.DeviceLit):
            return EqualDevicesOp(left=right, right=left, op=op)
    elif isinstance(left, ast.ObjectLit):
        if isinstance(right, ast.DeviceLit):
            return EqualObjectOp(left=right, right=left, op=op)
    elif isinstance(left, ast.TimeLit):
        if isinstance(right, ast.IdentLit):
            if right.kind not in TIME_TOKENS:
                raise _err(left, right, op, f"got {right.kind}, expected time")
            return EqualTimeOp(
                keyword=right.kind, hour=left.hour, minute=left.minute, op=op
            )
    elif isinstance(left, ast.StringLit):
        if isinstance(right, ast.IdentLit):
            if right.kind not in STRING_TOKENS:
                raise _err(left, right, op, f"got {right.kind}, expected string token")
            return EqualStrOp(keyword=right.kind, value=left.value, op=op)
    elif isinstance(left, ast.FloatLit):
        if isinstance(right, ast.IdentLit):
            if right.kind not in NUMBER_TOKENS:
                raise _err(left, right, op, f"got {right.kind}, expected number token")
            return EqualFloatOp(keyword=right.kind, value=left.value, op=op)
    elif isinstance(left, ast.IntLit):
        if isinstance(right, ast.IdentLit):
            if right.kind not in NUMBER_TOKENS:
                raise _err(left, right, op, f"got {right.kind}, expected number token")
            return EqualIntOp(keyword=right.kind, value=left.value, op=op)
    elif isinstance(left, ast.IdentLit):
        if isinstance(right, ast.IntLit):
            if left.kind not in NUMBER_TOKENS:
                raise _err(left, right, op, f"got {left.kind}, expected number token")
            return EqualIntOp(keyword=left.kind, value=right.value, op=op)
        if isinstance(right, ast.FloatLit):
            if left.kind not in NUMBER_TOKENS:
                raise _err(left, right, op, f"got {left.kind}, expected number token")
            return EqualFloatOp(keyword=left.kind, value=right.value, op=op)
        if isinstance(right, ast.StringLit):
            if left.kind not in STRING_TOKENS:
                raise _err(left, right, op, f"got {left.kind}, expected string token")
            return EqualStrOp(keyword=left.kind, value=right.value, op=op)
        if isinstance(right, ast.TimeLit):
            if left.kind not in TIME_TOKENS:
                raise _err(left, right, op, f"got {left.kind}, expected time")
            return EqualTimeOp(
                keyword=left.kind, hour=right.hour, minute=right.minute, op=op
            )
    raise _err(left, right, op)


# --- flatten + props -----------------------------------------------------


def _walk_expr(expr: ast.Expr, expr_func, op_func) -> ast.Expr:
    if expr is None:
        raise CompileError("spinix/runtime: expression is nil")
    if isinstance(expr, ast.ParenExpr):
        return _walk_expr(expr.expr, expr_func, op_func)
    if isinstance(expr, ast.BinaryExpr):
        lhs = _walk_expr(expr.lhs, expr_func, op_func)
        if expr.op in (Token.AND, Token.OR):
            op_func(expr.op)
        rhs = _walk_expr(expr.rhs, expr_func, op_func)
        if not isinstance(lhs, ast.BinaryExpr) and not isinstance(rhs, ast.BinaryExpr):
            expr_func(lhs, rhs, expr.op)
    return expr


def _is_stateful_lit(e: ast.Expr) -> bool:
    return (
        isinstance(e, ast.ObjectLit)
        and e.dur_typ in (Token.DURATION, Token.AFTER)
        and e.dur_val > 0
    )


def _setup_props(sp: SpecProps, prop_list: list[ast.Expr]) -> None:
    for prop in prop_list:
        if isinstance(prop, ast.IDLit):
            if prop.kind is Token.LAYER:
                sp.layer = prop.value
        elif isinstance(prop, ast.PointLit):
            if prop.kind is Token.CENTER:
                sp.center_lat = prop.lat
                sp.center_lon = prop.lon
        elif isinstance(prop, ast.BaseLit):
            if prop.kind is Token.RADIUS and isinstance(prop.expr, ast.DistanceLit):
                v = prop.expr.value
                if prop.expr.unit == ast.DISTANCE_KILOMETERS:
                    v *= 1000.0
                sp.radius_m = v
            elif prop.kind is Token.EXPIRE and isinstance(prop.expr, ast.DurationLit):
                sp.expire_s = prop.expr.value
        elif isinstance(prop, ast.ResetLit):
            sp.reset_interval_s = prop.after
        elif isinstance(prop, ast.TriggerLit):
            sp.repeat = prop.repeat
            sp.delay_s = prop.value
            sp.times = prop.times
            sp.interval_s = prop.interval
    if sp.reset_interval_s == 0:
        sp.reset_interval_s = DEFAULT_RESET_INTERVAL_S


def expr_to_spec(e: ast.Expr, source: str = "") -> CompiledSpec:
    spec = CompiledSpec(source=source)
    if isinstance(e, ast.PropExpr):
        spec.is_stateful = True
        _setup_props(spec.props, e.props)
        e = e.expr

    def expr_func(a: ast.Expr, b: ast.Expr, op: Token) -> None:
        if _is_stateful_lit(a) or _is_stateful_lit(b):
            spec.is_stateful = True
        spec.nodes.append(make_op(a, b, op))

    _walk_expr(e, expr_func, spec.ops.append)

    if not spec.nodes:
        raise CompileError(f"spinix/runtime: invalid specification {source!r}")
    if len(spec.nodes) - 1 != len(spec.ops):
        raise CompileError(f"spinix/runtime: invalid specification {source!r}")
    return spec


def compile_spec(spec_str: str) -> CompiledSpec:
    """DSL string → CompiledSpec (≙ specFromString, runtime.go:88-94)."""
    expr = parse_spec(spec_str)
    return expr_to_spec(expr, source=spec_str)
