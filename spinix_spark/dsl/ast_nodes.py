"""AST node types for the rule DSL (shape mirrors /root/reference/ast.go)."""

from __future__ import annotations

from dataclasses import dataclass, field

from spinix_spark.dsl.tokens import Token

# distance units
DISTANCE_METERS = "m"
DISTANCE_KILOMETERS = "km"

# trigger repeat modes (ast.go:39-44)
REPEAT_NONE = 0
REPEAT_ONCE = 1
REPEAT_EVERY = 2
REPEAT_TIMES = 3


class Expr:
    pass


@dataclass
class BinaryExpr(Expr):
    lhs: Expr
    rhs: Expr
    op: Token


@dataclass
class ParenExpr(Expr):
    expr: Expr


@dataclass
class PropExpr(Expr):
    expr: Expr
    props: list[Expr] = field(default_factory=list)


@dataclass
class IdentLit(Expr):
    name: str
    kind: Token
    pos: int = 0


@dataclass
class IntLit(Expr):
    value: int
    pos: int = 0


@dataclass
class FloatLit(Expr):
    value: float
    pos: int = 0


@dataclass
class StringLit(Expr):
    value: str
    pos: int = 0


@dataclass
class TimeLit(Expr):
    hour: int
    minute: int
    pos: int = 0


@dataclass
class ListLit(Expr):
    items: list[Expr] = field(default_factory=list)
    kind: Token = Token.ILLEGAL  # RANGE for [a .. b], ILLEGAL for [a, b]
    typ: Token | None = None  # INT | FLOAT | STRING | TIME
    pos: int = 0


@dataclass
class DeviceLit(Expr):
    """``device`` optionally buffered: ``device :radius 1km`` (12-gon)
    or ``device :bbox 1km`` (4-gon rect)."""

    kind: Token = Token.DEVICE  # DEVICE | RADIUS | BBOX
    unit: str = DISTANCE_METERS
    value: float = 0.0
    pos: int = 0

    def meters(self) -> float:
        if self.kind in (Token.RADIUS, Token.BBOX):
            return self.value * 1000.0 if self.unit == DISTANCE_KILOMETERS else self.value
        return 0.0

    def steps(self) -> int:
        if self.kind is Token.RADIUS:
            return 12
        if self.kind is Token.BBOX:
            return 4
        return 0


@dataclass
class DevicesLit(Expr):
    """``devices(ref, ...)`` / ``devices(@)`` with optional buffer."""

    refs: list[str] = field(default_factory=list)
    all: bool = False
    kind: Token = Token.ILLEGAL  # RADIUS | BBOX | ILLEGAL (point)
    unit: str = DISTANCE_METERS
    value: float = 0.0
    pos: int = 0

    def meters(self) -> float:
        if self.kind in (Token.RADIUS, Token.BBOX):
            return self.value * 1000.0 if self.unit == DISTANCE_KILOMETERS else self.value
        return 0.0

    def steps(self) -> int:
        if self.kind is Token.RADIUS:
            return 12
        if self.kind is Token.BBOX:
            return 4
        return 0


@dataclass
class ObjectLit(Expr):
    """``polygon(id, ...)``, ``circle(@)``, ... with optional
    ``:time duration|after <dur>`` suffix."""

    kind: Token = Token.OBJECTS
    refs: list[str] = field(default_factory=list)
    all: bool = False
    dur_typ: Token | None = None  # DURATION | AFTER
    dur_val: float = 0.0  # seconds
    pos: int = 0


# --- props ---


@dataclass
class IDLit(Expr):
    kind: Token = Token.LAYER
    value: str = ""
    pos: int = 0


@dataclass
class PointLit(Expr):
    lat: float = 0.0
    lon: float = 0.0
    kind: Token = Token.CENTER
    pos: int = 0


@dataclass
class DistanceLit(Expr):
    value: float = 0.0
    unit: str = DISTANCE_METERS
    pos: int = 0


@dataclass
class DurationLit(Expr):
    value: float = 0.0  # seconds
    kind: Token = Token.DURATION
    pos: int = 0


@dataclass
class BaseLit(Expr):
    kind: Token
    expr: Expr
    pos: int = 0


@dataclass
class ResetLit(Expr):
    after: float = 0.0  # seconds
    kind: Token = Token.RESET
    pos: int = 0


@dataclass
class TriggerLit(Expr):
    repeat: int = REPEAT_NONE
    value: float = 0.0  # seconds (every)
    times: int = 0
    interval: float = 0.0  # seconds
    pos: int = 0
