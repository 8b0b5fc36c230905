"""Token vocabulary of the rule DSL.

Same surface as the reference DSL (token tables at
/root/reference/token.go:121-215; keyword groups token.go:262-313):
12 spatial/set/range verbs, 6 comparators, device attribute idents,
geometry object keywords, and props keywords. Re-specified here as
Python enums — the token *names and groupings* are the public API of
the DSL, the implementation is new.
"""

from __future__ import annotations

from enum import Enum, auto


class Token(Enum):
    ILLEGAL = auto()
    EOF = auto()

    IDENT = auto()
    INT = auto()
    FLOAT = auto()
    STRING = auto()
    DEVICE = auto()
    RADIUS = auto()
    BBOX = auto()
    TIME = auto()
    DURATION = auto()
    AFTER = auto()
    FUELLEVEL = auto()
    PRESSURE = auto()
    LUMINOSITY = auto()
    HUMIDITY = auto()
    TEMPERATURE = auto()
    BATTERY_CHARGE = auto()
    STATUS = auto()
    SPEED = auto()
    MODEL = auto()
    BRAND = auto()
    OWNER = auto()
    LAYER = auto()
    IMEI = auto()
    VAR_IDENT = auto()  # @
    YEAR = auto()
    MONTH = auto()
    WEEK = auto()
    DAY = auto()
    HOUR = auto()
    DATE = auto()
    DATETIME = auto()
    TRIGGER = auto()
    CENTER = auto()
    EXPIRE = auto()
    RESET = auto()

    AND = auto()
    OR = auto()

    IN = auto()
    NIN = auto()
    RANGE = auto()
    NRANGE = auto()
    NEAR = auto()
    NNEAR = auto()
    INTERSECTS = auto()
    NINTERSECTS = auto()

    SUB = auto()
    EQ = auto()
    LT = auto()
    GT = auto()
    NE = auto()
    LTE = auto()
    GTE = auto()

    LBRACK = auto()
    LBRACE = auto()
    COMMA = auto()
    PERIOD = auto()
    RBRACK = auto()
    RBRACE = auto()
    COLON = auto()

    DEVICES = auto()
    OBJECTS = auto()
    POLY = auto()
    MULTI_POLY = auto()
    LINE = auto()
    MULTI_LINE = auto()
    POINT = auto()
    MULTI_POINT = auto()
    RECT = auto()
    CIRCLE = auto()
    COLLECTION = auto()
    FUT_COLLECTION = auto()

    RPAREN = auto()
    LPAREN = auto()

    def __str__(self) -> str:  # display names match the reference's Token.String()
        return TOKEN_STRINGS.get(self, self.name)


TOKEN_STRINGS: dict[Token, str] = {
    Token.ILLEGAL: "ILLEGAL",
    Token.EOF: "EOF",
    Token.IDENT: "IDENT",
    Token.INT: "INT",
    Token.FLOAT: "FLOAT",
    Token.STRING: "STRING",
    Token.AND: "AND",
    Token.OR: "OR",
    Token.FUELLEVEL: "fuelLevel",
    Token.PRESSURE: "pressure",
    Token.LUMINOSITY: "luminosity",
    Token.HUMIDITY: "humidity",
    Token.TEMPERATURE: "temperature",
    Token.BATTERY_CHARGE: "battery",
    Token.STATUS: "status",
    Token.SPEED: "speed",
    Token.MODEL: "model",
    Token.BRAND: "brand",
    Token.OWNER: "owner",
    Token.IMEI: "imei",
    Token.LAYER: "group",
    Token.INTERSECTS: "INTERSECTS",
    Token.NINTERSECTS: "NINTERSECTS",
    Token.NEAR: "NEAR",
    Token.NNEAR: "NNEAR",
    Token.RANGE: "RANGE",
    Token.NRANGE: "NRANGE",
    Token.IN: "IN",
    Token.NIN: "NIN",
    Token.EQ: "eq",
    Token.LT: "lt",
    Token.GT: "gt",
    Token.NE: "ne",
    Token.LTE: "lte",
    Token.GTE: "gte",
    Token.SUB: "-",
    Token.LPAREN: "(",
    Token.LBRACK: "[",
    Token.LBRACE: "{",
    Token.COMMA: ",",
    Token.PERIOD: ".",
    Token.RPAREN: ")",
    Token.RBRACK: "]",
    Token.RBRACE: "}",
    Token.COLON: ":",
    Token.TRIGGER: "trigger",
    Token.RESET: "reset",
    Token.CENTER: "center",
    Token.EXPIRE: "expire",
    Token.RADIUS: "radius",
    Token.DEVICE: "device",
    Token.VAR_IDENT: "@",
    Token.DEVICES: "devices",
    Token.OBJECTS: "objects",
    Token.POLY: "polygon",
    Token.MULTI_POLY: "multiPolygon",
    Token.LINE: "line",
    Token.MULTI_LINE: "multiLine",
    Token.POINT: "point",
    Token.MULTI_POINT: "multiPoint",
    Token.RECT: "rect",
    Token.CIRCLE: "circle",
    Token.COLLECTION: "collection",
    Token.FUT_COLLECTION: "featureCollection",
    Token.YEAR: "year",
    Token.MONTH: "month",
    Token.WEEK: "week",
    Token.DAY: "day",
    Token.HOUR: "hour",
    Token.DATE: "date",
    Token.DATETIME: "datetime",
    Token.TIME: "time",
}

# Geometry-object keywords — the only tokens resolved case-SENSITIVELY
# by the scanner (the reference registers exactly these in its keyword
# map: token.go:218-225). Everything else resolves lowercase.
GEO_KEYWORDS: dict[str, Token] = {
    "devices": Token.DEVICES,
    "objects": Token.OBJECTS,
    "polygon": Token.POLY,
    "multiPolygon": Token.MULTI_POLY,
    "line": Token.LINE,
    "multiLine": Token.MULTI_LINE,
    "point": Token.POINT,
    "multiPoint": Token.MULTI_POINT,
    "rect": Token.RECT,
    "circle": Token.CIRCLE,
    "collection": Token.COLLECTION,
    "featureCollection": Token.FUT_COLLECTION,
}

# Lowercased ident → token fallback (scanner.go:104-201).
IDENT_KEYWORDS: dict[str, Token] = {
    "layer": Token.LAYER,
    "gte": Token.GTE,
    "lte": Token.LTE,
    "ne": Token.NE,
    "gt": Token.GT,
    "lt": Token.LT,
    "eq": Token.EQ,
    "trigger": Token.TRIGGER,
    "center": Token.CENTER,
    "expire": Token.EXPIRE,
    "reset": Token.RESET,
    "date": Token.DATE,
    "datetime": Token.DATETIME,
    "year": Token.YEAR,
    "month": Token.MONTH,
    "week": Token.WEEK,
    "day": Token.DAY,
    "hour": Token.HOUR,
    "time": Token.TIME,
    "radius": Token.RADIUS,
    "bbox": Token.BBOX,
    "duration": Token.DURATION,
    "after": Token.AFTER,
    "fuellevel": Token.FUELLEVEL,
    "pressure": Token.PRESSURE,
    "luminosity": Token.LUMINOSITY,
    "humidity": Token.HUMIDITY,
    "temperature": Token.TEMPERATURE,
    "battery": Token.BATTERY_CHARGE,
    "status": Token.STATUS,
    "speed": Token.SPEED,
    "model": Token.MODEL,
    "brand": Token.BRAND,
    "owner": Token.OWNER,
    "imei": Token.IMEI,
    "device": Token.DEVICE,
    "range": Token.RANGE,
    "nrange": Token.NRANGE,
    "in": Token.IN,
    "nin": Token.NIN,
    "intersects": Token.INTERSECTS,
    "nintersects": Token.NINTERSECTS,
    "near": Token.NEAR,
    "nearby": Token.NEAR,
    "nnear": Token.NNEAR,
    "and": Token.AND,
    "or": Token.OR,
}

# Props keywords recognized after ':' (scanner.go:76-93).
COLON_KEYWORDS: dict[str, Token] = {
    "trigger": Token.TRIGGER,
    "expire": Token.EXPIRE,
    "center": Token.CENTER,
    "reset": Token.RESET,
    "radius": Token.RADIUS,
    "bbox": Token.BBOX,
    "layer": Token.LAYER,
}

NUMBER_TOKENS = frozenset(
    {
        Token.FUELLEVEL,
        Token.PRESSURE,
        Token.LUMINOSITY,
        Token.HUMIDITY,
        Token.TEMPERATURE,
        Token.BATTERY_CHARGE,
        Token.STATUS,
        Token.SPEED,
        Token.YEAR,
        Token.MONTH,
        Token.WEEK,
        Token.DAY,
        Token.HOUR,
    }
)

STRING_TOKENS = frozenset(
    {
        Token.MODEL,
        Token.BRAND,
        Token.OWNER,
        Token.IMEI,
        Token.DATE,
        Token.DATETIME,
        Token.MONTH,
        Token.DAY,
    }
)

OBJECT_TOKENS = frozenset(
    {
        Token.DEVICES,
        Token.OBJECTS,
        Token.POLY,
        Token.MULTI_POLY,
        Token.LINE,
        Token.MULTI_LINE,
        Token.POINT,
        Token.MULTI_POINT,
        Token.RECT,
        Token.CIRCLE,
        Token.COLLECTION,
        Token.FUT_COLLECTION,
    }
)

TIME_TOKENS = frozenset({Token.TIME})

_OPERATOR_TOKENS = frozenset(
    {
        Token.AND,
        Token.OR,
        Token.IN,
        Token.NIN,
        Token.RANGE,
        Token.NRANGE,
        Token.NEAR,
        Token.NNEAR,
        Token.INTERSECTS,
        Token.NINTERSECTS,
        Token.SUB,
        Token.EQ,
        Token.LT,
        Token.GT,
        Token.NE,
        Token.LTE,
        Token.GTE,
        Token.LBRACK,
        Token.LBRACE,
        Token.COMMA,
        Token.PERIOD,
        Token.RBRACK,
        Token.RBRACE,
        Token.COLON,
    }
)

_COMPARISON_TOKENS = frozenset(
    {
        Token.IN,
        Token.NIN,
        Token.RANGE,
        Token.NRANGE,
        Token.NEAR,
        Token.NNEAR,
        Token.INTERSECTS,
        Token.NINTERSECTS,
        Token.SUB,
        Token.EQ,
        Token.LT,
        Token.GT,
        Token.NE,
        Token.LTE,
        Token.GTE,
    }
)


def is_operator(tok: Token) -> bool:
    return tok in _OPERATOR_TOKENS


def is_keyword(tok: Token) -> bool:
    return tok in OBJECT_TOKENS


def precedence(tok: Token) -> int:
    """OR=1, AND=2, every comparison/spatial verb=3 (token.go:233-244)."""
    if tok is Token.OR:
        return 1
    if tok is Token.AND:
        return 2
    if tok in _COMPARISON_TOKENS:
        return 3
    return 0
