"""DSL scanner.

Tokenization rules mirror the reference's use of Go ``text/scanner``
with ``ScanIdents | ScanFloats | ScanStrings`` plus its own keyword
resolution (/root/reference/scanner.go):

- idents: ``[A-Za-z_][A-Za-z0-9_]*`` (so ``1km`` scans as INT 1 then
  ident ``km``; ``b0km`` is one unknown ident → ILLEGAL)
- ints: decimal and ``0x`` hex (hex survives scanning; the parser's
  ``Atoi`` then rejects it, matching the reference)
- floats: digits '.' digits (and exponent forms)
- strings: double-quoted, the raw literal INCLUDING quotes is returned
  (callers trim, as the reference does)
- ``:`` lookahead: ``:trigger :expire :center :reset :radius :bbox
  :layer`` collapse to their prop token; any other following token is
  pushed back and bare COLON is returned
- unknown idents → ILLEGAL with the literal preserved (list literals
  legally absorb ILLEGAL idents as strings, parser.go:430-437)
"""

from __future__ import annotations

from spinix_spark.dsl.tokens import COLON_KEYWORDS, GEO_KEYWORDS, IDENT_KEYWORDS, Token

_SINGLE_CHARS = {
    ".": Token.PERIOD,
    "@": Token.VAR_IDENT,
    "(": Token.LPAREN,
    ")": Token.RPAREN,
    ",": Token.COMMA,
    "[": Token.LBRACK,
    "-": Token.SUB,
    "]": Token.RBRACK,
    "{": Token.LBRACE,
    "}": Token.RBRACE,
}


def _is_ident_start(ch: str) -> bool:
    return ch.isalpha() or ch == "_"


def _is_ident_part(ch: str) -> bool:
    return ch.isalnum() or ch == "_"


class Scanner:
    def __init__(self, src: str) -> None:
        self._src = src
        self._i = 0
        self._pushed: tuple[Token, str] | None = None
        self._last: tuple[Token, str] = (Token.EOF, "")

    @property
    def offset(self) -> int:
        return self._i

    def reset(self) -> None:
        """Push the last-returned token back (one-token buffer, like
        the reference Scanner.Reset)."""
        self._pushed = self._last

    def next(self) -> tuple[Token, str]:
        if self._pushed is not None:
            tok = self._pushed
            self._pushed = None
            self._last = tok
            return tok
        tok = self._scan_token()
        self._last = tok
        return tok

    def next_tok(self) -> Token:
        return self.next()[0]

    def next_lit(self) -> str:
        return self.next()[1]

    # -- raw scanning ---------------------------------------------------

    def _skip_ws(self) -> None:
        src, n = self._src, len(self._src)
        while self._i < n and src[self._i] in " \t\r\n":
            self._i += 1

    def _raw_scan(self) -> tuple[str, str]:
        """Returns (kind, literal) with kind in
        {'eof','ident','int','float','string','char'}."""
        self._skip_ws()
        src, n = self._src, len(self._src)
        if self._i >= n:
            return "eof", ""
        ch = src[self._i]
        if _is_ident_start(ch):
            j = self._i
            while j < n and _is_ident_part(src[j]):
                j += 1
            lit = src[self._i : j]
            self._i = j
            return "ident", lit
        if ch.isdigit():
            j = self._i
            if src.startswith("0x", j) or src.startswith("0X", j):
                j += 2
                while j < n and src[j] in "0123456789abcdefABCDEF":
                    j += 1
                lit = src[self._i : j]
                self._i = j
                return "int", lit
            while j < n and src[j].isdigit():
                j += 1
            is_float = False
            if j < n and src[j] == "." and j + 1 < n and src[j + 1].isdigit():
                is_float = True
                j += 1
                while j < n and src[j].isdigit():
                    j += 1
            if j < n and src[j] in "eE":
                k = j + 1
                if k < n and src[k] in "+-":
                    k += 1
                if k < n and src[k].isdigit():
                    is_float = True
                    j = k
                    while j < n and src[j].isdigit():
                        j += 1
            lit = src[self._i : j]
            self._i = j
            return ("float" if is_float else "int"), lit
        if ch == '"':
            j = self._i + 1
            while j < n and src[j] != '"':
                if src[j] == "\\" and j + 1 < n:
                    j += 1
                j += 1
            j = min(j + 1, n)
            lit = src[self._i : j]
            self._i = j
            return "string", lit
        self._i += 1
        return "char", ch

    def _scan_token(self) -> tuple[Token, str]:
        kind, lit = self._raw_scan()
        if kind == "eof":
            return Token.EOF, lit
        if kind == "char":
            if lit == ":":
                # lookahead for prop keywords
                kind2, lit2 = self._raw_scan()
                tok = COLON_KEYWORDS.get(lit2.lower()) if kind2 == "ident" else None
                if tok is not None:
                    return tok, lit2
                # push the lookahead token back, return bare colon
                self._pushed = self._classify(kind2, lit2)
                return Token.COLON, lit
            tok = _SINGLE_CHARS.get(lit)
            return (tok, lit) if tok is not None else (Token.ILLEGAL, lit)
        return self._classify(kind, lit)

    @staticmethod
    def _classify(kind: str, lit: str) -> tuple[Token, str]:
        if kind == "eof":
            return Token.EOF, lit
        if kind == "int":
            return Token.INT, lit
        if kind == "float":
            return Token.FLOAT, lit
        if kind == "string":
            return Token.STRING, lit
        if kind == "char":
            tok = _SINGLE_CHARS.get(lit)
            if tok is not None:
                return tok, lit
            if lit == ":":
                return Token.COLON, lit
            return Token.ILLEGAL, lit
        # ident
        tok = GEO_KEYWORDS.get(lit)
        if tok is not None:
            return tok, lit
        tok = IDENT_KEYWORDS.get(lit.lower())
        if tok is not None:
            return tok, lit
        return Token.ILLEGAL, lit
