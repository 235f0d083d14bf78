"""OTTL-subset front-end: tokenizer + recursive-descent parser → AST.

Mirrors the reference grammar (`pkg/ottl/grammar.go`):
  statement  = editor '(' args ')' [ 'where' booleanExpression ]
  boolean    = term { 'or' term } ; term = factor { 'and' factor }
  factor     = 'not' factor | '(' boolean ')' | comparison
  comparison = value [ ('=='|'!='|'<'|'<='|'>'|'>=') value ]
  value      = math over literals / paths / converter calls / lists
(grammar.go:14-19 statements, 43-132 boolean, 231-409 values; lexer 431-452).

The reference compiles this AST to per-record Go closures interpreted row by
row; we compile it once to pyspark Columns (compiler.py) and let Catalyst
do everything else — the per-record interpreter disappears.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


# ---------------------------------------------------------------------- AST

@dataclass
class Literal:
    value: object  # str | int | float | bool | None | bytes


@dataclass
class ListExpr:
    items: list


@dataclass
class Path:
    segments: list  # list of str (field) or ("key", str|int) map/list index


@dataclass
class Enum:
    """Uppercase enum symbol (grammar.go:238 `@Uppercase (?! Lowercase)`),
    resolved per context at compile time — e.g. SEVERITY_NUMBER_WARN → 13
    via the log context's parseEnum (contexts/ottllog/log.go:111-136)."""

    symbol: str


@dataclass
class Call:
    name: str
    args: list


@dataclass
class BinOp:
    op: str  # + - * /
    left: object
    right: object


@dataclass
class Comparison:
    op: str  # == != < <= > >=
    left: object
    right: object


@dataclass
class Not:
    expr: object


@dataclass
class And:
    terms: list


@dataclass
class Or:
    terms: list


@dataclass
class Statement:
    editor: Call
    condition: object | None  # boolean AST or None


# ------------------------------------------------------------------ lexer

TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+)
  | (?P<STRING>"(?:[^"\\]|\\.)*")
  | (?P<BYTES>0x[0-9a-fA-F]+)
  | (?P<FLOAT>[-+]?\d+\.\d+)
  | (?P<INT>[-+]?\d+)
  | (?P<IDENT>[a-zA-Z_][a-zA-Z0-9_]*)
  | (?P<OP>==|!=|<=|>=|<|>|\(|\)|\[|\]|,|\.|\+|-|\*|/|=)
    """,
    re.VERBOSE,
)

KEYWORDS = {"where", "and", "or", "not", "true", "false", "nil"}

_ENUM_RE = re.compile(r"[A-Z][A-Z0-9_]*")


def tokenize(text: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(text):
        m = TOKEN_RE.match(text, pos)
        if not m:
            raise SyntaxError(f"OTTL lex error at {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        val = m.group()
        if kind == "IDENT" and val in KEYWORDS:
            kind = val.upper()
        out.append((kind, val))
    out.append(("EOF", ""))
    return out


# ------------------------------------------------------------------ parser

class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, val: str | None = None) -> str:
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise SyntaxError(f"expected {kind} {val or ''}, got {k} {v!r}")
        return v

    # statement = IDENT '(' args ')' [where bool]
    def statement(self) -> Statement:
        call = self.call()
        cond = None
        if self.peek()[0] == "WHERE":
            self.next()
            cond = self.boolean()
        self.expect("EOF")
        return Statement(call, cond)

    def call(self) -> Call:
        name = self.expect("IDENT")
        self.expect("OP", "(")
        args = []
        if not (self.peek() == ("OP", ")")):
            args.append(self.value())
            while self.peek() == ("OP", ","):
                self.next()
                args.append(self.value())
        self.expect("OP", ")")
        return Call(name, args)

    # boolean = term {or term}
    def boolean(self):
        terms = [self.bool_term()]
        while self.peek()[0] == "OR":
            self.next()
            terms.append(self.bool_term())
        return terms[0] if len(terms) == 1 else Or(terms)

    def bool_term(self):
        factors = [self.bool_factor()]
        while self.peek()[0] == "AND":
            self.next()
            factors.append(self.bool_factor())
        return factors[0] if len(factors) == 1 else And(factors)

    def bool_factor(self):
        k, v = self.peek()
        if k == "NOT":
            self.next()
            return Not(self.bool_factor())
        if (k, v) == ("OP", "("):
            # could be parenthesised boolean or a value expr; try boolean
            save = self.i
            self.next()
            try:
                inner = self.boolean()
                self.expect("OP", ")")
            except SyntaxError:
                self.i = save
                return self.comparison()
            # allow a trailing comparison operator after parens-value
            if self.peek()[0] == "OP" and self.peek()[1] in ("==", "!=", "<", "<=", ">", ">="):
                op = self.next()[1]
                right = self.value()
                return Comparison(op, inner, right)
            return inner
        return self.comparison()

    def comparison(self):
        left = self.value()
        k, v = self.peek()
        if k == "OP" and v in ("==", "!=", "<", "<=", ">", ">="):
            self.next()
            right = self.value()
            return Comparison(v, left, right)
        return left  # bare boolean-valued expression (e.g. IsMatch(...))

    # value = addexpr
    def value(self):
        return self.add_expr()

    def add_expr(self):
        left = self.mul_expr()
        while self.peek()[0] == "OP" and self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            left = BinOp(op, left, self.mul_expr())
        return left

    def mul_expr(self):
        left = self.atom()
        while self.peek()[0] == "OP" and self.peek()[1] in ("*", "/"):
            op = self.next()[1]
            left = BinOp(op, left, self.atom())
        return left

    def atom(self):
        k, v = self.peek()
        if k == "STRING":
            self.next()
            return Literal(_unquote(v))
        if k == "BYTES":
            self.next()
            return Literal(bytes.fromhex(v[2:]))
        if k == "FLOAT":
            self.next()
            return Literal(float(v))
        if k == "INT":
            self.next()
            return Literal(int(v))
        if k == "TRUE":
            self.next()
            return Literal(True)
        if k == "FALSE":
            self.next()
            return Literal(False)
        if k == "NIL":
            self.next()
            return Literal(None)
        if (k, v) == ("OP", "["):
            self.next()
            items = []
            if self.peek() != ("OP", "]"):
                items.append(self.value())
                while self.peek() == ("OP", ","):
                    self.next()
                    items.append(self.value())
            self.expect("OP", "]")
            return ListExpr(items)
        if (k, v) == ("OP", "("):
            self.next()
            inner = self.value()
            self.expect("OP", ")")
            return inner
        if k == "IDENT":
            # call or path
            if self.toks[self.i + 1] == ("OP", "("):
                return self.call()
            # grammar.go:238: an all-uppercase identifier (no lowercase
            # anywhere — converter names like ParseJSON keep lowercase) is
            # an enum symbol, not a path
            if _ENUM_RE.fullmatch(v):
                self.next()
                return Enum(v)
            return self.path()
        raise SyntaxError(f"unexpected token {k} {v!r}")

    def path(self) -> Path:
        segs: list = [self.expect("IDENT")]
        while True:
            k, v = self.peek()
            if (k, v) == ("OP", "."):
                self.next()
                segs.append(self.expect("IDENT"))
            elif (k, v) == ("OP", "["):
                self.next()
                kk, vv = self.next()
                if kk == "STRING":
                    segs.append(("key", _unquote(vv)))
                elif kk == "INT":
                    segs.append(("key", int(vv)))
                else:
                    raise SyntaxError(f"bad index {vv!r}")
                self.expect("OP", "]")
            else:
                break
        return Path(segs)


def _unquote(s: str) -> str:
    body = s[1:-1]
    return body.replace('\\"', '"').replace("\\\\", "\\")


def parse_statement(text: str) -> Statement:
    return _Parser(tokenize(text)).statement()


def parse_condition(text: str):
    p = _Parser(tokenize(text))
    cond = p.boolean()
    p.expect("EOF")
    return cond
