"""Vectorized predicate-expression DSL compiled to pyarrow.compute.

The reference's ``custom`` rules run arbitrary SQL on the engine
(``duckdb_engine.py:122-128``: ``SELECT COUNT(*) FROM {table} WHERE
<pred>`` → first cell is the failed count). A distributed Ray engine
cannot ship SQL to a single process, so this module implements the
documented restricted predicate language (SURVEY.md §2.2 R5, §2.7) and
compiles it to Arrow kernels evaluated per batch:

* comparisons ``= == != <> < <= > >=``, arithmetic ``+ - * / %``
* boolean ``AND OR NOT`` with SQL/Kleene three-valued semantics
* ``IS [NOT] NULL``, ``[NOT] IN (...)``, ``[NOT] LIKE``,
  ``[NOT] BETWEEN a AND b``, ``[NOT] REGEXP 'pat'`` (search semantics)
* literals: numbers, ``'strings'`` (with ``''`` escape), ``NULL``,
  ``TRUE/FALSE``, ``DATE '...'``, ``TIMESTAMP '...'``
* functions: ``LENGTH LOWER UPPER ABS TRIM COALESCE``

Counting convention matches SQL ``COUNT(*) ... WHERE``: only rows where
the predicate evaluates to TRUE count (NULL → not counted). A full
``SELECT COUNT(*) FROM {table} WHERE <pred>`` rule expression is also
accepted — the WHERE clause is extracted — so reference configs
(``examples/sql_rules_config.yaml``) keep working.
"""

from __future__ import annotations

import re
from datetime import date, datetime
from typing import Any, Callable, List, Optional

import pyarrow as pa
import pyarrow.compute as pc

Evaluator = Callable[[pa.Table], Any]  # returns pa.Array / pa.ChunkedArray / scalar

_SELECT_WHERE = re.compile(
    r"^\s*select\b.*?\bfrom\s+\S+\s+where\s+(.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_TOKEN_RE = re.compile(
    r"""
    \s*(?:
        (?P<num>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
      | (?P<str>'(?:[^']|'')*')
      | (?P<op><>|!=|>=|<=|==|=|<|>|\+|-|\*|/|%|\(|\)|,)
      | (?P<word>[A-Za-z_][A-Za-z_0-9.]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "and", "or", "not", "is", "null", "in", "like", "between", "regexp",
    "true", "false", "date", "timestamp",
}


class ExprError(ValueError):
    pass


def _tokenize(text: str) -> List[tuple]:
    tokens: List[tuple] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise ExprError(f"Cannot tokenize expression at: {text[pos:pos+20]!r}")
        pos = m.end()
        if m.group("num") is not None:
            s = m.group("num")
            tokens.append(("num", float(s) if ("." in s or "e" in s.lower()) else int(s)))
        elif m.group("str") is not None:
            tokens.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("op") is not None:
            tokens.append(("op", m.group("op")))
        else:
            w = m.group("word")
            if w.lower() in _KEYWORDS:
                tokens.append(("kw", w.lower()))
            else:
                tokens.append(("ident", w))
    tokens.append(("end", None))
    return tokens


def _col(table: pa.Table, name: str):
    if name in table.column_names:
        return table[name]
    lower = {c.lower(): c for c in table.column_names}
    if name.lower() in lower:
        return table[lower[name.lower()]]
    raise ExprError(f"Unknown column: {name}")


_FUNCS = {
    "length": lambda a: pc.utf8_length(a),
    "len": lambda a: pc.utf8_length(a),
    "lower": lambda a: pc.utf8_lower(a),
    "upper": lambda a: pc.utf8_upper(a),
    "abs": lambda a: pc.abs(a),
    "trim": lambda a: pc.utf8_trim_whitespace(a),
}

_CMP = {
    "=": pc.equal, "==": pc.equal,
    "!=": pc.not_equal, "<>": pc.not_equal,
    "<": pc.less, "<=": pc.less_equal,
    ">": pc.greater, ">=": pc.greater_equal,
}

_ARITH = {
    "+": pc.add, "-": pc.subtract, "*": pc.multiply,
    "/": pc.divide,
}


class _Parser:
    """Recursive-descent parser producing evaluator closures."""

    def __init__(self, tokens: List[tuple]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple:
        return self.toks[self.i]

    def next(self) -> tuple:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_op(self, op: str) -> None:
        kind, val = self.next()
        if kind != "op" or val != op:
            raise ExprError(f"Expected '{op}', got {val!r}")

    def at_kw(self, *kws: str) -> bool:
        kind, val = self.peek()
        return kind == "kw" and val in kws

    # ---- grammar ----

    def parse(self) -> Evaluator:
        e = self.parse_or()
        if self.peek()[0] != "end":
            raise ExprError(f"Unexpected trailing token: {self.peek()[1]!r}")
        return e

    def parse_or(self) -> Evaluator:
        left = self.parse_and()
        while self.at_kw("or"):
            self.next()
            right = self.parse_and()
            left = (lambda l, r: lambda t: pc.or_kleene(l(t), r(t)))(left, right)
        return left

    def parse_and(self) -> Evaluator:
        left = self.parse_not()
        while self.at_kw("and"):
            self.next()
            right = self.parse_not()
            left = (lambda l, r: lambda t: pc.and_kleene(l(t), r(t)))(left, right)
        return left

    def parse_not(self) -> Evaluator:
        if self.at_kw("not"):
            self.next()
            inner = self.parse_not()
            return lambda t: pc.invert(inner(t))
        return self.parse_cmp()

    def parse_cmp(self) -> Evaluator:
        left = self.parse_add()
        kind, val = self.peek()

        if kind == "op" and val in _CMP:
            self.next()
            right = self.parse_add()
            fn = _CMP[val]
            return (lambda l, r, f: lambda t: f(l(t), r(t)))(left, right, fn)

        if self.at_kw("is"):
            self.next()
            negate = False
            if self.at_kw("not"):
                self.next()
                negate = True
            k, v = self.next()
            if k != "kw" or v != "null":
                raise ExprError("Expected NULL after IS")
            if negate:
                return lambda t: pc.is_valid(left(t))
            return lambda t: pc.is_null(left(t))

        negate = False
        if self.at_kw("not"):
            self.next()
            negate = True

        if self.at_kw("in"):
            self.next()
            self.expect_op("(")
            values: List[Any] = []
            while True:
                k, v = self.next()
                if k not in ("num", "str"):
                    raise ExprError("IN list supports only literals")
                values.append(v)
                k2, v2 = self.next()
                if k2 == "op" and v2 == ")":
                    break
                if not (k2 == "op" and v2 == ","):
                    raise ExprError("Expected ',' or ')' in IN list")

            def _in(t, left=left, values=values):
                arr = left(t)
                mask = pc.is_in(arr, value_set=pa.array(values))
                # SQL IN: NULL input → NULL, never TRUE/FALSE
                return pc.if_else(pc.is_valid(arr), mask, pa.scalar(None, pa.bool_()))

            base: Evaluator = _in
        elif self.at_kw("like"):
            self.next()
            k, v = self.next()
            if k != "str":
                raise ExprError("LIKE requires a string literal")
            base = (lambda l, pat: lambda t: pc.match_like(l(t), pat))(left, v)
        elif self.at_kw("regexp"):
            self.next()
            k, v = self.next()
            if k != "str":
                raise ExprError("REGEXP requires a string literal")
            base = (lambda l, pat: lambda t: pc.match_substring_regex(l(t), pat))(left, v)
        elif self.at_kw("between"):
            self.next()
            lo = self.parse_add()
            k, v = self.next()
            if not (k == "kw" and v == "and"):
                raise ExprError("Expected AND in BETWEEN")
            hi = self.parse_add()

            def _between(t, left=left, lo=lo, hi=hi):
                arr = left(t)
                return pc.and_kleene(
                    pc.greater_equal(arr, lo(t)), pc.less_equal(arr, hi(t))
                )

            base = _between
        else:
            if negate:
                raise ExprError("Expected IN/LIKE/BETWEEN/REGEXP after NOT")
            return left

        if negate:
            return (lambda b: lambda t: pc.invert(b(t)))(base)
        return base

    def parse_add(self) -> Evaluator:
        left = self.parse_mul()
        while True:
            kind, val = self.peek()
            if kind == "op" and val in ("+", "-"):
                self.next()
                right = self.parse_mul()
                fn = _ARITH[val]
                left = (lambda l, r, f: lambda t: f(l(t), r(t)))(left, right, fn)
            else:
                return left

    def parse_mul(self) -> Evaluator:
        left = self.parse_unary()
        while True:
            kind, val = self.peek()
            if kind == "op" and val in ("*", "/", "%"):
                self.next()
                right = self.parse_unary()
                if val == "%":
                    left = (lambda l, r: lambda t: pc.subtract(
                        l(t), pc.multiply(pc.floor(pc.divide(l(t), r(t))), r(t))
                    ))(left, right)
                else:
                    fn = _ARITH[val]
                    left = (lambda l, r, f: lambda t: f(l(t), r(t)))(left, right, fn)
            else:
                return left

    def parse_unary(self) -> Evaluator:
        kind, val = self.peek()
        if kind == "op" and val == "-":
            self.next()
            inner = self.parse_unary()
            return lambda t: pc.negate(inner(t))
        return self.parse_primary()

    def parse_primary(self) -> Evaluator:
        kind, val = self.next()
        if kind == "num" or kind == "str":
            return (lambda v: lambda t: pa.scalar(v))(val)
        if kind == "kw":
            if val == "null":
                return lambda t: pa.scalar(None)
            if val == "true":
                return lambda t: pa.scalar(True)
            if val == "false":
                return lambda t: pa.scalar(False)
            if val in ("date", "timestamp"):
                k, lit = self.next()
                if k != "str":
                    raise ExprError(f"{val.upper()} requires a string literal")
                if val == "date":
                    d = date.fromisoformat(lit)
                    # compare as timestamp so timestamp columns match directly
                    ts = datetime(d.year, d.month, d.day)
                else:
                    ts = datetime.fromisoformat(lit)
                return (lambda v: lambda t: pa.scalar(v))(ts)
            raise ExprError(f"Unexpected keyword: {val}")
        if kind == "op" and val == "(":
            inner = self.parse_or()
            self.expect_op(")")
            return inner
        if kind == "ident":
            nk, nv = self.peek()
            if nk == "op" and nv == "(":
                fname = val.lower()
                self.next()
                if fname == "coalesce":
                    args = [self.parse_or()]
                    while self.peek() == ("op", ","):
                        self.next()
                        args.append(self.parse_or())
                    self.expect_op(")")

                    def _coalesce(t, args=args):
                        out = args[0](t)
                        for a in args[1:]:
                            out = pc.coalesce(out, a(t))
                        return out

                    return _coalesce
                if fname not in _FUNCS:
                    raise ExprError(f"Unknown function: {val}")
                arg = self.parse_or()
                self.expect_op(")")
                return (lambda f, a: lambda t: f(a(t)))(_FUNCS[fname], arg)
            return (lambda name: lambda t: _col(t, name))(val)
        raise ExprError(f"Unexpected token: {val!r}")


def extract_predicate(expression: str) -> str:
    """Accept either a bare predicate or a full SELECT COUNT(*) ... WHERE."""
    m = _SELECT_WHERE.match(expression)
    if m:
        return m.group(1)
    return expression


def referenced_columns(expression: str) -> "set[str]":
    """Column names referenced by a predicate (for read-time pruning).

    Identifiers followed by ``(`` are function calls, not columns.
    """
    toks = _tokenize(extract_predicate(expression))
    cols: set[str] = set()
    for i, (kind, val) in enumerate(toks):
        if kind == "ident" and not (
            i + 1 < len(toks) and toks[i + 1] == ("op", "(")
        ):
            cols.add(val)
    return cols


def compile_predicate(expression: str) -> Evaluator:
    """Compile a predicate to ``fn(pa.Table) -> BooleanArray`` (Kleene nulls)."""
    pred = extract_predicate(expression)
    return _Parser(_tokenize(pred)).parse()


def predicate_true_mask(evaluator: Evaluator, table: pa.Table) -> pa.ChunkedArray:
    """Boolean mask where the predicate is strictly TRUE (NULL → False).

    Matches SQL ``COUNT(*) WHERE pred`` / ``filter`` semantics.
    """
    raw = evaluator(table)
    if isinstance(raw, (pa.Scalar,)):
        raw = pa.array([raw.as_py()] * table.num_rows, type=pa.bool_())
    filled = pc.fill_null(pc.cast(raw, pa.bool_()), False)
    return filled
