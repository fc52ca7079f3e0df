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
  ``TRUE/FALSE``, ``DATE '...'``, ``TIMESTAMP '...'``,
  ``INTERVAL n YEAR|MONTH|DAY|HOUR|MINUTE|SECOND``
* functions: ``LENGTH LOWER UPPER ABS TRIM COALESCE``, and date helpers
  ``CURRENT_DATE() CURRENT_TIMESTAMP() NOW() DATE_SUB(x, INTERVAL ...)
  DATE_ADD(x, INTERVAL ...)`` (also infix ``x - INTERVAL 5 YEAR``), so
  the reference's own example configs compile
  (``/root/reference/examples/sample_config.yaml:96-99``).

SQL arithmetic semantics: ``/`` is float division even on integer
operands (DuckDB ``7/2 = 3.5``) and ``%`` is truncated (sign of the
dividend) modulo — both match the DuckDB oracle, not C/numpy defaults.

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
    "true", "false", "date", "timestamp", "interval",
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

def _arrow_type(x):
    t = getattr(x, "type", None)
    return t


def _sql_divide(l, r):
    # SQL '/' is float division even for integer operands (DuckDB 7/2=3.5);
    # pc.divide would truncate, silently skewing custom-rule counts.
    lt, rt = _arrow_type(l), _arrow_type(r)
    if lt is not None and rt is not None and pa.types.is_integer(lt) and pa.types.is_integer(rt):
        l = pc.cast(l, pa.float64())
    return pc.divide(l, r)


def _sql_mod(l, r):
    # SQL '%' is truncated (sign-of-dividend) modulo: -7 % 3 = -1, not 2.
    q = pc.divide(l, r)  # integer divide truncates toward zero (C semantics)
    qt = _arrow_type(q)
    if qt is not None and pa.types.is_floating(qt):
        q = pc.trunc(q)
    return pc.subtract(l, pc.multiply(q, r))


_ARITH = {
    "+": pc.add, "-": pc.subtract, "*": pc.multiply,
    "/": _sql_divide,
}

_INTERVAL_UNITS = {"year", "month", "day", "hour", "minute", "second"}


class _Interval:
    """Calendar interval literal (``INTERVAL 5 YEAR``)."""

    __slots__ = ("months", "seconds")

    def __init__(self, months: int = 0, seconds: float = 0.0):
        self.months, self.seconds = months, seconds

    def negated(self) -> "_Interval":
        return _Interval(-self.months, -self.seconds)


def _shift_datetime(dt: datetime, iv: _Interval) -> datetime:
    """Calendar-safe shift, matching DuckDB: month/year shifts clamp the
    day-of-month (2024-02-29 - 1 YEAR → 2023-02-28)."""
    from calendar import monthrange
    from datetime import timedelta

    if iv.months:
        total = dt.year * 12 + (dt.month - 1) + iv.months
        y, m = divmod(total, 12)
        day = min(dt.day, monthrange(y, m + 1)[1])
        dt = dt.replace(year=y, month=m + 1, day=day)
    if iv.seconds:
        dt = dt + timedelta(seconds=iv.seconds)
    return dt


def _apply_interval(val, iv: _Interval):
    """``timestamp ± interval`` for scalars and arrays.

    Scalars (the common CURRENT_DATE() case) get full calendar shifts.
    Arrays support fixed-width units via a duration add; month/year on a
    whole column would need per-row calendar logic — rejected explicitly.
    """
    if isinstance(val, pa.Scalar):
        py = val.as_py()
        if py is None:
            return val
        if isinstance(py, date) and not isinstance(py, datetime):
            py = datetime(py.year, py.month, py.day)
        return pa.scalar(_shift_datetime(py, iv))
    if isinstance(val, datetime):
        return pa.scalar(_shift_datetime(val, iv))
    if iv.months:
        raise ExprError(
            "YEAR/MONTH interval arithmetic on a column is not supported; "
            "shift the constant side instead (e.g. col < DATE_SUB(CURRENT_DATE(), ...))"
        )
    return pc.add(val, pa.scalar(int(iv.seconds * 1_000_000), pa.duration("us")))


def _add_or_sub(lv, rv, op: str):
    if isinstance(rv, _Interval):
        return _apply_interval(lv, rv if op == "+" else rv.negated())
    if isinstance(lv, _Interval):
        if op == "+":
            return _apply_interval(rv, lv)
        raise ExprError("interval - timestamp is not a valid expression")
    return (pc.add if op == "+" else pc.subtract)(lv, rv)


_ZERO_ARG_DATE_FUNCS = {
    "current_date": lambda: datetime.combine(date.today(), datetime.min.time()),
    "current_timestamp": lambda: datetime.now(),
    "now": lambda: datetime.now(),
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
                left = (lambda l, r, op: lambda t: _add_or_sub(l(t), r(t), op))(
                    left, right, val
                )
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
                    left = (lambda l, r: lambda t: _sql_mod(l(t), r(t)))(left, right)
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
            if val == "interval":
                k, n = self.next()
                if k != "num":
                    raise ExprError("INTERVAL requires a numeric quantity")
                k, unit = self.next()
                unit = (unit or "").lower().rstrip("s") if k in ("ident", "kw") else ""
                if unit not in _INTERVAL_UNITS:
                    raise ExprError(f"Unknown INTERVAL unit: {unit!r}")
                if unit == "year":
                    iv = _Interval(months=int(n) * 12)
                elif unit == "month":
                    iv = _Interval(months=int(n))
                else:
                    mult = {"day": 86400.0, "hour": 3600.0, "minute": 60.0, "second": 1.0}
                    iv = _Interval(seconds=float(n) * mult[unit])
                return (lambda v: lambda t: v)(iv)
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
                if fname in _ZERO_ARG_DATE_FUNCS:
                    self.expect_op(")")
                    fn = _ZERO_ARG_DATE_FUNCS[fname]
                    return (lambda f: lambda t: pa.scalar(f()))(fn)
                if fname in ("date_sub", "date_add"):
                    base = self.parse_add()
                    k2, v2 = self.next()
                    if not (k2 == "op" and v2 == ","):
                        raise ExprError(f"{fname.upper()} expects two arguments")
                    ivx = self.parse_add()
                    self.expect_op(")")

                    def _datefn(t, base=base, ivx=ivx, sub=(fname == "date_sub")):
                        iv = ivx(t)
                        if not isinstance(iv, _Interval):
                            raise ExprError(
                                f"{'DATE_SUB' if sub else 'DATE_ADD'} second "
                                "argument must be an INTERVAL"
                            )
                        return _apply_interval(base(t), iv.negated() if sub else iv)

                    return _datefn
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
            if val.lower() in _ZERO_ARG_DATE_FUNCS:
                # bare CURRENT_DATE / CURRENT_TIMESTAMP without parens
                fn = _ZERO_ARG_DATE_FUNCS[val.lower()]
                return (lambda f: lambda t: pa.scalar(f()))(fn)
            return (lambda name: lambda t: _col(t, name))(val)
        raise ExprError(f"Unexpected token: {val!r}")


_SELECT_HAVING = re.compile(
    r"^\s*select\s+(.*?)\s+from\s+\S+\s+having\s+(.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_AGG_RE = re.compile(
    r"\b(count|sum|min|max|avg)\s*\(\s*(\*|[A-Za-z_][A-Za-z_0-9.]*)\s*\)",
    re.IGNORECASE,
)


class AggregateQuery:
    """Compiled ungrouped ``SELECT <agg> FROM {table} HAVING <agg-pred>``
    rule (the reference's own sample config uses this form —
    ``/root/reference/examples/sample_config.yaml:28-33``).

    Semantics match DuckDB's ``fetchone()`` convention from the
    reference engine (``duckdb_engine.py:122-128``): if the HAVING
    predicate holds, failed_count = the SELECT aggregate's value; if no
    row is produced, failed_count = 0. (The reference itself crashes
    with ``TypeError: None[0]`` on the no-row case — we define it as 0,
    a documented, strictly-more-useful divergence.)

    Aggregates run as mergeable partials inside the fused streaming
    pass — no extra scan, no materialization. Supported aggregates:
    ``COUNT(*) COUNT(col) SUM MIN MAX AVG``.
    """

    def __init__(self, aggs, select_ev: Evaluator, having_ev: Evaluator):
        # aggs: list of (synthetic_name, func, col_or_None)
        self.aggs = aggs
        self.select_ev = select_ev
        self.having_ev = having_ev

    def columns(self) -> List[str]:
        return sorted({c for _, _, c in self.aggs if c is not None})

    def partial(self, batch: pa.Table) -> dict:
        out: dict = {}
        for name, func, col in self.aggs:
            if func == "count" and col is None:
                out[name] = batch.num_rows
                continue
            arr = _col(batch, col)
            if func == "count":
                out[name] = len(arr) - arr.null_count
            elif func == "sum":
                out[name] = pc.sum(arr).as_py()
            elif func == "min":
                out[name] = pc.min(arr).as_py()
            elif func == "max":
                out[name] = pc.max(arr).as_py()
            elif func == "avg":
                out[name] = (pc.sum(arr).as_py(), len(arr) - arr.null_count)
        return out

    def combine(self, partials: List[dict]) -> dict:
        merged: dict = {}
        for name, func, col in self.aggs:
            vals = [p[name] for p in partials if name in p]
            if func in ("count",):
                merged[name] = sum(vals) if vals else 0
            elif func == "sum":
                nn = [v for v in vals if v is not None]
                merged[name] = sum(nn) if nn else None
            elif func == "min":
                nn = [v for v in vals if v is not None]
                merged[name] = min(nn) if nn else None
            elif func == "max":
                nn = [v for v in vals if v is not None]
                merged[name] = max(nn) if nn else None
            elif func == "avg":
                s = sum(v[0] for v in vals if v[0] is not None)
                n = sum(v[1] for v in vals)
                merged[name] = (s / n) if n else None
        return merged

    def evaluate(self, merged: dict) -> "tuple[int, dict]":
        """→ (failed_count, aggregate values) from combined partials."""
        one_row = pa.table(
            {
                name: (
                    pa.array([merged.get(name)], pa.float64())
                    if merged.get(name) is None
                    else pa.array([merged.get(name)])
                )
                for name, _, _ in self.aggs
            }
        )
        having = bool(predicate_true_mask(self.having_ev, one_row).to_pylist()[0])
        failed = 0
        if having:
            val = self.select_ev(one_row)
            if isinstance(val, pa.Scalar):
                val = val.as_py()
            elif isinstance(val, (pa.Array, pa.ChunkedArray)):
                val = val.to_pylist()[0]
            failed = int(round(val)) if val is not None else 0
        return failed, {
            f"{func}({col or '*'})": merged.get(name)
            for name, func, col in self.aggs
        }


def parse_aggregate_query(expression: str) -> Optional[AggregateQuery]:
    """Compile a ``SELECT <agg> FROM {table} HAVING <pred>`` rule, or
    None when the expression is not of that form."""
    m = _SELECT_HAVING.match(expression)
    if not m:
        return None
    select_part, having_part = m.group(1), m.group(2)
    names: dict = {}  # (func, col) -> synthetic name

    def repl(mm: "re.Match[str]") -> str:
        func = mm.group(1).lower()
        col = None if mm.group(2) == "*" else mm.group(2)
        if func != "count" and col is None:
            raise ExprError(f"{func.upper()}(*) is not a valid aggregate")
        return names.setdefault((func, col), f"__agg_{len(names)}")

    sel_rw = _AGG_RE.sub(repl, select_part)
    hav_rw = _AGG_RE.sub(repl, having_part)
    if not names:
        return None  # HAVING with no aggregates — not an aggregate rule
    aggs = [(name, func, col) for (func, col), name in names.items()]
    select_ev = _Parser(_tokenize(sel_rw)).parse()
    having_ev = _Parser(_tokenize(hav_rw)).parse()
    return AggregateQuery(aggs, select_ev, having_ev)


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
        if (
            kind == "ident"
            and i >= 2
            and toks[i - 2] == ("kw", "interval")
            and toks[i - 1][0] == "num"
        ):
            continue  # INTERVAL 5 YEAR — unit word, not a column
        if kind == "ident" and val.lower() not in _ZERO_ARG_DATE_FUNCS and not (
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
