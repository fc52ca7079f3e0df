"""Expression DSL vs DuckDB oracle: for each predicate, the count of
TRUE rows must equal ``SELECT COUNT(*) FROM t WHERE <pred>``."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from data_validator_ray.functions.expr import (
    compile_predicate,
    extract_predicate,
    predicate_true_mask,
    referenced_columns,
)


@pytest.fixture(scope="module")
def table() -> pa.Table:
    df = pd.DataFrame(
        {
            "a": pd.array([1, 2, None, 4, 5, -3, 0, 10, 7, None], dtype="Int64"),
            "b": [1.5, -2.0, 3.25, None, 0.0, 9.5, 2.5, -1.0, None, 4.0],
            "s": ["foo", "bar", None, "", "foobar", "xyz", "FOO", "ba r", "zz", "fo"],
            "ts": pd.to_datetime(
                [
                    "2020-01-01", "2021-06-15", None, "2019-12-31", "2022-03-01",
                    "2020-07-04", "2023-01-01", "2018-05-20", "2021-01-01", "2024-02-29",
                ]
            ),
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False)
    # match the real data model (timestamp[us], like the parquet fixtures)
    idx = t.schema.get_field_index("ts")
    return t.set_column(idx, "ts", t["ts"].cast(pa.timestamp("us")))


PREDICATES = [
    "a > 3",
    "a IS NULL",
    "a IS NOT NULL AND b < 2",
    "a > 1 AND a < 5 OR b >= 4.0",
    "NOT (a >= 0)",
    "a BETWEEN 2 AND 7",
    "a NOT BETWEEN 2 AND 7",
    "s = 'foo'",
    "s != ''",
    "s IN ('foo', 'bar', 'zz')",
    "s NOT IN ('foo', 'bar')",
    "s LIKE 'fo%'",
    "s NOT LIKE '%o%'",
    "LENGTH(s) > 3",
    "LOWER(s) = 'foo'",
    "a + 1 > 5",
    "a * 2 <= b",
    "-a < -4",
    "b / 2 > 1",
    "ABS(b) > 2",
    "ts > TIMESTAMP '2021-01-01 00:00:00'",
    "ts < DATE '2020-06-01'",
    "a IN (1, 4, 10) AND s IS NOT NULL",
    "COALESCE(a, 0) = 0",
]


@pytest.mark.parametrize("pred", PREDICATES)
def test_predicate_matches_duckdb(table, pred):
    con = duckdb.connect()
    con.register("t", table)
    expected = con.execute(f"SELECT COUNT(*) FROM t WHERE {pred}").fetchone()[0]
    mask = predicate_true_mask(compile_predicate(pred), table)
    got = pc.sum(mask).as_py() or 0
    assert got == expected, f"{pred}: ray={got} duckdb={expected}"


def test_regexp_search_semantics(table):
    # unanchored search, like DuckDB regexp_matches
    con = duckdb.connect()
    con.register("t", table)
    expected = con.execute(
        "SELECT COUNT(*) FROM t WHERE regexp_matches(s, 'o+')"
    ).fetchone()[0]
    mask = predicate_true_mask(compile_predicate("s REGEXP 'o+'"), table)
    assert (pc.sum(mask).as_py() or 0) == expected


def test_extract_where_clause():
    sql = "SELECT COUNT(*) FROM {table} WHERE age > 100"
    assert extract_predicate(sql) == "age > 100"
    assert extract_predicate("age > 100") == "age > 100"


def test_full_select_compiles(table):
    ev = compile_predicate("SELECT COUNT(*) FROM {table} WHERE a > 3")
    mask = predicate_true_mask(ev, table)
    assert (pc.sum(mask).as_py() or 0) == 4  # rows 4, 5, 10, 7


def test_referenced_columns():
    cols = referenced_columns("LENGTH(s) > 3 AND a BETWEEN 1 AND 2 OR ts IS NULL")
    assert cols == {"s", "a", "ts"}


def test_null_not_counted(table):
    # a > 3 is NULL for NULL a → not counted (SQL COUNT WHERE semantics)
    mask = predicate_true_mask(compile_predicate("a > 3"), table)
    assert mask.null_count == 0


# --------------------------------------------------------------------------- #
# round 2: SQL arithmetic semantics + date arithmetic + HAVING aggregates     #
# --------------------------------------------------------------------------- #

# (DSL expression, equivalent DuckDB SQL) — DuckDB lacks MySQL-style
# DATE_SUB, so the oracle side uses interval arithmetic directly.
PAIRED_PREDICATES = [
    ("a / 2 > 3", "a / 2 > 3"),                    # SQL float division on ints
    ("a / 2 = 3.5", "a / 2 = 3.5"),
    ("a % 3 = 1", "a % 3 = 1"),
    ("a % 3 = -1", "a % 3 = -1"),                  # truncated modulo: -3 % 3... sign of dividend
    ("-a % 3 = 0", "(-a) % 3 = 0"),
    ("b / 2 > 1", "b / 2 > 1"),
    (
        "ts < DATE_SUB(CURRENT_DATE(), INTERVAL 5 YEAR)",
        "ts < CURRENT_DATE - INTERVAL 5 YEAR",
    ),
    (
        "ts < CURRENT_DATE - INTERVAL 5 YEAR",
        "ts < CURRENT_DATE - INTERVAL 5 YEAR",
    ),
    (
        "ts >= DATE_ADD(CURRENT_TIMESTAMP, INTERVAL 3 MONTH)",
        "ts >= CURRENT_TIMESTAMP::TIMESTAMP + INTERVAL 3 MONTH",
    ),
    (
        "ts < DATE_SUB(CURRENT_DATE, INTERVAL 2000 DAY)",
        "ts < CURRENT_DATE - INTERVAL 2000 DAY",
    ),
    (
        "ts + INTERVAL 1 DAY < TIMESTAMP '2021-01-02 00:00:00'",
        "ts + INTERVAL 1 DAY < TIMESTAMP '2021-01-02 00:00:00'",
    ),
]


@pytest.mark.parametrize("dsl,sql", PAIRED_PREDICATES)
def test_paired_predicates_vs_duckdb(table, dsl, sql):
    con = duckdb.connect()
    con.register("t", table)
    expected = con.execute(f"SELECT COUNT(*) FROM t WHERE {sql}").fetchone()[0]
    mask = predicate_true_mask(compile_predicate(dsl), table)
    got = pc.sum(mask).as_py() or 0
    assert got == expected, f"{dsl}: ray={got} duckdb={expected}"


def test_interval_unit_not_a_column():
    cols = referenced_columns("ts < DATE_SUB(CURRENT_DATE(), INTERVAL 5 YEAR)")
    assert cols == {"ts"}


def test_year_interval_on_column_rejected(table):
    from data_validator_ray.functions.expr import ExprError

    ev = compile_predicate("ts - INTERVAL 1 YEAR > TIMESTAMP '2020-01-01 00:00:00'")
    with pytest.raises(ExprError):
        predicate_true_mask(ev, table)


def test_calendar_clamp_leap_day():
    from data_validator_ray.functions.expr import _Interval, _shift_datetime
    from datetime import datetime

    assert _shift_datetime(datetime(2024, 2, 29), _Interval(months=-12)) == datetime(
        2023, 2, 28
    )
    assert _shift_datetime(datetime(2024, 1, 31), _Interval(months=1)) == datetime(
        2024, 2, 29
    )


# ---- HAVING aggregate rules ----------------------------------------------- #


def _having_oracle(table, sql_expr):
    """DuckDB fetchone semantics with no-row → 0 (see AggregateQuery)."""
    con = duckdb.connect()
    con.register("t", table)
    row = con.execute(sql_expr.replace("{table}", "t")).fetchone()
    if row is None or row[0] is None:
        return 0
    return int(round(row[0]))


HAVING_EXPRS = [
    "SELECT COUNT(*) FROM {table} HAVING COUNT(*) = 0",
    "SELECT COUNT(*) FROM {table} HAVING COUNT(*) > 5",
    "SELECT COUNT(a) FROM {table} HAVING COUNT(a) < 100",
    "SELECT SUM(a) FROM {table} HAVING SUM(a) > 10",
    "SELECT COUNT(*) FROM {table} HAVING AVG(b) < 2.5",
    "SELECT MAX(a) FROM {table} HAVING MIN(a) < 0",
    "SELECT COUNT(*) FROM {table} HAVING COUNT(*) - COUNT(a) > 1",
]


@pytest.mark.parametrize("expr", HAVING_EXPRS)
def test_aggregate_having_vs_duckdb(table, expr):
    from data_validator_ray.functions.expr import parse_aggregate_query

    q = parse_aggregate_query(expr)
    assert q is not None
    # split the table into uneven chunks to exercise partial merging
    parts = [table.slice(0, 3), table.slice(3, 4), table.slice(7)]
    failed, _ = q.evaluate(q.combine([q.partial(p) for p in parts]))
    assert failed == _having_oracle(table, expr), expr


def test_aggregate_having_empty_input(table):
    from data_validator_ray.functions.expr import parse_aggregate_query

    q = parse_aggregate_query("SELECT COUNT(*) FROM {table} HAVING COUNT(*) = 0")
    failed, _ = q.evaluate(q.combine([q.partial(table.slice(0, 0))]))
    assert failed == 0  # empty table → COUNT(*)=0 row → first cell 0


def test_where_form_not_aggregate():
    from data_validator_ray.functions.expr import parse_aggregate_query

    assert parse_aggregate_query("SELECT COUNT(*) FROM {table} WHERE a > 3") is None
    assert parse_aggregate_query("a > 3") is None
