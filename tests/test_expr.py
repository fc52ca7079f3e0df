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
