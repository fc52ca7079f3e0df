"""Driver-style oracle parity: run every queries() entry at sf0.01 and
compare against its oracle_sql() via DuckDB — row count, column names,
and order-insensitive values (the driver's correctness gate)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def to_pandas(result):
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(ray_session, con, name):
    ray_df = normalize(to_pandas(QUERIES[name](SF)))
    oracle_df = normalize(con.execute(ORACLES[name]).df())
    assert list(ray_df.columns) == list(oracle_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(oracle_df.columns)}"
    )
    assert len(ray_df) == len(oracle_df), f"{name}: row count mismatch"
    pd.testing.assert_frame_equal(ray_df, oracle_df, check_dtype=False, atol=1e-6)


def test_rows_only_queries_run(ray_session):
    for name in set(QUERIES) - set(ORACLES):
        df = to_pandas(QUERIES[name](SF))
        assert len(df) >= 0 and df.shape[1] > 0, name


def test_entry_smoke(ray_session):
    df = entrymod.entry()
    assert len(df) >= 0
    assert "rule_name" in df.columns


ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs_and_is_deterministic(ray_session, name):
    """Queries without a SQL oracle (approximate / sketch / derived by
    design) must still run through the driver contract, return rows
    with a stable schema, and be deterministic across invocations (the
    north-rule byte-stability requirement)."""
    a = normalize(to_pandas(QUERIES[name](SF)))
    b = normalize(to_pandas(QUERIES[name](SF)))
    assert len(a) >= 0 and list(a.columns)
    assert list(a.columns) == list(b.columns), name
    assert a.shape == b.shape, name
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
