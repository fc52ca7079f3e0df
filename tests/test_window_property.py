"""Seeded-random cross-checks of the window family vs DuckDB.

Each case builds an adversarial frame (NULL values, duplicated order
keys resolved by a tiebreak id, skewed key distribution, single-row
keys) and asserts the Ray operator's output equals the SQL window
formulation row-for-row. Complements the fixed-fixture unit tests the
same way test_expr_property does for the DSL."""

import duckdb
import numpy as np
import ray
import ray.data
import pandas as pd
import pytest

from data_validator_ray.pipelines.relational import (
    forward_fill,
    global_rank,
    grouped_top_k,
    running_window,
)


def _frame(seed: int, n: int = 400) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    v = rng.normal(50, 20, n)
    v[rng.random(n) < 0.15] = np.nan
    return pd.DataFrame(
        {
            # zipf-ish skew: a few hot keys + singleton keys
            "k": np.where(
                rng.random(n) < 0.6,
                rng.integers(0, 5, n),
                rng.integers(5, 5 + n // 4, n),
            ).astype(np.int64),
            # heavy order-key ties (resolved by id)
            "o": rng.integers(0, 20, n).astype(np.int64),
            "id": np.arange(n, dtype=np.int64),
            "v": v,
        }
    )


def _sql(df: pd.DataFrame, query: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(query).fetchdf()


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_running_window_vs_duckdb(ray_session, seed):
    df = _frame(seed)
    out = (
        running_window(df, "k", ["o", "id"], "v", num_buckets=7,
                       batch_size=64)
        .to_pandas()
        .sort_values(["k", "o", "id"])
        .reset_index(drop=True)
    )
    ref = _sql(
        df,
        "SELECT k, o, id, v, ROW_NUMBER() OVER w AS row_seq, "
        "ROUND(SUM(v) OVER (PARTITION BY k ORDER BY o, id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) "
        "AS running_sum, LAG(v) OVER w AS prev_value FROM t "
        "WINDOW w AS (PARTITION BY k ORDER BY o, id) "
        "ORDER BY k, o, id",
    )
    pd.testing.assert_frame_equal(
        out[sorted(out.columns)], ref[sorted(ref.columns)],
        check_dtype=False,
    )


@pytest.mark.parametrize("seed", [4, 5])
def test_forward_fill_vs_duckdb(ray_session, seed):
    df = _frame(seed)
    out = (
        forward_fill(df, "k", ["o", "id"], "v", num_buckets=5,
                     batch_size=50)
        .to_pandas()
        .sort_values(["k", "o", "id"])
        .reset_index(drop=True)
    )
    ref = _sql(
        df,
        "SELECT k, o, id, v, LAST_VALUE(v IGNORE NULLS) OVER "
        "(PARTITION BY k ORDER BY o, id ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS v_filled FROM t "
        "ORDER BY k, o, id",
    )
    pd.testing.assert_frame_equal(
        out[sorted(out.columns)], ref[sorted(ref.columns)],
        check_dtype=False,
    )


@pytest.mark.parametrize("seed", [6, 7])
def test_grouped_top_k_vs_duckdb(ray_session, seed):
    df = _frame(seed)
    out = (
        grouped_top_k(df, ["k"], "v", 2, descending=True,
                      tiebreak_cols=["id"], num_buckets=4,
                      batch_size=37)
        .to_pandas()
        .sort_values(["k", "id"])
        .reset_index(drop=True)
    )
    ref = _sql(
        df,
        "SELECT k, o, id, v FROM (SELECT *, ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY v DESC, id) AS rn FROM t "
        "WHERE v IS NOT NULL) WHERE rn <= 2 ORDER BY k, id",
    )
    pd.testing.assert_frame_equal(
        out[sorted(out.columns)].reset_index(drop=True),
        ref[sorted(ref.columns)].reset_index(drop=True),
        check_dtype=False,
    )


@pytest.mark.parametrize("seed", [8, 9])
def test_global_rank_vs_duckdb(ray_session, seed):
    df = _frame(seed)
    out = (
        global_rank(df, "v", tiebreak_cols=["id"], ntile=6,
                    percentiles=True, num_buckets=5, batch_size=64)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    ref = _sql(
        df,
        "SELECT k, o, id, v, ROW_NUMBER() OVER w AS rank, "
        "NTILE(6) OVER w AS tile, PERCENT_RANK() OVER w AS "
        "percent_rank, CUME_DIST() OVER w AS cume_dist FROM t "
        "WINDOW w AS (ORDER BY v, id) ORDER BY rank",
    )
    pd.testing.assert_frame_equal(
        out[sorted(out.columns)], ref[sorted(ref.columns)],
        check_dtype=False,
    )


@pytest.mark.parametrize("seed", [3, 17, 42])
def test_anomaly_zscore_random_vs_duckdb(ray_session, seed):
    """Trailing-window z-score equals the SQL window formulation on
    adversarial frames (NULLs, skewed keys, singleton keys, random
    preceding width)."""
    from data_validator_ray.pipelines.relational import anomaly_zscore

    df = _frame(seed)
    df["v"] = df["v"].where(~df["v"].isna(), None)
    k = int(np.random.default_rng(seed).integers(1, 12))
    out = (
        anomaly_zscore(ray.data.from_pandas(df), "k", ["o", "id"], "v",
                       preceding=k)
        .to_pandas()
        .sort_values(["k", "o", "id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    ref = con.execute(
        f"SELECT k, o, id, ROUND((v - AVG(v) OVER w) / "
        f"NULLIF(STDDEV_SAMP(v) OVER w, 0), 6) AS zscore FROM t "
        f"WINDOW w AS (PARTITION BY k ORDER BY o, id "
        f"ROWS BETWEEN {k} PRECEDING AND 1 PRECEDING) ORDER BY k, o, id"
    ).df()
    a, b = out.zscore.to_numpy(), ref.zscore.to_numpy()
    nan = np.isnan(a) & np.isnan(b)
    assert np.all(nan | (a == b))


@pytest.mark.parametrize("seed", [5, 29])
def test_set_op_bag_random_vs_counter(ray_session, seed):
    """Bag set ops equal Counter arithmetic on random multisets."""
    from collections import Counter

    from data_validator_ray.pipelines.relational import set_op

    rng = np.random.default_rng(seed)
    a = pd.DataFrame({"x": rng.integers(0, 15, 250)})
    b = pd.DataFrame({"x": rng.integers(0, 15, 180)})
    ca, cb = Counter(a.x.tolist()), Counter(b.x.tolist())
    inter = sum((ca & cb).values())
    exc = sum((ca - cb).values())
    got_i = set_op(ray.data.from_pandas(a), ray.data.from_pandas(b),
                   "intersect_all", ["x"]).count()
    got_e = set_op(ray.data.from_pandas(a), ray.data.from_pandas(b),
                   "except_all", ["x"]).count()
    assert (got_i, got_e) == (inter, exc)


@pytest.mark.parametrize("seed", [7, 23])
def test_grouped_mad_random_vs_duckdb(ray_session, seed):
    from data_validator_ray.pipelines.relational import grouped_mad

    df = _frame(seed)
    df["v"] = df["v"].where(~df["v"].isna(), None)
    out = (
        grouped_mad(ray.data.from_pandas(df), "k", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    ref = con.execute(
        "SELECT k, COUNT(v)::BIGINT n, median(v) median, mad(v) mad "
        "FROM t GROUP BY k ORDER BY k"
    ).df()
    assert out.k.tolist() == ref.k.tolist()
    for c in ("median", "mad"):
        x, y = out[c].to_numpy(), ref[c].to_numpy()
        nan = np.isnan(x) & np.isnan(y)
        assert np.all(nan | (x == y))
