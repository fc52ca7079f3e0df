"""Column-profiling operators: exact heavy hitters, Misra-Gries
sketch, equi-width histogram."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from data_validator_ray.pipelines.profile import (
    histogram,
    misra_gries_topk,
    top_values,
)


def test_top_values_exact_and_tiebreak(ray_session):
    tbl = pa.table({"c": pa.array(
        ["b"] * 3 + ["a"] * 3 + ["z"] * 5 + [None, "x"]
    )})
    out = top_values(tbl, "c", k=3).to_pandas()
    # z(5) first; a and b tie at 3 → value-asc order; NULL dropped
    assert out["value"].tolist() == ["z", "a", "b"]
    assert out["n"].tolist() == [5, 3, 3]


def test_top_values_k_larger_than_distinct(ray_session):
    tbl = pa.table({"c": pa.array([1, 1, 2], pa.int64())})
    out = top_values(tbl, "c", k=10).to_pandas()
    assert out["value"].tolist() == [1, 2]
    assert out["n"].tolist() == [2, 1]


def test_misra_gries_no_compression_is_exact(ray_session):
    # capacity >= distinct: est == exact, zero decrement
    tbl = pa.table({"c": pa.array([1] * 4 + [2] * 2 + [3], pa.int64())})
    out = misra_gries_topk(tbl, "c", k=3, capacity=8).to_pandas()
    assert out["value"].tolist() == [1, 2, 3]
    assert out["est_count"].tolist() == [4, 2, 1]
    assert out["upper_bound"].tolist() == [4, 2, 1]


def test_misra_gries_guarantee_under_compression(ray_session):
    # 1000 rows: value 0 has 400, value 1 has 200, the rest spread over
    # 100 rare values — capacity 8 forces heavy decrement, but the two
    # heavy hitters must survive with bounds bracketing truth
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        np.zeros(400, np.int64),
        np.ones(200, np.int64),
        rng.integers(10, 110, size=400),
    ])
    tbl = pa.table({"c": pa.array(vals, pa.int64())})
    out = misra_gries_topk(tbl, "c", k=5, capacity=8).to_pandas()
    top2 = out.set_index("value")
    assert 0 in top2.index and 1 in top2.index
    assert top2.loc[0, "est_count"] <= 400 <= top2.loc[0, "upper_bound"]
    assert top2.loc[1, "est_count"] <= 200 <= top2.loc[1, "upper_bound"]


def test_histogram_bins_and_drops(ray_session):
    tbl = pa.table({"v": pa.array(
        [0.0, 0.5, 1.0, 3.9, 4.0, 7.99, None, -0.1, 8.0, 100.0],
        pa.float64(),
    )})
    out = histogram(tbl, "v", lo=0.0, hi=8.0, n_bins=2).to_pandas()
    # [0,4): 0.0 0.5 1.0 3.9 → 4; [4,8): 4.0 7.99 → 2;
    # NULL, -0.1, 8.0, 100.0 all drop
    assert out["bin_id"].tolist() == [0, 1]
    assert out["bin_lo"].tolist() == [0.0, 4.0]
    assert out["bin_hi"].tolist() == [4.0, 8.0]
    assert out["n"].tolist() == [4, 2]


def test_histogram_empty_bins_omitted(ray_session):
    tbl = pa.table({"v": pa.array([0.5, 15.5], pa.float64())})
    out = histogram(tbl, "v", lo=0.0, hi=16.0, n_bins=16).to_pandas()
    assert out["bin_id"].tolist() == [0, 15]
    assert out["n"].tolist() == [1, 1]


def test_histogram_rejects_bad_range(ray_session):
    tbl = pa.table({"v": pa.array([1.0], pa.float64())})
    with pytest.raises(ValueError):
        histogram(tbl, "v", lo=5.0, hi=5.0, n_bins=4)
