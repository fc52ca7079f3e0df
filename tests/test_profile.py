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


def test_grouped_higher_moments_edges_vs_duckdb(ray_session):
    """DuckDB G1/G2 parity on the NULL-threshold edges: n=2 (both
    NULL), n=3 (skew 0.0, kurt NULL), n=4 (both defined), constant
    group (both NULL, zero variance), NULL values ignored, plus a
    random group split across many batches."""
    import duckdb
    import ray

    from data_validator_ray.pipelines.profile import grouped_higher_moments

    rng = np.random.default_rng(5)
    big = rng.normal(50, 9, 500).round(3)
    df = pd.DataFrame(
        {
            "g": ["n2"] * 2 + ["n3"] * 3 + ["n4"] * 4 + ["const"] * 5
            + ["nulls"] * 6 + ["big"] * 500,
            "v": [1.0, 2.0] + [1.0, 2.0, 3.0] + [1.0, 2.0, 3.0, 9.0]
            + [7.0] * 5 + [None, 4.0, None, 8.0, 1.0, 3.0]
            + list(big),
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)
    out = (
        grouped_higher_moments(ds, ["g"], "v", num_buckets=4, batch_size=64)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT g, COUNT(v)::BIGINT AS n_x, ROUND(skewness(v), 6) AS skew_x, "
        "ROUND(kurtosis(v), 6) AS kurt_x FROM t GROUP BY g ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(
        out[exp.columns], exp, check_dtype=False, atol=1e-6
    )


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


# --------------------------------------------------------------------------- #
# grouped_stats (moments + correlation)                                       #
# --------------------------------------------------------------------------- #


def test_grouped_stats_null_conventions(ray_session):
    import numpy as np
    import pandas as pd

    from data_validator_ray.pipelines.profile import grouped_stats

    df = pd.DataFrame(
        {
            "g": ["a", "a", "a", "a", "b", "b"],
            "x": [1.0, 2.0, 3.0, None, 5.0, 5.0],
            "y": [2.0, None, 6.0, 9.0, 1.0, 2.0],
        }
    )
    out = (
        grouped_stats(df, ["g"], "x", "y", num_buckets=2, batch_size=2)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    a = out.iloc[0]
    # AVG/VAR over x-non-null rows (3); CORR over pairwise rows (1,2),(3,6)
    assert a.n_x == 3 and a.avg_x == 2.0 and a.var_x == 1.0
    assert a.corr_xy == 1.0  # two points -> perfect correlation
    b = out.iloc[1]
    # zero x-variance -> corr NULL; var defined
    assert b.n_x == 2 and b.avg_x == 5.0 and b.var_x == 0.0
    assert np.isnan(b.corr_xy)


def test_grouped_stats_matches_pandas_reference(ray_session):
    import numpy as np
    import pandas as pd

    from data_validator_ray.pipelines.profile import grouped_stats

    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {
            "g": rng.choice(["p", "q", "r"], 3000),
            "x": rng.normal(10, 3, 3000),
            "y": rng.normal(size=3000),
        }
    )
    df["y"] += 0.5 * df["x"]
    out = (
        grouped_stats(df, ["g"], "x", "y", batch_size=256)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    ref = df.groupby("g").agg(
        avg=("x", "mean"), var=("x", "var")
    ).reset_index()
    corr_ref = df.groupby("g").apply(
        lambda t: t["x"].corr(t["y"]), include_groups=False
    ).reset_index(drop=True)
    assert np.allclose(out.avg_x, ref["avg"].round(6))
    assert np.allclose(out.var_x, ref["var"], atol=1e-5)
    assert np.allclose(out.corr_xy, corr_ref, atol=1e-5)


def test_grouped_mode_ties_and_nulls(ray_session):
    from data_validator_ray.pipelines.profile import grouped_mode

    df = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b", "b", "b", "b", "c"],
            "v": ["x", "y", "y", "q", "p", "q", "p", None],
        }
    )
    out = (
        grouped_mode(df, ["g"], "v", num_buckets=4)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    # a: y(2) beats x(1); b: p==q tie → smallest value p; c: all NULL → no row
    assert out["g"].tolist() == ["a", "b"]
    assert out["mode_value"].tolist() == ["y", "p"]
    assert out["mode_count"].tolist() == [2, 2]


def test_grouped_mode_layout_invariance(ray_session):
    import ray as _ray

    from data_validator_ray.pipelines.profile import grouped_mode

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 20, 3000),
            "v": rng.integers(0, 5, 3000),
        }
    )
    a = (
        grouped_mode(_ray.data.from_pandas(df), ["g"], "v", batch_size=100)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    b = (
        grouped_mode(_ray.data.from_pandas(df), ["g"], "v", batch_size=64 * 1024,
                     num_buckets=3)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # pandas reference: max count, min value tie-break
    exp = (
        df.groupby(["g", "v"]).size().reset_index(name="c")
        .sort_values(["g", "c", "v"], ascending=[True, False, True])
        .drop_duplicates("g").reset_index(drop=True)
    )
    assert a["mode_value"].tolist() == exp["v"].tolist()
    assert a["mode_count"].tolist() == exp["c"].tolist()


def test_standardize_zscore_and_minmax(ray_session):
    from data_validator_ray.pipelines.profile import standardize_column

    df = pd.DataFrame({"id": [0, 1, 2, 3], "v": [1.0, 3.0, None, 5.0]})
    z = (
        standardize_column(df, "v", out_col="z")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # mean 3, stddev_samp 2
    assert z["z"].tolist()[:2] == [-1.0, 0.0]
    assert pd.isna(z["z"].iloc[2]) and z["z"].iloc[3] == 1.0

    mm = (
        standardize_column(df, "v", method="minmax", out_col="s")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert mm["s"].tolist()[:2] == [0.0, 0.5]
    assert pd.isna(mm["s"].iloc[2]) and mm["s"].iloc[3] == 1.0

    # constant column -> NULL scores (division by zero in SQL)
    const = (
        standardize_column(
            pd.DataFrame({"id": [0, 1], "v": [2.0, 2.0]}), "v"
        )
        .to_pandas()
    )
    assert const["v_std"].isna().all()


def test_quantile_bucketize_bins_and_nulls(ray_session):
    from data_validator_ray.pipelines.profile import quantile_bucketize

    df = pd.DataFrame({"id": range(8), "v": [1.0, 2, 3, 4, 5, 6, 7, None]})
    out = (
        quantile_bucketize(df, "v", n_bins=4)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # 7 non-null values 1..7: quartile edges 2.5, 4, 5.5; an exact-edge
    # value (4) lands in the UPPER bin (bin = 1 + #edges <= v)
    assert out["bin"].tolist()[:7] == [1, 1, 2, 3, 3, 4, 4]
    assert pd.isna(out["bin"].iloc[7])
    # equal values share a bin (unlike NTILE)
    df2 = pd.DataFrame({"id": range(4), "v": [5.0, 5.0, 5.0, 5.0]})
    out2 = quantile_bucketize(df2, "v", n_bins=2).to_pandas()
    assert out2["bin"].nunique() == 1


def test_robust_scale_by_group_edges(ray_session):
    """Zero-IQR groups and NULL keys/values yield NULL scores; known
    quantiles produce exact scaled values."""
    import pandas as pd
    import ray

    from data_validator_ray.pipelines.profile import robust_scale_by_group

    df = pd.DataFrame(
        {
            "g": ["a"] * 5 + ["const"] * 3 + [None],
            "v": [0.0, 1.0, 2.0, 3.0, 4.0, 7.0, 7.0, 7.0, 1.0],
            "i": list(range(9)),
        }
    )
    out = (
        robust_scale_by_group(ray.data.from_pandas(df), "g", "v", out_col="r")
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    # group a: p25=1, p50=2, p75=3 -> IQR=2; v=0 -> -1.0, v=4 -> 1.0
    assert out.loc[0, "r"] == -1.0 and out.loc[4, "r"] == 1.0
    # constant group: IQR 0 -> NULL; NULL key -> NULL
    assert out.loc[5:8, "r"].isna().all()


def test_table_profile_one_pass(ray_session):
    """Every column profiled in one pass: exact counts/min/max/mean for
    numerics, HLL distinct for hashables, NULL distinct for nested."""
    import pandas as pd
    import ray

    from data_validator_ray.stages.stats import table_profile

    df = pd.DataFrame(
        {
            "i": [1, 2, 2, None],
            "s": ["a", "b", "b", "b"],
            "v": [[1.0], [2.0], [3.0], [4.0]],  # nested: unhashable
        }
    )
    out = table_profile(ray.data.from_pandas(df)).set_index("column")
    assert out.loc["i", "total_count"] == 4
    assert out.loc["i", "null_count"] == 1
    assert out.loc["i", "min_value"] == 1.0
    assert out.loc["i", "max_value"] == 2.0
    assert abs(out.loc["i", "mean_value"] - round(5 / 3, 6)) < 1e-9
    assert out.loc["i", "approx_distinct"] == 2
    assert out.loc["s", "approx_distinct"] == 2
    assert pd.isna(out.loc["s", "min_value"])  # non-numeric: no min/max


def test_grouped_ols_degenerate_groups(ray_session):
    """Zero x-variance -> NULL slope/intercept/r2; constant y ->
    r2 NULL (zero y-variance) but slope 0; pairwise-complete only."""
    from data_validator_ray.pipelines.profile import grouped_ols

    df = pd.DataFrame(
        {
            "g": ["flat_x"] * 3 + ["flat_y"] * 3 + ["line"] * 3,
            "x": [5.0, 5.0, 5.0, 1.0, 2.0, 3.0, 1.0, 2.0, 3.0],
            "y": [1.0, 2.0, 3.0, 7.0, 7.0, 7.0, 3.0, 5.0, 7.0],
        }
    )
    out = (
        grouped_ols(df, ["g"], "x", "y")
        .to_pandas()
        .set_index("g")
    )
    assert pd.isna(out.loc["flat_x", "slope"])
    assert out.loc["flat_y", "slope"] == 0.0
    assert pd.isna(out.loc["flat_y", "r2"])
    assert out.loc["line", "slope"] == 2.0
    assert out.loc["line", "intercept"] == 1.0
    assert out.loc["line", "r2"] == 1.0
    assert int(out.loc["line", "regr_n"]) == 3


def test_key_skew_profile_exact(ray_session):
    """Known distribution: counts (1,1,2,4) over 4 keys -> exact
    shares and Gini from the run-length rank formula."""
    from data_validator_ray.pipelines.profile import key_skew_profile

    keys = [1, 2, 3, 3, 4, 4, 4, 4]
    df = pd.DataFrame({"k": keys + [None]})
    out = key_skew_profile(df, "k", top_k=2)
    assert int(out.n_keys[0]) == 4 and int(out.n_rows[0]) == 8
    assert out.top1_share[0] == 0.5
    assert out.topk_share[0] == 0.75
    # sorted counts (1,1,2,4): gini = 2*(1*1+2*1+3*2+4*4)/(4*8) - 5/4
    assert out.gini[0] == round(2 * 25 / 32 - 1.25, 6)


def test_benford_digits_uniform_flags(ray_session):
    """A uniform 1..9999 column deviates from Benford (χ² terms large
    for high digits); digit extraction covers sub-1 magnitudes."""
    from data_validator_ray.pipelines.profile import benford_digits

    df = pd.DataFrame({"v": list(range(1, 10000)) + [0.07, -0.3, None, 0]})
    out = benford_digits(df, "v")
    assert out.digit.tolist() == list(range(1, 10))
    # uniform: ~1111 each, plus 0.07 -> digit 7, -0.3 -> digit 3
    assert int(out.observed.sum()) == 9999 + 2
    assert int(out.loc[out.digit == 7, "observed"].iloc[0]) == 1112
    # Benford expects ~30% ones; uniform gives ~11% -> big chi2 on 1
    assert out.loc[out.digit == 1, "chi2_term"].iloc[0] > 100


def test_null_rate_by_period_counts(ray_session):
    from data_validator_ray.pipelines.profile import null_rate_by_period

    t0 = pd.Timestamp("2024-03-01 10:00")
    d1 = pd.Timestamp("2024-03-02 09:00")
    df = pd.DataFrame(
        {
            "ts": [t0, t0, d1, d1, pd.NaT],
            "a": [1.0, None, None, None, 9.9],
        }
    )
    out = (
        null_rate_by_period(df, "ts", ["a"])
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert len(out) == 2                       # NaT row dropped
    assert out.n_rows.tolist() == [2, 2]
    assert out.a_nulls.tolist() == [1, 2]
    assert out.a_null_rate.tolist() == [0.5, 1.0]


def test_cat_association_independent_and_dependent(ray_session):
    import numpy as np
    import pandas as pd
    from data_validator_ray.pipelines.profile import cat_association

    # perfectly dependent: b == a -> Cramér's V == 1, MI == ln(k)
    df = pd.DataFrame({"a": ["x", "y", "z"] * 10, "b": ["x", "y", "z"] * 10})
    out = cat_association(df, "a", "b").to_pylist()[0]
    assert out["cramers_v"] == 1.0
    assert out["mutual_info"] == round(float(np.log(3)), 6)
    assert out["n"] == 30 and out["r_categories"] == 3

    # exactly independent (balanced product design): chi2 == 0, MI == 0
    a = ["x", "x", "y", "y"] * 5
    b = ["p", "q", "p", "q"] * 5
    out2 = cat_association(pd.DataFrame({"a": a, "b": b}), "a", "b").to_pylist()[0]
    assert out2["chi2"] == 0.0 and out2["mutual_info"] == 0.0

    # NULL on either side drops the row
    df3 = pd.DataFrame({"a": ["x", None, "y"], "b": [None, "p", "q"]})
    out3 = cat_association(df3, "a", "b").to_pylist()[0]
    assert out3["n"] == 1

    # degenerate single-category column: V defined as 0
    df4 = pd.DataFrame({"a": ["x", "x"], "b": ["p", "q"]})
    out4 = cat_association(df4, "a", "b").to_pylist()[0]
    assert out4["cramers_v"] == 0.0


def test_categorical_profile_entropy_and_nulls(ray_session):
    import numpy as np
    import pandas as pd
    from data_validator_ray.pipelines.profile import categorical_profile

    df = pd.DataFrame(
        {
            "c": ["a", "a", "b", "b", None, None],
            "k": [1, 1, 1, 1, 1, 2],
        }
    )
    out = categorical_profile(df, ["c", "k"], batch_size=2).to_pandas()
    c = out[out["column"] == "c"].iloc[0]
    assert (c["n"], c["null_count"], c["n_distinct"]) == (4, 2, 2)
    assert c["entropy"] == round(float(np.log(2)), 6)
    assert c["top_share"] == 0.5
    k = out[out["column"] == "k"].iloc[0]
    assert (k["n"], k["n_distinct"]) == (6, 2)
    assert k["top_share"] == round(5 / 6, 6)

    # all-null column
    df2 = pd.DataFrame({"z": pd.array([None, None], dtype="string")})
    out2 = categorical_profile(df2, ["z"]).to_pylist()[0]
    assert out2 == {
        "column": "z", "n": 0, "null_count": 2, "n_distinct": 0,
        "entropy": 0.0, "top_share": 0.0,
    }


def test_correlation_matrix_nulls_and_zero_variance(ray_session):
    """Pairwise-complete counts per pair; constant column pairs give
    NULL corr; perfectly linear pair gives ±1."""
    import duckdb

    from data_validator_ray.pipelines.profile import correlation_matrix

    rng = np.random.default_rng(9)
    n = 400
    a = rng.normal(size=n)
    df = pd.DataFrame(
        {
            "a": a,
            "b": -2 * a + 1,            # corr -1 with a
            "c": rng.normal(size=n),
            "d": np.full(n, 3.14),      # zero variance
        }
    )
    df.loc[df.index[:30], "a"] = None
    df.loc[df.index[20:60], "c"] = None
    out = correlation_matrix(df, ["a", "b", "c", "d"])
    con = duckdb.connect()
    con.register("t", df)
    ref = con.execute(
        "WITH p AS ("
        "SELECT 'a' x, 'b' y, COUNT(*) FILTER (WHERE a IS NOT NULL AND b "
        "IS NOT NULL) n, CORR(a, b) c FROM t "
        "UNION ALL SELECT 'a', 'c', COUNT(*) FILTER (WHERE a IS NOT NULL "
        "AND c IS NOT NULL), CORR(a, c) FROM t "
        "UNION ALL SELECT 'a', 'd', COUNT(*) FILTER (WHERE a IS NOT NULL "
        "AND d IS NOT NULL), CORR(a, d) FROM t "
        "UNION ALL SELECT 'b', 'c', COUNT(*) FILTER (WHERE b IS NOT NULL "
        "AND c IS NOT NULL), CORR(b, c) FROM t "
        "UNION ALL SELECT 'b', 'd', COUNT(*) FILTER (WHERE b IS NOT NULL "
        "AND d IS NOT NULL), CORR(b, d) FROM t "
        "UNION ALL SELECT 'c', 'd', COUNT(*) FILTER (WHERE c IS NOT NULL "
        "AND d IS NOT NULL), CORR(c, d) FROM t"
        ") SELECT x, y, n, ROUND(c, 6) c FROM p ORDER BY x, y"
    ).df()
    assert out.n_pairs.tolist() == ref.n.tolist()
    for mine, theirs in zip(out["corr"].to_numpy(), ref.c.to_numpy()):
        assert (np.isnan(mine) and np.isnan(theirs)) or mine == theirs
    ab = out[(out.col_a == "a") & (out.col_b == "b")]["corr"].iloc[0]
    assert ab == -1.0


def test_type_conformance_profile_planted(ray_session):
    """Planted dirty strings: nulls, empties, ints (incl. +/- and the
    18-digit boundary), floats (plain/scientific), timestamps."""
    from data_validator_ray.pipelines.profile import type_conformance_profile

    df = pd.DataFrame(
        {
            "c": [
                None, "", "  ", "42", "+7", "-0", "1" * 18, "1" * 19,
                "3.14", "-.5", "1e-3", "2024-05-01 12:00:00", "abc",
                " 99 ",
            ]
        }
    )
    out = type_conformance_profile(df, ["c"])
    r = out.iloc[0]
    assert r.n == 14 and r.n_null == 1 and r.n_empty == 2
    # ints: 42, +7, -0, 10^18-digit run (18 ok, 19 not), " 99 " trimmed
    assert r.n_int == 5
    # floats: all int-ish strings parse as floats too (incl. the
    # 19-digit run the int64 regex rejects), plus 3.14, -.5, 1e-3
    assert r.n_float == 9
    assert r.n_ts == 1


def test_grouped_weighted_stats_null_and_zero_weight(ray_session):
    """Pairwise NULL exclusion; zero-total-weight group yields NULL
    mean; weighted mean pulls toward high-weight values."""
    from data_validator_ray.pipelines.profile import grouped_weighted_stats

    df = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b", "b", "c"],
            "x": [10.0, 20.0, None, 5.0, 7.0, 9.0],
            "w": [1.0, 3.0, 100.0, 0.0, 0.0, None],
        }
    )
    out = (
        grouped_weighted_stats(df, ["g"], "x", "w")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    a, b, c = out.iloc[0], out.iloc[1], out.iloc[2]
    assert a.n_pairs == 2 and a.weighted_mean == 17.5  # (10+60)/4
    assert b.n_pairs == 2 and np.isnan(b.weighted_mean)  # Σw = 0
    assert c.n_pairs == 0 and np.isnan(c.weighted_mean)


def test_join_size_profile_planted(ray_session):
    """Exact output rows Σ ca·cb over shared keys; NULL keys never
    join; the hottest key's contribution and skew ratio are exact."""
    from data_validator_ray.pipelines.profile import join_size_profile

    a = pd.DataFrame({"k": [1, 1, 1, 2, 3, None]})
    b = pd.DataFrame({"rk": [1, 1, 2, 4, None]})
    out = join_size_profile(a, "k", b, "rk").iloc[0]
    # key 1: 3*2=6, key 2: 1*1=1 -> 7 rows over 2 shared keys
    assert out.rows_out == 7 and out.shared_keys == 2
    assert out.max_key_rows == 6
    assert out.skew_ratio == 6 / (7 / 2)


def test_missingness_matrix_structural_nulls(ray_session):
    """Columns nulled together show Jaccard 1; independent nulls show
    the exact count ratios; never-null pair gives NULL Jaccard."""
    from data_validator_ray.pipelines.profile import missingness_matrix

    df = pd.DataFrame(
        {
            "a": [None, None, 3, 4, 5],
            "b": [None, None, 30, 40, 50],   # nulls exactly with a
            "c": [1, None, None, 4, 5],      # independent nulls
            "d": [1, 2, 3, 4, 5],            # never null
        }
    )
    out = missingness_matrix(df, ["d", "a", "c", "b"])  # unsorted input
    out = out.set_index(["col_a", "col_b"])
    ab = out.loc[("a", "b")]
    assert ab.n_both_null == 2 and ab.n_either_null == 2
    assert ab.null_jaccard == 1.0
    ac = out.loc[("a", "c")]
    assert ac.n_both_null == 1 and ac.n_either_null == 3
    ad = out.loc[("a", "d")]
    assert ad.n_both_null == 0 and ad.n_either_null == 2
    cd = out.loc[("c", "d")]
    assert cd.null_jaccard == 0.0
    # d never null against... find a pair with zero either: none here;
    # build one
    out2 = missingness_matrix(df[["d"]].assign(e=[1, 2, 3, 4, 5]),
                              ["d", "e"])
    assert np.isnan(out2.null_jaccard[0])


def test_float_anomaly_profile_distinguishes_null_and_nan(ray_session):
    from data_validator_ray.pipelines.profile import float_anomaly_profile

    df = pd.DataFrame(
        {
            "x": [1.0, -2.0, 0.0, np.nan, np.inf, -np.inf, None, 3.5],
        }
    )
    out = float_anomaly_profile(df, ["x"]).iloc[0]
    assert out.n == 8
    # pandas None in a float column becomes NaN before Arrow sees it —
    # here both land as NaN (documented conflation at the pandas
    # boundary); a true Arrow NULL stays distinct
    assert out.n_nan + out.n_null == 2
    assert out.n_posinf == 1 and out.n_neginf == 1
    assert out.n_zero == 1 and out.n_negative == 1

    t = pa.table({"y": pa.array([1.0, None, float("nan")], pa.float64())})
    out2 = float_anomaly_profile(t, ["y"]).iloc[0]
    assert out2.n_null == 1 and out2.n_nan == 1  # distinct in Arrow


def test_histogram2d_joint_drop_and_cells(ray_session):
    """Rows with NULL/out-of-range in EITHER axis drop; cell ids and
    counts are exact."""
    from data_validator_ray.pipelines.profile import histogram2d

    df = pd.DataFrame(
        {
            "x": [0.5, 1.5, 1.5, 3.9, None, 0.5, -1.0, 0.5],
            "y": [0.5, 0.5, 1.5, 1.9, 0.5, None, 0.5, 99.0],
        }
    )
    out = (
        histogram2d(df, "x", "y", x_lo=0, x_hi=4, y_lo=0, y_hi=2,
                    n_bins_x=4, n_bins_y=2)
        .to_pandas()
        .sort_values(["bin_x", "bin_y"])
        .reset_index(drop=True)
    )
    got = {(r.bin_x, r.bin_y): r.n for r in out.itertuples()}
    assert got == {(0, 0): 1, (1, 0): 1, (1, 1): 1, (3, 1): 1}
