"""Round-3 session-5 operators: chunking, embedding outliers, skyline,
per-key ACF, monotonic rule (sf0.01 parity lives in test_oracle_parity)."""

import numpy as np
import pandas as pd
import pytest

from data_validator_ray.config import ValidationRule
from data_validator_ray.validator import RayDataValidator
from data_validator_ray.config import ValidationConfig


def test_chunk_tokens_boundaries(ray_session):
    from data_validator_ray.pipelines.text import chunk_tokens

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "a b c",                      # n < window → 1 chunk
                "a b c d",                    # n == window → 1 chunk
                "a b c d e",                  # n == window+1 → 2 chunks
                "",                            # '' splits to [''] → 1 token
                None,                          # NULL → no chunks
            ],
        }
    )
    out = (
        chunk_tokens(docs, window=4, stride=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    got = list(map(tuple, out[["doc_id", "chunk_id", "n_tokens", "chunk_text"]].to_numpy()))
    assert got == [
        (1, 0, 3, "a b c"),
        (2, 0, 4, "a b c d"),
        (3, 0, 4, "a b c d"),
        (3, 1, 3, "c d e"),
        (4, 0, 1, ""),
    ]


def test_chunk_tokens_overlap_reconstruction(ray_session):
    from data_validator_ray.pipelines.text import chunk_tokens

    text = " ".join(str(i) for i in range(25))
    docs = pd.DataFrame({"doc_id": [7], "text": [text]})
    out = (
        chunk_tokens(docs, window=10, stride=6)
        .to_pandas()
        .sort_values("chunk_id")
    )
    # starts 0,6,12,18 (24 not emitted? n=25 > w=10: ceil(15/6)+1 = 4 chunks)
    assert out["chunk_id"].tolist() == [0, 1, 2, 3]
    assert out["n_tokens"].tolist() == [10, 10, 10, 7]
    # stride-aligned reconstruction covers the doc exactly
    toks = []
    for _, row in out.iterrows():
        chunk = row["chunk_text"].split(" ")
        toks.extend(chunk if row["chunk_id"] == 0 else chunk[10 - 6:])
    assert toks == text.split(" ")


def test_pareto_frontier_hand_case(ray_session):
    from data_validator_ray.pipelines.relational import pareto_frontier

    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5, 6, 7],
            "x": [5, 5, 4, 3, 3, 1, None],
            "y": [1, 2, 9, 9, 8, 99, 5],
        }
    )
    # frontier: (5,2), (4,9), (1,99); (3,9) dominated by (4,9),
    # (5,1) by (5,2), (3,8) by (4,9); NULL never enters
    out = pareto_frontier(df, "id", "x", "y").to_pandas()
    assert sorted(out["id"].tolist()) == [2, 3, 6]


def test_pareto_duplicate_points_both_kept(ray_session):
    from data_validator_ray.pipelines.relational import pareto_frontier

    df = pd.DataFrame({"id": [1, 2, 3], "x": [5, 5, 1], "y": [7, 7, 1]})
    out = pareto_frontier(df, "id", "x", "y").to_pandas()
    assert sorted(out["id"].tolist()) == [1, 2]


def test_grouped_acf_matches_numpy(ray_session):
    from data_validator_ray.pipelines.relational import grouped_acf

    rng = np.random.RandomState(7)
    n = 40
    df = pd.DataFrame(
        {
            "k": ["a"] * n + ["b"] * n,
            "t": list(range(n)) * 2,
            "v": np.concatenate(
                [np.cumsum(rng.randn(n)), rng.randn(n)]
            ),
        }
    )
    out = grouped_acf(df, "k", ["t"], "v", max_lag=2).to_pandas()
    out = out.set_index(["k", "lag"])["acf"]
    for k in ["a", "b"]:
        v = df[df.k == k]["v"].to_numpy()
        for lag in [1, 2]:
            expect = np.corrcoef(v[:-lag], v[lag:])[0, 1]
            assert abs(out[(k, lag)] - round(expect, 6)) < 2e-6


def test_grouped_acf_null_and_short_keys(ray_session):
    from data_validator_ray.pipelines.relational import grouped_acf

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b"],
            "t": [1, 2, 3, 1],
            "v": [1.0, None, 2.0, 5.0],
        }
    )
    out = grouped_acf(df, "k", ["t"], "v", max_lag=2).to_pandas()
    # key b has no pairs → no rows; key a lag1 has 0 valid pairs →
    # no row; lag2 has exactly one pair → NULL acf (n < 2)
    rows = out.set_index(["k", "lag"])
    assert ("b", 1) not in rows.index
    assert ("a", 1) not in rows.index
    assert np.isnan(rows.loc[("a", 2), "acf"])


def _mono_counts(df, ray_session_unused, **params):
    import ray.data

    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "t", "rules": [
            {"name": "m", "rule_type": "monotonic",
             "column": params.pop("column", "v"), "parameters": params},
        ]}],
    )
    v = RayDataValidator(cfg)
    s = v.validate_table(df, "t")
    r = s.results[0]
    return r.total_count, r.failed_count, r.message


def test_monotonic_rule_directions(ray_session):
    df = pd.DataFrame(
        {
            "k": ["a"] * 4 + ["b"] * 3,
            "o": [1, 2, 3, 4, 1, 2, 3],
            "v": [1.0, 2.0, 2.0, 1.5, 3.0, None, 2.0],
        }
    )
    # non_decreasing: a: 1.5<2.0 → 1; b: NULL shields both pairs → 0
    total, failed, _ = _mono_counts(
        df, None, keys=["k"], order_by=["o"], direction="non_decreasing"
    )
    assert (total, failed) == (7, 1)
    # strict_increasing adds the 2.0 <= 2.0 tie in key a
    total, failed, _ = _mono_counts(
        df, None, keys=["k"], order_by=["o"], direction="strict_increasing"
    )
    assert (total, failed) == (7, 2)


def test_monotonic_rule_null_key_out_of_scope(ray_session):
    df = pd.DataFrame(
        {
            "k": ["a", "a", None],
            "o": [1, 2, 3],
            "v": [2.0, 1.0, 0.0],
        }
    )
    total, failed, _ = _mono_counts(
        df, None, keys=["k"], order_by=["o"], direction="non_decreasing"
    )
    assert (total, failed) == (2, 1)


def test_monotonic_rule_requires_keys_and_order(ray_session):
    df = pd.DataFrame({"k": ["a"], "o": [1], "v": [1.0]})
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "t", "rules": [
            {"name": "m", "rule_type": "monotonic", "column": "v",
             "parameters": {"order_by": ["o"]}},
        ]}],
    )
    v = RayDataValidator(cfg)
    s = v.validate_table(df, "t")
    r = s.results[0]
    assert not r.passed and r.total_count == -1
    assert "keys" in r.message


def test_embedding_outliers_planted(ray_session):
    from data_validator_ray.pipelines.similarity import (
        embedding_outlier_scores,
    )

    rng = np.random.RandomState(3)
    base = rng.randn(50, 8) + 5.0          # tight cluster
    outlier = -50.0 * np.ones((1, 8))       # far away
    M = np.vstack([base, outlier])
    df = pd.DataFrame(
        {"vec_id": range(51), "embedding": [list(r) for r in M]}
    )
    out = embedding_outlier_scores(df).to_pandas()
    scores = out.set_index("vec_id")["cos_to_centroid"]
    assert scores.loc[50] == scores.min()
    assert scores.drop(50).min() > scores.loc[50] + 0.5


def test_phrase_search_overlapping_matches(ray_session, tmp_path):
    from data_validator_ray.pipelines.search import (
        build_positional_index,
        phrase_search,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a a a",          # overlapping 'a a' twice
                "x a a y a a",    # twice, non-adjacent
                "a b a",          # zero
                "b a a",          # once
            ],
        }
    )
    idx = str(tmp_path / "pidx")
    build_positional_index(docs, idx, num_shards=4)
    out = (
        phrase_search(idx, ["a", "a"])
        .to_pandas()
        .set_index("doc_id")["n_matches"]
    )
    assert out.to_dict() == {1: 2, 2: 2, 4: 1}

    three = phrase_search(idx, ["a", "a", "y"]).to_pandas()
    assert list(map(tuple, three.to_numpy())) == [(2, 1)]


def test_bloom_prefilter_join_equals_hash_join(ray_session):
    from data_validator_ray.pipelines.relational import (
        bloom_prefilter_join,
        hash_join,
    )

    rng = np.random.RandomState(11)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 500, 3000),
            "lv": rng.randn(3000).round(3),
        }
    )
    left.loc[5, "k"] = None  # NULL key never matches
    right = pd.DataFrame({"k": np.arange(0, 50), "rv": np.arange(50) * 2})
    kwargs = dict(
        left_key="k", right_key="k",
        left_cols=["k", "lv"], right_cols=["k", "rv"],
    )
    a = (
        bloom_prefilter_join(left, right, **kwargs)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    b = (
        hash_join(left, right, **kwargs)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    s = bloom_prefilter_join(
        left, right[["k"]],
        left_key="k", right_key="k",
        left_cols=["k", "lv"], right_cols=["k"], how="semi",
    ).to_pandas()
    assert set(s["k"].unique()) <= set(range(50))
    assert len(s) == (left["k"] < 50).sum()

    with pytest.raises(ValueError):
        bloom_prefilter_join(left, right, how="left", **kwargs)


def test_ohlc_resample_null_edges(ray_session):
    from data_validator_ray.pipelines.relational import ohlc_resample

    ts0 = pd.Timestamp("2024-01-01 00:00:00")
    df = pd.DataFrame(
        {
            "k": ["a"] * 4 + ["b"],
            "ts": [
                ts0, ts0 + pd.Timedelta("10min"),
                ts0 + pd.Timedelta("20min"), ts0 + pd.Timedelta("2h"),
                None,  # NULL ts drops
            ],
            "seq": [1, 2, 3, 4, 5],
            "v": [None, 3.0, 1.0, 7.0, 9.0],
        }
    )
    out = (
        ohlc_resample(df, "k", "ts", "v", window_seconds=3600,
                      tiebreak_cols=["seq"])
        .to_pandas()
        .sort_values(["k", "window_start"])
        .reset_index(drop=True)
    )
    assert len(out) == 2
    first = out.iloc[0]
    # open is the raw FIRST row's value (NULL), high/low skip NULLs
    assert pd.isna(first["open"])
    assert (first["high"], first["low"], first["close"],
            first["n_events"]) == (3.0, 1.0, 1.0, 3)
    second = out.iloc[1]
    assert (second["open"], second["close"], second["n_events"]) == (
        7.0, 7.0, 1,
    )


def test_grouping_sets_rejects_bad_sets(ray_session):
    from data_validator_ray.pipelines.relational import (
        grouping_sets_aggregate,
    )

    df = pd.DataFrame({"a": [1], "b": [2], "v": [1.0]})
    with pytest.raises(ValueError, match="non-key"):
        grouping_sets_aggregate(df, ["a"], "v", [["a", "b"]])
    with pytest.raises(ValueError, match="duplicate"):
        grouping_sets_aggregate(df, ["a", "b"], "v", [["a"], ["a"]])


def test_range_checksums_order_and_split_invariant(ray_session):
    from data_validator_ray.pipelines.integrity import range_checksums

    df = pd.DataFrame(
        {
            "id": [0, 1, 1001, 1002, 2500, None],
            "s": ["x", "y", "z", None, "w", "q"],
        }
    )
    a = range_checksums(df, ["id", "s"], "id", width=1000)
    # permuted rows, different batching → identical digests
    b = range_checksums(
        df.sample(frac=1.0, random_state=5).reset_index(drop=True),
        ["id", "s"], "id", width=1000, batch_size=2,
    )
    pd.testing.assert_frame_equal(a, b)
    # NULL keys → int64-min sentinel (outside the floor image, so
    # they can never merge with a genuine negative range)
    null_rid = np.iinfo(np.int64).min
    assert a["range_id"].tolist() == [null_rid, 0, 1, 2]
    assert a["n_rows"].tolist() == [1, 2, 2, 1]
    # a changed row flips exactly its range's digest
    df2 = df.copy()
    df2.loc[2, "s"] = "ZZ"
    c = range_checksums(df2, ["id", "s"], "id", width=1000)
    diff = a["checksum"] != c["checksum"]
    assert diff.tolist() == [False, False, True, False]


def test_label_encode_stability_and_nulls(ray_session):
    from data_validator_ray.pipelines.profile import label_encode

    df = pd.DataFrame({"c": ["b", "a", None, "c", "a"]})
    out = label_encode(df, "c").to_pandas()
    got = dict(zip(out["c"], out["c_idx"]))
    assert got["a"] == 0 and got["b"] == 1 and got["c"] == 2
    assert out["c_idx"].isna().sum() == 1
    # vocabulary cap fails loudly
    with pytest.raises(ValueError, match="max_vocab"):
        label_encode(
            pd.DataFrame({"c": [str(i) for i in range(10)]}),
            "c", max_vocab=5,
        ).to_pandas()


def test_target_encode_shrinkage(ray_session):
    from data_validator_ray.pipelines.profile import target_encode

    df = pd.DataFrame(
        {
            "c": ["a"] * 100 + ["b"],
            "y": [10.0] * 100 + [0.0],
        }
    )
    out = target_encode(df, "c", "y", smoothing=10.0).to_pandas()
    te = out.drop_duplicates("c").set_index("c")["c_te"]
    gm = 1000.0 / 101
    # frequent category barely shrinks; rare one pulls hard to gmean
    assert abs(te["a"] - round((1000 + 10 * gm) / 110, 6)) < 1e-9
    assert abs(te["b"] - round((0 + 10 * gm) / 11, 6)) < 1e-9


def test_group_limit_rule_semantics(ray_session):
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "t", "rules": [
            {"name": "g", "rule_type": "group_limit",
             "parameters": {"keys": ["k"], "agg": "avg",
                            "agg_column": "v", "op": "<=", "bound": 5}},
        ]}],
    )
    df = pd.DataFrame(
        {
            "k": ["a", "a", "b", "c", None],
            "v": [4.0, 4.0, 9.0, None, 100.0],
        }
    )
    v = RayDataValidator(cfg)
    r = v.validate_table(df, "t").results[0]
    # groups a (avg 4 ok), b (avg 9 viol), c (all-NULL -> never
    # satisfies); NULL key out of scope
    assert (r.total_count, r.failed_count) == (3, 2)


def test_group_limit_count_and_min(ray_session):
    df = pd.DataFrame(
        {"k": ["a"] * 3 + ["b"], "v": [1.0, 2.0, 3.0, -7.0]}
    )

    def run(**params):
        cfg = ValidationConfig(
            engine={"type": "ray"},
            tables=[{"name": "t", "rules": [
                {"name": "g", "rule_type": "group_limit",
                 "parameters": params},
            ]}],
        )
        r = RayDataValidator(cfg).validate_table(df, "t").results[0]
        return r.total_count, r.failed_count

    assert run(keys=["k"], agg="count", op="<=", bound=2) == (2, 1)
    assert run(keys=["k"], agg="min", agg_column="v",
               op=">=", bound=0) == (2, 1)


def test_correlation_rule_verdict(ray_session):
    rng = np.random.RandomState(5)
    x = rng.randn(500)
    df = pd.DataFrame({"x": x, "y": 2 * x + rng.randn(500) * 0.1})
    df.loc[3, "y"] = None  # pairwise-complete

    def run(lo, hi):
        cfg = ValidationConfig(
            engine={"type": "ray"},
            tables=[{"name": "t", "rules": [
                {"name": "c", "rule_type": "correlation", "column": "x",
                 "parameters": {"other": "y", "min_value": lo,
                                "max_value": hi}},
            ]}],
        )
        r = RayDataValidator(cfg).validate_table(df, "t").results[0]
        return r.passed, r.metadata["correlation"], r.metadata["n_pairs"]

    ok, corr, n = run(0.9, 1.0)
    assert ok and n == 499
    m = df.dropna()
    expect = np.corrcoef(m["x"], m["y"])[0, 1]
    assert abs(corr - expect) < 1e-12
    bad, _, _ = run(-1.0, 0.5)
    assert not bad


def test_bucketed_join_layout_guards(ray_session, tmp_path):
    from data_validator_ray.pipelines.layout import (
        bucketed_join,
        write_bucketed,
    )

    left = pd.DataFrame(
        {"k": pd.array([1, 2, 3, None], dtype="Int64"),
         "lv": [10, 20, 30, 40]}
    )
    right = pd.DataFrame({"k": [2, 3, 3, 4], "rv": ["a", "b", "c", "d"]})
    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed(left, ld, "k", num_buckets=4)
    write_bucketed(right, rd, "k", num_buckets=4)
    out = (
        bucketed_join(ld, rd, left_key="k", right_key="k")
        .to_pandas()
        .sort_values(["k", "rv"])
        .reset_index(drop=True)
    )
    # NULL keys never match; duplicate right keys cross-product
    assert list(map(tuple, out[["k", "lv", "rv"]].to_numpy())) == [
        (2, 20, "a"), (3, 30, "b"), (3, 30, "c"),
    ]

    rd8 = str(tmp_path / "r8")
    write_bucketed(right, rd8, "k", num_buckets=8)
    with pytest.raises(ValueError, match="num_buckets"):
        bucketed_join(ld, rd8, left_key="k", right_key="k")
    with pytest.raises(ValueError, match="bucketing keys"):
        bucketed_join(ld, rd, left_key="lv", right_key="k")
    # dtype-mismatched layouts refuse loudly (hash64 is
    # dtype-sensitive; silent bucket misalignment would lose rows)
    rf = str(tmp_path / "rf")
    write_bucketed(
        pd.DataFrame({"k": [2.0, 3.0], "rv": ["x", "y"]}),
        rf, "k", num_buckets=4,
    )
    with pytest.raises(ValueError, match="key types"):
        bucketed_join(ld, rf, left_key="k", right_key="k")


def test_ohlc_resample_pre_epoch_floor(ray_session):
    """Pre-epoch (negative int64) timestamps must FLOOR into their
    window (DuckDB time_bucket parity) — truncate-toward-zero would
    put 1969-12-31 23:59:59 one window too high."""
    from data_validator_ray.pipelines.relational import ohlc_resample

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a"],
            "ts": pd.to_datetime(
                [
                    "1969-12-31 23:59:59",   # -1 s  -> 23:00 window
                    "1969-12-31 23:00:00",   # exact edge
                    "1970-01-01 00:00:01",   # +1 s  -> 00:00 window
                ]
            ),
            "v": [2.0, 1.0, 5.0],
        }
    )
    out = (
        ohlc_resample(df, "k", "ts", "v", window_seconds=3600)
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    assert out["window_start"].tolist() == [
        pd.Timestamp("1969-12-31 23:00:00"),
        pd.Timestamp("1970-01-01 00:00:00"),
    ]
    assert out["n_events"].tolist() == [2, 1]
    assert out.iloc[0]["open"] == 1.0 and out.iloc[0]["close"] == 2.0


def test_rolling_period_distinct_pre_epoch_floor(ray_session):
    """A pre-epoch event must bucket to ITS OWN day (floor), not to
    day 0."""
    import ray as _ray

    from data_validator_ray.pipelines.relational import (
        rolling_period_distinct,
    )

    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["1969-12-31 12:00:00", "1970-01-01 12:00:00"]
            ),
            "u": ["x", "x"],
        }
    )
    out = (
        rolling_period_distinct(
            _ray.data.from_pandas(df), "ts", "u", window_periods=1
        )
        .to_pandas()
        .sort_values("period_start")
        .reset_index(drop=True)
    )
    # two distinct days, one distinct user each
    assert len(out) == 2
    assert out.iloc[0]["period_start"] == pd.Timestamp("1969-12-31")
    assert out.iloc[1]["period_start"] == pd.Timestamp("1970-01-01")


def test_windowed_aggregate_pre_epoch_floor(ray_session):
    """Tumbling windows floor toward -inf: a pre-epoch event lands in
    ITS OWN hour window (DuckDB time_bucket parity), not in hour 0."""
    import ray as _ray

    from data_validator_ray.pipelines.relational import windowed_aggregate

    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["1969-12-31 23:59:59", "1970-01-01 00:00:01"]
            ),
            "v": [1.0, 2.0],
        }
    )
    out = (
        windowed_aggregate(
            _ray.data.from_pandas(df), "ts", "v", window_seconds=3600
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    assert out.iloc[0]["window_start"] == pd.Timestamp("1969-12-31 23:00:00")
    assert out.iloc[1]["window_start"] == pd.Timestamp("1970-01-01 00:00:00")
    assert out["n_events"].tolist() == [1, 1]
