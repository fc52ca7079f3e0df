"""Windowed aggregates + as-of join: semantics pinned against pandas
references on adversarial fixtures (nulls, unmatched keys, ties,
direction)."""

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from data_validator_ray.pipelines.relational import asof_join, windowed_aggregate


@pytest.fixture()
def events_df():
    base = datetime(2024, 1, 1)
    return pd.DataFrame(
        {
            "ts": [
                base, base + timedelta(minutes=30),
                base + timedelta(hours=1, minutes=5),
                base + timedelta(hours=2), None,
            ],
            "kind": ["a", "b", "a", "a", "a"],
            "value": [1.0, 2.0, None, 4.0, 9.0],
        }
    )


def test_windowed_aggregate_semantics(ray_session, events_df):
    out = (
        windowed_aggregate(
            ray.data.from_pandas(events_df), "ts", "value",
            key_cols=["kind"], window_seconds=3600,
        )
        .to_pandas()
        .sort_values(["window_start", "kind"])
        .reset_index(drop=True)
    )
    # NULL ts dropped → 3 windows: h0 has a+b, h1 has a, h2 has a
    assert len(out) == 4
    h0a = out[(out.kind == "a") & (out.window_start == datetime(2024, 1, 1))].iloc[0]
    assert h0a.n_events == 1 and h0a.value_sum == 1.0
    h1a = out[(out.window_start == datetime(2024, 1, 1, 1))].iloc[0]
    # NULL value: counts as an event, excluded from value stats
    assert h1a.n_events == 1
    assert pd.isna(h1a.value_sum) or h1a.value_sum == 0  # no non-null values
    h2a = out[(out.window_start == datetime(2024, 1, 1, 2))].iloc[0]
    assert h2a.value_avg == 4.0 and h2a.value_min == 4.0


def test_windowed_aggregate_partials_merge(ray_session):
    """Tiny batches must give the same result as one batch (mergeable
    partial proof)."""
    rng = np.random.default_rng(0)
    n = 5000
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
            "k": rng.choice(["x", "y", "z"], n),
            "v": rng.normal(size=n),
        }
    )
    a = (
        windowed_aggregate(ray.data.from_pandas(df), "ts", "v",
                           key_cols=["k"], batch_size=64)
        .to_pandas().sort_values(["window_start", "k"]).reset_index(drop=True)
    )
    b = (
        windowed_aggregate(ray.data.from_pandas(df), "ts", "v",
                           key_cols=["k"], batch_size=100000)
        .to_pandas().sort_values(["window_start", "k"]).reset_index(drop=True)
    )
    assert a.n_events.tolist() == b.n_events.tolist()
    assert np.allclose(a.value_sum, b.value_sum)
    assert np.allclose(a.value_min, b.value_min)


@pytest.fixture()
def asof_fixture():
    base = datetime(2024, 1, 1)
    left = pd.DataFrame(
        {
            "k": pd.array([1, 1, 2, 3, None, 2], dtype="Int64"),
            "lts": [
                base + timedelta(hours=2), base + timedelta(hours=5),
                base + timedelta(hours=1), base + timedelta(hours=9),
                base, base - timedelta(hours=5),
            ],
            "lid": [10, 11, 12, 13, 14, 15],
        }
    )
    right = pd.DataFrame(
        {
            "rk": [1, 1, 2, 9],
            "rts": [base + timedelta(hours=1), base + timedelta(hours=4),
                    base, base],
            "price": [100.0, 200.0, 50.0, 7.0],
        }
    )
    return left, right


def test_asof_join_backward(ray_session, asof_fixture):
    left, right = asof_fixture
    out = (
        asof_join(
            left, right,
            left_key="k", right_key="rk", left_ts="lts", right_ts="rts",
            left_cols=["lid"], right_cols=["price"], num_buckets=4,
        )
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    got = dict(zip(out.lid, out.price))
    # lid 10 (k=1, h2) → right@h1 (100); lid 11 (h5) → right@h4 (200);
    # lid 12 (k=2, h1) → right@h0 (50); lid 13 (k=3) unmatched → dropped;
    # lid 14 null key dropped; lid 15 (k=2, before any right) dropped
    assert got == {10: 100.0, 11: 200.0, 12: 50.0}


def test_asof_join_forward(ray_session, asof_fixture):
    left, right = asof_fixture
    out = (
        asof_join(
            left, right,
            left_key="k", right_key="rk", left_ts="lts", right_ts="rts",
            left_cols=["lid"], right_cols=["price"],
            direction="forward", num_buckets=4,
        )
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    got = dict(zip(out.lid, out.price))
    # forward: earliest right at/after left ts
    # lid 10 (h2) → right@h4 (200); lid 11 (h5) → none; lid 12 (h1) → none
    # (right k=2 only at h0); lid 15 (h-5) → right@h0 (50)
    assert got == {10: 200.0, 15: 50.0}


def test_range_join_fast_and_general_paths(ray_session):
    from data_validator_ray.pipelines.relational import range_join_broadcast

    df = pd.DataFrame({"id": [1, 2, 3, 4, 5, 6],
                       "v": [5.0, 15.0, None, 55.0, 200.0, -1.0]})
    bands = pd.DataFrame(
        {"lo": [0.0, 10.0, 50.0], "hi": [10.0, 50.0, 100.0],
         "band": ["low", "mid", "high"]}
    )
    out = range_join_broadcast(
        ray.data.from_pandas(df), bands, value_col="v"
    ).to_pandas()
    # nulls, below-range and above-range rows drop (inner, [lo,hi))
    assert sorted(zip(out.id, out.band)) == [(1, "low"), (2, "mid"), (4, "high")]

    # overlapping intervals → one row per match, deterministic order
    ov = pd.DataFrame({"lo": [0.0, 5.0], "hi": [20.0, 60.0], "band": ["a", "b"]})
    out2 = range_join_broadcast(
        ray.data.from_pandas(df), ov, value_col="v"
    ).to_pandas()
    assert sorted(zip(out2.id, out2.band)) == [
        (1, "a"), (1, "b"), (2, "a"), (2, "b"), (4, "b")
    ]
    # boundary: value == hi of one band == lo of next → next band only
    edge = pd.DataFrame({"id": [9], "v": [10.0]})
    out3 = range_join_broadcast(
        ray.data.from_pandas(edge), bands, value_col="v"
    ).to_pandas()
    assert list(out3.band) == ["mid"]


# --------------------------------------------------------------------- #
# sessionize                                                            #
# --------------------------------------------------------------------- #

def test_sessionize_gap_boundaries(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from data_validator_ray.pipelines.relational import sessionize

    base = np.datetime64("2024-01-01T00:00:00", "us")
    mins = np.timedelta64(60, "s")
    tbl = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
        "ts": pa.array([
            base,                    # u1 s1
            base + 30 * mins,        # gap == 1800s → SAME session
            base + 30 * mins + np.timedelta64(1800, "s")
                 + np.timedelta64(1, "us"),  # gap > 1800s → new session
            base + 200 * mins,       # u1 s3? gap from prev ~109min → s3
            base,                    # u2 s1
            base + 31 * mins,        # gap 1860s > 1800 → u2 s2
            None,                    # NULL ts dropped
        ], pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
    })
    out = (
        sessionize(tbl, "user_id", "ts", "event_id", gap_seconds=1800)
        .to_pandas().sort_values(["user_id", "session_seq"])
        .reset_index(drop=True)
    )
    got = list(zip(out["user_id"], out["session_seq"], out["n_events"]))
    assert got == [(1, 1, 2), (1, 2, 1), (1, 3, 1), (2, 1, 1), (2, 2, 1)]
    # session 1 of user 1 spans the two grouped events
    s11 = out[(out["user_id"] == 1) & (out["session_seq"] == 1)].iloc[0]
    assert s11["session_start"] == pd.Timestamp("2024-01-01 00:00:00")
    assert s11["session_end"] == pd.Timestamp("2024-01-01 00:30:00")


def test_sessionize_deterministic_across_buckets(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from data_validator_ray.pipelines.relational import sessionize

    rng = np.random.default_rng(11)
    n = 2000
    base = np.datetime64("2024-01-01", "us")
    tbl = pa.table({
        "user_id": pa.array(rng.integers(0, 50, n), pa.int64()),
        "ts": pa.array(
            base + rng.integers(0, 86_400, n) * np.timedelta64(1_000_000, "us"),
            pa.timestamp("us")),
        "event_id": pa.array(range(n), pa.int64()),
    })
    a = sessionize(tbl, "user_id", "ts", "event_id", num_buckets=7)\
        .to_pandas().sort_values(["user_id", "session_seq"]).reset_index(drop=True)
    b = sessionize(tbl, "user_id", "ts", "event_id", num_buckets=64)\
        .to_pandas().sort_values(["user_id", "session_seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_grouped_approx_distinct_accuracy(ray_session):
    import numpy as np
    import pyarrow as pa

    from data_validator_ray.pipelines.relational import grouped_approx_distinct

    rng = np.random.default_rng(5)
    n = 60_000
    groups = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    # group-specific distinct cardinalities: a ~1000, b ~5000, c ~200
    card = {"a": 1000, "b": 5000, "c": 200}
    vals = np.array([rng.integers(0, card[g]) for g in groups], np.int64)
    tbl = pa.table({
        "g": pa.array(groups), "v": pa.array(vals, pa.int64()),
    })
    out = grouped_approx_distinct(tbl, "g", "v").to_pandas()
    got = dict(zip(out["g"], out["approx_distinct"]))
    import pandas as pd
    exact = pd.DataFrame({"g": groups, "v": vals}).groupby("g")["v"].nunique()
    for g in ["a", "b", "c"]:
        assert abs(got[g] - exact[g]) / exact[g] < 0.05, (g, got[g], exact[g])


def test_grouped_approx_distinct_null_values_ignored(ray_session):
    import pyarrow as pa

    from data_validator_ray.pipelines.relational import grouped_approx_distinct

    tbl = pa.table({
        "g": pa.array(["x", "x", "x"]),
        "v": pa.array([1, None, 1], pa.int64()),
    })
    out = grouped_approx_distinct(tbl, "g", "v").to_pandas()
    assert out["approx_distinct"].tolist() == [1]


def test_broadcast_join_inner_and_left(ray_session):
    import pyarrow as pa
    import pytest as _pytest

    from data_validator_ray.pipelines.relational import broadcast_join

    left = pa.table({
        "k": pa.array([1, 2, 3, None], pa.int64()),
        "x": pa.array([10, 20, 30, 40], pa.int64()),
    })
    right = pa.table({
        "rk": pa.array([1, 3, 5], pa.int64()),
        "name": pa.array(["a", "c", "e"]),
    })
    inner = broadcast_join(left, right, on="k", right_on="rk")\
        .to_pandas().sort_values("k")
    assert inner["k"].tolist() == [1, 3]
    assert inner["name"].tolist() == ["a", "c"]

    lj = broadcast_join(left, right, on="k", right_on="rk", how="left")\
        .to_pandas().sort_values("x")
    assert lj["name"].tolist()[0] == "a"
    assert lj["name"].isna().tolist() == [False, True, False, True]

    dup = pa.table({
        "rk": pa.array([1, 1], pa.int64()),
        "name": pa.array(["a", "b"]),
    })
    with _pytest.raises(Exception):
        broadcast_join(left, dup, on="k", right_on="rk").to_pandas()


def test_grouped_quantiles_accuracy_and_determinism(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from data_validator_ray.pipelines.relational import grouped_quantiles

    rng = np.random.default_rng(13)
    n = 40_000
    g = np.array(["a", "b"])[rng.integers(0, 2, n)]
    v = np.where(g == "a", rng.normal(100, 10, n), rng.exponential(50, n))
    tbl = pa.table({"g": pa.array(g), "v": pa.array(v, pa.float64())})
    out = grouped_quantiles(tbl, "g", "v").to_pandas().sort_values("g")
    ref = pd.DataFrame({"g": g, "v": v}).groupby("g")["v"]
    for q, c in [(0.5, "p50"), (0.95, "p95"), (0.99, "p99")]:
        exact = ref.quantile(q)
        for grp in ["a", "b"]:
            got = float(out.loc[out["g"] == grp, c].iloc[0])
            spread = ref.quantile(0.995)[grp] - ref.quantile(0.005)[grp]
            assert abs(got - exact[grp]) < 0.05 * spread, (grp, c)
    out2 = grouped_quantiles(tbl, "g", "v").to_pandas().sort_values("g")
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), out2.reset_index(drop=True)
    )


def test_hopping_window_covering_count(ray_session):
    import numpy as np
    import pyarrow as pa

    from data_validator_ray.pipelines.relational import (
        hopping_window_aggregate,
    )

    base = np.datetime64("2024-01-01T02:07:00", "us")
    tbl = pa.table({
        "ts": pa.array([base, None], pa.timestamp("us")),
        "value": pa.array([2.0, 9.0], pa.float64()),
    })
    out = (
        hopping_window_aggregate(
            tbl, "ts", "value", window_seconds=3600, hop_seconds=900
        )
        .to_pandas().sort_values("window_start").reset_index(drop=True)
    )
    # one event → exactly window/hop = 4 covering windows; NULL ts drops
    assert len(out) == 4
    assert out["n_events"].tolist() == [1, 1, 1, 1]
    assert out["value_sum"].tolist() == [2.0] * 4
    # windows step by 15 min and the latest one starts at 02:00
    starts = out["window_start"].astype("datetime64[us]")
    assert str(starts.iloc[-1]) == "2024-01-01 02:00:00"
    deltas = np.diff(starts.to_numpy()).astype("timedelta64[s]")
    assert (deltas == np.timedelta64(900, "s")).all()


def test_anti_join_broadcast_semantics(ray_session):
    import pyarrow as pa

    from data_validator_ray.pipelines.relational import anti_join_broadcast

    src = pa.table({
        "k": pa.array([1, 2, 3, None], pa.int64()),
        "v": pa.array(["a", "b", "c", "d"]),
    })
    block = pa.table({"bk": pa.array([2, None], pa.int64())})
    out = (
        anti_join_broadcast(src, block, key_col="k", block_key="bk")
        .to_pandas().sort_values("v").reset_index(drop=True)
    )
    # k=2 blocked; NULL source key KEPT (anti-join semantics, not the
    # three-valued NOT IN); NULL blocklist entry ignored
    assert out["v"].tolist() == ["a", "c", "d"]
    # empty blocklist keeps everything
    empty = pa.table({"bk": pa.array([], pa.int64())})
    out2 = anti_join_broadcast(src, empty, key_col="k", block_key="bk")
    assert out2.count() == 4


def test_anti_join_broadcast_string_keys(ray_session):
    import pyarrow as pa

    from data_validator_ray.pipelines.relational import anti_join_broadcast

    src = pa.table({"d": pa.array(["x.com", "y.com", "z.com"])})
    block = pa.table({"d": pa.array(["y.com"])})
    out = anti_join_broadcast(src, block, key_col="d").to_pandas()
    assert sorted(out["d"]) == ["x.com", "z.com"]


def test_pivot_counts(ray_session):
    import pyarrow as pa

    from data_validator_ray.pipelines.relational import pivot_counts

    tbl = pa.table({
        "u": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "t": pa.array(["a", "a", "b", "b", None, "zzz"]),
    })
    out = (
        pivot_counts(tbl, "u", "t", ["a", "b"])
        .to_pandas().sort_values("u").reset_index(drop=True)
    )
    assert out["u"].tolist() == [1, 2, 3]
    assert out["n_a"].tolist() == [2, 0, 0]
    assert out["n_b"].tolist() == [1, 1, 0]  # NULL and unlisted ignored


def test_hash_join_cross_product_and_nulls(ray_session):
    import pyarrow as pa

    from data_validator_ray.pipelines.relational import hash_join

    left = pa.table({
        "lk": pa.array([1, 1, 2, 3, None], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d", "e"]),
    })
    right = pa.table({
        "rk": pa.array([1, 1, 2, None], pa.int64()),
        "rv": pa.array([10.0, 20.0, 30.0, 99.0], pa.float64()),
    })
    out = (
        hash_join(
            left, right,
            left_key="lk", right_key="rk",
            left_cols=["lv"], right_cols=["rv"],
            num_buckets=4,
        )
        .to_pandas().sort_values(["lk", "lv", "rv"]).reset_index(drop=True)
    )
    # key 1: 2×2 cross product; key 2: 1×1; key 3 + NULLs: no match
    assert out["lk"].tolist() == [1, 1, 1, 1, 2]
    assert out["lv"].tolist() == ["a", "a", "b", "b", "c"]
    assert out["rv"].tolist() == [10.0, 20.0, 10.0, 20.0, 30.0]


def test_hash_join_salted_matches_unsalted_on_skew(ray_session):
    import numpy as np
    import pyarrow as pa

    from data_validator_ray.pipelines.relational import hash_join

    rng = np.random.default_rng(3)
    # one pathologically hot key (80% of rows) + a cold tail
    lk = np.where(rng.random(5000) < 0.8, 7, rng.integers(100, 200, 5000))
    left = pa.table({
        "lk": pa.array(lk, pa.int64()),
        "lv": pa.array(np.arange(5000), pa.int64()),
    })
    rk = np.array([7, 7, 7] + list(range(100, 200)), np.int64)
    right = pa.table({
        "rk": pa.array(rk, pa.int64()),
        "rv": pa.array(np.arange(len(rk)) * 1.5, pa.float64()),
    })
    kw = dict(left_key="lk", right_key="rk",
              left_cols=["lv"], right_cols=["rv"], num_buckets=8)
    base = (
        hash_join(left, right, **kw)
        .to_pandas().sort_values(["lk", "lv", "rv"]).reset_index(drop=True)
    )
    for hot in ([7], "auto"):
        salted = (
            hash_join(left, right, salt=4, hot_keys=hot, **kw)
            .to_pandas().sort_values(["lk", "lv", "rv"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(salted, base)
    # exact expectation from pandas
    exp = (
        left.to_pandas().rename(columns={"lk": "k"})
        .merge(right.to_pandas().rename(columns={"rk": "k"}), on="k")
        .rename(columns={"k": "lk"})
        .sort_values(["lk", "lv", "rv"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        base, exp[base.columns.tolist()], check_dtype=False
    )


def test_hash_join_salted_semi_anti_left_on_skew(ray_session):
    """salt > 1 now covers the filtering joins (membership tests —
    replicated right rows can't multiply output) and LEFT (preserved-
    side rows only); each must be value-identical to unsalted. FULL
    stays refused with the documented reason."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest

    from data_validator_ray.pipelines.relational import hash_join

    rng = np.random.default_rng(11)
    lk = np.where(rng.random(4000) < 0.8, 7, rng.integers(100, 200, 4000))
    left = pa.table({
        "lk": pa.array(lk, pa.int64()),
        "lv": pa.array(np.arange(4000), pa.int64()),
    })
    # right contains the hot key + half the cold range (so semi/anti
    # and left-unmatched paths all carry rows), with duplicates
    rk = np.array([7, 7] + list(range(100, 150)), np.int64)
    right = pa.table({
        "rk": pa.array(rk, pa.int64()),
        "rv": pa.array(np.arange(len(rk)) * 2.0, pa.float64()),
    })

    for how, rcols in (("semi", []), ("anti", []), ("left", ["rv"])):
        kw = dict(left_key="lk", right_key="rk", left_cols=["lv"],
                  right_cols=rcols, num_buckets=8, how=how)
        sort_cols = ["lk", "lv"] + rcols
        base = (
            hash_join(left, right, **kw)
            .to_pandas().sort_values(sort_cols).reset_index(drop=True)
        )
        for hot in ([7], "auto"):
            salted = (
                hash_join(left, right, salt=4, hot_keys=hot, **kw)
                .to_pandas().sort_values(sort_cols).reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(salted, base)

    # semi+anti partition the left rows exactly
    n_semi = hash_join(left, right, left_key="lk", right_key="rk",
                       left_cols=["lv"], right_cols=[], num_buckets=8,
                       how="semi", salt=4, hot_keys=[7]).count()
    n_anti = hash_join(left, right, left_key="lk", right_key="rk",
                       left_cols=["lv"], right_cols=[], num_buckets=8,
                       how="anti", salt=4, hot_keys=[7]).count()
    assert n_semi + n_anti == 4000

    with _pytest.raises(ValueError, match="full"):
        hash_join(left, right, left_key="lk", right_key="rk",
                  left_cols=["lv"], right_cols=["rv"], how="full",
                  salt=4, hot_keys=[7])


def test_hash_join_outer_modes_match_pandas(ray_session):
    import pyarrow as pa

    from data_validator_ray.pipelines.relational import hash_join

    left = pa.table({
        "lk": pa.array([1, 1, 2, 3, None, None], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d", "e", "f"]),
    })
    right = pa.table({
        "rk": pa.array([1, 2, 2, 9, None], pa.int64()),
        "rv": pa.array([10.0, 20.0, 30.0, 99.0, -1.0], pa.float64()),
    })

    def run(how):
        return (
            hash_join(left, right, left_key="lk", right_key="rk",
                      left_cols=["lv"], right_cols=["rv"],
                      num_buckets=4, how=how)
            .to_pandas()
            .sort_values(["lk", "lv", "rv"], na_position="last")
            .reset_index(drop=True)
        )

    # LEFT: keys 1,1,2 match; 3 unmatched; NULL-key left rows preserved
    lout = run("left")
    assert len(lout) == 2 + 2 + 1 + 2  # 1×(1,1) + 1×(1,1) ... see below
    # key 1 two left rows × one right row = 2; key 2 one left × two right = 2;
    # key 3 unmatched = 1; two NULL-key left rows = 2
    assert lout["rv"].isna().sum() == 3
    assert set(lout.loc[lout.lv == "d", "rv"].isna()) == {True}

    # FULL: adds unmatched right (rk=9 → key coalesced, rk NULL row)
    fout = run("full")
    assert len(fout) == len(lout) + 2
    assert 9 in fout["lk"].dropna().astype(int).tolist()
    # unmatched-right NULL-key row: lv NULL, rv == -1
    assert ((fout["lv"].isna()) & (fout["rv"] == -1.0)).sum() == 1

    with _pytest_raises_value_error():
        hash_join(left, right, left_key="lk", right_key="rk",
                  left_cols=["lv"], right_cols=["rv"], how="cross")


def _pytest_raises_value_error():
    import pytest as _pytest

    return _pytest.raises(ValueError)


def test_hash_join_salt_requires_hot_keys(ray_session):
    import pyarrow as pa
    import pytest as _pytest

    from data_validator_ray.pipelines.relational import hash_join

    t = pa.table({"k": pa.array([1], pa.int64()),
                  "v": pa.array([1], pa.int64())})
    with _pytest.raises(ValueError):
        hash_join(t, t, left_key="k", right_key="k",
                  left_cols=["v"], right_cols=[], salt=4)


def test_hash_join_rejects_column_collision(ray_session):
    import pyarrow as pa
    import pytest as _pytest

    from data_validator_ray.pipelines.relational import hash_join

    t = pa.table({"k": pa.array([1], pa.int64()),
                  "v": pa.array([1], pa.int64())})
    with _pytest.raises(ValueError):
        hash_join(t, t, left_key="k", right_key="k",
                  left_cols=["v"], right_cols=["v"])


def test_hopping_window_per_key(ray_session):
    import numpy as np
    import pyarrow as pa

    from data_validator_ray.pipelines.relational import (
        hopping_window_aggregate,
    )

    base = np.datetime64("2024-01-01T02:07:00", "us")
    tbl = pa.table({
        "user_id": pa.array([7, 7, 8, 8], pa.int64()),
        # two users share one timestamp; user 7 has a second event in
        # a later hop, user 8 a NULL ts that must drop
        "ts": pa.array(
            [base, base + np.timedelta64(900, "s"), base, None],
            pa.timestamp("us"),
        ),
        "value": pa.array([2.0, 3.0, 5.0, 9.0], pa.float64()),
    })
    out = (
        hopping_window_aggregate(
            tbl, "ts", "value",
            window_seconds=3600, hop_seconds=900, key_cols=["user_id"],
        )
        .to_pandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    # user 8: one event → 4 windows of 1 event each
    u8 = out[out["user_id"] == 8]
    assert len(u8) == 4 and u8["n_events"].tolist() == [1] * 4
    assert u8["value_sum"].tolist() == [5.0] * 4
    # user 7: two events one hop apart → 5 distinct windows; the 3
    # overlapping middle windows hold both events
    u7 = out[out["user_id"] == 7]
    assert len(u7) == 5
    assert u7["n_events"].tolist() == [1, 2, 2, 2, 1]
    assert u7["value_sum"].tolist() == [2.0, 5.0, 5.0, 5.0, 3.0]
    # keyless call unchanged: global windows sum both users
    g = (
        hopping_window_aggregate(
            tbl, "ts", "value", window_seconds=3600, hop_seconds=900
        )
        .to_pandas().sort_values("window_start").reset_index(drop=True)
    )
    assert g["n_events"].sum() == u7["n_events"].sum() + u8["n_events"].sum()


def test_hopping_window_rejects_non_divisible(ray_session):
    import pytest as _pytest
    import pyarrow as pa

    from data_validator_ray.pipelines.relational import (
        hopping_window_aggregate,
    )

    with _pytest.raises(ValueError):
        hopping_window_aggregate(
            pa.table({"ts": pa.array([], pa.timestamp("us")),
                      "value": pa.array([], pa.float64())}),
            "ts", "value", window_seconds=3600, hop_seconds=1000,
        )


def test_grouped_exact_quantiles_matches_duckdb(ray_session):
    """Bit-exact parity with quantile_cont, incl. NULL handling."""
    import duckdb

    from data_validator_ray.pipelines.relational import grouped_exact_quantiles

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], 200),
            "v": rng.normal(size=200),
        }
    )
    df.loc[df.index[:10], "v"] = None  # some null values
    df = pd.concat(
        [df, pd.DataFrame({"g": ["allnull", "allnull"], "v": [None, None]})],
        ignore_index=True,
    )
    out = (
        grouped_exact_quantiles(
            ray.data.from_pandas(df), "g", "v", quantiles=(0.25, 0.5, 0.9)
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    ref = con.execute(
        "SELECT g, quantile_cont(v, 0.25) p25, quantile_cont(v, 0.5) p50,"
        " quantile_cont(v, 0.9) p90 FROM t GROUP BY g ORDER BY g"
    ).df()
    assert list(out.g) == list(ref.g)
    for mine, theirs in (("p25", "p25"), ("p50", "p50"), ("p90", "p90")):
        a, b = out[mine].to_numpy(), ref[theirs].to_numpy()
        both_nan = np.isnan(a) & np.isnan(b)
        assert np.all(both_nan | (a == b))  # bit-exact where defined


def test_grouped_exact_quantiles_single_value_group(ray_session):
    from data_validator_ray.pipelines.relational import grouped_exact_quantiles

    df = pd.DataFrame({"g": ["a"], "v": [3.5]})
    out = grouped_exact_quantiles(
        ray.data.from_pandas(df), "g", "v", quantiles=(0.0, 0.5, 1.0)
    ).to_pandas()
    assert out.iloc[0].p0 == 3.5 and out.iloc[0].p50 == 3.5 and out.iloc[0].p100 == 3.5


def test_grouped_exact_quantiles_disc_matches_duckdb(ray_session):
    """quantile_disc tier: actual element at max(ceil(q*n),1), bit-exact
    (value copies, never interpolated) — including ties and q=0/1."""
    import duckdb

    from data_validator_ray.pipelines.relational import grouped_exact_quantiles

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], 150),
            # integer-valued floats force ties; disc must return members
            "v": rng.integers(0, 20, 150).astype(float),
        }
    )
    df.loc[df.index[:8], "v"] = None
    out = (
        grouped_exact_quantiles(
            ray.data.from_pandas(df), "g", "v",
            quantiles=(0.0, 0.25, 0.5, 0.9, 1.0), interpolation="disc",
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    ref = con.execute(
        "SELECT g, quantile_disc(v, 0.0) p0, quantile_disc(v, 0.25) p25,"
        " quantile_disc(v, 0.5) p50, quantile_disc(v, 0.9) p90,"
        " quantile_disc(v, 1.0) p100 FROM t GROUP BY g ORDER BY g"
    ).df()
    assert list(out.g) == list(ref.g)
    for c in ("p0", "p25", "p50", "p90", "p100"):
        assert np.array_equal(out[c].to_numpy(), ref[c].to_numpy())
        # every disc quantile is an actual member of the group's values
        for gk, val in zip(out.g, out[c]):
            assert val in set(df[(df.g == gk) & df.v.notna()].v)


def test_grouped_exact_quantiles_bad_interpolation():
    from data_validator_ray.pipelines.relational import grouped_exact_quantiles

    with pytest.raises(ValueError):
        grouped_exact_quantiles("/nonexistent.parquet", "g", "v",
                                interpolation="nearest")


def test_iqr_outliers_flags_and_null_safety(ray_session):
    from data_validator_ray.pipelines.relational import iqr_outliers

    df = pd.DataFrame(
        {
            "id": range(12),
            "g": ["a"] * 10 + ["a", None],
            "v": [1.0, 2, 3, 4, 5, 6, 7, 8, 9, 10, 1000.0, 5.0],
        }
    )
    df.loc[3, "v"] = None  # null value never flags
    out = (
        iqr_outliers(ray.data.from_pandas(df), "g", "v", ["id"], k=1.5)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(out.id) == [10]  # only the 1000.0 spike
    assert out.iloc[0].fence_lo < out.iloc[0].fence_hi


def test_iqr_outliers_empty_fences(ray_session):
    from data_validator_ray.pipelines.relational import iqr_outliers

    df = pd.DataFrame({"id": [1, 2], "g": ["a", "b"], "v": [None, None]})
    out = iqr_outliers(ray.data.from_pandas(df), "g", "v", ["id"]).to_pandas()
    assert len(out) == 0


# --------------------------------------------------------------------------- #
# running_window (per-key ordered cumulative aggregates)                      #
# --------------------------------------------------------------------------- #


def test_running_window_basic(ray_session):
    from data_validator_ray.pipelines.relational import running_window

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2],
            "o": [10, 20, 30, 10, 20],
            "v": [1.0, 2.0, 3.0, 5.0, 7.0],
        }
    )
    out = (
        running_window(df, "k", ["o"], "v", num_buckets=2)
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    assert out["row_seq"].tolist() == [1, 2, 3, 1, 2]
    assert out["running_sum"].tolist() == [1.0, 3.0, 6.0, 5.0, 12.0]
    assert out["prev_value"].tolist()[:1] == [None] or np.isnan(
        out["prev_value"].iloc[0]
    )
    assert out["prev_value"].tolist()[1:3] == [1.0, 2.0]
    assert np.isnan(out["prev_value"].iloc[3]) and out["prev_value"].iloc[4] == 5.0


def test_running_window_null_values_sql_semantics(ray_session):
    # SUM OVER ignores NULLs but stays NULL until the first non-null;
    # LAG passes the NULL through.
    from data_validator_ray.pipelines.relational import running_window

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1],
            "o": [1, 2, 3, 4],
            "v": [None, 2.0, None, 3.0],
        }
    )
    out = (
        running_window(df, "k", ["o"], "v", num_buckets=1)
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    rs = out["running_sum"].tolist()
    assert np.isnan(rs[0]) and rs[1:] == [2.0, 2.0, 5.0]
    assert np.isnan(out["prev_value"].iloc[0])
    assert np.isnan(out["prev_value"].iloc[1])  # lag of NULL first value
    assert out["prev_value"].iloc[2] == 2.0
    assert np.isnan(out["prev_value"].iloc[3])


def test_running_window_bucket_layout_independent(ray_session):
    from data_validator_ray.pipelines.relational import running_window

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 20, 500),
            "o": np.arange(500),
            "v": rng.normal(size=500),
        }
    )
    a = (
        running_window(df, "k", ["o"], "v", num_buckets=3, batch_size=64)
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    )
    b = (
        running_window(df, "k", ["o"], "v", num_buckets=64, batch_size=500)
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_unpivot_nulls_kept_and_types(ray_session):
    from data_validator_ray.pipelines.relational import unpivot

    df = pd.DataFrame(
        {"id": [1, 2], "a": [1.5, None], "b": [3, 4]}
    )
    out = (
        unpivot(df, ["id"], ["a", "b"])
        .to_pandas()
        .sort_values(["id", "variable"])
        .reset_index(drop=True)
    )
    assert len(out) == 4
    assert out["variable"].tolist() == ["a", "b", "a", "b"]
    assert out["value"].tolist()[0] == 1.5 and out["value"].tolist()[1] == 3.0
    assert np.isnan(out["value"].iloc[2]) and out["value"].iloc[3] == 4.0
    assert out["value"].dtype == np.float64


def test_json_extract_scalars_missing_invalid(ray_session):
    import pyarrow as pa

    from data_validator_ray.pipelines.relational import json_extract

    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5],
            "j": [
                '{"k": 7, "s": "hi", "nest": {"x": 1.5}}',
                '{"s": "a b"}',          # k missing
                'not json',               # unparseable
                None,                     # NULL document
                '{"k": null}',            # JSON null
            ],
        }
    )
    out = (
        json_extract(
            df, "j",
            {"k": "$.k", "s": "$.s", "x": "$.nest.x"},
            types={"k": pa.int64(), "x": pa.float64()},
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert "j" not in out.columns
    assert out["k"].tolist()[0] == 7 and out["k"].isna().tolist()[1:] == [True] * 4
    assert out["s"].tolist()[:2] == ["hi", "a b"]  # ->> unquoted text
    assert out["x"].iloc[0] == 1.5


def test_rollup_levels_and_null_keys(ray_session):
    from data_validator_ray.pipelines.relational import rollup_aggregate

    df = pd.DataFrame(
        {
            "a": ["x", "x", None, "y"],
            "b": ["p", "q", "p", None],
            "v": [1, 2, 4, 8],
        }
    )
    out = (
        rollup_aggregate(df, ["a", "b"], "v", num_buckets=2)
        .to_pandas()
        .sort_values(["level", "a", "b"], na_position="last")
        .reset_index(drop=True)
    )
    # level 0: (x,p) (x,q) (y,None) (None,p) — real NULL keys are groups
    lvl0 = out[out.level == 0]
    assert len(lvl0) == 4 and lvl0.value_sum.sum() == 15
    # level 1: a groups incl. the real-NULL a
    lvl1 = out[out.level == 1].set_index("a", drop=False)
    assert lvl1.loc["x", "value_sum"] == 3
    assert lvl1.loc["y", "value_sum"] == 8
    assert lvl1[lvl1.a.isna()].value_sum.iloc[0] == 4
    # grand total
    lvl2 = out[out.level == 2]
    assert len(lvl2) == 1 and lvl2.n_rows.iloc[0] == 4 and lvl2.value_sum.iloc[0] == 15
    # integer input stays exact int64
    assert out.value_sum.dtype == np.int64


def test_rollup_float_values_rounded(ray_session):
    from data_validator_ray.pipelines.relational import rollup_aggregate

    df = pd.DataFrame({"a": ["x"] * 3, "v": [0.1, 0.2, 0.4]})
    out = (
        rollup_aggregate(df, ["a"], "v", num_buckets=1)
        .to_pandas()
        .sort_values("level")
        .reset_index(drop=True)
    )
    assert out.value_sum.tolist() == [0.7, 0.7]


def test_set_op_intersect_except_null_semantics(ray_session):
    from data_validator_ray.pipelines.relational import set_op

    left = pd.DataFrame({"k": [1.0, 1.0, 2.0, None, 5.0]})
    right = pd.DataFrame({"r": [2.0, None, 3.0]})
    inter = (
        set_op(left, right, "intersect", ["k"], right_cols=["r"],
               num_buckets=2)
        .to_pandas()["k"].tolist()
    )
    # NULL intersects NULL (IS NOT DISTINCT FROM); distinct output
    assert sorted(x for x in inter if x == x) == [2.0]
    assert any(x != x for x in inter)  # the NULL row survived
    exc = (
        set_op(left, right, "except", ["k"], right_cols=["r"],
               num_buckets=2)
        .to_pandas()["k"].dropna().sort_values().tolist()
    )
    assert exc == [1.0, 5.0]


def test_set_op_multi_column(ray_session):
    from data_validator_ray.pipelines.relational import set_op

    left = pd.DataFrame({"a": [1, 1, 2], "b": ["x", "y", "x"]})
    right = pd.DataFrame({"a": [1, 2], "b": ["y", "z"]})
    out = (
        set_op(left, right, "intersect", ["a", "b"], num_buckets=1)
        .to_pandas()
    )
    assert list(map(tuple, out[["a", "b"]].values)) == [(1, "y")]


def test_set_op_rejects_unknown_op(ray_session):
    from data_validator_ray.pipelines.relational import set_op

    with pytest.raises(ValueError):
        set_op(pd.DataFrame({"k": [1]}), pd.DataFrame({"k": [1]}),
               "union", ["k"])


def test_anomaly_zscore_matches_duckdb(ray_session):
    """Trailing-window z-score (ROWS k PRECEDING .. 1 PRECEDING) is
    bit-exact vs DuckDB after ROUND 6 — including NULL values inside
    windows, <2-prior-values NULLs, and the constant-history stddev=0
    → NULL (NULLIF parity; the variance snap must not emit garbage)."""
    import duckdb

    from data_validator_ray.pipelines.relational import anomaly_zscore

    rng = np.random.default_rng(3)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, n),
            "o": rng.permutation(n),
            "v": np.round(rng.normal(50, 20, n), 3),
        }
    )
    df.loc[df.index[:40], "v"] = None
    # constant-history key: every z must be NULL (stddev exactly 0)
    const = pd.DataFrame({"k": [99] * 10, "o": range(10), "v": [7.0] * 10})
    df = pd.concat([df, const], ignore_index=True)

    out = (
        anomaly_zscore(ray.data.from_pandas(df), "k", ["o"], "v",
                       preceding=8)
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    ref = con.execute(
        "SELECT k, o, ROUND((v - AVG(v) OVER w) / "
        "NULLIF(STDDEV_SAMP(v) OVER w, 0), 6) AS zscore FROM t "
        "WINDOW w AS (PARTITION BY k ORDER BY o "
        "ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING) ORDER BY k, o"
    ).df()
    a, b = out.zscore.to_numpy(), ref.zscore.to_numpy()
    both_nan = np.isnan(a) & np.isnan(b)
    assert np.all(both_nan | (a == b))
    assert np.all(np.isnan(out[out.k == 99].zscore))


def test_anomaly_zscore_rejects_bad_preceding():
    from data_validator_ray.pipelines.relational import anomaly_zscore

    with pytest.raises(ValueError):
        anomaly_zscore("/nonexistent.parquet", "k", ["o"], "v", preceding=0)


def test_set_op_bag_semantics_match_duckdb(ray_session):
    """INTERSECT ALL / EXCEPT ALL preserve duplicate multiplicities —
    min(cl,cr) and max(cl-cr,0) copies per distinct row, NULLs compare
    equal — exactly matching DuckDB's bag semantics."""
    import duckdb

    from data_validator_ray.pipelines.relational import set_op

    rng = np.random.default_rng(5)
    a = pd.DataFrame({"x": rng.integers(0, 8, 120),
                      "y": rng.choice(["p", "q", None], 120)})
    b = pd.DataFrame({"x": rng.integers(0, 8, 90),
                      "y": rng.choice(["p", "q", None], 90)})
    con = duckdb.connect()
    con.register("a", a)
    con.register("b", b)

    def multiset(df):
        return sorted(
            ("<N>" if pd.isna(x) else int(x), "<N>" if pd.isna(y) else y)
            for x, y in zip(df["x"], df["y"])
        )

    for op, sql in (("intersect_all", "INTERSECT ALL"),
                    ("except_all", "EXCEPT ALL")):
        out = set_op(ray.data.from_pandas(a), ray.data.from_pandas(b),
                     op, ["x", "y"]).to_pandas()
        ref = con.execute(
            f"SELECT x, y FROM a {sql} SELECT x, y FROM b"
        ).df()
        assert multiset(out) == multiset(ref), op


def test_cube_all_subsets_bitmask(ray_session):
    from data_validator_ray.pipelines.relational import cube_aggregate

    df = pd.DataFrame(
        {"a": ["x", "x", "y"], "b": [1, 2, 1], "v": [10, 20, 40]}
    )
    out = (
        cube_aggregate(df, ["a", "b"], "v", num_buckets=2)
        .to_pandas()
        .sort_values(["grouping_id", "a", "b"], na_position="last")
        .reset_index(drop=True)
    )
    # gid 0 = (a,b); 1 = (a); 2 = (b); 3 = ()
    assert sorted(out.grouping_id.unique()) == [0, 1, 2, 3]
    g1 = out[out.grouping_id == 1].set_index("a")
    assert g1.loc["x", "value_sum"] == 30 and g1.loc["y", "value_sum"] == 40
    g2 = out[out.grouping_id == 2].set_index("b")
    assert g2.loc[1, "value_sum"] == 50 and g2.loc[2, "value_sum"] == 20
    assert out[out.grouping_id == 3].value_sum.iloc[0] == 70
    assert out[out.grouping_id == 2].a.isna().all()


def test_top_k_rows_boundary_ties_and_nulls(ray_session):
    from data_validator_ray.pipelines.relational import top_k_rows

    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5, 6],
            "v": [9.0, 9.0, 9.0, 1.0, None, 5.0],
        }
    )
    out = top_k_rows(
        df, "v", 2, descending=True, tiebreak_cols=["id"],
        batch_size=2,
    )
    # ties at the cut resolved by id; NULL never ranks
    assert out["id"].tolist() == [1, 2]
    asc = top_k_rows(df, "v", 3, descending=False, tiebreak_cols=["id"],
                     batch_size=2)
    assert asc["id"].tolist() == [4, 6, 1]


def test_global_rank_and_ntile(ray_session):
    from data_validator_ray.pipelines.relational import global_rank

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"id": np.arange(100), "v": rng.normal(size=100)})
    df.loc[7, "v"] = None
    df.loc[13, "v"] = df["v"].iloc[20]  # tie
    out = (
        global_rank(df, "v", tiebreak_cols=["id"], ntile=7,
                    num_buckets=5, batch_size=16)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert out["rank"].tolist() == list(range(1, 101))
    # reference: pandas ordering, NULLS LAST
    ref = df.sort_values(["v", "id"], na_position="last")["id"].tolist()
    assert out["id"].tolist() == ref
    # NTILE: 100 rows / 7 tiles -> first 2 tiles of 15, rest 14
    sizes = out.groupby("tile").size()
    assert sizes.tolist() == [15, 15, 14, 14, 14, 14, 14]
    assert out[out["id"] == 7]["rank"].iloc[0] == 100  # NULL ranks last


def test_global_rank_layout_independent(ray_session):
    from data_validator_ray.pipelines.relational import global_rank

    rng = np.random.default_rng(21)
    df = pd.DataFrame({"id": np.arange(500), "v": rng.integers(0, 50, 500)})
    a = (global_rank(df, "v", tiebreak_cols=["id"], num_buckets=3,
                     batch_size=50)
         .to_pandas().sort_values("rank").reset_index(drop=True))
    b = (global_rank(df, "v", tiebreak_cols=["id"], num_buckets=64,
                     batch_size=500)
         .to_pandas().sort_values("rank").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_explode_column_nulls_empties_ordinality(ray_session):
    import pyarrow as pa

    from data_validator_ray.pipelines.relational import explode_column

    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "xs": pa.array(
                [[10, 20], [], None, [30]], pa.list_(pa.int64())
            ),
        }
    )
    out = (
        explode_column(tbl, "xs", keep_cols=["id"], value_name="x")
        .to_pandas()
        .sort_values(["id", "pos"])
        .reset_index(drop=True)
    )
    # NULL and empty lists produce no rows; pos is 1-based
    assert list(map(tuple, out[["id", "pos", "x"]].values)) == [
        (1, 1, 10), (1, 2, 20), (4, 1, 30)
    ]


def test_forward_fill_locf_semantics(ray_session):
    from data_validator_ray.pipelines.relational import forward_fill

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2, 2],
            "o": [1, 2, 3, 4, 1, 2],
            "v": [None, 5.0, None, 7.0, None, None],
        }
    )
    out = (
        forward_fill(df, "k", ["o"], "v", num_buckets=2, batch_size=2)
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    got = out["v_filled"].tolist()
    # k=1: [NULL, 5, 5, 7]; k=2 never fills (no prior non-null,
    # and k=1's 7.0 must not leak across the key boundary)
    assert np.isnan(got[0]) and got[1:4] == [5.0, 5.0, 7.0]
    assert np.isnan(got[4]) and np.isnan(got[5])


def test_grouped_top_k_combiner_and_ties(ray_session):
    from data_validator_ray.pipelines.relational import grouped_top_k

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2, 2],
            "id": [10, 11, 12, 13, 20, 21],
            "v": [5.0, 9.0, 9.0, None, 1.0, 2.0],
        }
    )
    out = (
        grouped_top_k(df, ["k"], "v", 2, descending=True,
                      tiebreak_cols=["id"], num_buckets=2, batch_size=2)
        .to_pandas().sort_values(["k", "id"]).reset_index(drop=True)
    )
    # k=1: two 9.0s tie -> ids 11,12 (NULL never ranks); k=2: both rows
    assert list(map(tuple, out[["k", "id"]].values)) == [
        (1, 11), (1, 12), (2, 20), (2, 21)
    ]
    asc = (
        grouped_top_k(df, ["k"], "v", 1, descending=False,
                      tiebreak_cols=["id"], num_buckets=2, batch_size=2)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    # deterministic arg_min per key
    assert asc["id"].tolist() == [10, 20]


def test_calendar_aggregate_month_and_week_boundaries(ray_session):
    from data_validator_ray.pipelines.relational import calendar_aggregate

    ts = pd.to_datetime(
        [
            "2024-01-31 23:59:59",  # Jan; week of Mon 2024-01-29
            "2024-02-01 00:00:00",  # Feb; same Monday week
            "2024-02-29 12:00:00",  # leap-day Feb
            None,                    # dropped
        ]
    )
    df = pd.DataFrame({"ts": ts, "v": [1.0, 2.0, None, 9.0]})
    months = (
        calendar_aggregate(df, "ts", "v", unit="month")
        .to_pandas().sort_values("period").reset_index(drop=True)
    )
    assert months.period.tolist() == pd.to_datetime(
        ["2024-01-01", "2024-02-01"]
    ).tolist()
    assert months.n_events.tolist() == [1, 2]
    # Feb: NULL value counts as event, not in sum/avg
    assert months.value_sum.tolist() == [1.0, 2.0]
    weeks = (
        calendar_aggregate(df, "ts", "v", unit="week")
        .to_pandas().sort_values("period").reset_index(drop=True)
    )
    # Jan 31 + Feb 1 share the Monday-2024-01-29 week
    assert weeks.period.iloc[0] == pd.Timestamp("2024-01-29")
    assert weeks.n_events.iloc[0] == 2


def test_regex_extract_groups_nomatch_null(ray_session):
    from data_validator_ray.pipelines.relational import regex_extract

    df = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "s": ["a=10 b=x", "a=7 b=y", None],
        }
    )
    out = (
        regex_extract(
            df, "s", r"a=(?P<anum>\d+) b=(?P<btag>\w+)",
            keep_cols=["id"],
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert out["anum"].tolist()[:2] == ["10", "7"]
    assert out["btag"].tolist()[:2] == ["x", "y"]
    assert out["anum"].isna().iloc[2] and out["btag"].isna().iloc[2]
    with pytest.raises(ValueError):
        regex_extract(df, "s", r"a=\d+")  # no named groups


def test_global_rank_percentiles(ray_session):
    from data_validator_ray.pipelines.relational import global_rank

    df = pd.DataFrame({"id": [1, 2, 3, 4], "v": [10.0, 20.0, 30.0, 40.0]})
    out = (
        global_rank(df, "v", tiebreak_cols=["id"], percentiles=True,
                    num_buckets=2)
        .to_pandas().sort_values("rank").reset_index(drop=True)
    )
    assert out["percent_rank"].tolist() == [0.0, 1 / 3, 2 / 3, 1.0]
    assert out["cume_dist"].tolist() == [0.25, 0.5, 0.75, 1.0]


def test_try_cast_int_float_timestamp(ray_session):
    import pyarrow as pa

    from data_validator_ray.pipelines.relational import try_cast_columns

    df = pd.DataFrame(
        {
            "i": [" 42 ", "+7", "-0", "4.5", "bad", "", None,
                  "987654321"],  # int64 nulls → pandas float64, so
            # keep the big value under 2^53 (the conversion is lossy
            # above that; the Arrow column itself is exact int64)
            "f": ["1.5", "-.5", "2e3", "nope", "", None, "7", "1e999"],
            "t": ["2024-01-02 03:04:05", "not a time", None,
                  "2024-13-40 00:00:00", "2024-02-29 00:00:00",
                  "x", "y", "z"],
        }
    )
    out = try_cast_columns(
        df,
        {"i": pa.int64(), "f": pa.float64(), "t": pa.timestamp("us")},
    ).to_pandas()
    i = out["i"].tolist()
    assert i[0] == 42 and i[1] == 7 and i[2] == 0
    assert pd.isna(i[3]) and pd.isna(i[4]) and pd.isna(i[5]) and pd.isna(i[6])
    assert i[7] == 987654321
    f = out["f"].tolist()
    assert f[0] == 1.5 and f[1] == -0.5 and f[2] == 2000.0
    assert pd.isna(f[3]) and pd.isna(f[4]) and pd.isna(f[5]) and f[6] == 7.0
    assert f[7] == float("inf")  # 1e999 parses, overflows to inf (IEEE)
    t = out["t"].tolist()
    assert t[0] == pd.Timestamp("2024-01-02 03:04:05")
    assert pd.isna(t[1]) and pd.isna(t[2]) and pd.isna(t[3])
    assert t[4] == pd.Timestamp("2024-02-29")  # leap day valid


def test_moving_window_basic(ray_session):
    from data_validator_ray.pipelines.relational import moving_window

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 1, 2, 2],
            "o": [1, 2, 3, 4, 5, 1, 2],
            "v": [1.0, 2.0, 3.0, 4.0, 5.0, 10.0, 20.0],
        }
    )
    out = (
        moving_window(df, "k", ["o"], "v", preceding=2, num_buckets=2)
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    # trailing 3-row windows, clamped at each key's start
    assert out["mov_sum"].tolist() == [1.0, 3.0, 6.0, 9.0, 12.0, 10.0, 30.0]
    assert out["mov_min"].tolist() == [1.0, 1.0, 1.0, 2.0, 3.0, 10.0, 10.0]
    assert out["mov_max"].tolist() == [1.0, 2.0, 3.0, 4.0, 5.0, 10.0, 20.0]
    assert out["mov_count"].tolist() == [1, 2, 3, 3, 3, 1, 2]
    assert out["mov_avg"].tolist() == [1.0, 1.5, 2.0, 3.0, 4.0, 10.0, 15.0]


def test_moving_window_nulls_and_preceding_zero(ray_session):
    from data_validator_ray.pipelines.relational import moving_window

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1],
            "o": [1, 2, 3, 4],
            "v": [None, 2.0, None, None],
        }
    )
    out = (
        moving_window(df, "k", ["o"], "v", preceding=1, num_buckets=1)
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    # all-NULL windows yield NULL aggregates and count 0 (SQL)
    assert pd.isna(out["mov_sum"].iloc[0]) and out["mov_count"].iloc[0] == 0
    assert out["mov_sum"].iloc[1] == 2.0 and out["mov_min"].iloc[1] == 2.0
    assert out["mov_sum"].iloc[2] == 2.0  # window [2.0, NULL]
    assert pd.isna(out["mov_sum"].iloc[3]) and out["mov_count"].iloc[3] == 0

    z = (
        moving_window(df, "k", ["o"], "v", preceding=0, num_buckets=1)
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    assert z["mov_count"].tolist() == [0, 1, 0, 0]
    assert z["mov_max"].iloc[1] == 2.0


def test_moving_window_random_vs_duckdb(ray_session):
    import duckdb

    from data_validator_ray.pipelines.relational import moving_window

    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 37, n),
            "o": np.arange(n),
            "v": np.where(
                rng.random(n) < 0.1, np.nan, rng.normal(0, 100, n).round(3)
            ),
        }
    )
    out = (
        moving_window(df, "k", ["o"], "v", preceding=7, num_buckets=8)
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT k, o, v, ROUND(SUM(v) OVER w, 6) AS mov_sum, "
        "ROUND(AVG(v) OVER w, 6) AS mov_avg, MIN(v) OVER w AS mov_min, "
        "MAX(v) OVER w AS mov_max, COUNT(v) OVER w AS mov_count FROM t "
        "WINDOW w AS (PARTITION BY k ORDER BY o "
        "ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) ORDER BY k, o"
    ).df()
    for c in ("mov_sum", "mov_avg", "mov_min", "mov_max"):
        a, b = out[c].to_numpy(), exp[c].to_numpy()
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c
    assert (out["mov_count"].to_numpy() == exp["mov_count"].to_numpy()).all()


def test_time_range_window_edges(ray_session):
    """RANGE-frame semantics vs DuckDB: peers at equal ts share one
    frame (including rows after the current one in row order), NULL
    values are ignored inside frames, NULL timestamps frame exactly
    their key's NULL peer group, single-row keys work."""
    import duckdb
    import ray

    from data_validator_ray.pipelines.relational import time_range_window

    df = pd.DataFrame(
        {
            "k": ["a"] * 6 + ["b"] * 3 + ["c"],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00", "2024-01-01 00:00:05",
                    "2024-01-01 00:00:05", "2024-01-01 00:00:30",
                    None, None,
                    "2024-01-01 00:00:00", "2024-01-01 00:00:02",
                    "2024-01-01 00:01:00",
                    "2024-01-01 00:00:00",
                ]
            ),
            "v": [1.0, 2.0, None, 4.0, 5.0, None, 10.0, None, 30.0, 7.5],
        }
    )
    out = (
        time_range_window(
            ray.data.from_pandas(df), "k", "ts", "v",
            preceding_seconds=10, num_buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "ts", "v"], na_position="last")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT k, ts, v, CASE WHEN COUNT(v) OVER w > 0 THEN "
        "ROUND(SUM(v) OVER w, 6) END AS rng_sum, "
        "ROUND(AVG(v) OVER w, 6) AS rng_avg, MIN(v) OVER w AS rng_min, "
        "MAX(v) OVER w AS rng_max, COUNT(v) OVER w AS rng_count FROM t "
        "WINDOW w AS (PARTITION BY k ORDER BY ts RANGE BETWEEN "
        "INTERVAL 10 SECOND PRECEDING AND CURRENT ROW) "
        "ORDER BY k, ts, v"
    ).df()
    exp = exp.sort_values(["k", "ts", "v"], na_position="last").reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(
        out[exp.columns], exp, check_dtype=False, atol=1e-9
    )


def test_time_range_window_random_vs_duckdb(ray_session):
    import duckdb

    from data_validator_ray.pipelines.relational import time_range_window

    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 29, n),
            # coarse second grid so equal-ts peers are common
            "ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 500, n), unit="s"),
            "v": np.where(
                rng.random(n) < 0.1, np.nan, rng.normal(0, 50, n).round(3)
            ),
        }
    )
    out = (
        time_range_window(
            df, "k", "ts", "v", preceding_seconds=60, num_buckets=8
        )
        .to_pandas()
        .sort_values(["k", "ts", "v"], na_position="last")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT k, ts, v, CASE WHEN COUNT(v) OVER w > 0 THEN "
        "ROUND(SUM(v) OVER w, 6) END AS rng_sum, "
        "ROUND(AVG(v) OVER w, 6) AS rng_avg, MIN(v) OVER w AS rng_min, "
        "MAX(v) OVER w AS rng_max, COUNT(v) OVER w AS rng_count FROM t "
        "WINDOW w AS (PARTITION BY k ORDER BY ts RANGE BETWEEN "
        "INTERVAL 60 SECOND PRECEDING AND CURRENT ROW) ORDER BY k, ts, v"
    ).df()
    exp = exp.sort_values(["k", "ts", "v"], na_position="last").reset_index(
        drop=True
    )
    for c in ("rng_sum", "rng_min", "rng_max"):
        a, b = out[c].to_numpy(), exp[c].to_numpy()
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c
    # avg sits on exact 7th-decimal half-points at count=2^k frames,
    # where accumulation order decides the rounding side — tolerance,
    # not exact equality (the driver query drops the column for this)
    a, b = out["rng_avg"].to_numpy(), exp["rng_avg"].to_numpy()
    ok = np.isclose(a, b, atol=1.1e-6, equal_nan=True)
    assert ok.all(), "rng_avg beyond rounding tolerance"
    assert (out["rng_count"].to_numpy() == exp["rng_count"].to_numpy()).all()


def test_edge_values_semantics(ray_session):
    """LEAD is NULL at each key's last row; FIRST/LAST_VALUE respect
    NULLs (SQL default); single-row keys see themselves; key_rows is
    the partition size."""
    import ray

    from data_validator_ray.pipelines.relational import edge_values

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "c", "c"],
            "o": [1, 2, 3, 1, 1, 2],
            "v": [None, 2.0, 3.0, 9.0, 4.0, None],
        }
    )
    out = (
        edge_values(ray.data.from_pandas(df), "k", ["o"], "v", num_buckets=4)
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    nv = out["next_value"].to_numpy()
    assert nv[0] == 2.0 and nv[1] == 3.0
    # last row of each key -> NULL; key c's lead at o=1 is the NULL v
    assert np.isnan(nv[2]) and np.isnan(nv[3]) and np.isnan(nv[4]) and np.isnan(nv[5])
    # first_value of key a is the NULL at o=1 (RESPECT NULLS)
    fv = out["first_value"].to_numpy()
    assert np.isnan(fv[0]) and np.isnan(fv[1]) and np.isnan(fv[2])
    lv = out["last_value"].to_numpy()
    assert lv[0] == 3.0 and lv[3] == 9.0 and np.isnan(lv[4]) and np.isnan(lv[5])
    assert out["key_rows"].tolist() == [3, 3, 3, 1, 2, 2]


def test_semi_join_broadcast_semantics(ray_session):
    from data_validator_ray.pipelines.relational import semi_join_broadcast

    src = pd.DataFrame(
        {"k": [1, 2, 3, None, 2], "x": ["a", "b", "c", "d", "e"]}
    )
    # duplicate set entries must not duplicate source rows; NULL set
    # entries ignored; NULL source keys dropped (EXISTS semantics)
    keyset = pd.DataFrame({"k": [2, 2, 9, None]})
    out = (
        semi_join_broadcast(src, keyset, key_col="k")
        .to_pandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    assert out["x"].tolist() == ["b", "e"]
    assert (out["k"] == 2).all()

    empty = semi_join_broadcast(
        src, pd.DataFrame({"k": pd.Series([], dtype="float64")}), key_col="k"
    ).to_pandas()
    assert len(empty) == 0


def test_grouped_string_agg_nulls_and_order(ray_session):
    from data_validator_ray.pipelines.relational import grouped_string_agg

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "b", "c"],
            "o": [3, 1, 2, 1, 2, 1],
            "v": ["z", "x", None, None, None, "solo"],
        }
    )
    out = (
        grouped_string_agg(
            df, ["k"], "v", order_cols=["o"], sep="|", num_buckets=2
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == ["a", "b", "c"]
    # NULL values skipped (no separator), all-NULL group -> NULL
    assert out["agg"].tolist()[0] == "x|z"
    assert pd.isna(out["agg"].iloc[1])
    assert out["agg"].iloc[2] == "solo"


def test_grouped_string_agg_vs_duckdb_random(ray_session):
    import duckdb

    from data_validator_ray.pipelines.relational import grouped_string_agg

    rng = np.random.default_rng(11)
    n = 2000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 53, n),
            "o": rng.permutation(n),
            "v": np.where(
                rng.random(n) < 0.05, None, rng.integers(0, 10**6, n).astype(str)
            ),
        }
    )
    out = (
        grouped_string_agg(
            df, ["k"], "v", order_cols=["o"], sep=",", num_buckets=8
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT k, string_agg(v, ',' ORDER BY o) AS agg FROM t "
        "GROUP BY k ORDER BY k"
    ).df()
    assert out["k"].tolist() == exp["k"].tolist()
    a, b = out["agg"], exp["agg"]
    assert ((a == b) | (a.isna() & b.isna())).all()


def test_grouped_count_distinct_null_semantics(ray_session):
    from data_validator_ray.pipelines.relational import grouped_count_distinct

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "b", None, None],
            "v": [1.0, 1.0, 2.0, None, None, 3.0, 3.0],
        }
    )
    out = (
        grouped_count_distinct(df, "k", "v", num_buckets=2)
        .to_pandas()
        .sort_values("k", na_position="last")
        .reset_index(drop=True)
    )
    # a: {1,2}=2; b: all-NULL -> 0 but group present; NULL key: {3}=1
    assert out["k"].tolist()[:2] == ["a", "b"]
    assert pd.isna(out["k"].iloc[2])
    assert out["n_distinct"].tolist() == [2, 0, 1]


def test_distinct_rows_nulls_collapse(ray_session):
    from data_validator_ray.pipelines.relational import distinct_rows

    df = pd.DataFrame(
        {
            "a": [1, 1, 1, None, None],
            "b": ["x", "x", "y", None, None],
        }
    )
    out = (
        distinct_rows(df, ["a", "b"], num_buckets=2)
        .to_pandas()
        .sort_values(["a", "b"], na_position="last")
        .reset_index(drop=True)
    )
    # (1,x), (1,y), (NULL,NULL) — NULLs are not distinct from each other
    assert len(out) == 3


def test_spine_fill_gaps(ray_session):
    from data_validator_ray.pipelines.relational import spine_fill

    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-01", "2024-01-04", "2024-01-04"]
            ),
            "k": ["a", "b", "a", "a"],
            "v": [1.0, 2.0, None, 4.0],
        }
    )
    out = spine_fill(df, "ts", "v", key_cols=["k"], unit="day")
    # 4-day spine × 2 keys = 8 cells; Jan 2-3 are gaps for both keys
    assert len(out) == 8
    jan2a = out[(out["period"] == pd.Timestamp("2024-01-02")) & (out["k"] == "a")]
    assert jan2a["n_events"].iloc[0] == 0 and pd.isna(jan2a["value_sum"].iloc[0])
    jan4a = out[(out["period"] == pd.Timestamp("2024-01-04")) & (out["k"] == "a")]
    # 2 events on Jan 4 for a, one NULL value: sum=4.0, n=2
    assert jan4a["n_events"].iloc[0] == 2 and jan4a["value_sum"].iloc[0] == 4.0
    # key b absent on Jan 4 -> gap row exists
    jan4b = out[(out["period"] == pd.Timestamp("2024-01-04")) & (out["k"] == "b")]
    assert jan4b["n_events"].iloc[0] == 0


def test_spine_fill_no_keys_month_unit(ray_session):
    from data_validator_ray.pipelines.relational import spine_fill

    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-15", "2024-04-02"]),
            "v": [1.0, 3.0],
        }
    )
    out = spine_fill(df, "ts", "v", unit="month")
    assert out["period"].tolist() == list(
        pd.to_datetime(["2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01"])
    )
    assert out["n_events"].tolist() == [1, 0, 0, 1]


def test_hash_join_semi_anti_semantics(ray_session):
    from data_validator_ray.pipelines.relational import hash_join

    left = pd.DataFrame(
        {"k": [1, 2, 3, None, 2], "x": ["a", "b", "c", "d", "e"]}
    )
    # duplicate + null right keys: duplicates must not multiply,
    # nulls never match
    right = pd.DataFrame({"k": [2, 2, 9, None]})

    semi = (
        hash_join(
            left, right, left_key="k", right_key="k",
            left_cols=["x"], right_cols=["k"], how="semi", num_buckets=4,
        )
        .to_pandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    assert semi["x"].tolist() == ["b", "e"]

    anti = (
        hash_join(
            left, right, left_key="k", right_key="k",
            left_cols=["x"], right_cols=["k"], how="anti", num_buckets=4,
        )
        .to_pandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    # NOT EXISTS keeps the NULL-keyed left row
    assert anti["x"].tolist() == ["a", "c", "d"]

    with pytest.raises(ValueError):
        hash_join(
            left, right, left_key="k", right_key="k",
            left_cols=["x"], right_cols=["k", "extra"], how="anti",
        )


def test_global_rank_ties_and_dense(ray_session):
    import duckdb

    from data_validator_ray.pipelines.relational import global_rank

    rng = np.random.default_rng(5)
    n = 1500
    df = pd.DataFrame(
        {
            "id": np.arange(n),
            "v": np.where(
                rng.random(n) < 0.05, np.nan, rng.integers(0, 40, n).astype(float)
            ),
        }
    )
    out = (
        global_rank(df, "v", tiebreak_cols=["id"], rank_ties=True,
                    dense=True, num_buckets=8)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT id, RANK() OVER (ORDER BY v) AS rank_ties, "
        "DENSE_RANK() OVER (ORDER BY v) AS dense_rank FROM t ORDER BY id"
    ).df()
    assert (out["rank_ties"].to_numpy() == exp["rank_ties"].to_numpy()).all()
    assert (out["dense_rank"].to_numpy() == exp["dense_rank"].to_numpy()).all()


def test_snapshot_diff_semantics(ray_session):
    from data_validator_ray.pipelines.relational import snapshot_diff

    old = pd.DataFrame(
        {"k": [1, 2, 3, 4], "v": [10.0, 20.0, None, 40.0]}
    )
    new = pd.DataFrame(
        {"k": [2, 3, 4, 5], "v": [99.0, None, 40.0, 50.0]}
    )
    out = (
        snapshot_diff(old, new, ["k"], ["v"], num_buckets=2)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # k=1 removed; k=2 changed; k=3 NULL==NULL unchanged (absent);
    # k=4 equal unchanged (absent); k=5 added
    assert out["k"].tolist() == [1, 2, 5]
    assert out["change"].tolist() == ["removed", "changed", "added"]
    assert out["value_old" if "value_old" in out else "v_old"].iloc[0] == 10.0
    assert pd.isna(out["v_new"].iloc[0])
    assert out["v_new"].iloc[1] == 99.0 and out["v_old"].iloc[1] == 20.0
    assert pd.isna(out["v_old"].iloc[2]) and out["v_new"].iloc[2] == 50.0


def test_global_rank_dense_cardinality_guard(ray_session):
    """dense=True collects distinct (bucket, value) pairs; past the cap
    it must error with guidance instead of OOMing the driver."""
    from data_validator_ray.pipelines import relational as R

    df = pd.DataFrame({"v": np.arange(500, dtype=np.float64)})
    with pytest.raises(Exception, match="distinct"):
        R.global_rank(
            ray.data.from_pandas(df), "v", dense=True, max_dense_distinct=100
        ).to_pandas()


def test_spine_fill_cell_count_guard(ray_session):
    """periods × key-tuples past max_cells errors instead of building
    the grid."""
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2020-01-01", "2021-12-31"] * 50),
            "v": np.arange(100, dtype=np.float64),
            "k": [f"k{i}" for i in range(100)],
        }
    )
    from data_validator_ray.pipelines import relational as R

    with pytest.raises(Exception, match="cells"):
        R.spine_fill(
            ray.data.from_pandas(df), "ts", "v", key_cols=["k"],
            unit="day", max_cells=1000,
        )


def test_interval_join_shuffle_matches_brute(ray_session):
    """Binned shuffle interval join == brute-force O(n·k) containment:
    overlapping intervals, negative values, boundary exactness (half-
    open hi), NULLs on both sides, several bin widths."""
    from data_validator_ray.pipelines import relational as R

    rng = np.random.default_rng(9)
    v = np.round(rng.uniform(-10, 10, 300), 3)
    left = pd.DataFrame({"value": v, "lid": np.arange(300, dtype=np.int64)})
    left.loc[5, "value"] = np.nan
    lo = np.round(rng.uniform(-12, 9, 80), 3)
    right = pd.DataFrame(
        {
            "lo": lo,
            "hi": np.round(lo + rng.uniform(0.1, 6, 80), 3),
            "iv": np.arange(80, dtype=np.int64),
        }
    )
    right.loc[3, "hi"] = right.loc[3, "lo"]  # empty interval: no match
    # boundary case: a value exactly at someone's hi must NOT match it
    right.loc[7, ["lo", "hi"]] = [0.0, float(left.loc[0, "value"])]

    lv = left["value"].to_numpy()
    truth = set()
    for _, r in right.iterrows():
        m = (lv >= r.lo) & (lv < r.hi)
        for li in left["lid"].to_numpy()[np.nan_to_num(m, nan=False).astype(bool)]:
            truth.add((int(li), int(r.iv)))
    for bw in (0.5, 2.0, 7.0):
        out = R.interval_join_shuffle(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            value_col="value", left_cols=["lid"], right_cols=["iv"],
            bin_width=bw, num_buckets=8,
        ).to_pandas()
        got = set(map(tuple, out[["lid", "iv"]].astype(int).values))
        assert got == truth, f"bin_width={bw}"


def test_interval_join_shuffle_span_guard(ray_session):
    from data_validator_ray.pipelines import relational as R

    left = pd.DataFrame({"value": [1.0], "lid": [0]})
    right = pd.DataFrame({"lo": [0.0], "hi": [1e6], "iv": [0]})
    with pytest.raises(Exception, match="spans"):
        R.interval_join_shuffle(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            value_col="value", left_cols=["lid"], right_cols=["iv"],
            bin_width=1.0, max_bins_per_interval=100,
        ).to_pandas()


def test_reconcile_tables_statuses(ray_session):
    """Matched-within-tolerance, mismatched, both orphan directions,
    and the all-NULL-measure key (SQL SUM=NULL -> missing_fact)."""
    from data_validator_ray.pipelines.relational import reconcile_tables

    fact = pd.DataFrame(
        {
            "k": [1, 1, 2, 3, 3, 4, 4, 6, None],
            "a": [10.0, 5.0, 7.0, None, None, 1.0, None, 2.0, 99.0],
        }
    )
    hdr = pd.DataFrame(
        {"k": [1, 2, 3, 4, 5], "exp": [15.0, 7.005, 100.0, 1.5, 9.0]}
    )
    out = (
        reconcile_tables(
            fact, hdr, fact_key="k", header_key="k",
            fact_value_expr="a", header_value_col="exp", tolerance=0.01,
        )
        .to_pandas()
        .set_index("key")
    )
    assert out.loc[1, "status"] == "matched"        # exact
    assert out.loc[2, "status"] == "matched"        # within tolerance
    assert out.loc[3, "status"] == "missing_fact"   # all-NULL measure
    assert out.loc[4, "status"] == "mismatched"     # 1.0 vs 1.5
    assert out.loc[5, "status"] == "missing_fact"   # no fact rows
    assert out.loc[6, "status"] == "missing_header"
    assert len(out) == 6  # NULL fact key dropped
    assert out.loc[2, "diff_micros"] == 5000        # 0.005 in micros
    assert out.loc[1, "fact_sum_micros"] == 15_000_000


def test_funnel_steps_strict_order(ray_session):
    """Only keys whose step events occur in strict ts order advance;
    equal timestamps do NOT count (strict >); later steps can never
    exceed earlier ones."""
    from data_validator_ray.pipelines.relational import funnel_steps

    t0 = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    ev = pd.DataFrame(
        [
            # u1 completes in order
            (1, t0, "a"), (1, t0 + h, "b"), (1, t0 + 2 * h, "c"),
            # u2: b before a -> stops after a
            (2, t0, "b"), (2, t0 + h, "a"),
            # u3: a and b at the SAME instant -> strict order fails at b
            (3, t0, "a"), (3, t0, "b"),
            # u4: a->b, no c; noise events ignored
            (4, t0, "a"), (4, t0 + h, "x"), (4, t0 + 2 * h, "b"),
            # u5: completes using later 'a' (greedy earliest a at t0
            # still works since b comes after)
            (5, t0, "a"), (5, t0 + h, "b"), (5, t0 + h, "c"),  # c ties b
        ],
        columns=["user_id", "ts", "event_type"],
    )
    f = funnel_steps(ev, "user_id", "ts", "event_type", ["a", "b", "c"])
    assert f.step.tolist() == ["a", "b", "c"]
    # a: u1..u5 all have an 'a' = 5; b: u1, u4, u5 (u2 has no b after
    # its a? u2's b is BEFORE a -> no; u3 ties -> no) = 3;
    # c: u1 only (u5's c ties its b -> strict fails) = 1
    assert f.n_keys.tolist() == [5, 3, 1]


def test_cohort_retention_triangle(ray_session):
    from data_validator_ray.pipelines.relational import cohort_retention

    w = pd.Timestamp("2024-01-01")  # a Monday
    wk = pd.Timedelta(days=7)
    ev = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 3],
            "ts": [w, w + wk, w + 3 * wk,          # u1: weeks 0,1,3
                   w + wk, w + wk + pd.Timedelta(days=3),  # u2: week 1 twice
                   w + 2 * wk],                     # u3: week 2
        }
    )
    out = (
        cohort_retention(ev, "user_id", "ts")
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    got = {
        (str(r.cohort_week), int(r.week_offset)): int(r.n_active_keys)
        for r in out.itertuples()
    }
    assert got == {
        ("2024-01-01", 0): 1, ("2024-01-01", 1): 1, ("2024-01-01", 3): 1,
        ("2024-01-08", 0): 1,   # u2 cohort week 1, active once
        ("2024-01-15", 0): 1,   # u3
    }


def test_event_transitions_tiebreak_and_nulls(ray_session):
    """Ties order by the tiebreak column; NULL keys/timestamps drop;
    the last event of a key contributes no transition."""
    from data_validator_ray.pipelines.relational import event_transitions

    t0 = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    ev = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, None, 3],
            "ts": [t0, t0 + h, t0 + h, t0, pd.NaT, t0, t0],
            "event_id": [1, 3, 2, 1, 2, 3, 4],
            "event_type": ["a", "c", "b", "a", "b", "a", "a"],
        }
    )
    out = (
        event_transitions(ev, "user_id", "ts", "event_type",
                          tiebreak_col="event_id")
        .to_pandas()
        .sort_values(["from_event", "to_event"])
        .reset_index(drop=True)
    )
    # u1: a -> b (event_id 2 before 3 at equal ts) -> c; u2: only the
    # valid 'a' row (NaT drops); u3 single event; NULL key drops.
    got = {
        (r.from_event, r.to_event): int(r.n_transitions)
        for r in out.itertuples()
    }
    assert got == {("a", "b"): 1, ("b", "c"): 1}


def test_cdc_apply_semantics(ray_session):
    """Upsert beats older changes, delete removes (even snapshot-only
    semantics: delete of an absent key emits nothing), inserts appear,
    untouched snapshot keys survive, NULL upsert value propagates."""
    from data_validator_ray.pipelines.relational import cdc_apply

    snap = pd.DataFrame({"k": [1, 2, 3, 4], "bal": [10.0, 20.0, 30.0, 40.0]})
    ch = pd.DataFrame(
        {
            "k": [1, 1, 2, 5, 6, 7, None],
            "seq": [1.0, 2.0, 1.0, 1.0, 1.0, 1.0, 9.0],
            "op": ["U", "U", "D", "U", "D", "U", "U"],
            "v": [11.0, 12.0, 99.0, 50.0, 60.0, None, 1.0],
        }
    )
    out = (
        cdc_apply(
            snap, ch, key_col="k", snap_val_col="bal",
            seq_cols=["seq"], op_col="op", val_col="v",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    got = {int(r.k): (None if pd.isna(r.val) else float(r.val))
           for r in out.itertuples()}
    # 1: latest U wins (12); 2: deleted; 3,4: untouched; 5: inserted;
    # 6: delete of absent key -> nothing; 7: U with NULL value -> NULL.
    assert got == {1: 12.0, 3: 30.0, 4: 40.0, 5: 50.0, 7: None}


def test_grouped_ewma_closed_form(ray_session):
    """Closed-form weights equal the sequential recursion
    (adjust=False); single-row keys return x itself; NULL order rows
    drop; NULL x propagates."""
    from data_validator_ray.pipelines.relational import grouped_ewma

    t0 = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    ev = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 3, 3, 4],
            "ts": [t0, t0 + s, t0 + 2 * s, t0, t0, pd.NaT, t0],
            "i": [1, 2, 3, 1, 1, 2, 1],
            "x": [1.0, 2.0, 4.0, 7.0, 5.0, 9.0, None],
        }
    )
    out = (
        grouped_ewma(ev, "k", ["ts", "i"], "x", alpha=0.5)
        .to_pandas()
        .set_index("k")
    )
    # k=1: ((1*0.5+2*0.5)*0.5 + 4*0.5) = 2.75
    assert out.loc[1, "ewma"] == 2.75 and int(out.loc[1, "n"]) == 3
    assert out.loc[2, "ewma"] == 7.0
    assert out.loc[3, "ewma"] == 5.0  # NaT row dropped
    assert pd.isna(out.loc[4, "ewma"])


def test_winsorize_clip_bounds(ray_session):
    """Exact interpolated cutoffs; NULLs pass through; values inside
    the band unchanged."""
    from data_validator_ray.pipelines.relational import winsorize

    df = pd.DataFrame(
        {"id": range(11),
         "v": [0.0, 1, 2, 3, 4, 5, 6, 7, 8, 100, None]}
    )
    out = (
        winsorize(df, "v", lower_q=0.1, upper_q=0.9, id_cols=["id"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # 10 non-null values: p10 = 0.9, p90 = 8*0.9+100*0.1... via
    # quantile_cont over (0..8,100): rn=.1*9=0.9 -> 0.9; rn=8.1 ->
    # 0.9*8 + 0.1*100 = 17.2
    assert out.v_wins[0] == 0.9
    assert out.v_wins[9] == 17.2
    assert out.v_wins[5] == 5.0
    assert pd.isna(out.v_wins[10])


def test_interval_coverage_union_semantics(ray_session):
    """Overlaps merge, nested intervals add nothing, degenerate and
    negative intervals contribute 0 but can open islands, gaps split
    islands."""
    from data_validator_ray.pipelines.relational import interval_coverage

    t0 = pd.Timestamp("2024-01-01")

    def at(sec):
        return t0 + pd.Timedelta(seconds=sec)

    iv = pd.DataFrame(
        [
            # k=1: [0,10) + [5,12) merge -> 12; [20,25) second island
            (1, at(0), at(10)), (1, at(5), at(12)), (1, at(20), at(25)),
            # k=2: nested [0,10) ⊃ [2,5) -> 10, one island
            (2, at(0), at(10)), (2, at(2), at(5)),
            # k=3: degenerate [0,0) then negative [5,3): 0 covered,
            # both open islands (0-start, then 5 > running max 0)
            (3, at(0), at(0)), (3, at(5), at(3)),
        ],
        columns=["k", "s", "e"],
    )
    out = (
        interval_coverage(iv, "k", "s", "e")
        .to_pandas()
        .set_index("k")
    )
    assert int(out.loc[1, "covered_us"]) == 17_000_000
    assert int(out.loc[1, "n_islands"]) == 2
    assert int(out.loc[2, "covered_us"]) == 10_000_000
    assert int(out.loc[2, "n_islands"]) == 1
    assert int(out.loc[3, "covered_us"]) == 0
    assert int(out.loc[3, "n_islands"]) == 2


def test_table_checksum_order_independent(ray_session):
    """Same rows, different order/partitioning -> same checksum;
    a one-cell change -> different checksum; NULLs canonicalize."""
    import pandas as pd

    from data_validator_ray.pipelines.integrity import table_checksum

    a = pd.DataFrame({"k": [1, 2, 3], "s": ["x", None, "z"]})
    b = a.iloc[[2, 0, 1]].reset_index(drop=True)
    ca = table_checksum(a, ["k", "s"])
    cb = table_checksum(b, ["k", "s"])
    assert ca.checksum[0] == cb.checksum[0]
    assert int(ca.n_rows[0]) == 3
    c = a.copy()
    c.loc[0, "s"] = "X"
    assert table_checksum(c, ["k", "s"]).checksum[0] != ca.checksum[0]


def test_schema_diff_statuses(ray_session):
    import pandas as pd

    from data_validator_ray.pipelines.integrity import schema_diff

    a = pd.DataFrame({"x": [1], "y": [1.0], "z": ["s"]})
    b = pd.DataFrame({"x": [1], "y": ["1.0"], "w": [True]})
    d = schema_diff(a, b).set_index("column_name")
    assert d.loc["x", "status"] == "same"
    assert d.loc["y", "status"] == "changed"
    assert d.loc["z", "status"] == "removed"
    assert d.loc["w", "status"] == "added"
    assert d.loc["w", "type_b"] == "BOOLEAN"


def test_time_weighted_avg_step_semantics(ray_session):
    """Value holds until the next observation; single-point keys are
    NULL; duplicate timestamps add zero width."""
    from data_validator_ray.pipelines.relational import time_weighted_avg

    t0 = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 3, 3],
            "ts": [t0, t0 + s, t0 + 3 * s, t0, t0, t0],
            "v": [10.0, 20.0, 99.0, 5.0, 1.0, 2.0],
        }
    )
    out = (
        time_weighted_avg(df, "k", "ts", "v").to_pandas().set_index("k")
    )
    # k=1: 10*1s + 20*2s over 3s = 50/3
    assert out.loc[1, "twavg"] == round(50 / 3, 6)
    assert pd.isna(out.loc[2, "twavg"])   # single point
    assert pd.isna(out.loc[3, "twavg"])   # zero span (dup ts)


def test_association_rules_basket_semantics(ray_session):
    """Duplicate events in a basket count once; pairs are unordered
    (a < b); lift > 1 for co-occurring, min_pair_count prunes."""
    from data_validator_ray.pipelines.relational import association_rules

    ev = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3, 3, 4, None],
            "i": ["x", "x", "y", "x", "y", "x", "z", "w", "x"],
        }
    )
    out = association_rules(ev, "k", "i").set_index(["item_a", "item_b"])
    # baskets: {x,y}, {x,y}, {x,z}, {w} -> N=4
    assert int(out.loc[("x", "y"), "n_ab"]) == 2
    assert out.loc[("x", "y"), "support"] == 0.5
    assert out.loc[("x", "y"), "conf_a_b"] == round(2 / 3, 6)
    assert out.loc[("x", "y"), "lift"] == round(2 * 4 / (3 * 2), 6)
    pruned = association_rules(ev, "k", "i", min_pair_count=2)
    assert len(pruned) == 1


def test_throttle_dedup_lag_semantics(ray_session):
    """Compares to the immediate predecessor (kept or not): a steady
    burst inside the window keeps only its first row, a gap break
    re-admits; different keys never interact."""
    from data_validator_ray.pipelines.relational import throttle_dedup

    t0 = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    ev = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2],
            "ts": [t0, t0 + s, t0 + 2 * s, t0 + 13 * s, t0 + s],
            "i": [1, 2, 3, 4, 5],
        }
    )
    out = throttle_dedup(
        ev, ["k"], "ts", window_seconds=10, id_col="i"
    ).to_pandas()
    # burst 1,2,3: only 1 survives (2 is 1s after 1; 3 is 1s after 2
    # even though 2 was dropped — LAG semantics); 4 is 11s after 3.
    assert sorted(out.i.tolist()) == [1, 4, 5]


def test_grouped_cusum_level_shift(ray_session):
    """A sustained level shift produces a large excursion range; a
    constant series stays at zero."""
    from data_validator_ray.pipelines.relational import grouped_cusum

    t0 = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    rows = []
    for i in range(10):
        rows.append((1, t0 + i * s, i, 0.0 if i < 5 else 10.0))
        rows.append((2, t0 + i * s, i, 7.0))
    df = pd.DataFrame(rows, columns=["k", "ts", "i", "x"])
    out = (
        grouped_cusum(df, "k", ["ts", "i"], "x")
        .to_pandas()
        .set_index("k")
    )
    # k=1: mean 5; cumsum dips to -25 mid-series then returns to 0
    assert out.loc[1, "cusum_min"] == -25.0
    assert out.loc[1, "cusum_range"] == 25.0
    assert out.loc[2, "cusum_range"] == 0.0


def test_keyset_overlap_partial_overlap(ray_session):
    """Duplicates collapse to distinct keys; NULLs drop; disjoint and
    contained cases compute correct Jaccard/containment."""
    import pandas as pd

    from data_validator_ray.pipelines.integrity import keyset_overlap

    a = pd.DataFrame({"x": [1, 1, 2, 3, None]})
    b = pd.DataFrame({"y": [2, 3, 4, 4, 5]})
    out = keyset_overlap(a, "x", b, "y")
    assert int(out.n_a[0]) == 3 and int(out.n_b[0]) == 4
    assert int(out.n_intersect[0]) == 2 and int(out.n_union[0]) == 5
    assert out.jaccard[0] == 0.4
    assert out.containment_a_in_b[0] == round(2 / 3, 6)
    assert out.containment_b_in_a[0] == 0.5


def test_interpolate_missing_semantics(ray_session):
    import numpy as np
    import pandas as pd
    from data_validator_ray.pipelines.relational import interpolate_missing

    df = pd.DataFrame(
        {
            "k": ["a"] * 5 + ["b"] * 3,
            "t": [0.0, 1.0, 3.0, 4.0, 6.0, 0.0, 1.0, 2.0],
            "v": [10.0, None, None, 40.0, None, None, 5.0, None],
            "i": list(range(8)),
        }
    )
    out = (
        interpolate_missing(df, "k", "t", "v", tiebreak_cols=["i"])
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    got = out["v_interp"].tolist()
    # a: t=1 -> 10 + 30*(1/4) = 17.5 ; t=3 -> 10 + 30*(3/4) = 32.5
    # a: trailing t=6 has no next -> stays NULL
    # b: leading t=0 has no prev -> NULL; trailing t=2 -> NULL
    assert got[0] == 10.0 and got[3] == 40.0 and got[6] == 5.0
    assert got[1] == 17.5 and got[2] == 32.5
    assert np.isnan(got[4]) and np.isnan(got[5]) and np.isnan(got[7])

    # zero time gap between neighbours -> previous value (contract)
    df2 = pd.DataFrame(
        {"k": ["x"] * 3, "t": [1.0, 1.0, 1.0], "v": [3.0, None, 9.0],
         "i": [0, 1, 2]}
    )
    out2 = (
        interpolate_missing(df2, "k", "t", "v", tiebreak_cols=["i"])
        .to_pandas().sort_values("i")
    )
    assert out2["v_interp"].tolist()[1] == 3.0

    # timestamps: exact microsecond ratio
    df3 = pd.DataFrame(
        {
            "k": [1, 1, 1],
            "t": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:01",
                 "2024-01-01 00:00:04"]
            ),
            "v": [0.0, None, 8.0],
            "i": [0, 1, 2],
        }
    )
    out3 = (
        interpolate_missing(df3, "k", "t", "v", tiebreak_cols=["i"])
        .to_pandas().sort_values("i")
    )
    assert out3["v_interp"].tolist()[1] == 2.0


def test_incremental_aggregate_matches_recompute(ray_session):
    import duckdb
    import pandas as pd
    from data_validator_ray.pipelines.relational import incremental_aggregate

    base = pd.DataFrame(
        {
            "k": [1, 2, 3, 4, 5],
            "g": ["a", "a", "b", "b", "b"],
            "v": [10.0, 20.0, 1.5, 2.5, 3.0],
        }
    )
    # two changes to key 2 (latest wins -> moves to group c with 99),
    # delete key 3, insert key 9 into new group d, delete-then-insert
    # cannot happen (latest wins picks one)
    ch = pd.DataFrame(
        {
            "k": [2, 2, 3, 9],
            "s": [1.0, 2.0, 1.0, 1.0],
            "op": ["U", "U", "D", "U"],
            "cg": ["a", "c", "b", "d"],
            "cv": [50.0, 99.0, 0.0, 7.25],
        }
    )
    out = incremental_aggregate(
        base, ch, key_col="k", group_col="g", val_col="v",
        op_col="op", seq_cols=["s"],
        change_group_col="cg", change_val_col="cv",
    ).to_pandas()
    expected = duckdb.sql(
        "WITH latest AS (SELECT k, op, cg, cv FROM ch QUALIFY "
        "ROW_NUMBER() OVER (PARTITION BY k ORDER BY s DESC) = 1), "
        "applied AS ("
        "SELECT COALESCE(l.cg, b.g) g, CASE WHEN l.k IS NOT NULL THEN "
        "CAST(ROUND(l.cv * 100) AS BIGINT) ELSE "
        "CAST(ROUND(b.v * 100) AS BIGINT) END u "
        "FROM base b LEFT JOIN latest l ON l.k = b.k "
        "WHERE l.op IS NULL OR l.op != 'D' "
        "UNION ALL SELECT l.cg, CAST(ROUND(l.cv * 100) AS BIGINT) "
        "FROM latest l LEFT JOIN base b ON b.k = l.k "
        "WHERE b.k IS NULL AND l.op != 'D') "
        "SELECT g, SUM(u)::BIGINT s, COUNT(*)::BIGINT c "
        "FROM applied GROUP BY g ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(out, expected, check_dtype=False)
    # group 'b' lost key 3: 1.5 gone; 'c' and 'd' are new
    assert out.set_index("g").loc["b", "c"] == 2
    assert out.set_index("g").loc["c", "s"] == 9900

    # TRUE incremental: feed the stored aggregate forward through a
    # second change batch; must equal the bootstrap over the full log
    ch2 = pd.DataFrame(
        {"k": [1, 9], "s": [3.0, 3.0], "op": ["D", "U"],
         "cg": ["a", "d"], "cv": [0.0, 8.0]}
    )
    stored = incremental_aggregate(
        base, ch, key_col="k", group_col="g", val_col="v",
        op_col="op", seq_cols=["s"],
        change_group_col="cg", change_val_col="cv",
    )
    # apply ch to base to get the post-batch-1 state, then run batch 2
    # against it with the stored aggregate
    applied1 = duckdb.sql(
        "WITH latest AS (SELECT k, op, cg, cv FROM ch QUALIFY "
        "ROW_NUMBER() OVER (PARTITION BY k ORDER BY s DESC) = 1) "
        "SELECT COALESCE(l.k, b.k) k, COALESCE(l.cg, b.g) g, "
        "COALESCE(l.cv, b.v) v "
        "FROM base b FULL JOIN latest l ON l.k = b.k "
        "WHERE COALESCE(l.op, '') != 'D'"
    ).df()
    inc = incremental_aggregate(
        applied1, ch2, key_col="k", group_col="g", val_col="v",
        op_col="op", seq_cols=["s"],
        change_group_col="cg", change_val_col="cv",
        base_agg=stored,
    ).to_pandas()
    boot = incremental_aggregate(
        applied1, ch2, key_col="k", group_col="g", val_col="v",
        op_col="op", seq_cols=["s"],
        change_group_col="cg", change_val_col="cv",
    ).to_pandas()
    pd.testing.assert_frame_equal(inc, boot)


def test_late_arrival_stats_semantics(ray_session):
    import duckdb
    import pandas as pd
    from data_validator_ray.pipelines.relational import late_arrival_stats

    df = pd.DataFrame(
        {
            "k": ["a"] * 5 + ["b"] * 3,
            "seq": [0, 1, 2, 3, 4, 0, 1, 2],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:10",  # watermark 10
                    "2024-01-01 00:00:05",  # late by 5s
                    None,                   # NULL: never late, no advance
                    "2024-01-01 00:00:08",  # late by 2s (wm still 10)
                    "2024-01-01 00:00:20",  # on time
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:00:01",
                    "2024-01-01 00:00:02",  # b: perfectly ordered
                ]
            ),
        }
    )
    out = (
        late_arrival_stats(df, "k", "seq", "ts")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    a = out.iloc[0]
    assert (a["n"], a["n_late"]) == (5, 2)
    assert a["max_lateness_us"] == 5_000_000
    assert a["frac_late"] == 0.4
    b = out.iloc[1]
    assert (b["n_late"], b["max_lateness_us"]) == (0, 0)

    ora = duckdb.sql(
        "WITH w AS (SELECT k, epoch_us(ts) AS t, MAX(epoch_us(ts)) OVER "
        "(PARTITION BY k ORDER BY seq ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND 1 PRECEDING) AS pm FROM df) "
        "SELECT k, COUNT(*)::BIGINT n, "
        "(COUNT(*) FILTER (WHERE t < pm))::BIGINT n_late, "
        "COALESCE(MAX(CASE WHEN t < pm THEN pm - t END), 0)::BIGINT "
        "max_lateness_us, "
        "ROUND((COUNT(*) FILTER (WHERE t < pm))::DOUBLE / COUNT(*), 6) "
        "frac_late FROM w GROUP BY k ORDER BY k"
    ).df()
    pd.testing.assert_frame_equal(
        out[sorted(out.columns)], ora[sorted(ora.columns)],
        check_dtype=False,
    )


def test_ratio_to_report_null_semantics(ray_session):
    """NULL values get NULL shares and don't inflate the denominator;
    NULL keys form their own partition; shares sum to 1 per partition."""
    from data_validator_ray.pipelines.relational import ratio_to_report

    df = pd.DataFrame(
        {
            "id": range(7),
            "k": ["a", "a", "a", "b", None, None, "c"],
            "v": [1.0, 3.0, None, 5.0, 2.0, 2.0, None],
        }
    )
    out = (
        ratio_to_report(ray.data.from_pandas(df), "k", "v", columns=["id"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert out.value_share[0] == 0.25 and out.value_share[1] == 0.75
    assert np.isnan(out.value_share[2])          # NULL value
    assert out.value_share[3] == 1.0
    assert out.value_share[4] == 0.5 and out.value_share[5] == 0.5  # NULL key
    assert np.isnan(out.value_share[6])          # all-NULL partition

    # the beyond-broadcast bucketed tier (rows shuffle once, the
    # driver never holds key sums) is value-identical, NULLs included
    bucketed = (
        ratio_to_report(
            ray.data.from_pandas(df), "k", "v", columns=["id"],
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        bucketed[out.columns.tolist()], out, check_dtype=False
    )


def test_windowed_aggregate_with_lateness_planted(ray_session):
    """Planted disorder: a row arriving after its key's watermark has
    passed (beyond allowed lateness) is excluded from its window's sum
    but counted late; within-lateness disorder stays on-time."""
    from data_validator_ray.pipelines.relational import (
        windowed_aggregate_with_lateness,
    )

    base = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    df = pd.DataFrame(
        {
            "k": ["a"] * 5,
            "arr": [1, 2, 3, 4, 5],
            "ts": [
                base,                      # w0, advances wm to t0
                base + 5 * h,              # w5, wm -> t0+5h
                base + 4 * h,              # 1h late < 2h allowed: ON time
                base + 1 * h,              # 4h late > 2h allowed: LATE (w1)
                base + 6 * h,              # on time
            ],
            "v": [1.0, 2.0, 4.0, 8.0, 16.0],
        }
    )
    out = (
        windowed_aggregate_with_lateness(
            ray.data.from_pandas(df), "k", "arr", "ts", "v",
            window_seconds=3600, allowed_lateness_seconds=2 * 3600,
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    w = {r.window_start.hour: r for r in out.itertuples()}
    assert w[0].n_ontime == 1 and w[0].value_sum == 1.0 and w[0].n_late == 0
    assert w[1].n_ontime == 0 and np.isnan(w[1].value_sum) and w[1].n_late == 1
    assert w[4].n_ontime == 1 and w[4].value_sum == 4.0
    assert w[5].n_ontime == 1 and w[5].value_sum == 2.0
    assert w[6].n_ontime == 1 and w[6].value_sum == 16.0


def test_bloom_prefilter_join_anti(ray_session):
    """Anti mode: bloom misses stream straight to output, candidates
    verify exactly, NULL left keys are kept, matched rows drop."""
    import duckdb

    from data_validator_ray.pipelines.relational import bloom_prefilter_join

    left = pd.DataFrame(
        {"k": [1, 2, 3, 4, None, 6], "x": list("abcdef")}
    )
    right = pd.DataFrame({"rk": [2, 4, 4, 99]})
    out = (
        bloom_prefilter_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            left_key="k", right_key="rk",
            left_cols=["k", "x"], right_cols=["rk"], how="anti",
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    assert out.x.tolist() == ["a", "c", "e", "f"]  # 2 and 4 matched

    with pytest.raises(ValueError):
        bloom_prefilter_join(
            left, right, left_key="k", right_key="rk",
            left_cols=["k"], right_cols=["rk"], how="left",
        )


def test_interarrival_stats_gaps(ray_session):
    """Gaps computed within keys only; single-event keys have zero
    gaps and NULL stats; exact microsecond min/max."""
    from data_validator_ray.pipelines.relational import interarrival_stats

    base = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "c", "c"],
            "ts": [base, base + 2 * s, base + 5 * s,
                   base, base + 10 * s, base + 10 * s],
            "id": [1, 2, 3, 4, 5, 6],
        }
    )
    out = (
        interarrival_stats(ray.data.from_pandas(df), "k", "ts",
                           tiebreak_cols=["id"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    a, b, c = out.iloc[0], out.iloc[1], out.iloc[2]
    assert a.n_events == 3 and a.n_gaps == 2
    assert a.mean_gap_s == 2.5 and a.min_gap_us == 2e6 and a.max_gap_us == 3e6
    assert b.n_events == 1 and b.n_gaps == 0 and np.isnan(b.mean_gap_s)
    assert c.n_gaps == 1 and c.min_gap_us == 0.0  # duplicate timestamp


def test_grouped_mad_matches_duckdb(ray_session):
    """Exact MAD (median of |x - median|, cont interpolation at both
    levels) bit-matches DuckDB mad() incl. NULLs and all-NULL groups."""
    import duckdb

    from data_validator_ray.pipelines.relational import grouped_mad

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], 300),
            "v": rng.normal(10, 5, 300),
        }
    )
    df.loc[df.index[:20], "v"] = None
    df = pd.concat(
        [df, pd.DataFrame({"g": ["nullg", "nullg"], "v": [None, None]})],
        ignore_index=True,
    )
    out = (
        grouped_mad(ray.data.from_pandas(df), "g", "v")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    ref = con.execute(
        "SELECT g, COUNT(v)::BIGINT n, median(v) median, mad(v) mad "
        "FROM t GROUP BY g ORDER BY g"
    ).df()
    assert out.g.tolist() == ref.g.tolist()
    assert out.n.tolist() == ref.n.tolist()
    for c in ("median", "mad"):
        a, b = out[c].to_numpy(), ref[c].to_numpy()
        nan = np.isnan(a) & np.isnan(b)
        assert np.all(nan | (a == b))


def test_right_join_pads_unmatched_right(ray_session):
    from data_validator_ray.pipelines.relational import hash_join

    left = pd.DataFrame({"lk": [1, 1, 2], "lx": [10.0, 11.0, 20.0]})
    right = pd.DataFrame({"rk": [1, 3], "ry": ["a", "c"]})
    out = (
        hash_join(left, right, left_key="lk", right_key="rk",
                  left_cols=["lx"], right_cols=["ry"], how="right",
                  num_buckets=4)
        .to_pandas()
        .sort_values(["rk", "lx"], na_position="last")
        .reset_index(drop=True)
    )
    assert out.rk.tolist() == [1, 1, 3]
    assert out.lx.tolist()[:2] == [10.0, 11.0] and pd.isna(out.lx[2])
    assert out.ry.tolist() == ["a", "a", "c"]


def test_period_over_period_gaps_and_zero_prev(ray_session):
    """Gap periods skip (LAG convention); first period and zero-prev
    give NULL pct; exact changes."""
    from data_validator_ray.pipelines.relational import period_over_period

    d = pd.Timestamp("2024-03-01")
    day = pd.Timedelta(days=1)
    df = pd.DataFrame(
        {
            "ts": [d, d, d + day, d + 3 * day, d + 4 * day],
            "v": [1.0, 1.0, 4.0, 0.0, 5.0],
        }
    )
    out = period_over_period(df, "ts", "v", unit="day")
    assert len(out) == 4  # day+2 missing entirely
    pct = out["pct_change"]  # .pct_change is a pandas method — bracket
    assert np.isnan(pct[0])
    assert pct[1] == 1.0          # 2 -> 4
    assert pct[2] == -1.0         # 4 -> 0 (gap day skipped)
    assert np.isnan(pct[3])       # prev == 0
    assert out.abs_change[3] == 5.0


def test_period_distinct_dedupes_across_batches(ray_session):
    """Distinct counting survives the same (period, key) pair arriving
    in different batches; NULL ts/key rows drop."""
    from data_validator_ray.pipelines.relational import period_distinct

    base = pd.Timestamp("2024-06-01")
    day = pd.Timedelta(days=1)
    df = pd.DataFrame(
        {
            "ts": [base, base, base, base + day, base + day, None, base],
            "u": [1, 1, 2, 1, None, 3, 2],
        }
    )
    # 2 batches so duplicates cross batch boundaries
    ds = ray.data.from_pandas([df.iloc[:4], df.iloc[4:]])
    out = (
        period_distinct(ds, "ts", "u", unit="day")
        .to_pandas()
        .sort_values("period_start")
        .reset_index(drop=True)
    )
    assert out.n_distinct.tolist() == [2, 1]


def test_rolling_period_distinct_windows(ray_session):
    """Window covers [d-6, d]; a user active once counts in every
    anchored window within reach; anchors are present days only."""
    from data_validator_ray.pipelines.relational import (
        rolling_period_distinct,
    )

    base = pd.Timestamp("2024-06-01")
    day = pd.Timedelta(days=1)
    df = pd.DataFrame(
        {
            # users 1,2 on day0; user 3 on day3; user 1 again day10
            "ts": [base, base, base + 3 * day, base + 10 * day],
            "u": [1, 2, 3, 1],
        }
    )
    out = (
        rolling_period_distinct(ray.data.from_pandas(df), "ts", "u",
                                window_periods=7)
        .to_pandas()
        .sort_values("period_start")
        .reset_index(drop=True)
    )
    # anchors: day0 (users {1,2}), day3 ({1,2,3}), day10 ({1} — day3
    # is 7 days back, outside [d-6, d])
    assert out.n_distinct.tolist() == [2, 3, 1]

    with pytest.raises(ValueError):
        rolling_period_distinct(df, "ts", "u", unit="month")


def test_regex_extract_all_order_and_empties(ray_session):
    from data_validator_ray.pipelines.relational import regex_extract_all

    df = pd.DataFrame(
        {"id": [1, 2, 3, 4],
         "t": ["x9y88z7", "none here", None, "5"]}
    )
    out = (
        regex_extract_all(ray.data.from_pandas(df), "id", "t", "[0-9]+")
        .to_pandas()
        .sort_values(["id", "match_idx"])
        .reset_index(drop=True)
    )
    assert out["match"].tolist() == ["9", "88", "7", "5"]
    assert out.match_idx.tolist() == [1, 2, 3, 1]
    assert out.id.tolist() == [1, 1, 1, 4]


def test_top_n_plus_other_rollup(ray_session):
    """Top-n by summed value with deterministic tie-break; remaining
    keys aggregate into one <other> row; small groups emit no other."""
    from data_validator_ray.pipelines.relational import top_n_plus_other

    df = pd.DataFrame(
        {
            "g": ["a"] * 6 + ["b"] * 2,
            "k": ["u1", "u1", "u2", "u3", "u4", "u5", "x", "y"],
            "v": [5.0, 5.0, 8.0, 3.0, 2.0, 1.0, 7.0, 7.0],
        }
    )
    out = (
        top_n_plus_other(ray.data.from_pandas(df), "g", "k", "v", n=2)
        .to_pandas()
        .sort_values(["g", "key_out"])
        .reset_index(drop=True)
    )
    a = out[out.g == "a"].set_index("key_out")
    # a: u1=10, u2=8 top-2; other = u3+u4+u5 = 6 over 3 keys
    assert a.loc["u1"].value_sum == 10.0 and a.loc["u2"].value_sum == 8.0
    assert a.loc["<other>"].value_sum == 6.0
    assert a.loc["<other>"].n_keys == 3
    b = out[out.g == "b"]
    assert "<other>" not in b.key_out.tolist() and len(b) == 2


def test_bucket_by_quantile_bands_and_nulls(ray_session):
    import numpy as np
    import pandas as pd

    from data_validator_ray.pipelines.relational import bucket_by_quantile

    # 9 values 1..9: tertile cuts at quantile_cont(1/3)=3.666.., (2/3)=6.333..
    df = pd.DataFrame(
        {"id": range(10), "v": [1, 2, 3, 4, 5, 6, 7, 8, 9, None]}
    )
    out = (
        bucket_by_quantile(df, "v", id_cols=["id"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert out["bucket"].tolist() == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3 + [None]
    )
    # custom labels reverse the ordering convention (CCNet logprob)
    out2 = (
        bucket_by_quantile(
            df, "v", labels=["tail", "middle", "head"], id_cols=["id"]
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert out2["bucket"].tolist() == (
        ["tail"] * 3 + ["middle"] * 3 + ["head"] * 3 + [None]
    )


def test_bucket_by_quantile_grouped(ray_session):
    import pandas as pd

    from data_validator_ray.pipelines.relational import bucket_by_quantile

    # group b is group a scaled x10: per-group cuts must band each
    # group identically (a global cut would call all of b 'tail')
    df = pd.DataFrame(
        {
            "id": range(21),
            "g": ["a"] * 9 + ["b"] * 9 + [None, "c", "a"],
            "v": (
                [1, 2, 3, 4, 5, 6, 7, 8, 9]
                + [10, 20, 30, 40, 50, 60, 70, 80, 90]
                + [5.0, None, None]
            ),
        }
    )
    out = (
        bucket_by_quantile(df, "v", group_col="g", id_cols=["id"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["id", "g", "v", "bucket"]
    per_group = ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    assert out["bucket"][:9].tolist() == per_group
    assert out["bucket"][9:18].tolist() == per_group
    # NULL group key, all-NULL-value group, NULL value: all bucket NULL
    assert out["bucket"][18:].isna().all()


def test_bucket_by_quantile_grouped_int_keys(ray_session):
    import pandas as pd

    from data_validator_ray.pipelines.relational import bucket_by_quantile

    df = pd.DataFrame(
        {
            "id": range(6),
            "g": [1, 1, 1, 2, 2, 2],
            "v": [1, 2, 3, 10, 20, 30],
        }
    )
    out = (
        bucket_by_quantile(
            df, "v", group_col="g", qs=[0.5], labels=["lo", "hi"],
            id_cols=["id"],
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # per-group medians (2 and 20); <= cut -> first label
    assert out["bucket"].tolist() == ["lo", "lo", "hi"] * 2


def test_bucket_by_quantile_validation():
    import pandas as pd
    import pytest

    from data_validator_ray.pipelines.relational import bucket_by_quantile

    df = pd.DataFrame({"v": [1.0, 2.0]})
    with pytest.raises(ValueError, match="labels"):
        bucket_by_quantile(df, "v", qs=[0.5], labels=["a", "b", "c"])
    with pytest.raises(ValueError, match="ascending"):
        bucket_by_quantile(df, "v", qs=[0.7, 0.3], labels=["a", "b", "c"])
