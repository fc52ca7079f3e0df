"""Property-based fuzzing of the Delta source/sink lifecycle: random
commit sequences (append/overwrite of small frames with unicode strings
and nullable values) must replay to exactly the pandas model at every
version — the log IS the state, so time travel is checked for each
prefix, not just the head."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_texts = st.text(
    alphabet="abÉ☃%=/ .\t'\"\\", min_size=0, max_size=8
)


@st.composite
def commit(draw):
    n = draw(st.integers(min_value=1, max_value=5))
    return (
        draw(st.sampled_from(["append", "overwrite"])),
        pd.DataFrame(
            {
                "id": pd.Series(
                    [
                        draw(
                            st.integers(
                                min_value=-(2**40), max_value=2**40
                            )
                        )
                        for _ in range(n)
                    ],
                    dtype="int64",
                ),
                # explicit dtypes: an all-None object column infers as
                # Arrow null type, which write_delta refuses (loudly)
                "s": pd.array(
                    [
                        draw(st.one_of(st.none(), _texts))
                        for _ in range(n)
                    ],
                    dtype="string",
                ),
                "f": pd.Series(
                    [
                        draw(
                            st.one_of(
                                st.none(),
                                st.floats(
                                    allow_nan=False,
                                    allow_infinity=True,
                                    width=64,
                                ),
                            )
                        )
                        for _ in range(n)
                    ],
                    dtype="float64",
                ),
            }
        ),
    )


@given(st.lists(commit(), min_size=1, max_size=3))
@settings(**_SETTINGS)
def test_delta_commit_sequence_matches_model(ray_session, commits):
    import shutil
    import tempfile

    from data_validator_ray.sources import read_delta, write_delta

    t = tempfile.mkdtemp(prefix="graft_delta_prop_")
    shutil.rmtree(t)
    model: list = []  # list of frames currently active
    states = []
    try:
        for mode, df in commits:
            write_delta(df, t, mode=mode)
            if mode == "overwrite":
                model = [df]
            else:
                model.append(df)
            states.append(
                pd.concat(model, ignore_index=True)
                if model
                else pd.DataFrame()
            )
        for v, want in enumerate(states):
            got = (
                read_delta(t, version=v)
                .to_pandas()
                .sort_values(["id", "s", "f"])
                .reset_index(drop=True)
            )
            want = (
                want.sort_values(["id", "s", "f"])
                .reset_index(drop=True)
                .astype({"id": "int64", "s": "object", "f": "float64"})
            )
            got = got.astype(
                {"id": "int64", "s": "object", "f": "float64"}
            )
            pd.testing.assert_frame_equal(got, want)
    finally:
        shutil.rmtree(t, ignore_errors=True)


@st.composite
def merge_case(draw):
    """A base table (unique int keys, some NULL-keyed rows) and a
    change set (unique keys overlapping the base or fresh)."""
    base_keys = draw(
        st.lists(
            st.integers(min_value=-50, max_value=50),
            min_size=1, max_size=12, unique=True,
        )
    )
    n_null = draw(st.integers(min_value=0, max_value=2))
    change_keys = draw(
        st.lists(
            st.integers(min_value=-60, max_value=60),
            min_size=1, max_size=8, unique=True,
        )
    )
    return base_keys, n_null, change_keys


@given(case=merge_case())
@settings(**_SETTINGS)
def test_merge_tiers_match_pandas_model(ray_session, tmp_path_factory, case):
    """Both merge tiers (CDC broadcast and forced backfill anti-join)
    must produce EXACTLY the pandas upsert model on random tables:
    matched keys replaced, new keys inserted, NULL table keys always
    surviving."""
    import shutil
    import tempfile

    import pandas as pd

    from data_validator_ray.sources import (
        merge_delta,
        read_delta,
        write_delta,
    )

    base_keys, n_null, change_keys = case
    base = pd.DataFrame(
        {
            "id": pd.array(base_keys + [None] * n_null, dtype="Int64"),
            "v": [float(k) for k in base_keys] + [-99.0] * n_null,
        }
    )
    changes = pd.DataFrame(
        {
            "id": pd.array(change_keys, dtype="Int64"),
            "v": [1000.0 + k for k in change_keys],
        }
    )
    # pandas model: drop matched non-null keys, append changes
    keep = base[~base["id"].isin(changes["id"]) | base["id"].isna()]
    want = (
        pd.concat([keep, changes], ignore_index=True)
        .sort_values(["id", "v"], na_position="last")
        .reset_index(drop=True)
    )
    for bound in (5_000_000, 1):  # CDC tier, then forced backfill tier
        t = tempfile.mkdtemp(prefix="graft_dmp_", dir="/tmp")
        shutil.rmtree(t)
        try:
            write_delta(base, t)
            merge_delta(t, changes, "id", max_broadcast_keys=bound)
            got = (
                read_delta(t)
                .to_pandas()
                .sort_values(["id", "v"], na_position="last")
                .reset_index(drop=True)
                .astype({"id": "Int64", "v": "float64"})
            )
            pd.testing.assert_frame_equal(
                got, want.astype({"id": "Int64", "v": "float64"})
            )
        finally:
            shutil.rmtree(t, ignore_errors=True)
