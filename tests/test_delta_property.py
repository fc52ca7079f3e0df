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
