"""Constraint suggestion (stages/suggest.py): decision contracts and
the self-consistency property — every suggested rule PASSES when run
back over the profiled data."""

import pandas as pd
import pytest

from data_validator_ray import (
    RayDataValidator,
    ValidationConfig,
    ValidationRule,
)
from data_validator_ray.stages.suggest import (
    suggest_rules,
    suggestions_to_rules,
)


@pytest.fixture
def df():
    return pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5, 6],                    # unique, no nulls
            "status": ["a", "b", "a", "b", "a", "a"],    # enum, no nulls
            "score": [1.5, 2.5, None, 4.0, 0.5, 9.5],    # nulls -> no completeness
            "blob": [f"x{i}y" for i in range(6)],        # unique strings
        }
    )


def test_suggest_decisions(ray_session, df):
    out = suggest_rules(df, batch_size=2).to_pandas()
    got = {
        (r["column"], r["rule_type"]): r for _, r in out.iterrows()
    }
    assert ("id", "completeness") in got
    assert ("id", "uniqueness") in got
    assert got[("id", "range")]["min_value"] == 1.0
    assert got[("id", "range")]["max_value"] == 6.0
    assert got[("status", "membership")]["allowed"] == "a,b"
    assert ("status", "uniqueness") not in got
    assert ("score", "completeness") not in got  # has a NULL
    assert got[("score", "range")]["min_value"] == 0.5
    assert ("blob", "uniqueness") in got
    # blob has 6 distinct <= enum_max -> membership also suggested
    assert got[("blob", "membership")]["allowed"].startswith("x0y,")


def test_suggest_enum_overflow_and_batch_cap(ray_session):
    # 30 distinct values > enum_max=20: overflow detected even though
    # every batch individually stays under the cap
    df = pd.DataFrame({"c": [f"v{i:02d}" for i in range(30)]})
    out = suggest_rules(df, batch_size=8).to_pandas()
    assert "membership" not in set(
        out[out["column"] == "c"]["rule_type"]
    )
    # near-unique column: HLL gate fires, exact distinct rejects
    df2 = pd.DataFrame({"k": list(range(99)) + [0]})
    out2 = suggest_rules(df2, batch_size=16).to_pandas()
    assert "uniqueness" not in set(
        out2[out2["column"] == "k"]["rule_type"]
    )


def test_suggestions_self_consistent(ray_session, df):
    table = suggest_rules(df, batch_size=2)
    rules = suggestions_to_rules(table)
    assert rules, "expected suggestions"
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "t", "rules": rules}],
    )
    s = RayDataValidator(cfg).validate_table(df, "t")
    assert all(r.passed for r in s.results), [
        (r.rule_name, r.message) for r in s.results if not r.passed
    ]
