"""Round-4 session-5 rule kernels: distinctness (deequ
hasDistinctness), unique_value_ratio (hasUniqueValueRatio),
mutual_information (hasMutualInformation), string_length
(MinLength/MaxLength row-resolved) — known-value semantics, NULL
handling, filter-mode masks, error paths."""

import math

import numpy as np
import pandas as pd

from data_validator_ray import (
    RayDataValidator,
    ValidationConfig,
    ValidationRule,
)


def _validator(rules):
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "t", "rules": [r.model_dump() for r in rules]}],
    )
    return RayDataValidator(cfg)


def run_rules(df, rules):
    return _validator(rules).validate_table(df, "t")


# -- distinctness ----------------------------------------------------------- #

def test_distinctness_known_ratio(ray_session):
    # 3 distinct / 6 non-NULL = 0.5; NULLs excluded from both sides
    df = pd.DataFrame({"c": ["a", "a", "b", "b", "c", "c", None]})
    r = run_rules(df, [ValidationRule(
        name="d", rule_type="distinctness", column="c",
        parameters={"min_value": 0.5, "max_value": 0.5},
    )]).results[0]
    assert (r.total_count, r.failed_count) == (1, 0)
    assert r.metadata["distinctness"] == 0.5
    assert r.metadata["distinct_count"] == 3
    assert r.metadata["non_null_count"] == 6


def test_distinctness_bounds_and_all_null(ray_session):
    df = pd.DataFrame({"c": ["a", "a", "b", "b"]})
    lo = run_rules(df, [ValidationRule(
        name="d", rule_type="distinctness", column="c",
        parameters={"min_value": 0.9},
    )]).results[0]
    assert lo.failed_count == 1  # 0.5 < 0.9
    nul = run_rules(
        pd.DataFrame({"c": pd.Series([None, None], dtype="object")}),
        [ValidationRule(
            name="d", rule_type="distinctness", column="c",
            parameters={"min_value": 0.0},
        )],
    ).results[0]
    assert nul.failed_count == 1  # unknown ratio = failed verdict
    assert nul.metadata["distinctness"] is None


# -- unique_value_ratio ----------------------------------------------------- #

def test_unique_value_ratio_known(ray_session):
    # counts {a:1, b:2, c:1, d:3} → 2 of 4 distinct values unique
    df = pd.DataFrame({"c": list("abbcddd")})
    r = run_rules(df, [ValidationRule(
        name="u", rule_type="unique_value_ratio", column="c",
        parameters={"min_value": 0.5, "max_value": 0.5},
    )]).results[0]
    assert (r.total_count, r.failed_count) == (1, 0)
    assert r.metadata["unique_value_ratio"] == 0.5
    assert r.metadata["unique_count"] == 2
    assert r.metadata["distinct_count"] == 4


def test_unique_value_ratio_batch_split_merge(ray_session):
    # a value unique per-batch but duplicated across batches must NOT
    # count as unique after the merge — force multiple blocks
    import ray as _ray

    df = pd.DataFrame({"c": ["x"] * 1 + ["y"] * 1})
    big = pd.concat([df] * 1, ignore_index=True)
    ds = _ray.data.from_pandas(
        [pd.DataFrame({"c": ["x", "z"]}), pd.DataFrame({"c": ["x", "w"]})]
    )
    r = run_rules(ds, [ValidationRule(
        name="u", rule_type="unique_value_ratio", column="c",
        parameters={"min_value": 0.0, "max_value": 1.0},
    )]).results[0]
    # counts {x:2, z:1, w:1} → 2/3 unique
    assert math.isclose(r.metadata["unique_value_ratio"], 2 / 3)
    assert r.metadata["distinct_count"] == 3


# -- mutual_information ----------------------------------------------------- #

def test_mutual_information_independent_is_zero(ray_session):
    # perfectly independent 2×2 grid → MI = 0
    df = pd.DataFrame({
        "x": ["a", "a", "b", "b"] * 4,
        "y": ["p", "q", "p", "q"] * 4,
    })
    r = run_rules(df, [ValidationRule(
        name="m", rule_type="mutual_information", column="x",
        parameters={"other": "y", "min_value": 0.0, "max_value": 0.0},
    )]).results[0]
    assert (r.total_count, r.failed_count) == (1, 0)
    assert abs(r.metadata["mutual_information"]) < 1e-12
    assert r.metadata["n_pairs"] == 16
    assert r.metadata["distinct_pairs"] == 4


def test_mutual_information_deterministic_copy_is_entropy(ray_session):
    # y = f(x) → MI = H(x); rows with either side NULL excluded
    df = pd.DataFrame({
        "x": ["a", "a", "b", "b", None, "a"],
        "y": ["A", "A", "B", "B", "C", None],
    })
    r = run_rules(df, [ValidationRule(
        name="m", rule_type="mutual_information", column="x",
        parameters={"other": "y", "min_value": 0.0},
    )]).results[0]
    assert r.metadata["n_pairs"] == 4
    assert math.isclose(
        r.metadata["mutual_information"], math.log(2), rel_tol=1e-12
    )


def test_mutual_information_requires_other(ray_session):
    df = pd.DataFrame({"x": ["a"], "y": ["b"]})
    r = run_rules(df, [ValidationRule(
        name="m", rule_type="mutual_information", column="x",
        parameters={"min_value": 0.0},
    )]).results[0]
    assert r.total_count == -1 and r.failed_count == -1 and not r.passed


# -- string_length ---------------------------------------------------------- #

def test_string_length_verdict_and_stats(ray_session):
    df = pd.DataFrame({"c": ["ab", "abcd", "a", None, "abcdef"]})
    r = run_rules(df, [ValidationRule(
        name="s", rule_type="string_length", column="c",
        parameters={"min_length": 2, "max_length": 4},
    )]).results[0]
    # "a" too short, "abcdef" too long, NULL never fails
    assert (r.total_count, r.failed_count) == (5, 2)
    assert r.metadata["min_length"] == 1
    assert r.metadata["max_length"] == 6


def test_string_length_one_sided_and_unicode(ray_session):
    # é is ONE code point (LENGTH parity with DuckDB), not bytes
    df = pd.DataFrame({"c": ["éé", "e"]})
    r = run_rules(df, [ValidationRule(
        name="s", rule_type="string_length", column="c",
        parameters={"min_length": 2},
    )]).results[0]
    assert (r.total_count, r.failed_count) == (2, 1)


def test_string_length_filter_mode_drops_nulls(ray_session):
    df = pd.DataFrame({"c": ["ok", "toolong", None, "xy"]})
    v = _validator([ValidationRule(
        name="s", rule_type="string_length", column="c",
        parameters={"min_length": 2, "max_length": 3},
    )])
    out = v.apply_filters(df, "t").to_pandas()
    # keeps in-bounds only; NULL dropped (reference F2 asymmetry)
    assert sorted(out["c"].tolist()) == ["ok", "xy"]


def test_string_length_missing_bounds_is_error_result(ray_session):
    df = pd.DataFrame({"c": ["a"]})
    r = run_rules(df, [ValidationRule(
        name="s", rule_type="string_length", column="c", parameters={},
    )]).results[0]
    assert r.total_count == -1 and r.failed_count == -1 and not r.passed
