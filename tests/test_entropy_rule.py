"""EntropyKernel unit semantics (rule_type="entropy", deequ
hasEntropy) — known-distribution values, NULL handling, bounds in both
directions, error paths."""

import math

import numpy as np
import pandas as pd

from data_validator_ray import (
    RayDataValidator,
    ValidationConfig,
    ValidationRule,
)


def run_rules(df, rules):
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "t", "rules": [r.model_dump() for r in rules]}],
    )
    return RayDataValidator(cfg).validate_table(df, "t")


def test_entropy_known_distribution(ray_session):
    # {a: 2, b: 2} → H = ln 2; NULLs excluded from the distribution
    df = pd.DataFrame({"c": ["a", "a", "b", "b", None]})
    s = run_rules(df, [ValidationRule(
        name="e", rule_type="entropy", column="c",
        parameters={"min_value": 0.6, "max_value": 0.8},
    )])
    r = s.results[0]
    assert (r.total_count, r.failed_count) == (1, 0)
    assert math.isclose(r.metadata["entropy"], math.log(2), rel_tol=1e-12)
    assert r.metadata["distinct_count"] == 2


def test_entropy_bounds_fail_both_directions(ray_session):
    df = pd.DataFrame({"c": ["a", "a", "b", "b"]})
    lo = run_rules(df, [ValidationRule(
        name="e", rule_type="entropy", column="c",
        parameters={"min_value": 1.0},
    )]).results[0]
    assert lo.failed_count == 1  # ln 2 < 1.0
    hi = run_rules(df, [ValidationRule(
        name="e", rule_type="entropy", column="c",
        parameters={"max_value": 0.5},
    )]).results[0]
    assert hi.failed_count == 1  # ln 2 > 0.5


def test_entropy_constant_column_is_zero(ray_session):
    df = pd.DataFrame({"c": ["a"] * 7})
    r = run_rules(df, [ValidationRule(
        name="e", rule_type="entropy", column="c",
        parameters={"min_value": 0.0},
    )]).results[0]
    assert r.failed_count == 0
    assert r.metadata["entropy"] == 0.0
    assert r.metadata["distinct_count"] == 1


def test_entropy_all_null_fails(ray_session):
    df = pd.DataFrame({"c": pd.Series([None, None], dtype="object")})
    r = run_rules(df, [ValidationRule(
        name="e", rule_type="entropy", column="c",
        parameters={"min_value": 0.0},
    )]).results[0]
    assert r.failed_count == 1  # unknown entropy = failed verdict
    assert r.metadata["entropy"] is None


def test_entropy_integer_column_and_batch_split(ray_session):
    # across-batch merge: same answer regardless of block layout
    df = pd.DataFrame({"c": np.repeat([1, 2, 3, 4], [8, 4, 2, 2])})
    r = run_rules(df, [ValidationRule(
        name="e", rule_type="entropy", column="c",
        parameters={"min_value": 0.0, "max_value": 2.0},
    )]).results[0]
    p = np.array([8, 4, 2, 2]) / 16.0
    assert math.isclose(
        r.metadata["entropy"], float(-(p * np.log(p)).sum()), rel_tol=1e-12
    )


def test_entropy_missing_bounds_is_error_result(ray_session):
    df = pd.DataFrame({"c": ["a"]})
    r = run_rules(df, [ValidationRule(
        name="e", rule_type="entropy", column="c", parameters={},
    )]).results[0]
    assert r.total_count == -1 and r.failed_count == -1 and not r.passed
