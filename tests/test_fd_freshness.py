"""FunctionalDependencyKernel and FreshnessKernel unit semantics
(rule_type="functional_dependency" / "freshness") — NULL handling,
scoping, error paths, DuckDB cross-checks."""

from datetime import datetime

import duckdb
import pandas as pd
import pytest

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


@pytest.fixture
def fd_df():
    return pd.DataFrame(
        {
            # k=1 -> {x}        ok
            # k=2 -> {x, y}     VIOLATION
            # k=3 -> {x, NULL}  ok (NULL dep never violates)
            # k=4 -> {NULL}     ok (still counts as a determinant)
            # NULL determinant excluded entirely
            "k": [1, 1, 2, 2, 3, 3, 4, None],
            "d": ["x", "x", "x", "y", "x", None, None, "z"],
        }
    )


def test_fd_null_semantics(ray_session, fd_df):
    s = run_rules(fd_df, [ValidationRule(
        name="fd", rule_type="functional_dependency", column="k",
        parameters={"dependent": "d"},
    )])
    r = s.results[0]
    assert (r.total_count, r.failed_count) == (4, 1)
    assert not r.passed
    ora = duckdb.sql(
        "WITH g AS (SELECT k, COUNT(DISTINCT d) c FROM fd_df "
        "WHERE k IS NOT NULL GROUP BY k) "
        "SELECT COUNT(*), COUNT(*) FILTER (WHERE c > 1) FROM g"
    ).fetchone()
    assert (r.total_count, r.failed_count) == ora


def test_fd_holds_passes(ray_session):
    df = pd.DataFrame({"u": ["a/1", "a/2", "b/1"], "dom": ["a", "a", "b"]})
    s = run_rules(df, [ValidationRule(
        name="fd", rule_type="functional_dependency", column="u",
        parameters={"dependent": "dom"},
    )])
    r = s.results[0]
    assert r.passed and (r.total_count, r.failed_count) == (3, 0)


def test_fd_scoped(ray_session, fd_df):
    # scope to the rows whose dep is 'x' or 'y': k=2 still violates
    s = run_rules(fd_df, [ValidationRule(
        name="fd", rule_type="functional_dependency", column="k",
        parameters={"dependent": "d", "where": "d in ('x', 'y')"},
    )])
    r = s.results[0]
    # in scope: k=1{x}, k=2{x,y}, k=3{x}
    assert (r.total_count, r.failed_count) == (3, 1)


def test_fd_missing_dependent_is_error_result(ray_session, fd_df):
    s = run_rules(fd_df, [ValidationRule(
        name="fd", rule_type="functional_dependency", column="k",
        parameters={},
    )])
    r = s.results[0]
    assert r.total_count == -1 and r.failed_count == -1 and not r.passed


def test_freshness_pass_and_lag(ray_session):
    df = pd.DataFrame({"ts": pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-10 12:00:00", None]
    )})
    s = run_rules(df, [ValidationRule(
        name="f", rule_type="freshness", column="ts",
        parameters={"as_of": "2024-01-12 12:00:00",
                    "max_age_seconds": 3 * 86400},
    )])
    r = s.results[0]
    assert r.passed and r.metadata["lag_seconds"] == 2 * 86400.0
    assert r.metadata["max_ts"] == "2024-01-10 12:00:00"
    assert (r.total_count, r.failed_count) == (1, 0)


def test_freshness_stale_fails(ray_session):
    df = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01"])})
    s = run_rules(df, [ValidationRule(
        name="f", rule_type="freshness", column="ts",
        parameters={"as_of": "2024-03-01 00:00:00",
                    "max_age_seconds": 86400},
    )])
    r = s.results[0]
    assert not r.passed and (r.total_count, r.failed_count) == (1, 1)


def test_freshness_all_null_fails(ray_session):
    df = pd.DataFrame({"ts": pd.to_datetime([None, None])})
    s = run_rules(df, [ValidationRule(
        name="f", rule_type="freshness", column="ts",
        parameters={"as_of": "2024-01-01 00:00:00",
                    "max_age_seconds": 86400},
    )])
    r = s.results[0]
    assert not r.passed and r.metadata["max_ts"] is None


def test_freshness_missing_params_error(ray_session):
    df = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01"])})
    s = run_rules(df, [ValidationRule(
        name="f", rule_type="freshness", column="ts", parameters={},
    )])
    r = s.results[0]
    assert r.total_count == -1 and not r.passed


def test_composite_uniqueness_exact_and_nulls(ray_session):
    import duckdb
    import pandas as pd

    df = pd.DataFrame(
        {
            "a": [1, 1, 2, 2, None, 1],
            "b": ["x", "x", "x", "y", "x", None],
        }
    )
    s = run_rules(df, [ValidationRule(
        name="u2", rule_type="uniqueness", column=None,
        parameters={"columns": ["a", "b"]},
    )])
    r = s.results[0]
    # distinct non-null tuples: (1,x),(2,x),(2,y) = 3 -> failed 6-3
    assert (r.total_count, r.failed_count) == (6, 3)
    ora = duckdb.sql(
        "SELECT COUNT(*), COUNT(*) - COUNT(DISTINCT CASE WHEN a IS NOT "
        "NULL AND b IS NOT NULL THEN (a, b) END) FROM df"
    ).fetchone()
    assert (r.total_count, r.failed_count) == ora


def test_composite_uniqueness_scoped(ray_session):
    import pandas as pd

    df = pd.DataFrame(
        {
            "a": [1, 1, 2, 2],
            "b": ["x", "x", "y", "y"],
            "seg": ["in", "out", "in", "in"],
        }
    )
    s = run_rules(df, [ValidationRule(
        name="u2", rule_type="uniqueness", column=None,
        parameters={"columns": ["a", "b"], "where": "seg = 'in'"},
    )])
    r = s.results[0]
    # in scope: (1,x),(2,y),(2,y) -> 2 distinct of 3
    assert (r.total_count, r.failed_count) == (3, 1)


def test_fd_composite_determinant(ray_session):
    import duckdb
    import pandas as pd

    df = pd.DataFrame(
        {
            "a": [1, 1, 1, 2, 2, None],
            "b": ["x", "x", "y", "x", "x", "x"],
            "d": ["p", "q", "p", "p", "p", "z"],
        }
    )
    # tuples: (1,x)->{p,q} VIOLATION; (1,y)->{p}; (2,x)->{p};
    # NULL-in-determinant row excluded
    s = run_rules(df, [ValidationRule(
        name="fd2", rule_type="functional_dependency", column=None,
        parameters={"determinants": ["a", "b"], "dependent": "d"},
    )])
    r = s.results[0]
    assert (r.total_count, r.failed_count) == (3, 1)
    ora = duckdb.sql(
        "WITH g AS (SELECT a, b, COUNT(DISTINCT d) c FROM df "
        "WHERE a IS NOT NULL AND b IS NOT NULL GROUP BY a, b) "
        "SELECT COUNT(*), COUNT(*) FILTER (WHERE c > 1) FROM g"
    ).fetchone()
    assert (r.total_count, r.failed_count) == ora
