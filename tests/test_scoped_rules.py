"""WHERE-scoped rules (ScopedKernel): any rule type evaluated over the
row subset matching a parameters.where DSL predicate — net-new vs the
reference (its rules always see the whole table). Verdicts, violations,
filter mode and the scoped uniqueness shuffle are all cross-checked
against the SQL formulation."""

import duckdb
import pandas as pd
import pytest

from data_validator_ray import (
    RayDataValidator,
    ValidationConfig,
    ValidationRule,
)


@pytest.fixture
def df():
    return pd.DataFrame(
        {
            "seg": ["a", "a", "a", "b", "b", "b", None, "a"],
            "v": [1.0, None, 50.0, None, 2.0, 3.0, None, 7.0],
            "k": [1, 1, 2, 3, 3, 4, 5, 6],
        }
    )


def run_rules(df, rules):
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "t", "rules": [r.model_dump() for r in rules]}],
    )
    return RayDataValidator(cfg).validate_table(df, "t")


def test_scoped_completeness_counts_subset(ray_session, df):
    s = run_rules(df, [ValidationRule(
        name="r", rule_type="completeness", column="v",
        parameters={"where": "seg = 'a'"},
    )])
    r = s.results[0]
    # in-scope rows: 4 (seg='a'; NULL seg is out of scope), 1 null v
    assert r.total_count == 4 and r.failed_count == 1
    ora = duckdb.sql(
        "SELECT COUNT(*) t, SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) f "
        "FROM df WHERE seg = 'a'"
    ).fetchone()
    assert (r.total_count, r.failed_count) == (ora[0], ora[1])


def test_scoped_range_and_custom(ray_session, df):
    s = run_rules(df, [
        ValidationRule(
            name="rng", rule_type="range", column="v",
            parameters={"min_value": 0, "max_value": 10, "where": "seg = 'a'"},
        ),
        ValidationRule(
            # custom semantics: expression TRUE = FAILING row (reference
            # DuckDB count convention)
            name="cst", rule_type="custom", expression="v IS NULL",
            parameters={"where": "seg = 'b'"},
        ),
    ])
    by = {r.rule_name: r for r in s.results}
    # seg='a': 4 rows, v=50 out of range (NULL v passes range)
    assert by["rng"].total_count == 4 and by["rng"].failed_count == 1
    # seg='b': 3 rows, one NULL v flagged by the failing-predicate
    assert by["cst"].total_count == 3 and by["cst"].failed_count == 1


def test_scoped_uniqueness_shuffle_subset(ray_session, df):
    s = run_rules(df, [ValidationRule(
        name="u", rule_type="uniqueness", column="k",
        parameters={"where": "seg = 'a'"},
    )])
    r = s.results[0]
    # seg='a' keys: 1,1,2,6 -> 3 distinct of 4 rows -> 1 duplicate
    assert r.total_count == 4 and r.failed_count == 1
    # unscoped sees no duplicates beyond the same (1,1) pair plus (3,3)
    s2 = run_rules(df, [ValidationRule(
        name="u", rule_type="uniqueness", column="k")])
    assert s2.results[0].failed_count == 2


def test_scoped_violations_and_filter_mode(ray_session, df):
    rules = [ValidationRule(
        name="rng", rule_type="range", column="v",
        parameters={"min_value": 0, "max_value": 10, "where": "seg = 'a'"},
    )]
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "t", "rules": [r.model_dump() for r in rules]}],
    )
    v = RayDataValidator(cfg)
    bad = v.violations(df, "t").to_pandas()
    assert len(bad) == 1 and bad.v.iloc[0] == 50.0  # only the in-scope violator
    kept = v.apply_filters(df, "t").to_pandas()
    # filter drops in-scope rows failing the keep mask (NULL v drops too,
    # reference asymmetry) but keeps ALL out-of-scope rows
    assert 50.0 not in kept.v.tolist()
    assert len(kept[kept.seg != "a"]) == 4  # b/b/b/None rows untouched
    assert set(kept[kept.seg == "a"].v.dropna()) == {1.0, 7.0}


def test_where_on_schema_rule_errors(ray_session, df):
    s = run_rules(df, [ValidationRule(
        name="sch", rule_type="schema",
        parameters={"columns": {"v": "double"}, "where": "seg = 'a'"},
    )])
    r = s.results[0]
    assert not r.passed and r.failed_count == -1
    assert "where" in r.message


def test_scoped_rule_prunes_columns(ray_session, tmp_path):
    """Column pruning includes the where columns — a parquet read with
    a scoped rule touches only (column, where columns)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"a": [1, 2, None], "seg": ["x", "y", "x"],
                  "unused": ["p"] * 3})
    p = tmp_path / "t.parquet"
    pq.write_table(t, p)
    s = run_rules(str(p), [ValidationRule(
        name="r", rule_type="completeness", column="a",
        parameters={"where": "seg = 'x'"},
    )])
    r = s.results[0]
    assert r.total_count == 2 and r.failed_count == 1
