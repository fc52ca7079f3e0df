"""Rule-as-filter mode and violation-row emission, vs DuckDB oracles.

Filter mode preserves the reference's asymmetry (SURVEY.md §2.3): NULL
pattern/range rows pass validation but are DROPPED by the filter (the
keep-side SQL predicate is NULL for them)."""

import duckdb
import pandas as pd
import pytest

from data_validator_ray import RayDataValidator, ValidationConfig, ValidationRule


@pytest.fixture(scope="module")
def data() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "id": pd.array([1, 2, None, 4, 5, 6, None, 8], dtype="Int64"),
            "email": ["a@x.com", "bad", None, "d@x.com", "e@x.com",
                      "f@x.com", "g@x.com", None],
            "age": pd.array([10, 200, 30, None, 50, -5, 70, 80], dtype="Int64"),
        }
    )


RULES = [
    ValidationRule(name="id_nn", rule_type="completeness", column="id"),
    ValidationRule(
        name="email_ok", rule_type="pattern", column="email",
        parameters={"pattern": "^[^@]+@[^@]+$"},
    ),
    ValidationRule(
        name="age_ok", rule_type="range", column="age",
        parameters={"min_value": 0, "max_value": 120},
    ),
]


def make_validator():
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "t", "rules": [r.model_dump() for r in RULES]}],
    )
    return RayDataValidator(cfg)


def test_filter_conjunction_matches_sql(ray_session, data):
    """Chained reference filters ≡ one fused conjunction ≡ SQL WHERE."""
    out = make_validator().apply_filters(data, "t").to_pandas()
    con = duckdb.connect()
    con.register("t", data)
    expected = con.execute(
        "SELECT * FROM t WHERE id IS NOT NULL "
        "AND regexp_matches(email, '^[^@]+@[^@]+$') "
        "AND age >= 0 AND age <= 120"
    ).df()
    assert sorted(out["id"].tolist()) == sorted(expected["id"].tolist())
    assert len(out) == len(expected)


def test_filter_drops_null_pattern_rows(ray_session, data):
    # id=5 row survives; rows with NULL email are dropped even though
    # validation counts them as passing the pattern rule
    out = make_validator().apply_filters(data, "t").to_pandas()
    assert 8 not in out["id"].tolist()


def test_unknown_rule_filters_nothing(ray_session, data):
    rules = [ValidationRule(name="u", rule_type="uniqueness", column="id")]
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "t", "rules": [r.model_dump() for r in rules]}],
    )
    out = RayDataValidator(cfg).apply_filters(data, "t").to_pandas()
    assert len(out) == len(data)  # uniqueness filter not implemented (F6)


def test_custom_filter_keeps_predicate_true(ray_session, data):
    rules = [ValidationRule(name="c", rule_type="custom", expression="age > 25")]
    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "t", "rules": [r.model_dump() for r in rules]}],
    )
    out = RayDataValidator(cfg).apply_filters(data, "t").to_pandas()
    con = duckdb.connect()
    con.register("t", data)
    expected = con.execute("SELECT * FROM t WHERE age > 25").df()
    assert len(out) == len(expected)


def test_violations_tagged_by_rule(ray_session, data):
    v = make_validator()
    bad = v.violations(data, "t").to_pandas()
    by_rule = bad.groupby("rule_name").size().to_dict()
    con = duckdb.connect()
    con.register("t", data)
    assert by_rule["id_nn"] == con.execute(
        "SELECT COUNT(*) FROM t WHERE id IS NULL"
    ).fetchone()[0]
    assert by_rule["email_ok"] == con.execute(
        "SELECT COUNT(*) FROM t WHERE NOT regexp_matches(email, '^[^@]+@[^@]+$')"
    ).fetchone()[0]
    assert by_rule["age_ok"] == con.execute(
        "SELECT COUNT(*) FROM t WHERE age < 0 OR age > 120"
    ).fetchone()[0]
    # original columns preserved alongside the tag
    assert {"id", "email", "age", "rule_name"} == set(bad.columns)


def test_uniqueness_violations(ray_session):
    df = pd.DataFrame({"k": ["a", "b", "a", "c", "b", "a"], "v": range(6)})
    v = make_validator()
    dups = v.uniqueness_violations(df, "k").to_pandas()
    assert sorted(dups["k"].tolist()) == ["a", "a", "a", "b", "b"]
