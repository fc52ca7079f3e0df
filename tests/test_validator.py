"""End-to-end validator conformance: verdict math, message strings,
error path, report shape — pinned to the reference's DuckDB engine
behavior (SURVEY.md §2.2) and cross-checked against a live DuckDB
oracle on the same data."""

import duckdb
import pandas as pd
import pytest

from data_validator_ray import (
    RayDataValidator,
    ValidationConfig,
    ValidationRule,
)


def make_config(rules, table="customers", **extra):
    return ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": table, "rules": [r.model_dump() for r in rules]}],
        **extra,
    )


RULES = [
    ValidationRule(
        name="customer_id_complete", rule_type="completeness",
        column="customer_id", threshold=0.9,
    ),
    ValidationRule(
        name="name_complete", rule_type="completeness",
        column="name", threshold=0.8,
    ),
    ValidationRule(
        name="email_pattern", rule_type="pattern", column="email",
        parameters={"pattern": "^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$"},
        threshold=0.9,
    ),
    ValidationRule(
        name="age_range", rule_type="range", column="age",
        parameters={"min_value": 0, "max_value": 120}, threshold=0.95,
    ),
    ValidationRule(
        name="score_range", rule_type="range", column="score",
        parameters={"min_value": 0, "max_value": 100}, threshold=1.0,
    ),
    ValidationRule(
        name="id_unique", rule_type="uniqueness", column="customer_id",
    ),
]


@pytest.fixture(scope="module")
def summary(ray_session, dirty_customers_mod):
    v = RayDataValidator(make_config(RULES))
    return v.validate_table(dirty_customers_mod, "customers")


@pytest.fixture(scope="module")
def dirty_customers_mod():
    # module-scoped copy of the conftest fixture data
    return pd.DataFrame(
        {
            "customer_id": pd.array([1, 2, 3, None, 5, 6, 7, 8, 9, 10], dtype="Int64"),
            "name": ["Alice", "Bob", "Charlie", "Dave", None,
                     "Frank", "Grace", "Henry", "Iris", "Jack"],
            "email": ["alice@example.com", "bob@example.com", "charlie@example.com",
                      "dave@example.com", "eve@example.com", "invalid-email",
                      "grace@example.com", "henry@example.com", "iris@example.com",
                      "jack@example.com"],
            "age": [25, 34, 28, 45, 31, 155, 29, 38, 42, 27],
            "score": [85, 92, 78, 88, 95, 73, 81, 90, 87, 94],
            "status": ["active", "active", "inactive", "active", "active",
                       "inactive", "active", "active", "inactive", "active"],
        }
    )


class TestVerdicts:
    def get(self, summary, name):
        return next(r for r in summary.results if r.rule_name == name)

    def test_completeness_pass_at_threshold(self, summary):
        r = self.get(summary, "customer_id_complete")
        assert (r.total_count, r.failed_count) == (10, 1)
        assert r.success_rate == pytest.approx(0.9)
        assert r.passed  # 0.9 >= 0.9

    def test_pattern(self, summary):
        r = self.get(summary, "email_pattern")
        assert r.failed_count == 1
        assert r.passed  # 0.9 >= 0.9

    def test_range_fail_below_threshold(self, summary):
        r = self.get(summary, "age_range")
        assert r.failed_count == 1
        assert not r.passed  # 0.9 < 0.95

    def test_range_all_good(self, summary):
        r = self.get(summary, "score_range")
        assert r.failed_count == 0 and r.passed

    def test_uniqueness_null_counts_as_failed(self, summary):
        # DuckDB semantics: COUNT(DISTINCT) excludes NULL → 9 distinct,
        # failed = 10 - 9 = 1 (the NULL row)
        r = self.get(summary, "id_unique")
        assert r.failed_count == 1
        assert not r.passed  # no threshold → failed == 0 required

    def test_message_format(self, summary):
        r = self.get(summary, "age_range")
        assert r.message == (
            "Rule 'age_range': 1/10 failed records "
            "(success rate: 90.00%, threshold: 95.00%)"
        )
        r2 = self.get(summary, "id_unique")
        assert r2.message == "Rule 'id_unique': 1/10 failed records"

    def test_summary_rollup(self, summary):
        assert summary.total_rules == 6
        assert summary.passed_rules == 4
        assert summary.failed_rules == 2
        assert summary.error_rules == 2  # both failures have severity=error
        assert summary.warning_rules == 0
        assert summary.overall_success_rate == pytest.approx(4 / 6)
        assert summary.total_execution_time_ms > 0
        assert all(r.execution_time_ms >= 0 for r in summary.results)


class TestDuckDBOracle:
    """Every rule's (total, failed) must equal the DuckDB formulation
    the reference engine would run."""

    @pytest.fixture(scope="class")
    def con(self, dirty_customers_mod):
        con = duckdb.connect()
        con.register("t", dirty_customers_mod)
        return con

    def test_counts_match_oracle(self, summary, con):
        oracle = {
            "customer_id_complete":
                "SELECT COUNT(*) FROM t WHERE customer_id IS NULL",
            "name_complete": "SELECT COUNT(*) FROM t WHERE name IS NULL",
            "email_pattern":
                "SELECT COUNT(*) FROM t WHERE NOT regexp_matches(email, "
                "'^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$')",
            "age_range": "SELECT COUNT(*) FROM t WHERE age < 0 OR age > 120",
            "score_range": "SELECT COUNT(*) FROM t WHERE score < 0 OR score > 100",
            "id_unique":
                "SELECT COUNT(*) - COUNT(DISTINCT customer_id) FROM t",
        }
        for r in summary.results:
            expected = con.execute(oracle[r.rule_name]).fetchone()[0]
            assert r.failed_count == expected, r.rule_name
            assert r.total_count == 10


class TestErrorPath:
    def test_unknown_rule_type(self, ray_session, dirty_customers_mod):
        rule = ValidationRule(name="bad", rule_type="nonexistent", column="x")
        v = RayDataValidator(make_config([rule] + RULES[:1]))
        s = v.validate_table(dirty_customers_mod, "customers")
        bad = next(r for r in s.results if r.rule_name == "bad")
        assert not bad.passed
        assert bad.failed_count == -1 and bad.total_count == -1
        assert bad.success_rate == 0.0
        assert bad.message.startswith("Rule execution failed:")
        assert bad.severity == "error"
        # other rules still ran
        ok = next(r for r in s.results if r.rule_name == "customer_id_complete")
        assert ok.total_count == 10

    def test_missing_column_param(self, ray_session, dirty_customers_mod):
        rule = ValidationRule(name="nocol", rule_type="completeness")
        v = RayDataValidator(make_config([rule]))
        s = v.validate_table(dirty_customers_mod, "customers")
        assert s.results[0].message.startswith("Rule execution failed:")

    def test_missing_range_params(self, ray_session, dirty_customers_mod):
        rule = ValidationRule(name="norange", rule_type="range", column="age")
        v = RayDataValidator(make_config([rule]))
        s = v.validate_table(dirty_customers_mod, "customers")
        assert "min_value/max_value" in s.results[0].message

    def test_bad_column_in_data(self, ray_session, dirty_customers_mod):
        rule = ValidationRule(name="ghost", rule_type="completeness", column="ghost")
        v = RayDataValidator(make_config([rule]))
        s = v.validate_table(dirty_customers_mod, "customers")
        assert not s.results[0].passed
        assert s.results[0].failed_count == -1


class TestReport:
    def test_single_summary_wrapped(self, summary):
        v = RayDataValidator(make_config(RULES))
        report = v.get_validation_report(summary)
        assert report["total_tables"] == 1
        assert "single_table" in report["table_results"]
        tr = report["table_results"]["single_table"]
        assert tr["total_rules"] == 6
        assert {"name", "type", "passed", "success_rate", "message", "severity"} \
            == set(tr["rules"][0].keys())
        assert set(report["overall_stats"].keys()) == {
            "total_rules", "total_passed", "total_failed",
            "overall_success_rate", "total_execution_time_ms",
        }
        assert report["engine_type"] == "ray"

    def test_multi_table_rollup(self, ray_session, dirty_customers_mod):
        cfg = ValidationConfig(
            engine={"type": "ray"},
            tables=[
                {"name": "a", "rules": [RULES[0].model_dump()]},
                {"name": "b", "rules": [RULES[3].model_dump()]},
            ],
        )
        v = RayDataValidator(cfg)
        out = v.validate_all_tables(
            {"a": dirty_customers_mod, "b": dirty_customers_mod}
        )
        report = v.get_validation_report(out)
        assert report["total_tables"] == 2
        assert report["overall_stats"]["total_rules"] == 2


class TestStateResume:
    def test_second_run_skips_completed(self, ray_session, dirty_customers_mod, tmp_path):
        cfg = make_config(RULES[:1])
        cfg.pipeline.state_file = str(tmp_path / "state.json")
        v = RayDataValidator(cfg)
        first = v.validate_all_tables({"customers": dirty_customers_mod})
        assert set(first) == {"customers"}
        v2 = RayDataValidator(cfg)
        second = v2.validate_all_tables({"customers": dirty_customers_mod})
        assert second == {}
        v2.reset_state()
        third = RayDataValidator(cfg).validate_all_tables(
            {"customers": dirty_customers_mod}
        )
        assert set(third) == {"customers"}


class TestThresholdEdgeCases:
    def test_empty_table_success_rate_one(self, ray_session):
        df = pd.DataFrame({"x": pd.array([], dtype="Int64")})
        rule = ValidationRule(name="r", rule_type="completeness", column="x")
        v = RayDataValidator(make_config([rule], table="t"))
        s = v.validate_table(df, "t")
        assert s.results[0].total_count == 0
        assert s.results[0].success_rate == 1.0
        assert s.results[0].passed

    def test_threshold_zero_message_has_no_suffix(self, ray_session, dirty_customers_mod):
        # reference checks `if rule.threshold:` (truthiness) for the suffix
        rule = ValidationRule(
            name="z", rule_type="completeness", column="customer_id", threshold=0.0
        )
        v = RayDataValidator(make_config([rule]))
        s = v.validate_table(dirty_customers_mod, "customers")
        assert s.results[0].message == "Rule 'z': 1/10 failed records"
        assert s.results[0].passed  # 0.9 >= 0.0


def test_composite_referential_exact_and_approx(ray_session):
    """Composite-FK referential: tuple membership via 16-byte (h1,h2)
    double-hash identities; any-NULL-component rows never fail; bloom
    approx tier agrees at test scale."""
    import numpy as np

    fact = pd.DataFrame(
        {
            "a": [1, 1, 2, 2, 3, None, 4],
            "b": ["x", "y", "x", "z", "x", "x", None],
        }
    )
    dim = pd.DataFrame({"ra": [1, 1, 2], "rb": ["x", "y", "x"]})
    # violations: (2,z), (3,x); NULL rows (None,x) and (4,None) pass
    for approx in (False, True):
        rule = ValidationRule(
            name="fk", rule_type="referential",
            parameters={
                "columns": ["a", "b"],
                "ref_table": "dim",
                "ref_columns": ["ra", "rb"],
                "approx": approx,
            },
        )
        v = RayDataValidator(make_config([rule], table="fact"))
        v.register_source("dim", dim)
        s = v.validate_table(fact, "fact")
        r = s.results[0]
        assert (r.total_count, r.failed_count) == (7, 2), approx


def test_composite_referential_requires_matched_lengths():
    with pytest.raises(Exception):
        rule = ValidationRule(
            name="fk", rule_type="referential",
            parameters={
                "columns": ["a", "b"],
                "ref_table": "dim",
                "ref_columns": ["ra"],
            },
        )
        from data_validator_ray.stages.kernels import ReferentialKernel

        ReferentialKernel(rule)


def test_hash_pair_set_collision_handling():
    """h1 collisions must fall through to the h2 check (the multi-range
    loop), and non-members sharing h1 with a member must NOT match."""
    import numpy as np

    from data_validator_ray.functions.sketches import HashPairSet

    h1 = np.array([5, 5, 5, 9], np.int64)
    h2 = np.array([100, 200, 300, 1], np.int64)
    s = HashPairSet(h1, h2)
    probe1 = np.array([5, 5, 9, 9, 7], np.int64)
    probe2 = np.array([200, 999, 1, 2, 1], np.int64)
    assert s.contains(probe1, probe2).tolist() == [
        True, False, True, False, False
    ]
    empty = HashPairSet(np.zeros(0, np.int64), np.zeros(0, np.int64))
    assert empty.contains(probe1, probe2).tolist() == [False] * 5


def test_json_validity_rule_matches_duckdb(ray_session):
    """Engine json-validity mask agrees with DuckDB json_valid across
    objects, arrays, scalars, truncated docs, and NULLs (never fail)."""
    import duckdb

    vals = [
        '{"a": 1}', "not json", "[1, 2, 3]", None, "3", '{"a":',
        '"str"', "true", "  {\"x\": [1, {\"y\": null}]} ", "{", "[]",
        "1e5", "[1, 2", "null", "{}", "tru", '{"a": "b\\u00e9"}',
    ]
    df = pd.DataFrame({"props": vals})
    rule = ValidationRule(name="j", rule_type="json_validity",
                          column="props")
    v = RayDataValidator(make_config([rule], table="t"))
    r = v.validate_table(df, "t").results[0]

    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT COUNT(*) total, COUNT(*) FILTER (WHERE props IS NOT "
        "NULL AND NOT json_valid(props)) failed FROM t"
    ).fetchone()
    assert (r.total_count, r.failed_count) == exp

    # documented divergence: the engine is STRICT RFC 8259 while
    # DuckDB's yyjson enables extensions (bare nan/inf, trailing
    # commas) — those docs fail here and pass there
    df2 = pd.DataFrame({"props": ["nan", '{"a": 1,}']})
    r2 = v.validate_table(df2, "t").results[0]
    assert (r2.total_count, r2.failed_count) == (2, 2)
