"""Config-layer semantics (pinned to the reference's validators and
rule-ordering behavior — SURVEY.md §5.1 test_config rows)."""

import pytest
import yaml

from data_validator_ray.config import (
    TableConfig,
    ValidationConfig,
    ValidationRule,
)


def make_rule(**kw):
    base = dict(name="r", rule_type="completeness", column="c")
    base.update(kw)
    return ValidationRule(**base)


class TestValidationRule:
    def test_defaults(self):
        r = make_rule()
        assert r.severity == "error"
        assert r.enabled is True
        assert r.parameters == {}
        assert r.threshold is None

    @pytest.mark.parametrize("sev", ["error", "warning", "info"])
    def test_valid_severities(self, sev):
        assert make_rule(severity=sev).severity == sev

    def test_invalid_severity(self):
        with pytest.raises(ValueError, match="Severity must be one of"):
            make_rule(severity="critical")

    @pytest.mark.parametrize("t", [0.0, 0.5, 1.0])
    def test_valid_thresholds(self, t):
        assert make_rule(threshold=t).threshold == t

    @pytest.mark.parametrize("t", [-0.1, 1.5, 2.0])
    def test_invalid_thresholds(self, t):
        with pytest.raises(ValueError, match="between 0.0 and 1.0"):
            make_rule(threshold=t)


class TestTableConfig:
    def test_empty_rules_rejected(self):
        with pytest.raises(ValueError, match="At least one validation rule"):
            TableConfig(name="t", rules=[])

    def test_rules_kept(self):
        tc = TableConfig(name="t", rules=[make_rule()])
        assert len(tc.rules) == 1


class TestValidationConfig:
    def config(self):
        return ValidationConfig(
            engine={"type": "ray"},
            global_rules=[
                make_rule(name="g1"),
                make_rule(name="g2", enabled=False),
            ],
            tables=[
                {
                    "name": "t1",
                    "rules": [
                        make_rule(name="a1").model_dump(),
                        make_rule(name="a2", enabled=False).model_dump(),
                    ],
                },
                {"name": "t2", "rules": [make_rule(name="b1").model_dump()]},
            ],
        )

    def test_global_rules_first_then_table(self):
        cfg = self.config()
        names = [r.name for r in cfg.get_enabled_rules("t1")]
        assert names == ["g1", "a1"]  # global first, disabled dropped

    def test_all_tables_when_no_name(self):
        names = [r.name for r in self.config().get_enabled_rules()]
        assert names == ["g1", "a1", "b1"]

    def test_unknown_table_gets_only_globals(self):
        names = [r.name for r in self.config().get_enabled_rules("nope")]
        assert names == ["g1"]

    def test_engine_type_validated(self):
        with pytest.raises(ValueError, match="Engine type must be one of"):
            ValidationConfig(engine={"type": "oracle"}, tables=[])

    def test_yaml_round_trip(self, tmp_path):
        cfg = self.config()
        path = tmp_path / "cfg.yaml"
        cfg.to_yaml(path)
        loaded = ValidationConfig.from_yaml(path)
        assert loaded == cfg

    def test_from_yaml_missing_file(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            ValidationConfig.from_yaml(tmp_path / "nope.yaml")

    def test_require_sql_rules(self):
        cfg = ValidationConfig(
            engine={"type": "ray"},
            tables=[{"name": "t", "rules": [make_rule(name="r1").model_dump()]}],
            require_sql_rules=True,
        )
        with pytest.raises(ValueError, match="must define a non-empty SQL expression"):
            cfg.validate_sql_snippets()
        cfg.tables[0].rules[0].expression = "c IS NULL"
        cfg.validate_sql_snippets()  # no raise

    def test_reference_yaml_doc_parses(self, tmp_path):
        """A reference-style YAML document parses unchanged."""
        doc = {
            "version": "1.0",
            "engine": {"type": "duckdb", "options": {"threads": 4}},
            "tables": [
                {
                    "name": "customers",
                    "rules": [
                        {
                            "name": "id_complete",
                            "rule_type": "completeness",
                            "column": "customer_id",
                            "threshold": 0.9,
                            "severity": "error",
                        },
                        {
                            "name": "email_pattern",
                            "rule_type": "pattern",
                            "column": "email",
                            "parameters": {"pattern": "^[^@]+@[^@]+$"},
                        },
                    ],
                }
            ],
        }
        p = tmp_path / "ref.yaml"
        p.write_text(yaml.dump(doc))
        cfg = ValidationConfig.from_yaml(p)
        assert cfg.tables[0].rules[0].threshold == 0.9
        assert cfg.engine.type == "duckdb"
