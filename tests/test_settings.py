"""Env-override config loading (reference ``settings.py`` semantics)."""

import yaml

from data_validator_ray.settings import load_config, merge_dicts


def test_merge_dicts_nested():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    out = merge_dicts(base, {"a": {"y": 9}, "c": 4})
    assert out == {"a": {"x": 1, "y": 9}, "b": 3, "c": 4}


def _write_cfg(tmp_path):
    doc = {
        "engine": {"type": "ray"},
        "tables": [
            {
                "name": "t",
                "rules": [
                    {"name": "r", "rule_type": "completeness", "column": "c"}
                ],
            }
        ],
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.dump(doc))
    return p


def test_load_plain_yaml(tmp_path):
    cfg = load_config(str(_write_cfg(tmp_path)))
    assert cfg.engine.type == "ray"
    assert cfg.tables[0].name == "t"


def test_env_override_nested(tmp_path, monkeypatch):
    monkeypatch.setenv("VALIDATOR_ENGINE__TYPE", "duckdb")
    cfg = load_config(str(_write_cfg(tmp_path)))
    assert cfg.engine.type == "duckdb"


def test_env_supplies_config_path(tmp_path, monkeypatch):
    p = _write_cfg(tmp_path)
    monkeypatch.setenv("VALIDATOR_CONFIG_FILE", str(p))
    cfg = load_config(None)
    assert cfg.tables[0].name == "t"


def test_env_yaml_scalar_parsing(tmp_path, monkeypatch):
    monkeypatch.setenv("VALIDATOR_DQX__ENABLED", "false")
    cfg = load_config(str(_write_cfg(tmp_path)))
    assert cfg.dqx.enabled is False


def test_custom_prefix(tmp_path, monkeypatch):
    monkeypatch.setenv("MYAPP_ENGINE__TYPE", "polars")
    cfg = load_config(str(_write_cfg(tmp_path)), env_prefix="MYAPP")
    assert cfg.engine.type == "polars"
