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


def test_widget_overrides_with_stubbed_dbutils(tmp_path, monkeypatch):
    """use_widgets=True reads the notebook widgets when a dbutils is
    discoverable (reference settings.py:78-93): widget 'config' replaces
    the YAML path, widget 'engine' overrides engine.type. Round-2 —
    widgets were previously a documented drop."""
    import data_validator_ray.settings as S

    base = tmp_path / "base.yaml"
    base.write_text("engine:\n  type: duckdb\n")
    widget_cfg = tmp_path / "widget.yaml"
    widget_cfg.write_text("engine:\n  type: polars\ndqx:\n  enabled: true\n")

    class Widgets:
        def __init__(self, values):
            self.values = values

        def get(self, name):
            if name not in self.values:
                raise KeyError(name)
            return self.values[name]

    class DBUtils:
        def __init__(self, values):
            self.widgets = Widgets(values)

    # config widget redirects the YAML path; engine widget wins last
    monkeypatch.setattr(
        S, "_get_dbutils",
        lambda: DBUtils({"config": str(widget_cfg), "engine": "ray"}),
    )
    cfg = S.load_config(str(base), use_widgets=True)
    assert cfg.engine.type == "ray"          # widget override beats YAML
    assert cfg.dqx.enabled is True           # loaded from the widget path

    # widgets requested but absent → plain YAML load
    monkeypatch.setattr(S, "_get_dbutils", lambda: None)
    cfg2 = S.load_config(str(base), use_widgets=True)
    assert cfg2.engine.type == "duckdb"

    # widget errors are individually swallowed
    monkeypatch.setattr(S, "_get_dbutils", lambda: DBUtils({"engine": "polars"}))
    cfg3 = S.load_config(str(base), use_widgets=True)
    assert cfg3.engine.type == "polars"
