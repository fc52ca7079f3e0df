"""Config loading with environment-variable overrides.

Same override chain as the reference (``settings.py:26-105``): a YAML
document is deep-merged with ``VALIDATOR_*`` environment variables
whose double-underscore-separated names expand to nested keys
(``VALIDATOR_ENGINE__TYPE=ray`` → ``{"engine": {"type": "ray"}}``),
then notebook-widget overrides when ``use_widgets=True`` and a
``dbutils`` is discoverable in the IPython namespace (reference
``settings.py:13-23,78-93``): widget ``config`` replaces the YAML path,
widget ``engine`` overrides ``engine.type``. Off-platform (no IPython /
no dbutils) the widget step is a silent no-op.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional

import yaml

from .config import ValidationConfig


def merge_dicts(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively merge ``override`` into ``base`` (mutates and returns base)."""
    for key, value in override.items():
        if key in base and isinstance(base[key], dict) and isinstance(value, dict):
            base[key] = merge_dicts(base[key], value)
        else:
            base[key] = value
    return base


def _expand_keys(flat: Dict[str, Any]) -> Dict[str, Any]:
    """Expand ``a__b__c`` keys into nested dicts."""
    result: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("__")
        cur = result
        for part in parts[:-1]:
            cur = cur.setdefault(part, {})
        cur[parts[-1]] = value
    return result


def _env_overrides(env_prefix: str) -> Dict[str, Any]:
    """Collect ``{PREFIX}_*`` env vars; values parsed as YAML scalars."""
    prefix = f"{env_prefix}_"
    flat: Dict[str, Any] = {}
    for env_key, raw in os.environ.items():
        if not env_key.upper().startswith(prefix):
            continue
        key = env_key[len(prefix):].lower()
        try:
            flat[key] = yaml.safe_load(raw)
        except yaml.YAMLError:
            flat[key] = raw
    return flat


def _get_dbutils():
    """The notebook ``dbutils`` handle, if one exists in the IPython
    user namespace (how the reference discovers it —
    ``settings.py:13-23``); None anywhere else."""
    try:
        from IPython import get_ipython  # type: ignore[import-not-found]

        ip = get_ipython()
        if ip and "dbutils" in ip.user_ns:
            return ip.user_ns["dbutils"]
    except Exception:  # noqa: BLE001 — any failure means "not a notebook"
        pass
    return None


def _widget_overrides(yaml_path: Optional[str]):
    """(yaml_path, overrides) after applying notebook widgets
    (reference ``settings.py:78-93``): widget ``config`` replaces the
    YAML path; widget ``engine`` overrides ``engine.type``. Each read is
    individually best-effort."""
    overrides: Dict[str, Any] = {}
    dbutils = _get_dbutils()
    if dbutils is None:
        return yaml_path, overrides
    try:
        widget_config = dbutils.widgets.get("config")
        if widget_config:
            yaml_path = widget_config
    except Exception:  # noqa: BLE001
        pass
    try:
        widget_engine = dbutils.widgets.get("engine")
        if widget_engine:
            overrides.setdefault("engine", {})["type"] = widget_engine
    except Exception:  # noqa: BLE001
        pass
    return yaml_path, overrides


def load_config(
    yaml_path: Optional[str] = None,
    *,
    env_prefix: str = "VALIDATOR",
    use_widgets: bool = False,
) -> ValidationConfig:
    """Load a :class:`ValidationConfig` from YAML + env (+ widget) overrides."""
    flat_env = _env_overrides(env_prefix)
    config_file = flat_env.pop("config_file", None)
    if yaml_path is None:
        yaml_path = config_file

    widget_overrides: Dict[str, Any] = {}
    if use_widgets:
        yaml_path, widget_overrides = _widget_overrides(yaml_path)

    base: Dict[str, Any] = {}
    if yaml_path:
        with open(Path(yaml_path), encoding="utf-8") as f:
            base = yaml.safe_load(f) or {}

    merged = merge_dicts(base, _expand_keys(flat_env))
    if widget_overrides:
        merged = merge_dicts(merged, widget_overrides)
    return ValidationConfig.model_validate(merged)
