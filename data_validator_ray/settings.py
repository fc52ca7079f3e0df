"""Config loading with environment-variable overrides.

Same override chain as the reference (``settings.py:26-105``): a YAML
document is deep-merged with ``VALIDATOR_*`` environment variables
whose double-underscore-separated names expand to nested keys
(``VALIDATOR_ENGINE__TYPE=ray`` → ``{"engine": {"type": "ray"}}``).
Databricks-widget overrides are dropped (no such platform here).
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


def load_config(
    yaml_path: Optional[str] = None,
    *,
    env_prefix: str = "VALIDATOR",
    use_widgets: bool = False,  # accepted for API parity; ignored
) -> ValidationConfig:
    """Load a :class:`ValidationConfig` from YAML + env overrides."""
    flat_env = _env_overrides(env_prefix)
    config_file = flat_env.pop("config_file", None)
    if yaml_path is None:
        yaml_path = config_file

    base: Dict[str, Any] = {}
    if yaml_path:
        with open(Path(yaml_path), encoding="utf-8") as f:
            base = yaml.safe_load(f) or {}

    merged = merge_dicts(base, _expand_keys(flat_env))
    return ValidationConfig.model_validate(merged)
