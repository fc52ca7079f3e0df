"""Rule / table / engine configuration models.

Reproduces the configuration semantics of the reference engine
(``/root/reference/src/data_validator/config.py:17-193``): same field
names, same validators (severity set, threshold in [0, 1], non-empty
rule lists), same ``get_enabled_rules`` ordering (global rules first,
then table rules — pinned by the reference's
``tests/test_config.py:238-241``) and the same ``require_sql_rules``
error messages — so YAML configs written for the reference parse and
behave identically here. The engine type set is extended with ``"ray"``
(the native engine of this rebuild).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import yaml
from pydantic import BaseModel, Field, field_validator

ALLOWED_SEVERITIES = {"error", "warning", "info"}
ALLOWED_ENGINES = {"ray", "pyspark", "databricks", "duckdb", "polars"}


class ValidationRule(BaseModel):
    """A single validation rule.

    ``rule_type`` is an open string dispatched through the check-kernel
    registry (:mod:`data_validator_ray.stages.registry`); the built-in
    types are ``completeness``, ``uniqueness``, ``range``, ``pattern``,
    ``custom`` (reference parity) plus ``membership``, ``schema``,
    ``referential``, ``drift``, ``quantile`` (net-new).
    """

    name: str = Field(description="Rule name")
    description: Optional[str] = Field(default=None)
    rule_type: str = Field(description="Rule type dispatched via the kernel registry")
    column: Optional[str] = Field(default=None, description="Target column, if any")
    expression: Optional[str] = Field(
        default=None, description="Predicate expression (DSL) for custom rules"
    )
    threshold: Optional[float] = Field(
        default=None, description="Pass threshold on success rate, in [0, 1]"
    )
    severity: str = Field(default="error")
    enabled: bool = Field(default=True)
    parameters: Dict[str, Any] = Field(default_factory=dict)

    @field_validator("severity")
    @classmethod
    def _check_severity(cls, v: str) -> str:
        if v not in ALLOWED_SEVERITIES:
            raise ValueError(f"Severity must be one of {ALLOWED_SEVERITIES}")
        return v

    @field_validator("threshold")
    @classmethod
    def _check_threshold(cls, v: Optional[float]) -> Optional[float]:
        if v is not None and not (0.0 <= v <= 1.0):
            raise ValueError("Threshold must be between 0.0 and 1.0")
        return v


class TableConfig(BaseModel):
    """Named logical table plus its rule list (must be non-empty)."""

    name: str
    description: Optional[str] = None
    rules: List[ValidationRule]

    @field_validator("rules")
    @classmethod
    def _check_rules_not_empty(cls, v: List[ValidationRule]) -> List[ValidationRule]:
        if not v:
            raise ValueError("At least one validation rule must be defined")
        return v


class EngineConfig(BaseModel):
    """Execution engine selection. ``ray`` is the native engine here."""

    type: str = Field(default="ray")
    connection_params: Dict[str, Any] = Field(default_factory=dict)
    options: Dict[str, Any] = Field(default_factory=dict)

    @field_validator("type")
    @classmethod
    def _check_engine(cls, v: str) -> str:
        if v not in ALLOWED_ENGINES:
            raise ValueError(f"Engine type must be one of {ALLOWED_ENGINES}")
        return v


class DQXConfig(BaseModel):
    """Metrics / quarantine outputs.

    The reference keeps these as placeholder no-ops
    (``validator.py:264-274``); here ``metrics_table`` /
    ``quarantine_table`` are treated as Parquet output directories and
    are actually written (SURVEY.md §2.1 S9).
    """

    enabled: bool = True
    output_path: Optional[str] = None
    metrics_table: Optional[str] = None
    quarantine_table: Optional[str] = None


class PipelineConfig(BaseModel):
    """Pipeline-resume settings.

    ``state_file`` keeps the reference's table-granular JSON resume;
    ``checkpoint_dir`` adds partition-granular Parquet checkpoints
    (metrics + lineage) on top (SURVEY.md §4.3).
    """

    state_file: Optional[str] = None
    checkpoint_dir: Optional[str] = None
    partitions: int = Field(default=64, description="url-hash partition count P")


class ValidationConfig(BaseModel):
    """Root configuration document."""

    version: str = "1.0"
    metadata: Dict[str, Any] = Field(default_factory=dict)
    engine: EngineConfig = Field(default_factory=EngineConfig)
    dqx: DQXConfig = Field(default_factory=DQXConfig)
    pipeline: PipelineConfig = Field(default_factory=PipelineConfig)
    tables: List[TableConfig] = Field(default_factory=list)
    global_rules: List[ValidationRule] = Field(default_factory=list)
    require_sql_rules: bool = False

    @classmethod
    def from_yaml(cls, yaml_path: Union[str, Path]) -> "ValidationConfig":
        yaml_path = Path(yaml_path)
        if not yaml_path.exists():
            raise FileNotFoundError(f"Configuration file not found: {yaml_path}")
        with open(yaml_path, "r", encoding="utf-8") as f:
            return cls(**yaml.safe_load(f))

    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "ValidationConfig":
        return cls(**data)

    def to_yaml(self, yaml_path: Union[str, Path]) -> None:
        yaml_path = Path(yaml_path)
        yaml_path.parent.mkdir(parents=True, exist_ok=True)
        with open(yaml_path, "w", encoding="utf-8") as f:
            yaml.dump(self.model_dump(), f, default_flow_style=False, sort_keys=False)

    def get_table_config(self, table_name: str) -> Optional[TableConfig]:
        for table in self.tables:
            if table.name == table_name:
                return table
        return None

    def get_enabled_rules(self, table_name: Optional[str] = None) -> List[ValidationRule]:
        """Enabled rules: global rules first, then table rules (reference order)."""
        rules = [r for r in self.global_rules if r.enabled]
        if table_name:
            tc = self.get_table_config(table_name)
            if tc:
                rules.extend(r for r in tc.rules if r.enabled)
        else:
            for table in self.tables:
                rules.extend(r for r in table.rules if r.enabled)
        return rules

    def validate_sql_snippets(self) -> None:
        """Require every enabled rule to carry a non-empty expression."""
        for rule in self.global_rules:
            if rule.enabled and not (rule.expression and rule.expression.strip()):
                raise ValueError(
                    f"Rule '{rule.name}' must define a non-empty SQL expression"
                )
        for table in self.tables:
            for rule in table.rules:
                if rule.enabled and not (rule.expression and rule.expression.strip()):
                    raise ValueError(
                        f"Rule '{rule.name}' in table '{table.name}' "
                        "must define a non-empty SQL expression"
                    )
