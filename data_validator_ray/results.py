"""Result types and the shared verdict logic.

Mirrors the reference's dataclasses (``engines/__init__.py:11-39``) and
its verdict/threshold/message semantics (``duckdb_engine.py:133-148``):

* ``success_rate = (total - failed) / total``, 1.0 when total == 0
* ``passed = success_rate >= threshold`` when a threshold is set, else
  ``failed == 0``
* message ``"Rule '{name}': {failed}/{total} failed records"`` plus
  ``" (success rate: {sr:.2%}, threshold: {t:.2%})"`` when a (truthy)
  threshold is present
* error path: ``passed=False, failed_count=-1, total_count=-1,
  success_rate=0.0, severity="error", message="Rule execution failed: …"``
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List

from .config import ValidationRule


@dataclass
class ValidationResult:
    """Outcome of one rule over one table."""

    rule_name: str
    rule_type: str
    passed: bool
    failed_count: int
    total_count: int
    success_rate: float
    message: str
    severity: str
    execution_time_ms: float
    metadata: Dict[str, Any] = field(default_factory=dict)


@dataclass
class ValidationSummary:
    """Roll-up of all rule results for one table."""

    table_name: str
    total_rules: int
    passed_rules: int
    failed_rules: int
    warning_rules: int
    error_rules: int
    overall_success_rate: float
    total_execution_time_ms: float
    results: List[ValidationResult]


def make_result(
    rule: ValidationRule,
    total_count: int,
    failed_count: int,
    execution_time_ms: float,
    metadata: "Dict[str, Any] | None" = None,
) -> ValidationResult:
    """Apply the shared verdict logic to (total, failed) counts."""
    success_rate = (
        (total_count - failed_count) / total_count if total_count > 0 else 1.0
    )
    if rule.threshold is not None:
        passed = success_rate >= rule.threshold
    else:
        passed = failed_count == 0

    message = f"Rule '{rule.name}': {failed_count}/{total_count} failed records"
    if rule.threshold:  # reference checks truthiness, so threshold=0.0 adds no suffix
        message += (
            f" (success rate: {success_rate:.2%}, threshold: {rule.threshold:.2%})"
        )

    meta = {"engine": "ray", "rule_parameters": rule.parameters}
    if metadata:
        meta.update(metadata)
    return ValidationResult(
        rule_name=rule.name,
        rule_type=rule.rule_type,
        passed=passed,
        failed_count=failed_count,
        total_count=total_count,
        success_rate=success_rate,
        message=message,
        severity=rule.severity,
        execution_time_ms=execution_time_ms,
        metadata=meta,
    )


def make_error_result(
    rule: ValidationRule, error: Exception, execution_time_ms: float
) -> ValidationResult:
    """Reference error path: any kernel exception becomes a failed result."""
    return ValidationResult(
        rule_name=rule.name,
        rule_type=rule.rule_type,
        passed=False,
        failed_count=-1,
        total_count=-1,
        success_rate=0.0,
        message=f"Rule execution failed: {error}",
        severity="error",
        execution_time_ms=execution_time_ms,
        metadata={"engine": "ray", "error": str(error)},
    )


def summarize(
    table_name: str, results: List[ValidationResult], total_execution_time_ms: float
) -> ValidationSummary:
    """Reference summary math (``engines/__init__.py:88-95``)."""
    total_rules = len(results)
    passed_rules = sum(1 for r in results if r.passed)
    failed_rules = total_rules - passed_rules
    warning_rules = sum(1 for r in results if r.severity == "warning" and not r.passed)
    error_rules = sum(1 for r in results if r.severity == "error" and not r.passed)
    overall = passed_rules / total_rules if total_rules > 0 else 1.0
    return ValidationSummary(
        table_name=table_name,
        total_rules=total_rules,
        passed_rules=passed_rules,
        failed_rules=failed_rules,
        warning_rules=warning_rules,
        error_rules=error_rules,
        overall_success_rate=overall,
        total_execution_time_ms=total_execution_time_ms,
        results=results,
    )
