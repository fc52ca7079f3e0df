"""The reference's own example configs must compile and validate —
VERDICT.md round-1 gap #1: ``sample_config.yaml``'s DATE_SUB/INTERVAL
rule and its ungrouped HAVING rule previously fell into the error-result
path."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest

from data_validator_ray.settings import load_config
from data_validator_ray.validator import RayDataValidator

SAMPLE_YAML = "/root/reference/examples/sample_config.yaml"


@pytest.fixture(scope="module")
def validator() -> RayDataValidator:
    cfg = load_config(SAMPLE_YAML)
    cfg.dqx.enabled = False  # keep the test from writing metrics dirs
    return RayDataValidator(cfg)


@pytest.fixture(scope="module")
def orders_df() -> pd.DataFrame:
    now = datetime.now()
    return pd.DataFrame(
        {
            "order_id": pd.array([1, 2, 3, None, 5, 6], dtype="Int64"),
            "order_amount": [10.0, -5.0, 22.5, 3.0, 0.0, 99.0],
            "order_date": pd.to_datetime(
                [
                    now - timedelta(days=30),
                    now - timedelta(days=365 * 6),  # older than 5 years → fails
                    now - timedelta(days=365 * 4),
                    now - timedelta(days=1),
                    now - timedelta(days=365 * 10),  # fails
                    now - timedelta(days=10),
                ]
            ),
        }
    )


def test_sample_config_orders_no_error_results(ray_session, validator, orders_df):
    summary = validator.validate_table(orders_df, "orders")
    by_name = {r.rule_name: r for r in summary.results}
    assert set(by_name) == {
        "row_count_check",
        "order_id_completeness",
        "order_amount_positive",
        "order_date_range",
    }
    errors = [r.rule_name for r in summary.results if "error" in r.metadata]
    assert errors == [], f"rules hit the error path: {errors}"


def test_sample_config_date_rule_counts(ray_session, validator, orders_df):
    summary = validator.validate_table(orders_df, "orders")
    by_name = {r.rule_name: r for r in summary.results}
    # two orders are older than 5 years
    assert by_name["order_date_range"].failed_count == 2
    assert by_name["order_date_range"].total_count == 6
    # amounts <= 0: -5.0 and 0.0
    assert by_name["order_amount_positive"].failed_count == 2
    # one NULL order_id
    assert by_name["order_id_completeness"].failed_count == 1


def test_sample_config_having_rule_semantics(ray_session, validator, orders_df):
    """``SELECT COUNT(*) FROM {table} HAVING COUNT(*) = 0``: DuckDB
    fetchone convention — nonempty table → no row → failed 0."""
    summary = validator.validate_table(orders_df, "orders")
    by_name = {r.rule_name: r for r in summary.results}
    r = by_name["row_count_check"]
    assert "error" not in r.metadata
    assert r.failed_count == 0
    assert r.passed


def test_sample_config_customers(ray_session, validator, dirty_customers):
    summary = validator.validate_table(dirty_customers, "customers")
    by_name = {r.rule_name: r for r in summary.results}
    errors = [r.rule_name for r in summary.results if "error" in r.metadata]
    assert errors == []
    assert by_name["customer_id_completeness"].failed_count == 1
    assert by_name["age_range"].failed_count == 1  # age 155
    assert by_name["email_pattern"].failed_count == 1  # invalid-email


def test_other_reference_example_configs_load():
    for path in (
        "/root/reference/examples/duckdb_config.yaml",
        "/root/reference/examples/polars_config.yaml",
        "/root/reference/examples/sql_rules_config.yaml",
        "/root/reference/examples/pipeline_config.yaml",
    ):
        cfg = load_config(path)
        assert cfg.tables or cfg.global_rules, path
