"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session", autouse=True)
def quiet_ray_data():
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
    except Exception:
        pass
    yield


@pytest.fixture
def dirty_customers() -> pd.DataFrame:
    """The reference's 10-row integration fixture
    (``tests/test_integration.py:18-38`` semantics): one NULL id, one
    NULL name, one bad email, one out-of-range age."""
    return pd.DataFrame(
        {
            "customer_id": pd.array([1, 2, 3, None, 5, 6, 7, 8, 9, 10], dtype="Int64"),
            "name": [
                "Alice", "Bob", "Charlie", "Dave", None,
                "Frank", "Grace", "Henry", "Iris", "Jack",
            ],
            "email": [
                "alice@example.com", "bob@example.com", "charlie@example.com",
                "dave@example.com", "eve@example.com", "invalid-email",
                "grace@example.com", "henry@example.com", "iris@example.com",
                "jack@example.com",
            ],
            "age": [25, 34, 28, 45, 31, 155, 29, 38, 42, 27],
            "score": [85, 92, 78, 88, 95, 73, 81, 90, 87, 94],
            "status": [
                "active", "active", "inactive", "active", "active",
                "inactive", "active", "active", "inactive", "active",
            ],
        }
    )


SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf001_dir() -> str:
    return SF001


@pytest.fixture(scope="session")
def sf01_dir() -> str:
    return SF01
