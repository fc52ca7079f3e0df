"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship Common-Crawl-style webpages validation
pipeline at sf0.001; ``queries()``/``oracle_sql()`` expose every
implemented operator over /root/testdata with DuckDB oracles.

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` happens here or in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents →
    deterministic CC webpages derivation → full constraint suite (one
    fused streaming pass + uniqueness shuffle) → per-rule metrics."""
    from data_validator_ray.pipelines.webpages import run_flagship

    _, metrics = run_flagship("/root/testdata/sf0.001")
    return metrics


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from data_validator_ray.pipelines.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    from data_validator_ray.pipelines.queries import oracle_sql as _oracle

    return _oracle()
