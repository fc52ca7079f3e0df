"""Config-driven curation pipelines — the reference's config-first
philosophy (YAML rules → validation run, config.py) extended to the
CURATION side: a YAML/dict spec lists named stages and their
parameters, and :func:`run_pipeline_spec` composes the registered
Dataset→Dataset operators into one lazy streaming pipeline. A data
engineer ships a spec file, not code — the same operational contract
the reference's validation configs give (reviewable, diffable,
re-runnable), now for dedup/cleanup/mixing/split stages.

Spec shape::

    steps:
      - op: filter_expr          # glue: Ray Data expression filter
        params: {expr: "n_chars >= 100"}
      - op: domain_sample        # any registered operator
        params: {rate_permille: {web: 500}, id_col: doc_id,
                 domain_col: source}
      - op: assign_splits
        params: {splits: {train: 900, val: 100}, id_col: doc_id}
      - op: select
        params: {columns: [doc_id, source, split]}

Operators register exactly like check kernels (the C1 extension seam):
``register_pipeline_op("name")(fn)`` where ``fn(ds, **params) →
Dataset``. Built-ins cover the row-preserving curation family plus
relational glue (``select`` / ``rename`` / ``filter_expr`` /
``limit`` / ``repartition`` / ``write_parquet``). Every stage stays
lazy — the composed pipeline is ONE streaming Dataset plan; nothing
materializes until the caller consumes it.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import ray.data

Dataset = ray.data.Dataset

_PIPELINE_OPS: Dict[str, Callable[..., Dataset]] = {}


def register_pipeline_op(name: str):
    """Decorator: register a ``fn(ds, **params) → Dataset`` stage."""

    def deco(fn: Callable[..., Dataset]):
        if name in _PIPELINE_OPS:
            raise ValueError(f"pipeline op already registered: {name!r}")
        _PIPELINE_OPS[name] = fn
        return fn

    return deco


def pipeline_ops() -> List[str]:
    _ensure_builtins()
    return sorted(_PIPELINE_OPS)


def _ensure_builtins() -> None:
    if "select" in _PIPELINE_OPS:
        return

    from .curation import (
        assign_splits,
        domain_sample,
        gopher_filter,
        pii_redact,
    )
    from .dedup import _as_dataset, exact_dedup
    from .text import chunk_tokens, normalize_text

    _PIPELINE_OPS["normalize_text"] = normalize_text
    _PIPELINE_OPS["pii_redact"] = pii_redact
    _PIPELINE_OPS["domain_sample"] = domain_sample
    _PIPELINE_OPS["assign_splits"] = assign_splits
    _PIPELINE_OPS["exact_dedup"] = exact_dedup
    _PIPELINE_OPS["chunk_tokens"] = chunk_tokens
    _PIPELINE_OPS["gopher_filter"] = gopher_filter

    def _select(ds: Dataset, *, columns: List[str]) -> Dataset:
        return ds.select_columns(columns)

    def _rename(ds: Dataset, **mapping: str) -> Dataset:
        # YAML-friendly: params are old_name: new_name pairs
        import pyarrow as pa

        def f(batch: "pa.Table") -> "pa.Table":
            names = [mapping.get(c, c) for c in batch.column_names]
            return batch.rename_columns(names)

        return ds.map_batches(f, batch_format="pyarrow")

    def _filter_expr(ds: Dataset, *, expr: str) -> Dataset:
        return ds.filter(expr=expr)

    def _limit(ds: Dataset, *, n: int) -> Dataset:
        return ds.limit(int(n))

    def _repartition(ds: Dataset, *, n: int) -> Dataset:
        return ds.repartition(int(n))

    def _write_parquet(ds: Dataset, *, path: str) -> Dataset:
        ds.write_parquet(path)
        return ray.data.read_parquet(path)

    _PIPELINE_OPS["select"] = _select
    _PIPELINE_OPS["rename"] = _rename
    _PIPELINE_OPS["filter_expr"] = _filter_expr
    _PIPELINE_OPS["limit"] = _limit
    _PIPELINE_OPS["repartition"] = _repartition
    _PIPELINE_OPS["write_parquet"] = _write_parquet


def run_pipeline_spec(
    spec: "Dict[str, Any] | str",
    source: Any,
) -> Dataset:
    """Compose and return the pipeline a spec describes (lazy — the
    caller consumes it). ``spec`` is a dict or a YAML file path with a
    ``steps:`` list of ``{op, params}``; unknown ops fail loudly with
    the registered-op list."""
    import yaml

    from .dedup import _as_dataset

    _ensure_builtins()
    if isinstance(spec, str):
        with open(spec, "r", encoding="utf-8") as f:
            spec = yaml.safe_load(f)
    steps = spec.get("steps")
    if not isinstance(steps, list) or not steps:
        raise ValueError("spec must contain a non-empty 'steps' list")
    ds = _as_dataset(source)
    for i, step in enumerate(steps):
        op = step.get("op")
        if op not in _PIPELINE_OPS:
            raise ValueError(
                f"step {i}: unknown pipeline op {op!r}; registered: "
                f"{pipeline_ops()}"
            )
        params = step.get("params") or {}
        ds = _PIPELINE_OPS[op](ds, **params)
    return ds
