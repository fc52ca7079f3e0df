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
Dataset``. Built-ins cover the WHOLE engine: the curation family,
relational ops (joins, windows, ranks, set ops, dedup tiers,
profilers, text scoring — every registered name in
:func:`pipeline_ops`), plus glue (``select`` / ``rename`` /
``filter_expr`` / ``limit`` / ``repartition`` / ``write_parquet``).

Multi-input operators (joins, set ops, decontaminate…) reference
additional inputs with ``{$source: name}`` anywhere in ``params``;
names resolve against the spec's top-level ``sources:`` map (``name:
{path: ..., columns: [...]}``, read as pruned Parquet) or a
caller-supplied ``sources=`` dict of Datasets::

    sources:
      customer: {path: /data/customer.parquet, columns: [c_custkey]}
    steps:
      - op: hash_join
        params: {right: {$source: customer}, left_key: user_id,
                 right_key: c_custkey, left_cols: [event_id],
                 right_cols: []}

A step may carry ``save_as: name`` to checkpoint ITS output for later
``{$source: name}`` references — the self-join shape (score a stream,
then join the scores back onto the same stream) stays config-only::

    steps:
      - op: filter_expr
        params: {expr: "lang == 'en'"}
        save_as: filtered
      - op: unigram_logprob
        params: {}
      - op: hash_join
        params: {right: {$source: filtered}, left_key: doc_id, ...}

Every stage stays lazy — the composed pipeline is ONE streaming
Dataset plan; nothing materializes until the caller consumes it.
Operators that return a ``pyarrow.Table``/pandas frame (the one-shot
profilers) are wrapped back into a Dataset so steps keep composing.
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

    def _add_token_count(
        ds: Dataset, *, text_col: str = "text", out_col: str = "n_tokens"
    ) -> Dataset:
        # whitespace token count, empties dropped — the oracle
        # convention len(list_filter(string_split(t,' '), x->x<>''))
        import polars as pl
        import pyarrow as pa

        def f(batch: "pa.Table") -> "pa.Table":
            t = pl.from_arrow(batch.select([text_col]))[text_col]
            toks = t.str.split(" ")
            n = (toks.list.len() - toks.list.count_matches("")).cast(
                pl.Int64
            )
            return batch.append_column(
                out_col, pa.array(n.to_numpy(), pa.int64())
            )

        return ds.map_batches(f, batch_format="pyarrow")

    _PIPELINE_OPS["add_token_count"] = _add_token_count
    _PIPELINE_OPS["select"] = _select
    _PIPELINE_OPS["rename"] = _rename
    _PIPELINE_OPS["filter_expr"] = _filter_expr
    _PIPELINE_OPS["limit"] = _limit
    _PIPELINE_OPS["repartition"] = _repartition
    _PIPELINE_OPS["write_parquet"] = _write_parquet

    # the relational / dedup / profile / text / curation families —
    # every fn is (source, **params) → Dataset-or-table, so YAML can
    # compose the whole engine the way the reference's configs drive
    # its rules. Registered under their library names.
    from . import curation as _C
    from . import dedup as _D
    from . import profile as _P
    from . import relational as _R
    from . import similarity as _S
    from . import text as _T
    from . import urls as _U

    for _fn in (
        # relational: joins / windows / ranks / set ops / reshaping
        _R.hash_join, _R.broadcast_join, _R.asof_join,
        _R.semi_join_broadcast, _R.anti_join_broadcast, _R.set_op,
        _R.windowed_aggregate, _R.hopping_window_aggregate,
        _R.sessionize, _R.running_window, _R.moving_window,
        _R.global_rank, _R.grouped_top_k, _R.top_k_rows,
        _R.top_n_plus_other, _R.ratio_to_report, _R.distinct_rows,
        _R.grouped_quantiles, _R.grouped_exact_quantiles,
        _R.rollup_aggregate, _R.unpivot, _R.forward_fill,
        _R.spine_fill, _R.try_cast_columns, _R.regex_extract,
        _R.regex_extract_all, _R.json_extract, _R.explode_column,
        _R.grouped_string_agg, _R.anomaly_zscore,
        # dedup tiers
        _D.paragraph_dedup, _D.near_dup_dedup,
        _D.embedding_near_dup_dedup, _D.collapse_exact_vectors,
        _D.domain_boilerplate_removal,
        # similarity (cross-table joins take right via {$source: ...})
        _S.knn_join, _S.knn_join_ivf,
        # profilers / encoders
        _P.top_values, _P.misra_gries_topk, _P.histogram,
        _P.grouped_stats, _P.standardize_column, _P.quantile_bucketize,
        _P.label_encode, _P.target_encode, _P.benford_digits,
        # text scoring
        _T.quality_stats, _T.quality_score, _T.language_id,
        _T.text_profile, _T.token_entropy, _T.fingerprint_md5,
        _T.unigram_logprob, _T.charset_profile, _T.dsir_logratio,
        # curation
        _C.gopher_stats, _C.gopher_gate, _C.temperature_mix_weights,
        _C.decontaminate, _C.sample_n, _C.mix_to_budget,
        _C.group_sample, _C.linear_classifier_score,
        _C.remove_duplicated_spans, _C.semantic_dedup,
        _C.line_quality_filter, _C.seeded_shuffle,
        # urls / crawl hygiene
        _U.url_dedup, _U.domain_counts, _U.url_host_filter,
        _U.domain_aggregate_gate,
        _U.cap_per_domain,
        # quantile banding
        _R.bucket_by_quantile,
    ):
        _PIPELINE_OPS[_fn.__name__] = _fn

    from .webpages import robots_meta_filter, robots_meta_flags

    for _fn in (robots_meta_filter, robots_meta_flags):
        _PIPELINE_OPS[_fn.__name__] = _fn


def _resolve_sources(obj: Any, resolve: Callable[[str], Dataset]) -> Any:
    """Recursively replace ``{"$source": name}`` markers in params
    with the resolved Dataset."""
    if isinstance(obj, dict):
        if set(obj.keys()) == {"$source"}:
            return resolve(obj["$source"])
        return {k: _resolve_sources(v, resolve) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_resolve_sources(v, resolve) for v in obj]
    return obj


def run_pipeline_spec(
    spec: "Dict[str, Any] | str",
    source: Any,
    *,
    sources: Optional[Dict[str, Any]] = None,
) -> Dataset:
    """Compose and return the pipeline a spec describes (lazy — the
    caller consumes it). ``spec`` is a dict or a YAML file path with a
    ``steps:`` list of ``{op, params}`` and an optional ``sources:``
    map for multi-input ops (``{$source: name}`` markers in params);
    ``sources=`` lets the caller inject live Datasets under names.
    Unknown ops and unknown source names fail loudly with what IS
    registered."""
    import yaml

    from .dedup import _as_dataset

    _ensure_builtins()
    if isinstance(spec, str):
        with open(spec, "r", encoding="utf-8") as f:
            spec = yaml.safe_load(f)
    steps = spec.get("steps")
    if not isinstance(steps, list) or not steps:
        raise ValueError("spec must contain a non-empty 'steps' list")

    declared: Dict[str, Any] = dict(spec.get("sources") or {})
    injected: Dict[str, Any] = dict(sources or {})
    cache: Dict[str, Dataset] = {}

    def resolve(name: str) -> Dataset:
        if name in cache:
            return cache[name]
        if name in injected:
            ds_ = _as_dataset(injected[name])
        elif name in declared:
            entry = declared[name]
            if isinstance(entry, str):
                entry = {"path": entry}
            from pathlib import Path as _P

            if (
                entry.get("format") == "delta"
                or (_P(entry["path"]) / "_delta_log").is_dir()
            ):
                from ..sources.delta import read_delta

                ds_ = read_delta(
                    entry["path"],
                    columns=entry.get("columns"),
                    version=entry.get("version"),
                )
            else:
                ds_ = ray.data.read_parquet(
                    entry["path"], columns=entry.get("columns")
                )
        else:
            known = sorted(set(declared) | set(injected))
            raise ValueError(
                f"unknown $source {name!r}; declared sources: {known}"
            )
        cache[name] = ds_
        return ds_

    ds = _as_dataset(source)
    for i, step in enumerate(steps):
        op = step.get("op")
        if op not in _PIPELINE_OPS:
            raise ValueError(
                f"step {i}: unknown pipeline op {op!r}; registered: "
                f"{pipeline_ops()}"
            )
        params = _resolve_sources(step.get("params") or {}, resolve)
        out = _PIPELINE_OPS[op](ds, **params)
        ds = _coerce_dataset(out)
        # save_as: checkpoint THIS step's output under a name so a
        # later multi-input step can reference it with {$source:} —
        # what a self-join-shaped pipeline (score, then join the
        # scores back onto the same filtered stream) needs to stay
        # config-only. Shadowing a declared/injected source name is a
        # spec bug: fail loudly.
        alias = step.get("save_as")
        if alias is not None:
            alias = str(alias)
            if alias in cache or alias in declared or alias in injected:
                raise ValueError(
                    f"step {i}: save_as {alias!r} collides with an "
                    "existing source name"
                )
            cache[alias] = ds
    return ds


def _coerce_dataset(out: Any) -> Dataset:
    """Ops that return a one-shot table (profilers) wrap back into a
    Dataset so subsequent steps keep composing."""
    if isinstance(out, Dataset):
        return out
    import pandas as pd
    import pyarrow as pa

    if isinstance(out, pa.Table):
        return ray.data.from_arrow(out)
    if isinstance(out, pd.DataFrame):
        return ray.data.from_pandas(out)
    raise TypeError(
        f"pipeline op returned {type(out).__name__}; expected a "
        "Dataset, pyarrow.Table or pandas.DataFrame"
    )
