"""Column-statistics stage: per-column null-rate, min/max, count and
t-digest quantiles in one fused streaming pass (north-star A7 —
SURVEY.md §2.4). Partials are one tiny row per batch; combine is
driver-side over kilobytes."""

from __future__ import annotations

import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.sketches import TDigest

Dataset = ray.data.Dataset


def _batch_stats(
    columns: Sequence[str],
    quantile_columns: Sequence[str],
    *,
    distinct: bool = False,
    means: bool = False,
):
    qcols = set(quantile_columns)

    def fn(batch: pa.Table) -> pa.Table:
        from ..functions.sketches import HyperLogLog, hash64

        rows = []
        for name in columns:
            col = batch[name]
            null_count = col.null_count
            try:
                mm = pc.min_max(col)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
            except pa.ArrowNotImplementedError:
                mn = mx = None
            payload = None
            if name in qcols:
                td = TDigest()
                vals = col.drop_null()
                if len(vals):
                    td.add(vals.to_numpy(zero_copy_only=False).astype(np.float64))
                payload = td.to_bytes()
            hll_bytes = None
            if distinct:
                hll = HyperLogLog()
                vals = col.drop_null()
                if len(vals):
                    try:
                        hll.add_hashes(hash64(vals))
                    except (TypeError, ValueError):
                        pass  # unhashable nested type → distinct NULL
                    else:
                        hll_bytes = hll.to_bytes()
            s1 = None
            if means and (
                pa.types.is_floating(col.type) or pa.types.is_integer(col.type)
            ):
                vals = col.drop_null()
                s1 = (
                    float(
                        vals.to_numpy(zero_copy_only=False)
                        .astype(np.float64)
                        .sum()
                    )
                    if len(vals)
                    else 0.0
                )
            rows.append(
                {
                    "column": name,
                    "total": batch.num_rows,
                    "nulls": null_count,
                    "min": pickle.dumps(mn),
                    "max": pickle.dumps(mx),
                    "tdigest": payload,
                    "hll": hll_bytes,
                    "s1": s1,
                }
            )
        return pa.Table.from_pylist(rows)

    return fn


def column_stats(
    ds: Dataset,
    columns: Optional[Sequence[str]] = None,
    quantiles: Sequence[float] = (),
    quantile_columns: Sequence[str] = (),
    batch_size: int = 64 * 1024,
) -> pd.DataFrame:
    """One streaming pass → DataFrame of per-column stats.

    Columns: ``column, total_count, null_count, min_value, max_value``
    plus ``q{q}`` per requested quantile for ``quantile_columns``.
    """
    if columns is None:
        columns = [f.name for f in ds.schema().base_schema]
    partials = ds.map_batches(
        _batch_stats(columns, quantile_columns),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    ).take_all()

    out: List[Dict] = []
    for name in columns:
        mine = [p for p in partials if p["column"] == name]
        total = sum(p["total"] for p in mine)
        nulls = sum(p["nulls"] for p in mine)
        mins = [v for p in mine if (v := pickle.loads(p["min"])) is not None]
        maxs = [v for p in mine if (v := pickle.loads(p["max"])) is not None]
        row: Dict = {
            "column": name,
            "total_count": total,
            "null_count": nulls,
            "min_value": min(mins) if mins else None,
            "max_value": max(maxs) if maxs else None,
        }
        if name in set(quantile_columns) and quantiles:
            td = TDigest()
            for p in mine:
                if p["tdigest"] is not None:
                    td = td.merge(TDigest.from_bytes(p["tdigest"]))
            for q in quantiles:
                row[f"q{q}"] = td.quantile(q)
        out.append(row)
    return pd.DataFrame(out)


def table_profile(
    ds: Dataset,
    columns: Optional[Sequence[str]] = None,
    *,
    batch_size: int = 64 * 1024,
) -> pd.DataFrame:
    """Whole-table column profiler (deequ-style) in ONE streaming pass:
    for EVERY column, ``total_count, null_count, approx_distinct``
    (HLL, ±0.8 %; NULL for unhashable nested types) and, for numeric
    columns, exact ``min / max / mean`` (mean rounded to 6). One tiny
    partial row per (batch, column); the driver merges kilobytes. The
    "what is in this table" first look a validation engine owes its
    user before any rules are written.

    Exactness contract: counts and numeric min/max/mean are EXACT
    (oracle-checkable); ``approx_distinct`` is the HLL estimate (the
    exact tier at scale is a per-column distinct shuffle — use
    ``relational.count_distinct``-style queries per column when
    exactness matters)."""
    from ..functions.sketches import HyperLogLog

    sch = ds.schema()

    def _arrow_dtype(t):
        # pandas-block datasets report numpy dtypes / python classes
        if isinstance(t, pa.DataType):
            return t
        if t is object or t is str:
            return pa.string()
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except Exception:  # noqa: BLE001 — exotic dtype → opaque
            return pa.string()

    if columns is None:
        columns = list(sch.names)
    types = {n: _arrow_dtype(t) for n, t in zip(sch.names, sch.types)}
    partials = ds.map_batches(
        _batch_stats(columns, (), distinct=True, means=True),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    ).take_all()

    out: List[Dict] = []
    for name in columns:
        mine = [p for p in partials if p["column"] == name]
        total = sum(p["total"] for p in mine)
        nulls = sum(p["nulls"] for p in mine)
        is_num = pa.types.is_floating(types[name]) or pa.types.is_integer(
            types[name]
        )
        mins = [v for p in mine if (v := pickle.loads(p["min"])) is not None]
        maxs = [v for p in mine if (v := pickle.loads(p["max"])) is not None]
        hll = None
        for p in mine:
            if p["hll"] is not None:
                h = HyperLogLog.from_bytes(p["hll"])
                hll = h if hll is None else hll.merge(h)
        s1 = (
            sum(p["s1"] for p in mine if p["s1"] is not None)
            if is_num
            else None
        )
        non_null = total - nulls
        out.append(
            {
                "column": name,
                "dtype": str(types[name]),
                "total_count": total,
                "null_count": nulls,
                "approx_distinct": (
                    0
                    if non_null == 0
                    else int(round(hll.estimate())) if hll is not None else None
                ),
                "min_value": float(min(mins)) if is_num and mins else None,
                "max_value": float(max(maxs)) if is_num and maxs else None,
                "mean_value": (
                    round(s1 / non_null, 6)
                    if is_num and non_null
                    else None
                ),
            }
        )
    return pd.DataFrame(out)
