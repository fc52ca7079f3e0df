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


def _batch_stats(columns: Sequence[str], quantile_columns: Sequence[str]):
    qcols = set(quantile_columns)

    def fn(batch: pa.Table) -> pa.Table:
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
            rows.append(
                {
                    "column": name,
                    "total": batch.num_rows,
                    "nulls": null_count,
                    "min": pickle.dumps(mn),
                    "max": pickle.dumps(mx),
                    "tdigest": payload,
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
