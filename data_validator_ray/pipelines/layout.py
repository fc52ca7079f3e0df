"""Write-layout optimizers: multi-dimensional clustering for read
pruning. No reference analogue (reference scope: validation checks);
this is the Delta/Iceberg ``OPTIMIZE ZORDER BY`` capability a 100-TB
table needs so that 2-D+ range scans (time × key, lat × lon,
value-band × shard) touch a small fraction of row groups instead of
every file.

* :func:`zorder_key` — vectorized Morton (bit-interleaved) key over N
  numeric columns, each min-max scaled to ``bits``-bit integer grids.
  The scaling expression ``floor((v − min)/(max − min) · (2^bits − 1))``
  is evaluated in plain IEEE doubles exactly as a SQL oracle writes it,
  so keys are bit-identical cross-engine.
* :func:`zorder_sort` — ONE streaming min/max pass (mergeable
  partials; skipped when bounds are supplied) + one ``Dataset.sort``
  on the interleaved key. The sort is Ray Data's range-partitioned
  shuffle — inherent: a layout rewrite IS a global reorder. Downstream
  ``write_parquet`` then yields files whose per-column min/max
  footers are tight boxes on the z-curve, which is what makes
  row-group pruning effective on every interleaved dimension at once.

NULL handling: rows with a NULL in any z-column sort last (key
``2^63-1``) — explicit contract, keeps them in one run of files.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .dedup import _as_dataset

Dataset = ray.data.Dataset

_NULL_KEY = np.int64(2**63 - 1)


def _interleave(grids: "List[np.ndarray]", bits: int) -> np.ndarray:
    """Morton-interleave ``len(grids)`` arrays of ``bits``-bit ints:
    output bit ``b·n + i`` = bit ``b`` of ``grids[i]`` (vectorized;
    n·bits ≤ 63)."""
    n = len(grids)
    z = np.zeros(len(grids[0]), np.int64)
    for i, g in enumerate(grids):
        g = g.astype(np.int64)
        for b in range(bits):
            z |= ((g >> b) & 1) << (b * n + i)
    return z


def zorder_key(
    arrays: "Sequence[np.ndarray]",
    mins: "Sequence[float]",
    maxs: "Sequence[float]",
    *,
    bits: int = 16,
) -> np.ndarray:
    """Morton key for aligned float64 arrays (NaN → ``2^63−1``)."""
    if len(arrays) * bits > 63:
        raise ValueError(
            f"{len(arrays)} columns × {bits} bits exceeds the 63-bit key"
        )
    top = float(2**bits - 1)
    grids = []
    isnan = np.zeros(len(arrays[0]), bool)
    for a, lo, hi in zip(arrays, mins, maxs):
        a = np.asarray(a, np.float64)
        isnan |= np.isnan(a)
        span = hi - lo
        if span > 0:
            g = np.floor((a - lo) / span * top)
        else:
            g = np.zeros_like(a)
        grids.append(np.clip(np.nan_to_num(g), 0, top).astype(np.int64))
    z = _interleave(grids, bits)
    z[isnan] = _NULL_KEY
    return z


def zorder_sort(
    source: Any,
    cols: "List[str]",
    *,
    bits: int = 16,
    mins: "Optional[List[float]]" = None,
    maxs: "Optional[List[float]]" = None,
    key_name: str = "__z",
    keep_key: bool = False,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Rows reordered along the z-curve of ``cols`` (see module doc).
    Supply ``mins``/``maxs`` to skip the bounds pass (e.g. known
    domains, or reusing yesterday's bounds for a stable layout)."""
    ds = _as_dataset(source)

    if mins is None or maxs is None:
        def mm(batch: pa.Table) -> pa.Table:
            out = {}
            for c in cols:
                arr = pc.cast(batch[c], pa.float64())
                out[f"mn_{c}"] = [pc.min(arr).as_py()]
                out[f"mx_{c}"] = [pc.max(arr).as_py()]
            return pa.table(out)

        import pandas as pd

        parts = ds.map_batches(
            mm, batch_format="pyarrow", batch_size=batch_size
        ).to_pandas()
        mins = [float(parts[f"mn_{c}"].min()) for c in cols]
        maxs = [float(parts[f"mx_{c}"].max()) for c in cols]

    mins_l, maxs_l = list(mins), list(maxs)

    def add_key(batch: pa.Table) -> pa.Table:
        arrays = [
            pc.cast(batch[c], pa.float64()).to_numpy(zero_copy_only=False)
            for c in cols
        ]
        z = zorder_key(arrays, mins_l, maxs_l, bits=bits)
        return batch.append_column(key_name, pa.array(z, pa.int64()))

    out = ds.map_batches(
        add_key, batch_format="pyarrow", batch_size=batch_size
    ).sort(key_name)
    if not keep_key:
        names = [n for n in out.schema().names if n != key_name]
        out = out.select_columns(names)
    return out
