"""Persistent key index for INCREMENTAL cross-corpus deduplication —
the durable state a continuously-crawling pipeline needs: "drop every
document whose key we have EVER seen", across runs, without re-reading
history.

The index is a Parquet file of 16-byte (h1, h2) double-hash identities
(the exact-uniqueness convention — collision-checked, treated as
exact): string keys never persist, the file is 16 bytes per distinct
key ever seen, sorted so the probe side loads it zero-copy into a
:class:`..functions.sketches.HashPairSet`. A ``_meta.json`` pins the
key column and hash scheme so mismatched probes fail loudly.

Lifecycle (each step streaming, driver holds only hash arrays):

* :func:`build_key_index` — per-batch DISTINCT → (h1, h2) partials →
  one ``np.unique`` merge → sorted Parquet + meta.
* :func:`dedup_against_index` — broadcast the loaded pair set once
  (``ray.put``); ONE ``map_batches`` pass drops member rows. No
  shuffle: the index IS the small side.
* :func:`update_key_index` — union-merge the new corpus's distinct
  hashes into the file (sorted-merge ``np.unique``), so the next run's
  index includes this run. Update is atomic (write temp + rename).

At 10^12 keys the 16 B/key file is 16 TB — beyond broadcast; the same
layout then shards by ``h1`` range into hive dirs and the probe
becomes a bucketed semi-join against only the matching shard (the
:func:`..pipelines.relational.hash_join` anti shape), or the
:class:`..functions.sketches.BloomFilter` tier bounds memory at ~1 MiB
with a documented FP rate. This module implements the
broadcast tier and documents the shard path; the Bloom tier is
``bloom_prefilter_join(how="anti")``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..functions.sketches import HashPairSet, hash64
from ..pipelines.dedup import _as_dataset

META_NAME = "_meta.json"
HASH_SCHEME = "polars-xxhash64-seed01"


def _hash_backend() -> dict:
    """The library + version actually backing :func:`hash64`. polars
    documents its ``Series.hash`` as NOT stable across polars
    versions, so an index built under one version can silently stop
    matching under another — the meta pins the exact version and
    :func:`load_key_index` fails loudly on mismatch (rebuild the
    index, or pin polars)."""
    try:
        import polars

        return {"backend": "polars", "backend_version": polars.__version__}
    except ImportError:  # pragma: no cover — polars is baked in
        import pandas

        return {"backend": "pandas", "backend_version": pandas.__version__}


def _distinct_hash_pairs(
    source: Any, key_col: str, *, batch_size: int = 64 * 1024
) -> Tuple[np.ndarray, np.ndarray]:
    """Distributed distinct (h1, h2) of a key column: per-batch
    ``unique`` + two hash families, int64 pairs stream back, one
    packed ``np.unique`` on the driver (16 B per distinct key)."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        u = col.drop_null().unique()
        if len(u) == 0:
            return pa.table(
                {"h1": pa.array([], pa.int64()), "h2": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "h1": pa.array(hash64(u, seed=0).astype(np.int64)),
                "h2": pa.array(hash64(u, seed=1).astype(np.int64)),
            }
        )

    ds = _as_dataset(source, columns=[key_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )
    h1s, h2s = [], []
    for b in ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        h1s.append(b["h1"].to_numpy(zero_copy_only=False))
        h2s.append(b["h2"].to_numpy(zero_copy_only=False))
    if not h1s:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return _unique_pairs(np.concatenate(h1s), np.concatenate(h2s))


def _unique_pairs(h1: np.ndarray, h2: np.ndarray):
    packed = np.empty(len(h1), dtype=[("a", np.int64), ("b", np.int64)])
    packed["a"], packed["b"] = h1, h2
    uniq = np.unique(packed)
    return (
        np.ascontiguousarray(uniq["a"]),
        np.ascontiguousarray(uniq["b"]),
    )


def build_key_index(
    source: Any, key_col: str, index_dir: "str | Path",
    *, batch_size: int = 64 * 1024,
) -> dict:
    """Create a fresh index at ``index_dir`` from a corpus' keys.
    Returns ``{n_keys}``."""
    d = Path(index_dir)
    d.mkdir(parents=True, exist_ok=True)
    h1, h2 = _distinct_hash_pairs(source, key_col, batch_size=batch_size)
    _write_atomic(d, h1, h2, key_col)
    return {"n_keys": int(len(h1))}


def _write_atomic(d: Path, h1, h2, key_col: str) -> None:
    tmp = d / "keys.parquet.tmp"
    pq.write_table(
        pa.table({"h1": pa.array(h1), "h2": pa.array(h2)}), tmp
    )
    tmp.replace(d / "keys.parquet")
    (d / META_NAME).write_text(
        json.dumps(
            {
                "key_col": key_col,
                "hash": HASH_SCHEME,
                "n_keys": int(len(h1)),
                **_hash_backend(),
            }
        )
    )


def load_key_index(
    index_dir: "str | Path", *, expect_key_col: Optional[str] = None
) -> HashPairSet:
    d = Path(index_dir)
    meta = json.loads((d / META_NAME).read_text())
    if meta.get("hash") != HASH_SCHEME:
        raise ValueError(f"index hash scheme mismatch: {meta.get('hash')}")
    cur = _hash_backend()
    built = {
        "backend": meta.get("backend"),
        "backend_version": meta.get("backend_version"),
    }
    # legacy meta (no backend stamp) loads as before; stamped meta
    # must match the live hash backend exactly — polars' Series.hash
    # is not stable across versions, so a silent mismatch would make
    # dedup miss every previously-seen key
    if built["backend"] is not None and built != cur:
        raise ValueError(
            f"key index was built with {built['backend']} "
            f"{built['backend_version']} but this environment hashes "
            f"with {cur['backend']} {cur['backend_version']}; rebuild "
            f"the index (build_key_index) or pin the hash backend"
        )
    if expect_key_col is not None and meta["key_col"] != expect_key_col:
        raise ValueError(
            f"index was built on {meta['key_col']!r}, probe asked for "
            f"{expect_key_col!r}"
        )
    t = pq.read_table(d / "keys.parquet")
    return HashPairSet(
        t["h1"].to_numpy(zero_copy_only=False),
        t["h2"].to_numpy(zero_copy_only=False),
    )


def dedup_against_index(
    source: Any,
    key_col: str,
    index_dir: "str | Path",
    *,
    keep_nulls: bool = True,
    batch_size: int = 64 * 1024,
) -> ray.data.Dataset:
    """Drop every row whose key is in the index (seen in ANY prior
    run); NULL keys kept by default (they identify nothing). One
    broadcast + one streaming pass, no shuffle."""
    import pyarrow.compute as pc

    pairs = load_key_index(index_dir, expect_key_col=key_col)
    ref = ray.put(pairs)

    def keep(batch: pa.Table) -> pa.Table:
        idx = ray.get(ref)
        col = batch[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        h1 = hash64(col, seed=0).astype(np.int64)
        h2 = hash64(col, seed=1).astype(np.int64)
        seen = idx.contains(h1, h2) & valid
        mask = ~seen if keep_nulls else (~seen & valid)
        return batch.filter(pa.array(mask))

    return _as_dataset(source).map_batches(
        keep, batch_format="pyarrow", batch_size=batch_size
    )


def update_key_index(
    index_dir: "str | Path",
    new_source: Any,
    key_col: str,
    *,
    batch_size: int = 64 * 1024,
) -> dict:
    """Union-merge the new corpus's distinct keys into the index
    (atomic rewrite). Returns ``{n_keys_before, n_added, n_keys}``."""
    d = Path(index_dir)
    old = load_key_index(d, expect_key_col=key_col)
    n_before = len(old)
    nh1, nh2 = _distinct_hash_pairs(new_source, key_col, batch_size=batch_size)
    h1, h2 = _unique_pairs(
        np.concatenate([old.h1, nh1]), np.concatenate([old.h2, nh2])
    )
    _write_atomic(d, h1, h2, key_col)
    return {
        "n_keys_before": int(n_before),
        "n_added": int(len(h1) - n_before),
        "n_keys": int(len(h1)),
    }
