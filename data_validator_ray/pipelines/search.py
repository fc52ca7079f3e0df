"""Full-text boolean retrieval: a hive-sharded inverted index plus an
AND/OR posting-list search over it. The index is the storage-level
analogue of the IVF layout in :mod:`similarity` — build once, then
every query reads ONLY the shards its terms hash to, so lookup I/O is
``O(matching shards)`` regardless of corpus size. No reference
analogue (the reference validates rows, validator.py); retrieval is
the curation-side primitive a 100-TB text pipeline needs for
decontamination lookups and corpus QA.

Scale shapes:

* :func:`build_inverted_index` — each batch explodes its docs to
  DISTINCT (token, doc_id) postings in polars (docs never split
  across batches, so per-batch distinct IS global distinct) and tags
  the token's shard = ``hash64(token) % num_shards``; ONE partitioned
  Parquet write lands ``shard=N/`` hive dirs. The exchange is the
  posting stream itself — there is no groupby at build time at all;
  postings for one token co-locate at the DIRECTORY level, which is
  what the read path prunes on.
* :func:`boolean_search` — terms hash to their shards driver-side;
  only those dirs are read (storage pruning), a vectorized ``is_in``
  mask keeps the terms' postings, and AND-mode resolves with one tiny
  groupby: a doc matches iff it holds ALL ``len(terms)`` distinct
  terms. OR-mode is the same read with a distinct on doc_id.
"""

from __future__ import annotations

from typing import Any, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.sketches import hash64
from .dedup import _as_dataset

Dataset = ray.data.Dataset


def _term_shard(terms: List[str], num_shards: int) -> np.ndarray:
    h = hash64(np.asarray(terms, dtype=object))
    return (h % np.uint64(num_shards)).astype(np.int64)


def build_inverted_index(
    source: Any,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_shards: int = 16,
    batch_size: int = 8192,
) -> str:
    """Build the inverted index under ``out_dir`` as
    ``shard=N/*.parquet`` hive dirs of (token, doc_id) postings.
    Tokens split on single spaces, empties dropped (the corpus-wide
    oracle tokenization, cf. text.py ``_exploded_tokens``); postings
    are per-doc distinct. Returns ``out_dir``."""
    from .text import _exploded_tokens

    def postings(batch: pa.Table) -> pa.Table:
        t = batch.select([id_col, text_col])
        t = t.filter(pc.is_valid(t[text_col]))
        ex, _ = _exploded_tokens(t[text_col])
        ex = ex.unique(subset=["doc", "t"])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        tok = pc.cast(ex["t"].to_arrow(), pa.string())
        shard = (
            hash64(tok) % np.uint64(num_shards)
        ).astype(np.int64)
        return pa.table(
            {
                "token": tok,
                id_col: pa.array(
                    ids[ex["doc"].to_numpy()], pa.int64()
                ),
                "shard": pa.array(shard, pa.int64()),
            }
        )

    ds = _as_dataset(source, columns=[id_col, text_col])
    ds.map_batches(
        postings, batch_format="pyarrow", batch_size=batch_size
    ).write_parquet(out_dir, partition_cols=["shard"])
    import json
    from pathlib import Path

    (Path(out_dir) / "_meta.json").write_text(
        json.dumps({"num_shards": num_shards, "id_col": id_col})
    )
    return out_dir


def boolean_search(
    index_dir: str,
    terms: List[str],
    *,
    mode: str = "and",
    id_col: str = "doc_id",
    num_shards: int | None = None,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Posting-list retrieval over a :func:`build_inverted_index`
    layout: docs containing ALL (``mode="and"``) or ANY
    (``mode="or"``) of ``terms``. Reads ONLY the shards the terms
    hash to. ``num_shards`` defaults to the index's own ``_meta.json``
    (a mismatched override silently misses shards — leave it unset).
    Returns a Dataset with one ``id_col`` column."""
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    import json
    from pathlib import Path

    if num_shards is None:
        meta = Path(index_dir) / "_meta.json"
        num_shards = (
            json.loads(meta.read_text())["num_shards"]
            if meta.exists()
            else 16
        )

    terms = sorted(set(terms))
    shards = sorted(set(_term_shard(terms, num_shards).tolist()))
    paths = [
        str(f)
        for s in shards
        for f in sorted(Path(f"{index_dir}/shard={s}").glob("*.parquet"))
    ]
    # typed empty block: keeps the output schema stable even when no
    # shard is populated or no posting survives the term filter
    empty = ray.data.from_arrow(
        pa.table({id_col: pa.array([], pa.int64())})
    )
    if not paths:  # no term hashes to a populated shard
        return empty
    term_arr = pa.array(terms, pa.string())

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["token"], value_set=term_arr)
        return batch.filter(m).select(["token", id_col])

    ds = ray.data.read_parquet(
        paths, columns=["token", id_col]
    ).map_batches(keep, batch_format="pyarrow", batch_size=batch_size)

    if mode == "or":
        agg = ds.groupby(id_col).count()

        def ids_only(batch: pa.Table) -> pa.Table:
            return batch.select([id_col])

        return empty.union(
            agg.map_batches(ids_only, batch_format="pyarrow")
        )

    need = len(terms)
    # postings are per-doc distinct by construction, so a plain count
    # of matching postings per doc equals its distinct-term count
    agg = ds.groupby(id_col).count()

    def all_terms(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["count()"], pa.scalar(need))
        return batch.filter(m).select([id_col])

    return empty.union(
        agg.map_batches(all_terms, batch_format="pyarrow")
    )
