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
        ex = ex.group_by(["doc", "t"]).len()  # one posting + its tf
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
                "tf": pa.array(
                    ex["len"].to_numpy().astype(np.int64), pa.int64()
                ),
                "shard": pa.array(shard, pa.int64()),
            }
        )

    ds = _as_dataset(source, columns=[id_col, text_col])
    ds.map_batches(
        postings, batch_format="pyarrow", batch_size=batch_size
    ).write_parquet(out_dir, partition_cols=["shard"])

    # doclen sidecar from the (already small) index itself: one
    # groupby over postings — no second pass over the corpus. Read
    # shard dirs explicitly so a rebuild into an existing dir never
    # sweeps the doclen sidecar back in.
    from pathlib import Path as _P

    shard_files = [
        str(f) for f in sorted(_P(out_dir).glob("shard=*/*.parquet"))
    ]
    idx = ray.data.read_parquet(shard_files, columns=[id_col, "tf"])
    doclen = idx.groupby(id_col).sum("tf")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col],
                "dl": pc.cast(batch["sum(tf)"], pa.int64()),
            }
        )

    doclen = doclen.map_batches(rename, batch_format="pyarrow")
    doclen.write_parquet(f"{out_dir}/doclen")
    agg = ray.data.read_parquet(
        f"{out_dir}/doclen", columns=["dl"]
    ).aggregate(ray.data.aggregate.Count(), ray.data.aggregate.Sum("dl"))
    n_docs = int(agg["count()"])
    avgdl = float(agg["sum(dl)"]) / n_docs if n_docs else 0.0

    import json
    from pathlib import Path

    (Path(out_dir) / "_meta.json").write_text(
        json.dumps(
            {
                "num_shards": num_shards,
                "id_col": id_col,
                "n_docs": n_docs,
                "avgdl": avgdl,
            }
        )
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


def bm25_search(
    index_dir: str,
    terms: List[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> "pandas.DataFrame":
    """BM25 ranked retrieval over a :func:`build_inverted_index`
    layout: top-``k`` docs by ``Σ_t idf(t) · tf·(k1+1) /
    (tf + k1·(1−b+b·dl/avgdl))`` with the Lucene-style smoothed
    ``idf = ln((N−df+0.5)/(df+0.5) + 1)``. ``N``/``avgdl`` come from
    the index meta (docs with ≥1 token).

    Scale shape: only the terms' shards are read (same pruning as
    :func:`boolean_search`); per-term document frequencies reduce from
    the already-filtered postings (≤ |terms| rows cross the driver);
    candidate postings join the doclen sidecar via the bucketed
    shuffle join (both sides hash on doc id — candidates only, never
    the corpus); scores sum per doc in the same bucketed pass and ONLY
    the global top-k crosses back. Ties break on ascending doc id.

    Returns a pandas DataFrame ``(doc_id, score)``, score rounded 6,
    ordered by unrounded score desc then doc id.
    """
    import json
    from pathlib import Path

    import pandas as pd

    from .dedup import bucketed_groupby

    meta = json.loads((Path(index_dir) / "_meta.json").read_text())
    num_shards, n_docs = meta["num_shards"], meta["n_docs"]
    avgdl = meta["avgdl"]
    terms = sorted(set(terms))
    shards = sorted(set(_term_shard(terms, num_shards).tolist()))
    paths = [
        str(f)
        for s in shards
        for f in sorted(Path(f"{index_dir}/shard={s}").glob("*.parquet"))
    ]
    out_empty = pd.DataFrame(
        {
            id_col: pd.Series(dtype=np.int64),
            "score": pd.Series(dtype=np.float64),
        }
    )
    if not paths or n_docs == 0:
        return out_empty
    term_arr = pa.array(terms, pa.string())

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["token"], value_set=term_arr)
        return batch.filter(m).select(["token", id_col, "tf"])

    postings = ray.data.read_parquet(
        paths, columns=["token", id_col, "tf"]
    ).map_batches(keep, batch_format="pyarrow", batch_size=batch_size)

    # per-term df: ≤ |terms| rows — safe to collect
    df_rows = postings.groupby("token").count().to_pandas()
    if len(df_rows) == 0:  # no term present in the corpus; an empty
        # groupby's to_pandas() loses the schema, so guard before
        # column access (found while testing hybrid_search)
        return out_empty
    found_terms = pa.array(df_rows["token"].tolist(), pa.string())
    dfv = df_rows["count()"].to_numpy(np.float64)
    idf_by_term = np.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0)

    def tag_posting(batch: pa.Table) -> pa.Table:
        pos = pc.index_in(
            batch["token"], value_set=found_terms
        ).to_numpy(zero_copy_only=False)
        w = idf_by_term[pos.astype(np.int64)]
        return pa.table(
            {
                id_col: batch[id_col],
                "tf": pc.cast(batch["tf"], pa.float64()),
                "idf": pa.array(w),
                "dl": pa.nulls(batch.num_rows, pa.float64()),
                "__side": pa.array(
                    np.zeros(batch.num_rows, np.int8)
                ),
            }
        )

    def tag_doclen(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                id_col: batch[id_col],
                "tf": pa.nulls(n, pa.float64()),
                "idf": pa.nulls(n, pa.float64()),
                "dl": pc.cast(batch["dl"], pa.float64()),
                "__side": pa.array(np.ones(n, np.int8)),
            }
        )

    doclen = ray.data.read_parquet(f"{index_dir}/doclen")
    unioned = postings.map_batches(
        tag_posting, batch_format="pyarrow"
    ).union(doclen.map_batches(tag_doclen, batch_format="pyarrow"))

    def score_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        post = g[g["__side"] == 0]
        if not len(post):
            return pd.DataFrame(
                {id_col: pd.Series(dtype=np.int64),
                 "score": pd.Series(dtype=np.float64)}
            )
        dl = g[g["__side"] == 1].set_index(id_col)["dl"]
        dlv = post[id_col].map(dl).to_numpy(np.float64)
        tf = post["tf"].to_numpy(np.float64)
        w = post["idf"].to_numpy(np.float64)
        s = w * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * dlv / avgdl)
        )
        out = (
            pd.DataFrame({id_col: post[id_col].to_numpy(np.int64),
                          "score": s})
            .groupby(id_col, sort=False)["score"]
            .sum()
            .reset_index()
        )
        # per-bucket top-k: the global top-k is a subset of the
        # per-bucket top-k's (doc scores are complete per bucket)
        return out.nlargest(k, "score")

    scored = bucketed_groupby(
        unioned, [id_col], score_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    ).to_pandas()
    top = scored.sort_values(
        ["score", id_col], ascending=[False, True], kind="mergesort"
    ).head(k)
    top["score"] = top["score"].round(6)
    return top.reset_index(drop=True)


def build_positional_index(
    source: Any,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    num_shards: int = 16,
    batch_size: int = 8192,
) -> str:
    """Positional inverted index: ``shard=N/`` hive dirs of flat
    ``(token, doc_id, pos)`` rows (1-based position within the doc's
    non-empty token list — the ``list_filter(string_split(...))``
    oracle tokenization). Same storage-pruning layout as
    :func:`build_inverted_index`; positions make PHRASE queries
    resolvable without touching the corpus. Returns ``out_dir``."""
    import polars as pl

    from .text import _exploded_tokens

    def postings(batch: pa.Table) -> pa.Table:
        t = batch.select([id_col, text_col])
        t = t.filter(pc.is_valid(t[text_col]))
        ex, _ = _exploded_tokens(t[text_col])
        ex = ex.with_columns(
            pos=pl.col("t").cum_count().over("doc").cast(pl.Int64)
        )
        ids = t[id_col].to_numpy(zero_copy_only=False)
        tok = pc.cast(ex["t"].to_arrow(), pa.string())
        shard = (hash64(tok) % np.uint64(num_shards)).astype(np.int64)
        return pa.table(
            {
                "token": tok,
                id_col: pa.array(ids[ex["doc"].to_numpy()], pa.int64()),
                "pos": pa.array(ex["pos"].to_numpy(), pa.int64()),
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


def phrase_search(
    index_dir: str,
    phrase: List[str],
    *,
    num_buckets: int = 32,
) -> Dataset:
    """Exact phrase query over a positional index — docs containing the
    consecutive token sequence, with overlapping-occurrence counts:
    ``(doc_id, n_matches)``.

    Only the phrase terms' shards are read (storage pruning). Each
    term-i posting at position p is shifted to anchor ``p − i``; a
    phrase occurrence is an anchor held by ALL ``len(phrase)`` DISTINCT
    term slots — one tiny bucketed groupby over (doc, anchor) rows,
    exchange bounded by the selected postings, corpus never touched.
    A repeated phrase term is ONE posting stream serving several slot
    offsets, so every slot still lands its own distinct id and the
    anchor test stays ``len(phrase)`` regardless of repeats."""
    import json
    from pathlib import Path

    import pandas as pd

    from .dedup import bucketed_groupby

    if not phrase:
        raise ValueError("phrase must be non-empty")
    meta = json.loads((Path(index_dir) / "_meta.json").read_text())
    id_col = meta["id_col"]
    num_shards = int(meta["num_shards"])
    shards = sorted(set(_term_shard(list(phrase), num_shards).tolist()))
    files: List[str] = []
    for s in shards:
        files.extend(
            str(f)
            for f in sorted(Path(index_dir).glob(f"shard={s}/*.parquet"))
        )
    idx = ray.data.read_parquet(files, columns=["token", id_col, "pos"])

    # slot offsets per unique token (a repeated term is ONE posting
    # stream serving several offsets)
    offsets: dict = {}
    for i, t in enumerate(phrase):
        offsets.setdefault(t, []).append(i)
    n_terms = len(phrase)

    import ray as _ray

    ref = _ray.put(offsets)

    def anchors(batch: pa.Table) -> pa.Table:
        offs = _ray.get(ref)
        keep = pc.is_in(
            batch["token"], value_set=pa.array(list(offs.keys()))
        )
        b = batch.filter(keep)
        tok = b["token"]
        pos = b["pos"].to_numpy(zero_copy_only=False)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        doc_parts, anc_parts, slot_parts = [], [], []
        for t, slots in offs.items():
            m = pc.fill_null(pc.equal(tok, t), False).to_numpy(
                zero_copy_only=False
            )
            if not m.any():
                continue
            p, d = pos[m], ids[m]
            for i in slots:
                anc = p - i
                ok = anc >= 1
                doc_parts.append(d[ok])
                anc_parts.append(anc[ok])
                slot_parts.append(np.full(int(ok.sum()), i, np.int64))
        if not doc_parts:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "anchor": pa.array([], pa.int64()),
                    "slot": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(doc_parts), pa.int64()),
                "anchor": pa.array(np.concatenate(anc_parts), pa.int64()),
                "slot": pa.array(np.concatenate(slot_parts), pa.int64()),
            }
        )

    anchored = idx.map_batches(anchors, batch_format="pyarrow")

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        hits = g.groupby([id_col, "anchor"], sort=False)["slot"].nunique()
        full = hits[hits == n_terms].reset_index()
        if len(full) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype=np.int64),
                    "n_matches": pd.Series(dtype=np.int64),
                }
            )
        out = full.groupby(id_col, sort=False).size().reset_index(
            name="n_matches"
        )
        out["n_matches"] = out["n_matches"].astype(np.int64)
        return out

    return bucketed_groupby(
        anchored, [id_col], resolve, num_buckets=num_buckets
    )


def hybrid_search(
    index_dir: str,
    terms: List[str],
    query_vec: "np.ndarray | List[float]",
    emb_source: Any,
    *,
    k_bm25: int = 50,
    k: int = 10,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_size: int = 64 * 1024,
) -> "pd.DataFrame":
    """Retrieve-then-rerank hybrid search: BM25 top-``k_bm25``
    lexical candidates from a :func:`build_inverted_index` layout,
    joined to their embeddings and reranked by exact cosine against
    ``query_vec`` — the standard two-stage retrieval shape (sparse
    recall stage, dense precision stage).

    Scale shape: stage 1 is :func:`bm25_search` (shard-pruned reads,
    bucketed join-and-score, only the global top-``k_bm25`` rows
    reach the driver); stage 2 broadcasts the ≤ ``k_bm25`` candidate
    ids once (``ray.put`` via the query-matrix ref) and streams the
    embedding table through a vectorized ``is_in``-style membership
    filter, so the rerank's exact cosine (:func:`~.similarity.
    knn_brute`'s per-batch partial top-k + tiny driver merge) only
    ever scores candidate rows. No stage materializes the corpus.

    Determinism note: the BM25 cutoff at rank ``k_bm25`` breaks score
    ties by ascending doc id, identical to the SQL
    ``ORDER BY s DESC, doc_id LIMIT k_bm25`` convention, and both
    sides compute scores with the same float64 formula — the
    candidate SET is reproducible, not just the final ranking.

    Returns a pandas DataFrame ``(rank, doc_id)`` (integer-only; the
    knn output convention), rank 1..k by (cosine DESC, doc id ASC).
    """
    import pandas as pd

    from .similarity import knn_brute

    cands = bm25_search(
        index_dir, terms, k=k_bm25, id_col=id_col,
        batch_size=batch_size,
    )
    if len(cands) == 0:
        return pd.DataFrame(
            {
                "rank": pd.Series(dtype=np.int64),
                id_col: pd.Series(dtype=np.int64),
            }
        )
    cand_ids = np.sort(cands[id_col].to_numpy(np.int64))
    ds = _as_dataset(emb_source, columns=[vec_id_col, vec_col])

    def keep_cands(batch: pa.Table) -> pa.Table:
        ids = batch[vec_id_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cand_ids, ids)
        pos[pos >= len(cand_ids)] = 0
        return batch.filter(pa.array(cand_ids[pos] == ids))

    filtered = ds.map_batches(
        keep_cands, batch_format="pyarrow", batch_size=batch_size
    )
    out = knn_brute(
        filtered,
        np.asarray(query_vec, dtype=np.float64)[None, :],
        np.array([0], dtype=np.int64),
        id_col=vec_id_col,
        vec_col=vec_col,
        k=k,
        exclude_self=False,
    )
    res = out[["rank", "neighbor_id"]].rename(
        columns={"neighbor_id": id_col}
    )
    return res.astype(np.int64).reset_index(drop=True)
