"""Similarity search over an embedding column (Ray-Data-first).

Net-new vs the reference. Two tiers:

* :func:`knn_brute` — exact cosine top-k: the (small) query matrix is
  broadcast once via ``ray.put``; every batch computes one float64
  matmul and keeps its per-batch top-k per query (``np.argpartition``),
  so only ``num_batches × q × k`` candidate rows ever reach the
  driver, which does the final exact merge. Deterministic tie-break:
  (score DESC, vec_id ASC).
* :func:`knn_ivf` — the scale path: an IVF index. Centroids come from
  a seeded Lloyd refinement over a driver-side sample; every vector is
  assigned to its nearest centroid in a ``map_batches`` pass; a query
  probes only the ``nprobe`` nearest centroid buckets. Approximate
  (recall < 1 when true neighbors live in unprobed buckets).

The brute-force tier is oracle-checked against DuckDB
``list_cosine_similarity`` + window ``ROW_NUMBER`` in ``__ray_entry__``.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .dedup import _as_dataset, _embedding_matrix, load_embeddings

Dataset = ray.data.Dataset


def _topk_merge(
    cands: pd.DataFrame, k: int
) -> pd.DataFrame:
    """Final exact top-k per query over per-batch candidates with the
    deterministic (score DESC, id ASC) order; emits rank 1..k."""
    out = cands.sort_values(
        ["query_id", "score", "neighbor_id"], ascending=[True, False, True],
        kind="stable",
    )
    out = out.groupby("query_id", sort=True).head(k).copy()
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out.reset_index(drop=True)


def knn_brute(
    source: Any,
    queries: "np.ndarray | List[List[float]]",
    query_ids: Optional[np.ndarray] = None,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    exclude_self: bool = True,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """Exact cosine top-k of each query vector against the dataset.

    Returns (query_id, rank, neighbor_id, score). ``exclude_self``
    drops neighbors whose id equals the query id (for self-search)."""
    Q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Qn = Q / qn
    qids = (
        np.asarray(query_ids, dtype=np.int64)
        if query_ids is not None
        else np.arange(len(Q), dtype=np.int64)
    )
    ref = ray.put((qids, Qn))

    def batch_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_m = ray.get(ref)
        m = _embedding_matrix(batch, vec_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = q_m @ (m / norms).T  # (q, batch)
        if exclude_self:
            sims = np.where(q_ids[:, None] == ids[None, :], -np.inf, sims)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]  # (q, k)
        rows_q = np.repeat(q_ids, kk)
        cols = part.reshape(-1)
        scores = sims[np.repeat(np.arange(len(q_ids)), kk), cols]
        keep = np.isfinite(scores)
        return pa.table(
            {
                "query_id": pa.array(rows_q[keep], pa.int64()),
                "neighbor_id": pa.array(ids[cols][keep], pa.int64()),
                "score": pa.array(scores[keep], pa.float64()),
            }
        )

    ds = _as_dataset(source, columns=[id_col, vec_col])
    cands = ds.map_batches(
        batch_topk, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()
    return _topk_merge(cands, k)


def train_ivf_centroids(
    source: Any,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_iters: int = 10,
    sample_size: int = 65536,
    seed: int = 0xC3,
) -> np.ndarray:
    """Seeded Lloyd k-means on a driver-side sample (normalized
    vectors, cosine ≡ dot). At 10^12 scale the sample read streams the
    first ``sample_size`` rows only (``ds.limit``)."""
    ds = _as_dataset(source, columns=[id_col, vec_col]).limit(sample_size)
    _, M = load_embeddings(ds, id_col, vec_col)
    rng = np.random.default_rng(seed)
    init = rng.choice(len(M), size=min(n_centroids, len(M)), replace=False)
    C = M[np.sort(init)].copy()
    for _ in range(n_iters):
        assign = np.argmax(M @ C.T, axis=1)
        for c in range(len(C)):
            members = M[assign == c]
            if len(members):
                v = members.sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    C[c] = v / nv
    return C


def knn_ivf(
    source: Any,
    queries: "np.ndarray | List[List[float]]",
    query_ids: Optional[np.ndarray] = None,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    exclude_self: bool = True,
    batch_size: int = 4096,
    centroids: Optional[np.ndarray] = None,
) -> pd.DataFrame:
    """IVF approximate top-k: probe only the ``nprobe`` centroid
    buckets nearest to each query. One assignment pass + one pruned
    scoring pass; both streaming ``map_batches``."""
    Q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Qn = Q / qn
    qids = (
        np.asarray(query_ids, dtype=np.int64)
        if query_ids is not None
        else np.arange(len(Q), dtype=np.int64)
    )
    C = (
        centroids
        if centroids is not None
        else train_ivf_centroids(
            source, id_col=id_col, vec_col=vec_col, n_centroids=n_centroids
        )
    )
    # clusters each query probes
    probe = np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe]  # (q, nprobe)
    ref = ray.put((qids, Qn, C, probe))

    def batch_scores(batch: pa.Table) -> pa.Table:
        q_ids, q_m, cents, probe_sets = ray.get(ref)
        m = _embedding_matrix(batch, vec_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        assign = np.argmax(mn @ cents.T, axis=1)  # (batch,)
        sims = q_m @ mn.T  # (q, batch)
        # mask vectors outside each query's probed clusters, fully
        # vectorized: (q, n_centroids) membership matrix gathered by
        # each vector's cluster assignment
        probes = np.zeros((len(q_ids), len(cents)), dtype=bool)
        np.put_along_axis(probes, probe_sets, True, axis=1)
        sims = np.where(probes[:, assign], sims, -np.inf)
        if exclude_self:
            sims = np.where(q_ids[:, None] == ids[None, :], -np.inf, sims)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows_q = np.repeat(q_ids, kk)
        cols = part.reshape(-1)
        scores = sims[np.repeat(np.arange(len(q_ids)), kk), cols]
        keep = np.isfinite(scores)
        return pa.table(
            {
                "query_id": pa.array(rows_q[keep], pa.int64()),
                "neighbor_id": pa.array(ids[cols][keep], pa.int64()),
                "score": pa.array(scores[keep], pa.float64()),
            }
        )

    ds = _as_dataset(source, columns=[id_col, vec_col])
    cands = ds.map_batches(
        batch_scores, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()
    return _topk_merge(cands, k)
