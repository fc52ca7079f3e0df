"""Graph analytics over co-occurrence edge lists.

No analogue exists in the reference (its engines have no joins at all —
SURVEY.md §2.4); these are the classic distributed graph primitives a
100 TB link / co-occurrence corpus needs: edge derivation from
hyperedges (orders, sessions, pages sharing a host), degree profiles,
degree-ordered triangle counting and fixed-iteration PageRank.

Scale shapes:

- **edge derivation** (:func:`cooccurrence_edges`): per-batch distinct
  (group, item) combiner, ONE bucketed shuffle on the group key;
  per-group pair generation is quadratic in group size, so
  ``max_group_size`` drops hot hyperedges loudly-by-contract instead of
  letting one celebrity group emit O(k²) pairs (salting cannot fix a
  quadratic blowup — cap or sample).
- **triangle counting** (:func:`triangle_count`): each edge is oriented
  from lower to higher ``(degree, node)`` — the classic bound that caps
  post-orientation out-degree at O(√m) — with endpoint degrees attached
  by two shuffle hash-joins (never a broadcast of the degree table);
  wedges and closing edges then meet in ONE bucketed ``(a, b)``
  shuffle. No stage ever holds the whole graph.
- **PageRank** (:func:`pagerank`): the rank table is a Dataset, never a
  driver object; each iteration is one shuffle join
  (edges × ranks on src) plus one dst-grouped sum with in-batch
  combiners. The degree-annotated edge list is materialized ONCE
  because every iteration re-reads it — the standard cached-edges
  pattern for iterative graph algorithms (cf. GraphX/Pregel); ranks
  stay lazy.
"""

from __future__ import annotations

from typing import Any, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from .dedup import _as_dataset, _pairs_within_groups, _rename, bucketed_groupby


def cooccurrence_edges(
    source: Any,
    group_col: str,
    item_col: str,
    *,
    max_group_size: Optional[int] = 4096,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Distinct undirected co-occurrence edges ``(src < dst)`` between
    items sharing a group (suppliers sharing an order, pages sharing a
    session, …).

    Per-batch ``group_by`` dedup reduces the exchange to distinct
    (group, item) pairs; one bucketed shuffle on the group key
    co-locates each group; a second bucketed pass dedups edges that
    arise from many groups. Groups larger than ``max_group_size`` are
    skipped (documented contract — a k-item group emits k(k−1)/2
    pairs).
    """

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, item_col])
        t = t.filter(
            pc.and_(pc.is_valid(t[group_col]), pc.is_valid(t[item_col]))
        )
        return t.group_by([group_col, item_col]).aggregate([])

    def per_group_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates([group_col, item_col])
        return _pairs_within_groups(
            df, [group_col], item_col, max_group=max_group_size
        )

    ds = _as_dataset(source, columns=[group_col, item_col])
    pairs = bucketed_groupby(
        ds.map_batches(
            distinct_pairs, batch_format="pyarrow", batch_size=batch_size
        ),
        [group_col],
        per_group_pairs,
        num_buckets=num_buckets,
    )

    def dedup_edges(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["id_a", "id_b"])

    edges = bucketed_groupby(
        pairs, ["id_a", "id_b"], dedup_edges, num_buckets=num_buckets
    )
    return _rename(edges, {"id_a": "src", "id_b": "dst"})


def degree_counts(edges: Any, *, batch_size: int = 64 * 1024) -> Dataset:
    """Undirected degree per node from an ``(src, dst)`` edge list:
    in-batch endpoint counts (one combiner row per (batch, node)) then
    a small global sum — the exchange is node-bounded, never
    edge-bounded."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        both = pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        batch["src"].combine_chunks().cast(pa.int64()),
                        batch["dst"].combine_chunks().cast(pa.int64()),
                    ]
                )
            }
        )
        agg = both.group_by("node").aggregate([([], "count_all")])
        return agg.rename_columns(["node", "d"])

    ds = _as_dataset(edges, columns=["src", "dst"])
    part = ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
    out = part.groupby("node").aggregate(Sum("d", alias_name="degree"))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": batch["node"], "degree": pc.cast(batch["degree"], pa.int64())}
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def _oriented_edges(
    edges: Dataset, deg: Dataset, *, num_buckets: int
) -> Dataset:
    """Orient each undirected edge from lower to higher
    ``(degree, node)`` — columns ``(u, w, deg_w)``. Endpoint degrees
    arrive via two shuffle hash-joins (the degree table is a Dataset;
    nothing broadcasts)."""
    from .relational import hash_join

    deg_src = _rename(deg, {"node": "src", "degree": "deg_src"})
    deg_dst = _rename(deg, {"node": "dst", "degree": "deg_dst"})
    j1 = hash_join(
        edges,
        deg_src,
        left_key="src",
        right_key="src",
        left_cols=["src", "dst"],
        right_cols=["src", "deg_src"],
        num_buckets=num_buckets,
    )
    j2 = hash_join(
        j1,
        deg_dst,
        left_key="dst",
        right_key="dst",
        left_cols=["dst", "src", "deg_src"],
        right_cols=["dst", "deg_dst"],
        num_buckets=num_buckets,
    )

    def orient(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        ds_ = batch["deg_src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dd = batch["deg_dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        src_lower = (ds_ < dd) | ((ds_ == dd) & (src < dst))
        u = np.where(src_lower, src, dst)
        w = np.where(src_lower, dst, src)
        deg_w = np.where(src_lower, dd, ds_)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "w": pa.array(w, pa.int64()),
                "deg_w": pa.array(deg_w, pa.int64()),
            }
        )

    return j2.map_batches(orient, batch_format="pyarrow")


def triangle_count(
    edges: Any,
    *,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Exact global triangle count via degree-ordered orientation —
    one row: ``n_nodes, n_edges, n_triangles``.

    Orientation by the ``(degree, node)`` total order caps every
    node's post-orientation out-degree at O(√m), so the wedge stage
    (all out-neighbor pairs per node, generated by offset sweeps in
    ONE bucketed pass over ``u``) is near-linear in edges for
    power-law graphs. Wedges are pre-counted per (a, b) inside each
    bucket, then matched against the oriented edge set in ONE bucketed
    ``(a, b)`` shuffle; a triangle {x, y, z} is counted exactly once
    (its two lowest-order endpoints form the wedge center/legs, the
    closing edge is oriented the same way by transitivity of the total
    order). Only per-bucket scalar counts reach the driver.
    """
    # the edge list / degree table / oriented list each feed ≥2
    # downstream consumers — cache once (O(m) / O(nodes), the graph
    # itself, not the source corpus)
    e = _as_dataset(edges, columns=["src", "dst"]).materialize()
    deg = degree_counts(e).materialize()
    oriented = _oriented_edges(e, deg, num_buckets=num_buckets).materialize()

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        # all out-neighbor pairs per u, ordered by the SAME total order
        # used for orientation ((deg, node)), so the closing edge of a
        # triangle is oriented (a → b) exactly when the wedge is (a, b)
        empty = pd.DataFrame(
            {
                "a": pd.Series(dtype=np.int64),
                "b": pd.Series(dtype=np.int64),
                "side": pd.Series(dtype=np.int64),
                "cnt": pd.Series(dtype=np.int64),
            }
        )
        if len(df) < 2:
            return empty
        g = df.sort_values(["u", "deg_w", "w"], kind="stable")
        u = g["u"].to_numpy()
        w = g["w"].to_numpy()
        parts = []
        run = np.bincount(np.unique(u, return_inverse=True)[1]).max()
        for j in range(1, int(run)):
            same = u[:-j] == u[j:]
            if not same.any():
                break
            idx = np.nonzero(same)[0]
            parts.append(pd.DataFrame({"a": w[idx], "b": w[idx + j]}))
        if not parts:
            return empty
        allw = pd.concat(parts, ignore_index=True)
        out = allw.groupby(["a", "b"], sort=False).size().reset_index(name="cnt")
        out["side"] = np.int64(0)
        return out[["a", "b", "side", "cnt"]]

    wedge_counts = bucketed_groupby(
        oriented, ["u"], wedges, num_buckets=num_buckets
    ).map_batches(
        # normalize to Arrow blocks: the union below must not mix
        # pandas (map_groups) and arrow (edge_side) block types
        lambda b: b,
        batch_format="pyarrow",
    )

    def edge_side(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "a": batch["u"].cast(pa.int64()),
                "b": batch["w"].cast(pa.int64()),
                "side": pa.array(np.ones(n, np.int64)),
                "cnt": pa.array(np.ones(n, np.int64)),
            }
        )

    tagged = wedge_counts.union(
        oriented.map_batches(edge_side, batch_format="pyarrow")
    )

    def close(df: pd.DataFrame) -> pd.DataFrame:
        edges_here = df[df["side"] == 1][["a", "b"]]
        wedges_here = df[df["side"] == 0]
        if len(edges_here) == 0 or len(wedges_here) == 0:
            matched = 0
        else:
            m = wedges_here.merge(edges_here, on=["a", "b"], how="inner")
            matched = int(m["cnt"].sum())
        return pd.DataFrame({"tri": [np.int64(matched)]})

    per_bucket = bucketed_groupby(
        tagged, ["a", "b"], close, num_buckets=num_buckets
    )
    tri = int(per_bucket.to_pandas()["tri"].sum())  # num_buckets scalars
    return pd.DataFrame(
        {
            "n_nodes": [deg.count()],
            "n_edges": [e.count()],
            "n_triangles": [tri],
        }
    ).astype("int64")


def pagerank(
    edges: Any,
    *,
    iterations: int = 3,
    damping: float = 0.85,
    num_buckets: int = 64,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Fixed-iteration PageRank over an undirected ``(src, dst)`` edge
    list — columns ``(node, pr)``.

    The rank vector is a Dataset throughout; one shuffle join
    (degree-annotated edges × ranks on ``src``) plus one dst-grouped
    sum (in-batch combiner first, so the exchange is node-bounded) per
    iteration. The edge list with source degrees is materialized once
    up front — every iteration re-reads it, the standard cached-edges
    pattern for iterative algorithms. Every node of a nonempty
    undirected graph has in-edges, so no dangling-mass handling is
    needed here.
    """
    from ray.data.aggregate import Sum

    from .relational import hash_join

    # e feeds both the direction expansion and the degree pass; deg
    # feeds the join annotation, the rank init and the node count —
    # cache each once (O(m) / O(nodes))
    e = _as_dataset(edges, columns=["src", "dst"]).materialize()

    def both_dirs(batch: pa.Table) -> pa.Table:
        src = batch["src"].combine_chunks().cast(pa.int64())
        dst = batch["dst"].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "src": pa.concat_arrays([src, dst]),
                "dst": pa.concat_arrays([dst, src]),
            }
        )

    e2 = e.map_batches(both_dirs, batch_format="pyarrow", batch_size=batch_size)
    deg = degree_counts(e).materialize()
    n = deg.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "pr": pa.array([], pa.float64())})
        )

    deg_src = _rename(deg, {"node": "src", "degree": "src_deg"})
    # cached once: consumed by every iteration's join
    esrc = hash_join(
        e2,
        deg_src,
        left_key="src",
        right_key="src",
        left_cols=["src", "dst"],
        right_cols=["src", "src_deg"],
        num_buckets=num_buckets,
    ).materialize()

    def init_ranks(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"].cast(pa.int64()),
                "pr": pa.array(np.full(batch.num_rows, 1.0 / n)),
            }
        )

    ranks = deg.map_batches(init_ranks, batch_format="pyarrow")
    base = (1.0 - damping) / n

    for _ in range(iterations):
        joined = hash_join(
            esrc,
            ranks,
            left_key="src",
            right_key="node",
            left_cols=["src", "dst", "src_deg"],
            right_cols=["node", "pr"],
            num_buckets=num_buckets,
        )

        def contrib_partial(batch: pa.Table) -> pa.Table:
            c = pc.divide(
                batch["pr"], pc.cast(batch["src_deg"], pa.float64())
            )
            t = pa.table({"node": batch["dst"].cast(pa.int64()), "c": c})
            g = t.group_by("node").aggregate([("c", "sum")])
            return g.rename_columns(["node", "c"])

        summed = joined.map_batches(
            contrib_partial, batch_format="pyarrow", batch_size=batch_size
        ).groupby("node").aggregate(Sum("c", alias_name="s"))

        def apply_rank(batch: pa.Table) -> pa.Table:
            pr = pc.add(pa.scalar(base), pc.multiply(pa.scalar(damping), batch["s"]))
            return pa.table(
                {"node": batch["node"].cast(pa.int64()), "pr": pr}
            )

        ranks = summed.map_batches(apply_rank, batch_format="pyarrow")

    return ranks
