"""Graph analytics: edges / triangles / PageRank on hand-built graphs
(the sf0.01 parity lives in test_oracle_parity via the driver queries)."""

import numpy as np
import pandas as pd
import pytest

from data_validator_ray.pipelines.graph import (
    cooccurrence_edges,
    degree_counts,
    pagerank,
    triangle_count,
)


def edges_df(pairs):
    return pd.DataFrame(
        {"src": [a for a, _ in pairs], "dst": [b for _, b in pairs]}
    ).astype("int64")


def test_cooccurrence_edges_basic(ray_session):
    hyper = pd.DataFrame(
        {
            "g": [1, 1, 1, 2, 2, 3, 3, 3],
            "it": [10, 20, 30, 20, 30, 10, 10, 40],  # dup (3,10) collapses
        }
    )
    out = (
        cooccurrence_edges(hyper, "g", "it")
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    expect = edges_df([(10, 20), (10, 30), (10, 40), (20, 30)])
    pd.testing.assert_frame_equal(out, expect)


def test_cooccurrence_max_group_size_drops_hot_group(ray_session):
    hyper = pd.DataFrame(
        {"g": [1] * 5 + [2, 2], "it": [1, 2, 3, 4, 5, 7, 8]}
    )
    out = cooccurrence_edges(hyper, "g", "it", max_group_size=4).to_pandas()
    assert sorted(map(tuple, out.to_numpy())) == [(7, 8)]


def test_degree_and_triangles_k4(ray_session):
    # complete graph on 4 nodes: C(4,3) = 4 triangles, all degrees 3
    k4 = edges_df([(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    deg = degree_counts(k4).to_pandas().sort_values("node")
    assert deg["degree"].tolist() == [3, 3, 3, 3]
    tri = triangle_count(k4)
    assert tri.iloc[0].tolist() == [4, 6, 4]


def test_triangles_path_graph_none(ray_session):
    path = edges_df([(1, 2), (2, 3), (3, 4)])
    tri = triangle_count(path)
    assert tri.iloc[0].tolist() == [4, 3, 0]


def test_pagerank_matches_dense_reference(ray_session):
    # star plus a tail — asymmetric degrees
    pairs = [(1, 2), (1, 3), (1, 4), (4, 5)]
    e = edges_df(pairs)
    out = pagerank(e, iterations=4, damping=0.85).to_pandas()
    out = out.sort_values("node").reset_index(drop=True)

    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for a, b in pairs:
        adj[idx[a], idx[b]] = 1.0
        adj[idx[b], idx[a]] = 1.0
    deg = adj.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(4):
        r = 0.15 / n + 0.85 * adj.T @ (r / deg)
    np.testing.assert_allclose(
        out["pr"].to_numpy(), r, rtol=0, atol=1e-12
    )
    assert out["node"].tolist() == nodes


def test_pagerank_mass_conserved(ray_session):
    e = edges_df([(1, 2), (2, 3), (1, 3), (3, 4)])
    out = pagerank(e, iterations=3).to_pandas()
    assert abs(out["pr"].sum() - 1.0) < 1e-9
