"""Dedup operators: planted near-duplicates must be recovered exactly.

Fixture: a small corpus with exact dups, high-Jaccard near-dups, and
unrelated documents; every tier (exact, ngram-Jaccard, MinHash-LSH,
SimHash, embedding-cosine) must find exactly the planted pairs.
"""

import numpy as np
import pandas as pd
import pytest

from data_validator_ray.pipelines import dedup as D


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(42)
    vocab = [f"w{i}" for i in range(200)]
    docs = {}
    for i in range(30):
        docs[i] = " ".join(rng.choice(vocab, size=60))
    # 100/101: exact duplicate pair
    docs[100] = docs[0]
    docs[101] = docs[0]
    # 110: near-dup of doc 1 (one token changed)
    toks = docs[1].split()
    toks[30] = "CHANGED"
    docs[110] = " ".join(toks)
    return pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())}
    ).sort_values("doc_id").reset_index(drop=True)


def _true_jaccard(a: str, b: str, n: int = 3) -> float:
    def s(t):
        toks = t.split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sa, sb = s(a), s(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup_keeps_one_per_key(ray_session, corpus):
    dup = pd.concat([corpus, corpus.head(5)], ignore_index=True)
    out = D.exact_dedup(ray.data.from_pandas(dup), "doc_id").to_pandas()
    assert len(out) == len(corpus)
    assert sorted(out.doc_id) == sorted(corpus.doc_id)


import ray  # noqa: E402  (used in fixtures after import ordering)
import ray.data  # noqa: E402


def test_ngram_jaccard_finds_planted_pairs(ray_session, corpus):
    out = D.ngram_jaccard_pairs(
        ray.data.from_pandas(corpus), threshold=0.5
    )
    got = set(map(tuple, out[["id_a", "id_b"]].values))
    assert (0, 100) in got and (0, 101) in got and (100, 101) in got
    assert (1, 110) in got
    # intersection/size numbers are the true set sizes
    row = out[(out.id_a == 100) & (out.id_b == 101)].iloc[0]
    assert row.intersection == row.size_a == row.size_b
    # no unrelated random pair sneaks in at this threshold
    for _, r in out.iterrows():
        ta = corpus.set_index("doc_id").loc[r.id_a, "text"]
        tb = corpus.set_index("doc_id").loc[r.id_b, "text"]
        assert _true_jaccard(ta, tb) >= 0.5


def test_minhash_matches_exact_on_planted_pairs(ray_session, corpus):
    ds = ray.data.from_pandas(corpus)
    exact = D.ngram_jaccard_pairs(ds, threshold=0.5)
    mh = D.minhash_near_dup_pairs(ray.data.from_pandas(corpus), threshold=0.5)
    assert mh[["id_a", "id_b"]].values.tolist() == exact[["id_a", "id_b"]].values.tolist()
    # deterministic across runs (seeded)
    mh2 = D.minhash_near_dup_pairs(ray.data.from_pandas(corpus), threshold=0.5)
    assert mh.equals(mh2)


def test_simhash_finds_exact_and_near_dups(ray_session, corpus):
    out = D.simhash_pairs(ray.data.from_pandas(corpus), max_hamming=3)
    got = set(map(tuple, out[["id_a", "id_b"]].values))
    # exact dups have identical simhash (hamming 0)
    assert (0, 100) in got and (0, 101) in got and (100, 101) in got
    ham = out.set_index(["id_a", "id_b"]).hamming
    assert ham.loc[(0, 100)] == 0
    assert ham.loc[(100, 101)] == 0


def test_popcount64():
    x = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF, 1 << 63], dtype=np.uint64)
    assert D.popcount64(x).tolist() == [0, 1, 2, 64, 1]


def test_pairs_within_groups_vectorized_sweep():
    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "__id": [10, 11, 12, 20, 21, 30],
            "size": [5, 6, 7, 8, 9, 1],
        }
    )
    out = D._pairs_within_groups(df, ["k"], "__id", carry_cols=["size"])
    got = sorted(map(tuple, out[["id_a", "id_b"]].values))
    assert got == [(10, 11), (10, 12), (11, 12), (20, 21)]
    row = out[(out.id_a == 10) & (out.id_b == 12)].iloc[0]
    assert (row.size_a, row.size_b) == (5, 7)
    # max_group guard drops the size-3 group
    out2 = D._pairs_within_groups(df, ["k"], "__id", max_group=2)
    assert sorted(map(tuple, out2[["id_a", "id_b"]].values)) == [(20, 21)]


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(7)
    M = rng.normal(size=(40, 16))
    # plant a near-dup pair: 100/101 nearly parallel
    M[30] = M[0] + rng.normal(scale=0.01, size=16)
    ids = np.arange(40)
    return pd.DataFrame(
        {"vec_id": ids, "embedding": [r.astype(np.float32).tolist() for r in M]}
    )


def test_embedding_cosine_pairs_exact(ray_session, vectors):
    out = D.embedding_cosine_pairs(
        ray.data.from_pandas(vectors), threshold=0.95
    )
    assert (0, 30) in set(map(tuple, out[["id_a", "id_b"]].values))
    # brute-force ground truth
    M = np.stack([np.asarray(v, np.float64) for v in vectors.embedding])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    a, b = np.triu_indices(len(M), k=1)
    truth = {(i, j) for i, j in zip(a[S[a, b] >= 0.95], b[S[a, b] >= 0.95])}
    assert set(map(tuple, out[["id_a", "id_b"]].values)) == truth


def test_embedding_cosine_pairs_blocked_matches_brute(ray_session, vectors):
    """The block-partitioned tier must produce exactly the broadcast
    tier's pairs (every unordered pair lands in one block-pair group),
    for several block counts including nb > number of rows per block."""
    brute = D.embedding_cosine_pairs(ray.data.from_pandas(vectors), threshold=0.9)
    truth = set(map(tuple, brute[["id_a", "id_b"]].values))
    for nb in (1, 3, 8):
        out = D.embedding_cosine_pairs_blocked(
            ray.data.from_pandas(vectors), threshold=0.9, n_blocks=nb
        ).to_pandas()
        assert set(map(tuple, out[["id_a", "id_b"]].values)) == truth, nb


def test_embedding_cosine_pairs_routes_past_guard(ray_session, vectors):
    """Above max_broadcast_rows the broadcast tier must route to the
    blocked implementation and return identical pairs."""
    routed = D.embedding_cosine_pairs(
        ray.data.from_pandas(vectors), threshold=0.9, max_broadcast_rows=10
    )
    brute = D.embedding_cosine_pairs(ray.data.from_pandas(vectors), threshold=0.9)
    pd.testing.assert_frame_equal(routed, brute)


def test_embedding_lsh_subset_of_exact(ray_session, vectors):
    exact = D.embedding_cosine_pairs(ray.data.from_pandas(vectors), threshold=0.9)
    lsh = D.embedding_lsh_pairs(
        ray.data.from_pandas(vectors), threshold=0.9
    ).to_pandas()
    got = set(map(tuple, lsh[["id_a", "id_b"]].values))
    assert got <= set(map(tuple, exact[["id_a", "id_b"]].values))
    # the planted nearly-parallel pair survives banding (≥1 band agrees)
    assert (0, 30) in got


def test_embedding_lsh_sketch_verify_parity(ray_session, vectors):
    """ship_vectors=False must return EXACTLY the ship-vectors tier's
    pairs: same seeded planes ⇒ same candidate set, and both tiers
    verify with exact cosine. Pinned at bits_per_band=16 (the sketch
    tier's documented key-width regime) on both sides."""
    kw = dict(threshold=0.7, bands=8, bits_per_band=16, num_buckets=16)
    ship = (
        D.embedding_lsh_pairs(ray.data.from_pandas(vectors), **kw)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    sketch = (
        D.embedding_lsh_pairs(
            ray.data.from_pandas(vectors), ship_vectors=False, **kw
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sketch, ship)
    # the planted near-parallel pair survives in both
    assert (0, 30) in set(map(tuple, sketch[["id_a", "id_b"]].values))


def test_embedding_lsh_sketch_verify_empty_result(ray_session, vectors):
    """No candidate ever reaches threshold 1.01 — the sketch tier's
    verify rounds must come back empty with the right schema instead
    of crashing on empty buckets."""
    out = D.embedding_lsh_pairs(
        ray.data.from_pandas(vectors),
        threshold=1.01,
        bands=4,
        bits_per_band=16,
        ship_vectors=False,
        num_buckets=8,
    )
    assert out.count() == 0
    assert out.schema().names == ["id_a", "id_b"]


def test_collapse_exact_vectors(ray_session):
    """Byte-identical vectors collapse to their min-id representative;
    odd dim exercises the zero-pad lane path."""
    rng = np.random.default_rng(3)
    base = rng.normal(size=(6, 7)).astype(np.float32)
    rows, ids = [], []
    for i in range(6):
        rows.append(base[i])
        ids.append(i)
    for i in range(3):  # copy groups {i, 10+i, 20+i}
        for off in (10, 20):
            rows.append(base[i].copy())
            ids.append(off + i)
    df = pd.DataFrame(
        {
            "vec_id": np.array(ids, np.int64),
            "embedding": [r.tolist() for r in rows],
        }
    )
    reps = D.collapse_exact_vectors(
        ray.data.from_pandas(df), num_buckets=4
    ).to_pandas()
    assert sorted(reps.vec_id.tolist()) == [0, 1, 2, 3, 4, 5]
    # representative rows carry the shared vector bytes
    got = {
        int(r.vec_id): np.asarray(list(r.embedding), np.float32)
        for r in reps.itertuples()
    }
    for i in range(6):
        assert np.array_equal(got[i], base[i])


def test_embedding_near_dup_dedup_collapse_parity(ray_session, vectors):
    """collapse_exact=True must return EXACTLY the uncollapsed
    survivor set (quotient-graph argument in the docstring), on a
    corpus with both byte-duplicate groups and merely-near pairs."""
    df = vectors.copy()
    extra = pd.DataFrame(
        {
            "vec_id": np.array([100, 101, 102, 103], np.int64),
            "embedding": [
                df.embedding[0],
                df.embedding[30],
                df.embedding[5],
                df.embedding[5],
            ],
        }
    )
    df = pd.concat([df, extra], ignore_index=True)
    base = D.embedding_near_dup_dedup(
        ray.data.from_pandas(df), threshold=0.9
    ).to_pandas()
    collapsed = D.embedding_near_dup_dedup(
        ray.data.from_pandas(df), threshold=0.9, collapse_exact=True
    ).to_pandas()
    assert sorted(collapsed.vec_id) == sorted(base.vec_id)
    # the byte copies and the planted near-parallel twin are dropped
    survivors = set(collapsed.vec_id)
    assert {100, 101, 102, 103, 30}.isdisjoint(survivors)
    assert {0, 5}.issubset(survivors)


def test_embedding_near_dup_dedup_degenerate_corpus(ray_session):
    """The degenerate regime the collapse tier exists for: one huge
    identical-vector group never reaches the O(m²) pair stage — the
    pair graph sees a single representative node."""
    rng = np.random.default_rng(11)
    v = rng.normal(size=24).astype(np.float32)
    other = rng.normal(size=(5, 24)).astype(np.float32)
    ids = np.arange(500, dtype=np.int64) + 50
    df = pd.DataFrame(
        {
            "vec_id": np.concatenate([ids, np.arange(5, dtype=np.int64)]),
            "embedding": [v.tolist()] * 500
            + [r.tolist() for r in other],
        }
    )
    out = D.embedding_near_dup_dedup(
        ray.data.from_pandas(df),
        threshold=0.999,
        collapse_exact=True,
        method="lsh",
        lsh_kwargs=dict(num_buckets=8),
    ).to_pandas()
    assert int(ids.min()) in set(out.vec_id)
    assert len(set(out.vec_id) & set(ids.tolist())) == 1  # one survivor
    assert {0, 1, 2, 3, 4}.issubset(set(out.vec_id))


def test_embedding_near_dup_dedup_keep_set_guard(ray_session, vectors):
    with pytest.raises(ValueError, match="max_keep_set"):
        D.embedding_near_dup_dedup(
            ray.data.from_pandas(vectors),
            collapse_exact=True,
            max_keep_set=3,
        )


def test_embedding_lsh_banded_recall(ray_session):
    """Planted near-dup recall (mirror of the MinHash recall test): 12
    pairs at cosine ≈ 0.999 must ALL collide in at least one of the
    b=8 × r=8 seeded band tables — expected miss probability per pair
    is (1 − p^8)^8 ≈ 1e-12 at this angle, and the planes are seeded, so
    the assertion is deterministic."""
    rng = np.random.default_rng(42)
    base = rng.normal(size=(12, 32))
    rows, ids = [], []
    for i, v in enumerate(base):
        rows.append(v)
        ids.append(i)
        rows.append(v + rng.normal(scale=0.01, size=32))  # near-parallel twin
        ids.append(100 + i)
    # background noise vectors (should produce no extra pairs at 0.95)
    for j, v in enumerate(rng.normal(size=(40, 32))):
        rows.append(v)
        ids.append(1000 + j)
    df = pd.DataFrame(
        {
            "vec_id": np.array(ids, np.int64),
            "embedding": [r.astype(np.float32).tolist() for r in rows],
        }
    )
    out = D.embedding_lsh_pairs(
        ray.data.from_pandas(df), threshold=0.95
    ).to_pandas()
    got = set(map(tuple, out[["id_a", "id_b"]].values))
    planted = {(i, 100 + i) for i in range(12)}
    assert planted <= got, planted - got
    # verification is exact in-bucket: nothing below threshold leaks
    exact = D.embedding_cosine_pairs(ray.data.from_pandas(df), threshold=0.95)
    assert got <= set(map(tuple, exact[["id_a", "id_b"]].values))


# --------------------------------------------------------------------------- #
# round 2 regressions (ADVICE.md)                                             #
# --------------------------------------------------------------------------- #


def test_minhash_empty_and_short_docs(ray_session):
    """Trailing/interior empty or <n-token docs must not crash the
    signature stage (np.minimum.reduceat rejected out-of-range trailing
    segment starts) and must never appear as near-dup candidates."""
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "text": [
                "the quick brown fox jumps over the lazy dog again and again",
                "",  # interior empty
                "the quick brown fox jumps over the lazy dog again and again",
                "hi",  # < n tokens
                "completely different text about ships and harbors and tides here",
                "",  # trailing empty — the reduceat IndexError repro
            ],
        }
    )
    out = D.minhash_near_dup_pairs(df, threshold=0.5)
    pairs = set(zip(out.id_a, out.id_b))
    assert (0, 2) in pairs
    involved = {i for p in pairs for i in p}
    assert involved <= {0, 2, 4}  # empty/short docs never matched


def test_minhash_stage_all_empty_batch(ray_session):
    import pyarrow as pa

    stage = D.MinHashStage()
    out = stage(pa.table({"doc_id": pa.array([7, 8], pa.int64()),
                          "text": pa.array(["", "x"], pa.string())}))
    # both docs shingle-free → zero band rows emitted
    assert out.num_rows == 0


def test_exact_jaccard_tokenization_matches_shingle_frame(ray_session):
    """Multi-space / tab / newline texts: verification must agree with
    candidate generation (split on single space, drop empties)."""
    a = "alpha  beta\tgamma delta epsilon zeta eta theta iota kappa"
    b = "alpha  beta\tgamma delta epsilon zeta eta theta iota lambda"
    df = pd.DataFrame({"doc_id": [1, 2], "text": [a, b]})
    out = D.minhash_near_dup_pairs(df, threshold=0.3)
    exact = D.ngram_jaccard_pairs(df, threshold=0.3)
    assert list(out.id_a) == list(exact.id_a)
    assert list(out.intersection) == list(exact.intersection)
    assert list(out.size_a) == list(exact.size_a)


def test_distributed_verify_inflated_candidate_set(ray_session):
    """verify_pairs_distributed must return exact Jaccard stats for
    every candidate — including false candidates (low similarity) and
    pairs of unrelated docs — and nothing else, matching a per-pair
    python-set reference."""
    import ray.data

    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(80)]
    docs = {i: " ".join(rng.choice(vocab, size=40)) for i in range(20)}
    docs[50] = docs[3]  # exact dup pair (3, 50)
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})

    # inflate: the true dup pair + many unrelated pairs + a non-pair id
    cand_pairs = [(3, 50)] + [(i, i + 10) for i in range(8)] + [(2, 17)]
    cand = ray.data.from_pandas(
        pd.DataFrame(cand_pairs, columns=["id_a", "id_b"])
    )
    got = (
        D.verify_pairs_distributed(df, cand, "doc_id", "text", 3)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )

    def sh(t):
        toks = [w for w in t.split(" ") if w]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for _, row in got.iterrows():
        a, b = sh(docs[row.id_a]), sh(docs[row.id_b])
        assert row.intersection == len(a & b)
        assert row.size_a == len(a) and row.size_b == len(b)
    got_pairs = set(zip(got.id_a, got.id_b))
    assert (3, 50) in got_pairs
    # only candidate pairs may appear
    assert got_pairs <= set(cand_pairs)
    # every candidate with nonzero overlap appears
    for a, b in cand_pairs:
        if len(sh(docs[a]) & sh(docs[b])):
            assert (a, b) in got_pairs


def test_stop_shingle_skew_guard_bounds_pair_emission(ray_session):
    """Planted stop-shingle: one 3-gram shared by EVERY doc would emit
    k(k-1)/2 pairs without the guard. With max_shingle_freq set, groups
    larger than the bound emit nothing, so pair count stays bounded by
    the genuine near-dup structure."""
    rng = np.random.default_rng(11)
    vocab = [f"v{i}" for i in range(300)]
    stop = "click here now"  # the planted hot shingle
    docs = {}
    for i in range(60):
        docs[i] = stop + " " + " ".join(rng.choice(vocab, size=40))
    docs[200] = docs[0]  # one true dup pair

    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})

    unguarded = D.ngram_jaccard_pairs(
        ray.data.from_pandas(df), threshold=0.0, max_shingle_freq=None
    )
    # every doc pairs with every other through the stop shingle
    assert len(unguarded) == 61 * 60 // 2

    guarded = D.ngram_jaccard_pairs(
        ray.data.from_pandas(df), threshold=0.0, max_shingle_freq=10
    )
    # the hot-shingle group (61 docs) is dropped; only pairs that share
    # a NON-hot shingle remain — the true dup pair must survive
    assert len(guarded) < len(unguarded) / 10
    got = set(map(tuple, guarded[["id_a", "id_b"]].values))
    assert (0, 200) in got
    # the surviving dup pair's stats exclude nothing: sizes are true
    row = guarded[(guarded.id_a == 0) & (guarded.id_b == 200)].iloc[0]
    assert row.size_a == row.size_b
    # documented bound: each surviving shingle group of size g ≤ bound
    # emits ≤ g(g-1)/2 pairs — total is bounded by #shingles × 45
    assert (guarded.intersection >= 1).all()


def test_connected_components_union_find():
    pairs = pd.DataFrame(
        {"id_a": [1, 2, 10, 11, 20], "id_b": [2, 3, 11, 12, 21]}
    )
    comp = D.connected_components(pairs)
    by = dict(zip(comp.doc_id, comp.cluster_id))
    assert by == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    # empty pair list → empty frame
    empty = D.connected_components(pairs.iloc[0:0])
    assert len(empty) == 0


def test_connected_components_distributed_matches_union_find(ray_session):
    rng = np.random.default_rng(7)
    edges = []
    chain = np.arange(100, 300)  # 200-node path: forces several rounds
    edges += list(zip(chain[:-1], chain[1:]))
    for _ in range(50):
        grp = rng.choice(
            np.arange(1000, 5000), size=rng.integers(2, 8), replace=False
        )
        edges += list(zip(grp[:-1], grp[1:]))
    edges.append((9999, 9998))
    pairs = pd.DataFrame(edges, columns=["id_a", "id_b"]).astype("int64")
    # duplicates + reversed orientation + self-loops must not matter
    rev = pairs.sample(frac=0.3, random_state=1).rename(
        columns={"id_a": "id_b", "id_b": "id_a"}
    )
    loops = pd.DataFrame({"id_a": [100, 9999], "id_b": [100, 9999]})
    noisy = pd.concat([pairs, rev, loops], ignore_index=True)
    exp = (
        D.connected_components(pairs)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        D.connected_components_distributed(noisy, num_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_connected_components_distributed_empty(ray_session):
    empty = pd.DataFrame(
        {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64")}
    )
    out = D.connected_components_distributed(empty).to_pandas()
    assert len(out) == 0


def test_near_dup_dedup_distributed_cc(ray_session, corpus):
    drv = D.near_dup_dedup(
        ray.data.from_pandas(corpus), threshold=0.5
    ).to_pandas()
    dist = D.near_dup_dedup(
        ray.data.from_pandas(corpus), threshold=0.5, cc="distributed"
    ).to_pandas()
    assert sorted(dist.doc_id) == sorted(drv.doc_id)


def test_near_dup_dedup_anti_join_route(ray_session, corpus):
    """Forcing max_broadcast_drop below the drop-set size must route
    the final filter through the Bloom-prefiltered anti-join and
    return EXACTLY the broadcast tier's rows (columns included)."""
    base = D.near_dup_dedup(
        ray.data.from_pandas(corpus), threshold=0.5, cc="distributed"
    ).to_pandas()
    routed = D.near_dup_dedup(
        ray.data.from_pandas(corpus),
        threshold=0.5,
        cc="distributed",
        max_broadcast_drop=1,  # drop-set is 3 (100, 101, 110)
    ).to_pandas()
    assert list(routed.columns) == list(base.columns)
    assert sorted(routed.doc_id) == sorted(base.doc_id)


def test_embedding_near_dup_dedup_anti_join_route(ray_session, vectors):
    base = D.embedding_near_dup_dedup(
        ray.data.from_pandas(vectors), threshold=0.9, cc="distributed"
    ).to_pandas()
    routed = D.embedding_near_dup_dedup(
        ray.data.from_pandas(vectors),
        threshold=0.9,
        cc="distributed",
        max_broadcast_drop=0,
    ).to_pandas()
    assert list(routed.columns) == list(base.columns)
    assert sorted(routed.vec_id) == sorted(base.vec_id)


def test_near_dup_dedup_keeps_min_per_cluster(ray_session, corpus):
    out = D.near_dup_dedup(
        ray.data.from_pandas(corpus), threshold=0.5
    ).to_pandas()
    kept = set(out.doc_id)
    # cluster {0,100,101} → keep 0; cluster {1,110} → keep 1
    assert 0 in kept and 100 not in kept and 101 not in kept
    assert 1 in kept and 110 not in kept
    # all singleton docs survive with full columns
    assert set(corpus.columns) == set(out.columns)
    assert kept == set(corpus.doc_id) - {100, 101, 110}


def test_exact_dedup_tiebreak_keeps_min(ray_session):
    df = pd.DataFrame(
        {
            "k": ["a", "a", "b", "b", "c"],
            "id": [5, 2, 9, 1, 7],
            "text": ["long text x", "long text y", "p", "q", "r"],
        }
    )
    out = (
        D.exact_dedup(ray.data.from_pandas(df), "k", tiebreak="id")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out.id.tolist() == [2, 1, 7]  # min id per key survives


# --------------------------------------------------------------------------- #
# paragraph-level exact dedup                                                 #
# --------------------------------------------------------------------------- #


def test_paragraph_dedup_keep_first_and_reassembly(ray_session):
    from data_validator_ray.pipelines.dedup import paragraph_dedup

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha\nbeta\ngamma",
                "beta\ndelta",          # beta dropped (doc 1 has it)
                "alpha\nbeta",          # both dropped -> empty doc
            ],
        }
    )
    out = (
        paragraph_dedup(df, num_hash_buckets=4, num_doc_buckets=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == ["alpha\nbeta\ngamma", "delta", ""]
    assert out["n_dropped"].tolist() == [0, 1, 2]


def test_paragraph_dedup_mode_equivalence(ray_session, corpus):
    """The broadcast-rebuild tier and the shuffle reassembly tier must
    produce IDENTICAL output (rows, text bytes, n_dropped) on a corpus
    with real cross-document paragraph duplication."""
    from data_validator_ray.pipelines.dedup import paragraph_dedup

    outs = {}
    for mode in ("broadcast", "shuffle"):
        outs[mode] = (
            paragraph_dedup(
                ray.data.from_pandas(corpus), sep=" ", mode=mode,
                num_hash_buckets=8, num_doc_buckets=4,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs["broadcast"], outs["shuffle"])
    assert (outs["broadcast"]["n_dropped"] > 0).any()  # real drops


def test_paragraph_dedup_null_text_and_empty_segments(ray_session):
    from data_validator_ray.pipelines.dedup import paragraph_dedup

    df = pd.DataFrame(
        {
            "doc_id": [10, 11, 12],
            "text": [None, "x\n", "y\n"],  # trailing sep -> '' segment
        }
    )
    out = (
        paragraph_dedup(df, num_hash_buckets=3, num_doc_buckets=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 10: NULL -> [''] keeps the first '' corpus-wide
    # doc 11: ['x',''] -> '' already seen -> "x"
    # doc 12: ['y',''] -> "y"
    assert out["text"].tolist() == ["", "x", "y"]
    assert out["n_dropped"].tolist() == [0, 1, 1]


def test_domain_boilerplate_removal_basic(ray_session):
    from data_validator_ray.pipelines.dedup import domain_boilerplate_removal

    # "footer" recurs in 3 docs of domain a -> ALL occurrences drop
    # (incl. doc 1's); same line in domain b is below threshold there
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "source": ["a", "a", "a", "b", "b"],
            "text": [
                "body1\nfooter",
                "footer\nbody2",
                "body3\nfooter\nmore",
                "footer\nother",
                "solo",
            ],
        }
    )
    out = (
        domain_boilerplate_removal(
            df, min_docs=3, num_hash_buckets=4, num_doc_buckets=2
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == [
        "body1", "body2", "body3\nmore", "footer\nother", "solo",
    ]
    assert out["n_dropped"].tolist() == [1, 1, 1, 0, 0]


def test_domain_boilerplate_removal_min_frac(ray_session):
    from data_validator_ray.pipelines.dedup import domain_boilerplate_removal

    # domain a has 4 docs: frac 0.75 -> threshold ceil(3) docs;
    # domain b has 2 docs: ceil(1.5)=2 -> its shared line drops too
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "source": ["a"] * 4 + ["b"] * 2,
            "text": [
                "nav\nx1", "nav\nx2", "nav\nx3", "x4",
                "promo\ny1", "promo\ny2",
            ],
        }
    )
    out = (
        domain_boilerplate_removal(
            df, min_docs=1, min_frac=0.75,
            num_hash_buckets=4, num_doc_buckets=2,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # 'nav' in 3/4 of a (>= ceil(0.75*4)=3): drops; x1..x4 are 1/4
    # each (< 3): stay. 'promo' in 2/2 of b (>= ceil(0.75*2)=2): drops.
    assert out["text"].tolist() == ["x1", "x2", "x3", "x4", "y1", "y2"]
    assert out["n_dropped"].tolist() == [1, 1, 1, 0, 1, 1]


def test_domain_boilerplate_removal_validation(ray_session):
    import pytest

    from data_validator_ray.pipelines.dedup import domain_boilerplate_removal

    df = pd.DataFrame(
        {"doc_id": [1], "source": ["a"], "text": ["x"]}
    )
    with pytest.raises(ValueError, match="min_docs"):
        domain_boilerplate_removal(df, min_docs=0)
    with pytest.raises(ValueError, match="min_frac"):
        domain_boilerplate_removal(df, min_frac=1.5)


def test_paragraph_dedup_layout_independent(ray_session):
    from data_validator_ray.pipelines.dedup import paragraph_dedup

    rng = np.random.default_rng(11)
    segs = [f"s{i}" for i in range(20)]
    texts = [
        "\n".join(rng.choice(segs, size=rng.integers(1, 6)))
        for _ in range(60)
    ]
    df = pd.DataFrame({"doc_id": range(60), "text": texts})
    a = (
        paragraph_dedup(df, num_hash_buckets=2, num_doc_buckets=2, batch_size=7)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        paragraph_dedup(df, num_hash_buckets=17, num_doc_buckets=5, batch_size=64)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_levenshtein_bytes_kernel():
    """Byte-edit semantics (non-ASCII substitution costs its UTF-8
    byte length — DuckDB parity), empties, and asymmetric lengths."""
    import numpy as np

    from data_validator_ray.pipelines.dedup import _levenshtein_bytes

    a = ["kitten", "", "abc", "héllo", "same"]
    b = ["sitting", "ab", "", "hello", "same"]
    got = _levenshtein_bytes(a, b)
    # héllo vs hello: é (2 bytes) -> e (1 byte) = 1 sub + 1 del = 2
    assert got.tolist() == [3, 2, 3, 2, 0]


def test_fuzzy_dup_pairs_blocking(ray_session):
    """Pairs only form inside a (block, prefix) block; the distance
    gate applies to the cmp window; max_group drops degenerate
    blocks."""
    import pandas as pd

    from data_validator_ray.pipelines.dedup import fuzzy_dup_pairs

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "lang": ["en", "en", "en", "fr", "en", None],
            "text": [
                "prefix match body one",
                "prefix match body two",     # pair with 1: dist 3
                "prefix match xxxxxxxxxxxx",  # dist to 1/2 > 8
                "prefix match body one",      # other lang: no pair
                "different prefix entirely",
                "prefix match body one",      # NULL lang drops
            ],
        }
    )
    out = (
        fuzzy_dup_pairs(docs, "doc_id", "text", ["lang"],
                        prefix_len=12, cmp_len=48, max_dist=8)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert out[["id_a", "id_b"]].values.tolist() == [[1, 2]]
    assert int(out.dist[0]) == 3
    capped = fuzzy_dup_pairs(
        docs, "doc_id", "text", ["lang"],
        prefix_len=12, cmp_len=48, max_dist=8, max_group=2,
    ).to_pandas()
    assert len(capped) == 0  # the en/'prefix match' block has 3 docs


def test_ppjoin_matches_exact_pipeline(ray_session):
    """Prefix filtering is lossless: PPJoin output equals the
    all-shingle exact pipeline on a corpus with planted near-dups,
    exact dups, and unrelated docs."""
    import pandas as pd

    from data_validator_ray.pipelines.dedup import (
        ngram_jaccard_pairs,
        ppjoin_jaccard_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 3
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                base,
                base,                                  # exact dup of 1
                base.replace("lazy", "sleepy", 1),     # near dup
                "completely different text with no shared shingles at all",
                "another unrelated document about something else entirely",
            ],
        }
    )
    a = ppjoin_jaccard_pairs(docs, threshold=0.5, num_buckets=8)
    b = ngram_jaccard_pairs(docs, threshold=0.5, num_buckets=8)
    assert a.equals(b)
    assert {(1, 2), (1, 3), (2, 3)} <= set(
        zip(a.id_a.tolist(), a.id_b.tolist())
    )


def test_containment_catches_quotes(ray_session):
    """A short doc fully contained in a long one scores containment
    1.0 even when Jaccard is small."""
    import pandas as pd

    from data_validator_ray.pipelines.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long_ = short + " " + " ".join(f"tok{i}" for i in range(60))
    docs = pd.DataFrame(
        {"doc_id": [1, 2], "text": [short, long_]}
    )
    c = containment_pairs(docs, threshold=0.9, num_buckets=8)
    assert c[["id_a", "id_b"]].values.tolist() == [[1, 2]]
    assert c.containment[0] == 1.0
    j = ngram_jaccard_pairs(docs, threshold=0.9, num_buckets=8)
    assert len(j) == 0  # Jaccard misses the quote


def test_exact_dedup_keep_last(ray_session):
    import pandas as pd

    import data_validator_ray.pipelines.dedup as D

    df = pd.DataFrame(
        {
            "k": ["a", "a", "b", "b", "b"],
            "id": [3, 7, 1, 9, 5],
            "payload": ["x3", "x7", "x1", "x9", "x5"],
        }
    )
    out = (
        D.exact_dedup(ray.data.from_pandas(df), "k", tiebreak="id", keep="last")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["id"].tolist() == [7, 9]
    assert out["payload"].tolist() == ["x7", "x9"]
    # batch-size invariance: local max-combine must agree with the
    # bucket reduce
    src = ray.data.from_pandas(df).repartition(5)
    out2 = (
        D.exact_dedup(src, "k", tiebreak="id", keep="last")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_exact_dedup_keep_validation():
    import pandas as pd
    import pytest

    import data_validator_ray.pipelines.dedup as D

    with pytest.raises(ValueError, match="keep"):
        D.exact_dedup(pd.DataFrame({"k": [1]}), "k", keep="newest")


def test_domain_boilerplate_modes_agree(ray_session):
    import pandas as pd

    from data_validator_ray.pipelines.dedup import domain_boilerplate_removal

    rng_texts = [
        "nav\nbody%d\nfooter" % i for i in range(8)
    ] + ["footer\nonly", "solo\nnav"]
    df = pd.DataFrame(
        {
            "doc_id": range(10),
            "source": ["a"] * 5 + ["b"] * 5,
            "text": rng_texts,
        }
    )
    kw = dict(min_docs=3, num_hash_buckets=4, num_doc_buckets=2)
    out_b = (
        domain_boilerplate_removal(df, mode="broadcast", **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out_s = (
        domain_boilerplate_removal(df, mode="shuffle", **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out_b, out_s)
    # auto with a tiny broadcast cap routes to the shuffle tier
    out_a = (
        domain_boilerplate_removal(
            df, mode="auto", max_broadcast_segments=0, **kw
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out_b, out_a)
