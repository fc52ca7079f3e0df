"""Sketch correctness: merge-invariance and accuracy bounds."""

import numpy as np

from data_validator_ray.functions.sketches import (
    BloomFilter,
    HyperLogLog,
    TDigest,
    hash64,
)


def test_hash64_deterministic():
    a = hash64(["x", "y", None, "x"])
    b = hash64(["x", "y", None, "x"])
    assert (a == b).all()
    assert a[0] == a[3]
    assert a[0] != a[1]


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(42)
    raw = rng.integers(0, 1 << 60, size=50_000)
    true_distinct = len(np.unique(raw))
    vals = hash64(raw)  # HLL needs uniform 64-bit hashes, not raw values

    whole = HyperLogLog()
    whole.add_hashes(vals)
    est = whole.estimate()
    assert abs(est - true_distinct) / true_distinct < 0.03

    # merge of halves equals the whole (register-wise max is exact)
    h1, h2 = HyperLogLog(), HyperLogLog()
    h1.add_hashes(vals[:25_000])
    h2.add_hashes(vals[25_000:])
    merged = h1.merge(h2)
    assert merged.estimate() == est

    # serialization round trip
    assert HyperLogLog.from_bytes(whole.to_bytes()).estimate() == est


def test_hll_small_cardinality_linear_counting():
    h = HyperLogLog()
    vals = hash64([f"v{i}" for i in range(100)])
    h.add_hashes(vals)
    assert abs(h.estimate() - 100) <= 2


def test_tdigest_quantiles():
    rng = np.random.default_rng(7)
    data = rng.normal(100.0, 15.0, size=100_000)
    td = TDigest()
    for chunk in np.array_split(data, 37):
        td.add(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        exact = np.quantile(data, q)
        approx = td.quantile(q)
        assert abs(approx - exact) < 1.0, (q, exact, approx)


def test_tdigest_merge_close_to_whole():
    rng = np.random.default_rng(3)
    data = rng.exponential(5.0, size=40_000)
    whole = TDigest()
    whole.add(data)
    parts = [TDigest() for _ in range(8)]
    for i, chunk in enumerate(np.array_split(data, 8)):
        parts[i].add(chunk)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    for q in (0.1, 0.5, 0.9):
        assert abs(merged.quantile(q) - np.quantile(data, q)) < 0.25
    assert merged.n == whole.n
    assert merged.min == whole.min and merged.max == whole.max


def test_bloom_no_false_negatives():
    keys = hash64([f"key-{i}" for i in range(10_000)])
    others = hash64([f"other-{i}" for i in range(10_000)])
    bf = BloomFilter(n_bits=1 << 20, k=5)
    bf.add_hashes(keys)
    assert bf.contains_hashes(keys).all()  # zero false negatives, by construction
    fp = bf.contains_hashes(others).mean()
    assert fp < 0.01

    merged = BloomFilter(n_bits=1 << 20, k=5).merge(bf)
    assert merged.contains_hashes(keys).all()
    rt = BloomFilter.from_bytes(bf.to_bytes())
    assert rt.contains_hashes(keys).all()


def test_kmv_estimate_and_overlap_error_bounds():
    """Saturated KMV: distinct and Jaccard estimates within ~5/sqrt(k);
    unsaturated: exact. Merge order never changes the sketch."""
    import numpy as np

    from data_validator_ray.functions.sketches import KMV, hash64

    k = 1024
    # two overlapping integer key sets: |A|=50k, |B|=30k, |A∩B|=10k
    a_keys = np.arange(0, 50_000, dtype=np.int64)
    b_keys = np.arange(40_000, 70_000, dtype=np.int64)
    ha, hb = hash64(a_keys), hash64(b_keys)

    a = KMV(k); a.add_hashes(ha)
    b = KMV(k); b.add_hashes(hb)
    tol = 5 / np.sqrt(k)
    assert abs(a.estimate() - 50_000) / 50_000 < tol
    assert abs(b.estimate() - 30_000) / 30_000 < tol
    ov = KMV.overlap(a, b)
    true_j = 10_000 / 70_000
    assert abs(ov["jaccard"] - true_j) < tol
    assert abs(ov["union"] - 70_000) / 70_000 < tol

    # incremental adds == one-shot adds (mergeability/determinism)
    a2 = KMV(k)
    for chunk in np.array_split(ha, 7):
        a2.add_hashes(chunk)
    assert np.array_equal(a2.values, a.values)

    # unsaturated == exact
    s1 = KMV(k); s1.add_hashes(hash64(np.arange(100, dtype=np.int64)))
    s2 = KMV(k); s2.add_hashes(hash64(np.arange(50, 150, dtype=np.int64)))
    ov2 = KMV.overlap(s1, s2)
    assert s1.estimate() == 100 and ov2["union"] == 150
    assert ov2["intersection"] == 50 and ov2["jaccard"] == 50 / 150


def test_sketch_accuracy_report_bounds(ray_session):
    """The self-audit query: every sketch's measured error against its
    exact sibling stays inside its documented bound at sf0.001."""
    from data_validator_ray.pipelines.queries import (
        q_sketch_accuracy_report,
    )

    rep = q_sketch_accuracy_report("/root/testdata/sf0.001").set_index(
        "sketch"
    )
    assert rep.loc["hll_grouped_distinct"].max_rel_error <= 0.05
    assert rep.loc["tdigest_grouped_quantiles"].max_rel_error <= 0.05
    assert rep.loc["misra_gries_top1"].max_rel_error <= 0.05
    assert rep.loc["kmv_union"].max_rel_error <= 0.05
