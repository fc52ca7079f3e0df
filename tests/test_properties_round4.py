"""Property tests for round-4 pure kernels (hypothesis, no Ray):
the code-based token counters must equal their string-pair reference
on ARBITRARY token streams, and the key-index shard math must
partition the hash space exactly."""

import numpy as np
import polars as pl
from hypothesis import given, settings
from hypothesis import strategies as st

from data_validator_ray.pipelines.text import (
    _pair_counts,
    _row_distinct_counts,
    _token_codes,
    _vocab_hit_counts,
)

tokens = st.sampled_from(["a", "b", "c", "aa", "bb", "x y", ""])
docs = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "aa", "bb", "zz"]),
             min_size=0, max_size=12),
    min_size=1, max_size=10,
)


def _explode(doc_tokens):
    rows, toks = [], []
    for i, ts in enumerate(doc_tokens):
        rows.extend([i] * len(ts))
        toks.extend(ts)
    return pl.DataFrame(
        {"doc": pl.Series(rows, dtype=pl.Int64), "t": pl.Series(toks, dtype=pl.String)}
    )


def _ref_pair_counts(doc_tokens, n):
    n2 = np.zeros(n, np.int64)
    nu = np.zeros(n, np.int64)
    top = np.zeros(n, np.int64)
    for i, ts in enumerate(doc_tokens):
        pairs = list(zip(ts[:-1], ts[1:]))
        n2[i] = len(pairs)
        if pairs:
            from collections import Counter

            c = Counter(pairs)
            nu[i] = len(c)
            top[i] = max(c.values())
    return n2, nu, top


@settings(max_examples=200, deadline=None)
@given(docs)
def test_pair_counts_match_string_reference(doc_tokens):
    ex = _explode(doc_tokens)
    n = len(doc_tokens)
    r, c, vocab = _token_codes(ex)
    n2, nu, top = _pair_counts(r, c, len(vocab), n)
    e2, eu, etop = _ref_pair_counts(doc_tokens, n)
    assert (n2 == e2).all() and (nu == eu).all() and (top == etop).all()


@settings(max_examples=200, deadline=None)
@given(docs)
def test_distinct_and_hits_match_reference(doc_tokens):
    ex = _explode(doc_tokens)
    n = len(doc_tokens)
    r, c, vocab = _token_codes(ex)
    got = _row_distinct_counts(r, c, len(vocab), n)
    exp = np.array([len(set(ts)) for ts in doc_tokens], np.int64)
    assert (got == exp).all()

    wl = {"ab": ["a", "b"], "z": ["zz"]}
    hits = _vocab_hit_counts(r, c, vocab, n, wl)
    for name, words in wl.items():
        exp_h = np.array(
            [sum(t in words for t in ts) for ts in doc_tokens], np.int64
        )
        assert (hits[name] == exp_h).all()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(-(2 ** 63), 2 ** 63 - 1), min_size=1, max_size=64),
    st.sampled_from([2, 4, 8, 64, 1024]),
)
def test_shard_ids_partition_hash_space(h1s, n_shards):
    from data_validator_ray.state.key_index import _shard_ids

    h1 = np.array(h1s, np.int64)
    s = _shard_ids(h1, n_shards)
    assert ((s >= 0) & (s < n_shards)).all()
    # range sharding: top-k bits of the uint64 view, order-preserving
    k = n_shards.bit_length() - 1
    exp = (h1.view(np.uint64) >> np.uint64(64 - k)).astype(np.int64)
    assert (s == exp).all()
    u = h1.view(np.uint64)
    order = np.argsort(u)
    assert (np.diff(s[order]) >= 0).all()  # monotone in hash order


@given(
    hosts=st.lists(
        st.one_of(
            st.none(),
            st.builds(
                ".".join,
                st.lists(
                    st.sampled_from(["a", "b", "cc", "dd", "example", "com"]),
                    min_size=1,
                    max_size=5,
                ),
            ),
        ),
        max_size=40,
    ),
    blocked=st.sets(
        st.builds(
            ".".join,
            st.lists(
                st.sampled_from(["a", "b", "cc", "dd", "example", "com"]),
                min_size=1,
                max_size=3,
            ),
        ),
        max_size=8,
    ),
)
@settings(max_examples=200, deadline=None)
def test_host_suffix_match_vs_reference(hosts, blocked):
    import polars as pl
    import pyarrow as pa

    from data_validator_ray.pipelines.urls import host_suffix_match

    got = host_suffix_match(
        pa.array(hosts, pa.string()), pl.Series(sorted(blocked))
    )

    def ref(h):
        if h is None:
            return False
        return any(h == d or h.endswith("." + d) for d in blocked)

    expected = [ref(h) for h in hosts]
    assert got.tolist() == expected
