"""Similarity search + text-analysis operators."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from data_validator_ray.pipelines import similarity as S
from data_validator_ray.pipelines import text as T


@pytest.fixture(scope="module")
def vec_df():
    rng = np.random.default_rng(3)
    M = rng.normal(size=(100, 16))
    return pd.DataFrame(
        {
            "vec_id": np.arange(100),
            "embedding": [r.astype(np.float32).tolist() for r in M],
        }
    ), M


def _truth_topk(M, qidx, k):
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = Mn[qidx] @ Mn.T
    out = {}
    for qi, q in enumerate(qidx):
        s = sims[qi].copy()
        s[q] = -np.inf
        order = np.lexsort((np.arange(len(s)), -s))  # score desc, id asc
        out[q] = list(order[:k])
    return out


def test_knn_brute_matches_numpy_truth(ray_session, vec_df):
    df, M = vec_df
    qidx = [0, 1, 2]
    got = S.knn_brute(
        ray.data.from_pandas(df), M[qidx], np.array(qidx), k=5, batch_size=17
    )
    truth = _truth_topk(M, qidx, 5)
    for q in qidx:
        mine = got[got.query_id == q].sort_values("rank").neighbor_id.tolist()
        assert mine == truth[q], f"query {q}"


def test_knn_brute_partial_topk_small_batches(ray_session, vec_df):
    """Per-batch top-k + driver merge must equal single-batch result."""
    df, M = vec_df
    a = S.knn_brute(ray.data.from_pandas(df), M[:2], np.arange(2), k=7, batch_size=512)
    b = S.knn_brute(ray.data.from_pandas(df), M[:2], np.arange(2), k=7, batch_size=9)
    assert a[["query_id", "rank", "neighbor_id"]].equals(
        b[["query_id", "rank", "neighbor_id"]]
    )


def test_knn_ivf_reasonable_recall(ray_session, vec_df):
    df, M = vec_df
    qidx = [0, 1, 2, 3, 4]
    brute = S.knn_brute(ray.data.from_pandas(df), M[qidx], np.array(qidx), k=10)
    ivf = S.knn_ivf(
        ray.data.from_pandas(df), M[qidx], np.array(qidx), k=10,
        n_centroids=8, nprobe=4,
    )
    recalls = []
    for q in qidx:
        a = set(brute[brute.query_id == q].neighbor_id)
        b = set(ivf[ivf.query_id == q].neighbor_id)
        recalls.append(len(a & b) / len(a))
    assert np.mean(recalls) >= 0.4  # probing half the buckets on random data


def test_knn_graph_exact_matches_numpy_truth(ray_session, vec_df):
    """The block-pair self-join graph equals per-row brute force, under
    tiny batches (replication crosses batch bounds) and any block
    count."""
    df, M = vec_df
    truth = _truth_topk(M, list(range(100)), 5)
    for n_blocks in (1, 4):
        got = (
            S.knn_graph_exact(
                ray.data.from_pandas(df), k=5,
                n_blocks=n_blocks, batch_size=17,
            )
            .to_pandas()
            .sort_values(["query_id", "rank"])
        )
        assert len(got) == 100 * 5
        for q in range(100):
            mine = got[got.query_id == q].neighbor_id.tolist()
            assert mine == truth[q], f"query {q} blocks {n_blocks}"


def test_knn_graph_clustered_recall_and_probe_repair(ray_session, vec_df):
    """The cluster-bucketed approximate graph keeps decent top-5 recall
    vs the exact graph, multi-probe never hurts recall, every row is
    scored exactly once, and the result is deterministic."""
    df, M = vec_df
    truth = _truth_topk(M, list(range(100)), 5)

    def recall(out):
        hit = tot = 0
        for q in range(100):
            mine = set(out[out.query_id == q].neighbor_id.tolist())
            hit += len(mine & set(truth[q]))
            tot += 5
        return hit / tot

    outs = {}
    for probes in (1, 2):
        out = (
            S.knn_graph_clustered(
                ray.data.from_pandas(df), k=5, n_clusters=4,
                probes=probes, batch_size=17,
            )
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        assert out.query_id.nunique() == 100  # every row got neighbors
        outs[probes] = out
    r1, r2 = recall(outs[1]), recall(outs[2])
    assert r2 >= r1  # probe repair never hurts
    assert r2 >= 0.6, (r1, r2)
    again = (
        S.knn_graph_clustered(
            ray.data.from_pandas(df), k=5, n_clusters=4,
            probes=2, batch_size=64,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(outs[2], again)


def test_ivf_centroids_deterministic(ray_session, vec_df):
    df, _ = vec_df
    c1 = S.train_ivf_centroids(ray.data.from_pandas(df), n_centroids=8)
    c2 = S.train_ivf_centroids(ray.data.from_pandas(df), n_centroids=8)
    assert np.array_equal(c1, c2)


# --------------------------------------------------------------------------- #
# text analysis                                                               #
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def docs_df():
    return pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "the cat and the dog",
                "der hund und die katze ist ein tier",
                "",
                "x " * 100,
            ],
        }
    )


def test_quality_stats_counts(ray_session, docs_df):
    out = (
        T.quality_stats(ray.data.from_pandas(docs_df))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "n_tokens"] == 5
    assert out.loc[0, "n_stopwords"] == 3  # the, and, the
    assert out.loc[0, "n_unique_tokens"] == 4  # the cat and dog
    assert out.loc[2, "n_tokens"] == 0
    assert out.loc[3, "n_tokens"] == 100
    assert out.loc[3, "n_unique_tokens"] == 1


def test_language_id_detects(ray_session, docs_df):
    out = (
        T.language_id(ray.data.from_pandas(docs_df))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "detected_lang"] == "en"
    assert out.loc[1, "detected_lang"] == "de"
    # zero hits everywhere → alphabetical tie-break ('de' first)
    assert out.loc[2, "detected_lang"] == "de"
    assert out.loc[0, "hits_en"] == 3


def test_fingerprint_md5_normalization(ray_session):
    df = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["Hello  World", "hello world", "different"]}
    )
    out = (
        T.fingerprint_md5(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # case + whitespace normalize to the same fingerprint
    assert out.loc[0, "fingerprint"] == out.loc[1, "fingerprint"]
    assert out.loc[0, "fingerprint"] != out.loc[2, "fingerprint"]
    import hashlib

    assert out.loc[2, "fingerprint"] == hashlib.md5(b"different").hexdigest()


def test_winnow_fingerprints_properties(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["abcdefghijklmnop", "abcdefghijklmnop", "zyxwvutsrqponmlk"],
        }
    )
    out = (
        T.winnow_fingerprints(ray.data.from_pandas(df), k=5, window=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # identical docs → identical digests; different docs → different
    assert out.loc[0, "fingerprint_xor"] == out.loc[1, "fingerprint_xor"]
    assert out.loc[0, "n_fingerprints"] == out.loc[1, "n_fingerprints"]
    assert out.loc[0, "fingerprint_xor"] != out.loc[2, "fingerprint_xor"]


def test_quality_score_range(ray_session, docs_df):
    out = T.quality_score(ray.data.from_pandas(docs_df)).to_pandas()
    assert ((out.quality >= 0) & (out.quality <= 1)).all()


def test_ivf_prunes_storage_and_matches_masked_reference(ray_session, vec_df, tmp_path):
    """Round-2 IVF: (a) the index is a hive-partitioned cluster layout;
    (b) results equal a numpy reference that scores ONLY probed
    clusters; (c) deleting every unprobed cluster directory does not
    change the answer — proof the pruned read never touches them."""
    import shutil

    df, M = vec_df
    qidx = [0, 1, 2]
    idx_dir = tmp_path / "ivf"
    C = S.build_ivf_index(
        ray.data.from_pandas(df), idx_dir, n_centroids=8
    )
    cluster_dirs = sorted(p.name for p in idx_dir.glob("cluster=*"))
    assert cluster_dirs and all(d.startswith("cluster=") for d in cluster_dirs)

    ivf = S.knn_ivf(
        ray.data.from_pandas(df), M[qidx], np.array(qidx), k=5,
        n_centroids=8, nprobe=3, index_dir=idx_dir,
    )

    # numpy reference: mask vectors outside each query's probed clusters
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    assign = np.argmax(Mn @ C.T, axis=1)
    probe = np.argsort(-(Mn[qidx] @ C.T), axis=1)[:, :3]
    for row, q in enumerate(qidx):
        sims = Mn[q] @ Mn.T
        sims[q] = -np.inf
        sims[~np.isin(assign, probe[row])] = -np.inf
        order = np.lexsort((np.arange(len(sims)), -sims))
        want = [i for i in order if np.isfinite(sims[i])][:5]
        got = ivf[ivf.query_id == q].sort_values("rank").neighbor_id.tolist()
        assert got == want, f"query {q}"

    # delete unprobed cluster dirs → same result (they are never read)
    probed = set(probe.reshape(-1).tolist())
    for p in idx_dir.glob("cluster=*"):
        if int(p.name.split("=")[1]) not in probed:
            shutil.rmtree(p)
    ivf2 = S.knn_ivf(
        ray.data.from_pandas(df), M[qidx], np.array(qidx), k=5,
        n_centroids=8, nprobe=3, index_dir=idx_dir,
    )
    assert ivf[["query_id", "rank", "neighbor_id"]].equals(
        ivf2[["query_id", "rank", "neighbor_id"]]
    )


def test_winnow_vectorized_byte_identical_to_per_doc(ray_session):
    """The round-2 flat-array winnow must be byte-identical to the
    per-document formulation on a fuzz corpus (unicode, empties, nulls,
    short docs, sub-window docs)."""

    def reference(texts, k=5, window=4):
        rows = []
        for t in texts:
            t = t or ""
            if len(t) < k:
                rows.append((0, 0))
                continue
            grams = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            gv = np.lib.stride_tricks.sliding_window_view(grams, k).astype(np.uint64)
            h = np.zeros(len(gv), np.uint64)
            for c in range(k):
                h = h * np.uint64(1099511628211) + gv[:, c]
            if len(h) < window:
                mins = np.array([h.min()], np.uint64)
            else:
                mins = np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
            uniq = np.unique(mins)
            rows.append((len(uniq), int(np.bitwise_xor.reduce(uniq))))
        return rows

    rng = np.random.default_rng(0)
    texts = []
    for i in range(120):
        c = i % 6
        if c == 0:
            texts.append("")
        elif c == 1:
            texts.append("ab")
        elif c == 2:
            texts.append("héllo wörld ünïcode ß 北京 txt" * int(rng.integers(1, 4)))
        elif c == 3:
            texts.append(None)
        elif c == 4:
            texts.append("aaaaa")
        else:
            texts.append(
                " ".join(rng.choice([f"w{j}" for j in range(50)],
                                    size=int(rng.integers(1, 60))))
            )
    df = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": pd.array(texts, dtype="string")}
    )
    out = (
        T.winnow_fingerprints(ray.data.from_pandas(df), k=5, window=4, batch_size=37)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, (nfp, xr) in enumerate(reference(texts)):
        assert out.loc[i, "n_fingerprints"] == nfp, i
        assert int(out.loc[i, "fingerprint_xor"]) == xr, i


def test_text_profile_fused_equals_separate_ops(ray_session, docs_df):
    p = (
        T.text_profile(ray.data.from_pandas(docs_df))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    q = (
        T.quality_stats(ray.data.from_pandas(docs_df))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    l = (
        T.language_id(ray.data.from_pandas(docs_df))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    f = (
        T.fingerprint_md5(ray.data.from_pandas(docs_df))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for c in ("n_chars", "n_tokens", "n_stopwords", "n_unique_tokens"):
        assert p[c].tolist() == q[c].tolist(), c
    for c in [f"hits_{x}" for x in T.LANGS] + ["detected_lang"]:
        assert p[c].tolist() == l[c].tolist(), c
    assert p.fingerprint.tolist() == f.fingerprint.tolist()


def test_token_doc_freq(ray_session):
    import pyarrow as pa
    from data_validator_ray.pipelines.text import token_doc_freq

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "apple banana apple",   # distinct-per-doc: apple counts ONCE
            "banana cherry",
            "apple  cherry",        # double space → empties dropped
        ]),
    })
    out = token_doc_freq(tbl).to_pandas().sort_values("token")
    assert dict(zip(out["token"], out["df"])) == {
        "apple": 2, "banana": 2, "cherry": 2,
    }
    out2 = token_doc_freq(tbl, min_df=3).to_pandas()
    assert len(out2) == 0


def test_top_ngrams_exact(ray_session):
    import pyarrow as pa
    from data_validator_ray.pipelines.text import top_ngrams

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "a b a b c",        # "a b" x2, "b a" x1, "b c" x1
            "a b",              # "a b" x1 — no cross-doc "c a"!
            "x",                # too short for a bigram
        ]),
    })
    out = top_ngrams(tbl, n=2, k=10).to_pandas()
    assert out["ngram"].tolist() == ["a b", "b a", "b c"]
    assert out["n"].tolist() == [3, 1, 1]
    # trigram + tie-break by text asc among count ties
    out3 = top_ngrams(tbl, n=3, k=10).to_pandas()
    # doc0 trigrams: "a b a", "b a b", "a b c" — ties order by text asc
    assert out3["ngram"].tolist() == ["a b a", "a b c", "b a b"]
    assert out3["n"].tolist() == [1, 1, 1]


def test_top_ngrams_no_cross_doc(ray_session):
    import pyarrow as pa
    from data_validator_ray.pipelines.text import top_ngrams

    tbl = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["p q", "r s"]),
    })
    out = top_ngrams(tbl, n=2, k=10).to_pandas()
    # "q r" must NOT appear (doc boundary)
    assert set(out["ngram"]) == {"p q", "r s"}


def test_top_ngrams_capacity_keeps_heavy_hitter(ray_session):
    import pyarrow as pa
    from data_validator_ray.pipelines.text import top_ngrams

    texts = ["the cat " * 50] * 4 + [f"u{i} v{i}" for i in range(40)]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    out = top_ngrams(tbl, n=2, k=3, capacity=8).to_pandas()
    assert out["ngram"].iloc[0] in {"the cat", "cat the"}
    exact = top_ngrams(tbl, n=2, k=3).to_pandas()
    # capped counts are lower bounds of the exact ones
    m = dict(zip(exact["ngram"], exact["n"]))
    for ng, c in zip(out["ngram"], out["n"]):
        assert c <= m[ng]


def test_compression_stats(ray_session):
    import zlib

    import pyarrow as pa
    from data_validator_ray.pipelines.text import compression_stats

    texts = ["spam " * 200, "the quick brown fox", None, ""]
    tbl = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = compression_stats(tbl).to_pandas().sort_values("doc_id")
    assert out["raw_len"].tolist() == [1000, 19, 0, 0]
    assert out["compressed_len"].tolist() == [
        len(zlib.compress(("spam " * 200).encode(), 6)),
        len(zlib.compress(b"the quick brown fox", 6)),
        len(zlib.compress(b"", 6)),
        len(zlib.compress(b"", 6)),
    ]
    # the repetitive doc compresses an order of magnitude better
    assert out["compressed_len"].iloc[0] * 10 < out["raw_len"].iloc[0]


def test_embedding_covariance_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd

    from data_validator_ray.pipelines.similarity import embedding_covariance

    rng = np.random.default_rng(13)
    M = rng.normal(size=(500, 8))
    df = pd.DataFrame(
        {"vec_id": range(500), "embedding": [list(r) for r in M]}
    )
    mean, cov, n = embedding_covariance(df, batch_size=64)
    assert n == 500
    assert np.allclose(mean, M.mean(axis=0))
    assert np.allclose(cov, np.cov(M, rowvar=False), atol=1e-9)


def test_embedding_covariance_empty(ray_session):
    import pandas as pd

    from data_validator_ray.pipelines.similarity import embedding_covariance

    df = pd.DataFrame({"vec_id": [], "embedding": []})
    mean, cov, n = embedding_covariance(df)
    assert n == 0 and mean.size == 0


def test_pca_project_recovers_planted_axes(ray_session):
    import numpy as np
    import pandas as pd

    from data_validator_ray.pipelines.similarity import pca_project

    rng = np.random.default_rng(3)
    # variance concentrated on two planted orthogonal directions
    base = rng.normal(size=(600, 6)) * 0.05
    base[:, 1] += rng.normal(scale=3.0, size=600)
    base[:, 4] += rng.normal(scale=1.5, size=600)
    df = pd.DataFrame(
        {"vec_id": range(600), "embedding": [list(r) for r in base]}
    )
    ds, comps, evar = pca_project(df, 2, batch_size=100)
    assert comps.shape == (2, 6)
    assert evar[0] >= evar[1] > 0
    # top components align with the planted axes (up to tiny mixing)
    assert abs(comps[0][1]) > 0.99 and abs(comps[1][4]) > 0.99
    # sign fix: the dominant coefficient is positive
    assert comps[0][np.abs(comps[0]).argmax()] > 0
    out = ds.to_pandas()
    P = np.stack(out.sort_values("vec_id")["pca"].to_numpy())
    # projection variance matches eigenvalues
    assert np.allclose(P.var(axis=0, ddof=1), evar, rtol=1e-6)


def test_tfidf_top_terms_hand_checked(ray_session):
    import pyarrow as pa

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "apple apple banana",
                "banana cherry",
                "apple cherry cherry cherry",
                "",
            ],
        }
    )
    out = (
        T.tfidf_top_terms(pa.Table.from_pandas(df), k=2, num_buckets=4)
        .to_pandas()
        .sort_values(["doc_id", "score", "token"],
                     ascending=[True, False, True])
        .reset_index(drop=True)
    )
    n = 4.0
    import math
    idf = lambda dfc: math.log((n + 1) / (dfc + 1))
    # doc 1: apple tf=2 df=2, banana tf=1 df=2
    d1 = out[out.doc_id == 1]
    assert d1.token.tolist() == ["apple", "banana"]
    assert d1.score.tolist() == [round(2 * idf(2), 6), round(1 * idf(2), 6)]
    # doc 2: banana/cherry both tf=1 df=2 → tie broken alphabetically
    d2 = out[out.doc_id == 2]
    assert d2.token.tolist() == ["banana", "cherry"]
    # doc 4 empty → no rows
    assert (out.doc_id == 4).sum() == 0
    # layout invariance: tiny batches, different bucket count
    out2 = (
        T.tfidf_top_terms(
            ray.data.from_pandas(df), k=2, num_buckets=7, batch_size=1
        )
        .to_pandas()
        .sort_values(["doc_id", "score", "token"],
                     ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_normalize_text_unicode_parity_with_duckdb(ray_session):
    import duckdb
    import pyarrow as pa

    texts = [
        "Hello   WORLD\t\nfoo",
        "  Ümläute ÉTÉ Straße  ",
        "e\u0301te\u0301 combining",  # NFD é → NFC
        "ΣΊΣΥΦΟΣ greek FINAL sigma ς",
        "\u00a0nbsp is not RE2 \\s\u00a0",
        None,
        "",
        "ﬁ ligature ǅungla titlecase",
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = (
        T.normalize_text(tbl)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = con.execute(
        "SELECT doc_id, trim(regexp_replace(lower(nfc_normalize("
        "coalesce(text, ''))), '[ \\t\\n\\r\\f\\v]+', ' ', 'g'), ' ')"
        " AS norm_text FROM tbl ORDER BY doc_id"
    ).df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_inverted_index_boolean_search(ray_session, tmp_path):
    """Postings are per-doc distinct; AND needs every term, OR any;
    unknown terms return empty (with a stable Dataset schema); only
    the terms' shards are read."""
    import pandas as pd

    from data_validator_ray.pipelines.search import (
        boolean_search,
        build_inverted_index,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "alpha beta gamma",
                "alpha alpha beta",   # repeated token: ONE posting
                "beta delta",
                None,                  # null text drops
            ],
        }
    )
    idx = str(tmp_path / "inv")
    build_inverted_index(docs, idx, num_shards=4)
    both = boolean_search(idx, ["alpha", "beta"], mode="and").to_pandas()
    assert sorted(both.doc_id.tolist()) == [1, 2]
    any_ = boolean_search(idx, ["gamma", "delta"], mode="or").to_pandas()
    assert sorted(any_.doc_id.tolist()) == [1, 3]
    none = boolean_search(idx, ["nosuch"], mode="and")
    assert none.count() == 0
    assert "doc_id" in none.schema().names


def test_bm25_search_ranking(ray_session, tmp_path):
    """Rarer terms outweigh common ones; repeated tf saturates under
    k1; doc-length normalization penalizes long docs; deterministic
    doc-id tiebreak."""
    import pandas as pd

    from data_validator_ray.pipelines.search import (
        bm25_search,
        build_inverted_index,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "rare common common filler filler filler filler filler",
                "rare common",          # short doc: wins length norm
                "common common common",
                "unrelated tokens only",
            ],
        }
    )
    idx = str(tmp_path / "bm")
    build_inverted_index(docs, idx, num_shards=4)
    out = bm25_search(idx, ["rare", "common"], k=3)
    # docs 1 and 2 contain 'rare' (df=2) which out-idfs 'common'
    # (df=3); doc 2 is far shorter -> highest score
    assert out.doc_id.tolist()[0] == 2
    assert set(out.doc_id.tolist()) == {1, 2, 3}
    assert (out.score.to_numpy()[:-1] >= out.score.to_numpy()[1:]).all()


def test_quantize_embeddings_audit(ray_session):
    """Constant vectors quantize losslessly; a linear ramp's MSE is
    bounded by scale²/4; half-up rounding is deterministic."""
    import numpy as np
    import pandas as pd

    from data_validator_ray.pipelines.similarity import (
        quantize_embeddings,
    )

    vecs = pd.DataFrame(
        {
            "vec_id": [1, 2],
            "embedding": [
                [1.5] * 8,                       # constant
                list(np.linspace(0.0, 2.55, 8)),  # ramp
            ],
        }
    )
    out = (
        quantize_embeddings(vecs).to_pandas().set_index("vec_id")
    )
    assert out.loc[1, "scale"] == 0.0 and out.loc[1, "mse"] == 0.0
    assert out.loc[2, "vmin"] == 0.0 and out.loc[2, "vmax"] == 2.55
    sc = out.loc[2, "scale"]
    assert out.loc[2, "mse"] <= sc * sc / 4


def test_embedding_norms_zero_and_null(ray_session):
    """Zero vectors flag is_zero, NULL embeddings yield NULL norm and
    never misalign the flattened matrix extraction."""
    df = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3],
            "embedding": [
                [3.0, 4.0],          # norm 5
                [0.0, 0.0],          # zero vector
                None,                # NULL embedding
                [1.0, 0.0],
            ],
        }
    )
    out = (
        S.embedding_norms(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert out.l2_norm[0] == 5.0 and not out.is_zero[0]
    assert out.l2_norm[1] == 0.0 and out.is_zero[1]
    assert np.isnan(out.l2_norm[2]) and not out.is_zero[2]
    assert out.l2_norm[3] == 1.0


def test_embedding_mean_drift_planted(ray_session):
    """Identical corpora give cosine 1 / distance 0; a shifted corpus
    shows the exact mean offset; NULL embeddings drop."""
    rng = np.random.default_rng(21)
    M = rng.normal(0, 1, (60, 8))
    a = pd.DataFrame({"embedding": [list(r) for r in M]})
    same = S.embedding_mean_drift(
        ray.data.from_pandas(a), ray.data.from_pandas(a.copy())
    ).iloc[0]
    assert same.mean_cosine == 1.0 and same.mean_l2_dist == 0.0
    assert same.n_a == 60 and same.n_b == 60

    b = pd.DataFrame({"embedding": [list(r) for r in M + np.array([3.0] + [0.0] * 7)]})
    b.loc[0, "embedding"] = None
    d = S.embedding_mean_drift(
        ray.data.from_pandas(a), ray.data.from_pandas(b)
    ).iloc[0]
    assert d.n_b == 59
    assert d.mean_l2_dist > 2.5  # dominated by the planted +3 shift


def test_knn_join_matches_numpy_truth(ray_session, vec_df):
    """Cross-table top-k join: numpy ground truth, block-count
    invariance, k > |right| truncation, and the exclude_same_id knob."""
    df, M = vec_df
    left = df[df.vec_id % 7 == 0].reset_index(drop=True)
    right = df[df.vec_id % 7 != 0].reset_index(drop=True)

    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    li = left.vec_id.to_numpy()
    ri = right.vec_id.to_numpy()
    sims = Mn[li] @ Mn[ri].T

    def truth(k):
        rows = []
        for qi, q in enumerate(li):
            order = np.lexsort((ri, -sims[qi]))
            for rank, j in enumerate(order[:k], 1):
                rows.append((q, rank, ri[j]))
        return pd.DataFrame(rows, columns=["query_id", "rank", "neighbor_id"])

    for n_blocks in (1, 4):
        got = (
            S.knn_join(
                ray.data.from_pandas(left), ray.data.from_pandas(right),
                k=5, n_blocks=n_blocks, num_buckets=4,
            )
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["query_id", "rank", "neighbor_id"]].astype("int64"),
            truth(5).astype("int64"),
        )

    # k > |right|: every query gets exactly |right| neighbors
    tiny = right.head(3)
    got = S.knn_join(
        ray.data.from_pandas(left), ray.data.from_pandas(tiny),
        k=10, n_blocks=4, num_buckets=4,
    ).to_pandas()
    assert (got.groupby("query_id")["rank"].max() == 3).all()
    assert len(got) == 3 * len(left)

    # shared id space: exclude_same_id drops the identity match
    self_joined = S.knn_join(
        ray.data.from_pandas(left), ray.data.from_pandas(left),
        k=1, n_blocks=2, num_buckets=4, exclude_same_id=True,
    ).to_pandas()
    assert (self_joined.query_id != self_joined.neighbor_id).all()
    kept = S.knn_join(
        ray.data.from_pandas(left), ray.data.from_pandas(left),
        k=1, n_blocks=2, num_buckets=4,
    ).to_pandas()
    # without exclusion the nearest neighbor of a vector is itself
    assert (kept.query_id == kept.neighbor_id).all()


def test_knn_join_ivf_fullprobe_equals_exact(ray_session, vec_df, tmp_path):
    """nprobe = n_centroids makes the IVF join tier EXACT — it must
    equal knn_join; a partial probe keeps high recall on this data."""
    df, M = vec_df
    left = df[df.vec_id % 7 == 0].reset_index(drop=True)
    right = df[df.vec_id % 7 != 0].reset_index(drop=True)

    exact = (
        S.knn_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            k=5, n_blocks=2, num_buckets=4,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    full = (
        S.knn_join_ivf(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            k=5, n_centroids=4, nprobe=4, concurrency=2,
            index_dir=str(tmp_path / "idx"),
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        full[["query_id", "rank", "neighbor_id"]],
        exact[["query_id", "rank", "neighbor_id"]],
    )

    part = (
        S.knn_join_ivf(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            k=5, n_centroids=4, nprobe=2, concurrency=2,
            index_dir=str(tmp_path / "idx"),  # reuse the built index
        )
        .to_pandas()
    )
    a = set(map(tuple, part[["query_id", "neighbor_id"]].to_numpy()))
    b = set(map(tuple, exact[["query_id", "neighbor_id"]].to_numpy()))
    recall = len(a & b) / len(b)
    assert recall >= 0.6, recall


def test_hybrid_search_rerank_and_empty(ray_session, tmp_path):
    """BM25 candidates rerank by cosine against the query vector
    (lexical rank is overridden by embedding similarity); docs outside
    the candidate set never appear; absent terms -> typed empty."""
    import numpy as np
    import pandas as pd

    from data_validator_ray.pipelines.search import (
        build_inverted_index,
        hybrid_search,
    )

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "query terms here plus filler filler filler",
                "query terms here",
                "query terms terms terms",
                "no match at all",
            ],
        }
    )
    # doc 4 is MOST similar in embedding space but not a BM25
    # candidate; among candidates, doc 3 is closest to the query.
    emb = pd.DataFrame(
        {
            "vec_id": [1, 2, 3, 4],
            "embedding": [
                [1.0, 0.0, 0.0],
                [0.8, 0.6, 0.0],
                [0.98, 0.199, 0.0],
                [1.0, 0.001, 0.0],
            ],
        }
    )
    idx = str(tmp_path / "hy")
    build_inverted_index(docs, idx, num_shards=4)
    out = hybrid_search(
        idx, ["query", "terms"], np.array([1.0, 0.0, 0.0]), emb,
        k_bm25=3, k=10,
    )
    assert list(out.columns) == ["rank", "doc_id"]
    assert out["doc_id"].tolist() == [1, 3, 2]  # cosine desc
    assert out["rank"].tolist() == [1, 2, 3]
    empty = hybrid_search(
        idx, ["zzz_absent"], np.array([1.0, 0.0, 0.0]), emb,
    )
    assert len(empty) == 0 and list(empty.columns) == ["rank", "doc_id"]
