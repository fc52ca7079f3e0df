"""Unit tests for the curation tier (pipelines/curation.py): edge
cases the driver's sf0.01 oracle comparison doesn't reach — empty/null
text, repeated-2gram docs, symbol-heavy docs, crafted PII spans,
benchmark overlap, sampling-rate extremes, shard-budget boundaries and
the SemDeDup keep-first rule."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from data_validator_ray.pipelines.curation import (
    benchmark_shingles,
    decontaminate,
    domain_sample,
    gopher_filter,
    gopher_stats,
    pack_shards,
    pii_redact,
    semantic_dedup,
)


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


# --------------------------------------------------------------------- #
# gopher stats / filter                                                 #
# --------------------------------------------------------------------- #

def test_gopher_stats_edge_docs(ray_session):
    out = (
        gopher_stats(_docs([None, "", "one", "a b a b a b", "xx  yy"]))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [0, 0, 1, 6, 2]
    # "a b a b a b": 5 2-grams, 2 distinct ("a b" ×3, "b a" ×2)
    assert out["n_2grams"].tolist() == [0, 0, 0, 5, 1]
    assert out["n_unique_2grams"].tolist() == [0, 0, 0, 2, 1]
    assert out["top_2gram_count"].tolist() == [0, 0, 0, 3, 1]
    assert out["total_token_chars"].tolist() == [0, 0, 3, 6, 4]
    # double space: both spaces are in [a-z0-9 ] → 0 symbols
    assert out["n_symbol_chars"].tolist() == [0, 0, 0, 0, 0]


def test_gopher_stats_symbols(ray_session):
    out = gopher_stats(_docs(["a! b? #c$"])).to_pandas()
    assert out["n_symbol_chars"].tolist() == [4]
    # tokens keep their symbol chars: "a!" "b?" "#c$"
    assert out["total_token_chars"].tolist() == [7]


def test_gopher_filter_rules(ray_session):
    texts = [
        "the quick brown fox jumps over the lazy dog",   # keep
        "spam spam spam spam spam spam",                 # top-2gram > 20%
        "only four tokens here",                         # < 5 tokens
        "!!!! @@@@ #### $$$$ %%%% ^^^^",                 # symbol-heavy
        "a b c d e f g h",                               # mean len < 2
        "the quick brown fox jumps over lazy dogs fast", # keep
    ]
    kept = gopher_filter(_docs(texts)).to_pandas()["doc_id"].tolist()
    assert sorted(kept) == [0, 5]


# --------------------------------------------------------------------- #
# PII redaction                                                         #
# --------------------------------------------------------------------- #

def test_pii_redact_counts_and_text(ray_session):
    out = (
        pii_redact(_docs([
            "mail bob.smith@corp.example.org now",
            "call 555-0100 or 555-1234",
            "host 10.0.0.1 and 192.168.001.255 up",
            "mixed a@b.co 555-9999 1.2.3.4",
            "clean text with no pii at all",
            None,
        ]))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["n_email"].tolist() == [1, 0, 0, 1, 0, 0]
    assert out["n_phone"].tolist() == [0, 2, 0, 1, 0, 0]
    assert out["n_ip"].tolist() == [0, 0, 2, 1, 0, 0]
    assert out["redacted_text"].tolist() == [
        "mail <EMAIL> now",
        "call <PHONE> or <PHONE>",
        "host <IP> and <IP> up",
        "mixed <EMAIL> <PHONE> <IP>",
        "clean text with no pii at all",
        "",
    ]


def test_pii_phone_word_boundary(ray_session):
    # 1555-12345 must NOT match (\b on both sides)
    out = pii_redact(_docs(["x1555-12345y and 555-4321."]))\
        .to_pandas()
    assert out["n_phone"].tolist() == [1]
    assert out["redacted_text"].tolist() == ["x1555-12345y and <PHONE>."]


# --------------------------------------------------------------------- #
# decontamination                                                       #
# --------------------------------------------------------------------- #

def test_decontaminate_overlap(ray_session):
    bench = ["alpha beta gamma delta epsilon zeta"]
    corpus = _docs([
        "alpha beta gamma delta epsilon other",   # shares 1 distinct 5-gram
        "alpha beta gamma delta epsilon zeta eta",  # shares 2
        "totally unrelated words in this doc",    # 0
        "short doc",                              # <5 tokens → 0
    ])
    out = (
        decontaminate(corpus, bench, ngram=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["n_hits"].tolist() == [1, 2, 0, 0]
    assert out["is_contaminated"].tolist() == [True, True, False, False]


def test_benchmark_shingles_distinct_and_sorted():
    sh = benchmark_shingles(["a b c d e a b c d e", None], ngram=5)
    assert sh == sorted(set(sh))
    assert "a b c d e" in sh


# --------------------------------------------------------------------- #
# domain sampling                                                       #
# --------------------------------------------------------------------- #

def test_domain_sample_rates_and_determinism(ray_session):
    n = 2000
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array(["a" if i % 2 else "b" for i in range(n)]),
    })
    rates = {"a": 0, "b": 1000}
    out1 = domain_sample(tbl, rates).to_pandas().sort_values("doc_id")
    out2 = domain_sample(tbl, rates).to_pandas().sort_values("doc_id")
    # rate 0 drops everything; rate 1000 keeps everything
    assert set(out1["source"]) == {"b"}
    assert len(out1) == n // 2
    pd.testing.assert_frame_equal(
        out1.reset_index(drop=True), out2.reset_index(drop=True)
    )


def test_domain_sample_default_rate(ray_session):
    tbl = pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "source": pa.array(["unknown"] * 100),
    })
    out = domain_sample(tbl, {"x": 0}, default_permille=500).to_pandas()
    # deterministic Knuth-hash keep set, roughly half
    assert 30 < len(out) < 70
    h = (out["doc_id"].to_numpy(np.int64) * 2654435761) % 1000
    assert (h < 500).all()


# --------------------------------------------------------------------- #
# shard packing                                                         #
# --------------------------------------------------------------------- #

def test_pack_shards_matches_window_contract(ray_session):
    rng = np.random.default_rng(7)
    n = 500
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 40, n)]
    tbl = _docs(texts)
    out = (
        pack_shards(tbl, budget=100, num_buckets=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    ref_tokens = np.array([len(t.split()) for t in texts], np.int64)
    excl = np.concatenate([[0], np.cumsum(ref_tokens)[:-1]])
    assert out["n_tokens"].tolist() == ref_tokens.tolist()
    assert out["shard_id"].tolist() == (excl // 100).tolist()
    # shard ids are nondecreasing in doc order and start at 0
    assert out["shard_id"].iloc[0] == 0
    assert (np.diff(out["shard_id"].to_numpy()) >= 0).all()


def test_pack_shards_sparse_ids_cross_buckets(ray_session):
    # non-dense ids spread across many buckets
    ids = [3, 4096, 4097, 999999]
    tbl = _docs(["a b c", "d e", "f", "g h i j"], ids=ids)
    out = (
        pack_shards(tbl, budget=4, num_buckets=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # tokens 3,2,1,4 → exclusive prefix 0,3,5,6 → // 4 = 0,0,1,1
    assert out["shard_id"].tolist() == [0, 0, 1, 1]


# --------------------------------------------------------------------- #
# semantic dedup                                                        #
# --------------------------------------------------------------------- #

def _emb_table(vectors, ids=None):
    ids = ids if ids is not None else list(range(len(vectors)))
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(
            [list(map(float, v)) for v in vectors],
            pa.list_(pa.float32()),
        ),
    })


def test_semantic_dedup_keep_first(ray_session):
    # two identical pairs + two unique vectors
    v = [
        [1, 0, 0, 0], [1, 0, 0, 0],      # dup pair → keep vec_id 0
        [0, 1, 0, 0],
        [0, 0, 1, 0], [0, 0, 1.0001, 0], # cos ≈ 1 → keep vec_id 3
        [0, 0, 0, 1],
    ]
    out = (
        semantic_dedup(_emb_table(v), threshold=0.95, n_clusters=4)
        .to_pandas().sort_values("vec_id")
    )
    assert out["vec_id"].tolist() == [0, 2, 3, 5]


def test_semantic_dedup_threshold_spares_distinct(ray_session):
    # cos(v0,v1) ≈ 0.894 < 0.95 → both kept
    v = [[1, 0], [2, 1], [0, 1]]
    out = (
        semantic_dedup(_emb_table(v), threshold=0.95, n_clusters=1)
        .to_pandas().sort_values("vec_id")
    )
    assert out["vec_id"].tolist() == [0, 1, 2]


def test_semantic_dedup_deterministic(ray_session):
    rng = np.random.default_rng(3)
    V = rng.normal(size=(200, 8))
    a = semantic_dedup(_emb_table(V), threshold=0.8, n_clusters=4)\
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    b = semantic_dedup(_emb_table(V), threshold=0.8, n_clusters=4)\
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# --------------------------------------------------------------------- #
# fused profile                                                         #
# --------------------------------------------------------------------- #

def test_curation_profile_matches_standalone_ops(ray_session):
    from data_validator_ray.pipelines.curation import curation_profile

    texts = [
        "alpha beta gamma delta epsilon zeta",
        "mail a@b.co or call 555-0100 from 1.2.3.4 x y z",
        "spam spam spam spam spam",
        None,
        "alpha beta gamma delta epsilon other tail",
    ]
    bench = [texts[0]]
    tbl = _docs(texts)
    fused = (
        curation_profile(tbl, bench, ngram=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    g = gopher_stats(tbl).to_pandas().sort_values("doc_id").reset_index(drop=True)
    p = pii_redact(tbl).to_pandas().sort_values("doc_id").reset_index(drop=True)
    d = decontaminate(tbl, bench, ngram=5)\
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    for c in ["n_tokens", "n_2grams", "n_unique_2grams", "top_2gram_count",
              "total_token_chars", "n_symbol_chars"]:
        assert fused[c].tolist() == g[c].tolist(), c
    for c in ["n_email", "n_phone", "n_ip"]:
        assert fused[c].tolist() == p[c].tolist(), c
    for c in ["n_hits", "is_contaminated"]:
        assert fused[c].tolist() == d[c].tolist(), c


def test_curation_profile_empty_benchmark(ray_session):
    from data_validator_ray.pipelines.curation import curation_profile

    out = curation_profile(_docs(["a b c d e f"]), None).to_pandas()
    assert out["n_hits"].tolist() == [0]
    assert out["is_contaminated"].tolist() == [False]


def test_full_profile_matches_standalone_ops(ray_session):
    from data_validator_ray.pipelines.curation import full_profile
    from data_validator_ray.pipelines.text import (
        fingerprint_md5,
        language_id,
        quality_stats,
    )

    texts = [
        "alpha beta gamma delta epsilon zeta",
        "the cat and the dog mail a@b.co or call 555-0100 from 1.2.3.4",
        "spam spam spam spam spam",
        None,
        "",
        "der und die das alpha beta gamma delta epsilon tail",
        "  doubled  spaces\tand\ttabs  ",
    ]
    bench = [texts[0]]
    tbl = _docs(texts)
    fused = (
        full_profile(tbl, bench, ngram=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    q = quality_stats(tbl).to_pandas().sort_values("doc_id").reset_index(drop=True)
    l = language_id(tbl).to_pandas().sort_values("doc_id").reset_index(drop=True)
    f = fingerprint_md5(tbl).to_pandas().sort_values("doc_id").reset_index(drop=True)
    g = gopher_stats(tbl).to_pandas().sort_values("doc_id").reset_index(drop=True)
    p = pii_redact(tbl).to_pandas().sort_values("doc_id").reset_index(drop=True)
    d = decontaminate(tbl, bench, ngram=5)\
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    for c in ["n_chars", "n_stopwords", "n_unique_tokens"]:
        assert fused[c].tolist() == q[c].tolist(), c
    for c in [col for col in l.columns if col != "doc_id"]:
        assert fused[c].tolist() == l[c].tolist(), c
    assert fused["fingerprint"].tolist() == f["fingerprint"].tolist()
    for c in ["n_tokens", "n_2grams", "n_unique_2grams", "top_2gram_count",
              "total_token_chars", "n_symbol_chars"]:
        assert fused[c].tolist() == g[c].tolist(), c
    for c in ["n_email", "n_phone", "n_ip"]:
        assert fused[c].tolist() == p[c].tolist(), c
    for c in ["n_hits", "is_contaminated"]:
        assert fused[c].tolist() == d[c].tolist(), c
    # quality-tier n_tokens (same tokenization) agrees with the gopher one
    assert fused["n_tokens"].tolist() == q["n_tokens"].tolist()


def test_pack_shards_rides_on_profile_counts(ray_session):
    from data_validator_ray.pipelines.curation import pack_shards

    texts = ["a b c", "d e", "f g h i", "j", "k l m"]
    tbl = _docs(texts)
    direct = (
        pack_shards(tbl, budget=4, num_buckets=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    counts = gopher_stats(tbl)  # wider table; pack_shards selects cols
    fused = (
        pack_shards(None, budget=4, num_buckets=2, counts_source=counts)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(direct, fused)


def test_assign_splits_bands_and_remainder(ray_session):
    import pyarrow as pa
    import pytest as _pytest

    from data_validator_ray.pipelines.curation import KNUTH, assign_splits

    ids = list(range(200))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64())})
    out = (
        assign_splits(tbl, {"a": 500, "b": 200})
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    h = (np.array(ids, np.int64) * KNUTH) % 1000
    want = np.where(h < 500, "a", np.where(h < 700, "b", "a"))
    assert out["split"].tolist() == want.tolist()
    # default bands cover everything, deterministic across calls
    d1 = assign_splits(tbl).to_pandas().sort_values("doc_id")
    d2 = assign_splits(tbl).to_pandas().sort_values("doc_id")
    assert d1["split"].tolist() == d2["split"].tolist()
    assert set(d1["split"]) <= {"train", "val", "test"}
    with _pytest.raises(ValueError):
        assign_splits(tbl, {"a": 600, "b": 600})


def test_full_profile_empty_benchmark(ray_session):
    from data_validator_ray.pipelines.curation import full_profile

    out = full_profile(_docs(["the cat sat here now then"]), None).to_pandas()
    assert out["n_hits"].tolist() == [0]
    assert out["is_contaminated"].tolist() == [False]
    assert out["detected_lang"].tolist() == ["en"]


def test_pack_shards_negative_and_huge_ids(ray_session):
    # hash-derived ids: negative and beyond 2^53 (float64 would lose
    # exactness) — the window contract must hold in signed id order
    ids = [-(1 << 62) - 3, -5, 7, (1 << 62) + 11]
    tbl = _docs(["a b", "c d e", "f", "g h i j"], ids=ids)
    out = (
        pack_shards(tbl, budget=3, num_buckets=16)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # tokens in id order: 2,3,1,4 → excl prefix 0,2,5,6 → //3 = 0,0,1,2
    assert out["doc_id"].tolist() == sorted(ids)
    assert out["shard_id"].tolist() == [0, 0, 1, 2]


# --------------------------------------------------------------------- #
# registry rules: pii / repetition                                      #
# --------------------------------------------------------------------- #

def _validate(tbl, rule):
    from data_validator_ray.config import ValidationConfig
    from data_validator_ray.validator import RayDataValidator

    cfg = ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "t", "rules": [rule.model_dump()]}],
    )
    v = RayDataValidator(cfg)
    return v, cfg


def test_pii_rule_counts_and_filter(ray_session):
    from data_validator_ray.config import ValidationRule

    tbl = _docs([
        "mail a@b.co now",
        "clean doc",
        "ip 1.2.3.4 here",
        None,
    ])
    rule = ValidationRule(name="pii", rule_type="pii", column="text")
    v, _ = _validate(tbl, rule)
    s = v.validate_table(tbl, "t")
    assert (s.results[0].total_count, s.results[0].failed_count) == (4, 2)
    kept = v.apply_filters(tbl, "t").to_pandas()
    # filter mode drops PII rows AND the NULL row (F3 asymmetry)
    assert kept["doc_id"].tolist() == [1]


def test_repetition_rule_counts_and_filter(ray_session):
    from data_validator_ray.config import ValidationRule

    tbl = _docs([
        "the quick brown fox jumps over the lazy dog",
        "spam spam spam spam spam spam",
        None,
    ])
    rule = ValidationRule(
        name="rep", rule_type="repetition", column="text",
        parameters={"min_tokens": 5},
    )
    v, _ = _validate(tbl, rule)
    s = v.validate_table(tbl, "t")
    assert (s.results[0].total_count, s.results[0].failed_count) == (3, 2)
    kept = v.apply_filters(tbl, "t").to_pandas()
    assert kept["doc_id"].tolist() == [0]


def test_pii_rule_custom_patterns(ray_session):
    from data_validator_ray.config import ValidationRule

    tbl = _docs(["has secret token", "clean"])
    rule = ValidationRule(
        name="pii", rule_type="pii", column="text",
        parameters={"patterns": ["secret"]},
    )
    v, _ = _validate(tbl, rule)
    s = v.validate_table(tbl, "t")
    assert s.results[0].failed_count == 1


def test_curation_rules_registered():
    from data_validator_ray.stages.registry import registered_types
    import data_validator_ray.validator  # noqa: F401 — triggers registration

    assert {"pii", "repetition"} <= set(registered_types())


def test_decontaminate_hashed_equals_string_sets(ray_session):
    # the hashed rolling-shingle membership must agree with exact
    # string-set membership (collision-free in practice)
    import itertools
    rng_words = ["aa", "bb", "cc", "dd", "ee", "ff", "gg"]
    corpus_texts = [
        " ".join(p) for p in itertools.permutations(rng_words, 5)
    ][:200]
    bench = corpus_texts[::17]
    out = (
        decontaminate(_docs(corpus_texts), bench, ngram=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    bench_sets = {
        tuple(b.split()) for b in bench
    }
    expect = [
        1 if tuple(t.split()) in bench_sets else 0 for t in corpus_texts
    ]
    assert out["n_hits"].tolist() == expect


def test_group_sample_deterministic_and_bounded(ray_session):
    from data_validator_ray.pipelines.curation import group_sample

    n = 1000
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array([f"s{i % 4}" for i in range(n)]),
    })
    a = group_sample(tbl, "source", k=7).to_pandas()\
        .sort_values(["source", "doc_id"]).reset_index(drop=True)
    b = group_sample(tbl, "source", k=7, batch_size=64).to_pandas()\
        .sort_values(["source", "doc_id"]).reset_index(drop=True)
    # batch-size invariant (partial top-k combiner is exact)
    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby("source").size() == 7).all()
    # hash-order selection, not first-k: sample is spread across ids
    assert a["doc_id"].max() > 500


def test_group_sample_small_groups_keep_all(ray_session):
    from data_validator_ray.pipelines.curation import group_sample

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "source": pa.array(["a", "a", "b"]),
    })
    out = group_sample(tbl, "source", k=10).to_pandas()
    assert len(out) == 3


# --------------------------------------------------------------------------- #
# duplicated-span coverage                                                    #
# --------------------------------------------------------------------------- #


def test_dup_span_coverage_overlap_union(ray_session):
    from data_validator_ray.pipelines.curation import duplicated_span_stats

    seq = " ".join(f"w{i}" for i in range(10))  # 10-token run
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                seq + " uniqA uniqB",     # 12 tokens, shares the run
                seq + " uniqC",           # 11 tokens, shares the run
                "x1 x2 x3 x4 x5 x6 x7 x8 x9",  # unique 9 tokens
            ],
        }
    )
    out = (
        duplicated_span_stats(df, n=8, min_count=2,
                              num_hash_buckets=4, num_doc_buckets=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # docs 1/2 share three 8-grams (p=1..3 of the run) -> union covers
    # tokens 1..10 in both; doc 3 has no repeated 8-gram
    assert out.n_tokens.tolist() == [12, 11, 9]
    assert out.n_dup_tokens.tolist() == [10, 10, 0]


def test_dup_span_within_doc_repeat_counts(ray_session):
    from data_validator_ray.pipelines.curation import duplicated_span_stats

    rep = " ".join(f"t{i}" for i in range(8))
    df = pd.DataFrame(
        {"doc_id": [7], "text": rep + " mid " + rep}
    )  # same 8-gram twice WITHIN one doc (positions 1 and 10)
    out = duplicated_span_stats(
        df, n=8, min_count=2, num_hash_buckets=2, num_doc_buckets=1
    ).to_pandas()
    assert out.n_tokens.iloc[0] == 17
    # both windows duplicated: covers 1..8 and 10..17 -> 16 tokens
    assert out.n_dup_tokens.iloc[0] == 16


def test_dup_span_short_and_null_docs(ray_session):
    from data_validator_ray.pipelines.curation import duplicated_span_stats

    df = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["a b c", None]}
    )
    out = (
        duplicated_span_stats(df, n=8, min_count=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out.n_tokens.tolist() == [3, 0]
    assert out.n_dup_tokens.tolist() == [0, 0]


def test_sample_n_partitioning_independent(ray_session):
    from data_validator_ray.pipelines.curation import sample_n

    df = pd.DataFrame({"id": np.arange(1000), "x": np.arange(1000) * 2})
    a = sample_n(df, "id", 50)
    # different batch layout must give the identical sample
    b = sample_n(df.sample(frac=1.0, random_state=1), "id", 50, batch_size=64)
    pd.testing.assert_frame_equal(
        a.sort_values("id").reset_index(drop=True),
        b.sort_values("id").reset_index(drop=True),
    )
    assert len(a) == 50 and a["id"].is_unique


def test_sample_weighted_pps_properties(ray_session):
    from data_validator_ray.pipelines.curation import sample_weighted

    n = 4000
    df = pd.DataFrame(
        {
            "id": np.arange(n),
            # half the rows carry 50x the weight; some invalid weights
            "w": np.where(np.arange(n) % 2 == 0, 50.0, 1.0),
        }
    )
    df.loc[5, "w"] = 0.0
    df.loc[7, "w"] = -3.0
    df.loc[9, "w"] = np.nan
    out = sample_weighted(df, "id", "w", 400)
    assert len(out) == 400 and out["id"].is_unique
    # invalid weights never sampled
    assert not set(out["id"]) & {5, 7, 9}
    # heavy rows dominate the sample (expected ~98%)
    heavy = (out["id"] % 2 == 0).mean()
    assert heavy > 0.9
    # partitioning-independent
    out2 = sample_weighted(
        df.sample(frac=1.0, random_state=3), "id", "w", 400, batch_size=128
    )
    assert sorted(out["id"]) == sorted(out2["id"])


def test_sample_hash_id_domain_guard(ray_session):
    """Ids outside [0, 2^32) must fail loudly — numpy would wrap the
    Knuth product while the SQL oracle overflows (ADVICE round 2)."""
    import pandas as pd
    import pytest
    import ray

    from data_validator_ray.pipelines.curation import sample_n, sample_weighted

    bad = pd.DataFrame({"id": [1, -5, 7], "w": [1.0, 1.0, 1.0]})
    with pytest.raises(Exception, match="2\\^32"):
        sample_n(ray.data.from_pandas(bad), "id", 2)
    big = pd.DataFrame({"id": [1, 2**33, 7], "w": [1.0, 1.0, 1.0]})
    with pytest.raises(Exception, match="2\\^32"):
        sample_weighted(ray.data.from_pandas(big), "id", "w", 2)


def test_decontaminate_bloom_matches_exact_on_testdata(ray_session):
    """Bloom-tier decontamination: no false negatives ever; at test
    cardinalities (1 MiB registers vs ~1e4 shingles) the FP probability
    is ~1e-15, so the output matches the exact tier bit-for-bit."""
    import pandas as pd
    import ray

    from data_validator_ray.pipelines.curation import (
        decontaminate,
        decontaminate_bloom,
    )

    sf = "/root/testdata/sf0.001"
    bench_df = (
        ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
    )
    bench_df = bench_df[bench_df["doc_id"] % 97 == 0]
    exact = (
        decontaminate(f"{sf}/documents.parquet", bench_df["text"].tolist())
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    bloom = (
        decontaminate_bloom(
            f"{sf}/documents.parquet",
            ray.data.from_pandas(bench_df[["text"]]),
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(exact, bloom)


def test_linear_classifier_score_semantics(ray_session):
    """Sigmoid math vs hand computation, NULL-feature rows score NULL
    (and carry NULL labels), threshold boundary is >=, and a weight /
    feature length mismatch raises."""
    import math

    import ray

    from data_validator_ray.pipelines.curation import linear_classifier_score

    df = pd.DataFrame(
        {
            "id": [0, 1, 2, 3],
            "f1": [1.0, -2.0, 0.0, None],
            "f2": [2.0, 1.0, 0.0, 3.0],
        }
    )
    out = (
        linear_classifier_score(
            ray.data.from_pandas(df), ["f1", "f2"],
            weights=[0.5, -0.25], bias=0.0, id_cols=["id"],
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    z = [0.5 * 1 - 0.25 * 2, 0.5 * -2 - 0.25 * 1, 0.0]
    for i, zi in enumerate(z):
        assert math.isclose(
            out.loc[i, "score"], round(1 / (1 + math.exp(-zi)), 6)
        ), i
    # z=0 -> score 0.5 -> label 1 (>= threshold)
    assert out["label"].tolist()[:3] == [1, 0, 1]
    assert pd.isna(out.loc[3, "score"]) and pd.isna(out.loc[3, "label"])

    with pytest.raises(ValueError):
        linear_classifier_score(df, ["f1", "f2"], weights=[1.0])


def test_remove_duplicated_spans_transform(ray_session):
    """The removal transform drops exactly the tokens dup_span_stats
    counts, rebuilds in order, canonicalizes whitespace, and leaves
    unique docs untouched."""
    from data_validator_ray.pipelines.curation import (
        duplicated_span_stats,
        remove_duplicated_spans,
    )

    boiler = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                f"alpha beta {boiler} gamma delta",
                f"one  two   {boiler} four",   # multi-space input
                "totally unique text with no repeats at all here ok",
                None,
            ],
        }
    )
    out = (
        remove_duplicated_spans(docs, n=8, min_count=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    stats = (
        duplicated_span_stats(docs, n=8, min_count=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (out["n_removed_tokens"] == stats["n_dup_tokens"]).all()
    assert out.loc[0, "text"] == "alpha beta gamma delta"
    assert out.loc[1, "text"] == "one two four"  # whitespace canonicalized
    assert out.loc[2, "text"] == docs.text[2] and out.loc[2, "n_removed_tokens"] == 0
    assert out.loc[3, "text"] == "" and out.loc[3, "n_tokens"] == 0
    # determinism across partitionings
    out2 = (
        remove_duplicated_spans(
            ray.data.from_pandas(docs).repartition(3), n=8, min_count=2
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    pd.testing.assert_frame_equal(out, out2)


def test_negative_samples_deterministic_and_self_free(ray_session):
    """k negatives per anchor, never the anchor itself, identical
    across partitionings; dense-id and int64-product domains enforced."""
    from data_validator_ray.pipelines.curation import negative_samples

    df = pd.DataFrame({"doc_id": range(50)})
    out = (
        negative_samples(ray.data.from_pandas(df), "doc_id", 4)
        .to_pandas()
        .sort_values(["doc_id", "neg_rank"])
        .reset_index(drop=True)
    )
    assert len(out) == 200
    assert (out.neg_id != out.doc_id).all()
    assert out.neg_id.between(0, 49).all()

    # partition-independent
    ds2 = ray.data.from_pandas([df.iloc[:20], df.iloc[20:]])
    out2 = (
        negative_samples(ds2, "doc_id", 4)
        .to_pandas()
        .sort_values(["doc_id", "neg_rank"])
        .reset_index(drop=True)
    )
    assert out.equals(out2)

    import pytest as _pytest

    with _pytest.raises(Exception):
        negative_samples(
            pd.DataFrame({"doc_id": [0, 1 << 31]}), "doc_id", 2
        ).to_pandas()


def test_pipeline_spec_yaml_roundtrip_and_errors(ray_session, tmp_path):
    """A YAML spec file composes the same lazy pipeline as the dict
    form; unknown ops and empty specs fail loudly; custom ops register
    through the seam."""
    import pandas as pd
    import pytest

    from data_validator_ray.pipelines.spec import (
        pipeline_ops,
        register_pipeline_op,
        run_pipeline_spec,
    )

    df = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [f"doc {i} body" for i in range(40)],
            "n_chars": [50 + 10 * i for i in range(40)],
            "source": ["a" if i % 2 else "b" for i in range(40)],
        }
    )
    spec = {
        "steps": [
            {"op": "filter_expr", "params": {"expr": "n_chars >= 100"}},
            {"op": "select", "params": {"columns": ["doc_id", "source"]}},
            {"op": "rename", "params": {"source": "domain"}},
            {"op": "limit", "params": {"n": 10}},
        ]
    }
    out = run_pipeline_spec(spec, df).to_pandas()
    assert list(out.columns) == ["doc_id", "domain"]
    assert len(out) == 10 and (out.doc_id >= 5).all()

    import yaml

    p = tmp_path / "spec.yaml"
    p.write_text(yaml.safe_dump(spec))
    out2 = run_pipeline_spec(str(p), df).to_pandas()
    assert out.equals(out2)

    with pytest.raises(ValueError):
        run_pipeline_spec({"steps": [{"op": "nope"}]}, df)
    with pytest.raises(ValueError):
        run_pipeline_spec({"steps": []}, df)

    @register_pipeline_op("double_ids_test_only")
    def _double(ds, **_):
        import pyarrow.compute as pc

        return ds.map_batches(
            lambda b: b.set_column(
                b.schema.get_field_index("doc_id"), "doc_id",
                pc.multiply(b["doc_id"], 2),
            ),
            batch_format="pyarrow",
        )

    assert "double_ids_test_only" in pipeline_ops()
    out3 = run_pipeline_spec(
        {"steps": [{"op": "double_ids_test_only"}]}, df
    ).to_pandas()
    assert (out3.doc_id.to_numpy() == df.doc_id.to_numpy() * 2).all()


def test_bucketed_ops_survive_empty_shuffle_partitions(ray_session):
    """Far more input blocks than groups forces Ray's sort-shuffle to
    emit EMPTY partitions; every bucketed op must come through with
    correct values and a typed (non-degenerate) output schema. (Ray
    itself produces schema-less empty RefBundles for the empty
    partitions — an upstream cosmetic warning, filtered in bench.py —
    but the materialized result must be clean.)"""
    import numpy as np
    import pandas as pd
    import ray as _ray

    from data_validator_ray.pipelines.curation import semantic_dedup

    vecs = [[1.0, 0.0], [0.999, 0.001], [0.0, 1.0]]  # 0~1 dup, 2 far
    df = pd.DataFrame(
        {"vec_id": [0, 1, 2], "embedding": [list(v) for v in vecs]}
    )
    ds = _ray.data.from_pandas(df).repartition(16)  # >> 2 clusters
    out = semantic_dedup(
        ds, threshold=0.99, n_clusters=2, sample_size=8, n_iters=3
    )
    got = out.to_pandas().sort_values("vec_id")
    assert got.vec_id.tolist() == [0, 2]  # keep-first drops vec 1
    assert set(got.columns) == {"vec_id", "cluster"}

    from data_validator_ray.pipelines.text import bigram_logprob

    tdf = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["a b a b", "a b"]}
    )
    tds = _ray.data.from_pandas(tdf).repartition(16)
    lp = bigram_logprob(tds, max_bigrams=10).to_pandas().sort_values("doc_id")
    assert lp.n_bigrams.tolist() == [3, 1]
    assert (lp.logprob_mean == 0.0).all()  # every conditional is 1.0


def test_pipeline_spec_multi_family_and_failures(ray_session, tmp_path):
    """Joins take a second input via {$source: name}: spec-level
    sources resolve to pruned Parquet reads, caller-injected Datasets
    win, unknown names and unknown ops fail loudly with what IS
    registered; profiler steps (table-returning) re-enter the plan as
    Datasets."""
    import pyarrow.parquet as pq
    import pytest as _pytest
    import ray as _ray

    from data_validator_ray.pipelines.spec import (
        pipeline_ops,
        run_pipeline_spec,
    )

    # all engine families are composable from config
    for op in ("hash_join", "windowed_aggregate", "near_dup_dedup",
               "grouped_stats", "quality_score", "semantic_dedup"):
        assert op in pipeline_ops()

    left = pd.DataFrame({"k": [1, 1, 2, 3], "v": [10.0, 11.0, 20.0, 30.0]})
    right = pd.DataFrame({"rk": [1, 2], "tag": ["a", "b"]})
    rpath = tmp_path / "right.parquet"
    pq.write_table(pa.Table.from_pandas(right, preserve_index=False), rpath)

    spec = {
        "sources": {"r": {"path": str(rpath), "columns": ["rk", "tag"]}},
        "steps": [
            {"op": "hash_join",
             "params": {"right": {"$source": "r"}, "left_key": "k",
                        "right_key": "rk", "left_cols": ["v"],
                        "right_cols": ["tag"], "num_buckets": 4}},
        ],
    }
    out = run_pipeline_spec(spec, left).to_pandas().sort_values(["k", "v"])
    assert out.tag.tolist() == ["a", "a", "b"]  # k=3 unmatched drops

    # caller-injected Dataset shadows nothing but resolves by name
    inj = run_pipeline_spec(
        {"steps": spec["steps"]}, left,
        sources={"r": _ray.data.from_pandas(right)},
    ).to_pandas()
    assert len(inj) == 3

    with _pytest.raises(ValueError, match="unknown \\$source"):
        run_pipeline_spec({"steps": spec["steps"]}, left)

    # a profiler step composes with glue after it
    prof = run_pipeline_spec(
        {"steps": [
            {"op": "top_values", "params": {"column": "k", "k": 10}},
            {"op": "filter_expr", "params": {"expr": "n >= 2"}},
        ]},
        left,
    ).to_pandas()
    assert prof.value.tolist() == [1] and prof.n.tolist() == [2]


def test_fit_linear_classifier_recovers_planted_weights(ray_session):
    """Distributed IRLS fit: recovers planted logistic weights on
    clean synthetic data, is deterministic, partition-count-invariant,
    and composes with linear_classifier_score end-to-end; NULL rows
    drop and are counted."""
    import numpy as np
    import ray as _ray

    from data_validator_ray.pipelines.curation import (
        fit_linear_classifier,
        linear_classifier_score,
    )

    rng = np.random.default_rng(7)
    n = 4000
    X = rng.normal(size=(n, 2))
    true_w, true_b = np.array([2.0, -1.0]), 0.5
    p = 1.0 / (1.0 + np.exp(-(X @ true_w + true_b)))
    y = (rng.random(n) < p).astype(np.float64)
    df = pd.DataFrame({"f1": X[:, 0], "f2": X[:, 1], "y": y})
    df.loc[0, "f1"] = None  # one dropped row

    fit = fit_linear_classifier(
        _ray.data.from_pandas(df), ["f1", "f2"], "y"
    )
    assert fit["n_rows"] == n - 1 and fit["n_dropped"] == 1
    # MLE of a 4k-sample logistic draw sits near the truth
    assert abs(fit["weights"][0] - 2.0) < 0.25
    assert abs(fit["weights"][1] + 1.0) < 0.25
    assert abs(fit["bias"] - 0.5) < 0.25
    assert fit["log_loss"] < 0.45

    # deterministic + partition-invariant
    again = fit_linear_classifier(
        _ray.data.from_pandas(df).repartition(16), ["f1", "f2"], "y"
    )
    assert again == fit

    # the fit feeds the scorer: high accuracy on clean rows
    clean = df.dropna().reset_index(drop=True)
    clean["rid"] = np.arange(len(clean))
    scored = (
        linear_classifier_score(
            _ray.data.from_pandas(clean), ["f1", "f2"],
            fit["weights"], fit["bias"], id_cols=["rid"],
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    acc = ((scored.score >= 0.5).astype(float) == clean.y).mean()
    assert acc > 0.75  # near the Bayes rate for this noise level


def test_mix_to_budget_rates_and_caps(ray_session):
    """Budget >= supply keeps everything; a small budget downsamples
    with weight-proportional expected token shares; deterministic."""
    import ray as _ray

    from data_validator_ray.pipelines.curation import mix_to_budget

    n = 3000
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array(["a" if i % 3 else "b" for i in range(n)]),
        "n_chars": pa.array([100] * n, pa.int64()),
    })
    # budget above total supply -> permille 1000 everywhere
    full = mix_to_budget(tbl, budget=n * 100 * 2).to_pandas()
    assert len(full) == n

    # tight budget, b weighted 3x: kept-token shares follow weights
    out = mix_to_budget(
        tbl, budget=n * 100 // 4, weights={"b": 3, "a": 1}
    ).to_pandas()
    kept = out.groupby("source")["n_chars"].sum()
    # target: b gets 3/4 of 75000 = 56250 (supply 100000), a gets 18750
    assert abs(kept.get("b", 0) - 56250) / 56250 < 0.15
    assert abs(kept.get("a", 0) - 18750) / 18750 < 0.15

    again = mix_to_budget(
        _ray.data.from_arrow(tbl).repartition(8),
        budget=n * 100 // 4, weights={"b": 3, "a": 1},
    ).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True),
    )


def test_line_quality_filter_predicates(ray_session):
    import pandas as pd

    from data_validator_ray.pipelines.curation import line_quality_filter

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "a good long line of text\nok\n@@@@@@@@@@@@@@\nanother fine line here",
                "short\n!!",
                None,
            ],
        }
    )
    out = (
        line_quality_filter(df, min_chars=5, min_alpha_pct=60)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 0: "ok" fails min_chars, the @-row fails alpha ratio
    assert out["text"].iloc[0] == (
        "a good long line of text\nanother fine line here"
    )
    assert out["n_lines"].iloc[0] == 4 and out["n_lines_kept"].iloc[0] == 2
    # doc 1: "short" (5 chars, all alpha) survives, "!!" fails both
    assert out["text"].iloc[1] == "short"
    # doc 2: NULL text → one empty line, dropped → empty rebuild
    assert out["text"].iloc[2] == ""
    assert out["n_lines"].iloc[2] == 1 and out["n_lines_kept"].iloc[2] == 0


def test_line_quality_filter_doc_drop(ray_session):
    import pandas as pd

    from data_validator_ray.pipelines.curation import line_quality_filter

    df = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [
                "good long line alpha\n@@@\n###\n$$$",  # keeps 1/4 = 25%
                "good long line alpha\nanother good line",  # keeps 2/2
            ],
        }
    )
    out = (
        line_quality_filter(df, min_chars=5, min_alpha_pct=60, min_keep_pct=50)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 0 lost 75% of its lines → dropped outright by min_keep_pct
    assert out["doc_id"].tolist() == [1]
    assert out["n_lines_kept"].iloc[0] == 2


def test_pipeline_spec_crawl_hygiene_ops(ray_session):
    import pandas as pd

    from data_validator_ray.pipelines.spec import run_pipeline_spec

    spec = {
        "steps": [
            {
                "op": "url_host_filter",
                "params": {"domains": ["host3.example.com"]},
            },
            {"op": "cap_per_domain", "params": {"max_per_domain": 2}},
        ]
    }
    df = pd.DataFrame(
        {
            "doc_id": range(8),
            "url": [
                "https://host%d.example.com/p/%d" % (i % 4, i)
                for i in range(8)
            ],
        }
    )
    out = (
        run_pipeline_spec(spec, source=ray.data.from_pandas(df))
        .to_pandas()
        .sort_values(["domain", "doc_id"])
        .reset_index(drop=True)
    )
    # host3 blocked entirely; each surviving domain capped at its 2
    # smallest ids
    assert out["doc_id"].tolist() == [0, 4, 1, 5, 2, 6]
    assert "host3.example.com" not in set(out["domain"])


def test_seeded_shuffle_deterministic_and_seeded(ray_session):
    import pandas as pd
    import ray.data

    from data_validator_ray.pipelines.curation import seeded_shuffle

    df = pd.DataFrame({"doc_id": range(200), "v": range(200)})
    a = (
        seeded_shuffle(df, seed=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # layout independence: a different partitioning gives the SAME order
    ds2 = ray.data.from_pandas(df).repartition(7)
    b = (
        seeded_shuffle(ds2, seed=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # position is a permutation of 1..n and differs from input order
    assert sorted(a["position"]) == list(range(1, 201))
    assert a["position"].tolist() != list(range(1, 201))
    # a different seed gives a different epoch order
    c = (
        seeded_shuffle(df, seed=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert c["position"].tolist() != a["position"].tolist()


def test_seeded_shuffle_validation(ray_session):
    import pandas as pd
    import pytest as _pytest

    from data_validator_ray.pipelines.curation import seeded_shuffle

    bad = pd.DataFrame({"doc_id": [1, -2], "v": [0, 0]})
    with _pytest.raises(Exception, match="2\\*\\*31|non-NULL"):
        seeded_shuffle(bad).to_pandas()


def test_pipeline_spec_save_as_collision_fails(ray_session):
    import pandas as pd
    import pytest as _pytest

    from data_validator_ray.pipelines.spec import run_pipeline_spec

    df = pd.DataFrame({"doc_id": [1, 2], "v": [1.0, 2.0]})
    spec = {
        "sources": {"taken": {"path": "/nonexistent.parquet"}},
        "steps": [
            {"op": "limit", "params": {"n": 2}, "save_as": "taken"},
        ],
    }
    with _pytest.raises(ValueError, match="collides"):
        run_pipeline_spec(spec, df)


def test_temperature_mix_weights_extremes(ray_session):
    import pandas as pd
    import numpy as np

    from data_validator_ray.pipelines.curation import temperature_mix_weights

    df = pd.DataFrame(
        {
            "doc_id": np.arange(10, dtype=np.int64),
            "lang": ["en"] * 6 + ["de"] * 3 + ["fr"],
            "n_chars": np.arange(10, dtype=np.int64) + 1,
        }
    )
    # alpha=1 is natural sampling: weight == share
    nat = temperature_mix_weights(df, "lang", alpha=1.0)
    assert np.allclose(nat["weight"], nat["share"], atol=1e-6)
    assert nat.loc[nat.lang == "en", "n"].item() == 6
    # alpha=0 is uniform
    uni = temperature_mix_weights(df, "lang", alpha=0.0)
    assert np.allclose(uni["weight"], 1 / 3, atol=1e-6)
    # alpha in (0,1) strictly upweights the low-resource group
    mid = temperature_mix_weights(df, "lang", alpha=0.3)
    fr = mid.loc[mid.lang == "fr"]
    assert fr["weight"].item() > fr["share"].item()
    # count_col switches the mass definition to summed tokens
    tok = temperature_mix_weights(df, "lang", alpha=1.0, count_col="n_chars")
    assert tok.loc[tok.lang == "en", "n"].item() == 21  # 1+..+6


def test_gopher_gate_matches_gopher_filter(ray_session):
    """The streaming all-columns gate keeps EXACTLY gopher_filter's
    id set (shared _gopher_mask) and passes every column through."""
    import ray as _ray

    from data_validator_ray.pipelines.curation import (
        gopher_filter,
        gopher_gate,
    )

    sf = "/root/testdata/sf0.001/documents.parquet"
    ids = sorted(gopher_filter(sf).to_pandas()["doc_id"])
    gated = gopher_gate(
        _ray.data.read_parquet(sf, columns=["doc_id", "text", "lang"])
    ).to_pandas()
    assert sorted(gated["doc_id"]) == ids
    assert list(gated.columns) == ["doc_id", "text", "lang"]


def test_pipeline_spec_delta_source(ray_session, tmp_path):
    """Spec-declared sources resolve Delta tables (explicit
    format: delta or auto-detected _delta_log dir), including
    version= time travel and column pruning."""
    import pandas as pd

    from data_validator_ray.pipelines.spec import run_pipeline_spec
    from data_validator_ray.sources import write_delta

    t = str(tmp_path / "dt")
    write_delta(
        pd.DataFrame({"k": [1, 2, 3], "v": [10.0, 20.0, 30.0]}), t
    )
    write_delta(
        pd.DataFrame({"k": [4], "v": [40.0]}), t, mode="append"
    )
    base = pd.DataFrame({"k": [1, 2, 3, 4], "x": ["a", "b", "c", "d"]})
    spec = {
        "sources": {"dim": {"path": t, "format": "delta"}},
        "steps": [
            {
                "op": "hash_join",
                "params": {
                    "right": {"$source": "dim"},
                    "left_key": "k",
                    "right_key": "k",
                    "left_cols": ["x"],
                    "right_cols": ["v"],
                },
            },
        ],
    }
    out = (
        run_pipeline_spec(spec, base)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["v"].tolist() == [10.0, 20.0, 30.0, 40.0]

    # auto-detect (no format key) + time travel to version 0
    spec_v0 = {
        "sources": {"dim": {"path": t, "version": 0}},
        "steps": [
            {
                "op": "hash_join",
                "params": {"right": {"$source": "dim"},
                           "left_key": "k", "right_key": "k",
                           "left_cols": ["x"], "right_cols": ["v"]},
            },
        ],
    }
    out0 = run_pipeline_spec(spec_v0, base).to_pandas()
    assert sorted(out0["k"].tolist()) == [1, 2, 3]
