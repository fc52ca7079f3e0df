"""Tests for the unigram log-prob LM quality signal."""

import numpy as np
import pandas as pd

def test_unigram_logprob_matches_hand_computation(ray_session):
    import math

    from data_validator_ray.pipelines.text import unigram_logprob

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a a b", "b c", "", None],
        }
    )
    out = (
        unigram_logprob(df)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # corpus counts: a=2, b=2, c=1, total=5
    lp = {"a": math.log(2 / 5), "b": math.log(2 / 5), "c": math.log(1 / 5)}
    exp0 = round((2 * lp["a"] + lp["b"]) / 3, 6)
    exp1 = round((lp["b"] + lp["c"]) / 2, 6)
    assert out["n_tokens"].tolist() == [3, 2, 0, 0]
    assert out["logprob_mean"].iloc[0] == exp0
    assert out["logprob_mean"].iloc[1] == exp1
    assert pd.isna(out["logprob_mean"].iloc[2])
    assert pd.isna(out["logprob_mean"].iloc[3])


def test_unigram_logprob_passthrough_equals_join(ray_session):
    """passthrough_cols must carry input columns through the score pass
    unchanged — same (doc_id, n_tokens, logprob_mean) as the plain
    output, with text/metadata columns byte-identical to the input, in
    BOTH the uncapped and the capped (top-V distributed) tiers."""
    from data_validator_ray.pipelines.text import unigram_logprob

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a a b", "b c", "", None],
            "lang": ["en", "fr", "en", None],
        }
    )
    for kw in ({}, {"vocab_size": 2}):
        plain = (
            unigram_logprob(df[["doc_id", "text"]], **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        thru = (
            unigram_logprob(
                df, passthrough_cols=["text", "lang"], **kw
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert sorted(thru.columns) == sorted(
            ["doc_id", "n_tokens", "logprob_mean", "text", "lang"]
        )
        pd.testing.assert_frame_equal(
            thru[["doc_id", "n_tokens", "logprob_mean"]], plain
        )
        pd.testing.assert_frame_equal(
            thru[["doc_id", "text", "lang"]],
            df[["doc_id", "text", "lang"]],
        )


def test_unigram_logprob_vocab_cap_oov_floor(ray_session):
    import math

    from data_validator_ray.pipelines.text import unigram_logprob

    # "rare" falls out of a top-2 vocab and must score the OOV floor,
    # while in-vocab probabilities keep the FULL total (9 tokens)
    df = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["x x x x y y y y", "rare"],
        }
    )
    out = (
        unigram_logprob(df, vocab_size=2, oov_count=0.5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["logprob_mean"].iloc[0] == round(math.log(4 / 9), 6)
    assert out["logprob_mean"].iloc[1] == round(math.log(0.5 / 9), 6)


def test_unigram_logprob_batch_size_invariant(ray_session):
    from data_validator_ray.pipelines.text import unigram_logprob

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(1, 30)))
        for _ in range(300)
    ]
    df = pd.DataFrame({"doc_id": range(300), "text": texts})
    a = (
        unigram_logprob(df, batch_size=17)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        unigram_logprob(df, batch_size=300)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_unigram_logprob_capped_matches_uncapped_when_no_cut(ray_session):
    # the distributed top-V path with V >= |vocab| must be
    # byte-identical to the uncapped broadcast path — pins the
    # bucketing / total-carrier / two-level-cut machinery to exact
    from data_validator_ray.pipelines.text import unigram_logprob

    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(50)]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(1, 25)))
        for _ in range(200)
    ]
    df = pd.DataFrame({"doc_id": range(200), "text": texts})
    a = (
        unigram_logprob(df, batch_size=23)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        unigram_logprob(df, vocab_size=4096, batch_size=23)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_unigram_logprob_capped_cut_spans_buckets(ray_session):
    import math

    from data_validator_ray.pipelines.text import unigram_logprob

    # 30 distinct tokens spread over the 64 hash buckets, V=5: the
    # global top-5 by (count desc, hash asc) must win regardless of
    # which bucket each token lands in, and the denominator must stay
    # the FULL corpus total (315 tokens)
    words = [f"tok{i}" for i in range(30)]
    # tok0 appears 30×, tok1 29×, ... tok29 1× → total = 465
    text = " ".join(
        " ".join([w] * (30 - i)) for i, w in enumerate(words)
    )
    df = pd.DataFrame({"doc_id": [0, 1], "text": [text, "tok29"]})
    out = (
        unigram_logprob(df, vocab_size=5, oov_count=0.5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    total = 465 + 1  # doc 1 adds one more tok29
    # doc 1 is a single OOV token (tok29 has count 2, far below top-5)
    assert out["logprob_mean"].iloc[1] == round(math.log(0.5 / total), 6)
    # doc 0: top-5 tokens (counts 30..26) keep exact probs; the other
    # 25 tokens (counts 25..1, 326 occurrences incl. one extra tok29
    # in doc 1 — but doc 0 holds 325 of them) score the OOV floor
    in_vocab = sum((30 - i) * math.log((30 - i) / total) for i in range(5))
    oov_occ = 465 - sum(30 - i for i in range(5))
    expected = (in_vocab + oov_occ * math.log(0.5 / total)) / 465
    assert out["logprob_mean"].iloc[0] == round(expected, 6)


def test_pretoken_count_bpe_ish(ray_session):
    from data_validator_ray.pipelines.text import pretoken_count

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["hello world", "a1b2, c!", "", None],
        }
    )
    out = (
        pretoken_count(df)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # "hello world" -> ["hello", " world"] = 2
    # "a1b2, c!" -> ["a","1","b","2",","," c","!"] = 7
    assert out["n_pretokens"].tolist() == [2, 7, 0, 0]


def test_bigram_logprob_edges_and_cap(ray_session):
    """<2-token docs score NULL with n_bigrams=0; MLE conditionals are
    exact (c(w1,w2)/c(w1,.)); the max_bigrams cap floors out-of-table
    pairs at oov_logp deterministically."""
    import math

    import pandas as pd
    import ray

    from data_validator_ray.pipelines.text import bigram_logprob

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": ["a b a b", "a b", "solo", "", None],
        }
    )
    out = (
        bigram_logprob(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # corpus bigrams: (a,b)x3, (b,a)x1 -> P(b|a)=3/3=1? no: c(a,.)=3? pairs
    # doc0: (a,b),(b,a),(a,b); doc1: (a,b) -> c(a,b)=3, c(b,a)=1,
    # c(a,.)=3, c(b,.)=1 -> P(b|a)=1.0, P(a|b)=1.0
    assert out["n_bigrams"].tolist() == [3, 1, 0, 0, 0]
    assert out.loc[0, "logprob_mean"] == 0.0  # ln(1) everywhere
    assert out.loc[1, "logprob_mean"] == 0.0
    assert all(pd.isna(out.loc[i, "logprob_mean"]) for i in (2, 3, 4))

    # cap: keep only the single most common pair; (b,a) falls to oov
    capped = (
        bigram_logprob(
            ray.data.from_pandas(df), max_bigrams=1, oov_logp=-20.0
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc0 = mean(ln P(a,b)=ln1, -20, ln1) = -20/3
    assert math.isclose(capped.loc[0, "logprob_mean"], round(-20.0 / 3, 6))
    assert capped.loc[1, "logprob_mean"] == 0.0


def test_token_entropy_edges(ray_session):
    """Empty/NULL docs -> NULL entropy with 0 tokens; single-token and
    all-same-token docs -> 0.0; a uniform two-token doc -> ln 2; exact
    p-weighted entropy for a mixed doc."""
    import math

    import pandas as pd
    import ray

    from data_validator_ray.pipelines.text import token_entropy

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "text": [
                "a b a b",          # uniform over {a,b} -> ln 2
                "x x x x",          # single distinct -> 0
                "solo",             # one token -> 0
                "",                 # empty -> NULL
                None,               # NULL -> NULL
                "a a a b",          # p=(3/4,1/4)
            ],
        }
    )
    out = (
        token_entropy(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [4, 4, 1, 0, 0, 4]
    assert out["distinct_tokens"].tolist() == [2, 1, 1, 0, 0, 2]
    e = out["token_entropy"]
    assert math.isclose(e[0], round(math.log(2), 6))
    assert e[1] == 0.0 and e[2] == 0.0
    assert pd.isna(e[3]) and pd.isna(e[4])
    expected = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert math.isclose(e[5], round(expected, 6))


def test_bigram_logprob_distributed_merge_parity(ray_session):
    """distributed_merge=True (Ray groupby pre-merge of pair partials)
    must be value-identical to the driver-merge default, including under
    a max_bigrams cap and with pairs split across many small batches."""
    import pandas as pd
    import ray

    from data_validator_ray.pipelines.text import bigram_logprob

    rows = []
    words = ["the", "cat", "sat", "on", "mat", "dog", "ran"]
    for i in range(60):
        # deterministic pseudo-text with heavy pair overlap across docs
        toks = [words[(i * 7 + j * 3) % len(words)] for j in range(12)]
        rows.append({"doc_id": i, "text": " ".join(toks)})
    df = pd.DataFrame(rows)

    def run(**kw):
        ds = ray.data.from_pandas(df).repartition(8)
        return (
            bigram_logprob(ds, batch_size=8, **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(), run(distributed_merge=True))
    pd.testing.assert_frame_equal(
        run(max_bigrams=5), run(max_bigrams=5, distributed_merge=True)
    )


def test_charset_profile_counters(ray_session):
    """Exact codepoint counters incl. NULL text, mojibake replacement
    chars, C0 controls (tab/NL/CR excluded) and non-ASCII."""
    from data_validator_ray.pipelines.text import charset_profile

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "Héllo W0rld\t!",          # 1 non-ascii, 1 digit, 2 upper
                None,                       # all zeros
                "a\x01b\x7fc\nd",          # 2 controls, \n is whitespace
                "bad � decode �",  # 2 replacement (also non-ascii)
            ],
        }
    )
    out = (
        charset_profile(df)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, ["n_non_ascii", "n_digits", "n_upper"]].tolist() == [1, 1, 2]
    assert out.loc[0, "n_whitespace"] == 2  # space + tab
    assert out.loc[1].tolist() == [0] * 7
    assert out.loc[2, "n_control"] == 2 and out.loc[2, "n_whitespace"] == 1
    assert out.loc[3, "n_replacement"] == 2
    assert out.loc[3, "n_non_ascii"] == 2
    assert out.loc[0, "n_chars"] == 13


def test_pmi_collocations_surfaces_phrases(ray_session):
    """A fixed phrase ranks above independent co-occurrence; bigrams
    never cross doc boundaries; min_count prunes."""
    import pandas as pd

    from data_validator_ray.pipelines.text import pmi_collocations

    docs = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": ["new york is big and big is fine"] * 5
            + ["york new and is big", "big new", "york is"],
        }
    )
    out = pmi_collocations(docs, k=5, min_count=5)
    assert out.bigram.iloc[0] == "new york"  # always adjacent
    assert "big new" not in out.bigram.tolist()  # count 1 < 5


def test_vocab_coverage_oov_rates(ray_session):
    """Top-V vocab membership: common tokens in-vocab, rare tokens OOV;
    empty/NULL docs get n_tokens 0 and NULL rate; exact division."""
    import pandas as pd

    from data_validator_ray.pipelines.text import vocab_coverage

    docs = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "the cat sat",          # all in-vocab (top-3: the cat sat)
                "the the cat",
                "zyx the qqq",          # 2 OOV of 3
                "",                     # no tokens
                None,                   # no tokens
                "cat zzz",              # 1 OOV of 2
            ],
        }
    )
    out = (
        vocab_coverage(docs, top_v=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.n_tokens.tolist() == [3, 3, 3, 0, 0, 2]
    # vocab is {the:4, cat:3, sat:1? ...} top-3 by count then token asc:
    # counts: the=4, cat=3, sat=1, zyx=1, qqq=1, zzz=1 -> top3 = the, cat
    # + tie at 1 broken asc = qqq
    assert out.n_oov.tolist() == [1, 0, 1, 0, 0, 1]
    assert out.oov_rate[0] == 1 / 3 and out.oov_rate[5] == 0.5
    assert np.isnan(out.oov_rate[3]) and np.isnan(out.oov_rate[4])


def test_multi_pattern_counts_overlap_and_nulls(ray_session):
    """Non-overlapping counting, NULL-text docs contribute nothing,
    per-doc containment counts docs not occurrences."""
    import pandas as pd

    from data_validator_ray.pipelines.text import multi_pattern_counts

    docs = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": ["aaaa banana", None, "banana aa", "xyz"],
        }
    )
    out = multi_pattern_counts(docs, ["aa", "ana", "zzz"]).to_pandas()
    out = out.set_index("pattern")
    # "aaaa" -> 2 non-overlapping "aa"; "aa" in doc2 -> 1 more
    assert out.loc["aa", "n_occurrences"] == 3
    assert out.loc["aa", "n_docs"] == 2
    # "banana" -> 1 non-overlapping "ana" per banana (left-to-right)
    assert out.loc["ana", "n_occurrences"] == 2
    assert out.loc["ana", "n_docs"] == 2
    assert out.loc["zzz", "n_occurrences"] == 0
    assert out.loc["zzz", "n_docs"] == 0


def test_multi_pattern_counts_rejects_empty():
    import pytest as _pytest

    from data_validator_ray.pipelines.text import multi_pattern_counts

    with _pytest.raises(ValueError):
        multi_pattern_counts("/nonexistent.parquet", [])


def test_dsir_logratio_directional_and_nulls(ray_session):
    import numpy as np
    import pandas as pd

    from data_validator_ray.pipelines.text import dsir_logratio

    raw = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "apple apple banana",   # target-like
                "rock rock stone",      # off-target
                "apple stone",          # mixed
                "",                     # zero tokens -> NULL
            ],
        }
    )
    target = pd.DataFrame({"text": ["apple banana apple", "banana apple"]})
    out = (
        dsir_logratio(raw, target)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [3, 3, 2, 0]
    # target-like doc scores strictly higher than the off-target one
    assert out.loc[0, "logratio_sum"] > out.loc[2, "logratio_sum"]
    assert out.loc[2, "logratio_sum"] > out.loc[1, "logratio_sum"]
    assert np.isnan(out.loc[3, "logratio_sum"])

    # numpy reference: union-vocab additive smoothing, alpha=0.5
    def ref_llr(tok):
        vocab = ["apple", "banana", "rock", "stone"]
        cr = {"apple": 3, "banana": 1, "rock": 2, "stone": 2}
        ct = {"apple": 3, "banana": 2}
        nr, nt, v, a = 8.0, 5.0, 4.0, 0.5
        return np.log((ct.get(tok, 0) + a) / (nt + a * v)) - np.log(
            (cr.get(tok, 0) + a) / (nr + a * v)
        )

    exp = round(ref_llr("apple") * 2 + ref_llr("banana"), 6)
    assert out.loc[0, "logratio_sum"] == exp


def test_dsir_logratio_capped_small_cap(ray_session):
    import numpy as np
    import pandas as pd

    from data_validator_ray.pipelines.text import dsir_logratio

    # 6-token vocab, cap 3: kept tokens must score EXACTLY as in the
    # uncapped model (true totals + true V ride the carrier rows);
    # cut tokens score the OOV floor
    raw = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a a a a b b c", "d e f c b a"],
        }
    )
    target = pd.DataFrame({"text": ["a a b"]})
    exact = (
        dsir_logratio(raw, target)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    capped = (
        dsir_logratio(raw, target, vocab_size=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 1 = only the 3 most frequent tokens (a:5+2, b:3+1, c:2 by
    # combined count) -> identical to exact
    assert capped.loc[0, "logratio_sum"] == exact.loc[0, "logratio_sum"]
    # doc 2 contains cut tokens (d, e, f) -> differs from exact
    assert capped.loc[1, "logratio_sum"] != exact.loc[1, "logratio_sum"]
    assert np.isfinite(capped.loc[1, "logratio_sum"])


def test_dsir_logratio_validation(ray_session):
    import pandas as pd
    import pytest as _pytest

    from data_validator_ray.pipelines.text import dsir_logratio

    df = pd.DataFrame({"doc_id": [1], "text": ["x"]})
    with _pytest.raises(ValueError, match="alpha"):
        dsir_logratio(df, df, alpha=0.0)
    with _pytest.raises(ValueError, match="vocab_size"):
        dsir_logratio(df, df, vocab_size=0)


def test_dsir_fused_equals_two_source(ray_session):
    import pandas as pd
    import pytest as _pytest

    from data_validator_ray.pipelines.text import dsir_logratio

    raw = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": ["a a b", "b c", "c c c", "a", "", "b a"],
            "is_t": [True, False, True, None, True, False],
        }
    )
    tgt = raw[raw["is_t"].fillna(False).astype(bool)][["text"]]
    two = (
        dsir_logratio(raw[["doc_id", "text"]], tgt)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    fused = (
        dsir_logratio(raw, target_col="is_t")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(two, fused)
    # capped fused tier agrees as well (cap > vocab)
    fused_cap = (
        dsir_logratio(raw, target_col="is_t", vocab_size=64)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(two, fused_cap)
    with _pytest.raises(ValueError, match="exactly one"):
        dsir_logratio(raw, tgt, target_col="is_t")
    with _pytest.raises(ValueError, match="exactly one"):
        dsir_logratio(raw[["doc_id", "text"]])
