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
