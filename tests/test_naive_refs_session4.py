"""Randomized naive-reference checks for the session-4 operators:
domain boilerplate removal (both modes), DSIR log-ratio weights, and
per-group quantile banding must equal a straightforward Python/numpy
reference on seeded random corpora — the same pin the property suite
gives the pure kernels, at Dataset level."""

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd


def _random_corpus(seed: int, n_docs: int = 30):
    rng = np.random.default_rng(seed)
    segs = ["nav", "footer", "body", "promo", ""]
    domains = ["a", "b", "c", None]
    rows = []
    for i in range(n_docs):
        k = int(rng.integers(1, 5))
        text = "\n".join(rng.choice(segs, size=k))
        rows.append(
            (i, domains[int(rng.integers(0, len(domains)))], text)
        )
    # a NULL-text doc too
    rows.append((n_docs, "a", None))
    return pd.DataFrame(rows, columns=["doc_id", "source", "text"])


def _naive_boilerplate(df, min_docs, min_frac=None, sep="\n"):
    seg_docs = defaultdict(set)
    dom_docs = defaultdict(set)
    for r in df.itertuples():
        d = r.source if r.source is not None else ""
        dom_docs[d].add(r.doc_id)
        for s_ in (r.text if r.text is not None else "").split(sep):
            seg_docs[(d, s_)].add(r.doc_id)
    out = []
    for r in df.itertuples():
        d = r.source if r.source is not None else ""
        thr = min_docs
        if min_frac is not None:
            thr = max(min_docs, math.ceil(min_frac * len(dom_docs[d])))
        segs = (r.text if r.text is not None else "").split(sep)
        kept = [s_ for s_ in segs if len(seg_docs[(d, s_)]) < thr]
        out.append((r.doc_id, sep.join(kept), len(segs) - len(kept)))
    return (
        pd.DataFrame(out, columns=["doc_id", "text", "n_dropped"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_domain_boilerplate_matches_naive_reference(ray_session):
    from data_validator_ray.pipelines.dedup import domain_boilerplate_removal

    for seed in (0, 1, 2):
        df = _random_corpus(seed)
        for kw in (
            {"min_docs": 2},
            {"min_docs": 1, "min_frac": 0.5},
        ):
            ref = _naive_boilerplate(df, **kw)
            for mode in ("broadcast", "shuffle"):
                got = (
                    domain_boilerplate_removal(
                        df, mode=mode, num_hash_buckets=4,
                        num_doc_buckets=3, **kw
                    )
                    .to_pandas()
                    .sort_values("doc_id")
                    .reset_index(drop=True)
                )
                pd.testing.assert_frame_equal(got, ref), (seed, kw, mode)


def _naive_dsir(raw_texts, tgt_texts, alpha=0.5):
    cr = Counter(t for x in raw_texts for t in (x or "").split(" ") if t)
    ct = Counter(t for x in tgt_texts for t in (x or "").split(" ") if t)
    vocab = set(cr) | set(ct)
    nr, nt, v = sum(cr.values()), sum(ct.values()), len(vocab)

    def llr(t):
        return math.log((ct.get(t, 0) + alpha) / (nt + alpha * v)) - (
            math.log((cr.get(t, 0) + alpha) / (nr + alpha * v))
        )

    rows = []
    for x in raw_texts:
        toks = [t for t in (x or "").split(" ") if t]
        s = None if not toks else round(sum(llr(t) for t in toks), 6)
        rows.append((len(toks), s))
    return rows


def test_dsir_matches_naive_reference(ray_session):
    from data_validator_ray.pipelines.text import dsir_logratio

    rng = np.random.default_rng(5)
    vocab = ["w%d" % i for i in range(12)]
    raw_texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 9))))
        for _ in range(25)
    ]
    tgt_texts = [
        " ".join(rng.choice(vocab[:6], size=int(rng.integers(1, 7))))
        for _ in range(10)
    ]
    raw = pd.DataFrame({"doc_id": range(len(raw_texts)), "text": raw_texts})
    tgt = pd.DataFrame({"text": tgt_texts})
    got = (
        dsir_logratio(raw, tgt)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = _naive_dsir(raw_texts, tgt_texts)
    assert got["n_tokens"].tolist() == [n for n, _ in ref]
    for g, (_, s) in zip(got["logratio_sum"], ref):
        if s is None:
            assert np.isnan(g)
        else:
            assert g == s


def test_grouped_bucket_matches_numpy_reference(ray_session):
    from data_validator_ray.pipelines.relational import bucket_by_quantile

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "id": range(60),
            "g": rng.choice(["x", "y", "z"], size=60),
            "v": np.round(rng.normal(size=60), 3),
        }
    )
    got = (
        bucket_by_quantile(
            df, "v", group_col="g", qs=[0.25, 0.75],
            labels=["lo", "mid", "hi"], id_cols=["id"],
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    for gname, sub in df.groupby("g"):
        cuts = np.quantile(sub["v"], [0.25, 0.75], method="linear")
        for _, r in sub.iterrows():
            band = int((r.v > cuts).sum())
            exp = ["lo", "mid", "hi"][band]
            assert (
                got.loc[got["id"] == r.id, "bucket"].iloc[0] == exp
            ), (gname, r.id)
