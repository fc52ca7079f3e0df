"""Text-analysis operators for training-data pipelines (Ray-Data-first).

Net-new vs the reference: language identification, quality statistics,
token counting and document fingerprinting over a ``documents``-style
table — every formula chosen to be exactly replicable in ANSI SQL so
the DuckDB oracle comparisons are bit-exact (integers / md5 strings;
no float formulas in oracle-checked outputs).

All operators are single streaming ``map_batches`` passes (no shuffle);
token work is vectorized over the whole batch via one flat exploded
token array + ``reduceat`` segment reductions.
"""

from __future__ import annotations

import hashlib
import re
from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .dedup import _as_dataset
from ..functions.sketches import hash64

Dataset = ray.data.Dataset

# Per-language stopword profiles (tiny n-gram-free heuristic tier; at
# production scale this stage would wrap a fastText-style model in the
# same actor-pool shape). Alphabetical language order is the tie-break.
LANG_PROFILES: Dict[str, List[str]] = {
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "los", "las", "y", "es", "en", "que"],
    "fr": ["le", "les", "et", "des", "un", "une", "est", "dans"],
    "zh": ["的", "是", "不", "了", "在", "人", "有", "我"],
}
LANGS = sorted(LANG_PROFILES)  # alphabetical — the argmax tie-break order

_WS_RE = re.compile(r"\s+")


def _flat_tokens(texts: pd.Series):
    """One flat token array for the batch + per-doc segment offsets.
    Tokens are split on single spaces with empties dropped — the exact
    ``list_filter(string_split(text,' '), x -> x <> '')`` oracle
    semantics."""
    tok_lists = texts.str.split(" ").map(lambda ts: [t for t in ts if t])
    lens = tok_lists.str.len().to_numpy()
    flat = np.array(
        [t for toks in tok_lists for t in toks], dtype=object
    )
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return flat, lens, starts


def _segment_sum(values: np.ndarray, lens: np.ndarray, starts: np.ndarray) -> np.ndarray:
    out = np.zeros(len(lens), np.int64)
    nonempty = lens > 0
    if values.size and nonempty.any():
        out[nonempty] = np.add.reduceat(values.astype(np.int64), starts[nonempty])
    return out


def quality_stats(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    stopwords: Optional[List[str]] = None,
    batch_size: int = 8192,
) -> Dataset:
    """Per-doc integer quality counters (oracle-exact):
    n_chars (utf8 length), n_tokens, n_stopwords (English profile by
    default), n_unique_tokens. Float quality scores derive from these
    downstream (:func:`quality_score`)."""
    stop = set(stopwords if stopwords is not None else LANG_PROFILES["en"])

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas().fillna("")
        flat, lens, starts = _flat_tokens(texts)
        is_stop = (
            pd.Series(flat).isin(stop).to_numpy()
            if len(flat)
            else np.zeros(0, bool)
        )
        n_stop = _segment_sum(is_stop, lens, starts)
        # unique tokens per doc: sort (doc, token-hash) pairs, count runs
        n_unique = np.zeros(len(lens), np.int64)
        if len(flat):
            doc_of = np.repeat(np.arange(len(lens)), lens)
            h = hash64(flat)
            order = np.lexsort((h, doc_of))
            d, hh = doc_of[order], h[order]
            new_run = np.concatenate(
                [[True], (d[1:] != d[:-1]) | (hh[1:] != hh[:-1])]
            )
            np.add.at(n_unique, d[new_run], 1)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_chars": pa.array(
                    texts.str.len().to_numpy(np.int64), pa.int64()
                ),
                "n_tokens": pa.array(lens.astype(np.int64), pa.int64()),
                "n_stopwords": pa.array(n_stop, pa.int64()),
                "n_unique_tokens": pa.array(n_unique, pa.int64()),
            }
        )

    ds = _as_dataset(source, columns=[id_col, text_col])
    return ds.map_batches(stats, batch_format="pyarrow", batch_size=batch_size)


def quality_score(
    source: Any, id_col: str = "doc_id", text_col: str = "text"
) -> Dataset:
    """Heuristic [0,1] quality score from the integer counters:
    stopword-ratio band + unique-token diversity + length band. The
    score combination is Ray-only (floats); the counters it reads are
    the oracle-checked surface."""
    stats = quality_stats(source, id_col, text_col)

    def score(batch: pa.Table) -> pa.Table:
        n_tok = batch["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_stop = batch["n_stopwords"].to_numpy(zero_copy_only=False)
        n_uniq = batch["n_unique_tokens"].to_numpy(zero_copy_only=False)
        safe = np.maximum(n_tok, 1.0)
        stop_ratio = n_stop / safe
        diversity = n_uniq / safe
        len_band = np.clip(n_tok / 50.0, 0.0, 1.0)
        s = 0.4 * np.clip(stop_ratio * 4, 0, 1) + 0.3 * diversity + 0.3 * len_band
        return batch.append_column("quality", pa.array(s, pa.float64()))

    return stats.map_batches(score, batch_format="pyarrow")


def language_id(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    batch_size: int = 8192,
) -> Dataset:
    """Stopword-profile language detection: per-language hit counts +
    ``detected_lang`` = argmax with alphabetical tie-break (the exact
    CASE/greatest order the oracle SQL uses). Output columns:
    id, hits_de..hits_zh (integers), detected_lang."""

    stop_sets = {lang: set(ws) for lang, ws in LANG_PROFILES.items()}

    def detect(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas().fillna("")
        flat, lens, starts = _flat_tokens(texts)
        flat_s = pd.Series(flat) if len(flat) else pd.Series([], dtype=object)
        hit_mat = np.zeros((len(lens), len(LANGS)), np.int64)
        for li, lang in enumerate(LANGS):
            hits = (
                flat_s.isin(stop_sets[lang]).to_numpy()
                if len(flat)
                else np.zeros(0, bool)
            )
            hit_mat[:, li] = _segment_sum(hits, lens, starts)
        best = np.argmax(hit_mat, axis=1)  # first max → alphabetical tie-break
        detected = np.array(LANGS, dtype=object)[best]
        cols = {id_col: batch[id_col]}
        for li, lang in enumerate(LANGS):
            cols[f"hits_{lang}"] = pa.array(hit_mat[:, li], pa.int64())
        cols["detected_lang"] = pa.array(detected, pa.string())
        return pa.table(cols)

    ds = _as_dataset(source, columns=[id_col, text_col])
    return ds.map_batches(detect, batch_format="pyarrow", batch_size=batch_size)


def fingerprint_md5(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    batch_size: int = 8192,
) -> Dataset:
    """Whole-document fingerprint: md5 of the whitespace-normalized,
    lowercased text — byte-identical to the DuckDB oracle
    ``md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))``.
    The per-row md5 call is C-speed hashing (the irreducible work)."""

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas().fillna("")
        norm = texts.str.lower().str.replace(_WS_RE, " ", regex=True).str.strip()
        digests = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in norm]
        return pa.table(
            {id_col: batch[id_col], "fingerprint": pa.array(digests, pa.string())}
        )

    ds = _as_dataset(source, columns=[id_col, text_col])
    return ds.map_batches(fp, batch_format="pyarrow", batch_size=batch_size)


def winnow_fingerprints(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 5,
    window: int = 4,
    batch_size: int = 8192,
) -> Dataset:
    """Winnowing document fingerprints (Schleimer et al. 2003): rolling
    64-bit hashes of character k-grams, one minimum per sliding window,
    distinct minima per doc. Emits (id, n_fingerprints, fingerprint_xor)
    — the xor aggregate is an order-free compact digest. Vectorized via
    one flat char-hash array per batch + ``sliding_window_view``."""

    def winnow(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas().fillna("")
        n_fp = np.zeros(len(texts), np.int64)
        fp_xor = np.zeros(len(texts), np.uint64)
        for i, t in enumerate(texts):  # per doc: numpy inner ops
            if len(t) < k:
                continue
            grams = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            if len(grams) < k:
                continue
            gv = np.lib.stride_tricks.sliding_window_view(grams, k).astype(np.uint64)
            h = np.zeros(len(gv), np.uint64)
            for c in range(k):
                h = h * np.uint64(1099511628211) + gv[:, c]
            if len(h) < window:
                mins = np.array([h.min()], np.uint64)
            else:
                wv = np.lib.stride_tricks.sliding_window_view(h, window)
                mins = wv.min(axis=1)
            uniq = np.unique(mins)
            n_fp[i] = len(uniq)
            fp_xor[i] = np.bitwise_xor.reduce(uniq)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_fingerprints": pa.array(n_fp, pa.int64()),
                "fingerprint_xor": pa.array(fp_xor, pa.uint64()),
            }
        )

    ds = _as_dataset(source, columns=[id_col, text_col])
    return ds.map_batches(winnow, batch_format="pyarrow", batch_size=batch_size)
