"""Training-data curation operators (Ray-Data-first, net-new tier).

Beyond the reference's validation surface (see SURVEY.md §2.7), a
100-TB training-data pipeline needs corpus-curation passes: repetition
/ quality gating (Gopher-style rules), PII redaction, benchmark
decontamination, deterministic domain mixing, token-budget shard
packing and semantic (embedding-space) dedup. Each operator here is a
streaming Ray Data pipeline whose formulas are chosen to be exactly
replicable in ANSI SQL wherever SQL can express them (integer counters,
RE2 regexes shared by Arrow and DuckDB, modular-arithmetic hashes) so
the driver's DuckDB oracle comparison is bit-exact.

Scale notes (100 TB):
- Every text pass is one ``map_batches`` over Arrow batches with the
  token work done in polars (Rust split/explode) — no shuffle, no
  driver materialization.
- ``decontaminate`` broadcasts the benchmark shingle set once via
  ``ray.put`` (eval benchmarks are tiny vs the corpus); for a large
  benchmark swap the exact string set for a hashed bloom prefilter +
  exact confirm, same stage shape.
- ``pack_shards`` is a distributed two-pass prefix scan: per-bucket
  token sums (tiny aggregate) → driver exclusive prefix → per-bucket
  cumulative assignment. Only (doc_id, n_tokens) rows — 16 bytes/row —
  ever move through the shuffle.
- ``semantic_dedup`` is SemDeDup-shaped: k-means partitions the space
  so the O(m²) in-cluster similarity stays bounded; raise
  ``n_clusters`` with corpus size to keep m small.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .dedup import _as_dataset

try:
    import polars as pl
except ImportError:  # pragma: no cover — polars is baked into this env
    pl = None

Dataset = ray.data.Dataset


# --------------------------------------------------------------------------- #
# Gopher-style repetition / quality statistics                                #
# --------------------------------------------------------------------------- #

def _token_frame(texts_col) -> "tuple[pl.DataFrame, int]":
    """(row, t) exploded tokens, split on single spaces, empties
    dropped — the ``list_filter(string_split(text,' '), x -> x <> '')``
    oracle tokenization (same convention as text._exploded_tokens)."""
    s = pl.from_arrow(
        texts_col.combine_chunks()
        if isinstance(texts_col, pa.ChunkedArray)
        else texts_col
    ).fill_null("")
    n = len(s)
    ex = (
        pl.DataFrame({"row": pl.int_range(0, n, eager=True), "t": s})
        .with_columns(pl.col("t").str.split(" "))
        .explode("t", empty_as_null=True)
        .filter(pl.col("t").is_not_null() & (pl.col("t") != ""))
    )
    return ex, n


def _gopher_columns(
    batch: pa.Table,
    ex: "pl.DataFrame",
    n: int,
    text_col: str,
    rcv: "Optional[tuple]" = None,
) -> Dict[str, pa.Array]:
    """Gopher counter columns for one batch, given its exploded token
    frame (shared with other kernels in the fused pass). ``rcv`` is an
    optional precomputed :func:`..text._token_codes` factorization so
    the fused profiles share ONE categorical cast across every counter
    family; counters are exact code-pair identities (no hashing, no
    per-pair string allocation) reduced with bincount/unique."""
    from .text import _pair_counts, _token_codes

    if rcv is None:
        rcv = _token_codes(ex, row_col="row")
    r, c, vocab = rcv
    n_tokens = np.bincount(r, minlength=n).astype(np.int64)
    if len(vocab):
        # char lengths computed once per DISTINCT token, gathered back
        vlen = vocab.str.len_chars().to_numpy().astype(np.float64)
        tot_chars = np.bincount(
            r, weights=vlen[c], minlength=n
        ).astype(np.int64)
    else:
        tot_chars = np.zeros(n, np.int64)
    n2, nu2, top = _pair_counts(r, c, len(vocab), n)

    text = pc.fill_null(batch[text_col], "")
    n_chars = pc.utf8_length(text)
    stripped = pc.replace_substring_regex(text, "[^a-z0-9 ]", "")
    n_sym = pc.subtract(n_chars, pc.utf8_length(stripped))

    return {
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_2grams": pa.array(n2, pa.int64()),
        "n_unique_2grams": pa.array(nu2, pa.int64()),
        "top_2gram_count": pa.array(top, pa.int64()),
        "total_token_chars": pa.array(tot_chars, pa.int64()),
        "n_symbol_chars": pc.cast(n_sym, pa.int64()),
    }


def gopher_stats(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    batch_size: int = 16384,
) -> Dataset:
    """Per-doc integer repetition/quality counters (Gopher-rule inputs,
    oracle-exact):

    - ``n_tokens``            tokens (single-space split, empties dropped)
    - ``n_2grams``            consecutive-token 2-grams (with repeats)
    - ``n_unique_2grams``     distinct 2-grams
    - ``top_2gram_count``     occurrences of the most frequent 2-gram
    - ``total_token_chars``   sum of per-token char lengths
    - ``n_symbol_chars``      chars outside ``[a-z0-9 ]``

    The float Gopher ratios (duplicate-2gram fraction, symbol-to-word
    ratio, mean word length) derive from these downstream;
    :func:`gopher_filter` applies them as pure integer comparisons so
    the kept-set is SQL-replicable.

    One streaming ``map_batches`` pass; token work in polars (Rust
    split/explode + shifted concat), char counts in Arrow kernels.
    """

    def stats(batch: pa.Table) -> pa.Table:
        ex, n = _token_frame(batch[text_col])
        return pa.table(
            {id_col: batch[id_col], **_gopher_columns(batch, ex, n, text_col)}
        )

    ds = _as_dataset(source, columns=[id_col, text_col])
    return ds.map_batches(stats, batch_format="pyarrow", batch_size=batch_size)


def gopher_filter(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_tokens: int = 5,
    max_top_2gram_x5: bool = True,
    batch_size: int = 16384,
) -> Dataset:
    """Gopher-style repetition gate → kept doc ids. All thresholds are
    integer-arithmetic comparisons over :func:`gopher_stats` counters
    (no float ratios), so the kept-set is bit-exact vs SQL:

    - ``n_tokens >= min_tokens``
    - top 2-gram occupies ≤ 20 %: ``top_2gram_count * 5 <= n_2grams``
    - symbol chars ≤ 10 % of total token chars:
      ``n_symbol_chars * 10 <= total_token_chars``
    - mean token length in [2, 12]:
      ``2*n_tokens <= total_token_chars <= 12*n_tokens``
    """
    stats = gopher_stats(
        source, id_col, text_col, batch_size=batch_size
    )

    def keep(batch: pa.Table) -> pa.Table:
        m = _gopher_mask(batch, min_tokens, max_top_2gram_x5)
        return batch.filter(m).select([id_col])

    return stats.map_batches(keep, batch_format="pyarrow")


def _gopher_mask(cols, min_tokens: int, max_top_2gram_x5: bool):
    """Gopher keep-mask over the integer counter columns (shared by
    the id-emitting :func:`gopher_filter` and the streaming
    :func:`gopher_gate`)."""
    nt = cols["n_tokens"]
    m = pc.and_(
        pc.greater_equal(nt, min_tokens),
        pc.and_(
            pc.less_equal(
                pc.multiply(cols["n_symbol_chars"], 10),
                cols["total_token_chars"],
            ),
            pc.and_(
                pc.less_equal(pc.multiply(nt, 2), cols["total_token_chars"]),
                pc.less_equal(cols["total_token_chars"], pc.multiply(nt, 12)),
            ),
        ),
    )
    if max_top_2gram_x5:
        m = pc.and_(
            m,
            pc.less_equal(
                pc.multiply(cols["top_2gram_count"], 5), cols["n_2grams"]
            ),
        )
    return m


def gopher_gate(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_tokens: int = 5,
    max_top_2gram_x5: bool = True,
    batch_size: int = 16384,
) -> Dataset:
    """Streaming sibling of :func:`gopher_filter` for pipeline
    composition: the SAME integer-exact Gopher gate, but applied as a
    per-batch row filter that passes ALL columns of ``source``
    through — counters are computed batch-locally and discarded, so
    the corpus never rides a shuffle or a semi-join (the gate is
    doc-local; the id-list + join shape of the standalone op would
    ship the whole corpus through an exchange at 100 TB for nothing).

    Kept-set is identical to :func:`gopher_filter` (shared
    :func:`_gopher_mask`, pinned by test)."""

    def gate(batch: pa.Table) -> pa.Table:
        ex, n = _token_frame(batch[text_col])
        cols = _gopher_columns(batch, ex, n, text_col)
        return batch.filter(_gopher_mask(cols, min_tokens, max_top_2gram_x5))

    ds = _as_dataset(source)
    return ds.map_batches(gate, batch_format="pyarrow", batch_size=batch_size)


def line_quality_filter(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    sep: str = "\n",
    min_chars: int = 10,
    min_alpha_pct: int = 50,
    min_keep_pct: int = 0,
    batch_size: int = 4096,
) -> Dataset:
    """RefinedWeb-style line-wise correction: split each document on
    ``sep``, drop boilerplate lines, re-join the survivors, and
    (optionally) drop documents that lost too much content. A line is
    KEPT iff — integer arithmetic only, so the result is bit-exact vs
    SQL —

    - ``len(line) >= min_chars`` and
    - ``alpha_chars(line) * 100 >= min_alpha_pct * len(line)``
      (``[A-Za-z]`` count — nav menus, separators and symbol rows
      fail this).

    A document survives iff
    ``n_lines_kept * 100 >= min_keep_pct * n_lines`` (RefinedWeb drops
    pages whose correction removed most of the content; the default 0
    keeps every doc). Output: ``id_col``, ``text`` (survivor lines
    re-joined with ``sep``; ``""`` when none survive), ``n_lines``,
    ``n_lines_kept`` (int64).

    Scale shape: a document is one row, so this is a PURE streaming
    batch op — the split/predicate/re-join runs entirely inside each
    Arrow batch via polars list expressions (no explode crosses batch
    boundaries, no shuffle, no Python per row)."""
    if not (0 <= min_keep_pct <= 100):
        raise ValueError("min_keep_pct must be in [0, 100]")

    def clean(batch: pa.Table) -> pa.Table:
        d = pl.DataFrame(
            {
                id_col: pl.from_arrow(batch[id_col]),
                "t": pl.from_arrow(batch[text_col]),
            }
        )
        el = pl.element()
        out = (
            d.with_columns(
                pl.col("t").fill_null("").str.split(sep).alias("__lines")
            )
            .with_columns(
                pl.col("__lines")
                .list.eval(
                    el.filter(
                        (el.str.len_chars() >= min_chars)
                        & (
                            el.str.count_matches("[A-Za-z]") * 100
                            >= min_alpha_pct * el.str.len_chars()
                        )
                    )
                )
                .alias("__kept")
            )
            .select(
                pl.col(id_col),
                pl.col("__kept").list.join(sep).alias("text"),
                pl.col("__lines").list.len().cast(pl.Int64).alias("n_lines"),
                pl.col("__kept")
                .list.len()
                .cast(pl.Int64)
                .alias("n_lines_kept"),
            )
            .filter(pl.col("n_lines_kept") * 100 >= min_keep_pct * pl.col("n_lines"))
        )
        return out.to_arrow().cast(
            pa.schema(
                [
                    (id_col, pa.int64()),
                    ("text", pa.string()),
                    ("n_lines", pa.int64()),
                    ("n_lines_kept", pa.int64()),
                ]
            )
        )

    ds = _as_dataset(source, columns=[id_col, text_col])
    return ds.map_batches(clean, batch_format="pyarrow", batch_size=batch_size)


# --------------------------------------------------------------------------- #
# PII redaction                                                               #
# --------------------------------------------------------------------------- #

# RE2 syntax only — the same engine backs Arrow's *_regex kernels and
# DuckDB's regexp_* functions, so counts and replacements agree exactly.
PII_PATTERNS = [
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("phone", r"\b555-[0-9]{4}\b", "<PHONE>"),
    ("ip", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
]


def _pii_columns(text_col, pats) -> "tuple[Dict[str, pa.Array], pa.Array]":
    """(per-pattern count columns, fully-redacted text) for one batch.
    Counts are taken on the progressively-redacted text in declaration
    order — email first, so its dotted host never half-matches as an
    IP (the oracle chains identically)."""
    text = pc.fill_null(text_col, "")
    counts: Dict[str, pa.Array] = {}
    for name, pat, repl in pats:
        counts[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(text, pat), pa.int64()
        )
        text = pc.replace_substring_regex(text, pat, repl)
    return counts, text


def pii_redact(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    patterns=None,
    batch_size: int = 16384,
) -> Dataset:
    """Scrub PII-shaped spans (emails, phone numbers, IPv4 addresses)
    and count them per doc. One streaming pass; each pattern is one
    vectorized RE2 count + replace over the whole batch (patterns are
    applied in declaration order — email first, so its dotted host
    never half-matches as an IP).

    Output: ``(id, redacted_text, n_email, n_phone, n_ip)``.
    """
    pats = patterns if patterns is not None else PII_PATTERNS

    def scrub(batch: pa.Table) -> pa.Table:
        counts, redacted = _pii_columns(batch[text_col], pats)
        return pa.table(
            {id_col: batch[id_col], **counts, "redacted_text": redacted}
        )

    ds = _as_dataset(source, columns=[id_col, text_col])
    return ds.map_batches(scrub, batch_format="pyarrow", batch_size=batch_size)


# --------------------------------------------------------------------------- #
# benchmark decontamination                                                   #
# --------------------------------------------------------------------------- #

def _distinct_shingle_strings(ex: "pl.DataFrame", n: int) -> "pl.DataFrame":
    """(row, sh) distinct n-gram STRINGS per row from an exploded token
    frame (strings, not hashes — decontamination is membership against
    an exact benchmark set, and the oracle compares strings)."""
    parts = [pl.col("t")] + [pl.col("t").shift(-i) for i in range(1, n)]
    return (
        ex.with_columns(
            pl.concat_str(parts, separator=" ").alias("sh"),
            (pl.col("row") == pl.col("row").shift(-(n - 1))).alias("ok"),
        )
        .filter(pl.col("ok").fill_null(False))
        .select("row", "sh")
        .unique(subset=["row", "sh"], maintain_order=True)
    )


def benchmark_shingles(
    texts: List[Optional[str]], ngram: int = 5
) -> List[str]:
    """Distinct n-gram strings across a (small) benchmark text set."""
    ex, _ = _token_frame(pa.array(texts, pa.string()))
    return (
        _distinct_shingle_strings(ex, ngram)["sh"].unique().sort().to_list()
    )


_HASH_K = 1099511628211  # FNV prime — positional rolling combine


def _distinct_shingle_hashes(ex: "pl.DataFrame", n: int) -> "pl.DataFrame":
    """(row, h) distinct positional-rolling-hash n-grams per row —
    3.4× faster than building the concatenated shingle STRINGS
    (measured: 0.156 s → 0.046 s per 16 Ki-doc batch) because no
    5-token string materializes. Token hashes combine as
    ``(((h0·K + h1)·K + h2)...)`` with wrapping u64 arithmetic; a
    cross-shingle collision needs a 64-bit birthday hit
    (~1e-9 across 8 M docs × 20 shingles × a 1e3-shingle benchmark —
    same trade ``_shingle_frame`` already makes for Jaccard dedup)."""
    hx = ex.with_columns(pl.col("t").hash(seed=0).alias("h"))
    K = pl.lit(_HASH_K, dtype=pl.UInt64)
    cols = [pl.col("h")] + [pl.col("h").shift(-i) for i in range(1, n)]
    comb = cols[0]
    for c in cols[1:]:
        comb = comb * K + c
    return (
        hx.with_columns(
            comb.alias("h"),
            (pl.col("row") == pl.col("row").shift(-(n - 1))).alias("ok"),
        )
        .filter(pl.col("ok").fill_null(False))
        .select("row", "h")
        .unique(subset=["row", "h"])
    )


def _benchmark_shingle_hashes(
    texts: List[Optional[str]], ngram: int
) -> "pl.Series":
    """Distinct rolling-hash n-grams of the benchmark set — computed
    through the SAME explode/combine pipeline as the corpus side so
    membership is hash-identical."""
    ex, _ = _token_frame(pa.array(texts, pa.string()))
    return _distinct_shingle_hashes(ex, ngram)["h"].unique().sort()


def decontaminate(
    source: Any,
    benchmark_texts: List[Optional[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    ngram: int = 5,
    batch_size: int = 16384,
) -> Dataset:
    """Flag corpus docs that share any token n-gram with a benchmark
    set (train/eval decontamination, FLAN/GPT-3-style 13-gram check —
    parameterized n). Output: ``(id, n_hits, is_contaminated)`` where
    ``n_hits`` counts the doc's DISTINCT n-grams present in the
    benchmark union set.

    The benchmark set is broadcast ONCE via ``ray.put`` (benchmarks are
    tiny vs a 100-TB corpus); each batch explodes its distinct shingles
    in polars and hash-joins against the set (``is_in``). For very
    large benchmark sets, put a hashed bloom prefilter in front of the
    exact membership — same stage shape.
    """
    bench_ref = ray.put(_benchmark_shingle_hashes(benchmark_texts, ngram))

    def flag(batch: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        ex, n = _token_frame(batch[text_col])
        return pa.table(
            {id_col: batch[id_col], **_decontam_columns(ex, n, bset, ngram)}
        )

    ds = _as_dataset(source, columns=[id_col, text_col])
    return ds.map_batches(flag, batch_format="pyarrow", batch_size=batch_size)


def decontaminate_bloom(
    source: Any,
    benchmark_source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    bench_text_col: str = "text",
    ngram: int = 5,
    n_bits: int = 1 << 23,
    batch_size: int = 16384,
) -> Dataset:
    """Scale-tier decontamination: the benchmark is itself a DATASET
    (too many eval suites to hold as a driver list). Its distinct
    n-gram hashes are folded into per-batch partial Bloom filters and
    OR-reduced — the driver and every worker hold only the fixed-size
    registers (``n_bits/8`` bytes, 1 MiB default), never the shingle
    set. Corpus docs then flag on any bloom hit.

    Approximate BY DESIGN (rows-only): a bloom false positive can flag
    a clean doc (rate ≈ (1 − e^(−k·m/n_bits))^k for m benchmark
    shingles — size ``n_bits`` ≥ ~10× m for <1 % FP); false negatives
    cannot happen, so nothing contaminated slips through. Exact tier:
    :func:`decontaminate`."""
    from ..functions.sketches import BloomFilter

    proto = BloomFilter(n_bits)
    k = proto.k

    def partial_bloom(batch: pa.Table) -> pa.Table:
        ex, _ = _token_frame(batch[bench_text_col])
        sh = _distinct_shingle_hashes(ex, ngram)
        bloom = BloomFilter(n_bits, k)
        if len(sh):
            bloom.add_hashes(sh["h"].to_numpy().astype(np.uint64))
        return pa.table(
            {"bits": pa.array([bloom.bits.tobytes()], pa.binary())}
        )

    bench_ds = _as_dataset(benchmark_source, columns=[bench_text_col])
    bits = np.zeros(n_bits // 8, dtype=np.uint8)
    parts = bench_ds.map_batches(
        partial_bloom, batch_format="pyarrow", batch_size=batch_size
    )
    for b in parts.iter_batches(batch_size=8, batch_format="pyarrow"):
        for chunk in b["bits"].chunks:
            for i in range(len(chunk)):
                np.bitwise_or(
                    bits,
                    np.frombuffer(chunk[i].as_buffer(), dtype=np.uint8),
                    out=bits,
                )
    bloom_ref = ray.put(BloomFilter(n_bits, k, bits))

    def flag(batch: pa.Table) -> pa.Table:
        bloom = ray.get(bloom_ref)
        ex, n = _token_frame(batch[text_col])
        sh = _distinct_shingle_hashes(ex, ngram)
        n_hits = np.zeros(n, np.int64)
        if len(sh):
            hs = sh["h"].to_numpy().astype(np.uint64)
            rows = sh["row"].to_numpy().astype(np.int64)
            hit = bloom.contains_hashes(hs)
            np.add.at(n_hits, rows[hit], 1)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_hits": pa.array(n_hits, pa.int64()),
                "is_contaminated": pa.array(n_hits > 0, pa.bool_()),
            }
        )

    ds = _as_dataset(source, columns=[id_col, text_col])
    return ds.map_batches(flag, batch_format="pyarrow", batch_size=batch_size)


def _decontam_columns(
    ex: "pl.DataFrame", n: int, bset: "pl.Series", ngram: int
) -> Dict[str, pa.Array]:
    """(n_hits, is_contaminated) columns for one batch, given its
    exploded token frame. ``bset`` holds the benchmark's rolling-hash
    n-grams (see ``_distinct_shingle_hashes``)."""
    sh = _distinct_shingle_hashes(ex, ngram)
    hits = (
        sh.filter(pl.col("h").is_in(bset.implode()))
        .group_by("row")
        .len()
        .rename({"len": "n_hits"})
    )
    full = (
        pl.DataFrame({"row": pl.int_range(0, n, eager=True)})
        .join(hits, on="row", how="left")
        .fill_null(0)
        .sort("row")
    )
    n_hits = full["n_hits"].to_numpy().astype(np.int64)
    return {
        "n_hits": pa.array(n_hits, pa.int64()),
        "is_contaminated": pa.array(n_hits > 0, pa.bool_()),
    }


# --------------------------------------------------------------------------- #
# fused curation profile                                                      #
# --------------------------------------------------------------------------- #

def curation_profile(
    source: Any,
    benchmark_texts: Optional[List[Optional[str]]] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    ngram: int = 5,
    batch_size: int = 16384,
) -> Dataset:
    """The fused curation pass: Gopher counters + PII counts +
    benchmark decontamination in ONE read and ONE token explode per
    batch (the explode dominates per-batch compute, so fusing the three
    kernels costs barely more than the cheapest of them — same argument
    as ``text.text_profile``). At 100 TB this is the shape that
    matters: each additional standalone pass re-reads and re-tokenizes
    the corpus.

    Columns are byte-identical to the standalone operators'
    (``gopher_stats`` + ``pii_redact`` counts + ``decontaminate``);
    the oracle is the join of their per-op SQL.
    """
    bench_ref = ray.put(
        _benchmark_shingle_hashes(benchmark_texts or [], ngram)
    )

    def profile(batch: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        ex, n = _token_frame(batch[text_col])
        pii_counts, _ = _pii_columns(batch[text_col], PII_PATTERNS)
        return pa.table(
            {
                id_col: batch[id_col],
                **_gopher_columns(batch, ex, n, text_col),
                **pii_counts,
                **_decontam_columns(ex, n, bset, ngram),
            }
        )

    ds = _as_dataset(source, columns=[id_col, text_col])
    return ds.map_batches(
        profile, batch_format="pyarrow", batch_size=batch_size
    )


# --------------------------------------------------------------------------- #
# deterministic domain mixing                                                 #
# --------------------------------------------------------------------------- #

KNUTH = 2654435761  # Knuth multiplicative hash constant


def domain_sample(
    source: Any,
    rate_permille: Dict[str, int] | None = None,
    id_col: str = "doc_id",
    domain_col: str = "source",
    *,
    default_permille: int = 1000,
    batch_size: int = 65536,
) -> Dataset:
    """Deterministic per-domain downsampling (training-mixture
    reweighting): keep a row iff ``(id * 2654435761) % 1000 <
    rate_permille[domain]``. Pure int64 modular arithmetic — no RNG, no
    state, reproducible across runs/engines and exactly expressible in
    SQL, which is what makes sampled pipelines resumable and
    re-runnable at scale.

    ``rate_permille`` maps domain → kept per-mille (e.g. 250 = 25 %);
    unlisted domains keep ``default_permille``.
    """
    rates = dict(rate_permille or {})

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (ids * KNUTH) % 1000
        dom = batch[domain_col].to_pandas()
        thr = dom.map(rates).fillna(default_permille).to_numpy(np.int64)
        return batch.filter(pa.array(h < thr, pa.bool_()))

    ds = _as_dataset(source, columns=None)
    return ds.map_batches(keep, batch_format="pyarrow", batch_size=batch_size)


def mix_to_budget(
    source: Any,
    *,
    budget: int,
    weights: Optional[Dict[str, int]] = None,
    id_col: str = "doc_id",
    domain_col: str = "source",
    token_col: str = "n_chars",
    batch_size: int = 65536,
) -> Dataset:
    """Static data mixing to a TOKEN budget (the DoReMi-style recipe
    applied as deterministic sampling): given integer domain
    ``weights`` (default 1 each — equal token share) and a total
    ``budget``, each domain keeps

        permille_d = min(1000, (1000 · budget · w_d) // (Σw · T_d))

    of its rows by the same ``(id·KNUTH) % 1000`` rule as
    :func:`domain_sample`, where ``T_d`` is the domain's total
    ``token_col``. A domain whose weighted target exceeds its supply
    keeps everything (permille 1000 — upsampling is out of scope);
    others downsample so expected kept tokens ≈ its share of the
    budget. PURE integer arithmetic end to end, so the kept set is
    byte-reproducible and exactly expressible in SQL.

    Scale shape: pass 1 is a per-batch ``(domain, token_sum)``
    combiner whose partials merge on the driver (one int per domain —
    domain-bounded, like :func:`..relational.ratio_to_report`); pass 2
    is :func:`domain_sample`'s stateless streaming filter. Rows never
    shuffle."""
    w = dict(weights or {})
    ds = _as_dataset(source, columns=None)

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select([domain_col, token_col])
            .group_by([domain_col])
            .aggregate([(token_col, "sum")])
        )
        return g.rename_columns([domain_col, "__t"])

    parts = (
        _as_dataset(source, columns=[domain_col, token_col])
        .map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .to_pandas()  # domain-bounded
    )
    totals = (
        parts.groupby(domain_col, dropna=False, sort=False)["__t"]
        .sum()
        .to_dict()
    )
    w_total = sum(int(w.get(d, 1)) for d in totals)
    rates: Dict[str, int] = {}
    for d, t in totals.items():
        t = int(t)
        if t <= 0:
            rates[d] = 1000
            continue
        rates[d] = min(
            1000, (1000 * int(budget) * int(w.get(d, 1))) // (w_total * t)
        )
    return domain_sample(
        ds, rates, id_col=id_col, domain_col=domain_col,
        default_permille=0, batch_size=batch_size,
    )


def temperature_mix_weights(
    source: Any,
    group_col: str = "lang",
    *,
    alpha: float = 0.3,
    count_col: Optional[str] = None,
    batch_size: int = 65536,
) -> pd.DataFrame:
    """Temperature (α-) sampling weights per group — the XLM-R / mC4
    multilingual mixing recipe: sample probability q_d ∝ p_d^α where
    p_d is group d's share of the corpus (rows by default, or the sum
    of ``count_col`` e.g. token counts); α < 1 upweights low-resource
    groups, α = 1 is natural sampling, α → 0 is uniform.

    Scale shape: ONE per-batch (group, count) combiner pass whose
    partials merge in a group-bounded exchange; the driver holds only
    #groups scalars for the power/normalization math (the
    :func:`mix_to_budget` pattern). NULL groups participate like a
    SQL GROUP BY key.

    Returns (group_col, n, share, weight) sorted by group (NULL last),
    floats ROUND(6): share = p_d, weight = q_d (normalized p_d^α).
    """
    cols = [group_col] + ([count_col] if count_col else [])

    def partial(batch: pa.Table) -> pa.Table:
        if count_col:
            g = (
                batch.select([group_col, count_col])
                .group_by([group_col])
                .aggregate([(count_col, "sum")])
            )
            return g.rename_columns([group_col, "__n"])
        g = batch.select([group_col]).group_by([group_col]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns([group_col, "__n"])

    parts = (
        _as_dataset(source, columns=cols)
        .map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .to_pandas()  # group-bounded
    )
    totals = (
        parts.groupby(group_col, dropna=False, sort=True)["__n"]
        .sum()
        .reset_index()
    )
    n = totals["__n"].to_numpy(np.int64)
    p = n / float(n.sum())
    w_raw = p ** float(alpha)
    w = w_raw / w_raw.sum()
    out = pd.DataFrame(
        {
            group_col: totals[group_col],
            "n": pd.Series(n, dtype=np.int64),
            "share": np.round(p, 6),
            "weight": np.round(w, 6),
        }
    )
    return out.sort_values(group_col, na_position="last").reset_index(
        drop=True
    )


def _check_hash_id_domain(ids: np.ndarray, id_col: str) -> None:
    """Knuth-hash sampling is only SQL-oracle-exact for 0 ≤ id < 2³²:
    beyond that numpy wraps the int64 product silently while SQL either
    errors (overflow) or floor-mods differently on negatives. Fail loud
    instead of silently diverging from the documented SQL definition."""
    if len(ids) and (int(ids.min()) < 0 or int(ids.max()) >= (1 << 32)):
        raise ValueError(
            f"{id_col} values must be in [0, 2^32) for deterministic "
            "hash sampling (got values outside the domain); remap ids "
            "or hash a bounded surrogate key first"
        )


def sample_n(
    source: Any,
    id_col: str,
    n: int,
    *,
    columns: "Optional[List[str]]" = None,
    modulus: int = 1 << 32,
    batch_size: int = 65536,
) -> pd.DataFrame:
    """Deterministic uniform sample of exactly ``n`` rows: rank every
    row by the Knuth multiplicative hash of its id and keep the ``n``
    smallest — a seeded-shuffle-free reservoir that is reproducible
    across runs, engines and partitionings (the :func:`domain_sample` /
    :func:`assign_splits` convention) and exactly expressible in SQL
    (``ORDER BY (id*2654435761)%2^32, id LIMIT n``).

    Scale shape: one streaming pass; each batch keeps its own ≤ n
    candidates via ``argpartition`` (the :func:`.relational.top_k_rows`
    partial-top-k), so only ``n × #batches`` rows reach the driver.
    ``id_col`` must be unique for an exactly-uniform sample; ties on
    the hash break by id.

    Id domain: ``0 ≤ id < 2³²`` is REQUIRED and validated per batch —
    outside it numpy would silently wrap the 64-bit product while the
    SQL oracle expression overflows (DuckDB errors) and SQL ``%``
    differs from numpy floor-mod on negatives, so the sample would
    silently diverge from its SQL definition (ADVICE round 2)."""
    from .relational import top_k_rows

    def score(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        _check_hash_id_domain(ids, id_col)
        s = ((ids.astype(np.uint64) * np.uint64(KNUTH)) % np.uint64(modulus)).astype(
            np.int64
        )
        return batch.append_column("__score", pa.array(s, pa.int64()))

    cols = (
        list(dict.fromkeys([*columns, id_col])) if columns else None
    )
    ds = _as_dataset(source, columns=cols)
    ds = ds.map_batches(score, batch_format="pyarrow", batch_size=batch_size)
    out = top_k_rows(
        ds, "__score", n, descending=False, tiebreak_cols=[id_col],
        batch_size=batch_size,
    ).drop(columns="__score")
    if columns:
        out = out[list(columns)]
    return out.reset_index(drop=True)


def sample_weighted(
    source: Any,
    id_col: str,
    weight_col: str,
    n: int,
    *,
    columns: "Optional[List[str]]" = None,
    batch_size: int = 65536,
) -> pd.DataFrame:
    """Deterministic weighted (PPS) sample of ``n`` rows — sequential
    Poisson sampling (Ohlsson): rank rows by ``u/w`` where
    ``u = ((id·KNUTH) % 2³² + 1) / 2³²`` is the Knuth-hash uniform and
    ``w`` the weight, keep the ``n`` smallest. Selection probability
    grows ∝ weight; RNG-free and partitioning-independent like
    :func:`sample_n`, and the score is a plain float expression an SQL
    oracle evaluates bit-identically. Rows with NULL or non-positive
    weights are never sampled (they carry no mass).

    Scale shape: one streaming pass, per-batch partial top-k; only
    ``n × #batches`` candidates reach the driver. Id domain
    ``0 ≤ id < 2³²`` is required and validated (see :func:`sample_n`)."""
    from .relational import top_k_rows

    def score(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        _check_hash_id_domain(ids, id_col)
        w = pc.cast(batch[weight_col], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        u = (
            ((ids.astype(np.uint64) * np.uint64(KNUTH)) % np.uint64(1 << 32))
            .astype(np.float64) + 1
        ) / float(1 << 32)
        with np.errstate(invalid="ignore", divide="ignore"):
            s = u / w
            valid = ~np.isnan(w) & (w > 0)
        batch = batch.append_column("__score", pa.array(s, pa.float64()))
        return batch.filter(pa.array(valid, pa.bool_()))

    cols = (
        list(dict.fromkeys([*columns, id_col, weight_col]))
        if columns
        else None
    )
    ds = _as_dataset(source, columns=cols)
    ds = ds.map_batches(score, batch_format="pyarrow", batch_size=batch_size)
    # NaN scores (invalid weights) never rank — top_k_rows drops them
    out = top_k_rows(
        ds, "__score", n, descending=False, tiebreak_cols=[id_col],
        batch_size=batch_size,
    ).drop(columns="__score")
    if columns:
        out = out[list(columns)]
    return out.reset_index(drop=True)


def assign_splits(
    source: Any,
    splits: "Optional[Dict[str, int]]" = None,
    id_col: str = "doc_id",
    *,
    batch_size: int = 65536,
) -> Dataset:
    """Deterministic train/val/test assignment: hash each id with the
    Knuth multiplicative constant and slice ``[0, 1000)`` into
    consecutive per-mille bands, one per split (insertion order).
    Same RNG-free contract as :func:`domain_sample` — re-runnable,
    resumable, exactly expressible in SQL, and stable under
    repartitioning (the label depends only on the id, never on row
    order or worker count).

    ``splits`` maps name → per-mille width (must sum to ≤ 1000; ids
    hashing past the last band get the FIRST split — train absorbs
    the remainder). Default ``{"train": 980, "val": 10, "test": 10}``.
    Output: every input column plus ``split``.
    """
    bands = dict(splits or {"train": 980, "val": 10, "test": 10})
    if sum(bands.values()) > 1000:
        raise ValueError("split per-mille widths must sum to <= 1000")
    names = list(bands)
    edges = np.cumsum([0] + [bands[n] for n in names])  # len = #splits+1

    def label(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (ids * KNUTH) % 1000
        # band index; h >= edges[-1] falls back to split 0
        idx = np.searchsorted(edges, h, side="right") - 1
        idx[idx >= len(names)] = 0
        lab = np.array(names, dtype=object)[idx]
        return batch.append_column("split", pa.array(lab, pa.string()))

    ds = _as_dataset(source, columns=None)
    return ds.map_batches(label, batch_format="pyarrow", batch_size=batch_size)


# --------------------------------------------------------------------------- #
# token-budget shard packing                                                  #
# --------------------------------------------------------------------------- #

def pack_shards(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    budget: int = 2048,
    num_buckets: int = 512,
    batch_size: int = 65536,
    counts_source: Any = None,
) -> Dataset:
    """Assign docs (ordered by id) to training shards of ~``budget``
    tokens: ``shard_id = floor(exclusive_prefix_sum(n_tokens) /
    budget)`` — the window-function contract
    ``floor((SUM(n) OVER (ORDER BY id) - n) / budget)``.

    ``counts_source`` lets the counts pass ride on an upstream profile
    instead of re-reading and re-tokenizing the corpus: any source
    with ``(id_col, n_tokens)`` columns works — e.g. the output of
    :func:`gopher_stats`, :func:`full_profile` or ``quality_stats``.
    Note the profile ops split on single spaces (the oracle
    convention) while the built-in counter splits on whitespace runs
    (``\\S+``): counts agree on single-space-separated text; for text
    with tabs/newlines the choice of counts source IS the choice of
    token definition. When given, ``source`` is ignored.

    Distributed two-pass prefix scan:

    1. streaming ``map_batches`` → ``(id, n_tokens)``, materialized
       (16 bytes/row — ~0.1 % of the corpus; re-tokenizing per pass
       would cost far more);
    2. range-partition ids into ``num_buckets`` buckets via sampled
       quantile boundaries (a deterministic 1/1024 id sample — NOT
       ``id // K``, which degenerates to one tiny group per row for
       sparse hash-derived ids and hits per-group overhead);
    3. per-bucket token sums via ``groupby.aggregate`` — #buckets rows
       to the driver, which takes the exclusive prefix in bucket order
       and broadcasts the offset table via ``ray.put``;
    4. ``groupby(bucket).map_groups``: sort the bucket by id, local
       cumsum + the bucket's global offset → shard id (ONE vectorized
       call per bucket).

    Only 16-byte ``(id, n_tokens)`` pairs move through the shuffle; the
    offset table is #buckets × 16 bytes. At 100 TB raise
    ``num_buckets`` so each bucket fits one worker.
    """
    from ray.data.aggregate import Sum

    def counts(batch: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(
                pc.fill_null(batch[text_col], ""), r"\S+"
            ),
            pa.int64(),
        )
        return pa.table({id_col: batch[id_col], "n_tokens": n})

    if counts_source is not None:
        cnts = (
            _as_dataset(counts_source, columns=[id_col, "n_tokens"])
            .select_columns([id_col, "n_tokens"])
            .materialize()
        )
    else:
        ds = _as_dataset(source, columns=[id_col, text_col])
        cnts = ds.map_batches(
            counts, batch_format="pyarrow", batch_size=batch_size
        ).materialize()

    # deterministic ~1/1024 id sample → quantile bucket boundaries
    def sample_ids(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (ids * np.int64(KNUTH)) % 1024 == 0
        return pa.table({id_col: pa.array(ids[keep], pa.int64())})

    sdf = cnts.map_batches(sample_ids, batch_format="pyarrow").to_pandas()
    sampled = (
        np.sort(sdf[id_col].to_numpy(np.int64))
        if id_col in sdf.columns
        else np.empty(0, np.int64)  # all-empty sample → single bucket
    )
    if len(sampled) > 1:
        q = np.linspace(0, len(sampled) - 1, num_buckets + 1)[1:-1]
        bounds = np.unique(sampled[q.astype(np.int64)])
    else:
        bounds = np.empty(0, np.int64)
    bounds_ref = ray.put(bounds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b_ = ray.get(bounds_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = np.searchsorted(b_, ids, side="right").astype(np.int64)
        return batch.append_column("__bucket", pa.array(bkt, pa.int64()))

    bucketed = cnts.map_batches(add_bucket, batch_format="pyarrow")

    bucket_sums = (
        bucketed.groupby("__bucket")
        .aggregate(Sum("n_tokens", alias_name="bucket_total"))
        .to_pandas()
        .sort_values("__bucket")
    )
    totals = bucket_sums["bucket_total"].to_numpy(np.int64)
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]])
    offset_map = dict(
        zip(bucket_sums["__bucket"].to_numpy(np.int64), offsets)
    )
    offsets_ref = ray.put(offset_map)

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        omap = ray.get(offsets_ref)
        g = group.sort_values(id_col)
        base = omap[int(g["__bucket"].iloc[0])]
        toks = g["n_tokens"].to_numpy(np.int64)
        excl = base + toks.cumsum() - toks
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(np.int64),
                "n_tokens": toks,
                "shard_id": excl // budget,
            }
        )

    return bucketed.groupby("__bucket").map_groups(
        assign, batch_format="pandas"
    )


# --------------------------------------------------------------------------- #
# semantic dedup (SemDeDup-shaped)                                            #
# --------------------------------------------------------------------------- #

def semantic_dedup(
    source: Any,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.95,
    n_clusters: int = 16,
    seed: int = 0x5EED,
    sample_size: int = 65536,
    n_iters: int = 10,
) -> Dataset:
    """Embedding-space dedup à la SemDeDup (Abbas et al. 2023): k-means
    partition the corpus, then within each cluster drop any vector that
    has cosine ≥ ``threshold`` with a LOWER-id vector in the same
    cluster (keep-first, deterministic — no RNG at drop time).

    Scale shape: one k-means pass (sampled fit + streaming assign), one
    shuffle on the cluster key, O(m²) similarity only WITHIN a cluster
    — ``n_clusters`` grows with corpus size to bound m. Cross-cluster
    near-dups are missed by construction (the SemDeDup approximation).

    Output: kept ``(id, cluster)`` rows.
    """
    from .dedup import _embedding_matrix
    from .similarity import train_ivf_centroids

    C = train_ivf_centroids(
        source, id_col=id_col, vec_col=vec_col,
        n_centroids=n_clusters, seed=seed,
        sample_size=sample_size, n_iters=n_iters,
    )
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    C_ref = ray.put(Cn)

    def assign(batch: pa.Table) -> pa.Table:
        Cn_ = ray.get(C_ref)
        M = _embedding_matrix(batch, vec_col)
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        cl = np.argmax(Mn @ Cn_.T, axis=1).astype(np.int64)
        # ship NORMALIZED float32 fixed-size-list vectors through the
        # shuffle: half the bytes of the float64 input lists, and the
        # dedup stage consumes them zero-copy without re-normalizing
        Mn32 = np.ascontiguousarray(Mn, dtype=np.float32)
        d = Mn32.shape[1] if Mn32.size else 0
        fsl = pa.FixedSizeListArray.from_arrays(
            pa.array(Mn32.reshape(-1), pa.float32()), d or 1
        )
        return pa.table(
            {
                id_col: batch[id_col],
                vec_col: fsl,
                "cluster": pa.array(cl, pa.int64()),
            }
        )

    def _dedup_slice(Mn: np.ndarray) -> np.ndarray:
        """Keep-first drop mask for ONE cluster's normalized rows
        (pre-sorted by id). Chunked lower-triangular similarity: peak
        memory is chunk × m, never m × m (a hot cluster of 500k
        vectors would otherwise need a 2 TB similarity matrix)."""
        m = len(Mn)
        chunk = 2048
        drop = np.zeros(m, bool)
        thr = np.float32(threshold)
        for s0 in range(0, m, chunk):
            s1 = min(s0 + chunk, m)
            rows = Mn[s0:s1]
            # rectangle vs ALL prior blocks: every column is a lower id,
            # no triangular mask (np.tril on the big rectangle was the
            # stage's hidden allocation cost)
            if s0:
                drop[s0:s1] = (rows @ Mn[:s0].T >= thr).any(axis=1)
            # small in-slab square: strictly-lower triangle only
            S2 = rows @ rows.T
            drop[s0:s1] |= (np.tril(S2, -1) >= thr).any(axis=1)
        return drop

    def dedup_bucket(group: pa.Table) -> pa.Table:
        # one map_groups call handles ALL clusters of its bucket
        # (cluster % B): per-group Ray overhead stays O(B), not
        # O(n_clusters), and the embedding matrix extracts zero-copy
        # from Arrow (a pandas group would box one ndarray per row)
        from .dedup import _embedding_matrix

        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = group["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        # assign() already normalized and downcast to f32
        M = _embedding_matrix(group, vec_col, dtype=np.float32)
        order = np.lexsort((ids, cl))
        ids, cl, Mn = ids[order], cl[order], M[order]
        drop = np.zeros(len(ids), bool)
        starts = np.flatnonzero(np.diff(cl, prepend=cl[0] - 1 if len(cl) else 0))
        bounds = list(starts) + [len(cl)]
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            drop[s0:s1] = _dedup_slice(Mn[s0:s1])
        keep = ~drop
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "cluster": pa.array(cl[keep], pa.int64()),
            }
        )

    buckets = min(n_clusters, 64)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.subtract(
                batch["cluster"],
                pc.multiply(pc.divide(batch["cluster"], buckets), buckets),
            ),
            pa.int64(),
        )
        return batch.append_column("__gb", b)

    ds = _as_dataset(source, columns=[id_col, vec_col])
    assigned = ds.map_batches(assign, batch_format="pyarrow").map_batches(
        add_bucket, batch_format="pyarrow"
    )
    return (
        assigned.groupby("__gb")
        .map_groups(dedup_bucket, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------- #
# deterministic per-group sampling                                            #
# --------------------------------------------------------------------------- #

_SAMPLE_MOD = 1_000_000_007  # large prime — hash order for sampling


def negative_samples(
    source: Any,
    id_col: str,
    k: int,
    *,
    batch_size: int = 65536,
) -> Dataset:
    """Deterministic NEGATIVE sampling for contrastive training: each
    anchor row gets ``k`` pseudo-random partner ids drawn from the
    corpus id space ``[0, n)`` by pure modular arithmetic —
    ``neg_j(id) = (id·KNUTH + (j+1)·P) mod n``, bumped by one (mod n)
    when it collides with the anchor — so pairs are reproducible
    across runs, engines and partitionings (no RNG, no shuffle) and
    exactly expressible in SQL. Requires DENSE ids ``0 ≤ id < n``
    (validated; remap first otherwise — the same contract as
    :func:`sample_n`). Emits ``(id, neg_rank, neg_id)`` with
    ``neg_rank`` 1-based.

    Scale shape: one metadata ``count()`` then one streaming
    ``map_batches`` fan-out (k rows per anchor, pure int64 math).
    Joining embeddings/text back onto ``neg_id`` is the standard
    bucketed join downstream."""
    if k < 1:
        raise ValueError("k must be >= 1")
    P = 2654435769  # second Weyl-ish constant, coprime-free offset

    ds = _as_dataset(source, columns=[id_col])
    n = ds.count()
    n64 = np.int64(n)

    def fan_out(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # tighter than the 2^32 hash domain: id·KNUTH must not wrap
        # int64 (numpy wraps silently where SQL overflows loudly —
        # the ADVICE round-2 divergence class), so require id < 2^31
        if len(ids) and (int(ids.min()) < 0 or int(ids.max()) >= (1 << 31)):
            raise ValueError(
                f"{id_col} values must be in [0, 2^31) for negative "
                "sampling (the id*KNUTH product must fit int64)"
            )
        if len(ids) and int(ids.max()) >= n:
            raise ValueError(
                f"{id_col} must be dense in [0, n) for negative "
                f"sampling (got id {int(ids.max())} >= n={n})"
            )
        anchors = np.repeat(ids, k)
        ranks = np.tile(np.arange(1, k + 1, dtype=np.int64), len(ids))
        neg = (anchors * np.int64(KNUTH) + ranks * np.int64(P)) % n64
        neg = np.where(neg == anchors, (neg + 1) % n64, neg)
        return pa.table(
            {
                id_col: pa.array(anchors, pa.int64()),
                "neg_rank": pa.array(ranks, pa.int64()),
                "neg_id": pa.array(neg, pa.int64()),
            }
        )

    return ds.map_batches(
        fan_out, batch_format="pyarrow", batch_size=batch_size
    )


def group_sample(
    source: Any,
    group_col: str,
    id_col: str = "doc_id",
    *,
    k: int = 10,
    batch_size: int = 65536,
) -> Dataset:
    """Deterministic uniform k-sample PER GROUP (e.g. "show me 10 docs
    from every source/domain for inspection"): keep the k rows with the
    smallest ``(id · 2654435761) % 1000000007`` per group, ties broken
    by id. No RNG — the same sample every run, on any engine, which is
    what makes sampled QA reports diffable across pipeline versions.

    Scale shape: each batch pre-truncates to its own per-group top-k
    (a batch can contribute at most k rows per group), so the final
    per-group selection sees ≤ k × #batches rows per group, never the
    group's full membership.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (ids * KNUTH) % _SAMPLE_MOD
        df = pl.DataFrame(
            {
                "g": pl.from_arrow(
                    batch[group_col].combine_chunks()
                    if isinstance(batch[group_col], pa.ChunkedArray)
                    else batch[group_col]
                ),
                "i": ids,
                "h": h,
            }
        )
        top = (
            df.sort(["g", "h", "i"])
            .group_by("g", maintain_order=True)
            .head(k)
        )
        return pa.table(
            {
                group_col: pa.array(top["g"].to_list()),
                id_col: pa.array(top["i"].to_numpy(), pa.int64()),
                "__h": pa.array(top["h"].to_numpy(), pa.int64()),
            }
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__h", id_col]).head(k)
        return g[[group_col, id_col]].reset_index(drop=True)

    ds = _as_dataset(source, columns=[id_col, group_col])
    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )
    return partials.groupby(group_col).map_groups(
        final, batch_format="pandas"
    )


# --------------------------------------------------------------------------- #
# full document profile (everything in one pass)                              #
# --------------------------------------------------------------------------- #

def full_profile(
    source: Any,
    benchmark_texts: Optional[List[Optional[str]]] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    ngram: int = 5,
    batch_size: int = 16384,
) -> Dataset:
    """EVERY per-doc signal in ONE read and ONE token explode:
    quality counters + language ID + md5 fingerprint (the text tier)
    plus Gopher repetition counters + PII counts + benchmark
    decontamination (the curation tier). At 100 TB this is the shape
    that matters — each signal run standalone re-reads and
    re-tokenizes the corpus; fused, the explode amortizes across all
    of them.

    Columns are byte-identical to the standalone operators'
    (``text_profile`` ∪ ``gopher_stats`` ∪ PII counts ∪
    ``decontaminate``); the oracle is the join of their per-op SQL.
    """
    import hashlib

    from .text import LANGS, LANG_PROFILES

    stop = list(LANG_PROFILES["en"])
    bench_ref = ray.put(
        _benchmark_shingle_hashes(benchmark_texts or [], ngram)
    )

    def profile(batch: pa.Table) -> pa.Table:
        from .text import (
            _row_distinct_counts,
            _token_codes,
            _vocab_hit_counts,
        )

        bset = ray.get(bench_ref)
        ex, n = _token_frame(batch[text_col])

        # ONE factorization shared by the text tier, the Gopher
        # counters and the char sums (word-list membership over the
        # vocab; per-row reduction via bincount gathers)
        rcv = _token_codes(ex, row_col="row")
        r, c, vocab = rcv
        hits = _vocab_hit_counts(
            r, c, vocab, n,
            {"stop": stop,
             **{lang: list(LANG_PROFILES[lang]) for lang in LANGS}},
        )
        n_unique = _row_distinct_counts(r, c, len(vocab), n)
        hit_mat = np.stack([hits[lang] for lang in LANGS], axis=1)
        best = np.argmax(hit_mat, axis=1)  # first max → alphabetical

        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n_chars = pc.fill_null(pc.utf8_length(pc.fill_null(col, "")), 0)
        norm = (
            pl.from_arrow(col).fill_null("")
            .str.to_lowercase()
            .str.replace_all(r"\s+", " ")
            .str.strip_chars()
        )
        digests = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in norm]

        pii_counts, _ = _pii_columns(batch[text_col], PII_PATTERNS)

        cols = {
            id_col: batch[id_col],
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_stopwords": pa.array(hits["stop"]),
            "n_unique_tokens": pa.array(n_unique),
        }
        for li, lang in enumerate(LANGS):
            cols[f"hits_{lang}"] = pa.array(hit_mat[:, li], pa.int64())
        cols["detected_lang"] = pa.array(
            np.array(LANGS, dtype=object)[best], pa.string()
        )
        cols["fingerprint"] = pa.array(digests, pa.string())
        cols.update(_gopher_columns(batch, ex, n, text_col, rcv=rcv))
        cols.update(pii_counts)
        cols.update(_decontam_columns(ex, n, bset, ngram))
        return pa.table(cols)

    ds = _as_dataset(source, columns=[id_col, text_col])
    return ds.map_batches(
        profile, batch_format="pyarrow", batch_size=batch_size
    )


# --------------------------------------------------------------------------- #
# duplicated-span coverage (suffix-style dedup signal)                        #
# --------------------------------------------------------------------------- #


def fit_linear_classifier(
    source: Any,
    feature_cols: List[str],
    label_col: str,
    *,
    n_iters: int = 8,
    l2: float = 1e-6,
    batch_size: int = 64 * 1024,
) -> dict:
    """Distributed logistic-regression FIT — the training half of the
    CCNet-style quality-classifier loop (:func:`linear_classifier_score`
    scores; this learns the weights from a labeled seed set, e.g.
    "wiki-like vs random-crawl" docs). Iteratively reweighted least
    squares (Newton): per iteration ONE streaming pass reduces each
    batch to the d×d mergeable normal-equation partials

        H = Σ xᵢ p(1−p) xᵢᵀ      g = Σ xᵢ (yᵢ − p)

    (d = features+1 incl. intercept — bytes per batch are d², never
    rows), the driver sums partials and solves the d×d system. 8
    Newton iterations reach machine-precision MLE on separable-ish
    data; ``l2`` ridge keeps H invertible (and bounds weights on
    perfectly separable labels). Rows with any NULL feature/label
    drop (count reported). Deterministic: float64 partials, fixed
    iteration count, partition-order-independent sums up to float
    addition order (stable to ~1e-9 — results round to 6).

    Returns ``{weights, bias, n_rows, n_dropped, log_loss, n_iters}``
    (weights/bias/log_loss rounded to 6; feed weights+bias straight
    into :func:`linear_classifier_score`). Iterative + non-SQL →
    rows-only oracle class (determinism + planted-weights recovery
    pinned by tests)."""
    d = len(feature_cols) + 1  # + intercept
    cols = list(feature_cols) + [label_col]
    ds = _as_dataset(source, columns=cols)

    def make_partials(w_ref):
        def partials(batch: pa.Table) -> pa.Table:
            w = ray.get(w_ref)
            X = np.column_stack(
                [
                    pc.cast(batch[c], pa.float64()).to_numpy(
                        zero_copy_only=False
                    )
                    for c in feature_cols
                ]
            )
            y = pc.cast(batch[label_col], pa.float64()).to_numpy(
                zero_copy_only=False
            )
            ok = ~(np.isnan(X).any(axis=1) | np.isnan(y))
            X, y = X[ok], y[ok]
            n, dropped = len(y), int((~ok).sum())
            Xb = np.column_stack([X, np.ones(n)])
            z = Xb @ w
            p = 1.0 / (1.0 + np.exp(-z))
            r = p * (1.0 - p)
            H = (Xb * r[:, None]).T @ Xb  # d×d
            g = Xb.T @ (y - p)  # d
            with np.errstate(divide="ignore"):
                ll = -np.sum(
                    np.where(y > 0.5, np.log(np.maximum(p, 1e-300)),
                             np.log(np.maximum(1.0 - p, 1e-300)))
                )
            flat = np.concatenate(
                [H.reshape(-1), g, [float(n), float(dropped), ll]]
            )
            return pa.table(
                {
                    "p": pa.array(flat, pa.float64()),
                    "i": pa.array(np.arange(len(flat), dtype=np.int64)),
                }
            )

        return partials

    w = np.zeros(d, np.float64)
    n_rows = n_dropped = 0
    loss = float("nan")
    for _ in range(int(n_iters)):
        w_ref = ray.put(w)
        acc = np.zeros(d * d + d + 3, np.float64)
        for b in ds.map_batches(
            make_partials(w_ref), batch_format="pyarrow",
            batch_size=batch_size,
        ).iter_batches(batch_format="pyarrow"):
            # order-independent merge: scatter-add by index
            np.add.at(
                acc,
                b["i"].to_numpy(zero_copy_only=False),
                b["p"].to_numpy(zero_copy_only=False),
            )
        H = acc[: d * d].reshape(d, d) + np.eye(d) * float(l2)
        g = acc[d * d : d * d + d] - float(l2) * w
        n_rows = int(acc[-3])
        n_dropped = int(acc[-2])
        loss = float(acc[-1])
        w = w + np.linalg.solve(H, g)
    return {
        "weights": [round(float(x), 6) for x in w[:-1]],
        "bias": round(float(w[-1]), 6),
        "n_rows": n_rows,
        "n_dropped": n_dropped,
        "log_loss": round(loss / max(n_rows, 1), 6),
        "n_iters": int(n_iters),
    }


def linear_classifier_score(
    source: Any,
    feature_cols: List[str],
    weights: "List[float]",
    bias: float = 0.0,
    *,
    id_cols: Optional[List[str]] = None,
    threshold: float = 0.5,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Model-scoring stage: logistic score over numeric feature
    columns — the fastText-style quality-classifier shape (CCNet /
    LLaMA data pipelines gate documents on a linear classifier's
    probability). ``score = σ(w·x + b)`` rounded to 6; ``label =
    score ≥ threshold`` (0/1, NULL propagated from any NULL feature —
    a doc with missing features is unscored, never silently kept).

    Scale shape: the weight vector ships ONCE via ``ray.put`` and
    every batch does one ``X @ w`` matmul — the same broadcast-model
    pattern carries real model matrices (e.g. an n-gram-hash logistic
    layer) without per-batch reshipping; swap the inner matmul for a
    batched model call and nothing else changes. No shuffle, no
    driver collect."""
    w = np.asarray(weights, np.float64)
    if len(w) != len(feature_cols):
        raise ValueError(
            f"weights ({len(w)}) must match feature_cols "
            f"({len(feature_cols)})"
        )
    model_ref = ray.put((w, np.float64(bias)))
    keep = list(id_cols or [])

    def score(batch: pa.Table) -> pa.Table:
        wv, b = ray.get(model_ref)
        X = np.column_stack(
            [
                pc.cast(batch[c], pa.float64()).to_numpy(
                    zero_copy_only=False
                )
                for c in feature_cols
            ]
        )
        z = X @ wv + b  # NaN features propagate -> NULL score
        s = 1.0 / (1.0 + np.exp(-z))
        valid = ~np.isnan(s)
        out = batch.select(keep + feature_cols)
        out = out.append_column(
            "score",
            pa.array(np.round(s, 6), pa.float64(), mask=~valid),
        )
        out = out.append_column(
            "label",
            pa.array(
                (s >= threshold).astype(np.int64), pa.int64(), mask=~valid
            ),
        )
        return out

    ds = _as_dataset(source, columns=(keep + feature_cols) or None)
    return ds.map_batches(score, batch_format="pyarrow", batch_size=batch_size)


def _dup_positions(
    ds: Dataset,
    id_col: str,
    text_col: str,
    *,
    n: int,
    min_count: int,
    num_hash_buckets: int,
    batch_size: int,
) -> Dataset:
    """Corpus-duplicated n-gram window starts as ``(id, pos)`` rows —
    the shared discovery phase of :func:`duplicated_span_stats`
    (coverage counters) and :func:`remove_duplicated_spans` (the
    actual span-removal transform). Positional rolling-hash n-grams
    (token-hash polynomial combine, two independent 64-bit seeds, no
    shingle strings materialize) bucket on ``h1``; one vectorized
    group-size pass per bucket keeps positions whose window occurs
    ≥ ``min_count`` times corpus-wide. Returned MATERIALIZED (small —
    dup positions only; also breaks the sort→union→sort chain)."""
    K = pl.lit(_HASH_K, dtype=pl.UInt64)

    def shingle_rows(batch: pa.Table) -> pa.Table:
        ex, nrows = _token_frame(batch[text_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(ex):
            return pa.table(
                {
                    "__h1": pa.array([], pa.uint64()),
                    "__h2": pa.array([], pa.uint64()),
                    id_col: pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "__bucket": pa.array([], pa.int64()),
                }
            )
        hx = ex.with_columns(
            pl.col("t").hash(seed=0).alias("a"),
            pl.col("t").hash(seed=7).alias("b"),
            (pl.int_range(pl.len()).over("row") + 1).alias("pos"),
        )
        for name in ("a", "b"):
            cols = [pl.col(name)] + [
                pl.col(name).shift(-i) for i in range(1, n)
            ]
            comb = cols[0]
            for c in cols[1:]:
                comb = comb * K + c
            hx = hx.with_columns(comb.alias(name))
        hx = hx.filter(
            (pl.col("row") == pl.col("row").shift(-(n - 1))).fill_null(
                False
            )
        )
        row = hx["row"].to_numpy()
        h1 = hx["a"].to_numpy()
        return pa.table(
            {
                "__h1": pa.array(h1, pa.uint64()),
                "__h2": pa.array(hx["b"].to_numpy(), pa.uint64()),
                id_col: pa.array(ids[row], pa.int64()),
                "pos": pa.array(hx["pos"].to_numpy().astype(np.int64)),
                "__bucket": pa.array(
                    (h1 % np.uint64(num_hash_buckets)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def emit_dups(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby(["__h1", "__h2"])["pos"].transform("size")
        d = g.loc[cnt >= min_count, [id_col, "pos"]]
        return pd.DataFrame(
            {
                id_col: d[id_col].to_numpy(np.int64),
                "pos": d["pos"].to_numpy(np.int64),
            }
        )

    return (
        ds.map_batches(
            shingle_rows, batch_format="pyarrow", batch_size=batch_size
        )
        .groupby("__bucket")
        .map_groups(emit_dups, batch_format="pandas")
        .materialize()
    )


def duplicated_span_stats(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 8,
    min_count: int = 2,
    num_hash_buckets: int = 256,
    num_doc_buckets: int = 64,
    batch_size: int = 16384,
) -> Dataset:
    """Per-document duplicated-span coverage — the substring-dedup
    signal of Lee et al. 2021 ("Deduplicating Training Data Makes
    Language Models Better") in its scalable n-gram form: a token is
    *duplicated* when some ``n``-gram window covering it occurs at
    least ``min_count`` times in the WHOLE corpus. Output per doc:
    ``n_tokens``, ``n_dup_tokens`` (size of the union of duplicated
    windows) — the ratio drives span-level removal / doc-drop
    decisions.

    Tokenization is the oracle convention (single-space split, empty
    tokens dropped). Two bounded shuffles, mirroring
    ``paragraph_dedup``:

    1. positional rolling-hash ``n``-grams (no shingle strings
       materialize — token-hash polynomial combine, two independent
       64-bit seeds, collision odds ~2^-128) bucket on ``h1``; one
       vectorized group-size pass per bucket emits the DUPLICATED
       ``(doc_id, pos)`` rows only;
    2. dup positions co-locate with per-doc token counts on
       ``knuth(doc_id)`` buckets; ONE vectorized interval-union sweep
       per bucket (sort + per-doc cummax of window ends) computes the
       covered-token count for all its docs.
    """
    ds = _as_dataset(source, columns=[id_col, text_col])
    dups = _dup_positions(
        ds, id_col, text_col, n=n, min_count=min_count,
        num_hash_buckets=num_hash_buckets, batch_size=batch_size,
    )

    def doc_bucket(ids: np.ndarray) -> np.ndarray:
        return (
            (ids.astype(np.int64) * np.int64(KNUTH))
            % np.int64(num_doc_buckets)
        ).astype(np.int64)

    def tag_counts(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = pc.cast(
            pc.count_substring_regex(
                pc.fill_null(batch[text_col], ""), r"[^ ]+"
            ),
            pa.int64(),
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "pos": pa.array(np.full(len(batch), -1, np.int64)),
                "n_tokens": ntok,
                "__bucket": pa.array(doc_bucket(ids), pa.int64()),
            }
        )

    def tag_dups(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "pos": batch["pos"],
                "n_tokens": pa.array(np.zeros(len(batch), np.int64)),
                "__bucket": pa.array(doc_bucket(ids), pa.int64()),
            }
        )

    unioned = ds.map_batches(
        tag_counts, batch_format="pyarrow", batch_size=batch_size
    ).union(dups.map_batches(tag_dups, batch_format="pyarrow"))

    def coverage(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["pos"] < 0][[id_col, "n_tokens"]]
        d = g[g["pos"] >= 0][[id_col, "pos"]]
        if len(d):
            d = d.sort_values([id_col, "pos"], kind="mergesort")
            p = d["pos"].to_numpy(np.int64)
            end = p + n - 1
            # vectorized per-doc running max of interval end, exclusive
            dd = pd.DataFrame({id_col: d[id_col].to_numpy(), "end": end})
            prev = (
                dd.groupby(id_col)["end"].cummax().shift().to_numpy()
            )
            newdoc = dd[id_col].to_numpy() != np.roll(
                dd[id_col].to_numpy(), 1
            )
            newdoc[0] = True
            prev = np.where(newdoc, 0, prev).astype(np.int64)
            contrib = np.clip(end - np.maximum(p - 1, prev), 0, None)
            cov = (
                pd.DataFrame({id_col: dd[id_col], "c": contrib})
                .groupby(id_col)["c"].sum()
            )
        else:
            cov = pd.Series(dtype=np.int64)
        out = docs.copy()
        out["n_dup_tokens"] = (
            out[id_col].map(cov).fillna(0).astype(np.int64)
        )
        out["n_tokens"] = out["n_tokens"].astype(np.int64)
        return out.sort_values(id_col).reset_index(drop=True)

    return unioned.groupby("__bucket").map_groups(
        coverage, batch_format="pandas"
    )


def remove_duplicated_spans(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 8,
    min_count: int = 2,
    num_hash_buckets: int = 256,
    num_doc_buckets: int = 64,
    batch_size: int = 16384,
) -> Dataset:
    """Substring-level dedup TRANSFORM — Lee et al. 2021's remedy, not
    just its diagnosis (:func:`duplicated_span_stats` counts duplicated
    tokens; this actually removes them): every token covered by an
    ``n``-gram window occurring ≥ ``min_count`` times corpus-wide is
    dropped, and each document is rebuilt from its surviving tokens.

    Rebuilt text is single-space-joined surviving tokens (the engine's
    oracle tokenization), i.e. whitespace is CANONICALIZED — runs of
    spaces in the original collapse. NULL text → empty rebuild.

    Scale shape mirrors :func:`duplicated_span_stats`: the shared
    :func:`_dup_positions` discovery (rolling-hash n-grams, one
    bucketed shuffle, dup positions only materialize), then dup
    positions co-locate with full text rows on ``knuth(doc_id)``
    buckets and ONE vectorized pass per bucket expands windows →
    covered-token set → anti-join → per-doc ordered join. The only
    pass that ships text is the final reassembly (inherent: output IS
    text).

    Returns ``(id, text, n_tokens, n_removed_tokens)``.
    """
    ds = _as_dataset(source, columns=[id_col, text_col])
    dups = _dup_positions(
        ds, id_col, text_col, n=n, min_count=min_count,
        num_hash_buckets=num_hash_buckets, batch_size=batch_size,
    )

    def doc_bucket(ids: np.ndarray) -> np.ndarray:
        return (
            (ids.astype(np.int64) * np.int64(KNUTH))
            % np.int64(num_doc_buckets)
        ).astype(np.int64)

    def tag_text(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                text_col: pc.fill_null(batch[text_col], ""),
                "pos": pa.array(np.full(len(batch), -1, np.int64)),
                "__bucket": pa.array(doc_bucket(ids), pa.int64()),
            }
        )

    def tag_dups(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                text_col: pa.array([""] * len(batch), pa.string()),
                "pos": batch["pos"],
                "__bucket": pa.array(doc_bucket(ids), pa.int64()),
            }
        )

    unioned = ds.map_batches(
        tag_text, batch_format="pyarrow", batch_size=batch_size
    ).union(dups.map_batches(tag_dups, batch_format="pyarrow"))

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["pos"] < 0][[id_col, text_col]]
        dpos = g[g["pos"] >= 0][[id_col, "pos"]]
        # exploded tokens with 1-based positions (oracle tokenization)
        ex = docs.assign(**{text_col: docs[text_col].str.split(" ")})
        ex = ex.explode(text_col)
        ex = ex[ex[text_col].notna() & (ex[text_col] != "")]
        ex["t"] = ex.groupby(id_col).cumcount() + 1
        n_tok = ex.groupby(id_col)["t"].size()
        # expand dup windows [p, p+n-1] into covered positions (clipped
        # to doc length implicitly: positions beyond the last token
        # simply never match a real token)
        if len(dpos):
            rid = np.repeat(dpos[id_col].to_numpy(np.int64), n)
            rpos = (
                np.repeat(dpos["pos"].to_numpy(np.int64), n)
                + np.tile(np.arange(n, dtype=np.int64), len(dpos))
            )
            covered_keys = np.unique(
                rid.astype(np.uint64) * np.uint64(1 << 32)
                + rpos.astype(np.uint64)
            )
            keys = ex[id_col].to_numpy(np.int64).astype(np.uint64) * np.uint64(
                1 << 32
            ) + ex["t"].to_numpy(np.int64).astype(np.uint64)
            drop = np.isin(keys, covered_keys)
        else:
            drop = np.zeros(len(ex), dtype=bool)
        kept = ex[~drop]
        joined = kept.groupby(id_col)[text_col].agg(" ".join)
        n_kept = kept.groupby(id_col)["t"].size()
        out = docs[[id_col]].drop_duplicates().sort_values(id_col)
        out[text_col] = out[id_col].map(joined).fillna("")
        nt = out[id_col].map(n_tok).fillna(0).astype(np.int64)
        nk = out[id_col].map(n_kept).fillna(0).astype(np.int64)
        out["n_tokens"] = nt
        out["n_removed_tokens"] = nt - nk
        return out.reset_index(drop=True)

    return unioned.groupby("__bucket").map_groups(
        rebuild, batch_format="pandas"
    )


def seeded_shuffle(
    source: Any,
    id_col: str = "doc_id",
    *,
    seed: int = 1,
    columns: Optional[List[str]] = None,
    batch_size: int = 64 * 1024,
) -> "ray.data.Dataset":
    """Deterministic global training-order shuffle: every row gets
    ``shuffle_key = ((id·KNUTH + seed) % M)·KNUTH % M`` (M = 2³¹−1)
    and ``position`` — its 1-based global rank under
    ``(shuffle_key, id)``. The same seed reproduces the same order on
    any cluster size / input layout / rerun (what `random_shuffle`
    can't promise), and a different seed gives a fresh epoch order —
    the reproducible-epoch contract a training-data pipeline needs
    for resumable data loading. The SECOND multiplicative round is
    load-bearing: with only ``(id·K + seed) % M`` the seed is an
    additive shift mod M, which preserves circular order — every
    epoch would replay (almost) the same sequence.

    A global order is a prefix scan, not a full sort:
    :func:`~.relational.global_rank` range-partitions on sampled key
    bounds and only per-bucket counts reach the driver — ONE
    all-to-all, inherent to total ordering. (If shard-LOCAL order is
    enough, hash-bucket by key and sort within shards instead — no
    global exchange.) Consumers either sort by / range-read
    ``position`` or feed the keyed stream to ``pack_shards``.

    Ids must be in ``[0, 2³¹)`` so ``id·KNUTH`` stays inside int64 in
    BOTH numpy and SQL (the :func:`negative_samples` convention;
    violations raise, never wrap). Modulus 2³¹−1 is prime, so the map
    is injective on the id range only modulo collisions
    (~n²/2³² birthday rate) — ``id`` tiebreaks make the order total
    regardless. NULL ids raise."""
    from .relational import global_rank

    cols = None
    if columns is not None:
        cols = list(dict.fromkeys([*columns, id_col]))
    ds = _as_dataset(source, columns=cols)

    def key(batch: pa.Table) -> pa.Table:
        arr = batch[id_col]
        if arr.null_count:
            raise ValueError(f"{id_col} must be non-NULL")
        ids = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() >= 2**31):
            raise ValueError(
                f"{id_col} must be in [0, 2**31) for overflow-free keys"
            )
        m = np.int64(2**31 - 1)
        k1 = (ids * np.int64(KNUTH) + np.int64(seed)) % m
        k = (k1 * np.int64(KNUTH)) % m
        return batch.append_column(
            "shuffle_key", pa.array(k, pa.int64())
        )

    keyed = ds.map_batches(key, batch_format="pyarrow", batch_size=batch_size)
    out = global_rank(keyed, "shuffle_key", tiebreak_cols=[id_col])
    return out.map_batches(
        lambda b: b.rename_columns(
            [c if c != "rank" else "position" for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
