"""Deduplication operators for web-scale text tables (Ray-Data-first).

Net-new vs the reference (which has no dedup at all): the operations a
large-scale training-data pipeline needs, each expressed as streaming
``map_batches`` + ``groupby`` stages:

* :func:`exact_dedup` — hash-partitioned keep-first per key (one
  shuffle on a coarse bucket key).
* :func:`ngram_jaccard_pairs` — **exact** near-duplicate pairs via an
  inverted shingle index: shingle → (doc, shingle_hash, size) rows →
  bucketed groupby pair emission → groupby(pair) intersection counts →
  vectorized Jaccard filter. Exact but candidate-quadratic in shared
  shingles; the small-threshold tier.
* :func:`minhash_near_dup_pairs` — the scale tier: per-doc MinHash
  signatures (vectorized ``minimum.reduceat``), banded LSH bucketing,
  candidate pairs verified by **exact** shingle Jaccard — output
  identical to :func:`ngram_jaccard_pairs` restricted to LSH candidates
  (miss probability (1−t^r)^b, ~1e-15 for t≥0.9 at r=4, b=32).
* :func:`simhash_pairs` — 64-bit SimHash; candidates via 4×16-bit
  chunk banding (pigeonhole: hamming ≤ 3 ⇒ at least one chunk equal, so
  recall is EXACT for max_hamming ≤ 3), verified by vectorized SWAR
  popcount on the XOR.
* :func:`embedding_cosine_pairs` — brute-force cosine near-dup pairs:
  the normalized embedding matrix is broadcast once via ``ray.put``;
  each batch does one float64 matmul against it. The O(n²)-compute
  baseline, distributed over batches.
* :func:`embedding_lsh_pairs` — banded random-hyperplane LSH (seeded;
  ``bands`` tables × ``bits_per_band`` sign bits, the MinHash band
  trick in cosine space), exact cosine verification within band
  buckets — the scale path (recall is the multi-band S-curve
  1 − (1 − p^r)^b, tunable via bands/bits).

Scale pattern used throughout — **bucketed groupby**: Ray's
``groupby(key).map_groups`` pays a Python function call per group,
which is ruinous when groups are tiny and numerous (every shingle /
LSH band / key is its own group: 10^9+ calls at web scale). Instead we
group by ``hash(key) % num_buckets`` (a few hundred coarse groups) and
run ONE vectorized function per bucket that handles all its sub-groups
with numpy shifted-compare sweeps (cost O(max_group_size) vectorized
passes, not O(groups)). Equal keys land in equal buckets by
construction, so results are identical.

All randomness is seeded → byte-stable outputs across runs and
parallelism levels. Shingle identity uses 64-bit hashes
(``functions.sketches.hash64``, SipHash-stable across processes);
outputs are verified against string-equality DuckDB oracles in
``__ray_entry__`` / tests.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.sketches import hash64

try:
    import polars as pl
except ImportError:  # pragma: no cover — polars is baked into this env
    pl = None

Dataset = ray.data.Dataset

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_frame(texts_col, n: int) -> "pl.DataFrame":
    """(row, shingle_hash) rows — distinct per row — plus a ``size``
    column (distinct shingles of that row), entirely in polars: Rust
    split → explode → shifted concat (window overruns masked by
    doc-boundary compare) → xxhash → unique. ``row`` is the positional
    batch index. Tokens split on single spaces, empties dropped (the
    SQL-oracle tokenization)."""
    s = pl.from_arrow(
        texts_col.combine_chunks()
        if isinstance(texts_col, pa.ChunkedArray)
        else texts_col
    ).fill_null("")
    ex = (
        pl.DataFrame({"row": pl.int_range(0, len(s), eager=True), "t": s})
        .with_columns(pl.col("t").str.split(" "))
        .explode("t", empty_as_null=True)
        .filter(pl.col("t").is_not_null() & (pl.col("t") != ""))
    )
    parts = [pl.col("t")] + [pl.col("t").shift(-i) for i in range(1, n)]
    sh = (
        ex.with_columns(
            pl.concat_str(parts, separator=" ").alias("sh"),
            (pl.col("row") == pl.col("row").shift(-(n - 1))).alias("ok"),
        )
        .filter(pl.col("ok").fill_null(False))
        .select(
            pl.col("row"),
            pl.col("sh").hash(seed=0).alias("shingle_hash"),
        )
        .unique(subset=["row", "shingle_hash"], maintain_order=True)
        .with_columns(pl.len().over("row").alias("size"))
    )
    return sh


def _as_dataset(source: Any, columns: Optional[List[str]] = None) -> Dataset:
    if isinstance(source, Dataset):
        return source
    if isinstance(source, pa.Table):
        return ray.data.from_arrow(source.select(columns) if columns else source)
    if isinstance(source, pd.DataFrame):
        return ray.data.from_pandas(source[columns] if columns else source)
    return ray.data.read_parquet(str(source), columns=columns)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64."""
    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


# --------------------------------------------------------------------------- #
# bucketed groupby: the many-tiny-groups scale pattern                        #
# --------------------------------------------------------------------------- #


def bucketed_groupby(
    ds: Dataset,
    key_cols: List[str],
    bucket_fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    num_buckets: int = 256,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Group by ``hash(key_cols) % num_buckets`` and apply ONE
    vectorized ``bucket_fn`` per bucket (which must handle all its
    sub-groups itself, typically via sorted shifted-compare sweeps).
    Equal keys co-locate by construction; the per-group Python-call
    overhead of ``map_groups`` drops from O(#groups) to O(#buckets).
    Raise ``num_buckets`` at scale so each bucket fits one worker."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, np.uint64)
        for c in key_cols:
            h = h * np.uint64(1099511628211) + hash64(
                batch[c].to_numpy(zero_copy_only=False)
            )
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column("__bucket", pa.array(b, pa.int64()))

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return bucket_fn(group.drop(columns="__bucket"))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def _pairs_within_groups(
    df: pd.DataFrame,
    key_cols: List[str],
    id_col: str,
    carry_cols: Optional[List[str]] = None,
    max_group: Optional[int] = None,
) -> pd.DataFrame:
    """All unordered id pairs sharing identical ``key_cols`` values,
    vectorized across every group at once: sort by (keys, id), then for
    offset j = 1..max_group_size−1 compare row i against row i+j — a
    pair iff the keys still match. O(max group size) vectorized sweeps
    instead of one Python call per group. ``carry_cols`` are copied
    onto the pair rows as ``{col}_a`` / ``{col}_b``."""
    carry_cols = carry_cols or []
    out_cols = (
        ["id_a", "id_b"]
        + [f"{c}_a" for c in carry_cols]
        + [f"{c}_b" for c in carry_cols]
    )
    empty = pd.DataFrame({c: pd.Series(dtype=np.int64) for c in out_cols})
    if len(df) < 2:
        return empty
    g = df.drop_duplicates(subset=key_cols + [id_col]).sort_values(
        key_cols + [id_col], kind="stable"
    )
    keys = [g[c].to_numpy() for c in key_cols]
    ids = g[id_col].to_numpy()
    carries = {c: g[c].to_numpy() for c in carry_cols}
    # group run lengths (for the sweep bound and the max_group guard)
    same_prev = np.ones(len(g), bool)
    for k in keys:
        same_prev &= np.concatenate([[False], k[1:] == k[:-1]])
    grp_id = np.cumsum(~same_prev) - 1
    grp_sizes = np.bincount(grp_id)
    max_size = int(grp_sizes.max())
    if max_size < 2:
        return empty
    allowed = (
        np.ones(len(grp_sizes), bool)
        if max_group is None
        else grp_sizes <= max_group
    )
    row_ok = allowed[grp_id]
    parts = []
    for j in range(1, max_size):
        same = np.ones(len(g) - j, bool)
        for k in keys:
            same &= k[:-j] == k[j:]
        same &= row_ok[:-j]
        if not same.any():
            continue
        idx = np.nonzero(same)[0]
        row = {"id_a": ids[idx], "id_b": ids[idx + j]}
        for c in carry_cols:
            row[f"{c}_a"] = carries[c][idx]
            row[f"{c}_b"] = carries[c][idx + j]
        parts.append(pd.DataFrame(row))
    if not parts:
        return empty
    return pd.concat(parts, ignore_index=True)


def bucketed_count(
    ds: Dataset,
    key_cols: List[str],
    count_name: str = "count",
    *,
    num_buckets: int = 64,
) -> Dataset:
    """``groupby(key_cols).count()`` via the bucket pattern — one
    vectorized pandas ``value_counts`` per bucket instead of Ray's
    sort-based multi-key aggregate (which pays per-key-tuple overhead
    ruinous for many tiny groups)."""

    def count_groups(bucket: pd.DataFrame) -> pd.DataFrame:
        out = bucket.groupby(key_cols, sort=False).size().reset_index(name=count_name)
        return out

    return bucketed_groupby(ds, key_cols, count_groups, num_buckets=num_buckets)


def _rename(ds: Dataset, mapping: Dict[str, str]) -> Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([mapping.get(c, c) for c in batch.column_names])

    return ds.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------------------------- #
# exact dedup                                                                 #
# --------------------------------------------------------------------------- #


def exact_dedup(
    source: Any,
    key: str,
    *,
    num_buckets: int = 256,
    tiebreak: Optional[str] = None,
    keep: str = "first",
) -> Dataset:
    """Keep one row per key value. One shuffle on a coarse bucket of
    ``hash(key)``; within a bucket a single vectorized
    ``drop_duplicates`` handles every key.

    With ``tiebreak`` (a short column, e.g. an id/url/crawl
    timestamp): keep the minimum-tiebreak row per key
    (``keep="first"``) or the maximum (``keep="last"`` — the
    keep-newest-crawl-per-url shape) — only the cheap column is
    sorted, never the (potentially huge) key strings; duplicate-group
    identification is hash-based inside ``drop_duplicates``. Without
    ``tiebreak``: keep the lexicographically-first (or -last) row over
    all columns (the round-1 semantics — deterministic but sorts
    whole rows).

    The same reduce runs BATCH-LOCALLY before the shuffle (it is
    associative: min-of-mins = global min, max-of-maxes = global max),
    so on heavily duplicated corpora the shuffle ships one survivor
    per (batch, key) instead of every row — at a 1600× duplication
    factor that is a ~1000× exchange-volume cut (the
    pre-aggregate-before-groupby scale pattern, SURVEY.md §4.3.2)."""
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    desc = keep == "last"
    ds = _as_dataset(source)

    def keep_one(bucket: pd.DataFrame) -> pd.DataFrame:
        order = [tiebreak] if tiebreak else list(bucket.columns)
        return (
            bucket.sort_values(order, kind="stable", ascending=not desc)
            .drop_duplicates(subset=[key], keep="first")
        )

    def local_combine(batch: pa.Table) -> pa.Table:
        # polars (Rust) keep-one — a pandas round-trip on big string
        # batches costs more than the reduce itself
        d = pl.from_arrow(batch)
        order = [tiebreak] if tiebreak else list(d.columns)
        # nulls_last matches pandas' na_position="last" in keep_one —
        # otherwise a NULL-tiebreak row could win locally but lose in
        # the bucket reduce (batch-size-dependent survivors)
        out = d.sort(order, descending=desc, nulls_last=True).unique(
            subset=[key], keep="first", maintain_order=True
        )
        return out.select(batch.column_names).to_arrow().cast(batch.schema)

    combined = ds.map_batches(local_combine, batch_format="pyarrow")
    return bucketed_groupby(combined, [key], keep_one, num_buckets=num_buckets)


# --------------------------------------------------------------------------- #
# shingling                                                                   #
# --------------------------------------------------------------------------- #


def shingle_table(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    *,
    batch_size: int = 4096,
) -> Dataset:
    """(id, shingle_hash, size) rows, distinct per doc — the
    inverted-index feed. ``size`` is the doc's distinct-shingle count,
    computable in-batch because a doc is exactly one input row; carrying
    it on every shingle row makes the downstream Jaccard computation
    join-free. Shingling is fully vectorized: tokens of the whole batch
    land in one flat pandas Series; n-gram strings come from shifted
    concatenation; cross-doc window overruns are masked out via the
    doc-boundary offsets. No Python loop over rows."""

    def shingles(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sh = _shingle_frame(batch[text_col], n)
        rows = sh["row"].to_numpy()
        return pa.Table.from_arrays(
            [
                pa.array(ids[rows], pa.int64()),
                pa.array(sh["shingle_hash"].to_numpy().astype(np.uint64)),
                pa.array(sh["size"].to_numpy().astype(np.int64), pa.int64()),
            ],
            names=[id_col, "shingle_hash", "size"],
        )

    ds = _as_dataset(source, columns=[id_col, text_col])
    return ds.map_batches(shingles, batch_format="pyarrow", batch_size=batch_size)


def ngram_jaccard_pairs(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_freq: Optional[int] = None,
    num_buckets: int = 128,
) -> pd.DataFrame:
    """Exact pairs with n-gram-shingle Jaccard ≥ threshold.

    Fully distributed and join-free (per-doc sizes ride along on the
    shingle rows): inverted index (bucketed groupby on shingle_hash) →
    pair rows carrying (id_a, id_b, size_a, size_b) → one groupby(pair)
    whose group count IS the intersection → vectorized Jaccard filter.
    The only driver-side materialization is the final (small) pair
    list. ``max_shingle_freq`` skips pathological stop-shingles
    (documented skew guard — a shingle shared by k docs emits k(k−1)/2
    pairs). Returns columns (id_a, id_b, intersection, size_a, size_b)
    — integers only, so the DuckDB oracle comparison is exact.
    """
    sh = shingle_table(source, id_col, text_col, n)

    def emit(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.rename(columns={id_col: "__id"})
        return _pairs_within_groups(
            b, ["shingle_hash"], "__id", carry_cols=["size"],
            max_group=max_shingle_freq,
        )

    pairs = bucketed_groupby(sh, ["shingle_hash"], emit, num_buckets=num_buckets)
    inter = bucketed_count(
        pairs, ["id_a", "id_b", "size_a", "size_b"], "intersection"
    )

    def jaccard_filter(batch: pa.Table) -> pa.Table:
        i = batch["intersection"].to_numpy(zero_copy_only=False).astype(np.float64)
        union = (
            batch["size_a"].to_numpy(zero_copy_only=False)
            + batch["size_b"].to_numpy(zero_copy_only=False)
            - i
        )
        return batch.filter(pa.array(i / union >= threshold))

    out = inter.map_batches(jaccard_filter, batch_format="pyarrow").to_pandas()
    cols = ["id_a", "id_b", "intersection", "size_a", "size_b"]
    if len(out) == 0:  # empty to_pandas loses the schema
        return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
    out = out[cols].astype(np.int64)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# --------------------------------------------------------------------------- #
# MinHash + LSH                                                               #
# --------------------------------------------------------------------------- #


def _perm_params(num_perms: int, seed: int = 0x5EED) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perms, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perms, dtype=np.uint64)
    return a, b


class MinHashStage:
    """Stateful actor-pool stage: permutation parameters built once per
    actor in ``__init__`` (not per batch); ``__call__`` emits one
    (doc_id, band, band_hash) row per LSH band per doc.

    Signature computation is loop-free over rows: all shingle hashes of
    the batch concatenate into one array; per-perm affine hashes reduce
    to per-doc minima with ``np.minimum.reduceat`` over doc boundaries.
    Perms are processed in chunks to bound the (perm × shingle) matrix.
    """

    def __init__(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        num_perms: int = 128,
        bands: int = 32,
        seed: int = 0x5EED,
    ):
        assert num_perms % bands == 0
        self.id_col, self.text_col, self.n = id_col, text_col, n
        self.num_perms, self.bands = num_perms, bands
        self.rows_per_band = num_perms // bands
        self.a, self.b = _perm_params(num_perms, seed)

    def _signatures(
        self, batch: pa.Table
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n_docs = len(ids)
        sig = np.full((n_docs, self.num_perms), np.iinfo(np.uint64).max, np.uint64)
        sh = _shingle_frame(batch[self.text_col], self.n)
        if len(sh) == 0:
            return ids, sig, np.zeros(n_docs, bool)
        doc_of = sh["row"].to_numpy()  # sorted ascending by construction
        h = sh["shingle_hash"].to_numpy().astype(np.uint64)
        # reduceat needs contiguous in-range segments: restrict to docs
        # that own ≥1 shingle (trailing empty docs would index past the
        # end of ``h``), then scatter the minima back by mask.
        seg_starts = np.searchsorted(doc_of, np.arange(n_docs))
        nonempty = np.searchsorted(doc_of, np.arange(n_docs), side="right") > seg_starts
        ne_starts = seg_starts[nonempty]
        chunk = 16  # perms per chunk → ≤ (16 × |shingles|) temp matrix
        for c0 in range(0, self.num_perms, chunk):
            a = self.a[c0 : c0 + chunk, None]
            b = self.b[c0 : c0 + chunk, None]
            vals = (a * h[None, :] + b) % _MERSENNE  # (chunk, S)
            mins = np.minimum.reduceat(vals, ne_starts, axis=1)  # (chunk, nonempty)
            sig[nonempty, c0 : c0 + chunk] = mins.T
        return ids, sig, nonempty

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, sig, nonempty = self._signatures(batch)
        # Empty/short docs have no shingles → all-max signatures; emitting
        # them would make every such doc collide in every band (quadratic
        # candidate blowup on dirty corpora). They can never be near-dups
        # (no shingles), so drop them from band emission.
        ids, sig = ids[nonempty], sig[nonempty]
        n_docs = len(ids)
        band_hashes = np.empty((n_docs, self.bands), np.uint64)
        for bi in range(self.bands):
            block = sig[:, bi * self.rows_per_band : (bi + 1) * self.rows_per_band]
            acc = np.zeros(n_docs, np.uint64)
            for col in range(block.shape[1]):
                acc = (acc * np.uint64(1099511628211) + block[:, col]) % _MERSENNE
            band_hashes[:, bi] = acc
        return pa.table(
            {
                self.id_col: pa.array(np.repeat(ids, self.bands), pa.int64()),
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n_docs)
                ),
                "band_hash": pa.array(band_hashes.reshape(-1), pa.uint64()),
            }
        )


def minhash_band_keys(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    num_perms: int = 128,
    bands: int = 32,
    seed: int = 0x5EED,
    batch_size: int = 4096,
) -> Dataset:
    """(id, band_key) rows — one int64 key per LSH band per doc,
    ``band_key = (band_hash · FNV + band) mod M`` so equal keys mean
    "same band AND same band hash". Two docs share ≥1 band key iff
    banded LSH would pair them — the key stream is what a PERSISTENT
    near-dup index stores (see ``state.key_index.near_dup_against_
    index``: crawl N+1 probes crawl 1..N's band keys the same way new
    exact keys probe the exact index). Docs with no shingles emit no
    keys (they can never be near-dups)."""
    stage = MinHashStage(id_col, text_col, n, num_perms, bands, seed)

    def keys(batch: pa.Table) -> pa.Table:
        t = stage(batch)
        bh = t["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        k = (bh * np.uint64(1099511628211) + b) % _MERSENNE
        return pa.table(
            {
                id_col: t[id_col],
                "band_key": pa.array(k.view(np.int64), pa.int64()),
            }
        )

    ds = _as_dataset(source, columns=[id_col, text_col])
    return ds.map_batches(keys, batch_format="pyarrow", batch_size=batch_size)


def minhash_lsh_candidates(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    num_perms: int = 128,
    bands: int = 32,
    seed: int = 0x5EED,
    batch_size: int = 4096,
    num_buckets: int = 128,
) -> Dataset:
    """Distinct candidate pairs from banded MinHash-LSH: signature stage
    → bucketed groupby on (band, band_hash) → vectorized pair emission
    → distinct via groupby(pair)."""
    ds = _as_dataset(source, columns=[id_col, text_col])
    stage = MinHashStage(id_col, text_col, n, num_perms, bands, seed)
    bands_ds = ds.map_batches(
        stage.__call__, batch_format="pyarrow", batch_size=batch_size,
    )

    def emit(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.rename(columns={id_col: "__id"})
        return _pairs_within_groups(b, ["band", "band_hash"], "__id")

    pairs = bucketed_groupby(
        bands_ds, ["band", "band_hash"], emit, num_buckets=num_buckets
    )
    distinct = bucketed_count(pairs, ["id_a", "id_b"])
    return distinct.drop_columns(["count"])


def _involved_id_bloom(cand: Dataset, n_bits: int = 1 << 23):
    """Bloom filter over every doc id appearing in the candidate pair
    Dataset: per-batch partial blooms (fixed-size bitmaps) OR-merged on
    the driver — the pair list itself never materializes anywhere."""
    from ..functions.sketches import BloomFilter

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(n_bits)
        ids = np.concatenate(
            [
                batch["id_a"].to_numpy(zero_copy_only=False),
                batch["id_b"].to_numpy(zero_copy_only=False),
            ]
        ).astype(np.int64)
        bf.add_hashes(hash64(ids))
        return pa.table({"bloom": pa.array([bf.to_bytes()], pa.binary())})

    merged = BloomFilter(n_bits)
    for row in cand.map_batches(
        partial, batch_format="pyarrow", batch_size=1 << 20
    ).iter_rows():
        merged = merged.merge(BloomFilter.from_bytes(row["bloom"]))
    return merged


def verify_pairs_distributed(
    source: Any,
    cand: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    *,
    num_buckets: int = 128,
    max_shingle_freq: Optional[int] = None,
) -> Dataset:
    """Exact shingle-Jaccard stats for a candidate pair Dataset, fully
    distributed (round-1 verdict fix: the old tier collected involved
    docs to the driver and built Python sets per doc — a dirty corpus
    can produce candidate lists that don't fit one machine).

    Semi-join through the distributed shingle table:

    1. Bloom the involved doc ids (streaming; false positives only add
       harmless extra shingle rows).
    2. Shingle ONLY bloom-member docs; inverted-index pair sweep +
       count — identical machinery to :func:`ngram_jaccard_pairs`, but
       over the involved subset, so cost scales with candidates, not
       the corpus.
    3. Bucketed groupby on (id_a, id_b) joins the counted pairs back to
       the candidate set (non-candidate co-shingled pairs drop out;
       candidates with zero shared shingles drop too — their Jaccard
       is 0).

    Returns a Dataset with (id_a, id_b, intersection, size_a, size_b).
    """
    bloom = _involved_id_bloom(cand)
    bref = ray.put(bloom)

    def keep_involved(batch: pa.Table) -> pa.Table:
        bf = ray.get(bref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(bf.contains_hashes(hash64(ids))))

    sub = _as_dataset(source, columns=[id_col, text_col]).map_batches(
        keep_involved, batch_format="pyarrow"
    )
    sh = shingle_table(sub, id_col, text_col, n)

    def emit(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.rename(columns={id_col: "__id"})
        return _pairs_within_groups(
            b, ["shingle_hash"], "__id", carry_cols=["size"],
            max_group=max_shingle_freq,
        )

    pairs = bucketed_groupby(sh, ["shingle_hash"], emit, num_buckets=num_buckets)
    inter = bucketed_count(
        pairs, ["id_a", "id_b", "size_a", "size_b"], "intersection"
    )

    cols = ["id_a", "id_b", "size_a", "size_b", "intersection", "is_cand"]

    def tag_counts(batch: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(batch.num_rows, np.int64))
        t = batch.append_column("is_cand", z)
        return t.select(cols)

    def tag_cands(batch: pa.Table) -> pa.Table:
        z = np.zeros(batch.num_rows, np.int64)
        return pa.table(
            {
                "id_a": pc.cast(batch["id_a"], pa.int64()),
                "id_b": pc.cast(batch["id_b"], pa.int64()),
                "size_a": pa.array(z),
                "size_b": pa.array(z),
                "intersection": pa.array(z),
                "is_cand": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    unioned = inter.map_batches(tag_counts, batch_format="pyarrow").union(
        cand.map_batches(tag_cands, batch_format="pyarrow")
    )

    def keep_candidates(bucket: pd.DataFrame) -> pd.DataFrame:
        keys = bucket.loc[bucket.is_cand == 1, ["id_a", "id_b"]].drop_duplicates()
        counts = bucket[bucket.is_cand == 0]
        out = counts.merge(keys, on=["id_a", "id_b"], how="inner")
        return out[["id_a", "id_b", "intersection", "size_a", "size_b"]]

    return bucketed_groupby(
        unioned, ["id_a", "id_b"], keep_candidates, num_buckets=num_buckets
    )


def minhash_near_dup_pairs(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    threshold: float = 0.5,
    num_perms: int = 128,
    bands: int = 32,
    seed: int = 0x5EED,
) -> pd.DataFrame:
    """MinHash-LSH candidates verified by exact shingle Jaccard ≥
    threshold — verification runs distributed through the shingle table
    (:func:`verify_pairs_distributed`); nothing but the final pair list
    reaches the driver. Same output schema as
    :func:`ngram_jaccard_pairs`; for thresholds comfortably below the
    true near-dup similarity the result equals the exact answer (miss
    prob (1−t^r)^b)."""
    cand = minhash_lsh_candidates(
        source, id_col, text_col, n=n, num_perms=num_perms, bands=bands, seed=seed
    )
    stats = verify_pairs_distributed(source, cand, id_col, text_col, n)
    out = stats.to_pandas()
    cols = ["id_a", "id_b", "intersection", "size_a", "size_b"]
    if len(out) == 0:
        return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
    out = out[cols].astype(np.int64)
    union = out.size_a + out.size_b - out.intersection
    out = out[out.intersection / union >= threshold]
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# --------------------------------------------------------------------------- #
# SimHash                                                                     #
# --------------------------------------------------------------------------- #


class SimHashStage:
    """64-bit SimHash per doc from token hashes (count-weighted).

    Vectorized: all token hashes of the batch unpack to a (tokens × 64)
    bit matrix (``np.unpackbits``); signed contributions sum per doc via
    ``np.add.reduceat``; the sign vector repacks to one uint64."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n_docs = len(ids)
        sims = np.zeros(n_docs, np.uint64)
        col = batch[self.text_col]
        s = pl.from_arrow(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        ).fill_null("")
        ex = (
            pl.DataFrame({"row": pl.int_range(0, n_docs, eager=True), "t": s})
            .with_columns(pl.col("t").str.split(" "))
            .explode("t", empty_as_null=True)
            .filter(pl.col("t").is_not_null() & (pl.col("t") != ""))
            .select(pl.col("row"), pl.col("t").hash(seed=0).alias("h"))
        )
        if len(ex):
            h = ex["h"].to_numpy().astype(np.uint64)
            doc_of = ex["row"].to_numpy()
            bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1)  # (T, 64)
            signed = bits.astype(np.int32) * 2 - 1
            seg_starts = np.searchsorted(doc_of, np.arange(n_docs))
            nonempty = (
                np.searchsorted(doc_of, np.arange(n_docs), side="right") > seg_starts
            )
            sums = np.zeros((n_docs, 64), np.int64)
            seg = np.add.reduceat(signed, seg_starts[nonempty], axis=0)
            sums[nonempty] = seg
            simbits = (sums > 0).astype(np.uint8)
            sims = np.packbits(simbits, axis=1).copy().view(np.uint64).reshape(-1)
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "simhash": pa.array(sims, pa.uint64()),
            }
        )


def simhash_pairs(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_hamming: int = 3,
    batch_size: int = 8192,
    num_buckets: int = 128,
) -> pd.DataFrame:
    """Pairs with SimHash hamming distance ≤ max_hamming.

    Candidates via 4×16-bit chunk banding — for max_hamming ≤ 3 the
    pigeonhole principle makes recall exact (≤3 differing bits can dirty
    at most 3 of the 4 chunks). Verification = vectorized popcount on
    the XOR inside the bucketed pair sweep."""
    ds = _as_dataset(source, columns=[id_col, text_col])
    sims = ds.map_batches(
        SimHashStage(id_col, text_col).__call__,
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    return hamming_pairs_from_hashes(
        sims, id_col, hash_col="simhash",
        max_hamming=max_hamming, num_buckets=num_buckets,
    )


def hamming_pairs_from_hashes(
    hashes: "Dataset",
    id_col: str,
    *,
    hash_col: str = "simhash",
    max_hamming: int = 3,
    num_buckets: int = 128,
) -> pd.DataFrame:
    """Pairs of ids whose 64-bit hashes differ by ≤ ``max_hamming``
    bits — the shared banding backend of :func:`simhash_pairs` (text)
    and the multimodal perceptual-hash near-dup (any stage emitting a
    64-bit locality hash plugs in here).

    Candidates via 4×16-bit chunk banding — for max_hamming ≤ 3 the
    pigeonhole principle makes recall exact (≤3 differing bits can
    dirty at most 3 of the 4 chunks); verification is a vectorized
    popcount on XOR inside the bucketed pair sweep. Exchange = 4 rows
    of (16-bit chunk, id, hash) per input row, never payloads."""

    def explode_chunks(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        s = batch[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        out_id, out_chunk_id, out_chunk, out_sim = [], [], [], []
        for ci in range(4):
            chunk = (s >> np.uint64(ci * 16)) & np.uint64(0xFFFF)
            out_id.append(ids)
            out_chunk_id.append(np.full(len(ids), ci, np.int32))
            out_chunk.append(chunk)
            out_sim.append(s)
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "chunk_id": pa.array(np.concatenate(out_chunk_id)),
                "chunk": pa.array(np.concatenate(out_chunk), pa.uint64()),
                "simhash": pa.array(np.concatenate(out_sim), pa.uint64()),
            }
        )

    exploded = hashes.map_batches(explode_chunks, batch_format="pyarrow")

    def emit(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.rename(columns={id_col: "__id"})
        p = _pairs_within_groups(
            b, ["chunk_id", "chunk"], "__id", carry_cols=["simhash"]
        )
        if len(p) == 0:
            return pd.DataFrame(
                {c: pd.Series(dtype=np.int64) for c in ["id_a", "id_b", "hamming"]}
            )
        x = p["simhash_a"].to_numpy().astype(np.uint64) ^ p[
            "simhash_b"
        ].to_numpy().astype(np.uint64)
        ham = popcount64(x)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {
                "id_a": p["id_a"].to_numpy()[keep],
                "id_b": p["id_b"].to_numpy()[keep],
                "hamming": ham[keep],
            }
        )

    pairs = bucketed_groupby(
        exploded, ["chunk_id", "chunk"], emit, num_buckets=num_buckets
    )
    out = pairs.to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {c: pd.Series(dtype=np.int64) for c in ["id_a", "id_b", "hamming"]}
        )
    out = out.drop_duplicates(subset=["id_a", "id_b"]).astype(np.int64)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# --------------------------------------------------------------------------- #
# embedding near-dup                                                          #
# --------------------------------------------------------------------------- #


def _embedding_matrix(
    batch: pa.Table, vec_col: str, dtype: "np.dtype | type" = np.float64
) -> np.ndarray:
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        flat = col.flatten().to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return np.empty((0, 0))
        return flat.astype(dtype, copy=False).reshape(-1, dim)
    flat = col.values.to_numpy(zero_copy_only=False).astype(
        dtype, copy=False
    )
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    if len(widths) == 0:
        return np.empty((0, 0))
    dim = int(widths[0])
    if not (widths == dim).all():
        raise ValueError("ragged embedding column")
    return flat[offsets[0]:offsets[-1]].reshape(-1, dim)


def load_embeddings(
    source: Any, id_col: str = "vec_id", vec_col: str = "embedding"
) -> Tuple[np.ndarray, np.ndarray]:
    """(ids, L2-normalized float64 matrix) — driver-side collect of the
    broadcast side. The brute-force baseline's documented assumption:
    the comparison matrix fits worker memory (it ships via ``ray.put``
    ONCE, not per batch)."""
    ds = _as_dataset(source, columns=[id_col, vec_col])
    ids_parts, mats = [], []
    for batch in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        ids_parts.append(batch[id_col].to_numpy(zero_copy_only=False))
        mats.append(_embedding_matrix(batch, vec_col))
    ids = np.concatenate(ids_parts)
    M = np.vstack([m for m in mats if m.size])
    order = np.argsort(ids, kind="stable")
    ids, M = ids[order], M[order]
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, M / norms


def embedding_cosine_pairs_blocked(
    source: Any,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.4,
    n_blocks: int = 16,
    batch_size: int = 8192,
) -> Dataset:
    """Exact cosine ≥ threshold pairs WITHOUT broadcasting the corpus:
    block-partitioned pair generation (round-2 verdict fix #3). Rows
    hash into ``n_blocks`` id-blocks; each unordered block pair (i ≤ j)
    is one group, and every row is replicated to the n_blocks groups it
    participates in. A group holds only its two blocks' vectors
    (~2/n_blocks of the corpus — grow ``n_blocks`` so that fits a
    worker), extracts them zero-copy, and runs one rectangle (i < j) or
    strictly-lower-triangle (i == j) f32 matmul. Each qualifying pair
    lands in exactly one group, so no distinct pass is needed.

    O(n²/2) compute is inherent to exact all-pairs — this tier removes
    the O(n) *worker-memory* term; total shuffle traffic is
    n_blocks × corpus bytes. For sub-quadratic compute use
    :func:`embedding_lsh_pairs` / :func:`semantic_dedup`."""
    ds = _as_dataset(source, columns=[id_col, vec_col])
    nb = int(n_blocks)

    def replicate(batch: pa.Table) -> pa.Table:
        M = _embedding_matrix(batch, vec_col, dtype=np.float32)
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        Mn = np.ascontiguousarray(M / norms, dtype=np.float32)
        dim = Mn.shape[1] if Mn.size else 1
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blk = (hash64(ids) % np.uint64(nb)).astype(np.int64)
        # group (i, j), i <= j ← a row in block b joins every pair
        # containing b: (k, b) for k < b and (b, k) for k >= b
        other = np.arange(nb, dtype=np.int64)
        lo = np.minimum(blk[:, None], other[None, :])
        hi = np.maximum(blk[:, None], other[None, :])
        pk = (lo * nb + hi).reshape(-1)
        rep_ids = np.repeat(ids, nb)
        rep_blk = np.repeat(blk, nb)
        rep = np.repeat(Mn, nb, axis=0)
        fsl = pa.FixedSizeListArray.from_arrays(
            pa.array(rep.reshape(-1), pa.float32()), dim
        )
        return pa.table(
            {
                id_col: pa.array(rep_ids, pa.int64()),
                "__blk": pa.array(rep_blk, pa.int64()),
                "__pk": pa.array(pk, pa.int64()),
                vec_col: fsl,
            }
        )

    thr = np.float32(threshold)

    def group_pairs(group: pa.Table) -> pa.Table:
        pk = int(group["__pk"][0].as_py())
        i, j = divmod(pk, nb)
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blk = group["__blk"].to_numpy(zero_copy_only=False).astype(np.int64)
        Mn = _embedding_matrix(group, vec_col, dtype=np.float32)
        out_a: List[np.ndarray] = []
        out_b: List[np.ndarray] = []
        chunk = 2048
        if i == j:
            order = np.argsort(ids, kind="stable")
            ids, Mn = ids[order], Mn[order]
            m = len(ids)
            for c0 in range(0, m, chunk):
                c1 = min(c0 + chunk, m)
                rows = Mn[c0:c1]
                if c0:
                    S = rows @ Mn[:c0].T
                    r, c = np.nonzero(S >= thr)
                    out_a.append(ids[c])
                    out_b.append(ids[r + c0])
                S2 = rows @ rows.T
                r, c = np.nonzero(np.tril(S2, -1) >= thr)
                out_a.append(ids[c + c0])
                out_b.append(ids[r + c0])
        else:
            left, right = blk == i, blk == j
            ids_l, M_l = ids[left], Mn[left]
            ids_r, M_r = ids[right], Mn[right]
            for c0 in range(0, len(ids_l), chunk):
                rows = M_l[c0 : c0 + chunk]
                S = rows @ M_r.T
                r, c = np.nonzero(S >= thr)
                la, rb = ids_l[r + c0], ids_r[c]
                out_a.append(np.minimum(la, rb))
                out_b.append(np.maximum(la, rb))
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        return pa.table(
            {"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())}
        )

    return (
        ds.map_batches(replicate, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__pk")
        .map_groups(group_pairs, batch_format="pyarrow")
    )


def embedding_cosine_pairs(
    source: Any,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.4,
    batch_size: int = 2048,
    max_broadcast_rows: int = 2_000_000,
) -> pd.DataFrame:
    """Exact pairs with cosine ≥ threshold (id_a < id_b): one broadcast
    of the normalized matrix + one float64 matmul per batch. Corpora
    over ``max_broadcast_rows`` route to the block-partitioned tier
    (:func:`embedding_cosine_pairs_blocked`) instead of shipping an
    unboundedly large matrix to every worker."""
    ds_probe = _as_dataset(source, columns=[id_col])
    def _sorted_pairs(out: pd.DataFrame) -> pd.DataFrame:
        if len(out) == 0:  # Ray to_pandas() loses the schema when empty
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype=np.int64),
                    "id_b": pd.Series([], dtype=np.int64),
                }
            )
        return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    if ds_probe.count() > max_broadcast_rows:
        out = embedding_cosine_pairs_blocked(
            source, id_col, vec_col, threshold=threshold
        ).to_pandas()
        return _sorted_pairs(out)
    ids, M = load_embeddings(source, id_col, vec_col)
    ref = ray.put((ids, M))

    def batch_pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(ref)
        bm = _embedding_matrix(batch, vec_col)
        bids = batch[id_col].to_numpy(zero_copy_only=False)
        norms = np.linalg.norm(bm, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (bm / norms) @ all_m.T  # (batch, n)
        keep = (sims >= threshold) & (bids[:, None] < all_ids[None, :])
        r, c = np.nonzero(keep)
        return pa.table(
            {
                "id_a": pa.array(bids[r], pa.int64()),
                "id_b": pa.array(all_ids[c], pa.int64()),
            }
        )

    ds = _as_dataset(source, columns=[id_col, vec_col])
    out = ds.map_batches(
        batch_pairs, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()
    return _sorted_pairs(out)


def _normalized_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    """L2-normalized contiguous float32 matrix from a vector column
    (zero vectors pass through unchanged instead of dividing by 0)."""
    m = _embedding_matrix(batch, vec_col, dtype=np.float32)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return np.ascontiguousarray(m / norms, dtype=np.float32)


def _band_keys(
    mn: np.ndarray,
    planes: np.ndarray,
    weights: np.ndarray,
    bands: int,
    bits_per_band: int,
) -> np.ndarray:
    """(n, bands) packed random-hyperplane sign-bit keys. Each band's
    ``bits_per_band`` sign bits pack into one uint64, salted with the
    band index so the b tables never collide with each other in a
    shared shuffle."""
    bits = (mn @ planes) > 0  # (n, bands*r)
    keys = np.empty((len(mn), bands), np.uint64)
    for bi in range(bands):
        block = bits[:, bi * bits_per_band : (bi + 1) * bits_per_band]
        keys[:, bi] = (block.astype(np.uint64) @ weights) | (
            np.uint64(bi) << np.uint64(bits_per_band)
        )
    return keys


def embedding_lsh_pairs(
    source: Any,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.4,
    bands: int = 8,
    bits_per_band: int = 8,
    seed: int = 0xA11,
    batch_size: int = 4096,
    num_buckets: int = 128,
    ship_vectors: bool = True,
) -> Dataset:
    """Approximate cosine near-dup pairs via BANDED random-hyperplane
    LSH — the MinHash band trick in sign-bit space. ``bands``
    independent tables of ``bits_per_band`` hyperplane sign bits each;
    a pair is a candidate if ANY band's bits agree, then verified by
    exact cosine (so output pairs are always a subset of the exact
    ≥ threshold set). Recall for a pair at angle θ is
    1 − (1 − p^r)^b with p = 1 − θ/π — the multi-band S-curve instead
    of a single table's p^r cliff (round-2 verdict fix #2).

    Two shuffle-traffic tiers, IDENTICAL output (same seeded planes ⇒
    same candidate set; verification exact in both):

    * ``ship_vectors=True`` (default): the normalized f32 vector rides
      the band shuffle — ``bands`` × (8 B key + 4·dim B vector) per
      row — and verification is in-bucket chunked slab matmuls. Best
      when candidate pairs are plentiful relative to the corpus.
    * ``ship_vectors=False`` (sketch-then-verify): the band shuffle
      carries only (id, key) = 16 B × ``bands`` per row; candidate
      pairs are verified afterwards by shipping ONLY involved vectors
      (Bloom-prefiltered, the :func:`verify_pairs_distributed`
      pattern) through two bucketed lookup rounds — ~2 vector copies
      per involved id instead of ``bands`` copies per corpus row. Use
      ``bits_per_band ≥ 16`` here: without in-bucket verification a
      band-key run of m rows emits all m(m-1)/2 candidates, so the
      key space must keep runs small.

    Scale shape: no O(n²) anywhere; per-bucket work is a zero-copy
    Arrow matrix extraction + chunked slab matmuls over sorted
    band-key runs (the SemDeDup pattern, never per-row boxing).
    Returns a Dataset of distinct ``(id_a, id_b)`` with id_a < id_b.
    """
    if bits_per_band < 1 or bits_per_band > 32 or bands < 1:
        raise ValueError("need 1 <= bits_per_band <= 32 and bands >= 1")
    ds = _as_dataset(source, columns=[id_col, vec_col])
    sample = next(iter(ds.iter_batches(batch_size=1, batch_format="pyarrow")))
    dim = _embedding_matrix(sample, vec_col).shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(dim, bands * bits_per_band)).astype(np.float32)
    weights = (1 << np.arange(bits_per_band, dtype=np.uint64))
    if not ship_vectors:
        return _lsh_sketch_verify(
            ds,
            id_col=id_col,
            vec_col=vec_col,
            dim=dim,
            planes=planes,
            weights=weights,
            bands=bands,
            bits_per_band=bits_per_band,
            threshold=threshold,
            batch_size=batch_size,
            num_buckets=num_buckets,
        )

    def bucketize(batch: pa.Table) -> pa.Table:
        mn = _normalized_matrix(batch, vec_col)
        keys = _band_keys(mn, planes, weights, bands, bits_per_band)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        rep = np.repeat(mn, bands, axis=0)
        fsl = pa.FixedSizeListArray.from_arrays(
            pa.array(rep.reshape(-1), pa.float32()), dim or 1
        )
        band_key = keys.reshape(-1).astype(np.int64)
        gb = (hash64(band_key) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, bands), pa.int64()),
                "band_key": pa.array(band_key, pa.int64()),
                vec_col: fsl,
                "__gb": pa.array(gb, pa.int64()),
            }
        )

    thr = np.float32(threshold)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        # one call handles ALL band buckets of its hash bucket: sorted
        # band_key runs segment the zero-copy matrix; within a run the
        # chunked rectangle+triangle slabs bound peak memory at
        # chunk × run (a hot bucket never allocates run × run)
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = group["band_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        M = _embedding_matrix(group, vec_col, dtype=np.float32)
        order = np.lexsort((ids, keys))
        ids, keys, Mn = ids[order], keys[order], M[order]
        out_a: List[np.ndarray] = []
        out_b: List[np.ndarray] = []
        starts = np.flatnonzero(
            np.diff(keys, prepend=keys[0] - 1 if len(keys) else 0)
        )
        bounds = list(starts) + [len(keys)]
        chunk = 2048
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            m = s1 - s0
            if m < 2:
                continue
            seg_ids, seg = ids[s0:s1], Mn[s0:s1]
            for c0 in range(0, m, chunk):
                c1 = min(c0 + chunk, m)
                rows = seg[c0:c1]
                if c0:
                    S = rows @ seg[:c0].T  # rectangle vs all prior rows
                    r, c = np.nonzero(S >= thr)
                    out_a.append(seg_ids[c])
                    out_b.append(seg_ids[r + c0])
                S2 = rows @ rows.T
                r, c = np.nonzero(np.tril(S2, -1) >= thr)
                out_a.append(seg_ids[c + c0])
                out_b.append(seg_ids[r + c0])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        return pa.table(
            {"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())}
        )

    pairs = (
        ds.map_batches(bucketize, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__gb")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # distinct across bands (a close pair collides in several tables)
    return bucketed_count(pairs, ["id_a", "id_b"]).drop_columns(["count"])


def _lsh_sketch_verify(
    ds: Dataset,
    *,
    id_col: str,
    vec_col: str,
    dim: int,
    planes: np.ndarray,
    weights: np.ndarray,
    bands: int,
    bits_per_band: int,
    threshold: float,
    batch_size: int,
    num_buckets: int,
) -> Dataset:
    """``ship_vectors=False`` tier of :func:`embedding_lsh_pairs`.

    Phase 1 shuffles only (id, band_key) rows — 16 B × bands per row —
    and emits every within-run pair as a CANDIDATE (no vectors in the
    bucket, so no in-bucket verification; ``bits_per_band`` must keep
    runs small). Phase 2 verifies candidates exactly: a Bloom filter
    of involved ids (OR-reduced partial registers, the
    :func:`bloom_prefilter_join` pattern) prunes the corpus scan so
    only (probably-)involved vectors shuffle, then two bucketed lookup
    rounds attach vec_a and vec_b and keep pairs with cosine ≥
    threshold. Output is identical to the ship-vectors tier: same
    seeded planes ⇒ same candidate set, and verification is exact in
    both (pinned by test).

    Driver footprint: Bloom registers only (n_bits/8 bytes). The
    candidate pair list is materialized (it is consumed twice: Bloom
    build + round A) — pairs only, never vectors.
    """
    from ..functions.sketches import BloomFilter

    fsl = pa.list_(pa.float32(), dim or 1)
    empty_pairs = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )
    empty_round = pa.table(
        {
            "__gb": pa.array([], pa.int64()),
            "__role": pa.array([], pa.int64()),
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "vec": pa.array([], fsl),
        }
    )

    def bucketize_keys(batch: pa.Table) -> pa.Table:
        mn = _normalized_matrix(batch, vec_col)
        keys = _band_keys(mn, planes, weights, bands, bits_per_band)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        band_key = keys.reshape(-1).astype(np.int64)
        gb = (hash64(band_key) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, bands), pa.int64()),
                "band_key": pa.array(band_key, pa.int64()),
                "__gb": pa.array(gb, pa.int64()),
            }
        )

    def bucket_candidates(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = group["band_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(ids):
            return empty_pairs
        order = np.lexsort((ids, keys))
        ids, keys = ids[order], keys[order]
        out_a: List[np.ndarray] = []
        out_b: List[np.ndarray] = []
        starts = np.flatnonzero(np.diff(keys, prepend=keys[0] - 1))
        bounds = list(starts) + [len(keys)]
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            m = s1 - s0
            if m < 2:
                continue
            # an id appears at most once per band_key (band-salted
            # keys), and the lexsort orders ids within the run, so
            # i < j ⇒ seg[i] < seg[j]: pairs come out canonical
            i, j = np.triu_indices(m, 1)
            seg = ids[s0:s1]
            out_a.append(seg[i])
            out_b.append(seg[j])
        if not out_a:
            return empty_pairs
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    cand = (
        ds.map_batches(
            bucketize_keys, batch_format="pyarrow", batch_size=batch_size
        )
        .groupby("__gb")
        .map_groups(bucket_candidates, batch_format="pyarrow")
    )
    # distinct across bands; materialized — the pair list is the small
    # side and feeds two consumers (Bloom build + round A), and the
    # pin breaks the groupby→union→groupby shuffle chain
    cand = bucketed_count(cand, ["id_a", "id_b"]).drop_columns(
        ["count"]
    ).materialize()

    def partial_bloom(batch: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                batch["id_a"].to_numpy(zero_copy_only=False).astype(np.int64),
                batch["id_b"].to_numpy(zero_copy_only=False).astype(np.int64),
            ]
        )
        bf = BloomFilter()
        bf.add_hashes(hash64(both))
        return pa.table({"bloom": pa.array([bf.to_bytes()], pa.binary())})

    merged = BloomFilter()
    for row in cand.map_batches(
        partial_bloom, batch_format="pyarrow", batch_size=256 * 1024
    ).iter_rows():
        merged = merged.merge(BloomFilter.from_bytes(row["bloom"]))
    bf_ref = ray.put(merged)

    def keyed_pairs(key: str, vec_from: Optional[str]):
        """Candidate rows routed to the bucket of ``key``; ``vec``
        carries the already-attached vector column (round B) or nulls
        (round A)."""

        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            kid = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
            gb = (hash64(kid) % np.uint64(num_buckets)).astype(np.int64)
            vec = (
                batch[vec_from] if vec_from is not None else pa.nulls(n, fsl)
            )
            return pa.table(
                {
                    "__gb": pa.array(gb, pa.int64()),
                    "__role": pa.array(np.zeros(n, np.int64), pa.int64()),
                    "id_a": batch["id_a"],
                    "id_b": batch["id_b"],
                    "vec": vec,
                }
            )

        return fn

    def keyed_vecs(key: str):
        """Bloom-surviving corpus vectors routed to the bucket of
        their own id, carried in the ``key`` column slot."""

        def fn(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = ray.get(bf_ref).contains_hashes(hash64(ids))
            if not keep.any():
                return empty_round
            ids = ids[keep]
            mn = _normalized_matrix(batch, vec_col)[
                np.flatnonzero(keep)
            ]
            n = len(ids)
            vec = pa.FixedSizeListArray.from_arrays(
                pa.array(mn.reshape(-1), pa.float32()), dim or 1
            )
            gb = (hash64(ids) % np.uint64(num_buckets)).astype(np.int64)
            idv = pa.array(ids, pa.int64())
            return pa.table(
                {
                    "__gb": pa.array(gb, pa.int64()),
                    "__role": pa.array(np.ones(n, np.int64), pa.int64()),
                    "id_a": idv if key == "id_a" else pa.nulls(n, pa.int64()),
                    "id_b": idv if key == "id_b" else pa.nulls(n, pa.int64()),
                    "vec": vec,
                }
            )

        return fn

    def _split_lookup(group: pa.Table, key: str):
        """(pair table, sorted vec ids, vec matrix rows) of a bucket."""
        role = group["__role"].to_numpy(zero_copy_only=False)
        vmask = role == 1
        t_vec = group.filter(pa.array(vmask))
        t_pair = group.filter(pa.array(~vmask))
        vids = t_vec[key].to_numpy(zero_copy_only=False).astype(np.int64)
        V = _embedding_matrix(t_vec, "vec", dtype=np.float32)
        order = np.argsort(vids)
        return t_pair, vids[order], V[order]

    def _lookup(vids: np.ndarray, V: np.ndarray, want: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(vids, want)
        if len(vids) == 0 or not np.array_equal(
            vids[np.minimum(pos, len(vids) - 1)], want
        ):
            raise ValueError(
                "candidate id missing its corpus vector — id/bucket "
                "routing bug in _lsh_sketch_verify"
            )
        return V[pos]

    def attach_a(group: pa.Table) -> pa.Table:
        t_pair, vids, V = _split_lookup(group, "id_a")
        if not len(t_pair):
            return empty_round
        ia = t_pair["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        ib = t_pair["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        vec_a = _lookup(vids, V, ia)
        gb = (hash64(ib) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {
                "__gb": pa.array(gb, pa.int64()),
                "__role": pa.array(np.zeros(len(ia), np.int64), pa.int64()),
                "id_a": pa.array(ia, pa.int64()),
                "id_b": pa.array(ib, pa.int64()),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(vec_a.reshape(-1), pa.float32()), dim or 1
                ),
            }
        )

    thr = np.float32(threshold)

    def verify_b(group: pa.Table) -> pa.Table:
        t_pair, vids, V = _split_lookup(group, "id_b")
        if not len(t_pair):
            return empty_pairs
        ia = t_pair["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        ib = t_pair["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        vec_a = _embedding_matrix(t_pair, "vec", dtype=np.float32)
        vec_b = _lookup(vids, V, ib)
        sims = np.einsum("ij,ij->i", vec_a, vec_b)
        keep = sims >= thr
        return pa.table(
            {
                "id_a": pa.array(ia[keep], pa.int64()),
                "id_b": pa.array(ib[keep], pa.int64()),
            }
        )

    ra = (
        cand.map_batches(keyed_pairs("id_a", None), batch_format="pyarrow")
        .union(
            ds.map_batches(
                keyed_vecs("id_a"),
                batch_format="pyarrow",
                batch_size=batch_size,
            )
        )
        .groupby("__gb")
        .map_groups(attach_a, batch_format="pyarrow")
        .materialize()  # pair-sized; breaks the groupby→union→groupby chain
    )
    return (
        ra.map_batches(keyed_pairs("id_b", "vec"), batch_format="pyarrow")
        .union(
            ds.map_batches(
                keyed_vecs("id_b"),
                batch_format="pyarrow",
                batch_size=batch_size,
            )
        )
        .groupby("__gb")
        .map_groups(verify_b, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------- #
# near-dup cluster dedup (pairs → connected components → keep-one)            #
# --------------------------------------------------------------------------- #


def connected_components(pairs: pd.DataFrame) -> pd.DataFrame:
    """Union-find over an (id_a, id_b) pair frame → (doc_id, cluster_id)
    rows, cluster_id = the minimum member id of each component.

    The pair list is tiny relative to the corpus (near-dup candidates
    only), so the union-find runs driver-side; the expensive part —
    producing the pairs — is the distributed MinHash pipeline."""
    if len(pairs) == 0:  # incl. schema-less empties from to_pandas()
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "cluster_id": pd.Series([], dtype=np.int64),
            }
        )
    parent: Dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pairs["id_a"].tolist(), pairs["id_b"].tolist()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = sorted(parent)
    return pd.DataFrame(
        {
            "doc_id": pd.Series(members, dtype=np.int64),
            "cluster_id": pd.Series([find(m) for m in members], dtype=np.int64),
        }
    )


def _star_round(
    edges: Dataset, *, large: bool, num_buckets: int
) -> Dataset:
    """One large-star or small-star round (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC 2014) over canonical
    ``(u, v)`` edges with ``v < u``.

    * large-star: group the SYMMETRIZED edges by ``u``; with
      ``m = min(N(u) ∪ {u}})``, emit ``(v, m)`` for every neighbor
      ``v > u`` — larger neighbors re-attach to the local minimum.
    * small-star: group canonical edges by the larger endpoint ``u``
      (all neighbors ``< u``); with ``m = min N(u)``, emit ``(u, m)``
      and ``(v, m)`` for the other small neighbors — the local
      neighborhood collapses toward its minimum.

    Emitted edges are canonical by construction (``m`` is a minimum, so
    the second element is always strictly smaller). Input duplicates
    are removed per bucket — globally correct because equal edges share
    ``u`` and therefore a bucket; output duplicates (same edge emitted
    from two different groups) are transient and vanish at the next
    round's input dedup.
    """

    def prep(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        if large:
            u, v = np.concatenate([u, v]), np.concatenate([v, u])
        b = (hash64(u) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "__bucket": pa.array(b, pa.int64()),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        fresh = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
        u, v = u[fresh], v[fresh]  # in-bucket dedup == global dedup
        seg = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        counts = np.diff(np.r_[seg, len(u)])
        mins = np.minimum.reduceat(v, seg) if len(u) else np.empty(0, np.int64)
        if large:
            m = np.minimum(mins, u[seg])
            mf = np.repeat(m, counts)
            mask = v > u
            out_u, out_v = v[mask], mf[mask]
        else:
            mf = np.repeat(mins, counts)
            mask = v != mf
            out_u = np.concatenate([u[seg], v[mask]])
            out_v = np.concatenate([mins, mf[mask]])
        return pd.DataFrame(
            {
                "u": pd.Series(out_u, dtype=np.int64),
                "v": pd.Series(out_v, dtype=np.int64),
            }
        )

    return (
        edges.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def _edge_checksum(edges: Dataset) -> Tuple[int, int]:
    """(count, order-independent multiset hash) of a canonical edge
    Dataset — tiny partial per batch, summed driver-side."""

    def part(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = hash64(u) * np.uint64(0x9E3779B97F4A7C15) + hash64(v)
        chk = int(h.sum(dtype=np.uint64) & np.uint64((1 << 63) - 1))
        return pa.table(
            {
                "cnt": pa.array([len(u)], pa.int64()),
                "chk": pa.array([chk], pa.int64()),
            }
        )

    parts = edges.map_batches(part, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return 0, 0
    return int(parts["cnt"].sum()), int(parts["chk"].sum() & ((1 << 63) - 1))


def connected_components_distributed(
    pairs: Any,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    num_buckets: int = 64,
    max_rounds: int = 50,
) -> Dataset:
    """Distributed connected components over an ``(id_a, id_b)`` pair
    Dataset → ``(doc_id, cluster_id)`` labels, ``cluster_id`` = the
    minimum member of each component — the scale tier of
    :func:`connected_components` (which is a driver-side union-find
    over a collected pair list).

    Alternating large-star / small-star rounds (Kiveris et al., SoCC
    2014) converge in O(log n) rounds to star graphs centered at each
    component's minimum; each round is ONE bucketed shuffle of 16-byte
    ``(u, v)`` int64 edges with a vectorized sort + ``reduceat`` kernel
    per bucket — no driver-side state, edge text never moves, per-task
    memory bounded by the largest bucket (raise ``num_buckets`` at
    scale). Convergence is detected by an order-independent edge-set
    checksum (two scans of the tiny edge table per round); the edge
    Dataset is pinned with ``materialize()`` between rounds
    (back-to-back sort shuffles in one lazy DAG are a known Ray Data
    pathology — see NOTES.md).

    Output labels cover every node that appears in ``pairs`` (roots
    label themselves) and are byte-stable under any batch/bucket
    layout. Returns a Dataset; collect it only if the node count is
    known small.
    """
    src = _as_dataset(pairs, columns=None)

    def canon(batch: pa.Table) -> pa.Table:
        a = batch[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        u, v = np.maximum(a, b), np.minimum(a, b)
        keep = u != v
        return pa.table(
            {
                "u": pa.array(u[keep], pa.int64()),
                "v": pa.array(v[keep], pa.int64()),
            }
        )

    edges = src.map_batches(canon, batch_format="pyarrow").materialize()
    prev: Optional[Tuple[int, int]] = None
    for _ in range(max_rounds):
        edges = _star_round(edges, large=True, num_buckets=num_buckets)
        edges = _star_round(
            edges, large=False, num_buckets=num_buckets
        ).materialize()
        cur = _edge_checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components_distributed: no fixpoint in "
            f"{max_rounds} rounds"
        )

    def to_labels(batch: pa.Table) -> pa.Table:
        # star edges (child, root): children label directly; roots
        # label themselves (deduped below — a root appears once per
        # child).
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        roots = np.unique(v)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([u, roots]), pa.int64()),
                "cluster_id": pa.array(
                    np.concatenate([v, roots]), pa.int64()
                ),
            }
        )

    labels = edges.map_batches(to_labels, batch_format="pyarrow")
    return bucketed_groupby(
        labels,
        ["doc_id"],
        lambda df: df.drop_duplicates("doc_id"),
        num_buckets=num_buckets,
    )


def near_dup_dedup(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    threshold: float = 0.5,
    num_perms: int = 128,
    bands: int = 32,
    seed: int = 0x5EED,
    cc: str = "driver",
    max_broadcast_drop: int = 5_000_000,
) -> Dataset:
    """Near-duplicate-aware dedup of a document stream: MinHash-LSH +
    distributed exact verification find the J ≥ threshold pairs;
    connected components cluster them; every non-minimum member of a
    cluster is dropped from the stream via a broadcast drop-set
    (``ray.put`` once, `pc.is_in` per batch — no shuffle touches the
    full corpus) while the drop-set stays under ``max_broadcast_drop``.
    A duplicate-heavy corpus (drop-set O(corpus)) auto-routes the
    final filter through the Bloom-prefiltered bucketed ANTI-join
    instead (:func:`bloom_prefilter_join`): definite non-duplicates
    stream straight to the output, only Bloom-positive candidates
    shuffle — no unbounded driver/object-store key set. The anti
    route requires ``cc="distributed"`` (the driver union-find
    already holds the component table, so bounding only the broadcast
    would be theater).

    ``cc="driver"`` clusters via the driver-side union-find
    (:func:`connected_components` — fine while the pair list is small);
    ``cc="distributed"`` uses the large-star/small-star rounds of
    :func:`connected_components_distributed` (identical labels, no
    driver-side graph state — the 100-TB path for dirty corpora whose
    candidate-pair list itself is large).

    Returns the surviving rows (all columns of ``source``)."""
    pairs = minhash_near_dup_pairs(
        source, id_col, text_col, n=n, threshold=threshold,
        num_perms=num_perms, bands=bands, seed=seed,
    )
    ds = _as_dataset(source)
    if cc == "distributed":
        comp_ds = connected_components_distributed(pairs).materialize()

        def non_min(batch: pa.Table) -> pa.Table:
            m = pc.not_equal(batch["doc_id"], batch["cluster_id"])
            return batch.filter(m).select(["doc_id"])

        drop_ds = comp_ds.map_batches(non_min, batch_format="pyarrow")
        if drop_ds.count() > max_broadcast_drop:
            return _anti_join_drop(ds, drop_ds, id_col)
        comp = comp_ds.to_pandas()
    else:
        comp = connected_components(pairs)
    drop = comp.loc[comp.doc_id != comp.cluster_id, "doc_id"].to_numpy(np.int64)
    drop_ref = ray.put(pa.array(drop, pa.int64()))

    def keep(batch: pa.Table) -> pa.Table:
        drop_set = ray.get(drop_ref)
        if len(drop_set) == 0:
            return batch
        mask = pc.invert(
            pc.fill_null(pc.is_in(batch[id_col], value_set=drop_set), False)
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def _anti_join_drop(ds: Dataset, drop_ds: Dataset, id_col: str) -> Dataset:
    """Drop every ``ds`` row whose ``id_col`` appears in ``drop_ds``
    (column ``doc_id``) WITHOUT broadcasting the drop-set: the
    Bloom-prefiltered bucketed anti-join — rows whose key misses the
    Bloom filter (definite survivors, the vast majority even in
    duplicate-heavy corpora once components collapse to drop lists)
    stream straight through with no shuffle; only Bloom-positive
    candidates go through the exact anti-join. Output rows equal the
    broadcast ``pc.is_in`` filter exactly; column order is restored to
    the source schema."""
    from .relational import bloom_prefilter_join

    cols = ds.schema().names
    # anti mode outputs exactly left_cols — pass the FULL source column
    # list (key included) so survivors keep every column in order
    return bloom_prefilter_join(
        ds,
        drop_ds,
        left_key=id_col,
        right_key="doc_id",
        left_cols=cols,
        right_cols=[],
        how="anti",
    )


# --------------------------------------------------------------------------- #
# embedding near-dup dedup (+ exact-collapse guard for degenerate corpora)   #
# --------------------------------------------------------------------------- #


def collapse_exact_vectors(
    source: Any,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    num_buckets: int = 64,
    batch_size: int = 4096,  # 16Ki measured 2× slower at 8M×64d
) -> Dataset:
    """One row per DISTINCT vector byte pattern, carrying the
    minimum-id member as representative — the pre-collapse guard for
    degenerate corpora (mass-duplicated embeddings) where identical
    vectors share every LSH band bucket and make in-bucket work
    O(m²). Identity is byte equality of the canonical float32
    representation (the dtype every embedding tier computes in); NaN
    lanes compare by bytes (a NaN-bearing vector equals its copies),
    and -0.0 vs 0.0 stay distinct (conservative).

    Distributed shape: per batch each vector's bytes fold into a
    128-bit double hash (uint64 lanes, FNV multiply-xor, two
    independent :func:`hash64` seeds) and (h1, h2, id, vec) rows
    shuffle bucketed on h1. Per bucket, sorted (h1, h2, id) runs are
    candidate duplicate groups; every grouped row is byte-compared
    against its run head, and a mismatch raises — the
    collision-checked double-hash scheme of the exact uniqueness
    kernel, never a silent merge. The run head is the minimum id.
    """
    ds = _as_dataset(source, columns=[id_col, vec_col])
    sample = next(iter(ds.iter_batches(batch_size=1, batch_format="pyarrow")))
    dim = _embedding_matrix(sample, vec_col).shape[1]
    prime = np.uint64(0x100000001B3)
    n_lanes = (dim + 1) // 2
    # positional multipliers prime^j (mod 2^64) make the fold
    # order-sensitive; elementwise uint64 arithmetic wraps like C
    mult = np.empty(max(n_lanes, 1), np.uint64)
    mult[0] = np.uint64(1)
    for _j in range(1, len(mult)):
        mult[_j] = mult[_j - 1] * prime

    def _vec_hashes(M: np.ndarray) -> "Tuple[np.ndarray, np.ndarray]":
        n, d = M.shape
        if d % 2:
            M = np.concatenate([M, np.zeros((n, 1), np.float32)], axis=1)
        lanes = np.ascontiguousarray(M).view(np.uint64)
        # TWO vectorized hash calls total (one per seed) over the flat
        # lane buffer, then a positional polynomial fold per row — not
        # a per-lane hash loop (64 calls/batch dominated the profile)
        flat = lanes.reshape(-1)
        H1 = hash64(flat, seed=0).reshape(n, -1)
        H2 = hash64(flat, seed=1).reshape(n, -1)
        h1 = np.sum(H1 * mult, axis=1, dtype=np.uint64)
        h2 = np.sum(H2 * mult, axis=1, dtype=np.uint64)
        return h1, h2

    def keyed(batch: pa.Table) -> pa.Table:
        M = np.ascontiguousarray(
            _embedding_matrix(batch, vec_col, dtype=np.float32)
        )
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h1, h2 = _vec_hashes(M)
        return pa.table(
            {
                "__gb": pa.array(
                    (h1 % np.uint64(num_buckets)).astype(np.int64), pa.int64()
                ),
                "__h1": pa.array(h1, pa.uint64()),
                "__h2": pa.array(h2, pa.uint64()),
                id_col: pa.array(ids, pa.int64()),
                vec_col: pa.FixedSizeListArray.from_arrays(
                    pa.array(M.reshape(-1), pa.float32()), dim or 1
                ),
            }
        )

    def collapse(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h1 = group["__h1"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h2 = group["__h2"].to_numpy(zero_copy_only=False).astype(np.uint64)
        M = _embedding_matrix(group, vec_col, dtype=np.float32)
        order = np.lexsort((ids, h2, h1))
        ids, h1, h2 = ids[order], h1[order], h2[order]
        M = np.ascontiguousarray(M[order])
        n = len(ids)
        same = np.zeros(n, bool)
        if n > 1:
            same[1:] = (h1[1:] == h1[:-1]) & (h2[1:] == h2[:-1])
        head = np.maximum.accumulate(np.where(~same, np.arange(n), 0))
        Mv = M.view(np.uint32)  # byte compare (NaN-safe, unlike float ==)
        if not (Mv[same] == Mv[head[same]]).all():
            raise ValueError(
                "128-bit vector-hash collision in collapse_exact_vectors "
                "— raise the lane count or report this input"
            )
        keep = ~same
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                vec_col: pa.FixedSizeListArray.from_arrays(
                    pa.array(
                        np.ascontiguousarray(M[keep]).reshape(-1), pa.float32()
                    ),
                    dim or 1,
                ),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__gb")
        .map_groups(collapse, batch_format="pyarrow")
    )


def embedding_near_dup_dedup(
    source: Any,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.9,
    method: str = "exact",
    collapse_exact: bool = False,
    cc: str = "driver",
    max_keep_set: int = 50_000_000,
    max_broadcast_drop: int = 5_000_000,
    lsh_kwargs: Optional[Dict[str, Any]] = None,
) -> Dataset:
    """Embedding-space sibling of :func:`near_dup_dedup`: keep ONE
    representative — the minimum id — of every connected component of
    the cosine-≥-threshold pair graph; drop the rest of the stream.

    ``method='exact'`` generates pairs via
    :func:`embedding_cosine_pairs` (auto-routing to the blocked
    no-broadcast tier); ``method='lsh'`` uses the banded
    :func:`embedding_lsh_pairs` (approximate: misses drop fewer docs,
    output stays a superset of the exact-survivor set).

    ``collapse_exact=True`` first collapses byte-identical vectors to
    their min-id representative (:func:`collapse_exact_vectors`) and
    runs the pair stage on DISTINCT vectors only — the documented
    guard for degenerate mass-duplicate corpora where identical-vector
    groups make every LSH band bucket O(m²). The answer is EXACTLY the
    uncollapsed one: byte-equal vectors have cosine 1, so each copy
    group is one node of the quotient pair graph, its rep (the group
    min) carries the component minimum, and non-reps can never be a
    component minimum. Pinned by the collapse-on == collapse-off test
    and the SQL connected-components oracle.

    Driver footprint: the pair list (both cc modes) plus, under
    ``collapse_exact``, the keep-set of surviving rep ids — bounded by
    the DISTINCT-vector count, the regime this tier exists for
    (``max_keep_set`` guards it loudly). For corpora where distinct ≈
    corpus size, run without collapse: the filter then broadcasts only
    the (small) drop-set, like :func:`near_dup_dedup` — and past
    ``max_broadcast_drop`` (with ``cc="distributed"``) it auto-routes
    through the Bloom-prefiltered bucketed anti-join instead of any
    broadcast, keeping the filter scale-safe for duplicate-heavy
    corpora.
    """
    if method not in ("exact", "lsh"):
        raise ValueError("method must be 'exact' or 'lsh'")
    ds = _as_dataset(source)
    reps = (
        collapse_exact_vectors(source, id_col, vec_col)
        if collapse_exact
        else _as_dataset(source, columns=[id_col, vec_col])
    )
    if collapse_exact:
        reps = reps.materialize()  # consumed twice: pairs + keep-set
    if method == "lsh":
        pairs_any: Any = embedding_lsh_pairs(
            reps, id_col, vec_col, threshold=threshold, **(lsh_kwargs or {})
        )
    else:
        pairs_any = embedding_cosine_pairs(
            reps, id_col, vec_col, threshold=threshold
        )
    if cc == "distributed":
        src = (
            pairs_any
            if isinstance(pairs_any, Dataset)
            else ray.data.from_pandas(pairs_any)
        )
        comp_ds = connected_components_distributed(src).materialize()
        if not collapse_exact:
            # duplicate-heavy guard: a drop-set past the bound routes
            # through the Bloom-prefiltered anti-join (no broadcast)
            def _non_min(batch: pa.Table) -> pa.Table:
                m = pc.not_equal(batch["doc_id"], batch["cluster_id"])
                return batch.filter(m).select(["doc_id"])

            drop_ds = comp_ds.map_batches(_non_min, batch_format="pyarrow")
            if drop_ds.count() > max_broadcast_drop:
                return _anti_join_drop(ds, drop_ds, id_col)
        comp = comp_ds.to_pandas()
    else:
        comp = connected_components(
            pairs_any.to_pandas()
            if isinstance(pairs_any, Dataset)
            else pairs_any
        )
    drop = comp.loc[comp.doc_id != comp.cluster_id, "doc_id"].to_numpy(
        np.int64
    )

    if not collapse_exact:
        drop_ref = ray.put(pa.array(drop, pa.int64()))

        def keep_batch(batch: pa.Table) -> pa.Table:
            drop_set = ray.get(drop_ref)
            if len(drop_set) == 0:
                return batch
            mask = pc.invert(
                pc.fill_null(pc.is_in(batch[id_col], value_set=drop_set), False)
            )
            return batch.filter(mask)

        return ds.map_batches(keep_batch, batch_format="pyarrow")

    # collapse tier: non-reps are implicit drops, so filter by the
    # surviving-rep KEEP set (bounded by the distinct-vector count)
    rep_parts = [
        b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        for b in reps.select_columns([id_col]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
    ]
    rep_ids = (
        np.concatenate(rep_parts) if rep_parts else np.empty(0, np.int64)
    )
    if len(rep_ids) > max_keep_set:
        raise ValueError(
            f"collapse_exact keep-set has {len(rep_ids)} distinct vectors "
            f"(> max_keep_set={max_keep_set}); this corpus is not in the "
            "degenerate regime — run without collapse_exact (drop-set "
            "broadcast) or via the LSH/SemDeDup tiers"
        )
    keep_ids = rep_ids[~np.isin(rep_ids, drop)]
    keep_ref = ray.put(pa.array(np.sort(keep_ids), pa.int64()))

    def keep_rep(batch: pa.Table) -> pa.Table:
        mask = pc.fill_null(
            pc.is_in(batch[id_col], value_set=ray.get(keep_ref)), False
        )
        return batch.filter(mask)

    return ds.map_batches(keep_rep, batch_format="pyarrow")


# --------------------------------------------------------------------------- #
# paragraph-level exact dedup (C4/RefinedWeb-style line dedup)                #
# --------------------------------------------------------------------------- #


def _drop_and_reassemble(
    ds: Dataset,
    drops: Dataset,
    *,
    id_col: str,
    text_col: str,
    sep: str,
    num_doc_buckets: int,
    batch_size: int,
) -> Dataset:
    """Shared reassembly tail of the segment-drop ops
    (:func:`paragraph_dedup`, :func:`domain_boilerplate_removal`):
    union the corpus with the ``(id_col, para_idx)`` drop rows,
    co-locate on ``knuth(doc_id) % num_doc_buckets``, and rebuild each
    document from its surviving segments in original order. The corpus
    crosses the wire once — inherent to an op that rewrites every
    document. Output ``(id_col, text_col, n_dropped)``."""
    from .curation import KNUTH

    def doc_bucket(ids: np.ndarray) -> np.ndarray:
        return (
            (ids.astype(np.int64) * np.int64(KNUTH))
            % np.int64(num_doc_buckets)
        ).astype(np.int64)

    def tag_drop(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                text_col: pa.array([None] * len(batch), pa.string()),
                "para_idx": batch["para_idx"],
                "__bucket": pa.array(doc_bucket(ids), pa.int64()),
            }
        )

    def tag_doc(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                text_col: pc.fill_null(batch[text_col].combine_chunks(), ""),
                "para_idx": pa.array(np.full(len(batch), -1, np.int64)),
                "__bucket": pa.array(doc_bucket(ids), pa.int64()),
            }
        )

    unioned = ds.map_batches(
        tag_doc, batch_format="pyarrow", batch_size=batch_size
    ).union(drops.map_batches(tag_drop, batch_format="pyarrow"))

    def reassemble(group: pa.Table) -> pa.Table:
        # Pure Arrow/numpy (no polars: its rayon pool intermittently
        # deadlocked on repeat in-worker calls under pinned threads):
        # re-split the bucket's docs, key every segment as
        # (local_doc_row, para_idx), searchsorted-drop the flagged
        # keys, rebuild list offsets and join with ONE vectorized
        # pc.binary_join.
        pidx = group["para_idx"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        is_doc = pidx < 0
        doc_ids = ids[is_doc]
        n = len(doc_ids)
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    text_col: pa.array([], pa.string()),
                    "n_dropped": pa.array([], pa.int64()),
                }
            )
        order = np.argsort(doc_ids, kind="stable")
        doc_ids = doc_ids[order]
        texts = (
            group[text_col]
            .combine_chunks()
            .filter(pa.array(is_doc))
            .take(pa.array(order))
        )
        parts = pc.split_pattern(texts, sep)
        lens = pc.list_value_length(parts).to_numpy().astype(np.int64)
        flat = pc.list_flatten(parts)
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        seg_starts = np.cumsum(lens) - lens
        fpidx = np.arange(len(flat), dtype=np.int64) - np.repeat(
            seg_starts, lens
        )
        stride = np.int64(lens.max() if n else 0) + 1
        keys = row_of * stride + fpidx

        d_ids = ids[~is_doc]
        d_pidx = pidx[~is_doc].astype(np.int64)
        drow = np.searchsorted(doc_ids, d_ids)
        dkeys = np.unique(drow * stride + d_pidx)
        keep = np.ones(len(keys), bool)
        pos = np.searchsorted(dkeys, keys)
        inb = pos < len(dkeys)
        keep[inb] = dkeys[pos[inb]] != keys[inb]

        kept_counts = np.bincount(
            row_of[keep], minlength=n
        ).astype(np.int64)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(kept_counts, out=offsets[1:])
        # binary_join has list<string> kernels only; int32 offsets are
        # ample per bucket (raise num_doc_buckets before a bucket's
        # segment count nears 2^31)
        la = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pc.cast(flat.filter(pa.array(keep)), pa.string()),
        )
        joined = pc.binary_join(la, sep)
        n_dropped = np.bincount(drow, minlength=n).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(doc_ids, pa.int64()),
                text_col: joined,
                "n_dropped": pa.array(n_dropped, pa.int64()),
            }
        )

    return unioned.groupby("__bucket").map_groups(
        reassemble, batch_format="pyarrow"
    )


def paragraph_dedup(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    sep: str = "\n",
    mode: str = "auto",
    max_broadcast_drops: int = 4_000_000,
    num_hash_buckets: int = 256,
    num_doc_buckets: int = 64,
    batch_size: int = 8192,
) -> Dataset:
    """Corpus-wide EXACT paragraph dedup: split every document on
    ``sep``, keep only the globally FIRST occurrence (min
    ``(doc_id, para_idx)``) of each distinct paragraph, and rebuild
    each document from its surviving paragraphs in original order —
    the C4 / RefinedWeb line-dedup step (no reference analogue;
    net-new per SURVEY §2.7).

    Two shuffles, both bounded:

    1. **paragraph identity** — the explode pass emits only 32-byte
       ``(h1, h2, doc_id, para_idx)`` rows (the collision-checked
       128-bit double-hash scheme of ``_exact_distinct``,
       ``validator.py``; paragraph text never shuffles), bucketed on
       ``h1 % num_hash_buckets``; ONE vectorized sort + duplicated()
       per bucket emits the DROP rows (duplicates beyond first) —
       exchange bounded by the duplicate count;
    2. **reassembly** — drop rows and the corpus co-locate on
       ``knuth(doc_id) % num_doc_buckets``; each bucket re-splits its
       docs (polars explode), anti-joins its drop set on
       ``(doc_id, para_idx)`` and re-joins with ``sep`` in one
       vectorized pass. The corpus crosses the wire once — inherent
       to an op that rewrites every document.

    NULL text is treated as ``''`` (one empty paragraph — matches
    ``string_split(COALESCE(text, ''), sep)``). A document whose every
    paragraph was seen earlier comes back as ``''``. Output:
    ``(id_col, text_col, n_dropped)``, deterministic under any
    batch/bucket layout (keep-first is a global (doc_id, para_idx)
    order, not arrival order).

    The REASSEMBLY transport has two tiers, switched by ``mode``
    (``auto`` | ``broadcast`` | ``shuffle``): on a typical corpus the
    drop set (16 B ``(doc_id, para_idx)`` rows — the duplicate count,
    not the corpus) is small, so ``auto`` with ≤
    ``max_broadcast_drops`` drops broadcasts it ONCE as a lex-sorted
    structured array and every document rebuilds in place in one
    streaming pass — shuffle #2 disappears entirely. Past the bound
    (duplicate-heavy corpora, e.g. the all-dup bench worst case) the
    shuffle tier co-locates drop rows with their docs via the shared
    :func:`_drop_and_reassemble` pass. Identical output either way
    (mode-equivalence pinned by tests).
    """
    from ..functions.sketches import hash64

    def explode_hashes(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        parts = pc.split_pattern(
            pc.fill_null(batch[text_col].combine_chunks(), ""), sep
        )
        lens = pc.list_value_length(parts).to_numpy().astype(np.int64)
        flat = pc.list_flatten(parts)
        parent = np.repeat(ids, lens)
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        pidx = np.arange(len(flat), dtype=np.int64) - starts
        h1 = hash64(flat)
        h2 = hash64(flat, seed=0x9E3779B9)
        return pa.table(
            {
                "__h1": pa.array(h1, pa.uint64()),
                "__h2": pa.array(h2, pa.uint64()),
                id_col: pa.array(parent, pa.int64()),
                "para_idx": pa.array(pidx, pa.int64()),
                "__bucket": pa.array(
                    (h1 % np.uint64(num_hash_buckets)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def emit_drops(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["__h1", "__h2", id_col, "para_idx"])
        dup = g.duplicated(["__h1", "__h2"], keep="first")
        d = g.loc[dup, [id_col, "para_idx"]]
        return pd.DataFrame(
            {id_col: d[id_col].to_numpy(np.int64),
             "para_idx": d["para_idx"].to_numpy(np.int64)}
        )

    ds = _as_dataset(source, columns=[id_col, text_col])
    # materialize() here is load-bearing: the drop table is two int64
    # columns (~16 B × duplicate count, object-store-spillable), and
    # pinning it breaks the groupby→union→groupby operator chain —
    # Ray's streaming executor handles the two sort shuffles back to
    # back pathologically (measured >10× on the 8M-row bench), while
    # shuffle-materialize-shuffle runs at full speed.
    drops = (
        ds.map_batches(
            explode_hashes, batch_format="pyarrow", batch_size=batch_size
        )
        .groupby("__bucket")
        .map_groups(emit_drops, batch_format="pandas")
        .materialize()
    )

    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError("mode must be auto | broadcast | shuffle")
    n_drops = drops.count()
    use_broadcast = mode == "broadcast" or (
        mode == "auto" and n_drops <= max_broadcast_drops
    )
    if use_broadcast:
        _DT = np.dtype([("d", "i8"), ("p", "i8")])
        dp = drops.to_pandas()
        keys = np.zeros(len(dp), _DT)
        if len(dp):  # empty Datasets lose their schema in to_pandas()
            keys["d"] = dp[id_col].to_numpy(np.int64)
            keys["p"] = dp["para_idx"].to_numpy(np.int64)
        keys = np.sort(keys)  # lexicographic on (doc_id, para_idx)
        drop_ref = ray.put(keys)

        def rebuild(batch: pa.Table) -> pa.Table:
            drop_keys = ray.get(drop_ref)
            ids = batch[id_col].to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            parts = pc.split_pattern(
                pc.fill_null(batch[text_col].combine_chunks(), ""), sep
            )
            lens = pc.list_value_length(parts).to_numpy().astype(np.int64)
            flat = pc.list_flatten(parts)
            row = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
            starts = np.repeat(np.cumsum(lens) - lens, lens)
            probe = np.zeros(len(flat), _DT)
            probe["d"] = ids[row] if len(ids) else probe["d"]
            probe["p"] = np.arange(len(flat), dtype=np.int64) - starts
            if len(drop_keys) and len(flat):
                pos = np.searchsorted(drop_keys, probe)
                pos[pos >= len(drop_keys)] = 0
                hit = drop_keys[pos] == probe
            else:
                hit = np.zeros(len(flat), bool)
            dropped_per_doc = np.bincount(
                row, weights=hit, minlength=len(ids)
            ).astype(np.int64)
            new_lens = lens - dropped_per_doc
            offsets = np.zeros(len(ids) + 1, np.int64)
            np.cumsum(new_lens, out=offsets[1:])
            lst = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                flat.filter(pa.array(~hit)),
            )
            return pa.table(
                {
                    id_col: batch[id_col],
                    text_col: pc.binary_join(lst, sep),
                    "n_dropped": pa.array(dropped_per_doc, pa.int64()),
                }
            )

        return ds.map_batches(
            rebuild, batch_format="pyarrow", batch_size=batch_size
        )

    return _drop_and_reassemble(
        ds, drops,
        id_col=id_col, text_col=text_col, sep=sep,
        num_doc_buckets=num_doc_buckets, batch_size=batch_size,
    )


def domain_boilerplate_removal(
    source: Any,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    sep: str = "\n",
    min_docs: int = 2,
    min_frac: Optional[float] = None,
    mode: str = "auto",
    max_broadcast_segments: int = 4_000_000,
    num_hash_buckets: int = 256,
    num_doc_buckets: int = 64,
    batch_size: int = 8192,
) -> Dataset:
    """Domain-frequency boilerplate removal — the CCNet / RefinedWeb /
    Dolma hygiene step the per-doc heuristics can't do: a line that
    recurs across MANY documents of the SAME domain (nav bars, cookie
    banners, footers) is template junk, so drop EVERY occurrence of
    any ``sep``-segment that appears in ≥ ``min_docs`` distinct
    documents of its domain (and, with ``min_frac``, in ≥ that
    fraction of the domain's documents — the Dolma-style relative
    threshold; the effective cutoff is the max of the two). Unlike
    :func:`paragraph_dedup` (keep-first, corpus-wide) this keeps NO
    occurrence and scopes identity to ``(domain, segment)``.

    Because the verdict is SEGMENT-level (drop-all, not keep-first),
    the decision set is DISTINCT-bounded, which buys a rebuild
    :func:`paragraph_dedup` can't have: the identity pass (40-byte
    ``(domain_hash, h1, h2, doc_id, para_idx)`` rows bucketed on
    ``(h1 ⊕ domain_hash) % num_hash_buckets``; segment text never
    shuffles) emits only the BAD ``(dh, h1, h2)`` keys, and in
    ``mode="broadcast"`` (or ``auto`` with ≤
    ``max_broadcast_segments`` bad keys — 24 B each) that key set
    broadcasts ONCE via ``ray.put`` as a lex-sorted structured array
    and every document rebuilds IN PLACE in one streaming
    ``map_batches`` pass (exact 192-bit membership probe, no second
    shuffle at all). ``mode="shuffle"`` (or ``auto`` beyond the
    bound) is the huge-bad-set tier: re-explode, co-locate occurrence
    rows with the bad keys on the same bucket key, tag, and run the
    shared :func:`_drop_and_reassemble` doc-bucketed pass. With
    ``min_frac`` a tiny per-domain doc-count aggregate (bounded by
    #domains) broadcasts once via ``ray.put``.

    NULL text is ``''`` (one empty segment); NULL domain is its own
    domain (hash of ``''``). Output ``(id_col, text_col, n_dropped)``,
    identical (and deterministic) under every mode / batch / bucket
    layout."""
    from ..functions.sketches import hash64

    if min_docs < 1:
        raise ValueError("min_docs must be >= 1")
    if min_frac is not None and not (0.0 < min_frac <= 1.0):
        raise ValueError("min_frac must be in (0, 1]")

    ds = _as_dataset(source, columns=[id_col, domain_col, text_col])

    thr_ref = None
    if min_frac is not None:
        # per-domain doc counts: distinct-bounded groupby (#domains
        # rows), keyed by the same domain hash the explode pass emits
        def domain_partial(batch: pa.Table) -> pa.Table:
            dh = hash64(
                pc.cast(
                    pc.fill_null(batch[domain_col].combine_chunks(), ""),
                    pa.string(),
                )
            )
            keys, cnt = np.unique(dh, return_counts=True)
            return pa.table(
                {
                    "__dh": pa.array(keys, pa.uint64()),
                    "n": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

        dom = (
            ds.map_batches(
                domain_partial,
                batch_format="pyarrow",
                batch_size=batch_size,
            )
            .groupby("__dh")
            .sum("n")
            .to_pandas()
        )
        dkeys = dom["__dh"].to_numpy(np.uint64)
        order = np.argsort(dkeys)
        thr = np.maximum(
            np.ceil(dom["sum(n)"].to_numpy(np.float64) * min_frac),
            float(min_docs),
        ).astype(np.int64)
        thr_ref = ray.put((dkeys[order], thr[order]))

    def explode_hashes(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dh = hash64(
            pc.cast(
                pc.fill_null(batch[domain_col].combine_chunks(), ""),
                pa.string(),
            )
        )
        parts = pc.split_pattern(
            pc.fill_null(batch[text_col].combine_chunks(), ""), sep
        )
        lens = pc.list_value_length(parts).to_numpy().astype(np.int64)
        flat = pc.list_flatten(parts)
        parent = np.repeat(ids, lens)
        pdh = np.repeat(dh, lens)
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        pidx = np.arange(len(flat), dtype=np.int64) - starts
        h1 = hash64(flat)
        h2 = hash64(flat, seed=0x9E3779B9)
        return pa.table(
            {
                "__dh": pa.array(pdh, pa.uint64()),
                "__h1": pa.array(h1, pa.uint64()),
                "__h2": pa.array(h2, pa.uint64()),
                id_col: pa.array(parent, pa.int64()),
                "para_idx": pa.array(pidx, pa.int64()),
                "__bucket": pa.array(
                    ((h1 ^ pdh) % np.uint64(num_hash_buckets)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    def emit_bad_keys(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["__dh", "__h1", "__h2", id_col])
        dh = g["__dh"].to_numpy(np.uint64)
        h1 = g["__h1"].to_numpy(np.uint64)
        h2 = g["__h2"].to_numpy(np.uint64)
        ids = g[id_col].to_numpy(np.int64)
        new_seg = np.concatenate(
            [
                [True],
                (dh[1:] != dh[:-1])
                | (h1[1:] != h1[:-1])
                | (h2[1:] != h2[:-1]),
            ]
        ) if len(g) else np.zeros(0, bool)
        seg_id = np.cumsum(new_seg) - 1
        doc_change = new_seg | np.concatenate(
            [[True], ids[1:] != ids[:-1]]
        ) if len(g) else np.zeros(0, bool)
        n_seg = int(seg_id[-1]) + 1 if len(g) else 0
        df_per_seg = np.bincount(
            seg_id[doc_change], minlength=n_seg
        ).astype(np.int64)
        seg_dh = dh[new_seg]
        if thr_ref is not None:
            tk, tv = ray.get(thr_ref)
            pos = np.searchsorted(tk, seg_dh)
            pos = np.minimum(pos, max(len(tk) - 1, 0))
            seg_thr = np.where(
                (len(tk) > 0) & (tk[pos] == seg_dh), tv[pos], min_docs
            )
        else:
            seg_thr = np.int64(min_docs)
        bad = df_per_seg >= seg_thr
        return pd.DataFrame(
            {
                "__dh": seg_dh[bad],
                "__h1": h1[new_seg][bad],
                "__h2": h2[new_seg][bad],
            }
        )

    bad_keys = (
        ds.map_batches(
            explode_hashes, batch_format="pyarrow", batch_size=batch_size
        )
        .groupby("__bucket")
        .map_groups(emit_bad_keys, batch_format="pandas")
        .materialize()
    )

    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError("mode must be auto | broadcast | shuffle")
    n_bad = bad_keys.count()
    use_broadcast = mode == "broadcast" or (
        mode == "auto" and n_bad <= max_broadcast_segments
    )

    _KEY_DT = np.dtype([("d", "u8"), ("a", "u8"), ("b", "u8")])

    if use_broadcast:
        bk = bad_keys.to_pandas()
        keys = np.zeros(len(bk), _KEY_DT)
        if len(bk):  # empty Datasets lose their schema in to_pandas()
            keys["d"] = bk["__dh"].to_numpy(np.uint64)
            keys["a"] = bk["__h1"].to_numpy(np.uint64)
            keys["b"] = bk["__h2"].to_numpy(np.uint64)
        keys = np.sort(keys)  # lexicographic on (d, a, b)
        bad_ref = ray.put(keys)

        def rebuild(batch: pa.Table) -> pa.Table:
            bad_sorted = ray.get(bad_ref)
            n = batch.num_rows
            dh = hash64(
                pc.cast(
                    pc.fill_null(batch[domain_col].combine_chunks(), ""),
                    pa.string(),
                )
            )
            parts = pc.split_pattern(
                pc.fill_null(batch[text_col].combine_chunks(), ""), sep
            )
            lens = pc.list_value_length(parts).to_numpy().astype(np.int64)
            flat = pc.list_flatten(parts)
            row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
            probe = np.zeros(len(flat), _KEY_DT)
            probe["d"] = np.repeat(dh, lens)
            probe["a"] = hash64(flat)
            probe["b"] = hash64(flat, seed=0x9E3779B9)
            if len(bad_sorted):
                pos = np.searchsorted(bad_sorted, probe)
                pos_c = np.minimum(pos, len(bad_sorted) - 1)
                is_bad = bad_sorted[pos_c] == probe
            else:
                is_bad = np.zeros(len(flat), bool)
            keep = ~is_bad
            kept_counts = np.bincount(
                row_of[keep], minlength=n
            ).astype(np.int64)
            offsets = np.zeros(n + 1, np.int64)
            np.cumsum(kept_counts, out=offsets[1:])
            la = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pc.cast(flat.filter(pa.array(keep)), pa.string()),
            )
            return pa.table(
                {
                    id_col: batch[id_col],
                    text_col: pc.binary_join(la, sep),
                    "n_dropped": pa.array(
                        np.bincount(
                            row_of[is_bad], minlength=n
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                }
            )

        return ds.map_batches(
            rebuild, batch_format="pyarrow", batch_size=batch_size
        )

    # shuffle tier: co-locate occurrence rows with the bad keys on the
    # same (h1 ⊕ dh) bucket, tag occurrences of bad segments as drop
    # rows, then the shared doc-bucketed reassembly
    def tag_key(batch: pa.Table) -> pa.Table:
        h1 = batch["__h1"].to_numpy(zero_copy_only=False)
        dh = batch["__dh"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "__dh": batch["__dh"],
                "__h1": batch["__h1"],
                "__h2": batch["__h2"],
                id_col: pa.array(
                    np.full(batch.num_rows, -1, np.int64), pa.int64()
                ),
                "para_idx": pa.array(
                    np.full(batch.num_rows, -1, np.int64), pa.int64()
                ),
                "__bucket": pa.array(
                    (
                        (h1.astype(np.uint64) ^ dh.astype(np.uint64))
                        % np.uint64(num_hash_buckets)
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    occ = ds.map_batches(
        explode_hashes, batch_format="pyarrow", batch_size=batch_size
    ).union(bad_keys.map_batches(tag_key, batch_format="pyarrow"))

    def emit_drops(group: pd.DataFrame) -> pd.DataFrame:
        is_key = group[id_col].to_numpy(np.int64) < 0
        kset = np.zeros(int(is_key.sum()), _KEY_DT)
        kset["d"] = group["__dh"].to_numpy(np.uint64)[is_key]
        kset["a"] = group["__h1"].to_numpy(np.uint64)[is_key]
        kset["b"] = group["__h2"].to_numpy(np.uint64)[is_key]
        kset = np.sort(kset)
        o = group[~pd.Series(is_key, index=group.index)]
        probe = np.zeros(len(o), _KEY_DT)
        probe["d"] = o["__dh"].to_numpy(np.uint64)
        probe["a"] = o["__h1"].to_numpy(np.uint64)
        probe["b"] = o["__h2"].to_numpy(np.uint64)
        if len(kset):
            pos = np.searchsorted(kset, probe)
            pos_c = np.minimum(pos, len(kset) - 1)
            hit = kset[pos_c] == probe
        else:
            hit = np.zeros(len(o), bool)
        return pd.DataFrame(
            {
                id_col: o[id_col].to_numpy(np.int64)[hit],
                "para_idx": o["para_idx"].to_numpy(np.int64)[hit],
            }
        )

    drops = (
        occ.groupby("__bucket")
        .map_groups(emit_drops, batch_format="pandas")
        .materialize()
    )
    return _drop_and_reassemble(
        ds, drops,
        id_col=id_col, text_col=text_col, sep=sep,
        num_doc_buckets=num_doc_buckets, batch_size=batch_size,
    )


def _levenshtein_bytes(
    a_strs: "list[str]", b_strs: "list[str]", *, chunk: int = 65536
) -> np.ndarray:
    """Vectorized byte-level Levenshtein distance for aligned string
    pairs (UTF-8 byte edits — DuckDB ``levenshtein`` semantics, where
    a non-ASCII substitution costs its byte length). One DP whose rows
    iterate over the LONGEST a-side while every column/pair dimension
    stays numpy: the in-row left-shift dependency
    ``d[j] = min(t[j], d[j-1]+1)`` collapses to a running minimum via
    ``accmin(t - j) + j``. O(pairs × L²) element ops, chunked so the
    (pairs × L) working set stays small."""
    out = np.empty(len(a_strs), np.int64)
    for lo in range(0, len(a_strs), chunk):
        aa = [s.encode() for s in a_strs[lo : lo + chunk]]
        bb = [s.encode() for s in b_strs[lo : lo + chunk]]
        p = len(aa)
        la = np.fromiter((len(s) for s in aa), np.int64, p)
        lb = np.fromiter((len(s) for s in bb), np.int64, p)
        L = int(max(la.max(initial=0), lb.max(initial=0)))
        if L == 0:
            out[lo : lo + p] = 0
            continue
        A = np.zeros((p, L), np.uint8)
        B = np.zeros((p, L), np.uint8)
        for i, s in enumerate(aa):
            A[i, : len(s)] = np.frombuffer(s, np.uint8)
        for i, s in enumerate(bb):
            B[i, : len(s)] = np.frombuffer(s, np.uint8)
        res = np.empty(p, np.int64)
        res[la == 0] = lb[la == 0]
        j_idx = np.arange(L + 1, dtype=np.int16)
        prev = np.broadcast_to(j_idx, (p, L + 1)).astype(np.int16)
        for i in range(1, int(la.max(initial=0)) + 1):
            cost = (A[:, i - 1][:, None] != B).astype(np.int16)
            t = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
            t0 = np.concatenate(
                [np.full((p, 1), i, np.int16), t], axis=1
            )
            cur = (
                np.minimum.accumulate(t0 - j_idx, axis=1) + j_idx
            ).astype(np.int16)
            done = la == i
            if done.any():
                res[done] = cur[done, lb[done]]
            prev = cur
        out[lo : lo + p] = res
    return out


def fuzzy_dup_pairs(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: Optional[List[str]] = None,
    *,
    prefix_len: int = 12,
    cmp_len: int = 48,
    max_dist: int = 8,
    max_group: Optional[int] = None,
    num_buckets: int = 64,
    batch_size: int = 8192,
) -> Dataset:
    """Blocked fuzzy duplicate pairs — record-linkage tier between
    exact dedup and MinHash: docs sharing a BLOCK (``block_cols`` plus
    the first ``prefix_len`` characters of text) pair up, and a pair
    survives iff the byte-level Levenshtein distance of their first
    ``cmp_len`` characters is ≤ ``max_dist``. Block + prefix is the
    standard blocking-key trade: candidate pairs are per-block O(m²),
    recall is bounded by the blocking (a dup whose first characters
    differ is missed — widen with multiple passes on different keys).

    Scale shape: the exchange ships (id, block key, ``cmp_len``-char
    compare string) — never full documents; ONE hash-bucketed shuffle
    co-locates each block, every bucket generates candidates via the
    shared sorted-sweep pair kernel and scores ALL its pairs in one
    chunked numpy DP (``_levenshtein_bytes``). ``max_group`` caps
    degenerate blocks (boilerplate prefixes) explicitly.

    Returns a Dataset of ``(id_a, id_b, dist)``, ``id_a < id_b``.
    Reference scope: the reference validates rows (validator.py);
    fuzzy linkage is the curation sibling it leaves to the user.
    """
    block_cols = list(block_cols or [])
    keys = block_cols + ["__pfx"]

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.select([id_col, text_col, *block_cols])
        m = pc.is_valid(t[text_col])
        for c in block_cols:
            m = pc.and_(m, pc.is_valid(t[c]))
        t = t.filter(m)
        txt = t[text_col]
        return pa.table(
            {
                id_col: t[id_col],
                **{c: t[c] for c in block_cols},
                "__pfx": pc.utf8_slice_codeunits(txt, 0, prefix_len),
                "__cmp": pc.utf8_slice_codeunits(txt, 0, cmp_len),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pairs = _pairs_within_groups(
            g, keys, id_col, carry_cols=["__cmp"], max_group=max_group
        )
        if not len(pairs):
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype=np.int64),
                    "id_b": pd.Series(dtype=np.int64),
                    "dist": pd.Series(dtype=np.int64),
                }
            )
        d = _levenshtein_bytes(
            pairs["__cmp_a"].tolist(), pairs["__cmp_b"].tolist()
        )
        keep = d <= max_dist
        return pd.DataFrame(
            {
                "id_a": pairs["id_a"].to_numpy(np.int64)[keep],
                "id_b": pairs["id_b"].to_numpy(np.int64)[keep],
                "dist": d[keep],
            }
        )

    ds = _as_dataset(source, columns=[id_col, text_col, *block_cols])
    prepped = ds.map_batches(
        prep, batch_format="pyarrow", batch_size=batch_size
    )
    return bucketed_groupby(
        prepped, keys, per_bucket,
        num_buckets=num_buckets, batch_size=batch_size,
    )


def ppjoin_jaccard_pairs(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: Optional[int] = None,
    num_buckets: int = 128,
) -> pd.DataFrame:
    """EXACT Jaccard-≥-threshold pairs via prefix filtering (the
    PPJoin candidate rule): under the global shingle-hash order, any
    pair with ``J ≥ t`` must share a shingle inside BOTH docs' prefix
    of ``p = |d| − ⌈t·|d|⌉ + 1`` smallest hashes (the smallest common
    shingle is in each prefix, else the overlap can't reach
    ``⌈t·|d|⌉``). So the pair-emitting inverted index runs over PREFIX
    shingles only — at t=0.5 roughly half the posting rows and far
    fewer k²-per-group candidates than :func:`ngram_jaccard_pairs` —
    and the exact verdict comes from the same distributed verify path
    MinHash uses (:func:`verify_pairs_distributed`). Same output (and
    SQL oracle) as the exact all-shingle pipeline; the scale win is
    entirely in the candidate stage. ``max_shingle_freq`` keeps the
    documented stop-shingle skew guard (dropping a hot PREFIX shingle
    can lose recall, exactly as in the all-shingle tier).
    """
    import math

    def prefix_shingles(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sh = _shingle_frame(batch[text_col], n)
        sh = (
            sh.sort(["row", "shingle_hash"])
            .with_columns(
                pl.int_range(pl.len()).over("row").alias("__rk"),
                (
                    pl.col("size")
                    - (pl.col("size").cast(pl.Float64) * threshold)
                    .ceil()
                    .cast(pl.Int64)
                    + 1
                ).alias("__p"),
            )
            .filter(pl.col("__rk") < pl.col("__p"))
        )
        rows = sh["row"].to_numpy()
        return pa.Table.from_arrays(
            [
                pa.array(ids[rows], pa.int64()),
                pa.array(sh["shingle_hash"].to_numpy().astype(np.uint64)),
                pa.array(sh["size"].to_numpy().astype(np.int64), pa.int64()),
            ],
            names=[id_col, "shingle_hash", "size"],
        )

    ds = _as_dataset(source, columns=[id_col, text_col])
    prefix = ds.map_batches(
        prefix_shingles, batch_format="pyarrow", batch_size=4096
    )

    def emit(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.rename(columns={id_col: "__id"})
        return _pairs_within_groups(
            b, ["shingle_hash"], "__id", max_group=max_shingle_freq
        )

    raw_pairs = bucketed_groupby(
        prefix, ["shingle_hash"], emit, num_buckets=num_buckets
    )
    # distinct candidate pairs (a pair may share several prefix hashes)
    cand = bucketed_count(raw_pairs, ["id_a", "id_b"], "__w")

    def drop_w(batch: pa.Table) -> pa.Table:
        return batch.select(["id_a", "id_b"])

    cand = cand.map_batches(drop_w, batch_format="pyarrow")
    stats = verify_pairs_distributed(
        source, cand, id_col, text_col, n,
        num_buckets=num_buckets, max_shingle_freq=max_shingle_freq,
    )
    out = stats.to_pandas()
    cols = ["id_a", "id_b", "intersection", "size_a", "size_b"]
    if len(out) == 0:
        return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
    out = out[cols].astype(np.int64)
    union = out.size_a + out.size_b - out.intersection
    out = out[out.intersection / union >= threshold]
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def containment_pairs(
    source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: Optional[int] = None,
    num_buckets: int = 128,
) -> pd.DataFrame:
    """Asymmetric near-dup pairs by shingle CONTAINMENT
    ``|A∩B| / min(|A|, |B|)`` ≥ threshold — catches a short document
    quoted inside a long one, which Jaccard misses (the union is
    dominated by the long side). Same join-free machinery as
    :func:`ngram_jaccard_pairs`; only the final vectorized gate
    differs. Returns (id_a, id_b, intersection, size_a, size_b,
    containment) with containment rounded to 6.
    """
    sh = shingle_table(source, id_col, text_col, n)

    def emit(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.rename(columns={id_col: "__id"})
        return _pairs_within_groups(
            b, ["shingle_hash"], "__id", carry_cols=["size"],
            max_group=max_shingle_freq,
        )

    pairs = bucketed_groupby(
        sh, ["shingle_hash"], emit, num_buckets=num_buckets
    )
    inter = bucketed_count(
        pairs, ["id_a", "id_b", "size_a", "size_b"], "intersection"
    )

    def gate(batch: pa.Table) -> pa.Table:
        i = batch["intersection"].to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        mn = np.minimum(
            batch["size_a"].to_numpy(zero_copy_only=False),
            batch["size_b"].to_numpy(zero_copy_only=False),
        )
        c = i / mn
        t = batch.append_column(
            "containment", pa.array(np.round(c, 6))
        )
        return t.filter(pa.array(c >= threshold))

    out = inter.map_batches(gate, batch_format="pyarrow").to_pandas()
    cols = ["id_a", "id_b", "intersection", "size_a", "size_b"]
    if len(out) == 0:  # empty to_pandas loses the schema
        e = pd.DataFrame({c: pd.Series(dtype=np.int64) for c in cols})
        e["containment"] = pd.Series(dtype=np.float64)
        return e
    out[cols] = out[cols].astype(np.int64)
    return out[cols + ["containment"]].sort_values(
        ["id_a", "id_b"]
    ).reset_index(drop=True)
