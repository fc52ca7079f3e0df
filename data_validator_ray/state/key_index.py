"""Persistent key index for INCREMENTAL cross-corpus deduplication —
the durable state a continuously-crawling pipeline needs: "drop every
document whose key we have EVER seen", across runs, without re-reading
history.

The index is a Parquet file of 16-byte (h1, h2) double-hash identities
(the exact-uniqueness convention — collision-checked, treated as
exact): string keys never persist, the file is 16 bytes per distinct
key ever seen, sorted so the probe side loads it zero-copy into a
:class:`..functions.sketches.HashPairSet`. A ``_meta.json`` pins the
key column and hash scheme so mismatched probes fail loudly.

Lifecycle (each step streaming, driver holds only hash arrays):

* :func:`build_key_index` — per-batch DISTINCT → (h1, h2) partials →
  one ``np.unique`` merge → sorted Parquet + meta.
* :func:`dedup_against_index` — broadcast the loaded pair set once
  (``ray.put``); ONE ``map_batches`` pass drops member rows. No
  shuffle: the index IS the small side.
* :func:`update_key_index` — union-merge the new corpus's distinct
  hashes into the file (sorted-merge ``np.unique``), so the next run's
  index includes this run. Update is atomic (write temp + rename).

At 10^12 keys the 16 B/key file is 16 TB — beyond broadcast. The
**sharded tier** (``n_shards=2^k`` on :func:`build_key_index`) stores
the same layout h1-range-sharded into hive dirs
(``shard=K/keys.parquet``, ``K = h1 >> (64−k)`` over the uint64 view):
build and update bucket the distinct-pair partials by shard and each
shard task writes/merges ONLY its range (tmp+rename atomic; the driver
holds per-shard counts, never pairs), and
:func:`dedup_against_index` auto-routes to a bucketed probe — ONE
shuffle of the probe corpus by the same h1 range, then each group
loads ONLY its shard's 16 B/key file and filters locally. Per-task
memory is ``index_bytes / n_shards`` regardless of index size; a probe
that touches few shards reads few files (provable via ``audit_dir``).
The :class:`..functions.sketches.BloomFilter` tier bounds memory at
~1 MiB with a documented FP rate instead:
``bloom_prefilter_join(how="anti")``.

On a multi-node cluster ``index_dir`` must be shared storage (NFS/S3
via fsspec paths) since shard tasks read/write it directly.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..functions.sketches import HashPairSet, hash64
from ..pipelines.dedup import _as_dataset

META_NAME = "_meta.json"
HASH_SCHEME = "polars-xxhash64-seed01"


def _hash_backend() -> dict:
    """The library + version actually backing :func:`hash64`. polars
    documents its ``Series.hash`` as NOT stable across polars
    versions, so an index built under one version can silently stop
    matching under another — the meta pins the exact version and
    :func:`load_key_index` fails loudly on mismatch (rebuild the
    index, or pin polars)."""
    try:
        import polars

        return {"backend": "polars", "backend_version": polars.__version__}
    except ImportError:  # pragma: no cover — polars is baked in
        import pandas

        return {"backend": "pandas", "backend_version": pandas.__version__}


def _pair_partials(
    source: Any, key_col: str, *, batch_size: int = 64 * 1024
) -> ray.data.Dataset:
    """Per-batch DISTINCT → (h1, h2) int64 partial pairs as a lazy
    Dataset (duplicates across batches remain; merged downstream)."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        u = col.drop_null().unique()
        if len(u) == 0:
            return pa.table(
                {"h1": pa.array([], pa.int64()), "h2": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "h1": pa.array(hash64(u, seed=0).astype(np.int64)),
                "h2": pa.array(hash64(u, seed=1).astype(np.int64)),
            }
        )

    return _as_dataset(source, columns=[key_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )


def _distinct_hash_pairs(
    source: Any, key_col: str, *, batch_size: int = 64 * 1024
) -> Tuple[np.ndarray, np.ndarray]:
    """Distributed distinct (h1, h2) of a key column: per-batch
    ``unique`` + two hash families, int64 pairs stream back, one
    packed ``np.unique`` on the driver (16 B per distinct key)."""
    ds = _pair_partials(source, key_col, batch_size=batch_size)
    h1s, h2s = [], []
    for b in ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        h1s.append(b["h1"].to_numpy(zero_copy_only=False))
        h2s.append(b["h2"].to_numpy(zero_copy_only=False))
    if not h1s:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return _unique_pairs(np.concatenate(h1s), np.concatenate(h2s))


def _unique_pairs(h1: np.ndarray, h2: np.ndarray):
    packed = np.empty(len(h1), dtype=[("a", np.int64), ("b", np.int64)])
    packed["a"], packed["b"] = h1, h2
    uniq = np.unique(packed)
    return (
        np.ascontiguousarray(uniq["a"]),
        np.ascontiguousarray(uniq["b"]),
    )


def _shard_ids(h1: np.ndarray, n_shards: int) -> np.ndarray:
    """Range shard of each ``h1``: top ``log2(n_shards)`` bits of the
    uint64 view — contiguous hash ranges, computable from the hash
    alone (no directory lookup) on both the build and probe sides."""
    k = int(n_shards).bit_length() - 1
    return (h1.view(np.uint64) >> np.uint64(64 - k)).astype(np.int64)


def _check_n_shards(n_shards: int) -> int:
    n = int(n_shards)
    if n < 2 or (n & (n - 1)) != 0:
        raise ValueError(f"n_shards must be a power of two >= 2, got {n_shards}")
    return n


def _write_shard_atomic(d: Path, shard: int, h1, h2) -> None:
    """One shard's sorted pair file, tmp+rename atomic (same contract
    as the unsharded file; shard tasks call this concurrently — each
    touches only its own ``shard=K`` dir)."""
    sd = d / f"shard={shard}"
    sd.mkdir(parents=True, exist_ok=True)
    tmp = sd / "keys.parquet.tmp"
    pq.write_table(pa.table({"h1": pa.array(h1), "h2": pa.array(h2)}), tmp)
    tmp.replace(sd / "keys.parquet")


def _build_shards(
    partials: ray.data.Dataset, d: Path, n_shards: int,
    *, merge_existing: bool = False,
) -> int:
    """Bucket (h1, h2) partials by h1-range shard; each shard task
    np.unique-merges its range (optionally unioning the existing shard
    file) and writes ``shard=K/keys.parquet`` atomically. The driver
    sees ONE count row per shard — never pairs. Returns total keys
    across written shards (+ untouched existing shards when merging)."""
    dir_str = str(d)

    def add_shard(batch: pa.Table) -> pa.Table:
        h1 = batch["h1"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__s", pa.array(_shard_ids(h1, n_shards), pa.int64())
        )

    def write_shard(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {"shard": pa.array([], pa.int64()),
                 "n_keys": pa.array([], pa.int64())}
            )
        shard = int(g["__s"][0].as_py())
        h1 = g["h1"].to_numpy(zero_copy_only=False)
        h2 = g["h2"].to_numpy(zero_copy_only=False)
        if merge_existing:
            old = _load_shard(Path(dir_str), shard)
            h1 = np.concatenate([old.h1, h1])
            h2 = np.concatenate([old.h2, h2])
        u1, u2 = _unique_pairs(h1, h2)
        _write_shard_atomic(Path(dir_str), shard, u1, u2)
        return pa.table(
            {"shard": pa.array([shard], pa.int64()),
             "n_keys": pa.array([len(u1)], pa.int64())}
        )

    counts = (
        partials.map_batches(add_shard, batch_format="pyarrow")
        .groupby("__s")
        .map_groups(write_shard, batch_format="pyarrow")
        .to_pandas()
    )
    total = int(counts["n_keys"].sum()) if len(counts) else 0
    if merge_existing:
        touched = set(counts["shard"].tolist()) if len(counts) else set()
        for sd in d.glob("shard=*"):
            s = int(sd.name.split("=", 1)[1])
            if s not in touched and (sd / "keys.parquet").exists():
                total += pq.read_metadata(sd / "keys.parquet").num_rows
    return total


def build_key_index(
    source: Any, key_col: str, index_dir: "str | Path",
    *, batch_size: int = 64 * 1024, n_shards: Optional[int] = None,
) -> dict:
    """Create a fresh index at ``index_dir`` from a corpus' keys.
    Returns ``{n_keys}``. With ``n_shards`` (power of two) the index
    is h1-range-sharded: shard tasks build and write their ranges in
    parallel and the driver never materializes the pair table — the
    10^12-key tier (16 TB of index ÷ shards per task)."""
    d = Path(index_dir)
    d.mkdir(parents=True, exist_ok=True)
    if n_shards is not None:
        n = _check_n_shards(n_shards)
        total = _build_shards(
            _pair_partials(source, key_col, batch_size=batch_size), d, n
        )
        _write_meta(d, key_col, total, n_shards=n)
        return {"n_keys": total}
    h1, h2 = _distinct_hash_pairs(source, key_col, batch_size=batch_size)
    _write_atomic(d, h1, h2, key_col)
    return {"n_keys": int(len(h1))}


def _write_meta(
    d: Path, key_col: str, n_keys: int, *, n_shards: Optional[int] = None
) -> None:
    meta = {
        "key_col": key_col,
        "hash": HASH_SCHEME,
        "n_keys": int(n_keys),
        **_hash_backend(),
    }
    if n_shards is not None:
        meta["n_shards"] = int(n_shards)
    (d / META_NAME).write_text(json.dumps(meta))


def _write_atomic(d: Path, h1, h2, key_col: str) -> None:
    tmp = d / "keys.parquet.tmp"
    pq.write_table(
        pa.table({"h1": pa.array(h1), "h2": pa.array(h2)}), tmp
    )
    tmp.replace(d / "keys.parquet")
    _write_meta(d, key_col, len(h1))


def _check_meta(
    d: Path, expect_key_col: Optional[str] = None
) -> dict:
    """Load + validate ``_meta.json`` (hash scheme, hash backend
    version, key column); raises on any mismatch so a stale or
    foreign index NEVER silently misses keys."""
    meta = json.loads((d / META_NAME).read_text())
    if meta.get("hash") != HASH_SCHEME:
        raise ValueError(f"index hash scheme mismatch: {meta.get('hash')}")
    cur = _hash_backend()
    built = {
        "backend": meta.get("backend"),
        "backend_version": meta.get("backend_version"),
    }
    # legacy meta (no backend stamp) loads as before; stamped meta
    # must match the live hash backend exactly — polars' Series.hash
    # is not stable across versions, so a silent mismatch would make
    # dedup miss every previously-seen key
    if built["backend"] is not None and built != cur:
        raise ValueError(
            f"key index was built with {built['backend']} "
            f"{built['backend_version']} but this environment hashes "
            f"with {cur['backend']} {cur['backend_version']}; rebuild "
            f"the index (build_key_index) or pin the hash backend"
        )
    if expect_key_col is not None and meta["key_col"] != expect_key_col:
        raise ValueError(
            f"index was built on {meta['key_col']!r}, probe asked for "
            f"{expect_key_col!r}"
        )
    return meta


def _load_shard(d: Path, shard: int) -> HashPairSet:
    """One shard's pair set; a missing shard dir is an EMPTY set (no
    key in that h1 range has ever been seen)."""
    f = d / f"shard={shard}" / "keys.parquet"
    if not f.exists():
        return HashPairSet(np.zeros(0, np.int64), np.zeros(0, np.int64))
    t = pq.read_table(f)
    return HashPairSet(
        t["h1"].to_numpy(zero_copy_only=False),
        t["h2"].to_numpy(zero_copy_only=False),
    )


def load_key_index(
    index_dir: "str | Path", *, expect_key_col: Optional[str] = None
) -> HashPairSet:
    d = Path(index_dir)
    meta = _check_meta(d, expect_key_col)
    if meta.get("n_shards"):
        raise ValueError(
            "index is sharded (n_shards="
            f"{meta['n_shards']}); whole-index broadcast would defeat "
            "the shard tier — probe with dedup_against_index (auto-"
            "routes to the bucketed shard probe)"
        )
    t = pq.read_table(d / "keys.parquet")
    return HashPairSet(
        t["h1"].to_numpy(zero_copy_only=False),
        t["h2"].to_numpy(zero_copy_only=False),
    )


def dedup_against_index(
    source: Any,
    key_col: str,
    index_dir: "str | Path",
    *,
    keep_nulls: bool = True,
    batch_size: int = 64 * 1024,
    audit_dir: "str | Path | None" = None,
) -> ray.data.Dataset:
    """Drop every row whose key is in the index (seen in ANY prior
    run); NULL keys kept by default (they identify nothing).

    Broadcast tier (unsharded index): one broadcast + one streaming
    pass, no shuffle. Sharded index (built with ``n_shards``): routes
    to the bucketed probe — the corpus shuffles ONCE by the index's
    h1 range and each group loads ONLY its shard's file, so per-task
    memory is index/n_shards and untouched shards are never read
    (``audit_dir``, when set, receives one ``shard=K`` marker file per
    shard actually loaded — the test/ops hook proving that)."""
    import pyarrow.compute as pc

    d = Path(index_dir)
    meta = _check_meta(d, expect_key_col=key_col)
    if meta.get("n_shards"):
        return _dedup_sharded(
            source, key_col, d, int(meta["n_shards"]),
            keep_nulls=keep_nulls, batch_size=batch_size,
            audit_dir=audit_dir,
        )
    pairs = load_key_index(index_dir, expect_key_col=key_col)
    ref = ray.put(pairs)

    def keep(batch: pa.Table) -> pa.Table:
        idx = ray.get(ref)
        col = batch[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        h1 = hash64(col, seed=0).astype(np.int64)
        h2 = hash64(col, seed=1).astype(np.int64)
        seen = idx.contains(h1, h2) & valid
        mask = ~seen if keep_nulls else (~seen & valid)
        return batch.filter(pa.array(mask))

    return _as_dataset(source).map_batches(
        keep, batch_format="pyarrow", batch_size=batch_size
    )


def _dedup_sharded(
    source: Any,
    key_col: str,
    d: Path,
    n_shards: int,
    *,
    keep_nulls: bool,
    batch_size: int,
    audit_dir: "str | Path | None" = None,
) -> ray.data.Dataset:
    """Bucketed shard probe: tag each row with its key's h1-range
    shard (NULL keys → shard −1, outside the uint64-shift image), ONE
    groupby shuffle co-locates every row with the only shard file that
    can contain its key, each group loads that ONE file (missing dir =
    empty set) and filters locally. The corpus crosses the wire once
    (inherent to any non-broadcast probe); the index never does."""
    import pyarrow.compute as pc

    dir_str, audit_str = str(d), (str(audit_dir) if audit_dir else None)

    def tag(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        h1 = hash64(col, seed=0).astype(np.int64)
        h2 = hash64(col, seed=1).astype(np.int64)
        s = np.where(valid, _shard_ids(h1, n_shards), np.int64(-1))
        return (
            batch.append_column("__s", pa.array(s, pa.int64()))
            .append_column("__h1", pa.array(h1, pa.int64()))
            .append_column("__h2", pa.array(h2, pa.int64()))
        )

    def probe(g: pa.Table) -> pa.Table:
        base = g.drop_columns(["__s", "__h1", "__h2"])
        if len(g) == 0:
            return base
        shard = int(g["__s"][0].as_py())
        if shard < 0:  # the NULL-key group: no shard can contain it
            return base if keep_nulls else base.slice(0, 0)
        if audit_str:
            Path(audit_str).mkdir(parents=True, exist_ok=True)
            (Path(audit_str) / f"shard={shard}").touch()
        idx = _load_shard(Path(dir_str), shard)
        seen = idx.contains(
            g["__h1"].to_numpy(zero_copy_only=False),
            g["__h2"].to_numpy(zero_copy_only=False),
        )
        return base.filter(pa.array(~seen))

    return (
        _as_dataset(source)
        .map_batches(tag, batch_format="pyarrow", batch_size=batch_size)
        .groupby("__s")
        .map_groups(probe, batch_format="pyarrow")
    )


def update_key_index(
    index_dir: "str | Path",
    new_source: Any,
    key_col: str,
    *,
    batch_size: int = 64 * 1024,
) -> dict:
    """Union-merge the new corpus's distinct keys into the index
    (atomic rewrite). Returns ``{n_keys_before, n_added, n_keys}``.
    Sharded indexes merge per shard in parallel: each touched shard
    task unions only its range (old shard file + new keys in range)
    and rewrites atomically; untouched shards are not rewritten."""
    d = Path(index_dir)
    meta = _check_meta(d, expect_key_col=key_col)
    if meta.get("n_shards"):
        n = int(meta["n_shards"])
        n_before = int(meta.get("n_keys", 0))
        total = _build_shards(
            _pair_partials(new_source, key_col, batch_size=batch_size),
            d, n, merge_existing=True,
        )
        _write_meta(d, key_col, total, n_shards=n)
        return {
            "n_keys_before": n_before,
            "n_added": int(total - n_before),
            "n_keys": int(total),
        }
    old = load_key_index(d, expect_key_col=key_col)
    n_before = len(old)
    nh1, nh2 = _distinct_hash_pairs(new_source, key_col, batch_size=batch_size)
    h1, h2 = _unique_pairs(
        np.concatenate([old.h1, nh1]), np.concatenate([old.h2, nh2])
    )
    _write_atomic(d, h1, h2, key_col)
    return {
        "n_keys_before": int(n_before),
        "n_added": int(len(h1) - n_before),
        "n_keys": int(len(h1)),
    }


# --------------------------------------------------------------------------- #
# incremental NEAR-dup: MinHash band keys through the same index              #
# --------------------------------------------------------------------------- #

MINHASH_META = "_minhash.json"
_BAND_KEY_COL = "band_key"


def _write_minhash_meta(d: Path, params: dict) -> None:
    (d / MINHASH_META).write_text(json.dumps(params))


def _read_minhash_meta(d: Path) -> dict:
    p = d / MINHASH_META
    if not p.exists():
        raise ValueError(
            f"{d} is not a near-dup index (missing {MINHASH_META}); "
            "build it with build_near_dup_index"
        )
    return json.loads(p.read_text())


def build_near_dup_index(
    source: Any,
    index_dir: "str | Path",
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    num_perms: int = 128,
    bands: int = 32,
    seed: int = 0x5EED,
    batch_size: int = 4096,
    n_shards: Optional[int] = None,
) -> dict:
    """Persistent cross-crawl NEAR-dup index: stores every MinHash
    band key (one int64 per LSH band per doc — see
    ``pipelines.dedup.minhash_band_keys``) the corpus has ever
    produced, in the SAME 16 B/key (h1, h2) layout as the exact index
    (sharded tier included). A later crawl probes with
    :func:`near_dup_against_index`: a doc sharing ANY band key with
    history is an LSH near-dup candidate of some previously indexed
    doc and drops — the recall-oriented gate (same banded-LSH
    semantics as the in-corpus ``minhash_lsh_candidates``; exact
    copies always collide in every band, so exact dups are caught
    with certainty). The MinHash parameters persist in
    ``_minhash.json`` so every future probe/update reuses them —
    mixed-parameter probes are meaningless and fail loudly."""
    from ..pipelines.dedup import minhash_band_keys

    keys = minhash_band_keys(
        source, id_col, text_col,
        n=n, num_perms=num_perms, bands=bands, seed=seed,
        batch_size=batch_size,
    )
    out = build_key_index(
        keys, _BAND_KEY_COL, index_dir, n_shards=n_shards
    )
    _write_minhash_meta(
        Path(index_dir),
        {"n": n, "num_perms": num_perms, "bands": bands, "seed": seed},
    )
    return out


def update_near_dup_index(
    index_dir: "str | Path",
    new_source: Any,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    batch_size: int = 4096,
) -> dict:
    """Union-merge a new crawl's band keys into the near-dup index
    (atomic; sharded indexes merge only touched shards). MinHash
    parameters come from the index's ``_minhash.json``."""
    from ..pipelines.dedup import minhash_band_keys

    d = Path(index_dir)
    p = _read_minhash_meta(d)
    keys = minhash_band_keys(
        new_source, id_col, text_col,
        n=p["n"], num_perms=p["num_perms"], bands=p["bands"],
        seed=p["seed"], batch_size=batch_size,
    )
    return update_key_index(d, keys, _BAND_KEY_COL)


def near_dup_against_index(
    source: Any,
    index_dir: "str | Path",
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    batch_size: int = 4096,
    audit_dir: "str | Path | None" = None,
) -> ray.data.Dataset:
    """Drop every document that is an LSH near-dup candidate of ANY
    previously indexed doc (shares ≥1 MinHash band key with history).
    Docs with no shingles emit no keys and are always kept.

    Broadcast tier (unsharded): a doc's band keys are computed
    DOC-LOCALLY inside its batch, probed against the ray.put index,
    and OR-reduced per doc — one streaming pass, no shuffle. Sharded
    tier: the (id, band_key) stream shuffles ONCE by the index's h1
    range, each group loads only its shard file and emits matched doc
    ids; the matched-id set broadcasts back as the drop set — bounded
    by the number of near-dup docs in THIS crawl (the same documented
    bound as ``near_dup_dedup``'s drop set)."""
    import pyarrow.compute as pc

    from ..pipelines.dedup import minhash_band_keys

    d = Path(index_dir)
    meta = _check_meta(d, expect_key_col=_BAND_KEY_COL)
    p = _read_minhash_meta(d)
    mh = dict(
        n=p["n"], num_perms=p["num_perms"], bands=p["bands"],
        seed=p["seed"],
    )

    if meta.get("n_shards"):
        n_shards = int(meta["n_shards"])
        keys = minhash_band_keys(
            source, id_col, text_col, batch_size=batch_size, **mh
        )
        dir_str = str(d)
        audit_str = str(audit_dir) if audit_dir else None

        def tag(batch: pa.Table) -> pa.Table:
            col = batch[_BAND_KEY_COL]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            h1 = hash64(col, seed=0).astype(np.int64)
            h2 = hash64(col, seed=1).astype(np.int64)
            s = _shard_ids(h1, n_shards)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "__s": pa.array(s, pa.int64()),
                    "__h1": pa.array(h1, pa.int64()),
                    "__h2": pa.array(h2, pa.int64()),
                }
            )

        def probe(g: pa.Table) -> pa.Table:
            empty = pa.table({id_col: pa.array([], pa.int64())})
            if len(g) == 0:
                return empty
            shard = int(g["__s"][0].as_py())
            if audit_str:
                Path(audit_str).mkdir(parents=True, exist_ok=True)
                (Path(audit_str) / f"shard={shard}").touch()
            idx = _load_shard(Path(dir_str), shard)
            seen = idx.contains(
                g["__h1"].to_numpy(zero_copy_only=False),
                g["__h2"].to_numpy(zero_copy_only=False),
            )
            ids = np.unique(
                g[id_col].to_numpy(zero_copy_only=False)[seen]
            )
            return pa.table({id_col: pa.array(ids, pa.int64())})

        matched = (
            keys.map_batches(tag, batch_format="pyarrow")
            .groupby("__s")
            .map_groups(probe, batch_format="pyarrow")
        )
        drop = np.unique(
            np.concatenate(
                [
                    b[id_col].to_numpy(zero_copy_only=False)
                    for b in matched.iter_batches(batch_format="pyarrow")
                ]
                or [np.array([], np.int64)]
            )
        )
        drop_ref = ray.put(pa.array(drop, pa.int64()))

        def keep(batch: pa.Table) -> pa.Table:
            ds_ = ray.get(drop_ref)
            if len(ds_) == 0:
                return batch
            mask = pc.invert(
                pc.fill_null(pc.is_in(batch[id_col], value_set=ds_), False)
            )
            return batch.filter(mask)

        return _as_dataset(source).map_batches(
            keep, batch_format="pyarrow", batch_size=batch_size
        )

    pairs = load_key_index(d, expect_key_col=_BAND_KEY_COL)
    ref = ray.put(pairs)
    from ..pipelines.dedup import MinHashStage, _MERSENNE

    stage = MinHashStage(id_col, text_col, **mh)

    def keep_local(batch: pa.Table) -> pa.Table:
        idx = ray.get(ref)
        t = stage(batch)  # (id, band, band_hash) — doc-local rows
        bh = t["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        k = pa.array(
            ((bh * np.uint64(1099511628211) + b) % _MERSENNE).view(np.int64),
            pa.int64(),
        )
        h1 = hash64(k, seed=0).astype(np.int64)
        h2 = hash64(k, seed=1).astype(np.int64)
        seen = idx.contains(h1, h2)
        drop_ids = np.unique(
            t[id_col].to_numpy(zero_copy_only=False)[seen]
        )
        if len(drop_ids) == 0:
            return batch
        mask = pc.invert(
            pc.fill_null(
                pc.is_in(batch[id_col], value_set=pa.array(drop_ids, pa.int64())),
                False,
            )
        )
        return batch.filter(mask)

    return _as_dataset(source).map_batches(
        keep_local, batch_format="pyarrow", batch_size=batch_size
    )
