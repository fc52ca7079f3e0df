"""Cross-environment integrity primitives: an order-independent
table checksum (did the copy/migration/engine-swap preserve every
row?) and a schema diff (what changed between two datasets?). The
validation-engine siblings of :func:`..pipelines.relational
.reconcile_tables` — the reference validates one table's rows
(validator.py); these compare TWO environments.

Scale shapes:

* :func:`table_checksum` — each batch canonicalizes its rows to one
  delimited string column (Arrow cast/join kernels), md5-hashes them
  (C-speed per-row hashing, the irreducible work — same tier as the
  md5 fingerprint in text.py), and reduces to ONE (count, sum mod
  2^64) partial row; the driver folds the tiny partial stream. Sum is
  order-independent, so no sort ever happens and the checksum is
  stable across partitionings/engines. DuckDB parity:
  ``SUM(md5_number_lower(row_str)) % 2^64``.
* :func:`schema_diff` — reads ONLY schemas (pyarrow dataset metadata
  or a lazy Dataset schema; zero data rows move), emits one row per
  column with added/removed/changed/same status in DuckDB type names.
"""

from __future__ import annotations

import hashlib
from typing import Any, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .dedup import _as_dataset

Dataset = ray.data.Dataset

_MOD = 1 << 64


def table_checksum(
    source: Any,
    cols: List[str],
    *,
    sep: str = "|",
    batch_size: int = 64 * 1024,
) -> pd.DataFrame:
    """Order-independent content checksum over ``cols``: canonical row
    string = the columns cast to VARCHAR (NULL → ''), joined by
    ``sep``; checksum = Σ lower-64-bits(md5(row)) mod 2^64 plus the
    row count. Equal data ⇒ equal checksum regardless of row order,
    file layout, or engine. Timestamp columns hash as epoch
    microseconds (cast upstream for other conventions); avoid raw
    float columns (engines format them differently) — quantize or
    cast upstream.

    Returns a one-row DataFrame ``(n_rows, checksum)`` with
    ``checksum`` as uint64.
    """

    def partial(batch: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            col = batch[c]
            if pa.types.is_timestamp(col.type):
                col = pc.cast(col, pa.int64())
            col = pc.cast(col, pa.string())
            parts.append(pc.coalesce(col, pa.scalar("")))
        rows = pc.binary_join_element_wise(*parts, pa.scalar(sep))
        tot = 0
        for r in rows.to_pylist():
            d = hashlib.md5(r.encode("utf-8")).digest()
            tot += int.from_bytes(d[8:], "little")
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "s": pa.array([tot % _MOD], pa.uint64()),
            }
        )

    parts = (
        _as_dataset(source, columns=cols)
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=batch_size)
        .to_pandas()
    )
    total = int(parts["n"].sum())
    chk = int(parts["s"].astype(object).sum()) % _MOD
    return pd.DataFrame(
        {
            "n_rows": pd.array([total], dtype="int64"),
            "checksum": pd.array([chk], dtype="uint64"),
        }
    )


_ARROW_TO_DUCK = {
    "int8": "TINYINT",
    "int16": "SMALLINT",
    "int32": "INTEGER",
    "int64": "BIGINT",
    "uint64": "UBIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "string": "VARCHAR",
    "large_string": "VARCHAR",
    "bool": "BOOLEAN",
    "date32[day]": "DATE",
    "binary": "BLOB",
    "large_binary": "BLOB",
}


def _duck_type(t: "pa.DataType") -> str:
    if pa.types.is_timestamp(t):
        return "TIMESTAMP"
    return _ARROW_TO_DUCK.get(str(t), str(t).upper())


def _schema_of(source: Any) -> "pa.Schema":
    if isinstance(source, Dataset):
        return source.schema().base_schema
    if isinstance(source, pa.Table):
        return source.schema
    if isinstance(source, pd.DataFrame):
        return pa.Schema.from_pandas(source)
    import pyarrow.dataset as pads

    return pads.dataset(str(source)).schema


def schema_diff(a: Any, b: Any) -> pd.DataFrame:
    """Column-level schema diff of two datasets, DuckDB type names:
    one row per column seen on either side with ``type_a`` /
    ``type_b`` (NULL when absent) and status ``added`` (b only),
    ``removed`` (a only), ``changed`` (type differs) or ``same``.
    Reads schemas only — no data rows move. Rows sort by column
    name."""
    sa = _schema_of(a)
    sb = _schema_of(b)
    ta = {f.name: _duck_type(f.type) for f in sa}
    tb = {f.name: _duck_type(f.type) for f in sb}
    rows = []
    for name in sorted(set(ta) | set(tb)):
        va, vb = ta.get(name), tb.get(name)
        status = (
            "added" if va is None
            else "removed" if vb is None
            else "same" if va == vb
            else "changed"
        )
        rows.append((name, va, vb, status))
    return pd.DataFrame(
        rows, columns=["column_name", "type_a", "type_b", "status"]
    )


def keyset_overlap(
    a: Any,
    a_key: str,
    b: Any,
    b_key: str,
    *,
    batch_size: int = 64 * 1024,
) -> pd.DataFrame:
    """Key-set overlap between two tables — the referential-coverage
    analysis behind FK checks: distinct-key counts of each side, the
    intersection/union sizes, Jaccard similarity and both containment
    ratios (what fraction of A's keys appear in B and vice versa).
    NULL keys drop (SQL DISTINCT semantics keep NULL; FK semantics —
    this operator's contract — don't).

    Scale shape: each side reduces to per-batch DISTINCT key partials
    (``pc.unique`` — exchange is batch-distinct keys); both partial
    streams union into ONE groupby on the key whose per-key side-mask
    OR yields membership, and three counters come back. The driver
    holds five integers, never a key set.
    """

    def distinct_keys(key: str, side: int):
        def f(batch: pa.Table) -> pa.Table:
            col = batch[key]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            u = pc.unique(col.drop_null())
            return pa.table(
                {
                    "k": pc.cast(u, pa.int64()),
                    "m": pa.array(
                        np.full(len(u), side, np.int64)
                    ),
                }
            )

        return f

    da = _as_dataset(a, columns=[a_key]).map_batches(
        distinct_keys(a_key, 1), batch_format="pyarrow",
        batch_size=batch_size,
    )
    db = _as_dataset(b, columns=[b_key]).map_batches(
        distinct_keys(b_key, 2), batch_format="pyarrow",
        batch_size=batch_size,
    )

    def count_members(batch: pa.Table) -> pa.Table:
        # summed DISTINCT side bits per key ∈ {1, 2, 3}:
        # A-only / B-only / both
        m = pc.cast(batch["sum(m)"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        c = np.bincount(m, minlength=4)
        return pa.table(
            {
                "a_only": pa.array([int(c[1])], pa.int64()),
                "b_only": pa.array([int(c[2])], pa.int64()),
                "both": pa.array([int(c[3])], pa.int64()),
            }
        )

    merged = (
        da.union(db)
        .groupby(["k", "m"])  # dedupe same-side partials of a key
        .count()
        .groupby("k")
        .sum("m")             # 1 / 2 / 3 bitmask (sides are bits)
        .map_batches(count_members, batch_format="pyarrow")
        .to_pandas()
    )
    a_only = int(merged["a_only"].sum())
    b_only = int(merged["b_only"].sum())
    both = int(merged["both"].sum())
    n_a = a_only + both
    n_b = b_only + both
    union = a_only + b_only + both
    return pd.DataFrame(
        {
            "n_a": pd.array([n_a], dtype="int64"),
            "n_b": pd.array([n_b], dtype="int64"),
            "n_intersect": pd.array([both], dtype="int64"),
            "n_union": pd.array([union], dtype="int64"),
            "jaccard": [round(both / union, 6) if union else None],
            "containment_a_in_b": [
                round(both / n_a, 6) if n_a else None
            ],
            "containment_b_in_a": [
                round(both / n_b, 6) if n_b else None
            ],
        }
    )


def canary_check(
    source: Any,
    id_col: str,
    text_col: str,
    canaries: "Dict[Any, str]",
    *,
    batch_size: int = 64 * 1024,
) -> pd.DataFrame:
    """Canary-document integrity check — plant K known documents in a
    pipeline's input and verify each one comes out the other end
    byte-identical: for every canary id, whether it was FOUND, whether
    its content md5 MATCHES the expected digest, and how many copies
    appeared (dedup stages must keep exactly one). The end-to-end
    smoke test that catches silent truncation/mojibake/dup-explosion
    that per-rule checks can miss.

    ``canaries`` maps id → expected md5 hexdigest of the text (utf-8).
    One streaming pass: non-canary rows drop immediately per batch
    (broadcast id set), only K partial rows merge. Returns one row per
    canary: ``(canary_id, n_copies, md5_matches)``."""
    import hashlib

    if not canaries:
        raise ValueError("canaries must be non-empty")
    wanted = {k: v.lower() for k, v in canaries.items()}
    id_set = set(wanted)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pandas()
        mask = ids.isin(id_set).to_numpy()
        if not mask.any():
            return pa.table(
                {
                    "canary_id": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "ok": pa.array([], pa.int64()),
                }
            )
        sub_ids = ids[mask]
        texts = batch[text_col].to_pandas()[mask]
        out_id, out_ok = [], []
        for i, t in zip(sub_ids, texts):
            h = hashlib.md5(
                (t if isinstance(t, str) else "").encode("utf-8")
            ).hexdigest()
            out_id.append(str(i))
            out_ok.append(int(h == wanted[i]))
        return pa.table(
            {
                "canary_id": pa.array(out_id, pa.string()),
                "n": pa.array(np.ones(len(out_id), np.int64), pa.int64()),
                "ok": pa.array(np.array(out_ok, np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    found = (
        _as_dataset(source, columns=[id_col, text_col])
        .map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("canary_id")
        .aggregate(Sum("n", alias_name="n"), Sum("ok", alias_name="ok"))
        .to_pandas()  # K-bounded
    )
    got = {r.canary_id: (int(r.n), int(r.ok)) for r in found.itertuples()}
    rows = []
    for cid in sorted(map(str, wanted)):
        n, ok = got.get(cid, (0, 0))
        rows.append(
            {
                "canary_id": cid,
                "n_copies": n,
                "md5_matches": bool(n > 0 and ok == n),
            }
        )
    out = pd.DataFrame(rows)
    out["n_copies"] = out["n_copies"].astype(np.int64)
    return out


def kmv_overlap(
    a: Any,
    a_key: str,
    b: Any,
    b_key: str,
    *,
    k: int = 4096,
    batch_size: int = 64 * 1024,
) -> pd.DataFrame:
    """APPROX tier of :func:`keyset_overlap` — distinct counts, union /
    intersection sizes and Jaccard estimated from two mergeable KMV
    (k-minimum-values) sketches, ~1/√k relative error. Deterministic
    (hash-based, no RNG); EXACT whenever a side has < k distinct keys
    (the sketch saw everything). NULL keys drop (FK contract, same as
    the exact tier).

    Scale shape: NO shuffle at all — each batch ships its k smallest
    distinct key hashes (a k-bounded partial), the driver folds the
    partial stream through one sorted-unique merge per side and never
    holds more than 2k hashes per side. The exact tier's groupby
    exchange is replaced by a fixed 32 KiB sketch, which is the 100-TB
    shape for monitoring FK coverage continuously."""
    from ..functions.sketches import KMV, hash64

    def kmin_partials(key: str):
        def f(batch: pa.Table) -> pa.Table:
            col = batch[key]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            u = col.drop_null().unique()
            h = np.unique(hash64(u))[:k]
            return pa.table({"h": pa.array(h.astype(np.int64), pa.int64())})

        return f

    def build(src: Any, key: str) -> KMV:
        ds = _as_dataset(src, columns=[key]).map_batches(
            kmin_partials(key), batch_format="pyarrow", batch_size=batch_size
        )
        sk = KMV(k)
        for bt in ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            sk.add_hashes(
                bt["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
            )
        return sk

    ka, kb = build(a, a_key), build(b, b_key)
    ov = KMV.overlap(ka, kb)
    return pd.DataFrame(
        {
            "k": pd.array([k], dtype="int64"),
            # unrounded: exact integers-as-floats when unsaturated (the
            # oracle-parity tier); estimates otherwise
            "est_n_a": [ka.estimate()],
            "est_n_b": [kb.estimate()],
            "est_union": [ov["union"]],
            "est_intersect": [ov["intersection"]],
            "est_jaccard": [ov["jaccard"]],
        }
    )


def range_checksums(
    source: Any,
    cols: List[str],
    range_col: str,
    *,
    width: int = 1000,
    sep: str = "|",
    batch_size: int = 64 * 1024,
) -> pd.DataFrame:
    """Merkle-style per-range content checksums: rows bucket by
    ``floor(range_col / width)`` and each range gets the same
    order-independent Σ md5-lower-64 mod 2^64 digest as
    :func:`table_checksum` plus its row count — the incremental-sync /
    anti-entropy primitive (two engines compare range digests and
    re-ship only the ranges that differ, never the whole table).
    NULL range keys land in the sentinel range ``int64 min`` — a
    value outside the image of ``floor(x / width)`` for any int64
    ``x`` and ``width ≥ 2``, so null-key rows can never merge with a
    genuine negative range (``-1`` would collide with keys in
    ``[-width, 0)``).

    Per batch: one canonical-string pass, md5 per row (C calls), and a
    vectorized uint64 ``np.add.at`` accumulation per range (natural
    2^64 wrap = the modulus); the driver merges #ranges × #batches
    partial rows in exact Python ints. Returns ``(range_id, n_rows,
    checksum)`` sorted by range.
    """
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            col = batch[c]
            if pa.types.is_timestamp(col.type):
                col = pc.cast(col, pa.int64())
            col = pc.cast(col, pa.string())
            parts.append(pc.coalesce(col, pa.scalar("")))
        rows = pc.binary_join_element_wise(*parts, pa.scalar(sep))
        rk = batch[range_col].to_numpy(zero_copy_only=False)
        rk = np.asarray(pd.to_numeric(pd.Series(rk), errors="coerce"))
        rid = np.where(
            np.isnan(rk),
            np.iinfo(np.int64).min,  # sentinel outside the floor image
            np.floor_divide(np.nan_to_num(rk), width).astype(np.int64),
        )
        uniq, inv = np.unique(rid, return_inverse=True)
        acc = np.zeros(len(uniq), np.uint64)
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(r.encode("utf-8")).digest()[8:], "little"
                )
                for r in rows.to_pylist()
            ),
            np.uint64,
            count=len(rows),
        )
        np.add.at(acc, inv, h)
        n = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "range_id": pa.array(uniq, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "s": pa.array(acc, pa.uint64()),
            }
        )

    parts = (
        _as_dataset(source, columns=sorted({*cols, range_col}))
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=batch_size)
        .to_pandas()
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "range_id": pd.Series(dtype="int64"),
                "n_rows": pd.Series(dtype="int64"),
                "checksum": pd.Series(dtype="uint64"),
            }
        )
    out = []
    for rid, g in parts.groupby("range_id", sort=True):
        out.append(
            (
                int(rid),
                int(g["n"].sum()),
                sum(int(x) for x in g["s"]) % _MOD,
            )
        )
    df = pd.DataFrame(out, columns=["range_id", "n_rows", "checksum"])
    df["checksum"] = df["checksum"].astype("uint64")
    return df
