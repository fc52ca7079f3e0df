"""Write-layout optimizers: multi-dimensional clustering for read
pruning. No reference analogue (reference scope: validation checks);
this is the Delta/Iceberg ``OPTIMIZE ZORDER BY`` capability a 100-TB
table needs so that 2-D+ range scans (time × key, lat × lon,
value-band × shard) touch a small fraction of row groups instead of
every file.

* :func:`zorder_key` — vectorized Morton (bit-interleaved) key over N
  numeric columns, each min-max scaled to ``bits``-bit integer grids.
  The scaling expression ``floor((v − min)/(max − min) · (2^bits − 1))``
  is evaluated in plain IEEE doubles exactly as a SQL oracle writes it,
  so keys are bit-identical cross-engine.
* :func:`zorder_sort` — ONE streaming min/max pass (mergeable
  partials; skipped when bounds are supplied) + one ``Dataset.sort``
  on the interleaved key. The sort is Ray Data's range-partitioned
  shuffle — inherent: a layout rewrite IS a global reorder. Downstream
  ``write_parquet`` then yields files whose per-column min/max
  footers are tight boxes on the z-curve, which is what makes
  row-group pruning effective on every interleaved dimension at once.

NULL handling: rows with a NULL in any z-column sort last (key
``2^63-1``) — explicit contract, keeps them in one run of files.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .dedup import _as_dataset

Dataset = ray.data.Dataset

_NULL_KEY = np.int64(2**63 - 1)


def _interleave(grids: "List[np.ndarray]", bits: int) -> np.ndarray:
    """Morton-interleave ``len(grids)`` arrays of ``bits``-bit ints:
    output bit ``b·n + i`` = bit ``b`` of ``grids[i]`` (vectorized;
    n·bits ≤ 63)."""
    n = len(grids)
    z = np.zeros(len(grids[0]), np.int64)
    for i, g in enumerate(grids):
        g = g.astype(np.int64)
        for b in range(bits):
            z |= ((g >> b) & 1) << (b * n + i)
    return z


def zorder_key(
    arrays: "Sequence[np.ndarray]",
    mins: "Sequence[float]",
    maxs: "Sequence[float]",
    *,
    bits: int = 16,
) -> np.ndarray:
    """Morton key for aligned float64 arrays (NaN → ``2^63−1``)."""
    if len(arrays) * bits > 63:
        raise ValueError(
            f"{len(arrays)} columns × {bits} bits exceeds the 63-bit key"
        )
    top = float(2**bits - 1)
    grids = []
    isnan = np.zeros(len(arrays[0]), bool)
    for a, lo, hi in zip(arrays, mins, maxs):
        a = np.asarray(a, np.float64)
        isnan |= np.isnan(a)
        span = hi - lo
        if span > 0:
            g = np.floor((a - lo) / span * top)
        else:
            g = np.zeros_like(a)
        grids.append(np.clip(np.nan_to_num(g), 0, top).astype(np.int64))
    z = _interleave(grids, bits)
    z[isnan] = _NULL_KEY
    return z


def zorder_sort(
    source: Any,
    cols: "List[str]",
    *,
    bits: int = 16,
    mins: "Optional[List[float]]" = None,
    maxs: "Optional[List[float]]" = None,
    key_name: str = "__z",
    keep_key: bool = False,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Rows reordered along the z-curve of ``cols`` (see module doc).
    Supply ``mins``/``maxs`` to skip the bounds pass (e.g. known
    domains, or reusing yesterday's bounds for a stable layout)."""
    ds = _as_dataset(source)

    if mins is None or maxs is None:
        def mm(batch: pa.Table) -> pa.Table:
            out = {}
            for c in cols:
                arr = pc.cast(batch[c], pa.float64())
                out[f"mn_{c}"] = [pc.min(arr).as_py()]
                out[f"mx_{c}"] = [pc.max(arr).as_py()]
            return pa.table(out)

        import pandas as pd

        parts = ds.map_batches(
            mm, batch_format="pyarrow", batch_size=batch_size
        ).to_pandas()
        mins = [float(parts[f"mn_{c}"].min()) for c in cols]
        maxs = [float(parts[f"mx_{c}"].max()) for c in cols]

    mins_l, maxs_l = list(mins), list(maxs)

    def add_key(batch: pa.Table) -> pa.Table:
        arrays = [
            pc.cast(batch[c], pa.float64()).to_numpy(zero_copy_only=False)
            for c in cols
        ]
        z = zorder_key(arrays, mins_l, maxs_l, bits=bits)
        return batch.append_column(key_name, pa.array(z, pa.int64()))

    out = ds.map_batches(
        add_key, batch_format="pyarrow", batch_size=batch_size
    ).sort(key_name)
    if not keep_key:
        names = [n for n in out.schema().names if n != key_name]
        out = out.select_columns(names)
    return out


def storage_profile(path: str) -> "pd.DataFrame":
    """Parquet storage-footprint report from FOOTERS ONLY (zero data
    rows move — the decision input for compression/layout work): per
    column, compressed + uncompressed byte totals, the compression
    ratio, and the share of the table's compressed bytes. One metadata
    read per file; at 100 TB this is a listing plus footer fetches,
    never a scan."""
    import pandas as pd
    import pyarrow.parquet as pq
    from pathlib import Path as _P

    p = _P(path)
    files = sorted(p.glob("*.parquet")) if p.is_dir() else [p]
    comp: Dict[str, int] = {}
    uncomp: Dict[str, int] = {}
    n_rows = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        n_rows += meta.num_rows
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                name = c.path_in_schema
                comp[name] = comp.get(name, 0) + c.total_compressed_size
                uncomp[name] = uncomp.get(name, 0) + c.total_uncompressed_size
    total_c = sum(comp.values()) or 1
    rows = []
    for name in sorted(comp):
        rows.append(
            {
                "column": name,
                "compressed_bytes": comp[name],
                "uncompressed_bytes": uncomp[name],
                "compression_ratio": round(
                    uncomp[name] / max(comp[name], 1), 6
                ),
                "share_of_table": round(comp[name] / total_c, 6),
            }
        )
    out = pd.DataFrame(rows)
    out["compressed_bytes"] = out["compressed_bytes"].astype(np.int64)
    out["uncompressed_bytes"] = out["uncompressed_bytes"].astype(np.int64)
    return out


def pruning_report(
    path: str,
    column: str,
    lo,
    hi,
) -> "pd.DataFrame":
    """Row-group pruning effectiveness from FOOTER min/max statistics
    (the read-planning question "how much would this range filter
    actually skip?" answered without scanning): counts row groups
    whose ``[min, max]`` stats overlap ``[lo, hi]`` vs total, plus the
    row fractions behind each. This is the measurement that justifies
    (or indicts) a sort/z-order layout — compare before/after
    :func:`zorder_sort`."""
    import pandas as pd
    import pyarrow.parquet as pq
    from pathlib import Path as _P

    p = _P(path)
    files = sorted(p.glob("*.parquet")) if p.is_dir() else [p]
    n_groups = n_hit = 0
    rows_total = rows_hit = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i
                 for i in range(meta.num_columns)}
        if column not in names:
            raise ValueError(f"column {column!r} not in {f}")
        ci = names[column]
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            st = g.column(ci).statistics
            n_groups += 1
            rows_total += g.num_rows
            if st is None or st.min is None or st.max is None:
                # no stats → cannot prune, must read
                n_hit += 1
                rows_hit += g.num_rows
                continue
            if not (st.max < lo or st.min > hi):
                n_hit += 1
                rows_hit += g.num_rows
    return pd.DataFrame(
        {
            "row_groups_total": pd.array([n_groups], dtype="int64"),
            "row_groups_read": pd.array([n_hit], dtype="int64"),
            "rows_total": pd.array([rows_total], dtype="int64"),
            "rows_read": pd.array([rows_hit], dtype="int64"),
            "groups_pruned_frac": [
                round(1 - n_hit / n_groups, 6) if n_groups else np.nan
            ],
        }
    )


def compact_files(
    in_dir: str,
    out_dir: str,
    checksum_cols: "List[str]",
    *,
    target_rows_per_file: int = 1 << 20,
    batch_size: int = 64 * 1024,
) -> "dict":
    """Small-file compaction — the table-maintenance pass every
    long-running ingestion needs (thousands of per-task fragment files
    → a few target-size files, so later reads plan fewer tasks and
    footer/metadata overhead stops dominating): read the fragmented
    Parquet dir, ``repartition`` to ``ceil(rows / target_rows)``
    output blocks, write once. Content preservation is PROVED, not
    assumed: the order-independent :func:`..pipelines.integrity
    .table_checksum` of the output is returned (compare to the input's
    — equal iff every row survived byte-identically; the driver query
    hash-checks it against the SQL checksum of the input).

    Returns ``{n_files_in, n_files_out, n_rows, checksum}``. Streaming
    end-to-end: the repartition is Ray's block exchange, never a
    driver collect.
    """
    import math
    from pathlib import Path as _P

    from .integrity import table_checksum

    ds = ray.data.read_parquet(in_dir)
    n_rows = ds.count()
    n_out = max(1, math.ceil(n_rows / target_rows_per_file))
    _P(out_dir).mkdir(parents=True, exist_ok=True)
    ds.repartition(n_out).write_parquet(out_dir)
    files_in = len(list(_P(in_dir).glob("*.parquet")))
    files_out = len(list(_P(out_dir).glob("*.parquet")))
    chk = table_checksum(out_dir, checksum_cols)
    return {
        "n_files_in": files_in,
        "n_files_out": files_out,
        "n_rows": int(n_rows),
        "checksum": int(chk["checksum"].iloc[0]),
    }


def write_bucketed(
    source: Any,
    out_dir: str,
    key_col: str,
    *,
    num_buckets: int = 32,
    columns: Optional[List[str]] = None,
    batch_size: int = 64 * 1024,
) -> str:
    """Hive-style bucketed table write: rows land in ``bucket=N/``
    dirs by ``hash64(key) % num_buckets`` — the storage-level
    co-partitioning that lets every later same-key operation (joins,
    grouped aggregates, dedup) skip its shuffle entirely. Two tables
    written with the SAME key dtype and bucket count are join-aligned
    bucket-for-bucket (:func:`bucketed_join` exploits this); the
    brief's "pick ONE partitioning key and reuse it across stages"
    made durable. NULL keys land in bucket 0 (they never join — kept
    only so row counts reconcile). A ``_buckets.json`` manifest pins
    (key, num_buckets, hash) so mismatched layouts fail loudly at
    read time. Returns ``out_dir``."""
    import json
    from pathlib import Path

    from ..functions.sketches import hash64

    def add_bucket(batch: pa.Table) -> pa.Table:
        col = batch[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # hash only the NON-NULL values in their native dtype: a
        # nullable int column converts whole to float64+NaN otherwise,
        # hashing inconsistently with a null-free int64 partner table
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        b = np.zeros(len(col), np.int64)
        vals = col.drop_null().to_numpy(zero_copy_only=False)
        if len(vals):
            b[valid] = (
                hash64(vals) % np.uint64(num_buckets)
            ).astype(np.int64)
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    ds = _as_dataset(source, columns=columns)
    ds.map_batches(
        add_bucket, batch_format="pyarrow", batch_size=batch_size
    ).write_parquet(out_dir, partition_cols=["bucket"])
    # key type from the written footers — authoritative for what the
    # hash actually saw, robust to pandas nullable-dtype blocks
    import pyarrow.parquet as _pq

    first = next(iter(sorted(Path(out_dir).glob("bucket=*/*.parquet"))))
    key_type = str(_pq.ParquetFile(first).schema_arrow.field(key_col).type)
    (Path(out_dir) / "_buckets.json").write_text(
        json.dumps(
            {
                "key": key_col,
                "key_type": key_type,
                "num_buckets": num_buckets,
                "hash": "hash64",
            }
        )
    )
    return out_dir


def bucketed_join(
    left_dir: str,
    right_dir: str,
    *,
    left_key: str,
    right_key: str,
    right_cols: Optional[List[str]] = None,
    num_cpus: float = 1.0,
) -> Dataset:
    """SHUFFLE-FREE inner join of two bucket-aligned tables written by
    :func:`write_bucketed` with the same bucket count: equal keys
    already co-locate at the DIRECTORY level, so the join is one Ray
    task per bucket reading exactly its two file sets and merging
    vectorized — no exchange at all, the payoff of co-partitioned
    storage. Raw ``@ray.remote`` tasks are used deliberately here: the
    Dataset API cannot express "read two aligned file sets per task"
    (this is its documented escape hatch); results return as Arrow
    refs and stream into a Dataset without driver materialization.

    Layout manifests must agree on ``num_buckets``/hash (loud error
    otherwise). NULL keys never match (dropped per bucket). Duplicate
    keys produce the SQL per-key cross product. Output columns: the
    left table's plus ``right_cols`` (default: all non-key right
    columns; names must not collide)."""
    import json
    from pathlib import Path

    import pandas as pd

    lm = json.loads((Path(left_dir) / "_buckets.json").read_text())
    rm = json.loads((Path(right_dir) / "_buckets.json").read_text())
    if lm["num_buckets"] != rm["num_buckets"] or lm["hash"] != rm["hash"]:
        raise ValueError(
            f"bucket layouts differ: {lm} vs {rm} — rewrite one side "
            "with matching num_buckets"
        )
    if lm.get("key_type") != rm.get("key_type"):
        # hash64 is dtype-sensitive: int64 1 and float64 1.0 land in
        # different buckets, silently losing matches — refuse
        raise ValueError(
            f"bucketing key types differ ({lm.get('key_type')} vs "
            f"{rm.get('key_type')}) — cast one side before writing"
        )
    if lm["key"] != left_key or rm["key"] != right_key:
        raise ValueError(
            "join keys must be the tables' bucketing keys "
            f"(left bucketed by {lm['key']!r}, right by {rm['key']!r})"
        )
    n_buckets = int(lm["num_buckets"])

    @ray.remote(num_cpus=num_cpus)
    def join_bucket(lfiles: List[str], rfiles: List[str]) -> pa.Table:
        import pyarrow.parquet as pq

        lt = pa.concat_tables([pq.read_table(f) for f in lfiles])
        rt = pa.concat_tables([pq.read_table(f) for f in rfiles])
        lt = lt.drop(["bucket"]) if "bucket" in lt.column_names else lt
        rt = rt.drop(["bucket"]) if "bucket" in rt.column_names else rt
        rcols = right_cols or [
            c for c in rt.column_names if c != right_key
        ]
        ldf = lt.to_pandas()
        rdf = rt.select(
            [right_key] + [c for c in rcols if c != right_key]
        ).to_pandas()
        ldf = ldf[ldf[left_key].notna()]
        rdf = rdf[rdf[right_key].notna()]
        out = ldf.merge(
            rdf, left_on=left_key, right_on=right_key, how="inner"
        )
        if right_key != left_key and right_key in out.columns:
            out = out.drop(columns=[right_key])
        return pa.Table.from_pandas(out, preserve_index=False)

    refs = []
    for b in range(n_buckets):
        lf = sorted(str(f) for f in Path(left_dir).glob(f"bucket={b}/*.parquet"))
        rf = sorted(str(f) for f in Path(right_dir).glob(f"bucket={b}/*.parquet"))
        if not lf or not rf:
            continue  # empty bucket on either side joins to nothing
        refs.append(join_bucket.remote(lf, rf))
    if not refs:
        return ray.data.from_items([])
    return ray.data.from_arrow_refs(refs)
