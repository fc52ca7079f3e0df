"""Delta Lake table source/sink over the OPEN delta.io transaction
protocol — closes the reference's S7 gap (`databricks_engine.py:135-202`
loads `{"type": "delta", "path": ...}` dict sources via
``spark.read.format("delta")``) without Spark, a ``deltalake`` package,
or any catalog service.

Everything here follows the published Delta transaction protocol
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md):

* the table state is the replay of ``_delta_log/%020d.json`` commits
  (one JSON action per line: ``protocol`` / ``metaData`` / ``add`` /
  ``remove`` / ``commitInfo``), optionally seeded from the newest
  single-part ``%020d.checkpoint.parquet`` at or below the requested
  version (``_last_checkpoint`` consulted first, listing as fallback);
* the ACTIVE file set is "last action per data-file path wins" —
  ``add`` inserts/updates, ``remove`` tombstones;
* ``add.path`` is URL-encoded and table-root-relative (absolute URIs
  honored); ``partitionValues`` are strings, cast to the partition
  column types declared by ``metaData.schemaString``.

Scale shape: log replay is METADATA-ONLY driver work (the log is tiny
relative to data — thousands of JSON lines / one checkpoint footer);
only the active data files enter ``ray.data.read_parquet`` (pruned to
the requested columns), so time travel and overwrite history cost
nothing at read time. Partition columns are attached per batch from a
broadcast path→values map (Delta stores them in the log, NOT in the
data files) — one streaming pass, no shuffle.

The writer emits protocol-conformant commits (``minReaderVersion=1`` /
``minWriterVersion=2``): data files land via a DISTRIBUTED
``Dataset.write_parquet`` into a per-writer staging dir and are renamed
into the table as ``part-{version}-{seq}-{token}`` names, where
``token`` is a per-write random GUID fragment (the Spark/delta-rs
convention) — two optimistic writers that compute the SAME next
version therefore never touch each other's staging dirs or data files;
the ONLY contended object is the commit file, whose exclusive
``os.link`` decides the race, and the loser's already-renamed files
become unreferenced garbage a later ``vacuum`` collects. ``append``
keeps prior files; ``overwrite`` tombstones every previously-active
file in the same commit. Readers of tables this module did not write
are gated loudly: ``minReaderVersion > 1`` features (column mapping,
deletion vectors, …) raise instead of silently misreading.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple
from urllib.parse import quote, unquote

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data
from ray.data import Dataset

__all__ = [
    "read_delta",
    "write_delta",
    "write_delta_checkpoint",
    "delete_delta",
    "delta_txn_version",
    "merge_delta",
    "optimize_delta",
    "vacuum_delta",
    "delta_active_files",
    "delta_pruned_files",
]

_LOG = "_delta_log"

# Spark-JSON primitive type name -> pyarrow type, for casting the
# string-typed add.partitionValues back to real columns.
_SPARK_TO_ARROW: Dict[str, pa.DataType] = {
    "string": pa.string(),
    "long": pa.int64(),
    "integer": pa.int32(),
    "short": pa.int16(),
    "byte": pa.int8(),
    "double": pa.float64(),
    "float": pa.float32(),
    "boolean": pa.bool_(),
    "date": pa.date32(),
    "timestamp": pa.timestamp("us"),
    "binary": pa.binary(),
}


def _commit_path(table: Path, version: int) -> Path:
    return table / _LOG / f"{version:020d}.json"


def _list_versions(log_dir: Path) -> List[int]:
    out = []
    for f in log_dir.iterdir():
        n = f.name
        if n.endswith(".json") and n[:-5].isdigit():
            out.append(int(n[:-5]))
    return sorted(out)


def _checkpoint_at(log_dir: Path, max_version: Optional[int]) -> Optional[int]:
    """Newest single-part checkpoint version ≤ max_version (None = no
    bound). Multi-part checkpoints are refused loudly."""
    best: Optional[int] = None
    hint = log_dir / "_last_checkpoint"
    if hint.exists():
        try:
            meta = json.loads(hint.read_text())
            v = int(meta["version"])
            if meta.get("parts"):
                raise NotImplementedError(
                    "multi-part Delta checkpoints are not supported"
                )
            if max_version is None or v <= max_version:
                if (log_dir / f"{v:020d}.checkpoint.parquet").exists():
                    best = v
        except (KeyError, ValueError, json.JSONDecodeError):
            best = None
    if best is None:
        for f in log_dir.glob("*.checkpoint.parquet"):
            stem = f.name.split(".")[0]
            if stem.isdigit():
                v = int(stem)
                if (max_version is None or v <= max_version) and (
                    best is None or v > best
                ):
                    best = v
        if any(log_dir.glob("*.checkpoint.*.parquet")):
            raise NotImplementedError(
                "multi-part Delta checkpoints are not supported"
            )
    return best


def _check_protocol(action: Dict[str, Any]) -> None:
    reader = int(action.get("minReaderVersion", 1))
    if reader <= 1:
        return
    feats = set(action.get("readerFeatures") or [])
    unsupported = feats - {"timestampNtz"}
    if reader > 1 and (reader != 3 or unsupported):
        raise NotImplementedError(
            f"Delta table requires minReaderVersion={reader} "
            f"(readerFeatures={sorted(feats)}); this reader supports "
            "version 1 tables (no column mapping / deletion vectors)"
        )


def _replay(
    table: Path, version: Optional[int]
) -> Tuple[Dict[str, Dict[str, Any]], Dict[str, Any]]:
    """Replay the log up to ``version`` (inclusive; None = latest).
    Returns (active add-actions by decoded relative path, metaData).
    ``meta["_schema_evolved"]`` (internal, stripped from protocol use)
    is True when more than one distinct schemaString appeared — data
    files then disagree on columns and reads must union by name."""
    log_dir = table / _LOG
    if not log_dir.is_dir():
        raise FileNotFoundError(f"not a Delta table (no {_LOG}): {table}")
    versions = _list_versions(log_dir)
    if version is not None:
        versions = [v for v in versions if v <= version]

    active: Dict[str, Dict[str, Any]] = {}
    meta: Dict[str, Any] = {}
    schema_of: Dict[str, Any] = {}  # active path -> append-time schema
    start = 0
    ckpt = _checkpoint_at(log_dir, version)
    if ckpt is not None:
        t = pq.read_table(
            str(log_dir / f"{ckpt:020d}.checkpoint.parquet"),
            columns=[
                c
                for c in ("add", "metaData", "protocol")
                if c
                in pq.ParquetFile(
                    str(log_dir / f"{ckpt:020d}.checkpoint.parquet")
                ).schema_arrow.names
            ],
        )
        rows = t.to_pylist()
        for row in rows:  # metaData first: adds tag with its schema
            if row.get("protocol"):
                _check_protocol(row["protocol"])
            if row.get("metaData"):
                meta = row["metaData"]
        for row in rows:
            if row.get("add"):
                a = row["add"]
                key = unquote(a["path"])
                active[key] = a
                # our checkpoint writer refuses evolved tables, so
                # every checkpointed add shares the checkpoint's schema
                schema_of[key] = meta.get("schemaString")
        start = ckpt + 1
        if not versions or versions[-1] < ckpt:
            versions = []

    for v in versions:
        if v < start:
            continue
        for line in _commit_path(table, v).read_text().splitlines():
            if not line.strip():
                continue
            action = json.loads(line)
            if "protocol" in action:
                _check_protocol(action["protocol"])
            if "metaData" in action:
                meta = action["metaData"]
            if "add" in action:
                a = action["add"]
                key = unquote(a["path"])
                active[key] = a
                schema_of[key] = meta.get("schemaString")
            elif "remove" in action:
                key = unquote(action["remove"]["path"])
                active.pop(key, None)
                schema_of.pop(key, None)
    if meta:
        # evolved = the ACTIVE files were appended under more than one
        # schema (an overwrite that replaced every file resets this —
        # the survivors all carry the latest schema)
        meta = {
            **meta,
            "_schema_evolved": len(set(schema_of.values())) > 1,
        }
    if not meta and ckpt is None and not versions:
        raise FileNotFoundError(
            f"Delta table has no commits at version<={version}: {table}"
        )
    return active, meta


def _partition_schema(meta: Dict[str, Any]) -> Dict[str, pa.DataType]:
    cols = meta.get("partitionColumns") or []
    if not cols:
        return {}
    fields = json.loads(meta["schemaString"])["fields"]
    by_name = {f["name"]: f["type"] for f in fields}
    out = {}
    for c in cols:
        t = by_name.get(c, "string")
        if not isinstance(t, str) or t not in _SPARK_TO_ARROW:
            raise NotImplementedError(
                f"unsupported Delta partition column type for {c!r}: {t}"
            )
        out[c] = _SPARK_TO_ARROW[t]
    return out


def _abs_path(table: Path, rel: str) -> str:
    """Resolve an add/remove path: table-root-relative by default, but
    the protocol also allows absolute paths/URIs (external or cloned
    files) — ``file:`` URIs unwrap, other schemes are unsupported."""
    if rel.startswith("file:"):
        from urllib.parse import urlparse

        return str(Path(urlparse(rel).path).resolve())
    if rel.startswith("/"):
        return str(Path(rel).resolve())
    if "://" in rel.split("/", 1)[0] + "/":
        raise NotImplementedError(
            f"non-local absolute Delta file URI: {rel}"
        )
    return str((table / rel).resolve())


def delta_active_files(
    path: "str | Path", *, version: Optional[int] = None
) -> List[str]:
    """Absolute paths of the table's active data files at ``version``
    (metadata-only — the audit/debug view of the log replay)."""
    table = Path(path)
    active, _ = _replay(table, version)
    return sorted(_abs_path(table, p) for p in active)


def _cast_part_value(v: Optional[str], typ: pa.DataType):
    if v is None or v == "":
        return None
    return pa.scalar(v, pa.string()).cast(typ).as_py()


def _file_stats(f: Path) -> Optional[str]:
    """Delta ``add.stats`` JSON for one data file, from the Parquet
    FOOTER only (numRecords + per-column min/max/nullCount for numeric
    and string columns — the data-skipping payload). None when the
    footer carries no statistics."""
    md = pq.ParquetFile(str(f)).metadata
    mins: Dict[str, Any] = {}
    maxs: Dict[str, Any] = {}
    nulls: Dict[str, int] = {}
    schema = md.schema.to_arrow_schema()
    for ci in range(md.num_columns):
        col = md.schema.column(ci)
        name = col.name
        field = schema.field(name) if name in schema.names else None
        if field is None or not (
            pa.types.is_integer(field.type)
            or pa.types.is_floating(field.type)
            or pa.types.is_string(field.type)
            or pa.types.is_large_string(field.type)
        ):
            continue
        mn = mx = None
        nn = 0
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
            nn += st.null_count or 0
        if ok and mn is not None:
            mins[name] = mn
            maxs[name] = mx
            nulls[name] = nn
    if not mins:
        return None
    return json.dumps(
        {
            "numRecords": md.num_rows,
            "minValues": mins,
            "maxValues": maxs,
            "nullCount": nulls,
        }
    )


def delta_pruned_files(
    path: "str | Path",
    col: str,
    lo: Any,
    hi: Any,
    *,
    version: Optional[int] = None,
) -> Tuple[List[str], List[str]]:
    """Data skipping (the Delta protocol's ``add.stats`` payload):
    split the active files into (kept, skipped) for a ``lo <= col <=
    hi`` range predicate. A file is skipped ONLY when its stats prove
    no row can match (``min > hi`` or ``max < lo``); missing/partial
    stats keep the file (conservative). Partition columns prune from
    ``partitionValues`` instead. Metadata-only — no data pages read."""
    table = Path(path)
    active, meta = _replay(table, version)
    part_types = _partition_schema(meta)
    kept: List[str] = []
    skipped: List[str] = []
    for rel in sorted(active):
        a = active[rel]
        ap = _abs_path(table, rel)
        if col in part_types:
            v = _cast_part_value(
                (a.get("partitionValues") or {}).get(col), part_types[col]
            )
            (kept if v is None or lo <= v <= hi else skipped).append(ap)
            continue
        st = a.get("stats")
        if isinstance(st, str):
            try:
                st = json.loads(st)
            except json.JSONDecodeError:
                st = None
        mn = (st or {}).get("minValues", {}).get(col)
        mx = (st or {}).get("maxValues", {}).get(col)
        if mn is not None and mx is not None and (mn > hi or mx < lo):
            skipped.append(ap)
        else:
            kept.append(ap)
    return kept, skipped


def read_delta(
    path: "str | Path",
    *,
    version: Optional[int] = None,
    columns: Optional[List[str]] = None,
    stats_filter: Optional[Tuple[str, Any, Any]] = None,
) -> Dataset:
    """Read a Delta table as a streaming ``ray.data.Dataset``.

    ``version`` time-travels to that commit (inclusive); ``columns``
    prunes the Parquet read (partition columns come from the log, so
    requesting only them still reads no data pages beyond one stub
    column). ``stats_filter=(col, lo, hi)`` applies data skipping:
    files whose ``add.stats`` / partitionValues prove no row in
    ``[lo, hi]`` are never opened (see :func:`delta_pruned_files`);
    the caller still applies the row-level predicate — skipping only
    removes provably-irrelevant files. Empty active set returns an
    empty Dataset (typed when the schema is reconstructible from
    ``metaData.schemaString``)."""
    table = Path(path)
    active, meta = _replay(table, version)
    part_types = _partition_schema(meta)
    if stats_filter is not None and active:
        col, lo, hi = stats_filter
        kept, _ = delta_pruned_files(table, col, lo, hi, version=version)
        # delta_pruned_files returns _abs_path-resolved paths; compare in
        # THAT key space — active keys may be absolute paths or file: URIs
        # (foreign/cloned tables), which a relpath of the table root would
        # never match, silently dropping those files from the read
        kept_abs = set(kept)
        active = {
            r: a for r, a in active.items()
            if _abs_path(table, r) in kept_abs
        }

    if not active:
        fields = []
        if meta.get("schemaString"):
            for f in json.loads(meta["schemaString"])["fields"]:
                t = f["type"]
                if isinstance(t, str) and t in _SPARK_TO_ARROW:
                    fields.append(pa.field(f["name"], _SPARK_TO_ARROW[t]))
        empty = pa.table(
            {f.name: pa.array([], f.type) for f in fields}
        )
        if columns:
            empty = empty.select([c for c in columns if c in empty.column_names])
        return ray.data.from_arrow(empty)

    files = sorted(active)
    abs_files = [_abs_path(table, p) for p in files]

    data_cols = None
    want_parts = list(part_types)
    if columns:
        data_cols = [c for c in columns if c not in part_types] or None
        want_parts = [c for c in part_types if c in columns]
        if data_cols and meta.get("schemaString"):
            # missing-column contract (validator parity): a rule naming
            # an absent column must fail as a RULE, not as a read error
            known = {
                f["name"]
                for f in json.loads(meta["schemaString"])["fields"]
            }
            data_cols = [c for c in data_cols if c in known] or None

    if meta.get("_schema_evolved"):
        # more than one schemaString in the replayed log: data files
        # disagree on columns (mergeSchema appends), so the read must
        # union by name — older files NULL-fill the added columns.
        # Conservative: an overwrite that replaced the schema also
        # trips this (all active files then agree; the union read is
        # merely slower, never wrong).
        if part_types:
            raise NotImplementedError(
                "read_delta: schema evolution on a PARTITIONED table "
                "is not supported (the union read path cannot attach "
                "partitionValues); rewrite via overwrite"
            )
        from . import read_parquet_union_by_name

        return read_parquet_union_by_name(abs_files, columns=data_cols)

    if not part_types:
        return ray.data.read_parquet(abs_files, columns=data_cols)

    # file -> cast partition values, broadcast once; attached per batch.
    # Keyed by basename (unique within a Delta table: writers use
    # uuid/sequence names) so Ray's path normalization can't break the
    # lookup; collisions are refused loudly.
    pv_by_file: Dict[str, Dict[str, Any]] = {}
    for rel in files:
        base = rel.rsplit("/", 1)[-1]
        if base in pv_by_file:
            raise ValueError(
                f"duplicate data-file basename in Delta table: {base}"
            )
        pv_by_file[base] = {
            c: _cast_part_value(
                (active[rel].get("partitionValues") or {}).get(c), t
            )
            for c, t in part_types.items()
        }
    def attach(batch: pa.Table) -> pa.Table:
        pv_map, want, keep_data = ray.get(pv_ref)
        # a batch spans few files: dictionary-encode the path column
        # and gather per distinct file, never per row
        enc = batch["path"].combine_chunks().dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        bases = [p.rsplit("/", 1)[-1] for p in enc.dictionary.to_pylist()]
        if keep_data is not None:  # projection (see Ray bug note below)
            batch = batch.select(
                [c for c in keep_data if c in batch.column_names]
            )
        else:
            batch = batch.drop_columns(["path"])
        out = batch
        for c, t in want.items():
            per_file = pa.array([pv_map[b][c] for b in bases], t)
            out = out.append_column(c, per_file.take(pa.array(idx)))
        return out

    pv_ref = ray.put((pv_by_file, {c: part_types[c] for c in want_parts},
                      (data_cols or []) if columns else None))

    # partitioning=None: the LOG is the source of truth for partition
    # values (Delta does not guarantee hive dir layout, and Ray's hive
    # inference would duplicate the attached columns). Known Ray bug
    # (2.49): columns= together with partitioning=None raises
    # UnboundLocalError in the parquet datasource's column split, so a
    # partitioned pruned read projects inside `attach` instead of at
    # the read — unpartitioned tables (the common huge-fact shape)
    # still prune at the read via the branch above.
    ds = ray.data.read_parquet(
        abs_files,
        include_paths=True,
        partitioning=None,
    )
    return ds.map_batches(attach, batch_format="pyarrow")


def _schema_string(schema: pa.Schema) -> str:
    """pyarrow schema -> Spark-JSON schemaString (primitives only)."""
    rev = {
        pa.string(): "string",
        pa.large_string(): "string",
        pa.int64(): "long",
        pa.int32(): "integer",
        pa.int16(): "short",
        pa.int8(): "byte",
        pa.float64(): "double",
        pa.float32(): "float",
        pa.bool_(): "boolean",
        pa.date32(): "date",
        pa.binary(): "binary",
        pa.large_binary(): "binary",
    }
    fields = []
    for f in schema:
        if pa.types.is_timestamp(f.type):
            t = "timestamp"
        elif f.type in rev:
            t = rev[f.type]
        else:
            raise NotImplementedError(
                f"write_delta: unsupported column type {f.type} ({f.name})"
            )
        fields.append(
            {"name": f.name, "type": t, "nullable": True, "metadata": {}}
        )
    return json.dumps({"type": "struct", "fields": fields})


def write_delta(
    source: Any,
    path: "str | Path",
    *,
    mode: str = "append",
    partition_cols: Optional[List[str]] = None,
    txn: Optional[Tuple[str, int]] = None,
    schema_mode: str = "strict",
) -> int:
    """Write a Dataset (or anything ``ray.data.from_pandas``-able) to a
    Delta table at ``path``; returns the committed version.

    ``txn=(app_id, version)`` records the protocol's idempotent-writer
    action in the same commit — a restarted writer asks
    :func:`delta_txn_version` and skips work it already committed
    (exactly-once stream appends).

    ``schema_mode="merge"`` allows an APPEND to ADD new columns
    (mergeSchema semantics): shared columns must keep identical types
    and partitioning must match; the committed metaData becomes the
    union schema (table columns first) and older files simply lack the
    new columns — reads union by name, NULL-filling them.

    ``mode="append"`` adds files; ``mode="overwrite"`` additionally
    tombstones every previously-active file in the SAME commit (the
    protocol's atomic replace). Partitioned writes go through
    ``Dataset.write_parquet(partition_cols=...)`` (hive staging dirs →
    partitionValues in the add actions; partition columns are dropped
    from the data files per the protocol)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"write_delta: unknown mode {mode!r}")
    table = Path(path)
    log_dir = table / _LOG
    table.mkdir(parents=True, exist_ok=True)
    log_dir.mkdir(exist_ok=True)

    if isinstance(source, Dataset):
        ds = source
    elif isinstance(source, pa.Table):
        ds = ray.data.from_arrow(source)
    else:
        import pandas as pd

        # convert via pyarrow, NOT ray.data.from_pandas: Ray's pandas
        # conversion degrades all-NA extension columns (e.g. string
        # dtype with only <NA>) to Arrow null type, which has no Delta
        # schemaString representation; pa.Table.from_pandas keeps the
        # declared dtype
        ds = ray.data.from_arrow(
            pa.Table.from_pandas(
                pd.DataFrame(source), preserve_index=False
            )
        )

    # next version counts JSON commits AND checkpoints (after log
    # cleanup a checkpoint may be the newest version on disk; reusing
    # its number would collide data-file names and corrupt the table)
    versions = _list_versions(log_dir)
    ckpt_v = _checkpoint_at(log_dir, None)
    newest = max(
        [*versions, *([ckpt_v] if ckpt_v is not None else [])],
        default=None,
    )
    version = (newest + 1) if newest is not None else 0
    prior_active: Dict[str, Dict[str, Any]] = {}
    prior_meta: Dict[str, Any] = {}
    if newest is not None:
        prior_active, prior_meta = _replay(table, None)
        if mode != "overwrite":
            prior_active = {}

    # pandas-block datasets report extension dtypes (e.g. nullable
    # Int64) as None in Schema.types; a no-op Arrow pass normalizes the
    # blocks so the schema is a real Arrow schema (fuses, ~free)
    ds = ds.map_batches(lambda b: b, batch_format="pyarrow")
    schema = ds.schema()
    arrow_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(schema.names, schema.types)]
    )
    part_cols = list(partition_cols or [])

    # schema enforcement (Delta semantics): an APPEND whose schema or
    # partitioning differs from the table's current metaData is refused
    # loudly — silently mixing schemas corrupts every downstream read.
    # An OVERWRITE may change both; the new metaData rides the commit.
    new_schema_string = _schema_string(arrow_schema)
    schema_changed = False
    if prior_meta:
        cur_fields = json.loads(prior_meta.get("schemaString", "{}")).get(
            "fields", []
        )
        new_fields = json.loads(new_schema_string)["fields"]
        cur_parts = prior_meta.get("partitionColumns") or []
        same = (
            {(f["name"], f["type"]) for f in cur_fields}
            == {(f["name"], f["type"]) for f in new_fields}
            and cur_parts == part_cols
        )
        if not same:
            cur_by_name = {f["name"]: f["type"] for f in cur_fields}
            new_by_name = {f["name"]: f["type"] for f in new_fields}
            mergeable = (
                schema_mode == "merge"
                and cur_parts == part_cols
                and all(
                    cur_by_name[n] == t
                    for n, t in new_by_name.items()
                    if n in cur_by_name
                )
            )
            if mode != "overwrite" and mergeable:
                # mergeSchema: union = table fields + genuinely-new
                # fields, committed as updated metaData
                union_fields = list(cur_fields) + [
                    f for f in new_fields
                    if f["name"] not in cur_by_name
                ]
                new_schema_string = json.dumps(
                    {"type": "struct", "fields": union_fields}
                )
                schema_changed = True
            elif mode != "overwrite":
                cur_desc = sorted(
                    (f["name"], f["type"]) for f in cur_fields
                )
                new_desc = sorted(
                    (f["name"], f["type"]) for f in new_fields
                )
                raise ValueError(
                    "write_delta: append schema mismatch — table has "
                    f"{cur_desc} partitioned by {cur_parts}, write has "
                    f"{new_desc} partitioned by {part_cols}; use "
                    "mode='overwrite' to replace the schema, or "
                    "schema_mode='merge' to add new columns"
                )
            else:
                schema_changed = True

    # per-write GUID token: staging dir and data-file names must be
    # collision-free across concurrent writers that computed the SAME
    # next version (Spark/delta-rs use GUID file names for the same
    # reason) — only the commit file below is ever contended
    tok = uuid.uuid4().hex[:12]
    staging = table / f"_staging-{version:020d}-{tok}"
    ds.write_parquet(str(staging), partition_cols=part_cols or None)

    adds: List[Dict[str, Any]] = []
    seq = 0
    for f in sorted(staging.rglob("*.parquet")):
        rel_dir = f.parent.relative_to(staging)
        pvals: Dict[str, Optional[str]] = {}
        for piece in rel_dir.parts:
            k, _, v = piece.partition("=")
            pvals[k] = unquote(v) if v != "__HIVE_DEFAULT_PARTITION__" else None
        fname = f"part-{version:05d}-{seq:05d}-{tok}.parquet"
        dest_rel = (
            "/".join([*rel_dir.parts, fname]) if rel_dir.parts else fname
        )
        dest = table / dest_rel
        dest.parent.mkdir(parents=True, exist_ok=True)
        size = f.stat().st_size
        stats = _file_stats(f)  # footer-only, pre-rename
        os.replace(f, dest)
        add: Dict[str, Any] = {
            "path": quote(dest_rel, safe="/="),
            "partitionValues": {c: pvals.get(c) for c in part_cols},
            "size": size,
            "modificationTime": int(time.time() * 1000),
            "dataChange": True,
        }
        if stats is not None:
            add["stats"] = stats
        adds.append({"add": add})
        seq += 1
    shutil.rmtree(staging, ignore_errors=True)

    actions: List[Dict[str, Any]] = []
    if version == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
    if version == 0 or schema_changed:
        actions.append(
            {
                "metaData": {
                    "id": prior_meta.get("id")
                    or "dvray-"
                    + hashlib.md5(str(table).encode()).hexdigest()[:16],
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": new_schema_string,
                    "partitionColumns": part_cols,
                    "configuration": {},
                }
            }
        )
    if mode == "overwrite" and prior_active:
        now = int(time.time() * 1000)
        for rel in sorted(prior_active):
            actions.append(
                {
                    "remove": {
                        "path": quote(rel),
                        "deletionTimestamp": now,
                        "dataChange": True,
                    }
                }
            )
    actions.extend(adds)
    if txn is not None:
        actions.append(
            {
                "txn": {
                    "appId": str(txn[0]),
                    "version": int(txn[1]),
                    "lastUpdated": int(time.time() * 1000),
                }
            }
        )
    actions.append(
        {
            "commitInfo": {
                "timestamp": int(time.time() * 1000),
                "operation": "WRITE",
                "operationParameters": {"mode": mode},
            }
        }
    )
    # optimistic concurrency (the Delta commit rule): the version file
    # is created EXCLUSIVELY — a concurrent writer that claimed this
    # version first wins, and this commit fails loudly instead of
    # silently overwriting its log entry (os.link is atomic-if-absent
    # on POSIX; plain rename would clobber)
    tmp = log_dir / f".{version:020d}-{os.getpid()}.json.tmp"
    tmp.write_text("\n".join(json.dumps(a) for a in actions) + "\n")
    try:
        os.link(tmp, _commit_path(table, version))
    except FileExistsError:
        tmp.unlink(missing_ok=True)
        raise RuntimeError(
            f"write_delta: concurrent commit at version {version} "
            f"(another writer published {_commit_path(table, version)}); "
            "retry the write"
        ) from None
    tmp.unlink(missing_ok=True)
    return version


def write_delta_checkpoint(path: "str | Path") -> int:
    """Write a single-part checkpoint of the table's CURRENT state at
    its newest version and point ``_last_checkpoint`` at it, so readers
    seed from one Parquet footer instead of replaying every JSON commit
    — the log-compaction step a long-lived incremental table (crawl
    loops appending per-batch commits) needs. Returns the checkpointed
    version.

    The checkpoint rows carry one action per row (``protocol`` /
    ``metaData`` / ``add``), per the protocol's checkpoint schema;
    empty structs are stripped (Parquet cannot write no-child structs).
    Older JSON commits MAY then be deleted by a retention job — readers
    fall back to the checkpoint (tested), and the writer's version
    counter counts checkpoints too, so cleanup never recycles a
    version."""
    table = Path(path)
    log_dir = table / _LOG
    versions = _list_versions(log_dir)
    ckpt_v = _checkpoint_at(log_dir, None)
    newest = max(
        [*versions, *([ckpt_v] if ckpt_v is not None else [])],
        default=None,
    )
    if newest is None:
        raise FileNotFoundError(f"no commits to checkpoint: {table}")
    active, meta = _replay(table, newest)
    if meta.get("_schema_evolved"):
        raise NotImplementedError(
            "write_delta_checkpoint: the active files were appended "
            "under different schemas (mergeSchema); a checkpoint "
            "cannot carry per-file schema history — compact first "
            "(read_delta + write_delta(mode='overwrite'))"
        )

    def strip_empty(d: Dict[str, Any]) -> Dict[str, Any]:
        return {
            k: (strip_empty(v) if isinstance(v, dict) else v)
            for k, v in d.items()
            if v != {}
        }

    txns = _scan_txns(table, newest)
    rows: List[Dict[str, Any]] = [
        {
            "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
            "metaData": None,
            "add": None,
            "txn": None,
        },
        {"protocol": None,
         "metaData": strip_empty(
             {k: v for k, v in meta.items() if k != "_schema_evolved"}
         ),
         "add": None,
         "txn": None},
    ]
    for app, v in sorted(txns.items()):
        rows.append(
            {
                "protocol": None,
                "metaData": None,
                "add": None,
                "txn": {"appId": app, "version": v},
            }
        )
    for rel in sorted(active):
        rows.append(
            {
                "protocol": None,
                "metaData": None,
                "add": strip_empty(active[rel]),
                "txn": None,
            }
        )
    tbl = pa.Table.from_pylist(rows)
    tmp = log_dir / f".{newest:020d}.checkpoint.parquet.tmp"
    pq.write_table(tbl, str(tmp))
    os.replace(tmp, log_dir / f"{newest:020d}.checkpoint.parquet")
    hint = log_dir / "_last_checkpoint"
    tmp_hint = log_dir / "._last_checkpoint.tmp"
    tmp_hint.write_text(json.dumps({"version": newest, "size": len(rows)}))
    os.replace(tmp_hint, hint)
    return newest


def delete_delta(
    path: "str | Path",
    col: str,
    lo: Any,
    hi: Any,
) -> Dict[str, int]:
    """DELETE rows with ``lo <= col <= hi`` (NULLs never match — SQL
    range semantics) as ONE atomic commit, touching the minimum set of
    files the stats allow:

    * files whose stats prove NO row matches are left untouched;
    * files whose stats (min ≥ lo, max ≤ hi, nullCount == 0) prove
      EVERY row matches are tombstoned without being read;
    * only genuinely-overlapping files are read, filtered, and
      rewritten (distributed, same staged-write path as
      :func:`write_delta`); a rewrite that filters to zero rows just
      tombstones.

    Returns ``{"version", "removed_files", "rewritten_files",
    "untouched_files"}``. A predicate matching nothing commits nothing
    and returns ``version=-1``."""
    table = Path(path)
    active, meta = _replay(table, None)
    part_types = _partition_schema(meta)
    if col in part_types:
        raise NotImplementedError(
            "delete_delta on a partition column: drop the partitions "
            "via overwrite instead (their files carry no column stats)"
        )
    if part_types:
        raise NotImplementedError(
            "delete_delta on a partitioned table would lose the "
            "rewritten files' partitionValues; rewrite via "
            "read_delta + filter + write_delta(mode='overwrite', "
            "partition_cols=...) instead"
        )

    drop_whole: List[str] = []  # rel paths proved all-matching
    rewrite: List[str] = []  # rel paths that may partially match
    untouched = 0
    for rel in sorted(active):
        a = active[rel]
        st = a.get("stats")
        if isinstance(st, str):
            try:
                st = json.loads(st)
            except json.JSONDecodeError:
                st = None
        mn = (st or {}).get("minValues", {}).get(col)
        mx = (st or {}).get("maxValues", {}).get(col)
        nn = (st or {}).get("nullCount", {}).get(col)
        if mn is not None and mx is not None and (mn > hi or mx < lo):
            untouched += 1  # provably disjoint
        elif (
            mn is not None
            and mx is not None
            and nn == 0
            and mn >= lo
            and mx <= hi
        ):
            drop_whole.append(rel)  # provably all-matching: no read
        else:
            rewrite.append(rel)

    if not drop_whole and not rewrite:
        return {
            "version": -1,
            "removed_files": 0,
            "rewritten_files": 0,
            "untouched_files": untouched,
        }

    versions = _list_versions(table / _LOG)
    ckpt_v = _checkpoint_at(table / _LOG, None)
    newest = max(
        [*versions, *([ckpt_v] if ckpt_v is not None else [])]
    )
    version = newest + 1

    adds: List[Dict[str, Any]] = []
    seq = 0
    rewritten = 0
    if rewrite:
        import pyarrow.compute as pc

        def keep_rows(batch: pa.Table) -> pa.Table:
            c = batch[col]
            matches = pc.and_(
                pc.greater_equal(c, lo), pc.less_equal(c, hi)
            )
            # NULL never matches → kept; invert with null→keep
            keep = pc.fill_null(pc.invert(matches), True)
            return batch.filter(keep)

        src = ray.data.read_parquet(
            [_abs_path(table, r) for r in rewrite],
            partitioning=None,
        ).map_batches(keep_rows, batch_format="pyarrow")
        tok = uuid.uuid4().hex[:12]  # collision-free vs concurrent writers
        staging = table / f"_staging-{version:020d}-{tok}"
        src.write_parquet(str(staging))
        for f in sorted(staging.rglob("*.parquet")):
            if pq.ParquetFile(str(f)).metadata.num_rows == 0:
                continue
            dest_rel = f"part-{version:05d}-{seq:05d}-{tok}.parquet"
            dest = table / dest_rel
            size = f.stat().st_size
            stats = _file_stats(f)
            os.replace(f, dest)
            add: Dict[str, Any] = {
                "path": quote(dest_rel, safe="/="),
                "partitionValues": {},
                "size": size,
                "modificationTime": int(time.time() * 1000),
                "dataChange": True,
            }
            if stats is not None:
                add["stats"] = stats
            adds.append({"add": add})
            seq += 1
            rewritten += 1
        shutil.rmtree(staging, ignore_errors=True)

    now = int(time.time() * 1000)
    actions: List[Dict[str, Any]] = [
        {
            "remove": {
                "path": quote(rel, safe="/="),
                "deletionTimestamp": now,
                "dataChange": True,
            }
        }
        for rel in (*drop_whole, *rewrite)
    ]
    actions.extend(adds)
    actions.append(
        {
            "commitInfo": {
                "timestamp": now,
                "operation": "DELETE",
                "operationParameters": {
                    "predicate": f"{col} BETWEEN {lo} AND {hi}"
                },
            }
        }
    )
    tmp = table / _LOG / f".{version:020d}-{os.getpid()}.json.tmp"
    tmp.write_text("\n".join(json.dumps(a) for a in actions) + "\n")
    try:
        os.link(tmp, _commit_path(table, version))
    except FileExistsError:
        tmp.unlink(missing_ok=True)
        raise RuntimeError(
            f"delete_delta: concurrent commit at version {version}; "
            "retry"
        ) from None
    tmp.unlink(missing_ok=True)
    return {
        "version": version,
        "removed_files": len(drop_whole) + len(rewrite),
        "rewritten_files": rewritten,
        "untouched_files": untouched,
    }


def optimize_delta(
    path: "str | Path",
    *,
    target_rows_per_file: int = 1_000_000,
    zorder_by: Optional[List[str]] = None,
) -> Dict[str, int]:
    """OPTIMIZE (small-file compaction): rewrite active files holding
    fewer than ``target_rows_per_file`` rows into ~target-sized files,
    published as ONE commit whose remove/add actions carry
    ``dataChange: false`` (no logical change — streaming consumers of
    the log may skip it, per the protocol). Files already at or above
    the target are untouched; tables needing no work commit nothing.

    ``zorder_by=[cols]`` is OPTIMIZE ZORDER: ALL active files are
    rewritten with rows reordered along the z-curve of the named
    columns (:func:`..pipelines.layout.zorder_sort` — interleaved-bit
    keys through Ray's distributed sort), so each output file covers a
    tight min/max range in EVERY zorder column and the footer-derived
    ``add.stats`` prune multi-column range reads
    (:func:`delta_pruned_files` / ``read_delta(stats_filter=...)``)
    file-grain tight — the Databricks OPTIMIZE ZORDER capability over
    the open protocol.

    Unpartitioned tables only (compaction across partition dirs would
    merge rows with different partitionValues).

    Returns ``{"version", "compacted_files", "new_files"}``
    (``version=-1`` when nothing to do)."""
    table = Path(path)
    active, meta = _replay(table, None)
    if _partition_schema(meta):
        raise NotImplementedError(
            "optimize_delta on a partitioned table: compact each "
            "partition via read+overwrite instead"
        )

    small: List[str] = []
    for rel in sorted(active):
        if zorder_by:
            small.append(rel)  # ZORDER re-clusters every active file
            continue
        st = active[rel].get("stats")
        if isinstance(st, str):
            try:
                st = json.loads(st)
            except json.JSONDecodeError:
                st = None
        n = (st or {}).get("numRecords")
        if n is None:  # no stats: count from the footer (metadata-only)
            n = pq.ParquetFile(
                _abs_path(table, rel)
            ).metadata.num_rows
        if n < target_rows_per_file:
            small.append(rel)
    if len(small) < (1 if zorder_by else 2):  # nothing to merge
        return {"version": -1, "compacted_files": 0, "new_files": 0}

    versions = _list_versions(table / _LOG)
    ckpt_v = _checkpoint_at(table / _LOG, None)
    version = max(
        [*versions, *([ckpt_v] if ckpt_v is not None else [])]
    ) + 1

    total_rows = sum(
        pq.ParquetFile(_abs_path(table, r)).metadata.num_rows
        for r in small
    )
    n_out = max(1, -(-total_rows // target_rows_per_file))
    src = ray.data.read_parquet(
        [_abs_path(table, r) for r in small], partitioning=None
    )
    if zorder_by:
        from ..pipelines.layout import zorder_sort

        src = zorder_sort(src, list(zorder_by))
    src = src.repartition(n_out)
    tok = uuid.uuid4().hex[:12]  # collision-free vs concurrent writers
    staging = table / f"_staging-{version:020d}-{tok}"
    src.write_parquet(str(staging), min_rows_per_file=target_rows_per_file)

    adds: List[Dict[str, Any]] = []
    seq = 0
    for f in sorted(staging.rglob("*.parquet")):
        if pq.ParquetFile(str(f)).metadata.num_rows == 0:
            continue
        dest_rel = f"part-{version:05d}-{seq:05d}-{tok}.parquet"
        size = f.stat().st_size
        stats = _file_stats(f)
        os.replace(f, table / dest_rel)
        add: Dict[str, Any] = {
            "path": quote(dest_rel, safe="/="),
            "partitionValues": {},
            "size": size,
            "modificationTime": int(time.time() * 1000),
            "dataChange": False,
        }
        if stats is not None:
            add["stats"] = stats
        adds.append({"add": add})
        seq += 1
    shutil.rmtree(staging, ignore_errors=True)

    now = int(time.time() * 1000)
    actions: List[Dict[str, Any]] = [
        {
            "remove": {
                "path": quote(rel, safe="/="),
                "deletionTimestamp": now,
                "dataChange": False,
            }
        }
        for rel in small
    ]
    actions.extend(adds)
    actions.append(
        {
            "commitInfo": {
                "timestamp": now,
                "operation": "OPTIMIZE",
                "operationParameters": {
                    "targetRowsPerFile": target_rows_per_file,
                    **(
                        {"zOrderBy": json.dumps(list(zorder_by))}
                        if zorder_by
                        else {}
                    ),
                },
            }
        }
    )
    tmp = table / _LOG / f".{version:020d}-{os.getpid()}.json.tmp"
    tmp.write_text("\n".join(json.dumps(a) for a in actions) + "\n")
    try:
        os.link(tmp, _commit_path(table, version))
    except FileExistsError:
        tmp.unlink(missing_ok=True)
        raise RuntimeError(
            f"optimize_delta: concurrent commit at version {version}; "
            "retry"
        ) from None
    tmp.unlink(missing_ok=True)
    return {
        "version": version,
        "compacted_files": len(small),
        "new_files": seq,
    }


def vacuum_delta(path: "str | Path") -> List[str]:
    """VACUUM: physically delete data files no longer referenced by
    the CURRENT table state (tombstoned by delete/overwrite/optimize).
    After a vacuum, time travel to versions that referenced the
    deleted files FAILS at read time — exactly Delta's documented
    trade (this implementation has no retention window: it vacuums
    everything unreferenced NOW; checkpoint first if you want a
    recoverable floor). ``_staging-*`` and dot-prefixed directories
    are never swept file-by-file — an in-flight writer's staged files
    live there — but a STALE staging dir (its embedded target version
    is already committed, so its writer either succeeded and renamed
    its files out, crashed, or is doomed to lose the commit race) is
    removed whole, reclaiming crash leftovers without racing in-flight
    writers. Like Delta's own VACUUM at retention 0, this still
    requires no CONCURRENT writers: a writer that has renamed files
    into the table but not yet published its commit would lose them.
    Returns the deleted paths."""
    table = Path(path)
    active, _ = _replay(table, None)
    log_dir = table / _LOG
    versions = _list_versions(log_dir)
    ckpt_v = _checkpoint_at(log_dir, None)
    newest = max(
        [*versions, *([ckpt_v] if ckpt_v is not None else [])],
        default=-1,
    )
    keep = {Path(_abs_path(table, rel)) for rel in active}
    deleted: List[str] = []
    for d in sorted(table.glob("_staging-*")):
        if not d.is_dir():
            continue
        try:
            staged_v = int(d.name.split("-")[1])
        except (IndexError, ValueError):
            continue  # unknown layout: leave it alone
        if staged_v <= newest:  # its version already committed: stale
            shutil.rmtree(d, ignore_errors=True)
            deleted.append(str(d))
    for f in sorted(table.rglob("*.parquet")):
        if _LOG in f.parts or any(
            p.startswith(".") or p.startswith("_staging-")
            for p in f.relative_to(table).parts
        ):
            continue
        if f.resolve() not in keep:
            f.unlink()
            deleted.append(str(f))
    return deleted


def _scan_txns(
    table: Path, version: Optional[int] = None
) -> Dict[str, int]:
    """Latest ``txn`` application version per appId up to ``version``
    (the protocol's idempotent-writer handshake): checkpoint ``txn``
    rows seed, later JSON commits override."""
    log_dir = table / _LOG
    if not log_dir.is_dir():
        raise FileNotFoundError(f"not a Delta table (no {_LOG}): {table}")
    versions = _list_versions(log_dir)
    if version is not None:
        versions = [v for v in versions if v <= version]
    txns: Dict[str, int] = {}
    start = 0
    ckpt = _checkpoint_at(log_dir, version)
    if ckpt is not None:
        f = log_dir / f"{ckpt:020d}.checkpoint.parquet"
        if "txn" in pq.ParquetFile(str(f)).schema_arrow.names:
            for row in pq.read_table(str(f), columns=["txn"]).to_pylist():
                t = row.get("txn")
                if t and t.get("appId") is not None:
                    txns[t["appId"]] = int(t["version"])
        start = ckpt + 1
    for v in versions:
        if v < start:
            continue
        for line in _commit_path(table, v).read_text().splitlines():
            if '"txn"' not in line:
                continue
            action = json.loads(line)
            t = action.get("txn")
            if t and t.get("appId") is not None:
                txns[t["appId"]] = int(t["version"])
    return txns


def delta_txn_version(
    path: "str | Path", app_id: str
) -> Optional[int]:
    """The last ``txn`` version an idempotent writer (``app_id``)
    recorded in this table's log, or None — the exactly-once
    handshake: a restarted streaming writer skips any batch whose
    version is already ≤ the recorded one."""
    return _scan_txns(Path(path)).get(app_id)


def merge_delta(
    path: "str | Path",
    changes: Any,
    key_col: str,
    *,
    txn: Optional[Tuple[str, int]] = None,
    max_broadcast_keys: int = 5_000_000,
) -> Dict[str, int]:
    """MERGE (upsert) ``changes`` into the table on ``key_col``: rows
    whose key exists are replaced, new keys are inserted, as ONE
    atomic commit. Stats-targeted like :func:`delete_delta` — only
    files whose ``[min, max]`` key range overlaps the changes' key
    range are read and rewritten (their matching keys dropped);
    disjoint files are untouched; the changes land as new files.

    Two tiers for the rewrite filter, switched on
    ``max_broadcast_keys`` (distinct change keys):

    * **CDC tier** (the common shape): per-batch ``pc.unique``
      partials stream to the driver, merge, and the sorted key array
      broadcasts once (``ray.put``) for a searchsorted drop filter.
      Driver memory is bounded — the collect ABANDONS as soon as the
      partial-unique total crosses the bound.
    * **Backfill tier** (past the bound): the distinct key set stays a
      ``Dataset`` (one shuffle of the 16 B key column) and the rewrite
      filter becomes a bucketed hash ANTI-join — no driver
      materialization at any change-set size. ``changes`` is consumed
      more than once in this tier (count + distinct + write); pass a
      cheap-to-recompute or materialized Dataset for huge merges.

    NULL keys in changes are refused (no match semantics; NULL TABLE
    keys always survive). Duplicate keys across the changes are
    refused (which row wins would be arbitrary). Partitioned tables
    are refused (rewrites would lose partitionValues). ``txn=``
    records the idempotent-writer action like :func:`write_delta`.

    Returns ``{"version", "rewritten_files", "untouched_files",
    "inserted_rows"}``."""
    import numpy as np
    import pyarrow.compute as pc

    table = Path(path)
    active, meta = _replay(table, None)
    if _partition_schema(meta):
        raise NotImplementedError(
            "merge_delta on a partitioned table: rewrite via "
            "read_delta + cdc + write_delta(mode='overwrite') instead"
        )

    if isinstance(changes, Dataset):
        ch = changes
    elif isinstance(changes, pa.Table):
        ch = ray.data.from_arrow(changes)
    else:
        import pandas as pd

        ch = ray.data.from_arrow(
            pa.Table.from_pandas(pd.DataFrame(changes),
                                 preserve_index=False)
        )
    ch = ch.map_batches(lambda b: b, batch_format="pyarrow")

    # schema enforcement: the changes must match the table (their rows
    # become table files)
    sch = (
        ch.schema(fetch_if_missing=True)
        if meta.get("schemaString")
        else None
    )
    if sch is not None:  # empty changes report no schema: nothing to
        # enforce (and nothing will be written)
        ch_schema = pa.schema(
            [pa.field(n, t) for n, t in zip(sch.names, sch.types)]
        )
        want = {
            (f["name"], f["type"])
            for f in json.loads(meta["schemaString"])["fields"]
        }
        have = {
            (f["name"], f["type"])
            for f in json.loads(_schema_string(ch_schema))["fields"]
        }
        if want != have:
            raise ValueError(
                f"merge_delta: changes schema {sorted(have)} does not "
                f"match table schema {sorted(want)}"
            )

    # distinct change keys: per-batch pc.unique partials -> driver
    # merge, ABANDONED (bounded memory) the moment the running
    # partial-unique total crosses max_broadcast_keys
    key_parts: List[pa.Array] = []
    part_rows = 0  # change rows seen so far (duplicate detection)
    part_keys = 0  # running sum of per-batch-unique lengths
    overflow = False
    for b in ch.iter_batches(batch_size=64 * 1024, batch_format="pyarrow"):
        col = b[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            raise ValueError("merge_delta: NULL keys in changes")
        part_rows += len(col)
        u = pc.unique(col)
        part_keys += len(u)
        key_parts.append(u)
        if part_keys > max_broadcast_keys:
            overflow = True
            break

    keys_ds = None  # backfill tier's distinct-key Dataset
    keys_ref = None  # CDC tier's broadcast sorted key array
    if not overflow:
        keys_arr = (
            pc.unique(pa.concat_arrays(key_parts))
            if key_parts
            else pa.array([], pa.int64())
        )
        n_changes = len(keys_arr)
        if n_changes != part_rows:
            raise ValueError("merge_delta: duplicate keys in changes")
        if n_changes == 0:
            return {
                "version": -1,
                "rewritten_files": 0,
                "untouched_files": len(active),
                "inserted_rows": 0,
            }
        keys = np.sort(keys_arr.to_numpy(zero_copy_only=False))
        # numpy scalars unwrap via .item(); string keys are already str
        klo = keys[0].item() if hasattr(keys[0], "item") else keys[0]
        khi = keys[-1].item() if hasattr(keys[-1], "item") else keys[-1]
        keys_ref = ray.put(keys)
    else:
        # backfill tier: the distinct key set stays distributed (ONE
        # shuffle of the key column); duplicates detected by distinct
        # count vs row count, min/max for stats targeting
        del key_parts

        def _refuse_null(b: pa.Table) -> pa.Table:
            if b[key_col].null_count:
                raise ValueError("merge_delta: NULL keys in changes")
            return b

        ch_checked = ch.map_batches(_refuse_null, batch_format="pyarrow")
        total_rows = ch_checked.count()
        keys_ds = (
            ch_checked.select_columns([key_col])
            .groupby(key_col)
            .count()
            .materialize()
        )
        n_changes = keys_ds.count()
        if n_changes != total_rows:
            raise ValueError("merge_delta: duplicate keys in changes")
        klo = keys_ds.min(key_col)
        khi = keys_ds.max(key_col)

    rewrite: List[str] = []
    untouched = 0
    for rel in sorted(active):
        st = active[rel].get("stats")
        if isinstance(st, str):
            try:
                st = json.loads(st)
            except json.JSONDecodeError:
                st = None
        mn = (st or {}).get("minValues", {}).get(key_col)
        mx = (st or {}).get("maxValues", {}).get(key_col)
        if mn is not None and mx is not None and (mn > khi or mx < klo):
            untouched += 1
        else:
            rewrite.append(rel)

    versions = _list_versions(table / _LOG)
    ckpt_v = _checkpoint_at(table / _LOG, None)
    version = max(
        [*versions, *([ckpt_v] if ckpt_v is not None else [])],
        default=-1,
    ) + 1

    def drop_matched(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        col_arr = batch[key_col]
        # NULL table keys never match a change key — mask BEFORE the
        # searchsorted (a None inside an object array would make the
        # comparison raise for string keys)
        valid = pc.is_valid(col_arr).to_numpy(zero_copy_only=False)
        col = col_arr.to_numpy(zero_copy_only=False)
        keep = np.ones(len(col), dtype=bool)
        vcol = col[valid]
        if len(vcol):
            pos = np.searchsorted(ks, vcol)
            pos[pos >= len(ks)] = 0
            hit = ks[pos] == vcol
            keep[np.flatnonzero(valid)[hit]] = False
        return batch.filter(pa.array(keep))

    src = ch  # inserted/updated rows
    if rewrite:
        reread = ray.data.read_parquet(
            [_abs_path(table, r) for r in rewrite], partitioning=None
        )
        if keys_ref is not None:  # CDC tier: broadcast searchsorted
            survivors = reread.map_batches(
                drop_matched, batch_format="pyarrow"
            )
        else:  # backfill tier: bucketed hash anti-join, no broadcast
            from ..pipelines.relational import hash_join

            out_cols = list(sch.names)  # change/table schema order
            survivors = hash_join(
                reread,
                keys_ds.select_columns([key_col]),
                left_key=key_col,
                right_key=key_col,
                left_cols=[c for c in out_cols if c != key_col],
                right_cols=[],
                how="anti",
            ).map_batches(
                lambda b, cols=out_cols: b.select(cols),
                batch_format="pyarrow",
            )
        src = survivors.union(src)

    tok = uuid.uuid4().hex[:12]  # collision-free vs concurrent writers
    staging = table / f"_staging-{version:020d}-{tok}"
    src.write_parquet(str(staging))

    adds: List[Dict[str, Any]] = []
    seq = 0
    for f in sorted(staging.rglob("*.parquet")):
        if pq.ParquetFile(str(f)).metadata.num_rows == 0:
            continue
        dest_rel = f"part-{version:05d}-{seq:05d}-{tok}.parquet"
        size = f.stat().st_size
        stats = _file_stats(f)
        os.replace(f, table / dest_rel)
        add: Dict[str, Any] = {
            "path": quote(dest_rel, safe="/="),
            "partitionValues": {},
            "size": size,
            "modificationTime": int(time.time() * 1000),
            "dataChange": True,
        }
        if stats is not None:
            add["stats"] = stats
        adds.append({"add": add})
        seq += 1
    shutil.rmtree(staging, ignore_errors=True)

    now = int(time.time() * 1000)
    actions: List[Dict[str, Any]] = [
        {
            "remove": {
                "path": quote(rel, safe="/="),
                "deletionTimestamp": now,
                "dataChange": True,
            }
        }
        for rel in rewrite
    ]
    actions.extend(adds)
    if txn is not None:
        actions.append(
            {
                "txn": {
                    "appId": str(txn[0]),
                    "version": int(txn[1]),
                    "lastUpdated": now,
                }
            }
        )
    actions.append(
        {
            "commitInfo": {
                "timestamp": now,
                "operation": "MERGE",
                "operationParameters": {"predicate": f"on {key_col}"},
            }
        }
    )
    tmp = table / _LOG / f".{version:020d}-{os.getpid()}.json.tmp"
    tmp.write_text("\n".join(json.dumps(a) for a in actions) + "\n")
    try:
        os.link(tmp, _commit_path(table, version))
    except FileExistsError:
        tmp.unlink(missing_ok=True)
        raise RuntimeError(
            f"merge_delta: concurrent commit at version {version}; retry"
        ) from None
    tmp.unlink(missing_ok=True)
    return {
        "version": version,
        "rewritten_files": len(rewrite),
        "untouched_files": untouched,
        "inserted_rows": n_changes,
    }
