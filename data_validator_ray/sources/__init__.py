"""Extra source formats beyond the Parquet/CSV/JSON trio the
validator resolves natively (validator.py ``_resolve_source``;
reference scope: spark/duckdb/polars engine readers,
/root/reference/src/data_validator/duckdb_engine.py:49-66):

* :func:`read_orc` — ORC files through a ``FileBasedDatasource``
  subclass decoding with ``pyarrow.orc``: stripes of each file stream
  out as Arrow batches (one task per file — the standard file-shard
  parallelism; at scale, many files = many tasks).
* :func:`read_text_logs` — raw text/log files: ``ray.data.read_text``
  line-shards the input, then ONE vectorized ``pc.extract_regex``
  pass per batch parses a named-group pattern into typed columns
  (unparseable lines either drop or land NULL-filled, explicitly).

Both return plain ``ray.data.Dataset``s so every downstream operator
(rules, filters, dedup, profiling) works unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Union

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.datasource import FileBasedDatasource

Dataset = ray.data.Dataset


class ORCDatasource(FileBasedDatasource):
    """ORC reader: each file's stripes stream out as record batches
    (never the whole file as one block), with optional column
    pruning pushed into the ORC stripe reader."""

    _FILE_EXTENSIONS = ["orc"]

    def __init__(
        self,
        paths: Union[str, List[str]],
        *,
        columns: Optional[List[str]] = None,
        **kwargs: Any,
    ):
        super().__init__(paths, **kwargs)
        self._columns = columns

    def _open_input_source(
        self, filesystem, path: str, **open_args: Any
    ) -> "pa.NativeFile":
        # ORC needs random access (footer + stripe index), not the
        # default sequential stream
        return filesystem.open_input_file(path)

    def _read_stream(self, f: "pa.NativeFile", path: str) -> Iterator:
        from pyarrow import orc

        reader = orc.ORCFile(f)
        for i in range(reader.nstripes):
            stripe = reader.read_stripe(i, columns=self._columns)
            if isinstance(stripe, pa.RecordBatch):
                stripe = pa.Table.from_batches([stripe])
            yield stripe


def read_orc(
    paths: Union[str, List[str]],
    *,
    columns: Optional[List[str]] = None,
    **kwargs: Any,
) -> Dataset:
    """Read ORC file(s) into a Dataset; ``columns`` prunes at the
    stripe read (the read-level pruning contract every other source
    honors)."""
    return ray.data.read_datasource(
        ORCDatasource(paths, columns=columns, **kwargs)
    )


def write_orc(ds: Dataset, path: str, *, batch_size: int = 128 * 1024) -> str:
    """Write a Dataset to ONE ORC file at ``path`` (driver-streamed
    via ``iter_batches`` — ORC has no multi-writer story in pyarrow;
    for resumable multi-file output use Parquet). Returns ``path``."""
    from pyarrow import orc

    writer = None
    try:
        for batch in ds.iter_batches(
            batch_size=batch_size, batch_format="pyarrow"
        ):
            tbl = pa.table(batch) if not isinstance(batch, pa.Table) else batch
            if writer is None:
                writer = orc.ORCWriter(path)
            writer.write(tbl)
    finally:
        if writer is not None:
            writer.close()
    return path


class ArrowIPCDatasource(FileBasedDatasource):
    """Arrow IPC (Feather v2 / ``.arrow``) reader: each file's record
    batches stream out individually (never the whole file as one
    block), with column pruning pushed into the IPC reader — IPC
    stores columns contiguously per batch, so unrequested columns are
    never deserialized."""

    _FILE_EXTENSIONS = ["arrow", "feather", "ipc"]

    def __init__(
        self,
        paths: Union[str, List[str]],
        *,
        columns: Optional[List[str]] = None,
        **kwargs: Any,
    ):
        super().__init__(paths, **kwargs)
        self._columns = columns

    def _open_input_source(
        self, filesystem, path: str, **open_args: Any
    ) -> "pa.NativeFile":
        # the IPC file format needs random access (footer)
        return filesystem.open_input_file(path)

    def _read_stream(self, f: "pa.NativeFile", path: str) -> Iterator:
        import pyarrow.ipc as ipc

        reader = ipc.open_file(f)
        if reader.num_record_batches == 0:
            # zero-row file: still surface the (possibly pruned)
            # schema as a typed empty table so ds.schema() works
            t = reader.schema.empty_table()
            if self._columns is not None:
                t = t.select(self._columns)
            yield t
            return
        for i in range(reader.num_record_batches):
            b = reader.get_batch(i)
            t = pa.Table.from_batches([b])
            if self._columns is not None:
                t = t.select(self._columns)
            yield t


def read_arrow_ipc(
    paths: Union[str, List[str]],
    *,
    columns: Optional[List[str]] = None,
    **kwargs: Any,
) -> Dataset:
    """Read Arrow IPC / Feather v2 file(s) into a Dataset; ``columns``
    prunes per record batch (the read-level pruning contract)."""
    return ray.data.read_datasource(
        ArrowIPCDatasource(paths, columns=columns, **kwargs)
    )


def write_arrow_ipc(
    ds: Dataset, path: str, *, batch_size: int = 128 * 1024
) -> str:
    """Write a Dataset to ONE Arrow IPC file at ``path``
    (driver-streamed ``iter_batches`` → ``ipc.new_file`` writer; for
    resumable multi-file output use Parquet). Returns ``path``."""
    import pyarrow.ipc as ipc

    writer = None
    try:
        for batch in ds.iter_batches(
            batch_size=batch_size, batch_format="pyarrow"
        ):
            tbl = pa.table(batch) if not isinstance(batch, pa.Table) else batch
            if writer is None:
                writer = ipc.new_file(path, tbl.schema)
            for b in tbl.to_batches():
                writer.write_batch(b)
        if writer is None:
            # empty dataset: still emit a valid zero-row IPC file with
            # the dataset's schema so downstream reads succeed
            schema = ds.schema()
            arrow_schema = (
                schema.base_schema
                if hasattr(schema, "base_schema")
                else schema
            )
            writer = ipc.new_file(path, arrow_schema)
    finally:
        if writer is not None:
            writer.close()
    return path


def read_text_logs(
    paths: Union[str, List[str]],
    pattern: str,
    *,
    dtypes: Optional[Dict[str, "pa.DataType"]] = None,
    drop_unparsed: bool = True,
    batch_size: int = 64 * 1024,
) -> Dataset:
    """Parse raw text/log lines into typed columns with ONE vectorized
    ``pc.extract_regex`` pass per batch. ``pattern`` must use named
    groups (``(?P<name>...)``); ``dtypes`` maps group names to Arrow
    types (unlisted groups stay string; a failed cast is an error —
    quarantine upstream). Lines that don't match the pattern drop when
    ``drop_unparsed`` (default), else emit all-NULL rows so a
    completeness rule can count them."""
    import re

    names = list(re.compile(pattern).groupindex)
    if not names:
        raise ValueError("pattern needs at least one (?P<name>...) group")
    dtypes = dtypes or {}

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch["text"]
        ex = pc.extract_regex(lines, pattern)  # struct or null per line
        ok = pc.is_valid(ex)
        if drop_unparsed:
            ex = ex.filter(ok)
        cols = {}
        for nm in names:
            col = pc.struct_field(ex, nm)
            t = dtypes.get(nm)
            if t is not None:
                if pa.types.is_timestamp(t):
                    col = pc.strptime(col, format="%Y-%m-%dT%H:%M:%S",
                                      unit="us")
                else:
                    col = pc.cast(col, t)
            cols[nm] = col
        return pa.table(cols)

    return ray.data.read_text(paths).map_batches(
        parse, batch_format="pyarrow", batch_size=batch_size
    )


def read_parquet_union_by_name(
    paths: "List[str]",
    *,
    columns: Optional[List[str]] = None,
    strict: bool = False,
) -> Dataset:
    """Schema-evolution reader: Parquet files/directories whose schemas
    drifted over time (columns added, dropped, or widened) stream out
    under ONE unified-by-name schema — DuckDB
    ``read_parquet(..., union_by_name=true)`` semantics (an evolving
    event-log directory is the normal case at crawl scale; a reader
    that demands identical schemas forces a full rewrite per schema
    change).

    Scale shape: unification is METADATA-ONLY — each source's schema
    comes from Parquet footers via ``pyarrow.dataset`` (no data read),
    merged with ``pa.unify_schemas(promote_options="permissive")``
    (int32→int64, int→float widening, null-type upgrades). Each source
    then reads with its OWN pruned column list (only the requested
    columns it actually has) and one vectorized ``map_batches`` pass
    appends typed-NULL columns / casts / reorders before the plain
    (zero-shuffle) ``Dataset.union``.

    ``strict=True`` refuses promotion: any same-name type mismatch
    raises instead (the validation-first mode). Returns a Dataset with
    deterministic column order: first-seen order across ``paths``.
    """
    import pyarrow.dataset as pads

    schemas = [pads.dataset(str(p)).schema for p in paths]
    if strict:
        seen: Dict[str, pa.DataType] = {}
        for s in schemas:
            for f in s:
                if f.name in seen and seen[f.name] != f.type:
                    raise ValueError(
                        f"strict union_by_name: column '{f.name}' is "
                        f"{seen[f.name]} in one source and {f.type} in another"
                    )
                seen.setdefault(f.name, f.type)
    unified = pa.unify_schemas(schemas, promote_options="permissive")
    if columns is not None:
        unified = pa.schema([unified.field(c) for c in columns])

    parts: List[Dataset] = []
    for p, s in zip(paths, schemas):
        have = [f.name for f in unified if f.name in s.names]

        def align(batch: pa.Table, _unified=unified) -> pa.Table:
            n = batch.num_rows
            cols = []
            for f in _unified:
                if f.name in batch.column_names:
                    cols.append(pc.cast(batch[f.name], f.type))
                else:
                    cols.append(pa.nulls(n, f.type))
            return pa.table(dict(zip([f.name for f in _unified], cols)))

        # a source contributing no requested column still contributes
        # rows — read its narrowest column just for the row count
        read_cols = have if have else [s.names[0]]
        ds = ray.data.read_parquet(str(p), columns=read_cols)
        parts.append(ds.map_batches(align, batch_format="pyarrow"))

    out = parts[0]
    for ds in parts[1:]:
        out = out.union(ds)
    return out


# --------------------------------------------------------------------------- #
# WARC-like web-archive records                                               #
# --------------------------------------------------------------------------- #


def parse_warc_like(data: bytes) -> pa.Table:
    """Parse one WARC-style file (concatenated records: a
    ``WARC/1.0`` header block, ``\\r\\n\\r\\n``, ``Content-Length``
    payload bytes, ``\\r\\n\\r\\n``) into an Arrow table ``(url,
    warc_ts, record_type, payload)``. The pure kernel behind
    :func:`read_warc_like` — header scanning is per RECORD (KB–MB
    payloads), not per row of anything, so the Python loop is off the
    hot path; payloads are zero-copy slices. Malformed records fail
    LOUDLY (missing header terminator / magic / truncated payload) —
    a crawl reader that silently resyncs hides corruption."""
    urls: List[Optional[str]] = []
    dates: List[Optional[str]] = []
    types: List[Optional[str]] = []
    payloads: List[bytes] = []
    off, n = 0, len(data)
    while off < n:
        while data.startswith(b"\r\n", off):
            off += 2
        if off >= n:
            break
        end_hdr = data.find(b"\r\n\r\n", off)
        if end_hdr < 0:
            raise ValueError(
                f"WARC record at byte {off}: no header terminator"
            )
        lines = data[off:end_hdr].decode("utf-8").split("\r\n")
        if lines[0].strip() != "WARC/1.0":
            raise ValueError(
                f"WARC record at byte {off}: bad magic {lines[0]!r}"
            )
        hd: Dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hd[k.strip().lower()] = v.strip()
        if "content-length" not in hd:
            raise ValueError(f"WARC record at byte {off}: no Content-Length")
        clen = int(hd["content-length"])
        start = end_hdr + 4
        payload = data[start : start + clen]
        if len(payload) != clen:
            raise ValueError(
                f"WARC record at byte {off}: payload truncated "
                f"({len(payload)} of {clen} bytes)"
            )
        urls.append(hd.get("warc-target-uri"))
        dates.append(hd.get("warc-date"))
        types.append(hd.get("warc-type"))
        payloads.append(payload)
        off = start + clen
    ts = pc.strptime(
        pa.array(dates, pa.string()), format="%Y-%m-%dT%H:%M:%SZ", unit="us"
    )
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": ts,
            "record_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class WARCLikeDatasource(FileBasedDatasource):
    """WARC-style reader: ONE file = one parallel unit (the WARC
    convention — CC shards are ~1 GB files; block-level splitting
    can't cut a record mid-payload safely), records stream out as one
    table per file. Cite: reference has no crawl-archive source at
    all (SURVEY §2.1); this is the net-new ingestion edge of the CC
    pipeline."""

    _FILE_EXTENSIONS = ["warc"]

    def _read_stream(self, f: "pa.NativeFile", path: str) -> Iterator:
        yield parse_warc_like(f.readall())


def read_warc_like(
    paths: Union[str, List[str]], **kwargs: Any
) -> Dataset:
    """Read WARC-style file(s) → Dataset of ``(url, warc_ts,
    record_type, payload:binary)``."""
    return ray.data.read_datasource(WARCLikeDatasource(paths, **kwargs))


def write_warc_like(
    ds: Dataset,
    out_dir: str,
    *,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "payload",
    record_type: str = "response",
    batch_size: int = 4096,
) -> str:
    """Write a Dataset as WARC-style files under ``out_dir`` — one
    file per batch, written IN the map tasks (distributed, resumable
    by re-running missing parts), named by the content hash of the
    batch's urls so reruns are idempotent. Record assembly is
    vectorized (`binary_join_element_wise` over cast columns); the
    only per-record Python is the final ``b"".join``. Returns
    ``out_dir``."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64())})
        url = pc.cast(
            pc.fill_null(batch[url_col].combine_chunks(), ""), pa.string()
        )
        # Arrow's %S prints fractional seconds; cast to second
        # precision first (WARC-Date is whole-second ISO-8601)
        ts = pc.strftime(
            pc.cast(batch[ts_col], pa.timestamp("s"), safe=False),
            format="%Y-%m-%dT%H:%M:%SZ",
        )
        ts = pc.fill_null(ts, "1970-01-01T00:00:00Z")
        pay = pc.cast(
            pc.fill_null(batch[payload_col].combine_chunks(), b""),
            pa.binary(),
        )
        clen = pc.cast(
            pc.binary_length(pay), pa.string()
        )
        rec = pc.binary_join_element_wise(
            pc.cast(
                pc.binary_join_element_wise(
                    "WARC/1.0\r\nWARC-Type: " + record_type,
                    "\r\nWARC-Target-URI: ", ""),
                pa.string(),
            ),
            url,
            pc.binary_join_element_wise(
                "\r\nWARC-Date: ", ts, "\r\nContent-Length: ", clen,
                "\r\n\r\n", ""
            ),
            "",
        )
        rec = pc.binary_join_element_wise(
            pc.cast(rec, pa.binary()), pay, b"\r\n\r\n", b""
        )
        blob = b"".join(rec.to_pylist())
        tag = hashlib.md5(
            b"\x00".join(u.encode() for u in url.to_pylist())
        ).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{tag}.warc")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic: reruns never expose torn files
        return pa.table(
            {
                "path": pa.array([path], pa.string()),
                "n_records": pa.array([batch.num_rows], pa.int64()),
            }
        )

    manifest = ds.map_batches(
        write_batch, batch_format="pyarrow", batch_size=batch_size
    )
    if manifest.materialize().count() == 0:
        # empty dataset: still emit a valid zero-record file so the
        # read side sees an empty-but-well-formed archive (the same
        # convention as write_arrow_ipc on empty input)
        with open(os.path.join(out_dir, "part-empty.warc"), "wb"):
            pass
    return out_dir


# Delta Lake source/sink (open delta.io transaction protocol; S7 parity)
from .delta import (  # noqa: E402,F401
    delete_delta,
    delta_active_files,
    delta_pruned_files,
    delta_txn_version,
    merge_delta,
    optimize_delta,
    read_delta,
    vacuum_delta,
    write_delta,
    write_delta_checkpoint,
)
