"""Partition-granular resumable validation runner.

The reference resumes at whole-table granularity (``state.py`` JSON;
SURVEY.md §4.1). The north rule demands finer: per-partition pass/fail
verdicts, violation rows, lineage records and metrics checkpointed to
Parquet so a killed run resumes skipping completed partitions.

Design (SURVEY.md §4.3):

* **partition = input Parquet file** (stable: files sorted by name,
  partition_id = rank). At 100 TB each file is a WARC-segment-sized
  shard; the layout is exactly "one output directory per input shard".
* partitions are processed in **chunks** of K partitions per streaming
  execution; after each chunk the completed partitions' metric/lineage
  rows are committed atomically (temp file + rename) via
  :class:`PartitionManifest`. Kill the run at any point: finished
  partitions are never re-validated.
* the per-chunk pass is the same fused vectorized kernel the validator
  uses, with partials keyed by partition — per-partition verdicts via a
  grouped combine (tiny: rules × partitions rows), NOT a second scan.
* per-row violation rows are written per-partition under
  ``{checkpoint_dir}/violations/part={pid}/`` in the same pass.
* uniqueness inside the runner is **within-partition** (HLL partial per
  partition). Cross-partition uniqueness is a global shuffle by nature
  and runs as the validator's dedicated stage; per-partition verdicts
  for it would be ill-defined.
"""

from __future__ import annotations

import hashlib
import json
import pickle
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..config import ValidationConfig, ValidationRule
from ..results import make_result, summarize
from ..state import PartitionManifest
from ..stages.registry import CheckKernel, kernel_for
from ..stages import kernels as _k  # noqa: F401 — register built-ins


def _ruleset_hash(rules: Sequence[ValidationRule]) -> str:
    doc = json.dumps([r.model_dump() for r in rules], sort_keys=True, default=str)
    return hashlib.sha256(doc.encode()).hexdigest()[:16]


class _PartitionedPartials:
    """Fused kernel emitting (partition_id, rule_idx, total, failed,
    payload) rows; optionally writes violation rows per partition."""

    def __init__(
        self,
        indexed_kernels: List[Tuple[int, CheckKernel]],
        path_to_pid: Dict[str, int],
        rule_names: List[str],
        violations_dir: Optional[str],
    ):
        self.indexed_kernels = indexed_kernels
        self.path_to_pid = path_to_pid
        self.rule_names = rule_names
        self.violations_dir = violations_dir

    def _process_one(self, pid: int, batch: pa.Table) -> List[Dict[str, Any]]:
        rows = []
        bad_parts: List[pa.Table] = []
        for idx, kernel in self.indexed_kernels:
            try:
                p = kernel.partial(batch)
                rows.append(
                    {
                        "pid": pid,
                        "rule_idx": idx,
                        "total": int(p.pop("total")),
                        "failed": int(p.pop("failed")),
                        "payload": pickle.dumps(p) if p else None,
                    }
                )
                if self.violations_dir is not None:
                    mask = kernel.mask_failing(batch)
                    if mask is not None:
                        bad = batch.filter(mask)
                        if bad.num_rows:
                            bad_parts.append(
                                bad.append_column(
                                    "rule_name",
                                    pa.array(
                                        [self.rule_names[idx]] * bad.num_rows,
                                        pa.string(),
                                    ),
                                )
                            )
            except Exception as exc:  # noqa: BLE001
                rows.append(
                    {
                        "pid": pid,
                        "rule_idx": idx,
                        "total": -1,
                        "failed": -1,
                        "payload": pickle.dumps({"error": str(exc)}),
                    }
                )
        if bad_parts:
            # worker-side write through pyarrow.fs: object-store-capable
            # on a real cluster (a pathlib write would land on the
            # worker's local disk only)
            import uuid

            from ..state import resolve_filesystem

            fs, root = resolve_filesystem(self.violations_dir)
            out_dir = f"{root}/part={pid}"
            fs.create_dir(out_dir, recursive=True)
            tbl = pa.concat_tables(bad_parts)
            pq.write_table(
                tbl, f"{out_dir}/v-{uuid.uuid4().hex[:12]}.parquet", filesystem=fs
            )
        return rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        path_col = batch["path"]
        batch = batch.drop_columns(["path"])
        import pyarrow.compute as pc

        rows: List[Dict[str, Any]] = []
        paths = pc.unique(path_col.combine_chunks() if hasattr(path_col, "combine_chunks") else path_col)
        if len(paths) == 1:
            pid = self.path_to_pid[paths[0].as_py()]
            rows = self._process_one(pid, batch)
        else:
            # a coalesced batch can span files: split by path
            for p in paths:
                pid = self.path_to_pid[p.as_py()]
                sub = batch.filter(pc.equal(path_col, p))
                rows.extend(self._process_one(pid, sub))
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("pid", pa.int32()),
                    ("rule_idx", pa.int32()),
                    ("total", pa.int64()),
                    ("failed", pa.int64()),
                    ("payload", pa.binary()),
                ]
            ),
        )


class ValidationRunner:
    """Resumable per-partition validation over a Parquet directory."""

    def __init__(
        self,
        config: ValidationConfig,
        checkpoint_dir: "str | Path",
        *,
        write_violations: bool = True,
        chunk_partitions: int = 16,
        batch_size: int = 64 * 1024,
    ):
        self.config = config
        # keep the root as a string: Path would mangle scheme:// URIs
        self.checkpoint_dir = str(checkpoint_dir)
        self.manifest = PartitionManifest(self.checkpoint_dir)
        self.write_violations = write_violations
        self.chunk_partitions = chunk_partitions
        self.batch_size = batch_size

    def partitions(self, input_dir: "str | Path") -> List[Tuple[int, Path]]:
        files = sorted(Path(input_dir).glob("**/*.parquet"))
        return list(enumerate(files))

    def run(
        self,
        input_dir: "str | Path",
        table_name: str,
        max_chunks: Optional[int] = None,
    ) -> Dict[str, Any]:
        """Validate all not-yet-completed partitions; returns the
        aggregated report plus resume accounting.

        ``max_chunks`` stops after that many committed chunks — the
        deterministic stand-in for a mid-run kill (checkpoints for the
        completed chunks are durable; a fresh runner resumes past
        them)."""
        rules = [r for r in self.config.get_enabled_rules(table_name) if r.enabled]
        # uniqueness within the runner is per-partition → force the
        # mergeable HLL tier so it lives inside the fused pass
        compiled: List[Tuple[int, CheckKernel]] = []
        for i, rule in enumerate(rules):
            if rule.rule_type == "uniqueness":
                rule = rule.model_copy(deep=True)
                rule.parameters["approx"] = True
            if rule.rule_type == "schema":
                continue  # schema is table-level; checked once below
            try:
                compiled.append((i, kernel_for(rule)))
            except Exception:  # noqa: BLE001 — bad rules surfaced by validator API
                continue

        parts = self.partitions(input_dir)
        done = self.manifest.completed_partitions()
        todo = [(pid, f) for pid, f in parts if pid not in done]
        rhash = _ruleset_hash(rules)
        skipped = len(parts) - len(todo)

        viol_dir = (
            f"{self.checkpoint_dir}/violations" if self.write_violations else None
        )
        rule_names = [r.name for r in rules]

        for chunk_no, chunk_start in enumerate(
            range(0, len(todo), self.chunk_partitions)
        ):
            if max_chunks is not None and chunk_no >= max_chunks:
                break
            chunk = todo[chunk_start: chunk_start + self.chunk_partitions]
            t0 = time.time()
            path_to_pid = {str(f): pid for pid, f in chunk}
            fn = _PartitionedPartials(
                compiled, path_to_pid, rule_names, viol_dir
            )
            ds = ray.data.read_parquet(
                [str(f) for _, f in chunk], include_paths=True
            )
            partial_rows = ds.map_batches(
                fn,
                batch_format="pyarrow",
                batch_size=self.batch_size,
                zero_copy_batch=True,
            ).take_all()
            wall = time.time() - t0

            by_pid: Dict[int, List[dict]] = {}
            for row in partial_rows:
                by_pid.setdefault(row["pid"], []).append(row)
            for pid, f in chunk:
                rows = []
                for idx, kernel in compiled:
                    mine = [r for r in by_pid.get(pid, []) if r["rule_idx"] == idx]
                    partials = []
                    errored = False
                    for r in mine:
                        extras = pickle.loads(r["payload"]) if r["payload"] else {}
                        if "error" in extras:
                            errored = True
                            break
                        extras["total"] = r["total"]
                        extras["failed"] = r["failed"]
                        partials.append(extras)
                    if errored or not mine:
                        total, failed = -1, -1
                        passed = False
                        rate = 0.0
                    else:
                        combined = kernel.combine(partials)
                        total = int(combined["total"])
                        failed = int(combined["failed"])
                        rate = (total - failed) / total if total > 0 else 1.0
                        rule = rules[idx]
                        passed = (
                            rate >= rule.threshold
                            if rule.threshold is not None
                            else failed == 0
                        )
                    rows.append(
                        {
                            "partition_id": pid,
                            "table_name": table_name,
                            "rule_name": rules[idx].name,
                            "rule_type": rules[idx].rule_type,
                            "total_count": total,
                            "failed_count": failed,
                            "success_rate": rate,
                            "passed": passed,
                            "input_files": [str(f)],
                            "ruleset_hash": rhash,
                            "wall_time_s": wall / max(1, len(chunk)),
                        }
                    )
                self.manifest.write_partition(pid, rows)

        return self.aggregate(table_name, rules, skipped_partitions=skipped)

    def aggregate(
        self,
        table_name: str,
        rules: Optional[Sequence[ValidationRule]] = None,
        skipped_partitions: int = 0,
    ) -> Dict[str, Any]:
        """Roll per-partition metrics up to table-level verdicts."""
        t = self.manifest.read_all()
        df = t.to_pandas()
        results = []
        if rules is None:
            rules = []
        rules_by_name = {r.name: r for r in rules}
        for rule_name, g in df.groupby("rule_name", sort=False):
            ok = g[g["total_count"] >= 0]
            total = int(ok["total_count"].sum())
            failed = int(ok["failed_count"].sum())
            rule = rules_by_name.get(rule_name) or ValidationRule(
                name=str(rule_name), rule_type=str(g["rule_type"].iloc[0])
            )
            results.append(
                make_result(rule, total, failed, float(g["wall_time_s"].sum() * 1000))
            )
        summary = summarize(
            table_name, results, float(df["wall_time_s"].sum() * 1000)
        )
        return {
            "table_name": table_name,
            "partitions_total": int(df["partition_id"].nunique()),
            "partitions_skipped_on_resume": skipped_partitions,
            "per_partition_failed": {
                int(pid): int(g["failed_count"].clip(lower=0).sum())
                for pid, g in df.groupby("partition_id")
            },
            "summary": summary,
        }


# --------------------------------------------------------------------------- #
# resumable TRANSFORM runner (curation streams)                               #
# --------------------------------------------------------------------------- #

TRANSFORM_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("op_name", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("input_files", pa.list_(pa.string())),
        ("output_dir", pa.string()),
        ("transform_tag", pa.string()),
        ("wall_time_s", pa.float64()),
    ]
)


class TransformRunner:
    """Resumable per-partition TRANSFORM runner — the "resumable
    output" layout for curation streams (filter/redact/profile), not
    just validation verdicts.

    Each input Parquet file is one partition. A partition is processed
    as: read → ``transform(Dataset) -> Dataset`` → write Parquet under
    ``{out_dir}/part={pid}/`` → commit one manifest row (atomic temp +
    move, ``pyarrow.fs`` so the same code hits an object store on a
    real cluster). A killed run resumes by skipping partitions whose
    manifest row exists; a partition whose OUTPUT exists but whose
    manifest row does not (killed mid-write) is wiped and redone, so
    the output directory never holds duplicate rows.

    Scale notes: partitions are WARC-shard-sized at 100 TB, so the
    per-partition Dataset execution overhead (~0.2 s) is amortized;
    within a partition Ray still parallelizes across row groups /
    blocks. Partitions are independent — at cluster scale run several
    runners over disjoint partition ranges, sharing one manifest dir.
    """

    def __init__(self, checkpoint_dir: "str | Path"):
        self.checkpoint_dir = str(checkpoint_dir)
        self.manifest = PartitionManifest(
            self.checkpoint_dir, schema=TRANSFORM_SCHEMA
        )

    def partitions(self, input_dir: "str | Path") -> List[Tuple[int, Path]]:
        files = sorted(Path(input_dir).glob("**/*.parquet"))
        return list(enumerate(files))

    def run(
        self,
        input_dir: "str | Path",
        transform,
        out_dir: "str | Path",
        *,
        op_name: str = "transform",
        transform_tag: str = "",
        max_partitions: Optional[int] = None,
    ) -> Dict[str, Any]:
        """Process all not-yet-completed partitions; ``max_partitions``
        stops after that many commits (the deterministic stand-in for a
        mid-run kill)."""
        from ..state import resolve_filesystem

        parts = self.partitions(input_dir)
        done = self.manifest.completed_partitions()
        todo = [(pid, f) for pid, f in parts if pid not in done]
        skipped = len(parts) - len(todo)
        out_fs, out_root = resolve_filesystem(out_dir)

        processed = 0
        for pid, f in todo:
            if max_partitions is not None and processed >= max_partitions:
                break
            part_dir = f"{out_root}/part={pid}"
            # uncommitted leftovers from a mid-write kill → wipe first
            out_fs.delete_dir_contents(
                part_dir, missing_dir_ok=True
            )
            out_fs.create_dir(part_dir, recursive=True)
            t0 = time.time()
            rows_in = pq.read_metadata(f).num_rows
            ds = transform(ray.data.read_parquet(str(f)))
            ds = ds.materialize()
            rows_out = ds.count()
            ds.write_parquet(part_dir)
            self.manifest.write_partition(
                pid,
                [
                    {
                        "partition_id": pid,
                        "op_name": op_name,
                        "rows_in": int(rows_in),
                        "rows_out": int(rows_out),
                        "input_files": [str(f)],
                        "output_dir": part_dir,
                        "transform_tag": transform_tag,
                        "wall_time_s": time.time() - t0,
                    }
                ],
            )
            processed += 1

        t = self.manifest.read_all()
        return {
            "partitions_total": len(parts),
            "partitions_skipped": skipped,
            "partitions_processed": processed,
            "rows_in": int(pa.compute.sum(t["rows_in"]).as_py() or 0),
            "rows_out": int(pa.compute.sum(t["rows_out"]).as_py() or 0),
            "metrics": t,
        }
