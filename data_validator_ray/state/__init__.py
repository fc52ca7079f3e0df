"""Pipeline resume state.

Two granularities:

* :class:`PipelineState` — the reference's table-level JSON map
  (``state.py:9-40``): ``{table_name: "completed"}``; a second
  ``validate_all_tables`` run skips completed tables.
* :class:`PartitionManifest` — partition-granular Parquet checkpoints
  (net-new, SURVEY.md §4.3): each completed url-hash partition writes a
  metrics/lineage row under ``{checkpoint_dir}/metrics/``; a resumed run
  lists completed partition ids and skips them at the read.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Set

import pyarrow as pa
import pyarrow.parquet as pq


@dataclass
class PipelineState:
    """Table-level resume state persisted as a flat JSON map."""

    path: Path
    state: Dict[str, str] = field(default_factory=dict)

    @classmethod
    def load(cls, path: "str | Path") -> "PipelineState":
        p = Path(path)
        if p.exists():
            with open(p, "r", encoding="utf-8") as f:
                data = json.load(f)
        else:
            data = {}
        return cls(path=p, state=data)

    def save(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "w", encoding="utf-8") as f:
            json.dump(self.state, f, indent=2)

    def is_completed(self, table_name: str) -> bool:
        return self.state.get(table_name) == "completed"

    def mark_completed(self, table_name: str) -> None:
        self.state[table_name] = "completed"
        self.save()

    def reset(self) -> None:
        self.state.clear()
        self.save()


METRICS_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("table_name", pa.string()),
        ("rule_name", pa.string()),
        ("rule_type", pa.string()),
        ("total_count", pa.int64()),
        ("failed_count", pa.int64()),
        ("success_rate", pa.float64()),
        ("passed", pa.bool_()),
        # lineage
        ("input_files", pa.list_(pa.string())),
        ("ruleset_hash", pa.string()),
        ("wall_time_s", pa.float64()),
    ]
)


def resolve_filesystem(root: "str | Path"):
    """(filesystem, path) for a local path or a ``scheme://`` URI.

    Everything the runner writes from worker tasks goes through
    ``pyarrow.fs`` so the same code works on a multi-node cluster
    against an object store (s3://, gcs://) — a plain ``pathlib.Path``
    write would only land on one worker's local disk."""
    from pyarrow import fs as pafs

    s = str(root)
    if "://" in s:
        fs, path = pafs.FileSystem.from_uri(s)
        return fs, path
    return pafs.LocalFileSystem(), str(Path(s).absolute())


class PartitionManifest:
    """Per-partition checkpoint manifest backed by one Parquet file per
    completed partition (atomic: temp file + move), so a killed run
    resumes by skipping partitions whose metric file exists. All I/O
    goes through ``pyarrow.fs`` (object-store-capable)."""

    def __init__(
        self,
        checkpoint_dir: "str | Path",
        schema: "pa.Schema | None" = None,
    ):
        self.fs, self.root = resolve_filesystem(checkpoint_dir)
        self.metrics_dir = f"{self.root}/metrics"
        self.schema = schema if schema is not None else METRICS_SCHEMA
        self.fs.create_dir(self.metrics_dir, recursive=True)

    def _metric_files(self) -> List[str]:
        from pyarrow import fs as pafs

        sel = pafs.FileSelector(self.metrics_dir, allow_not_found=True)
        out = []
        for info in self.fs.get_file_info(sel):
            name = info.base_name
            if name.startswith("part-") and name.endswith(".parquet"):
                out.append(info.path)
        return sorted(out)

    def completed_partitions(self) -> Set[int]:
        done: Set[int] = set()
        for p in self._metric_files():
            stem = p.rsplit("/", 1)[-1][: -len(".parquet")]
            try:
                done.add(int(stem.split("-")[1]))
            except (IndexError, ValueError):
                continue
        return done

    def write_partition(self, partition_id: int, rows: List[dict]) -> str:
        """Atomically persist one partition's metric/lineage rows."""
        for r in rows:
            r.setdefault("partition_id", partition_id)
        table = pa.Table.from_pylist(rows, schema=self.schema)
        final = f"{self.metrics_dir}/part-{partition_id:05d}.parquet"
        tmp = f"{final}.tmp"
        pq.write_table(table, tmp, filesystem=self.fs)
        self.fs.move(tmp, final)
        return final

    def read_all(self) -> pa.Table:
        files = self._metric_files()
        if not files:
            return self.schema.empty_table()
        return pa.concat_tables(
            [pq.read_table(f, filesystem=self.fs) for f in files]
        )

    def reset(self) -> None:
        for p in self._metric_files():
            self.fs.delete_file(p)
