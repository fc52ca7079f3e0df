"""Lakehouse ingestion loop over the open Delta protocol — every stage
is a single atomic commit on ONE Delta table:

micro-batches of events arrive → each batch is validated (range +
completeness rules) and its CLEAN rows append to the Delta table with
the exactly-once ``txn`` handshake (a crash between the Delta commit
and the loop checkpoint never double-appends) → a CDC correction batch
MERGEs on the key (stats-targeted: only overlapping files rewrite) →
a compliance DELETE removes a value range (files proved all-matching
tombstone unread) → OPTIMIZE compacts the accumulated small files
(dataChange: false) → a checkpoint snapshots the log → VACUUM reclaims
the tombstoned bytes. Time travel works at every step until vacuum.

python examples/delta_lakehouse_loop.py /root/testdata/sf0.001 /tmp/lake
"""

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow as pa  # noqa: E402

import ray  # noqa: E402
import ray.data  # noqa: E402

from data_validator_ray.pipelines.streaming import (  # noqa: E402
    validate_microbatches,
)
from data_validator_ray.sources import (  # noqa: E402
    delta_active_files,
    merge_delta,
    delete_delta,
    optimize_delta,
    read_delta,
    vacuum_delta,
    write_delta_checkpoint,
)
from data_validator_ray.validator import RayDataValidator  # noqa: E402

CFG = {
    "version": "1.0",
    "engine": {"type": "ray"},
    "tables": [
        {
            "name": "events",
            "rules": [
                {
                    "name": "value_range",
                    "rule_type": "range",
                    "column": "value",
                    "parameters": {"min_value": 0, "max_value": 1000},
                },
                {
                    "name": "id_complete",
                    "rule_type": "completeness",
                    "column": "event_id",
                },
            ],
        }
    ],
}


def main(sf_dir: str, out: str) -> None:
    out_p = Path(out)
    if out_p.exists():
        shutil.rmtree(out_p)

    full = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )
    hi = int(full.max("event_id")) + 1

    def id_slice(b: int, n: int = 4):
        def f(t: pa.Table) -> pa.Table:
            ids = t["event_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids * n) // hi == b))

        return f

    batches = [
        full.map_batches(id_slice(b), batch_format="pyarrow")
        for b in range(4)
    ]

    # 1) streaming ingestion: validate each micro-batch, append clean
    #    rows exactly-once (txn handshake)
    summaries = validate_microbatches(
        RayDataValidator(CFG), "events", batches, out_p,
        sink_format="delta",
    )
    table = str(out_p / "events_validated_delta")
    print("ingested:", summaries.to_dict("records"))

    # 2) CDC correction: bump the first 100 ids' values by 1000
    import pyarrow.compute as pc

    def bump_first_100(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        kept = t.filter(pa.array(ids < 100))
        return kept.set_column(
            kept.column_names.index("value"),
            "value",
            pc.add(kept["value"], 1000.0),
        )

    changes = full.map_batches(bump_first_100, batch_format="pyarrow")
    res = merge_delta(table, changes, "event_id", txn=("cdc", 1))
    print("merge:", res)

    # 3) compliance delete
    print("delete:", delete_delta(table, "value", 400.0, 500.0))

    # 4) maintenance: compact, checkpoint, vacuum
    print("optimize:", optimize_delta(table, target_rows_per_file=1 << 20))
    print("checkpoint at version", write_delta_checkpoint(table))
    print("vacuumed", len(vacuum_delta(table)), "files")

    final = read_delta(table)
    print(
        "final rows:", final.count(),
        "active files:", len(delta_active_files(table)),
    )


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dest = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="graft_lake_"
    )
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        main(sf, dest)
    finally:
        ray.shutdown()
