"""Continuous-ingestion loop over simulated crawl snapshots:

crawl N arrives → validate (flagship rule suite) → drop every row
whose key was EVER seen (persistent 16 B/key index, no shuffle) →
append the survivors as partitioned Parquet → union-merge the new
keys into the index (atomic) → compact the accumulated small files
once they fragment, PROVING content preservation via the
order-independent table checksum.

python examples/incremental_crawl.py /root/testdata/sf0.001 /tmp/crawl_out
"""

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import pyarrow.compute as pc

import ray
import ray.data

from data_validator_ray.pipelines.integrity import table_checksum
from data_validator_ray.pipelines.layout import compact_files
from data_validator_ray.state.key_index import (
    build_key_index,
    dedup_against_index,
    update_key_index,
)


def crawl_slice(sf_dir: str, mod: int) -> ray.data.Dataset:
    """Deterministic 'crawl snapshot' N: the orders rows whose key
    hashes into band N — successive crawls share most customers, so
    incremental dedup has real work to do."""
    return ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(
        lambda b, m=mod: b.filter(
            pc.equal(pc.bit_wise_and(b["o_orderkey"], 3), m)
        ),
        batch_format="pyarrow",
    )


def main(sf_dir: str, out_dir: str) -> None:
    ray.init(address="local", include_dashboard=False, ignore_reinit_error=True)
    try:
        out = Path(out_dir)
        shutil.rmtree(out, ignore_errors=True)
        (out / "data").mkdir(parents=True)
        idx = str(out / "key_index")

        # crawl 0 bootstraps the index; later crawls dedup against it
        first = crawl_slice(sf_dir, 0)
        first.write_parquet(str(out / "data"))
        built = build_key_index(first, "o_custkey", idx)
        print(f"crawl 0: indexed {built['n_keys']} keys")

        for n in (1, 2, 3):
            fresh = dedup_against_index(
                crawl_slice(sf_dir, n), "o_custkey", idx
            )
            kept = fresh.count()
            if kept:
                fresh.write_parquet(str(out / "data"))
            upd = update_key_index(idx, crawl_slice(sf_dir, n), "o_custkey")
            print(
                f"crawl {n}: kept {kept} new-key rows; index "
                f"{upd['n_keys_before']} -> {upd['n_keys']} keys"
            )

        # maintenance: compact the accumulated per-crawl fragments and
        # PROVE nothing was lost
        before = table_checksum(
            str(out / "data"), ["o_orderkey", "o_custkey"]
        )
        res = compact_files(
            str(out / "data"), str(out / "compacted"),
            ["o_orderkey", "o_custkey"],
            target_rows_per_file=1 << 20,
        )
        assert res["checksum"] == int(before["checksum"].iloc[0])
        print(
            f"compacted {res['n_files_in']} files -> {res['n_files_out']} "
            f"({res['n_rows']} rows, checksum verified)"
        )
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/crawl_out",
    )
