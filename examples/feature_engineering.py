"""Feature-engineering composition over the ML-prep tier:

deterministic uniform sample → z-score standardization → quantile
binning → daily calendar spine with gap fill → per-user moving-window
aggregates → tie-aware global RANK/DENSE_RANK over a banded value →
snapshot diff between two derived dataset versions.

Every stage streams; broadcast constants (means, quantile edges) ship
once via closure/`ray.put`, never per batch.

python examples/feature_engineering.py /root/testdata/sf0.001
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import pyarrow.compute as pc
import ray
import ray.data

from data_validator_ray.pipelines.curation import sample_n
from data_validator_ray.pipelines.profile import (
    quantile_bucketize,
    standardize_column,
)
from data_validator_ray.pipelines.relational import (
    moving_window,
    snapshot_diff,
    spine_fill,
)


def main(sf_dir: str) -> None:
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    events = f"{sf_dir}/events.parquet"

    sample = sample_n(events, "event_id", 100,
                      columns=["event_id", "user_id", "value"])
    print(f"deterministic 100-row sample: {len(sample)} rows "
          f"(first id {sample['event_id'].min()})")

    z = standardize_column(events, "value", out_col="z")
    zdf = z.to_pandas()
    print(f"z-scores: mean≈{zdf['z'].mean():.4f} std≈{zdf['z'].std():.4f}")

    binned = quantile_bucketize(events, "value", n_bins=4).to_pandas()
    print("quartile bin counts:")
    print(binned["bin"].value_counts().sort_index().to_string())

    spine = spine_fill(events, "ts", "value",
                       key_cols=["event_type"], unit="day")
    gaps = int((spine["n_events"] == 0).sum())
    print(f"daily spine: {len(spine)} cells, {gaps} gap cells filled")

    moving = moving_window(events, "user_id", ["ts", "event_id"],
                           "value", preceding=3)
    print(f"moving-window rows: {moving.count()}")

    # two snapshot versions derived from one table: v1 = ids < 800,
    # v2 = ids >= 200 with every 5th value bumped
    def version(lo, hi, bump):
        ds = ray.data.read_parquet(events, columns=["event_id", "value"])

        def fn(b):
            import numpy as np
            import pyarrow as pa

            keep = pa.array(np.ones(b.num_rows, bool))
            if lo is not None:
                keep = pc.and_(keep, pc.greater_equal(b["event_id"], lo))
            if hi is not None:
                keep = pc.and_(keep, pc.less(b["event_id"], hi))
            b = b.filter(keep)
            if bump:
                mod5 = pc.equal(
                    pc.subtract(
                        b["event_id"],
                        pc.multiply(pc.divide(b["event_id"], 5), 5),
                    ),
                    0,
                )
                v = pc.if_else(mod5, pc.add(b["value"], 1.0), b["value"])
                b = b.set_column(
                    b.schema.get_field_index("value"), "value", v
                )
            return b

        return ds.map_batches(fn, batch_format="pyarrow")

    diff = snapshot_diff(
        version(None, 800, False), version(200, None, True),
        ["event_id"], ["value"],
    ).to_pandas()
    print("snapshot diff:")
    print(diff["change"].value_counts().to_string())


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
