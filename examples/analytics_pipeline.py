"""Event-analytics composition over the relational/window family:

sessionize → per-user running windows (cum-sum / LAG) → forward-fill
gaps → weekly calendar rollup per event type → top-3 events per user
→ even/odd-half drift checks (fixed-bin PSI + exact KS) → global
rank/NTILE percentiles of event values.

Every stage streams; the only shuffles are the hash-bucket key
co-locations each window op documents.

python examples/analytics_pipeline.py /root/testdata/sf0.001
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import pyarrow.compute as pc
import ray

from data_validator_ray.pipelines.relational import (
    calendar_aggregate,
    forward_fill,
    global_rank,
    grouped_top_k,
    running_window,
    sessionize,
)
from data_validator_ray.stages.drift import ks_exact, psi_fixed_bins


def main(sf_dir: str) -> None:
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    events = f"{sf_dir}/events.parquet"

    sessions = sessionize(events, "user_id", "ts", "event_id")
    n_sessions = sessions.count()

    running = running_window(
        events, "user_id", ["ts", "event_id"], "value"
    )
    filled = forward_fill(events, "user_id", ["ts", "event_id"], "value")

    weekly = calendar_aggregate(
        events, "ts", "value", key_cols=["event_type"], unit="week"
    ).to_pandas()

    top3 = grouped_top_k(
        events, ["user_id"], "value", 3, tiebreak_cols=["event_id"]
    )

    def half(parity: int):
        return ray.data.read_parquet(
            events, columns=["event_id", "value"]
        ).map_batches(
            lambda b, p=parity: b.filter(
                pc.equal(pc.bit_wise_and(b["event_id"], 1), p)
            ),
            batch_format="pyarrow",
        )

    psi = psi_fixed_bins(
        half(0), half(1), "value", [float(x) for x in range(0, 101, 10)]
    ).to_pylist()[0]
    ks = ks_exact(half(0), half(1), "value").to_pylist()[0]

    ranked = global_rank(
        events, "value", tiebreak_cols=["event_id"], ntile=10,
        percentiles=True,
    )

    print(f"sessions:           {n_sessions}")
    print(f"running-window rows: {running.count()}")
    print(f"forward-filled rows: {filled.count()}")
    print(f"weekly rollup:\n{weekly.sort_values(['period', 'event_type']).head(8)}")
    print(f"top-3/user rows:    {top3.count()}")
    print(f"even/odd PSI:       {psi['psi_value']} (n={psi['n_base']}/{psi['n_current']})")
    print(f"even/odd KS:        {ks['ks_value']}")
    deciles = ranked.to_pandas().groupby("tile")["value"].agg(["min", "max"])
    print(f"value deciles:\n{deciles}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
