"""Metrics repository + run-over-run anomaly checks — the deequ
``MetricsRepository`` / ``AnomalyCheck`` capability: every validation
run APPENDS its per-rule metrics to a durable history, and a check can
then ask "is this run's metric consistent with the fleet of previous
runs?" instead of against a fixed threshold. This is how silent
regressions (a new upstream dropping 2% of rows every day) surface
when each individual run still clears its static threshold.

Storage: one Parquet file PER RUN (``run-<run_id>.parquet``; read
merges the directory), columns ``(run_id, metric_key, value)``. A
per-run file makes concurrent appends from two validation runs safe
— each writes its own file atomically (tmp + rename), so neither can
lose the other's rows the way a read-concat-rewrite of one shared
file could. Re-appending the same ``run_id`` overwrites that run's
file (idempotent retry). Legacy single-file ``metrics.parquet``
histories are still read.

Check: z-score of the current value against the history's mean and
SAMPLE standard deviation; ``passed`` iff ``|z| ≤ k`` — with the two
degenerate conventions pinned: fewer than ``min_runs`` history rows
passes (not enough evidence), and a zero-variance history passes iff
the current value equals the constant (exact compare).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

HIST_NAME = "metrics.parquet"


class MetricsHistory:
    """Durable per-run metric store (runs × metrics rows)."""

    def __init__(self, history_dir: "str | Path"):
        self.dir = Path(history_dir)
        self.dir.mkdir(parents=True, exist_ok=True)

    def _run_path(self, run_id: str) -> Path:
        # sanitize: run ids become filenames
        safe = "".join(
            c if (c.isalnum() or c in "-._") else "_" for c in run_id
        )
        return self.dir / f"run-{safe}.parquet"

    def _read(self) -> pd.DataFrame:
        frames = [
            pq.read_table(p).to_pandas()
            for p in sorted(self.dir.glob("*.parquet"))
        ]
        if not frames:
            return pd.DataFrame(
                {"run_id": pd.Series(dtype=str),
                 "metric_key": pd.Series(dtype=str),
                 "value": pd.Series(dtype=np.float64)}
            )
        return pd.concat(frames, ignore_index=True)

    def append(self, run_id: str, metrics: Dict[str, float]) -> int:
        """Append one run's metrics as its OWN file (atomic tmp +
        rename; concurrent runs cannot lose each other's rows).
        Returns the number of history rows after the append."""
        new = pd.DataFrame(
            {
                "run_id": [run_id] * len(metrics),
                "metric_key": list(metrics.keys()),
                "value": np.asarray(list(metrics.values()), np.float64),
            }
        )
        path = self._run_path(run_id)
        tmp = path.with_suffix(".tmp")
        pq.write_table(pa.Table.from_pandas(new, preserve_index=False), tmp)
        tmp.replace(path)
        return len(self._read())

    def series(self, metric_key: str) -> np.ndarray:
        df = self._read()
        return df.loc[df.metric_key == metric_key, "value"].to_numpy(
            np.float64
        )


def metric_anomaly_check(
    history: "MetricsHistory | str | Path",
    metric_key: str,
    current_value: float,
    *,
    k: float = 3.0,
    min_runs: int = 2,
) -> Dict[str, Any]:
    """Run-over-run anomaly verdict for one metric. Returns
    ``{n_runs, mean, std, z, passed}`` (floats ROUND 6; ``z`` NULL for
    short or zero-variance histories)."""
    h = history if isinstance(history, MetricsHistory) else MetricsHistory(history)
    vals = h.series(metric_key)
    n = len(vals)
    if n < min_runs:
        return {
            "n_runs": n, "mean": float("nan"), "std": float("nan"),
            "z": float("nan"), "passed": True,
        }
    mean = float(vals.mean())
    std = float(vals.std(ddof=1))
    if std == 0.0:
        return {
            "n_runs": n,
            "mean": round(mean, 6),
            "std": 0.0,
            "z": float("nan"),
            "passed": bool(current_value == mean),
        }
    z = (current_value - mean) / std
    return {
        "n_runs": n,
        "mean": round(mean, 6),
        "std": round(std, 6),
        "z": round(z, 6),
        "passed": bool(abs(z) <= k),
    }
