"""Scaling-efficiency guard (round-2 verdict item #10): the headline
pipeline's 2→8-CPU throughput ratio must stay ≥ 0.8 of linear — the
single-box stand-in for the north rule's N→4N cluster criterion
(BASELINE.md documents why 2→8 and not 8→32: past ~16 cores one node's
memory bandwidth saturates, which added NODES do not).

Runs ``bench.py --scaling`` in a subprocess (it owns its Ray sessions)
at a REDUCED row count so the guard is minutes, not tens of minutes.
Marked ``scaling`` and excluded from the default suite (pytest.ini) —
run with ``pytest -m scaling``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.scaling
def test_headline_scaling_efficiency_reduced():
    env = dict(
        os.environ,
        # 1600 replicas = 8M rows — the standard bench input (reused
        # from its /tmp cache, no regeneration). Smaller inputs fail
        # Amdahl honestly: at 4M rows the measured legs solve to a
        # perfectly linear parallel part (W≈35 s) plus a fixed ~2 s
        # per-process serial fraction (ray.init + read planning +
        # driver combine), which alone drags 2→8 efficiency to ~0.77.
        # At 8M the same serial fraction predicts ~0.86.
        GRAFT_REPLICAS="1600",
        GRAFT_SCALING_ROUNDS="2",
        GRAFT_SCALE_LO="2",
        GRAFT_SCALE_HI="8",
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--scaling"],
        env=env, capture_output=True, text=True, check=True, cwd=str(REPO),
        timeout=1800,
    ).stdout
    r = json.loads(out.strip().splitlines()[-1])
    assert r["cpus_lo"] == 2 and r["cpus_hi"] == 8
    assert r["scaling_efficiency"] >= 0.8, r
