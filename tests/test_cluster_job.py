"""Real-cluster packaging proof (opt-in: `pytest -m cluster`).

`ray job submit` itself needs the dashboard HTTP agent, whose deps
(aiohttp) are not in this container — so this test exercises the SAME
packaging seam one layer down: a `ray start --head` cluster, a driver
process attaching via --ray-address (GCS address, runtime_env
working_dir shipped to the cluster — exactly what a `ray job submit`
entrypoint does after the HTTP hop), and the metrics JSON coming back
identical to local mode. On a real cluster the command is::

    ray job submit --address http://<head>:8265 \
        --working-dir . -- python -m data_validator_ray.job \
        --config config.yaml --sources sources.yaml --output report.json

Excluded from the default suite because it owns machine-global Ray
state (`ray stop` would kill any concurrent session); run it alone.
"""

import json
import socket
import subprocess
import sys

import pandas as pd
import pytest
import yaml


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.cluster
def test_job_driver_attaches_to_running_cluster(tmp_path):
    csv = tmp_path / "customers.csv"
    pd.DataFrame(
        {
            "id": [1, None, 3],
            "name": ["Alice", "Bob", None],
            "email": ["a@x.com", "b@x.com", "c@x.com"],
        }
    ).to_csv(csv, index=False)
    cfg = tmp_path / "config.yaml"
    cfg.write_text(yaml.dump({
        "engine": {"type": "ray"},
        "tables": [{
            "name": "customers",
            "rules": [
                {"name": "id_complete", "rule_type": "completeness",
                 "column": "id", "threshold": 0.5},
                {"name": "email_pattern", "rule_type": "pattern",
                 "column": "email",
                 "parameters": {"pattern": "^[^@]+@[^@]+$"}},
            ],
        }],
    }))
    sources = tmp_path / "sources.yaml"
    sources.write_text(yaml.dump({"customers": str(csv)}))

    import os

    env = {k: v for k, v in os.environ.items() if k != "RAY_ADDRESS"}
    port = _free_port()
    try:
        head = subprocess.run(
            ["ray", "start", "--head", f"--port={port}",
             "--num-cpus=4", "--include-dashboard=false"],
            capture_output=True, text=True, timeout=120, env=env,
        )
        assert head.returncode == 0, head.stderr[-2000:]

        out_cluster = tmp_path / "report_cluster.json"
        proc = subprocess.run(
            [sys.executable, "-m", "data_validator_ray.job",
             "--config", str(cfg), "--sources", str(sources),
             "--output", str(out_cluster),
             "--ray-address", f"127.0.0.1:{port}"],
            capture_output=True, text=True, timeout=300,
            cwd="/root/repo", env=env,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
    finally:
        subprocess.run(["ray", "stop", "--force"], capture_output=True,
                       timeout=120, env=env)

    out_local = tmp_path / "report_local.json"
    proc2 = subprocess.run(
        [sys.executable, "-m", "data_validator_ray.job",
         "--config", str(cfg), "--sources", str(sources),
         "--output", str(out_local)],
        capture_output=True, text=True, timeout=300,
        cwd="/root/repo", env=env,
    )
    assert proc2.returncode == 0, proc2.stderr[-2000:]

    a = json.loads(out_cluster.read_text())
    b = json.loads(out_local.read_text())
    # same metrics JSON from the cluster driver and the local driver
    # (timings are the only run-dependent fields)
    a["overall_stats"].pop("total_execution_time_ms")
    b["overall_stats"].pop("total_execution_time_ms")
    assert a["overall_stats"] == b["overall_stats"]
    for t in b["table_results"]:
        ta, tb = a["table_results"][t], b["table_results"][t]
        ta.pop("execution_time_ms"), tb.pop("execution_time_ms")
        assert ta == tb
