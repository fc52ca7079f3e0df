"""CLI + job-runner e2e (subprocess, like the reference's test_cli)."""

import json
import subprocess
import sys

import pandas as pd
import pytest
import yaml


@pytest.fixture()
def cli_fixture(tmp_path):
    csv = tmp_path / "customers.csv"
    pd.DataFrame(
        {
            "id": [1, None, 3],
            "name": ["Alice", "Bob", None],
            "email": ["a@x.com", "b@x.com", "c@x.com"],
        }
    ).to_csv(csv, index=False)

    config = {
        "engine": {"type": "ray"},
        "tables": [
            {
                "name": "customers",
                "rules": [
                    {"name": "id_complete", "rule_type": "completeness",
                     "column": "id", "threshold": 0.5},
                    {"name": "email_pattern", "rule_type": "pattern",
                     "column": "email",
                     "parameters": {"pattern": "^[^@]+@[^@]+$"}},
                ],
            }
        ],
    }
    cfg = tmp_path / "config.yaml"
    cfg.write_text(yaml.dump(config))
    sources = tmp_path / "sources.yaml"
    sources.write_text(yaml.dump({"customers": str(csv)}))
    return cfg, sources, tmp_path


def test_cli_end_to_end(cli_fixture):
    cfg, sources, tmp = cli_fixture
    out = tmp / "report.json"
    proc = subprocess.run(
        [sys.executable, "-m", "data_validator_ray.cli",
         "--config", str(cfg), "--sources", str(sources),
         "--output", str(out)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(out.read_text())
    assert report["engine_type"] == "ray"
    tr = report["table_results"]["customers"]
    assert tr["total_rules"] == 2
    rules = {r["name"]: r for r in tr["rules"]}
    assert rules["id_complete"]["passed"]  # 2/3 ≥ 0.5
    assert rules["email_pattern"]["passed"]


def test_job_runner(cli_fixture):
    cfg, sources, tmp = cli_fixture
    out = tmp / "job_report.json"
    proc = subprocess.run(
        [sys.executable, "-m", "data_validator_ray.job",
         "--config", str(cfg), "--sources", str(sources),
         "--output", str(out)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(out.read_text())
    assert report["overall_stats"]["total_rules"] == 2
