"""Batch job runner — the reference's ``databricks_job.run_job``
(``databricks_job.py:13-57``) without the platform glue: load config +
sources, validate all tables, write the JSON report. Importable
(``run_job``) and runnable (``python -m data_validator_ray.job``).

This is also the entry point you would hand to ``ray job submit`` on a
real cluster: the script owns the Ray session (guarded init — under
``ray job submit`` the cluster is already initialized and the guard is
a no-op)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Optional

import yaml

from .validator import RayDataValidator


def run_job(
    config_path: str, sources_path: str, output_path: Optional[str] = None
) -> dict:
    validator = RayDataValidator(config_path)
    with open(sources_path, "r", encoding="utf-8") as f:
        sources = (
            json.load(f) if sources_path.endswith(".json") else yaml.safe_load(f)
        )
    summaries = validator.validate_all_tables(sources)
    report = validator.get_validation_report(summaries)
    if output_path:
        out = Path(output_path)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(report, indent=2))
    return report


def main(argv: "Optional[list[str]]" = None) -> None:
    parser = argparse.ArgumentParser(description="Run a validation job")
    parser.add_argument("--config", required=True)
    parser.add_argument("--sources", required=True)
    parser.add_argument("--output")
    parser.add_argument(
        "--ray-address",
        default=None,
        help=(
            "Ray cluster address (e.g. 127.0.0.1:6379 or 'auto') to "
            "attach this driver to an EXISTING cluster — the same "
            "connection path a `ray job submit` entrypoint uses. "
            "Default: RAY_ADDRESS env var, else a local session. "
            "Under `ray job submit` the session already exists and "
            "init is a no-op either way."
        ),
    )
    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        if args.ray_address:
            # attach to a running cluster: workers there import this
            # package via the job's runtime_env working_dir
            ray.init(
                address=args.ray_address,
                ignore_reinit_error=True,
                logging_level="ERROR",
                runtime_env={
                    "working_dir": str(Path(__file__).parent.parent),
                    "excludes": [".git", "tests", "examples", "*.json"],
                },
            )
        else:
            ray.init(
                address="local",
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
    try:
        report = run_job(args.config, args.sources, args.output)
        if not args.output:
            print(json.dumps(report, indent=2))
    finally:
        ray.shutdown()


if __name__ == "__main__":  # pragma: no cover — entry point
    main()
