"""Command-line interface with the reference CLI's contract
(``cli.py:15-79``): ``--config`` YAML, ``--sources`` YAML/JSON
table→source map, ``--table`` to restrict, ``--output`` for the JSON
report (stdout otherwise).

Run as ``python -m data_validator_ray.cli ...``. The CLI owns the Ray
session (guarded init; the library itself never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Any, Dict, Optional

from .validator import RayDataValidator

_FLAGS = {
    "--config": dict(required=True, help="YAML validation configuration"),
    "--sources": dict(help="YAML/JSON file mapping table names to data sources"),
    "--table": dict(help="validate only this table"),
    "--output": dict(help="JSON report path (stdout if omitted)"),
}


def _load_sources(path: str) -> Dict[str, Any]:
    text = Path(path).read_text(encoding="utf-8")
    if path.endswith(".json"):
        return json.loads(text)
    import yaml

    return yaml.safe_load(text)


def run_cli(
    config_path: str,
    sources_path: Optional[str] = None,
    table: Optional[str] = None,
    output_path: Optional[str] = None,
) -> Dict[str, Any]:
    """Validate and emit the report; returns the report dict."""
    validator = RayDataValidator(config_path)

    if sources_path is None:
        if table is None:
            raise ValueError("--table must be provided when no sources file is given")
        summaries = {table: validator.validate_table(table, table)}
    else:
        sources = _load_sources(sources_path)
        if table is not None:
            if table not in sources:
                raise ValueError(f"Table '{table}' not found in sources file")
            summaries = {table: validator.validate_table(sources[table], table)}
        else:
            summaries = validator.validate_all_tables(sources)

    report = validator.get_validation_report(summaries)
    rendered = json.dumps(report, indent=2)
    if output_path is None:
        print(rendered)
    else:
        target = Path(output_path)
        target.parent.mkdir(parents=True, exist_ok=True)
        target.write_text(rendered)
    return report


def main(argv: "Optional[list[str]]" = None) -> None:
    parser = argparse.ArgumentParser(
        description="Run data validation using a YAML configuration file"
    )
    for flag, kw in _FLAGS.items():
        parser.add_argument(flag, **kw)
    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        run_cli(args.config, args.sources, args.table, args.output)
    finally:
        ray.shutdown()


if __name__ == "__main__":  # pragma: no cover — entry point
    main()
