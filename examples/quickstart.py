"""Quickstart: validate a parquet table with the Ray Data engine.

python examples/quickstart.py /path/to/table.parquet
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import ray

from data_validator_ray import RayDataValidator, ValidationConfig, ValidationRule


def main(path: str) -> None:
    ray.init(address="local", include_dashboard=False, ignore_reinit_error=True)
    try:
        rules = [
            ValidationRule(name="no_null_first_col", rule_type="completeness",
                           column="doc_id"),
            ValidationRule(name="ids_unique", rule_type="uniqueness",
                           column="doc_id", parameters={"approx": True}),
        ]
        cfg = ValidationConfig(
            engine={"type": "ray"},
            tables=[{"name": "t", "rules": [r.model_dump() for r in rules]}],
        )
        v = RayDataValidator(cfg)
        summary = v.validate_table(path, "t")
        for r in summary.results:
            print(f"{r.rule_name:24s} passed={r.passed} "
                  f"{r.failed_count}/{r.total_count}")
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/documents.parquet")
