"""End-to-end training-data curation over a documents table: validate →
near-dup dedup → text profile → write the curated stream.

python examples/training_data_pipeline.py /root/testdata/sf0.001 /tmp/curated
"""

import sys

import ray

from data_validator_ray import RayDataValidator, ValidationConfig, ValidationRule
from data_validator_ray.pipelines.dedup import near_dup_dedup
from data_validator_ray.pipelines.text import text_profile


def main(sf_dir: str, out_dir: str) -> None:
    ray.init(address="local", include_dashboard=False, ignore_reinit_error=True)
    try:
        docs = f"{sf_dir}/documents.parquet"

        # 1. validate the raw stream (one fused pass)
        rules = [
            ValidationRule(name="text_present", rule_type="completeness",
                           column="text", threshold=0.95),
            ValidationRule(name="lang_code", rule_type="pattern", column="lang",
                           parameters={"pattern": "^[a-z]{2}$"}, threshold=0.9),
            ValidationRule(name="len_band", rule_type="range", column="n_chars",
                           parameters={"min_value": 10, "max_value": 100_000},
                           threshold=0.9),
        ]
        cfg = ValidationConfig(
            engine={"type": "ray"},
            tables=[{"name": "documents",
                     "rules": [r.model_dump() for r in rules]}],
        )
        summary = RayDataValidator(cfg).validate_table(docs, "documents")
        for r in summary.results:
            print(f"  {r.rule_name:16s} passed={r.passed} "
                  f"{r.failed_count}/{r.total_count}")

        # 2. near-duplicate-aware dedup (MinHash-LSH + union-find clusters)
        surviving = near_dup_dedup(docs, threshold=0.5)

        # 3. per-doc profile (quality + language + fingerprint, one pass)
        profiled = text_profile(surviving)

        # 4. curated output (partitioned parquet — resumable layout)
        profiled.write_parquet(out_dir)
        print(f"curated profile written to {out_dir}")
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated")
