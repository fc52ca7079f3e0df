"""End-to-end training-data curation over a documents table:

validate → quality/PII gate (fused rule pass) → near-dup dedup →
decontaminate vs a benchmark set → domain-mixture downsample →
text profile → token-budget shard packing → write the curated stream.

python examples/training_data_pipeline.py /root/testdata/sf0.001 /tmp/curated
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import ray

from data_validator_ray import RayDataValidator, ValidationConfig, ValidationRule
from data_validator_ray.pipelines.curation import (
    assign_splits,
    decontaminate,
    domain_sample,
    full_profile,
    pack_shards,
)
from data_validator_ray.pipelines.dedup import near_dup_dedup


def main(sf_dir: str, out_dir: str) -> None:
    ray.init(address="local", include_dashboard=False, ignore_reinit_error=True)
    try:
        docs = f"{sf_dir}/documents.parquet"

        # 1. validate the raw stream — one fused pass over one read;
        #    pii/repetition plug in like any built-in rule type
        rules = [
            ValidationRule(name="text_present", rule_type="completeness",
                           column="text", threshold=0.95),
            ValidationRule(name="lang_code", rule_type="pattern", column="lang",
                           parameters={"pattern": "^[a-z]{2}$"}, threshold=0.9),
            ValidationRule(name="len_band", rule_type="range", column="n_chars",
                           parameters={"min_value": 10, "max_value": 100_000},
                           threshold=0.9),
            ValidationRule(name="no_pii", rule_type="pii", column="text",
                           threshold=0.99),
            ValidationRule(name="not_repetitive", rule_type="repetition",
                           column="text", threshold=0.5),
        ]
        cfg = ValidationConfig(
            engine={"type": "ray"},
            tables=[{"name": "documents",
                     "rules": [r.model_dump() for r in rules]}],
        )
        v = RayDataValidator(cfg)
        summary = v.validate_table(docs, "documents")
        for r in summary.results:
            print(f"  {r.rule_name:16s} passed={r.passed} "
                  f"{r.failed_count}/{r.total_count}")

        # 2. gate: the same rules in filter mode (drop PII/repetitive/
        #    invalid rows in one fused pass)
        gated = v.apply_filters(docs, "documents")

        # 3. near-duplicate-aware dedup (MinHash-LSH + union-find)
        surviving = near_dup_dedup(gated, threshold=0.5)

        # 4. decontaminate against a (stand-in) benchmark slice
        bench = (
            ray.data.read_parquet(docs, columns=["doc_id", "text"])
            .filter(lambda r: r["doc_id"] % 97 == 0)
            .to_pandas()["text"].tolist()
        )
        flags = decontaminate(surviving, bench, ngram=5)
        clean_ids = set(
            flags.filter(lambda r: not r["is_contaminated"])
            .to_pandas()["doc_id"]
        )
        surviving = surviving.filter(lambda r: r["doc_id"] in clean_ids)

        # 5. deterministic domain-mixture downsampling (no RNG —
        #    resumable/re-runnable by construction)
        mixed = domain_sample(surviving, {"src0": 500}, default_permille=900)

        # 6. EVERY per-doc signal in one pass (quality + language +
        #    fingerprint + Gopher + PII + decontamination columns)
        profiled = full_profile(mixed, bench).materialize()

        # 7. token-budget shards for the trainer — the counts pass
        #    rides on the profile (no corpus re-read / re-tokenize)
        shards = pack_shards(None, budget=2048, counts_source=profiled)

        # 8. deterministic train/val/test labels (hash bands — stable
        #    under resume and repartitioning)
        splits = assign_splits(mixed)

        # 9. curated output (partitioned parquet — resumable layout)
        profiled.write_parquet(f"{out_dir}/profile")
        shards.write_parquet(f"{out_dir}/shards")
        splits.select_columns(["doc_id", "split"]).write_parquet(
            f"{out_dir}/splits"
        )
        print(f"curated profile + shard map + splits written to {out_dir}")
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated")
