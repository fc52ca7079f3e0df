"""Run a YAML curation spec over a documents table.

python examples/run_spec.py examples/curation_spec.yaml /root/testdata/sf0.001
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import ray

from data_validator_ray.pipelines.spec import pipeline_ops, run_pipeline_spec


def main(spec_path: str, sf_dir: str) -> None:
    ray.init(address="local", include_dashboard=False, ignore_reinit_error=True)
    try:
        print("registered ops:", ", ".join(pipeline_ops()))
        out = run_pipeline_spec(spec_path, f"{sf_dir}/documents.parquet")
        df = out.to_pandas()
        print(f"{len(df)} rows out; per (source, split):")
        print(df.groupby(["source", "split"]).size().head(10))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "examples/curation_spec.yaml",
        sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001",
    )
