"""Partitioned runner: per-partition verdicts, lineage, violations, and
kill/resume semantics."""

from pathlib import Path
import pandas as pd
import pyarrow.parquet as pq
import pytest

from data_validator_ray.pipelines.runner import ValidationRunner
from data_validator_ray.pipelines.webpages import webpages_config, write_webpages
from data_validator_ray.state import PartitionManifest


@pytest.fixture(scope="module")
def webpages_dir(ray_session, tmp_path_factory):
    out = tmp_path_factory.mktemp("wp") / "webpages"
    write_webpages("/root/testdata/sf0.001", str(out), num_files=8)
    return str(out)


def make_runner(tmp_path, **kw):
    return ValidationRunner(webpages_config(), tmp_path / "ckpt", **kw)


def test_full_run_and_aggregate(ray_session, webpages_dir, tmp_path):
    runner = make_runner(tmp_path)
    report = runner.run(webpages_dir, "webpages")
    assert report["partitions_total"] == 8
    assert report["partitions_skipped_on_resume"] == 0
    s = report["summary"]
    by = {r.rule_name: r for r in s.results}
    # totals across partitions must match the global validator counts
    assert by["url_complete"].total_count == 500
    assert by["url_complete"].failed_count == 5
    assert by["text_non_empty"].failed_count == 10
    # lineage recorded
    t = runner.manifest.read_all()
    assert set(t.column_names) >= {"input_files", "ruleset_hash", "wall_time_s"}
    assert t.to_pandas()["ruleset_hash"].nunique() == 1


def test_resume_skips_completed(ray_session, webpages_dir, tmp_path):
    runner = make_runner(tmp_path, chunk_partitions=3)
    # simulate a killed run: process only the first chunk by limiting
    # partitions via a partial manifest — run fully, then delete some
    # partition checkpoints to model partial completion
    report1 = runner.run(webpages_dir, "webpages")
    assert report1["partitions_skipped_on_resume"] == 0
    manifest = PartitionManifest(tmp_path / "ckpt")
    done_before = manifest.completed_partitions()
    assert done_before == set(range(8))

    # remove 3 partitions' checkpoints → they must be re-run; the other
    # 5 must be skipped
    for pid in (2, 5, 7):
        (Path(manifest.metrics_dir) / f"part-{pid:05d}.parquet").unlink()
    report2 = runner.run(webpages_dir, "webpages")
    assert report2["partitions_skipped_on_resume"] == 5
    assert manifest.completed_partitions() == set(range(8))

    # final aggregated metrics identical to the uninterrupted run
    s1 = {r.rule_name: (r.total_count, r.failed_count)
          for r in report1["summary"].results}
    s2 = {r.rule_name: (r.total_count, r.failed_count)
          for r in report2["summary"].results}
    assert s1 == s2


def test_second_run_all_skipped(ray_session, webpages_dir, tmp_path):
    runner = make_runner(tmp_path)
    runner.run(webpages_dir, "webpages")
    report = runner.run(webpages_dir, "webpages")
    assert report["partitions_skipped_on_resume"] == 8


def test_violations_written_per_partition(ray_session, webpages_dir, tmp_path):
    runner = make_runner(tmp_path)
    runner.run(webpages_dir, "webpages")
    vdir = tmp_path / "ckpt" / "violations"
    parts = sorted(p.name for p in vdir.iterdir())
    assert parts and all(p.startswith("part=") for p in parts)
    dfs = [pq.read_table(f).to_pandas()
           for p in vdir.iterdir() for f in p.glob("*.parquet")]
    allv = pd.concat(dfs)
    assert "rule_name" in allv.columns
    # 5 null urls tagged by url_complete
    assert (allv["rule_name"] == "url_complete").sum() == 5


def test_per_partition_verdicts_present(ray_session, webpages_dir, tmp_path):
    runner = make_runner(tmp_path)
    report = runner.run(webpages_dir, "webpages")
    assert len(report["per_partition_failed"]) == 8


def test_kill_after_k_chunks_then_resume(ray_session, webpages_dir, tmp_path):
    """max_chunks = the deterministic mid-run kill: first runner commits
    2 chunks (4 partitions) and stops; a FRESH runner over the same
    checkpoint dir must skip exactly those 4 and finish the rest."""
    r1 = make_runner(tmp_path, chunk_partitions=2)
    partial = r1.run(webpages_dir, "webpages", max_chunks=2)
    assert partial["partitions_total"] == 4  # only committed ones in manifest
    assert PartitionManifest(tmp_path / "ckpt").completed_partitions() == {0, 1, 2, 3}

    r2 = make_runner(tmp_path, chunk_partitions=2)
    report = r2.run(webpages_dir, "webpages")
    assert report["partitions_skipped_on_resume"] == 4
    assert report["partitions_total"] == 8

    # aggregate equals an uninterrupted run elsewhere
    r3 = ValidationRunner(webpages_config(), tmp_path / "ckpt2")
    full = r3.run(webpages_dir, "webpages")
    s_resumed = {r.rule_name: (r.total_count, r.failed_count)
                 for r in report["summary"].results}
    s_full = {r.rule_name: (r.total_count, r.failed_count)
              for r in full["summary"].results}
    assert s_resumed == s_full


def test_manifest_uri_root(ray_session, webpages_dir, tmp_path):
    """Checkpoint root given as a file:// URI exercises the pyarrow.fs
    path (the multi-node / object-store write route)."""
    uri = f"file://{tmp_path}/ckpt_uri"
    runner = ValidationRunner(webpages_config(), uri, chunk_partitions=4)
    report = runner.run(webpages_dir, "webpages")
    assert report["partitions_total"] == 8
    # durable and resumable through the same URI
    m = PartitionManifest(uri)
    assert m.completed_partitions() == set(range(8))
    report2 = ValidationRunner(webpages_config(), uri).run(webpages_dir, "webpages")
    assert report2["partitions_skipped_on_resume"] == 8
    # violations also landed under the URI root
    vroot = Path(f"{tmp_path}/ckpt_uri/violations")
    assert any(vroot.glob("part=*/*.parquet"))


# --------------------------------------------------------------------- #
# TransformRunner (resumable curation output)                           #
# --------------------------------------------------------------------- #

def _split_docs(tmp_path, n_parts=6, n_rows=120):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "parts"
    d.mkdir()
    rows_per = n_rows // n_parts
    for p in range(n_parts):
        ids = list(range(p * rows_per, (p + 1) * rows_per))
        t = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(
                ["keep this doc with enough good tokens here"
                 if i % 3 else "spam spam spam spam spam spam"
                 for i in ids]
            ),
        })
        pq.write_table(t, d / f"part-{p:04d}.parquet")
    return d


def test_transform_runner_kill_resume(ray_session, tmp_path):
    from data_validator_ray.pipelines.curation import gopher_filter
    from data_validator_ray.pipelines.runner import TransformRunner

    src = _split_docs(tmp_path)
    ckpt, out = tmp_path / "ckpt", tmp_path / "out"

    r1 = TransformRunner(ckpt)
    rep1 = r1.run(src, gopher_filter, out, op_name="gopher",
                  max_partitions=2)
    assert rep1["partitions_processed"] == 2
    assert rep1["partitions_skipped"] == 0

    # fresh runner resumes: skips exactly the 2 committed partitions
    r2 = TransformRunner(ckpt)
    rep2 = r2.run(src, gopher_filter, out, op_name="gopher")
    assert rep2["partitions_skipped"] == 2
    assert rep2["partitions_processed"] == 4

    # output = one dir per partition, total rows == direct full run
    import pyarrow.parquet as pq

    got = pq.read_table(out).to_pandas().sort_values("doc_id")
    direct = gopher_filter(str(src)).to_pandas().sort_values("doc_id")
    assert got["doc_id"].tolist() == direct["doc_id"].tolist()
    # 2/3 of docs pass the gate
    assert len(got) == 80


def test_transform_runner_wipes_uncommitted_output(ray_session, tmp_path):
    from data_validator_ray.pipelines.curation import gopher_filter
    from data_validator_ray.pipelines.runner import TransformRunner

    src = _split_docs(tmp_path)
    ckpt, out = tmp_path / "ckpt", tmp_path / "out"
    # simulate a mid-write kill: partition dir exists with stale junk,
    # but no manifest row
    stale = out / "part=0"
    stale.mkdir(parents=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": pa.array([999999], pa.int64())}),
        stale / "stale.parquet",
    )
    TransformRunner(ckpt).run(src, gopher_filter, out, op_name="gopher")
    got = pq.read_table(out).to_pandas()
    assert 999999 not in set(got["doc_id"])


def test_transform_runner_rows_accounting(ray_session, tmp_path):
    from data_validator_ray.pipelines.curation import pii_redact
    from data_validator_ray.pipelines.runner import TransformRunner

    src = _split_docs(tmp_path)
    rep = TransformRunner(tmp_path / "c").run(
        src, pii_redact, tmp_path / "o", op_name="pii",
    )
    # map transform: rows preserved
    assert rep["rows_in"] == rep["rows_out"] == 120
    m = rep["metrics"].to_pandas()
    assert sorted(m["partition_id"]) == list(range(6))
    assert (m["op_name"] == "pii").all()


def test_validate_microbatches_resume_and_empty(ray_session, tmp_path):
    """foreachBatch-loop parity: empty batches skip validation with an
    all-zero summary row and no output dir; a killed run (max_batches)
    resumes SKIPPING completed batches — their checkpointed summaries
    replay even if the source has since changed — and the final frame
    equals an uninterrupted run's."""
    import pandas as pd

    from data_validator_ray.pipelines.streaming import (
        validate_microbatches,
    )
    from data_validator_ray.validator import RayDataValidator

    cfg = {
        "version": "1.0",
        "engine": {"type": "ray"},
        "tables": [
            {
                "name": "t",
                "rules": [
                    {
                        "name": "v_range",
                        "rule_type": "range",
                        "column": "v",
                        "parameters": {"min_value": 0, "max_value": 10},
                    },
                    {
                        "name": "u_complete",
                        "rule_type": "completeness",
                        "column": "u",
                    },
                ],
            }
        ],
    }
    batches = [
        pd.DataFrame({"v": [1.0, 2.0, 99.0], "u": [1, 2, 3]}),
        pd.DataFrame({"v": [], "u": []}),  # empty: skipped
        pd.DataFrame({"v": [3.0, None], "u": [7, None]}),
        pd.DataFrame({"v": [5.0], "u": [8]}),
    ]
    out = tmp_path / "stream"

    v = RayDataValidator(cfg)
    part = validate_microbatches(v, "t", batches, out, max_batches=2)
    assert part["batch_id"].tolist() == [0, 1]
    # batch 0: one range violation -> rule fails, filter drops the row
    assert part.loc[0, ["n_rows", "n_clean", "passed_rules"]].tolist() == [
        3, 2, 1,
    ]
    # empty batch: zeros, no validated dir
    assert part.loc[1].tolist() == [1, 0, 0, 0, 0]
    assert not (out / "t_validated" / "batch=1").exists()

    # "restart": batch 0's source changes; its checkpointed row must
    # replay untouched (exactly-once parity with checkpointLocation)
    batches[0] = pd.DataFrame({"v": [0.0] * 50, "u": [0] * 50})
    full = validate_microbatches(RayDataValidator(cfg), "t", batches, out)
    assert full["batch_id"].tolist() == [0, 1, 2, 3]
    assert full.loc[0].tolist() == part.loc[0].tolist()
    # batch 2: NULL v never fails range but IS dropped by the filter;
    # NULL u fails completeness and is dropped
    assert full.loc[2, ["n_rows", "n_clean", "passed_rules"]].tolist() == [
        2, 1, 1,
    ]
    assert full.loc[3, ["n_rows", "n_clean", "passed_rules"]].tolist() == [
        1, 1, 2,
    ]


def test_validate_microbatches_delta_sink_exactly_once(
    ray_session, tmp_path
):
    """Delta sink: clean rows append to ONE Delta table with the txn
    handshake. A crash that loses the JSON checkpoint AFTER the Delta
    commit must NOT re-append on resume (the txn proves the write
    happened); the summary row is reconstructed from the commit
    metadata and the table holds no duplicates."""
    import json as _json

    import pandas as pd

    from data_validator_ray.pipelines.streaming import (
        validate_microbatches,
    )
    from data_validator_ray.sources import read_delta
    from data_validator_ray.validator import RayDataValidator

    cfg = {
        "version": "1.0",
        "engine": {"type": "ray"},
        "tables": [
            {
                "name": "t",
                "rules": [
                    {
                        "name": "v_range",
                        "rule_type": "range",
                        "column": "v",
                        "parameters": {"min_value": 0, "max_value": 10},
                    }
                ],
            }
        ],
    }
    batches = [
        pd.DataFrame({"v": [1.0, 2.0, 99.0]}),
        pd.DataFrame({"v": [3.0, 4.0]}),
    ]
    out = tmp_path / "sd"
    part = validate_microbatches(
        RayDataValidator(cfg), "t", batches, out,
        max_batches=1, sink_format="delta",
    )
    assert part.loc[0, ["n_rows", "n_clean"]].tolist() == [3, 2]

    # simulate the crash window: checkpoint lost, Delta commit kept
    ckpt = out / "_streaming_checkpoint.json"
    ckpt.unlink()

    full = validate_microbatches(
        RayDataValidator(cfg), "t", batches, out, sink_format="delta"
    )
    assert full["batch_id"].tolist() == [0, 1]
    assert full.loc[0, ["n_rows", "n_clean"]].tolist() == [3, 2]
    assert full.loc[1, ["n_rows", "n_clean"]].tolist() == [2, 2]
    got = (
        read_delta(str(out / "t_validated_delta"))
        .to_pandas()["v"]
        .sort_values()
        .tolist()
    )
    assert got == [1.0, 2.0, 3.0, 4.0]  # no duplicate batch-0 rows
