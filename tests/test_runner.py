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
