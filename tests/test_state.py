"""Pipeline state: table-level JSON + partition manifest."""

from data_validator_ray.state import PartitionManifest, PipelineState


def test_state_round_trip(tmp_path):
    p = tmp_path / "state.json"
    s = PipelineState.load(p)
    assert not s.is_completed("t")
    s.mark_completed("t")
    assert PipelineState.load(p).is_completed("t")


def test_state_reset(tmp_path):
    p = tmp_path / "state.json"
    s = PipelineState.load(p)
    s.mark_completed("a")
    s.reset()
    assert not PipelineState.load(p).is_completed("a")


def _row(pid):
    return {
        "partition_id": pid,
        "table_name": "webpages",
        "rule_name": "r",
        "rule_type": "completeness",
        "total_count": 10,
        "failed_count": 1,
        "success_rate": 0.9,
        "passed": True,
        "input_files": ["f.parquet"],
        "ruleset_hash": "abc",
        "wall_time_s": 0.1,
    }


def test_manifest_resume(tmp_path):
    m = PartitionManifest(tmp_path)
    assert m.completed_partitions() == set()
    m.write_partition(0, [_row(0)])
    m.write_partition(3, [_row(3)])
    assert m.completed_partitions() == {0, 3}
    # a fresh manifest over the same dir sees the same completion set
    assert PartitionManifest(tmp_path).completed_partitions() == {0, 3}
    t = m.read_all()
    assert t.num_rows == 2
    m.reset()
    assert m.completed_partitions() == set()


def test_key_index_lifecycle(ray_session, tmp_path):
    """Build -> probe -> update -> probe; NULL keys kept; key-column
    and hash-scheme guards fail loudly."""
    import pandas as pd
    import pytest as _pytest

    from data_validator_ray.state.key_index import (
        build_key_index,
        dedup_against_index,
        load_key_index,
        update_key_index,
    )

    idx = str(tmp_path / "idx")
    a = pd.DataFrame({"k": ["u1", "u2", "u3", "u2"]})
    built = build_key_index(a, "k", idx)
    assert built["n_keys"] == 3

    b = pd.DataFrame({"k": ["u2", "u4", None, "u5"]})
    kept = dedup_against_index(b, "k", idx).to_pandas()
    assert sorted(kept.k.fillna("<N>")) == ["<N>", "u4", "u5"]

    upd = update_key_index(idx, b, "k")
    assert upd == {"n_keys_before": 3, "n_added": 2, "n_keys": 5}

    c = pd.DataFrame({"k": ["u4", "u9"]})
    kept2 = dedup_against_index(c, "k", idx).to_pandas()
    assert kept2.k.tolist() == ["u9"]

    with _pytest.raises(ValueError):
        load_key_index(idx, expect_key_col="other_col")


def test_key_index_sharded_parity(ray_session, tmp_path):
    """The h1-range-sharded tier (n_shards) is value-identical to the
    broadcast tier across the whole lifecycle: build counts, probe
    survivors (incl. NULL handling both ways), update counts."""
    import pandas as pd
    import pytest as _pytest

    from data_validator_ray.state.key_index import (
        build_key_index,
        dedup_against_index,
        load_key_index,
        update_key_index,
    )

    keys_a = [f"k{i}" for i in range(200)] + ["k5", "k6"]  # dups
    a = pd.DataFrame({"k": keys_a})
    b = pd.DataFrame(
        {"k": [f"k{i}" for i in range(150, 260)] + [None, None]}
    )
    c = pd.DataFrame({"k": [f"k{i}" for i in range(240, 300)] + [None]})

    flat, shard = str(tmp_path / "flat"), str(tmp_path / "shard")
    bf = build_key_index(a, "k", flat)
    bs = build_key_index(a, "k", shard, n_shards=8)
    assert bf == bs == {"n_keys": 200}

    for kn in (True, False):
        kf = (
            dedup_against_index(b, "k", flat, keep_nulls=kn)
            .to_pandas().k.fillna("<N>").sort_values().tolist()
        )
        ks = (
            dedup_against_index(b, "k", shard, keep_nulls=kn)
            .to_pandas().k.fillna("<N>").sort_values().tolist()
        )
        assert kf == ks and len(kf) == (62 if kn else 60)

    uf = update_key_index(flat, b, "k")
    us = update_key_index(shard, b, "k")
    assert uf == us == {"n_keys_before": 200, "n_added": 60, "n_keys": 260}

    kf = dedup_against_index(c, "k", flat).to_pandas()
    ks = dedup_against_index(c, "k", shard).to_pandas()
    assert sorted(kf.k.fillna("<N>")) == sorted(ks.k.fillna("<N>"))
    assert len(ks) == 41  # k260..k299 survive + one NULL

    # whole-index broadcast of a sharded index is refused loudly
    with _pytest.raises(ValueError, match="sharded"):
        load_key_index(shard)


def test_key_index_sharded_probe_reads_only_touched_shards(
    ray_session, tmp_path
):
    """The scale property itself: a probe whose keys fall in few h1
    ranges loads ONLY those shard files (audit_dir markers), never the
    whole index."""
    import pandas as pd

    from data_validator_ray.state.key_index import (
        _shard_ids,
        build_key_index,
        dedup_against_index,
    )
    from data_validator_ray.functions.sketches import hash64

    import numpy as np
    import pyarrow as pa

    idx = str(tmp_path / "idx")
    corpus = pd.DataFrame({"k": [f"doc-{i}" for i in range(5000)]})
    build_key_index(corpus, "k", idx, n_shards=64)

    probe_keys = ["doc-7", "doc-4999", "never-seen"]
    expected = set(
        _shard_ids(
            hash64(pa.array(probe_keys), seed=0).astype(np.int64), 64
        ).tolist()
    )
    audit = tmp_path / "audit"
    out = dedup_against_index(
        pd.DataFrame({"k": probe_keys}), "k", idx, audit_dir=audit
    ).to_pandas()
    assert out.k.tolist() == ["never-seen"]
    touched = {
        int(p.name.split("=", 1)[1]) for p in audit.glob("shard=*")
    }
    assert touched == expected and len(touched) <= 3  # of 64 shards


def test_metrics_history_anomaly_conventions(tmp_path):
    """Short history passes; constant history passes iff equal; a
    planted regression is flagged at |z| > k."""
    from data_validator_ray.state.metrics_history import (
        MetricsHistory,
        metric_anomaly_check,
    )

    h = MetricsHistory(tmp_path / "hist")
    assert metric_anomaly_check(h, "m", 0.5)["passed"]  # no evidence

    h.append("r1", {"m": 0.99})
    h.append("r2", {"m": 0.99})
    const = metric_anomaly_check(h, "m", 0.99)
    assert const["passed"] and const["std"] == 0.0
    assert not metric_anomaly_check(h, "m", 0.98)["passed"]

    h2 = MetricsHistory(tmp_path / "hist2")
    for i, v in enumerate((0.97, 0.98, 0.99, 0.98, 0.97)):
        h2.append(f"r{i}", {"m": v})
    ok = metric_anomaly_check(h2, "m", 0.975)
    bad = metric_anomaly_check(h2, "m", 0.80)
    assert ok["passed"] and not bad["passed"]
    assert abs(bad["z"]) > 3

    # histories are per-metric
    h2.append("r9", {"other": 1.0})
    assert len(h2.series("m")) == 5 and len(h2.series("other")) == 1


def test_metrics_history_per_run_files(tmp_path):
    """Each append writes its OWN file (concurrent-run safe); a
    re-append of the same run_id overwrites idempotently; legacy
    single-file histories still read."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_validator_ray.state.metrics_history import MetricsHistory

    d = tmp_path / "hist"
    h = MetricsHistory(d)
    h.append("run-a", {"m": 1.0})
    h.append("run/b", {"m": 2.0, "n": 3.0})  # slash sanitized
    files = sorted(p.name for p in d.glob("*.parquet"))
    assert files == ["run-run-a.parquet", "run-run_b.parquet"]

    # interleaved writers can never lose each other: simulate a
    # concurrent append that happened between h's two appends
    other = MetricsHistory(d)
    other.append("run-c", {"m": 9.0})
    assert sorted(h.series("m").tolist()) == [1.0, 2.0, 9.0]

    # idempotent retry of the same run
    h.append("run-a", {"m": 1.0})
    assert sorted(h.series("m").tolist()) == [1.0, 2.0, 9.0]

    # legacy one-file layout merges in
    legacy = pa.table(
        {"run_id": ["r0"], "metric_key": ["m"], "value": [5.0]}
    )
    pq.write_table(legacy, d / "metrics.parquet")
    assert sorted(h.series("m").tolist()) == [1.0, 2.0, 5.0, 9.0]


def test_key_index_backend_version_guard(ray_session, tmp_path):
    """An index hashed under a different polars version must fail
    loudly at load (polars Series.hash is not stable across
    versions), not silently miss every previously-seen key."""
    import json

    import pandas as pd
    import pytest as _pytest

    from data_validator_ray.state.key_index import (
        META_NAME,
        build_key_index,
        load_key_index,
    )

    idx = tmp_path / "idx"
    build_key_index(pd.DataFrame({"k": ["a", "b"]}), "k", idx)
    meta = json.loads((idx / META_NAME).read_text())
    assert meta["backend"] in ("polars", "pandas")
    assert meta["backend_version"]

    # same-version load works
    assert len(load_key_index(idx)) == 2

    # simulated upgrade -> loud failure
    meta["backend_version"] = "0.0.0-other"
    (idx / META_NAME).write_text(json.dumps(meta))
    with _pytest.raises(ValueError, match="rebuild"):
        load_key_index(idx)

    # legacy (pre-stamp) meta still loads
    del meta["backend"], meta["backend_version"]
    (idx / META_NAME).write_text(json.dumps(meta))
    assert len(load_key_index(idx)) == 2


def _near_dup_crawls():
    import pandas as pd

    crawl1 = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "alpha beta gamma delta epsilon zeta eta theta",
                "one two three four five six seven eight",
            ],
        }
    )
    crawl2 = pd.DataFrame(
        {
            "doc_id": [10, 11, 12, 13],
            "text": [
                # exact copy: all bands match → dropped with certainty
                "alpha beta gamma delta epsilon zeta eta theta",
                # one-token edit: high Jaccard → dropped (pinned seed)
                "alpha beta gamma delta epsilon zeta eta iota",
                # disjoint vocabulary: kept
                "red orange yellow green blue indigo violet pink",
                # no shingles: always kept
                "",
            ],
        }
    )
    return crawl1, crawl2


def test_near_dup_index_lifecycle_broadcast(ray_session, tmp_path):
    from data_validator_ray.state.key_index import (
        build_near_dup_index,
        near_dup_against_index,
        update_near_dup_index,
    )

    crawl1, crawl2 = _near_dup_crawls()
    idx = str(tmp_path / "ndidx")
    r = build_near_dup_index(crawl1, idx)
    assert r["n_keys"] == 64  # 2 docs × 32 bands
    kept = near_dup_against_index(crawl2, idx).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [12, 13]
    u = update_near_dup_index(idx, crawl2)
    assert u["n_keys"] > r["n_keys"]
    # after the union-merge every crawl-2 doc WITH shingles is history
    kept2 = near_dup_against_index(crawl2, idx).to_pandas()
    assert sorted(kept2["doc_id"].tolist()) == [13]


def test_near_dup_index_sharded_parity_and_pruning(ray_session, tmp_path):
    import pathlib

    from data_validator_ray.state.key_index import (
        build_near_dup_index,
        near_dup_against_index,
    )

    crawl1, crawl2 = _near_dup_crawls()
    idx = str(tmp_path / "ndidx_sharded")
    build_near_dup_index(crawl1, idx, n_shards=4)
    audit = tmp_path / "audit"
    kept = near_dup_against_index(
        crawl2, idx, audit_dir=str(audit)
    ).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [12, 13]
    touched = {p.name for p in pathlib.Path(audit).iterdir()}
    assert touched  # the probe recorded which shards it loaded
    assert all(t.startswith("shard=") for t in touched)


def test_near_dup_index_param_guard(ray_session, tmp_path):
    import pytest

    from data_validator_ray.state.key_index import (
        build_key_index,
        near_dup_against_index,
    )
    from data_validator_ray.pipelines.dedup import minhash_band_keys

    crawl1, _ = _near_dup_crawls()
    # an exact band-key index WITHOUT the minhash meta must be refused
    idx = str(tmp_path / "bare")
    build_key_index(minhash_band_keys(crawl1), "band_key", idx)
    with pytest.raises(ValueError, match="near-dup index"):
        near_dup_against_index(crawl1, idx).to_pandas()
