"""Source normalization parity (reference load_data seam — SURVEY §2.1):
CSV / JSON / parquet paths, DataFrame and Arrow passthrough, and the
registered-source indirection."""

import json

import pandas as pd
import pyarrow as pa
import pytest

from data_validator_ray import RayDataValidator, ValidationConfig, ValidationRule


def _cfg():
    return ValidationConfig(
        engine={"type": "ray"},
        tables=[{
            "name": "t",
            "rules": [ValidationRule(
                name="c", rule_type="completeness", column="a"
            ).model_dump()],
        }],
    )


@pytest.fixture()
def frame():
    return pd.DataFrame({"a": [1, 2, None, 4], "b": ["x", "y", "z", "w"]})


def test_csv_source(ray_session, tmp_path, frame):
    p = tmp_path / "t.csv"
    frame.to_csv(p, index=False)
    s = RayDataValidator(_cfg()).validate_table(str(p), "t")
    assert s.results[0].total_count == 4
    assert s.results[0].failed_count == 1


def test_json_source(ray_session, tmp_path, frame):
    p = tmp_path / "t.json"
    rows = [
        {"a": (None if pd.isna(r.a) else int(r.a)), "b": r.b}
        for r in frame.itertuples()
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    s = RayDataValidator(_cfg()).validate_table(str(p), "t")
    assert s.results[0].total_count == 4
    assert s.results[0].failed_count == 1


def test_dataframe_and_arrow_passthrough(ray_session, frame):
    v = RayDataValidator(_cfg())
    s1 = v.validate_table(frame, "t")
    s2 = v.validate_table(pa.Table.from_pandas(frame), "t")
    assert s1.results[0].failed_count == s2.results[0].failed_count == 1


def test_registered_source(ray_session, frame):
    v = RayDataValidator(_cfg())
    v.register_source("mytable", frame)
    s = v.validate_table("mytable", "t")
    assert s.results[0].total_count == 4


def test_unsupported_source_errors(ray_session):
    # load_data failures propagate (reference behavior: validate_table
    # has no try around engine.load_data — validator.py:71-99)
    v = RayDataValidator(_cfg())
    with pytest.raises(ValueError, match="Unsupported source"):
        v.validate_table("/nonexistent/path.xyz", "t")


def test_read_orc_roundtrip_and_pruning(ray_session, tmp_path):
    """write_orc → read_orc round-trips values; columns= prunes at the
    stripe read; the validator resolves .orc paths."""
    import pandas as pd
    import ray.data

    from data_validator_ray.sources import read_orc, write_orc

    df = pd.DataFrame(
        {"a": [1, 2, 3], "b": ["x", "y", None], "c": [1.5, None, 3.0]}
    )
    p = str(tmp_path / "t.orc")
    write_orc(ray.data.from_pandas(df), p)
    back = read_orc(p).to_pandas()
    assert back.equals(df)
    pruned = read_orc(p, columns=["a"]).to_pandas()
    assert list(pruned.columns) == ["a"]

    from data_validator_ray.config import ValidationRule
    from data_validator_ray.validator import RayDataValidator

    v = RayDataValidator()
    res = v.validate_table(
        p,
        "orc_table",
        [ValidationRule(name="b_complete", rule_type="completeness",
                        column="b")],
    )
    assert res.results[0].failed_count == 1


def test_read_text_logs_parse_modes(ray_session, tmp_path):
    """Named groups become typed columns; unparseable lines drop by
    default or emit NULL rows with drop_unparsed=False."""
    import pyarrow as pa

    from data_validator_ray.sources import read_text_logs

    p = tmp_path / "app.log"
    p.write_text(
        "2024-01-01T10:00:00 INFO user=7 val=3.5\n"
        "garbage\n"
        "2024-01-02T11:30:00 WARN user=9 val=1.25\n"
    )
    pat = (
        r"(?P<ts>\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}) (?P<level>\w+) "
        r"user=(?P<user>\d+) val=(?P<val>[0-9.]+)"
    )
    out = read_text_logs(
        str(p), pat,
        dtypes={"ts": pa.timestamp("us"), "user": pa.int64(),
                "val": pa.float64()},
    ).to_pandas()
    assert len(out) == 2
    assert str(out.ts.dtype) == "datetime64[us]"
    assert out.val.tolist() == [3.5, 1.25]
    kept = read_text_logs(str(p), pat, drop_unparsed=False).to_pandas()
    assert len(kept) == 3 and int(kept.level.isna().sum()) == 1


def test_union_by_name_alignment_and_promotion(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as papq

    from data_validator_ray.sources import read_parquet_union_by_name

    a = tmp_path / "a.parquet"
    b = tmp_path / "b.parquet"
    papq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int32()),
                  "x": pa.array(["p", "q"], pa.string())}), a)
    papq.write_table(
        pa.table({"id": pa.array([3, 4], pa.int64()),
                  "y": pa.array([1.5, 2.5], pa.float64())}), b)

    out = (
        read_parquet_union_by_name([str(a), str(b)])
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    # first-seen order; id promoted int32 -> int64
    assert list(out.columns) == ["id", "x", "y"]
    assert out["id"].tolist() == [1, 2, 3, 4]
    assert out["x"].tolist()[:2] == ["p", "q"] and pd.isna(out["x"][2])
    assert pd.isna(out["y"][0]) and out["y"].tolist()[2:] == [1.5, 2.5]

    # columns= prunes at the read and keeps only requested fields
    out2 = read_parquet_union_by_name(
        [str(a), str(b)], columns=["id", "y"]
    ).to_pandas()
    assert list(out2.columns) == ["id", "y"] and len(out2) == 4

    # strict mode refuses the int32/int64 promotion
    import pytest as _pytest
    with _pytest.raises(ValueError, match="strict union_by_name"):
        read_parquet_union_by_name([str(a), str(b)], strict=True)


def test_read_arrow_ipc_roundtrip_and_pruning(ray_session, tmp_path):
    """write_arrow_ipc → read_arrow_ipc round-trips values (multiple
    record batches stream as separate blocks); columns= prunes; the
    validator resolves .arrow paths."""
    import pandas as pd
    import ray.data

    from data_validator_ray.sources import read_arrow_ipc, write_arrow_ipc

    df = pd.DataFrame(
        {"a": range(10), "b": [str(i) if i % 3 else None for i in range(10)],
         "c": [float(i) / 2 for i in range(10)]}
    )
    p = str(tmp_path / "t.arrow")
    write_arrow_ipc(ray.data.from_pandas(df), p, batch_size=4)  # 3 batches
    back = read_arrow_ipc(p).to_pandas().sort_values("a").reset_index(drop=True)
    assert back.equals(df)
    pruned = read_arrow_ipc(p, columns=["a"]).to_pandas()
    assert list(pruned.columns) == ["a"]

    from data_validator_ray.config import ValidationRule
    from data_validator_ray.validator import RayDataValidator

    v = RayDataValidator()
    res = v.validate_table(
        p,
        "ipc_table",
        [ValidationRule(name="b_complete", rule_type="completeness",
                        column="b")],
    )
    assert res.results[0].failed_count == 4  # 0, 3, 6, 9 are NULL


def test_write_arrow_ipc_empty_dataset(ray_session, tmp_path):
    """An empty dataset still produces a VALID zero-row IPC file with
    the input schema (not a silently-missing file)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    from data_validator_ray.sources import read_arrow_ipc, write_arrow_ipc

    df = pd.DataFrame({"a": [1, 2, 3], "s": ["x", "y", "z"]})
    empty = ray.data.from_pandas(df).map_batches(
        lambda b: b.filter(pc.greater(b["a"], 100)), batch_format="pyarrow"
    )
    p = str(tmp_path / "empty.arrow")
    write_arrow_ipc(empty, p)
    back = read_arrow_ipc(p)
    assert back.count() == 0
    # the typed schema survives the round-trip (Ray's to_pandas drops
    # columns for zero-row datasets, so assert on the Dataset schema)
    assert back.schema().names == ["a", "s"]

    # the raw file itself is a valid IPC file with the right schema
    import pyarrow.ipc as ipc

    t = ipc.open_file(p).read_all()
    assert t.schema.names == ["a", "s"] and len(t) == 0


def test_warc_roundtrip_tricky_payloads(ray_session, tmp_path):
    import pandas as pd
    import ray.data

    from data_validator_ray.sources import read_warc_like, write_warc_like

    df = pd.DataFrame(
        {
            "url": [f"https://ex.com/{i}" for i in range(50)],
            "warc_ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(range(50), unit="s"),
            # payloads containing the record separator and WARC magic:
            # Content-Length framing must carry them through intact
            "payload": [
                (f"p{i} \r\n\r\nWARC/1.0 tricky").encode()
                for i in range(50)
            ],
        }
    )
    out = str(tmp_path / "warc")
    write_warc_like(ray.data.from_pandas(df).repartition(4), out)
    back = (
        read_warc_like(out)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    orig = df.sort_values("url").reset_index(drop=True)
    assert len(back) == 50
    assert (back["record_type"] == "response").all()
    assert back["url"].tolist() == orig["url"].tolist()
    assert [bytes(b) for b in back["payload"]] == [
        bytes(b) for b in orig["payload"]
    ]
    pd.testing.assert_series_equal(
        back["warc_ts"], orig["warc_ts"], check_dtype=False
    )


def test_warc_empty_dataset_roundtrip(ray_session, tmp_path):
    import pandas as pd
    import ray.data

    from data_validator_ray.sources import read_warc_like, write_warc_like

    empty = ray.data.from_pandas(
        pd.DataFrame(
            {
                "url": pd.Series(dtype=str),
                "warc_ts": pd.Series(dtype="datetime64[us]"),
                "payload": pd.Series(dtype=object),
            }
        )
    )
    out = str(tmp_path / "warc_empty")
    write_warc_like(empty, out)
    assert read_warc_like(out).count() == 0


def test_parse_warc_like_fails_loudly():
    import pytest as _pytest

    from data_validator_ray.sources import parse_warc_like

    ok = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: u\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: 3\r\n\r\nabc\r\n\r\n"
    )
    t = parse_warc_like(ok)
    assert t.num_rows == 1 and bytes(t["payload"][0].as_py()) == b"abc"
    with _pytest.raises(ValueError, match="bad magic"):
        parse_warc_like(ok.replace(b"WARC/1.0", b"HTTP/1.1"))
    with _pytest.raises(ValueError, match="truncated"):
        parse_warc_like(ok.replace(b"Length: 3", b"Length: 99"))
    with _pytest.raises(ValueError, match="no Content-Length"):
        parse_warc_like(
            b"WARC/1.0\r\nWARC-Target-URI: u\r\n\r\nabc"
        )
    with _pytest.raises(ValueError, match="no header terminator"):
        parse_warc_like(b"WARC/1.0\r\nWARC-Target-URI: u")


def _delta_df(lo, hi):
    return pd.DataFrame(
        {
            "id": range(lo, hi),
            "grp": [i % 3 for i in range(lo, hi)],
            "val": [float(i) * 0.5 for i in range(lo, hi)],
        }
    )


def test_delta_roundtrip_append_overwrite_timetravel(ray_session, tmp_path):
    """Log replay: append accumulates, overwrite tombstones every prior
    active file in one commit, version= time-travels, and the active
    file set shrinks back after overwrite."""
    from data_validator_ray.sources import (
        delta_active_files,
        read_delta,
        write_delta,
    )

    t = str(tmp_path / "dt")
    assert write_delta(_delta_df(0, 5), t) == 0
    assert write_delta(_delta_df(5, 10), t, mode="append") == 1
    got = read_delta(t).to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, _delta_df(0, 10))

    n_before = len(delta_active_files(t))
    assert write_delta(_delta_df(100, 103), t, mode="overwrite") == 2
    got2 = read_delta(t).to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, _delta_df(100, 103))
    assert len(delta_active_files(t)) < n_before + 1  # old files gone

    v1 = read_delta(t, version=1).to_pandas().sort_values("id")
    assert v1["id"].tolist() == list(range(10))
    v0 = read_delta(t, version=0).to_pandas().sort_values("id")
    assert v0["id"].tolist() == list(range(5))


def test_delta_partitioned_read_casts_and_prunes(ray_session, tmp_path):
    """Partition columns live in the log as STRINGS and are cast back
    to their schemaString types on read; NULL partition values
    (__HIVE_DEFAULT_PARTITION__) roundtrip as NULL; column pruning
    works for data-only, partition-only, and missing columns."""
    from data_validator_ray.sources import read_delta, write_delta

    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            "grp": pd.array([10, 10, 20, None], dtype="Int64"),
            "val": [1.0, 2.0, 3.0, 4.0],
        }
    )
    t = str(tmp_path / "dtp")
    write_delta(df, t, partition_cols=["grp"])
    got = read_delta(t).to_pandas().sort_values("id").reset_index(drop=True)
    assert got["grp"].dtype.kind in "if"  # int64 (or NaN-promoted)
    assert got["grp"].tolist()[:3] == [10, 10, 20]
    assert pd.isna(got["grp"].iloc[3])

    only_val = read_delta(t, columns=["id", "val"]).to_pandas()
    assert sorted(only_val.columns) == ["id", "val"]
    only_part = read_delta(t, columns=["id", "grp"]).to_pandas()
    assert sorted(only_part.columns) == ["grp", "id"]
    # missing column: pruned silently (validator contract — the rule
    # naming it must fail as a rule, not as a read error)
    missing = read_delta(t, columns=["id", "nope"]).to_pandas()
    assert sorted(missing.columns) == ["id"]


def test_delta_checkpoint_seed_and_tail_replay(ray_session, tmp_path):
    """A single-part checkpoint parquet seeds the state (even when the
    older JSON commits are gone, i.e. log cleanup) and later JSON
    commits replay on top."""
    import pyarrow.parquet as pq

    from data_validator_ray.sources import read_delta, write_delta

    t = tmp_path / "dtc"
    write_delta(_delta_df(0, 4), str(t))
    write_delta(_delta_df(4, 8), str(t), mode="append")

    # hand-build the v1 checkpoint from the replayed state
    import json as _json

    from data_validator_ray.sources.delta import _replay

    active, meta = _replay(t, 1)

    def strip_empty(d):  # Parquet can't write no-child structs
        return {
            k: (strip_empty(v) if isinstance(v, dict) else v)
            for k, v in d.items()
            if v != {}
        }

    rows = []
    rows.append({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
                 "metaData": None, "add": None})
    rows.append({"protocol": None, "metaData": strip_empty(meta),
                 "add": None})
    for a in active.values():
        rows.append({"protocol": None, "metaData": None,
                     "add": strip_empty(a)})
    tbl = pa.Table.from_pylist(rows)
    log = t / "_delta_log"
    pq.write_table(tbl, str(log / f"{1:020d}.checkpoint.parquet"))
    (log / "_last_checkpoint").write_text(_json.dumps({"version": 1}))
    # simulate log cleanup of the checkpointed commits
    (log / f"{0:020d}.json").unlink()
    (log / f"{1:020d}.json").unlink()

    got = read_delta(str(t)).to_pandas().sort_values("id")
    assert got["id"].tolist() == list(range(8))

    write_delta(_delta_df(8, 9), str(t), mode="append")
    got2 = read_delta(str(t)).to_pandas().sort_values("id")
    assert got2["id"].tolist() == list(range(9))


def test_delta_dict_source_and_protocol_gate(ray_session, tmp_path):
    """validator.load_data accepts the reference's dict-config Delta
    source ({'type': 'delta', 'path': ...}, databricks_engine.py:
    180-202) incl. version=; unsupported dict types and missing path
    keep the reference's error text; unreadable protocol features
    raise loudly instead of misreading."""
    import json as _json

    from data_validator_ray.sources import write_delta

    t = str(tmp_path / "dtv")
    write_delta(_delta_df(0, 6), t)
    v = RayDataValidator(
        {"version": "1.0", "engine": {"type": "ray"},
         "tables": [{"name": "x", "rules": [
             {"name": "c", "rule_type": "completeness", "column": "id"}]}]}
    )
    ds = v.load_data({"type": "delta", "path": t})
    assert ds.count() == 6
    # plain directory path with _delta_log auto-detects too
    assert v.load_data(t).count() == 6
    with pytest.raises(ValueError, match="requires path"):
        v.load_data({"type": "delta"})
    with pytest.raises(ValueError, match="Unsupported Databricks source"):
        v.load_data({"type": "unity_catalog", "catalog": "c"})

    # protocol gate: a feature this reader can't honor must refuse
    log = tmp_path / "dtv" / "_delta_log"
    (log / f"{1:020d}.json").write_text(
        _json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"]}}) + "\n"
    )
    from data_validator_ray.sources import read_delta

    with pytest.raises(NotImplementedError, match="minReaderVersion"):
        read_delta(t)


def test_delta_data_skipping_stats(ray_session, tmp_path):
    """The writer emits footer-derived add.stats; delta_pruned_files
    proves exactly the out-of-range files skippable; read_delta's
    stats_filter never opens them but keeps every matching row.
    Partition-column predicates prune from partitionValues."""
    from data_validator_ray.sources import (
        delta_pruned_files,
        read_delta,
        write_delta,
    )

    t = str(tmp_path / "dts")
    # three commits with disjoint id ranges -> per-file tight stats
    for lo in (0, 100, 200):
        write_delta(_delta_df(lo, lo + 50), t, mode="append")

    kept, skipped = delta_pruned_files(t, "id", 100, 149)
    assert len(skipped) >= 2 and len(kept) >= 1
    got = (
        read_delta(t, stats_filter=("id", 100, 149))
        .to_pandas()
        .sort_values("id")
    )
    assert set(range(100, 150)) <= set(got["id"])
    assert not set(range(0, 50)) & set(got["id"])

    # stats JSON present in the log
    import json as _json
    from pathlib import Path as _P

    line = next(
        _json.loads(ln)
        for ln in (_P(t) / "_delta_log" / f"{0:020d}.json")
        .read_text()
        .splitlines()
        if "add" in ln and '"stats"' in ln
    )
    st = _json.loads(line["add"]["stats"])
    assert st["numRecords"] == 50
    assert st["minValues"]["id"] == 0 and st["maxValues"]["id"] == 49

    # partition-column pruning path
    tp = str(tmp_path / "dtsp")
    write_delta(_delta_df(0, 30), tp, partition_cols=["grp"])
    kept_p, skipped_p = delta_pruned_files(tp, "grp", 2, 2)
    assert len(skipped_p) == 2 and len(kept_p) == 1
    gotp = read_delta(tp, stats_filter=("grp", 2, 2)).to_pandas()
    assert set(gotp["grp"]) == {2}


def test_delta_foreign_log_tolerance_and_commit_race(ray_session, tmp_path):
    """Reads a hand-built 'foreign' (Spark-shaped) log: commitInfo
    first, txn/cdc actions ignored, absolute file URIs honored,
    URL-encoded relative paths decoded, stats as JSON string. Also:
    publishing a version that already exists fails loudly instead of
    clobbering (optimistic concurrency)."""
    import json as _json

    import pyarrow.parquet as ppq

    from data_validator_ray.sources import read_delta, write_delta

    t = tmp_path / "foreign"
    (t / "_delta_log").mkdir(parents=True)
    (t / "sub dir").mkdir()
    ppq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64())}),
        str(t / "sub dir" / "f1.parquet"),
    )
    ppq.write_table(
        pa.table({"id": pa.array([3], pa.int64())}),
        str(t / "f2.parquet"),
    )
    schema_str = _json.dumps(
        {"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}}]}
    )
    actions = [
        {"commitInfo": {"operation": "WRITE", "timestamp": 1}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "abc", "format": {"provider": "parquet"},
                      "schemaString": schema_str,
                      "partitionColumns": [], "configuration": {}}},
        {"txn": {"appId": "x", "version": 9}},  # ignored
        {"add": {"path": "sub%20dir/f1.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 1, "dataChange": True,
                 "stats": _json.dumps({"numRecords": 2,
                                       "minValues": {"id": 1},
                                       "maxValues": {"id": 2},
                                       "nullCount": {"id": 0}})}},
        {"add": {"path": (t / "f2.parquet").resolve().as_uri(),
                 "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True}},
    ]
    (t / "_delta_log" / f"{0:020d}.json").write_text(
        "\n".join(_json.dumps(a) for a in actions) + "\n"
    )
    got = read_delta(str(t)).to_pandas().sort_values("id")
    assert got["id"].tolist() == [1, 2, 3]

    # commit race: steal version 1 first, then try to append
    (t / "_delta_log" / f"{1:020d}.json").write_text(
        _json.dumps({"commitInfo": {"operation": "WRITE"}}) + "\n"
    )
    # write_delta computes next=2; force the race by pre-creating v2
    (t / "_delta_log" / f"{2:020d}.json").write_text(
        _json.dumps({"commitInfo": {"operation": "WRITE"}}) + "\n"
    )
    import shutil as _sh

    class _Racer:
        pass

    # monkeypatch-free race: _list_versions sees v2, so next is v3 —
    # instead pre-create v3 AFTER version computation is impossible
    # here; assert the loud failure path directly via the helper
    from data_validator_ray.sources.delta import _commit_path

    nxt = 3
    (t / "_delta_log" / f"{nxt:020d}.json").write_text("{}\n")
    with pytest.raises(RuntimeError, match="concurrent commit"):
        # write_delta will compute version 4... so instead simulate by
        # removing it after compute is racy; call the exclusive-link
        # publish path through write_delta with a frozen log listing:
        # simplest deterministic repro — make EVERY next version taken
        import unittest.mock as _mock

        import data_validator_ray.sources.delta as _d

        real = _d._list_versions

        def stale(log_dir):  # a racer won between listing and publish
            vs = real(log_dir)
            return [v for v in vs if v < nxt]

        with _mock.patch.object(_d, "_list_versions", stale):
            write_delta(
                pd.DataFrame({"id": pd.Series([7, 8], dtype="int64")}),
                str(t),
                mode="append",
            )


def test_delta_checkpoint_writer_compaction(ray_session, tmp_path):
    """write_delta_checkpoint snapshots the current state into a
    single-part checkpoint + _last_checkpoint; readers seed from it
    after the JSON commits are retention-deleted, later appends still
    replay, and the version counter never recycles."""
    from data_validator_ray.sources import (
        read_delta,
        write_delta,
        write_delta_checkpoint,
    )

    t = str(tmp_path / "dtw")
    for lo in (0, 10, 20):
        write_delta(_delta_df(lo, lo + 10), t, mode="append")
    assert write_delta_checkpoint(t) == 2

    # retention: delete ALL JSON commits <= checkpoint
    from pathlib import Path as _P

    for v in range(3):
        (_P(t) / "_delta_log" / f"{v:020d}.json").unlink()
    got = read_delta(t).to_pandas().sort_values("id")
    assert got["id"].tolist() == list(range(30))

    # append after compaction: version 3, all rows visible
    assert write_delta(_delta_df(30, 35), t, mode="append") == 3
    got2 = read_delta(t).to_pandas().sort_values("id")
    assert got2["id"].tolist() == list(range(35))

    # checkpoint again at 3, time-travel to checkpointed state works
    assert write_delta_checkpoint(t) == 3
    v3 = read_delta(t, version=3).to_pandas()
    assert len(v3) == 35


def test_delta_schema_enforcement(ray_session, tmp_path):
    """Appends with a different schema or partitioning are refused
    loudly (Delta enforcement); an overwrite may change both and the
    new metaData rides the commit, so readers see the new schema."""
    import pandas as pd

    from data_validator_ray.sources import read_delta, write_delta

    t = str(tmp_path / "dse")
    write_delta(pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}), t)
    with pytest.raises(ValueError, match="schema mismatch"):
        write_delta(
            pd.DataFrame({"a": [3], "c": [1.5]}), t, mode="append"
        )
    with pytest.raises(ValueError, match="schema mismatch"):
        write_delta(
            pd.DataFrame({"a": [3], "b": ["z"]}), t,
            mode="append", partition_cols=["b"],
        )
    # same schema appends fine
    write_delta(pd.DataFrame({"a": [3], "b": ["z"]}), t, mode="append")
    # overwrite replaces schema + partitioning; metaData updates
    write_delta(
        pd.DataFrame({"a": [9], "c": [2.5], "g": [1]}), t,
        mode="overwrite", partition_cols=["g"],
    )
    got = read_delta(t).to_pandas()
    assert sorted(got.columns) == ["a", "c", "g"]
    assert got["g"].tolist() == [1]  # partition col re-attached
    # and the enforcement now tracks the NEW schema
    with pytest.raises(ValueError, match="schema mismatch"):
        write_delta(pd.DataFrame({"a": [1], "b": ["x"]}), t, mode="append")


def test_delete_delta_stats_targeted(ray_session, tmp_path):
    """DELETE touches the minimum file set: disjoint files untouched,
    provably-all-matching files tombstoned without a read, overlapping
    files rewritten; NULLs never match; a no-match predicate commits
    nothing; partitioned tables are refused loudly."""
    import pandas as pd

    from data_validator_ray.sources import (
        delete_delta,
        delta_active_files,
        read_delta,
        write_delta,
    )

    t = str(tmp_path / "dd")
    # three single-file commits: [0..9], [10..19], [20..29]
    for lo in (0, 10, 20):
        write_delta(_delta_df(lo, lo + 10), t, mode="append")
    before = set(delta_active_files(t))

    # delete [10..24]: file2 all-matching (drop, no rewrite),
    # file3 overlaps (rewrite), file1 untouched
    res = delete_delta(t, "id", 10, 24)
    assert res["untouched_files"] == 1
    assert res["removed_files"] == 2
    # ray may split the one overlapping file's survivors across
    # several output files; what matters is that SOME rewrite happened
    assert res["rewritten_files"] >= 1
    got = read_delta(t).to_pandas().sort_values("id")
    assert got["id"].tolist() == [*range(0, 10), *range(25, 30)]
    # untouched file is literally the same path (never rewritten)
    after = set(delta_active_files(t))
    assert len(before & after) == 1

    # time travel still sees the pre-delete state
    pre = read_delta(t, version=2).to_pandas()
    assert len(pre) == 30

    # no-match predicate: no commit
    res2 = delete_delta(t, "id", 1000, 2000)
    assert res2["version"] == -1 and res2["removed_files"] == 0

    # NULL never matches
    df = pd.DataFrame(
        {"id": pd.array([1, None, 3], dtype="Int64"),
         "v": [1.0, 2.0, 3.0]}
    )
    t2 = str(tmp_path / "dd2")
    write_delta(df, t2)
    delete_delta(t2, "id", 0, 10)
    left = read_delta(t2).to_pandas()
    assert len(left) == 1 and pd.isna(left["id"].iloc[0])

    # partitioned table refused
    t3 = str(tmp_path / "dd3")
    write_delta(_delta_df(0, 10), t3, partition_cols=["grp"])
    with pytest.raises(NotImplementedError, match="partitioned"):
        delete_delta(t3, "id", 0, 5)


def test_optimize_and_vacuum_delta(ray_session, tmp_path):
    """OPTIMIZE merges small files into one dataChange=false commit
    (rows byte-identical, already-big files untouched, streaming
    history unchanged); VACUUM physically deletes only unreferenced
    files, after which current reads still work but time travel to
    pre-optimize versions fails at the file level."""
    import pandas as pd

    from data_validator_ray.sources import (
        delta_active_files,
        optimize_delta,
        read_delta,
        vacuum_delta,
        write_delta,
    )

    t = str(tmp_path / "dopt")
    for lo in (0, 5, 10, 15):  # four 5-row files
        write_delta(_delta_df(lo, lo + 5), t, mode="append")
    n_before = len(delta_active_files(t))
    assert n_before == 4

    res = optimize_delta(t, target_rows_per_file=100)
    assert res["compacted_files"] == 4 and res["new_files"] >= 1
    assert len(delta_active_files(t)) < n_before
    got = read_delta(t).to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, _delta_df(0, 20))

    # idempotent: a second optimize has nothing to merge
    res2 = optimize_delta(t, target_rows_per_file=100)
    assert res2["version"] == -1

    # time travel to version 3 (pre-optimize) still works BEFORE vacuum
    pre = read_delta(t, version=3).to_pandas()
    assert len(pre) == 20

    deleted = vacuum_delta(t)
    assert len(deleted) == 4  # the four compacted originals
    # current read unaffected
    got2 = read_delta(t).to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, _delta_df(0, 20))
    # pre-optimize time travel now fails (documented Delta trade)
    with pytest.raises(Exception):
        read_delta(t, version=3).to_pandas()


def test_merge_delta_upsert(ray_session, tmp_path):
    """MERGE replaces existing keys, inserts new ones, touches only
    stats-overlapping files; NULL table keys survive; schema/NULL-key/
    duplicate-key changes are refused; empty changes commit nothing."""
    import pandas as pd

    from data_validator_ray.sources import (
        merge_delta,
        read_delta,
        write_delta,
    )

    t = str(tmp_path / "dm")
    # two files with disjoint key ranges: [0..4], [100..104]
    for lo in (0, 100):
        write_delta(_delta_df(lo, lo + 5), t, mode="append")

    changes = _delta_df(3, 7)  # updates 3,4; inserts 5,6
    changes["val"] = changes["val"] + 1000
    res = merge_delta(t, changes, "id")
    assert res["rewritten_files"] == 1  # [100..104] untouched by stats
    assert res["untouched_files"] == 1
    assert res["inserted_rows"] == 4
    got = (
        read_delta(t).to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert got["id"].tolist() == [0, 1, 2, 3, 4, 5, 6, *range(100, 105)]
    assert (got.loc[got["id"].between(3, 6), "val"] > 1000).all()
    assert (got.loc[got["id"] < 3, "val"] < 1000).all()

    # refusals
    with pytest.raises(ValueError, match="NULL keys"):
        merge_delta(
            t,
            pd.DataFrame(
                {"id": pd.array([1, None], dtype="Int64"),
                 "grp": [0, 0], "val": [0.0, 0.0]}
            ),
            "id",
        )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_delta(
            t,
            pd.DataFrame({"id": [1, 1], "grp": [0, 0],
                          "val": [0.0, 1.0]}),
            "id",
        )
    with pytest.raises(ValueError, match="schema"):
        merge_delta(
            t, pd.DataFrame({"id": [1], "other": ["x"]}), "id"
        )
    empty = merge_delta(
        t,
        pd.DataFrame(
            {"id": pd.Series(dtype="int64"),
             "grp": pd.Series(dtype="int64"),
             "val": pd.Series(dtype="float64")}
        ),
        "id",
    )
    assert empty["version"] == -1


def test_optimize_delta_zorder_improves_pruning(ray_session, tmp_path):
    """OPTIMIZE ZORDER must (a) preserve the table's rows exactly and
    (b) tighten per-file min/max ranges so a range stats_filter prunes
    files it could not prune before: four appends each spanning the
    FULL id range leave every file un-prunable; after zorder on id the
    clustered files split the range and a narrow read skips most."""
    import pandas as pd

    from data_validator_ray.sources import (
        delta_pruned_files,
        optimize_delta,
        read_delta,
        write_delta,
    )

    t = str(tmp_path / "dz")
    # 4 interleaved appends: ids i, i+1000, i+2000, ... each file's
    # [min, max] covers ~the whole domain
    for off in range(4):
        df = pd.DataFrame(
            {"id": [off + 4 * i for i in range(250)],
             "v": [float(off)] * 250}
        )
        write_delta(df, t, mode="append")
    kept0, skipped0 = delta_pruned_files(t, "id", 0, 99)
    assert len(skipped0) == 0  # every file overlaps [0, 100)

    res = optimize_delta(t, target_rows_per_file=250, zorder_by=["id"])
    assert res["compacted_files"] == 4 and res["new_files"] >= 2
    got = read_delta(t).to_pandas().sort_values("id").reset_index(drop=True)
    assert got["id"].tolist() == sorted(range(0, 1000))

    kept1, skipped1 = delta_pruned_files(t, "id", 0, 99)
    assert len(skipped1) >= 1  # clustering made pruning effective
    narrow = read_delta(t, stats_filter=("id", 0, 99)).to_pandas()
    assert set(narrow.loc[narrow["id"].between(0, 99), "id"]) == set(
        range(0, 100)
    )


def test_merge_delta_backfill_tier_equivalence(ray_session, tmp_path):
    """Forcing max_broadcast_keys below the change-key count must route
    the rewrite filter through the bucketed hash anti-join (no driver
    key materialization) and produce the SAME table as the CDC
    broadcast tier — including surviving NULL table keys."""
    import pandas as pd

    from data_validator_ray.sources import (
        merge_delta,
        read_delta,
        write_delta,
    )

    base = _delta_df(0, 10)
    base["id"] = base["id"].astype("Int64")
    null_row = pd.DataFrame(
        {"id": pd.array([None], dtype="Int64"), "grp": [0], "val": [-1.0]}
    )
    base = pd.concat([base, null_row], ignore_index=True)
    changes = _delta_df(7, 13)
    changes["val"] = changes["val"] + 1000
    changes["id"] = changes["id"].astype("Int64")

    tables = {}
    for name, bound in (("cdc", 5_000_000), ("backfill", 1)):
        t = str(tmp_path / name)
        write_delta(base, t)
        res = merge_delta(t, changes, "id", max_broadcast_keys=bound)
        assert res["inserted_rows"] == 6
        tables[name] = (
            read_delta(t)
            .to_pandas()
            .sort_values("id", na_position="last")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(tables["cdc"], tables["backfill"])
    got = tables["backfill"]
    assert got["id"].isna().sum() == 1  # NULL key survived
    assert (got.loc[got["id"].between(7, 12), "val"] > 1000).all()

    # backfill tier still refuses duplicates and NULL change keys
    import pytest as _pytest

    t = str(tmp_path / "refuse")
    write_delta(_delta_df(0, 5), t)
    with _pytest.raises(ValueError, match="duplicate keys"):
        merge_delta(
            t,
            pd.DataFrame({"id": [1, 1, 2], "grp": [0, 0, 0],
                          "val": [0.0, 1.0, 2.0]}),
            "id",
            max_broadcast_keys=1,
        )


def test_merge_delta_string_keys_with_null_table_keys(ray_session, tmp_path):
    """String key columns with NULL table keys must not crash the
    searchsorted drop filter (the mask applies BEFORE the sort probe)."""
    import pandas as pd

    from data_validator_ray.sources import (
        merge_delta,
        read_delta,
        write_delta,
    )

    t = str(tmp_path / "dstr")
    base = pd.DataFrame(
        {"k": ["a", "b", None, "d"], "v": [1.0, 2.0, 3.0, 4.0]}
    )
    write_delta(base, t)
    merge_delta(
        t, pd.DataFrame({"k": ["b", "e"], "v": [20.0, 50.0]}), "k"
    )
    got = read_delta(t).to_pandas().sort_values(
        "k", na_position="last"
    ).reset_index(drop=True)
    assert got["k"].tolist()[:4] == ["a", "b", "d", "e"]
    assert pd.isna(got["k"].iloc[4])  # NULL key survived
    assert got.loc[got["k"] == "b", "v"].item() == 20.0


def test_vacuum_skips_staging_dirs(ray_session, tmp_path):
    """vacuum must never sweep an in-flight writer's _staging-* files
    (they are not yet referenced by any commit)."""
    import pandas as pd

    from data_validator_ray.sources import vacuum_delta, write_delta

    t = tmp_path / "dv"
    write_delta(_delta_df(0, 5), str(t))  # commits version 0
    # in-flight: targets a FUTURE version → untouched
    staged = t / "_staging-00000000000000000099-deadbeef" / "x.parquet"
    staged.parent.mkdir()
    pd.DataFrame({"a": [1]}).to_parquet(staged)
    # stale crash leftover: targets the already-committed version 0 →
    # swept whole (its writer succeeded, crashed, or lost the race)
    stale = t / "_staging-00000000000000000000-cafecafe" / "y.parquet"
    stale.parent.mkdir()
    pd.DataFrame({"a": [2]}).to_parquet(stale)
    deleted = vacuum_delta(str(t))
    assert staged.exists()
    assert not stale.parent.exists()
    assert deleted == [str(stale.parent)]


def test_delta_concurrent_same_version_writers_no_clobber(
    ray_session, tmp_path, monkeypatch
):
    """Two writers that computed the SAME next version must not touch
    each other's data files: the loser fails at the commit link, and
    the winner's committed table reads back ITS rows (per-write GUID
    tokens make staging and part names collision-free)."""
    import pandas as pd
    import pytest as _pytest

    from data_validator_ray.sources import read_delta, write_delta
    from data_validator_ray.sources.delta import _commit_path

    t = tmp_path / "race"
    write_delta(_delta_df(0, 5), str(t))  # version 0

    # simulate writer A winning the version-1 commit while writer B's
    # append (computed against the same snapshot) runs second: B must
    # fail loudly AND leave A's data intact
    write_delta(_delta_df(100, 105), str(t), mode="append")  # A: v1
    # forge B's view: B saw only v0, so it also targets version 1 —
    # replay its append against a log listing missing v1 by writing to
    # a clone... simplest faithful probe: call write_delta again (it
    # sees v1 and targets v2), then assert the on-disk v1 data files
    # still hash-match what A committed.
    import json as _json

    v1 = _commit_path(t, 1).read_text()
    a_files = [
        _json.loads(line)["add"]["path"]
        for line in v1.splitlines()
        if '"add"' in line
    ]
    before = {p: (t / p).read_bytes() for p in a_files}
    write_delta(_delta_df(200, 205), str(t), mode="append")  # v2
    after = {p: (t / p).read_bytes() for p in a_files}
    assert before == after  # nobody overwrote A's committed files
    got = read_delta(str(t)).to_pandas()
    assert sorted(got["id"]) == [*range(0, 5), *range(100, 105),
                                 *range(200, 205)]

    # TRUE same-version race: a writer working from a stale snapshot
    # (its listing missed v2) targets v2 — it must fail loudly at the
    # commit link AND leave v2's committed data files untouched
    import data_validator_ray.sources.delta as dmod

    v2_files = [
        _json.loads(line)["add"]["path"]
        for line in _commit_path(t, 2).read_text().splitlines()
        if '"add"' in line
    ]
    v2_before = {p: (t / p).read_bytes() for p in v2_files}
    real_list = dmod._list_versions
    monkeypatch.setattr(
        dmod, "_list_versions",
        lambda log_dir: [v for v in real_list(log_dir) if v <= 1],
    )
    with _pytest.raises(RuntimeError, match="concurrent commit"):
        write_delta(_delta_df(300, 305), str(t), mode="append")
    monkeypatch.undo()
    v2_after = {p: (t / p).read_bytes() for p in v2_files}
    assert v2_before == v2_after  # the loser never touched v2's files
    got2 = read_delta(str(t)).to_pandas()
    assert sorted(got2["id"]) == sorted(got["id"])  # table state intact


def test_read_delta_stats_filter_absolute_paths(ray_session, tmp_path):
    """Data skipping must keep files whose add.path is an ABSOLUTE
    file: URI (foreign/cloned tables) — the kept-set intersection runs
    in _abs_path key space, not table-relative."""
    import json as _json

    import pandas as pd

    from data_validator_ray.sources import read_delta, write_delta

    t = tmp_path / "dabs"
    write_delta(pd.DataFrame({"id": [1, 2, 3], "v": [1.0, 2.0, 3.0]}),
                str(t))
    # rewrite the commit's add.path entries as absolute file: URIs
    log = t / "_delta_log" / "00000000000000000000.json"
    lines = []
    for line in log.read_text().splitlines():
        a = _json.loads(line)
        if "add" in a:
            rel = a["add"]["path"]
            a["add"]["path"] = (t / rel).resolve().as_uri()
        lines.append(_json.dumps(a))
    log.write_text("\n".join(lines) + "\n")

    got = read_delta(str(t), stats_filter=("id", 2, 3)).to_pandas()
    assert sorted(got["id"]) == [1, 2, 3]  # file kept, nothing dropped


def test_delta_schema_evolution_merge_mode(ray_session, tmp_path):
    """schema_mode='merge' lets an append ADD columns (shared columns
    must keep their types); the commit carries the union metaData and
    reads union by name, NULL-filling old files. Type changes are
    still refused even in merge mode."""
    import pandas as pd

    from data_validator_ray.sources import read_delta, write_delta

    t = str(tmp_path / "devo")
    write_delta(pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}), t)
    # default strict: refused
    with pytest.raises(ValueError, match="schema mismatch"):
        write_delta(
            pd.DataFrame({"a": [3], "b": ["z"], "c": [1.5]}), t,
            mode="append",
        )
    # merge mode: new column c accepted
    write_delta(
        pd.DataFrame({"a": [3], "b": ["z"], "c": [1.5]}), t,
        mode="append", schema_mode="merge",
    )
    got = (
        read_delta(t).to_pandas().sort_values("a").reset_index(drop=True)
    )
    assert sorted(got.columns) == ["a", "b", "c"]
    assert got["a"].tolist() == [1, 2, 3]
    assert pd.isna(got["c"].iloc[0]) and got["c"].iloc[2] == 1.5

    # column pruning still works on the union read
    pruned = read_delta(t, columns=["a"]).to_pandas()
    assert list(pruned.columns) == ["a"] and len(pruned) == 3

    # a later same-schema append keeps working (enforced vs the union)
    write_delta(
        pd.DataFrame({"a": [4], "b": ["w"], "c": [2.5]}), t,
        mode="append",
    )
    assert len(read_delta(t).to_pandas()) == 4

    # merge mode still refuses a TYPE change on a shared column
    with pytest.raises(ValueError, match="schema mismatch"):
        write_delta(
            pd.DataFrame({"a": ["oops"], "b": ["z"], "c": [0.0]}), t,
            mode="append", schema_mode="merge",
        )
