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
