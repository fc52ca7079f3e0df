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
