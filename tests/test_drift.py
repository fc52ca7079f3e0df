"""Drift check: baseline snapshot + PSI/KS kernel.

Net-new vs the reference (its ``delta_quality`` placeholder always
passes — ``databricks_engine.py:304-327``); semantics defined in
stages/drift.py.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from data_validator_ray import (
    RayDataValidator,
    ValidationConfig,
    ValidationRule,
    read_baseline,
    write_baseline,
)
from data_validator_ray.functions.sketches import TDigest
from data_validator_ray.stages.drift import histogram_counts, ks_stat, psi


def _cfg(rules):
    return ValidationConfig(
        engine={"type": "ray"},
        tables=[{"name": "t", "rules": [r.model_dump() for r in rules]}],
    )


def test_histogram_counts_openended():
    edges = np.array([1.0, 2.0, 3.0])
    counts = histogram_counts(np.array([0.5, 1.5, 2.5, 3.5, 100.0]), edges)
    assert counts.tolist() == [1, 1, 1, 2]


def test_psi_identical_is_zero():
    p = np.array([10.0, 20.0, 30.0, 40.0])
    assert psi(p, p) == pytest.approx(0.0, abs=1e-9)
    shifted = np.array([40.0, 30.0, 20.0, 10.0])
    assert psi(p, shifted) > 0.5


def test_ks_identical_near_zero():
    rng = np.random.default_rng(7)
    vals = rng.normal(0, 1, 20_000)
    a, b = TDigest(), TDigest()
    a.add(vals)
    b.add(vals)
    grid = np.linspace(-3, 3, 50)
    assert ks_stat(a, b, grid) < 0.01
    c = TDigest()
    c.add(vals + 2.0)
    assert ks_stat(a, c, grid) > 0.5


def test_write_and_read_baseline(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"x": rng.normal(100, 15, 50_000)})
    df.loc[:99, "x"] = np.nan
    path = tmp_path / "base.parquet"
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df), tmp_path / "data.parquet")
    write_baseline(str(tmp_path / "data.parquet"), ["x"], path, bins=32)
    base = read_baseline(path)
    assert base["x"]["count"] == 50_000
    assert base["x"]["null_count"] == 100
    assert sum(base["x"]["counts"]) == 49_900
    # equi-depth edges: each bin holds roughly count/bins values
    counts = np.asarray(base["x"]["counts"], dtype=float)
    assert counts.max() < 49_900 / len(counts) * 3


@pytest.fixture()
def baseline_file(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"v": rng.normal(50, 10, 40_000)}), tmp_path / "base_data.parquet"
    )
    path = tmp_path / "baseline.parquet"
    write_baseline(str(tmp_path / "base_data.parquet"), ["v"], path)
    return path


def test_drift_passes_on_same_distribution(ray_session, baseline_file):
    rng = np.random.default_rng(4)  # fresh sample, same distribution
    df = pd.DataFrame({"v": rng.normal(50, 10, 40_000)})
    rule = ValidationRule(
        name="v_drift", rule_type="drift", column="v",
        parameters={"baseline": str(baseline_file), "metric": "psi"},
    )
    summary = RayDataValidator(_cfg([rule])).validate_table(df, "t")
    r = summary.results[0]
    assert r.passed, r.message
    assert r.metadata["stat"] < 0.05
    assert r.total_count == 1 and r.failed_count == 0


def test_drift_fails_on_shifted_distribution(ray_session, baseline_file):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"v": rng.normal(80, 10, 40_000)})  # mean shift
    for metric in ("psi", "ks"):
        rule = ValidationRule(
            name=f"v_drift_{metric}", rule_type="drift", column="v",
            parameters={"baseline": str(baseline_file), "metric": metric},
        )
        summary = RayDataValidator(_cfg([rule])).validate_table(df, "t")
        r = summary.results[0]
        assert not r.passed
        assert r.metadata["stat"] > 0.3
        assert r.metadata["metric"] == metric


def test_drift_timestamp_column(ray_session, tmp_path):
    ts = pd.date_range("2024-01-01", periods=10_000, freq="min")
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"ts": ts}), tmp_path / "ts.parquet")
    path = tmp_path / "ts_base.parquet"
    write_baseline(str(tmp_path / "ts.parquet"), ["ts"], path)
    rule = ValidationRule(
        name="ts_drift", rule_type="drift", column="ts",
        parameters={"baseline": str(path)},
    )
    summary = RayDataValidator(_cfg([rule])).validate_table(
        str(tmp_path / "ts.parquet"), "t"
    )
    assert summary.results[0].passed


def test_drift_bad_params_error_result(ray_session):
    df = pd.DataFrame({"v": [1.0, 2.0]})
    rule = ValidationRule(
        name="no_baseline", rule_type="drift", column="v", parameters={}
    )
    summary = RayDataValidator(_cfg([rule])).validate_table(df, "t")
    r = summary.results[0]
    assert not r.passed
    assert r.failed_count == -1 and r.total_count == -1
    assert "Rule execution failed" in r.message


# --------------------------------------------------------------------------- #
# psi_fixed_bins (oracle-exact fixed-edge tier)                               #
# --------------------------------------------------------------------------- #


def test_psi_fixed_bins_identical_sides(ray_session):
    from data_validator_ray.stages.drift import psi_fixed_bins

    df = pd.DataFrame({"v": np.linspace(0.0, 99.0, 500)})
    out = psi_fixed_bins(df, df.copy(), "v", [25.0, 50.0, 75.0])
    row = out.to_pylist()[0]
    assert row["n_base"] == 500 and row["n_current"] == 500
    assert row["psi_value"] == 0.0


def test_psi_fixed_bins_edge_membership_and_nulls(ray_session):
    # a value EQUAL to an edge falls in the bin below it (side="right"
    # searchsorted == SQL count-of-edges<=v); NULLs drop from counts.
    from data_validator_ray.stages.drift import psi_fixed_bins

    base = pd.DataFrame({"v": [10.0, 10.0, 10.0, None]})
    cur = pd.DataFrame({"v": [9.999, 9.999, 9.999]})
    out = psi_fixed_bins(base, cur, "v", [10.0]).to_pylist()[0]
    assert out["n_base"] == 3 and out["n_current"] == 3
    # all mass moved from bin 1 to bin 0 -> strongly positive PSI
    assert out["psi_value"] > 1.0


def test_psi_fixed_bins_empty_side(ray_session):
    from data_validator_ray.stages.drift import psi_fixed_bins

    base = pd.DataFrame({"v": [1.0, 2.0, 3.0]})
    cur = pd.DataFrame({"v": pd.array([None, None], dtype="Float64")})
    out = psi_fixed_bins(base, cur, "v", [2.0]).to_pylist()[0]
    assert out["n_base"] == 3 and out["n_current"] == 0
    # degenerate current side renormalizes to uniform over eps bins
    assert np.isfinite(out["psi_value"])


def test_ks_exact_matches_numpy_reference(ray_session):
    from data_validator_ray.stages.drift import ks_exact

    rng = np.random.default_rng(3)
    a = rng.normal(0, 1, 4000)
    b = rng.normal(0.3, 1.2, 3000)
    pts = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), pts, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), pts, side="right") / len(b)
    ref = round(float(np.max(np.abs(fa - fb))), 6)
    out = ks_exact(
        pd.DataFrame({"v": a}),
        pd.DataFrame({"v": b}),
        "v",
        num_buckets=8,
        batch_size=512,
    ).to_pylist()[0]
    assert out["ks_value"] == ref
    assert (out["n_base"], out["n_current"]) == (4000, 3000)


def test_ks_exact_ties_nulls_and_empty(ray_session):
    from data_validator_ray.stages.drift import ks_exact

    base = pd.DataFrame({"v": [1.0, 1.0, 2.0, None, 3.0]})
    cur = pd.DataFrame({"v": [1.0, 2.0, 2.0, 2.0]})
    out = ks_exact(base, cur, "v").to_pylist()[0]
    # ECDF pts 1,2,3: Fa=[.5,.75,1], Fb=[.25,1,1] -> D = 0.25
    assert out == {"n_base": 4, "n_current": 4, "ks_value": 0.25}

    empty = pd.DataFrame({"v": pd.array([None], dtype="Float64")})
    out2 = ks_exact(base, empty, "v").to_pylist()[0]
    assert out2["n_current"] == 0 and out2["ks_value"] == 0.0


def test_ks_exact_identical_sides_is_zero(ray_session):
    from data_validator_ray.stages.drift import ks_exact

    df = pd.DataFrame({"v": np.linspace(-5, 5, 1000)})
    out = ks_exact(df, df.copy(), "v", num_buckets=4).to_pylist()[0]
    assert out["ks_value"] == 0.0


def test_ks_exact_quantize_bounds_error_and_distincts(ray_session):
    """The quantize knob must (a) keep the statistic within the
    documented error bound — max mass either sample puts in a width-q
    interval — and (b) actually bound the distinct-value exchange for
    a continuous column."""
    from data_validator_ray.stages.drift import ks_exact

    rng = np.random.default_rng(11)
    base = pd.DataFrame({"v": rng.normal(0.0, 1.0, 6000)})
    cur = pd.DataFrame({"v": rng.normal(0.4, 1.0, 5000)})
    raw = ks_exact(base, cur, "v").to_pylist()[0]
    q = 0.05
    quant = ks_exact(base, cur, "v", quantize=q).to_pylist()[0]
    # each value moves <= q/2, so |D_raw - D_q| <= max interval mass;
    # for N(0,1) the densest width-q interval holds ~q*0.4 mass
    assert abs(raw["ks_value"] - quant["ks_value"]) <= 2 * q * 0.45
    assert (quant["n_base"], quant["n_current"]) == (6000, 5000)
    # distinct quantized values are grid-bounded (vs ~11000 raw)
    grid = np.unique(np.round(np.concatenate(
        [base["v"].to_numpy(), cur["v"].to_numpy()]) / q) * q)
    assert len(grid) < 600
    # determinism: quantized stat is byte-stable across runs
    again = ks_exact(base, cur, "v", quantize=q).to_pylist()[0]
    assert again == quant


def test_ks_exact_auto_quantize(ray_session):
    """quantize='auto' stays BIT-EXACT at or under the distinct
    threshold (same result as quantize=None) and engages a
    deterministic grid above it; choose_auto_quantize is the seam."""
    import pytest as _pytest

    from data_validator_ray.stages.drift import (
        choose_auto_quantize,
        ks_exact,
    )

    rng = np.random.default_rng(29)
    base = pd.DataFrame({"v": rng.normal(0.0, 1.0, 4000)})
    cur = pd.DataFrame({"v": rng.normal(0.3, 1.0, 4000)})

    # ~8000 distinct << default threshold -> auto resolves to None
    assert choose_auto_quantize(base, cur, "v") is None
    exact = ks_exact(base, cur, "v").to_pylist()[0]
    auto = ks_exact(base, cur, "v", quantize="auto").to_pylist()[0]
    assert auto == exact

    # force the over-threshold branch: q is deterministic and the
    # quantized stat stays within the documented error envelope
    q1 = choose_auto_quantize(base, cur, "v", distinct_threshold=10)
    q2 = choose_auto_quantize(base, cur, "v", distinct_threshold=10)
    assert q1 is not None and q1 == q2
    quant = ks_exact(base, cur, "v", quantize=q1).to_pylist()[0]
    assert abs(quant["ks_value"] - exact["ks_value"]) <= 2 * q1 * 0.45

    with _pytest.raises(ValueError):
        ks_exact(base, cur, "v", quantize="bogus")


def test_psi_by_group_slices_and_one_sided_groups(ray_session):
    """A shift confined to one slice must show only in that slice, and
    a group present on one side only gets maximal drift, not a crash."""
    from data_validator_ray.stages.drift import psi_by_group

    rng = np.random.default_rng(5)
    base = pd.DataFrame(
        {
            "g": ["a"] * 2000 + ["b"] * 2000 + ["only_base"] * 50,
            "v": np.concatenate(
                [rng.uniform(0, 50, 2000), rng.uniform(0, 50, 2000),
                 rng.uniform(0, 50, 50)]
            ),
        }
    )
    cur = pd.DataFrame(
        {
            "g": ["a"] * 2000 + ["b"] * 2000,
            "v": np.concatenate(
                [rng.uniform(0, 50, 2000),
                 rng.uniform(50, 100, 2000)]  # b shifted entirely
            ),
        }
    )
    edges = [float(x) for x in range(0, 101, 10)]
    out = (
        psi_by_group(base, cur, "v", "g", edges)
        .to_pandas()
        .set_index("g")
    )
    assert out.loc["a", "psi_value"] < 0.1          # same distribution
    assert out.loc["b", "psi_value"] > 5.0           # total shift
    assert out.loc["only_base", "n_current"] == 0    # one-sided group
    assert out.loc["only_base", "psi_value"] > 5.0


def test_ks_by_group_one_sided_and_shift(ray_session):
    from data_validator_ray.stages.drift import ks_by_group

    rng = np.random.default_rng(7)
    base = pd.DataFrame(
        {
            "g": ["a"] * 1000 + ["b"] * 1000 + ["gone"] * 20,
            "v": np.concatenate(
                [rng.normal(0, 1, 1000), rng.normal(0, 1, 1000),
                 rng.normal(0, 1, 20)]
            ),
        }
    )
    cur = pd.DataFrame(
        {
            "g": ["a"] * 1000 + ["b"] * 1000,
            "v": np.concatenate(
                [rng.normal(0, 1, 1000), rng.normal(3, 1, 1000)]
            ),
        }
    )
    out = ks_by_group(base, cur, "v", "g").to_pandas().set_index("g")
    assert out.loc["a", "ks_value"] < 0.15
    assert out.loc["b", "ks_value"] > 0.8
    assert out.loc["gone", "ks_value"] == 1.0 and out.loc["gone", "n_current"] == 0


def test_chi2_categorical_detects_mix_shift(ray_session):
    """Shifted category mix yields a large chi2; identical mix yields
    ~0; a one-side-only category contributes its full expectation."""
    from data_validator_ray.stages.drift import chi2_categorical

    base = pd.DataFrame({"c": ["x"] * 500 + ["y"] * 500})
    same = pd.DataFrame({"c": ["x"] * 250 + ["y"] * 250})
    shifted = pd.DataFrame({"c": ["x"] * 900 + ["y"] * 100})
    low = chi2_categorical(base, same, "c").to_pandas()
    high = chi2_categorical(base, shifted, "c").to_pandas()
    assert low.chi2_value[0] == 0.0  # exact same proportions
    assert high.chi2_value[0] > 100
    assert int(high.dof[0]) == 1
    # vanished category: still counted, inflates the statistic
    gone = chi2_categorical(
        pd.DataFrame({"c": ["x"] * 400 + ["z"] * 100}),
        pd.DataFrame({"c": ["x"] * 400}), "c",
    ).to_pandas()
    assert int(gone.n_categories[0]) == 2 and gone.chi2_value[0] > 50


def test_chi2_categorical_null_and_degenerate(ray_session):
    from data_validator_ray.stages.drift import chi2_categorical

    base = pd.DataFrame({"c": ["x", None, "x", "y"]})
    cur = pd.DataFrame({"c": ["x", "y", None, None]})
    out = chi2_categorical(base, cur, "c").to_pandas()
    assert int(out.n_base[0]) == 3 and int(out.n_current[0]) == 2
    # single category on both sides -> dof 0, chi2 0
    one = chi2_categorical(
        pd.DataFrame({"c": ["x"] * 10}), pd.DataFrame({"c": ["x"] * 5}), "c"
    ).to_pandas()
    assert one.chi2_value[0] == 0.0 and int(one.dof[0]) == 0


def test_partition_anomaly_flags_planted_shard(ray_session):
    """A partition whose mean is shifted far from the others (and one
    with excess nulls) gets flagged; healthy partitions do not."""
    from data_validator_ray.stages.drift import partition_anomaly

    rng = np.random.default_rng(7)
    n, P = 8000, 8
    key = np.arange(n, dtype=np.int64)
    part = key % P
    val = rng.normal(100.0, 5.0, n)
    val[part == 3] += 500.0           # bad shard: mean way off
    vals = val.astype(object)
    null_mask = (part == 5) & (rng.random(n) < 0.5)
    vals[null_mask] = None            # bad shard: half the values null
    df = pd.DataFrame({"k": key, "v": vals})
    out = (
        partition_anomaly(df, "v", "k", num_partitions=P, mad_k=3.0)
        .to_pandas()
        .set_index("partition")
    )
    assert len(out) == P
    assert bool(out.loc[3, "is_anomaly"])
    assert bool(out.loc[5, "is_anomaly"])
    healthy = [p for p in range(P) if p not in (3, 5)]
    assert not out.loc[healthy, "is_anomaly"].any()
    assert out.loc[5, "null_rate"] > 0.3
    # determinism across batch layouts
    out2 = (
        partition_anomaly(
            ray.data.from_pandas(df).repartition(7), "v", "k",
            num_partitions=P, mad_k=3.0,
        )
        .to_pandas()
        .set_index("partition")
    )
    pd.testing.assert_frame_equal(out.sort_index(), out2.sort_index())


def test_wasserstein_exact_matches_numpy_reference(ray_session):
    from data_validator_ray.stages.drift import wasserstein_exact

    rng = np.random.default_rng(7)
    a = rng.normal(0, 1, 4000)
    b = rng.normal(0.4, 1.1, 3000)
    pts = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), pts, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), pts, side="right") / len(b)
    ref = round(float(np.sum(np.abs(fa - fb)[:-1] * np.diff(pts))), 6)
    out = wasserstein_exact(
        pd.DataFrame({"v": a}),
        pd.DataFrame({"v": b}),
        "v",
        num_buckets=8,
        batch_size=512,
    ).to_pylist()[0]
    assert abs(out["emd_value"] - ref) <= 1e-6
    assert (out["n_base"], out["n_current"]) == (4000, 3000)


def test_wasserstein_exact_closed_form_shift(ray_session):
    from data_validator_ray.stages.drift import wasserstein_exact

    # a pure location shift of a distribution has W1 == |shift|
    base = pd.DataFrame({"v": np.linspace(0.0, 10.0, 500)})
    cur = pd.DataFrame({"v": np.linspace(0.0, 10.0, 500) + 2.5})
    out = wasserstein_exact(base, cur, "v", num_buckets=4).to_pylist()[0]
    assert out["emd_value"] == 2.5

    # identical sides -> 0; empty side -> 0 with counts preserved
    out2 = wasserstein_exact(base, base.copy(), "v").to_pylist()[0]
    assert out2["emd_value"] == 0.0
    empty = pd.DataFrame({"v": pd.array([None], dtype="Float64")})
    out3 = wasserstein_exact(base, empty, "v").to_pylist()[0]
    assert out3["n_current"] == 0 and out3["emd_value"] == 0.0


def test_wasserstein_exact_ties_and_quantize(ray_session):
    from data_validator_ray.stages.drift import wasserstein_exact

    base = pd.DataFrame({"v": [1.0, 1.0, 2.0, None, 3.0]})
    cur = pd.DataFrame({"v": [1.0, 2.0, 2.0, 2.0]})
    # pts 1,2,3: Fa=[.5,.75,1], Fb=[.25,1,1]
    # W1 = .25*(2-1) + .25*(3-2) = 0.5
    out = wasserstein_exact(base, cur, "v").to_pylist()[0]
    assert out == {"n_base": 4, "n_current": 4, "emd_value": 0.5}

    # quantize snaps 1.04/0.96 onto the same 0.1-grid point
    b2 = pd.DataFrame({"v": [1.04, 2.0]})
    c2 = pd.DataFrame({"v": [0.96, 2.0]})
    outq = wasserstein_exact(b2, c2, "v", quantize=0.1).to_pylist()[0]
    assert outq["emd_value"] == 0.0


def test_js_fixed_bins_bounds_and_identity(ray_session):
    from data_validator_ray.stages.drift import js_fixed_bins

    a = pd.DataFrame({"v": np.linspace(0, 9.99, 500)})
    out = js_fixed_bins(a, a.copy(), "v", [2.0, 4.0, 6.0, 8.0]).to_pylist()[0]
    assert out["js_value"] == 0.0

    # fully disjoint distributions -> JS = ln 2 (bounded, no eps blowup)
    b = pd.DataFrame({"v": np.linspace(100.0, 109.0, 400)})
    out2 = js_fixed_bins(
        a, b, "v", [10.0, 50.0, 99.5]
    ).to_pylist()[0]
    assert out2["js_value"] == round(float(np.log(2)), 6)
    assert (out2["n_base"], out2["n_current"]) == (500, 400)

    # empty side -> 0 with counts preserved
    empty = pd.DataFrame({"v": pd.array([None], dtype="Float64")})
    out3 = js_fixed_bins(a, empty, "v", [5.0]).to_pylist()[0]
    assert out3["n_current"] == 0 and out3["js_value"] == 0.0
