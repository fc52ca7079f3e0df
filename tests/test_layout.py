"""Z-order layout: Morton key correctness, NULL contract, and the
locality property that justifies it (a 2-D box query after z-sort
touches fewer row blocks than after a 1-D sort)."""

import numpy as np
import pandas as pd
import pytest

from data_validator_ray.pipelines.layout import zorder_key, zorder_sort


def test_zorder_key_interleave_known_bits():
    # grids already integer in [0, 255]: scaling with mins=0, maxs=255
    # is identity; z(g0=0b101, g1=0b011) interleaves to
    # bit(2b)=g0_b, bit(2b+1)=g1_b -> 0b011011 = 27... compute directly
    a = np.array([5.0])   # 0b101
    b = np.array([3.0])   # 0b011
    z = zorder_key([a, b], [0.0, 0.0], [255.0, 255.0], bits=8)
    expected = 0
    for bit in range(8):
        expected |= ((5 >> bit) & 1) << (2 * bit)
        expected |= ((3 >> bit) & 1) << (2 * bit + 1)
    assert z[0] == expected

    # NaN in any dimension -> sentinel max key
    z2 = zorder_key(
        [np.array([np.nan]), np.array([1.0])],
        [0.0, 0.0], [255.0, 255.0], bits=8,
    )
    assert z2[0] == 2**63 - 1

    # degenerate span (constant column) -> grid 0, no crash
    z3 = zorder_key(
        [np.array([7.0, 7.0]), np.array([0.0, 255.0])],
        [7.0, 0.0], [7.0, 255.0], bits=8,
    )
    assert z3[0] == 0

    with pytest.raises(ValueError, match="63-bit"):
        zorder_key([a] * 8, [0.0] * 8, [255.0] * 8, bits=16)


def test_zorder_sort_improves_2d_block_pruning(ray_session):
    # deterministic 64x64 grid of points, shuffled by a hash order
    n = 64
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    df = pd.DataFrame({
        "x": xs.ravel().astype(float), "y": ys.ravel().astype(float),
    })
    df["id"] = (df["x"].astype(int) * 2654435761 + df["y"].astype(int)) % 4096
    df = df.sort_values("id").reset_index(drop=True)

    out = zorder_sort(df, ["x", "y"], bits=8).to_pandas()
    assert len(out) == len(df)

    def blocks_touched(frame, bx=(10, 20), by=(30, 40), nblocks=32):
        hit = 0
        for blk in np.array_split(frame.index.to_numpy(), nblocks):
            part = frame.loc[blk]
            if (
                part["x"].min() <= bx[1] and part["x"].max() >= bx[0]
                and part["y"].min() <= by[1] and part["y"].max() >= by[0]
            ):
                hit += 1
        return hit

    z_hits = blocks_touched(out.reset_index(drop=True))
    x_hits = blocks_touched(
        df.sort_values(["x", "y"]).reset_index(drop=True)
    )
    id_hits = blocks_touched(df.reset_index(drop=True))
    # z-order prunes on BOTH dimensions: better than hash order and at
    # least as good as the single-column sort for a 2-D box
    assert z_hits < id_hits
    assert z_hits <= x_hits


def test_zorder_sort_keeps_nulls_last(ray_session):
    df = pd.DataFrame(
        {"x": [1.0, None, 3.0, 2.0], "y": [1.0, 2.0, 3.0, 4.0],
         "i": [0, 1, 2, 3]}
    )
    out = zorder_sort(df, ["x", "y"], bits=8, keep_key=True).to_pandas()
    assert out.iloc[-1]["i"] == 1 and out.iloc[-1]["__z"] == 2**63 - 1


def test_compact_files_preserves_content(ray_session, tmp_path):
    """Compaction reduces file count and the order-independent
    checksum of the output equals the input's."""
    import ray.data

    from data_validator_ray.pipelines.integrity import table_checksum
    from data_validator_ray.pipelines.layout import compact_files

    df = pd.DataFrame(
        {"id": range(1000), "s": [f"v{i % 7}" for i in range(1000)]}
    )
    frag = str(tmp_path / "frag")
    ray.data.from_pandas(df).repartition(20).write_parquet(frag)
    out = str(tmp_path / "compact")
    res = compact_files(frag, out, ["id", "s"], target_rows_per_file=500)
    assert res["n_files_in"] == 20 and res["n_files_out"] == 2
    assert res["n_rows"] == 1000
    chk_in = table_checksum(frag, ["id", "s"])
    assert res["checksum"] == int(chk_in["checksum"].iloc[0])


def test_storage_profile_and_pruning_report(ray_session, tmp_path):
    """Footer-only facts: per-column byte totals sum over files; a
    sorted layout prunes range filters that an unsorted one cannot."""
    import ray.data

    from data_validator_ray.pipelines.layout import (
        pruning_report,
        storage_profile,
    )

    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {"v": rng.permutation(10_000).astype(float),
         "s": [f"row{i}" for i in range(10_000)]}
    )
    unsorted_dir = str(tmp_path / "unsorted")
    ray.data.from_pandas(df).repartition(8).write_parquet(unsorted_dir)

    prof = storage_profile(unsorted_dir)
    assert set(prof.column) == {"v", "s"}
    assert (prof.compressed_bytes > 0).all()
    assert abs(prof.share_of_table.sum() - 1.0) < 1e-6

    before = pruning_report(unsorted_dir, "v", 100.0, 200.0).iloc[0]
    assert before.row_groups_read == before.row_groups_total  # no luck

    sorted_dir = str(tmp_path / "sorted")
    ray.data.from_pandas(df).sort("v").repartition(8).write_parquet(
        sorted_dir
    )
    after = pruning_report(sorted_dir, "v", 100.0, 200.0).iloc[0]
    assert after.row_groups_read < after.row_groups_total  # real pruning
    assert after.rows_read < before.rows_read


def test_canary_check_missing_dup_and_corrupt(ray_session):
    """Missing canary -> 0 copies / no match; duplicated canary
    counted; corrupted content fails the md5."""
    import hashlib

    from data_validator_ray.pipelines.integrity import canary_check

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    df = pd.DataFrame(
        {
            "id": [1, 2, 2, 3, 4],
            "text": ["alpha", "beta", "beta", "CORRUPTED", None],
        }
    )
    out = canary_check(
        df, "id", "text",
        {1: md5("alpha"), 2: md5("beta"), 3: md5("gamma"), 9: md5("x")},
    ).set_index("canary_id")
    assert out.loc["1"].n_copies == 1 and out.loc["1"].md5_matches
    assert out.loc["2"].n_copies == 2 and out.loc["2"].md5_matches
    assert out.loc["3"].n_copies == 1 and not out.loc["3"].md5_matches
    assert out.loc["9"].n_copies == 0 and not out.loc["9"].md5_matches
