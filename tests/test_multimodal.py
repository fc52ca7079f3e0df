"""Multimodal actor-pool stages: decode / resize / frame-sample over
opaque binary payloads (deterministic fake codec — the real-codec swap
point is documented in pipelines/multimodal.py)."""

import struct

import numpy as np
import pytest

import ray
import ray.data

from data_validator_ray.pipelines import multimodal as M


@pytest.fixture(scope="module")
def media(ray_session, tmp_path_factory):
    out = tmp_path_factory.mktemp("media") / "media"
    M.write_media(out, n=60)
    return str(out)


def test_synth_media_deterministic(ray_session):
    a = M.synth_media_batch(np.arange(10))
    b = M.synth_media_batch(np.arange(10))
    assert a.equals(b)
    kinds = a["kind"].to_pylist()
    assert kinds[0] == "image" and kinds[1] == "audio" and kinds[2] == "video"


def test_image_decode_formulas(ray_session, media):
    out = M.decode_images(media).to_pandas().set_index("media_id").sort_index()
    assert len(out) == 20  # ids ≡ 0 mod 3
    for mid in out.index:
        w, h, c = (int(x) for x in M.img_dims(np.int64(mid)))
        assert out.loc[mid, "width"] == w
        assert out.loc[mid, "height"] == h
        assert out.loc[mid, "channels"] == c
        assert out.loc[mid, "n_bytes"] == 9 + w * h * c
    assert ((out.mean_pixel >= 0) & (out.mean_pixel <= 255)).all()


def test_audio_decode_formulas(ray_session, media):
    out = M.decode_audio(media).to_pandas().set_index("media_id").sort_index()
    assert len(out) == 20
    for mid in out.index:
        rate, n = (int(x) for x in M.aud_params(np.int64(mid)))
        assert out.loc[mid, "sample_rate"] == rate
        assert out.loc[mid, "n_samples"] == n
        assert out.loc[mid, "duration_ms"] == n * 1000 // rate
        assert out.loc[mid, "n_bytes"] == 12 + 2 * n


def test_frame_sampling_stride(ray_session, media):
    out = M.sample_video_frames(media, stride=2).to_pandas()
    for mid, g in out.groupby("media_id"):
        nf = int(M.vid_params(np.int64(mid)))
        assert sorted(g.frame_idx) == list(range(0, nf, 2))
        # every sampled frame is a decodable image block
        frame = g.frame_payload.iloc[0]
        assert frame[:4] == M.IMG_MAGIC


def test_resize_stage_roundtrip(ray_session, media):
    resized = M.resize_images(media, target=8).to_pandas()
    assert len(resized) == 20
    for _, r in resized.head(3).iterrows():
        buf = r.payload
        w, h, c = struct.unpack("<HHB", buf[4:9])
        assert (w, h) == (8, 8)
        assert len(buf) == 9 + 8 * 8 * c


def test_decode_rejects_wrong_payload():
    import pyarrow as pa

    bad = pa.table(
        {"media_id": pa.array([0], pa.int64()),
         "payload": pa.array([b"NOPE-garbage"], pa.binary())}
    )
    with pytest.raises(ValueError, match="FIMG"):
        M.ImageDecodeStage()(bad)


def test_image_decode_uses_real_codec_when_importable(ray_session):
    """Round-2 fix: a present imaging library must be USED for non-FIMG
    payloads (the old guard raised NotImplementedError whenever PIL was
    importable), and FIMG payloads must still use the fake parser."""
    import numpy as np
    import pyarrow as pa

    from data_validator_ray.pipelines.multimodal import (
        IMG_MAGIC,
        ImageDecodeStage,
        synth_media_batch,
    )

    class FakeImg:
        def __init__(self, arr):
            self._arr = arr

        def __array__(self, dtype=None, copy=None):
            return self._arr

    class FakePIL:
        @staticmethod
        def open(fp):
            data = np.frombuffer(fp.read(), np.uint8)
            side = int(np.sqrt(len(data) // 3))
            return FakeImg(data[: side * side * 3].reshape(side, side, 3))

    stage = ImageDecodeStage()
    stage._pil = FakePIL  # stubbed codec module

    # a non-FIMG payload routes through the codec
    raw = bytes(range(256)) * 3  # 16x16x3
    batch = pa.table(
        {
            "media_id": pa.array([7], pa.int64()),
            "payload": pa.array([raw], pa.binary()),
        }
    )
    out = stage(batch).to_pydict()
    assert out["width"] == [16] and out["height"] == [16]
    assert out["channels"] == [3]

    # FIMG payloads still take the fake parser even with a codec present
    fimg = synth_media_batch(np.array([0], np.int64))
    out2 = stage(fimg.select(["media_id", "payload"])).to_pydict()
    assert out2["media_id"] == [0]
    assert out2["width"] == [8]

    # no codec + non-FIMG → clear error, never NotImplementedError
    stage2 = ImageDecodeStage()
    stage2._pil = None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no imaging codec"):
        stage2(batch)


def _fimg(w, h, c, pix):
    import struct
    import numpy as np

    from data_validator_ray.pipelines.multimodal import IMG_MAGIC

    return IMG_MAGIC + struct.pack("<HHB", w, h, c) + np.asarray(
        pix, dtype=np.uint8
    ).tobytes()


def test_phash_near_dup_planted_and_perturbed(ray_session):
    """Byte-identical copies hash to hamming 0; a lightly perturbed
    copy stays within the banded search's reach; an unrelated image
    does not pair."""
    import numpy as np
    import pandas as pd

    from data_validator_ray.pipelines import multimodal as mm

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, size=24 * 24).astype(np.uint8)
    perturbed = base.copy()
    perturbed[:12] = (perturbed[:12] + 3) % 256  # tiny local change
    other = rng.integers(0, 256, size=24 * 24).astype(np.uint8)
    tbl = pd.DataFrame(
        {
            "media_id": [0, 1, 2, 3],
            "kind": ["image"] * 4,
            "payload": [
                _fimg(24, 24, 1, base),
                _fimg(24, 24, 1, base),       # exact copy
                _fimg(24, 24, 1, perturbed),  # near copy
                _fimg(24, 24, 1, other),      # unrelated
            ],
        }
    )
    ph = mm.phash_images(tbl).to_pandas().set_index("media_id")
    assert ph.loc[0, "phash"] == ph.loc[1, "phash"]
    from data_validator_ray.pipelines.dedup import popcount64

    d_near = popcount64(
        np.array([ph.loc[0, "phash"] ^ ph.loc[2, "phash"]], np.uint64)
    )[0]
    d_far = popcount64(
        np.array([ph.loc[0, "phash"] ^ ph.loc[3, "phash"]], np.uint64)
    )[0]
    assert d_near <= 3 < d_far
    pairs = mm.phash_near_dup(tbl, max_hamming=3)
    got = set(zip(pairs.id_a, pairs.id_b))
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    assert not any(3 in p for p in got)


def test_phash_synth_media_planted_dups(ray_session):
    """ids i and i+768 of the synthetic media table are byte-identical
    images (same dims mod 96, same pixels mod 256) — all must pair at
    hamming 0; the search is deterministic."""
    import pandas as pd

    from data_validator_ray.pipelines import multimodal as mm

    # default (1, 4) autoscaling pool must not deadlock the 4-CPU
    # test cluster (a FIXED 4-actor pool did — actors held every CPU
    # while the sort shuffle waited)
    pairs = mm.phash_near_dup(mm.synth_media_dataset(1200))
    got = set(zip(pairs.id_a, pairs.id_b))
    expect = [(i, i + 768) for i in range(0, 1200 - 768, 3)]
    assert all(p in got for p in expect)
    assert (pairs[pairs.id_b - pairs.id_a == 768].hamming == 0).all()
