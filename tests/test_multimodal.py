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
