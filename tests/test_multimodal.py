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
