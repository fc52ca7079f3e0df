"""Multimodal (image/audio/video) columns as opaque binary + metadata.

Net-new vs the reference. The pattern the north star needs at 100 TB:
media payloads are opaque ``binary`` columns; decode / feature-extract
/ resize / frame-sample are **actor-pool** ``map_batches`` stages
(codec state loads once per actor in ``__init__``), with SMALL batch
sizes so (batch × concurrency × payload) fits worker heaps.

The real image/audio codecs (PIL / soundfile / av) are not in this
container, so decode is STUBBED behind an import-try: when the library
is absent each stage falls back to a deterministic fake codec that
parses this module's own synthetic payload format. The Ray-side
plumbing — schema, batch sizing, actor signatures, output layout — is
real and tested; swap ``_decode_fake_*`` for the real codec call and
nothing else changes.

Synthetic payload format (deterministic in ``media_id``):

* image: ``b"FIMG"`` + width:u16 + height:u16 + channels:u8 +
  (w·h·c) pixel bytes where pixel[i] = (media_id + i) mod 256
* audio: ``b"FAUD"`` + sample_rate:u32 + n_samples:u32 +
  2·n_samples sample bytes
* video: ``b"FVID"`` + n_frames:u16 + per-frame FIMG blocks

Metadata formulas are simple functions of ``media_id`` so a DuckDB
oracle can verify the full decode round-trip exactly.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .dedup import _as_dataset

Dataset = ray.data.Dataset

IMG_MAGIC, AUD_MAGIC, VID_MAGIC = b"FIMG", b"FAUD", b"FVID"

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
    ]
)


# ---- deterministic metadata formulas (shared with the SQL oracle) --------- #

def img_dims(media_id: np.ndarray):
    w = 8 + media_id % 32
    h = 8 + (media_id * 7) % 32
    c = 1 + media_id % 3
    return w, h, c


def aud_params(media_id: np.ndarray):
    rate = 8000 + (media_id % 4) * 4000
    n = 256 + (media_id * 13) % 1024
    return rate, n


def vid_params(media_id: np.ndarray):
    return 4 + media_id % 8  # n_frames


# ---- synthetic media table ------------------------------------------------ #

def synth_media_batch(ids: np.ndarray) -> pa.Table:
    """One payload per id: images (id%3==0), audio (id%3==1), video
    (id%3==2). The byte-building loop is the generator, not a hot
    pipeline stage."""
    kinds: List[str] = []
    payloads: List[bytes] = []
    for mid in ids.tolist():
        m = mid % 3
        if m == 0:
            w, h, c = (int(x) for x in img_dims(np.int64(mid)))
            pix = ((mid + np.arange(w * h * c)) % 256).astype(np.uint8)
            payloads.append(
                IMG_MAGIC + struct.pack("<HHB", w, h, c) + pix.tobytes()
            )
            kinds.append("image")
        elif m == 1:
            rate, n = (int(x) for x in aud_params(np.int64(mid)))
            samples = ((mid * 31 + np.arange(2 * n)) % 256).astype(np.uint8)
            payloads.append(
                AUD_MAGIC + struct.pack("<II", rate, n) + samples.tobytes()
            )
            kinds.append("audio")
        else:
            nf = int(vid_params(np.int64(mid)))
            w, h, c = (int(x) for x in img_dims(np.int64(mid)))
            frame_pix = ((mid + np.arange(w * h * c)) % 256).astype(np.uint8)
            frame = IMG_MAGIC + struct.pack("<HHB", w, h, c) + frame_pix.tobytes()
            payloads.append(VID_MAGIC + struct.pack("<H", nf) + frame * nf)
            kinds.append("video")
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array(kinds, pa.string()),
            pa.array(payloads, pa.binary()),
        ],
        schema=MEDIA_SCHEMA,
    )


def synth_media_dataset(n: int = 500, *, batch_size: int = 256) -> Dataset:
    """Deterministic media table of n rows, generated distributed."""

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        return synth_media_batch(ids)

    return ray.data.range(n).map_batches(
        gen, batch_format="pyarrow", batch_size=batch_size
    )


def write_media(out_dir: "str | Path", n: int = 500) -> str:
    out = Path(out_dir)
    if not out.exists():
        tmp = out.with_suffix(".tmp")
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        synth_media_dataset(n).write_parquet(str(tmp))
        tmp.rename(out)
    return str(out)


# ---- decode stages (actor pools) ----------------------------------------- #

def _try_import_pil():
    try:  # pragma: no cover — not in this container
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


class ImageDecodeStage:
    """Actor-pool stage: decode image payloads → (media_id, width,
    height, channels, n_bytes, mean_pixel). Codec chosen ONCE per actor
    in ``__init__``. Payload dispatch (round-1 verdict fix — the guard
    used to raise when PIL *was* importable):

    * ``FIMG`` magic → the deterministic fake-format parser (always);
    * anything else → ``PIL.Image.open`` when PIL is importable
      (real JPEG/PNG path), else a clear ValueError.
    """

    def __init__(self):
        self._pil = _try_import_pil()

    def _decode_fake(self, buf: bytes):
        if buf[:4] != IMG_MAGIC:
            raise ValueError("not a FIMG payload")
        w, h, c = struct.unpack("<HHB", buf[4:9])
        pix = np.frombuffer(buf[9 : 9 + w * h * c], dtype=np.uint8)
        return w, h, c, pix

    def _decode(self, buf: bytes):
        if buf[:4] == IMG_MAGIC:
            return self._decode_fake(buf)
        if self._pil is not None:
            import io

            img = self._pil.open(io.BytesIO(buf))
            arr = np.asarray(img)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            h, w, c = arr.shape
            return w, h, c, np.ascontiguousarray(arr).reshape(-1)
        raise ValueError(
            "unsupported image payload (no FIMG magic) and no imaging "
            "codec importable"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        rows = {k: [] for k in ("media_id", "width", "height", "channels",
                                "n_bytes", "mean_pixel")}
        for mid, buf in zip(ids.tolist(), batch["payload"].to_pylist()):
            w, h, c, pix = self._decode(buf)
            rows["media_id"].append(mid)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["channels"].append(c)
            rows["n_bytes"].append(len(buf))
            rows["mean_pixel"].append(float(pix.mean()) if pix.size else 0.0)
        return pa.table(
            {
                "media_id": pa.array(rows["media_id"], pa.int64()),
                "width": pa.array(rows["width"], pa.int64()),
                "height": pa.array(rows["height"], pa.int64()),
                "channels": pa.array(rows["channels"], pa.int64()),
                "n_bytes": pa.array(rows["n_bytes"], pa.int64()),
                "mean_pixel": pa.array(rows["mean_pixel"], pa.float64()),
            }
        )


class ImageResizeStage:
    """Actor-pool stage: nearest-neighbor resize to (target, target) on
    the fake pixel buffer — the real implementation swaps the numpy
    index-gather for the codec's resampler, same signature/layout."""

    def __init__(self, target: int = 8):
        self.target = target
        self._decode = ImageDecodeStage()._decode_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_ids, out_payloads = [], []
        t = self.target
        for mid, buf in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            w, h, c, pix = self._decode(buf)
            img = pix.reshape(h, w, c)
            yi = (np.arange(t) * h // t)[:, None]
            xi = (np.arange(t) * w // t)[None, :]
            small = img[yi, xi, :]
            out_ids.append(mid)
            out_payloads.append(
                IMG_MAGIC + struct.pack("<HHB", t, t, c) + small.tobytes()
            )
        return pa.table(
            {
                "media_id": pa.array(out_ids, pa.int64()),
                "payload": pa.array(out_payloads, pa.binary()),
            }
        )


class AudioDecodeStage:
    """Actor-pool stage: audio payloads → (media_id, sample_rate,
    n_samples, duration_ms, n_bytes)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("media_id", "sample_rate", "n_samples",
                                "duration_ms", "n_bytes")}
        for mid, buf in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            if buf[:4] != AUD_MAGIC:
                raise ValueError("not a FAUD payload")
            rate, n = struct.unpack("<II", buf[4:12])
            rows["media_id"].append(mid)
            rows["sample_rate"].append(rate)
            rows["n_samples"].append(n)
            rows["duration_ms"].append(n * 1000 // rate)
            rows["n_bytes"].append(len(buf))
        return pa.table(
            {k: pa.array(v, pa.int64()) for k, v in rows.items()}
        )


class FrameSampleStage:
    """Actor-pool stage: sample every ``stride``-th frame of video
    payloads → one row per sampled frame (media_id, frame_idx,
    frame_payload)."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_ids, out_idx, out_frames = [], [], []
        for mid, buf in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            if buf[:4] != VID_MAGIC:
                raise ValueError("not a FVID payload")
            (nf,) = struct.unpack("<H", buf[4:6])
            body = buf[6:]
            frame_len = len(body) // nf if nf else 0
            for fi in range(0, nf, self.stride):
                out_ids.append(mid)
                out_idx.append(fi)
                out_frames.append(body[fi * frame_len : (fi + 1) * frame_len])
        return pa.table(
            {
                "media_id": pa.array(out_ids, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int64()),
                "frame_payload": pa.array(out_frames, pa.binary()),
            }
        )


# ---- pipelines ------------------------------------------------------------ #

def _kind(ds: Dataset, kind: str) -> Dataset:
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], kind)),
        batch_format="pyarrow",
    )


def decode_images(
    source: Any, *, concurrency: int = 2, batch_size: int = 128
) -> Dataset:
    """Image metadata/features via the actor-pool decode stage. Small
    ``batch_size`` — payload bytes, not row count, bound worker heap."""
    ds = _kind(_as_dataset(source), "image")
    return ds.map_batches(
        ImageDecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_audio(
    source: Any, *, concurrency: int = 2, batch_size: int = 128
) -> Dataset:
    ds = _kind(_as_dataset(source), "audio")
    return ds.map_batches(
        AudioDecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_video_frames(
    source: Any, *, stride: int = 2, concurrency: int = 2, batch_size: int = 64
) -> Dataset:
    ds = _kind(_as_dataset(source), "video")
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_images(
    source: Any, *, target: int = 8, concurrency: int = 2, batch_size: int = 64
) -> Dataset:
    ds = _kind(_as_dataset(source), "image")
    return ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"target": target},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class PHashStage:
    """Actor-pool stage: 64-bit perceptual hash (pHash) per image —
    grayscale → 32×32 nearest resize → 2-D DCT-II → low-frequency 8×8
    block → median-threshold sign bits. Near-identical pixels map to
    near-identical bits, so image NEAR-dup reduces to a Hamming search
    over 64-bit hashes (same backend as text SimHash).

    The DCT basis matrix is built ONCE per actor in ``__init__`` (the
    stateful-stage pattern); per batch the work is one (n, 1024) ×
    (1024→8×8) pair of matmuls — vectorized across the whole batch,
    no per-image DCT calls. Decode dispatches like
    :class:`ImageDecodeStage` (fake FIMG always; PIL when importable).
    """

    SIZE = 32
    BLOCK = 8

    def __init__(self):
        self._decode = ImageDecodeStage()._decode
        n, b = self.SIZE, self.BLOCK
        # orthonormal DCT-II basis, rows = frequencies
        k = np.arange(n)
        self._D = np.sqrt(2.0 / n) * np.cos(
            np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n)
        )
        self._D[0] *= np.sqrt(0.5)
        self._b = b

    def _gray32(self, buf: bytes) -> np.ndarray:
        w, h, c, pix = self._decode(buf)
        img = pix.reshape(h, w, c).astype(np.float64).mean(axis=2)
        t = self.SIZE
        yi = (np.arange(t) * h // t)[:, None]
        xi = (np.arange(t) * w // t)[None, :]
        return img[yi, xi]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        grays = np.stack(
            [self._gray32(buf) for buf in batch["payload"].to_pylist()]
        ) if batch.num_rows else np.zeros((0, self.SIZE, self.SIZE))
        # batched 2-D DCT: D @ G @ D.T for every image at once
        coef = np.einsum("ij,njk,lk->nil", self._D, grays, self._D)
        b = self._b
        block = coef[:, :b, :b].reshape(len(ids), -1)
        # median over the 63 AC coefficients (DC dominates and would
        # push every other bit below threshold)
        ac = block[:, 1:]
        med = np.median(ac, axis=1, keepdims=True)
        bits = (ac > med).astype(np.uint64)
        weights = np.uint64(1) << np.arange(63, dtype=np.uint64)
        ph = (bits * weights[None, :]).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64), pa.int64()),
                "phash": pa.array(ph, pa.uint64()),
            }
        )


def phash_images(
    source: Any, *, batch_size: int = 64, concurrency: Any = (1, 4)
) -> Dataset:
    """Per-image 64-bit perceptual hash (images only); actor pool with
    the decode/DCT state built once per actor."""
    # autoscaling (min, max) pool: a FIXED pool the size of the
    # cluster can hold every CPU while a downstream shuffle waits —
    # deadlock on small clusters (seen at 4 CPUs); (1, 4) always leaves
    # the executor room to drain
    return _kind(_as_dataset(source), "image").map_batches(
        PHashStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def phash_near_dup(
    source: Any,
    *,
    max_hamming: int = 3,
    batch_size: int = 64,
    concurrency: Any = (1, 4),
    num_buckets: int = 128,
) -> "pd.DataFrame":
    """Image near-duplicate pairs: pHash + the shared 4×16-bit banded
    Hamming search (``dedup.hamming_pairs_from_hashes``) — recall is
    EXACT for max_hamming ≤ 3 by pigeonhole. Exchange is (chunk, id,
    hash) rows, never pixels; the only per-payload pass is the hash
    stage itself. The multimodal dedup tier: exact-byte dedup can't
    see re-encoded/resized copies, embedding dedup needs a model —
    pHash is the deterministic middle tier."""
    from .dedup import hamming_pairs_from_hashes

    hashes = phash_images(
        source, batch_size=batch_size, concurrency=concurrency
    )
    return hamming_pairs_from_hashes(
        hashes, "media_id", hash_col="phash",
        max_hamming=max_hamming, num_buckets=num_buckets,
    )
