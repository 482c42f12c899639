"""Multimodal column plumbing (north-rule extension).

Images / audio / video are opaque ``binary`` columns with typed metadata
columns alongside (``mm_type``, ``mm_width``/``mm_height`` or
``mm_sample_rate``, …). The Ray-side plumbing — schema, actor-pool stage
shape, small batch sizes for large payloads, output layout — is real and
tested; the actual codec work is STUBBED (the image/audio libraries are
not in this environment): ``decode_fn=None`` raises NotImplementedError,
and ``fake_decode=True`` swaps in a deterministic fake so pipelines can be
exercised end-to-end.

Scale notes: binary payloads make blocks heavy — these stages default to
``batch_size=64`` and ``batch_format="pyarrow"`` so payload bytes stay
zero-copy in the object store until the decode touches them.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING, Callable

import numpy as np
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

MM_SCHEMA_FIELDS = [
    ("mm_id", pa.int64()),
    ("mm_type", pa.string()),       # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("mm_meta", pa.string()),       # JSON metadata (dims, codec, sr, …)
]


def _fake_image_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake decode: payload bytes → pseudo 8x8 RGB image."""
    h = hashlib.blake2b(payload, digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(h, "big"))
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def _resolve_decode(decode_fn, fake_decode):
    """Shared decode-fn resolution for the image stages: explicit fn >
    deterministic fake > a loud stub (no imaging libs in this env)."""
    if decode_fn is not None:
        return decode_fn
    if fake_decode:
        return _fake_image_decode

    def _raise(_):
        raise NotImplementedError(
            "image decode requires an imaging library not present in "
            "this environment; pass decode_fn or fake_decode=True")
    return _raise


class ImageFeatureExtractor:
    """Actor-pool stage: decode → resize → feature vector.

    Real deployments pass ``decode_fn`` (e.g. PIL/torchvision decode) which
    is loaded ONCE per actor here in ``__init__``. Stub mode computes
    mean-channel features of the deterministic fake image.
    """

    def __init__(self, payload_col: str = "payload",
                 decode_fn: Callable[[bytes], np.ndarray] | None = None,
                 fake_decode: bool = False):
        self.payload_col = payload_col
        self.decode = _resolve_decode(decode_fn, fake_decode)

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = []
        for payload in t[self.payload_col].to_pylist():
            img = self.decode(payload if payload is not None else b"")
            feats.append(img.reshape(-1, img.shape[-1]).mean(axis=0).astype(np.float32))
        return t.append_column(
            "img_mean_rgb", pa.array([f.tolist() for f in feats],
                                     type=pa.list_(pa.float32())))


class AudioFrameSampler:
    """Actor-pool stage shape for audio: frame-sample metadata extraction.
    Stubbed identically to images (no audio codec available here)."""

    def __init__(self, payload_col: str = "payload", frame_ms: int = 10,
                 fake_decode: bool = False):
        self.payload_col = payload_col
        self.frame_ms = frame_ms
        self.fake = fake_decode

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "audio decode requires an audio library not present in this "
                "environment; pass fake_decode=True to exercise the plumbing")
        # 16 kHz mono s16le: sr * 2 bytes/sample * frame_ms / 1000
        frame_bytes = max(1, 16_000 * 2 * self.frame_ms // 1000)
        n_frames = [max(1, (len(p) if p else 0) // frame_bytes)
                    for p in t[self.payload_col].to_pylist()]
        return t.append_column("n_frames", pa.array(n_frames, type=pa.int64()))


class ImageResizer:
    """Actor-pool stage shape for decode→resize→re-encode. Stub resize is a
    deterministic nearest-neighbor subsample of the fake-decoded image; a
    real deployment passes decode_fn/encode_fn loaded once per actor."""

    def __init__(self, out_hw: tuple = (4, 4), payload_col: str = "payload",
                 decode_fn: Callable[[bytes], np.ndarray] | None = None,
                 fake_decode: bool = False):
        self.out_hw = tuple(out_hw)
        self.payload_col = payload_col
        self.decode = _resolve_decode(decode_fn, fake_decode)

    def __call__(self, t: pa.Table) -> pa.Table:
        h, w = self.out_hw
        outs = []
        for payload in t[self.payload_col].to_pylist():
            img = self.decode(payload if payload is not None else b"")
            yi = np.linspace(0, img.shape[0] - 1, h).round().astype(int)
            xi = np.linspace(0, img.shape[1] - 1, w).round().astype(int)
            outs.append(img[np.ix_(yi, xi)].tobytes())
        return (t.append_column("payload_resized", pa.array(outs, pa.binary()))
                 .append_column("resized_hw", pa.array([[h, w]] * t.num_rows,
                                                       pa.list_(pa.int32()))))


class VideoFrameSampler:
    """Actor-pool stage shape for video: sample every ``stride``-th frame's
    byte offset from the opaque payload (stub frame size = 1 KiB; a real
    deployment passes a demuxer loaded once per actor)."""

    def __init__(self, payload_col: str = "payload", stride: int = 4,
                 fake_decode: bool = False, frame_bytes: int = 1024):
        self.payload_col = payload_col
        self.stride = int(stride)
        self.fake = fake_decode
        self.frame_bytes = int(frame_bytes)

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video demux requires a codec library not present in this "
                "environment; pass fake_decode=True to exercise the plumbing")
        offs = []
        for p in t[self.payload_col].to_pylist():
            n = max(1, (len(p) if p else 0) // self.frame_bytes)
            offs.append(list(range(0, n, self.stride)))
        return t.append_column("frame_offsets",
                               pa.array(offs, pa.list_(pa.int64())))


def extract_image_features(ds: "ray.data.Dataset", *, fake_decode: bool = False,
                           decode_fn=None, concurrency=(1, 8),
                           batch_size: int = 64) -> "ray.data.Dataset":
    return ds.map_batches(
        ImageFeatureExtractor, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs=dict(decode_fn=decode_fn, fake_decode=fake_decode),
        concurrency=concurrency,
    )


def sample_audio_frames(ds: "ray.data.Dataset", *, fake_decode: bool = False,
                        concurrency=(1, 8), batch_size: int = 64) -> "ray.data.Dataset":
    return ds.map_batches(
        AudioFrameSampler, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs=dict(fake_decode=fake_decode),
        concurrency=concurrency,
    )


def resize_images(ds: "ray.data.Dataset", out_hw=(4, 4), *,
                  fake_decode: bool = False, decode_fn=None,
                  concurrency=(1, 8), batch_size: int = 64) -> "ray.data.Dataset":
    return ds.map_batches(
        ImageResizer, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs=dict(out_hw=out_hw, decode_fn=decode_fn,
                                   fake_decode=fake_decode),
        concurrency=concurrency,
    )


def sample_video_frames(ds: "ray.data.Dataset", stride: int = 4, *,
                        fake_decode: bool = False, concurrency=(1, 8),
                        batch_size: int = 64) -> "ray.data.Dataset":
    return ds.map_batches(
        VideoFrameSampler, batch_format="pyarrow", batch_size=batch_size,
        fn_constructor_kwargs=dict(stride=stride, fake_decode=fake_decode),
        concurrency=concurrency,
    )


def make_multimodal_dataset(n: int = 64, seed: int = 42) -> "ray.data.Dataset":
    """Deterministic synthetic multimodal table exercising the schema."""
    import ray.data as rd

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        rows.append({"mm_id": i, "mm_type": "image" if i % 2 == 0 else "audio",
                     "payload": payload,
                     "mm_meta": '{"w": 8, "h": 8}' if i % 2 == 0 else '{"sr": 16000}'})
    return rd.from_items(rows)
