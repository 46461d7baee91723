"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The decode kernels themselves are STUBBED — the image/audio libraries
are not in this container — behind ``DecodeBackend``: the ``"real"``
backend raises ``NotImplementedError`` at the exact call site where
PIL/ffmpeg would run; the default ``"fake"`` backend produces
deterministic pseudo-decodes derived only from the payload bytes, so
the Ray-side plumbing (schema, binary batches kept SMALL, actor
signature, feature output layout) is real and tested end-to-end.

Scale notes baked into the defaults: binary payloads dominate batch
memory, so ``batch_size`` is rows-small (256) regardless of row count
heuristics, and payloads are dropped from the output (features +
metadata only) so no downstream shuffle ever carries bytes — the same
"drop the html column at extraction" rule as the flagship
(stages/extract.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),     # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("meta", pa.string()),           # JSON sidecar (codec, claimed dims, …)
])

FEATURE_DIM = 8


class DecodeBackend:
    """Seam where a real decoder (PIL / soundfile / pyav) would plug in."""

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode

    def decode(self, media_type: str, payload: bytes) -> dict:
        if self.mode == "real":
            raise NotImplementedError(
                "real decode needs PIL/soundfile/pyav — not in this container; "
                "instantiate DecodeBackend('fake') for the deterministic stub"
            )
        # deterministic pseudo-decode: all values derive from payload bytes
        digest = hashlib.blake2b(payload, digest_size=16).digest()
        h = np.frombuffer(digest, dtype=np.uint64)
        if media_type == "image":
            width = 64 + int(h[0] % 1985)
            height = 64 + int(h[1] % 1025)
            return {"width": width, "height": height, "frames": 1,
                    "sample_rate": 0}
        if media_type == "audio":
            return {"width": 0, "height": 0, "frames": len(payload) // 4,
                    "sample_rate": 16000}
        return {"width": 320, "height": 240,
                "frames": 1 + int(h[0] % 300), "sample_rate": 0}

    def features(self, payload: bytes) -> np.ndarray:
        """FEATURE_DIM float32 'embedding' of the payload — deterministic
        rolling digest in the stub; a CNN/fbank forward pass for real."""
        if self.mode == "real":
            raise NotImplementedError("real feature extraction not available")
        digest = hashlib.blake2b(payload, digest_size=FEATURE_DIM * 4).digest()
        raw = np.frombuffer(digest, dtype=np.uint32).astype(np.float64)
        return (raw / np.float64(2**32)).astype(np.float32)

    def resize(self, payload: bytes, width: int, height: int) -> bytes:
        """Image resize to (width, height) — PIL thumbnail+reencode for
        real; the stub emits a deterministic payload of the right
        byte-budget (3 bytes/pixel) derived from the source digest, so
        downstream stages see realistic size distributions."""
        if self.mode == "real":
            raise NotImplementedError("real resize needs PIL")
        seed = hashlib.blake2b(payload, digest_size=32).digest()
        need = width * height * 3
        reps = -(-need // len(seed))
        return (seed * reps)[:need]

    def sample_frames(self, payload: bytes, every: int) -> list[bytes]:
        """Video frame sampling (one frame per ``every``) — pyav keyframe
        walk for real; the stub derives each frame's bytes from
        (payload digest, frame index)."""
        if self.mode == "real":
            raise NotImplementedError("real frame sampling needs pyav")
        info = self.decode("video", payload)
        idxs = range(0, info["frames"], max(every, 1))
        base = hashlib.blake2b(payload, digest_size=16).digest()
        return [hashlib.blake2b(base + i.to_bytes(4, "little"),
                                digest_size=64).digest() for i in idxs]


class MediaDecodeActor:
    """Actor-pool UDF: backend constructed ONCE per actor; per batch it
    decodes, extracts features, and DROPS the payload column."""

    def __init__(self, mode: str = "fake"):
        self.backend = DecodeBackend(mode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        n = len(ids)
        width = np.zeros(n, np.int64)
        height = np.zeros(n, np.int64)
        frames = np.zeros(n, np.int64)
        rate = np.zeros(n, np.int64)
        nbytes = np.zeros(n, np.int64)
        feats = np.zeros((n, FEATURE_DIM), np.float32)
        for i in range(n):          # per-row: each decode is an opaque call
            info = self.backend.decode(types[i], payloads[i])
            width[i], height[i] = info["width"], info["height"]
            frames[i], rate[i] = info["frames"], info["sample_rate"]
            nbytes[i] = len(payloads[i])
            feats[i] = self.backend.features(payloads[i])
        offs = pa.array(np.arange(0, (n + 1) * FEATURE_DIM, FEATURE_DIM,
                                  dtype=np.int32))
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "media_type": pa.array(types, type=pa.string()),
            "n_bytes": pa.array(nbytes, type=pa.int64()),
            "width": pa.array(width, type=pa.int64()),
            "height": pa.array(height, type=pa.int64()),
            "frames": pa.array(frames, type=pa.int64()),
            "sample_rate": pa.array(rate, type=pa.int64()),
            "features": pa.ListArray.from_arrays(
                offs, pa.array(feats.ravel(), type=pa.float32())),
        })


def decode_media(
    media: Dataset,
    mode: str = "fake",
    batch_size: int = 256,
    concurrency: tuple[int, int] = (1, 8),
) -> Dataset:
    """media(media_id, media_type, payload, meta) → decoded metadata +
    FEATURE_DIM features; payload dropped at the stage boundary."""
    return media.map_batches(
        MediaDecodeActor, fn_constructor_args=(mode,),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1,
    )


class MediaResizeActor:
    """Actor-pool UDF: resize every image payload to a fixed target —
    payload-in/payload-out stage (unlike decode, the binary column
    SURVIVES here because resize feeds further media stages; keep
    ``batch_size`` small)."""

    def __init__(self, width: int, height: int, mode: str = "fake"):
        self.backend = DecodeBackend(mode)
        self.w, self.h = int(width), int(height)

    def __call__(self, batch: pa.Table) -> pa.Table:
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out = [self.backend.resize(p, self.w, self.h) if t == "image" else p
               for t, p in zip(types, payloads)]
        i = batch.column_names.index("payload")
        return batch.set_column(i, "payload",
                                pa.array(out, type=pa.binary()))


def resize_images(media: Dataset, width: int, height: int,
                  mode: str = "fake", batch_size: int = 256,
                  concurrency: tuple[int, int] = (1, 8)) -> Dataset:
    """Resize the image rows of a media table to (width, height);
    non-image rows pass through untouched."""
    return media.map_batches(
        MediaResizeActor, fn_constructor_args=(width, height, mode),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)


class FrameSampleActor:
    """Actor-pool UDF: explode each video row into one row per sampled
    frame (media_id, frame_idx, frame payload) — the fan-out stage a
    video pipeline feeds into per-frame decode/feature stages."""

    def __init__(self, every: int, mode: str = "fake"):
        self.backend = DecodeBackend(mode)
        self.every = int(every)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_idx, out_fr = [], [], []
        for mid, t, p in zip(ids, types, payloads):
            if t != "video":
                continue
            frames = self.backend.sample_frames(p, self.every)
            out_id.extend([int(mid)] * len(frames))
            out_idx.extend(range(len(frames)))
            out_fr.extend(frames)
        return pa.table({
            "media_id": pa.array(out_id, type=pa.int64()),
            "frame_idx": pa.array(out_idx, type=pa.int64()),
            "frame": pa.array(out_fr, type=pa.binary()),
        })


def sample_video_frames(media: Dataset, every: int = 30,
                        mode: str = "fake", batch_size: int = 64,
                        concurrency: tuple[int, int] = (1, 8)) -> Dataset:
    """Video rows → one row per sampled frame (every ``every``-th)."""
    return media.map_batches(
        FrameSampleActor, fn_constructor_args=(every, mode),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency, num_cpus=1)


def documents_as_media(documents: Dataset) -> Dataset:
    """Deterministic media table derived from the documents fixture:
    text bytes become the opaque payload (media_type round-robins by
    doc_id).  Exists so the multimodal plumbing has a reproducible
    input in this container."""
    kinds = ("image", "audio", "video")

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "media_type": pa.array([kinds[int(i) % 3] for i in ids],
                                   type=pa.string()),
            "payload": pa.array([t.encode("utf-8") for t in texts],
                                type=pa.binary()),
            "meta": pa.array(["{}"] * len(ids), type=pa.string()),
        })

    return documents.map_batches(to_media, batch_format="pyarrow",
                                 zero_copy_batch=True)
