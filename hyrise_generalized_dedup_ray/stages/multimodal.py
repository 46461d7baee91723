"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

Decode runs behind ``DecodeBackend`` with capability detection:

- ``"real"`` decodes actual media — PIL when importable, else the
  pure-numpy PNG codec (functions/png.py: zlib + the five scanline
  filters, 8-bit gray/RGB/GA/RGBA) for images, stdlib ``wave`` for
  PCM audio.  Features are computed from real pixels/samples
  (per-channel moments + dims), resize is PIL-or-nearest-neighbor
  with PNG re-encode.  Video needs a codec library (pyav/ffmpeg,
  absent here) and raises ``NotImplementedError`` at the exact call
  site; unsupported payloads raise ``UnsupportedImageError`` /
  ``ValueError`` with a clear message.
- ``"fake"`` (default) produces deterministic pseudo-decodes derived
  only from the payload bytes, so the Ray-side plumbing (schema,
  binary batches kept SMALL, actor signature, feature output layout)
  is testable without any media fixture.

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


def _detect_capabilities() -> dict:
    """Once-per-process probe of which media libraries exist (the
    actor-pool backends read this at ``__init__``, never per batch)."""
    caps = {"png_pure": True, "wav_pure": True}
    try:
        import PIL.Image  # noqa: F401
        caps["pil"] = True
    except ImportError:
        caps["pil"] = False
    try:
        import av  # noqa: F401
        caps["pyav"] = True
    except ImportError:
        caps["pyav"] = False
    return caps


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (int16 sample array [frames × channels], rate)
    via the stdlib ``wave`` module — no external library needed."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        rate = w.getframerate()
        nchan = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2")
    elif width == 1:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return samples.reshape(-1, nchan), rate


class DecodeBackend:
    """``"real"`` decodes actual media (capability-detected: PIL →
    pure-numpy PNG → error); ``"fake"`` is the deterministic stub."""

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.caps = _detect_capabilities() if mode == "real" else {}

    # -- real decode helpers ------------------------------------------

    def _decode_image(self, payload: bytes) -> np.ndarray:
        from hyrise_generalized_dedup_ray.functions.png import (
            decode_png, is_png)

        if self.caps.get("pil"):
            import io

            import PIL.Image
            return np.asarray(PIL.Image.open(io.BytesIO(payload)))
        if is_png(payload):
            return decode_png(payload)
        raise ValueError(
            "unsupported image payload (pure decoder handles PNG; "
            "install PIL for other formats)")

    def decode(self, media_type: str, payload: bytes) -> dict:
        if self.mode == "real":
            if media_type == "image":
                img = self._decode_image(payload)
                h, w = img.shape[:2]
                return {"width": int(w), "height": int(h), "frames": 1,
                        "sample_rate": 0}
            if media_type == "audio":
                samples, rate = _decode_wav(payload)
                return {"width": 0, "height": 0,
                        "frames": int(samples.shape[0]),
                        "sample_rate": int(rate)}
            raise NotImplementedError(
                "real video decode needs pyav/ffmpeg — not in this "
                "container")
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

    def features(self, payload: bytes,
                 media_type: str = "image") -> np.ndarray:
        """FEATURE_DIM float32 'embedding' — real mode computes moments
        of actual pixels/samples (mean/std per channel + log-dims), the
        stub a rolling digest."""
        if self.mode == "real":
            if media_type == "image":
                img = self._decode_image(payload).astype(np.float64)
                if img.ndim == 2:
                    img = img[:, :, None]
                mean = img.mean(axis=(0, 1))
                std = img.std(axis=(0, 1))
                vec = np.zeros(FEATURE_DIM, np.float64)
                k = min(3, img.shape[2])
                vec[:k] = mean[:k] / 255.0
                vec[3:3 + k] = std[:k] / 255.0
                vec[6] = np.log1p(img.shape[0]) / 12.0
                vec[7] = np.log1p(img.shape[1]) / 12.0
                return vec.astype(np.float32)
            if media_type == "audio":
                samples, rate = _decode_wav(payload)
                x = samples.astype(np.float64) / 32768.0
                flat = x.ravel()
                zc = float(np.mean(np.abs(np.diff(np.sign(flat))) > 0)) \
                    if len(flat) > 1 else 0.0
                vec = np.array([
                    flat.mean(), flat.std(),
                    np.abs(flat).mean(), np.abs(flat).max(initial=0.0),
                    zc, np.log1p(len(flat)) / 20.0,
                    x.shape[1] / 8.0, rate / 96000.0,
                ])
                return vec.astype(np.float32)
            raise NotImplementedError(
                "real video features need pyav/ffmpeg")
        digest = hashlib.blake2b(payload, digest_size=FEATURE_DIM * 4).digest()
        raw = np.frombuffer(digest, dtype=np.uint32).astype(np.float64)
        return (raw / np.float64(2**32)).astype(np.float32)

    def resize(self, payload: bytes, width: int, height: int) -> bytes:
        """Image resize to (width, height) — PIL when present, else
        decode + nearest-neighbor + PNG re-encode; the stub emits a
        deterministic payload of the right byte-budget (3 bytes/pixel)
        so downstream stages see realistic size distributions."""
        if self.mode == "real":
            if self.caps.get("pil"):
                import io

                import PIL.Image
                img = PIL.Image.open(io.BytesIO(payload))
                buf = io.BytesIO()
                img.resize((width, height)).save(buf, format="PNG")
                return buf.getvalue()
            from hyrise_generalized_dedup_ray.functions.png import (
                encode_png, resize_nearest)
            img = self._decode_image(payload)
            return encode_png(resize_nearest(img, width, height))
        seed = hashlib.blake2b(payload, digest_size=32).digest()
        need = width * height * 3
        reps = -(-need // len(seed))
        return (seed * reps)[:need]

    def sample_frames(self, payload: bytes, every: int) -> list[bytes]:
        """Video frame sampling (one frame per ``every``) — pyav
        keyframe walk when present; the stub derives each frame's
        bytes from (payload digest, frame index)."""
        if self.mode == "real":
            raise NotImplementedError(
                "real frame sampling needs pyav/ffmpeg — not in this "
                "container")
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
            feats[i] = self.backend.features(payloads[i], types[i])
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
