"""Pure-numpy PNG codec (RFC 2083 / W3C PNG spec, public format).

The container ships no image library, but PNG's core path is just
zlib + per-row byte filters, so the "real" multimodal decode backend
(stages/multimodal.py) can decode and re-encode actual images without
PIL: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha) and
6 (RGBA), non-interlaced — the overwhelming majority of web PNGs.
Anything else raises ``UnsupportedImageError`` so callers can fall
back (to PIL when present, or to a clear error).

Reference analog: the reference's encoders actually encode
(lz4_encoder.hpp:40-59); this module is the same "the codec is real"
standard applied to the multimodal stage.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class UnsupportedImageError(ValueError):
    """Payload is not a PNG this pure decoder supports."""


def is_png(payload: bytes) -> bool:
    return payload[:8] == _SIG


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (height, width, channels) uint8 array."""
    if not is_png(payload):
        raise UnsupportedImageError("not a PNG signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    n = len(payload)
    while pos + 8 <= n:
        length, ctype = struct.unpack(">I4s", payload[pos:pos + 8])
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise UnsupportedImageError("missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise UnsupportedImageError(
            f"unsupported PNG (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}); this pure decoder handles 8-bit "
            "gray/RGB/gray-alpha/RGBA, non-interlaced")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise UnsupportedImageError("IDAT size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = rows[:, 0]
    data = rows[:, 1:].astype(np.int32)  # headroom for filter arithmetic
    out = np.zeros((height, stride), dtype=np.int32)
    bpp = ch  # bytes per pixel at depth 8
    for y in range(height):
        f = filters[y]
        cur = data[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if f == 0:                               # None
            out[y] = cur
        elif f == 1:                             # Sub
            acc = cur.copy()
            for x in range(bpp, stride):         # serial by definition
                acc[x] = (acc[x] + acc[x - bpp]) & 0xFF
            out[y] = acc
        elif f == 2:                             # Up
            out[y] = (cur + prev) & 0xFF
        elif f == 3:                             # Average
            acc = cur.copy()
            for x in range(stride):
                left = acc[x - bpp] if x >= bpp else 0
                acc[x] = (acc[x] + ((left + prev[x]) >> 1)) & 0xFF
            out[y] = acc
        elif f == 4:                             # Paeth
            acc = cur.copy()
            for x in range(stride):
                a = acc[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else \
                    (b if pb <= pc else c)
                acc[x] = (acc[x] + pred) & 0xFF
            out[y] = acc
        else:
            raise UnsupportedImageError(f"unknown filter {f}")
    return out.astype(np.uint8).reshape(height, width, ch)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(img: np.ndarray) -> bytes:
    """(height, width[, channels]) uint8 array → PNG bytes (filter 0
    rows, one zlib stream) — small output, maximally compatible."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise UnsupportedImageError(f"cannot encode {ch}-channel image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * ch)], axis=1)
    idat = zlib.compress(rows.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) \
        + _chunk(b"IEND", b"")


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize — one fancy-index, no loops."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return img[ys][:, xs]
