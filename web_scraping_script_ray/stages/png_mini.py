"""Minimal pure-stdlib PNG codec (zlib + struct + numpy) — the
always-available third codec behind the multimodal seam.

The image containers this engine targets (PIL, in richer environments;
reference: src/media_downloader.py:195-200) are not importable in every
deployment, which left the REAL decode/resize kernels perpetually
skipped in CI.  PNG's format is simple enough to implement from the
public spec with nothing but ``zlib`` (stdlib) and numpy, so this module
provides:

- ``encode_png(arr)`` — 8-bit gray / RGB / RGBA, filter 0 scanlines,
  one zlib IDAT.  Deterministic bytes for a given array.
- ``decode_png(payload)`` — non-interlaced 8-bit gray/RGB/RGBA with ALL
  five scanline filters reconstructed, so PNGs produced by other
  encoders (e.g. PIL's default Paeth-heavy output) decode too.
- ``resize_nearest(arr, ow, oh)`` — deterministic nearest-neighbor
  resampling for the no-PIL resize path.

Scope is deliberately narrow (it is a codec-seam backstop, not an image
library): no palette, no 16-bit, no interlacing, no ancillary-chunk
interpretation.  Anything outside that raises ``NotImplementedError``
with the actionable message the seam contract requires.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (H, W) gray, (H, W, 3) RGB or (H, W, 4) RGBA uint8
    array as PNG bytes (8-bit, filter 0 per scanline)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color = 0
    elif a.ndim == 3 and a.shape[2] == 3:
        color = 2
    elif a.ndim == 3 and a.shape[2] == 4:
        color = 6
    else:
        raise ValueError("encode_png: need (H,W), (H,W,3) or (H,W,4) uint8")
    h, w = a.shape[:2]
    flat = a.reshape(h, -1)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit gray/RGB/RGBA PNG → uint8 array of
    shape (H, W) or (H, W, C).  Raises ``NotImplementedError`` for
    non-PNG payloads and for PNG variants outside this codec's scope."""
    if payload[:8] != _SIG:
        raise NotImplementedError(
            "png_mini: payload is not a PNG — a full codec (PIL) is needed "
            "for other formats"
        )
    pos = 8
    idat = bytearray()
    w = h = bit_depth = color = interlace = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bit_depth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("png_mini: missing IHDR")
    if bit_depth != 8 or interlace != 0 or color not in _CHANNELS:
        raise NotImplementedError(
            f"png_mini: unsupported PNG variant (bit_depth={bit_depth}, "
            f"color_type={color}, interlace={interlace}) — use PIL"
        )
    ch = _CHANNELS[color]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("png_mini: scanline data size mismatch")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    bpp = ch
    for y in range(h):
        f = int(raw[y * (stride + 1)])
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)].astype(np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up — no x-recurrence, vectorized
            rec = (line + prev) & 0xFF
        elif f == 1:  # Sub
            rec = line.copy()
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif f == 3:  # Average
            rec = line.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"png_mini: bad scanline filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = out[y].astype(np.int32)
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


def resize_nearest(arr: np.ndarray, ow: int, oh: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample (pixel-center mapping) —
    two fancy-index gathers, no Python per-pixel loop."""
    h, w = arr.shape[:2]
    ys = np.minimum(((np.arange(oh) + 0.5) * h / oh).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(ow) + 0.5) * w / ow).astype(np.int64), w - 1)
    return arr[ys][:, xs]


def luminance(arr: np.ndarray) -> np.ndarray:
    """ITU-R 601-2 luma with integer truncation — the same formula PIL's
    ``convert("L")`` uses, so the two real-codec paths produce matching
    grayscale on the same pixels."""
    if arr.ndim == 2:
        return arr
    a = arr.astype(np.int64)
    return (
        (a[..., 0] * 299 + a[..., 1] * 587 + a[..., 2] * 114) // 1000
    ).astype(np.uint8)
