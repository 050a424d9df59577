"""Minimal 8-bit grayscale PNG codec (pure stdlib zlib + numpy).

The sandbox has no PIL/cv2, so media payloads (rendered table-page images,
see FIXTURES.md §1) are encoded with this codec. The encoder always writes
non-interlaced 8-bit grayscale with per-scanline filter 0; the decoder
supports all five PNG filter types but fast-paths filter-0 streams (the only
ones we produce) into a single vectorized reshape.

Replaces the reference's poppler/cv2 raster IO
(``table_extraction/preprocessing.py:10-62``) for the synthetic corpus.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_gray(img: np.ndarray) -> bytes:
    """Encode an (H, W) uint8 array as a grayscale PNG."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_gray expects an (H, W) uint8 array")
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bitdepth 8, gray
    # Filter byte 0 prepended to every scanline.
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def encode_rgb(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as a truecolor PNG (color type 2)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_rgb expects an (H, W, 3) uint8 array")
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # bitdepth 8, RGB
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


# channels per pixel for the supported color types
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_image(data: bytes) -> np.ndarray:
    """Decode any non-interlaced 8-bit PNG of color type 0/2/4/6 into an
    (H, W) array (grayscale) or (H, W, C) array (gray+alpha / RGB / RGBA).
    All five scanline filters are supported; filter-0 streams (what
    :func:`encode_gray`/:func:`encode_rgb` emit) take a vectorized fast
    path. Palette (type 3) and 16-bit depths are out of scope."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = color = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or interlace != 0 or color not in _CHANNELS:
                raise ValueError(
                    "only non-interlaced 8-bit gray/RGB/alpha PNGs supported"
                )
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[color]
    row_bytes = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    raw = raw.reshape(h, row_bytes + 1)
    filters = raw[:, 0]
    lines = raw[:, 1:]
    if not filters.any():  # fast path: all scanlines filter 0
        out = lines.copy()
    else:
        # PNG filters predict per BYTE with the left neighbor ``bpp`` bytes
        # back (bpp = channels at 8-bit depth).
        bpp = ch
        out = np.zeros((h, row_bytes), dtype=np.uint8)
        prev = np.zeros(row_bytes, dtype=np.int32)
        for y in range(h):
            f = filters[y]
            cur = lines[y].astype(np.int32)
            if f == 0:
                rec = cur
            elif f == 2:  # Up
                rec = (cur + prev) & 0xFF
            else:  # Sub / Average / Paeth need left-neighbor recursion
                rec = np.zeros(row_bytes, dtype=np.int32)
                for x in range(row_bytes):
                    a = rec[x - bpp] if x >= bpp else 0
                    b = prev[x]
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    if f == 1:
                        pred = a
                    elif f == 3:
                        pred = (a + b) // 2
                    elif f == 4:
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    else:
                        raise ValueError(f"bad filter {f}")
                    rec[x] = (cur[x] + pred) & 0xFF
            out[y] = rec.astype(np.uint8)
            prev = rec
    if ch == 1:
        return out
    return out.reshape(h, w, ch)


def decode_gray(data: bytes) -> np.ndarray:
    """Decode a PNG into an (H, W) grayscale uint8 array: grayscale streams
    pass through; RGB/RGBA decode fully and convert via :func:`grayzation`
    (alpha ignored)."""
    img = decode_image(data)
    if img.ndim == 2:
        return img
    if img.shape[2] == 2:  # gray + alpha
        return np.ascontiguousarray(img[:, :, 0])
    return grayzation(img[:, :, :3])


def grayzation(rgb: np.ndarray) -> np.ndarray:
    """(H, W, 3) RGB -> (H, W) grayscale with OpenCV's exact fixed-point
    BT.601 arithmetic (the reference's ``preprocessing.py:81-94`` grayzation
    is ``cv2.cvtColor(..., COLOR_BGR2GRAY)`` on an RGB-ordered array — i.e.
    RGB2GRAY): y = (R*4899 + G*9617 + B*1868 + 8192) >> 14, the published
    OpenCV yuv_shift=14 coefficients — bit-identical to cv2 output."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("grayzation expects an (H, W, 3) uint8 array")
    r = rgb[:, :, 0].astype(np.int32)
    g = rgb[:, :, 1].astype(np.int32)
    b = rgb[:, :, 2].astype(np.int32)
    return ((r * 4899 + g * 9617 + b * 1868 + 8192) >> 14).astype(np.uint8)
