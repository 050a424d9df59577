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


def decode_gray(data: bytes) -> np.ndarray:
    """Decode a grayscale PNG produced by :func:`encode_gray` (or any
    non-interlaced 8-bit grayscale PNG) into an (H, W) uint8 array."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or color != 0 or interlace != 0:
                raise ValueError("only non-interlaced 8-bit grayscale supported")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    raw = raw.reshape(h, w + 1)
    filters = raw[:, 0]
    lines = raw[:, 1:]
    if not filters.any():  # fast path: all scanlines filter 0
        return lines.copy()
    out = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        f = filters[y]
        cur = lines[y].astype(np.int32)
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        else:  # Sub / Average / Paeth need left-neighbor recursion
            rec = np.zeros(w, dtype=np.int32)
            for x in range(w):
                a = rec[x - 1] if x else 0
                b = prev[x]
                c = int(prev[x - 1]) if x else 0
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
    return out
