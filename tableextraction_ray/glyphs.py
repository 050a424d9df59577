"""Deterministic 5x7 bitmap glyph font + synthetic OCR decoder.

The sandbox has no EasyOCR/torch, so the default OCR backend is a
deterministic "synthetic glyph" recognizer (SURVEY.md §2.9): the corpus
renderer draws text with this font and the OCR stage decodes it back by
exact bitmap matching. Glyph bitmaps are generated from sha256 of the
character, so the font needs no hand-authored artwork, is stable across
runs, and is injective over the charset (collisions are deterministically
re-hashed away).

The recognizer mirrors the observable contract of the reference's EasyOCR
stage (``table_extraction/recognition.py:14-34``): each recognized text line
contributes ``line + ' '`` to the cell text, so non-empty cell text carries a
trailing space, and an empty crop yields ``''``
(``table_extraction/recognition.py:226-228``).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np

GLYPH_W = 5
GLYPH_H = 7
SPACING = 1  # blank columns between glyphs (font units)
ADVANCE = GLYPH_W + SPACING
SCALE = 2  # rendered pixels per font pixel
CH_W = GLYPH_W * SCALE
CH_H = GLYPH_H * SCALE
ADV = ADVANCE * SCALE

_LATIN = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_DIGITS = "0123456789"
_CYRILLIC = (
    "АБВГДЕЖЗИЙКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯ"
    "абвгдежзийклмнопрстуфхцчшщъыьэюя"
)
_PUNCT = ".,-()/%:"
CHARSET = _LATIN + _DIGITS + _CYRILLIC + _PUNCT  # space handled as blank


def _bitmap_from_hash(key: str) -> np.ndarray:
    digest = hashlib.sha256(key.encode("utf-8")).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))
    bm = bits[: GLYPH_H * GLYPH_W].reshape(GLYPH_H, GLYPH_W).astype(bool)
    # Guarantee enough ink for the glyph to be visually/algorithmically present.
    if bm.sum() < 6:
        extra = bits[GLYPH_H * GLYPH_W : 2 * GLYPH_H * GLYPH_W].reshape(
            GLYPH_H, GLYPH_W
        )
        bm |= extra.astype(bool)
    bm[0, 0] = True  # anchor pixel: every glyph marks its top-left slot corner
    return bm


@lru_cache(maxsize=1)
def font() -> dict[str, np.ndarray]:
    """char -> (7, 5) bool bitmap; injective over CHARSET (space excluded)."""
    table: dict[str, np.ndarray] = {}
    seen: dict[bytes, str] = {}
    for ch in CHARSET:
        salt = 0
        while True:
            bm = _bitmap_from_hash(f"glyph:{ch}:{salt}")
            key = bm.tobytes()
            if key not in seen:
                seen[key] = ch
                table[ch] = bm
                break
            salt += 1
    return table


@lru_cache(maxsize=1)
def _decode_table() -> dict[bytes, str]:
    return {bm.tobytes(): ch for ch, bm in font().items()}


def text_width(text: str) -> int:
    """Rendered pixel width of a text line (no trailing spacing)."""
    if not text:
        return 0
    return len(text) * ADV - SPACING * SCALE


def render_text(canvas: np.ndarray, x: int, y: int, text: str, value: int = 0) -> None:
    """Blit ``text`` onto uint8 ``canvas`` with glyph origin at (x, y) (top-left),
    drawing ink pixels with ``value``. Unknown characters raise KeyError."""
    fnt = font()
    for i, ch in enumerate(text):
        if ch == " ":
            continue
        bm = fnt[ch]
        gx = x + i * ADV
        block = np.kron(bm, np.ones((SCALE, SCALE), dtype=bool))
        region = canvas[y : y + CH_H, gx : gx + CH_W]
        region[block[: region.shape[0], : region.shape[1]]] = value


def decode_text(region: np.ndarray, ink_threshold: int = 200) -> str:
    """Decode a rendered text line from a grayscale region whose top-left is
    the glyph origin. Returns the text with trailing spaces stripped;
    unmatchable ink decodes as '?'. Empty/ink-free region -> ''."""
    if region.size == 0:
        return ""
    ink = region <= ink_threshold
    if not ink.any():
        return ""
    dec = _decode_table()
    n_slots = (region.shape[1] + SPACING * SCALE) // ADV
    out = []
    for i in range(n_slots):
        gx = i * ADV
        block = ink[:CH_H, gx : gx + CH_W]
        if block.shape != (CH_H, CH_W):
            padded = np.zeros((CH_H, CH_W), dtype=bool)
            padded[: block.shape[0], : block.shape[1]] = block
            block = padded
        bm = block[::SCALE, ::SCALE]
        if not bm.any():
            out.append(" ")
        else:
            out.append(dec.get(bm.tobytes(), "?"))
    return "".join(out).rstrip(" ")
