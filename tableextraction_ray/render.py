"""Deterministic table/page renderer (pure numpy) + cell-crop OCR decode.

Renders logical tables (FIXTURES.md §2) as ruled grids: 1-px black lines on
white, glyph text from :mod:`tableextraction_ray.glyphs`, threshold-200-safe.
The renderer exposes the exact cell rectangles it draws (in table-crop
coordinates), which is how golden span sequences are derived independently
of the detection pipeline: golden = structure-builder(logical rects + texts),
engine = structure-builder(detected rects + OCR texts); the pytest equality
between them is the round-trip guarantee for rasterize -> detect -> grid ->
OCR.

Geometry constraints honored (so the reference-pinned epsilons hold):
- row height and column widths exceed 2.5x the grid epsilon
  ``(h + w) * 0.01`` and the fixed 20-px builder epsilon;
- ruling lines are 1 px, glyph ink runs are < 30 px in both axes, so only
  ruling survives the line extractor's min-length rule.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import glyphs

Cell = tuple[int, int, int, int]

PAD_X = 10
PAD_Y = 17
CELL_H = glyphs.CH_H + 2 * PAD_Y  # 48
MIN_COL_W = 72
PAGE_MARGIN = 60
TABLE_GAP = 70
TITLE_H = 40


@dataclass
class LogicalCell:
    """One drawn cell: grid span [row0, row1) x [col0, col1) and its text."""

    row0: int
    row1: int
    col0: int
    col1: int
    text: str


@dataclass
class LogicalTable:
    """n_rows x n_cols ruled grid; cells may span multiple rows/columns.

    Cells must tile the grid exactly (every grid slot covered once)."""

    n_rows: int
    n_cols: int
    cells: list[LogicalCell] = field(default_factory=list)


def _col_widths(table: LogicalTable) -> list[int]:
    widths = [MIN_COL_W] * table.n_cols
    for cell in table.cells:
        span = cell.col1 - cell.col0
        need = glyphs.text_width(cell.text) + 2 * PAD_X + 2
        per_col = -(-need // span)  # ceil
        for c in range(cell.col0, cell.col1):
            widths[c] = max(widths[c], per_col)
    return widths


def table_geometry(table: LogicalTable) -> tuple[list[int], list[int]]:
    """(x boundaries, y boundaries) of the ruled grid, in table-crop coords.
    Boundary k is the pixel column/row the 1-px ruling line is drawn on."""
    widths = _col_widths(table)
    xs = [0]
    for w in widths:
        xs.append(xs[-1] + w)
    ys = [0]
    for _ in range(table.n_rows):
        ys.append(ys[-1] + CELL_H + 1)
    return xs, ys


def logical_cell_rects(table: LogicalTable) -> list[tuple[Cell, str]]:
    """The (rect, text) pairs the grid reconstruction should recover, in
    table-crop coordinates: rect = (x_left, y_top, x_right, y_bottom) on the
    ruling-line boundaries — the same convention as
    :func:`tableextraction_ray.geometry.extract_cells` output."""
    xs, ys = table_geometry(table)
    out = []
    for cell in table.cells:
        rect = (xs[cell.col0], ys[cell.row0], xs[cell.col1], ys[cell.row1])
        out.append((rect, cell.text))
    return out


def render_table(table: LogicalTable) -> np.ndarray:
    """Render the ruled grid + glyph text as (H, W) uint8, white background.

    Ruling is drawn on the outer border and on every interior boundary
    segment that separates two distinct cells (merged spans get no interior
    ruling), so the grid reconstruction sees exactly the logical cells.
    """
    xs, ys = table_geometry(table)
    w, h = xs[-1] + 1, ys[-1] + 1
    img = np.full((h, w), 255, dtype=np.uint8)

    # Which grid slot does each (row, col) belong to?
    owner = np.full((table.n_rows, table.n_cols), -1, dtype=np.int32)
    for idx, cell in enumerate(table.cells):
        owner[cell.row0 : cell.row1, cell.col0 : cell.col1] = idx
    if (owner < 0).any():
        raise ValueError("logical cells must tile the grid")

    # Outer border.
    img[ys[0], xs[0] : xs[-1] + 1] = 0
    img[ys[-1], xs[0] : xs[-1] + 1] = 0
    img[ys[0] : ys[-1] + 1, xs[0]] = 0
    img[ys[0] : ys[-1] + 1, xs[-1]] = 0

    # Interior horizontal boundaries: between row r-1 and r where owners differ.
    for r in range(1, table.n_rows):
        for c in range(table.n_cols):
            if owner[r - 1, c] != owner[r, c]:
                img[ys[r], xs[c] : xs[c + 1] + 1] = 0
    # Interior vertical boundaries.
    for c in range(1, table.n_cols):
        for r in range(table.n_rows):
            if owner[r, c - 1] != owner[r, c]:
                img[ys[r] : ys[r + 1] + 1, xs[c]] = 0

    # Text at fixed padding from each cell's top-left boundary.
    for cell in table.cells:
        if cell.text:
            glyphs.render_text(
                img, xs[cell.col0] + 1 + PAD_X, ys[cell.row0] + 1 + PAD_Y, cell.text
            )
    return img


def render_page(
    tables: list[LogicalTable], title: str = ""
) -> tuple[np.ndarray, list[Cell]]:
    """Compose tables vertically on a white page with margins and an optional
    ruling-free glyph title. Returns (page image, table bboxes on the page in
    reading order) — bbox (x1, y1, x2, y2) inclusive of the outer border,
    which is exactly what the morphology table detector recovers."""
    rendered = [render_table(t) for t in tables]
    width = max([r.shape[1] for r in rendered], default=300) + 2 * PAGE_MARGIN
    if title:
        width = max(width, glyphs.text_width(title) + 2 * PAGE_MARGIN)
    height = PAGE_MARGIN + TITLE_H
    for r in rendered:
        height += r.shape[0] + TABLE_GAP
    height += PAGE_MARGIN - TABLE_GAP if rendered else PAGE_MARGIN
    page = np.full((max(height, 200), width), 255, dtype=np.uint8)

    if title:
        glyphs.render_text(page, PAGE_MARGIN, PAGE_MARGIN // 2, title)

    bboxes: list[Cell] = []
    y = PAGE_MARGIN + TITLE_H
    for r in rendered:
        h, w = r.shape
        page[y : y + h, PAGE_MARGIN : PAGE_MARGIN + w] = r
        bboxes.append((PAGE_MARGIN, y, PAGE_MARGIN + w - 1, y + h - 1))
        y += h + TABLE_GAP
    return page, bboxes


def ocr_cell_crop(crop: np.ndarray) -> str:
    """Synthetic-glyph OCR of one cell crop: the engine-side counterpart of
    the reference's per-cell EasyOCR call (recognition.py:217-232).

    Robust to the +-2 px node jitter of the detected rect: trims a small
    margin to drop ruling lines, then anchors the glyph grid at the ink
    bounding-box top-left (every glyph carries an anchor ink pixel at its
    slot origin). Returns the raw decoded line; empty crop -> ''.
    """
    if crop.size == 0:
        return ""
    margin = 4
    interior = crop[margin:-margin, margin:-margin]
    if interior.size == 0:
        return ""
    ink = interior <= 200
    if not ink.any():
        return ""
    ys, xs = np.nonzero(ink)
    y0, x0 = int(ys.min()), int(xs.min())
    region = interior[y0:, x0:]
    return glyphs.decode_text(region)


def ocr_text(raw: str) -> str:
    """Expected OCR output for a cell whose rendered text is ``raw``: the
    EasyOCR contract adds ``' '`` per recognized line (recognition.py:30-34)
    and the pipeline then de-hyphenates (recognition.py:228)."""
    from .textproc import remove_hyphenated_words

    return remove_hyphenated_words(raw + " ") if raw else ""
