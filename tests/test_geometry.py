"""Grid-reconstruction tests: rendered tables round-trip exactly, plus
property tests over random seeded grids (SURVEY.md §5.2 item 3)."""

import numpy as np
import pytest

from tableextraction_ray import geometry
from tableextraction_ray.render import (
    LogicalCell,
    LogicalTable,
    logical_cell_rects,
    ocr_cell_crop,
    render_page,
    render_table,
)


def assert_rects_close(detected, expected, tol=2):
    """Cell rects may jitter by a pixel or two (node cluster means absorb the
    reference's synthetic corner nodes, detection.py:395-397,405-408); the
    emission contract only depends on ordering/grouping, which such jitter
    cannot flip given the >=48 px grid pitch."""
    assert len(detected) == len(expected)
    for d, e in zip(detected, expected):
        assert max(abs(a - b) for a, b in zip(d, e)) <= tol, (d, e)


def simple_table(n_rows, n_cols, prefix="c"):
    cells = [LogicalCell(0, 1, c, c + 1, f"h{c}") for c in range(n_cols)]
    for r in range(1, n_rows):
        for c in range(n_cols):
            cells.append(LogicalCell(r, r + 1, c, c + 1, f"{prefix}{r}{c}"))
    return LogicalTable(n_rows, n_cols, cells)


class TestLines:
    def test_ruling_only(self):
        img = render_table(simple_table(3, 2))
        v, h = geometry.extract_lines(img)
        # 3 vertical boundaries, 4 horizontal boundaries
        assert len({x1 for x1, _, _, _ in v}) == 3
        assert len({y1 for _, y1, _, _ in h}) == 4

    def test_glyph_ink_produces_no_lines(self):
        from tableextraction_ray import glyphs

        img = np.full((100, 400), 255, np.uint8)
        glyphs.render_text(img, 10, 40, "no ruling lines here 123")
        v, h = geometry.extract_lines(img)
        assert v == [] and h == []


class TestGridRoundtrip:
    @pytest.mark.parametrize("n_rows,n_cols", [(2, 2), (3, 3), (5, 4), (7, 2), (4, 6)])
    def test_exact_grid(self, n_rows, n_cols):
        table = simple_table(n_rows, n_cols)
        img = render_table(table)
        detected = geometry.grid_cells(img)
        expected = sorted((r for r, _ in logical_cell_rects(table)), key=lambda c: (c[1], c[0]))
        assert_rects_close(detected, expected)

    def test_random_grids_cell_count_property(self):
        rng = np.random.default_rng(42)
        for _ in range(10):
            n_rows = int(rng.integers(2, 8))
            n_cols = int(rng.integers(2, 7))
            table = simple_table(n_rows, n_cols)
            detected = geometry.grid_cells(render_table(table))
            assert len(detected) == n_rows * n_cols

    def test_merged_cells(self):
        table = LogicalTable(
            4,
            3,
            [
                LogicalCell(0, 2, 0, 1, "tall"),
                LogicalCell(0, 1, 1, 3, "wide"),
                LogicalCell(1, 2, 1, 2, "b"),
                LogicalCell(1, 2, 2, 3, "c"),
            ]
            + [
                LogicalCell(r, r + 1, c, c + 1, f"v{r}{c}")
                for r in range(2, 4)
                for c in range(3)
            ],
        )
        detected = geometry.grid_cells(render_table(table))
        expected = sorted((r for r, _ in logical_cell_rects(table)), key=lambda c: (c[1], c[0]))
        assert_rects_close(detected, expected)

    def test_ocr_of_every_cell(self):
        table = simple_table(3, 3)
        img = render_table(table)
        logical = logical_cell_rects(table)
        for rect in geometry.grid_cells(img):
            x1, y1, x2, y2 = rect
            crop = img[min(y1, y2) : max(y1, y2), min(x1, x2) : max(x1, x2)]
            matches = [
                t for r, t in logical
                if max(abs(a - b) for a, b in zip(r, rect)) <= 2
            ]
            assert len(matches) == 1
            assert ocr_cell_crop(crop) == matches[0]


class TestDetectRegions:
    def test_multi_table_page(self):
        page, bboxes = render_page(
            [simple_table(3, 2), simple_table(2, 4)], title="two tables"
        )
        assert geometry.detect_table_regions(page) == bboxes

    def test_no_table_page(self):
        page, _ = render_page([], title="just a title line")
        assert geometry.detect_table_regions(page) == []

    def test_blank_page(self):
        assert geometry.detect_table_regions(np.full((300, 300), 255, np.uint8)) == []


class TestComponents:
    def test_label_components(self):
        mask = np.zeros((10, 10), dtype=bool)
        mask[1:3, 1:4] = True
        mask[6:9, 5:8] = True
        labels, n = geometry._label_components(mask)
        assert n == 2
        assert (labels > 0).sum() == mask.sum()

    def test_diagonal_connectivity(self):
        mask = np.zeros((4, 4), dtype=bool)
        mask[0, 0] = True
        mask[1, 1] = True
        _, n = geometry._label_components(mask)
        assert n == 1


class TestScaleCells:
    def test_reference_truncation_semantics(self):
        from tableextraction_ray.geometry import scale_cells

        # 50 -> 500 DPI: factor 10, int() truncation (detection.py:617-627)
        assert scale_cells([(1, 2, 3, 4)], 50, 500) == [(10, 20, 30, 40)]
        # non-integral factor: float math THEN int() truncation, exactly as
        # the reference computes it (3 * (10/3) = 10.000000000000002 -> 10)
        assert scale_cells([(1, 1, 3, 3)], 3, 10) == [(3, 3, 10, 10)]
        assert scale_cells([], 50, 500) == []
