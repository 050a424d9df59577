"""Operator unit tests vs hand-computed micro-cases (SURVEY.md §5.2 item 2).

Each case pins a reference behavior by citation; epsilon boundary values are
exercised explicitly.
"""

import numpy as np
import pytest

from tableextraction_ray import glyphs, png
from tableextraction_ray.structure import (
    build_structure,
    create_cell_dict,
    extract_record_text,
    fill_structure,
    flatten_structures,
    group_cells,
    serialize_table,
    split_into_headers_and_records,
)
from tableextraction_ray.textproc import classify_table, remove_hyphenated_words


class TestGroupCells:
    # builder.py:11-57 — grouping is vs the FIRST y1 of the group, eps=20
    def test_epsilon_boundary(self):
        cells = [(0, 0, 10, 10), (0, 20, 10, 30), (0, 41, 10, 50)]
        counts, groups = group_cells(cells)
        # y=20 is within eps of 0; y=41 is 21 > 20 away -> new group
        assert counts == {0: 2, 41: 1}
        assert groups == [[(0, 0, 10, 10), (0, 20, 10, 30)], [(0, 41, 10, 50)]]

    def test_sorts_by_y1(self):
        cells = [(0, 100, 1, 1), (0, 0, 1, 1), (5, 0, 1, 1)]
        counts, groups = group_cells(cells)
        assert list(counts) == [0, 100]
        assert counts[0] == 2


class TestHeaderRecordSplit:
    # builder.py:60-113 — cut at first bottom-up count change
    def _grid(self, rows_counts):
        cells = []
        y = 0
        for count in rows_counts:
            for c in range(count):
                cells.append((c * 100, y, c * 100 + 100, y + 50))
            y += 50
        return cells

    def test_count_change(self):
        # header row of 2 over three record rows of 3
        cells = self._grid([2, 3, 3, 3])
        headers, records, rows = split_into_headers_and_records(cells)
        assert len(headers) == 2
        assert len(records) == 9
        assert [len(r) for r in rows] == [3, 3, 3]

    def test_uniform_counts_header_is_top_row(self):
        # no count change -> change_y = topmost row (builder.py:95-96)
        cells = self._grid([3, 3, 3])
        headers, records, rows = split_into_headers_and_records(cells)
        assert len(headers) == 3 and all(c[1] == 0 for c in headers)
        assert [len(r) for r in rows] == [3, 3]

    def test_sort_orders(self):
        cells = self._grid([2, 2])
        headers, records, _ = split_into_headers_and_records(cells)
        assert headers == sorted(headers, key=lambda c: (c[0], c[1]))
        assert records == sorted(records, key=lambda c: (c[1], c[0]))


class TestCellDict:
    # builder.py:268-300 — x-containment +-20 and vertical adjacency <=20
    def test_parent_child(self):
        parent = (100, 0, 300, 50)
        child1 = (100, 50, 200, 100)
        child2 = (200, 50, 300, 100)
        other = (0, 0, 100, 100)
        d = create_cell_dict([other, parent, child1, child2])
        assert d[parent] == [child1, child2]
        assert d[other] == []
        assert child1 not in d  # consumed children get no entry

    def test_adjacency_epsilon(self):
        parent = (0, 0, 100, 50)
        near = (0, 70, 100, 120)  # gap 20 -> child
        far = (0, 71, 100, 120)  # gap 21 -> not a child
        assert create_cell_dict([parent, near])[parent] == [near]
        assert create_cell_dict([parent, far])[parent] == []


class TestBuildFill:
    def test_build_and_fill(self):
        # build_structure builder.py:335-362; fill builder.py:365-387
        p, a, b = (0, 0, 200, 50), (0, 50, 100, 100), (100, 50, 200, 100)
        texts = {p: "P", a: "A", b: "B"}
        tree = build_structure(p, texts, {p: [a, b]})
        assert tree == {"P": [{"A": []}, {"B": []}]}
        filled = fill_structure([tree], ["1", "2"])
        assert filled == [{"P": [{"A": "1"}, {"B": "2"}]}]

    def test_fill_exhaustion_leaves_empty(self):
        tree = [{"A": []}, {"B": []}]
        assert fill_structure(tree, ["x"]) == [{"A": "x"}, {"B": []}]

    def test_flatten_contract(self):
        filled = [[{"P": [{"A": "1"}, {"B": []}]}, {"C": "2"}]]
        assert flatten_structures(filled) == ["P", "A", "1", "B", "C", "2"]

    def test_missing_text_is_none_key(self):
        cell = (0, 0, 10, 10)
        assert build_structure(cell, {}, {}) == {None: []}
        assert flatten_structures([[{None: "v"}]]) == ["", "v"]


class TestExtractRecordText:
    def test_sorted_x_then_y_and_none(self):
        # builder.py:407-426
        c1, c2 = (100, 0, 200, 50), (0, 0, 100, 50)
        out = extract_record_text([c1, c2], {c2: "left"})
        assert out == ["left", None]


class TestSerializeTable:
    def test_empty_inputs(self):
        assert serialize_table([], {}) == []

    def test_single_row_table_no_records(self):
        # one row only -> record_cells empty -> [] (export.py:45 divergence)
        cells = [(0, 0, 100, 50), (100, 0, 200, 50)]
        assert serialize_table(cells, {c: "h" for c in cells}) == []


class TestTextproc:
    # recognition.py:151-164 — exact Python re lookaround semantics
    @pytest.mark.parametrize(
        "inp,out",
        [
            ("сопро- тивление", "сопротивление"),
            ("сопро - тивление", "сопротивление"),
            ("a-b-c", "abc"),  # overlapping chain collapses in one pass
            ("x - 5", "x - 5"),  # digit after: no match
            ("- b", "- b"),  # no letter before
            ("a -b", "ab"),
        ],
    )
    def test_dehyphenate(self, inp, out):
        assert remove_hyphenated_words(inp) == out

    def test_classify_table(self):
        # recognition.py:37-75 — 2+ of 8 keywords clears 0.2 with weight 0.8
        assert classify_table("марка стали 09Г2С")
        assert not classify_table("one two six ten")
        # single keyword: 0.8 * 1/8 = 0.1 < 0.2
        assert not classify_table("марка")
        # fuzzy: positional errors within 20%
        assert classify_table("мурка стальи prefix")
        # reference quirk (recognition.py:55-59): the error ratio divides by
        # max(len) but zips only the overlapping prefix, so a 1-char word
        # "matches" any 5-char keyword (1 error / 5 = 0.2 <= threshold)
        assert classify_table("1 2")


class TestPngGlyphs:
    def test_png_roundtrip(self):
        img = np.random.default_rng(7).integers(0, 256, (33, 61), dtype=np.uint8)
        assert (png.decode_gray(png.encode_gray(img)) == img).all()

    def test_glyph_roundtrip_full_charset(self):
        text = glyphs.CHARSET
        canvas = np.full((glyphs.CH_H + 4, glyphs.text_width(text) + 8), 255, np.uint8)
        glyphs.render_text(canvas, 2, 1, text)
        assert glyphs.decode_text(canvas[1:, 2:]) == text

    def test_glyph_injective(self):
        bitmaps = {bm.tobytes() for bm in glyphs.font().values()}
        assert len(bitmaps) == len(glyphs.CHARSET)

    def test_interior_spaces(self):
        text = "ab  cd"
        canvas = np.full((20, 200), 255, np.uint8)
        glyphs.render_text(canvas, 0, 0, text)
        assert glyphs.decode_text(canvas) == text
