"""TATR structure refinement/alignment parity tests (reference
eval_utils.py:166-192, 414-443, 489-543, 546-775, 950-1001 semantics;
round-2 verdict item 5). Pure-library tests — no Ray session needed."""

from hypothesis import given, settings
from hypothesis import strategies as st

from tableextraction_ray import tatr


def row(y1, y2, score=0.9, **kw):
    return {"bbox": (0.0, y1, 100.0, y2), "label": "table row", "score": score, **kw}


def col(x1, x2, score=0.9, **kw):
    return {"bbox": (x1, 0.0, x2, 100.0), "label": "table column", "score": score, **kw}


def tok(x1, y1, x2, y2, text="t", **kw):
    return {"bbox": (x1, y1, x2, y2), "text": text, "span_num": 0, "line_num": 0,
            "block_num": 0, **kw}


class TestSortsAndAlign:
    def test_sort_by_center_not_edge(self):
        a = {"bbox": (0, 0, 10, 10), "score": 0.5}
        b = {"bbox": (2, 0, 4, 10), "score": 0.5}  # center 3 < center 5
        assert tatr.sort_objects_left_to_right([a, b]) == [b, a]
        c = {"bbox": (0, 8, 10, 12), "score": 0.5}
        assert tatr.sort_objects_top_to_bottom([c, a]) == [a, c]

    def test_align_rows_and_columns_stretch_to_table(self):
        bbox = (0.0, 0.0, 100.0, 50.0)
        r = tatr.align_rows([row(10, 20) | {"bbox": (5.0, 10.0, 90.0, 20.0)}], bbox)[0]
        assert r["bbox"] == (0.0, 10.0, 100.0, 20.0)
        c = tatr.align_columns([{"bbox": (10.0, 5.0, 20.0, 45.0), "score": 1.0}], bbox)[0]
        assert c["bbox"] == (10.0, 0.0, 20.0, 50.0)


class TestRefineRowsColumns:
    def test_duplicate_row_suppressed_by_shared_tokens(self):
        rows = [row(0, 10, score=0.9), row(1, 11, score=0.8)]  # near-duplicates
        tokens = [tok(10, 2, 20, 8)]
        out = tatr.refine_rows(rows, tokens)
        assert len(out) == 1 and out[0]["score"] == 0.9

    def test_empty_row_removed(self):
        rows = [row(0, 10, score=0.9), row(50, 60, score=0.8)]
        tokens = [tok(10, 2, 20, 8)]  # only the first row has content
        out = tatr.refine_rows(rows, tokens)
        assert [r["bbox"][1] for r in out] == [0]

    def test_columns_sorted_left_to_right(self):
        cols = [col(50, 60, score=0.7), col(0, 10, score=0.9)]
        toks = [tok(2, 10, 8, 20), tok(52, 10, 58, 20)]
        out = tatr.refine_columns(cols, toks)
        assert [c["bbox"][0] for c in out] == [0, 50]

    def test_no_tokens_skips_containment_nms(self):
        rows = [row(0, 10), row(20, 30)]
        assert len(tatr.refine_rows(rows, None)) == 2


class TestNmsOverlap:
    def test_default_suppresses_5pct_overlap(self):
        a = {"bbox": (0, 0, 100, 100), "score": 0.9}
        b = {"bbox": (90, 0, 200, 100), "score": 0.5}  # 10% of b inside a
        assert tatr.nms_overlap([a, b]) == [a]

    def test_disjoint_kept(self):
        a = {"bbox": (0, 0, 10, 10), "score": 0.9}
        b = {"bbox": (20, 0, 30, 10), "score": 0.5}
        assert len(tatr.nms_overlap([a, b])) == 2

    def test_keep_lower_by_area(self):
        a = {"bbox": (0, 0, 10, 10), "score": 0.1}
        b = {"bbox": (0, 0, 100, 100), "score": 0.9}
        out = tatr.nms_overlap(
            [a, b], match_criteria="iou", match_threshold=0.001,
            keep_metric="area", keep_higher=False,
        )
        assert out == [a]


class TestAlignHeaders:
    def test_consecutive_run_and_flags(self):
        rows = [row(0, 10), row(10, 20), row(20, 30)]
        headers = [{"bbox": (0.0, 0.0, 100.0, 18.0), "score": 0.9}]
        out = tatr.align_headers(headers, rows)
        assert len(out) == 1
        assert out[0]["bbox"] == (0.0, 0.0, 100.0, 20.0)  # hull of rows 0-1
        assert [r["header"] for r in rows] == [True, True, False]

    def test_top_extension_quirk(self):
        # Header overlapping only row 1 pulls row 0 in (reference quirk:
        # rows above the first overlapped row are prepended).
        rows = [row(0, 10), row(10, 20), row(20, 30)]
        headers = [{"bbox": (0.0, 10.0, 100.0, 20.0), "score": 0.9}]
        out = tatr.align_headers(headers, rows)
        assert [r["header"] for r in rows] == [True, True, False]
        assert out[0]["bbox"] == (0.0, 0.0, 100.0, 20.0)

    def test_no_overlap_no_header(self):
        rows = [row(0, 10)]
        assert tatr.align_headers([{"bbox": (0, 50, 100, 60), "score": 0.9}], rows) == []
        assert rows[0]["header"] is False


class TestAlignSupercells:
    def grid(self):
        rows = [row(0, 10, header=True), row(10, 20), row(20, 30)]
        cols = [col(0, 30), col(30, 60), col(60, 100)]
        return rows, cols

    def test_snap_and_numbering(self):
        rows, cols = self.grid()
        sc = {"bbox": (1.0, 11.0, 58.0, 29.0), "score": 0.8}
        out = tatr.align_supercells([sc], rows, cols)
        assert len(out) == 1
        assert out[0]["row_numbers"] == [1, 2]
        assert out[0]["column_numbers"] == [0, 1]
        assert out[0]["bbox"] == (0.0, 10.0, 60.0, 30.0)
        assert out[0]["header"] is False

    def test_header_boundary_drops_smaller_group(self):
        rows, cols = self.grid()
        # Covers header row 0 and data rows 1-2 -> header side (1 row) is
        # smaller than data side (2 rows) -> header rows dropped.
        sc = {"bbox": (0.0, 0.0, 60.0, 30.0), "score": 0.8}
        out = tatr.align_supercells([sc], rows, cols)
        assert out[0]["row_numbers"] == [1, 2]
        assert out[0]["header"] is False

    def test_span_requires_header(self):
        rows, cols = self.grid()
        sc = {"bbox": (1.0, 11.0, 58.0, 29.0), "score": 0.8, "span": True}
        assert tatr.align_supercells([sc], rows, cols) == []

    def test_header_span_propagates_upward(self):
        rows = [row(0, 10, header=True), row(10, 20, header=True), row(20, 30)]
        cols = [col(0, 30), col(30, 60), col(60, 100)]
        sc = {"bbox": (0.0, 10.0, 60.0, 20.0), "score": 0.8, "span": True}
        out = tatr.align_supercells([sc], rows, cols)
        kinds = sorted((min(o["row_numbers"]), o.get("propagated", False)) for o in out)
        assert kinds == [(0, True), (1, False)]

    def test_single_cell_not_a_supercell(self):
        rows, cols = self.grid()
        sc = {"bbox": (31.0, 11.0, 59.0, 19.0), "score": 0.8}
        assert tatr.align_supercells([sc], rows, cols) == []


class TestSupercellNmsAndTree:
    def test_overlap_shrinks_lower_confidence(self):
        sc1 = {"row_numbers": [0, 1], "column_numbers": [0, 1], "score": 0.9,
               "bbox": (0, 0, 60, 20)}
        sc2 = {"row_numbers": [1, 2], "column_numbers": [0, 1], "score": 0.5,
               "bbox": (0, 10, 60, 30)}
        out = tatr.nms_supercells([sc1, sc2])
        assert len(out) == 2
        shrunk = [sc for sc in out if sc["score"] == 0.5][0]
        assert shrunk["row_numbers"] == [2]  # row 1 removed to resolve overlap

    def test_shrunk_to_single_cell_suppressed(self):
        sc1 = {"row_numbers": [0, 1], "column_numbers": [0], "score": 0.9,
               "bbox": (0, 0, 30, 20)}
        sc2 = {"row_numbers": [1, 0], "column_numbers": [0], "score": 0.5,
               "bbox": (0, 0, 30, 20)}
        out = tatr.nms_supercells([sc1, sc2])
        assert len(out) == 1 and out[0]["score"] == 0.9

    def test_header_tree_eliminates_multi_parent(self):
        # Row 0: two parents [0] and [1]; row 1: child spanning [0, 1] has
        # NO single ancestor covering both columns -> eliminated.
        p1 = {"row_numbers": [0], "column_numbers": [0], "score": 0.9, "header": True}
        p2 = {"row_numbers": [0], "column_numbers": [1], "score": 0.9, "header": True}
        child = {"row_numbers": [1], "column_numbers": [0, 1], "score": 0.8,
                 "header": True}
        out = tatr.header_supercell_tree([p1, p2, child])
        assert child not in out and p1 in out and p2 in out

    def test_header_tree_keeps_single_parent(self):
        p = {"row_numbers": [0], "column_numbers": [0, 1], "score": 0.9, "header": True}
        child = {"row_numbers": [1], "column_numbers": [0, 1], "score": 0.8,
                 "header": True}
        assert tatr.header_supercell_tree([p, child]) == [p, child]


class TestRefinedPipeline:
    def noisy_objects(self):
        return [
            # Overlapping duplicate row detections + a spurious empty row.
            row(0, 10, score=0.95, label="table row"),
            row(1, 11, score=0.60, label="table row"),
            row(10, 20, score=0.9, label="table row"),
            row(70, 80, score=0.9, label="table row"),
            col(0, 50, score=0.9, label="table column"),
            col(50, 100, score=0.9, label="table column"),
            {"bbox": (0.0, 0.0, 100.0, 10.0), "score": 0.9,
             "label": "table column header"},
            {"bbox": (0.0, 0.0, 100.0, 10.0), "score": 0.85,
             "label": "table spanning cell"},
        ]

    def tokens(self):
        return [tok(5, 2, 20, 8, "h1"), tok(55, 2, 70, 8, "h2"),
                tok(5, 12, 20, 18, "a"), tok(55, 12, 70, 18, "b")]

    def test_stable_on_noisy_detections(self):
        structure = tatr.objects_to_structures_refined(
            self.noisy_objects(), self.tokens()
        )
        assert len(structure["rows"]) == 2  # dup suppressed, empty removed
        assert len(structure["columns"]) == 2
        assert structure["rows"][0]["header"] is True
        cells = tatr.refined_structure_to_cells(structure, self.tokens())
        merged = [c for c in cells if c["header"]]
        assert len(merged) == 1  # header span merged across both columns
        assert merged[0]["text"] == "h1 h2"
        data = sorted(c["text"] for c in cells if not c["header"])
        assert data == ["a", "b"]

    @settings(max_examples=60, deadline=None)
    @given(st.lists(
        st.tuples(
            st.sampled_from(["table row", "table column", "table column header",
                             "table spanning cell", "table projected row header"]),
            st.floats(0, 90), st.floats(0, 90),
            st.floats(1, 40), st.floats(1, 40),
            st.floats(0.01, 1.0),
        ),
        max_size=12,
    ))
    def test_never_crashes_and_stays_consistent(self, specs):
        objects = [
            {"bbox": (x, y, x + w, y + h), "label": label, "score": s}
            for label, x, y, w, h, s in specs
        ]
        structure = tatr.objects_to_structures_refined(objects, None)
        n_rows, n_cols = len(structure["rows"]), len(structure["columns"])
        for sc in structure["supercells"]:
            assert all(0 <= r < n_rows for r in sc["row_numbers"])
            assert all(0 <= c < n_cols for c in sc["column_numbers"])
        cells = tatr.refined_structure_to_cells(structure)
        seen = {(c["row"], c["col"]) for c in cells}
        assert len(seen) == len(cells)
