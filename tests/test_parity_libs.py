"""Unit tests for the §2.10 parity libraries: GriTS metrics, TATR
post-processing, plot digitization. Pure functions — no Ray needed."""

import numpy as np
import pytest

from tableextraction_ray import metrics, plot_digitize, tatr


class TestGrits:
    def test_identical_grids_score_one(self):
        g = [["a", "b"], ["c", "d"]]
        assert metrics.grits_con(g, g) == 1.0
        assert metrics.grits_top([[(1, 1)] * 2] * 2, [[(1, 1)] * 2] * 2) == 1.0

    def test_empty_vs_nonempty(self):
        assert metrics.grits_con([], []) == 1.0
        assert metrics.grits_con([["a"]], []) == 0.0

    def test_single_cell_diff(self):
        a = [["a", "b"], ["c", "d"]]
        b = [["a", "b"], ["c", "X"]]
        score = metrics.grits_con(a, b)
        assert 0.7 < score < 1.0

    def test_row_insertion_partial_credit(self):
        a = [["a", "b"], ["c", "d"]]
        b = [["a", "b"], ["x", "y"], ["c", "d"]]
        assert metrics.grits_con(a, b) == pytest.approx(2 * 4 / (4 + 6))

    def test_transposed_factoring(self):
        # column-outer factoring must catch a column permutation-free match
        a = [["a"], ["b"], ["c"]]
        b = [["a", "b", "c"]]
        assert metrics.grits_con(a, b) < 1.0

    def test_lcs_similarity(self):
        assert metrics.lcs_similarity("abc", "abc") == 1.0
        assert metrics.lcs_similarity("", "") == 1.0
        assert metrics.lcs_similarity("abc", "") == 0.0
        assert metrics.lcs_similarity("abcd", "abxd") == pytest.approx(2 * 3 / 8)

    def test_adjacency_f1(self):
        true = [["h1", "h2"], ["a", "b"]]
        pred = [["h1", "h2"], ["a", "X"]]
        p, r, f1 = metrics.adjacency_f1(pred, true)
        # true rels: (h1,h2,h),(a,b,h),(h1,a,v),(h2,b,v); pred shares (h1,h2,h),(h1,a,v)
        assert r == pytest.approx(0.5)
        assert p == pytest.approx(0.5)
        assert f1 == pytest.approx(0.5)
        assert metrics.adjacency_f1(true, true) == (1.0, 1.0, 1.0)

    def test_grits_loc_identity_and_shift(self):
        grid = [[(0, 0, 10, 10), (10, 0, 20, 10)],
                [(0, 10, 10, 20), (10, 10, 20, 20)]]
        assert metrics.grits_loc(grid, grid) == 1.0
        shifted = [[(x1 + 5, y1, x2 + 5, y2) for x1, y1, x2, y2 in row]
                   for row in grid]
        score = metrics.grits_loc(grid, shifted)
        # each aligned pair has IoU = 1/3 (5x10 overlap over 150 union)
        assert score == pytest.approx(1 / 3)
        assert metrics.grits_loc(grid, []) == 0.0


class TestTatr:
    def test_iou_iob(self):
        a = (0, 0, 10, 10)
        b = (5, 0, 15, 10)
        assert tatr.iou(a, b) == pytest.approx(50 / 150)
        assert tatr.iob(a, b) == pytest.approx(0.5)
        assert tatr.iob((2, 2, 4, 4), (0, 0, 10, 10)) == 1.0

    def test_class_thresholds_and_nms(self):
        objs = [
            {"bbox": (0, 0, 10, 10), "label": "table row", "score": 0.9},
            {"bbox": (0, 1, 10, 11), "label": "table row", "score": 0.8},
            {"bbox": (0, 20, 10, 30), "label": "table row", "score": 0.3},
        ]
        kept = tatr.apply_class_thresholds(objs, {"table row": 0.5})
        assert len(kept) == 2
        assert len(tatr.nms(kept, iou_threshold=0.5)) == 1
        assert len(tatr.nms(objs, iou_threshold=0.5)) == 2

    def test_slotting_unique(self):
        containers = [{"bbox": (0, 0, 10, 10)}, {"bbox": (10, 0, 20, 10)}]
        tokens = [
            {"bbox": (1, 1, 3, 3), "text": "a"},
            {"bbox": (9, 1, 12, 3), "text": "b"},  # straddles, mostly right? 1/3 left
            {"bbox": (50, 50, 60, 60), "text": "orphan"},
        ]
        slots, pkg, scores = tatr.slot_into_containers(containers, tokens)
        # token b straddles: iob vs left = 1/3, vs right = 2/3 -> right wins
        assert slots[0] == [0]
        assert slots[1] == [1]  # orphan token stays unassigned
        assert pkg[2] == []
        assert scores[0] == 1.0 and abs(scores[1] - 2 / 3) < 1e-9

    def test_slotting_threshold_and_forced(self):
        # Reference fidelity (eval_utils.py:226-281): a barely-overlapping
        # package (IoB 0.3 < overlap_threshold 0.5) stays UNSLOTTED at the
        # default threshold, and slots under forced_assignment.
        containers = [{"bbox": (0.0, 0.0, 10.0, 10.0)}]
        tokens = [{"bbox": (7.0, 0.0, 17.0, 10.0), "text": "edge"}]  # IoB 0.3
        slots, pkg, scores = tatr.slot_into_containers(containers, tokens)
        assert slots == [[]] and pkg == [[]]
        assert abs(scores[0] - 0.3) < 1e-9
        slots_f, pkg_f, _ = tatr.slot_into_containers(
            containers, tokens, forced_assignment=True
        )
        assert slots_f == [[0]] and pkg_f == [[0]]
        # the text-extraction call sites use overlap_threshold=0.001
        slots_t, _, _ = tatr.slot_into_containers(
            containers, tokens, overlap_threshold=0.001
        )
        assert slots_t == [[0]]
        # non-unique: every container over the threshold gets the package
        two = [{"bbox": (0.0, 0.0, 10.0, 10.0)}, {"bbox": (2.0, 0.0, 12.0, 10.0)}]
        tok = [{"bbox": (2.0, 0.0, 10.0, 10.0), "text": "t"}]  # IoB 1.0 both
        slots_n, pkg_n, _ = tatr.slot_into_containers(
            two, tok, unique_assignment=False
        )
        assert slots_n == [[0], [0]] and pkg_n == [[0, 1]]

    def test_structures_to_cells_grid(self):
        rows = [
            {"bbox": (0, 0, 30, 10), "label": "table row", "score": 1.0},
            {"bbox": (0, 10, 30, 20), "label": "table row", "score": 1.0},
        ]
        cols = [
            {"bbox": (0, 0, 15, 20), "label": "table column", "score": 1.0},
            {"bbox": (15, 0, 30, 20), "label": "table column", "score": 1.0},
        ]
        header = {"bbox": (0, 0, 30, 10), "label": "table column header", "score": 1.0}
        structure = tatr.objects_to_structures(rows + cols + [header])
        assert [r["header"] for r in structure["rows"]] == [True, False]
        cells = tatr.structure_to_cells(structure)
        assert len(cells) == 4
        assert [(c["row"], c["col"]) for c in cells] == [(0, 0), (0, 1), (1, 0), (1, 1)]
        assert cells[0]["header"] and not cells[2]["header"]

    def test_supercell_merge(self):
        rows = [
            {"bbox": (0, 0, 30, 10), "label": "table row", "score": 1.0},
            {"bbox": (0, 10, 30, 20), "label": "table row", "score": 1.0},
        ]
        cols = [
            {"bbox": (0, 0, 15, 20), "label": "table column", "score": 1.0},
            {"bbox": (15, 0, 30, 20), "label": "table column", "score": 1.0},
        ]
        sc = {"bbox": (0, 0, 30, 10), "label": "table spanning cell", "score": 1.0}
        structure = tatr.objects_to_structures(rows + cols + [sc])
        cells = tatr.structure_to_cells(structure)
        assert len(cells) == 3  # top row merged into one spanning cell
        spanning = cells[0]
        assert spanning["bbox"] == (0, 0, 30, 10)

    def test_extract_text_hyphen_aware(self):
        spans = [
            {"text": "value", "block_num": 0, "line_num": 1, "span_num": 0},
            {"text": "hy-", "block_num": 0, "line_num": 0, "span_num": 0},
            {"text": "phen", "block_num": 0, "line_num": 0, "span_num": 1},
        ]
        assert tatr.extract_text_from_spans(spans) == "hyphen value"


class TestPlotDigitize:
    def _scatter(self, points, size=100):
        img = np.full((size, size), 255, dtype=np.uint8)
        for x, y in points:
            img[y - 2 : y + 3, x - 2 : x + 3] = 0
        return img

    def test_otsu_bimodal(self):
        img = np.full((50, 50), 230, dtype=np.uint8)
        img[:10, :10] = 20
        t = plot_digitize.otsu_threshold(img)
        # Otsu picks the first maximizing threshold; dark class is [0..t]
        assert 20 <= t < 230

    def test_extract_points_recovers_markers(self):
        truth = [(20, 70), (40, 50), (60, 35), (80, 20)]
        img = self._scatter(truth)
        pts = plot_digitize.extract_points(img, blur_radius=1, eps=4.0)
        assert len(pts) == len(truth)
        for (px, py), (tx, ty) in zip(pts, truth):
            assert abs(px - tx) <= 2 and abs(py - ty) <= 2

    def test_fit_curve_linear(self):
        pts = [(0.0, 1.0), (1.0, 3.0), (2.0, 5.0)]
        coef = plot_digitize.fit_curve(pts, degree=1)
        assert coef[-2] == pytest.approx(2.0, abs=1e-8)
        assert coef[-1] == pytest.approx(1.0, abs=1e-8)

    def test_gated_backends(self):
        with pytest.raises(NotImplementedError, match="scikit-learn"):
            plot_digitize.fit_svr([(0, 0), (1, 1)])
        with pytest.raises(NotImplementedError, match="pytesseract"):
            plot_digitize.read_axis_labels(
                np.zeros((5, 5), dtype=np.uint8), [(0, 0, 4, 4)],
                backend="pytesseract",
            )
        with pytest.raises(ValueError):
            plot_digitize.fit_curve([(0, 0)], backend="svr")

    def test_gpr_interpolates(self):
        # Real GPR body: near-interpolation of smooth data at low noise.
        pts = [(float(x), float(np.sin(x / 10.0))) for x in range(0, 100, 10)]
        pred = plot_digitize.fit_gpr(pts, length_scale=15.0, noise=1e-6)
        for x, y in pts:
            assert pred(x)[0] == pytest.approx(y, abs=1e-3)
        # Smooth in between (bounded by the data range).
        mid = pred(np.arange(0, 90, 1.0))
        assert mid.min() >= -1.1 and mid.max() <= 1.1

    def test_axis_calibration_end_to_end(self):
        from tableextraction_ray.glyphs import render_text

        # Two tick labels rendered with the corpus glyph font, read back by
        # the synthetic-glyph OCR, then used to calibrate pixel->data.
        img = np.full((60, 220), 255, dtype=np.uint8)
        render_text(img, 15, 12, "10")
        render_text(img, 155, 12, "90")
        vals = plot_digitize.read_axis_labels(
            img, [(5, 2, 80, 55), (145, 2, 219, 55)], backend="synthetic-glyph"
        )
        assert vals == [10.0, 90.0]
        a, b = plot_digitize.calibrate_axis([30.0, 170.0], vals)
        assert a * 30.0 + b == pytest.approx(10.0)
        assert a * 170.0 + b == pytest.approx(90.0)

    def test_digitize_plot_end_to_end(self):
        img = self._scatter([(20, 80), (50, 50), (80, 20)])
        out = plot_digitize.digitize_plot(img, degree=1)
        assert len(out["points"]) == 3
        # y decreases as x increases -> negative slope
        assert out["coeffs"][-2] < 0


class TestPropsKeyStats:
    def test_missing_key_and_negative_values(self, ray_session):
        import ray.data

        from tableextraction_ray.functions.relational import props_key_stats

        events = ray.data.from_items(
            [
                {"event_type": "a", "props": '{"k": 5}'},
                {"event_type": "a", "props": '{"k": -3}'},
                {"event_type": "a", "props": '{"other": 9}'},
                {"event_type": "b", "props": '{"k":7}'},
            ]
        )
        out = {r["event_type"]: r for r in props_key_stats(events).take_all()}
        assert out["a"]["n_with_key"] == 2
        assert out["a"]["sum_k"] == 2 and out["a"]["min_k"] == -3 and out["a"]["max_k"] == 5
        assert out["b"]["n_with_key"] == 1 and out["b"]["sum_k"] == 7


class TestTableConfidence:
    def test_reference_formula(self):
        # two cells; one span fully inside (score 1.0), one half-in
        # (score 0.5): confidence = (mean + min)/2 = (0.75 + 0.5)/2
        cells = [{"bbox": (0, 0, 10, 10)}, {"bbox": (10, 0, 20, 10)}]
        spans = [
            {"bbox": (1, 1, 3, 3)},
            {"bbox": (5, 0, 15, 10)},  # 0.5 in each cell
        ]
        c = tatr.table_confidence_score(cells, spans)
        assert abs(c - ((1.0 + 0.5) / 2 + 0.5) / 2) < 1e-9

    def test_empty_sides_zero(self):
        assert tatr.table_confidence_score([], [{"bbox": (0, 0, 1, 1)}]) == 0.0
        assert tatr.table_confidence_score([{"bbox": (0, 0, 1, 1)}], []) == 0.0
