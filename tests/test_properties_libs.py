"""Hypothesis property tests for the pure parity libraries (no Ray)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tableextraction_ray import metrics, plot_digitize, tatr

texts = st.text(alphabet="abcXY ", max_size=8)
grids = st.lists(st.lists(texts, min_size=1, max_size=4), min_size=0, max_size=4)


class TestGritsProperties:
    @given(grids, grids)
    @settings(max_examples=60, deadline=None)
    def test_range_and_symmetry(self, a, b):
        s = metrics.grits_con(a, b)
        assert 0.0 <= s <= 1.0
        assert s == metrics.grits_con(b, a)

    @given(grids)
    @settings(max_examples=40, deadline=None)
    def test_identity(self, g):
        assert metrics.grits_con(g, g) == 1.0

    @given(texts, texts)
    @settings(max_examples=60, deadline=None)
    def test_lcs_bounds(self, a, b):
        s = metrics.lcs_similarity(a, b)
        assert 0.0 <= s <= 1.0
        assert s == metrics.lcs_similarity(b, a)
        if a == b:
            assert s == 1.0


boxes = st.tuples(
    st.integers(0, 50), st.integers(0, 50), st.integers(0, 50), st.integers(0, 50)
).map(lambda t: (min(t[0], t[2]), min(t[1], t[3]), max(t[0], t[2]), max(t[1], t[3])))


class TestTatrProperties:
    @given(boxes, boxes)
    @settings(max_examples=100, deadline=None)
    def test_iou_iob_bounds(self, a, b):
        assert 0.0 <= tatr.iou(a, b) <= 1.0
        assert 0.0 <= tatr.iob(a, b) <= 1.0
        assert tatr.iou(a, b) == tatr.iou(b, a)
        if tatr.area(a) > 0:
            assert tatr.iob(a, a) == 1.0

    @given(st.lists(st.tuples(boxes, st.floats(0.01, 1.0)), max_size=8))
    @settings(max_examples=50, deadline=None)
    def test_nms_idempotent(self, items):
        objs = [{"bbox": b, "label": "x", "score": s} for b, s in items]
        once = tatr.nms(objs)
        twice = tatr.nms(once)
        assert once == twice
        assert len(once) <= len(objs)


class TestPlotProperties:
    @given(st.integers(0, 255), st.integers(0, 255))
    @settings(max_examples=30, deadline=None)
    def test_otsu_in_range(self, lo, hi):
        img = np.full((20, 20), hi, dtype=np.uint8)
        img[:5, :] = lo
        t = plot_digitize.otsu_threshold(img)
        assert 0 <= t <= 255

    @given(st.lists(st.tuples(st.floats(-100, 100), st.floats(-100, 100)), max_size=10))
    @settings(max_examples=50, deadline=None)
    def test_merge_eps_no_point_loss_beyond_merging(self, pts):
        merged = plot_digitize._merge_eps(pts, eps=3.0)
        assert len(merged) <= len(pts)
        if pts:
            assert len(merged) >= 1


class TestMinhashProperties:
    """Affine-permutation minhash (dedup.py): pure-function properties."""

    @given(st.lists(st.text(alphabet="abcdef gh", min_size=1, max_size=12), min_size=1, max_size=20))
    @settings(max_examples=60, deadline=None)
    def test_signature_is_set_function(self, shingles):
        from tableextraction_ray.functions.dedup import NUM_PERMS, M61, minhash_signature

        sig = minhash_signature(shingles)
        assert len(sig) == NUM_PERMS
        assert all(0 <= v < M61 for v in sig)
        # order/multiplicity invariance (min over a set)
        assert minhash_signature(list(reversed(shingles)) + shingles) == sig

    @given(
        st.lists(st.text(alphabet="abc", min_size=1, max_size=6), min_size=1, max_size=10),
        st.lists(st.text(alphabet="abc", min_size=1, max_size=6), min_size=1, max_size=10),
    )
    @settings(max_examples=60, deadline=None)
    def test_subset_monotonicity(self, a, b):
        """sig(a | b) is the element-wise min of sig(a) and sig(b) — the
        algebra the banded-LSH collision probability rests on."""
        from tableextraction_ray.functions.dedup import minhash_signature

        sa, sb, sab = (
            minhash_signature(a),
            minhash_signature(b),
            minhash_signature(a + b),
        )
        assert sab == [min(x, y) for x, y in zip(sa, sb)]


class TestNormalizeProperties:
    @given(st.text(max_size=60))
    @settings(max_examples=80, deadline=None)
    def test_idempotent_and_shape(self, t):
        """normalize(normalize(x)) == normalize(x); output is single-spaced
        lowercase with no leading/trailing space."""
        from tableextraction_ray.functions.textstats import normalize_string as norm

        out = norm(t)
        assert norm(out) == out
        assert "  " not in out
        assert out == out.strip(" ")
