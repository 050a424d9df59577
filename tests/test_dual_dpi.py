"""Two-DPI production parity (round-2 verdict item 2): the reference
rasterizes every page at 50 AND 500 DPI, detects tables on the cheap
raster and crops/OCRs the sharp one (extractor.py:24-33,
detection.py:98-122, resize_tables_cells detection.py:607-628). The
engine's dual-DPI corpus tier stores the high raster; the pipeline
detects/reconstructs on its exact k x subsample and OCRs the sharp
crops — golden span equality must hold on the new tier."""

import numpy as np
import pyarrow.parquet as pq

from tableextraction_ray.datagen import TIER_HIDPI_SCALE, generate_corpus


def _flatten_golden(corpus):
    import os

    g = pq.read_table(os.path.join(corpus, "golden.parquet"))
    rows = []
    for doc_id, spans in zip(g["doc_id"].to_pylist(), g["spans"].to_pylist()):
        for s in spans:
            rows.append((doc_id, s["offset"], s["kind"], s["text"], s["media_ref"]))
    return sorted(rows)


class TestDualDpiCorpus:
    def test_hidpi_pages_are_exact_upscale(self, ray_session, tmp_path):
        from tableextraction_ray import png
        from tableextraction_ray.datagen import build_doc

        base = build_doc(2)
        hi = build_doc(2, hidpi_scale=3)
        assert [r for r, _ in base["media"]] == [r for r, _ in hi["media"]]
        for (_, b), (_, h) in zip(base["media"], hi["media"]):
            bimg = png.decode_gray(b)
            himg = png.decode_gray(h)
            assert himg.shape == (bimg.shape[0] * 3, bimg.shape[1] * 3)
            assert np.array_equal(himg[::3, ::3], bimg)
            assert np.array_equal(himg, np.kron(bimg, np.ones((3, 3), np.uint8)))
        # Golden spans identical: resolution never changes content.
        assert base["golden"] == hi["golden"]

    def test_golden_span_equality_on_dual_dpi_tier(self, ray_session):
        from tableextraction_ray.pipelines.extract import build_extraction_pipeline
        from tableextraction_ray.stages import explode_result_spans

        corpus = generate_corpus("/tmp/graft_corpus/t1hi", tier="t1hi")
        assert TIER_HIDPI_SCALE["t1hi"] == 3
        out = build_extraction_pipeline(corpus).map_batches(
            explode_result_spans, batch_format="pyarrow"
        )
        got = sorted(
            (r["doc_id"], r["offset"], r["kind"], r["text"], r["media_ref"])
            for r in out.take_all()
        )
        assert got == _flatten_golden(corpus)

    def test_verify_pipeline_zero_mismatches_on_dual_dpi_tier(self, ray_session):
        from tableextraction_ray.pipelines.verify import verify_against_golden

        corpus = generate_corpus("/tmp/graft_corpus/t1hi", tier="t1hi")
        mismatches = verify_against_golden(corpus, mismatches_only=True).take_all()
        assert mismatches == []

    def test_explicit_dpi_scale_matches_auto(self, ray_session):
        """The manifest auto-detect and an explicit ExtractConfig(dpi_scale)
        produce identical results."""
        from tableextraction_ray.pipelines.extract import (
            ExtractConfig,
            build_extraction_pipeline,
        )
        from tableextraction_ray.stages import explode_result_spans

        corpus = generate_corpus("/tmp/graft_corpus/t1hi", tier="t1hi")
        explicit = build_extraction_pipeline(
            corpus, config=ExtractConfig(dpi_scale=3)
        ).map_batches(explode_result_spans, batch_format="pyarrow")
        got = sorted(
            (r["doc_id"], r["offset"], r["kind"], r["text"], r["media_ref"])
            for r in explicit.take_all()
        )
        assert got == _flatten_golden(corpus)
