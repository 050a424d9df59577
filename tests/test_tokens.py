"""PDF-native page tokens (round-2 verdict missing item 5): distributed
*_words.json sidecar reader (reference grits.py:861-869 format) feeding
tatr.extract_text_from_spans / slot_into_containers, plus the gated fitz
extractor."""

import json

import pytest

from tableextraction_ray.sources.tokens import (
    PdfTokenExtractor,
    read_page_tokens,
    tokens_for_page,
)


def _words(path, tokens):
    path.write_text(json.dumps(tokens))


class TestSidecarReader:
    def test_reads_tree_distributed(self, ray_session, tmp_path):
        _words(
            tmp_path / "page0_words.json",
            [
                {"bbox": [1, 2, 3, 4], "text": "alpha", "flags": 0,
                 "span_num": 0, "line_num": 0, "block_num": 0},
                {"bbox": [5, 2, 9, 4], "text": "beta", "flags": 0,
                 "span_num": 1, "line_num": 0, "block_num": 0},
            ],
        )
        # minimal dict (defaults: flags 0, span_num=index, line/block 0)
        _words(tmp_path / "page1_words.json",
               [{"bbox": [0, 0, 2, 2], "text": "solo"}])
        (tmp_path / "notes.txt").write_text("ignored non-sidecar file")

        rows = read_page_tokens(str(tmp_path)).take_all()
        by_page = {}
        for r in rows:
            by_page.setdefault(r["page_id"], []).append(r)
        assert set(by_page) == {"page0", "page1"}
        assert [r["text"] for r in sorted(by_page["page0"], key=lambda r: r["token_idx"])] == ["alpha", "beta"]
        assert by_page["page1"][0]["span_num"] == 0

    def test_tokens_feed_tatr_text_extraction(self, ray_session, tmp_path):
        """The reader's rows reconstruct the exact token dicts
        extract_text_from_spans consumes (sort by span->line->block,
        hyphen-aware line joins)."""
        from tableextraction_ray import tatr

        _words(
            tmp_path / "p_words.json",
            [
                {"bbox": [0, 10, 5, 12], "text": "world", "flags": 0,
                 "span_num": 1, "line_num": 1, "block_num": 0},
                {"bbox": [0, 0, 5, 2], "text": "hello", "flags": 0,
                 "span_num": 0, "line_num": 0, "block_num": 0},
            ],
        )
        rows = read_page_tokens(str(tmp_path)).take_all()
        tokens = tokens_for_page(rows)
        assert tatr.extract_text_from_spans(tokens) == "hello world"
        # Geometry survives for container slotting.
        assert tokens[0]["bbox"] == [0.0, 10.0, 5.0, 12.0]


class TestFitzGate:
    def test_gated_on_import(self):
        with pytest.raises(NotImplementedError, match="fitz"):
            PdfTokenExtractor()
