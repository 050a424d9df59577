"""Per-document error tolerance: corrupt/missing media degrades to a bare
marker span instead of failing the run (SURVEY.md §4.1 retry policy)."""

import os
import shutil

import pytest

from tableextraction_ray.datagen import generate_corpus
from tableextraction_ray.pipelines.extract import build_extraction_pipeline
from tableextraction_ray.stages import explode_result_spans


@pytest.fixture()
def corrupt_corpus(tmp_path, ray_session):
    src = generate_corpus("/tmp/graft_corpus/t1", tier="t1")
    dst = str(tmp_path / "corpus")
    shutil.copytree(src, dst)
    # Corrupt one page and delete another.
    corrupt = os.path.join(dst, "media/doc-000000/p0.png")
    with open(corrupt, "wb") as f:
        f.write(b"not a png at all")
    os.remove(os.path.join(dst, "media/doc-000003/p0.png"))
    # The small-tier sidecar would shadow the broken file store.
    os.remove(os.path.join(dst, "media.parquet"))
    return dst


class TestErrorTolerance:
    def test_corrupt_media_degrades_to_marker(self, corrupt_corpus):
        out = (
            build_extraction_pipeline(corrupt_corpus)
            .map_batches(explode_result_spans, batch_format="pyarrow")
            .to_pandas()
        )
        # Whole corpus still extracted.
        assert out.doc_id.nunique() == 32
        # The broken docs keep their media marker and their pure-text spans,
        # and just lose the table spans behind the broken page.
        d0 = out[out.doc_id == "doc-000000"]
        assert (d0.kind == "media").sum() == 1
        assert (d0.kind == "text").sum() >= 1
        # Every other doc is bit-identical to a clean run.
        clean = (
            build_extraction_pipeline("/tmp/graft_corpus/t1")
            .map_batches(explode_result_spans, batch_format="pyarrow")
            .to_pandas()
        )
        broken = {"doc-000000", "doc-000003"}
        a = out[~out.doc_id.isin(broken)].sort_values(["doc_id", "offset"]).reset_index(drop=True)
        b = clean[~clean.doc_id.isin(broken)].sort_values(["doc_id", "offset"]).reset_index(drop=True)
        assert a.equals(b)


class TestMultimodalPoisonPills:
    """A corrupt media payload must not kill a catalog pass: the stage
    skips the row (or raises under on_error='raise')."""

    def _media_ds(self, ray_session):
        import ray.data

        from tableextraction_ray.png import encode_gray
        import numpy as np

        good = encode_gray(np.full((8, 6), 255, dtype=np.uint8))
        return ray.data.from_items(
            [
                {"media_ref": "m/good.png", "payload": good},
                {"media_ref": "m/bad.png", "payload": b"\x89PNGgarbage"},
                {"media_ref": "m/empty.png", "payload": b""},
            ]
        )

    def test_stats_skips_corrupt(self, ray_session):
        from tableextraction_ray.functions.multimodal import media_stats

        rows = media_stats(self._media_ds(ray_session)).take_all()
        assert [r["media_ref"] for r in rows] == ["m/good.png"]
        assert rows[0]["width"] == 6 and rows[0]["height"] == 8

    def test_thumbnails_skip_corrupt(self, ray_session):
        from tableextraction_ray.functions.multimodal import media_thumbnails

        rows = media_thumbnails(self._media_ds(ray_session)).take_all()
        assert [r["media_ref"] for r in rows] == ["m/good.png"]

    def test_raise_mode_propagates(self, ray_session):
        import pytest
        import ray.exceptions

        from tableextraction_ray.functions.multimodal import ImageStats

        import pyarrow as pa

        batch = pa.Table.from_pydict(
            {"media_ref": ["x"], "payload": [b"notapng"]}
        )
        with pytest.raises(Exception):
            ImageStats(on_error="raise")(batch)
        # skip mode on the same batch yields an empty table
        assert len(ImageStats()(batch)) == 0
