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
