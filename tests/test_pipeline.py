"""Golden end-to-end pipeline tests (SURVEY.md §5.2 items 1 and 3):
span-sequence equality on the t1 corpus and permutation invariance."""

import pyarrow.parquet as pq
import pytest

from tableextraction_ray.pipelines.extract import ExtractConfig, build_extraction_pipeline


def _load_golden(corpus):
    return {
        r["doc_id"]: r["spans"]
        for r in pq.read_table(corpus + "/golden.parquet").to_pylist()
    }


@pytest.fixture(scope="module")
def pipeline_result(t1_corpus):
    ds = build_extraction_pipeline(t1_corpus)
    return {r["doc_id"]: r["spans"] for r in ds.take_all()}


class TestGoldenEquality:
    def test_all_docs_present(self, t1_corpus, pipeline_result):
        assert set(pipeline_result) == set(_load_golden(t1_corpus))

    def test_span_sequences_exact(self, t1_corpus, pipeline_result):
        golden = _load_golden(t1_corpus)
        mismatched = [d for d in golden if pipeline_result[d] != golden[d]]
        assert mismatched == []

    def test_schema_closed(self, pipeline_result):
        # output spans carry the input schema fields (FIXTURES.md §3)
        some = next(iter(pipeline_result.values()))
        assert set(some[0]) == {"kind", "text", "media_ref", "offset"}
        assert [s["offset"] for s in some] == list(range(len(some)))


class TestPermutationInvariance:
    def test_shuffled_input_same_output(self, t1_corpus, pipeline_result):
        import ray.data

        docs = (
            ray.data.read_parquet(t1_corpus + "/documents.parquet")
            .random_shuffle(seed=7)
            .repartition(5)
        )
        ds = build_extraction_pipeline(t1_corpus, docs=docs)
        shuffled = {r["doc_id"]: r["spans"] for r in ds.take_all()}
        assert shuffled == pipeline_result

    def test_batch_size_invariance(self, t1_corpus, pipeline_result):
        cfg = ExtractConfig(decode_batch_size=3, detect_batch_size=2, ocr_batch_size=17)
        ds = build_extraction_pipeline(t1_corpus, config=cfg)
        out = {r["doc_id"]: r["spans"] for r in ds.take_all()}
        assert out == pipeline_result
