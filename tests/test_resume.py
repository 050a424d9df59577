"""Checkpoint/resume tests (SURVEY.md §5.2 item 5): kill after partition k,
restart, verify no duplicate / no missing doc_ids and identical results."""

import os
import shutil

import pyarrow.parquet as pq


def _spans_by_doc(ds):
    return {r["doc_id"]: [
        {k: s[k] for k in ("kind", "text", "media_ref", "offset")} for s in r["spans"]
    ] for r in ds.take_all()}


class TestResume:
    def test_partitioned_run_matches_golden(self, t1_corpus, tmp_path):
        from tableextraction_ray.state.checkpoint import read_results, run_partitioned

        out = str(tmp_path / "out")
        totals = run_partitioned(t1_corpus, out, num_parts=3)
        assert totals["skipped_parts"] == 0
        golden = {
            r["doc_id"]: r["spans"]
            for r in pq.read_table(t1_corpus + "/golden.parquet").to_pylist()
        }
        got = _spans_by_doc(read_results(out))
        assert got == golden

    def test_resume_skips_done_and_completes(self, t1_corpus, tmp_path):
        from tableextraction_ray.state.checkpoint import (
            list_done_parts,
            read_results,
            run_partitioned,
        )

        out = str(tmp_path / "out2")
        run_partitioned(t1_corpus, out, num_parts=3)

        # Simulate a crash after partition 0: drop partitions 1 and 2
        # (partition 1 loses its manifest AND data; partition 2 loses only
        # the manifest — a partial write must be redone too).
        shutil.rmtree(os.path.join(out, "part=00001"))
        os.remove(os.path.join(out, "part=00002", "_DONE.json"))
        assert list_done_parts(out, 3) == {0}

        totals = run_partitioned(t1_corpus, out, num_parts=3)
        assert totals["skipped_parts"] == 1

        golden = {
            r["doc_id"]: r["spans"]
            for r in pq.read_table(t1_corpus + "/golden.parquet").to_pylist()
        }
        got = _spans_by_doc(read_results(out))
        assert sorted(got) == sorted(golden)  # no dupes, none missing
        assert got == golden

    def test_repartitioned_resume_sweeps_stale_parts(self, t1_corpus, tmp_path):
        """Resuming with a SMALLER num_parts must not leave stale part dirs
        from the wider run — read_results reads every part dir, so stale
        dirs mean silently duplicated documents."""
        from tableextraction_ray.state.checkpoint import read_results, run_partitioned

        out = str(tmp_path / "out3")
        run_partitioned(t1_corpus, out, num_parts=4)
        totals = run_partitioned(t1_corpus, out, num_parts=2)
        assert totals["stale_parts_removed"] == 4  # all 4 carry num_parts=4
        assert totals["skipped_parts"] == 0
        golden = {
            r["doc_id"]: r["spans"]
            for r in pq.read_table(t1_corpus + "/golden.parquet").to_pylist()
        }
        got = _spans_by_doc(read_results(out))
        assert got == golden  # exactly once each, schema unchanged

    def test_written_schema_is_result_schema(self, t1_corpus, tmp_path):
        from tableextraction_ray.state.checkpoint import run_partitioned

        out = str(tmp_path / "out4")
        run_partitioned(t1_corpus, out, num_parts=2)
        tbl = pq.read_table(os.path.join(out, "part=00000"))
        assert tbl.schema.names == ["doc_id", "spans"]  # no internal columns

    def test_partition_assignment_deterministic(self):
        from tableextraction_ray.state.checkpoint import doc_partition

        assert doc_partition("doc-000000", 4) == doc_partition("doc-000000", 4)
        parts = {doc_partition(f"doc-{i:06d}", 4) for i in range(64)}
        assert parts == {0, 1, 2, 3}
