"""Round-4 engine ops: output-shard planning, snapshot diff, key-skew
probe, canary scan. Parity vs the DuckDB oracles is covered by
test_entry_parity; these tests pin the semantic invariants the oracles
can't see (manifest completeness, status partitioning, determinism under
repartitioning)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from tableextraction_ray.functions.curate import corpus_diff
from tableextraction_ray.functions.relational import key_skew_report
from tableextraction_ray.functions.textstats import (
    canary_scan,
    shard_plan,
    vocab_oov_rate,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def docs_ds(ray_session):
    return ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )


class TestShardPlan:
    def test_manifest_partitions_corpus(self, docs_ds):
        rows = sorted(
            shard_plan(docs_ds, target_chars=20_000).take_all(),
            key=lambda r: r["shard_id"],
        )
        t = pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "n_chars"]
        )
        # every doc lands in exactly one shard; char totals add up
        assert sum(r["n_docs"] for r in rows) == len(t)
        assert sum(r["n_chars"] for r in rows) == int(
            pa.compute.sum(t["n_chars"]).as_py()
        )
        # shard extents tile the doc_id range without overlap
        for a, b in zip(rows, rows[1:]):
            assert a["last_doc_id"] < b["first_doc_id"]
            assert b["shard_id"] == a["shard_id"] + 1
        # greedy packing: every shard holds ~target chars (the doc that
        # crosses the boundary belongs to the shard it started in)
        for r in rows[:-1]:
            assert r["n_chars"] >= 20_000 - 600  # max doc len is < 600

    def test_invariant_under_repartition(self, docs_ds):
        a = sorted(
            map(tuple, (r.values() for r in shard_plan(docs_ds).take_all()))
        )
        b = sorted(
            map(
                tuple,
                (
                    r.values()
                    for r in shard_plan(docs_ds.repartition(13)).take_all()
                ),
            )
        )
        assert a == b


class TestCorpusDiff:
    def test_statuses_partition_id_space(self, ray_session):
        old = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": [1, 2, 3, 4],
                    "text": ["a", "b", "c", "d"],
                }
            )
        )
        new = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": [2, 3, 4, 9],
                    "text": ["b", "CHANGED", "d", "z"],
                }
            )
        )
        got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).take_all()}
        assert got == {
            1: "removed",
            2: "unchanged",
            3: "changed",
            4: "unchanged",
            9: "added",
        }

    def test_empty_new_side_all_removed(self, ray_session):
        old = ray.data.from_arrow(
            pa.table({"doc_id": [5, 6], "text": ["x", "y"]})
        )
        new = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "text": pa.array([], type=pa.string()),
                }
            )
        )
        got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).take_all()}
        assert got == {5: "removed", 6: "removed"}


class TestKeySkewReport:
    def test_hot_key_ranks_first_with_ratio(self, ray_session):
        # 60 events on key 1, 20 on key 2, 20 on key 3 -> mean 100/3
        events = ray.data.from_arrow(
            pa.table({"user_id": [1] * 60 + [2] * 20 + [3] * 20})
        )
        rows = key_skew_report(events, top_n=2).take_all()
        assert [r["user_id"] for r in rows] == [1, 2]  # tie 2/3 -> min key
        assert rows[0]["n_events"] == 60 and rows[0]["n_keys"] == 3
        # 60 / (100/3) = 1.8 -> 1_800_000 fp6
        assert rows[0]["skew_fp6"] == 1_800_000
        assert rows[1]["skew_fp6"] == 600_000


class TestVocabOovRate:
    def test_oov_counted_against_topk_vocab(self, ray_session):
        # vocab k=2 -> {'a', 'b'} (a:4, b:3); 'x'/'y' are OOV
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": [1, 2],
                    "source": ["s1", "s2"],
                    "text": ["a a b x", "a b b a y x"],
                }
            )
        )
        rows = {r["source"]: r for r in vocab_oov_rate(ds, k=2).take_all()}
        assert rows["s1"]["n_tokens"] == 4 and rows["s1"]["n_oov"] == 1
        assert rows["s1"]["oov_fp6"] == 250_000
        assert rows["s2"]["n_tokens"] == 6 and rows["s2"]["n_oov"] == 2
        assert rows["s2"]["oov_fp6"] == 333_333  # floor division


class TestCanaryScan:
    def test_counts_and_zero_hit_omitted(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": [10, 11, 12],
                    "text": ["needle in hay", "no match", "a needle too"],
                }
            )
        )
        rows = {
            r["canary"]: r
            for r in canary_scan(ds, ["needle", "absent-string"]).take_all()
        }
        assert set(rows) == {"needle"}
        assert rows["needle"]["n_docs"] == 2
        assert rows["needle"]["first_doc_id"] == 10
