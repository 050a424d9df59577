"""Scale-path guarantees: banded-LSH near-dup recall, heavy-duplicate skew
guard in MinHash candidate generation, and the dimension-size-guarded join
fallback (round-2 verdict items 1, 9, 10)."""

import time

import pyarrow as pa
import pytest

from tableextraction_ray.functions import dedup, relational, similarity

SF_DIR = "/root/testdata/sf0.001"


class TestLshNearDupRecall:
    def test_recall_vs_exact(self, ray_session):
        import ray.data

        emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")
        exact = {
            (r["vec_a"], r["vec_b"]): r["cos_fp5"]
            for r in similarity.near_dup_pairs(emb).take_all()
        }
        lsh = {
            (r["vec_a"], r["vec_b"]): r["cos_fp5"]
            for r in similarity.lsh_near_dup(emb).take_all()
        }
        assert exact, "fixture should contain threshold-crossing pairs"
        # Banded multi-table LSH: b=40 tables of r=5 planes gives >= 0.97
        # expected recall at the hardest (threshold) cosine; bar at 0.9.
        recall = len(set(exact) & set(lsh)) / len(exact)
        assert recall >= 0.9
        # In-bucket verification is the exact quantized cosine: no false
        # positives, and every reported value matches the exact operator.
        assert set(lsh) <= set(exact)
        assert all(exact[k] == lsh[k] for k in lsh)


class TestMinhashSkewGuard:
    def test_thousand_identical_docs_no_blowup(self, ray_session):
        import ray.data

        text = "the same spam document body repeated across the crawl corpus"
        n = 1000
        tbl = pa.Table.from_pydict(
            {
                "doc_id": pa.array(list(range(n + 2)), type=pa.int64()),
                "text": pa.array(
                    [text] * n
                    + [text + " tail variation one", "another document entirely ok"],
                    type=pa.string(),
                ),
            }
        )
        ds = ray.data.from_arrow(tbl)
        t0 = time.time()
        pairs = dedup.minhash_candidates(ds).take_all()
        wall = time.time() - t0
        # Exact-text collapse: 1,000 copies -> one representative (doc 0),
        # so candidates stay O(distinct docs), not O(copies^2) ~ 500k pairs.
        assert len(pairs) < 10
        assert all(p["doc_a"] == 0 or p["doc_b"] == 0 or 0 not in p.values() for p in pairs)
        for p in pairs:
            assert p["doc_a"] not in range(1, n) and p["doc_b"] not in range(1, n)
        assert wall < 60

    def test_collapse_keeps_cross_text_candidates(self, ray_session):
        import ray.data

        # Long shared prefix so the near-dup deterministically collides in
        # at least one of the 4 bands (verified: 3/4 bands match).
        base = " ".join(f"tok{i}" for i in range(30))
        tbl = pa.Table.from_pydict(
            {
                "doc_id": pa.array([7, 3, 9], type=pa.int64()),
                "text": pa.array([base, base, base + " iota"], type=pa.string()),
            }
        )
        pairs = {
            (p["doc_a"], p["doc_b"])
            for p in dedup.minhash_candidates(ray.data.from_arrow(tbl)).take_all()
        }
        # Docs 3 and 7 are exact copies -> rep is 3; near-dup doc 9 pairs
        # with the representative only.
        assert pairs == {(3, 9)}


class TestJoinSizeGuard:
    @pytest.fixture()
    def tables(self, ray_session):
        import ray.data

        orders = ray.data.read_parquet(
            "/root/testdata/sf0.001/orders.parquet",
            columns=["o_custkey", "o_totalprice"],
        )
        customer = ray.data.read_parquet(
            "/root/testdata/sf0.001/customer.parquet",
            columns=["c_custkey", "c_mktsegment"],
        )
        return orders, customer

    def test_shuffle_fallback_matches_broadcast(self, tables):
        orders, customer = tables

        def canon(ds):
            return sorted(
                (r["c_mktsegment"], r["n_orders"], r["total_c"])
                for r in ds.take_all()
            )

        broadcast = canon(relational.orders_by_segment(orders, customer))
        shuffled = canon(
            relational.orders_by_segment(orders, customer, broadcast_limit=0)
        )
        assert broadcast == shuffled
