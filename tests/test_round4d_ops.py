"""Round-4 batch-5 ops: TPC-H Q8/Q9 shapes. Oracle parity runs in
test_entry_parity; these pin the guarded broadcast==shuffle equality and
the share/profit arithmetic the oracle hash alone wouldn't localize."""

import ray.data

from tableextraction_ray.functions import relational

SF_DIR = "/root/testdata/sf0.001"


def _rd(t, cols):
    return ray.data.read_parquet(f"{SF_DIR}/{t}.parquet", columns=cols)


class TestNationMarketShare:
    def _tables(self):
        return dict(
            lineitem=_rd(
                "lineitem",
                ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
            ),
            orders=_rd("orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
            customer=_rd("customer", ["c_custkey", "c_nationkey"]),
            supplier=_rd("supplier", ["s_suppkey", "s_nationkey"]),
            nation=_rd("nation", ["n_nationkey", "n_regionkey"]),
        )

    def _canon(self, ds):
        return sorted(
            (r["o_year"], r["nation_rev_cc"], r["total_rev_cc"], r["share_bp"])
            for r in ds.take_all()
        )

    def test_shuffle_fallback_matches_broadcast(self, ray_session):
        broadcast = self._canon(relational.nation_market_share(**self._tables()))
        shuffled = self._canon(
            relational.nation_market_share(**self._tables(), broadcast_limit=0)
        )
        assert broadcast == shuffled and len(broadcast) > 0

    def test_share_is_floor_division_and_bounded(self, ray_session):
        rows = self._canon(relational.nation_market_share(**self._tables()))
        for year, nat, tot, bp in rows:
            assert year in (1995, 1996)
            assert 0 <= nat <= tot
            assert bp == nat * 10_000 // tot


class TestProductTypeProfit:
    def _tables(self):
        return dict(
            lineitem=_rd(
                "lineitem",
                [
                    "l_orderkey",
                    "l_partkey",
                    "l_suppkey",
                    "l_quantity",
                    "l_extendedprice",
                    "l_discount",
                ],
            ),
            orders=_rd("orders", ["o_orderkey", "o_orderdate"]),
            part=_rd("part", ["p_partkey", "p_name", "p_retailprice"]),
            supplier=_rd("supplier", ["s_suppkey", "s_nationkey"]),
            nation=_rd("nation", ["n_nationkey", "n_name"]),
        )

    def _canon(self, ds):
        return sorted(
            (r["nation"], r["o_year"], r["profit_cc"]) for r in ds.take_all()
        )

    def test_shuffle_fallback_matches_broadcast(self, ray_session):
        broadcast = self._canon(relational.product_type_profit(**self._tables()))
        shuffled = self._canon(
            relational.product_type_profit(**self._tables(), broadcast_limit=0)
        )
        assert broadcast == shuffled and len(broadcast) > 0

    def test_unmatched_token_yields_empty(self, ray_session):
        rows = relational.product_type_profit(
            **self._tables(), name_token="no_such_part_name"
        ).take_all()
        assert rows == []


class TestUserTypeGini:
    def test_single_type_user_scores_zero(self, ray_session):
        import pyarrow as pa

        from tableextraction_ray.functions import relational as rel

        ev = ray.data.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
                    "event_type": pa.array(["a", "a", "a", "a", "b"]),
                }
            )
        )
        rows = {r["user_id"]: r for r in rel.user_type_gini(ev).take_all()}
        assert rows[1]["gini_fp6"] == 0 and rows[1]["n_events"] == 3
        # two types, one each: 1 - 2*(1/2)^2 = 0.5
        assert rows[2]["gini_fp6"] == 500_000


class TestShipLagByPriority:
    def test_shuffle_fallback_matches_broadcast(self, ray_session):
        from tableextraction_ray.functions import relational as rel

        def run(limit):
            return sorted(
                (
                    r["o_orderpriority"],
                    r["n_lines"],
                    r["sum_lag_days"],
                    r["max_lag_days"],
                    r["avg_lag_fp2"],
                )
                for r in rel.ship_lag_by_priority(
                    _rd("lineitem", ["l_orderkey", "l_shipdate"]),
                    _rd(
                        "orders",
                        ["o_orderkey", "o_orderdate", "o_orderpriority"],
                    ),
                    broadcast_limit=limit,
                ).take_all()
            )

        a, b = run(2_000_000), run(0)
        assert a == b and len(a) == 5


class TestBigramNovelty:
    def test_first_doc_is_fully_novel(self, ray_session):
        import pyarrow as pa

        from tableextraction_ray.functions import textstats as ts

        docs = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                    "text": pa.array(
                        ["a b c", "a b d", "x"]  # doc3: no bigrams
                    ),
                }
            )
        )
        rows = {r["doc_id"]: r for r in ts.bigram_novelty(docs).take_all()}
        assert set(rows) == {1, 2}  # doc 3 absent (no bigrams)
        assert rows[1]["n_seen"] == 0 and rows[1]["novel_fp6"] == 1_000_000
        # doc2 shares "a b" with doc1 -> 1 of 2 bigrams seen
        assert rows[2]["n_distinct"] == 2 and rows[2]["n_seen"] == 1
        assert rows[2]["novel_fp6"] == 500_000


class TestEmbeddingDrift:
    def test_identical_halves_zero_drift(self, ray_session):
        import pyarrow as pa

        from tableextraction_ray.functions import similarity as sim

        vec = [0.5] * 64
        emb = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                    "embedding": pa.array(
                        [vec, vec, vec, vec], type=pa.list_(pa.float32())
                    ),
                    "label": pa.array([5, 5, 5, 5], type=pa.int32()),
                }
            )
        )
        rows = sim.embedding_drift(emb).take_all()
        assert rows == [
            {"label": 5, "n_even": 2, "n_odd": 2, "drift_l1": 0}
        ]


class TestRevenueConcentration:
    def test_small_k_matches_manual(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        from tableextraction_ray.functions import relational as rel

        got = rel.revenue_concentration(
            _rd("orders", ["o_custkey", "o_totalprice"]), k=5
        ).take_all()[0]
        t = pq.read_table(f"{SF_DIR}/orders.parquet").to_pandas()
        t["rev_c"] = np.floor(t["o_totalprice"] * 100.0 + 0.5).astype("int64")
        per = t.groupby("o_custkey")["rev_c"].sum().sort_values(
            ascending=False
        )
        topk, total = int(per.head(5).sum()), int(per.sum())
        assert got == {
            "k": 5,
            "topk_rev_c": topk,
            "total_rev_c": total,
            "share_bp": topk * 10_000 // total,
        }


class TestMediaOrphanAudit:
    def test_both_directions_on_handmade_spans(self, ray_session):
        import pyarrow as pa

        from tableextraction_ray.functions import interleaved as il

        span_t = pa.list_(
            pa.struct(
                [
                    ("kind", pa.string()),
                    ("text", pa.string()),
                    ("media_ref", pa.string()),
                    ("offset", pa.int32()),
                ]
            )
        )
        spans = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(["doc-0", "doc-1"]),
                    "spans": pa.array(
                        [
                            [
                                {"kind": "media", "text": "",
                                 "media_ref": "media/a.png", "offset": 0},
                                {"kind": "media", "text": "",
                                 "media_ref": "media/ghost.png", "offset": 1},
                            ],
                            [
                                {"kind": "media", "text": "",
                                 "media_ref": "media/a.png", "offset": 0},
                            ],
                        ],
                        type=span_t,
                    ),
                }
            )
        )
        files = ray.data.from_arrow(
            pa.table(
                {"media_ref": pa.array(["media/a.png", "media/unused.png"])}
            )
        )
        rows = sorted(
            (r["media_ref"], r["n_span_refs"], r["status"])
            for r in il.media_orphan_audit(spans, files).take_all()
        )
        assert rows == [
            ("media/ghost.png", 1, "dangling_ref"),
            ("media/unused.png", 0, "orphan_file"),
        ]


class TestCrossSourceDupMatrix:
    def test_shared_shingle_counts_once(self, ray_session):
        import pyarrow as pa

        from tableextraction_ray.functions import dedup

        docs = ray.data.from_arrow(
            pa.table(
                {
                    "source": pa.array(["s1", "s2", "s2", "s3"]),
                    "text": pa.array(
                        [
                            "a b c d e f",      # s1: shingles abcde, bcdef
                            "a b c d e",        # s2: abcde (shared w/ s1)
                            "z a b c d e",      # s2 again: zabcd, abcde (distinct-per-source)
                            "q w e r t",        # s3: no overlap
                        ]
                    ),
                }
            )
        )
        rows = sorted(
            (r["src_a"], r["src_b"], r["n_shared"])
            for r in dedup.cross_source_dup_matrix(docs).take_all()
        )
        assert rows == [("s1", "s2", 1)]


class TestQualityLengthGrid:
    def test_doc_count_conserved(self, ray_session):
        from tableextraction_ray.functions import textstats as ts

        docs = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        )
        rows = ts.quality_length_grid(docs).take_all()
        assert sum(r["n_docs"] for r in rows) == 500
        assert all(
            0 <= r["alpha_bucket"] <= 9 and 0 <= r["len_bucket"] <= 15
            for r in rows
        )


class TestKnnRecallReport:
    def test_recall_bounds_and_identity(self, ray_session):
        from tableextraction_ray.functions import similarity as sim

        emb = ray.data.read_parquet(
            f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        rows = sim.knn_recall_report(emb).take_all()
        assert len(rows) == 8  # one per query
        for r in rows:
            assert 0 <= r["n_hit"] <= r["k"] == 10
            assert r["recall_fp5"] == r["n_hit"] * 100_000 // 10
        mean = sum(r["n_hit"] for r in rows) / (len(rows) * 10)
        assert mean >= 0.5  # sanity floor documented by the recall tests


class TestSourceTokenGini:
    def test_template_source_scores_low(self, ray_session):
        import pyarrow as pa

        from tableextraction_ray.functions import textstats as ts

        docs = ray.data.from_arrow(
            pa.table(
                {
                    "source": pa.array(["spam", "spam", "prose"]),
                    "text": pa.array(
                        ["buy buy buy buy", "buy buy", "one two three four"]
                    ),
                }
            )
        )
        rows = {r["source"]: r for r in ts.source_token_gini(docs).take_all()}
        assert rows["spam"]["gini_fp6"] == 0  # single token -> 0
        assert rows["spam"]["n_tokens"] == 6 and rows["spam"]["n_distinct"] == 1
        # 4 uniform tokens: 1 - 4*(1/4)^2 = 0.75
        assert rows["prose"]["gini_fp6"] == 750_000


class TestEventTypeBurstiness:
    def test_uniform_hours_score_poissonish_floor(self, ray_session):
        import numpy as np
        import pyarrow as pa

        from tableextraction_ray.functions import relational as rel

        HOUR = 3_600_000_000
        # type 'flat': 2 events in each of 3 hours -> var=0 -> fano 0
        # type 'burst': counts 1 and 5 over 2 hours -> var=4, mean=3 ->
        # fano = 4/3 -> 1333
        ts_flat = [h * HOUR + i for h in range(3) for i in range(2)]
        ts_burst = [0 * HOUR] * 1 + [1 * HOUR + i for i in range(5)]
        ev = ray.data.from_arrow(
            pa.table(
                {
                    "ts": pa.array(
                        np.array(ts_flat + ts_burst, dtype=np.int64),
                        type=pa.timestamp("us"),
                    ),
                    "event_type": pa.array(
                        ["flat"] * 6 + ["burst"] * 6
                    ),
                }
            )
        )
        rows = {
            r["event_type"]: r
            for r in rel.event_type_burstiness(ev).take_all()
        }
        assert rows["flat"]["fano_fp3"] == 0
        assert rows["burst"]["fano_fp3"] == 1333


class TestLshBandSweep:
    def test_monotone_recall_and_four_band_consistency(self, ray_session):
        from tableextraction_ray.functions import dedup

        docs = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        )
        rows = {
            r["n_bands"]: r for r in dedup.lsh_band_sweep(docs).take_all()
        }
        # more bands (shorter keys) can only ADD candidate pairs
        counts = [rows[nb]["n_candidates"] for nb in sorted(rows)]
        assert counts == sorted(counts)
        for nb, r in rows.items():
            assert r["rows_per_band"] == 16 // nb
        # the 4-band config must reproduce minhash_candidates exactly
        base = dedup.minhash_candidates(
            ray.data.read_parquet(
                f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
            )
        ).count()
        assert rows.get(4, {"n_candidates": 0})["n_candidates"] == base


class TestCompressionRatio:
    def test_repetitive_text_compresses_below_prose(self, ray_session):
        import pyarrow as pa

        from tableextraction_ray.functions import textstats as ts

        docs = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                    "text": pa.array(
                        ["spam " * 200, "the quick brown fox " * 3, ""]
                    ),
                }
            )
        )
        rows = {r["doc_id"]: r for r in ts.compression_ratio(docs).take_all()}
        assert rows[1]["ratio_fp4"] < rows[2]["ratio_fp4"]
        assert rows[3] == {"doc_id": 3, "n_bytes": 0, "n_zlib": rows[3]["n_zlib"], "ratio_fp4": 0}
        assert rows[1]["n_bytes"] == 1000


class TestCanonicalizeMediaRefs:
    def test_rewrite_points_at_shared_payload_min(self, ray_session):
        import pyarrow as pa

        from tableextraction_ray.functions import interleaved as il

        span_t = pa.list_(
            pa.struct(
                [
                    ("kind", pa.string()),
                    ("text", pa.string()),
                    ("media_ref", pa.string()),
                    ("offset", pa.int32()),
                ]
            )
        )
        spans = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(["doc-0"]),
                    "spans": pa.array(
                        [
                            [
                                {"kind": "media", "text": "",
                                 "media_ref": "media/b.png", "offset": 0},
                                {"kind": "text", "text": "x",
                                 "media_ref": "", "offset": 1},
                            ]
                        ],
                        type=span_t,
                    ),
                }
            )
        )
        media = ray.data.from_arrow(
            pa.table(
                {
                    "media_ref": pa.array(["media/a.png", "media/b.png"]),
                    "payload": pa.array(
                        [b"same-bytes", b"same-bytes"], type=pa.large_binary()
                    ),
                }
            )
        )
        rows = il.canonicalize_media_refs(spans, media).take_all()
        assert rows == [
            {
                "doc_id": "doc-0",
                "span_offset": 0,
                "media_ref": "media/b.png",
                "canonical_ref": "media/a.png",
                "rewritten": True,
            }
        ]


class TestCustomerRfm:
    def test_code_bits_match_columns(self, ray_session):
        from tableextraction_ray.functions import relational as rel

        rows = rel.customer_rfm(
            _rd("orders", ["o_custkey", "o_orderdate", "o_totalprice"])
        ).take_all()
        assert rows
        for r in rows:
            bits = (
                (r["recency_days"] <= 400) * 4
                + (r["n_orders"] >= 10) * 2
                + (r["sum_rev_c"] >= 1_000_000)
            )
            assert r["rfm_code"] == bits


class TestEmbeddingNormOutliers:
    def test_planted_broken_vector_flags(self, ray_session):
        import pyarrow as pa

        from tableextraction_ray.functions import similarity as sim

        good = [[0.125] * 64 for _ in range(30)]
        broken = [[0.0] * 64]  # zero vector: norm wildly off-population
        emb = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(31), type=pa.int64()),
                    "embedding": pa.array(
                        good + broken, type=pa.list_(pa.float32())
                    ),
                }
            )
        )
        rows = sim.embedding_norm_outliers(emb).take_all()
        assert [r["vec_id"] for r in rows] == [30]
        assert rows[0]["nsq"] == 0


class TestHllErrorReport:
    def test_error_within_sketch_bound(self, ray_session):
        from tableextraction_ray.functions import sketch

        rows = sketch.hll_error_report(
            _rd("events", ["ts", "user_id"])
        ).take_all()
        assert rows
        for r in rows:
            assert r["abs_err"] == abs(r["n_est"] - r["n_exact"])
            # 12-bit HLL: 1.04/sqrt(4096) ~ 1.6%; allow 5x headroom
            assert r["err_fp6"] <= 81_250


class TestStreamInversions:
    def test_handmade_orderings(self, ray_session):
        import numpy as np
        import pyarrow as pa

        from tableextraction_ray.functions import relational as rel

        # user 1: ts reversed vs arrival -> all C(3,2)=3 pairs invert
        # user 2: in order -> 0; user 3: equal ts -> strict > never fires
        ev = ray.data.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([1, 1, 1, 2, 2, 3, 3], type=pa.int64()),
                    "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], type=pa.int64()),
                    "ts": pa.array(
                        np.array([30, 20, 10, 1, 2, 5, 5], dtype=np.int64),
                        type=pa.timestamp("us"),
                    ),
                }
            )
        )
        rows = {r["user_id"]: r for r in rel.stream_inversions(ev).take_all()}
        assert rows[1]["n_inversions"] == 3 and rows[1]["inv_fp6"] == 1_000_000
        assert rows[2]["n_inversions"] == 0
        assert rows[3]["n_inversions"] == 0


class TestDedupCandidatesRecall:
    def test_planted_near_dups_recalled(self, ray_session):
        from tableextraction_ray.functions import dedup

        docs = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        )
        row = dedup.dedup_candidates_recall(docs).take_all()[0]
        assert row["tau_fp6"] == 500_000
        assert 0 <= row["n_hit"] <= min(row["n_truth"], row["n_candidates"])
        assert row["recall_fp5"] == (
            row["n_hit"] * 100_000 // row["n_truth"] if row["n_truth"] else 0
        )
        # 16-perm/4-band LSH at J>=0.5: collision prob 1-(1-j^4)^4 >= 0.23;
        # the planted near-dups sit far above tau, so recall is high.
        assert row["n_truth"] > 0 and row["recall_fp5"] >= 50_000


class TestPqRecallReport:
    def test_bounds_and_arithmetic(self, ray_session):
        from tableextraction_ray.functions import similarity as sim

        emb = ray.data.read_parquet(
            f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        rows = sim.pq_recall_report(emb).take_all()
        assert len(rows) == 8
        for r in rows:
            assert 0 <= r["n_hit"] <= r["k"] == 10
            assert r["recall_fp5"] == r["n_hit"] * 100_000 // 10


class TestSessionizeGapSweep:
    def test_monotone_in_gap_and_handmade_counts(self, ray_session):
        import numpy as np
        import pyarrow as pa

        from tableextraction_ray.functions import relational as rel

        MIN = 60_000_000
        # user 1: gaps of 20min and 45min -> 3/2/1 sessions at 15/30/60
        ev = ray.data.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([1, 1, 1], type=pa.int64()),
                    "ts": pa.array(
                        np.array([0, 20 * MIN, 65 * MIN], dtype=np.int64),
                        type=pa.timestamp("us"),
                    ),
                }
            )
        )
        rows = {
            r["gap_minutes"]: r["n_sessions"]
            for r in rel.sessionize_gap_sweep(ev).take_all()
        }
        assert rows == {15: 3, 30: 2, 60: 1}


class TestSimhashNearest:
    def test_min_over_pair_set(self, ray_session):
        from tableextraction_ray.functions import dedup

        docs = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        )
        pairs = dedup.simhash_near_dup(docs).take_all()
        expect: dict = {}
        for p in pairs:
            for d in (p["doc_a"], p["doc_b"]):
                expect[d] = min(expect.get(d, 99), p["hamming"])
        got = {
            r["doc_id"]: r["nearest_hamming"]
            for r in dedup.simhash_nearest(docs).take_all()
        }
        assert got == expect and len(got) > 0


class TestMixtureTokenPlan:
    def test_quota_and_cap_arithmetic(self, ray_session):
        from tableextraction_ray.functions import selection

        rows = selection.mixture_token_plan(
            _rd("documents", ["source", "text"])
        ).take_all()
        assert len(rows) == 20
        total = sum(r["n_tokens"] for r in rows)
        quota = (total // 2) // 20
        for r in rows:
            assert r["quota_tokens"] == quota
            assert r["rate_fp6"] == min(
                1_000_000, quota * 1_000_000 // r["n_tokens"]
            )
            assert r["epochs_fp3"] == quota * 1_000 // r["n_tokens"]


class TestImportantParts:
    def test_threshold_and_fallback(self, ray_session):
        from tableextraction_ray.functions import relational as rel

        def run(limit):
            return sorted(
                (r["p_partkey"], r["value_cc"], r["total_cc"])
                for r in rel.important_parts(
                    _rd(
                        "lineitem",
                        ["l_suppkey", "l_partkey", "l_extendedprice",
                         "l_discount"],
                    ),
                    _rd("supplier", ["s_suppkey", "s_nationkey"]),
                    broadcast_limit=limit,
                ).take_all()
            )

        a, b = run(2_000_000), run(0)
        assert a == b and len(a) > 0
        for _, v, t in a:
            assert v * 1_000_000 > 1_000 * t

    def test_absent_nation_yields_empty(self, ray_session):
        from tableextraction_ray.functions import relational as rel

        rows = rel.important_parts(
            _rd(
                "lineitem",
                ["l_suppkey", "l_partkey", "l_extendedprice", "l_discount"],
            ),
            _rd("supplier", ["s_suppkey", "s_nationkey"]),
            nation_key=7,  # no nation-7 supplier at sf0.001
        ).take_all()
        assert rows == []


class TestPromoPartSuppliers:
    def test_qualifiers_exceed_threshold(self, ray_session):
        from tableextraction_ray.functions import relational as rel

        rows = rel.promo_part_suppliers(
            _rd(
                "lineitem",
                ["l_partkey", "l_suppkey", "l_shipdate", "l_quantity"],
            ),
            _rd("part", ["p_partkey", "p_name"]),
            _rd("supplier", ["s_suppkey", "s_name"]),
        ).take_all()
        assert rows
        for r in rows:
            assert r["n_parts"] >= 1 and r["sum_qty"] > 50 * 0 + r["n_parts"] * 50


class TestWinnowDensityCheck:
    def test_guarantee_holds_on_corpus(self, ray_session):
        from tableextraction_ray.functions import dedup

        rows = dedup.winnow_density_check(
            _rd("documents", ["doc_id", "text"])
        ).take_all()
        assert len(rows) == 500
        assert all(r["gap_ok"] for r in rows)
        assert all(r["max_gap"] <= 4 for r in rows)


class TestMediaDhashPairs:
    def test_encode_decode_near_dup_detected(self, ray_session):
        import numpy as np
        import pyarrow as pa

        from tableextraction_ray import png
        from tableextraction_ray.functions import multimodal as mm

        rng = np.random.default_rng(7)
        base = rng.integers(0, 256, size=(64, 72), dtype=np.uint8)
        # near-dup: brighten one corner slightly (few dHash bits flip);
        # far image: independent noise
        near = base.copy()
        near[:8, :8] = 255      # saturate grid cell (0,0)
        near[:8, 8:16] = 0      # zero cell (0,1) -> flips bit(0,1)
        near[56:, 64:] = 255    # saturate cell (7,8)
        far = rng.integers(0, 256, size=(64, 72), dtype=np.uint8)
        media = ray.data.from_arrow(
            pa.table(
                {
                    "media_ref": pa.array(["a.png", "b.png", "z.png"]),
                    "payload": pa.array(
                        [
                            png.encode_gray(base),
                            png.encode_gray(near),
                            png.encode_gray(far),
                        ],
                        type=pa.large_binary(),
                    ),
                }
            )
        )
        pairs = {
            (r["ref_a"], r["ref_b"]): r["hamming"]
            for r in mm.media_dhash_pairs(media).take_all()
        }
        assert ("a.png", "b.png") in pairs
        assert pairs[("a.png", "b.png")] <= 7
        assert ("a.png", "z.png") not in pairs


class TestQuantileSketchError:
    def test_contract_bound_holds(self, ray_session):
        from tableextraction_ray.functions import sketch

        rows = sketch.quantile_sketch_error(
            _rd("events", ["ts", "value"])
        ).take_all()
        assert rows and all(r["within_bound"] for r in rows)


class TestCmsErrorReport:
    def test_overcount_nonnegative(self, ray_session):
        from tableextraction_ray.functions import sketch

        rows = sketch.cms_error_report(_rd("documents", ["text"])).take_all()
        assert rows
        for r in rows:
            assert r["overcount"] >= 0
            assert r["est_count"] == r["true_count"] + r["overcount"]


class TestDupClusterSourceMix:
    def test_sources_bounded_by_docs(self, ray_session):
        from tableextraction_ray.functions import dedup

        rows = dedup.dup_cluster_source_mix(
            _rd("documents", ["doc_id", "text", "source"])
        ).take_all()
        assert rows
        for r in rows:
            assert r["n_docs"] > 1
            assert 1 <= r["n_sources"] <= r["n_docs"]


class TestAnomalyIncidents:
    def test_islands_merge_consecutive_hours(self, ray_session):
        from tableextraction_ray.functions import relational as rel

        incidents = rel.anomaly_incidents(
            _rd("events", ["ts", "event_type"])
        ).take_all()
        anomalies = rel.hourly_anomalies(
            _rd("events", ["ts", "event_type"]), z=1
        ).take_all()
        assert sum(r["n_hours"] for r in incidents) == len(anomalies)
        for r in incidents:
            assert r["start_hour"] <= r["end_hour"]


class TestLinenumberIntegrity:
    def test_contiguity_holds_and_flags_planted_gap(self, ray_session):
        import pyarrow as pa

        from tableextraction_ray.functions import relational as rel

        li = ray.data.from_arrow(
            pa.table(
                {
                    "l_orderkey": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
                    "l_linenumber": pa.array([1, 2, 3, 1, 3], type=pa.int32()),
                }
            )
        )
        rows = {
            r["l_orderkey"]: r
            for r in rel.linenumber_integrity(li).take_all()
        }
        assert rows[1]["contiguous"] and rows[1]["n_lines"] == 3
        assert not rows[2]["contiguous"] and rows[2]["max_ln"] == 3
