"""Round-4 batch-3 ops: TPC-H Q10/Q14/Q18 shapes, ROLLUP, PIVOT,
correlated-subquery outliers, churn anti-join, moving-average window,
sentence stats, interleave shape histogram. Oracle parity runs in
test_entry_parity; these pin the semantics the oracles can't see —
broadcast==shuffle equality for every guarded scale path, and
hand-computed fixtures for the driver-side folds."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from tableextraction_ray.functions import interleaved, relational, similarity, textstats

SF_DIR = "/root/testdata/sf0.001"


def _rd(t, cols):
    return ray.data.read_parquet(f"{SF_DIR}/{t}.parquet", columns=cols)


class TestReturnedItemRevenue:
    @pytest.fixture()
    def tables(self, ray_session):
        return dict(
            lineitem=_rd(
                "lineitem",
                ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
            ),
            orders=_rd("orders", ["o_orderkey", "o_custkey"]),
            customer=_rd("customer", ["c_custkey", "c_name", "c_nationkey"]),
            nation=_rd("nation", ["n_nationkey", "n_name"]),
        )

    def _canon(self, ds):
        return [
            (r["c_custkey"], r["c_name"], r["n_name"], r["rev_cc"])
            for r in ds.take_all()
        ]

    def test_shuffle_fallback_matches_broadcast(self, tables):
        broadcast = self._canon(relational.returned_item_revenue(**tables))
        shuffled = self._canon(
            relational.returned_item_revenue(**tables, broadcast_limit=0)
        )
        assert broadcast == shuffled and len(broadcast) == 20

    def test_each_single_dim_shuffle_path(self, tables):
        broadcast = self._canon(relational.returned_item_revenue(**tables))
        big = 10**12
        for forced in ("order_count", "customer_count"):
            got = self._canon(
                relational.returned_item_revenue(**tables, **{forced: big})
            )
            assert got == broadcast, forced

    def test_topk_is_sorted_desc_with_custkey_ties(self, tables):
        rows = self._canon(relational.returned_item_revenue(**tables))
        keys = [(-rev, ck) for ck, _, _, rev in rows]
        assert keys == sorted(keys)


class TestPromoRevenue:
    def test_shuffle_fallback_matches_broadcast(self, ray_session):
        li = _rd("lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
        part = _rd("part", ["p_partkey", "p_type"])
        a = relational.promo_revenue(li, part).take_all()[0]
        b = relational.promo_revenue(li, part, broadcast_limit=0).take_all()[0]
        assert a == b and a["total_rev_cc"] > 0

    def test_hand_computed_share(self, ray_session):
        li = ray.data.from_items(
            [
                {"l_partkey": 1, "l_extendedprice": 10.0, "l_discount": 0.0},
                {"l_partkey": 2, "l_extendedprice": 30.0, "l_discount": 0.0},
            ]
        )
        part = ray.data.from_items(
            [
                {"p_partkey": 1, "p_type": "PROMO"},
                {"p_partkey": 2, "p_type": "LARGE"},
            ]
        )
        r = relational.promo_revenue(li, part).take_all()[0]
        # promo 10.00 of 40.00 total -> 25% exactly
        assert r["promo_pct_fp6"] == 250_000
        assert r["promo_rev_cc"] == 1000 * 100
        assert r["total_rev_cc"] == 4000 * 100


class TestLargeOrderCustomers:
    def test_threshold_filters_and_attaches(self, ray_session):
        li = ray.data.from_items(
            [
                {"l_orderkey": 1, "l_quantity": 5.0},
                {"l_orderkey": 1, "l_quantity": 6.0},
                {"l_orderkey": 2, "l_quantity": 3.0},
            ]
        )
        orders = ray.data.from_items(
            [
                {"o_orderkey": 1, "o_custkey": 7, "o_totalprice": 12.34},
                {"o_orderkey": 2, "o_custkey": 8, "o_totalprice": 9.99},
            ]
        )
        cust = ray.data.from_items(
            [
                {"c_custkey": 7, "c_name": "alice"},
                {"c_custkey": 8, "c_name": "bob"},
            ]
        )
        rows = relational.large_order_customers(
            li, orders, cust, qty_threshold=10
        ).take_all()
        assert rows == [
            {
                "c_custkey": 7,
                "c_name": "alice",
                "o_orderkey": 1,
                "total_qty": 11,
                "price_c": 1234,
            }
        ]


class TestRevenueRollup:
    def test_shuffle_fallback_matches_broadcast(self, ray_session):
        args = dict(
            orders=_rd("orders", ["o_custkey", "o_orderdate", "o_totalprice"]),
            customer=_rd("customer", ["c_custkey", "c_nationkey"]),
            nation=_rd("nation", ["n_nationkey", "n_name"]),
        )
        canon = lambda ds: sorted(
            (r["n_name"], r["o_year"], r["rev_c"], r["lvl"])
            for r in ds.take_all()
        )
        a = canon(relational.revenue_rollup(**args))
        b = canon(relational.revenue_rollup(**args, broadcast_limit=0))
        assert a == b and len(a) > 0

    def test_levels_sum_consistently(self, ray_session):
        rows = relational.revenue_rollup(
            _rd("orders", ["o_custkey", "o_orderdate", "o_totalprice"]),
            _rd("customer", ["c_custkey", "c_nationkey"]),
            _rd("nation", ["n_nationkey", "n_name"]),
        ).take_all()
        finest = sum(r["rev_c"] for r in rows if r["lvl"] == 0)
        mids = sum(r["rev_c"] for r in rows if r["lvl"] == 1)
        grand = [r["rev_c"] for r in rows if r["lvl"] == 2]
        assert len(grand) == 1 and finest == mids == grand[0]


class TestEventTypeHourPivot:
    def test_buckets_partition_counts(self, ray_session):
        import datetime as dt

        ev = ray.data.from_items(
            [
                {"ts": dt.datetime(2024, 1, 1, h), "event_type": "x"}
                for h in (0, 5, 6, 12, 18, 23)
            ]
        )
        r = relational.event_type_hour_pivot(ev).take_all()
        assert r == [
            {"event_type": "x", "b0": 2, "b1": 1, "b2": 1, "b3": 2}
        ]


class TestBrandSizeOutliers:
    def test_exact_threshold_excluded(self, ray_session):
        # brand avg = 10 -> threshold 15; size 15 excluded (strict >), 16 in
        part = ray.data.from_items(
            [
                {"p_partkey": i, "p_brand": "B", "p_size": s}
                for i, s in enumerate([4, 5, 15, 16], start=1)
            ]
        )
        rows = relational.brand_size_outliers(part).take_all()
        assert [r["p_partkey"] for r in rows] == [4]
        assert rows[0]["brand_avg_fp4"] == 100_000  # 10.0000


class TestChurnedCustomers:
    def test_anti_join_per_nation(self, ray_session):
        import datetime as dt

        orders = ray.data.from_items(
            [
                {"o_custkey": 1, "o_orderdate": dt.datetime(2001, 1, 1)},
                {"o_custkey": 2, "o_orderdate": dt.datetime(1999, 1, 1)},
            ]
        )
        cust = ray.data.from_items(
            [
                {"c_custkey": 1, "c_nationkey": 0, "c_acctbal": 5.0},
                {"c_custkey": 2, "c_nationkey": 0, "c_acctbal": 7.5},
                {"c_custkey": 3, "c_nationkey": 1, "c_acctbal": -1.25},
            ]
        )
        nation = ray.data.from_items(
            [
                {"n_nationkey": 0, "n_name": "A"},
                {"n_nationkey": 1, "n_name": "B"},
            ]
        )
        rows = sorted(
            relational.churned_customers(orders, cust, nation).take_all(),
            key=lambda r: r["n_name"],
        )
        # cust 1 has a recent order; 2's is pre-cutoff; 3 has none
        assert rows == [
            {"n_name": "A", "n_churned": 1, "bal_c_sum": 750},
            {"n_name": "B", "n_churned": 1, "bal_c_sum": -125},
        ]


class TestMovingAvgDailyRevenue:
    def test_ramp_in_window(self, ray_session):
        import datetime as dt

        orders = ray.data.from_items(
            [
                {"o_orderdate": dt.datetime(2024, 1, d), "o_totalprice": float(d)}
                for d in range(1, 10)
            ]
        )
        rows = relational.moving_avg_daily_revenue(orders, window=3).take_all()
        rows.sort(key=lambda r: r["day"])
        assert [r["rev_c"] for r in rows] == [d * 100 for d in range(1, 10)]
        # day1: 100//1, day2: 300//2, day3+: mean of 3 consecutive = middle
        assert rows[0]["ma_c"] == 100
        assert rows[1]["ma_c"] == 150
        assert [r["ma_c"] for r in rows[2:]] == [d * 100 for d in range(2, 9)]


class TestSentenceStats:
    def test_run_counting_and_fixed_point(self, ray_session):
        docs = ray.data.from_items(
            [
                {"doc_id": 1, "source": "s", "text": "a. b!? c"},
                {"doc_id": 2, "source": "s", "text": "no enders"},
            ]
        )
        r = textstats.sentence_stats(docs).take_all()
        # 'a. b!? c' -> runs '.', '!?' = 2 sentences; doc 2 -> 0
        assert r == [
            {
                "source": "s",
                "n_docs": 2,
                "n_sents": 2,
                "sents_per_doc_fp6": 1_000_000,
            }
        ]


class TestInterleaveShapeHist:
    def test_shapes_counted_and_invariant_under_repartition(self, ray_session):
        span_t = pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )

        def doc(did, kinds):
            return {
                "doc_id": did,
                "spans": [
                    {"kind": k, "text": "t", "media_ref": "", "offset": i}
                    for i, k in enumerate(kinds)
                ],
            }

        docs = [
            doc("d1", ["text", "media"]),
            doc("d2", ["text", "media"]),
            doc("d3", ["text", "text"]),
            {"doc_id": "d4", "spans": []},  # zero-span doc: dropped
        ]
        tbl = pa.Table.from_pydict(
            {
                "doc_id": pa.array([d["doc_id"] for d in docs]),
                "spans": pa.array(
                    [d["spans"] for d in docs], type=pa.list_(span_t)
                ),
            }
        )
        for parts in (1, 3):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            rows = sorted(
                interleaved.interleave_shape_hist(ds).take_all(),
                key=lambda r: (r["n_text"], r["n_media"]),
            )
            assert rows == [
                {"n_text": 1, "n_media": 1, "n_docs": 2},
                {"n_text": 2, "n_media": 0, "n_docs": 1},
            ]


class TestEventsValueStddev:
    def test_exact_sample_variance(self, ray_session):
        import datetime as dt

        ev = ray.data.from_items(
            [
                {"event_type": "x", "value": 1.0},
                {"event_type": "x", "value": 2.0},
                {"event_type": "x", "value": 4.0},
                {"event_type": "y", "value": 5.0},
            ]
        )
        rows = sorted(
            relational.events_value_stddev(ev).take_all(),
            key=lambda r: r["event_type"],
        )
        # x: cents 100,200,400 -> n=3 s=700 ss=210000
        # var = (3*210000 - 490000) // 6 = 140000 // 6 = 23333
        assert rows[0] == {
            "event_type": "x",
            "n": 3,
            "sum_c": 700,
            "sumsq_c": 210000,
            "var_fp0": 23333,
        }
        assert rows[1]["n"] == 1 and rows[1]["var_fp0"] == 0


class TestTopCustomersConcat:
    def test_order_and_ties(self, ray_session):
        cust = ray.data.from_items(
            [
                {"c_custkey": 1, "c_name": "a", "c_nationkey": 0, "c_acctbal": 5.0},
                {"c_custkey": 2, "c_name": "b", "c_nationkey": 0, "c_acctbal": 5.0},
                {"c_custkey": 3, "c_name": "c", "c_nationkey": 0, "c_acctbal": 9.0},
                {"c_custkey": 4, "c_name": "d", "c_nationkey": 0, "c_acctbal": 1.0},
                {"c_custkey": 5, "c_name": "e", "c_nationkey": 1, "c_acctbal": 0.0},
            ]
        )
        nation = ray.data.from_items(
            [
                {"n_nationkey": 0, "n_name": "N0"},
                {"n_nationkey": 1, "n_name": "N1"},
            ]
        )
        rows = sorted(
            relational.top_customers_concat(cust, nation, k=3).take_all(),
            key=lambda r: r["n_name"],
        )
        # bal 9 first, then the 5.0 tie broken by custkey (a before b)
        assert rows == [
            {"n_name": "N0", "top_names": "c,a,b"},
            {"n_name": "N1", "top_names": "e"},
        ]

    def test_invariant_under_repartition(self, ray_session):
        cust = _rd("customer", ["c_custkey", "c_name", "c_nationkey", "c_acctbal"])
        nation = _rd("nation", ["n_nationkey", "n_name"])
        a = sorted(
            map(tuple, (
                (r["n_name"], r["top_names"])
                for r in relational.top_customers_concat(cust, nation).take_all()
            ))
        )
        b = sorted(
            map(tuple, (
                (r["n_name"], r["top_names"])
                for r in relational.top_customers_concat(
                    cust.repartition(7), nation
                ).take_all()
            ))
        )
        assert a == b and len(a) > 0


class TestDocLengthDeciles:
    def test_ntile_sql_semantics(self, ray_session):
        # n=12, k=10: buckets 1,2 get 2 rows; 3..10 get 1 (SQL NTILE)
        docs = ray.data.from_items(
            [{"doc_id": i, "n_chars": i * 10} for i in range(1, 13)]
        )
        rows = sorted(
            relational.doc_length_deciles(docs).take_all(),
            key=lambda r: r["ntile"],
        )
        assert [r["n_docs"] for r in rows] == [2, 2] + [1] * 8
        assert rows[0]["min_chars"] == 10 and rows[0]["max_chars"] == 20
        assert rows[-1]["min_chars"] == rows[-1]["max_chars"] == 120

    def test_invariant_under_repartition(self, ray_session):
        docs = _rd("documents", ["doc_id", "n_chars"])
        canon = lambda ds: sorted(
            (r["ntile"], r["n_docs"], r["min_chars"], r["max_chars"])
            for r in ds.take_all()
        )
        a = canon(relational.doc_length_deciles(docs))
        b = canon(relational.doc_length_deciles(docs.repartition(9)))
        assert a == b and len(a) == 10


class TestMediaRefFanout:
    def test_cross_doc_dedup_and_ref_counts(self, ray_session):
        span_t = pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )

        def m(ref, off):
            return {"kind": "media", "text": "", "media_ref": ref, "offset": off}

        def t(off):
            return {"kind": "text", "text": "x", "media_ref": "", "offset": off}

        docs = [
            {"doc_id": "d1", "spans": [m("a", 0), m("a", 1), t(2)]},
            {"doc_id": "d2", "spans": [m("a", 0), m("b", 1)]},
        ]
        tbl = pa.Table.from_pydict(
            {
                "doc_id": pa.array([d["doc_id"] for d in docs]),
                "spans": pa.array([d["spans"] for d in docs], type=pa.list_(span_t)),
            }
        )
        for parts in (1, 2):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            rows = sorted(
                interleaved.media_ref_fanout(ds).take_all(),
                key=lambda r: r["media_ref"],
            )
            assert rows == [
                {"media_ref": "a", "n_docs": 2, "n_refs": 3},
                {"media_ref": "b", "n_docs": 1, "n_refs": 1},
            ]


class TestMmrSelect:
    def test_diversity_beats_redundancy(self, ray_session):
        from tableextraction_ray.functions import similarity

        # query q=[1,0]; two near-identical high-relevance vectors (1,2)
        # and one orthogonal-ish lower-relevance vector (3). Top-2 by
        # relevance alone = {1, 2}; MMR at lam=30 (diversity-weighted)
        # penalizes 2's ~1.0 similarity to the already-picked 1 more than
        # its relevance edge and picks {1, 3}.
        rows = [
            {"vec_id": 0, "embedding": [1.0, 0.0]},
            {"vec_id": 1, "embedding": [0.99, 0.14]},
            {"vec_id": 2, "embedding": [0.99, 0.141]},
            {"vec_id": 3, "embedding": [0.2, 0.98]},
        ]
        out = similarity.mmr_select(
            ray.data.from_items(rows), n_select=2, pool=10, lam_pct=30
        ).take_all()
        assert [r["vec_id"] for r in out] == [1, 3]
        assert out[0]["rk"] == 0 and out[1]["rk"] == 1

    def test_deterministic_under_repartition(self, ray_session):
        from tableextraction_ray.functions import similarity

        ds = _rd("embeddings", ["vec_id", "embedding"])
        a = similarity.mmr_select(ds, n_select=5).take_all()
        b = similarity.mmr_select(ds.repartition(6), n_select=5).take_all()
        assert a == b and len(a) == 5


class TestLexicalDiversity:
    def test_hand_counted_ttr(self, ray_session):
        docs = ray.data.from_items(
            [
                {"doc_id": 1, "source": "s", "text": "a bb a"},
                {"doc_id": 2, "source": "s", "text": "ccc a"},
            ]
        )
        r = textstats.lexical_diversity(docs).take_all()
        # tokens: a,bb,a,ccc,a -> n=5, distinct {a,bb,ccc}=3, chars=1+2+1+3+1=8
        assert r == [
            {
                "source": "s",
                "n_tokens": 5,
                "n_distinct": 3,
                "sum_token_chars": 8,
                "ttr_fp6": 600_000,
                "avg_len_fp6": 1_600_000,
            }
        ]

    def test_invariant_under_repartition(self, ray_session):
        docs = _rd("documents", ["doc_id", "text", "source"])
        canon = lambda ds: sorted(map(tuple, (r.values() for r in ds.take_all())))
        assert canon(textstats.lexical_diversity(docs)) == canon(
            textstats.lexical_diversity(docs.repartition(9))
        )


class TestUserGapStats:
    def test_gaps_with_timestamp_tie(self, ray_session):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        ev = ray.data.from_items(
            [
                {"user_id": 1, "ts": t0, "event_id": 2},
                {"user_id": 1, "ts": t0, "event_id": 1},  # tie: event_id orders
                {"user_id": 1, "ts": t0 + dt.timedelta(seconds=3), "event_id": 3},
                {"user_id": 2, "ts": t0, "event_id": 4},
            ]
        )
        rows = sorted(
            relational.user_gap_stats(ev).take_all(), key=lambda r: r["user_id"]
        )
        assert rows[0] == {
            "user_id": 1,
            "n_gaps": 2,
            "sum_gap_us": 3_000_000,
            "max_gap_us": 3_000_000,
        }
        assert rows[1] == {
            "user_id": 2,
            "n_gaps": 0,
            "sum_gap_us": 0,
            "max_gap_us": 0,
        }


class TestSpanLengthProfile:
    def test_bucket_boundaries(self, ray_session):
        span_t = pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
        spans = [
            {"kind": "text", "text": "", "media_ref": "", "offset": 0},       # b0
            {"kind": "text", "text": "x" * 15, "media_ref": "", "offset": 1}, # b1
            {"kind": "text", "text": "x" * 16, "media_ref": "", "offset": 2}, # b2
            {"kind": "text", "text": "x" * 256, "media_ref": "", "offset": 3},# b4
            {"kind": "media", "text": "", "media_ref": "m", "offset": 4},     # b0
        ]
        tbl = pa.Table.from_pydict(
            {
                "doc_id": pa.array(["d1"]),
                "spans": pa.array([spans], type=pa.list_(span_t)),
            }
        )
        rows = sorted(
            interleaved.span_length_profile(
                ray.data.from_arrow(tbl)
            ).take_all(),
            key=lambda r: (r["kind"], r["bucket"]),
        )
        assert rows == [
            {"kind": "media", "bucket": 0, "n_spans": 1},
            {"kind": "text", "bucket": 0, "n_spans": 1},
            {"kind": "text", "bucket": 1, "n_spans": 1},
            {"kind": "text", "bucket": 2, "n_spans": 1},
            {"kind": "text", "bucket": 4, "n_spans": 1},
        ]


class TestNearDupDegreeHist:
    def test_triangle_plus_isolate(self, ray_session):
        from tableextraction_ray.functions import similarity

        # 3 identical vectors (triangle, degree 2 each) + 1 orthogonal
        rows = [
            {"vec_id": 0, "embedding": [1.0, 0.0]},
            {"vec_id": 1, "embedding": [1.0, 0.0]},
            {"vec_id": 2, "embedding": [1.0, 0.0]},
            {"vec_id": 3, "embedding": [0.0, 1.0]},
        ]
        out = sorted(
            similarity.near_dup_degree_hist(
                ray.data.from_items(rows), threshold_fp5=90_000, row_count=4
            ).take_all(),
            key=lambda r: r["degree"],
        )
        assert out == [
            {"degree": 0, "n_vecs": 1},
            {"degree": 2, "n_vecs": 3},
        ]


class TestOrphanAndOverflowGuards:
    def test_returned_item_revenue_drops_orphan_custkey(self, ray_session):
        li = ray.data.from_items(
            [
                {"l_orderkey": 1, "l_returnflag": "R",
                 "l_extendedprice": 10.0, "l_discount": 0.0},
                {"l_orderkey": 2, "l_returnflag": "R",
                 "l_extendedprice": 20.0, "l_discount": 0.0},
            ]
        )
        orders = ray.data.from_items(
            [
                {"o_orderkey": 1, "o_custkey": 7},
                {"o_orderkey": 2, "o_custkey": 99},  # orphan: no customer
            ]
        )
        cust = ray.data.from_items(
            [{"c_custkey": 7, "c_name": "alice", "c_nationkey": 0}]
        )
        nation = ray.data.from_items([{"n_nationkey": 0, "n_name": "A"}])
        # broadcast path must DROP the orphan (inner-join semantics), not
        # crash on NaN->string conversion — and match the shuffle path
        a = relational.returned_item_revenue(li, orders, cust, nation).take_all()
        b = relational.returned_item_revenue(
            li, orders, cust, nation, broadcast_limit=0
        ).take_all()
        assert a == b == [
            {"c_custkey": 7, "c_name": "alice", "n_name": "A", "rev_cc": 100000}
        ]

    def test_revenue_rollup_drops_orphan_custkey(self, ray_session):
        import datetime as dt

        orders = ray.data.from_items(
            [
                {"o_custkey": 7, "o_orderdate": dt.datetime(2020, 1, 1),
                 "o_totalprice": 10.0},
                {"o_custkey": 99, "o_orderdate": dt.datetime(2020, 1, 1),
                 "o_totalprice": 99.0},  # orphan
            ]
        )
        cust = ray.data.from_items([{"c_custkey": 7, "c_nationkey": 0}])
        nation = ray.data.from_items([{"n_nationkey": 0, "n_name": "A"}])
        canon = lambda ds: sorted(
            (r["n_name"], r["o_year"], r["rev_c"], r["lvl"])
            for r in ds.take_all()
        )
        a = canon(relational.revenue_rollup(orders, cust, nation))
        b = canon(
            relational.revenue_rollup(orders, cust, nation, broadcast_limit=0)
        )
        assert a == b == [
            ("A", -1, 1000, 1),
            ("A", 2020, 1000, 0),
            ("ALL", -1, 1000, 2),
        ]

    def test_events_value_stddev_fails_loud_on_overflow_regime(
        self, ray_session
    ):
        import pytest as _pytest

        # one value of ~3.1e7 dollars -> cents ~3.1e9; a synthetic n that
        # cannot be faked, so use many rows of a huge value: n * max_c^2
        # >= 2^63 with max_c = 3.1e9 needs n = 1 already (9.6e18 > 9.2e18)
        ev = ray.data.from_items(
            [{"event_type": "x", "value": 31_000_000.0}] * 2
        )
        with _pytest.raises(Exception, match="int64|OverflowError|sumsq"):
            relational.events_value_stddev(ev).take_all()


class TestOrdersMonthlyYoy:
    def test_calendar_keyed_with_gap_and_truncation(self, ray_session):
        import datetime as dt

        orders = ray.data.from_items(
            [
                {"o_orderdate": dt.datetime(2020, 1, 1), "o_totalprice": 30.0},
                {"o_orderdate": dt.datetime(2021, 1, 1), "o_totalprice": 10.0},
                # 2022-02 has no 2021-02 prior month -> prev 0, yoy 0
                {"o_orderdate": dt.datetime(2022, 2, 1), "o_totalprice": 5.0},
            ]
        )
        rows = sorted(
            relational.orders_monthly_yoy(orders).take_all(),
            key=lambda r: r["month"],
        )
        assert rows[0] == {
            "month": "2020-01", "rev_c": 3000, "prev_year_rev_c": 0,
            "yoy_fp6": 0,
        }
        # (1000-3000)*1e6 / 3000 = -666666.67 -> trunc toward zero
        assert rows[1] == {
            "month": "2021-01", "rev_c": 1000, "prev_year_rev_c": 3000,
            "yoy_fp6": -666_666,
        }
        assert rows[2]["prev_year_rev_c"] == 0 and rows[2]["yoy_fp6"] == 0


class TestSourceDupRate:
    def test_cross_source_dups_count_both_sides(self, ray_session):
        from tableextraction_ray.functions import dedup

        docs = ray.data.from_items(
            [
                {"doc_id": 1, "source": "a", "text": "same"},
                {"doc_id": 2, "source": "b", "text": "same"},
                {"doc_id": 3, "source": "a", "text": "unique1"},
                {"doc_id": 4, "source": "a", "text": "dup-in-a"},
                {"doc_id": 5, "source": "a", "text": "dup-in-a"},
            ]
        )
        rows = sorted(
            dedup.source_dup_rate(docs).take_all(), key=lambda r: r["source"]
        )
        assert rows == [
            {"source": "a", "n_docs": 4, "n_dup_docs": 3,
             "dup_rate_fp6": 750_000},
            {"source": "b", "n_docs": 1, "n_dup_docs": 1,
             "dup_rate_fp6": 1_000_000},
        ]


class TestKeyedAttachInt:
    def test_orphans_dropped_on_both_paths(self, ray_session):
        fact = ray.data.from_items(
            [
                {"k": 1, "x": 10},
                {"k": 2, "x": 20},  # orphan: no dim row
            ]
        )
        dim = ray.data.from_items([{"k": 1, "v": 7}])
        canon = lambda ds: sorted(
            (r["k"], r["v"], r["x"]) for r in ds.take_all()
        )
        a = canon(
            relational.keyed_attach_int(fact, dim, "k", "v", ("x",))
        )
        b = canon(
            relational.keyed_attach_int(
                fact, dim, "k", "v", ("x",), broadcast_limit=0
            )
        )
        assert a == b == [(1, 7, 10)]

    def test_empty_dim_drops_all_facts(self, ray_session):
        # regression: an empty-dim to_pandas loses its columns — the
        # broadcast probe must still run and drop every fact row
        import pyarrow as pa

        fact = ray.data.from_items([{"k": 1, "x": 10}, {"k": 2, "x": 20}])
        dim = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array([], type=pa.int64()),
                    "v": pa.array([], type=pa.int64()),
                }
            )
        )
        assert (
            relational.keyed_attach_int(fact, dim, "k", "v", ("x",)).count()
            == 0
        )

    def test_paths_agree_randomized(self, ray_session):
        # broadcast searchsorted probe vs sort + group-start attach on a
        # skewed fact with orphans and a hot key spanning blocks
        import numpy as np
        import pyarrow as pa

        rng = np.random.default_rng(17)
        n = 40_000
        fk = rng.integers(0, 500, n).astype(np.int64)
        fk[: n // 4] = 7  # hot key
        fact = ray.data.from_arrow(
            pa.table(
                {"k": fk, "x": np.arange(n, dtype=np.int64)}
            )
        ).repartition(8)
        dkeys = np.arange(0, 400, dtype=np.int64)  # keys 400+ are orphans
        dim = ray.data.from_arrow(
            pa.table({"k": dkeys, "v": dkeys * 3 + 1})
        ).repartition(4)
        canon = lambda ds: sorted(
            (r["k"], r["v"], r["x"]) for r in ds.take_all()
        )
        a = canon(relational.keyed_attach_int(fact, dim, "k", "v", ("x",)))
        b = canon(
            relational.keyed_attach_int(
                fact, dim, "k", "v", ("x",), broadcast_limit=0
            )
        )
        assert a == b
        assert len(a) == int((fk < 400).sum())


class TestBrandSupplierCounts:
    def test_distinct_across_parts_and_paths(self, ray_session):
        li = ray.data.from_items(
            [
                {"l_partkey": 1, "l_suppkey": 100},
                {"l_partkey": 1, "l_suppkey": 100},  # dup pair
                {"l_partkey": 2, "l_suppkey": 100},  # same supp, other part
                {"l_partkey": 2, "l_suppkey": 200},
                {"l_partkey": 3, "l_suppkey": 300},
            ]
        )
        part = ray.data.from_items(
            [
                {"p_partkey": 1, "p_brand": "A"},
                {"p_partkey": 2, "p_brand": "A"},
                {"p_partkey": 3, "p_brand": "B"},
            ]
        )
        for limit in (2_000_000, 0):
            rows = sorted(
                relational.brand_supplier_counts(
                    li, part, broadcast_limit=limit
                ).take_all(),
                key=lambda r: r["p_brand"],
            )
            # brand A sees suppliers {100, 200} (100 deduped across parts)
            assert rows == [
                {"p_brand": "A", "n_suppliers": 2},
                {"p_brand": "B", "n_suppliers": 1},
            ], limit


class TestMinmaxScaleEvents:
    def test_bounds_and_degenerate_span(self, ray_session):
        ev = ray.data.from_items(
            [
                {"event_id": 1, "value": 2.0},
                {"event_id": 2, "value": 3.0},
                {"event_id": 3, "value": 4.0},
            ]
        )
        rows = sorted(
            relational.minmax_scale_events(ev).take_all(),
            key=lambda r: r["event_id"],
        )
        assert [r["scaled_fp6"] for r in rows] == [0, 500_000, 1_000_000]
        # constant column: span clamps to 1, everything scales to 0
        const = ray.data.from_items(
            [{"event_id": i, "value": 5.0} for i in (1, 2)]
        )
        rows = relational.minmax_scale_events(const).take_all()
        assert all(r["scaled_fp6"] == 0 for r in rows)


class TestDupClusterSizeHist:
    def test_mixed_cluster_sizes(self, ray_session):
        from tableextraction_ray.functions import dedup

        docs = ray.data.from_items(
            [
                {"doc_id": 1, "text": "a"},
                {"doc_id": 2, "text": "a"},
                {"doc_id": 3, "text": "a"},
                {"doc_id": 4, "text": "b"},
                {"doc_id": 5, "text": "b"},
                {"doc_id": 6, "text": "c"},
            ]
        )
        rows = sorted(
            dedup.dup_cluster_size_hist(docs).take_all(),
            key=lambda r: r["cluster_size"],
        )
        assert rows == [
            {"cluster_size": 1, "n_clusters": 1, "n_docs": 1},
            {"cluster_size": 2, "n_clusters": 1, "n_docs": 2},
            {"cluster_size": 3, "n_clusters": 1, "n_docs": 3},
        ]


class TestSaltedUserCounts:
    def test_salting_invisible_vs_direct_groupby(self, ray_session):
        ev = _rd("events", ["user_id", "event_id", "value"])
        a = sorted(
            (r["user_id"], r["n_events"], r["sum_c"])
            for r in relational.salted_user_counts(ev, n_salts=8).take_all()
        )
        b = sorted(
            (r["user_id"], r["n_events"], r["sum_c"])
            for r in relational.salted_user_counts(ev, n_salts=1).take_all()
        )
        assert a == b and len(a) > 0


class TestLongestDocsPerSource:
    def test_rank_and_tiebreak(self, ray_session):
        docs = ray.data.from_items(
            [
                {"doc_id": 1, "source": "s", "n_chars": 10},
                {"doc_id": 2, "source": "s", "n_chars": 30},
                {"doc_id": 3, "source": "s", "n_chars": 30},  # tie: doc_id
                {"doc_id": 4, "source": "s", "n_chars": 20},
                {"doc_id": 5, "source": "s", "n_chars": 5},
            ]
        )
        rows = textstats.longest_docs_per_source(docs, k=3).take_all()
        assert [(r["rk"], r["doc_id"]) for r in rows] == [
            (1, 2), (2, 3), (3, 4),
        ]

    def test_invariant_under_repartition(self, ray_session):
        docs = _rd("documents", ["doc_id", "source", "n_chars"])
        canon = lambda ds: [
            (r["source"], r["rk"], r["doc_id"]) for r in ds.take_all()
        ]
        assert canon(textstats.longest_docs_per_source(docs)) == canon(
            textstats.longest_docs_per_source(docs.repartition(9))
        )


class TestNearDupTriangles:
    def _clique_rows(self):
        # 4-clique (ids 1-4, identical vectors) + a pendant chain node 5
        # near 1 only, + isolated 6: K4 has 4 triangles, 15+... wedges.
        import math

        rows = [
            {"vec_id": i, "embedding": [1.0, 0.0]} for i in (1, 2, 3, 4)
        ]
        # 5 at ~20 degrees from e1: cos ~0.94 to the clique — also joins.
        # Use an orthogonal-ish vector instead so only weak ties break:
        rows.append({"vec_id": 5, "embedding": [0.0, 1.0]})
        rows.append(
            {"vec_id": 6, "embedding": [math.sqrt(0.5), math.sqrt(0.5)]}
        )
        return rows

    def test_known_graph(self, ray_session):
        # K4 on {1,2,3,4}; 5 orthogonal (cos 0 to clique, cos ~0.707 to 6
        # — below the 0.9 threshold); 6 ties to nobody at 0.9.
        out = similarity.near_dup_triangles(
            ray.data.from_items(self._clique_rows()),
            threshold_fp5=90_000,
            row_count=6,
        ).take_all()
        assert out == [
            {
                "n_nodes": 4,
                "n_edges": 6,
                "n_wedges": 12,  # 4 nodes x C(3,2)
                "n_triangles": 4,
                "clustering_fp5": 100000,  # 3*4/12 = 1.0
            }
        ]

    def test_brute_force_equality_sf0001(self, ray_session):
        """Triangle count must equal a brute-force close over the same
        pair set (independent of the wedge-join machinery)."""
        from itertools import combinations

        ds = ray.data.read_parquet(
            "/root/testdata/sf0.001/embeddings.parquet",
            columns=["vec_id", "embedding"],
        )
        pairs = {
            (r["vec_a"], r["vec_b"])
            for r in similarity.near_dup_pairs(ds).take_all()
        }
        adj: dict[int, set[int]] = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        brute = sum(
            1
            for v, ns in adj.items()
            for x, y in combinations(sorted(ns), 2)
            if v < x and (x, y) in pairs
        )
        row = similarity.near_dup_triangles(ds).take_all()[0]
        assert row["n_triangles"] == brute
        assert row["n_edges"] == len(pairs)

    def test_empty_graph(self, ray_session):
        rows = [
            {"vec_id": 1, "embedding": [1.0, 0.0]},
            {"vec_id": 2, "embedding": [0.0, 1.0]},
        ]
        out = similarity.near_dup_triangles(
            ray.data.from_items(rows), threshold_fp5=90_000, row_count=2
        ).take_all()
        assert out[0]["n_triangles"] == 0
        assert out[0]["n_edges"] == 0
        assert out[0]["clustering_fp5"] == 0


class TestPcaReconError:
    def test_matches_numpy_replay(self, ray_session):
        """Distributed per-label error sums must equal a single-machine
        numpy PCA over the same quantized vectors."""
        import pyarrow.parquet as pq

        from tableextraction_ray.functions.similarity import (
            _quantize, pca_recon_error,
        )

        tbl = pq.read_table(
            "/root/testdata/sf0.001/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
        )
        x = _quantize(
            np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
        ).astype(np.float64)
        labels = np.asarray(tbl["label"].to_pylist(), dtype=np.int64)
        n, d = x.shape
        mean = x.sum(axis=0) / n
        cov = (x.T @ x - np.outer(x.sum(axis=0), x.sum(axis=0)) / n) / n
        w, v = np.linalg.eigh(cov)
        basis = v[:, np.argsort(w)[::-1][:8]]
        r = x - mean
        proj = r @ basis
        err = (r * r).sum(axis=1) - (proj * proj).sum(axis=1)
        err_fp2 = np.floor(err * 1e-12 * 100.0 + 0.5).astype(np.int64)
        want = {
            int(lb): int(err_fp2[labels == lb].sum())
            for lb in np.unique(labels)
        }
        ds = ray.data.read_parquet(
            "/root/testdata/sf0.001/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
        )
        got = {
            r["label"]: r["sum_err_fp2"]
            for r in pca_recon_error(ds).take_all()
        }
        assert got == want

    def test_partition_invariance(self, ray_session):
        from tableextraction_ray.functions.similarity import pca_recon_error

        ds = ray.data.read_parquet(
            "/root/testdata/sf0.001/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
        )
        a = sorted(tuple(r.values()) for r in pca_recon_error(ds).take_all())
        b = sorted(
            tuple(r.values())
            for r in pca_recon_error(ds.repartition(11)).take_all()
        )
        assert a == b

    def test_full_rank_basis_zero_error(self, ray_session):
        """k = d reconstructs exactly: every residual must quantize to 0."""
        from tableextraction_ray.functions.similarity import pca_recon_error

        rows = [
            {"vec_id": i, "embedding": [float(i), float(i % 3)], "label": 0}
            for i in range(20)
        ]
        out = pca_recon_error(
            ray.data.from_items(rows), n_components=2
        ).take_all()
        assert out == [
            {"label": 0, "n_vecs": 20, "sum_err_fp2": 0, "mean_err_fp2": 0}
        ]


class TestSourceTokenEntropy:
    def test_uniform_and_degenerate(self, ray_session):
        """Uniform distribution hits ln(k); single-token source hits 0."""
        import math

        rows = [
            # src 'u': 4 distinct tokens, once each -> H = ln 4
            {"source": "u", "text": "alpha beta gamma delta"},
            # src 'd': one token repeated -> H = 0
            {"source": "d", "text": "same same same same"},
        ]
        out = {
            r["source"]: r
            for r in textstats.source_token_entropy(
                ray.data.from_items(rows)
            ).take_all()
        }
        assert out["u"]["n_tokens"] == 4
        assert out["u"]["n_distinct"] == 4
        assert out["u"]["ent_fp6"] == int(math.floor(math.log(4.0) * 1e6))
        assert out["d"]["n_tokens"] == 4
        assert out["d"]["n_distinct"] == 1
        assert out["d"]["ent_fp6"] == 0

    def test_partition_invariance(self, ray_session):
        docs = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["source", "text"],
        )
        a = sorted(
            tuple(r.values())
            for r in textstats.source_token_entropy(docs).take_all()
        )
        b = sorted(
            tuple(r.values())
            for r in textstats.source_token_entropy(
                docs.repartition(9)
            ).take_all()
        )
        assert a == b


class TestValueTrendSlope:
    def test_exact_line(self, ray_session):
        """Events exactly on y = 200x + c must report slope_fp6 = 2e8
        (fp2 cents per day x 1e6)."""
        import datetime

        base = datetime.datetime(2024, 1, 1)
        rows = [
            {
                "event_type": "buy",
                "ts": base + datetime.timedelta(days=d),
                "value": 2.0 * d + 5.0,
            }
            for d in range(10)
        ]
        out = relational.value_trend_slope(
            ray.data.from_items(rows)
        ).take_all()
        assert out == [{"event_type": "buy", "n": 10, "slope_fp6": 200000000}]

    def test_zero_variance_day(self, ray_session):
        import datetime

        ts = datetime.datetime(2024, 3, 1, 12)
        rows = [
            {"event_type": "x", "ts": ts, "value": float(v)}
            for v in (1, 2, 3)
        ]
        out = relational.value_trend_slope(
            ray.data.from_items(rows)
        ).take_all()
        assert out == [{"event_type": "x", "n": 3, "slope_fp6": 0}]


class TestPartSkyline:
    def _parts(self, rows):
        return ray.data.from_items(
            [
                {
                    "p_partkey": k,
                    "p_size": s,
                    "p_retailprice": float(pr),
                }
                for k, pr, s in rows
            ]
        )

    def test_hand_graph_with_ties_and_duplicates(self, ray_session):
        # (key, price, size): 1 dominates 2 (cheaper, bigger);
        # 3 and 4 are identical (both survive); 5 ties 1 on price with
        # smaller size (dominated); 6 is cheapest-smallest (survives).
        rows = [
            (1, 10.0, 50), (2, 12.0, 40), (3, 8.0, 30), (4, 8.0, 30),
            (5, 10.0, 49), (6, 5.0, 10),
        ]
        got = sorted(
            r["p_partkey"]
            for r in relational.part_skyline(self._parts(rows)).take_all()
        )
        # 3,4 dominated by nothing cheaper-with->=size? 6 is cheaper but
        # smaller; 1 is bigger but pricier -> 3,4 survive. 1 survives
        # (nothing cheaper has >= 50). 2: 1 is cheaper AND bigger -> out.
        assert got == [1, 3, 4, 6]

    def test_matches_brute_force_and_partitioning(self, ray_session):
        import itertools

        rng = [
            (k, 5.0 + (k * 37 % 200) / 4.0, (k * 53) % 40)
            for k in range(300)
        ]
        def dominated(p, q):
            return (
                q[1] <= p[1] and q[2] >= p[2]
                and (q[1] < p[1] or q[2] > p[2])
            )
        want = sorted(
            p[0] for p in rng if not any(dominated(p, q) for q in rng)
        )
        for nparts in (1, 7):
            got = sorted(
                r["p_partkey"]
                for r in relational.part_skyline(
                    self._parts(rng).repartition(nparts)
                ).take_all()
            )
            assert got == want, nparts
