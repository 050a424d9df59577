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


class TestCustdist:
    def test_distribution_with_zero_bucket(self, ray_session):
        orders = ray.data.from_arrow(
            pa.table({"o_custkey": [1, 1, 1, 2, 2, 5]})
        )
        from tableextraction_ray.functions.relational import custdist

        rows = {
            r["c_count"]: r["custdist"]
            for r in custdist(orders, n_customers=4).take_all()
        }
        assert rows == {0: 1, 1: 1, 2: 1, 3: 1}


class TestTopCustomerPerNation:
    def test_argmax_with_cent_tie_broken_by_custkey(self, ray_session):
        from tableextraction_ray.functions.relational import (
            top_customer_per_nation,
        )

        cust = ray.data.from_arrow(
            pa.table(
                {
                    "c_custkey": [3, 1, 8],
                    "c_nationkey": [1, 1, 2],
                    "c_acctbal": [10.00, 10.00, -5.25],
                }
            )
        )
        rows = {
            r["c_nationkey"]: (r["c_custkey"], r["acctbal_cents"])
            for r in top_customer_per_nation(cust).take_all()
        }
        assert rows == {1: (1, 1000), 2: (8, -525)}


class TestLatestEventCompaction:
    def test_latest_wins_with_event_id_tie(self, ray_session):
        from tableextraction_ray.functions.relational import (
            latest_event_compaction,
        )

        events = ray.data.from_arrow(
            pa.table(
                {
                    "event_id": [1, 2, 5, 7, 9],
                    "user_id": [1, 1, 1, 1, 2],
                    "event_type": ["a", "a", "b", "b", "a"],
                    "ts": pa.array(
                        [10, 20, 20, 20, 30], type=pa.timestamp("us")
                    ),
                    "value": [0.5, 1.5, 2.5, 3.5, 4.5],
                }
            )
        )
        rows = {
            (r["user_id"], r["event_type"]): (r["event_id"], r["ts_us"])
            for r in latest_event_compaction(events).take_all()
        }
        # (1,'a'): later ts wins; (1,'b'): ts tie -> larger event_id
        assert rows == {(1, "a"): (2, 20), (1, "b"): (7, 20), (2, "a"): (9, 30)}


class TestFkIntegrity:
    def test_orphan_counts(self, ray_session):
        from tableextraction_ray.functions.relational import (
            fk_integrity_report,
        )

        child = ray.data.from_arrow(pa.table({"fk": [1, 2, 2, 9]}))
        parent = ray.data.from_arrow(pa.table({"pk": [1, 2, 3]}))
        rows = fk_integrity_report(
            [("c->p", child, "fk", parent, "pk")]
        ).take_all()
        assert rows == [
            {
                "relationship": "c->p",
                "n_child_rows": 4,
                "n_orphan_keys": 1,
                "n_orphan_rows": 1,
            }
        ]


class TestPiiScrub:
    def test_counts_on_original_and_sequential_redaction(self, ray_session):
        from tableextraction_ray.functions.textstats import pii_scrub

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": [1],
                    "text": ["mail a@b.co ip 1.2.3.4 n 42"],
                }
            )
        )
        (r,) = pii_scrub(ds).take_all()
        assert r["n_email"] == 1 and r["n_ip"] == 1
        # num counted on the ORIGINAL text: the IP's four octets + 42
        assert r["n_num"] == 5
        assert r["clean"] == "mail <EMAIL> ip <IP> n <NUM>"


class TestSourceDivergence:
    def test_hand_computed_tv(self, ray_session):
        from tableextraction_ray.functions.textstats import source_divergence

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": [1, 2],
                    "source": ["s1", "s2"],
                    "text": ["a a b", "a b b b"],
                }
            )
        )
        rows = {
            r["source"]: r for r in source_divergence(ds, k=8).take_all()
        }
        # n_s1=3, n_s2=4, N=7, c_a=3, c_b=4
        # s1: |2*7-3*3| + |1*7-4*3| = 10 -> 10e6 // 42 = 238095
        assert rows["s1"]["n_tokens"] == 3
        assert rows["s1"]["tv_fp6"] == 238_095
        # s2: 10 -> 10e6 // 56 = 178571
        assert rows["s2"]["n_tokens"] == 4
        assert rows["s2"]["tv_fp6"] == 178_571


class TestLengthOutliersMad:
    def test_mad_zero_flags_any_off_median(self, ray_session):
        from tableextraction_ray.functions.textstats import (
            length_outliers_mad,
        )

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": [1, 2, 3, 4, 5],
                    "source": ["s"] * 5,
                    "n_chars": [10, 10, 10, 10, 100],
                }
            )
        )
        rows = length_outliers_mad(ds).take_all()
        assert len(rows) == 1
        assert rows[0]["doc_id"] == 5 and rows[0]["dev"] == 90


class TestInvertedIndex:
    def test_topk_postings_sorted(self, ray_session):
        from tableextraction_ray.functions.retrieval import inverted_index

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": [3, 1, 2],
                    "text": ["a", "a b", "b c b"],
                }
            )
        )
        rows = {r["token"]: r for r in inverted_index(ds, k=2).take_all()}
        assert set(rows) == {"a", "b"}
        assert rows["a"]["df"] == 2 and rows["a"]["postings"] == "1,3"
        assert rows["b"]["df"] == 2 and rows["b"]["postings"] == "1,2"


class TestPagerankBipartite:
    @staticmethod
    def _reference(edges, iters=3, scale=10**12, damping=85):
        # plain-Python replay of the documented floor arithmetic
        from collections import defaultdict

        adj = defaultdict(set)
        for p, s in edges:
            adj[2 * p].add(2 * s + 1)
            adj[2 * s + 1].add(2 * p)
        nodes = sorted(adj)
        nv = len(nodes)
        base = ((100 - damping) * scale) // (100 * nv)
        r = {v: scale // nv for v in nodes}
        for _ in range(iters):
            s = defaultdict(int)
            for u in nodes:
                c = r[u] // len(adj[u])
                for v in adj[u]:
                    s[v] += c
            r = {v: base + (damping * s[v]) // 100 for v in nodes}
        return {
            ("part" if v % 2 == 0 else "supplier", v // 2): r[v]
            for v in nodes
        }

    def test_matches_reference_replay(self, ray_session):
        from tableextraction_ray.functions.relational import (
            pagerank_bipartite,
        )

        edges = [(1, 1), (2, 1), (2, 2), (3, 2)]
        li = ray.data.from_arrow(
            pa.table(
                {
                    "l_partkey": [e[0] for e in edges] * 2,  # dup rows
                    "l_suppkey": [e[1] for e in edges] * 2,
                }
            )
        )
        got = {
            (r["node_type"], r["key"]): r["rank_fp"]
            for r in pagerank_bipartite(li, num_partitions=2).take_all()
        }
        assert got == self._reference(edges)

    def test_single_edge_is_stationary(self, ray_session):
        from tableextraction_ray.functions.relational import (
            pagerank_bipartite,
        )

        li = ray.data.from_arrow(
            pa.table({"l_partkey": [4], "l_suppkey": [9]})
        )
        out = pagerank_bipartite(li, num_partitions=2).take_all()
        assert sorted(r["rank_fp"] for r in out) == [
            500_000_000_000,
            500_000_000_000,
        ]

    def test_broadcast_and_join_paths_agree(self, ray_session):
        # broadcast_node_limit=0 forces the fully distributed
        # join-per-iteration path; the default takes the guarded
        # broadcast fast path. Both must be bit-identical.
        from tableextraction_ray.functions.relational import (
            pagerank_bipartite,
        )

        rng = __import__("random").Random(7)
        n = 400
        li = ray.data.from_arrow(
            pa.table(
                {
                    "l_partkey": [rng.randint(1, 60) for _ in range(n)],
                    "l_suppkey": [rng.randint(1, 15) for _ in range(n)],
                }
            )
        ).repartition(4)
        key = lambda r: (r["node_type"], r["key"])
        fast = {
            key(r): r["rank_fp"]
            for r in pagerank_bipartite(li, num_partitions=2).take_all()
        }
        slow = {
            key(r): r["rank_fp"]
            for r in pagerank_bipartite(
                li, num_partitions=2, broadcast_node_limit=0
            ).take_all()
        }
        assert fast == slow


class TestBasketPairs:
    def test_pair_counts_dedup_within_order(self, ray_session):
        from tableextraction_ray.functions.relational import basket_pairs

        li = ray.data.from_arrow(
            pa.table(
                {
                    "l_orderkey": [1, 1, 1, 2, 2, 3],
                    "l_partkey": [5, 3, 5, 3, 5, 9],
                }
            )
        )
        rows = basket_pairs(li).take_all()
        assert rows == [{"part_a": 3, "part_b": 5, "n_orders": 2}]


class TestHourlyAnomalies:
    def test_poisson_integer_inequality(self, ray_session):
        from tableextraction_ray.functions.relational import hourly_anomalies

        hour_us = 3_600_000_000
        ts = (
            [0] * 1 + [hour_us] * 1 + [2 * hour_us] * 10
        )
        events = ray.data.from_arrow(
            pa.table(
                {
                    "event_type": ["a"] * 12,
                    "ts": pa.array(ts, type=pa.timestamp("us")),
                }
            )
        )
        rows = hourly_anomalies(events, z=2).take_all()
        # T=12, H=3: hour with n=10 -> (30-12)^2=324 > 4*36=144; n=1 -> 81 < 144
        assert len(rows) == 1
        assert rows[0]["n"] == 10 and rows[0]["hour"].endswith("02:00:00")


class TestRollingActiveUsers:
    def test_window_clip_and_gap_days(self, ray_session):
        from tableextraction_ray.functions.relational import (
            rolling_active_users,
        )

        day = 86_400_000_000
        events = ray.data.from_arrow(
            pa.table(
                {
                    "user_id": [1, 2],
                    "ts": pa.array([0, 8 * day], type=pa.timestamp("us")),
                }
            )
        )
        rows = {
            r["day"]: r["n_users"]
            for r in rolling_active_users(events).take_all()
        }
        # u1@day0 covers window-ends 0..6; u2@day8 covers 8 (clipped at hi)
        assert rows == {**{d: 1 for d in range(7)}, 8: 1}
        assert 7 not in rows  # empty window is not emitted


class TestLateShipmentOrders:
    def test_exists_semantics_per_priority(self, ray_session):
        from tableextraction_ray.functions.relational import (
            late_shipment_orders,
        )

        day = 86_400_000_000
        orders = ray.data.from_arrow(
            pa.table(
                {
                    "o_orderkey": [1, 2],
                    "o_orderdate": pa.array([0, 0], type=pa.timestamp("us")),
                    "o_orderpriority": ["P1", "P1"],
                }
            )
        )
        li = ray.data.from_arrow(
            pa.table(
                {
                    "l_orderkey": [1, 1, 2],
                    "l_shipdate": pa.array(
                        [10 * day, 61 * day, 59 * day],
                        type=pa.timestamp("us"),
                    ),
                }
            )
        )
        rows = late_shipment_orders(orders, li).take_all()
        assert rows == [{"o_orderpriority": "P1", "n_late": 1}]


class TestEventTransitions:
    def test_per_user_order_with_id_tiebreak(self, ray_session):
        from tableextraction_ray.functions.relational import (
            event_transitions,
        )

        events = ray.data.from_arrow(
            pa.table(
                {
                    "user_id": [1, 1, 1, 2],
                    "event_type": ["a", "b", "a", "b"],
                    # two ts ties resolved by event_id: (1,'a')->(2,'b')
                    "ts": pa.array([5, 5, 9, 3], type=pa.timestamp("us")),
                    "event_id": [1, 2, 3, 4],
                }
            )
        )
        rows = {
            (r["prev_type"], r["next_type"]): r["n"]
            for r in event_transitions(events).take_all()
        }
        assert rows == {("a", "b"): 1, ("b", "a"): 1}


class TestKnnLabelPurity:
    def test_purity_on_two_clusters(self, ray_session):
        import numpy as np

        from tableextraction_ray.functions.similarity import knn_label_purity

        # two tight clusters: queries 0/1 sit in label-0/label-1 blobs
        rng = []
        vecs, labels = [], []
        for i in range(12):
            lab = i % 2
            base = [1.0, 0.0] if lab == 0 else [0.0, 1.0]
            vecs.append([base[0] + 0.001 * i, base[1] + 0.001 * (i % 3)])
            labels.append(lab)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": list(range(12)),
                    "embedding": vecs,
                    "label": pa.array(labels, type=pa.int32()),
                }
            )
        )
        rows = {
            r["query_id"]: r
            for r in knn_label_purity(ds, n_queries=2, k=5).take_all()
        }
        assert rows[0]["label"] == 0 and rows[1]["label"] == 1
        # 5 nearest of a cluster member are the 5 same-label others
        assert rows[0]["n_same"] == 5 and rows[0]["purity_fp6"] == 1_000_000
        assert rows[1]["n_same"] == 5 and rows[1]["purity_fp6"] == 1_000_000


class TestEventsUserOverlap:
    def test_pairwise_shared_users(self, ray_session):
        from tableextraction_ray.functions.relational import (
            events_user_overlap,
        )

        events = ray.data.from_arrow(
            pa.table(
                {
                    "user_id": [1, 1, 1, 2, 2, 3],
                    "event_type": ["a", "b", "b", "b", "c", "a"],
                }
            )
        )
        rows = {
            (r["type_a"], r["type_b"]): r["n_users"]
            for r in events_user_overlap(events).take_all()
        }
        # u1: {a,b}; u2: {b,c}; u3: {a}
        assert rows == {("a", "b"): 1, ("b", "c"): 1}


class TestMonthlyRevenueRunning:
    def test_cumsum_over_months(self, ray_session):
        from tableextraction_ray.functions.relational import (
            monthly_revenue_running,
        )

        month_us = 32 * 86_400_000_000  # lands in different months
        orders = ray.data.from_arrow(
            pa.table(
                {
                    "o_orderdate": pa.array(
                        [0, 1, month_us], type=pa.timestamp("us")
                    ),
                    "o_totalprice": [10.00, 5.005, 1.00],
                }
            )
        )
        rows = monthly_revenue_running(orders).take_all()
        # Jan-1970: 1000 + floor(500.5+0.5)=501 -> 1501; Feb: 100
        assert rows == [
            {"month": "1970-01", "rev_cents": 1501, "cum_rev_cents": 1501},
            {"month": "1970-02", "rev_cents": 100, "cum_rev_cents": 1601},
        ]


class TestCheapestSupplierPerPart:
    def test_argmin_with_rational_price_and_tie(self, ray_session):
        from tableextraction_ray.functions.relational import (
            cheapest_supplier_per_part,
        )

        li = ray.data.from_arrow(
            pa.table(
                {
                    "l_partkey": [1, 1, 1, 2],
                    "l_suppkey": [9, 3, 5, 7],
                    "l_quantity": [3.0, 2.0, 2.0, 1.0],
                    # unit fp4: 900/3=30000, 700/2=35000, 600/2=30000...
                    "l_extendedprice": [9.00, 7.00, 6.00, 4.00],
                }
            )
        )
        rows = {
            r["l_partkey"]: r
            for r in cheapest_supplier_per_part(li).take_all()
        }
        # part 1: supp9 fp4=30000, supp3 fp4=35000, supp5 fp4=30000
        # -> tie 30000 between supp 9 and 5 -> smaller suppkey 5 wins
        assert rows[1]["l_suppkey"] == 5
        assert rows[1]["unit_price_fp4"] == 30000
        assert rows[2]["l_suppkey"] == 7 and rows[2]["unit_price_fp4"] == 40000


class TestVocabCoverageCurve:
    def test_coverage_monotone_and_exact(self, ray_session):
        from tableextraction_ray.functions.textstats import (
            vocab_coverage_curve,
        )

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": [1],
                    "text": ["a a a b b c d"],
                }
            )
        )
        rows = {
            r["k"]: r for r in vocab_coverage_curve(ds, ks=(1, 2)).take_all()
        }
        assert rows[1]["covered"] == 3 and rows[1]["total"] == 7
        assert rows[1]["coverage_fp6"] == 428_571
        assert rows[2]["covered"] == 5
        assert rows[2]["coverage_fp6"] == 714_285
