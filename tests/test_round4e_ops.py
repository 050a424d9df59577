"""Round-4 batch-8 ops: Q4 EXISTS shape, containment / weighted-Jaccard
candidate scorers, truncation dups, MAD outliers, decayed scores. Oracle
parity runs in test_entry_parity; these pin the invariants and edge cases
the oracle hash alone wouldn't localize."""

import numpy as np
import pyarrow as pa
import ray.data

from tableextraction_ray.functions import dedup, relational, sketch

SF_DIR = "/root/testdata/sf0.001"


def _rd(t, cols):
    return ray.data.read_parquet(f"{SF_DIR}/{t}.parquet", columns=cols)


def _docs():
    return _rd("documents", ["doc_id", "text"])


class TestOrderPriorityCount:
    def test_counts_bounded_by_window(self, ray_session):
        orders = _rd("orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
        li = _rd("lineitem", ["l_orderkey", "l_shipdate"])
        rows = relational.order_priority_count(orders, li).take_all()
        assert len(rows) > 0
        pris = {r["o_orderpriority"] for r in rows}
        assert pris <= set(relational._PRIORITIES)
        assert all(r["order_count"] > 0 for r in rows)

    def test_empty_window_is_empty(self, ray_session):
        orders = _rd("orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
        li = _rd("lineitem", ["l_orderkey", "l_shipdate"])
        rows = relational.order_priority_count(
            orders, li, date_lo="1990-01-01", date_hi="1990-01-02"
        ).take_all()
        assert rows == []

    def test_zero_late_days_counts_every_shipped_order(self, ray_session):
        # with late_days=0 every order with any lineitem qualifies
        # (shipdate > orderdate always holds in the corpus), so the
        # result equals the window's order count per priority minus
        # lineitem-less orders.
        import duckdb

        orders = _rd("orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
        li = _rd("lineitem", ["l_orderkey", "l_shipdate"])
        got = {
            r["o_orderpriority"]: r["order_count"]
            for r in relational.order_priority_count(
                orders, li, late_days=0
            ).take_all()
        }
        con = duckdb.connect()
        want = dict(
            con.execute(
                f"""
                SELECT o_orderpriority, COUNT(*) FROM
                  read_parquet('{SF_DIR}/orders.parquet') o
                WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o.o_orderdate < TIMESTAMP '1996-04-01'
                  AND EXISTS (SELECT 1 FROM
                        read_parquet('{SF_DIR}/lineitem.parquet') l
                        WHERE l.l_orderkey = o.o_orderkey
                          AND l.l_shipdate > o.o_orderdate)
                GROUP BY 1
                """
            ).fetchall()
        )
        assert got == want


class TestPairScorers:
    def test_containment_dominates_jaccard(self, ray_session):
        # |A∩B|/min >= |A∩B|/|A∪B| always, same candidate set.
        jac = {
            (r["doc_a"], r["doc_b"]): r["jaccard_fp6"]
            for r in dedup.ngram_jaccard(_docs()).take_all()
        }
        cont = {
            (r["doc_a"], r["doc_b"]): r["containment_fp6"]
            for r in dedup.containment_pairs(_docs()).take_all()
        }
        assert set(jac) == set(cont) and len(jac) > 0
        for k in jac:
            assert cont[k] >= jac[k]
            assert 0 <= cont[k] <= 1_000_000

    def test_weighted_jaccard_bounds_and_candidates(self, ray_session):
        jac = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.ngram_jaccard(_docs()).take_all()
        }
        wj = {
            (r["doc_a"], r["doc_b"]): r["wjaccard_fp6"]
            for r in dedup.weighted_jaccard_pairs(_docs()).take_all()
        }
        assert set(wj) == jac and len(wj) > 0
        assert all(0 <= v <= 1_000_000 for v in wj.values())

    def test_semi_join_path_matches_broadcast(self, ray_session):
        b = sorted(
            (r["doc_a"], r["doc_b"], r["containment_fp6"])
            for r in dedup.containment_pairs(_docs(), semi_join=False).take_all()
        )
        s = sorted(
            (r["doc_a"], r["doc_b"], r["containment_fp6"])
            for r in dedup.containment_pairs(_docs(), semi_join=True).take_all()
        )
        assert b == s and len(b) > 0


class TestTruncationDups:
    def test_groups_have_multiple_distinct_texts(self, ray_session):
        rows = dedup.truncation_dups(_docs()).take_all()
        assert len(rows) > 0
        for r in rows:
            assert r["n_docs"] > 1 and r["n_texts"] > 1
            assert r["n_texts"] <= r["n_docs"]

    def test_longer_prefix_never_adds_groups(self, ray_session):
        short = dedup.truncation_dups(_docs(), prefix_chars=32).count()
        long_ = dedup.truncation_dups(_docs(), prefix_chars=512).count()
        # a 512-char shared prefix implies a 32-char one (docs shorter
        # than the prefix hash their whole text in both).
        assert long_ <= short

    def test_synthetic_truncation_found(self, ray_session):
        texts = [
            "alpha beta gamma " * 10 + "tail one",
            "alpha beta gamma " * 10 + "a divergent continuation",
            "totally different document body",
        ]
        ds = ray.data.from_arrow(
            pa.Table.from_pydict(
                {"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                 "text": pa.array(texts)}
            )
        )
        rows = dedup.truncation_dups(ds, prefix_chars=64).take_all()
        assert len(rows) == 1
        assert rows[0]["n_docs"] == 2
        assert rows[0]["n_texts"] == 2
        assert rows[0]["keep_doc_id"] == 1


class TestMadOutliers:
    def test_matches_numpy_truth(self, ray_session):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["event_id", "value"])
        v = np.floor(t["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        n = len(v)
        rank = (50 * n + 99) // 100
        med = int(np.sort(v)[rank - 1])
        dev = np.abs(v - med)
        mad = int(np.sort(dev)[rank - 1])
        want_ids = sorted(
            int(e)
            for e, d in zip(t["event_id"].to_numpy(), dev)
            if d * 100 > 350 * mad
        )
        got = sorted(
            r["event_id"]
            for r in sketch.mad_outliers(
                _rd("events", ["event_id", "value"])
            ).take_all()
        )
        assert got == want_ids and len(got) > 0

    def test_empty_input(self, ray_session):
        ds = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "value": pa.array([], type=pa.float64()),
                }
            )
        )
        assert sketch.mad_outliers(ds).take_all() == []

    def test_tight_pull_limit_still_exact(self, ray_session):
        # force multi-pass refinement (pull_limit path exercised via
        # _select_rank's loop) by shrinking bins.
        ids_default = sorted(
            r["event_id"]
            for r in sketch.mad_outliers(
                _rd("events", ["event_id", "value"])
            ).take_all()
        )
        # same result computed through a 2-bin selection (max passes)
        from tableextraction_ray.functions.sketch import _select_rank

        import pyarrow.parquet as pq

        t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["value"])
        v = np.floor(t["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        vals = ray.data.from_arrow(
            pa.Table.from_pydict({"v": pa.array(v, type=pa.int64())})
        ).materialize()
        n = len(v)
        rank = (50 * n + 99) // 100
        got = _select_rank(
            vals, rank, int(v.min()), int(v.max()), bins=2, pull_limit=1,
            max_iters=64,
        )
        assert got == int(np.sort(v)[rank - 1])
        assert len(ids_default) > 0


class TestDecayedUserScore:
    def test_weights_are_exact_shifts(self, ray_session):
        # two events for one user: one at tmax (weight 1e9), one 45 days
        # earlier (bucket 1, weight 5e8).
        ts = pa.array(
            np.array(
                ["2024-03-01T00:00:00", "2024-01-16T00:00:00"],
                dtype="datetime64[us]",
            )
        )
        ds = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "ts": ts,
                    "user_id": pa.array([7, 7], type=pa.int64()),
                    "value": pa.array([2.0, 4.0], type=pa.float64()),
                }
            )
        )
        rows = relational.decayed_user_score(ds, half_life_days=30).take_all()
        assert rows == [
            {"user_id": 7, "score_fp": 200 * 10**9 + 400 * (10**9 >> 1)}
        ]

    def test_every_user_present(self, ray_session):
        ev = _rd("events", ["ts", "user_id", "value"])
        n_users = ev.select_columns(["user_id"]).unique("user_id")
        rows = relational.decayed_user_score(ev).take_all()
        assert len(rows) == len(n_users)
        assert all(r["score_fp"] >= 0 for r in rows)


class TestSpanKindTransitions:
    def test_bigram_total_is_spans_minus_docs(self, ray_session, t1_corpus):
        import pyarrow.parquet as pq
        import glob

        ds = ray.data.read_parquet(f"{t1_corpus}/documents.parquet")
        from tableextraction_ray.functions import interleaved

        rows = interleaved.span_kind_transitions(ds).take_all()
        total_bigrams = sum(r["n"] for r in rows)
        t = pq.read_table(f"{t1_corpus}/documents.parquet", columns=["spans"])
        lens = [len(s) for s in t["spans"].to_pylist()]
        want = sum(max(0, n - 1) for n in lens)
        assert total_bigrams == want and total_bigrams > 0


class TestSessionPathTopk:
    def test_topk_order_and_bound(self, ray_session):
        rows = relational.session_path_topk(
            _rd("events", ["user_id", "ts", "event_id", "event_type"]), k=5
        ).take_all()
        assert 0 < len(rows) <= 5
        seq = [(r["n"], r["path"]) for r in rows]
        # descending n, ascending path on ties
        assert seq == sorted(seq, key=lambda x: (-x[0], x[1]))


class TestRobustScaleEvents:
    def test_matches_numpy_truth(self, ray_session):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["event_id", "value"])
        v = np.floor(t["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        n = len(v)
        sv = np.sort(v)
        q1 = int(sv[(25 * n + 99) // 100 - 1])
        med = int(sv[(50 * n + 99) // 100 - 1])
        q3 = int(sv[(75 * n + 99) // 100 - 1])
        iqr = max(q3 - q1, 1)
        want = dict(
            zip(
                t["event_id"].to_numpy().astype(np.int64).tolist(),
                ((v - med) * 1_000_000 // iqr).tolist(),
            )
        )
        got = {
            r["event_id"]: r["scaled_fp6"]
            for r in relational.robust_scale_events(
                _rd("events", ["event_id", "value"])
            ).take_all()
        }
        assert got == want
        assert any(x < 0 for x in got.values())  # floor-div path exercised


class TestValuePsi:
    def test_identical_halves_give_zero(self, ray_session):
        # same values in both halves -> every term 0
        ts = pa.array(
            np.array(
                ["2024-01-01T00:00:00"] * 4 + ["2024-12-31T00:00:00"] * 4,
                dtype="datetime64[us]",
            )
        )
        vals = pa.array([1.0, 2.0, 3.0, 4.0] * 2, type=pa.float64())
        ds = ray.data.from_arrow(pa.Table.from_pydict({"ts": ts, "value": vals}))
        rows = relational.value_psi(ds).take_all()
        assert len(rows) == 10
        assert all(r["term_fp9"] == 0 for r in rows)
        assert sum(r["n_ref"] for r in rows) == 4
        assert sum(r["n_cur"] for r in rows) == 4

    def test_terms_nonnegative(self, ray_session):
        rows = relational.value_psi(_rd("events", ["ts", "value"])).take_all()
        assert len(rows) == 10
        assert all(r["term_fp9"] >= 0 for r in rows)


class TestMgHeavyTokens:
    def test_matches_exact_counts(self, ray_session):
        import pyarrow.parquet as pq
        from collections import Counter

        from tableextraction_ray.functions.textstats import ascii_tokens

        t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
        cnt = Counter()
        for s in t["text"].to_pylist():
            cnt.update(ascii_tokens(s))
        total = sum(cnt.values())
        want = {t_: n for t_, n in cnt.items() if n * 512 > total}
        got = {
            r["token"]: r["n"]
            for r in sketch.mg_heavy_tokens(_rd("documents", ["text"])).take_all()
        }
        assert got == want and len(got) > 0

    def test_small_k_still_exact(self, ray_session):
        # k=8: heavy eviction pressure inside every block MG; output must
        # still be the exact HAVING n*8 > total set.
        import pyarrow.parquet as pq
        from collections import Counter

        from tableextraction_ray.functions.textstats import ascii_tokens

        t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
        cnt = Counter()
        for s in t["text"].to_pylist():
            cnt.update(ascii_tokens(s))
        total = sum(cnt.values())
        want = {t_: n for t_, n in cnt.items() if n * 8 > total}
        got = {
            r["token"]: r["n"]
            for r in sketch.mg_heavy_tokens(
                _rd("documents", ["text"]), k=8
            ).take_all()
        }
        assert got == want


class TestSetjoinJaccard:
    def _truth(self, tau_fp6):
        import itertools
        import pyarrow.parquet as pq

        from tableextraction_ray.functions import fp
        from tableextraction_ray.functions.dedup import (
            shingle_base_hash,
            shingle_set,
        )

        t = pq.read_table(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        )
        hs = {}
        for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            h = {shingle_base_hash(x) for x in shingle_set(s)}
            if h:
                hs[d] = h
        out = []
        for a, b in itertools.combinations(sorted(hs), 2):
            i = len(hs[a] & hs[b])
            u = len(hs[a] | hs[b])
            j = fp(i * 1000000.0 / u, 0) if u else 0
            if j >= tau_fp6:
                out.append((a, b, j))
        return sorted(out)

    def test_no_recall_loss_at_default_tau(self, ray_session):
        got = sorted(
            (r["doc_a"], r["doc_b"], r["jaccard_fp6"])
            for r in dedup.setjoin_jaccard(_docs()).take_all()
        )
        assert got == self._truth(500_000) and len(got) > 0

    def test_low_tau_widens_prefixes_exactly(self, ray_session):
        # tau=0.2: prefixes cover 80% of each doc, candidate volume up,
        # result still exact.
        got = sorted(
            (r["doc_a"], r["doc_b"], r["jaccard_fp6"])
            for r in dedup.setjoin_jaccard(_docs(), tau_fp6=200_000).take_all()
        )
        assert got == self._truth(200_000)
        assert len(got) >= len(self._truth(500_000))

    def test_prefix_mode_matches_cooccur(self, ray_session):
        # the PPJoin prefix path (for boilerplate-shingle skew) must be
        # pair-for-pair equal to the vectorized co-occurrence default.
        b = sorted(
            (r["doc_a"], r["doc_b"], r["jaccard_fp6"])
            for r in dedup.setjoin_jaccard(_docs()).take_all()
        )
        s = sorted(
            (r["doc_a"], r["doc_b"], r["jaccard_fp6"])
            for r in dedup.setjoin_jaccard(
                _docs(), mode="prefix", semi_join=True
            ).take_all()
        )
        assert b == s and len(b) > 0

    def test_forced_shuffle_size_attach_matches_broadcast(self, ray_session):
        # size_broadcast_limit=0 forces keyed_attach_int's tagged-union
        # fallback for BOTH size probes — the 10^12-doc path.
        b = sorted(
            (r["doc_a"], r["doc_b"], r["jaccard_fp6"])
            for r in dedup.setjoin_jaccard(_docs()).take_all()
        )
        s = sorted(
            (r["doc_a"], r["doc_b"], r["jaccard_fp6"])
            for r in dedup.setjoin_jaccard(
                _docs(), size_broadcast_limit=0
            ).take_all()
        )
        assert b == s and len(b) > 0


class TestTokenizerFertility:
    def test_fertility_at_least_one(self, ray_session):
        from tableextraction_ray.functions import textstats

        rows = textstats.tokenizer_fertility(
            _rd("documents", ["lang", "text"])
        ).take_all()
        assert len(rows) > 0
        for r in rows:
            # a whitespace word is >= 1 regex token
            assert r["n_bpe"] >= r["n_words"] > 0
            assert r["fertility_fp6"] >= 1_000_000


class TestQualityNtileBySource:
    def test_tile_sizes_follow_ntile_semantics(self, ray_session):
        from collections import Counter

        from tableextraction_ray.functions import textstats

        rows = textstats.quality_ntile_by_source(
            _rd("documents", ["doc_id", "text", "source"])
        ).take_all()
        assert len(rows) == 500
        per_src = {}
        for r in rows:
            per_src.setdefault(r["source"], Counter())[r["tile"]] += 1
        for src, tiles in per_src.items():
            cnt = sum(tiles.values())
            base, rem = divmod(cnt, 4)
            for t in range(1, 5):
                want = base + 1 if t <= rem else base
                assert tiles.get(t, 0) == want, (src, t)

    def test_higher_tile_means_higher_quality(self, ray_session):
        from tableextraction_ray.functions import textstats

        rows = textstats.quality_ntile_by_source(
            _rd("documents", ["doc_id", "text", "source"])
        ).take_all()
        per_src = {}
        for r in rows:
            per_src.setdefault(r["source"], []).append(
                (r["tile"], r["alpha_fp6"], r["doc_id"])
            )
        for src, lst in per_src.items():
            lst.sort(key=lambda x: (x[1], x[2]))
            tiles = [t for t, _, _ in lst]
            assert tiles == sorted(tiles), src
