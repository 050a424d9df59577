"""Distinct-count operators: exact two-phase vs HyperLogLog (SURVEY §2.11)."""

import ray.data

from tableextraction_ray.functions import sketch

SF_DIR = "/root/testdata/sf0.001"


def _events():
    return ray.data.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "ts"]
    )


class TestHourlyUsers:
    def test_exact_counts(self, ray_session):
        rows = sketch.hourly_users(_events()).take_all()
        assert len(rows) > 0
        assert all(r["n_users"] >= 1 for r in rows)
        # spot-check one hour against a local pandas computation
        import pandas as pd

        df = _events().to_pandas()
        df["hour"] = df["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:00:00")
        want = df.groupby("hour")["user_id"].nunique()
        got = {r["hour"]: r["n_users"] for r in rows}
        assert got == want.to_dict()

    def test_hll_error_bound(self, ray_session):
        """HLL estimate within 5% (or ±3 absolute for tiny hours) of exact —
        the bound that makes a one-pass sketch usable for corpus stats."""
        exact = {r["hour"]: r["n_users"] for r in sketch.hourly_users(_events()).take_all()}
        est = {
            r["hour"]: r["n_users_est"]
            for r in sketch.hourly_users_hll(_events()).take_all()
        }
        assert set(exact) == set(est)
        for h, n in exact.items():
            assert abs(est[h] - n) <= max(3, 0.05 * n), (h, n, est[h])

    def test_hll_merge_is_partition_invariant(self, ray_session):
        """Register-max merging must give the same estimate regardless of
        how events are partitioned into batches."""
        a = sorted(
            (r["hour"], r["n_users_est"])
            for r in sketch.hourly_users_hll(_events()).take_all()
        )
        b = sorted(
            (r["hour"], r["n_users_est"])
            for r in sketch.hourly_users_hll(_events().repartition(17)).take_all()
        )
        assert a == b


class TestHourlyPercentiles:
    def test_rank_convention(self, ray_session):
        """p-th percentile = value at 1-based rank ceil(q*n/100)."""
        import datetime

        import ray.data

        from tableextraction_ray.functions.sketch import hourly_value_percentiles

        base = datetime.datetime(2024, 1, 1, 10, 0, 0)
        events = ray.data.from_items(
            [
                {"ts": base + datetime.timedelta(minutes=i), "value": float(v)}
                for i, v in enumerate([5, 1, 4, 2, 3])  # cents: 100..500
            ]
        )
        rows = hourly_value_percentiles(events).take_all()
        assert len(rows) == 1
        r = rows[0]
        # n=5: p50 rank ceil(2.5)=3 -> 300; p95 rank ceil(4.75)=5 -> 500
        assert r["n_events"] == 5
        assert r["p50_c"] == 300
        assert r["p95_c"] == 500
        assert r["p99_c"] == 500


class TestHllVectorizedFold:
    def test_bit_length_u64_matches_python(self):
        import numpy as np

        from tableextraction_ray.functions.sketch import _bit_length_u64

        rng = np.random.default_rng(7)
        xs = np.concatenate(
            [
                np.array([0, 1, 2, 3, (1 << 52) - 1, 1 << 52, (1 << 52) + 1],
                         dtype=np.uint64),
                rng.integers(0, 1 << 52, size=500).astype(np.uint64),
            ]
        )
        got = _bit_length_u64(xs)
        want = np.array([int(v).bit_length() for v in xs], dtype=np.int64)
        assert (got == want).all()

    def test_vectorized_partial_matches_scalar_fold(self, ray_session):
        """The batch path (dedup + cached md5 + numpy rank scatter) must
        produce bit-identical registers to the scalar reference fold —
        the hashing contract is unchanged, only the loop is gone."""
        import numpy as np
        import pyarrow as pa
        import ray.data

        from tableextraction_ray.functions import sketch

        rng = np.random.default_rng(11)
        n = 5000
        uids = rng.integers(0, 800, size=n)
        ts = pa.array(
            (np.datetime64("2024-03-01T00:00:00", "us")
             + rng.integers(0, 3 * 3600, size=n) * np.timedelta64(1_000_000, "us")),
            type=pa.timestamp("us"),
        )
        tbl = pa.Table.from_pydict(
            {"user_id": pa.array(uids, type=pa.int64()), "ts": ts}
        )
        # Expected: scalar fold per (hour, event).
        import pyarrow.compute as pc

        hours = pc.strftime(
            pc.floor_temporal(tbl["ts"], unit="hour"), format="%Y-%m-%d %H:00:00"
        ).to_pylist()
        m = 1 << sketch.HLL_P
        want: dict[str, np.ndarray] = {}
        for h, u in zip(hours, uids.tolist()):
            regs = want.setdefault(h, np.zeros(m, dtype=np.int8))
            sketch._hll_fold_one(regs, u)
        expected = {h: sketch._hll_estimate(r) for h, r in want.items()}

        got = {
            r["hour"]: r["n_users_est"]
            for r in sketch.hourly_users_hll(ray.data.from_arrow(tbl)).take_all()
        }
        assert got == expected


class TestCms:
    def _docs(self):
        import ray.data

        # skewed corpus: tokens h0/h1 heavy, w0..w39 light
        items = []
        for i in range(40):
            items.append(
                {"doc_id": i, "text": ("h0 " * 10 + "h1 " * 6 + f"w{i} w{i%7}")}
            )
        return ray.data.from_items(items)

    def test_one_sided_and_no_false_negatives(self, ray_session):
        from collections import Counter

        from tableextraction_ray.functions.sketch import cms_heavy_hitters

        docs = self._docs()
        true = Counter()
        for r in docs.take_all():
            true.update(r["text"].split())
        # narrow width forces collisions — the bound must still hold
        out = {
            r["token"]: r["est_count"]
            for r in cms_heavy_hitters(docs, threshold=40, width=8).take_all()
        }
        for tok, est in out.items():
            assert est >= true[tok]  # one-sided: never underestimates
        for tok, c in true.items():
            if c >= 40:
                assert tok in out  # every true heavy hitter survives

    def test_partition_invariance(self, ray_session):
        from tableextraction_ray.functions.sketch import cms_heavy_hitters

        docs = self._docs()
        a = sorted(
            (r["token"], r["est_count"])
            for r in cms_heavy_hitters(docs.repartition(1), threshold=40).take_all()
        )
        b = sorted(
            (r["token"], r["est_count"])
            for r in cms_heavy_hitters(docs.repartition(7), threshold=40).take_all()
        )
        assert a == b and len(a) >= 2


class TestHistogramQuantiles:
    def test_error_bound_vs_exact(self, ray_session):
        import ray.data

        from tableextraction_ray.functions.sketch import (
            hourly_value_percentiles,
            hourly_value_quantiles_sketch,
        )

        events = ray.data.read_parquet(f"{SF_DIR}/events.parquet")
        exact = {r["hour"]: r for r in hourly_value_percentiles(events).take_all()}
        est = {
            r["hour"]: r
            for r in hourly_value_quantiles_sketch(events).take_all()
        }
        assert set(exact) == set(est)
        for hour, e in exact.items():
            s = est[hour]
            assert s["n_events"] == e["n_events"]
            for q in (50, 95, 99):
                true_v, est_v = e[f"p{q}_c"], s[f"p{q}_est_c"]
                assert est_v >= true_v  # one-sided: upper edge of the bin
                assert est_v - true_v < 100  # within one bin width

    def test_partition_invariance(self, ray_session):
        import ray.data

        from tableextraction_ray.functions.sketch import (
            hourly_value_quantiles_sketch,
        )

        events = ray.data.read_parquet(f"{SF_DIR}/events.parquet")
        a = sorted(
            tuple(sorted(r.items()))
            for r in hourly_value_quantiles_sketch(events.repartition(1)).take_all()
        )
        b = sorted(
            tuple(sorted(r.items()))
            for r in hourly_value_quantiles_sketch(events.repartition(13)).take_all()
        )
        assert a == b


class TestHllAudienceOverlap:
    def _events(self, ray_session=None):
        import pyarrow as pa
        import ray.data

        # 600 clickers (u0..u599), 400 purchasers (u400..u799):
        # true |A|=600 |B|=400 |A∪B|=800 |A∩B|=200
        rows_t, rows_u = [], []
        for u in range(600):
            rows_t.append("click")
            rows_u.append(f"u{u}")
        for u in range(400, 800):
            rows_t.append("purchase")
            rows_u.append(f"u{u}")
        # noise the operator must ignore
        rows_t += ["view"] * 50
        rows_u += [f"u{u}" for u in range(50)]
        return ray.data.from_arrow(
            pa.table({"event_type": rows_t, "user_id": rows_u})
        )

    def test_estimates_within_hll_error(self, ray_session):
        from tableextraction_ray.functions.sketch import hll_audience_overlap

        row = hll_audience_overlap(self._events()).take_all()[0]
        assert row["type_a"] == "click" and row["type_b"] == "purchase"
        # 4096 registers -> ~1.6% standard error; allow 5 sigma + small-n slack
        assert abs(row["n_a_est"] - 600) <= 60
        assert abs(row["n_b_est"] - 400) <= 45
        assert abs(row["n_union_est"] - 800) <= 80
        assert abs(row["n_inter_est"] - 200) <= 120  # IE error compounds
        assert row["n_inter_est"] == max(
            0, row["n_a_est"] + row["n_b_est"] - row["n_union_est"]
        )

    def test_partition_invariance(self, ray_session):
        from tableextraction_ray.functions.sketch import hll_audience_overlap

        a = hll_audience_overlap(self._events().repartition(1)).take_all()
        b = hll_audience_overlap(self._events().repartition(13)).take_all()
        assert a == b

    def test_disjoint_and_missing_side(self, ray_session):
        import pyarrow as pa
        import ray.data

        from tableextraction_ray.functions.sketch import hll_audience_overlap

        disjoint = ray.data.from_arrow(
            pa.table(
                {
                    "event_type": ["click"] * 100 + ["purchase"] * 100,
                    "user_id": [f"a{i}" for i in range(100)]
                    + [f"b{i}" for i in range(100)],
                }
            )
        )
        row = hll_audience_overlap(disjoint).take_all()[0]
        assert row["n_inter_est"] <= 25  # near-zero overlap, IE noise only
        only_a = ray.data.from_arrow(
            pa.table(
                {
                    "event_type": ["click"] * 50,
                    "user_id": [f"a{i}" for i in range(50)],
                }
            )
        )
        row = hll_audience_overlap(only_a).take_all()[0]
        assert row["n_b_est"] == 0
        assert row["n_union_est"] == row["n_a_est"]
        assert row["n_inter_est"] == 0


class TestAudienceOverlapExact:
    def test_matches_hand_computed(self, ray_session):
        import pyarrow as pa
        import ray.data

        from tableextraction_ray.functions.sketch import (
            audience_overlap_exact,
        )

        # A={1..6}, B={4..9} -> |A|=6 |B|=6 inter={4,5,6}=3 union=9
        ev = ray.data.from_arrow(
            pa.table(
                {
                    "event_type": ["click"] * 8 + ["purchase"] * 6,
                    # duplicate events must not inflate distincts
                    "user_id": [1, 2, 3, 4, 5, 6, 1, 4, 4, 5, 6, 7, 8, 9],
                }
            )
        ).repartition(4)
        rows = audience_overlap_exact(ev).take_all()
        assert rows == [
            {
                "type_a": "click",
                "type_b": "purchase",
                "n_a": 6,
                "n_b": 6,
                "n_inter": 3,
                "jaccard_fp6": 3 * 1_000_000 // 9,
            }
        ]

    def test_hll_estimate_tracks_exact(self, ray_session):
        import ray.data

        from tableextraction_ray.functions.sketch import (
            audience_overlap_exact,
            hll_audience_overlap,
        )

        ev = ray.data.read_parquet(
            f"{SF_DIR}/events.parquet", columns=["event_type", "user_id"]
        )
        exact = {
            (r["type_a"], r["type_b"]): r
            for r in audience_overlap_exact(ev).take_all()
        }
        est = hll_audience_overlap(ev).take_all()[0]
        ex = exact[("click", "purchase")]
        # 4096 registers ~1.6% sigma; 5-sigma bounds on each side
        assert abs(est["n_a_est"] - ex["n_a"]) <= max(10, ex["n_a"] * 8 // 100)
        assert abs(est["n_b_est"] - ex["n_b"]) <= max(10, ex["n_b"] * 8 // 100)
        union = ex["n_a"] + ex["n_b"] - ex["n_inter"]
        assert abs(est["n_union_est"] - union) <= max(10, union * 8 // 100)


class TestValueQuantilesSelection:
    def test_matches_sorted_reference_small_buckets(self, ray_session):
        import pyarrow as pa
        import ray.data

        from tableextraction_ray.functions.sketch import (
            value_quantiles_selection,
        )

        rng = __import__("numpy").random.default_rng(2)
        vals = rng.integers(0, 10**6, 5000) / 100.0
        ev = ray.data.from_arrow(pa.table({"value": vals})).repartition(8)
        import numpy as np

        cents = np.floor(vals * 100 + 0.5).astype(np.int64)
        s = np.sort(cents)
        n = len(s)
        rows = {
            r["pct"]: r
            for r in value_quantiles_selection(ev).take_all()
        }
        for pct in (25, 50, 75, 99):
            rk = (pct * n + 99) // 100
            assert rows[pct]["rank"] == rk
            assert rows[pct]["value_c"] == int(s[rk - 1]), pct

    def test_forced_multi_iteration_refinement(self, ray_session):
        # bins=4 and pull_limit=0 force the range to shrink only by
        # histogram refinement down to a single-cent bucket
        import numpy as np
        import pyarrow as pa
        import ray.data

        from tableextraction_ray.functions.sketch import (
            value_quantiles_selection,
        )

        rng = np.random.default_rng(3)
        vals = rng.integers(0, 100_000, 2000) / 100.0
        ev = ray.data.from_arrow(pa.table({"value": vals})).repartition(4)
        cents = np.floor(vals * 100 + 0.5).astype(np.int64)
        s = np.sort(cents)
        n = len(s)
        rows = {
            r["pct"]: r["value_c"]
            for r in value_quantiles_selection(
                ev, qs=(50,), bins=4, pull_limit=0, max_iters=30
            ).take_all()
        }
        rk = (50 * n + 99) // 100
        assert rows[50] == int(s[rk - 1])

    def test_empty_input(self, ray_session):
        import pyarrow as pa
        import ray.data

        from tableextraction_ray.functions.sketch import (
            value_quantiles_selection,
        )

        ev = ray.data.from_arrow(
            pa.table({"value": pa.array([], type=pa.float64())})
        )
        assert value_quantiles_selection(ev).count() == 0


class TestKmvUsersByType:
    def _ev(self):
        return ray.data.read_parquet(
            f"{SF_DIR}/events.parquet", columns=["event_type", "user_id"]
        )

    def test_error_bound_vs_exact(self, ray_session):
        """KMV estimate within ~3 standard errors (1/sqrt(k-2)) of the
        exact per-type distinct count; exact below k distinct users."""
        df = self._ev().to_pandas()
        exact = df.groupby("event_type")["user_id"].nunique().to_dict()
        est = {
            r["event_type"]: r["n_users_est"]
            for r in sketch.kmv_users_by_type(self._ev()).take_all()
        }
        assert set(est) == set(exact)
        se = 3.0 / (sketch.KMV_K - 2) ** 0.5
        for et, n in exact.items():
            if n < sketch.KMV_K:
                assert est[et] == n, (et, n, est[et])
            else:
                assert abs(est[et] - n) <= se * n, (et, n, est[et])

    def test_partition_invariance(self, ray_session):
        """k-min merge is associative/commutative/idempotent: estimates
        cannot depend on how events land in batches."""
        a = sorted(
            (r["event_type"], r["n_users_est"])
            for r in sketch.kmv_users_by_type(self._ev()).take_all()
        )
        b = sorted(
            (r["event_type"], r["n_users_est"])
            for r in sketch.kmv_users_by_type(
                self._ev().repartition(23)
            ).take_all()
        )
        assert a == b

    def test_small_k_exact_formula(self, ray_session):
        """With tiny k the estimator must follow the integer contract
        (k-1) * 2^64 // h_k exactly (replayed here in pure Python)."""
        import hashlib as _h

        df = self._ev().to_pandas()
        k = 8
        got = {
            r["event_type"]: r["n_users_est"]
            for r in sketch.kmv_users_by_type(self._ev(), k=k).take_all()
        }
        for et, sub in df.groupby("event_type"):
            hs = sorted(
                int.from_bytes(_h.md5(str(u).encode()).digest()[:8], "big")
                for u in set(sub["user_id"])
            )
            want = len(hs) if len(hs) < k else (k - 1) * (1 << 64) // hs[k - 1]
            assert got[et] == want, (et, want, got[et])


class TestKmvAudienceOverlap:
    def _ev(self):
        return ray.data.read_parquet(
            f"{SF_DIR}/events.parquet", columns=["event_type", "user_id"]
        )

    def test_inclusion_exclusion_vs_exact(self, ray_session):
        """KMV union/intersection within 3 standard errors of exact."""
        df = self._ev().to_pandas()
        a = set(df[df.event_type == "click"]["user_id"])
        b = set(df[df.event_type == "purchase"]["user_id"])
        row = sketch.kmv_audience_overlap(self._ev()).take_all()[0]
        se = 3.0 / (sketch.KMV_K - 2) ** 0.5
        for got, true in (
            (row["n_a_est"], len(a)),
            (row["n_b_est"], len(b)),
            (row["n_union_est"], len(a | b)),
        ):
            tol = se * true if true >= sketch.KMV_K else 0
            assert abs(got - true) <= tol, (got, true)
        # intersection inherits three estimators' error — bound loosely
        assert abs(row["n_inter_est"] - len(a & b)) <= 3 * se * max(
            len(a | b), 1
        )

    def test_partition_invariance(self, ray_session):
        a = sketch.kmv_audience_overlap(self._ev()).take_all()
        b = sketch.kmv_audience_overlap(
            self._ev().repartition(19)
        ).take_all()
        assert a == b
