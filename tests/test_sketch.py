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
