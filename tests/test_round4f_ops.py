"""Round-4 batch-9 ops: grouped exact selection (per-type medians), CDC
MERGE with tombstones, GROUP BY CUBE shape, anti-entropy partition
checksums. Oracle parity runs in test_entry_parity; these pin the edge
cases and invariants the oracle hash alone wouldn't localize."""

import numpy as np
import pyarrow as pa
import ray.data

from tableextraction_ray.functions import curate, relational, sketch

SF_DIR = "/root/testdata/sf0.001"


def _rd(t, cols):
    return ray.data.read_parquet(f"{SF_DIR}/{t}.parquet", columns=cols)


def _events():
    return _rd("events", ["event_id", "ts", "user_id", "event_type", "value"])


class TestSelectRankGrouped:
    def _ds(self, groups):
        gs, vs = [], []
        for g, vals in groups.items():
            gs += [g] * len(vals)
            vs += vals
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "g": pa.array(gs, type=pa.int64()),
                    "v": pa.array(vs, type=pa.int64()),
                }
            )
        ).repartition(4).materialize()

    def test_matches_numpy_sort(self, ray_session):
        rng = np.random.RandomState(7)
        groups = {
            g: list(rng.randint(-10_000_000, 10_000_000, size=50 + 13 * g))
            for g in range(4)
        }
        vals = self._ds({g: [int(x) for x in v] for g, v in groups.items()})
        ranks = {g: (len(v) + 1) // 2 for g, v in groups.items()}
        lo = {g: min(v) for g, v in groups.items()}
        hi = {g: max(v) for g, v in groups.items()}
        got = sketch.select_rank_grouped(vals, ranks, lo, hi)
        want = {
            g: int(np.sort(np.array(v))[ranks[g] - 1])
            for g, v in groups.items()
        }
        assert got == want

    def test_every_rank_of_a_small_group(self, ray_session):
        vals = self._ds({0: [5, 1, 9, 1, 7]})
        for r, want in enumerate([1, 1, 5, 7, 9], start=1):
            got = sketch.select_rank_grouped(vals, {0: r}, {0: 1}, {0: 9})
            assert got == {0: want}, r

    def test_narrow_bins_force_refinement_passes(self, ray_session):
        # bins=2 forces many histogram passes; the result must not change.
        rng = np.random.RandomState(3)
        v = [int(x) for x in rng.randint(0, 1 << 40, size=200)]
        vals = self._ds({1: v})
        got = sketch.select_rank_grouped(
            vals, {1: 100}, {1: min(v)}, {1: max(v)}, bins=2, pull_limit=5,
            max_iters=64,
        )
        assert got == {1: int(np.sort(v)[99])}


class TestMedianValueByType:
    def test_matches_per_type_numpy(self, ray_session):
        rows = relational.median_value_by_type(_events()).take_all()
        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
        )
        vc = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        assert len(rows) == len(set(et))
        for r in rows:
            sel = np.sort(vc[et == r["event_type"]])
            n = len(sel)
            assert r["n"] == n
            assert r["med_lo_c"] == int(sel[(n + 1) // 2 - 1])
            assert r["med_hi_c"] == int(sel[n // 2])
            assert r["med_x2_c"] == r["med_lo_c"] + r["med_hi_c"]

    def test_odd_group_lo_equals_hi(self, ray_session):
        t = pa.Table.from_pydict(
            {
                "event_type": pa.array(["a"] * 3 + ["b"] * 4),
                "value": pa.array([3.0, 1.0, 2.0, 10.0, 40.0, 20.0, 30.0]),
            }
        )
        rows = {
            r["event_type"]: r
            for r in relational.median_value_by_type(
                ray.data.from_arrow(t).repartition(3)
            ).take_all()
        }
        assert rows["a"]["med_lo_c"] == rows["a"]["med_hi_c"] == 200
        assert rows["b"]["med_lo_c"] == 2000 and rows["b"]["med_hi_c"] == 3000


class TestCdcMerge:
    def _ds(self, ops):
        # ops: list of (event_id, ts_us, user_id, event_type, value)
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "event_id": pa.array(
                        [o[0] for o in ops], type=pa.int64()
                    ),
                    "ts": pa.array(
                        [o[1] for o in ops], type=pa.timestamp("us")
                    ),
                    "user_id": pa.array(
                        [o[2] for o in ops], type=pa.int64()
                    ),
                    "event_type": pa.array(
                        [o[3] for o in ops], type=pa.string()
                    ),
                    "value": pa.array(
                        [o[4] for o in ops], type=pa.float64()
                    ),
                }
            )
        ).repartition(3)

    def test_tombstone_last_deletes(self, ray_session):
        rows = {
            r["user_id"]: r
            for r in relational.cdc_merge(
                self._ds(
                    [
                        (1, 10, 1, "view", 1.0),
                        (2, 20, 1, "error", 0.0),
                        (3, 10, 2, "error", 0.0),
                        (4, 20, 2, "purchase", 7.5),
                    ]
                )
            ).take_all()
        }
        assert rows[1]["state"] == "deleted" and rows[1]["value_c"] == -1
        assert rows[1]["n_upserts"] == 1 and rows[1]["n_deletes"] == 1
        assert rows[2]["state"] == "live" and rows[2]["value_c"] == 750
        assert rows[2]["n_upserts"] == 1 and rows[2]["n_deletes"] == 1

    def test_ts_tie_broken_by_event_id(self, ray_session):
        rows = relational.cdc_merge(
            self._ds([(5, 10, 3, "error", 0.0), (9, 10, 3, "view", 2.0)])
        ).take_all()
        assert rows[0]["state"] == "live" and rows[0]["value_c"] == 200

    def test_partition_invariance(self, ray_session):
        ops = [
            (i, (i * 37) % 11, (i % 5), ["view", "error"][i % 3 == 0], float(i))
            for i in range(60)
        ]
        a = sorted(
            tuple(r.values())
            for r in relational.cdc_merge(self._ds(ops)).take_all()
        )
        b = sorted(
            tuple(r.values())
            for r in relational.cdc_merge(
                self._ds(ops).repartition(17)
            ).take_all()
        )
        assert a == b


class TestOrderCube:
    def test_grouping_sets_consistent(self, ray_session):
        orders = _rd(
            "orders", ["o_orderdate", "o_orderpriority", "o_totalprice"]
        )
        rows = relational.order_cube(orders).take_all()
        by_lvl = {}
        for r in rows:
            by_lvl.setdefault(r["lvl"], []).append(r)
        # every marginal equals the sum of its finest slice
        grand = by_lvl[3][0]
        assert sum(r["rev_c"] for r in by_lvl[0]) == grand["rev_c"]
        assert sum(r["rev_c"] for r in by_lvl[1]) == grand["rev_c"]
        assert sum(r["rev_c"] for r in by_lvl[2]) == grand["rev_c"]
        assert sum(r["n_orders"] for r in by_lvl[0]) == grand["n_orders"]
        for m in by_lvl[2]:  # priority marginals: the set ROLLUP lacks
            assert m["rev_c"] == sum(
                r["rev_c"]
                for r in by_lvl[0]
                if r["o_orderpriority"] == m["o_orderpriority"]
            )


class TestPartitionChecksums:
    def test_detects_single_row_change(self, ray_session):
        base = pa.Table.from_pydict(
            {
                "doc_id": pa.array(list(range(40)), type=pa.int64()),
                "text": pa.array([f"doc {i}" for i in range(40)]),
            }
        )
        changed = base.set_column(
            1, "text", pa.array(
                [("DOC 7" if i == 7 else f"doc {i}") for i in range(40)]
            )
        )
        a = {
            r["part"]: r
            for r in curate.partition_checksums(
                ray.data.from_arrow(base).repartition(5), n_parts=8
            ).take_all()
        }
        b = {
            r["part"]: r
            for r in curate.partition_checksums(
                ray.data.from_arrow(changed).repartition(3), n_parts=8
            ).take_all()
        }
        assert set(a) == set(b) == set(range(8))
        diff = [p for p in a if tuple(a[p].values()) != tuple(b[p].values())]
        assert diff == [7 % 8]
        assert all(a[p]["n_rows"] == 5 for p in a)

    def test_partition_invariance(self, ray_session):
        docs = _rd("documents", ["doc_id", "text"])
        a = sorted(
            tuple(r.values())
            for r in curate.partition_checksums(docs).take_all()
        )
        b = sorted(
            tuple(r.values())
            for r in curate.partition_checksums(
                docs.repartition(13)
            ).take_all()
        )
        assert a == b
