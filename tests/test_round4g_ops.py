"""Round-4 batch-10 ops: shared multi-rank exact selection
(``select_ranks``) and the balanced range-partitioning plan built on it.
Oracle parity runs in test_entry_parity; these pin the numpy-replay
invariants and the tie/refinement edge cases."""

import numpy as np
import pyarrow as pa
import ray.data

from tableextraction_ray.functions import sketch

SF_DIR = "/root/testdata/sf0.001"


def _vals(v):
    return (
        ray.data.from_arrow(
            pa.Table.from_pydict({"v": pa.array(v, type=pa.int64())})
        )
        .repartition(4)
        .materialize()
    )


class TestSelectRanks:
    def test_multiple_ranks_match_numpy_sort(self, ray_session):
        rng = np.random.RandomState(11)
        v = [int(x) for x in rng.randint(-10_000_000, 10_000_000, size=500)]
        s = np.sort(np.array(v))
        ranks = {"p10": 50, "p50": 250, "p99": 495, "max": 500, "min": 1}
        got = sketch.select_ranks(_vals(v), ranks, min(v), max(v))
        assert got == {k: int(s[r - 1]) for k, r in ranks.items()}

    def test_every_rank_of_a_small_set(self, ray_session):
        vals = _vals([5, 1, 9, 1, 7])
        for r, want in enumerate([1, 1, 5, 7, 9], start=1):
            assert sketch.select_ranks(vals, {0: r}, 1, 9) == {0: want}, r

    def test_narrow_bins_force_refinement_passes(self, ray_session):
        rng = np.random.RandomState(5)
        v = [int(x) for x in rng.randint(0, 1 << 40, size=300)]
        got = sketch.select_ranks(
            _vals(v), {"m": 150, "q": 75}, min(v), max(v),
            bins=2, pull_limit=5, max_iters=64,
        )
        s = np.sort(np.array(v))
        assert got == {"m": int(s[149]), "q": int(s[74])}


class TestRangePartitionPlan:
    def _events(self, values):
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {"value": pa.array(values, type=pa.float64())}
            )
        ).repartition(3)

    def _replay(self, values, n_parts=8):
        c = np.floor(np.array(values) * 100 + 0.5).astype(np.int64)
        s = np.sort(c)
        n = len(s)
        bounds = np.array(
            [
                s[(i * n + n_parts - 1) // n_parts - 1]
                for i in range(1, n_parts)
            ],
            dtype=np.int64,
        )
        counts = np.bincount(
            np.searchsorted(bounds, c, side="left"), minlength=n_parts
        )
        return bounds, counts

    def test_matches_numpy_replay(self, ray_session):
        rng = np.random.RandomState(17)
        values = [round(float(x), 2) for x in rng.uniform(0, 5000, size=700)]
        rows = sorted(
            sketch.range_partition_plan(self._events(values)).take_all(),
            key=lambda r: r["part"],
        )
        bounds, counts = self._replay(values)
        assert [r["part"] for r in rows] == list(range(1, 9))
        assert [r["hi_c"] for r in rows] == [int(b) for b in bounds] + [None]
        assert [r["n_rows"] for r in rows] == [int(c) for c in counts]
        assert sum(r["n_rows"] for r in rows) == len(values)

    def test_heavy_ties_collapse_parts(self, ray_session):
        # one dominant value: several boundaries coincide; the tied mass
        # lands in the LOWEST part whose hi_c equals it, later equal
        # parts come out empty — the skew the plan exists to reveal.
        values = [1.0] * 90 + [2.0] * 5 + [3.0] * 5
        rows = sorted(
            sketch.range_partition_plan(self._events(values)).take_all(),
            key=lambda r: r["part"],
        )
        bounds, counts = self._replay(values)
        assert [r["hi_c"] for r in rows] == [int(b) for b in bounds] + [None]
        assert [r["n_rows"] for r in rows] == [int(c) for c in counts]
        assert rows[0]["n_rows"] == 90
        assert {r["n_rows"] for r in rows[1:7]} <= {0, 5}

    def test_empty_input(self, ray_session):
        assert sketch.range_partition_plan(self._events([])).count() == 0
