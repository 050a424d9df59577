"""keyed_sum: the sort + run-length keyed fold must equal
groupby().aggregate(Sum) bit-for-bit, including on skewed inputs whose
hot key spans multiple sort blocks."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data
from ray.data.aggregate import Sum

from tableextraction_ray.functions.exchange import keyed_sum


def _ref(ds, keys, value):
    df = (
        ds.groupby(keys)
        .aggregate(Sum(value, alias_name=value))
        .to_pandas()
    )
    cols = ([keys] if isinstance(keys, str) else list(keys)) + [value]
    return df[cols].sort_values(cols[:-1]).reset_index(drop=True)


def _got(ds, keys, value):
    df = keyed_sum(ds, keys, value).to_pandas()
    cols = ([keys] if isinstance(keys, str) else list(keys)) + [value]
    return df[cols].sort_values(cols[:-1]).reset_index(drop=True)


class TestKeyedSum:
    def test_two_key_skewed_matches_groupby(self, ray_session):
        rng = np.random.default_rng(3)
        n = 60_000
        a = rng.integers(0, 300, n).astype(np.int64)
        b = rng.integers(0, 300, n).astype(np.int64)
        a[: n // 3] = 7  # hot key spanning many sort blocks
        b[: n // 3] = 9
        v = rng.integers(-5, 50, n).astype(np.int64)
        ds = ray.data.from_arrow(
            pa.table({"x": a, "y": b, "v": v})
        ).repartition(16)
        assert _ref(ds, ["x", "y"], "v").equals(_got(ds, ["x", "y"], "v"))

    def test_single_key_matches_groupby(self, ray_session):
        rng = np.random.default_rng(4)
        n = 20_000
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "k": rng.integers(0, 50, n).astype(np.int64),
                    "v": rng.integers(0, 9, n).astype(np.int64),
                }
            )
        ).repartition(8)
        assert _ref(ds, "k", "v").equals(_got(ds, "k", "v"))

    def test_empty_and_single_row(self, ray_session):
        e = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array([], type=pa.int64()),
                    "v": pa.array([], type=pa.int64()),
                }
            )
        )
        assert keyed_sum(e, "k", "v").count() == 0
        o = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array([5], type=pa.int64()),
                    "v": pa.array([3], type=pa.int64()),
                }
            )
        )
        assert keyed_sum(o, "k", "v").take_all() == [{"k": 5, "v": 3}]

    def test_min_max_fold_matches_groupby(self, ray_session):
        from ray.data.aggregate import Max, Min

        from tableextraction_ray.functions.exchange import keyed_fold

        rng = np.random.default_rng(9)
        n = 30_000
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "k": rng.integers(0, 2000, n).astype(np.int64),
                    "a": rng.integers(-100, 100, n).astype(np.int64),
                    "b": rng.integers(0, 10**9, n).astype(np.int64),
                }
            )
        ).repartition(8)
        ref = (
            ds.groupby("k")
            .aggregate(
                Sum("a", alias_name="a"),
                Min("b", alias_name="b_min"),
                Max("b", alias_name="b_max"),
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        import pandas as pd

        got = keyed_fold(
            ds.map_batches(
                lambda t: t.append_column("b_min", t["b"]).append_column(
                    "b_max", t["b"]
                ),
                batch_format="pyarrow",
            ),
            "k",
            [("a", "sum"), ("b_min", "min"), ("b_max", "max")],
        ).to_pandas()
        got = (
            got[["k", "a", "b_min", "b_max"]]
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert ref[["k", "a", "b_min", "b_max"]].equals(got)

    def test_string_keys(self, ray_session):
        rng = np.random.default_rng(11)
        n = 20_000
        ks = [f"key_{i:04d}" for i in rng.integers(0, 500, n)]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array(ks, type=pa.string()),
                    "v": pa.array(
                        rng.integers(0, 7, n).astype(np.int64)
                    ),
                }
            )
        ).repartition(8)
        assert _ref(ds, "k", "v").equals(_got(ds, "k", "v"))

    def test_all_rows_one_key(self, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array([1] * 5000, type=pa.int64()),
                    "v": pa.array(list(range(5000)), type=pa.int64()),
                }
            )
        ).repartition(8)
        assert keyed_sum(ds, "k", "v").take_all() == [
            {"k": 1, "v": sum(range(5000))}
        ]

    def test_or_fold_matches_driver_or(self, ray_session):
        from tableextraction_ray.functions.exchange import keyed_fold

        rng = np.random.default_rng(5)
        n = 20_000
        k = rng.integers(0, 800, n).astype(np.int64)
        v = (np.int64(1) << rng.integers(0, 8, n).astype(np.int64))
        ds = ray.data.from_arrow(pa.table({"k": k, "v": v})).repartition(8)
        got = {
            r["k"]: r["v"]
            for r in keyed_fold(ds, "k", [("v", "or")]).take_all()
        }
        ref: dict[int, int] = {}
        for kk, vv in zip(k.tolist(), v.tolist()):
            ref[kk] = ref.get(kk, 0) | vv
        assert got == ref


class TestGlobalRowNumber:
    def test_matches_enumerate_and_partitioning(self, ray_session):
        from tableextraction_ray.functions.exchange import global_row_number

        rows = [
            {"doc_id": i, "v": (i * 31) % 7} for i in range(200)
        ]
        want = {
            d: r
            for r, (v, d) in enumerate(
                sorted((row["v"], row["doc_id"]) for row in rows)
            )
        }
        for nparts in (1, 9):
            ds = ray.data.from_items(rows).repartition(nparts)
            got = {
                r["doc_id"]: r["r"]
                for r in global_row_number(ds, ["v", "doc_id"]).take_all()
            }
            assert got == want, nparts

    def test_string_keys(self, ray_session):
        from tableextraction_ray.functions.exchange import global_row_number

        rows = [{"doc_id": i, "s": f"k{i % 5}"} for i in range(40)]
        want = {
            d: r
            for r, (s, d) in enumerate(
                sorted((row["s"], row["doc_id"]) for row in rows)
            )
        }
        got = {
            r["doc_id"]: r["r"]
            for r in global_row_number(
                ray.data.from_items(rows).repartition(6), ["s", "doc_id"]
            ).take_all()
        }
        assert got == want

    def test_empty(self, ray_session):
        from tableextraction_ray.functions.exchange import global_row_number

        ds = ray.data.from_items([{"doc_id": 1, "v": 2}]).filter(
            lambda r: False
        )
        assert global_row_number(ds, ["v", "doc_id"]).count() == 0
