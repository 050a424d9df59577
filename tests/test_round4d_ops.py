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
