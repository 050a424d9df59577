"""Round-4 batch-4 ops: TPC-H Q6/Q12/Q19 shapes. Oracle parity runs in
test_entry_parity; these pin what the oracle can't see — the guarded
broadcast==shuffle equality for bracket_revenue, empty-window safety for
the streaming Q6 fold, and the class-bit discipline of the Q12 shape."""

import pyarrow as pa
import pytest
import ray.data

from tableextraction_ray.functions import relational

SF_DIR = "/root/testdata/sf0.001"


def _rd(t, cols):
    return ray.data.read_parquet(f"{SF_DIR}/{t}.parquet", columns=cols)


class TestForecastRevenue:
    def test_empty_window_returns_zero_row(self, ray_session):
        li = _rd(
            "lineitem",
            ["l_shipdate", "l_quantity", "l_discount", "l_extendedprice"],
        )
        rows = relational.forecast_revenue(li, year=1921).take_all()
        assert rows == [{"n_items": 0, "rev_cc": 0}]

    def test_wide_filter_equals_manual_sum(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        li = _rd(
            "lineitem",
            ["l_shipdate", "l_quantity", "l_discount", "l_extendedprice"],
        )
        got = relational.forecast_revenue(
            li, year=1996, disc_lo_pct=0, disc_hi_pct=100, max_qty=10**9
        ).take_all()[0]
        t = pq.read_table(f"{SF_DIR}/lineitem.parquet")
        ship = t["l_shipdate"].cast(pa.int64()).to_numpy()
        lo = np.datetime64("1996-01-01", "us").astype(np.int64)
        hi = np.datetime64("1997-01-01", "us").astype(np.int64)
        keep = (ship >= lo) & (ship < hi)
        price_c = np.floor(
            t["l_extendedprice"].to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        disc = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(
            np.int64
        )
        assert got["n_items"] == int(keep.sum())
        assert got["rev_cc"] == int(np.sum(price_c[keep] * disc[keep]))


class TestPriorityLineShare:
    def test_partition_of_late_lines(self, ray_session):
        """high+low per year must equal the priority-blind late count."""
        li = _rd("lineitem", ["l_orderkey", "l_shipdate"])
        orders = _rd(
            "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
        )
        rows = relational.priority_line_share(li, orders).take_all()
        assert rows, "late window must be non-vacuous on the fixture"
        # recompute priority-blind: force every order high via late_days
        # identity — instead check totals against a direct pandas fold
        import pandas as pd
        import pyarrow.parquet as pq

        l = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pandas()
        o = pq.read_table(f"{SF_DIR}/orders.parquet").to_pandas()
        j = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        ship_us = j["l_shipdate"].astype("datetime64[us]").astype("int64")
        order_us = j["o_orderdate"].astype("datetime64[us]").astype("int64")
        late = j[ship_us > order_us + 30 * 86_400_000_000]
        per_year = late.groupby(late["l_shipdate"].dt.year).size()
        got = {r["ship_year"]: r["high_lines"] + r["low_lines"] for r in rows}
        assert got == {int(y): int(n) for y, n in per_year.items()}


class TestBracketRevenue:
    @pytest.fixture()
    def tables(self, ray_session):
        return dict(
            lineitem=_rd(
                "lineitem",
                ["l_partkey", "l_quantity", "l_discount", "l_extendedprice"],
            ),
            part=_rd("part", ["p_partkey", "p_brand", "p_size"]),
        )

    def _canon(self, ds):
        return sorted(
            (r["bracket"], r["n_items"], r["rev_cc"]) for r in ds.take_all()
        )

    # The production BRACKETS are tuned for sf>=0.01 selectivity; at the
    # sf0.001 fixture brackets 1-2 are vacuous, so the behavior tests pin
    # wide windows that populate all three on 200 parts.
    WIDE = (
        (1, "Brand#12", 1, 50, 1, 50),
        (2, "Brand#23", 1, 50, 1, 50),
        (3, "Brand#4", 1, 50, 1, 50),
    )

    def test_shuffle_fallback_matches_broadcast(self, tables, monkeypatch):
        monkeypatch.setattr(relational, "BRACKETS", self.WIDE)
        broadcast = self._canon(relational.bracket_revenue(**tables))
        shuffled = self._canon(
            relational.bracket_revenue(**tables, broadcast_limit=0)
        )
        assert broadcast == shuffled
        assert [b for b, _, _ in broadcast] == [1, 2, 3]

    def test_qty_windows_exclude_out_of_range(self, tables, monkeypatch):
        """A bracket with an impossible qty window vanishes (no zero rows)."""
        monkeypatch.setattr(
            relational,
            "BRACKETS",
            ((1, "Brand#12", 1, 50, 999, 999),) + self.WIDE[1:],
        )
        got = self._canon(relational.bracket_revenue(**tables))
        assert [b for b, _, _ in got] == [2, 3]


class TestShippingPriority:
    @pytest.fixture()
    def tables(self, ray_session):
        return dict(
            lineitem=_rd(
                "lineitem",
                ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
            ),
            orders=_rd(
                "orders",
                ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
            ),
            customer=_rd("customer", ["c_custkey", "c_mktsegment"]),
        )

    def _canon(self, ds):
        return [
            (r["o_orderkey"], r["rev_cc"], r["o_date_days"], r["o_prio"])
            for r in ds.take_all()
        ]

    def test_shuffle_fallback_matches_broadcast(self, tables):
        broadcast = self._canon(relational.shipping_priority(**tables))
        shuffled = self._canon(
            relational.shipping_priority(**tables, broadcast_limit=0)
        )
        assert broadcast == shuffled and len(broadcast) == 10

    def test_sorted_desc_and_prio_in_domain(self, tables):
        rows = self._canon(relational.shipping_priority(**tables))
        keys = [(-rev, ok) for ok, rev, _, _ in rows]
        assert keys == sorted(keys)
        assert all(1 <= p <= 5 for _, _, _, p in rows)


class TestTopSupplier:
    def test_returns_single_global_max(self, ray_session):
        li = _rd(
            "lineitem",
            ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        supp = _rd("supplier", ["s_suppkey", "s_name"])
        rows = relational.top_supplier(li, supp).take_all()
        assert len(rows) >= 1 and all(
            r["rev_cc"] == rows[0]["rev_cc"] for r in rows
        )

    def test_empty_window_returns_empty(self, ray_session):
        li = _rd(
            "lineitem",
            ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        supp = _rd("supplier", ["s_suppkey", "s_name"])
        rows = relational.top_supplier(
            li, supp, start="1921-01-01", end="1921-02-01"
        ).take_all()
        assert rows == []

    def test_all_ties_returned(self, ray_session):
        li = ray.data.from_arrow(
            pa.table(
                {
                    "l_suppkey": pa.array([1, 2, 3], type=pa.int64()),
                    "l_shipdate": pa.array(
                        [852076800000000] * 3, type=pa.timestamp("us")
                    ),
                    "l_extendedprice": [10.0, 10.0, 5.0],
                    "l_discount": [0.0, 0.0, 0.0],
                }
            )
        )
        supp = ray.data.from_arrow(
            pa.table(
                {
                    "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
                    "s_name": ["a", "b", "c"],
                }
            )
        )
        rows = relational.top_supplier(li, supp).take_all()
        assert [(r["s_suppkey"], r["s_name"]) for r in rows] == [
            (1, "a"),
            (2, "b"),
        ]


class TestSmallQtyRevenue:
    @pytest.fixture()
    def tables(self, ray_session):
        return dict(
            lineitem=_rd(
                "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
            ),
            part=_rd("part", ["p_partkey", "p_brand"]),
        )

    def test_shuffle_fallback_matches_broadcast(self, tables):
        a = relational.small_qty_revenue(**tables).take_all()
        b = relational.small_qty_revenue(
            **tables, broadcast_limit=0
        ).take_all()
        assert a == b and len(a) == 1

    def test_missing_brand_returns_zero_row(self, tables):
        rows = relational.small_qty_revenue(
            **tables, brand="Brand#999"
        ).take_all()
        assert rows == [{"n_items": 0, "price_c_sum": 0}]


class TestNationTradeVolume:
    @pytest.fixture()
    def tables(self, ray_session):
        return dict(
            lineitem=_rd(
                "lineitem",
                [
                    "l_orderkey",
                    "l_suppkey",
                    "l_shipdate",
                    "l_extendedprice",
                    "l_discount",
                ],
            ),
            orders=_rd("orders", ["o_orderkey", "o_custkey"]),
            customer=_rd("customer", ["c_custkey", "c_nationkey"]),
            supplier=_rd("supplier", ["s_suppkey", "s_nationkey"]),
            nation=_rd("nation", ["n_nationkey", "n_name"]),
        )

    def _canon(self, ds):
        return sorted(
            (r["supp_nation"], r["cust_nation"], r["ship_year"], r["rev_cc"])
            for r in ds.take_all()
        )

    def test_shuffle_fallback_matches_broadcast(self, tables):
        broadcast = self._canon(relational.nation_trade_volume(**tables))
        shuffled = self._canon(
            relational.nation_trade_volume(**tables, broadcast_limit=0)
        )
        assert broadcast == shuffled and len(broadcast) > 0

    def test_no_intra_nation_pairs_and_years_in_window(self, tables):
        rows = self._canon(relational.nation_trade_volume(**tables))
        assert all(s != c for s, c, _, _ in rows)
        assert all(y in (1996, 1997) for _, _, y, _ in rows)


class TestLateSupplierBlame:
    def test_blame_counts_on_handmade_orders(self, ray_session):
        import numpy as np

        DAY = 86_400_000_000
        # order 1: two suppliers, only supp 7 late -> blamed
        # order 2: one supplier (late) -> excluded (needs >=2)
        # order 3: two suppliers, both late -> excluded (exactly one)
        # order 4: status 'O' -> excluded
        li = ray.data.from_arrow(
            pa.table(
                {
                    "l_orderkey": pa.array(
                        [1, 1, 2, 3, 3, 4, 4], type=pa.int64()
                    ),
                    "l_suppkey": pa.array(
                        [7, 8, 7, 7, 8, 7, 8], type=pa.int64()
                    ),
                    "l_shipdate": pa.array(
                        np.array(
                            [200, 10, 200, 200, 200, 200, 10], dtype=np.int64
                        )
                        * DAY,
                        type=pa.timestamp("us"),
                    ),
                }
            )
        )
        orders = ray.data.from_arrow(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),
                    "o_orderstatus": ["F", "F", "F", "O"],
                    "o_orderdate": pa.array(
                        np.array([5, 5, 5, 5], dtype=np.int64) * DAY,
                        type=pa.timestamp("us"),
                    ),
                }
            )
        )
        supplier = ray.data.from_arrow(
            pa.table(
                {
                    "s_suppkey": pa.array([7, 8], type=pa.int64()),
                    "s_name": ["lateguy", "ok"],
                }
            )
        )
        rows = relational.late_supplier_blame(li, orders, supplier).take_all()
        assert [(r["s_suppkey"], r["s_name"], r["numwait"]) for r in rows] == [
            (7, "lateguy", 1)
        ]

    def test_fixture_sorted_desc(self, ray_session):
        rows = relational.late_supplier_blame(
            _rd("lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"]),
            _rd("orders", ["o_orderkey", "o_orderstatus", "o_orderdate"]),
            _rd("supplier", ["s_suppkey", "s_name"]),
        ).take_all()
        keys = [(-r["numwait"], r["s_suppkey"]) for r in rows]
        assert keys == sorted(keys) and len(rows) > 0


class TestDormantRichCustomers:
    def test_empty_is_schema_stable(self, ray_session):
        ds = relational.dormant_rich_customers(
            _rd("customer", ["c_custkey", "c_nationkey", "c_acctbal"]),
            _rd("orders", ["o_custkey", "o_orderdate"]),
            cutoff="1990-01-01",  # every customer has a later order
        )
        # Ray's to_pandas drops columns on 0-row datasets; the schema is
        # the stable contract here.
        assert ds.schema().names == ["c_nationkey", "n_cust", "acctbal_c_sum"]
        assert ds.count() == 0

    def test_threshold_is_strict_and_subset_respected(self, ray_session):
        rows = relational.dormant_rich_customers(
            _rd("customer", ["c_custkey", "c_nationkey", "c_acctbal"]),
            _rd("orders", ["o_custkey", "o_orderdate"]),
        ).take_all()
        assert all(r["c_nationkey"] in (1, 3, 5, 7, 9) for r in rows)
        assert len(rows) >= 1
