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
