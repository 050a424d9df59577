"""Round-5 engine ops: as-of join, Kneser-Ney bigrams, media span
context, stratified split, Hill tail index, Matryoshka truncation.
Parity vs the DuckDB oracles is covered by test_entry_parity; these pin
the semantic invariants the oracles can't see (tie-breaks, drops,
determinism under repartitioning, hand-computed fixtures)."""

import datetime
import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from tableextraction_ray.functions.interleaved import media_span_context
from tableextraction_ray.functions.relational import event_last_order
from tableextraction_ray.functions.selection import stratified_split
from tableextraction_ray.functions.similarity import matryoshka_error
from tableextraction_ray.functions.sketch import hill_tail_index
from tableextraction_ray.functions.textstats import kneser_ney_bigram


def _ts(day: int, hour: int = 0):
    return datetime.datetime(2024, 1, day, hour)


def _events(rows):
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "event_id": pa.array(
                    [r[0] for r in rows], type=pa.int64()
                ),
                "ts": pa.array(
                    [r[1] for r in rows], type=pa.timestamp("us")
                ),
                "user_id": pa.array(
                    [r[2] for r in rows], type=pa.int64()
                ),
            }
        )
    )


def _orders(rows):
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "o_orderkey": pa.array(
                    [r[0] for r in rows], type=pa.int64()
                ),
                "o_custkey": pa.array(
                    [r[1] for r in rows], type=pa.int64()
                ),
                "o_orderdate": pa.array(
                    [r[2] for r in rows], type=pa.timestamp("us")
                ),
            }
        )
    )


class TestEventLastOrder:
    def test_asof_pick_and_drop(self, ray_session):
        ev = _events(
            [
                (1, _ts(10), 7),  # after both orders -> latest (day 5)
                (2, _ts(3), 7),  # after day-1 order only
                (3, _ts(1), 8),  # user 8 has no order at all -> drop
            ]
        )
        od = _orders([(100, 7, _ts(1)), (200, 7, _ts(5))])
        got = {
            r["event_id"]: (r["last_orderkey"], r["recency_us"])
            for r in event_last_order(ev, od).take_all()
        }
        day_us = 86_400_000_000
        assert got == {
            1: (200, 5 * day_us),
            2: (100, 2 * day_us),
        }

    def test_same_date_tie_breaks_to_max_orderkey(self, ray_session):
        ev = _events([(1, _ts(2), 7)])
        od = _orders([(100, 7, _ts(1)), (300, 7, _ts(1)), (200, 7, _ts(1))])
        (row,) = event_last_order(ev, od).take_all()
        assert row["last_orderkey"] == 300

    def test_event_at_order_instant_matches(self, ray_session):
        ev = _events([(1, _ts(5), 7)])
        od = _orders([(100, 7, _ts(5))])
        (row,) = event_last_order(ev, od).take_all()
        assert row["last_orderkey"] == 100 and row["recency_us"] == 0

    def test_partition_invariance(self, ray_session):
        ev = _events(
            [(i, _ts(1 + i % 20, i % 24), 7 + i % 3) for i in range(60)]
        )
        od = _orders(
            [(1000 + i, 7 + i % 3, _ts(1 + (i * 7) % 15)) for i in range(12)]
        )
        a = sorted(
            map(tuple, (r.values() for r in event_last_order(ev, od).take_all()))
        )
        b = sorted(
            map(
                tuple,
                (
                    r.values()
                    for r in event_last_order(
                        ev.repartition(7), od.repartition(5)
                    ).take_all()
                ),
            )
        )
        assert a == b and len(a) > 0


    def test_carry_through_orderless_blocks(self, ray_session):
        # one user: both orders at the start, a long run of later events;
        # many tiny partitions force the order state to carry across
        # several blocks that contain no order rows at all.
        ev = _events([(i, _ts(5 + i % 20, i % 24), 7) for i in range(60)])
        od = _orders([(100, 7, _ts(1)), (200, 7, _ts(2))])
        rows = event_last_order(
            ev.repartition(12), od.repartition(2)
        ).take_all()
        assert len(rows) == 60
        assert all(r["last_orderkey"] == 200 for r in rows)

class TestKneserNeyBigram:
    def _docs(self, texts):
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array(
                        list(range(len(texts))), type=pa.int64()
                    ),
                    "text": pa.array(texts, type=pa.string()),
                }
            )
        )

    def test_hand_computed(self, ray_session):
        # bigrams: (a b) x2, (b a) x1, (b c) x1  -> T = 3 types
        ds = self._docs(["a b a b c"])
        rows = {
            (r["w1"], r["w2"]): r for r in kneser_ney_bigram(ds).take_all()
        }
        ab = rows[("a", "b")]
        assert ab["c12"] == 2
        assert ab["c1"] == 2  # bigrams starting with a
        assert ab["r1"] == 1  # a is followed only by b
        # left contexts of b: {a} -> l2 == 1
        assert ab["l2"] == 1
        assert ab["t_types"] == 3
        # p = ((4*2-3)*3 + 3*1*1) / (4*2*3) = (15+3)/24 = 0.75
        assert ab["p_fp9"] == 750_000_000

    def test_probability_below_one_and_positive(self, ray_session):
        ds = self._docs(["x y z x y", "y z y z", "x x x"])
        for r in kneser_ney_bigram(ds).take_all():
            assert 0 < r["p_fp9"] <= 10**9

    def test_doc_boundaries_break_bigrams(self, ray_session):
        one = self._docs(["a b"])
        two = self._docs(["a", "b"])
        assert len(kneser_ney_bigram(one).take_all()) == 1
        assert len(kneser_ney_bigram(two).take_all()) == 0

    def test_partition_invariance(self, ray_session):
        texts = [f"tok{i % 5} tok{(i + 1) % 4} tok{i % 3}" for i in range(40)]
        a = sorted(
            map(tuple, (r.values() for r in kneser_ney_bigram(self._docs(texts)).take_all()))
        )
        b = sorted(
            map(
                tuple,
                (
                    r.values()
                    for r in kneser_ney_bigram(
                        self._docs(texts).repartition(8)
                    ).take_all()
                ),
            )
        )
        assert a == b


class TestMediaSpanContext:
    def _ds(self, spans_per_doc):
        def span(off, kind, text="", ref=""):
            return {
                "kind": kind,
                "text": text,
                "media_ref": ref,
                "offset": off,
            }

        tables = []
        for i, spec in enumerate(spans_per_doc):
            tables.append(
                {
                    "doc_id": f"d{i}",
                    "spans": [span(*s) for s in spec],
                }
            )
        t = pa.Table.from_pylist(tables)
        return ray.data.from_arrow(t)

    def test_head_middle_tail(self, ray_session):
        ds = self._ds(
            [
                [
                    (0, "media", "", "m0"),  # head: no prev
                    (1, "text", "alpha"),
                    (2, "media", "", "m1"),  # middle
                    (3, "text", "beta"),
                    (4, "media", "", "m2"),  # tail: no next
                ]
            ]
        )
        rows = {r["media_ref"]: r for r in media_span_context(ds).take_all()}
        assert rows["m0"]["prev_text"] == "" and rows["m0"]["next_text"] == "alpha"
        assert rows["m1"]["prev_text"] == "alpha" and rows["m1"]["next_text"] == "beta"
        assert rows["m2"]["prev_text"] == "beta" and rows["m2"]["next_text"] == ""

    def test_adjacent_media_share_context(self, ray_session):
        ds = self._ds(
            [
                [
                    (0, "text", "pre"),
                    (1, "media", "", "a"),
                    (2, "media", "", "b"),
                    (3, "text", "post"),
                ]
            ]
        )
        rows = {r["media_ref"]: r for r in media_span_context(ds).take_all()}
        for ref in ("a", "b"):
            assert rows[ref]["prev_text"] == "pre"
            assert rows[ref]["next_text"] == "post"

    def test_no_cross_doc_leak(self, ray_session):
        ds = self._ds(
            [
                [(0, "text", "only-doc0")],
                [(0, "media", "", "m")],
            ]
        )
        (row,) = media_span_context(ds).take_all()
        assert row["prev_text"] == "" and row["next_text"] == ""

    def test_text_only_doc_emits_nothing(self, ray_session):
        ds = self._ds([[(0, "text", "t")]])
        assert media_span_context(ds).take_all() == []


class TestStratifiedSplit:
    def test_partitions_and_totals(self, ray_session):
        ds = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "source", "n_chars"],
        )
        rows = stratified_split(ds).take_all()
        t = pa.parquet.read_table(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "n_chars"],
        )
        assert sum(r["n_docs"] for r in rows) == t.num_rows
        assert sum(r["n_chars"] for r in rows) == sum(
            t["n_chars"].to_pylist()
        )
        assert {r["split"] for r in rows} <= {"train", "val", "test"}

    def test_deterministic_under_repartition(self, ray_session):
        ds = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "source", "n_chars"],
        )
        a = sorted(map(tuple, (r.values() for r in stratified_split(ds).take_all())))
        b = sorted(
            map(
                tuple,
                (
                    r.values()
                    for r in stratified_split(ds.repartition(9)).take_all()
                ),
            )
        )
        assert a == b


class TestHillTailIndex:
    def test_hand_computed_small_k(self, ray_session):
        vals = [100.0, 50.0, 20.0, 10.0, 1.0]
        ds = ray.data.from_arrow(
            pa.Table.from_pydict(
                {"value": pa.array(vals, type=pa.float64())}
            )
        )
        (row,) = hill_tail_index(ds, k=3).take_all()
        cents = sorted((int(v * 100) for v in vals), reverse=True)
        xk1 = cents[3]
        want = sum(
            int(math.floor(math.log(c / xk1) * 1e9)) for c in cents[:3]
        )
        assert row["k_used"] == 3
        assert row["xk1_c"] == xk1
        assert row["sum_lnr_fp9"] == want
        assert row["hill_inv_fp9"] == want // 3

    def test_fewer_rows_than_k(self, ray_session):
        ds = ray.data.from_arrow(
            pa.Table.from_pydict(
                {"value": pa.array([5.0, 3.0], type=pa.float64())}
            )
        )
        (row,) = hill_tail_index(ds, k=100).take_all()
        assert row["k_used"] == 1
        assert row["xk1_c"] == 300

    def test_partition_invariance(self, ray_session):
        vals = [float((i * 37) % 991 + 1) for i in range(500)]
        ds = ray.data.from_arrow(
            pa.Table.from_pydict({"value": pa.array(vals, type=pa.float64())})
        )
        a = hill_tail_index(ds, k=50).take_all()
        b = hill_tail_index(ds.repartition(11), k=50).take_all()
        assert a == b


class TestMatryoshkaError:
    def _ds(self, vecs):
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "vec_id": pa.array(
                        list(range(len(vecs))), type=pa.int64()
                    ),
                    "embedding": pa.array(
                        vecs, type=pa.list_(pa.float32())
                    ),
                }
            )
        )

    def test_full_prefix_keeps_everything(self, ray_session):
        ds = self._ds([[0.5, -0.25, 0.125, 1.0]])
        (row,) = matryoshka_error(ds, prefix_dim=4).take_all()
        assert row["keep_ratio_fp6"] == 1_000_000

    def test_energy_in_prefix(self, ray_session):
        # 3-4-5 triangle: prefix holds 3/5 of the norm
        ds = self._ds([[3.0, 4.0]])
        (row,) = matryoshka_error(ds, prefix_dim=1).take_all()
        assert row["keep_ratio_fp6"] == 600_000

    def test_zero_vector_skipped(self, ray_session):
        ds = self._ds([[0.0, 0.0], [1.0, 0.0]])
        rows = matryoshka_error(ds, prefix_dim=1).take_all()
        assert [r["vec_id"] for r in rows] == [1]
        assert rows[0]["keep_ratio_fp6"] == 1_000_000


class TestDupNgramCoverage:
    def _docs(self, texts):
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array(
                        list(range(len(texts))), type=pa.int64()
                    ),
                    "text": pa.array(texts, type=pa.string()),
                }
            )
        )

    def test_shared_window_counts(self, ray_session):
        from tableextraction_ray.functions.dedup import dup_ngram_coverage

        w10 = " ".join(f"t{i}" for i in range(10))
        a = w10 + " xa xb xc"  # 4 windows, 1 shared
        b = w10 + " ya yb"  # 3 windows, 1 shared
        c = "za " * 9  # 9 tokens < 10 -> emits nothing
        rows = {
            r["doc_id"]: r
            for r in dup_ngram_coverage(self._docs([a, b, c])).take_all()
        }
        assert set(rows) == {0, 1}
        assert rows[0]["n_windows"] == 4 and rows[0]["n_dup_windows"] == 1
        assert rows[1]["n_windows"] == 3 and rows[1]["n_dup_windows"] == 1
        assert rows[0]["dup_ppm"] == 1_000_000 // 4

    def test_intra_doc_repeat_not_dup(self, ray_session):
        from tableextraction_ray.functions.dedup import dup_ngram_coverage

        # the same window twice INSIDE one doc, nowhere else -> not dup
        t = " ".join(f"t{i % 10}" for i in range(20))
        (row,) = dup_ngram_coverage(self._docs([t])).take_all()
        assert row["n_dup_windows"] == 0 and row["n_windows"] == 11

    def test_partition_invariance(self, ray_session):
        from tableextraction_ray.functions.dedup import dup_ngram_coverage

        texts = [
            " ".join(f"w{(i * j) % 13}" for j in range(15)) for i in range(30)
        ]
        ds = self._docs(texts)
        a = sorted(
            map(tuple, (r.values() for r in dup_ngram_coverage(ds).take_all()))
        )
        b = sorted(
            map(
                tuple,
                (
                    r.values()
                    for r in dup_ngram_coverage(ds.repartition(7)).take_all()
                ),
            )
        )
        assert a == b and len(a) == 30


class TestCodeDetect:
    def _one(self, ray_session, text):
        from tableextraction_ray.functions.textstats import code_detect

        ds = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array([0], type=pa.int64()),
                    "text": pa.array([text], type=pa.string()),
                }
            )
        )
        (row,) = code_detect(ds).take_all()
        return row

    def test_prose_not_code(self, ray_session):
        row = self._one(
            ray_session,
            "The quick brown fox jumps over the lazy dog near the bank",
        )
        assert not row["looks_code"] and row["sym_chars"] == 0

    def test_symbol_density_triggers(self, ray_session):
        row = self._one(ray_session, "x=(a+b)*c; y={d|e}&f;")
        assert row["looks_code"] and row["sym_chars"] * 20 > row["n_chars_t"]

    def test_indent_share_triggers(self, ray_session):
        text = "def f\n    a\n    b\n\tc\nplain text line here okay\n" * 1
        row = self._one(ray_session, text)
        assert row["indent_lines"] == 3
        assert row["n_lines"] == 6  # trailing newline -> empty last line
        assert row["looks_code"]  # 3*4 > 6

    def test_counts_match_python(self, ray_session):
        import re

        from tableextraction_ray.functions.textstats import CODE_SYM_RE

        text = "a[i] = b{j} # 50% faster\n\treturn a-b"
        row = self._one(ray_session, text)
        assert row["sym_chars"] == len(re.findall(CODE_SYM_RE, text))
        assert row["n_lines"] == len(text.split("\n"))


class TestLanceSourceGate:
    def test_gate_is_import_only(self, ray_session):
        """The Lance source must fail ONLY on the missing wheel, with the
        documented one-line swap in the message — not on anything in our
        own plumbing (north-rule storage format, BASELINE.md note)."""
        from tableextraction_ray.sources import read_documents_lance

        try:
            import lance  # noqa: F401

            have = True
        except ImportError:
            have = False
        if have:  # pragma: no cover - sandbox has no lance wheel
            pytest.skip("lance present; gate not exercisable")
        with pytest.raises(NotImplementedError, match="read_lance"):
            read_documents_lance("/tmp/nonexistent.lance")


class TestHardNegatives:
    def _ds(self, vecs, labels):
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "vec_id": pa.array(
                        list(range(len(vecs))), type=pa.int64()
                    ),
                    "embedding": pa.array(
                        vecs, type=pa.list_(pa.float32())
                    ),
                    "label": pa.array(labels, type=pa.int32()),
                }
            )
        )

    def test_same_label_excluded(self, ray_session):
        from tableextraction_ray.functions.similarity import hard_negatives

        # query 0 (label 0): vec 1 is identical but same label -> excluded;
        # vec 2 (other label) must be the top negative.
        vecs = [[1.0, 0.0], [1.0, 0.0], [0.9, 0.1], [-1.0, 0.0]]
        labels = [0, 0, 1, 1]
        rows = hard_negatives(
            self._ds(vecs, labels), n_queries=1, k=2
        ).take_all()
        got = [(r["vec_id"]) for r in rows]
        assert got == [2, 3]
        assert all(r["query_id"] == 0 for r in rows)

    def test_partition_invariance(self, ray_session):
        from tableextraction_ray.functions.similarity import hard_negatives

        rng = np.random.RandomState(5)
        vecs = rng.randn(64, 8).astype(np.float32).tolist()
        labels = [i % 3 for i in range(64)]
        ds = self._ds(vecs, labels)
        a = sorted(
            map(
                tuple,
                (
                    r.values()
                    for r in hard_negatives(ds, n_queries=4, k=5).take_all()
                ),
            )
        )
        b = sorted(
            map(
                tuple,
                (
                    r.values()
                    for r in hard_negatives(
                        ds.repartition(9), n_queries=4, k=5
                    ).take_all()
                ),
            )
        )
        assert a == b and len(a) == 20


class TestCaptionTokenAudit:
    def test_side_selection(self, ray_session):
        from tableextraction_ray.functions.interleaved import (
            caption_token_audit,
        )

        t = pa.Table.from_pylist(
            [
                {
                    "doc_id": "d0",
                    "spans": [
                        {"kind": "text", "text": "one two three",
                         "media_ref": "", "offset": 0},
                        {"kind": "media", "text": "", "media_ref": "m1",
                         "offset": 1},
                        {"kind": "text", "text": "four",
                         "media_ref": "", "offset": 2},
                        {"kind": "media", "text": "", "media_ref": "m2",
                         "offset": 3},
                    ],
                },
                {
                    "doc_id": "d1",
                    "spans": [
                        {"kind": "media", "text": "", "media_ref": "m3",
                         "offset": 0}
                    ],
                },
            ]
        )
        rows = {
            r["media_ref"]: r
            for r in caption_token_audit(ray.data.from_arrow(t)).take_all()
        }
        m1 = rows["m1"]
        assert (m1["prev_tokens"], m1["next_tokens"]) == (3, 1)
        assert m1["chosen"] == "prev" and m1["chosen_tokens"] == 3
        m2 = rows["m2"]
        assert (m2["prev_tokens"], m2["next_tokens"]) == (1, 0)
        assert m2["chosen"] == "prev"
        m3 = rows["m3"]
        assert m3["chosen"] == "none" and m3["chosen_tokens"] == 0

    def test_tie_goes_prev(self, ray_session):
        from tableextraction_ray.functions.interleaved import (
            caption_token_audit,
        )

        t = pa.Table.from_pylist(
            [
                {
                    "doc_id": "d0",
                    "spans": [
                        {"kind": "text", "text": "a b", "media_ref": "",
                         "offset": 0},
                        {"kind": "media", "text": "", "media_ref": "m",
                         "offset": 1},
                        {"kind": "text", "text": "c d", "media_ref": "",
                         "offset": 2},
                    ],
                }
            ]
        )
        (row,) = caption_token_audit(ray.data.from_arrow(t)).take_all()
        assert row["chosen"] == "prev" and row["chosen_tokens"] == 2
