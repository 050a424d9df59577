"""Interleaved-span operators: hand-computed fixtures over the input_hint
schema (doc_id, spans list<struct<kind,text,media_ref,offset>>) — offset
reordering, cross-document boundaries, unicode lengths, and the media
content-hash dedup contract."""

import pyarrow as pa
import pytest
import ray.data

from tableextraction_ray.functions import interleaved, multimodal
from tableextraction_ray.sources.corpus import _span_type


def _span(kind, text="", ref="", off=0):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


def _docs_ds(rows):
    import ray.data

    tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
            "spans": pa.array([r[1] for r in rows], type=_span_type()),
        }
    )
    return ray.data.from_arrow(tbl)


@pytest.fixture(scope="module")
def spans_ds(ray_session):
    # d1's spans are stored OUT of offset order — operators must sort.
    return _docs_ds(
        [
            (
                "d1",
                [
                    _span("media", ref="m/a.png", off=1),
                    _span("text", text="привет", off=0),
                    _span("text", text="tail x", off=2),
                ],
            ),
            (
                "d2",
                [
                    _span("media", ref="m/b.png", off=0),
                    _span("media", ref="m/c.png", off=1),
                ],
            ),
            ("d3", [_span("text", text="only text", off=0)]),
        ]
    )


class TestSpanStats:
    def test_hand_computed(self, spans_ds):
        rows = {r["doc_id"]: r for r in interleaved.span_stats(spans_ds).take_all()}
        d1 = rows["d1"]
        # offset order: text(привет) -> media -> text(tail x)
        assert (d1["n_spans"], d1["n_text"], d1["n_media"]) == (3, 2, 1)
        assert d1["n_chars"] == len("привет") + len("tail x")  # code points
        assert (d1["n_tm"], d1["n_mt"], d1["n_tt"], d1["n_mm"]) == (1, 1, 0, 0)
        d2 = rows["d2"]
        assert (d2["n_media"], d2["n_mm"], d2["n_chars"]) == (2, 1, 0)
        d3 = rows["d3"]
        assert (d3["n_spans"], d3["n_tt"], d3["n_chars"]) == (1, 0, 9)

    def test_partition_invariance(self, spans_ds):
        one = sorted(
            interleaved.span_stats(spans_ds).take_all(), key=lambda r: r["doc_id"]
        )
        many = sorted(
            interleaved.span_stats(spans_ds.repartition(3)).take_all(),
            key=lambda r: r["doc_id"],
        )
        assert one == many


class TestMediaCaptions:
    def test_caption_rules(self, spans_ds):
        rows = {
            r["media_ref"]: r
            for r in interleaved.media_captions(spans_ds, max_chars=4).take_all()
        }
        # media followed by a text span -> truncated caption (code points)
        assert rows["m/a.png"]["caption"] == "tail"
        assert rows["m/a.png"]["doc_id"] == "d1"
        assert rows["m/a.png"]["span_offset"] == 1
        # media followed by media -> no caption
        assert rows["m/b.png"]["caption"] == ""
        # media as the LAST span of its doc -> no caption (no bleed into
        # the next document in the sorted flat view)
        assert rows["m/c.png"]["caption"] == ""
        assert len(rows) == 3  # one row per media span only

    def test_empty_batch(self, ray_session):
        out = interleaved.media_captions(_docs_ds([("d9", [])])).take_all()
        assert out == []


class TestRenderInterleaved:
    def test_hand_computed(self, spans_ds):
        rows = {
            r["doc_id"]: r for r in interleaved.render_interleaved(spans_ds).take_all()
        }
        assert rows["d1"]["rendered"] == "привет\n[IMG:m/a.png]\ntail x"
        assert rows["d1"]["n_chars"] == len(rows["d1"]["rendered"])
        assert rows["d2"]["rendered"] == "[IMG:m/b.png]\n[IMG:m/c.png]"
        assert rows["d3"]["rendered"] == "only text"


class TestMediaContentDedup:
    def test_canonical_and_copies(self, ray_session):
        import ray.data

        payload_a = b"\x89PNGsame-bytes"
        media = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "media_ref": pa.array(
                        ["m/z.png", "m/a.png", "m/q.png"], type=pa.string()
                    ),
                    "payload": pa.array(
                        [payload_a, payload_a, b"other"], type=pa.large_binary()
                    ),
                }
            )
        )
        rows = {
            r["media_ref"]: r
            for r in multimodal.media_content_dedup(media).take_all()
        }
        assert rows["m/z.png"]["canonical_ref"] == "m/a.png"
        assert rows["m/z.png"]["is_dup"] is True
        assert rows["m/a.png"]["is_dup"] is False
        assert rows["m/a.png"]["n_copies"] == 2
        assert rows["m/q.png"]["n_copies"] == 1
        assert rows["m/q.png"]["canonical_ref"] == "m/q.png"
        import hashlib

        assert (
            rows["m/a.png"]["payload_md5"]
            == hashlib.md5(payload_a.hex().encode()).hexdigest()
            == rows["m/z.png"]["payload_md5"]
        )


class TestSpanIntegrity:
    def test_violations_detected(self, ray_session):
        ds = _docs_ds(
            [
                # clean doc
                (
                    "c1",
                    [
                        _span("text", text="a", off=0),
                        _span("media", ref="m/x.png", off=1),
                    ],
                ),
                # gap (0 -> 2), empty text span, media with text
                (
                    "v1",
                    [
                        _span("text", text="", off=0),
                        _span("media", ref="m/y.png", off=2),
                    ],
                ),
                # duplicate offset + doesn't start at zero
                (
                    "v2",
                    [
                        _span("text", text="a", off=1),
                        _span("text", text="b", off=1),
                    ],
                ),
                # media span carrying text
                (
                    "v3",
                    [
                        _span("media", text="stray", ref="m/z.png", off=0),
                    ],
                ),
            ]
        )
        rows = {r["doc_id"]: r for r in interleaved.span_integrity(ds).take_all()}
        assert rows["c1"]["ok"] is True
        v1 = rows["v1"]
        assert (v1["n_gaps"], v1["n_empty_text"], v1["ok"]) == (1, 1, False)
        v2 = rows["v2"]
        assert (v2["n_dup_offsets"], v2["starts_at_zero"], v2["ok"]) == (
            1,
            False,
            False,
        )
        v3 = rows["v3"]
        assert (v3["n_media_with_text"], v3["ok"]) == (1, False)

    def test_clean_corpus_all_ok(self, ray_session, t1_corpus):
        from tableextraction_ray.sources import read_documents

        out = interleaved.span_integrity(read_documents(t1_corpus)).take_all()
        assert len(out) == 32
        assert all(r["ok"] for r in out)


class TestInterleavePack:
    def test_hand_computed_next_fit(self, ray_session):
        # doc-000000: 3 text tokens + 1 media (vision 5) = cost 8
        # doc-000001: cost 7 (2 tokens + 5)   doc-000002: cost 20 (oversize)
        # doc-000003: cost 4 -> capacity 10: [d0(8)], [d1(7)], [d2(20)], [d3(4)]
        #   next-fit: d0 fill 8; d1 8+7>10 -> seq1; d2 7+20>10 -> seq2
        #   (oversize alone); d3 20+4>10 -> seq3
        ds = _docs_ds(
            [
                (
                    "doc-000000",
                    [
                        _span("text", text="a b c", off=0),
                        _span("media", ref="m/0.png", off=1),
                    ],
                ),
                ("doc-000001", [
                    _span("text", text="x y", off=0),
                    _span("media", ref="m/1.png", off=1),
                ]),
                ("doc-000002", [_span("text", text=" ".join(["t"] * 20), off=0)]),
                ("doc-000003", [_span("text", text="p q r s", off=0)]),
            ]
        )
        out = {
            r["doc_id"]: r
            for r in interleaved.interleave_pack(
                ds, capacity=10, vision_tokens=5, shard_size=64
            ).take_all()
        }
        assert out["doc-000000"]["cost_tokens"] == 8
        assert (out["doc-000000"]["seq_no"], out["doc-000000"]["offset_tokens"]) == (0, 0)
        assert out["doc-000001"]["cost_tokens"] == 7
        assert (out["doc-000001"]["seq_no"], out["doc-000001"]["offset_tokens"]) == (1, 0)
        assert out["doc-000002"]["cost_tokens"] == 20  # oversize: alone
        assert (out["doc-000002"]["seq_no"], out["doc-000002"]["offset_tokens"]) == (2, 0)
        assert (out["doc-000003"]["seq_no"], out["doc-000003"]["offset_tokens"]) == (3, 0)

    def test_shard_independence(self, ray_session):
        # docs 63 and 64 land in different shards -> both start seq 0
        ds = _docs_ds(
            [
                ("doc-000063", [_span("text", text="a b", off=0)]),
                ("doc-000064", [_span("text", text="c d", off=0)]),
            ]
        )
        out = {
            r["doc_id"]: r
            for r in interleaved.interleave_pack(ds, capacity=10).take_all()
        }
        assert out["doc-000063"]["shard"] == 0
        assert out["doc-000064"]["shard"] == 1
        assert out["doc-000063"]["seq_no"] == out["doc-000064"]["seq_no"] == 0


class TestEmptySpansContract:
    def test_zero_span_docs_dropped_like_unnest(self, ray_session):
        # Docs with spans=[] emit NO per-doc rows (matching the UNNEST
        # oracles); detectable upstream as input_rows != output_rows.
        ds = _docs_ds(
            [
                ("doc-000001", [_span("text", text="a b", off=0)]),
                ("doc-000002", []),
            ]
        )
        assert {r["doc_id"] for r in interleaved.span_stats(ds).take_all()} == {
            "doc-000001"
        }
        assert {
            r["doc_id"] for r in interleaved.render_interleaved(ds).take_all()
        } == {"doc-000001"}
        assert {
            r["doc_id"] for r in interleaved.span_integrity(ds).take_all()
        } == {"doc-000001"}
        assert {
            r["doc_id"] for r in interleaved.interleave_pack(ds).take_all()
        } == {"doc-000001"}


class TestSpanBoilerplate:
    def test_drop_and_keep_rules(self, ray_session):
        shared = "Home | About"
        docs = []
        # 4 docs share a nav span -> dropped at max_docs=3; one doc pair
        # shares a span (kept); media and empty text always survive.
        for i in range(4):
            docs.append(
                (
                    f"doc-{i:06d}",
                    [
                        _span("text", text=f"unique body {i}", off=0),
                        _span("text", text=shared, off=1),
                        _span("media", ref=f"m/{i}.png", off=2),
                    ],
                )
            )
        docs.append(
            ("doc-000004", [_span("text", text="", off=0)])
        )
        out = interleaved.span_boilerplate(
            _docs_ds(docs), max_docs=3
        ).take_all()
        texts = [r["text"] for r in out]
        assert shared not in texts  # >3 docs -> all copies dropped
        assert sum(t.startswith("unique body") for t in texts) == 4
        assert sum(r["kind"] == "media" for r in out) == 4
        assert ("" in texts)  # empty text span survives
        assert len(out) == 4 + 4 + 1

    def test_at_threshold_kept(self, ray_session):
        shared = "kept note"
        docs = [
            (f"doc-{i:06d}", [_span("text", text=shared, off=0)])
            for i in range(3)
        ]
        out = interleaved.span_boilerplate(
            _docs_ds(docs), max_docs=3
        ).take_all()
        assert len(out) == 3  # exactly max_docs distinct docs -> kept

    def test_within_doc_repeat_not_boilerplate(self, ray_session):
        # one doc repeating a span 5 times is ONE distinct doc -> kept
        docs = [
            (
                "doc-000000",
                [_span("text", text="echo", off=k) for k in range(5)],
            )
        ]
        out = interleaved.span_boilerplate(
            _docs_ds(docs), max_docs=3
        ).take_all()
        assert len(out) == 5


class TestCurateCaptions:
    def test_best_caption_across_copies(self, ray_session):
        import ray.data

        # same payload under refs A and B; A's caption shorter, B's longer
        # -> canonical (min ref) wins with B's LONGER caption
        payload = b"\x89PNGpix"
        media = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "media_ref": pa.array(["m/a.png", "m/b.png", "m/c.png"]),
                    "payload": pa.array(
                        [payload, payload, b"other"], type=pa.large_binary()
                    ),
                }
            )
        )
        spans = _docs_ds(
            [
                (
                    "doc-000000",
                    [
                        _span("media", ref="m/a.png", off=0),
                        _span("text", text="short", off=1),
                    ],
                ),
                (
                    "doc-000001",
                    [
                        _span("media", ref="m/b.png", off=0),
                        _span("text", text="a much longer caption", off=1),
                    ],
                ),
                ("doc-000002", [_span("media", ref="m/c.png", off=0)]),
            ]
        )
        out = {
            r["canonical_ref"]: r
            for r in interleaved.curate_captions(spans, media).take_all()
        }
        assert set(out) == {"m/a.png", "m/c.png"}
        assert out["m/a.png"]["caption"] == "a much longer caption"
        assert out["m/a.png"]["n_candidates"] == 2
        assert out["m/c.png"]["caption"] == ""  # no following text span
        assert out["m/c.png"]["n_candidates"] == 1

    def test_span_ref_missing_from_store_skipped(self, ray_session):
        import ray.data

        media = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "media_ref": pa.array(["m/x.png"]),
                    "payload": pa.array([b"x"], type=pa.large_binary()),
                }
            )
        )
        spans = _docs_ds(
            [
                (
                    "doc-000000",
                    [
                        _span("media", ref="m/gone.png", off=0),
                        _span("text", text="orphan", off=1),
                    ],
                )
            ]
        )
        out = interleaved.curate_captions(spans, media).take_all()
        # inner-join semantics (matches the oracle): the orphan span ref
        # has no store row, the store-only ref has no caption candidates
        # -> neither yields a pair
        assert out == []


class TestSpanCoalesce:
    def _mk(self, spans_per_doc):
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array(
                        [f"d{i}" for i in range(len(spans_per_doc))],
                        type=pa.string(),
                    ),
                    "spans": pa.array(spans_per_doc, type=_span_type()),
                }
            )
        )

    def _span(self, kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref, "offset": off}

    def test_runs_merge_and_media_stays_atomic(self, ray_session):
        ds = self._mk(
            [
                [
                    self._span("text", "a", "", 0),
                    self._span("text", "b", "", 1),
                    self._span("media", "", "m1", 2),
                    self._span("media", "", "m2", 3),
                    self._span("text", "c", "", 4),
                ],
                [self._span("text", "solo", "", 0)],
            ]
        )
        rows = sorted(
            (
                (r["doc_id"], r["offset"], r["kind"], r["text"],
                 r["media_ref"], r["n_merged"])
                for r in interleaved.span_coalesce(ds).take_all()
            )
        )
        assert rows == [
            ("d0", 0, "text", "a b", "", 2),
            ("d0", 1, "media", "", "m1", 1),
            ("d0", 2, "media", "", "m2", 1),
            ("d0", 3, "text", "c", "", 1),
            ("d1", 0, "text", "solo", "", 1),
        ]

    def test_out_of_order_offsets_sort_first(self, ray_session):
        ds = self._mk(
            [
                [
                    self._span("text", "second", "", 5),
                    self._span("text", "first", "", 1),
                ]
            ]
        )
        rows = interleaved.span_coalesce(ds).take_all()
        assert [(r["offset"], r["text"]) for r in rows] == [
            (0, "first second")
        ]


class TestMediaPositionHist:
    def test_buckets_by_rank_not_raw_offset(self, ray_session):
        # 10 spans; media at ranks 0 and 9 -> buckets 0 and 9.
        spans = [
            {
                "kind": "media" if i in (0, 9) else "text",
                "text": "" if i in (0, 9) else "t",
                "media_ref": f"m{i}" if i in (0, 9) else "",
                "offset": i,
            }
            for i in range(10)
        ]
        ds = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array(["d0"], type=pa.string()),
                    "spans": pa.array([spans], type=_span_type()),
                }
            )
        )
        rows = sorted(
            (r["bucket"], r["n_media"])
            for r in interleaved.media_position_hist(ds).take_all()
        )
        assert rows == [(0, 1), (9, 1)]
