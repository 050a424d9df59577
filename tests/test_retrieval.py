"""BM25 retrieval: hand-computed scores, combiner losslessness, edge cases."""
import math

import ray

from tableextraction_ray.functions.retrieval import bm25_topk


def _ref_bm25(docs, query_terms, k1=1.2, b=0.75):
    """Plain-Python reference with the exact-integer rational contract."""
    toks = {d["doc_id"]: [w.lower() for w in __import__("re").findall(r"[A-Za-z]+", d["text"])] for d in docs}
    n = len(docs)
    t = sum(len(v) for v in toks.values())
    df = {}
    for w in query_terms:
        df[w] = sum(1 for v in toks.values() if w in v)
    scores = {}
    for doc_id, v in toks.items():
        dl = len(v)
        s = 0
        for w in query_terms:
            f = v.count(w)
            if f == 0 or df[w] == 0:
                continue
            idf = math.floor(math.log((2 * n + 2) / (2 * df[w] + 1)) * 1e6 + 0.5)
            num = idf * f * 2200 * 1000 * t
            den = f * 1000000 * t + 1200 * 250 * t + 1200 * 750 * dl * n
            s += num // den
        if s > 0:
            scores[doc_id] = s
    return scores


class TestBm25TopK:
    DOCS = [
        {"doc_id": 0, "text": "hash join hash join hash"},
        {"doc_id": 1, "text": "join merge sort filter"},
        {"doc_id": 2, "text": "window stream window"},
        {"doc_id": 3, "text": "nothing relevant here at all"},
        {"doc_id": 4, "text": "hash"},
    ]

    def test_hand_computed(self, ray_session):
        out = bm25_topk(
            ray.data.from_items(self.DOCS), ["hash join"], k=3
        ).take_all()
        expected = _ref_bm25(self.DOCS, ["hash", "join"])
        ranked = sorted(expected.items(), key=lambda r: (-r[1], r[0]))[:3]
        got = sorted(out, key=lambda r: r["rnk"])
        assert [(r["doc_id"], r["score_fp6"]) for r in got] == ranked
        assert [r["rnk"] for r in got] == [1, 2, 3]
        assert all(r["query_id"] == 0 for r in got)
        # the no-match doc is never ranked
        assert all(r["doc_id"] != 3 for r in got)

    def test_partition_invariance_lossless_combiner(self, ray_session):
        docs = [
            {"doc_id": i, "text": f"hash {'join ' * (i % 5)}stream batch{i % 3}"}
            for i in range(60)
        ]
        a = sorted(
            bm25_topk(ray.data.from_items(docs), ["hash join", "stream"], k=4).take_all(),
            key=lambda r: (r["query_id"], r["rnk"]),
        )
        b = sorted(
            bm25_topk(
                ray.data.from_items(docs).repartition(17), ["hash join", "stream"], k=4
            ).take_all(),
            key=lambda r: (r["query_id"], r["rnk"]),
        )
        assert a == b and len(a) == 8

    def test_absent_term_query(self, ray_session):
        out = bm25_topk(
            ray.data.from_items(self.DOCS), ["zzz missing"], k=3
        ).take_all()
        assert out == []
