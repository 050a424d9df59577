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


class TestHybridRRF:
    """Fusion math recomputed from the component operators' own outputs:
    the operator's rrf_fp9 must equal 1e9 // (60 + rank) summed over the
    sides each doc appears on, with (score DESC, id ASC) side ranks."""

    DOCS = [
        {"doc_id": 0, "text": "hash join hash join hash"},
        {"doc_id": 1, "text": "join merge sort filter"},
        {"doc_id": 2, "text": "window stream window"},
        {"doc_id": 3, "text": "nothing relevant here at all"},
        {"doc_id": 4, "text": "hash merge"},
    ]

    @staticmethod
    def _embs():
        # vec_id 0..4; vec 0 is the query vector (near vec 4, far from 2)
        vecs = [
            [1.0, 0.0, 0.1],
            [0.8, 0.2, 0.0],
            [0.0, 1.0, 0.0],
            [0.1, 0.9, 0.2],
            [0.9, 0.1, 0.1],
        ]
        return [{"vec_id": i, "embedding": v} for i, v in enumerate(vecs)]

    def test_fusion_matches_component_ranks(self, ray_session):
        import ray.data

        from tableextraction_ray.functions.retrieval import hybrid_rrf
        from tableextraction_ray.functions.similarity import knn_bruteforce

        queries = ["hash join"]
        docs = ray.data.from_items(self.DOCS)
        embs = ray.data.from_items(self._embs())
        k_cand = 3
        out = hybrid_rrf(
            docs, embs, queries, k=3, k_cand=k_cand
        ).take_all()

        lex = bm25_topk(
            ray.data.from_items(self.DOCS), queries, k=k_cand
        ).take_all()
        dense = knn_bruteforce(
            ray.data.from_items(self._embs()), n_queries=1, k=k_cand
        ).take_all()

        expected: dict[int, int] = {}
        lex_sorted = sorted(lex, key=lambda r: (-r["score_fp6"], r["doc_id"]))
        for rank, r in enumerate(lex_sorted, 1):
            expected[r["doc_id"]] = expected.get(r["doc_id"], 0) + 10**9 // (
                60 + rank
            )
        dense_sorted = sorted(dense, key=lambda r: (-r["cos_fp5"], r["vec_id"]))
        for rank, r in enumerate(dense_sorted, 1):
            expected[r["vec_id"]] = expected.get(r["vec_id"], 0) + 10**9 // (
                60 + rank
            )
        top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        got = sorted(out, key=lambda r: r["rnk"])
        assert [(r["doc_id"], r["rrf_fp9"]) for r in got] == top
        assert [r["rnk"] for r in got] == [1, 2, 3]
        # both-sides doc outranks single-side docs here by construction:
        # doc 0 is BM25 #1 AND (vec 0 excluded as self) absent — so just
        # assert a doc present on both sides exists in the fixture fusion
        both = {r["doc_id"] for r in lex} & {r["vec_id"] for r in dense}
        assert both, "fixture must exercise the both-sides sum path"
