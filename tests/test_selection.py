"""DSIR importance-weight contract: hand-computed tiny case, direction
sanity (target-like docs score higher), and partition invariance."""

import math

import numpy as np
import ray
import ray.data

from tableextraction_ray.functions.dedup import shingle_base_hash
from tableextraction_ray.functions.selection import dsir_weights


def _expected(docs, target_source, n_buckets=1024):
    """Local replay of the contract: bucket counts -> fixed-point
    log-ratio table -> int64 per-doc dot."""
    ct = np.zeros(n_buckets, dtype=np.int64)
    cr = np.zeros(n_buckets, dtype=np.int64)
    per_doc = {}
    for d in docs:
        toks = d["text"].split()
        c = np.zeros(n_buckets, dtype=np.int64)
        for i in range(len(toks) - 1):
            c[shingle_base_hash(toks[i] + " " + toks[i + 1]) % n_buckets] += 1
        per_doc[d["doc_id"]] = c
        cr += c
        if d["source"] == target_source:
            ct += c
    t, r = int(ct.sum()), int(cr.sum())
    delta = np.floor(
        (
            np.log((ct + 1.0) / np.float64(t + n_buckets))
            - np.log((cr + 1.0) / np.float64(r + n_buckets))
        )
        * 1e9
    ).astype(np.int64)
    return {i: int(c @ delta) for i, c in per_doc.items()}


DOCS = [
    {"doc_id": 0, "source": "wiki", "text": "alpha beta gamma alpha beta"},
    {"doc_id": 1, "source": "wiki", "text": "alpha beta delta"},
    {"doc_id": 2, "source": "web", "text": "spam eggs spam eggs spam"},
    {"doc_id": 3, "source": "web", "text": "alpha beta gamma"},
    {"doc_id": 4, "source": "web", "text": ""},
]


class TestDsir:
    def test_hand_computed(self, ray_session):
        out = {
            r["doc_id"]: r["logw_fp9"]
            for r in dsir_weights(
                ray.data.from_items(DOCS), target_source="wiki"
            ).take_all()
        }
        assert out == _expected(DOCS, "wiki")
        # empty doc scores exactly zero
        assert out[4] == 0

    def test_target_like_scores_higher(self, ray_session):
        out = {
            r["doc_id"]: r["logw_fp9"]
            for r in dsir_weights(
                ray.data.from_items(DOCS), target_source="wiki"
            ).take_all()
        }
        # doc 3 shares the wiki bigrams, doc 2 shares none: the wiki-like
        # web doc must outscore the spam doc.
        assert out[3] > out[2]
        assert out[0] > out[2]

    def test_partition_invariance(self, ray_session):
        a = {
            r["doc_id"]: r["logw_fp9"]
            for r in dsir_weights(
                ray.data.from_items(DOCS).repartition(1), target_source="wiki"
            ).take_all()
        }
        b = {
            r["doc_id"]: r["logw_fp9"]
            for r in dsir_weights(
                ray.data.from_items(DOCS).repartition(5), target_source="wiki"
            ).take_all()
        }
        assert a == b


class TestMixtureSample:
    def test_sqrt_upweights_small_sources(self, ray_session):
        from tableextraction_ray.functions.textstats import mixture_sample

        # big: 64 docs, small: 4 docs -> raw shares 16:1, sqrt shares 4:1
        docs = [{"doc_id": i, "source": "big"} for i in range(64)] + [
            {"doc_id": 100 + i, "source": "small"} for i in range(4)
        ]
        out = mixture_sample(ray.data.from_items(docs), total=10).take_all()
        by_src = {}
        for r in out:
            by_src[r["source"]] = by_src.get(r["source"], 0) + 1
        assert sum(by_src.values()) == 10
        # sqrt apportionment: 10 * 8/(8+2) = 8 big, 2 small (raw would be ~9.4/0.6)
        assert by_src == {"big": 8, "small": 2}

    def test_quota_sums_to_total_and_partition_invariance(self, ray_session):
        from tableextraction_ray.functions.textstats import mixture_sample

        docs = [
            {"doc_id": i, "source": f"s{i % 7}"} for i in range(70)
        ]
        a = sorted(
            (r["source"], r["doc_id"], r["rk"])
            for r in mixture_sample(
                ray.data.from_items(docs).repartition(1), total=23
            ).take_all()
        )
        b = sorted(
            (r["source"], r["doc_id"], r["rk"])
            for r in mixture_sample(
                ray.data.from_items(docs).repartition(9), total=23
            ).take_all()
        )
        assert a == b and len(a) == 23


class TestBloomSemiJoin:
    def test_false_positive_stress_still_exact(self, ray_session):
        """A 16-bit Bloom over 34 keys is nearly all-ones — almost every
        order survives the prune — yet the in-shuffle exact verification
        must keep the output identical to the default-size run."""
        from tableextraction_ray.functions.relational import orders_for_segment

        sf = "/root/testdata/sf0.001"
        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_custkey", "o_totalprice", "o_orderdate"],
        )
        customer = ray.data.read_parquet(
            f"{sf}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        )
        stressed = sorted(
            tuple(sorted(r.items()))
            for r in orders_for_segment(orders, customer, m=16, k=2).take_all()
        )
        normal = sorted(
            tuple(sorted(r.items()))
            for r in orders_for_segment(orders, customer).take_all()
        )
        assert stressed == normal and len(normal) > 0

    def test_bloom_membership_contract(self, ray_session):
        """No false negatives ever; false-positive rate on non-keys is
        small at the default sizing (8192 bits / 4 hashes / ~few hundred
        keys -> well under 5%)."""
        from tableextraction_ray.functions.relational import (
            _bloom_positions,
            bloom_build,
        )

        keys = ray.data.from_items([{"k": i * 7} for i in range(300)])
        bits = bloom_build(keys, "k")
        for i in range(300):
            assert bits[_bloom_positions(i * 7, len(bits), 4)].all()
        fps = sum(
            bool(bits[_bloom_positions(x, len(bits), 4)].all())
            for x in range(1_000_000, 1_002_000)
        )
        assert fps / 2000 < 0.05

    def test_missing_segment_is_empty(self, ray_session):
        from tableextraction_ray.functions.relational import orders_for_segment

        sf = "/root/testdata/sf0.001"
        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_custkey", "o_totalprice", "o_orderdate"],
        )
        customer = ray.data.read_parquet(
            f"{sf}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        )
        out = orders_for_segment(orders, customer, segment="NO_SUCH").take_all()
        assert out == []


class TestCurationDiagnostics:
    def test_dedup_savings_invariants(self, ray_session):
        from tableextraction_ray.functions.curate import dedup_savings

        sf = "/root/testdata/sf0.001"
        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text", "n_chars"]
        )
        (row,) = dedup_savings(docs).take_all()
        assert row["n_docs"] == 500
        assert 0 < row["n_dropped"] < row["n_docs"]
        assert 0 < row["chars_dropped"] < row["chars_total"]
        (row2,) = dedup_savings(docs.repartition(7)).take_all()
        assert row == row2

    def test_quality_histogram_mass_conservation(self, ray_session):
        from tableextraction_ray.functions.textstats import quality_histogram

        sf = "/root/testdata/sf0.001"
        docs = ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text", "source"]
        )
        rows = quality_histogram(docs).take_all()
        assert sum(r["n_docs"] for r in rows) == 500
        assert all(0 <= r["bin"] <= 10 for r in rows)


def _ref_lm(docs):
    """Plain-Python mirror of the hashed-bigram LM NLL contract."""
    from collections import Counter

    B1, B2 = 1024, 4096
    per_doc = {}
    cu = Counter()
    cb = Counter()
    for d in docs:
        toks = d["text"].split()
        pairs = [
            (
                shingle_base_hash(toks[i]) % B1,
                shingle_base_hash(toks[i] + " " + toks[i + 1]) % B2,
            )
            for i in range(len(toks) - 1)
        ]
        per_doc[d["doc_id"]] = pairs
        for u, b in pairs:
            cu[u] += 1
            cb[b] += 1
    out = {}
    for doc_id, pairs in per_doc.items():
        n = len(pairs)
        nll = -sum(
            int(np.floor(np.log((cb[b] + 1.0) / (cu[u] + float(B2))) * 1e9))
            for u, b in pairs
        )
        mean = int(np.floor(np.float64(nll) / n)) if n else 0
        out[doc_id] = (n, nll if n else 0, mean)
    return out


class TestLmPerplexity:
    DOCS = [
        {"doc_id": 0, "text": "the cat sat on the mat"},
        {"doc_id": 1, "text": "the cat sat on the hat"},
        {"doc_id": 2, "text": "zqx vwp korv zzz unseen tokens here"},
        {"doc_id": 3, "text": "single"},  # no bigrams
        {"doc_id": 4, "text": "the cat sat on the mat"},
    ]

    def test_matches_reference_mirror(self, ray_session):
        from tableextraction_ray.functions.selection import lm_perplexity

        out = {
            r["doc_id"]: (r["n_bigrams"], r["nll_fp9"], r["mean_nll_fp9"])
            for r in lm_perplexity(ray.data.from_items(self.DOCS)).take_all()
        }
        assert out == _ref_lm(self.DOCS)
        # zero-bigram doc present with zeros
        assert out[3] == (0, 0, 0)

    def test_common_text_less_surprising(self, ray_session):
        from tableextraction_ray.functions.selection import lm_perplexity

        out = {
            r["doc_id"]: r["mean_nll_fp9"]
            for r in lm_perplexity(ray.data.from_items(self.DOCS)).take_all()
        }
        # doc 0 repeats verbatim in the corpus (docs 0 and 4 identical);
        # its bigram buckets are 2-3x hotter than doc 2's one-off tokens,
        # so its mean NLL must be strictly lower.
        assert out[0] < out[2]

    def test_partition_invariance(self, ray_session):
        from tableextraction_ray.functions.selection import lm_perplexity

        one = sorted(
            map(
                lambda r: (r["doc_id"], r["nll_fp9"]),
                lm_perplexity(ray.data.from_items(self.DOCS)).take_all(),
            )
        )
        many = sorted(
            map(
                lambda r: (r["doc_id"], r["nll_fp9"]),
                lm_perplexity(
                    ray.data.from_items(self.DOCS).repartition(4)
                ).take_all(),
            )
        )
        assert one == many


class TestHashSamplers:
    def _docs(self):
        import ray.data

        return ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "source"],
        )

    def test_hash_sample_repartition_invariant(self, ray_session):
        from tableextraction_ray.functions import selection

        a = selection.hash_sample_k(self._docs()).take_all()
        b = selection.hash_sample_k(self._docs().repartition(7)).take_all()
        assert a == b and len(a) == 20
        assert [r["rank"] for r in a] == list(range(1, 21))

    def test_per_source_sample_counts(self, ray_session):
        from tableextraction_ray.functions import selection

        rows = selection.per_source_sample_k(self._docs(), k=3).take_all()
        per = {}
        for r in rows:
            per.setdefault(r["source"], []).append(r["rk"])
        assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
        assert all(len(v) <= 3 for v in per.values())
        b = selection.per_source_sample_k(
            self._docs().repartition(7), k=3
        ).take_all()
        assert rows == b


class TestLengthTokenCorr:
    def test_degenerate_variance_yields_zero(self, ray_session):
        import pyarrow as pa
        import ray.data

        from tableextraction_ray.functions import selection

        ds = ray.data.from_arrow(
            pa.table({"doc_id": [1, 2], "text": ["aa bb", "aa bb"]})
        )
        rows = selection.length_token_corr(ds).take_all()
        assert rows == [{"n_docs": 2, "corr_fp6": 0}]

    def test_perfect_linear_correlation(self, ray_session):
        import pyarrow as pa
        import ray.data

        from tableextraction_ray.functions import selection

        # texts where length and token count grow in lockstep: k tokens
        # of one char -> len = 2k-1, tokens = k (perfect correlation)
        texts = [" ".join(["x"] * k) for k in (1, 2, 3, 4, 5)]
        ds = ray.data.from_arrow(
            pa.table({"doc_id": list(range(5)), "text": texts})
        )
        rows = selection.length_token_corr(ds).take_all()
        assert rows == [{"n_docs": 5, "corr_fp6": 1_000_000}]


class TestNegativePairs:
    def _docs(self, n=37):
        return ray.data.from_items([{"doc_id": i} for i in range(n)])

    def test_matches_pure_python_ring(self, ray_session):
        """Exact replay: sort by md5-u64, pair with ring offsets 1..k."""
        import hashlib

        from tableextraction_ray.functions.selection import negative_pairs

        n, k = 37, 2
        order = sorted(
            range(n),
            key=lambda d: (
                int.from_bytes(
                    hashlib.md5(str(d).encode()).digest()[:8], "big"
                ),
                d,
            ),
        )
        want = {
            (order[i], lag, order[(i + lag) % n])
            for i in range(n)
            for lag in range(1, k + 1)
        }
        got = {
            (r["doc_id"], r["lag"], r["neg_doc_id"])
            for r in negative_pairs(self._docs(n), k=k).take_all()
        }
        assert got == want

    def test_each_doc_gets_k_negatives_no_self(self, ray_session):
        from collections import Counter

        from tableextraction_ray.functions.selection import negative_pairs

        rows = negative_pairs(self._docs(50), k=3).take_all()
        cnt = Counter(r["doc_id"] for r in rows)
        assert set(cnt.values()) == {3}
        assert all(r["doc_id"] != r["neg_doc_id"] for r in rows)

    def test_partition_invariance(self, ray_session):
        """Block boundaries (and thus successor stitching) must not leak
        into the pair set."""
        from tableextraction_ray.functions.selection import negative_pairs

        a = sorted(
            tuple(r.values())
            for r in negative_pairs(self._docs(64), k=2).take_all()
        )
        b = sorted(
            tuple(r.values())
            for r in negative_pairs(
                self._docs(64).repartition(13), k=2
            ).take_all()
        )
        assert a == b
