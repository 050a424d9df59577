"""Hypothesis property tests for the round-3 exact-integer kernels
(pure — no Ray): apportionment, count-min bound, histogram quantile
bound, Bloom no-false-negatives, PQ lossless-codeword reconstruction."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tableextraction_ray.functions.relational import _bloom_positions
from tableextraction_ray.functions.sketch import _cms_col
from tableextraction_ray.functions.textstats import sqrt_apportion

count_maps = st.dictionaries(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4),
    st.integers(1, 10_000),
    min_size=1,
    max_size=12,
)


class TestApportionment:
    @given(count_maps, st.integers(0, 500))
    @settings(max_examples=100, deadline=None)
    def test_sums_to_total_and_tracks_shares(self, counts, total):
        q = sqrt_apportion(counts, total)
        assert set(q) == set(counts)
        assert sum(q.values()) == total
        # largest-remainder: every quota within 1 of its real-valued share
        s = {k: int(np.floor(np.sqrt(np.float64(c)) * 1e6)) for k, c in counts.items()}
        big = sum(s.values())
        for k in counts:
            exact = total * s[k] / big
            assert exact - 1 < q[k] < exact + 1

    @given(count_maps, st.integers(0, 500))
    @settings(max_examples=50, deadline=None)
    def test_deterministic(self, counts, total):
        assert sqrt_apportion(counts, total) == sqrt_apportion(
            dict(reversed(list(counts.items()))), total
        )


class TestCmsBound:
    @given(
        st.lists(st.text(alphabet="xyz", min_size=1, max_size=3), max_size=60),
        st.integers(2, 32),
    )
    @settings(max_examples=60, deadline=None)
    def test_one_sided(self, tokens, width):
        from collections import Counter

        true = Counter(tokens)
        depth = 3
        counters = np.zeros((depth, width), dtype=np.int64)
        for tok, c in true.items():
            for j in range(depth):
                counters[j, _cms_col(j, tok, width)] += c
        for tok, c in true.items():
            est = min(counters[j, _cms_col(j, tok, width)] for j in range(depth))
            assert est >= c  # collisions only inflate


class TestHistogramQuantileBound:
    @given(
        st.lists(st.integers(0, 5000), min_size=1, max_size=300),
        st.sampled_from([50, 95, 99]),
        st.sampled_from([10, 100, 250]),
    )
    @settings(max_examples=80, deadline=None)
    def test_upper_edge_bound(self, vals, q, width):
        """The operator's quantile walk (first bin whose cumulative count
        reaches the exact ceil-rank, inclusive upper edge) satisfies
        true <= est < true + width for any data, q, and bin width."""
        n = len(vals)
        rank = (q * n + 99) // 100
        true = sorted(vals)[rank - 1]
        hist: dict[int, int] = {}
        for v in vals:
            hist[v // width] = hist.get(v // width, 0) + 1
        cum = 0
        for b in sorted(hist):
            cum += hist[b]
            if cum >= rank:
                est = (b + 1) * width - 1
                break
        assert true <= est < true + width


class TestBloom:
    @given(
        st.sets(st.integers(0, 10**12), max_size=40),
        st.sampled_from([64, 1024, 8192]),
        st.integers(1, 5),
    )
    @settings(max_examples=60, deadline=None)
    def test_no_false_negatives(self, keys, m, k):
        bits = np.zeros(m, dtype=np.uint8)
        for key in keys:
            bits[_bloom_positions(key, m, k)] = 1
        for key in keys:
            assert bits[_bloom_positions(key, m, k)].all()


class TestPqReconstruction:
    @given(st.integers(0, 2**31 - 1))
    @settings(max_examples=20, deadline=None)
    def test_codewords_reconstruct_losslessly(self, seed):
        """When every vector IS a codeword (n <= ksub, iters=0 init), PQ
        encoding is lossless and the ADC dot equals the exact quantized
        dot — the identity the oracle replay is built on."""
        rng = np.random.default_rng(seed)
        n, m_sub, sd = 8, 4, 4
        mat = np.floor(rng.uniform(-1, 1, (n, m_sub * sd)) * 1e6 + 0.5)
        books = np.stack(
            [mat[:, m * sd : (m + 1) * sd] for m in range(m_sub)]
        )  # codebooks = the vectors themselves
        for i in range(n):
            adc = 0.0
            for m in range(m_sub):
                x = mat[i, m * sd : (m + 1) * sd]
                cb = books[m]
                key = (cb * cb).sum(axis=1) - 2.0 * (cb @ x)
                code = int(np.argmin(key))
                adc += float(cb[code] @ mat[0, m * sd : (m + 1) * sd])
            exact = float(mat[i] @ mat[0])
            if len({tuple(r) for r in mat.tolist()}) == n:
                # distinct vectors -> own codeword wins -> lossless
                assert adc == exact
