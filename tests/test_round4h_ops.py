"""Round-4 batch-11 ops: per-source Zipf-exponent fit and the
sliding-window streaming prefix dedup. Oracle parity runs in
test_entry_parity; these pin the numpy/plain-Python replay invariants
and the window/boundary edge cases."""

import hashlib
import math

import numpy as np
import pyarrow as pa
import ray.data

from tableextraction_ray.functions import dedup, textstats


def _docs(rows):
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "source": pa.array([r[1] for r in rows], type=pa.string()),
                "text": pa.array([r[2] for r in rows], type=pa.string()),
            }
        )
    ).repartition(3)


class TestZipfFit:
    def _replay(self, counts, k=64):
        rows = sorted(counts.items(), key=lambda p: (-p[1], p[0]))[:k]
        m = len(rows)
        xq = [math.floor(math.log(r) * 1e6) for r in range(1, m + 1)]
        yq = [math.floor(math.log(c) * 1e6) for _, c in rows]
        sx, sy = sum(xq), sum(yq)
        sxy = sum(a * b for a, b in zip(xq, yq))
        sxx = sum(a * a for a in xq)
        num, den = m * sxy - sx * sy, m * sxx - sx * sx
        return math.floor(-(float(num) / float(den)) * 1e6)

    def test_matches_plain_python_ols_replay(self, ray_session):
        # zipf-ish counts: token t_i repeated round(64/i) times
        words = []
        for i in range(1, 9):
            words += [f"t{i:02d}"] * (64 // i)
        text = " ".join(words)
        got = textstats.zipf_fit(
            _docs([(1, "s0", text)])
        ).to_pandas()
        from collections import Counter

        want = self._replay(Counter(words))
        assert got.iloc[0]["zipf_fp6"] == want
        assert got.iloc[0]["n_top"] == 8

    def test_ideal_zipf_slope_near_one(self, ray_session):
        words = []
        for i in range(1, 33):
            words += [f"w{i:03d}"] * max(1, round(1000 / i))
        got = textstats.zipf_fit(_docs([(1, "s0", " ".join(words))]))
        z = got.to_pandas().iloc[0]["zipf_fp6"]
        assert 0.9e6 < z < 1.1e6

    def test_degenerate_single_token_source_dropped(self, ray_session):
        got = textstats.zipf_fit(
            _docs([(1, "only", "a a a a"), (2, "ok", "x x y")])
        ).to_pandas()
        assert list(got["source"]) == ["ok"]


class TestWindowDedup:
    def _prefix_md5(self, text, n=16):
        toks = textstats.ascii_tokens(text)[:n]
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    def test_consecutive_occurrence_pairs_and_gaps(self, ray_session):
        # doc 1 and doc 4 share a prefix (gap 3); doc 9 repeats it (gap 5)
        p = "p " * 16
        rows = [(i, "s", f"unique{i} filler") for i in range(1, 10)]
        rows[0] = (1, "s", p + "tail one")
        rows[3] = (4, "s", p + "tail two")
        rows[8] = (9, "s", p + "tail three")
        got = (
            dedup.window_dedup(_docs(rows), window=100)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got[["doc_id", "prev_doc_id", "gap"]].values.tolist() == [
            [4, 1, 3],
            [9, 4, 5],
        ]

    def test_window_bound_is_inclusive(self, ray_session):
        p = "q " * 16
        rows = [(i, "s", f"unique{i} filler") for i in range(1, 30)]
        rows[0] = (1, "s", p + "a")
        rows[10] = (11, "s", p + "b")   # gap 10
        rows[25] = (26, "s", p + "c")   # gap 15 from doc 11
        got = dedup.window_dedup(_docs(rows), window=10).to_pandas()
        assert sorted(got["doc_id"].tolist()) == [11]
        got2 = dedup.window_dedup(_docs(rows), window=15).to_pandas()
        assert sorted(got2["doc_id"].tolist()) == [11, 26]

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(7)
        prefixes = [f"{'x%d ' % (i % 5) * 16}" for i in range(40)]
        rows = [
            (i + 1, "s", prefixes[i] + f"tail{rng.randint(100)}")
            for i in range(40)
        ]
        a = (
            dedup.window_dedup(_docs(rows), window=100)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            dedup.window_dedup(
                _docs(rows).repartition(11), window=100
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert a.equals(b)
        # every doc after the first occurrence of its prefix class pairs
        # with its immediate predecessor in that class: 40 docs, 5
        # classes -> 35 pairs, all gaps == 5
        assert len(a) == 35
        assert set(a["gap"]) == {5}


class TestPeakConcurrency:
    def _events(self, rows, parts=4):
        import pandas as pd

        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "event_type": pa.array(
                        [r[0] for r in rows], type=pa.string()
                    ),
                    "ts": pa.array(
                        [pd.Timestamp(r[1], unit="s") for r in rows],
                        type=pa.timestamp("us"),
                    ),
                }
            )
        ).repartition(parts)

    def test_matches_plain_python_sweep(self, ray_session):
        from tableextraction_ray.functions import relational

        rng = np.random.RandomState(3)
        rows = [
            ("t%d" % rng.randint(3), int(rng.randint(0, 10_000)))
            for _ in range(300)
        ]
        got = (
            relational.peak_concurrency(self._events(rows), hold_s=600)
            .to_pandas()
            .set_index("event_type")["peak_concurrent"]
            .to_dict()
        )
        want = {}
        for t in {r[0] for r in rows}:
            pts = []
            for _, s in [r for r in rows if r[0] == t]:
                pts.append((s * 1_000_000, 1))
                pts.append((s * 1_000_000 + 600_000_000, -1))
            pts.sort()
            cur = peak = 0
            for _, d in pts:
                cur += d
                peak = max(peak, cur)
            want[t] = peak
        assert got == want

    def test_half_open_back_to_back_intervals_dont_overlap(
        self, ray_session
    ):
        from tableextraction_ray.functions import relational

        # second event starts exactly when the first expires
        rows = [("a", 0), ("a", 600)]
        got = relational.peak_concurrency(
            self._events(rows, parts=2), hold_s=600
        ).to_pandas()
        assert got.iloc[0]["peak_concurrent"] == 1

    def test_partition_invariance(self, ray_session):
        from tableextraction_ray.functions import relational

        rng = np.random.RandomState(9)
        rows = [
            ("t%d" % rng.randint(2), int(rng.randint(0, 5_000)))
            for _ in range(200)
        ]
        a = relational.peak_concurrency(
            self._events(rows, parts=1), hold_s=300
        ).to_pandas()
        b = relational.peak_concurrency(
            self._events(rows, parts=13), hold_s=300
        ).to_pandas()
        assert a.equals(b)


class TestSq8QuantizeError:
    def _emb(self, mat, parts=3):
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "embedding": pa.array(
                        [list(map(float, row)) for row in mat],
                        type=pa.list_(pa.float32()),
                    )
                }
            )
        ).repartition(parts)

    def test_matches_numpy_codec_replay(self, ray_session):
        from tableextraction_ray.functions import similarity

        rng = np.random.RandomState(4)
        mat = rng.randn(120, 6).astype(np.float32)
        got = (
            similarity.sq8_quantize_error(self._emb(mat))
            .to_pandas()
            .sort_values("dim")
            .reset_index(drop=True)
        )
        q = np.floor(mat.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        mn, mx = q.min(axis=0), q.max(axis=0)
        r = mx - mn
        code = (2 * 255 * (q - mn) + r) // (2 * r)
        recon = mn + (2 * code * r + 255) // 510
        err = q - recon
        assert got["mn_q"].tolist() == mn.tolist()
        assert got["mx_q"].tolist() == mx.tolist()
        assert got["sse_q"].tolist() == (err * err).sum(axis=0).tolist()
        assert (
            got["n_sat"].tolist()
            == ((code == 0) | (code == 255)).sum(axis=0).tolist()
        )

    def test_constant_dimension_zero_error(self, ray_session):
        from tableextraction_ray.functions import similarity

        mat = np.ones((50, 3))
        mat[:, 1] = np.linspace(-1, 1, 50)
        got = (
            similarity.sq8_quantize_error(self._emb(mat))
            .to_pandas()
            .sort_values("dim")
            .reset_index(drop=True)
        )
        assert got.iloc[0]["sse_q"] == 0
        assert got.iloc[2]["sse_q"] == 0
        # max reconstruction error of a 255-step codec is <= half a step
        step = (got.iloc[1]["mx_q"] - got.iloc[1]["mn_q"]) / 255
        assert got.iloc[1]["sse_q"] <= 50 * (step / 2 + 1) ** 2

    def test_partition_invariance(self, ray_session):
        from tableextraction_ray.functions import similarity

        rng = np.random.RandomState(6)
        mat = rng.randn(90, 4).astype(np.float32)
        a = (
            similarity.sq8_quantize_error(self._emb(mat, parts=1))
            .to_pandas()
            .sort_values("dim")
            .reset_index(drop=True)
        )
        b = (
            similarity.sq8_quantize_error(self._emb(mat, parts=9))
            .to_pandas()
            .sort_values("dim")
            .reset_index(drop=True)
        )
        assert a.equals(b)
