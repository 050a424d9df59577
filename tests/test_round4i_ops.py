"""Round-4 batch-12 ops: incremental sessionization. Oracle parity
(incremental == batch over the whole table) runs in test_entry_parity;
these pin the chain/break/pass-through edge cases and the defining
invariant on adversarial random data."""

import datetime

import numpy as np
import pyarrow as pa
import ray.data

from tableextraction_ray.functions import relational

EPOCH = datetime.datetime(2024, 1, 1)


def _events(rows, parts=3):
    """rows: list of (user_id, minutes_after_epoch)."""
    ts = [
        EPOCH + datetime.timedelta(minutes=int(m)) for _, m in rows
    ]
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "user_id": pa.array(
                    [u for u, _ in rows], type=pa.int64()
                ),
                "ts": pa.array(ts, type=pa.timestamp("us")),
            }
        )
    ).repartition(parts)


def _sessions(ds):
    return sorted(
        (
            (r["user_id"], r["session_no"], r["n_events"], r["start_ts"], r["end_ts"])
            for r in ds.take_all()
        )
    )


class TestSessionizeIncremental:
    def test_invariant_random(self, ray_session):
        """Defining invariant: incremental(sessionize(old), new) equals
        sessionize(old ∪ new) row-for-row, on random data with chains,
        breaks, prior-only and new-only users."""
        rng = np.random.RandomState(11)
        old, new = [], []
        for u in range(40):
            n_old = rng.randint(0, 8)
            n_new = rng.randint(0, 8)
            # old events in [0, 600) minutes, new in [600, 1200):
            # append-only split at minute 600, gaps of every size
            old += [(u, int(m)) for m in rng.randint(0, 600, n_old)]
            new += [(u, int(m)) for m in rng.randint(600, 1200, n_new)]
        got = _sessions(
            relational.sessionize_incremental(
                relational.sessionize(_events(old)), _events(new)
            )
        )
        want = _sessions(relational.sessionize(_events(old + new)))
        assert got == want
        assert len(got) > 0

    def test_chain_extends_last_session(self, ray_session):
        """A new event within the gap of the prior last session extends
        it in place: same session_no and start_ts, n_events +1."""
        prior = relational.sessionize(_events([(1, 0), (1, 10)]))
        got = _sessions(
            relational.sessionize_incremental(prior, _events([(1, 25)]))
        )
        assert len(got) == 1
        u, no, n, s, e = got[0]
        assert (u, no, n) == (1, 0, 3)
        assert s == "2024-01-01 00:00:00.000000"
        assert e == "2024-01-01 00:25:00.000000"

    def test_break_opens_next_session_number(self, ray_session):
        """A new event past the gap closes the prior last session
        unchanged and opens session last_no + 1."""
        prior = relational.sessionize(
            _events([(1, 0), (1, 100)])  # two prior sessions: 0 and 1
        )
        got = _sessions(
            relational.sessionize_incremental(prior, _events([(1, 200)]))
        )
        assert [(no, n) for _, no, n, _, _ in got] == [(0, 1), (1, 1), (2, 1)]
        assert got[1][3] == got[1][4] == "2024-01-01 01:40:00.000000"

    def test_prior_only_user_passes_through(self, ray_session):
        """A user absent from the new batch keeps identical rows."""
        prior = relational.sessionize(_events([(5, 0), (5, 100), (6, 0)]))
        got = _sessions(
            relational.sessionize_incremental(prior, _events([(6, 600)]))
        )
        want_5 = [r for r in _sessions(prior) if r[0] == 5]
        assert [r for r in got if r[0] == 5] == want_5
        assert [(no, n) for u, no, n, _, _ in got if u == 6] == [(0, 1), (1, 1)]

    def test_new_only_user_numbers_from_zero(self, ray_session):
        prior = relational.sessionize(_events([(1, 0)]))
        got = _sessions(
            relational.sessionize_incremental(
                prior, _events([(9, 600), (9, 700)])
            )
        )
        assert [(no, n) for u, no, n, _, _ in got if u == 9] == [
            (0, 1),
            (1, 1),
        ]

    def test_partition_invariance(self, ray_session):
        rows_old = [(u, m) for u in range(6) for m in (0, 10, 200)]
        rows_new = [(u, m) for u in range(6) for m in (210, 700)]
        a = _sessions(
            relational.sessionize_incremental(
                relational.sessionize(_events(rows_old, parts=1)),
                _events(rows_new, parts=1),
            )
        )
        b = _sessions(
            relational.sessionize_incremental(
                relational.sessionize(_events(rows_old, parts=7)),
                _events(rows_new, parts=5),
            )
        )
        assert a == b == _sessions(
            relational.sessionize(_events(rows_old + rows_new))
        )


def _ev(rows, parts=4):
    """rows: (user_id, event_type, minutes, value)."""
    ts = [
        EPOCH + datetime.timedelta(minutes=int(m)) for _, _, m, _ in rows
    ]
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "event_id": pa.array(range(len(rows)), type=pa.int64()),
                "user_id": pa.array(
                    [r[0] for r in rows], type=pa.int64()
                ),
                "event_type": pa.array(
                    [r[1] for r in rows], type=pa.string()
                ),
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "value": pa.array(
                    [float(r[3]) for r in rows], type=pa.float64()
                ),
            }
        )
    ).repartition(parts)


class TestKsStatistic:
    def _replay(self, va, vb):
        ca = sorted(int(np.floor(v * 100 + 0.5)) for v in va)
        cb = sorted(int(np.floor(v * 100 + 0.5)) for v in vb)
        na, nb = len(ca), len(cb)
        best = 0
        for v in sorted(set(ca) | set(cb)):
            fa = sum(1 for x in ca if x <= v)
            fb = sum(1 for x in cb if x <= v)
            best = max(best, abs(fa * nb - fb * na))
        return na, nb, best, na * nb

    def test_matches_plain_python_replay(self, ray_session):
        rng = np.random.RandomState(3)
        va = np.round(rng.exponential(50, 300), 2) + 0.01
        vb = np.round(rng.exponential(80, 200), 2) + 0.01
        rows = [(0, "click", i % 999, v) for i, v in enumerate(va)]
        rows += [(1, "purchase", i % 999, v) for i, v in enumerate(vb)]
        rows += [(2, "view", 5, 9.99)] * 40  # other types ignored
        got = relational.ks_statistic(_ev(rows)).take_all()[0]
        na, nb, num, den = self._replay(va, vb)
        assert (
            got["n_a"], got["n_b"], got["ks_num"], got["ks_den"]
        ) == (na, nb, num, den)

    def test_identical_samples_zero(self, ray_session):
        vals = [1.23, 4.56, 7.89, 1.23]
        rows = [(0, "click", i, v) for i, v in enumerate(vals)]
        rows += [(1, "purchase", i, v) for i, v in enumerate(vals)]
        got = relational.ks_statistic(_ev(rows)).take_all()[0]
        assert got["ks_num"] == 0

    def test_disjoint_supports_max(self, ray_session):
        rows = [(0, "click", i, 1.0 + i * 0.01) for i in range(10)]
        rows += [(1, "purchase", i, 100.0 + i * 0.01) for i in range(7)]
        got = relational.ks_statistic(_ev(rows)).take_all()[0]
        assert got["ks_num"] == got["ks_den"] == 70


class TestChi2Independence:
    def test_matches_plain_python_replay(self, ray_session):
        rng = np.random.RandomState(5)
        rows = []
        for i in range(800):
            et = ["click", "view", "error"][rng.randint(3)]
            rows.append((i, et, int(rng.randint(0, 60 * 24)), 1.0))
        got = {
            (r["event_type"], r["hour"]): r
            for r in relational.chi2_independence(_ev(rows)).take_all()
        }
        obs = {}
        for _, et, mins, _ in rows:
            h = (mins // 60) % 24
            obs[(et, h)] = obs.get((et, h), 0) + 1
        n = sum(obs.values())
        rt, ct = {}, {}
        for (et, h), o in obs.items():
            rt[et] = rt.get(et, 0) + o
            ct[h] = ct.get(h, 0) + o
        assert set(got) == set(obs)
        for (et, h), o in obs.items():
            en = rt[et] * ct[h]
            cell = ((o * n - en) ** 2 * 10**6) // (en * n)
            g = got[(et, h)]
            assert (g["observed"], g["expected_num"], g["cell_fp6"]) == (
                o, en, cell
            )

    def test_perfectly_independent_zero(self, ray_session):
        # every (type, hour) cell has the same count -> chi2 == 0
        rows = []
        for et in ("click", "view"):
            for h in range(24):
                for k in range(3):
                    rows.append((0, et, h * 60 + k, 1.0))
        got = relational.chi2_independence(_ev(rows)).take_all()
        assert len(got) == 48
        assert all(r["cell_fp6"] == 0 for r in got)


class TestCumulativeDistinctUsers:
    def test_first_seen_only_and_running_total(self, ray_session):
        rows = [
            (1, "view", 0, 1.0),        # day 0: users 1,2
            (2, "view", 10, 1.0),
            (1, "view", 60 * 24, 1.0),  # day 1: user 1 again (not new), 3 new
            (3, "view", 60 * 24 + 5, 1.0),
            (4, "view", 60 * 72, 1.0),  # day 3: user 4
        ]
        got = relational.cumulative_distinct_users(_ev(rows)).take_all()
        assert [
            (r["day"], r["new_users"], r["cum_users"]) for r in got
        ] == [
            ("2024-01-01", 2, 2),
            ("2024-01-02", 1, 3),
            ("2024-01-04", 1, 4),
        ]

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(7)
        rows = [
            (int(rng.randint(40)), "view", int(rng.randint(60 * 24 * 9)), 1.0)
            for _ in range(400)
        ]
        a = relational.cumulative_distinct_users(_ev(rows, parts=1)).take_all()
        b = relational.cumulative_distinct_users(_ev(rows, parts=9)).take_all()
        assert a == b
        assert a[-1]["cum_users"] == len({r[0] for r in rows})


class TestTimeToConversion:
    def test_edge_cases(self, ray_session):
        rows = [
            (1, "click", 0, 1.0), (1, "purchase", 30, 1.0),   # converts
            (2, "purchase", 0, 1.0), (2, "click", 30, 1.0),   # wrong order
            (3, "click", 0, 1.0),                             # never buys
            (4, "purchase", 0, 1.0),                          # no click
            (5, "click", 10, 1.0), (5, "click", 5, 1.0),      # first click @5
            (5, "purchase", 65, 1.0), (5, "purchase", 99, 1.0),
        ]
        got = {
            r["user_id"]: r["delta_us"]
            for r in relational.time_to_conversion(_ev(rows)).take_all()
        }
        assert got == {1: 30 * 60_000_000, 5: 60 * 60_000_000}


class TestMutualNnPairs:
    def _emb(self, mat, parts=4):
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "vec_id": pa.array(range(len(mat)), type=pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, r)) for r in mat],
                        type=pa.list_(pa.float32()),
                    ),
                }
            )
        ).repartition(parts)

    def _exact(self, mat):
        from tableextraction_ray.functions.similarity import (
            _cos_matrix, _fp5, _quantize,
        )

        q = _quantize(mat.astype(np.float64))
        cos = _fp5(_cos_matrix(q, q))
        np.fill_diagonal(cos, np.iinfo(np.int64).min)
        nn = np.argmax(cos, axis=1)
        out = set()
        for i, j in enumerate(nn):
            if nn[j] == i and i < j:
                out.add((i, int(j), int(cos[i, j])))
        return out

    def test_matches_bruteforce_replay(self, ray_session):
        from tableextraction_ray.functions import similarity

        rng = np.random.RandomState(9)
        mat = rng.randn(80, 8).astype(np.float32)
        got = {
            (r["vec_a"], r["vec_b"], r["cos_fp5"])
            for r in similarity.mutual_nn_pairs(self._emb(mat)).take_all()
        }
        assert got == self._exact(mat)
        assert len(got) > 0

    def test_lsh_route_on_tight_pairs(self, ray_session):
        """Forced fallback: vectors in tight near-identical pairs, far
        apart across pairs — the candidate graph has every true pair,
        so the approximate route equals the exact one."""
        from tableextraction_ray.functions import similarity

        rng = np.random.RandomState(13)
        base = rng.randn(30, 16)
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        mat = np.repeat(base, 2, axis=0)
        mat += rng.randn(*mat.shape) * 1e-3  # twins stay ~identical
        exact = {
            (r["vec_a"], r["vec_b"])
            for r in similarity.mutual_nn_pairs(
                self._emb(mat.astype(np.float32)), dim=16
            ).take_all()
        }
        approx = {
            (r["vec_a"], r["vec_b"])
            for r in similarity.mutual_nn_pairs(
                self._emb(mat.astype(np.float32)),
                broadcast_row_limit=0, dim=16,
            ).take_all()
        }
        # every twin pair is mutual and must survive both routes
        twins = {(2 * i, 2 * i + 1) for i in range(30)}
        assert twins <= exact
        assert approx == exact


class TestBpeMergeStep:
    def _docs(self, texts, parts=3):
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array(
                        range(len(texts)), type=pa.int64()
                    ),
                    "text": pa.array(texts, type=pa.string()),
                }
            )
        ).repartition(parts)

    def test_matches_counter_replay(self, ray_session):
        from collections import Counter

        from tableextraction_ray.functions import textstats

        texts = [
            "low lower lowest low",
            "newer newest new low",
            "wider wide widest",
        ] * 5
        got = [
            (r["left_sym"], r["right_sym"], r["n"])
            for r in textstats.bpe_merge_step(
                self._docs(texts), k=10
            ).take_all()
        ]
        wc: Counter = Counter()
        for t in texts:
            wc.update(t.split())
        pc_: Counter = Counter()
        for w, c in wc.items():
            for i in range(len(w) - 1):
                pc_[(w[i], w[i + 1])] += c
        want = sorted(
            ((l, r, n) for (l, r), n in pc_.items()),
            key=lambda x: (-x[2], x[0], x[1]),
        )[:10]
        assert got == want

    def test_multiplicity_within_token(self, ray_session):
        from tableextraction_ray.functions import textstats

        got = textstats.bpe_merge_step(
            self._docs(["aaa aaa"]), k=5
        ).take_all()
        assert [(r["left_sym"], r["right_sym"], r["n"]) for r in got] == [
            ("a", "a", 4)
        ]


class TestZorderKeys:
    def test_matches_replay_and_partition_invariance(self, ray_session):
        rng = np.random.RandomState(17)
        rows = [
            (0, "view", int(rng.randint(0, 60 * 24 * 20)),
             float(np.round(rng.uniform(0.01, 400), 2)))
            for _ in range(500)
        ]
        a = sorted(
            (r["z"], r["n"])
            for r in relational.zorder_keys(_ev(rows, parts=1)).take_all()
        )
        b = sorted(
            (r["z"], r["n"])
            for r in relational.zorder_keys(_ev(rows, parts=9)).take_all()
        )
        assert a == b
        # replay
        c = np.floor(np.array([r[3] for r in rows]) * 100 + 0.5).astype(
            np.int64
        )
        t = np.array(
            [
                int(
                    (
                        EPOCH + datetime.timedelta(minutes=r[2])
                        - datetime.datetime(1970, 1, 1)
                    ).total_seconds()
                )
                * 1_000_000
                for r in rows
            ],
            dtype=np.int64,
        )
        qc = (c - c.min()) * 255 // max(int(c.max() - c.min()), 1)
        qt = (t - t.min()) * 255 // max(int(t.max() - t.min()), 1)
        z = np.zeros(len(qc), dtype=np.int64)
        for i in range(8):
            z |= ((qc >> i) & 1) << (2 * i)
            z |= ((qt >> i) & 1) << (2 * i + 1)
        zu, cnt = np.unique(z, return_counts=True)
        assert a == sorted(zip(zu.tolist(), cnt.tolist()))
        assert sum(n for _, n in a) == 500

    def test_constant_dim(self, ray_session):
        rows = [(0, "view", m, 5.0) for m in range(20)]
        got = relational.zorder_keys(_ev(rows)).take_all()
        # value dim constant -> qc == 0 -> z uses only odd bits
        assert all((r["z"] & 0x5555555555555555) == 0 for r in got)
        assert sum(r["n"] for r in got) == 20


class TestLateEventLateness:
    def test_matches_plain_python_replay(self, ray_session):
        import hashlib

        rng = np.random.RandomState(19)
        mins = rng.permutation(300)
        rows = [(0, "view", int(m), 1.0) for m in mins]
        got = sorted(
            (r["event_id"], r["lateness_us"])
            for r in relational.late_event_lateness(
                _ev(rows, parts=7)
            ).take_all()
        )
        order = sorted(
            range(len(rows)),
            key=lambda i: (
                int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16),
                i,
            ),
        )
        ts = [
            int(
                (
                    EPOCH + datetime.timedelta(minutes=rows[i][2])
                    - datetime.datetime(1970, 1, 1)
                ).total_seconds()
            )
            * 1_000_000
            for i in range(len(rows))
        ]
        want, wm = [], None
        for i in order:
            if wm is not None and wm > ts[i]:
                want.append((i, wm - ts[i]))
            wm = ts[i] if wm is None else max(wm, ts[i])
        assert got == sorted(want)
        assert len(got) > 50  # shuffled order makes it non-vacuous


class TestSpanMediaLocality:
    def _corpus(self, docs, parts=2):
        span_t = pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
        rows = []
        for did, kinds in docs:
            rows.append(
                {
                    "doc_id": did,
                    "spans": [
                        {
                            "kind": k,
                            "text": f"t{j}" if k == "text" else "",
                            "media_ref": f"m{j}" if k == "media" else "",
                            "offset": j,
                        }
                        for j, k in enumerate(kinds)
                    ],
                }
            )
        t = pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("doc_id", pa.string()), ("spans", pa.list_(span_t))]
            ),
        )
        return ray.data.from_arrow(t).repartition(parts)

    def test_nearest_distance_histogram(self, ray_session):
        from tableextraction_ray.functions import interleaved

        docs = [
            ("a", ["text", "media", "text"]),        # dist 1
            ("b", ["media", "text", "text", "media"]),  # 1 and 1
            ("c", ["media", "media"]),               # no text: -1, -1
            ("d", ["text", "text", "text", "media"]),   # dist 1
            ("e", ["media", "text", "media", "media"]),  # 1, 1, 2
        ]
        got = sorted(
            (r["dist"], r["n"])
            for r in interleaved.span_media_locality(
                self._corpus(docs)
            ).take_all()
        )
        assert got == [(-1, 2), (1, 6), (2, 1)]


class TestF2SelfjoinSize:
    def _li(self, keys, parts=5):
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {"l_partkey": pa.array(keys, type=pa.int64())}
            )
        ).repartition(parts)

    def test_exact_and_estimator_replay(self, ray_session):
        import hashlib

        from tableextraction_ray.functions import sketch

        rng = np.random.RandomState(23)
        keys = rng.zipf(1.5, 2000).astype(np.int64) % 300
        got = sketch.f2_selfjoin_size(self._li(keys.tolist())).take_all()[0]
        from collections import Counter

        cnt = Counter(keys.tolist())
        exact = sum(c * c for c in cnt.values())
        assert got["exact_f2"] == exact
        # replay the count-sketch
        depth, width = 5, 256
        cells = {}
        for k, c in cnt.items():
            sk = str(k)
            for j in range(depth):
                col = int(
                    hashlib.md5(f"{j}:{sk}".encode()).hexdigest()[:15], 16
                ) % width
                s = 1 if int(
                    hashlib.md5(f"s{j}:{sk}".encode()).hexdigest()[0], 16
                ) % 2 == 0 else -1
                cells[(j, col)] = cells.get((j, col), 0) + s * c
        ests = sorted(
            sum(v * v for (j2, _), v in cells.items() if j2 == j)
            for j in range(depth)
        )
        assert got["est_f2"] == ests[2]
        assert got["err_fp6"] == abs(ests[2] - exact) * 1_000_000 // exact
        # AMS median-of-5 at width 256 on 300 keys: sane estimate
        assert got["err_fp6"] < 500_000

    def test_partition_invariance(self, ray_session):
        from tableextraction_ray.functions import sketch

        keys = list(range(50)) * 4
        a = sketch.f2_selfjoin_size(self._li(keys, parts=1)).take_all()
        b = sketch.f2_selfjoin_size(self._li(keys, parts=11)).take_all()
        assert a == b
        assert a[0]["exact_f2"] == 50 * 16


class TestBenfordAudit:
    def test_counts_and_expected(self, ray_session):
        import math

        # cents: 123 -> 1, 45 -> 4, 9 -> 9, 900 -> 9, 0 -> dropped
        rows = [
            (0, "view", 0, 1.23),
            (0, "view", 1, 0.45),
            (0, "view", 2, 0.09),
            (0, "view", 3, 9.00),
            (0, "view", 4, 0.0),
        ]
        got = sorted(
            (r["digit"], r["n"], r["expected_fp6"])
            for r in relational.benford_audit(_ev(rows)).take_all()
        )
        e = lambda d: int(
            math.floor(math.log(1 + 1.0 / d) / math.log(10) * 1e6 + 0.5)
        )
        assert got == [(1, 1, e(1)), (4, 1, e(4)), (9, 2, e(9))]

    def test_benford_shaped_input(self, ray_session):
        # log-uniform values follow Benford closely
        rng = np.random.RandomState(29)
        vals = np.round(10 ** rng.uniform(-1, 3, 5000), 2)
        rows = [(0, "view", i % 999, float(v)) for i, v in enumerate(vals)]
        got = {
            r["digit"]: r for r in relational.benford_audit(_ev(rows)).take_all()
        }
        n_tot = sum(r["n"] for r in got.values())
        for d in range(1, 10):
            share = got[d]["n"] / n_tot * 1e6
            assert abs(share - got[d]["expected_fp6"]) < 40_000  # ±4 pp


class TestTrimmedMeanByType:
    def test_matches_sorted_replay(self, ray_session):
        rng = np.random.RandomState(31)
        rows = []
        for et in ("click", "view"):
            for i in range(137):
                rows.append(
                    (0, et, i, float(np.round(rng.exponential(40), 2)))
                )
        got = {
            r["event_type"]: r
            for r in relational.trimmed_mean_by_type(
                _ev(rows, parts=6)
            ).take_all()
        }
        for et in ("click", "view"):
            cents = sorted(
                int(np.floor(v * 100 + 0.5))
                for _, e, _, v in rows
                if e == et
            )
            n = len(cents)
            k = n // 20
            g = got[et]
            assert (g["n"], g["n_kept"], g["trimmed_sum_c"]) == (
                n, n - 2 * k, sum(cents[k : n - k])
            )

    def test_small_group_untouched(self, ray_session):
        rows = [(0, "click", i, 1.0 + i) for i in range(5)]  # k = 0
        got = relational.trimmed_mean_by_type(_ev(rows)).take_all()[0]
        assert (got["n"], got["n_kept"]) == (5, 5)
        assert got["trimmed_sum_c"] == sum(
            int(np.floor((1.0 + i) * 100 + 0.5)) for i in range(5)
        )

    def test_ties_at_cut_exact(self, ray_session):
        # 40 identical values + extremes: trimming must count order
        # statistics, not drop all ties
        rows = [(0, "click", i, 5.0) for i in range(40)]
        rows += [(0, "click", 100 + i, 0.01) for i in range(2)]
        rows += [(0, "click", 200 + i, 99.0) for i in range(2)]
        got = relational.trimmed_mean_by_type(_ev(rows)).take_all()[0]
        n = 44
        k = n // 20  # 2 -> drops exactly the two 1-cent and two 9900 rows
        assert got["n_kept"] == 40
        assert got["trimmed_sum_c"] == 40 * 500


class TestDupGraphAssortativity:
    def _emb(self, mat, parts=4):
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "vec_id": pa.array(range(len(mat)), type=pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, r)) for r in mat],
                        type=pa.list_(pa.float32()),
                    ),
                }
            )
        ).repartition(parts)

    def test_matches_networkless_replay(self, ray_session):
        from collections import Counter

        from tableextraction_ray.functions import similarity
        from tableextraction_ray.functions.similarity import (
            _cos_matrix, _fp5, _quantize,
        )

        rng = np.random.RandomState(37)
        base = rng.randn(12, 8)
        mat = np.vstack([base + rng.randn(12, 8) * 0.05 for _ in range(4)])
        got = similarity.dup_graph_assortativity(
            self._emb(mat.astype(np.float32))
        ).take_all()[0]
        q = _quantize(mat.astype(np.float64))
        cos = _fp5(_cos_matrix(q, q))
        edges = [
            (i, j)
            for i in range(len(mat))
            for j in range(len(mat))
            if i < j and cos[i, j] >= 35000
        ]
        deg = Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        dir_edges = edges + [(b, a) for a, b in edges]
        assert got["n_dir"] == len(dir_edges)
        assert got["sum_d"] == sum(deg[a] for a, _ in dir_edges)
        assert got["sum_d2"] == sum(deg[a] ** 2 for a, _ in dir_edges)
        assert got["sum_dxdy"] == sum(
            deg[a] * deg[b] for a, b in dir_edges
        )
        assert got["n_dir"] > 0


class TestLangIdConfusion:
    def test_confusion_counts(self, ray_session):
        from tableextraction_ray.functions import textstats

        rows = [
            ("ru", "привет мир снова"),       # cyr predicted
            ("ru", "hello world plain"),       # mislabeled -> lat
            ("en", "hello world again"),       # lat
            ("en", "опечатка всюду тут"),      # mislabeled -> cyr
            ("en", "plain text here"),
        ]
        t = pa.Table.from_pydict(
            {
                "doc_id": pa.array(range(len(rows)), type=pa.int64()),
                "lang": pa.array([r[0] for r in rows], type=pa.string()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )
        got = sorted(
            (r["lang"], r["pred_lang"], r["n"])
            for r in textstats.lang_id_confusion(
                ray.data.from_arrow(t).repartition(3)
            ).take_all()
        )
        assert got == [
            ("en", "cyr", 1),
            ("en", "lat", 2),
            ("ru", "cyr", 1),
            ("ru", "lat", 1),
        ]


class TestWsampleNoreplace:
    def _docs(self, weights, parts=5):
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array(
                        range(len(weights)), type=pa.int64()
                    ),
                    "n_chars": pa.array(weights, type=pa.int64()),
                }
            )
        ).repartition(parts)

    def _replay(self, weights, k):
        import hashlib
        import math

        keys = []
        for d, w in enumerate(weights):
            if w <= 0:
                continue
            h = int(
                hashlib.md5(f"ws:{d}".encode()).hexdigest()[:15], 16
            )
            keys.append(
                (-(math.log((h + 1) / 1152921504606846976.0) / w), d, w)
            )
        keys.sort()
        return [(d, w) for _, d, w in keys[:k]]

    def test_matches_replay_and_partition_invariance(self, ray_session):
        from tableextraction_ray.functions import selection

        rng = np.random.RandomState(41)
        weights = rng.randint(1, 5000, 400).tolist() + [0, 0]
        want = self._replay(weights, 50)
        for parts in (1, 9):
            got = [
                (r["doc_id"], r["n_chars"])
                for r in selection.wsample_noreplace(
                    self._docs(weights, parts=parts), k=50
                ).take_all()
            ]
            assert got == want
        assert len(want) == 50

    def test_weight_bias(self, ray_session):
        """Heavy docs must be overrepresented: with half the docs at
        weight 1000 and half at weight 1, the top-50 is dominated by
        heavy docs."""
        from tableextraction_ray.functions import selection

        weights = [1000] * 200 + [1] * 200
        got = selection.wsample_noreplace(
            self._docs(weights), k=50
        ).take_all()
        heavy = sum(1 for r in got if r["n_chars"] == 1000)
        assert heavy >= 45


class TestCorpusDatasheet:
    def test_counts_with_duplicates(self, ray_session):
        from tableextraction_ray.functions import textstats

        texts = ["aa bb cc", "aa bb cc", "dd ee", "ff", "dd ee"]
        t = pa.Table.from_pydict(
            {
                "doc_id": pa.array(range(5), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "source": pa.array(
                    ["s1", "s1", "s2", "s3", "s2"], type=pa.string()
                ),
                "lang": pa.array(
                    ["en", "en", "ru", "en", "ru"], type=pa.string()
                ),
            }
        )
        got = textstats.corpus_datasheet(
            ray.data.from_arrow(t).repartition(3)
        ).take_all()[0]
        assert got["n_docs"] == 5
        assert got["total_chars"] == sum(len(x) for x in texts)
        assert got["total_tokens"] == 11
        assert got["n_sources"] == 3
        assert got["n_langs"] == 2
        assert got["n_unique_texts"] == 3
        assert got["dup_ppm"] == 2 * 1_000_000 // 5
        assert got["vocab_size"] == 6

    def test_partition_invariance(self, ray_session):
        from tableextraction_ray.functions import textstats

        rng = np.random.RandomState(43)
        texts = [
            " ".join(
                rng.choice(["tok%d" % i for i in range(12)], 6)
            )
            for _ in range(120)
        ]
        t = pa.Table.from_pydict(
            {
                "doc_id": pa.array(range(120), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "source": pa.array(["s"] * 120, type=pa.string()),
                "lang": pa.array(["en"] * 120, type=pa.string()),
            }
        )
        a = textstats.corpus_datasheet(
            ray.data.from_arrow(t).repartition(1)
        ).take_all()
        b = textstats.corpus_datasheet(
            ray.data.from_arrow(t).repartition(9)
        ).take_all()
        assert a == b


class TestDailyRevenueAutocorr:
    def _orders(self, day_vals, parts=4):
        ts = [
            datetime.datetime(2024, 1, 1)
            + datetime.timedelta(days=int(d))
            for d, _ in day_vals
        ]
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "o_orderdate": pa.array(ts, type=pa.timestamp("us")),
                    "o_totalprice": pa.array(
                        [float(v) for _, v in day_vals],
                        type=pa.float64(),
                    ),
                }
            )
        ).repartition(parts)

    def test_matches_series_replay_with_gap(self, ray_session):
        # days 0,1,2 then a gap, then 5,6: pairs (0,1),(1,2),(5,6)
        rows = [
            (0, 10.0), (0, 5.0), (1, 20.0), (2, 7.5),
            (5, 100.0), (6, 40.0),
        ]
        got = relational.daily_revenue_autocorr(
            self._orders(rows)
        ).take_all()[0]
        series = {0: 15, 1: 20, 2: 7, 5: 100, 6: 40}  # dollars (floor)
        pairs = [(15, 20), (20, 7), (100, 40)]
        assert got["n_pairs"] == 3
        assert got["sum_x"] == sum(x for x, _ in pairs)
        assert got["sum_y"] == sum(y for _, y in pairs)
        assert got["sum_xy"] == sum(x * y for x, y in pairs)
        assert got["sum_x2"] == sum(x * x for x, _ in pairs)
        assert got["sum_y2"] == sum(y * y for _, y in pairs)

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(47)
        rows = [
            (int(rng.randint(0, 40)), float(np.round(rng.uniform(1, 500), 2)))
            for _ in range(600)
        ]
        a = relational.daily_revenue_autocorr(
            self._orders(rows, parts=1)
        ).take_all()
        b = relational.daily_revenue_autocorr(
            self._orders(rows, parts=9)
        ).take_all()
        assert a == b
        assert a[0]["n_pairs"] > 10


class TestSpanRunLengths:
    def test_rle_histogram(self, ray_session):
        from tableextraction_ray.functions import interleaved

        span_t = pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
        docs = [
            ("a", ["text", "text", "media", "media", "media", "text"]),
            ("b", ["media", "text", "text"]),
            ("c", ["text"]),
        ]
        rows = [
            {
                "doc_id": did,
                "spans": [
                    {"kind": k, "text": "", "media_ref": "", "offset": j}
                    for j, k in enumerate(kinds)
                ],
            }
            for did, kinds in docs
        ]
        t = pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("doc_id", pa.string()), ("spans", pa.list_(span_t))]
            ),
        )
        got = sorted(
            (r["kind"], r["run_len"], r["n_runs"])
            for r in interleaved.span_run_lengths(
                ray.data.from_arrow(t).repartition(2)
            ).take_all()
        )
        # runs: a: text2, media3, text1; b: media1, text2; c: text1
        assert got == [
            ("media", 1, 1),
            ("media", 3, 1),
            ("text", 1, 2),
            ("text", 2, 2),
        ]


class TestOrdersBacklogSeries:
    def test_step_function_replay(self, ray_session):
        base = datetime.datetime(1995, 1, 1)
        o = pa.Table.from_pydict(
            {
                "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
                "o_orderdate": pa.array(
                    [base, base + datetime.timedelta(days=1), base],
                    type=pa.timestamp("us"),
                ),
            }
        )
        # order 1 ships over days 2,4; order 2 ships day 2; order 3 no lines
        li = pa.Table.from_pydict(
            {
                "l_orderkey": pa.array([1, 1, 2], type=pa.int64()),
                "l_shipdate": pa.array(
                    [
                        base + datetime.timedelta(days=2),
                        base + datetime.timedelta(days=4),
                        base + datetime.timedelta(days=2),
                    ],
                    type=pa.timestamp("us"),
                ),
            }
        )
        got = [
            (r["day"], r["backlog"])
            for r in relational.orders_backlog_series(
                ray.data.from_arrow(o).repartition(2),
                ray.data.from_arrow(li).repartition(2),
            ).take_all()
        ]
        d0 = (base - datetime.datetime(1970, 1, 1)).days
        # day d0: order1 opens (1); d0+1: order2 opens (2); d0+3:
        # order2 closed after day 2 (1); d0+5: order1 closed (0).
        assert got == [
            (d0, 1), (d0 + 1, 2), (d0 + 3, 1), (d0 + 5, 0)
        ]


class TestTransitionEntropy:
    def test_deterministic_vs_uniform(self, ray_session):
        import math

        # user streams: after 'a' always 'b' (H=0); after 'b', a/c
        # evenly (H=ln 2)
        rows = []
        m = 0
        for u in range(8):
            seq = ["a", "b", "a", "b", "c"] if u % 2 else ["a", "b", "c"]
            for s in seq:
                rows.append((u, s, m, 1.0))
                m += 1
        got = {
            r["prev_type"]: r
            for r in relational.transition_entropy(
                _ev(rows, parts=5)
            ).take_all()
        }
        # replay
        from collections import Counter

        trans: Counter = Counter()
        byu: dict = {}
        for u, s, mm, _ in rows:
            byu.setdefault(u, []).append((mm, s))
        for u, seq in byu.items():
            seq = [s for _, s in sorted(seq)]
            for p, nx in zip(seq, seq[1:]):
                trans[(p, nx)] += 1
        agg: dict = {}
        for (p, _), c in trans.items():
            a = agg.setdefault(p, [0, 0, 0])
            a[0] += c
            a[1] += 1
            a[2] += math.floor(c * math.log(c) * 1e6)
        for p, (nt, k, s) in agg.items():
            want = math.floor(
                (math.log(nt) - (s / 1e6) / nt) * 1e6 + 0.5
            )
            g = got[p]
            assert (g["n_trans"], g["n_next_types"], g["ent_fp6"]) == (
                nt, k, want
            )
        # 'a' is always followed by 'b': zero entropy
        assert got["a"]["ent_fp6"] == 0


class TestBloomFprReport:
    def test_forced_fp_matches_replay(self, ray_session):
        import hashlib

        m, k = 128, 2  # deliberately tiny -> real false positives
        t = pa.Table.from_pydict(
            {
                "c_custkey": pa.array(range(400), type=pa.int64()),
                "c_mktsegment": pa.array(
                    [
                        "BUILDING" if i % 4 == 0 else "OTHER"
                        for i in range(400)
                    ],
                    type=pa.string(),
                ),
            }
        )
        got = relational.bloom_fpr_report(
            ray.data.from_arrow(t).repartition(5), m=m, k=k
        ).take_all()[0]

        def positions(key):
            return [
                int(
                    hashlib.md5(f"bloom:{j}:{key}".encode()).hexdigest()[
                        :15
                    ],
                    16,
                )
                % m
                for j in range(k)
            ]

        bits = set()
        for key in range(0, 400, 4):
            bits.update(positions(key))
        fp = sum(
            1
            for key in range(400)
            if key % 4 != 0 and all(p in bits for p in positions(key))
        )
        assert got["n_in"] == 100
        assert got["n_out"] == 300
        assert got["n_fp"] == fp
        assert got["fpr_ppm"] == fp * 1_000_000 // 300
        assert fp > 10  # the tiny filter must actually saturate


class TestPackingEfficiency:
    def test_matches_greedy_replay(self, ray_session):
        from tableextraction_ray.functions import textstats

        rng = np.random.RandomState(53)
        n_chars = rng.randint(50, 900, 200).tolist()
        t = pa.Table.from_pydict(
            {
                "doc_id": pa.array(range(200), type=pa.int64()),
                "n_chars": pa.array(n_chars, type=pa.int64()),
            }
        )
        got = textstats.packing_efficiency_report(
            ray.data.from_arrow(t).repartition(6),
            capacity=1000,
            shard_size=64,
        ).take_all()[0]
        # greedy next-fit replay per shard
        n_seqs = 0
        for shard in range(4):
            docs = [
                c
                for d, c in zip(range(200), n_chars)
                if d // 64 == shard
            ]
            if not docs:
                continue
            seqs, fill = 1, 0
            for c in docs:
                if fill + c <= 1000:
                    fill += c
                else:
                    seqs += 1
                    fill = c
            n_seqs += seqs
        assert got["n_docs"] == 200
        assert got["n_seqs"] == n_seqs
        assert got["used_chars"] == sum(n_chars)
        assert got["cap_chars"] == n_seqs * 1000
        assert got["util_ppm"] == sum(n_chars) * 1_000_000 // (n_seqs * 1000)


class TestWeightedMedianPrice:
    def _li(self, rows, parts=5):
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "l_extendedprice": pa.array(
                        [float(p) for p, _ in rows], type=pa.float64()
                    ),
                    "l_quantity": pa.array(
                        [float(w) for _, w in rows], type=pa.float64()
                    ),
                }
            )
        ).repartition(parts)

    def _replay(self, rows):
        pairs = sorted(
            (int(np.floor(p * 100 + 0.5)), int(w)) for p, w in rows
        )
        tw = sum(w for _, w in pairs)
        target = (tw + 1) // 2
        cum = 0
        for c, w in pairs:
            cum += w
            if cum >= target:
                return tw, target, c
        raise AssertionError

    def test_matches_replay(self, ray_session):
        rng = np.random.RandomState(59)
        rows = [
            (float(np.round(rng.uniform(1, 900), 2)), int(rng.randint(1, 50)))
            for _ in range(3000)
        ]
        from tableextraction_ray.functions import sketch

        got = sketch.weighted_median_price(self._li(rows)).take_all()[0]
        tw, target, med = self._replay(rows)
        assert (
            got["total_weight"], got["target_rank"], got["med_c"]
        ) == (tw, target, med)

    def test_heavy_single_value_dominates(self, ray_session):
        from tableextraction_ray.functions import sketch

        # one cheap line carries 90% of the units -> it IS the median
        rows = [(500.0, 1)] * 10 + [(3.33, 200)]
        got = sketch.weighted_median_price(self._li(rows)).take_all()[0]
        assert got["med_c"] == 333

    def test_forced_multi_iteration(self, ray_session):
        from tableextraction_ray.functions import sketch

        # bins=2 forces the refinement loop to iterate many times
        rng = np.random.RandomState(61)
        rows = [
            (float(np.round(rng.uniform(1, 5000), 2)), int(rng.randint(1, 9)))
            for _ in range(800)
        ]
        got = sketch.weighted_median_price(
            self._li(rows), bins=2, max_iters=40
        ).take_all()[0]
        assert got["med_c"] == self._replay(rows)[2]


class TestBenchSuiteConsistency:
    def test_every_suite_name_resolves_and_is_unique(self):
        """bench.py's QUERY_SUITE must stay a duplicate-free subset of
        queries() — a stale name would crash the driver's bench run."""
        import importlib.util

        import __ray_entry__ as entry_mod

        spec = importlib.util.spec_from_file_location(
            "bench_mod", "/root/repo/bench.py"
        )
        bench_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench_mod)
        q = set(entry_mod.queries())
        missing = [n for n in bench_mod.QUERY_SUITE if n not in q]
        assert missing == []
        assert len(set(bench_mod.QUERY_SUITE)) == len(bench_mod.QUERY_SUITE)


class TestUserValueMobility:
    def test_matches_plain_python_replay(self, ray_session):
        rng = np.random.RandomState(67)
        rows = []
        for u in range(60):
            for w in range(4):
                for _ in range(rng.randint(1, 5)):
                    rows.append(
                        (
                            u,
                            "view",
                            w * 7 * 24 * 60 + int(rng.randint(0, 7 * 24 * 60)),
                            float(np.round(rng.uniform(1, 300), 2)),
                        )
                    )
        got = sorted(
            (r["q_from"], r["q_to"], r["n"])
            for r in relational.user_value_mobility(
                _ev(rows, parts=7)
            ).take_all()
        )
        # replay
        from collections import Counter, defaultdict

        agg = defaultdict(lambda: [0, 0])
        for u, _, mins, v in rows:
            epoch_us = int(
                (
                    EPOCH + datetime.timedelta(minutes=mins)
                    - datetime.datetime(1970, 1, 1)
                ).total_seconds()
            ) * 1_000_000
            wk = epoch_us // (7 * 86_400_000_000)
            a = agg[(u, wk)]
            a[0] += int(np.floor(v * 100 + 0.5))
            a[1] += 1
        avgs = {
            k: (sc * 1_000_000 // n) for k, (sc, n) in agg.items()
        }
        # NTILE(4) per week
        tiles = {}
        for wk in {k[1] for k in agg}:
            rowsw = sorted(
                ((avgs[(u, w)], u) for (u, w) in agg if w == wk)
            )
            n = len(rowsw)
            base, rem = n // 4, n % 4
            big = rem * (base + 1)
            for i, (_, u) in enumerate(rowsw):
                t = (
                    i // (base + 1)
                    if i < big
                    else rem + (i - big) // max(base, 1)
                ) + 1
                tiles[(u, wk)] = t
        c: Counter = Counter()
        for (u, wk), t in tiles.items():
            nxt = tiles.get((u, wk + 1))
            if nxt is not None:
                c[(t, nxt)] += 1
        want = sorted((f, to, n) for (f, to), n in c.items())
        assert got == want
        assert sum(n for _, _, n in got) == sum(c.values()) > 100
