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
