"""Distinct-count operators over the event stream: exact two-phase and a
HyperLogLog sketch.

The two sides of the 100 TB cardinality story:

- ``hourly_users``: EXACT distinct counting, two-phase — per-batch local
  (hour, user) dedup shrinks the exchange, one keyed groupby dedups
  globally, a per-key count follows. The shuffle moves one row per
  distinct (hour, user) — never per event. SQL oracle: COUNT(DISTINCT).
- ``hourly_users_hll``: ONE-pass approximate counting — each batch folds
  its events into fixed 2^p-register HyperLogLog partials, the groupby
  merges registers by elementwise max (associative + commutative +
  idempotent, so re-execution/retries can't corrupt it), the estimator
  runs per key. Memory per key is 2^p bytes regardless of cardinality;
  this is what replaces the exact groupby when the distinct set itself
  no longer fits a shuffle. Deterministic md5 hashing — and since the
  sketch is deterministic GIVEN the hash, it now has a full DuckDB
  oracle: same bucket/rank split, register max in SQL, and a
  bit-reproducible estimator (exact integer harmonic sum, one fixed
  IEEE-double expression — see ``_hll_estimate``). Approximate vs
  reality, exact vs the algorithm; the error bound vs the exact
  operator stays asserted in tests (standard error ~1.04/sqrt(2^p)).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count

HLL_P = 12  # 4096 registers, ~1.6 % standard error


def _hour_col(batch: pa.Table) -> pa.Array:
    return pc.strftime(
        pc.floor_temporal(batch["ts"], unit="hour"), format="%Y-%m-%d %H:00:00"
    )


def hourly_users(events: ray.data.Dataset) -> ray.data.Dataset:
    """(hour, n_users) — exact distinct users per hour, two-phase."""

    def local_dedup(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict(
            {"hour": _hour_col(batch), "user_id": batch["user_id"]}
        )
        return t.group_by(["hour", "user_id"]).aggregate([])

    distinct = (
        events.map_batches(local_dedup, batch_format="pyarrow")
        .groupby(["hour", "user_id"])
        .aggregate(Count())
    )

    def drop_user(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({"hour": batch["hour"]})

    agg = (
        distinct.map_batches(drop_user, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Count())
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"hour": batch["hour"], "n_users": batch["count()"].cast(pa.int64())}
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def _hll_estimate(registers: np.ndarray) -> int:
    """Standard HLL estimator with the small-range linear-counting
    correction (Flajolet et al. 2007), in a BIT-REPRODUCIBLE form: the
    harmonic sum 2^-r is computed as the exact integer S = sum(2^(53-r))
    (rank <= 53 so every term is integral; Python int is arbitrary
    precision), then ONE fixed sequence of IEEE-double ops —
    ((alpha*m)*m)*2^53 / double(S) — so the DuckDB oracle evaluating the
    same expression over the same integer S reproduces the estimate
    bit-for-bit (summation-order float drift is what this kills). Ties
    round via floor(est + 0.5), matching SQL FLOOR."""
    import math

    m = float(len(registers))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s_int = sum(1 << (53 - int(r)) for r in registers)
    est = alpha * m * m * 9007199254740992.0 / float(s_int)
    if est <= 2.5 * m:
        zeros = int((registers == 0).sum())
        if zeros:
            est = m * math.log(m / zeros)
    return int(math.floor(est + 0.5))


def hourly_users_hll(events: ray.data.Dataset) -> ray.data.Dataset:
    """(hour, n_users_est) — approximate distinct users per hour in one
    pass: per-batch HLL partials, register-max merge per hour."""
    m = 1 << HLL_P

    PARTIAL_SCHEMA = pa.schema(
        [("hour", pa.string()), ("registers", pa.list_(pa.int8()))]
    )

    def partial(batch: pa.Table) -> pa.Table:
        # Dedup (hour, user) FIRST (same trick as the exact operator): HLL
        # folding is idempotent per distinct user, so per-event hashing is
        # pure waste. Then one md5 per distinct user (cached across hours)
        # and numpy-vectorized register index / rank extraction — no
        # per-event Python loop, no per-register branch.
        t = pa.Table.from_pydict(
            {"hour": _hour_col(batch), "user_id": batch["user_id"]}
        ).group_by(["hour", "user_id"]).aggregate([])
        hours = np.asarray(t["hour"].to_pylist())
        users = t["user_id"].to_pylist()
        hcache: dict = {}
        hs = np.empty(len(users), dtype=np.uint64)
        for i, u in enumerate(users):
            v = hcache.get(u)
            if v is None:
                v = hcache[u] = int.from_bytes(
                    hashlib.md5(str(u).encode()).digest()[:8], "big"
                )
            hs[i] = v
        idx = (hs & np.uint64(m - 1)).astype(np.int64)
        rank = ((64 - HLL_P) - _bit_length_u64(hs >> np.uint64(HLL_P)) + 1).astype(
            np.int8
        )
        per_hour: dict[str, np.ndarray] = {}
        for h in np.unique(hours):
            sel = hours == h
            regs = np.zeros(m, dtype=np.int8)
            np.maximum.at(regs, idx[sel], rank[sel])
            per_hour[str(h)] = regs
        return pa.Table.from_pydict(
            {
                "hour": pa.array(list(per_hour.keys()), type=pa.string()),
                "registers": pa.array(
                    [r.tolist() for r in per_hour.values()],
                    type=pa.list_(pa.int8()),
                ),
            },
            schema=PARTIAL_SCHEMA,
        )

    def merge(group: pa.Table) -> pa.Table:
        hour = group["hour"][0].as_py()
        regs = np.zeros(m, dtype=np.int8)
        for r in group["registers"].to_pylist():
            np.maximum(regs, np.asarray(r, dtype=np.int8), out=regs)
        return pa.Table.from_pydict(
            {
                "hour": pa.array([hour], type=pa.string()),
                "n_users_est": pa.array([_hll_estimate(regs)], type=pa.int64()),
            }
        )

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("hour")
        .map_groups(merge, batch_format="pyarrow")
    )


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized ``int.bit_length`` for uint64 arrays via binary
    decomposition — exact (no float log2, whose rounding at powers of two
    would corrupt ranks)."""
    x = x.copy()
    bl = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        x[big] >>= np.uint64(s)
    bl += x.astype(np.int64)  # x is now 0 or 1
    return bl


def _hll_fold_one(registers: np.ndarray, uid) -> None:
    """Scalar reference fold (kept for tests' cross-check of the
    vectorized batch path — hashing contract: first 8 md5 bytes
    big-endian, rank = leading-zero count of the top 64-p bits + 1)."""
    m = 1 << HLL_P
    h = int.from_bytes(hashlib.md5(str(uid).encode()).digest()[:8], "big")
    idx = h & (m - 1)
    rest = h >> HLL_P
    rank = (64 - HLL_P) - rest.bit_length() + 1
    if rank > registers[idx]:
        registers[idx] = rank


def hll_audience_overlap(
    events: ray.data.Dataset,
    type_a: str = "click",
    type_b: str = "purchase",
) -> ray.data.Dataset:
    """ONE row (type_a, type_b, n_a_est, n_b_est, n_union_est,
    n_inter_est) — HLL SET OPERATIONS: distinct-user audience of two
    event types, their union (elementwise register max — the defining
    mergeability property of the sketch) and their intersection via
    inclusion-exclusion (a + b − union, clamped at 0; the standard HLL
    intersection, error grows as the true overlap shrinks). The
    audience-overlap question ("how many purchasers also click?") at
    10^12 events without shuffling a single user id — registers are
    the only exchange.

    Scale shape: per-batch (side, registers) partials exactly as
    [[events_hourly_users_hll]]; ONE 2-key register-max groupby; the
    final row folds on the driver from two 4 KiB vectors. Estimator is
    the bit-reproducible integer-harmonic form (see _hll_estimate), so
    the whole report replays in SQL."""
    m = 1 << HLL_P

    PARTIAL_SCHEMA = pa.schema(
        [("side", pa.string()), ("registers", pa.list_(pa.int8()))]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = (
            pa.Table.from_pydict(
                {
                    "side": batch["event_type"],
                    "user_id": batch["user_id"],
                }
            )
            .filter(
                pc.is_in(
                    batch["event_type"],
                    value_set=pa.array([type_a, type_b]),
                )
            )
            .group_by(["side", "user_id"])
            .aggregate([])
        )
        sides = np.asarray(t["side"].to_pylist())
        users = t["user_id"].to_pylist()
        hcache: dict = {}
        hs = np.empty(len(users), dtype=np.uint64)
        for i, u in enumerate(users):
            v = hcache.get(u)
            if v is None:
                v = hcache[u] = int.from_bytes(
                    hashlib.md5(str(u).encode()).digest()[:8], "big"
                )
            hs[i] = v
        idx = (hs & np.uint64(m - 1)).astype(np.int64)
        rank = (
            (64 - HLL_P) - _bit_length_u64(hs >> np.uint64(HLL_P)) + 1
        ).astype(np.int8)
        out_sides, out_regs = [], []
        for s in np.unique(sides):
            sel = sides == s
            regs = np.zeros(m, dtype=np.int8)
            np.maximum.at(regs, idx[sel], rank[sel])
            out_sides.append(str(s))
            out_regs.append(regs.tolist())
        return pa.Table.from_pydict(
            {
                "side": pa.array(out_sides, type=pa.string()),
                "registers": pa.array(out_regs, type=pa.list_(pa.int8())),
            },
            schema=PARTIAL_SCHEMA,
        )

    def merge(group: pa.Table) -> pa.Table:
        side = group["side"][0].as_py()
        regs = np.zeros(m, dtype=np.int8)
        for r in group["registers"].to_pylist():
            np.maximum(regs, np.asarray(r, dtype=np.int8), out=regs)
        return pa.Table.from_pydict(
            {
                "side": pa.array([side], type=pa.string()),
                "registers": pa.array(
                    [regs.tolist()], type=pa.list_(pa.int8())
                ),
            },
            schema=PARTIAL_SCHEMA,
        )

    by_side = {
        r["side"]: np.asarray(r["registers"], dtype=np.int8)
        for r in events.select_columns(["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("side")
        .map_groups(merge, batch_format="pyarrow")
        .take_all()
    }
    regs_a = by_side.get(type_a, np.zeros(m, dtype=np.int8))
    regs_b = by_side.get(type_b, np.zeros(m, dtype=np.int8))
    n_a = _hll_estimate(regs_a)
    n_b = _hll_estimate(regs_b)
    n_union = _hll_estimate(np.maximum(regs_a, regs_b))
    n_inter = max(0, n_a + n_b - n_union)
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "type_a": pa.array([type_a], type=pa.string()),
                "type_b": pa.array([type_b], type=pa.string()),
                "n_a_est": pa.array([n_a], type=pa.int64()),
                "n_b_est": pa.array([n_b], type=pa.int64()),
                "n_union_est": pa.array([n_union], type=pa.int64()),
                "n_inter_est": pa.array([n_inter], type=pa.int64()),
            }
        )
    )


def audience_overlap_exact(
    events: ray.data.Dataset,
) -> ray.data.Dataset:
    """(type_a, type_b, n_a, n_b, n_inter, jaccard_fp6) — EXACT pairwise
    audience overlap of every unordered event-type pair:
    [[hll_audience_overlap]]'s exact twin (at small scale it validates
    the sketch; at 10^12 events the sketch replaces it).

    Scale shape: the event-type domain is tiny and bounded (one
    distinct scan builds a bit code per type), so each user's audience
    membership collapses to ONE int bitmask: per-block (user, mask) OR
    partials ride the single keyed exchange (functions/exchange.py
    keyed_fold 'or' — idempotent, merge-exact), per-mask counts fold to
    <= 2^#types ints on the driver, and all pair overlaps are popcount
    arithmetic over that tiny table. No per-user Python, no pair
    explosion, driver state O(2^#types + #blocks).

    Oracle: per-type DISTINCT counts + DISTINCT-user self-join per pair
    with the same fp6 Jaccard floor."""
    from ray.data.aggregate import Count

    from .exchange import keyed_fold

    types = sorted(
        r["event_type"]
        for r in events.select_columns(["event_type"])
        .groupby("event_type")
        .aggregate(Count())
        .take_all()
    )
    code = {t: 1 << i for i, t in enumerate(types)}

    def mask_partial(batch: pa.Table) -> pa.Table:
        users = batch["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ets = batch["event_type"].to_pylist()
        ms = np.fromiter(
            (code[t] for t in ets), dtype=np.int64, count=len(ets)
        )
        order = np.argsort(users, kind="stable")
        u_s, m_s = users[order], ms[order]
        new = np.ones(len(u_s), dtype=bool)
        if len(u_s) > 1:
            new[1:] = u_s[1:] != u_s[:-1]
        idx = np.flatnonzero(new)
        folded = np.bitwise_or.reduceat(m_s, idx) if len(u_s) else m_s
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(u_s[idx], type=pa.int64()),
                "mask": pa.array(folded, type=pa.int64()),
            }
        )

    per_user = keyed_fold(
        events.select_columns(["event_type", "user_id"]).map_batches(
            mask_partial, batch_format="pyarrow"
        ),
        "user_id",
        [("mask", "or")],
    )

    def mask_counts(batch: pa.Table) -> pa.Table:
        m = batch["mask"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(m, return_counts=True)
        return pa.Table.from_pydict(
            {
                "mask": pa.array(uniq, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    counts = {0: 0}
    for r in per_user.map_batches(
        mask_counts, batch_format="pyarrow"
    ).take_all():
        counts[r["mask"]] = counts.get(r["mask"], 0) + r["n"]

    rows = []
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            ba, bb = code[ta], code[tb]
            n_a = sum(n for m, n in counts.items() if m & ba)
            n_b = sum(n for m, n in counts.items() if m & bb)
            n_inter = sum(
                n for m, n in counts.items() if (m & ba) and (m & bb)
            )
            union = n_a + n_b - n_inter
            rows.append(
                {
                    "type_a": ta,
                    "type_b": tb,
                    "n_a": n_a,
                    "n_b": n_b,
                    "n_inter": n_inter,
                    "jaccard_fp6": (
                        n_inter * 1_000_000 // union if union else 0
                    ),
                }
            )
    return ray.data.from_arrow(
        pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("type_a", pa.string()),
                    ("type_b", pa.string()),
                    ("n_a", pa.int64()),
                    ("n_b", pa.int64()),
                    ("n_inter", pa.int64()),
                    ("jaccard_fp6", pa.int64()),
                ]
            ),
        )
    )


def hourly_value_percentiles(
    events: ray.data.Dataset, qs: tuple[int, ...] = (50, 95, 99)
) -> ray.data.Dataset:
    """(hour, n_events, p50_c, p95_c, p99_c) — exact per-hour latency-style
    percentiles over integer cents. Rank convention is explicit so the SQL
    oracle matches bit-for-bit: the q-th percentile is the value at 1-based
    rank ceil(q*n/100) in ascending order, computed with integer ceil
    division ((q*n + 99) // 100 — no float rounding anywhere). Each hour
    sorts inside its group (numpy), so a group costs one vectorized sort;
    hour-key grouping bounds group count, and value payloads are 8-byte
    ints through the shuffle."""
    import numpy as np

    from .relational import _cents

    def project(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"hour": _hour_col(batch), "value_c": _cents(batch["value"])}
        )

    names = [f"p{q}_c" for q in qs]

    def percentiles(group: pa.Table) -> pa.Table:
        hour = group["hour"][0].as_py()
        vals = np.sort(group["value_c"].to_numpy(zero_copy_only=False))
        n = len(vals)
        out = {
            "hour": pa.array([hour], type=pa.string()),
            "n_events": pa.array([n], type=pa.int64()),
        }
        for q, name in zip(qs, names):
            rank = (q * n + 99) // 100  # 1-based ceil rank
            out[name] = pa.array([int(vals[rank - 1])], type=pa.int64())
        return pa.Table.from_pydict(out)

    return (
        events.map_batches(project, batch_format="pyarrow")
        .groupby("hour")
        .map_groups(percentiles, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Count-min sketch — the point-frequency complement to the HLL cardinality
# sketch: heavy-hitter detection in bounded memory (D x W counters) with a
# one-sided guarantee (estimate >= true count, so no heavy hitter is ever
# missed). Deterministic md5 row hashes make the whole sketch — build,
# probe, threshold — bit-replayable in SQL.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 512


def _cms_col(j: int, token: str, width: int) -> int:
    """Column of ``token`` in sketch row ``j``: 60-bit md5 base hash of
    "j:token" mod width (same hex-parse contract as shingle_base_hash, so
    the DuckDB oracle reproduces it digit-for-digit)."""
    return (
        int(hashlib.md5(f"{j}:{token}".encode()).hexdigest()[:15], 16) % width
    )


def cms_heavy_hitters(
    docs: ray.data.Dataset,
    threshold: int = 100,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> ray.data.Dataset:
    """(token, est_count) — every whitespace token whose count-min estimate
    (min over ``depth`` rows of the hashed counters) reaches ``threshold``.
    est_count >= true count always (collisions only inflate), so the output
    is a superset of the true heavy hitters at the same threshold — the
    standard first-pass filter before an exact count of the survivors.

    Scale shape: pass 1 folds per-block D x W int64 counter partials on
    the driver (np.add.at — same fold as dsir_weights; the sketch is KBs
    regardless of corpus size) and broadcasts the counters once; pass 2
    probes each block's DISTINCT tokens against the broadcast sketch and
    emits only survivors, so the final dedup groupby shuffles heavy
    tokens only — never the vocabulary, never occurrences."""
    import ray as _ray

    from .textstats import ascii_tokens

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counters = np.zeros((depth, width), dtype=np.int64)
        cnt: Counter[str] = Counter()
        for t in batch["text"].to_pylist():
            cnt.update(ascii_tokens(t))
        for tok, c in cnt.items():  # one md5 per (row, DISTINCT token)
            for j in range(depth):
                counters[j, _cms_col(j, tok, width)] += c
        j_idx, w_idx = np.nonzero(counters)
        return pa.Table.from_pydict(
            {
                "j": pa.array(j_idx.tolist(), type=pa.int64()),
                "w": pa.array(w_idx.tolist(), type=pa.int64()),
                "c": pa.array(counters[j_idx, w_idx].tolist(), type=pa.int64()),
            }
        )

    counters = np.zeros((depth, width), dtype=np.int64)
    for b in docs.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        # np.add.at: iter_batches may concatenate several blocks' partials,
        # repeating (j, w) cells — fancy-index += would drop repeats.
        np.add.at(
            counters,
            (
                np.asarray(b["j"].to_pylist(), dtype=np.int64),
                np.asarray(b["w"].to_pylist(), dtype=np.int64),
            ),
            np.asarray(b["c"].to_pylist(), dtype=np.int64),
        )
    sketch_ref = _ray.put(counters)

    def probe(batch: pa.Table) -> pa.Table:
        sk = _ray.get(sketch_ref)
        seen: set[str] = set()
        for t in batch["text"].to_pylist():
            seen.update(ascii_tokens(t))
        toks, ests = [], []
        for tok in seen:
            est = int(
                min(sk[j, _cms_col(j, tok, width)] for j in range(depth))
            )
            if est >= threshold:
                toks.append(tok)
                ests.append(est)
        return pa.Table.from_pydict(
            {
                "token": pa.array(toks, type=pa.string()),
                "est_count": pa.array(ests, type=pa.int64()),
            }
        )

    from ray.data.aggregate import Min

    found = docs.map_batches(probe, batch_format="pyarrow")
    # dedupe tokens seen in several blocks; the estimate is a pure function
    # of the (global) sketch, identical everywhere — Min is just "pick one"
    deduped = found.groupby("token").aggregate(Min("est_count"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "token": batch["token"],
                "est_count": batch["min(est_count)"].cast(pa.int64()),
            }
        )

    return deduped.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Histogram quantile sketch — the rank-query member of the sketch trio
# (HLL = cardinality, CMS = point frequency, histogram = quantiles): exact
# per-key percentiles need the key's whole value set in one place (a sort),
# while fixed-bin histograms are tiny, MERGEABLE by addition, and answer any
# quantile with error bounded by one bin width. What replaces
# hourly_value_percentiles when a single hour's events no longer fit a
# group.
# ---------------------------------------------------------------------------

HIST_BIN_CENTS = 100  # $1 bins over integer cents


def select_ranks(
    vals: ray.data.Dataset,
    ranks: dict,
    lo: int,
    hi: int,
    bins: int = 4096,
    pull_limit: int = 200_000,
    max_iters: int = 8,
) -> dict:
    """Exact order statistics for MULTIPLE 1-based ranks of one int64
    column ``v`` in SHARED histogram-refinement passes — the multi-target
    core of [[value_quantiles_selection]] (factored out so
    [[range_partition_plan]] can select all its boundary ranks at once)
    and the same-rows sibling of [[select_rank_grouped]]. Each pass
    histograms every pending target's candidate range (deduplicated —
    targets usually share ranges early) with per-block np.bincount
    partials, walks each rank into its bucket, and pulls a bucket
    exactly once it is under ``pull_limit`` values. Returns
    {key: value} for every key in ``ranks``; O(log_bins(hi - lo))
    scan passes TOTAL, driver state O(#targets · bins) ints."""
    targets = {
        k: {"lo": int(lo), "hi": int(hi), "rank": int(r)}
        for k, r in ranks.items()
    }
    resolved: dict = {}
    for _ in range(max_iters):
        pending = {p: t for p, t in targets.items() if p not in resolved}
        if not pending:
            break
        # distinct candidate ranges this pass (targets often share)
        ranges = sorted({(t["lo"], t["hi"]) for t in pending.values()})

        def hist_partial(
            batch: pa.Table, _ranges=ranges, _bins=bins
        ) -> pa.Table:
            v = batch["v"].to_numpy(zero_copy_only=False)
            out_r, out_b, out_c = [], [], []
            for ri, (rlo, rhi) in enumerate(_ranges):
                w = (rhi - rlo) // _bins + 1
                sel = v[(v >= rlo) & (v <= rhi)]
                if len(sel) == 0:
                    continue
                cnt = np.bincount((sel - rlo) // w, minlength=_bins)
                nz = np.flatnonzero(cnt)
                out_r.extend([ri] * len(nz))
                out_b.extend(nz.tolist())
                out_c.extend(cnt[nz].tolist())
            return pa.Table.from_pydict(
                {
                    "ri": pa.array(out_r, type=pa.int64()),
                    "b": pa.array(out_b, type=pa.int64()),
                    "c": pa.array(out_c, type=pa.int64()),
                }
            )

        hists: dict[int, np.ndarray] = {
            ri: np.zeros(bins, dtype=np.int64) for ri in range(len(ranges))
        }
        for r in vals.map_batches(
            hist_partial, batch_format="pyarrow"
        ).take_all():
            hists[r["ri"]][r["b"]] += r["c"]
        for key, t in pending.items():
            rlo, rhi = t["lo"], t["hi"]
            ri = ranges.index((rlo, rhi))
            w = (rhi - rlo) // bins + 1
            cum = np.cumsum(hists[ri])
            b = int(np.searchsorted(cum, t["rank"]))
            in_bucket = int(hists[ri][b])
            t["rank"] -= int(cum[b - 1]) if b else 0
            t["lo"] = rlo + b * w
            t["hi"] = min(rhi, rlo + (b + 1) * w - 1)
            if t["lo"] == t["hi"]:
                resolved[key] = t["lo"]
            elif in_bucket <= pull_limit:
                # exact pull of one bucket's values (bounded)
                pulled = np.sort(
                    np.concatenate(
                        [
                            b2["v"].to_numpy(zero_copy_only=False)
                            for b2 in vals.map_batches(
                                lambda t2, _lo=t["lo"], _hi=t["hi"]: t2.filter(
                                    pc.and_(
                                        pc.greater_equal(t2["v"], _lo),
                                        pc.less_equal(t2["v"], _hi),
                                    )
                                ),
                                batch_format="pyarrow",
                            ).iter_batches(batch_format="pyarrow")
                        ]
                        or [np.empty(0, dtype=np.int64)]
                    )
                )
                resolved[key] = int(pulled[t["rank"] - 1])
    unresolved = [p for p in targets if p not in resolved]
    if unresolved:
        raise RuntimeError(
            f"selection did not converge for targets {unresolved} "
            f"within {max_iters} passes"
        )
    return resolved


def value_quantiles_selection(
    events: ray.data.Dataset,
    qs: tuple[int, ...] = (25, 50, 75, 99),
    bins: int = 4096,
    pull_limit: int = 200_000,
    max_iters: int = 8,
) -> ray.data.Dataset:
    """(pct, rank, value_c) — EXACT global percentiles of the integer
    cent values by DISTRIBUTED SELECTION (iterative histogram
    refinement), the no-sort path to order statistics: a global sort of
    10^12 rows is an all-to-all shuffle of every row, while selection
    needs only O(log_bins(domain)) SCAN passes, each reducing to
    ``bins`` mergeable int counters per block. Rank convention is the
    house exact ceil-rank (q*n + 99) // 100 (shared with
    [[events_hourly_percentiles]] / the histogram sketch).

    Per iteration: one filtered scan histograms the candidate range
    into ``bins`` equal integer buckets (per-block np.bincount
    partials; the driver folds O(bins · #blocks) ints), each target
    rank walks into its bucket, and when a target's bucket population
    is <= ``pull_limit`` the exact values of that bucket pull once and
    the rank indexes the sorted pull. The cent domain (<= ~2^40)
    resolves in 2-4 passes; fail-loud if ``max_iters`` can't shrink a
    pathological range (can't happen with integer widths: each pass
    divides the range by ``bins``).

    Oracle: ROW_NUMBER rank pick at the same ceil-ranks."""
    from ray.data.aggregate import Count, Max, Min

    from .relational import _cents

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({"v": _cents(batch["value"])})

    vals = events.map_batches(to_cents, batch_format="pyarrow").materialize()
    stats = vals.aggregate(
        Min("v", alias_name="lo"), Max("v", alias_name="hi"), Count()
    )
    n = int(stats["count()"])
    if n == 0:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "pct": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                    "value_c": pa.array([], type=pa.int64()),
                }
            )
        )
    glo, ghi = int(stats["lo"]), int(stats["hi"])
    resolved = select_ranks(
        vals,
        {pct: (pct * n + 99) // 100 for pct in qs},
        glo,
        ghi,
        bins=bins,
        pull_limit=pull_limit,
        max_iters=max_iters,
    )
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "pct": pa.array(sorted(qs), type=pa.int64()),
                "rank": pa.array(
                    [(p * n + 99) // 100 for p in sorted(qs)],
                    type=pa.int64(),
                ),
                "value_c": pa.array(
                    [resolved[p] for p in sorted(qs)], type=pa.int64()
                ),
            }
        )
    )


def range_partition_plan(
    events: ray.data.Dataset,
    n_parts: int = 8,
    bins: int = 4096,
    pull_limit: int = 200_000,
    max_iters: int = 8,
) -> ray.data.Dataset:
    """(part, hi_c, n_rows) — a BALANCED range-partitioning plan over the
    integer cent values: the P-1 boundary cut points a range shuffle /
    sorted write would use, picked as EXACT order statistics at ranks
    ceil(i·n/P), plus the realized per-partition row counts under the
    value rule ``b_{i-1} < v <= b_i`` (part 1 open below, part P open
    above; ``hi_c`` NULL for the last part). This is how a 10^12-row
    engine plans `sort`/`repartition` boundaries WITHOUT sorting: all
    P-1 boundaries resolve together through [[select_ranks]]'s shared
    histogram-refinement passes (O(log_bins(domain)) scans total,
    driver state O(P·bins) ints), then ONE more scan bincounts each
    block's rows into the P ranges via np.searchsorted. Ties sitting on
    a cut all land in the lower part (both sides use the value rule, so
    realized counts can deviate from n/P under heavy ties — that skew
    is exactly what the plan output lets a caller see before
    shuffling).

    Oracle: ROW_NUMBER rank picks for the boundaries + per-part
    range-predicate COUNTs."""
    from ray.data.aggregate import Count, Max, Min

    from .relational import _cents

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({"v": _cents(batch["value"])})

    empty = pa.Table.from_pydict(
        {
            "part": pa.array([], type=pa.int64()),
            "hi_c": pa.array([], type=pa.int64()),
            "n_rows": pa.array([], type=pa.int64()),
        }
    )
    vals = events.map_batches(to_cents, batch_format="pyarrow").materialize()
    stats = vals.aggregate(
        Min("v", alias_name="lo"), Max("v", alias_name="hi"), Count()
    )
    n = int(stats["count()"])
    if n == 0:
        return ray.data.from_arrow(empty)
    resolved = select_ranks(
        vals,
        {i: (i * n + n_parts - 1) // n_parts for i in range(1, n_parts)},
        int(stats["lo"]),
        int(stats["hi"]),
        bins=bins,
        pull_limit=pull_limit,
        max_iters=max_iters,
    )
    bounds = np.asarray(
        [resolved[i] for i in range(1, n_parts)], dtype=np.int64
    )

    def part_counts(batch: pa.Table, _b=bounds, _p=n_parts) -> pa.Table:
        v = batch["v"].to_numpy(zero_copy_only=False)
        # v <= b_i -> part i (1-based); above every boundary -> part P
        cnt = np.bincount(np.searchsorted(_b, v, side="left"), minlength=_p)
        return pa.Table.from_pydict(
            {
                "part": pa.array(np.arange(1, _p + 1), type=pa.int64()),
                "c": pa.array(cnt, type=pa.int64()),
            }
        )

    totals = np.zeros(n_parts, dtype=np.int64)
    for r in vals.map_batches(part_counts, batch_format="pyarrow").take_all():
        totals[r["part"] - 1] += r["c"]
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "part": pa.array(range(1, n_parts + 1), type=pa.int64()),
                "hi_c": pa.array(
                    [int(b) for b in bounds] + [None], type=pa.int64()
                ),
                "n_rows": pa.array(totals, type=pa.int64()),
            }
        )
    )


def hourly_value_quantiles_sketch(
    events: ray.data.Dataset,
    qs: tuple[int, ...] = (50, 95, 99),
    bin_cents: int = HIST_BIN_CENTS,
) -> ray.data.Dataset:
    """(hour, n_events, p50_est_c, p95_est_c, p99_est_c) — approximate
    per-hour percentiles from a fixed-width histogram over integer cents:
    bin = value_c // bin_cents, the q-th percentile estimate is the
    INCLUSIVE upper edge ((bin+1)*bin_cents - 1) of the first bin whose
    cumulative count reaches the exact ceil-rank (q*n + 99) // 100 — the
    same rank convention as the exact operator, so est >= true and
    est - true < bin_cents always (asserted in tests).

    Scale shape: each block pre-combines to <= bins rows per hour, ONE
    keyed groupby on hour folds the per-block histogram partials
    (integer adds — associative, commutative), and the quantile walk is
    O(bins) per hour. Value payloads never shuffle; per-key state is the
    fixed histogram regardless of event count."""
    from collections import Counter

    from .relational import _cents

    def partial(batch: pa.Table) -> pa.Table:
        hours = _hour_col(batch).to_pylist()
        cents = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        cnt: Counter[tuple[str, int]] = Counter(
            zip(hours, (cents // bin_cents).tolist())
        )
        return pa.Table.from_pydict(
            {
                "hour": pa.array([h for h, _ in cnt], type=pa.string()),
                "bin": pa.array([b for _, b in cnt], type=pa.int64()),
                "c": pa.array(list(cnt.values()), type=pa.int64()),
            }
        )

    names = [f"p{q}_est_c" for q in qs]

    def quantiles(group: pa.Table) -> pa.Table:
        hour = group["hour"][0].as_py()
        agg: dict[int, int] = {}
        for b, c in zip(group["bin"].to_pylist(), group["c"].to_pylist()):
            agg[b] = agg.get(b, 0) + c
        n = sum(agg.values())
        out = {
            "hour": pa.array([hour], type=pa.string()),
            "n_events": pa.array([n], type=pa.int64()),
        }
        bins = sorted(agg)
        for q, name in zip(qs, names):
            rank = (q * n + 99) // 100
            cum = 0
            est = 0
            for b in bins:
                cum += agg[b]
                if cum >= rank:
                    est = (b + 1) * bin_cents - 1
                    break
            out[name] = pa.array([est], type=pa.int64())
        return pa.Table.from_pydict(out)

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("hour")
        .map_groups(quantiles, batch_format="pyarrow")
    )


def hll_error_report(events: ray.data.Dataset) -> ray.data.Dataset:
    """(hour, n_exact, n_est, abs_err, err_fp6) — sketch acceptance gate:
    the HLL hourly-distinct-users estimate ([[events_hourly_users_hll]])
    side-by-side with the exact count, with the relative error in exact
    fixed-point (``|est − exact| · 10⁶ // exact``). The eval twin of
    [[knn_recall_report]] for the sketch family — run before trusting a
    12-bit HLL on a new key domain (error should sit near the 1.04/√m ≈
    1.6% bound).

    Scale shape: both sides are per-hour aggregates (tiny); they meet in
    ONE tagged union + hour groupby. The expensive parts ARE the two
    sweeps, each already scale-shaped (the exact side shuffles distinct
    (hour, user) pairs; the sketch side only 4096-byte registers)."""
    from ray.data.aggregate import Sum

    exact = hourly_users(events)
    est = hourly_users_hll(events)

    def tag_exact(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "hour": batch["hour"],
                "n_exact": batch["n_users"].cast(pa.int64()),
                "n_est": pa.array([0] * batch.num_rows, type=pa.int64()),
            }
        )

    def tag_est(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "hour": batch["hour"],
                "n_exact": pa.array([0] * batch.num_rows, type=pa.int64()),
                "n_est": batch["n_users_est"].cast(pa.int64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        ex = batch["n_exact"].to_numpy(zero_copy_only=False)
        es = batch["n_est"].to_numpy(zero_copy_only=False)
        err = np.abs(es - ex)
        return pa.Table.from_pydict(
            {
                "hour": batch["hour"],
                "n_exact": pa.array(ex, type=pa.int64()),
                "n_est": pa.array(es, type=pa.int64()),
                "abs_err": pa.array(err, type=pa.int64()),
                "err_fp6": pa.array(
                    err * 1_000_000 // ex, type=pa.int64()
                ),
            }
        )

    return (
        exact.map_batches(tag_exact, batch_format="pyarrow")
        .union(est.map_batches(tag_est, batch_format="pyarrow"))
        .groupby("hour")
        .aggregate(
            Sum("n_exact", alias_name="n_exact"),
            Sum("n_est", alias_name="n_est"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def quantile_sketch_error(events: ray.data.Dataset) -> ray.data.Dataset:
    """(hour, p50_err_c, p95_err_c, p99_err_c, within_bound) — sketch
    acceptance gate for the histogram quantiles: per hour, the estimate
    minus the exact percentile at each rank. The histogram contract
    guarantees 0 ≤ err < bin width; within_bound asserts it — the
    [[hll_error_report]] pattern for the quantile family.

    Scale shape: both sides are per-hour aggregates meeting in ONE
    tagged union + hour groupby; the sweeps themselves are the already-
    scale-shaped operators."""
    from ray.data.aggregate import Sum

    exact = hourly_value_percentiles(events)
    est = hourly_value_quantiles_sketch(events)

    def tag_exact(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "hour": batch["hour"],
                "p50_t": batch["p50_c"].cast(pa.int64()),
                "p95_t": batch["p95_c"].cast(pa.int64()),
                "p99_t": batch["p99_c"].cast(pa.int64()),
                "p50_e": pa.array([0] * batch.num_rows, type=pa.int64()),
                "p95_e": pa.array([0] * batch.num_rows, type=pa.int64()),
                "p99_e": pa.array([0] * batch.num_rows, type=pa.int64()),
            }
        )

    def tag_est(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "hour": batch["hour"],
                "p50_t": pa.array([0] * batch.num_rows, type=pa.int64()),
                "p95_t": pa.array([0] * batch.num_rows, type=pa.int64()),
                "p99_t": pa.array([0] * batch.num_rows, type=pa.int64()),
                "p50_e": batch["p50_est_c"].cast(pa.int64()),
                "p95_e": batch["p95_est_c"].cast(pa.int64()),
                "p99_e": batch["p99_est_c"].cast(pa.int64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        cols = {
            n: batch[n].to_numpy(zero_copy_only=False)
            for n in ("p50_t", "p95_t", "p99_t", "p50_e", "p95_e", "p99_e")
        }
        e50 = cols["p50_e"] - cols["p50_t"]
        e95 = cols["p95_e"] - cols["p95_t"]
        e99 = cols["p99_e"] - cols["p99_t"]
        ok = (
            (e50 >= 0) & (e50 < HIST_BIN_CENTS)
            & (e95 >= 0) & (e95 < HIST_BIN_CENTS)
            & (e99 >= 0) & (e99 < HIST_BIN_CENTS)
        )
        return pa.Table.from_pydict(
            {
                "hour": batch["hour"],
                "p50_err_c": pa.array(e50, type=pa.int64()),
                "p95_err_c": pa.array(e95, type=pa.int64()),
                "p99_err_c": pa.array(e99, type=pa.int64()),
                "within_bound": pa.array(ok, type=pa.bool_()),
            }
        )

    return (
        exact.map_batches(tag_exact, batch_format="pyarrow")
        .union(est.map_batches(tag_est, batch_format="pyarrow"))
        .groupby("hour")
        .aggregate(
            Sum("p50_t", alias_name="p50_t"),
            Sum("p95_t", alias_name="p95_t"),
            Sum("p99_t", alias_name="p99_t"),
            Sum("p50_e", alias_name="p50_e"),
            Sum("p95_e", alias_name="p95_e"),
            Sum("p99_e", alias_name="p99_e"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def cms_error_report(
    docs: ray.data.Dataset,
    threshold: int = 100,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> ray.data.Dataset:
    """(token, est_count, true_count, overcount) — count-min acceptance
    gate: for every CMS heavy-hitter survivor, the exact count and the
    (always ≥ 0) collision overcount. The standard second pass a CMS
    first-pass filter feeds — kept here as the eval artifact (overcount
    magnitude tells whether width needs doubling).

    Scale shape: the CMS side is the O(D×W) sketch fold; the exact side
    counts ONLY the survivor tokens (the whole point of the filter) via
    a broadcast survivor set and a keyed token sum bounded by |survivors|."""
    import ray as _ray
    from ray.data.aggregate import Sum

    survivors = cms_heavy_hitters(docs, threshold=threshold, depth=depth, width=width)
    surv_rows = survivors.take_all()
    est_map = {r["token"]: r["est_count"] for r in surv_rows}
    surv_ref = _ray.put(set(est_map))

    from .textstats import ascii_tokens

    def exact_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        sset = _ray.get(surv_ref)
        cnt: Counter[str] = Counter()
        for t in batch["text"].to_pylist():
            for w in ascii_tokens(t):
                if w in sset:
                    cnt[w] += 1
        return pa.Table.from_pydict(
            {
                "token": pa.array(list(cnt), type=pa.string()),
                "true_count": pa.array(list(cnt.values()), type=pa.int64()),
            }
        )

    exact = (
        docs.map_batches(exact_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("true_count", alias_name="true_count"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        toks = batch["token"].to_pylist()
        true = batch["true_count"].to_numpy(zero_copy_only=False)
        est = np.asarray([est_map[t] for t in toks], dtype=np.int64)
        return pa.Table.from_pydict(
            {
                "token": pa.array(toks, type=pa.string()),
                "est_count": pa.array(est, type=pa.int64()),
                "true_count": pa.array(true, type=pa.int64()),
                "overcount": pa.array(est - true, type=pa.int64()),
            }
        )

    return exact.map_batches(finish, batch_format="pyarrow")


KMV_K = 256  # ~1/sqrt(k-2) ≈ 6.3 % standard error


def kmv_users_by_type(
    events: ray.data.Dataset, k: int = KMV_K
) -> ray.data.Dataset:
    """(event_type, n_users_est) — K-Minimum-Values distinct sketch
    (Bar-Yossef et al. 2002): per group keep only the k smallest md5
    hashes of the user ids; the k-th smallest order statistic estimates
    the cardinality as floor((k-1) * 2^64 / h_(k)). The third leg of the
    cardinality family next to exact ([[events_hourly_users]]) and HLL
    ([[events_hourly_users_hll]]): unlike HLL its partials are
    *samples*, so the same sketch also answers distinct-set intersection
    sizes, and its size adapts (≤ k values) instead of fixed 2^p.

    Scale shape: per-batch (event_type, user) dedup → per-type k-min
    hash lists (bounded ≤ k u64 each) → ONE keyed merge per event_type.
    The exchange moves O(#types × k) values regardless of cardinality.

    Exactness contract: the estimate is deterministic GIVEN the hash
    (same md5-prefix u64 as the HLL twin) and the arithmetic is pure
    integer — (k-1) * 2^64 // h_k — so the DuckDB oracle replays it
    bit-for-bit with HUGEINT math. Groups with < k distinct hashes
    report the exact distinct hash count."""

    PARTIAL_SCHEMA = pa.schema(
        [("event_type", pa.string()), ("kmin", pa.list_(pa.uint64()))]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = (
            pa.Table.from_pydict(
                {"event_type": batch["event_type"], "user_id": batch["user_id"]}
            )
            .group_by(["event_type", "user_id"])
            .aggregate([])
        )
        types = np.asarray(t["event_type"].to_pylist())
        users = t["user_id"].to_pylist()
        hcache: dict = {}
        hs = np.empty(len(users), dtype=np.uint64)
        for i, u in enumerate(users):
            v = hcache.get(u)
            if v is None:
                v = hcache[u] = int.from_bytes(
                    hashlib.md5(str(u).encode()).digest()[:8], "big"
                )
            hs[i] = v
        out_t: list[str] = []
        out_h: list[list[int]] = []
        for et in np.unique(types):
            sel = np.unique(hs[types == et])  # sorted + distinct
            out_t.append(str(et))
            out_h.append(sel[:k].tolist())
        return pa.Table.from_pydict(
            {
                "event_type": pa.array(out_t, type=pa.string()),
                "kmin": pa.array(out_h, type=pa.list_(pa.uint64())),
            },
            schema=PARTIAL_SCHEMA,
        )

    def merge(group: pa.Table) -> pa.Table:
        et = group["event_type"][0].as_py()
        allh = np.unique(
            np.concatenate(
                [
                    np.asarray(x, dtype=np.uint64)
                    for x in group["kmin"].to_pylist()
                ]
            )
        )
        if len(allh) < k:
            est = int(len(allh))
        else:
            est = (k - 1) * (1 << 64) // int(allh[k - 1])
        return pa.Table.from_pydict(
            {
                "event_type": pa.array([et], type=pa.string()),
                "n_users_est": pa.array([est], type=pa.int64()),
            }
        )

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge, batch_format="pyarrow")
    )


def kmv_audience_overlap(
    events: ray.data.Dataset,
    type_a: str = "click",
    type_b: str = "purchase",
    k: int = KMV_K,
) -> ray.data.Dataset:
    """ONE row (type_a, type_b, n_a_est, n_b_est, n_union_est,
    n_inter_est) — the KMV twin of [[hll_audience_overlap]]: because a
    KMV sketch is a uniform SAMPLE of the hash space (not a register
    fold), the union sketch is just the k smallest of the merged k-min
    lists, and the intersection follows by inclusion–exclusion on three
    pure-integer estimates. Sample semantics give KMV one property HLL
    lacks: the same partials answer arbitrary further set algebra
    (A∩B∩C, Jaccard) without re-scanning.

    Scale shape: per-batch (side, user) dedup → per-side k-min lists
    (≤ k u64 each) → ONE tiny 2-key merge; the final row folds on the
    driver from two ≤ k-entry arrays. Estimates replay bit-for-bit in
    HUGEINT SQL ([[kmv_users_by_type]]'s contract); n_inter_est clamps
    at 0 like the HLL twin."""

    def est(hs: np.ndarray) -> int:
        if len(hs) < k:
            return int(len(hs))
        return (k - 1) * (1 << 64) // int(hs[k - 1])

    filt = events.filter(
        expr=f"event_type == '{type_a}' or event_type == '{type_b}'"
    )

    # raw k-min lists per side (the per-type plan keeps hashes, not
    # estimates, so the union sketch can merge them)
    def partial(batch: pa.Table) -> pa.Table:
        t = (
            pa.Table.from_pydict(
                {"side": batch["event_type"], "user_id": batch["user_id"]}
            )
            .group_by(["side", "user_id"])
            .aggregate([])
        )
        sides = np.asarray(t["side"].to_pylist())
        users = t["user_id"].to_pylist()
        hcache: dict = {}
        hs = np.empty(len(users), dtype=np.uint64)
        for i, u in enumerate(users):
            v = hcache.get(u)
            if v is None:
                v = hcache[u] = int.from_bytes(
                    hashlib.md5(str(u).encode()).digest()[:8], "big"
                )
            hs[i] = v
        out_s, out_h = [], []
        for sd in np.unique(sides):
            out_s.append(str(sd))
            out_h.append(np.unique(hs[sides == sd])[:k].tolist())
        return pa.Table.from_pydict(
            {
                "side": pa.array(out_s, type=pa.string()),
                "kmin": pa.array(out_h, type=pa.list_(pa.uint64())),
            }
        )

    rows = (
        filt.map_batches(partial, batch_format="pyarrow")
        .groupby("side")
        .map_groups(
            lambda g: pa.Table.from_pydict(
                {
                    "side": pa.array(
                        [g["side"][0].as_py()], type=pa.string()
                    ),
                    "kmin": pa.array(
                        [
                            np.unique(
                                np.concatenate(
                                    [
                                        np.asarray(x, dtype=np.uint64)
                                        for x in g["kmin"].to_pylist()
                                    ]
                                )
                            )[:k].tolist()
                        ],
                        type=pa.list_(pa.uint64()),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )  # bounded: 2 rows x k u64
    kmins = {r["side"]: np.asarray(r["kmin"], dtype=np.uint64) for r in rows}
    ha = kmins.get(type_a, np.empty(0, dtype=np.uint64))
    hb = kmins.get(type_b, np.empty(0, dtype=np.uint64))
    hu = np.unique(np.concatenate([ha, hb]))[:k]
    n_a, n_b, n_u = est(ha), est(hb), est(hu)
    n_i = max(0, n_a + n_b - n_u)
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "type_a": pa.array([type_a], type=pa.string()),
                "type_b": pa.array([type_b], type=pa.string()),
                "n_a_est": pa.array([n_a], type=pa.int64()),
                "n_b_est": pa.array([n_b], type=pa.int64()),
                "n_union_est": pa.array([n_u], type=pa.int64()),
                "n_inter_est": pa.array([n_i], type=pa.int64()),
            }
        )
    )


def _select_rank(
    vals: ray.data.Dataset,
    rank: int,
    lo: int,
    hi: int,
    bins: int = 4096,
    pull_limit: int = 200_000,
    max_iters: int = 8,
) -> int:
    """Exact k-th order statistic (1-based ``rank``) of the int64 column
    ``v`` in a MATERIALIZED dataset by iterative histogram refinement —
    the single-target core of [[value_quantiles_selection]] (that
    function predates this helper and keeps its multi-target loop):
    each pass histograms the candidate range into ``bins`` equal
    integer buckets with per-block np.bincount partials, walks the rank
    into its bucket, and pulls the bucket exactly once it is under
    ``pull_limit`` values. O(log_bins(hi - lo)) scan passes, no sort,
    driver state O(bins · #blocks) ints per pass."""
    for _ in range(max_iters):
        if lo == hi:
            return lo
        w = (hi - lo) // bins + 1

        def hist_partial(batch: pa.Table, _lo=lo, _hi=hi, _w=w) -> pa.Table:
            v = batch["v"].to_numpy(zero_copy_only=False)
            sel = v[(v >= _lo) & (v <= _hi)]
            if len(sel) == 0:
                return pa.Table.from_pydict(
                    {
                        "b": pa.array([], type=pa.int64()),
                        "c": pa.array([], type=pa.int64()),
                    }
                )
            cnt = np.bincount((sel - _lo) // _w, minlength=bins)
            nz = np.flatnonzero(cnt)
            return pa.Table.from_pydict(
                {
                    "b": pa.array(nz, type=pa.int64()),
                    "c": pa.array(cnt[nz], type=pa.int64()),
                }
            )

        hist = np.zeros(bins, dtype=np.int64)
        for r in vals.map_batches(
            hist_partial, batch_format="pyarrow"
        ).take_all():
            hist[r["b"]] += r["c"]
        cum = np.cumsum(hist)
        b = int(np.searchsorted(cum, rank))
        in_bucket = int(hist[b])
        rank -= int(cum[b - 1]) if b else 0
        lo, hi = lo + b * w, min(hi, lo + (b + 1) * w - 1)
        if lo == hi:
            return lo
        if in_bucket <= pull_limit:
            pulled = np.sort(
                np.concatenate(
                    [
                        b2["v"].to_numpy(zero_copy_only=False)
                        for b2 in vals.map_batches(
                            lambda t2, _lo=lo, _hi=hi: t2.filter(
                                pc.and_(
                                    pc.greater_equal(t2["v"], _lo),
                                    pc.less_equal(t2["v"], _hi),
                                )
                            ),
                            batch_format="pyarrow",
                        ).iter_batches(batch_format="pyarrow")
                    ]
                    or [np.empty(0, dtype=np.int64)]
                )
            )
            return int(pulled[rank - 1])
    raise RuntimeError(
        f"selection did not converge within {max_iters} passes"
    )


def select_rank_grouped(
    vals: ray.data.Dataset,
    ranks: dict[int, int],
    lo: dict[int, int],
    hi: dict[int, int],
    bins: int = 4096,
    pull_limit: int = 200_000,
    max_iters: int = 8,
) -> dict[int, int]:
    """Exact per-GROUP k-th order statistics in SHARED scan passes: for
    each group code g (int64 column ``g``), the 1-based ``ranks[g]``-th
    smallest of the int64 column ``v`` among g's rows — the grouped
    generalization of [[_select_rank]] that [[median_value_by_type]]
    builds on. One histogram-refinement pass narrows EVERY unresolved
    group at once (per-block (g, bucket) np.bincount partials against a
    broadcast {g: (lo, hi, w)} dict, folded on the driver), so the pass
    count is O(log_bins(max range)) TOTAL, not per group; groups whose
    candidate range shrinks under ``pull_limit`` values resolve exactly
    in one shared filtered pull. Driver state O(#groups · bins) ints
    per pass — the same bounded-domain contract as every keyed fold
    here (group domain = event types / labels / sources, never ids)."""
    state = {
        int(g): (int(lo[g]), int(hi[g]), int(ranks[g])) for g in ranks
    }
    out: dict[int, int] = {}
    for g, (l, h, r) in list(state.items()):
        if l == h:
            out[g] = l
            del state[g]
    for _ in range(max_iters):
        if not state:
            return out
        widths = {
            g: (h - l) // bins + 1 for g, (l, h, r) in state.items()
        }
        spec_ref = ray.put(
            {g: (l, h, widths[g]) for g, (l, h, r) in state.items()}
        )

        def hist_partial(batch: pa.Table, _bins=bins) -> pa.Table:
            spec = ray.get(spec_ref)
            gv = batch["g"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            gs, bs, cs = [], [], []
            for g, (l, h, w) in spec.items():
                sel = v[(gv == g) & (v >= l) & (v <= h)]
                if len(sel) == 0:
                    continue
                cnt = np.bincount((sel - l) // w, minlength=_bins)
                nz = np.flatnonzero(cnt)
                gs.append(np.full(len(nz), g, dtype=np.int64))
                bs.append(nz)
                cs.append(cnt[nz])
            if not gs:
                return pa.Table.from_pydict(
                    {
                        "g": pa.array([], type=pa.int64()),
                        "b": pa.array([], type=pa.int64()),
                        "c": pa.array([], type=pa.int64()),
                    }
                )
            return pa.Table.from_pydict(
                {
                    "g": pa.array(np.concatenate(gs), type=pa.int64()),
                    "b": pa.array(np.concatenate(bs), type=pa.int64()),
                    "c": pa.array(np.concatenate(cs), type=pa.int64()),
                }
            )

        hists = {g: np.zeros(bins, dtype=np.int64) for g in state}
        for row in vals.map_batches(
            hist_partial, batch_format="pyarrow"
        ).take_all():
            hists[int(row["g"])][int(row["b"])] += int(row["c"])

        pulls: dict[int, tuple[int, int, int]] = {}
        for g in list(state):
            l, h, r = state[g]
            w = widths[g]
            cum = np.cumsum(hists[g])
            b = int(np.searchsorted(cum, r))
            in_bucket = int(hists[g][b])
            r -= int(cum[b - 1]) if b else 0
            l, h = l + b * w, min(h, l + (b + 1) * w - 1)
            if l == h:
                out[g] = l
                del state[g]
            elif in_bucket <= pull_limit:
                pulls[g] = (l, h, r)
                del state[g]
            else:
                state[g] = (l, h, r)

        if pulls:
            pull_ref = ray.put({g: (l, h) for g, (l, h, r) in pulls.items()})

            def pull_rows(batch: pa.Table) -> pa.Table:
                spec = ray.get(pull_ref)
                gv = batch["g"].to_numpy(zero_copy_only=False)
                v = batch["v"].to_numpy(zero_copy_only=False)
                keep = np.zeros(len(gv), dtype=bool)
                for g, (l, h) in spec.items():
                    keep |= (gv == g) & (v >= l) & (v <= h)
                return pa.Table.from_pydict(
                    {
                        "g": pa.array(gv[keep], type=pa.int64()),
                        "v": pa.array(v[keep], type=pa.int64()),
                    }
                )

            parts = [
                b2
                for b2 in vals.map_batches(
                    pull_rows, batch_format="pyarrow"
                ).iter_batches(batch_format="pyarrow")
                if b2.num_rows
            ]
            pg = (
                pa.concat_tables(parts)
                if parts
                else pa.Table.from_pydict(
                    {
                        "g": pa.array([], type=pa.int64()),
                        "v": pa.array([], type=pa.int64()),
                    }
                )
            )
            pgv = pg["g"].to_numpy(zero_copy_only=False)
            pvv = pg["v"].to_numpy(zero_copy_only=False)
            for g, (l, h, r) in pulls.items():
                sel = np.sort(pvv[pgv == g])
                out[g] = int(sel[r - 1])
    if state:
        raise RuntimeError(
            f"grouped selection did not converge within {max_iters} passes"
            f" for groups {sorted(state)}"
        )
    return out


def mad_outliers(
    events: ray.data.Dataset, k_fp2: int = 350
) -> ray.data.Dataset:
    """(event_id, value_c, dev_c) — events whose absolute deviation from
    the global median exceeds ``k_fp2``/100 times the MEDIAN ABSOLUTE
    DEVIATION: the robust outlier rule (Hampel / Leys et al.) that a
    heavy-tailed value column needs where the z-test's mean and stddev
    are themselves dragged by the outliers being hunted. Default
    k = 3.5 (the Hampel identifier's conventional cut).

    Two EXACT distributed selections (no global sort — the
    [[value_quantiles_selection]] histogram-refinement plan via
    ``_select_rank``): median of value-cents, then median of integer
    |v - median|, each O(log(domain)) scan passes; one final filtered
    scan emits the outliers. The cut compares integers exactly:
    dev_c * 100 > k_fp2 * mad_c. House ceil-rank convention
    (50n + 99) // 100 for both medians.

    Oracle: two ROW_NUMBER rank picks at the same ceil-rank + the same
    integer inequality."""
    from ray.data.aggregate import Count, Max, Min

    from .relational import _cents

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "event_id": batch["event_id"].cast(pa.int64()),
                "v": _cents(batch["value"]),
            }
        )

    vals = events.select_columns(["event_id", "value"]).map_batches(
        to_cents, batch_format="pyarrow"
    ).materialize()
    stats = vals.aggregate(
        Min("v", alias_name="lo"), Max("v", alias_name="hi"), Count()
    )
    n = int(stats["count()"])
    empty = pa.Table.from_pydict(
        {
            "event_id": pa.array([], type=pa.int64()),
            "value_c": pa.array([], type=pa.int64()),
            "dev_c": pa.array([], type=pa.int64()),
        }
    )
    if n == 0:
        return ray.data.from_arrow(empty)
    rank = (50 * n + 99) // 100
    med = _select_rank(vals, rank, int(stats["lo"]), int(stats["hi"]))

    def to_dev(batch: pa.Table, _med=med) -> pa.Table:
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"v": pa.array(np.abs(v - _med), type=pa.int64())}
        )

    devs = vals.map_batches(to_dev, batch_format="pyarrow").materialize()
    dstats = devs.aggregate(Min("v", alias_name="lo"), Max("v", alias_name="hi"))
    mad = _select_rank(devs, rank, int(dstats["lo"]), int(dstats["hi"]))

    def finish(batch: pa.Table, _med=med, _mad=mad) -> pa.Table:
        v = batch["v"].to_numpy(zero_copy_only=False)
        dev = np.abs(v - _med)
        keep = dev * 100 > k_fp2 * _mad
        return pa.Table.from_pydict(
            {
                "event_id": batch["event_id"]
                .combine_chunks()
                .take(pa.array(np.flatnonzero(keep))),
                "value_c": pa.array(v[keep], type=pa.int64()),
                "dev_c": pa.array(dev[keep], type=pa.int64()),
            }
        )

    return vals.map_batches(finish, batch_format="pyarrow")


def mg_heavy_tokens(
    docs: ray.data.Dataset, k: int = 512
) -> ray.data.Dataset:
    """(token, n) — EXACT global heavy-hitter tokens (count · k > total
    tokens) found with per-block MISRA–GRIES summaries: the
    deterministic-guarantee counter sketch ([[cms_heavy_hitters]]'s CMS
    twin trades that determinism for fixed memory under adversarial
    skew). Correctness does not depend on the sketch: any token with
    global frequency > N/k exceeds n_b/k in at least one block (an
    averaging argument), and per-block MG with k counters provably
    keeps every token with block frequency > n_b/k — so the union of
    block survivors is a SUPERSET of the true heavy hitters, and the
    second EXACT counting pass over that bounded candidate set prunes
    it to precisely the HAVING n·k > N answer. Two streaming passes, no
    token-domain shuffle ever: driver state O(k · #blocks) candidate
    strings, the count exchange is over the pruned candidate domain.

    Oracle: plain explode + GROUP BY + HAVING n * k > total."""
    import ray

    from .textstats import ascii_tokens

    def mg_partial(batch: pa.Table) -> pa.Table:
        counters: dict[str, int] = {}
        total = 0
        for text in batch["text"].to_pylist():
            for t in ascii_tokens(text):
                total += 1
                if t in counters:
                    counters[t] += 1
                elif len(counters) < k:
                    counters[t] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        toks = list(counters)
        return pa.Table.from_pydict(
            {
                "token": pa.array(toks + [None], type=pa.string()),
                "n": pa.array(
                    [counters[t] for t in toks] + [total], type=pa.int64()
                ),
            }
        )

    summaries = docs.select_columns(["text"]).map_batches(
        mg_partial, batch_format="pyarrow"
    )
    candidates: set[str] = set()
    total = 0
    for b in summaries.iter_batches(batch_format="pyarrow"):
        for t, n in zip(b["token"].to_pylist(), b["n"].to_pylist()):
            if t is None:
                total += n
            else:
                candidates.add(t)
    empty = pa.Table.from_pydict(
        {
            "token": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        }
    )
    if not candidates or total == 0:
        return ray.data.from_arrow(empty)
    cand_ref = ray.put(candidates)

    def count_partial(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        cnt: dict[str, int] = {}
        for text in batch["text"].to_pylist():
            for t in ascii_tokens(text):
                if t in cand:
                    cnt[t] = cnt.get(t, 0) + 1
        return pa.Table.from_pydict(
            {
                "token": pa.array(list(cnt), type=pa.string()),
                "n": pa.array(list(cnt.values()), type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        docs.select_columns(["text"])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n * k > total
        t = batch.filter(pa.array(keep))
        return pa.Table.from_pydict(
            {"token": t["token"], "n": t["n"].cast(pa.int64())}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _cs_sign(j: int, key: str) -> int:
    """±1 sign of ``key`` in count-sketch row ``j``: parity of the first
    md5 hex digit of "s<j>:<key>" (same hex-parse contract as _cms_col, so
    the oracle reproduces it)."""
    return 1 if int(hashlib.md5(f"s{j}:{key}".encode()).hexdigest()[0], 16) % 2 == 0 else -1


def f2_selfjoin_size(
    lineitem: ray.data.Dataset,
    depth: int = 5,
    width: int = 256,
) -> ray.data.Dataset:
    """(exact_f2, est_f2, err_fp6) — the SELF-JOIN SIZE of lineitem on
    l_partkey (F2 = Σ_k c(k)², the second frequency moment) computed two
    ways: exactly, and by the AMS/count-sketch estimator (Alon-Matias-
    Szegedy: signed counters cell[j, h_j(k)] += s_j(k)·c; each row's
    Σ_w cell² is an unbiased F2 estimate, the MEDIAN over ``depth``
    rows tames the variance). THE join-planning primitive: self-join
    size bounds the output of any equi-join on that key and prices the
    skew before a shuffle is committed ([[key_skew_report]] names the
    hot keys; this prices the whole join in one number).

    Scale shape: the sketch path folds per-block depth×width signed
    partials on the driver (KBs regardless of input — ZERO shuffle);
    the exact path is ONE [[keyed_fold]] count exchange of (key, 1)
    rows + per-block Σc² partials. Odd ``depth`` keeps the median an
    exact integer; the driver squares in Python ints (cell² overflows
    int64 once cells reach ~3e9 — at that regime raise ``width``)."""
    from .exchange import keyed_sum

    def cs_partial(batch: pa.Table) -> pa.Table:
        keys, counts = np.unique(
            batch["l_partkey"].to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        counters = np.zeros((depth, width), dtype=np.int64)
        for k, c in zip(keys.tolist(), counts.tolist()):
            sk = str(k)
            for j in range(depth):
                counters[j, _cms_col(j, sk, width)] += _cs_sign(j, sk) * c
        j_idx, w_idx = np.nonzero(counters)
        return pa.Table.from_pydict(
            {
                "j": pa.array(j_idx, type=pa.int64()),
                "w": pa.array(w_idx, type=pa.int64()),
                "c": pa.array(counters[j_idx, w_idx], type=pa.int64()),
            }
        )

    counters = np.zeros((depth, width), dtype=np.int64)
    for b in lineitem.map_batches(
        cs_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        np.add.at(
            counters,
            (
                np.asarray(b["j"].to_pylist(), dtype=np.int64),
                np.asarray(b["w"].to_pylist(), dtype=np.int64),
            ),
            np.asarray(b["c"].to_pylist(), dtype=np.int64),
        )
    row_ests = sorted(
        sum(int(x) ** 2 for x in counters[j]) for j in range(depth)
    )
    est = row_ests[depth // 2]

    def project(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "k": batch["l_partkey"].cast(pa.int64()),
                "one": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64)
                ),
            }
        )

    counts = keyed_sum(
        lineitem.map_batches(project, batch_format="pyarrow"), "k", "one"
    )

    def sq_partial(batch: pa.Table) -> pa.Table:
        c = batch["one"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"s": pa.array([int((c * c).sum())], type=pa.int64())}
        )

    exact = sum(
        r["s"]
        for r in counts.map_batches(
            sq_partial, batch_format="pyarrow"
        ).take_all()
    )
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "exact_f2": pa.array([exact], type=pa.int64()),
                "est_f2": pa.array([est], type=pa.int64()),
                "err_fp6": pa.array(
                    [abs(est - exact) * 1_000_000 // exact if exact else 0],
                    type=pa.int64(),
                ),
            }
        )
    )


def hill_tail_index(events: ray.data.Dataset, k: int = 100) -> ray.data.Dataset:
    """(k_used, xk1_c, sum_lnr_fp9, hill_inv_fp9) — Hill estimator of the
    value distribution's tail index over the top-``k`` event values (in
    exact integer cents): 1/alpha ≈ (1/k)·Σ_{i≤k} ln(x_(i) / x_(k+1)).
    The standard heavy-tail gauge (does value follow a power law, and how
    fat?) for spend/engagement skew audits. Fixed-point contract: each
    term is floor(ln(x_i/x_{k+1})·10⁹) (sum-of-floors is the defined
    metric, the [[char_entropy]] convention), hill_inv_fp9 = sum // k.

    Shape: per-block top-(k+1) prune of the cents column (one lexsort per
    block, O(k) rows out) -> O(k·#blocks) driver merge; zero shuffles,
    one scan. Oracle: ORDER BY cents DESC LIMIT k+1 + the same floored
    ln-ratio sum in SQL."""

    def partial(batch: pa.Table) -> pa.Table:
        c = np.floor(
            batch["value"].combine_chunks().to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        top = np.sort(c)[::-1][: k + 1]
        return pa.Table.from_pydict({"c": pa.array(top, type=pa.int64())})

    merged: list[int] = []
    for r in events.map_batches(partial, batch_format="pyarrow").take_all():
        merged.append(int(r["c"]))
    merged.sort(reverse=True)
    top = merged[: k + 1]
    if len(top) < 2:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "k_used": pa.array([0], type=pa.int64()),
                    "xk1_c": pa.array([0], type=pa.int64()),
                    "sum_lnr_fp9": pa.array([0], type=pa.int64()),
                    "hill_inv_fp9": pa.array([0], type=pa.int64()),
                }
            )
        )
    k_used = len(top) - 1
    xk1 = top[-1]
    terms = [
        int(np.floor(np.log(x / xk1) * 1e9)) for x in top[:k_used]
    ]
    s = sum(terms)
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "k_used": pa.array([k_used], type=pa.int64()),
                "xk1_c": pa.array([xk1], type=pa.int64()),
                "sum_lnr_fp9": pa.array([s], type=pa.int64()),
                "hill_inv_fp9": pa.array([s // k_used], type=pa.int64()),
            }
        )
    )


def weighted_median_price(
    lineitem: ray.data.Dataset,
    bins: int = 4096,
    max_iters: int = 8,
) -> ray.data.Dataset:
    """(total_weight, target_rank, med_c) — the EXACT quantity-WEIGHTED
    median of the extended price in cents: the smallest price c whose
    cumulative shipped-unit weight reaches ⌈W/2⌉ — "half the UNITS
    shipped cost at most this much", the inventory-pricing number the
    unweighted [[value_quantiles_selection]] median cannot give when
    line sizes vary. Extends the iterative-histogram selection family
    to WEIGHTED order statistics: the same O(log_bins(range)) scan
    loop, but each per-block np.bincount partial accumulates WEIGHT
    per bucket instead of row counts, and the refinement chases the
    bucket containing the target weight rank until the bucket width is
    one cent — no sort, no per-value pull, driver state O(bins) ints
    per pass.

    Oracle: window cumulative-weight rank pick at ⌈W/2⌉."""

    def extremes(batch: pa.Table) -> pa.Table:
        c = np.floor(
            batch["l_extendedprice"].combine_chunks()
            .to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        w = batch["l_quantity"].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "lo": pa.array([int(c.min())], type=pa.int64()),
                "hi": pa.array([int(c.max())], type=pa.int64()),
                "w": pa.array([int(w.sum())], type=pa.int64()),
            }
        )

    ext = lineitem.map_batches(
        extremes, batch_format="pyarrow"
    ).take_all()
    if not ext:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "total_weight": pa.array([0], type=pa.int64()),
                    "target_rank": pa.array([0], type=pa.int64()),
                    "med_c": pa.array([0], type=pa.int64()),
                }
            )
        )
    lo = min(r["lo"] for r in ext)
    hi = max(r["hi"] for r in ext)
    total_w = sum(r["w"] for r in ext)
    target = (total_w + 1) // 2
    remaining = target

    for _ in range(max_iters):
        if lo == hi:
            break
        width = (hi - lo) // bins + 1
        spec_ref = ray.put((lo, hi, width))

        def hist_partial(batch: pa.Table, _bins=bins) -> pa.Table:
            lo, hi, width = ray.get(spec_ref)
            c = np.floor(
                batch["l_extendedprice"].combine_chunks()
                .to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            w = batch["l_quantity"].combine_chunks().to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            m = (c >= lo) & (c <= hi)
            b = (c[m] - lo) // width
            # np.add.at on int64, NOT np.bincount(weights=...): bincount
            # accumulates in float64, which is exact only below 2^53 —
            # integer weight totals must stay exactly integral.
            counts = np.zeros(_bins, dtype=np.int64)
            np.add.at(counts, b, w[m])
            nz = np.flatnonzero(counts)
            return pa.Table.from_pydict(
                {
                    "b": pa.array(nz, type=pa.int64()),
                    "n": pa.array(counts[nz], type=pa.int64()),
                }
            )

        hist = np.zeros(bins, dtype=np.int64)
        for r in lineitem.map_batches(
            hist_partial, batch_format="pyarrow"
        ).take_all():
            hist[r["b"]] += r["n"]
        cum = np.cumsum(hist)
        idx = int(np.searchsorted(cum, remaining))
        remaining -= int(cum[idx - 1]) if idx > 0 else 0
        lo, hi = lo + idx * width, min(lo + (idx + 1) * width - 1, hi)
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "total_weight": pa.array([total_w], type=pa.int64()),
                "target_rank": pa.array([target], type=pa.int64()),
                "med_c": pa.array([lo], type=pa.int64()),
            }
        )
    )
