"""Data-selection operators for LLM corpus curation.

dsir_weights — hashed n-gram importance weights (DSIR, Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"): score every
document by how much more likely its hashed-bigram features are under a
TARGET distribution (e.g. a trusted source) than under the RAW corpus
distribution. The standard cheap proxy for "is this web page wiki-like?"
that picks pretraining data at scale without running a model.

Exact-replay contract: the per-bucket log-ratio is computed ONCE on the
driver as floor((ln((c_t+1)/(T+B)) - ln((c_r+1)/(R+B))) * 1e9) — the inputs
to ln are correctly-rounded doubles of integer ratios (identical in numpy
and DuckDB), ln is the platform libm in both engines (verified bit-equal by
the tfidf_top_terms oracle), and everything after the floor is int64
arithmetic, so the per-document sum is order-independent and the whole
operator replays bit-for-bit in SQL despite being a log-probability score.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .dedup import shingle_base_hash
from .textstats import ascii_tokens

DSIR_BUCKETS = 1024


def _doc_bucket_counts(text: str, n_buckets: int) -> np.ndarray:
    """Occurrence counts of the doc's hashed word-bigrams per bucket
    (bucket = 60-bit md5 base hash mod n_buckets); DSIR counts every
    occurrence, not distinct bigrams."""
    from collections import Counter

    toks = ascii_tokens(text)
    counts = np.zeros(n_buckets, dtype=np.int64)
    # one md5 per DISTINCT bigram (the multiplicity trick shared with
    # rare_bigram_rate / dedup_simhash)
    cnt = Counter(toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1))
    for bg, k in cnt.items():
        counts[shingle_base_hash(bg) % n_buckets] += k
    return counts


def dsir_weights(
    ds: ray.data.Dataset,
    target_source: str = "src0",
    n_buckets: int = DSIR_BUCKETS,
) -> ray.data.Dataset:
    """(doc_id, logw_fp9) — DSIR importance log-weight per document,
    fixed-point 1e9: sum over the doc's bigram occurrences of
    ln p_target(bucket) - ln p_raw(bucket), with add-1 smoothing over
    ``n_buckets`` hashed feature buckets. Positive = more target-like.
    Selection (top-k, or Gumbel-noised resampling) is a trivial window on
    this output.

    Scale shape: pass 1 folds per-batch (bucket, c_target, c_raw) partials
    — each block pre-combines to <= n_buckets rows via bincount, the
    driver folds two n_buckets-length int arrays (KBs, same pattern as
    kmeans_centroids) and broadcasts the 1024-entry log-ratio table once
    via ray.put; pass 2 is embarrassingly parallel per-doc int64 math. The
    text never shuffles; no groupby at all."""
    import ray as _ray

    def partial(batch: pa.Table) -> pa.Table:
        ct = np.zeros(n_buckets, dtype=np.int64)
        cr = np.zeros(n_buckets, dtype=np.int64)
        for src, text in zip(
            batch["source"].to_pylist(), batch["text"].to_pylist()
        ):
            c = _doc_bucket_counts(text, n_buckets)
            cr += c
            if src == target_source:
                ct += c
        nz = np.nonzero(cr)[0]
        return pa.Table.from_pydict(
            {
                "bkt": pa.array(nz.tolist(), type=pa.int64()),
                "ct": pa.array(ct[nz].tolist(), type=pa.int64()),
                "cr": pa.array(cr[nz].tolist(), type=pa.int64()),
            }
        )

    ct = np.zeros(n_buckets, dtype=np.int64)
    cr = np.zeros(n_buckets, dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        bkt = np.asarray(b["bkt"].to_pylist(), dtype=np.int64)
        # np.add.at, not fancy-index +=: iter_batches may concatenate
        # several blocks' partials into one batch, repeating bucket ids.
        np.add.at(ct, bkt, np.asarray(b["ct"].to_pylist(), dtype=np.int64))
        np.add.at(cr, bkt, np.asarray(b["cr"].to_pylist(), dtype=np.int64))
    t_total = int(ct.sum())
    r_total = int(cr.sum())
    # Per-bucket fixed-point log-ratio — one fixed sequence of IEEE ops:
    # DOUBLE divide (correctly rounded), libm ln, DOUBLE subtract, *1e9,
    # floor. Identical bits in numpy and DuckDB.
    delta = np.floor(
        (
            np.log((ct.astype(np.float64) + 1.0) / np.float64(t_total + n_buckets))
            - np.log((cr.astype(np.float64) + 1.0) / np.float64(r_total + n_buckets))
        )
        * 1e9
    ).astype(np.int64)
    delta_ref = _ray.put(delta)

    def score(batch: pa.Table) -> pa.Table:
        d = _ray.get(delta_ref)
        ids, ws = [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            c = _doc_bucket_counts(text, n_buckets)
            ids.append(doc_id)
            ws.append(int(c @ d))  # int64 dot — exact, order-independent
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "logw_fp9": pa.array(ws, type=pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


LM_CTX_BUCKETS = 1024
LM_BIGRAM_BUCKETS = 4096


def _doc_bigram_pairs(text: str):
    """Distinct (ctx_bucket, bigram_bucket, multiplicity) triples for a
    doc's word bigrams — one md5 per DISTINCT token/bigram (the Counter
    multiplicity trick shared with dsir/rare_bigram_rate)."""
    from collections import Counter

    toks = ascii_tokens(text)
    cnt = Counter(
        (toks[i], toks[i] + " " + toks[i + 1]) for i in range(len(toks) - 1)
    )
    uh = np.fromiter(
        (shingle_base_hash(u) % LM_CTX_BUCKETS for u, _ in cnt),
        dtype=np.int64,
        count=len(cnt),
    )
    bh = np.fromiter(
        (shingle_base_hash(b) % LM_BIGRAM_BUCKETS for _, b in cnt),
        dtype=np.int64,
        count=len(cnt),
    )
    k = np.fromiter(cnt.values(), dtype=np.int64, count=len(cnt))
    return uh, bh, k


def lm_perplexity(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_bigrams, nll_fp9, mean_nll_fp9) — the CCNet-style LM
    quality gate (Wenzek et al. 2020 filter web text by LM perplexity; we
    use a hashed add-1-smoothed bigram model trained on the corpus ITSELF
    in one pass, instead of an external KenLM): per-token negative log
    likelihood -ln P(w_i | w_{i-1}), with
    P = (c_bigram_bucket + 1) / (c_context_bucket + B2) over 4096 bigram /
    1024 context hash buckets. High mean_nll = improbable word sequences
    = gibberish/boilerplate candidates; low = fluent (or repetitive —
    pair with repetition_stats).

    Exact-replay contract (the dsir_weights discipline): each per-bigram
    term is floor(ln((cb+1)/(cu+B2)) * 1e9) — one IEEE double divide of
    two exact ints, platform libm ln, one multiply, floor — identical in
    numpy and DuckDB; summation is int64. mean_nll_fp9 =
    floor(nll_fp9 / n_bigrams) evaluated in DOUBLE on both engines
    (|nll| < 2^53 up to ~400k-bigram docs at |term| <= 2e10).

    Scale shape: pass 1 folds per-block (kind, bucket, count) partials —
    <= B1 + B2 rows per block — into two KB-sized int arrays on the
    driver, broadcast ONCE via ray.put; pass 2 is embarrassingly parallel
    per-doc int math. Text never shuffles; no groupby."""
    import ray as _ray

    def partial(batch: pa.Table) -> pa.Table:
        cu = np.zeros(LM_CTX_BUCKETS, dtype=np.int64)
        cb = np.zeros(LM_BIGRAM_BUCKETS, dtype=np.int64)
        for text in batch["text"].to_pylist():
            uh, bh, k = _doc_bigram_pairs(text)
            np.add.at(cu, uh, k)
            np.add.at(cb, bh, k)
        nzu = np.nonzero(cu)[0]
        nzb = np.nonzero(cb)[0]
        return pa.Table.from_pydict(
            {
                "kind": pa.array(
                    [0] * len(nzu) + [1] * len(nzb), type=pa.int8()
                ),
                "bkt": pa.array(
                    np.concatenate([nzu, nzb]), type=pa.int64()
                ),
                "c": pa.array(
                    np.concatenate([cu[nzu], cb[nzb]]), type=pa.int64()
                ),
            }
        )

    cu = np.zeros(LM_CTX_BUCKETS, dtype=np.int64)
    cb = np.zeros(LM_BIGRAM_BUCKETS, dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        kind = np.asarray(b["kind"].to_pylist(), dtype=np.int64)
        bkt = np.asarray(b["bkt"].to_pylist(), dtype=np.int64)
        c = np.asarray(b["c"].to_pylist(), dtype=np.int64)
        u_rows = kind == 0
        np.add.at(cu, bkt[u_rows], c[u_rows])
        np.add.at(cb, bkt[~u_rows], c[~u_rows])
    model_ref = _ray.put((cu, cb))

    def score(batch: pa.Table) -> pa.Table:
        cu, cb = _ray.get(model_ref)
        ids, nbs, nlls, means = [], [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            uh, bh, k = _doc_bigram_pairs(text)
            n = int(k.sum())
            ids.append(doc_id)
            nbs.append(n)
            if n == 0:
                nlls.append(0)
                means.append(0)
                continue
            lp = np.floor(
                np.log(
                    (cb[bh] + 1.0) / (cu[uh] + float(LM_BIGRAM_BUCKETS))
                )
                * 1e9
            ).astype(np.int64)
            nll = -int(k @ lp)
            nlls.append(nll)
            means.append(int(np.floor(np.float64(nll) / n)))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_bigrams": pa.array(nbs, type=pa.int64()),
                "nll_fp9": pa.array(nlls, type=pa.int64()),
                "mean_nll_fp9": pa.array(means, type=pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def stratified_split(
    documents: ray.data.Dataset,
    ppm_val: int = 20_000,
    ppm_test: int = 20_000,
) -> ray.data.Dataset:
    """(source, split, n_docs, n_chars) — deterministic train/val/test
    assignment audit: every document lands in exactly one split by a
    content-free hash gate (bucket = md5(str(doc_id)) first 15 hex
    digits mod 10⁶; bucket < ppm_val -> 'val', < ppm_val+ppm_test ->
    'test', else 'train'), reported per source so held-out leakage and
    stratification skew are visible before training. Reproducible and
    coordination-free: two clusters assign identically.

    Shape: per-block (source, split) count/char partials -> ONE tiny
    keyed sum (≤ |sources|·3 rows); the assignment itself never
    shuffles. Oracle: the identical md5-bucket expression in SQL."""
    import hashlib

    from .exchange import keyed_fold

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        srcs = batch["source"].to_pylist()
        buckets = np.array(
            [
                int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
                % 1_000_000
                for i in ids
            ],
            dtype=np.int64,
        )
        split = np.where(
            buckets < ppm_val,
            "val",
            np.where(buckets < ppm_val + ppm_test, "test", "train"),
        )
        agg: dict = {}
        for s, sp, c in zip(srcs, split, nch):
            k = (s, str(sp))
            n, ch = agg.get(k, (0, 0))
            agg[k] = (n + 1, ch + int(c))
        ks = sorted(agg)
        return pa.Table.from_pydict(
            {
                "source": pa.array([k[0] for k in ks], type=pa.string()),
                "split": pa.array([k[1] for k in ks], type=pa.string()),
                "n_docs": pa.array(
                    [agg[k][0] for k in ks], type=pa.int64()
                ),
                "n_chars": pa.array(
                    [agg[k][1] for k in ks], type=pa.int64()
                ),
            }
        )

    return keyed_fold(
        documents.map_batches(partial, batch_format="pyarrow"),
        ["source", "split"],
        [("n_docs", "sum"), ("n_chars", "sum")],
    )


def hash_sample_k(documents: ray.data.Dataset, k: int = 20) -> ray.data.Dataset:
    """(rank, doc_id) — deterministic uniform-without-replacement sample:
    the ``k`` documents with the smallest ``md5(str(doc_id))`` hex
    digest (ties by doc_id), ranked 1..k. The distributed replacement
    for reservoir sampling — same marginal uniformity, but reproducible
    and mergeable, so two runs (or two clusters) agree on the sample
    without coordination.

    Shape: per-block top-k prune on the (hex, doc_id) lexsort →
    O(k × #blocks) driver fold, zero shuffles. At 100 TB the sample of
    a 10¹²-row table costs one scan of the doc_id column.

    Oracle: ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
    doc_id) ≤ k."""
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hx = np.array(
            [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        )
        order = np.lexsort((ids, hx))[:k]
        return pa.Table.from_pydict(
            {
                "h": pa.array(hx[order], type=pa.string()),
                "doc_id": pa.array(ids[order], type=pa.int64()),
            }
        )

    rows = (
        documents.select_columns(["doc_id"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    rows.sort(key=lambda r: (r["h"], r["doc_id"]))
    head = rows[:k]
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "rank": pa.array(range(1, len(head) + 1), type=pa.int64()),
                "doc_id": pa.array(
                    [r["doc_id"] for r in head], type=pa.int64()
                ),
            }
        )
    )


def per_source_sample_k(
    documents: ray.data.Dataset, k: int = 3
) -> ray.data.Dataset:
    """(source, rk, doc_id) — stratified deterministic sample: each
    source's ``k`` smallest-``md5(str(doc_id))`` documents, ranked 1..k
    within the source — the eval-set constructor that gives every
    stratum identical representation regardless of its corpus share.

    Shape: per-block per-source lexsort prune (≤ k rows per source per
    block) → O(k × #sources × #blocks) driver fold, zero shuffles — the
    [[longest_docs_per_source]] discipline with a hash ranking.

    Oracle: ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5 hex,
    doc_id) ≤ k."""
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.asarray(batch["source"].to_pylist())
        hx = np.array(
            [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        )
        order = np.lexsort((ids, hx, src))
        src_s = src[order]
        first = np.ones(len(src_s), dtype=bool)
        first[1:] = src_s[1:] != src_s[:-1]
        starts = np.flatnonzero(first)
        pos = np.arange(len(src_s)) - np.repeat(
            starts, np.diff(np.append(starts, len(src_s)))
        )
        keep = order[pos < k]
        return pa.Table.from_pydict(
            {
                "source": pa.array(src[keep], type=pa.string()),
                "h": pa.array(hx[keep], type=pa.string()),
                "doc_id": pa.array(ids[keep], type=pa.int64()),
            }
        )

    rows = (
        documents.select_columns(["doc_id", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    rows.sort(key=lambda r: (r["source"], r["h"], r["doc_id"]))
    out_src, out_rk, out_id = [], [], []
    prev, rk = None, 0
    for r in rows:
        if r["source"] != prev:
            prev, rk = r["source"], 0
        rk += 1
        if rk <= k:
            out_src.append(r["source"])
            out_rk.append(rk)
            out_id.append(r["doc_id"])
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "source": pa.array(out_src, type=pa.string()),
                "rk": pa.array(out_rk, type=pa.int64()),
                "doc_id": pa.array(out_id, type=pa.int64()),
            }
        )
    )


def length_token_corr(documents: ray.data.Dataset) -> ray.data.Dataset:
    """(n_docs, corr_fp6) — Pearson correlation between document length
    in code points and ASCII-whitespace token count, as a single
    streaming-moments pass. All six moment sums are exact int64
    partials; the final expression is the same IEEE double tree on both
    sides (`num / (sqrt(a)·sqrt(b))`, inputs integer-exact — the
    SURVEY bit-stability discipline), rounded to fixed-point 1e6.

    Shape: zero shuffles — one vectorized partial per block, O(#blocks)
    six-int driver fold. Zero-variance degenerate input yields 0.

    Oracle: the same moment sums and the same double expression."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        y = pc.count_substring_regex(
            batch["text"], r"[^ \t\n\r\v\f]+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "n": pa.array([len(x)], type=pa.int64()),
                "sx": pa.array([int(x.sum())], type=pa.int64()),
                "sy": pa.array([int(y.sum())], type=pa.int64()),
                "sxx": pa.array([int((x * x).sum())], type=pa.int64()),
                "syy": pa.array([int((y * y).sum())], type=pa.int64()),
                "sxy": pa.array([int((x * y).sum())], type=pa.int64()),
            }
        )

    rows = (
        documents.select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    import math

    n = sum(r["n"] for r in rows)
    sx = sum(r["sx"] for r in rows)
    sy = sum(r["sy"] for r in rows)
    sxx = sum(r["sxx"] for r in rows)
    syy = sum(r["syy"] for r in rows)
    sxy = sum(r["sxy"] for r in rows)
    num = n * sxy - sx * sy
    a = n * sxx - sx * sx
    b = n * syy - sy * sy
    if a <= 0 or b <= 0:
        corr_fp6 = 0
    else:
        corr_fp6 = int(
            math.floor(
                float(num) / (math.sqrt(a) * math.sqrt(b)) * 1_000_000 + 0.5
            )
        )
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "n_docs": pa.array([n], type=pa.int64()),
                "corr_fp6": pa.array([corr_fp6], type=pa.int64()),
            }
        )
    )


def mixture_token_plan(
    ds: ray.data.Dataset, target_tokens: int | None = None
) -> ray.data.Dataset:
    """(source, n_tokens, quota_tokens, rate_fp6, epochs_fp3) — the
    token-budget mixture plan a pretraining run derives before sampling:
    under a uniform per-source quota of ``target_tokens`` (default: half
    the corpus), each source's sampling rate (capped at 1.0 — an
    under-quota source can't be sampled above itself; the residual
    surfaces as epochs > 1.0 meaning REPETITION, the DoReMi/epoch-
    weighting decision point). Pure integer arithmetic throughout
    (non-negative, so ``//`` floors identically in SQL).

    Scale shape: per-block (source, n_tokens) combine, ONE keyed source
    sum, O(#sources) driver fold — the [[dsir_weights]] shape without
    the importance model."""
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict(
            {
                "source": batch["source"].cast(pa.string()),
                "n_tokens": pa.array(
                    [len(ascii_tokens(t)) for t in batch["text"].to_pylist()],
                    type=pa.int64(),
                ),
            }
        )
        g = t.group_by(["source"]).aggregate([("n_tokens", "sum")])
        return g.rename_columns(["source", "n_tokens"])

    rows = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_tokens", alias_name="n_tokens"))
        .take_all()
    )
    total = sum(r["n_tokens"] for r in rows)
    ns = len(rows)
    tgt = total // 2 if target_tokens is None else target_tokens
    quota = tgt // ns if ns else 0

    import ray.data as _rd

    return _rd.from_arrow(
        pa.Table.from_pydict(
            {
                "source": pa.array(
                    [r["source"] for r in rows], type=pa.string()
                ),
                "n_tokens": pa.array(
                    [r["n_tokens"] for r in rows], type=pa.int64()
                ),
                "quota_tokens": pa.array([quota] * ns, type=pa.int64()),
                "rate_fp6": pa.array(
                    [
                        min(1_000_000, quota * 1_000_000 // r["n_tokens"])
                        for r in rows
                    ],
                    type=pa.int64(),
                ),
                "epochs_fp3": pa.array(
                    [quota * 1_000 // r["n_tokens"] for r in rows],
                    type=pa.int64(),
                ),
            }
        )
    )


def negative_pairs(documents: ray.data.Dataset, k: int = 2) -> ray.data.Dataset:
    """(doc_id, lag, neg_doc_id) — deterministic in-batch-negative pairing
    for contrastive training: documents are placed on a pseudo-random
    RING (ordered by md5(str(doc_id)) u64, ties by doc_id) and each doc
    pairs with the next ``k`` docs on the ring. Hash order makes the
    negatives uniform-random with respect to any content signal, yet
    reproducible and coordination-free — two runs (or the text and the
    embedding job) derive the identical pair set, which is what lets a
    100-TB contrastive-pretraining pipeline shard the pairing without a
    shuffle join against a sampled negative table.

    Shape: ONE global sort by (hash, doc_id) → pass 1 reads one meta row
    per block (block-first key + the block's FIRST k ids), the driver
    stitches each block's k-successor list (+ global wrap) — state
    O(k × #blocks) — → pass 2 emits every (doc, lag, successor) pair
    vectorized in-block with the broadcast successor tails. No row ever
    crosses the wire except the O(k × #blocks) meta rows.

    Oracle: row_number() over the same hash order, joined on
    (rn + lag) % n. Requires n > k for self-pair-free output (both
    sides degrade identically below that)."""

    def hashed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        hs = np.empty(len(ids), dtype=np.uint64)
        for i, d in enumerate(ids):
            hs[i] = int.from_bytes(
                hashlib.md5(str(d).encode()).digest()[:8], "big"
            )
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "h": pa.array(hs, type=pa.uint64()),
            }
        )

    sorted_ds = (
        documents.select_columns(["doc_id"])
        .map_batches(hashed, batch_format="pyarrow")
        .sort(["h", "doc_id"])
        .materialize()
    )

    def meta(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "first_h": pa.array([], type=pa.uint64()),
                    "first_doc": pa.array([], type=pa.int64()),
                    "head_ids": pa.array([], type=pa.list_(pa.int64())),
                    "count": pa.array([], type=pa.int64()),
                }
            )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "first_h": pa.array([batch["h"][0].as_py()], type=pa.uint64()),
                "first_doc": pa.array([int(ids[0])], type=pa.int64()),
                "head_ids": pa.array(
                    [ids[:k].tolist()], type=pa.list_(pa.int64())
                ),
                "count": pa.array([batch.num_rows], type=pa.int64()),
            }
        )

    # batch_size=None => one batch per BLOCK of the materialized sorted
    # dataset, so pass 1's meta keys and pass 2's lookups are guaranteed
    # to see the same boundaries (default bundling may coalesce blocks
    # differently between two executions).
    metas = sorted(
        sorted_ds.map_batches(
            meta, batch_format="pyarrow", batch_size=None
        ).take_all(),
        key=lambda r: (r["first_h"], r["first_doc"]),
    )
    # Each block's successor tail: the first k ids of the FOLLOWING
    # blocks (spilling past short blocks), wrapping to the global head.
    heads = [list(m["head_ids"]) for m in metas]
    global_head: list[int] = []
    for h in heads:
        global_head.extend(h)
        if len(global_head) >= k:
            break
    succ: dict[tuple[int, int], list[int]] = {}
    for i, m in enumerate(metas):
        tail: list[int] = []
        for h in heads[i + 1:]:
            tail.extend(h)
            if len(tail) >= k:
                break
        tail.extend(global_head)
        succ[(m["first_h"], m["first_doc"])] = tail[:k]
    succ_ref = ray.put(succ)

    def emit(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "lag": pa.array([], type=pa.int64()),
                    "neg_doc_id": pa.array([], type=pa.int64()),
                }
            )
        s = ray.get(succ_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        ext = np.asarray(
            s[(batch["h"][0].as_py(), int(ids[0]))], dtype=np.int64
        )
        out_doc, out_lag, out_neg = [], [], []
        for lag in range(1, k + 1):
            out_doc.append(ids)
            out_lag.append(np.full(len(ids), lag, dtype=np.int64))
            # row i pairs with global position i+lag: in-block while
            # i+lag < c, else successor ext[i+lag-c] — for blocks shorter
            # than lag the ext window starts at lag-c, not 0.
            out_neg.append(
                np.concatenate(
                    [ids[lag:], ext[max(lag - len(ids), 0):lag]]
                )
            )
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(np.concatenate(out_doc), type=pa.int64()),
                "lag": pa.array(np.concatenate(out_lag), type=pa.int64()),
                "neg_doc_id": pa.array(
                    np.concatenate(out_neg), type=pa.int64()
                ),
            }
        )

    return sorted_ds.map_batches(
        emit, batch_format="pyarrow", batch_size=None
    )


def wsample_noreplace(
    documents: ray.data.Dataset, k: int = 50
) -> ray.data.Dataset:
    """(doc_id, n_chars) — deterministic WEIGHTED sample without
    replacement, inclusion probability ∝ n_chars: the Efraimidis-
    Spirakis A-ES scheme with the md5 hash standing in for the uniform
    draw — key = ln((h+1)/2⁶⁰)/w for h the 60-bit md5 of
    "ws:<doc_id>", top-k keys win (u^(1/w) in log space). The
    char-budget-proportional pick a corpus-mixing stage uses when long
    documents should be sampled more often but never twice —
    [[hash_sample_k]]'s weighted sibling, same reproducible-mergeable
    contract (two clusters agree with zero coordination).

    Shape: per-block key computation + top-k prune (≤ k rows leave any
    block), ONE tiny sort over ≤ k×#blocks survivors. The float key is
    one fixed IEEE expression over an exact integer, so the oracle's
    doubles are bit-identical (the [[source_token_entropy]] libm
    contract); zero-weight docs are excluded on both sides."""
    import hashlib
    import math

    def score_prune(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        w = batch["n_chars"].to_numpy(zero_copy_only=False)
        keys = np.empty(len(ids), dtype=np.float64)
        for i, d in enumerate(ids):
            h = int(
                hashlib.md5(f"ws:{d}".encode()).hexdigest()[:15], 16
            )
            keys[i] = (
                math.log((h + 1) / 1152921504606846976.0) / w[i]
                if w[i] > 0
                else -math.inf
            )
        ids_np = np.asarray(ids, dtype=np.int64)
        keep = w > 0
        ids_np, keys, w = ids_np[keep], keys[keep], w[keep]
        order = np.lexsort((ids_np, -keys))[:k]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids_np[order], type=pa.int64()),
                "n_chars": pa.array(
                    w[order].astype(np.int64), type=pa.int64()
                ),
                "key": pa.array(keys[order], type=pa.float64()),
            }
        )

    pruned = documents.map_batches(score_prune, batch_format="pyarrow")
    return (
        pruned.sort(["key", "doc_id"], descending=[True, False])
        .limit(k)
        .select_columns(["doc_id", "n_chars"])
    )
