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
