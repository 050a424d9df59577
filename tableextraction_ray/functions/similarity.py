"""Similarity search over an embedding column (list<float>).

- knn_bruteforce: exact cosine top-k per query — the baseline: the (tiny)
  query matrix is broadcast once via ray.put and every batch does one
  vectorized float64 matmul against it; global top-k is a per-query
  groupby reduction over the per-batch survivors.
- lsh_near_dup / near_dup_pairs: the scale path for all-pairs near-dup —
  random-hyperplane LSH buckets (seeded, deterministic) turn O(n^2) into
  per-bucket comparisons; the sandbox-size exact variant is the oracle.

Bit-stable parity contract: embedding components are quantized to 1e6
fixed-point integers on BOTH the Ray and SQL sides before any cosine math.
Dot products and squared norms of quantized vectors are exact integers
(< 2^53, so float64 BLAS matmul computes them exactly regardless of
summation order), and the final ``dot / (sqrt(na) * sqrt(nb)) * 1e5`` is a
fixed sequence of correctly-rounded IEEE-double ops — identical bits in
numpy and DuckDB. Raw float32 cosine (DuckDB ``list_cosine_similarity``)
is NOT used: it differs from float64 numpy by ulps exactly at fixed-point
rounding boundaries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

N_QUERIES = 8
TOP_K = 10
# Pair threshold (fixed-point 1e5). The synthetic embeddings have no true
# near-duplicates (max off-diagonal cosine ~0.51), so the "similar pair"
# threshold sits below that to exercise the pair machinery; for a real
# near-dup corpus set it to ~0.99.
NEAR_DUP_FP5 = 35000


def _fp5(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100000.0 + 0.5).astype(np.int64)


def _quantize(mat: np.ndarray) -> np.ndarray:
    """Component-wise 1e6 fixed-point quantization (floor(x*1e6+0.5)), kept
    in float64: every value and every 64-term dot product is an exact
    integer < 2^53, so subsequent BLAS matmuls are exact."""
    return np.floor(mat * 1000000.0 + 0.5)


def _cos_matrix(qa: np.ndarray, qb: np.ndarray) -> np.ndarray:
    """Cosine of every (already _quantize'd) row of qa against every row of
    qb via exact integer dot/norms, then one fixed sequence of IEEE-double
    ops — bit-identical to the DuckDB oracle's expression."""
    dot = qa @ qb.T  # exact
    na = np.sqrt((qa * qa).sum(axis=1))  # sum exact, sqrt correctly rounded
    nb = np.sqrt((qb * qb).sum(axis=1))
    return dot / (na[:, None] * nb[None, :])


def _stack(batch: pa.Table) -> np.ndarray:
    return np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)


def knn_bruteforce(ds: ray.data.Dataset, n_queries: int = N_QUERIES, k: int = TOP_K) -> ray.data.Dataset:
    """(query_id, vec_id, cos_fp5) — exact top-k cosine neighbors for the
    first ``n_queries`` vectors (query_id = vec_id < n_queries), excluding
    self; ties broken by vec_id ascending."""
    import pyarrow.compute as pc

    def only_queries(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch["vec_id"], pa.scalar(n_queries)))

    queries = sorted(
        ds.map_batches(only_queries, batch_format="pyarrow").take_all(),
        key=lambda r: r["vec_id"],
    )
    q_ids = [r["vec_id"] for r in queries]
    q_mat = _quantize(np.asarray([r["embedding"] for r in queries], dtype=np.float64))
    q_ref = ray.put((q_ids, q_mat))

    def batch_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat = ray.get(q_ref)
        mat = _quantize(_stack(batch))
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        cos = _cos_matrix(mat, q_mat)  # (batch, nq)
        out_q, out_v, out_c = [], [], []
        for qi, q_id in enumerate(q_ids):
            col = _fp5(cos[:, qi])
            mask = vec_ids != q_id
            vids, vals = vec_ids[mask], col[mask]
            order = np.lexsort((vids, -vals))[:k]  # per-batch survivors
            out_q.extend([q_id] * len(order))
            out_v.extend(vids[order].tolist())
            out_c.extend(vals[order].tolist())
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cos_fp5": pa.array(out_c, type=pa.int64()),
            }
        )

    def reduce_topk(group: pa.Table) -> pa.Table:
        rows = sorted(
            group.to_pylist(), key=lambda r: (-r["cos_fp5"], r["vec_id"])
        )[:k]
        return pa.Table.from_pylist(rows, schema=group.schema)

    return (
        ds.map_batches(batch_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(reduce_topk, batch_format="pyarrow")
    )


def ivf_knn(
    ds: ray.data.Dataset,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    nlist: int = 16,
    nprobe: int = 4,
) -> ray.data.Dataset:
    """(query_id, vec_id, cos_fp5) — IVF approximate top-k: a deterministic
    coarse quantizer (the first ``nlist`` vectors as centroids) buckets every
    vector by nearest centroid inside map_batches; each query probes only its
    ``nprobe`` closest buckets. The scale path for 10^9+ vectors — probing
    nprobe/nlist of the data turns the brute-force scan into a fraction at
    bounded recall loss. No SQL oracle (approximate); recall vs
    knn_bruteforce is asserted in tests."""
    import pyarrow.compute as pc

    head = sorted(
        ds.map_batches(
            lambda b: b.filter(pc.less(b["vec_id"], pa.scalar(max(nlist, n_queries)))),
            batch_format="pyarrow",
        ).take_all(),
        key=lambda r: r["vec_id"],
    )
    cent = _quantize(
        np.asarray([r["embedding"] for r in head if r["vec_id"] < nlist], dtype=np.float64)
    )
    q_rows = [r for r in head if r["vec_id"] < n_queries]
    q_ids = [r["vec_id"] for r in q_rows]
    q_mat = _quantize(np.asarray([r["embedding"] for r in q_rows], dtype=np.float64))
    # Probe set per query: its nprobe nearest centroids.
    q_cent_cos = _cos_matrix(q_mat, cent)
    probes = [set(np.argsort(-q_cent_cos[i])[:nprobe].tolist()) for i in range(len(q_ids))]
    state_ref = ray.put((q_ids, q_mat, cent, probes))

    def batch_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, cent, probes = ray.get(state_ref)
        mat = _quantize(_stack(batch))
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        buckets = np.argmax(_cos_matrix(mat, cent), axis=1)
        cos = _cos_matrix(mat, q_mat)
        out_q, out_v, out_c = [], [], []
        for qi, q_id in enumerate(q_ids):
            mask = (vec_ids != q_id) & np.isin(buckets, list(probes[qi]))
            vids, vals = vec_ids[mask], _fp5(cos[mask, qi])
            order = np.lexsort((vids, -vals))[:k]
            out_q.extend([q_id] * len(order))
            out_v.extend(vids[order].tolist())
            out_c.extend(vals[order].tolist())
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cos_fp5": pa.array(out_c, type=pa.int64()),
            }
        )

    def reduce_topk(group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(), key=lambda r: (-r["cos_fp5"], r["vec_id"]))[:k]
        return pa.Table.from_pylist(rows, schema=group.schema)

    return (
        ds.map_batches(batch_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(reduce_topk, batch_format="pyarrow")
    )


def near_dup_pairs(ds: ray.data.Dataset, threshold_fp5: int = NEAR_DUP_FP5) -> ray.data.Dataset:
    """(vec_a, vec_b, cos_fp5) — all pairs with cosine >= threshold (a < b).

    Sandbox-exact variant: the full (n x d) matrix is broadcast once via
    ray.put and each batch compares its rows against all later rows — O(n^2)
    work but O(n/b) shuffle. For 10^9+ vectors swap in lsh_near_dup."""
    all_rows = ds.take_all()
    ids = np.asarray([r["vec_id"] for r in all_rows], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = _quantize(np.asarray([r["embedding"] for r in all_rows], dtype=np.float64)[order])
    mat_ref = ray.put((ids, mat))

    def batch_pairs(batch: pa.Table) -> pa.Table:
        ids_all, mat_all = ray.get(mat_ref)
        mat_b = _quantize(_stack(batch))
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        cos = _fp5(_cos_matrix(mat_b, mat_all))
        a_out, b_out, c_out = [], [], []
        for i, va in enumerate(vec_ids):
            hits = np.flatnonzero((cos[i] >= threshold_fp5) & (ids_all > va))
            for j in hits:
                a_out.append(int(va))
                b_out.append(int(ids_all[j]))
                c_out.append(int(cos[i, j]))
        return pa.Table.from_pydict(
            {
                "vec_a": pa.array(a_out, type=pa.int64()),
                "vec_b": pa.array(b_out, type=pa.int64()),
                "cos_fp5": pa.array(c_out, type=pa.int64()),
            }
        )

    return ds.map_batches(batch_pairs, batch_format="pyarrow")


def lsh_near_dup(
    ds: ray.data.Dataset,
    threshold_fp5: int = NEAR_DUP_FP5,
    n_planes: int = 12,
    seed: int = 42,
    dim: int = 64,
) -> ray.data.Dataset:
    """(vec_a, vec_b, cos_fp5) — near-dup pairs via random-hyperplane LSH
    buckets: vectors sharing a signbit signature are compared exactly within
    the bucket (a groupby, not a broadcast). Recall < 1 by design — this is
    the 10^9-vector scale path; no SQL oracle (rows-only check)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    planes_ref = ray.put(planes)

    def bucket(batch: pa.Table) -> pa.Table:
        planes = ray.get(planes_ref)
        mat = _stack(batch)
        sig = (mat @ planes) > 0
        keys = [
            "".join("1" if b else "0" for b in row) for row in sig
        ]
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(keys, type=pa.string()),
                "vec_id": batch["vec_id"],
                "embedding": batch["embedding"],
            }
        )

    def in_bucket_pairs(group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(), key=lambda r: r["vec_id"])
        a_out, b_out, c_out = [], [], []
        if len(rows) > 1:
            mat = _quantize(np.asarray([r["embedding"] for r in rows], dtype=np.float64))
            cos = _fp5(_cos_matrix(mat, mat))
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    if cos[i, j] >= threshold_fp5:
                        a_out.append(rows[i]["vec_id"])
                        b_out.append(rows[j]["vec_id"])
                        c_out.append(int(cos[i, j]))
        return pa.Table.from_pydict(
            {
                "vec_a": pa.array(a_out, type=pa.int64()),
                "vec_b": pa.array(b_out, type=pa.int64()),
                "cos_fp5": pa.array(c_out, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(in_bucket_pairs, batch_format="pyarrow")
    )
