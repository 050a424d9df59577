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
import pyarrow.compute as pc
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
    """(n, dim) float64 matrix from the list<float> column — zero-copy
    flatten + reshape when rows are equal-length and null-free (the
    ~400x-faster hot path; every embedding operator calls this per
    batch), falling back to the Python-object conversion otherwise."""
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, (pa.ListArray, pa.LargeListArray)) and col.null_count == 0:
        offs = np.diff(col.offsets.to_numpy(zero_copy_only=False))
        if len(offs) and (offs == offs[0]).all() and offs[0] > 0:
            vals = col.flatten().to_numpy(zero_copy_only=False)
            return vals.astype(np.float64, copy=False).reshape(-1, int(offs[0]))
    return np.asarray(col.to_pylist(), dtype=np.float64)


def _head_rows(
    ds: ray.data.Dataset, head_ds: ray.data.Dataset | None, m: int
) -> list[dict]:
    """The first ``m`` vectors (vec_id < m), sorted. ``head_ds`` — a
    predicate-pushed-down read of the same table (``read_parquet(...,
    filter=vec_id < m)``) — avoids a full extra pass over the embeddings
    just to fetch the tiny query/centroid set; without it this falls back
    to a filtered scan of ``ds``."""
    import pyarrow.compute as pc

    if head_ds is None:
        head_ds = ds.map_batches(
            lambda b: b.filter(pc.less(b["vec_id"], pa.scalar(m))),
            batch_format="pyarrow",
        )
    rows = sorted(
        (r for r in head_ds.take_all() if r["vec_id"] < m),
        key=lambda r: r["vec_id"],
    )
    if len(rows) != m:
        # A caller-supplied head_ds pushed down with a SMALLER vec_id bound
        # than m would silently drop queries/centroids and produce quietly
        # wrong top-k output — fail loudly instead.
        raise ValueError(
            f"_head_rows: expected the {m} vectors with vec_id < {m}, got "
            f"{len(rows)} — head_ds was read with a smaller vec_id bound "
            f"than requested (or vec_ids are not 0..n-1 dense)"
        )
    return rows


def knn_bruteforce(
    ds: ray.data.Dataset,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    head_ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(query_id, vec_id, cos_fp5) — exact top-k cosine neighbors for the
    first ``n_queries`` vectors (query_id = vec_id < n_queries), excluding
    self; ties broken by vec_id ascending."""
    queries = _head_rows(ds, head_ds, n_queries)
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


def kmeans_centroids(
    ds: ray.data.Dataset,
    init: np.ndarray,
    iters: int = 2,
) -> np.ndarray:
    """Lloyd refinement of IVF centroids, distributed: each iteration is ONE
    pass — map_batches emits per-batch partial (centroid -> sum vector,
    count) rows, and the driver combines the partials (nlist x n_blocks
    tiny rows) into new means. Empty clusters keep their previous centroid.
    The standard spherical-ish k-means warm-up that replaces the
    first-nlist-vectors toy quantizer with data-shaped cells; ``iters`` is
    small because IVF only needs balanced cells, not converged ones."""
    import ray as _ray

    # EXACT-INTEGER Lloyd: vectors and centroids live in the shared 1e6
    # fixed-point domain, partials carry INTEGER component sums (|q| <=
    # ~6e6 x corpus rows fits int64 with 9 digits to spare), and the new
    # centroid is floor(sum/count + 0.5) back in the same domain. Integer
    # addition is order-independent, so the refinement is DETERMINISTIC
    # under any partitioning/retry interleaving — and bit-replayable by
    # the DuckDB oracle (assignment ties: lowest centroid id, matching
    # np.argmax's first-max). Returns QUANTIZED centroids (float64-held
    # exact ints, ready for _cos_matrix).
    cent_q = _quantize(np.asarray(init, dtype=np.float64))
    nlist, dim = cent_q.shape
    for _ in range(iters):
        cent_ref = _ray.put(cent_q)

        def partial(batch: pa.Table) -> pa.Table:
            c = _ray.get(cent_ref)
            mat_q = _quantize(_stack(batch))
            assign = np.argmax(_cos_matrix(mat_q, c), axis=1)
            cids, sums, counts = [], [], []
            for cid in np.unique(assign):
                sel = mat_q[assign == cid]
                cids.append(int(cid))
                sums.append(sel.sum(axis=0).astype(np.int64).tolist())
                counts.append(int(sel.shape[0]))
            return pa.Table.from_pydict(
                {
                    "cid": pa.array(cids, type=pa.int64()),
                    "vec_sum": pa.array(sums, type=pa.list_(pa.int64())),
                    "count": pa.array(counts, type=pa.int64()),
                }
            )

        sums = np.zeros((nlist, dim), dtype=np.int64)
        counts = np.zeros(nlist, dtype=np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            for cid, vs, n in zip(
                b["cid"].to_pylist(), b["vec_sum"].to_pylist(), b["count"].to_pylist()
            ):
                sums[cid] += np.asarray(vs, dtype=np.int64)
                counts[cid] += n
        nonempty = counts > 0
        cent_q = cent_q.copy()
        cent_q[nonempty] = np.floor(
            sums[nonempty].astype(np.float64) / counts[nonempty, None] + 0.5
        )
    return cent_q


def ivf_knn(
    ds: ray.data.Dataset,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    nlist: int = 16,
    nprobe: int = 4,
    head_ds: ray.data.Dataset | None = None,
    kmeans_iters: int = 2,
) -> ray.data.Dataset:
    """(query_id, vec_id, cos_fp5) — IVF approximate top-k: a coarse
    quantizer buckets every vector by nearest centroid inside map_batches;
    each query probes only its ``nprobe`` closest buckets. Centroids start
    from the first ``nlist`` vectors (deterministic) and are refined with
    ``kmeans_iters`` distributed Lloyd passes (see kmeans_centroids) so the
    cells follow the data. The scale path for 10^9+ vectors — probing
    nprobe/nlist of the data turns the brute-force scan into a fraction at
    bounded recall loss. No SQL oracle (approximate); recall vs
    knn_bruteforce is asserted in tests."""
    head = _head_rows(ds, head_ds, max(nlist, n_queries))
    init = np.asarray(
        [r["embedding"] for r in head if r["vec_id"] < nlist], dtype=np.float64
    )
    if kmeans_iters > 0:
        cent = kmeans_centroids(ds, init, iters=kmeans_iters)  # already quantized
    else:
        cent = _quantize(init)
    q_rows = [r for r in head if r["vec_id"] < n_queries]
    q_ids = [r["vec_id"] for r in q_rows]
    q_mat = _quantize(np.asarray([r["embedding"] for r in q_rows], dtype=np.float64))
    # Probe set per query: its nprobe nearest centroids (stable sort —
    # ties resolve to the lowest centroid id, matching the oracle's
    # ORDER BY cos DESC, cid).
    q_cent_cos = _cos_matrix(q_mat, cent)
    probes = [
        set(np.argsort(-q_cent_cos[i], kind="stable")[:nprobe].tolist())
        for i in range(len(q_ids))
    ]
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


def semantic_dedup(
    ds: ray.data.Dataset,
    nlist: int = 16,
    threshold_fp5: int = NEAR_DUP_FP5,
    kmeans_iters: int = 2,
    head_ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(vec_id, cid, keep) — SemDeDup-style semantic deduplication
    (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication"): cluster the embedding space with
    k-means, then inside each cluster drop every vector that has a
    semantic near-duplicate among its lower-id cluster-mates.

    Deterministic keep rule (SQL-replayable, no greedy chain): vector v
    is dropped iff some u in the SAME cluster has ``u.vec_id < v.vec_id``
    and ``cos(u, v) >= threshold`` — i.e. the lowest-id member of every
    near-dup dominance relation survives. This is the published
    "keep one representative per duplicate neighborhood" semantics with
    an id-order tie-break instead of the paper's arbitrary one.

    Exactness: clustering is the exact-integer Lloyd refinement
    (``kmeans_centroids``) over 1e6 fixed-point components; assignment
    ties go to the lowest centroid id (np.argmax first-max); in-cluster
    cosines use the shared quantized contract. The whole operator is
    bit-replayable by a DuckDB oracle.

    Scale shape: centroids are broadcast once (``ray.put``); assignment
    is one vectorized matmul per batch; the only shuffle is ONE keyed
    groupby on cid. Within-cluster work is O(m^2) on cluster size m —
    the published algorithm's cost — so at 10^9+ vectors size ``nlist``
    so clusters stay ~100k (the paper also operates per-cluster
    pairwise); skewed clusters are bounded because k-means balances
    cells by construction."""
    head = _head_rows(ds, head_ds, nlist)
    init = np.asarray([r["embedding"] for r in head], dtype=np.float64)
    if kmeans_iters > 0:
        cent = kmeans_centroids(ds, init, iters=kmeans_iters)
    else:
        cent = _quantize(init)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = _quantize(_stack(batch))
        cid = np.argmax(_cos_matrix(mat, c), axis=1).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "vec_id": batch["vec_id"],
                "embedding": batch["embedding"],
                "cid": pa.array(cid),
            }
        )

    def prune(group: pa.Table) -> pa.Table:
        vec_ids = np.asarray(group["vec_id"].to_pylist(), dtype=np.int64)
        order = np.argsort(vec_ids)
        vec_ids = vec_ids[order]
        cid = group["cid"][0].as_py()
        if len(vec_ids) == 1:
            keep = np.ones(1, dtype=bool)
        else:
            mat = _quantize(
                _stack(group)[order]
            )
            cos = _fp5(_cos_matrix(mat, mat))
            # row i is dropped iff any strictly-lower-id column j has
            # cos >= threshold (strict lower triangle).
            dominated = np.tril(cos >= threshold_fp5, k=-1).any(axis=1)
            keep = ~dominated
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(vec_ids),
                "cid": pa.array(np.full(len(vec_ids), cid, dtype=np.int64)),
                "keep": pa.array(keep),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cid")
        .map_groups(prune, batch_format="pyarrow")
    )


def _label_centroid_fold(ds: ray.data.Dataset, part_sums) -> dict:
    """Fold per-block (label, vec_sum, count) partials into the exact
    integer label centroids (floor(sum/count + 0.5) per component back in
    the 1e6 domain). Driver state O(#labels x dim) — small by
    construction of a label space."""
    sums: dict[int, np.ndarray] = {}
    counts: dict[int, int] = {}
    for b in ds.map_batches(part_sums, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for lb, vs, n in zip(
            b["label"].to_pylist(), b["vec_sum"].to_pylist(), b["count"].to_pylist()
        ):
            if lb in sums:
                sums[lb] += np.asarray(vs, dtype=np.int64)
                counts[lb] += n
            else:
                sums[lb] = np.asarray(vs, dtype=np.int64)
                counts[lb] = n
    return {
        lb: np.floor(sums[lb].astype(np.float64) / counts[lb] + 0.5)
        for lb in sums
    }


def label_centroid_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(label, n_vecs, sum_cos_fp5, mean_cos_fp5) — class-prototype
    diagnostics over a labeled embedding table: the integer centroid of
    each label (exact fixed-point component sums, floor(sum/count + 0.5)
    back into the 1e6 domain — the kmeans_centroids update rule) and the
    cohesion of the class around it (sum and mean of each member's
    quantized cosine to its own centroid). The label-quality probe a
    curation pipeline runs on classifier/teacher labels: a low
    mean-cosine label is incoherent (mislabeled or multi-modal) and gets
    routed to review.

    Scale shape: pass 1 is the kmeans partial-sum sweep keyed by label
    (driver combines O(#labels x dim) integers — #labels is small by
    construction of a label space); centroids broadcast once via
    ray.put; pass 2 scores members against their own centroid in one
    vectorized matmul per batch with per-batch partial sums, then ONE
    tiny keyed groupby. Exact integer arithmetic end-to-end, so the
    whole operator replays bit-for-bit in SQL."""
    import ray as _ray
    from ray.data.aggregate import Sum

    def part_sums(batch: pa.Table) -> pa.Table:
        mat_q = _quantize(_stack(batch))
        labels = np.asarray(batch["label"].to_pylist(), dtype=np.int64)
        ls, sums, counts = [], [], []
        for lb in np.unique(labels):
            sel = mat_q[labels == lb]
            ls.append(int(lb))
            sums.append(sel.sum(axis=0).astype(np.int64).tolist())
            counts.append(int(sel.shape[0]))
        return pa.Table.from_pydict(
            {
                "label": pa.array(ls, type=pa.int64()),
                "vec_sum": pa.array(sums, type=pa.list_(pa.int64())),
                "count": pa.array(counts, type=pa.int64()),
            }
        )

    cent_ref = _ray.put(_label_centroid_fold(ds, part_sums))

    def score(batch: pa.Table) -> pa.Table:
        c = _ray.get(cent_ref)
        mat_q = _quantize(_stack(batch))
        labels = np.asarray(batch["label"].to_pylist(), dtype=np.int64)
        ls, ns, cs = [], [], []
        for lb in np.unique(labels):
            sel = mat_q[labels == lb]
            cos = _fp5(_cos_matrix(sel, c[int(lb)][None, :])[:, 0])
            ls.append(int(lb))
            ns.append(int(sel.shape[0]))
            cs.append(int(cos.sum()))
        return pa.Table.from_pydict(
            {
                "label": pa.array(ls, type=pa.int64()),
                "n_vecs": pa.array(ns, type=pa.int64()),
                "sum_cos_fp5": pa.array(cs, type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(score, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("n_vecs"), Sum("sum_cos_fp5"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["sum(n_vecs)"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["sum(sum_cos_fp5)"].to_numpy(zero_copy_only=False).astype(np.int64)
        mean = np.floor(s.astype(np.float64) / n + 0.5).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "label": batch["label"].cast(pa.int64()),
                "n_vecs": pa.array(n),
                "sum_cos_fp5": pa.array(s),
                "mean_cos_fp5": pa.array(mean),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def near_dup_pairs(
    ds: ray.data.Dataset,
    threshold_fp5: int = NEAR_DUP_FP5,
    broadcast_row_limit: int = 100_000,
    row_count: int | None = None,
) -> ray.data.Dataset:
    """(vec_a, vec_b, cos_fp5) — all pairs with cosine >= threshold (a < b).

    Exact variant: the full (n x d) matrix is broadcast once via ray.put
    and each batch compares its rows against all later rows — O(n^2) work
    but O(n/b) shuffle. Above ``broadcast_row_limit`` rows this AUTO-ROUTES
    to ``lsh_near_dup`` (same output schema, recall >= 0.9 asserted in
    tests) so the O(n^2) driver-materialized twin can't ship into a 10^9-
    vector corpus by accident. Pass ``row_count`` (parquet footer
    metadata, the orders_by_segment / bm25_topk pattern) when ``ds`` is a
    TRANSFORMED dataset — a bare ``count()`` there executes the whole
    upstream plan once for the probe and again for the real pass; on a
    bare read it is footer-metadata-only and the fallback is fine. The
    exact→LSH switch is logged so the approximate route is never silent.
    100k x 64 float64 ~ 50 MB broadcast — the right ceiling for an exact
    oracle twin."""
    if row_count is None:
        row_count = ds.count()
    if row_count > broadcast_row_limit:
        import logging

        logging.getLogger(__name__).warning(
            "near_dup_pairs: %d rows > broadcast_row_limit=%d — routing to "
            "approximate lsh_near_dup (recall >= 0.9), same output schema",
            row_count,
            broadcast_row_limit,
        )
        return lsh_near_dup(ds, threshold_fp5=threshold_fp5)
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
    n_tables: int = 40,
    n_planes: int = 5,
    seed: int = 42,
    dim: int = 64,
) -> ray.data.Dataset:
    """(vec_a, vec_b, cos_fp5) — near-dup pairs via BANDED multi-table
    random-hyperplane LSH: ``n_tables`` independent tables of ``n_planes``
    sign bits each; vectors agreeing on ANY full table signature land in a
    shared bucket and are verified with the exact quantized cosine there.
    A pair at cosine c collides in one table with probability
    ``(1 - arccos(c)/pi) ** n_planes``; across tables recall is
    ``1 - (1 - p^r)^b`` — (b=40, r=5) gives 0.97 at the configured
    threshold cos=0.35 (the hardest, lowest-cosine pairs), vs ~0.003 for
    the single 12-plane table this replaces. Verified pairs are deduped by
    a final (vec_a, vec_b) groupby (a true pair appears in ~b*p^r ~ 3.5
    buckets). Recall vs the exact ``near_dup_pairs`` is asserted in
    ``tests/test_multimodal.py`` (bar 0.9).

    Scale shape: one keyed shuffle of (table, bucket) rows — no broadcast,
    no driver materialization, no all-pairs candidate list (verification
    happens inside the bucket, vectorized). Data amplification is
    ``n_tables x`` on the embedding payload; at 10^9+ vectors with a
    realistic near-dup threshold (cos >= 0.95, p ~ 0.9) use fewer/longer
    tables (e.g. b=8, r=16: recall 0.99, 65k buckets/table) and pre-collapse
    exactly-identical vectors (``dedup.exact_dedup`` on the vector bytes) so
    heavy duplicates can't blow up a bucket quadratically."""
    # md5-derived INTEGER hyperplanes (uniform in [-1e6, 1e6] per
    # component), dotted against the 1e6-quantized vectors: every product
    # term is <= ~6e12 and every 64-term partial sum < 2^53, so the signs
    # are EXACT integers regardless of summation order — which makes the
    # whole LSH (buckets included) bit-replayable by the DuckDB oracle.
    # (Gaussian planes gave the same measured recall — sign-LSH only
    # needs a symmetric component distribution at this dimensionality —
    # but their float dots pinned the query to a rows-only check.)
    import hashlib as _hl

    total = n_tables * n_planes
    planes = np.empty((dim, total), dtype=np.float64)
    for i in range(total):
        for d in range(dim):
            h = int(_hl.md5(f"plane:{seed}:{i}:{d}".encode()).hexdigest()[:8], 16)
            planes[d, i] = float(h % 2000001 - 1000000)
    planes_ref = ray.put(planes)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    def bucket(batch: pa.Table) -> pa.Table:
        planes = ray.get(planes_ref)
        mat = _quantize(_stack(batch))
        n = mat.shape[0]
        bits = ((mat @ planes) > 0).reshape(n, n_tables, n_planes)
        packed = bits @ weights  # (n, n_tables) bucket ints
        rep = np.repeat(np.arange(n), n_tables)
        return pa.Table.from_pydict(
            {
                "table": pa.array(
                    np.tile(np.arange(n_tables, dtype=np.int64), n)
                ),
                "bucket": pa.array(packed.reshape(-1).astype(np.int64)),
                "vec_id": batch["vec_id"].take(pa.array(rep)),
                "embedding": batch["embedding"].take(pa.array(rep)),
            }
        )

    def in_bucket_pairs(group: pa.Table) -> pa.Table:
        vec_ids = np.asarray(group["vec_id"].to_pylist(), dtype=np.int64)
        order = np.argsort(vec_ids)
        vec_ids = vec_ids[order]
        a_out: list[int] = []
        b_out: list[int] = []
        c_out: list[int] = []
        if len(vec_ids) > 1:
            mat = _quantize(
                _stack(group)[order]
            )
            cos = _fp5(_cos_matrix(mat, mat))
            iu, ju = np.triu_indices(len(vec_ids), k=1)
            hit = cos[iu, ju] >= threshold_fp5
            a_out = vec_ids[iu[hit]].tolist()
            b_out = vec_ids[ju[hit]].tolist()
            c_out = cos[iu[hit], ju[hit]].tolist()
        return pa.Table.from_pydict(
            {
                "vec_a": pa.array(a_out, type=pa.int64()),
                "vec_b": pa.array(b_out, type=pa.int64()),
                "cos_fp5": pa.array(c_out, type=pa.int64()),
            }
        )

    from ray.data.aggregate import Min

    found = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["table", "bucket"])
        .map_groups(in_bucket_pairs, batch_format="pyarrow")
    )
    deduped = found.groupby(["vec_a", "vec_b"]).aggregate(Min("cos_fp5"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "vec_a": batch["vec_a"],
                "vec_b": batch["vec_b"],
                "cos_fp5": batch["min(cos_fp5)"].cast(pa.int64()),
            }
        )

    return deduped.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-scale path for 10^9+ vector ANN.
# A 64-dim embedding becomes PQ_M uint8 codes (one per subspace), shrinking
# the index ~32x; queries score candidates through a per-query lookup table
# (ADC) instead of full-dimension math. Codebooks are trained with the same
# exact-integer Lloyd machinery as kmeans_centroids, but per subspace and
# under L2 (the standard PQ objective), so the whole operator is
# deterministic and bit-replayable by a DuckDB oracle.
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces (64 dims -> 8 dims each)
PQ_KSUB = 16  # codewords per subspace


def pq_codebooks(
    ds: ray.data.Dataset,
    init_q: np.ndarray,
    m_sub: int = PQ_M,
    iters: int = 2,
) -> np.ndarray:
    """(m_sub, ksub, subdim) quantized codebooks from exact-integer Lloyd
    refinement under L2, all subspaces in ONE distributed pass per
    iteration: map_batches emits per-(subspace, codeword) integer component
    sums + counts, the driver folds the tiny (m_sub x ksub) partials.

    Exactness: vectors live in the 1e6 fixed-point domain, so the L2
    assignment key ``|c|^2 - 2<x,c>`` is an exact integer (< 2^53 — subdim 8,
    components <= ~2e6), argmin ties resolve to the lowest codeword id
    (np.argmin first-min == the oracle's ORDER BY dist, cid), and the
    centroid update is floor(sum/count + 0.5) on exact integer sums —
    deterministic under any partitioning or retry interleaving. Empty
    codewords keep their previous value."""
    import ray as _ray

    init_q = np.asarray(init_q, dtype=np.float64)
    ksub, dim = init_q.shape
    sd = dim // m_sub
    books = np.stack([init_q[:, m * sd : (m + 1) * sd] for m in range(m_sub)])

    for _ in range(iters):
        ref = _ray.put(books)

        def partial(batch: pa.Table) -> pa.Table:
            bks = _ray.get(ref)
            mat = _quantize(_stack(batch))
            out_m, out_c, out_s, out_n = [], [], [], []
            for m in range(m_sub):
                x = mat[:, m * sd : (m + 1) * sd]
                cb = bks[m]
                # argmin ||x-c||^2 == argmin |c|^2 - 2<x,c> (|x|^2 constant
                # per row); both terms exact integers in float64.
                key = (cb * cb).sum(axis=1)[None, :] - 2.0 * (x @ cb.T)
                assign = np.argmin(key, axis=1)
                for cid in np.unique(assign):
                    sel = x[assign == cid]
                    out_m.append(m)
                    out_c.append(int(cid))
                    out_s.append(sel.sum(axis=0).astype(np.int64).tolist())
                    out_n.append(int(sel.shape[0]))
            return pa.Table.from_pydict(
                {
                    "m": pa.array(out_m, type=pa.int64()),
                    "cid": pa.array(out_c, type=pa.int64()),
                    "vec_sum": pa.array(out_s, type=pa.list_(pa.int64())),
                    "count": pa.array(out_n, type=pa.int64()),
                }
            )

        sums = np.zeros((m_sub, ksub, sd), dtype=np.int64)
        counts = np.zeros((m_sub, ksub), dtype=np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            for m, cid, vs, n in zip(
                b["m"].to_pylist(),
                b["cid"].to_pylist(),
                b["vec_sum"].to_pylist(),
                b["count"].to_pylist(),
            ):
                sums[m, cid] += np.asarray(vs, dtype=np.int64)
                counts[m, cid] += n
        books = books.copy()
        nz = counts > 0
        books[nz] = np.floor(
            sums[nz].astype(np.float64) / counts[nz, None] + 0.5
        )
    return books


def pq_topk(
    ds: ray.data.Dataset,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    m_sub: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = 2,
    head_ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(query_id, vec_id, adot) — PQ/ADC approximate top-k by inner product
    for the first ``n_queries`` vectors, excluding self; ties break by
    vec_id ascending.

    Scale shape: codebooks (m_sub x ksub x subdim — a few KB) broadcast
    once via ray.put; every batch encodes its vectors to PQ codes and
    scores ALL queries through the precomputed per-query lookup tables
    (LUT[q][m][code] = <q_m, codeword>), an O(n * m_sub) table gather per
    query instead of O(n * dim) float math — at 10^9 vectors only the
    uint8 codes (not the raw vectors) would need to live in the serving
    tier. ``adot`` (the ADC inner product of quantized vectors) is an
    exact int64 (<= m_sub * subdim * (2e6)^2 ~ 2.6e14 < 2^53), making the
    operator hash-replayable in SQL despite being approximate vs the
    brute-force scan (recall asserted in tests)."""
    head = _head_rows(ds, head_ds, max(ksub, n_queries))
    init_q = _quantize(
        np.asarray([r["embedding"] for r in head[:ksub]], dtype=np.float64)
    )
    books = pq_codebooks(ds, init_q, m_sub=m_sub, iters=iters)
    sd = books.shape[2]

    q_rows = head[:n_queries]
    q_ids = [r["vec_id"] for r in q_rows]
    q_mat = _quantize(np.asarray([r["embedding"] for r in q_rows], dtype=np.float64))
    # Per-query ADC lookup tables: LUT[qi, m, cid] = <q_m, codebook[m][cid]>
    lut = np.stack(
        [q_mat[:, m * sd : (m + 1) * sd] @ books[m].T for m in range(m_sub)],
        axis=1,
    )  # (nq, m_sub, ksub), exact integers in float64
    state_ref = ray.put((q_ids, lut, books))

    def batch_topk(batch: pa.Table) -> pa.Table:
        q_ids, lut, bks = ray.get(state_ref)
        mat = _quantize(_stack(batch))
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        n = mat.shape[0]
        scores = np.zeros((len(q_ids), n), dtype=np.float64)
        for m in range(m_sub):
            x = mat[:, m * sd : (m + 1) * sd]
            cb = bks[m]
            key = (cb * cb).sum(axis=1)[None, :] - 2.0 * (x @ cb.T)
            codes = np.argmin(key, axis=1)  # (n,)
            scores += lut[:, m, :][:, codes]  # gather, still exact ints
        out_q, out_v, out_c = [], [], []
        for qi, q_id in enumerate(q_ids):
            mask = vec_ids != q_id
            vids = vec_ids[mask]
            vals = scores[qi][mask].astype(np.int64)
            order = np.lexsort((vids, -vals))[:k]
            out_q.extend([q_id] * len(order))
            out_v.extend(vids[order].tolist())
            out_c.extend(vals[order].tolist())
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "adot": pa.array(out_c, type=pa.int64()),
            }
        )

    def reduce_topk(group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(), key=lambda r: (-r["adot"], r["vec_id"]))[:k]
        return pa.Table.from_pylist(rows, schema=group.schema)

    return (
        ds.map_batches(batch_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(reduce_topk, batch_format="pyarrow")
    )


def pq_topk_rerank(
    ds: ray.data.Dataset,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    m_sub: int = 16,
    ksub: int = PQ_KSUB,
    iters: int = 2,
    rerank: int = 100,
    head_ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(query_id, vec_id, dot) — two-stage PQ retrieval, the production ANN
    shape: stage 1 scores EVERY vector through the compressed PQ codes
    (ADC, see pq_topk) and keeps a top-``rerank`` shortlist per query;
    stage 2 re-scores only the shortlist with the exact quantized inner
    product and keeps the final top-k. Ties break by vec_id ascending.

    Scale shape: the shortlist is n_queries x rerank ids — bounded-small
    driver state (same class as any top-k head), broadcast once; stage 2
    is one pass over the vector table that does full-dimension math ONLY
    for shortlist rows (at serving scale this pass becomes point lookups
    against the vector store keyed by vec_id). Recall is governed by
    ``rerank``/corpus density, not by ADC rank fidelity, which is why
    two-stage is the deployed standard. ``dot`` is an exact int64
    (64 dims x (1e6)^2 bounds it < 2^53) — hash-replayable in SQL."""
    short = pq_topk(
        ds, n_queries=n_queries, k=rerank, m_sub=m_sub, ksub=ksub,
        iters=iters, head_ds=head_ds,
    ).take_all()
    cand: dict[int, set[int]] = {}
    for r in short:
        cand.setdefault(r["query_id"], set()).add(r["vec_id"])

    queries = _head_rows(ds, head_ds, n_queries)
    q_ids = [r["vec_id"] for r in queries]
    q_mat = _quantize(np.asarray([r["embedding"] for r in queries], dtype=np.float64))
    cand_arrays = [
        np.asarray(sorted(cand.get(q_id, ())), dtype=np.int64) for q_id in q_ids
    ]
    state_ref = ray.put((q_ids, q_mat, cand_arrays))

    def batch_rerank(batch: pa.Table) -> pa.Table:
        q_ids, q_mat, cand_arrays = ray.get(state_ref)
        mat = _quantize(_stack(batch))
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        out_q, out_v, out_d = [], [], []
        for qi, q_id in enumerate(q_ids):
            mask = np.isin(vec_ids, cand_arrays[qi])
            if not mask.any():
                continue
            vids = vec_ids[mask]
            dots = (mat[mask] @ q_mat[qi]).astype(np.int64)
            out_q.extend([q_id] * len(vids))
            out_v.extend(vids.tolist())
            out_d.extend(dots.tolist())
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "dot": pa.array(out_d, type=pa.int64()),
            }
        )

    def reduce_topk(group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(), key=lambda r: (-r["dot"], r["vec_id"]))[:k]
        return pa.Table.from_pylist(rows, schema=group.schema)

    return (
        ds.map_batches(batch_rerank, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(reduce_topk, batch_format="pyarrow")
    )


def embedding_covariance(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(i, j, n, sum_i, sum_j, sum_ij) for every dimension pair j >= i —
    the exact sufficient statistics for the embedding mean / covariance /
    whitening (PCA) transform: consumers form mean = sum_i/n and
    cov_ij = (sum_ij - sum_i*sum_j/n)/n in float AFTER the exact-integer
    reduction, so the distributed part stays hash-checkable.

    Components quantize to the shared 1e6 fixed-point grid; each block
    reduces to one d(d+1)/2-row partial via an int64 q.T @ q matmul, and
    ONE tiny keyed (i, j) groupby folds partials — no payload shuffle,
    driver state zero. int64 bound: |q| <= ~1e6 so sum_ij grows ~1e12 per
    row; exact to ~9e6 rows per reduction path — beyond that, shard the
    fold (or widen to HUGEINT in the sink) before trusting the tail
    digits."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        q = _quantize(_stack(batch)).astype(np.int64)
        n, d = q.shape
        m = q.T @ q
        s = q.sum(axis=0)
        iu, ju = np.triu_indices(d)
        return pa.Table.from_pydict(
            {
                "i": pa.array(iu.astype(np.int64), type=pa.int64()),
                "j": pa.array(ju.astype(np.int64), type=pa.int64()),
                "pn": pa.array(np.full(len(iu), n, dtype=np.int64)),
                "psi": pa.array(s[iu], type=pa.int64()),
                "psj": pa.array(s[ju], type=pa.int64()),
                "psij": pa.array(m[iu, ju], type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("pn"), Sum("psi"), Sum("psj"), Sum("psij"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "i": batch["i"],
                "j": batch["j"],
                "n": batch["sum(pn)"].cast(pa.int64()),
                "sum_i": batch["sum(psi)"].cast(pa.int64()),
                "sum_j": batch["sum(psj)"].cast(pa.int64()),
                "sum_ij": batch["sum(psij)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def label_exemplars(ds: ray.data.Dataset, k: int = 5) -> ray.data.Dataset:
    """(label, rk, vec_id, cos_fp5) — the k most CENTRAL members of every
    label (highest quantized cosine to their own label centroid,
    deterministic (cos desc, vec_id asc) tie-break): the few-shot
    exemplar / prototype selection step that pairs with
    label_centroid_stats' cohesion diagnostics. Same exact-integer
    centroid + cosine contract, so the whole selection replays in SQL.

    Scale shape: the centroid fold is the shared kmeans partial-sum
    sweep; scoring is one vectorized matmul per batch with a PER-BLOCK
    per-label top-k pre-prune (<= #labels*k rows leave any block — the
    stratified_sample trick), then ONE tiny keyed groupby picks the
    global top-k."""
    import ray as _ray

    def part_sums(batch: pa.Table) -> pa.Table:
        mat_q = _quantize(_stack(batch))
        labels = np.asarray(batch["label"].to_pylist(), dtype=np.int64)
        ls, sums, counts = [], [], []
        for lb in np.unique(labels):
            sel = mat_q[labels == lb]
            ls.append(int(lb))
            sums.append(sel.sum(axis=0).astype(np.int64).tolist())
            counts.append(int(sel.shape[0]))
        return pa.Table.from_pydict(
            {
                "label": pa.array(ls, type=pa.int64()),
                "vec_sum": pa.array(sums, type=pa.list_(pa.int64())),
                "count": pa.array(counts, type=pa.int64()),
            }
        )

    cent_ref = _ray.put(_label_centroid_fold(ds, part_sums))

    def score_prune(batch: pa.Table) -> pa.Table:
        c = _ray.get(cent_ref)
        mat_q = _quantize(_stack(batch))
        labels = np.asarray(batch["label"].to_pylist(), dtype=np.int64)
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        ls, vs, cs = [], [], []
        for lb in np.unique(labels):
            sel = labels == lb
            cos = _fp5(_cos_matrix(mat_q[sel], c[int(lb)][None, :])[:, 0])
            ids = vec_ids[sel]
            order = np.lexsort((ids, -cos))[:k]  # block-local top-k
            ls.extend([int(lb)] * len(order))
            vs.extend(ids[order].tolist())
            cs.extend(cos[order].astype(np.int64).tolist())
        return pa.Table.from_pydict(
            {
                "label": pa.array(ls, type=pa.int64()),
                "vec_id": pa.array(vs, type=pa.int64()),
                "cos_fp5": pa.array(cs, type=pa.int64()),
            }
        )

    OUT_SCHEMA = pa.schema(
        [
            ("label", pa.int64()),
            ("rk", pa.int64()),
            ("vec_id", pa.int64()),
            ("cos_fp5", pa.int64()),
        ]
    )

    def pick(group: pa.Table) -> pa.Table:
        cos = group["cos_fp5"].to_numpy(zero_copy_only=False)
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -cos))[:k]
        return pa.Table.from_pydict(
            {
                "label": pa.array(
                    [group["label"][0].as_py()] * len(order), type=pa.int64()
                ),
                "rk": pa.array(
                    np.arange(1, len(order) + 1, dtype=np.int64)
                ),
                "vec_id": pa.array(ids[order], type=pa.int64()),
                "cos_fp5": pa.array(cos[order], type=pa.int64()),
            },
            schema=OUT_SCHEMA,
        )

    return (
        ds.map_batches(score_prune, batch_format="pyarrow")
        .groupby("label")
        .map_groups(pick, batch_format="pyarrow")
    )


def pq_index_incremental(
    ds: ray.data.Dataset,
    m_sub: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = 2,
    head_ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(vec_id, code_packed, sq_err) — nightly ANN index APPEND: PQ codes
    for the NEW side (odd vec_ids — the crawl batch) under codebooks
    trained ONLY on the EXISTING side (even vec_ids) and then FROZEN.
    This is the index-maintenance contract production IVF/PQ serving
    tiers run: retraining codebooks would invalidate every code already
    stored, so incremental ingest encodes against the frozen index and
    retraining happens only at compaction. The incremental sibling of
    dedup_incremental, for the vector index instead of the hash set.

    code_packed packs the m_sub 4-bit codes (ksub=16) into one int64
    (code_m << 4m) — the stored index payload, 32 bits per 64-dim vector.
    sq_err = the exact-integer L2^2 reconstruction error (sum over
    subspaces of |x_m|^2 - 2<x_m, c*> + |c*|^2) — the index-quality
    number an ingest pipeline alerts on when a drifting crawl stops
    matching the frozen codebooks.

    Scale shape: training is pq_codebooks' partial-sum sweeps over the
    existing side only; the frozen (m_sub x ksub x subdim) books — a few
    KB — broadcast once via ray.put; encoding is embarrassingly parallel
    per batch. New vectors never shuffle; no groupby at all."""
    if ksub > 16:
        raise ValueError("code_packed packs 4-bit codes; ksub must be <= 16")

    def keep_even(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.equal(pc.bit_wise_and(batch["vec_id"], 1), 0)
        )

    train = ds.map_batches(keep_even, batch_format="pyarrow")
    head = _head_rows(ds, head_ds, 2 * ksub)
    even_head = [r for r in head if r["vec_id"] % 2 == 0][:ksub]
    init_q = _quantize(
        np.asarray([r["embedding"] for r in even_head], dtype=np.float64)
    )
    books = pq_codebooks(train, init_q, m_sub=m_sub, iters=iters)
    sd = books.shape[2]
    ref = ray.put(books)

    def encode_new(batch: pa.Table) -> pa.Table:
        bks = ray.get(ref)
        batch = batch.filter(
            pc.equal(pc.bit_wise_and(batch["vec_id"], 1), 1)
        )
        n = batch.num_rows
        if n == 0:
            return pa.Table.from_pydict(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "code_packed": pa.array([], type=pa.int64()),
                    "sq_err": pa.array([], type=pa.int64()),
                }
            )
        mat = _quantize(_stack(batch))
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        packed = np.zeros(n, dtype=np.int64)
        err = np.zeros(n, dtype=np.int64)
        rows = np.arange(n)
        for m in range(m_sub):
            x = mat[:, m * sd : (m + 1) * sd]
            cb = bks[m]
            # exact integers in float64: |c|^2 - 2<x,c> (see pq_codebooks)
            key = (cb * cb).sum(axis=1)[None, :] - 2.0 * (x @ cb.T)
            codes = np.argmin(key, axis=1)
            packed += codes.astype(np.int64) << (4 * m)
            err += (x * x).sum(axis=1).astype(np.int64) + key[
                rows, codes
            ].astype(np.int64)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(vec_ids, type=pa.int64()),
                "code_packed": pa.array(packed, type=pa.int64()),
                "sq_err": pa.array(err, type=pa.int64()),
            }
        )

    return ds.map_batches(encode_new, batch_format="pyarrow")


def hard_negatives(
    ds: ray.data.Dataset,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    head_ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(query_id, vec_id, cos_fp5) — contrastive hard-negative mining:
    for each of the first ``n_queries`` vectors, the ``k`` most
    cosine-similar vectors whose LABEL DIFFERS from the query's (ties by
    vec_id ascending) — the negatives that sit closest to the decision
    boundary, which is exactly what contrastive / triplet training wants
    mined from the corpus (easy negatives teach nothing).

    Shape: identical to [[knn_bruteforce]] — broadcast query matrix
    (ids, labels, quantized rows via ray.put once), per-block exact
    cosine + label-mismatch mask + per-block top-k prune, one
    query-keyed k-way merge. Same fixed-point exactness contract.

    Oracle: the knn_cosine CTE with a label join and a label-mismatch
    predicate."""
    queries = _head_rows(ds, head_ds, n_queries)
    q_ids = [r["vec_id"] for r in queries]
    q_labels = np.asarray([r["label"] for r in queries], dtype=np.int64)
    q_mat = _quantize(
        np.asarray([r["embedding"] for r in queries], dtype=np.float64)
    )
    q_ref = ray.put((q_ids, q_labels, q_mat))

    def batch_topk(batch: pa.Table) -> pa.Table:
        q_ids, q_labels, q_mat = ray.get(q_ref)
        mat = _quantize(_stack(batch))
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        labels = np.asarray(batch["label"].to_pylist(), dtype=np.int64)
        cos = _cos_matrix(mat, q_mat)
        out_q, out_v, out_c = [], [], []
        for qi, q_id in enumerate(q_ids):
            col = _fp5(cos[:, qi])
            mask = labels != q_labels[qi]
            vids, vals = vec_ids[mask], col[mask]
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
        rows = sorted(
            group.to_pylist(), key=lambda r: (-r["cos_fp5"], r["vec_id"])
        )[:k]
        return pa.Table.from_pylist(rows, schema=group.schema)

    return (
        ds.map_batches(batch_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(reduce_topk, batch_format="pyarrow")
    )


def matryoshka_error(
    ds: ray.data.Dataset, prefix_dim: int = 16
) -> ray.data.Dataset:
    """(vec_id, prefix_dim, keep_ratio_fp6) — Matryoshka truncation audit:
    for every embedding, the cosine between the full vector and its
    ``prefix_dim``-dimensional prefix (zero-padded), which reduces to
    ||v[:m]|| / ||v|| — the per-vector energy kept when serving truncated
    embeddings (the MRL deployment decision: how much recall do the first
    m dims carry?). Zero-norm vectors are skipped on both sides.

    Exactness: components quantize to exact 1e6 fixed-point integers in
    float64 ([[_quantize]]), both squared norms are exact integer sums
    (< 2^53), then ONE fixed IEEE sequence — sqrt, sqrt, divide,
    *1e6, floor(+0.5) — bit-identical to the oracle's expression.

    Shape: embarrassingly parallel map_batches, zero shuffle, one scan."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        mat = _quantize(_stack(batch))
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        ssq = (mat * mat).sum(axis=1)
        m = min(prefix_dim, mat.shape[1]) if mat.ndim == 2 else prefix_dim
        ssq_m = (mat[:, :m] * mat[:, :m]).sum(axis=1)
        keep = ssq > 0
        ratio = np.sqrt(ssq_m[keep]) / np.sqrt(ssq[keep])
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(vec_ids[keep], type=pa.int64()),
                "prefix_dim": pa.array(
                    np.full(int(keep.sum()), m), type=pa.int64()
                ),
                "keep_ratio_fp6": pa.array(
                    np.floor(ratio * 1e6 + 0.5).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def knn_label_purity(
    ds: ray.data.Dataset,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    head_ds: ray.data.Dataset | None = None,
    labels_path: str | None = None,
) -> ray.data.Dataset:
    """(query_id, label, n_same, purity_fp6) — embedding-quality audit:
    for each of the first ``n_queries`` vectors, the fraction of its
    exact top-``k`` cosine neighbors that share its label (purity_fp6 =
    n_same * 1e6 // k, exact integer). The metric every embedding
    pipeline reports before trusting ANN-based curation.

    Shape: the neighbor set comes from [[knn_bruteforce]] (per-block
    top-k pre-prune, broadcast query matrix); labels for the bounded
    n_queries x k id set come from a ROW-FILTERED parquet read (isin
    pushdown — never a full-table label scan), and the purity fold is
    O(n_queries x k) driver arithmetic on that bounded set.

    Oracle: the knn_cosine top-k CTE joined twice against labels."""
    import os

    import pyarrow.compute as _pc
    import pyarrow.dataset as pads

    topk = knn_bruteforce(
        ds.select_columns(["vec_id", "embedding"]),
        n_queries=n_queries,
        k=k,
        head_ds=head_ds,
    ).take_all()  # bounded: n_queries * k rows
    need = sorted(
        {r["vec_id"] for r in topk} | {r["query_id"] for r in topk}
    )
    if labels_path is not None:
        lt = (
            pads.dataset(labels_path)
            .to_table(
                columns=["vec_id", "label"],
                filter=_pc.field("vec_id").isin(need),
            )
        )
        labels = dict(
            zip(lt["vec_id"].to_pylist(), lt["label"].to_pylist())
        )
    else:
        # fall back to a vectorized isin pass over the Dataset (still
        # pruned to two int columns; at scale prefer labels_path
        # pushdown into the parquet scan)
        need_arr = pa.array(need, type=pa.int64())

        def pick(batch: pa.Table) -> pa.Table:
            keep = _pc.is_in(batch["vec_id"].cast(pa.int64()), need_arr)
            return batch.select(["vec_id", "label"]).filter(keep)

        labels = {
            r["vec_id"]: r["label"]
            for r in ds.map_batches(pick, batch_format="pyarrow").take_all()
        }
    agg: dict[int, int] = {}
    for r in topk:
        same = int(labels[r["vec_id"]] == labels[r["query_id"]])
        agg[r["query_id"]] = agg.get(r["query_id"], 0) + same
    qids = sorted(agg)
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "label": pa.array(
                    [int(labels[q]) for q in qids], type=pa.int64()
                ),
                "n_same": pa.array([agg[q] for q in qids], type=pa.int64()),
                "purity_fp6": pa.array(
                    [agg[q] * 1_000_000 // k for q in qids], type=pa.int64()
                ),
            }
        )
    )


def mmr_select(
    ds: ray.data.Dataset,
    n_select: int = 8,
    pool: int = 64,
    lam_pct: int = 70,
    head_ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(rk, vec_id, rel_fp5, score_fp5) — Maximal Marginal Relevance
    diversified selection: greedily pick ``n_select`` vectors maximizing
    ``lam·cos(q, d) − (1−lam)·max_{s∈selected} cos(d, s)`` against the
    query (vec_id 0), from a candidate pool of the ``pool`` highest-
    relevance vectors. The diversity-selection primitive for curation:
    top-k alone returns near-duplicates, MMR spends the same budget on
    coverage.

    Shape: the pool is a distributed per-block top-``pool`` relevance
    prune (embeddings ride ONLY for block survivors) → bounded
    O(pool × dim) driver state → the greedy loop is driver-side over
    that bounded pool (inherently sequential — each pick changes the
    next argmax; pool ≪ corpus is the scale contract, documented).
    All scores are the exact fixed-point cosine contract (_quantize /
    _fp5); ties break by vec_id ascending. Greedy argmax chains are
    not SQL-expressible — rows-only check + pytest fixtures."""
    q_rows = _head_rows(ds, head_ds, 1)
    q_vec = _quantize(
        np.asarray([q_rows[0]["embedding"]], dtype=np.float64)
    )
    q_id = q_rows[0]["vec_id"]
    q_ref = ray.put((q_id, q_vec))

    def block_pool(batch: pa.Table) -> pa.Table:
        q_id, q_vec = ray.get(q_ref)
        mat = _quantize(_stack(batch))
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        rel = _fp5(_cos_matrix(mat, q_vec)[:, 0])
        mask = vec_ids != q_id
        vids, vals, sub = vec_ids[mask], rel[mask], mat[mask]
        order = np.lexsort((vids, -vals))[:pool]
        out = pa.Table.from_pydict(
            {
                "vec_id": pa.array(vids[order], type=pa.int64()),
                "rel_fp5": pa.array(vals[order], type=pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in sub[order]],
                    type=pa.list_(pa.float64()),
                ),
            }
        )
        return out

    cand = sorted(
        ds.map_batches(block_pool, batch_format="pyarrow").take_all(),
        key=lambda r: (-r["rel_fp5"], r["vec_id"]),
    )[:pool]  # bounded driver fold: O(pool × dim)
    ids = np.asarray([r["vec_id"] for r in cand], dtype=np.int64)
    rel = np.asarray([r["rel_fp5"] for r in cand], dtype=np.int64)
    emb = np.asarray([r["embedding"] for r in cand], dtype=np.float64)
    # candidate×candidate similarity once (pool² fp5 ints, exact contract)
    sim = _fp5(_cos_matrix(emb, emb))

    selected: list[int] = []
    out_rk, out_id, out_rel, out_score = [], [], [], []
    remaining = np.ones(len(ids), dtype=bool)
    for rk in range(min(n_select, len(ids))):
        if not selected:
            max_sim = np.zeros(len(ids), dtype=np.int64)
        else:
            max_sim = sim[:, selected].max(axis=1)
        # argmax over the REMAINING candidates only (vec_id-ascending
        # ties); scores stay small so the negation below is overflow-safe
        idx_rem = np.flatnonzero(remaining)
        sc = lam_pct * rel[idx_rem] - (100 - lam_pct) * max_sim[idx_rem]
        best_pos = int(np.lexsort((ids[idx_rem], -sc))[0])
        best = int(idx_rem[best_pos])
        selected.append(best)
        remaining[best] = False
        out_rk.append(rk)
        out_id.append(int(ids[best]))
        out_rel.append(int(rel[best]))
        out_score.append(int(sc[best_pos]))
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "rk": pa.array(out_rk, type=pa.int64()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "rel_fp5": pa.array(out_rel, type=pa.int64()),
                "score_fp5": pa.array(out_score, type=pa.int64()),
            }
        )
    )


def near_dup_degree_hist(
    ds: ray.data.Dataset,
    threshold_fp5: int = NEAR_DUP_FP5,
    row_count: int | None = None,
) -> ray.data.Dataset:
    """(degree, n_vecs) — degree histogram of the near-duplicate graph:
    how many vectors have 0, 1, 2, … neighbors above the cosine
    threshold. The cluster-shape census a dedup planner reads to decide
    between pair-verify and connected-components before running either.

    Shape: pairs come from [[near_dup_pairs]] (which auto-routes
    exact→LSH above its broadcast ceiling); each pair block emits both
    endpoints' partial counts → ONE keyed Sum per vec_id → per-block
    degree-histogram partials → ONE tiny keyed sum on degree. The
    degree-0 row is total_rows − |vecs with any pair| (footer-metadata
    count — no extra pass).

    Oracle: the embedding_near_dup pairs CTE unnested to endpoints."""
    from ray.data.aggregate import Sum

    if row_count is None:
        row_count = ds.count()
    pairs = near_dup_pairs(ds, threshold_fp5=threshold_fp5, row_count=row_count)

    def endpoint_partials(batch: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [
                batch["vec_a"].to_numpy(zero_copy_only=False),
                batch["vec_b"].to_numpy(zero_copy_only=False),
            ]
        )
        keys, counts = np.unique(ids, return_counts=True)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(keys, type=pa.int64()),
                "deg": pa.array(counts, type=pa.int64()),
            }
        )

    per_vec = (
        pairs.map_batches(endpoint_partials, batch_format="pyarrow")
        .groupby("vec_id")
        .aggregate(Sum("deg", alias_name="deg"))
    )

    def hist_partials(batch: pa.Table) -> pa.Table:
        degs = batch["deg"].to_numpy(zero_copy_only=False)
        keys, counts = np.unique(degs, return_counts=True)
        return pa.Table.from_pydict(
            {
                "degree": pa.array(keys, type=pa.int64()),
                "n_vecs": pa.array(counts, type=pa.int64()),
            }
        )

    rows = (
        per_vec.map_batches(hist_partials, batch_format="pyarrow")
        .groupby("degree")
        .aggregate(Sum("n_vecs", alias_name="n_vecs"))
        .take_all()
    )  # bounded: distinct degrees
    n_with_pairs = sum(r["n_vecs"] for r in rows)
    out = {"degree": [0], "n_vecs": [row_count - n_with_pairs]}
    for r in sorted(rows, key=lambda r: r["degree"]):
        out["degree"].append(r["degree"])
        out["n_vecs"].append(r["n_vecs"])
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "degree": pa.array(out["degree"], type=pa.int64()),
                "n_vecs": pa.array(out["n_vecs"], type=pa.int64()),
            }
        )
    )


def embedding_drift(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(label, n_even, n_odd, drift_l1) — distribution-drift probe over a
    labeled embedding table: split each label by vec_id parity (the
    deterministic stand-in for two snapshots/epochs of the same class),
    compute both halves' exact integer centroids (the
    [[label_centroid_stats]] fixed-point rule: 1e6-quantized component
    sums, floor(sum/count + 0.5)), and report the L1 distance between
    them in fixed-point units. A label whose halves disagree has drifted
    (teacher change, crawl shift) and gets routed to re-labeling.
    Labels with an empty half are omitted (no distance to report).

    Scale shape: ONE partial-sum sweep keyed by (label, half) — per-block
    map_batches partials, driver folds O(#labels x 2 x dim) integers
    (small by construction of a label space); no shuffle at all.

    Oracle: unnest + per-(label, half, dim) centroid, list L1 join."""
    import ray as _ray

    def part_sums(batch: pa.Table) -> pa.Table:
        mat_q = _quantize(_stack(batch))
        labels = np.asarray(batch["label"].to_pylist(), dtype=np.int64)
        halves = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64) % 2
        ls, hs, sums, counts = [], [], [], []
        for lb in np.unique(labels):
            for h in (0, 1):
                sel = mat_q[(labels == lb) & (halves == h)]
                if sel.shape[0] == 0:
                    continue
                ls.append(int(lb))
                hs.append(int(h))
                sums.append(sel.sum(axis=0).astype(np.int64).tolist())
                counts.append(int(sel.shape[0]))
        return pa.Table.from_pydict(
            {
                "label": pa.array(ls, type=pa.int64()),
                "half": pa.array(hs, type=pa.int64()),
                "vec_sum": pa.array(sums, type=pa.list_(pa.int64())),
                "count": pa.array(counts, type=pa.int64()),
            }
        )

    sums: dict[tuple[int, int], np.ndarray] = {}
    counts: dict[tuple[int, int], int] = {}
    for b in ds.map_batches(part_sums, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for lb, h, vs, n in zip(
            b["label"].to_pylist(),
            b["half"].to_pylist(),
            b["vec_sum"].to_pylist(),
            b["count"].to_pylist(),
        ):
            key = (lb, h)
            if key in sums:
                sums[key] += np.asarray(vs, dtype=np.int64)
                counts[key] += n
            else:
                sums[key] = np.asarray(vs, dtype=np.int64)
                counts[key] = n

    rows_lb, rows_ne, rows_no, rows_d = [], [], [], []
    for lb in sorted({k[0] for k in sums}):
        if (lb, 0) not in sums or (lb, 1) not in sums:
            continue
        c0 = np.floor(
            sums[(lb, 0)].astype(np.float64) / counts[(lb, 0)] + 0.5
        ).astype(np.int64)
        c1 = np.floor(
            sums[(lb, 1)].astype(np.float64) / counts[(lb, 1)] + 0.5
        ).astype(np.int64)
        rows_lb.append(lb)
        rows_ne.append(counts[(lb, 0)])
        rows_no.append(counts[(lb, 1)])
        rows_d.append(int(np.abs(c0 - c1).sum()))

    import ray.data as _rd

    return _rd.from_arrow(
        pa.Table.from_pydict(
            {
                "label": pa.array(rows_lb, type=pa.int64()),
                "n_even": pa.array(rows_ne, type=pa.int64()),
                "n_odd": pa.array(rows_no, type=pa.int64()),
                "drift_l1": pa.array(rows_d, type=pa.int64()),
            }
        )
    )


def knn_recall_report(
    ds: ray.data.Dataset,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    head_ds: ray.data.Dataset | None = None,
    ivf_head_ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(query_id, k, n_hit, recall_fp5) — the ANN evaluation loop as a
    first-class operator: recall@k of the [[knn_ivf]] approximate index
    against the [[knn_cosine]] exact ground truth, per query (exact
    fixed-point ``n_hit · 10^5 // k``). The acceptance gate run after
    every index build/parameter change — an index that silently drops to
    0.6 recall poisons every retrieval-curation stage downstream.

    Scale shape: both sides' top-k lists are O(n_queries × k) int rows;
    they ride ONE tagged union keyed by (query_id, vec_id) (membership
    intersection), then ONE tiny query_id sum. The expensive parts ARE
    the two index sweeps, each already scale-shaped; the report adds no
    full-data pass.

    Oracle: the knn_ivf and knn_cosine replays as subqueries, LEFT JOIN
    membership, integer // recall."""
    exact = knn_bruteforce(ds, n_queries=n_queries, k=k, head_ds=head_ds)
    approx = ivf_knn(ds, n_queries=n_queries, k=k, head_ds=ivf_head_ds)
    return _topk_recall(exact, approx, k)


def pq_recall_report(
    ds: ray.data.Dataset,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    head_ds: ray.data.Dataset | None = None,
    pq_head_ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(query_id, k, n_hit, recall_fp5) — [[knn_recall_report]]'s PQ/ADC
    twin: recall@k of the [[knn_pq]] product-quantized index against the
    exact cosine ground truth. Together the two reports cover both
    approximate index families the engine serves; the same tagged-union
    machinery ([[_topk_recall]]) computes the intersection."""
    exact = knn_bruteforce(ds, n_queries=n_queries, k=k, head_ds=head_ds)
    approx = pq_topk(ds, n_queries=n_queries, k=k, head_ds=pq_head_ds)
    return _topk_recall(exact, approx, k)


def _topk_recall(
    exact: ray.data.Dataset, approx: ray.data.Dataset, k: int
) -> ray.data.Dataset:
    """Shared recall@k machinery: both (query_id, vec_id, ...) top-k
    lists ride ONE tagged union keyed by (query_id, vec_id), then ONE
    tiny query_id sum — int rows only, no full-data pass."""
    from ray.data.aggregate import Sum

    def tag(flag_e: int, flag_i: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.Table.from_pydict(
                {
                    "query_id": batch["query_id"].cast(pa.int64()),
                    "vec_id": batch["vec_id"].cast(pa.int64()),
                    "in_exact": pa.array([flag_e] * n, type=pa.int64()),
                    "in_ivf": pa.array([flag_i] * n, type=pa.int64()),
                }
            )

        return fn

    merged = (
        exact.map_batches(tag(1, 0), batch_format="pyarrow")
        .union(approx.map_batches(tag(0, 1), batch_format="pyarrow"))
        .groupby(["query_id", "vec_id"])
        .aggregate(
            Sum("in_exact", alias_name="in_exact"),
            Sum("in_ivf", alias_name="in_ivf"),
        )
    )

    def hit_partial(batch: pa.Table) -> pa.Table:
        e = batch["in_exact"].to_numpy(zero_copy_only=False)
        i = batch["in_ivf"].to_numpy(zero_copy_only=False)
        t = pa.Table.from_pydict(
            {
                "query_id": batch["query_id"].cast(pa.int64()),
                "n_hit": pa.array(((e > 0) & (i > 0)).astype(np.int64)),
            }
        )
        g = t.group_by(["query_id"]).aggregate([("n_hit", "sum")])
        return g.rename_columns(["query_id", "n_hit"])

    def finish(batch: pa.Table) -> pa.Table:
        hits = batch["n_hit"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "query_id": batch["query_id"].cast(pa.int64()),
                "k": pa.array([k] * len(hits), type=pa.int64()),
                "n_hit": pa.array(hits),
                "recall_fp5": pa.array(hits * 100_000 // k, type=pa.int64()),
            }
        )

    return (
        merged.map_batches(hit_partial, batch_format="pyarrow")
        .groupby("query_id")
        .aggregate(Sum("n_hit", alias_name="n_hit"))
        .map_batches(finish, batch_format="pyarrow")
    )


def embedding_norm_outliers(
    ds: ray.data.Dataset, z: int = 2
) -> ray.data.Dataset:
    """(vec_id, nsq) — broken-embedding detector: vectors whose exact
    quantized squared norm is a > z-sigma outlier against the corpus
    population. A unit-normalized embedding table's norms concentrate
    tightly; truncated reads, zero rows, or mixed-model batches stand
    out immediately. The z-test is [[outlier_events]]'s EXACT integer
    inequality ``(n·x − S)² > z²·(n·Q − S²)`` — float-free, Python ints
    on the driver, HUGEINT in the oracle (int128 bounds hold to ~10⁵
    vectors per run at 64 dims; shard the sweep beyond that).

    Scale shape: pass 1 folds 3 integer moments from per-block partials
    (driver state O(1)); the broadcast moments flag in pass 2 — no
    shuffle at all."""
    import ray as _ray

    def moment_partial(batch: pa.Table) -> pa.Table:
        q = _quantize(_stack(batch))
        nsq = (q * q).sum(axis=1).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "n": pa.array([len(nsq)], type=pa.int64()),
                "s": pa.array([int(nsq.sum())], type=pa.int64()),
                "qq": pa.array(
                    [str(int(sum(int(v) * int(v) for v in nsq)))],
                    type=pa.string(),  # int128-wide partial rides as text
                ),
            }
        )

    n_tot, s_tot, qq_tot = 0, 0, 0
    for b in ds.map_batches(moment_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        n_tot += int(pc.sum(b["n"]).as_py())
        s_tot += int(pc.sum(b["s"]).as_py())
        qq_tot += sum(int(v) for v in b["qq"].to_pylist())

    mom_ref = _ray.put((n_tot, s_tot, qq_tot, z * z))

    def flag(batch: pa.Table) -> pa.Table:
        n, s, qq, zz = _ray.get(mom_ref)
        q = _quantize(_stack(batch))
        nsq = (q * q).sum(axis=1).astype(np.int64)
        rhs = zz * (n * qq - s * s)
        keep = [
            (n * int(x) - s) * (n * int(x) - s) > rhs for x in nsq
        ]
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)[keep]
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "nsq": pa.array(nsq[keep], type=pa.int64()),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


def near_dup_triangles(
    ds: ray.data.Dataset,
    threshold_fp5: int = NEAR_DUP_FP5,
    row_count: int | None = None,
) -> ray.data.Dataset:
    """One row (n_nodes, n_edges, n_wedges, n_triangles, clustering_fp5)
    — triangle census of the near-duplicate graph, the cluster-density
    signal a dedup planner reads next to [[near_dup_degree_hist]]'s
    degree census: a high global clustering coefficient (3T/W) means the
    near-dup pairs close into cliques (true duplicate groups — safe to
    collapse via connected components); a low one means chains/stars
    (threshold too loose — components over-merge).

    Distributed shape (the MapReduce node-iterator with DEGREE
    ORIENTATION, Suri & Vassilvitskii 2011): degrees via one keyed sum
    over pair endpoints; each edge is oriented toward the (degree, id)-
    larger endpoint, so every node's OUT-degree is O(sqrt(m)) no matter
    how skewed the raw degrees are — the hub that would otherwise emit
    deg^2 wedges emits none. Wedges (v, w) generated per source from the
    sorted out-adjacency close into triangles via ONE tagged-union keyed
    groupby against the edge set; nothing quadratic in a hub's degree
    ever materializes. Degree attach rides the shared guarded-broadcast /
    tagged-union core (``keyed_attach_int``).

    clustering_fp5 = floor(3T/W * 1e5 + 0.5) in pure integer arithmetic
    ((600000*T + W) // (2W)) so the DuckDB oracle replays it exactly."""
    from ray.data.aggregate import Sum

    from .relational import keyed_attach_int

    if row_count is None:
        row_count = ds.count()
    pairs = near_dup_pairs(
        ds, threshold_fp5=threshold_fp5, row_count=row_count
    ).materialize()  # reused three times: degrees, orientation, closing join
    n_edges = pairs.count()  # metadata-only on a materialized dataset
    zeros = pa.Table.from_pydict(
        {
            c: pa.array([0], type=pa.int64())
            for c in (
                "n_nodes", "n_edges", "n_wedges", "n_triangles",
                "clustering_fp5",
            )
        }
    )
    if n_edges == 0:
        return ray.data.from_arrow(zeros)

    def endpoint_partials(batch: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [
                batch["vec_a"].to_numpy(zero_copy_only=False),
                batch["vec_b"].to_numpy(zero_copy_only=False),
            ]
        )
        keys, counts = np.unique(ids, return_counts=True)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(keys, type=pa.int64()),
                "deg": pa.array(counts, type=pa.int64()),
            }
        )

    deg = (
        pairs.map_batches(endpoint_partials, batch_format="pyarrow")
        .groupby("vec_id")
        .aggregate(Sum("deg", alias_name="deg"))
        .materialize()
    )
    n_nodes = deg.count()

    def wedge_caps(batch: pa.Table) -> pa.Table:
        d = batch["deg"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"w": pa.array([int((d * (d - 1) // 2).sum())], type=pa.int64())}
        )

    wrows = deg.map_batches(wedge_caps, batch_format="pyarrow").take_all()
    n_wedges = sum(r["w"] for r in wrows)  # one scalar per block

    def edge_cols(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"a": batch["vec_a"], "b": batch["vec_b"]}
        )

    edges = pairs.map_batches(edge_cols, batch_format="pyarrow")
    dim_a = deg.map_batches(
        lambda b: pa.Table.from_pydict(
            {"a": b["vec_id"], "deg_a": b["deg"]}
        ),
        batch_format="pyarrow",
    )
    dim_b = deg.map_batches(
        lambda b: pa.Table.from_pydict(
            {"b": b["vec_id"], "deg_b": b["deg"]}
        ),
        batch_format="pyarrow",
    )
    withdeg = keyed_attach_int(
        keyed_attach_int(edges, dim_a, "a", "deg_a", ("b",),
                         dim_count=n_nodes),
        dim_b, "b", "deg_b", ("a", "deg_a"), dim_count=n_nodes,
    )

    def orient(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        da = batch["deg_a"].to_numpy(zero_copy_only=False)
        db = batch["deg_b"].to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        return pa.Table.from_pydict(
            {
                "src": pa.array(src, type=pa.int64()),
                "dst": pa.array(dst, type=pa.int64()),
            }
        )

    oriented = withdeg.map_batches(orient, batch_format="pyarrow")

    def emit_wedges(group: pa.Table) -> pa.Table:
        ns = np.sort(group["dst"].to_numpy(zero_copy_only=False))
        i, j = np.triu_indices(len(ns), 1)
        # wedge endpoints keyed (min, max) to meet the a<b edge key
        return pa.Table.from_pydict(
            {
                "a": pa.array(ns[i], type=pa.int64()),
                "b": pa.array(ns[j], type=pa.int64()),
                "n_wedge": pa.array(np.ones(len(i), dtype=np.int64)),
                "is_edge": pa.array(np.zeros(len(i), dtype=np.int64)),
            }
        )

    wedges = oriented.groupby("src").map_groups(
        emit_wedges, batch_format="pyarrow"
    )

    def tag_edges(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "a": batch["a"],
                "b": batch["b"],
                "n_wedge": pa.array(np.zeros(n, dtype=np.int64)),
                "is_edge": pa.array(np.ones(n, dtype=np.int64)),
            }
        )

    closed = (
        wedges.union(edges.map_batches(tag_edges, batch_format="pyarrow"))
        .groupby(["a", "b"])
        .aggregate(
            Sum("n_wedge", alias_name="n_wedge"),
            Sum("is_edge", alias_name="is_edge"),
        )
    )

    def tri_partials(batch: pa.Table) -> pa.Table:
        w = batch["n_wedge"].to_numpy(zero_copy_only=False)
        e = batch["is_edge"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"t": pa.array([int(w[e > 0].sum())], type=pa.int64())}
        )

    trows = closed.map_batches(tri_partials, batch_format="pyarrow").take_all()
    n_tri = sum(r["t"] for r in trows)
    clustering_fp5 = (
        0 if n_wedges == 0 else (600000 * n_tri + n_wedges) // (2 * n_wedges)
    )
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "n_nodes": pa.array([n_nodes], type=pa.int64()),
                "n_edges": pa.array([n_edges], type=pa.int64()),
                "n_wedges": pa.array([n_wedges], type=pa.int64()),
                "n_triangles": pa.array([n_tri], type=pa.int64()),
                "clustering_fp5": pa.array(
                    [clustering_fp5], type=pa.int64()
                ),
            }
        )
    )


def pca_recon_error(
    ds: ray.data.Dataset, n_components: int = 8
) -> ray.data.Dataset:
    """(label, n_vecs, sum_err_fp2, mean_err_fp2) — per-label PCA
    reconstruction error: fit a global k-component PCA from the exact
    integer sufficient statistics ([[embedding_covariance]]'s fold), then
    score every vector's squared residual off the principal subspace.
    The embedding-quality probe a curation pipeline reads per label/
    source: a label whose residual is far above the corpus mean lives
    OFF the dominant manifold (mislabeled cluster, modality drift, or
    injected garbage) and gets routed to review — same role as
    [[embedding_norm_outliers]] but sensitive to direction, not length.

    Distributed shape: pass 1 is the d(d+1)/2-row exact-integer
    covariance fold (no payload shuffle); eigh runs ONCE on the driver's
    d x d matrix (d is model-bounded, never data-bounded) and the (mean,
    basis) broadcast via ray.put; pass 2 is one matmul per batch with
    per-label integer partials -> ONE tiny keyed groupby over labels.

    No SQL oracle (eigendecomposition is not SQL-expressible) — the
    driver records rows-only; exactness is pytest-pinned against a
    numpy replay. Partition invariance holds because each ROW's error
    is quantized to fp2 BEFORE the integer sum (float only inside the
    deterministic per-row expression)."""
    from ray.data.aggregate import Sum

    cov_rows = embedding_covariance(ds).take_all()  # d(d+1)/2 rows
    d = max(r["j"] for r in cov_rows) + 1
    n = cov_rows[0]["n"]
    s = np.zeros(d, dtype=np.float64)
    m2 = np.zeros((d, d), dtype=np.float64)
    for r in cov_rows:
        i, j = r["i"], r["j"]
        s[i] = r["sum_i"]
        s[j] = r["sum_j"]
        m2[i, j] = m2[j, i] = r["sum_ij"]
    mean = s / n
    cov = (m2 - np.outer(s, s) / n) / n
    w, v = np.linalg.eigh(cov)
    basis = v[:, np.argsort(w)[::-1][:n_components]]  # d x k, descending
    state_ref = ray.put((mean, basis))

    def score(batch: pa.Table) -> pa.Table:
        mean, basis = ray.get(state_ref)
        q = _quantize(_stack(batch)).astype(np.float64)
        labels = np.asarray(batch["label"].to_pylist(), dtype=np.int64)
        r = q - mean
        proj = r @ basis
        err = (r * r).sum(axis=1) - (proj * proj).sum(axis=1)
        # per-row fp2 quantization BEFORE the sum: partition-invariant.
        # errors are in (1e6-quantized unit)^2 — rescale to the raw
        # embedding scale (1e-12) first, then 2 decimals.
        err_fp2 = np.floor(err * 1e-12 * 100.0 + 0.5).astype(np.int64)
        ls, ns, sums = [], [], []
        for lb in np.unique(labels):
            sel = err_fp2[labels == lb]
            ls.append(int(lb))
            ns.append(len(sel))
            sums.append(int(sel.sum()))
        return pa.Table.from_pydict(
            {
                "label": pa.array(ls, type=pa.int64()),
                "pn": pa.array(ns, type=pa.int64()),
                "perr": pa.array(sums, type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(score, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("pn"), Sum("perr"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        nv = batch["sum(pn)"].to_numpy(zero_copy_only=False).astype(np.int64)
        se = batch["sum(perr)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "label": batch["label"].cast(pa.int64()),
                "n_vecs": pa.array(nv, type=pa.int64()),
                "sum_err_fp2": pa.array(se, type=pa.int64()),
                "mean_err_fp2": pa.array(se // nv, type=pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def sq8_quantize_error(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(dim, n, mn_q, mx_q, n_sat, sse_q) — per-dimension error report for
    8-bit SCALAR quantization (SQ8, the FAISS/IVF-SQ storage format and
    the cheap sibling of [[knn_pq]]'s product quantizer): each dimension
    is affine-coded into 0..255 against its OWN [min, max], and the
    report gives the reconstruction SSE plus the saturation count (rows
    AT either endpoint — the outlier-clipping signal a curator checks
    before committing an index to SQ8). Pairs with [[embedding_norm_
    outliers]]: a heavy-tailed dimension shows up here as a huge range
    with concentrated codes (big SSE) rather than as a norm outlier.

    Exact-integer contract: components land on the shared 1e6 grid
    ([[embedding_covariance]]'s `_quantize`), and the ENTIRE codec is
    integer arithmetic on that grid — code = (2·255·(q−mn) + r) // (2r)
    (round-half-up of 255·(q−mn)/r), recon = mn + (2·code·r + 255) //
    (2·255) — so codes, recon, and per-term squared errors are exact
    int64 and the fold is order-free. Per-term err² ≤ (r/510·1e6)²; at
    unit-norm embeddings that is ~1.5e7, exact to ~6e11 rows/dim.

    Scale shape: TWO streaming passes. Pass 1: per-block per-dim
    min/max partials → ONE ≤d-row keyed fold → driver closure
    (O(d) ints). Pass 2: per-block integer codec + per-dim (n, sat,
    sse) partials → ONE ≤d-row keyed sum. No payload ever shuffles;
    driver state O(d)."""
    from ray.data.aggregate import Max, Min, Sum

    EMPTY_MM = pa.Table.from_pydict(
        {
            "dim": pa.array([], type=pa.int64()),
            "mn": pa.array([], type=pa.int64()),
            "mx": pa.array([], type=pa.int64()),
        }
    )

    def mm_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return EMPTY_MM
        q = _quantize(_stack(batch)).astype(np.int64)
        d = q.shape[1]
        return pa.Table.from_pydict(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "mn": pa.array(q.min(axis=0), type=pa.int64()),
                "mx": pa.array(q.max(axis=0), type=pa.int64()),
            }
        )

    mm = (
        ds.map_batches(mm_partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .take_all()
    )
    mn = np.array(
        [r["mn"] for r in sorted(mm, key=lambda r: r["dim"])], dtype=np.int64
    )
    mx = np.array(
        [r["mx"] for r in sorted(mm, key=lambda r: r["dim"])], dtype=np.int64
    )

    def err_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "dim": pa.array([], type=pa.int64()),
                    "pn": pa.array([], type=pa.int64()),
                    "psat": pa.array([], type=pa.int64()),
                    "psse": pa.array([], type=pa.int64()),
                }
            )
        q = _quantize(_stack(batch)).astype(np.int64)
        n, d = q.shape
        r = mx - mn
        rs = np.maximum(r, 1)  # constant dims: code 0, recon = mn, err 0
        code = (2 * 255 * (q - mn[None, :]) + rs[None, :]) // (
            2 * rs[None, :]
        )
        code = np.where(r[None, :] == 0, 0, code)
        recon = mn[None, :] + (2 * code * rs[None, :] + 255) // (2 * 255)
        recon = np.where(r[None, :] == 0, mn[None, :], recon)
        err = q - recon
        sat = (code == 0) | (code == 255)
        return pa.Table.from_pydict(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "pn": pa.array(np.full(d, n, dtype=np.int64)),
                "psat": pa.array(sat.sum(axis=0).astype(np.int64)),
                "psse": pa.array((err * err).sum(axis=0).astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(err_partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Sum("pn"), Sum("psat"), Sum("psse"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        d = batch["dim"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "dim": pa.array(d, type=pa.int64()),
                "n": batch["sum(pn)"].cast(pa.int64()),
                "mn_q": pa.array(mn[d], type=pa.int64()),
                "mx_q": pa.array(mx[d], type=pa.int64()),
                "n_sat": batch["sum(psat)"].cast(pa.int64()),
                "sse_q": batch["sum(psse)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def mutual_nn_pairs(
    ds: ray.data.Dataset,
    broadcast_row_limit: int = 100_000,
    row_count: int | None = None,
    dim: int = 64,
) -> ray.data.Dataset:
    """(vec_a, vec_b, cos_fp5) — RECIPROCAL nearest-neighbor pairs
    (a < b): a's top-1 cosine neighbor is b AND b's is a, ties broken
    by smallest vec_id. The classic mutual-NN matcher behind
    entity-alignment / translation-pair mining — far higher precision
    than one-directional top-1 because both sides must agree.

    Exact variant (the oracle twin): full quantized matrix broadcast
    once via ray.put, each batch argmaxes its rows against all columns
    (ids are sorted ascending so np.argmax's first-max rule IS the
    smallest-id tie-break), then ONE [[keyed_fold]] over canonical
    (a, b) keys keeps the pairs seen from BOTH directions (count==2).
    Above ``broadcast_row_limit`` rows this AUTO-ROUTES (logged) to the
    [[lsh_near_dup]] candidate set: per-vector best partner among
    candidates via a packed (cos << 41 | ~partner) max fold — partner
    ids must fit 41 bits (2.2e12, enough for the 10^12-doc regime) —
    then the same mutuality fold; recall follows the LSH bucket recall.
    Pass ``row_count`` (parquet footer metadata) for transformed inputs
    (the [[near_dup_pairs]] probe contract)."""
    if row_count is None:
        row_count = ds.count()

    def mutual_filter(pairs: ray.data.Dataset) -> ray.data.Dataset:
        from .exchange import keyed_fold

        folded = keyed_fold(
            pairs, ["vec_a", "vec_b"], [("cos_fp5", "max"), ("one", "sum")]
        )

        def keep2(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.equal(batch["one"], 2)).select(
                ["vec_a", "vec_b", "cos_fp5"]
            )

        return folded.map_batches(keep2, batch_format="pyarrow")

    if row_count > broadcast_row_limit:
        import logging

        logging.getLogger(__name__).warning(
            "mutual_nn_pairs: %d rows > broadcast_row_limit=%d — routing "
            "through lsh_near_dup candidates (approximate recall), same "
            "output schema",
            row_count,
            broadcast_row_limit,
        )
        cand = lsh_near_dup(ds, dim=dim)

        def directed(batch: pa.Table) -> pa.Table:
            a = batch["vec_a"].to_numpy(zero_copy_only=False)
            b = batch["vec_b"].to_numpy(zero_copy_only=False)
            c = batch["cos_fp5"].to_numpy(zero_copy_only=False)
            hi = (1 << 41) - 1
            if len(b) and (int(a.max()) > hi or int(b.max()) > hi):
                raise ValueError("mutual_nn_pairs: vec_id exceeds 41 bits")
            packed = np.concatenate(
                [c * (1 << 41) + (hi - b), c * (1 << 41) + (hi - a)]
            )
            return pa.Table.from_pydict(
                {
                    "i": pa.array(
                        np.concatenate([a, b]), type=pa.int64()
                    ),
                    "packed": pa.array(packed, type=pa.int64()),
                }
            )

        from .exchange import keyed_fold

        best = keyed_fold(
            cand.map_batches(directed, batch_format="pyarrow"),
            "i",
            [("packed", "max")],
        )

        def unpack(batch: pa.Table) -> pa.Table:
            i = batch["i"].to_numpy(zero_copy_only=False)
            p = batch["packed"].to_numpy(zero_copy_only=False)
            cos = p >> 41  # candidates all have cos >= threshold > 0
            nb = (1 << 41) - 1 - (p & ((1 << 41) - 1))
            return pa.Table.from_pydict(
                {
                    "vec_a": pa.array(np.minimum(i, nb), type=pa.int64()),
                    "vec_b": pa.array(np.maximum(i, nb), type=pa.int64()),
                    "cos_fp5": pa.array(cos, type=pa.int64()),
                    "one": pa.array(
                        np.ones(len(i), dtype=np.int64)
                    ),
                }
            )

        return mutual_filter(
            best.map_batches(unpack, batch_format="pyarrow")
        )

    all_rows = ds.take_all()
    ids = np.asarray([r["vec_id"] for r in all_rows], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = _quantize(
        np.asarray(
            [r["embedding"] for r in all_rows], dtype=np.float64
        )[order]
    )
    mat_ref = ray.put((ids, mat))

    def batch_nn(batch: pa.Table) -> pa.Table:
        ids_all, mat_all = ray.get(mat_ref)
        mat_b = _quantize(_stack(batch))
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        cos = _fp5(_cos_matrix(mat_b, mat_all))  # int (batch, n)
        self_pos = np.searchsorted(ids_all, vec_ids)
        cos[np.arange(len(vec_ids)), self_pos] = np.iinfo(np.int64).min
        # ids_all ascending => argmax's first-max = smallest-id tiebreak
        nb_pos = np.argmax(cos, axis=1)
        nb = ids_all[nb_pos]
        best = cos[np.arange(len(vec_ids)), nb_pos]
        return pa.Table.from_pydict(
            {
                "vec_a": pa.array(
                    np.minimum(vec_ids, nb), type=pa.int64()
                ),
                "vec_b": pa.array(
                    np.maximum(vec_ids, nb), type=pa.int64()
                ),
                "cos_fp5": pa.array(best, type=pa.int64()),
                "one": pa.array(
                    np.ones(len(vec_ids), dtype=np.int64)
                ),
            }
        )

    return mutual_filter(
        ds.map_batches(batch_nn, batch_format="pyarrow")
    )


def dup_graph_assortativity(
    ds: ray.data.Dataset,
    threshold_fp5: int = NEAR_DUP_FP5,
    row_count: int | None = None,
) -> ray.data.Dataset:
    """(n_dir, sum_d, sum_d2, sum_dxdy) — EXACT integer sufficient
    statistics of degree assortativity over the near-duplicate graph:
    Pearson correlation of the endpoint degrees over directed edges is
    (n·Σdxdy − (Σd)²) / (n·Σd² − (Σd)²) from these four numbers
    (symmetry of the direction-doubled edge list makes the x and y
    moments identical). Positive assortativity = big dup clusters link
    to big ones (template farms / mirror networks); negative = hubs
    with leaf satellites (canonical page + scattered quotes) —
    [[near_dup_degree_hist]] gives the degree census, this says how
    degrees MIX across edges, which picks the dedup strategy
    (components collapse vs hub-canonicalization).

    Shape: pairs from [[near_dup_pairs]] (auto-routing twin), ONE
    keyed endpoint-count exchange for degrees, then TWO
    [[keyed_attach_int]] passes (guarded broadcast / tagged-union
    shuffle) to put (deg_i, deg_j) on every directed edge, and
    per-block moment partials → one driver-folded row. The
    embedding_covariance contract: exact int sums out, the float
    correlation stays a caller-side one-liner."""
    from ..functions.relational import keyed_attach_int
    from .exchange import keyed_sum

    if row_count is None:
        row_count = ds.count()
    pairs = near_dup_pairs(
        ds, threshold_fp5=threshold_fp5, row_count=row_count
    ).materialize()

    def directed(batch: pa.Table) -> pa.Table:
        a = batch["vec_a"].to_numpy(zero_copy_only=False)
        b = batch["vec_b"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "i": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "j": pa.array(np.concatenate([b, a]), type=pa.int64()),
                "one": pa.array(
                    np.ones(2 * len(a), dtype=np.int64)
                ),
            }
        )

    edges = pairs.map_batches(directed, batch_format="pyarrow")
    degrees = keyed_sum(
        edges.map_batches(
            lambda b: b.select(["i", "one"]), batch_format="pyarrow"
        ),
        "i",
        "one",
    ).map_batches(
        lambda b: b.rename_columns(["i", "deg"]), batch_format="pyarrow"
    )
    with_di = keyed_attach_int(
        edges.map_batches(
            lambda b: b.select(["i", "j"]), batch_format="pyarrow"
        ),
        degrees,
        key="i",
        val="deg",
        payload=("j",),
    ).map_batches(
        lambda b: pa.Table.from_pydict(
            {"j": b["j"], "di": b["deg"]}
        ),
        batch_format="pyarrow",
    )
    with_dj = keyed_attach_int(
        with_di,
        degrees.map_batches(
            lambda b: b.rename_columns(["j", "deg"]),
            batch_format="pyarrow",
        ),
        key="j",
        val="deg",
        payload=("di",),
    )

    def moments(batch: pa.Table) -> pa.Table:
        di = batch["di"].to_numpy(zero_copy_only=False)
        dj = batch["deg"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "n": pa.array([len(di)], type=pa.int64()),
                "s": pa.array([int(di.sum())], type=pa.int64()),
                "s2": pa.array([int((di * di).sum())], type=pa.int64()),
                "sxy": pa.array([int((di * dj).sum())], type=pa.int64()),
            }
        )

    n = s = s2 = sxy = 0
    for r in with_dj.map_batches(
        moments, batch_format="pyarrow"
    ).take_all():
        n += r["n"]
        s += r["s"]
        s2 += r["s2"]
        sxy += r["sxy"]
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "n_dir": pa.array([n], type=pa.int64()),
                "sum_d": pa.array([s], type=pa.int64()),
                "sum_d2": pa.array([s2], type=pa.int64()),
                "sum_dxdy": pa.array([sxy], type=pa.int64()),
            }
        )
    )
