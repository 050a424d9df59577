"""End-to-end corpus curation: the composition pipeline a training-data
team actually ships — near-dup collapse, quality gate, split assignment —
built from the individually-oracle-verified operators and joined in ONE
keyed shuffle.

    keep doc <=> doc is its own dedup-cluster representative
               AND alpha-character ratio >= threshold
    output: (doc_id, split, alpha_fp6)

Join shape: the three component outputs (clusters, quality, split) are
tagged, unioned and merged in a single groupby(doc_id) — no driver-side
id sets, no repeated scans beyond what the components themselves need.
The DuckDB oracle is COMPOSED from the components' own oracle SQL
(subquery per component), so the pipeline's correctness contract is
exactly the conjunction of its parts.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from .dedup import dedup_clusters
from .textstats import quality_score, split_assign

ALPHA_MIN_FP6 = 500_000  # keep docs with >= 50% alphabetic characters


def curate_corpus(
    ds: ray.data.Dataset, alpha_min_fp6: int = ALPHA_MIN_FP6
) -> ray.data.Dataset:
    MERGE_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("src", pa.int8()),
            ("rep", pa.int64()),
            ("alpha_fp6", pa.int64()),
            ("split", pa.string()),
        ]
    )

    def tag_clusters(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "src": pa.array([0] * n, type=pa.int8()),
                "rep": batch["cluster_rep"],
                "alpha_fp6": pa.array([-1] * n, type=pa.int64()),
                "split": pa.array([""] * n, type=pa.string()),
            },
            schema=MERGE_SCHEMA,
        )

    def tag_quality(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "src": pa.array([1] * n, type=pa.int8()),
                "rep": pa.array([-1] * n, type=pa.int64()),
                "alpha_fp6": batch["alpha_fp6"],
                "split": pa.array([""] * n, type=pa.string()),
            },
            schema=MERGE_SCHEMA,
        )

    def tag_split(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "src": pa.array([2] * n, type=pa.int8()),
                "rep": pa.array([-1] * n, type=pa.int64()),
                "alpha_fp6": pa.array([-1] * n, type=pa.int64()),
                "split": batch["split"],
            },
            schema=MERGE_SCHEMA,
        )

    merged = (
        dedup_clusters(ds).map_batches(tag_clusters, batch_format="pyarrow")
        .union(quality_score(ds).map_batches(tag_quality, batch_format="pyarrow"))
        .union(split_assign(ds).map_batches(tag_split, batch_format="pyarrow"))
    )

    OUT_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("split", pa.string()), ("alpha_fp6", pa.int64())]
    )

    def merge(group: pa.Table) -> pa.Table:
        doc_id = group["doc_id"][0].as_py()
        rep = alpha = None
        split = ""
        for r in group.to_pylist():
            if r["src"] == 0:
                rep = r["rep"]
            elif r["src"] == 1:
                alpha = r["alpha_fp6"]
            else:
                split = r["split"]
        if rep != doc_id or alpha is None or alpha < alpha_min_fp6:
            return pa.Table.from_pylist([], schema=OUT_SCHEMA)
        return pa.Table.from_pylist(
            [{"doc_id": doc_id, "split": split, "alpha_fp6": alpha}],
            schema=OUT_SCHEMA,
        )

    return merged.groupby("doc_id").map_groups(merge, batch_format="pyarrow")


def canonical_docs(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(cluster_rep, canon_doc_id, canon_alpha_fp6, n_members) — one row
    per fuzzy-dup cluster naming the member a curation pipeline should
    KEEP: the highest-quality document (max alphabetic-character ratio,
    ties to the lowest doc_id) rather than curate_corpus's arbitrary
    min-doc_id representative. This is the "canonical selection" step of
    a dedup pipeline — collapse each near-dup cluster to its best copy.

    Join shape: clusters and quality are tagged, unioned and merged in one
    groupby(doc_id) (same single-shuffle pattern as curate_corpus), then
    one groupby(cluster_rep) picks the winner — two keyed shuffles total,
    both over (int, int) rows; text never moves. The DuckDB oracle is the
    window-rank composition of the two component oracles.
    """
    MERGE_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("src", pa.int8()),
            ("rep", pa.int64()),
            ("alpha_fp6", pa.int64()),
        ]
    )

    def tag_clusters(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "src": pa.array([0] * n, type=pa.int8()),
                "rep": batch["cluster_rep"],
                "alpha_fp6": pa.array([-1] * n, type=pa.int64()),
            },
            schema=MERGE_SCHEMA,
        )

    def tag_quality(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "src": pa.array([1] * n, type=pa.int8()),
                "rep": pa.array([-1] * n, type=pa.int64()),
                "alpha_fp6": batch["alpha_fp6"],
            },
            schema=MERGE_SCHEMA,
        )

    merged = dedup_clusters(ds).map_batches(
        tag_clusters, batch_format="pyarrow"
    ).union(quality_score(ds).map_batches(tag_quality, batch_format="pyarrow"))

    DOC_SCHEMA = pa.schema(
        [("rep", pa.int64()), ("doc_id", pa.int64()), ("alpha_fp6", pa.int64())]
    )

    def attach(group: pa.Table) -> pa.Table:
        doc_id = group["doc_id"][0].as_py()
        rep = alpha = None
        for r in group.to_pylist():
            if r["src"] == 0:
                rep = r["rep"]
            else:
                alpha = r["alpha_fp6"]
        if rep is None or alpha is None:
            return pa.Table.from_pylist([], schema=DOC_SCHEMA)
        return pa.Table.from_pylist(
            [{"rep": rep, "doc_id": doc_id, "alpha_fp6": alpha}], schema=DOC_SCHEMA
        )

    OUT_SCHEMA = pa.schema(
        [
            ("cluster_rep", pa.int64()),
            ("canon_doc_id", pa.int64()),
            ("canon_alpha_fp6", pa.int64()),
            ("n_members", pa.int64()),
        ]
    )

    def pick(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        best = min(rows, key=lambda r: (-r["alpha_fp6"], r["doc_id"]))
        return pa.Table.from_pylist(
            [
                {
                    "cluster_rep": rows[0]["rep"],
                    "canon_doc_id": best["doc_id"],
                    "canon_alpha_fp6": best["alpha_fp6"],
                    "n_members": len(rows),
                }
            ],
            schema=OUT_SCHEMA,
        )

    return (
        merged.groupby("doc_id")
        .map_groups(attach, batch_format="pyarrow")
        .groupby("rep")
        .map_groups(pick, batch_format="pyarrow")
    )


def curate_semantic(
    docs_ds: ray.data.Dataset,
    emb_ds: ray.data.Dataset,
    alpha_min_fp6: int = ALPHA_MIN_FP6,
    head_ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(doc_id, cid, alpha_fp6) — CROSS-MODAL curation: keep a document
    iff (a) its TEXT is its own fuzzy-dedup-cluster representative,
    (b) its EMBEDDING survives semantic dedup (no lower-id semantic
    near-duplicate in its k-means cell), and (c) it clears the quality
    gate. The two-table composition a modern pipeline ships — lexical
    dedup alone misses paraphrases, semantic dedup alone misses
    boilerplate — joined on the shared id space (vec_id == doc_id by the
    corpus contract).

    Join shape: the three component outputs are tagged with -1 sentinels
    for the fields they don't carry, unioned, and merged in ONE keyed
    hash aggregate (groupby(doc_id).max over the sentinel columns —
    every real value is >= 0, so max picks the present value) followed
    by a vectorized Arrow filter. Fully vectorized: no per-group Python,
    no driver id-sets; each component keeps its own internal scale
    shape. The oracle is COMPOSED from the components' own oracle SQL,
    so the contract is exactly the conjunction of the parts."""
    from .dedup import dedup_clusters
    from .similarity import semantic_dedup
    from .textstats import quality_score

    MERGE_SCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("cid", pa.int64()),
            ("keep", pa.int64()),
            ("rep", pa.int64()),
            ("alpha", pa.int64()),
        ]
    )

    def _neg(n: int) -> pa.Array:
        return pa.array([-1] * n, type=pa.int64())

    def tag_sem(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = len(batch)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["vec_id"].cast(pa.int64()),
                "cid": batch["cid"].cast(pa.int64()),
                "keep": pc.cast(batch["keep"], pa.int64()),
                "rep": _neg(n),
                "alpha": _neg(n),
            },
            schema=MERGE_SCHEMA,
        )

    def tag_clus(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "cid": _neg(n),
                "keep": _neg(n),
                "rep": batch["cluster_rep"].cast(pa.int64()),
                "alpha": _neg(n),
            },
            schema=MERGE_SCHEMA,
        )

    def tag_q(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "cid": _neg(n),
                "keep": _neg(n),
                "rep": _neg(n),
                "alpha": batch["alpha_fp6"].cast(pa.int64()),
            },
            schema=MERGE_SCHEMA,
        )

    merged = (
        semantic_dedup(emb_ds, head_ds=head_ds)
        .map_batches(tag_sem, batch_format="pyarrow")
        .union(
            dedup_clusters(docs_ds).map_batches(tag_clus, batch_format="pyarrow")
        )
        .union(quality_score(docs_ds).map_batches(tag_q, batch_format="pyarrow"))
        .groupby("doc_id")
        .max(["cid", "keep", "rep", "alpha"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = batch["max(keep)"]
        rep = batch["max(rep)"]
        alpha = batch["max(alpha)"]
        # keep==1 implies the semantic row was present (so cid is real);
        # rep==doc_id implies the cluster row; alpha>=min implies quality.
        mask = pc.and_(
            pc.and_(pc.equal(keep, 1), pc.equal(rep, batch["doc_id"])),
            pc.greater_equal(alpha, alpha_min_fp6),
        )
        return pa.Table.from_arrays(
            [batch["doc_id"], batch["max(cid)"], alpha],
            names=["doc_id", "cid", "alpha_fp6"],
        ).filter(mask)

    return merged.map_batches(finish, batch_format="pyarrow")


def dedup_savings(ds: ray.data.Dataset) -> ray.data.Dataset:
    """ONE row (n_docs, n_dropped, chars_total, chars_dropped) — what the
    fuzzy-dedup pass actually buys: document and character volume removed
    by keeping only each cluster's representative. The go/no-go number a
    curation run reports before committing to a dedup config.

    Scale shape: cluster assignments collapse to (doc_id, dropped) flags
    AT THE SOURCE (rep != doc_id is row-local), union a (doc_id, n_chars)
    projection, and ONE vectorized hash-aggregate groupby(doc_id) pairs
    them — no per-doc map_groups (a 60k-tiny-group map_groups measured
    ~4x slower than the C hash aggregate at the bench tier). Per-block
    partial sums then collapse everything to a single tiny keyed
    aggregate; text rides nothing, driver holds one row."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .dedup import dedup_clusters

    clusters = dedup_clusters(ds)

    def tag_clusters(batch: pa.Table) -> pa.Table:
        dropped = pc.cast(
            pc.not_equal(batch["cluster_rep"], batch["doc_id"]), pa.int64()
        )
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "dropped": dropped,
                "n_chars": pa.array([0] * len(batch), type=pa.int64()),
            }
        )

    def tag_chars(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "dropped": pa.array([0] * len(batch), type=pa.int64()),
                "n_chars": batch["n_chars"].cast(pa.int64()),
            }
        )

    per_doc = (
        clusters.map_batches(tag_clusters, batch_format="pyarrow")
        .union(
            ds.select_columns(["doc_id", "n_chars"]).map_batches(
                tag_chars, batch_format="pyarrow"
            )
        )
        .repartition(16)  # narrow merge: tiny int rows, wide sorts cost more than the work
        .groupby("doc_id")
        .aggregate(Sum("dropped"), Sum("n_chars"))
    )

    def combine(batch: pa.Table) -> pa.Table:
        dropped = batch["sum(dropped)"].to_numpy(zero_copy_only=False)
        chars = batch["sum(n_chars)"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "k": pa.array([0], type=pa.int64()),
                "n_docs": pa.array([len(batch)], type=pa.int64()),
                "n_dropped": pa.array([int(dropped.sum())], type=pa.int64()),
                "chars_total": pa.array([int(chars.sum())], type=pa.int64()),
                "chars_dropped": pa.array(
                    [int((chars * dropped).sum())], type=pa.int64()
                ),
            }
        )

    agg = (
        per_doc.map_batches(combine, batch_format="pyarrow")
        .groupby("k")
        .aggregate(
            Sum("n_docs"), Sum("n_dropped"), Sum("chars_total"), Sum("chars_dropped")
        )
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "n_docs": batch["sum(n_docs)"].cast(pa.int64()),
                "n_dropped": batch["sum(n_dropped)"].cast(pa.int64()),
                "chars_total": batch["sum(chars_total)"].cast(pa.int64()),
                "chars_dropped": batch["sum(chars_dropped)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def corpus_diff(
    old_ds: ray.data.Dataset, new_ds: ray.data.Dataset
) -> ray.data.Dataset:
    """(doc_id, status) — snapshot delta between two corpus versions:
    status in {'added', 'removed', 'changed', 'unchanged'} per doc_id,
    comparing content by a 60-bit md5 prefix fingerprint. This is the
    audit step between two crawl snapshots / pipeline releases ("what did
    the new filter actually change?") and the input to an incremental
    re-process (only 'added' + 'changed' docs re-enter the pipeline).

    Shape: each side maps to payload-free (doc_id, h_old, h_new) rows
    (the absent side's hash is -1), then ONE keyed groupby(doc_id) with
    two vectorized Max folds — at 100 TB only 24-byte rows shuffle, text
    never leaves its block, and doc_id is the reusable partition key.
    Max is the correct merge because each doc_id appears at most once per
    side, so the fold just overlays -1 placeholders.

    Oracle: FULL OUTER JOIN of the two sides' md5-prefix ints (the
    dedup_incremental_fuzzy strpos/list_sum hex parse)."""
    import hashlib

    import numpy as np
    from ray.data.aggregate import Max

    HSCHEMA = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("h_old", pa.int64()),
            ("h_new", pa.int64()),
        ]
    )

    def _h(texts: list[str]) -> np.ndarray:
        return np.array(
            [
                int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
                for t in texts
            ],
            dtype=np.int64,
        )

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            h = _h(batch["text"].to_pylist())
            absent = np.full(n, -1, dtype=np.int64)
            return pa.Table.from_pydict(
                {
                    "doc_id": batch["doc_id"].cast(pa.int64()),
                    "h_old": pa.array(
                        h if side == "old" else absent, type=pa.int64()
                    ),
                    "h_new": pa.array(
                        h if side == "new" else absent, type=pa.int64()
                    ),
                },
                schema=HSCHEMA,
            )

        return fn

    merged = old_ds.map_batches(tag("old"), batch_format="pyarrow").union(
        new_ds.map_batches(tag("new"), batch_format="pyarrow")
    )
    agg = merged.groupby("doc_id").aggregate(
        Max("h_old", alias_name="h_old"), Max("h_new", alias_name="h_new")
    )

    def status(batch: pa.Table) -> pa.Table:
        ho = batch["h_old"].to_numpy(zero_copy_only=False)
        hn = batch["h_new"].to_numpy(zero_copy_only=False)
        st = np.select(
            [ho == -1, hn == -1, ho != hn],
            ["added", "removed", "changed"],
            default="unchanged",
        )
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "status": pa.array(st.tolist(), type=pa.string()),
            }
        )

    return agg.map_batches(status, batch_format="pyarrow")


def partition_checksums(
    ds: ray.data.Dataset, n_parts: int = 16
) -> ray.data.Dataset:
    """(part, n_rows, xor_h, min_h, max_h) — per-partition anti-entropy
    checksums over the corpus: docs hash-partitioned by doc_id mod
    ``n_parts``; each partition reports its row count, the XOR-fold of a
    60-bit content fingerprint (md5 of "doc_id:text" — keyed by id so
    identical texts under different ids still distinguish), and the
    fingerprint min/max. Two replicas (or a snapshot before/after a
    lossless rewrite) agree iff every partition row agrees — the Merkle
    level-0 audit that detects silent divergence WITHOUT shipping any
    text, and localizes it to 1/n_parts of the keyspace for a targeted
    [[corpus_diff]]. XOR is associative/commutative/self-inverse, so the
    fold is retry-idempotent per row-set and order-free.

    Shape: per-block (part, n, xor, min, max) partials — one row per
    partition per block — then ONE tiny keyed fold over <= n_parts keys.
    Oracle: grouped bit_xor/min/max over the same md5-prefix ints."""
    import hashlib

    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = np.array(
            [
                int(
                    hashlib.md5(
                        f"{d}:{t}".encode("utf-8")
                    ).hexdigest()[:15],
                    16,
                )
                for d, t in zip(ids, batch["text"].to_pylist())
            ],
            dtype=np.int64,
        )
        part = ids % n_parts
        order = np.argsort(part, kind="stable")
        p_s, h_s = part[order], h[order]
        starts = np.r_[True, p_s[1:] != p_s[:-1]]
        keys = p_s[starts]
        gid = np.cumsum(starts) - 1
        n = np.bincount(gid)
        xor = np.zeros(len(keys), dtype=np.int64)
        np.bitwise_xor.at(xor, gid, h_s)
        mins = np.minimum.reduceat(h_s, np.flatnonzero(starts))
        maxs = np.maximum.reduceat(h_s, np.flatnonzero(starts))
        return pa.Table.from_pydict(
            {
                "part": pa.array(keys, type=pa.int64()),
                "n_rows": pa.array(n, type=pa.int64()),
                "xor_p": pa.array(xor, type=pa.int64()),
                "min_h": pa.array(mins, type=pa.int64()),
                "max_h": pa.array(maxs, type=pa.int64()),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "part": pa.array([int(g["part"][0].as_py())], type=pa.int64()),
                "n_rows": pa.array(
                    [int(g["n_rows"].to_numpy(zero_copy_only=False).sum())],
                    type=pa.int64(),
                ),
                "xor_h": pa.array(
                    [
                        int(
                            np.bitwise_xor.reduce(
                                g["xor_p"].to_numpy(zero_copy_only=False)
                            )
                        )
                    ],
                    type=pa.int64(),
                ),
                "min_h": pa.array(
                    [int(g["min_h"].to_numpy(zero_copy_only=False).min())],
                    type=pa.int64(),
                ),
                "max_h": pa.array(
                    [int(g["max_h"].to_numpy(zero_copy_only=False).max())],
                    type=pa.int64(),
                ),
            }
        )

    return (
        ds.select_columns(["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pyarrow")
    )
