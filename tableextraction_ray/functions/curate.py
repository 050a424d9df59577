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
