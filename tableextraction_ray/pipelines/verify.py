"""Distributed golden verification (SURVEY.md §2.5 verification join).

Compares the extraction output against the corpus golden WITHOUT pulling
either side to the driver: both sides are tagged, unioned, and grouped by
``doc_id`` — one hash-shuffle joins result + expected per document, and the
span-sequence comparison runs inside ``map_groups``. At 10^12 docs this is
the only verification shape that works; the driver sees only the per-doc
verdict rows (or just the mismatch count).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..sources import read_golden
from .extract import ExtractConfig, build_extraction_pipeline

VERDICT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("equal", pa.bool_()),
        ("n_out", pa.int32()),
        ("n_gold", pa.int32()),
        ("first_diff", pa.string()),
    ]
)


def _tag(side: str):
    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column("side", pa.array([side] * len(batch), type=pa.string()))

    return fn


def _compare_doc(group: pa.Table) -> pa.Table:
    rows = group.to_pylist()
    doc_id = rows[0]["doc_id"]
    out_spans = next((r["spans"] for r in rows if r["side"] == "out"), None)
    gold_spans = next((r["spans"] for r in rows if r["side"] == "gold"), None)
    out_spans = out_spans or []
    gold_spans = gold_spans or []

    def key(s: dict) -> tuple:
        return (s["offset"], s["kind"], s["text"], s["media_ref"])

    first_diff = ""
    equal = len(out_spans) == len(gold_spans)
    if equal:
        for a, b in zip(sorted(out_spans, key=key), sorted(gold_spans, key=key)):
            if key(a) != key(b):
                equal = False
                first_diff = f"out={key(a)!r} gold={key(b)!r}"
                break
    else:
        first_diff = f"len {len(out_spans)} != {len(gold_spans)}"
    return pa.Table.from_pylist(
        [
            {
                "doc_id": doc_id,
                "equal": equal,
                "n_out": len(out_spans),
                "n_gold": len(gold_spans),
                "first_diff": first_diff,
            }
        ],
        schema=VERDICT_SCHEMA,
    )


def verify_against_golden(
    corpus_dir: str,
    config: ExtractConfig | None = None,
    mismatches_only: bool = False,
) -> ray.data.Dataset:
    """Per-document verdict Dataset: (doc_id, equal, n_out, n_gold,
    first_diff). Fully streaming — one doc_id shuffle, no driver
    materialization.

    ``mismatches_only=True`` keeps only failing docs, making the result
    SELF-ASSERTING for an external row-count check: a healthy run returns
    exactly 0 rows, so any regression that flips verdicts shows up as a
    non-zero count rather than hiding inside per-doc boolean columns."""
    out = build_extraction_pipeline(corpus_dir, config=config).map_batches(
        _tag("out"), batch_format="pyarrow"
    )
    gold = read_golden(corpus_dir).map_batches(_tag("gold"), batch_format="pyarrow")
    verdicts = (
        out.union(gold)
        .groupby("doc_id")
        .map_groups(_compare_doc, batch_format="pyarrow")
    )
    if mismatches_only:
        import pyarrow.compute as pc

        verdicts = verdicts.map_batches(
            lambda b: b.filter(pc.invert(b["equal"])), batch_format="pyarrow"
        )
    return verdicts
