"""Explode documents into the unified work-row stream.

The skew fix (SURVEY.md §4.1): the unit of work downstream is a span/page,
not a document, so an 8-page scanned doc fans out across the cluster instead
of pinning one worker. Fully vectorized with pyarrow list kernels — no
Python loop over rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# The unified stream schema between explode and assembly. Unused fields are
# '' / -1 / empty bytes, never null, so block schemas always unify.
WORK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("offset", pa.int32()),  # source span offset within the doc
        ("kind", pa.string()),  # 'text' | 'media' | 'table' | 'cell'
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("table_no", pa.int32()),
        ("x1", pa.int32()),
        ("y1", pa.int32()),
        ("x2", pa.int32()),
        ("y2", pa.int32()),
        ("img", pa.large_binary()),  # raw grayscale pixels (not PNG)
        ("img_h", pa.int32()),
        ("img_w", pa.int32()),
    ]
)


def work_table(columns: dict) -> pa.Table:
    """Build a WORK_SCHEMA table from a partial column dict; missing columns
    are filled with defaults ('' / -1 / b'')."""
    n = len(next(iter(columns.values())))
    out = {}
    for field in WORK_SCHEMA:
        name = field.name
        if name in columns:
            arr = columns[name]
            if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
                arr = pa.array(arr, type=field.type)
            elif arr.type != field.type:
                arr = arr.cast(field.type)
            out[name] = arr
        elif pa.types.is_string(field.type):
            out[name] = pa.array([""] * n, type=field.type)
        elif pa.types.is_large_binary(field.type):
            out[name] = pa.array([b""] * n, type=field.type)
        else:
            out[name] = pa.array([-1] * n, type=field.type)
    return pa.Table.from_pydict(out, schema=WORK_SCHEMA)


def empty_work_table() -> pa.Table:
    return work_table({"doc_id": pa.array([], type=pa.string())})


def explode_spans(batch: pa.Table) -> pa.Table:
    """documents(doc_id, spans) -> one work row per span (vectorized)."""
    spans = batch["spans"].combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.chunk(0) if spans.num_chunks else pa.array([], type=spans.type)
    parent = pc.list_parent_indices(spans)
    doc_id = pc.take(batch["doc_id"].combine_chunks(), parent)
    flat = pc.list_flatten(spans)
    return work_table(
        {
            "doc_id": doc_id,
            "offset": flat.field("offset"),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
        }
    )
