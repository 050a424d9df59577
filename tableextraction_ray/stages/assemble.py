"""Per-document reassembly: the pipeline's ONE wide shuffle.

``groupby('doc_id').map_groups(assemble_doc)`` gathers a document's
passthrough text spans, media markers and OCR'd cells, rebuilds each table's
nested structure (``tableextraction_ray.structure``, reference
builder.py/export.py semantics) and emits the ordered output span sequence —
the schema-closed result (same shape as the input, FIXTURES.md §3).

Ordering is restored entirely from explicit columns (source ``offset``,
``table_no``, cell geometry), never from arrival order, so upstream stages
are free to process everything out of order (SURVEY.md §2.8).
"""

from __future__ import annotations

import pyarrow as pa

from ..datagen import DOC_SCHEMA
from ..structure import emit_table_spans

RESULT_SCHEMA = DOC_SCHEMA


def assemble_doc(group: pa.Table, classify_filter: bool = False) -> pa.Table:
    """``classify_filter=True`` reproduces the reference's optional
    ``filter_tables_by_classification`` gate (recognition.py:78-97): a
    table's spans are emitted only when its combined cell text passes
    ``classify_table`` — here applied to the already-OCR'd cells instead of
    a second whole-table OCR pass."""
    from ..textproc import classify_table

    rows = group.to_pylist()
    doc_id = rows[0]["doc_id"]

    texts: dict[int, str] = {}
    markers: dict[int, str] = {}
    cells: dict[tuple[int, int], list[tuple[tuple[int, int, int, int], str]]] = {}
    for r in rows:
        off = r["offset"]
        if r["kind"] == "text":
            texts[off] = r["text"]
        elif r["kind"] == "media":
            markers[off] = r["media_ref"]
        elif r["kind"] == "cell":
            key = (off, r["table_no"])
            cells.setdefault(key, []).append(
                ((r["x1"], r["y1"], r["x2"], r["y2"]), r["text"])
            )

    spans: list[dict] = []
    for off in sorted(set(texts) | set(markers)):
        if off in texts:
            spans.append(
                {"kind": "text", "text": texts[off], "media_ref": "",
                 "offset": len(spans)}
            )
        else:
            spans.append(
                {"kind": "media", "text": "", "media_ref": markers[off],
                 "offset": len(spans)}
            )
            table_nos = sorted(t for (o, t) in cells if o == off)
            for t in table_nos:
                if classify_filter and not classify_table(
                    " ".join(txt for _, txt in cells[(off, t)])
                ):
                    continue
                for text in emit_table_spans(cells[(off, t)]):
                    spans.append(
                        {"kind": "text", "text": text, "media_ref": "",
                         "offset": len(spans)}
                    )
    return pa.Table.from_pylist(
        [{"doc_id": doc_id, "spans": spans}], schema=RESULT_SCHEMA
    )


SERIALIZED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("page_offset", pa.int32()),
        ("table_no", pa.int32()),
        ("yaml", pa.string()),
        ("json", pa.string()),
    ]
)


def serialize_tables(group: pa.Table) -> pa.Table:
    """Per-doc group -> one row per table with reference-parity YAML and
    JSON serializations (export.py:77-122 ``save`` formats, as columns of a
    distributed sink instead of truncate-append local files)."""
    from ..structure import serialize_table, to_json, to_yaml

    rows = group.to_pylist()
    doc_id = rows[0]["doc_id"]
    cells: dict[tuple[int, int], list[tuple[tuple[int, int, int, int], str]]] = {}
    for r in rows:
        if r["kind"] == "cell":
            key = (r["offset"], r["table_no"])
            cells.setdefault(key, []).append(
                ((r["x1"], r["y1"], r["x2"], r["y2"]), r["text"])
            )
    out = []
    for (off, t) in sorted(cells):
        pairs = cells[(off, t)]
        rects = [c for c, _ in pairs]
        text_dict = dict(pairs)
        filled = serialize_table(rects, text_dict)
        out.append(
            {
                "doc_id": doc_id,
                "page_offset": off,
                "table_no": t,
                "yaml": to_yaml(filled),
                "json": to_json(filled),
            }
        )
    return pa.Table.from_pylist(out, schema=SERIALIZED_SCHEMA)


def explode_result_spans(batch: pa.Table) -> pa.Table:
    """results(doc_id, spans) -> flat (doc_id, offset, kind, text, media_ref)
    rows — the driver-friendly flat view used by queries()/verification."""
    import pyarrow.compute as pc

    spans = batch["spans"].combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.chunk(0) if spans.num_chunks else pa.array([], type=spans.type)
    parent = pc.list_parent_indices(spans)
    doc_id = pc.take(batch["doc_id"].combine_chunks(), parent)
    flat = pc.list_flatten(spans)
    return pa.Table.from_pydict(
        {
            "doc_id": doc_id,
            "offset": flat.field("offset"),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
        }
    )
