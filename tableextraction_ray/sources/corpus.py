"""Interleaved-document corpus source (the BASELINE.json input_hint table).

``documents`` is the Lance-shaped table (doc_id, spans list<struct<kind,
text, media_ref, offset>>); parquet is the sandbox stand-in (SURVEY.md
§7.4.7: lance wheel unavailable — the IO layer is abstracted here so a
``read_lance`` swap is one line). Column pruning is pushed into the read.
"""

from __future__ import annotations

import os

import ray.data


def read_documents(
    corpus_dir: str, columns: list[str] | None = None
) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(corpus_dir, "documents.parquet"),
        columns=columns or ["doc_id", "spans"],
    )


def read_documents_lance(
    uri: str, columns: list[str] | None = None
) -> ray.data.Dataset:
    """Lance-backed documents source — the north rule's storage format,
    as a first-class gated path rather than a docstring promise. On a
    lance-enabled cluster this is ``ray.data.read_lance`` (fragment-
    parallel scan, column projection pushed down) with the SAME schema
    contract as :func:`read_documents`; every downstream stage is
    source-agnostic, so the parquet-backed tests cover the plumbing. The
    lance wheel cannot be installed in this sandbox (no network, no pip
    — BASELINE.md realdeps note), so the import gate raises with the
    exact swap instruction instead of silently degrading."""
    try:
        import lance  # noqa: F401
    except ImportError as exc:  # pragma: no cover - sandbox has no lance
        raise NotImplementedError(
            "lance is not installed in this environment. On a "
            "lance-enabled cluster this function body is exactly: "
            "ray.data.read_lance(uri, columns=columns or "
            "['doc_id', 'spans'])"
        ) from exc
    return ray.data.read_lance(uri, columns=columns or ["doc_id", "spans"])


def read_golden(corpus_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(corpus_dir, "golden.parquet"))


def _span_type():
    import pyarrow as pa

    return pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )


def read_documents_jsonl(path: str) -> ray.data.Dataset:
    """JSONL corpus -> the documents schema. Each line is
    ``{"doc_id": ..., "spans": [{kind, text, media_ref, offset}, ...]}``
    (missing span fields default to '' / position). One read task per
    shard file via ``ray.data.read_json``; the schema normalization runs
    in the task that parsed the shard."""
    import pyarrow as pa

    def normalize(batch: pa.Table) -> pa.Table:
        doc_ids = [str(d) for d in batch["doc_id"].to_pylist()]
        spans_out = []
        for spans in batch["spans"].to_pylist():
            norm = []
            for i, s in enumerate(spans or []):
                # read_json materializes absent struct fields as None (the
                # key exists), so defaults apply on None, not missing keys.
                off = s.get("offset")
                norm.append(
                    {
                        "kind": str(s.get("kind") or "text"),
                        "text": str(s.get("text") or ""),
                        "media_ref": str(s.get("media_ref") or ""),
                        "offset": int(off) if off is not None else i,
                    }
                )
            spans_out.append(norm)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids, type=pa.string()),
                "spans": pa.array(spans_out, type=_span_type()),
            }
        )

    return ray.data.read_json(path).map_batches(normalize, batch_format="pyarrow")


def read_documents_csv(path: str) -> ray.data.Dataset:
    """Flat (doc_id, text) CSV -> the documents schema: each row becomes a
    single text span at offset 0 — the shape a plain text corpus lands in
    before any media is attached."""
    import pyarrow as pa

    def to_docs(batch: pa.Table) -> pa.Table:
        doc_ids = [str(d) for d in batch["doc_id"].to_pylist()]
        spans = [
            [{"kind": "text", "text": t or "", "media_ref": "", "offset": 0}]
            for t in batch["text"].to_pylist()
        ]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids, type=pa.string()),
                "spans": pa.array(spans, type=_span_type()),
            }
        )

    return ray.data.read_csv(path).map_batches(to_docs, batch_format="pyarrow")
