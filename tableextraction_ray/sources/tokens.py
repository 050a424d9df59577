"""PDF-native page tokens: the text spans the TATR eval path slots into
recognized cells instead of OCR.

The reference consumes per-page ``*_words.json`` sidecars (reference
``transformer/src/grits.py:861-869``: ``{bbox, text, flags, span_num,
line_num, block_num}`` dicts, produced from the source PDFs with PyMuPDF/
fitz — ``eval_utils.py:6`` imports fitz for exactly this geometry) and
passes them as ``tokens`` through ``objects_to_cells`` →
``extract_text_from_spans`` (``eval_utils.py:340-397``). Here:

- :func:`read_page_tokens` — a DISTRIBUTED reader for the same sidecar
  format: every task parses its slice of files, one flat token row per
  word, real and tested in-sandbox (plain JSON, no native deps).
- :class:`PdfTokenExtractor` — the fitz path itself, complete body and
  import-gated like the other model/IO backends: PDF bytes → the same
  token dicts, so a corpus with native PDFs skips OCR entirely where text
  layers exist.

Token rows feed ``tatr.refined_structure_to_cells(..., tokens=...)`` /
``tatr.extract_text_from_spans`` directly.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data

TOKEN_SCHEMA = pa.schema(
    [
        ("page_id", pa.string()),
        ("token_idx", pa.int32()),
        ("x1", pa.float64()),
        ("y1", pa.float64()),
        ("x2", pa.float64()),
        ("y2", pa.float64()),
        ("text", pa.string()),
        ("flags", pa.int32()),
        ("span_num", pa.int32()),
        ("line_num", pa.int32()),
        ("block_num", pa.int32()),
    ]
)


def _token_rows(page_id: str, tokens: list[dict]) -> list[dict]:
    rows = []
    for i, t in enumerate(tokens):
        bbox = t["bbox"]
        rows.append(
            {
                "page_id": page_id,
                "token_idx": i,
                "x1": float(bbox[0]),
                "y1": float(bbox[1]),
                "x2": float(bbox[2]),
                "y2": float(bbox[3]),
                "text": t["text"],
                "flags": int(t.get("flags", 0)),
                "span_num": int(t.get("span_num", i)),
                "line_num": int(t.get("line_num", 0)),
                "block_num": int(t.get("block_num", 0)),
            }
        )
    return rows


def read_page_tokens(words_dir: str) -> ray.data.Dataset:
    """Distributed read of a ``*_words.json`` sidecar tree (one file per
    page, reference grits.py:861-869 layout) into flat token rows. page_id
    is the filename with the ``_words.json`` suffix stripped — the same key
    the reference derives from the page image filename."""

    def parse(batch: dict) -> pa.Table:
        rows: list[dict] = []
        for path, payload in zip(batch["path"], batch["bytes"]):
            name = os.path.basename(path)
            if not name.endswith("_words.json"):
                continue
            page_id = name[: -len("_words.json")]
            rows.extend(_token_rows(page_id, json.loads(bytes(payload))))
        return pa.Table.from_pylist(rows, schema=TOKEN_SCHEMA)

    return ray.data.read_binary_files(words_dir, include_paths=True).map_batches(
        parse, batch_format="numpy"
    )


def tokens_for_page(token_rows: list[dict]) -> list[dict]:
    """Flat rows -> the token-dict list tatr.* consumes (bbox list +
    span/line/block nums), sorted by token_idx."""
    out = []
    for r in sorted(token_rows, key=lambda r: r["token_idx"]):
        out.append(
            {
                "bbox": [r["x1"], r["y1"], r["x2"], r["y2"]],
                "text": r["text"],
                "flags": r["flags"],
                "span_num": r["span_num"],
                "line_num": r["line_num"],
                "block_num": r["block_num"],
            }
        )
    return out


class PdfTokenExtractor:
    """PDF bytes -> per-page token dicts via PyMuPDF (the library the
    reference's eval pipeline uses for word geometry, eval_utils.py:6-7).
    Complete body, import-gated (fitz absent in this sandbox): on a machine
    with PyMuPDF this is a config change, not a code change. One extractor
    per actor; ``__call__`` walks ``page.get_text('dict')`` blocks/lines/
    spans — the span/line/block numbering extract_text_from_spans sorts
    by."""

    def __init__(self):
        try:
            import fitz  # noqa: F401  # pragma: no cover - absent in sandbox
        except ImportError:
            raise NotImplementedError(
                "backend requires 'fitz' (PyMuPDF) which is not installed; "
                "PDF-native token extraction"
            ) from None
        self._fitz = fitz  # pragma: no cover

    def __call__(self, pdf_bytes: bytes) -> list[list[dict]]:  # pragma: no cover
        fitz = self._fitz
        doc = fitz.open(stream=pdf_bytes, filetype="pdf")
        pages = []
        for page in doc:
            tokens: list[dict] = []
            span_num = 0
            d = page.get_text("dict")
            for block_num, block in enumerate(d.get("blocks", [])):
                for line_num, line in enumerate(block.get("lines", [])):
                    for span in line.get("spans", []):
                        tokens.append(
                            {
                                "bbox": list(span["bbox"]),
                                "text": span["text"],
                                "flags": int(span.get("flags", 0)),
                                "span_num": span_num,
                                "line_num": line_num,
                                "block_num": block_num,
                            }
                        )
                        span_num += 1
            pages.append(tokens)
        doc.close()
        return pages
