"""Deterministic synthetic interleaved-document corpus generator.

Builds the FIXTURES.md corpus: a ``documents`` table of interleaved text +
media spans (the BASELINE.json input_hint schema), a media payload store
(PNG page images, both a file store addressed by ``media_ref`` and a
``media.parquet`` sidecar), and the ``golden.parquet`` expected output —
the per-document span sequence after extraction, derived from the logical
tables via the SAME structure-builder the engine uses but from the
renderer's logical cell rectangles, never from the image. The pytest
equality golden == pipeline output therefore proves the full
rasterize -> detect -> grid -> OCR round trip.

Determinism: everything derives from ``numpy.random.Generator(PCG64)``
seeded per document with ``SeedSequence([seed, doc_index])`` — any subset of
documents is reproducible independently (FIXTURES.md §5). Generation is
parallelized over documents with ``ray.data`` when a Ray session is active.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import png
from .render import LogicalCell, LogicalTable, logical_cell_rects, ocr_text, render_page
from .structure import emit_table_spans

SEED = 42

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOC_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_STRUCT))])

TIERS = {
    "t1": 32,
    "t2": 500,
    # Large enough that per-doc compute dominates fixed pipeline overheads
    # (read fan-out, actor-pool ramp, shuffle setup) — required for a clean
    # N->4N scaling-efficiency measurement.
    "bench": 60000,
    # Dual-DPI production-parity tier (reference extractor.py:24-33: detect
    # at 50 DPI, OCR at 500): pages stored at TIER_HIDPI_SCALE[x] the base
    # resolution; the pipeline detects on the cheap downscale and crops/OCRs
    # the sharp raster (ExtractConfig(dpi_scale=...)).
    "t1hi": 32,
    # t2-scale dual-DPI tier: large enough that the detect-low/OCR-high
    # path's throughput cost is measurable (bench.py --dualdpi), not just
    # its correctness (t1hi golden gate).
    "t2hi": 500,
}

#: High-DPI page upscale factor per tier (1 = single-resolution corpus).
TIER_HIDPI_SCALE = {"t1hi": 3, "t2hi": 3}

FAMILIES = [
    "grid_simple",
    "grid_nested_header",
    "multi_table_page",
    "multi_page_doc",
    "no_table_page",
    "empty_cells",
    "cyrillic_text",
    "text_only_doc",
    "classify_mix",
]

_LATIN_WORDS = [
    "alloy", "steel", "grade", "width", "depth", "batch", "plate", "sheet",
    "limit", "value", "gauge", "ratio", "tense", "yield", "core", "mill",
]
_CYR_WORDS = [
    "марка", "стали", "предел", "прокат", "размер", "толщина", "сталь",
    "удлинение", "текучести", "сопротивление", "временное", "относительное",
]
_KEYWORD_HEADERS = ["марка стали", "временное сопротивление", "предел текучести"]


@dataclass
class PageSpec:
    title: str
    tables: list[LogicalTable]


@dataclass
class DocSpec:
    doc_id: str
    family: str
    # Interleaved spans: ('text', payload) or ('media', PageSpec)
    spans: list[tuple[str, object]]


def _word(rng: np.random.Generator, cyr: bool = False) -> str:
    pool = _CYR_WORDS if cyr else _LATIN_WORDS
    return pool[int(rng.integers(0, len(pool)))]


def _cell_text(rng: np.random.Generator, family: str) -> str:
    if family == "cyrillic_text":
        if rng.random() < 0.25:
            return f"{_word(rng, True)[:5]} - {_word(rng, True)}"
        return f"{_word(rng, True)} {int(rng.integers(0, 1000))}"
    if family == "empty_cells" and rng.random() < 0.3:
        return ""
    return f"{_word(rng)} {int(rng.integers(0, 1000))}"


def _simple_table(rng: np.random.Generator, family: str, keywords: bool = False) -> LogicalTable:
    n_cols = int(rng.integers(2, 6))
    n_rows = 1 + int(rng.integers(2, 7))
    cells = []
    for c in range(n_cols):
        if keywords and c < len(_KEYWORD_HEADERS):
            head = _KEYWORD_HEADERS[c]
        else:
            head = f"{_word(rng)}{c}"
        cells.append(LogicalCell(0, 1, c, c + 1, head))
    for r in range(1, n_rows):
        for c in range(n_cols):
            cells.append(LogicalCell(r, r + 1, c, c + 1, _cell_text(rng, family)))
    return LogicalTable(n_rows, n_cols, cells)


def _nested_table(rng: np.random.Generator, family: str) -> LogicalTable:
    """2-level header: one parent spans two adjacent columns with child
    headers beneath; remaining columns are 2-row merged header cells. Body
    column count differs from child-row count so the reference's bottom-up
    count-change header split lands on the child row (builder.py:86-96)."""
    n_cols = int(rng.integers(3, 6))
    n_body = 2 + int(rng.integers(1, 5))
    parent_at = int(rng.integers(0, n_cols - 1))
    cells = []
    for c in range(n_cols):
        if c == parent_at:
            cells.append(LogicalCell(0, 1, c, c + 2, f"{_word(rng)}P"))
            cells.append(LogicalCell(1, 2, c, c + 1, f"{_word(rng)}a"))
            cells.append(LogicalCell(1, 2, c + 1, c + 2, f"{_word(rng)}b"))
        elif c == parent_at + 1:
            continue
        else:
            cells.append(LogicalCell(0, 2, c, c + 1, f"{_word(rng)}{c}"))
    for r in range(2, 2 + n_body):
        for c in range(n_cols):
            cells.append(LogicalCell(r, r + 1, c, c + 1, _cell_text(rng, family)))
    return LogicalTable(2 + n_body, n_cols, cells)


def make_doc_spec(doc_index: int, seed: int = SEED) -> DocSpec:
    rng = np.random.Generator(np.random.PCG64(np.random.SeedSequence([seed, doc_index])))
    family = FAMILIES[doc_index % len(FAMILIES)]
    doc_id = f"doc-{doc_index:06d}"

    def text_span() -> tuple[str, str]:
        n = int(rng.integers(3, 8))
        words = " ".join(_word(rng, rng.random() < 0.3) for _ in range(n))
        return ("text", words)

    def page(n_tables: int, keywords: bool = False) -> tuple[str, PageSpec]:
        tables = []
        for _ in range(n_tables):
            if family == "grid_nested_header":
                tables.append(_nested_table(rng, family))
            else:
                tables.append(_simple_table(rng, family, keywords=keywords))
        return ("media", PageSpec(title=f"{_word(rng)} report", tables=tables))

    spans: list[tuple[str, object]] = [text_span()]
    if family == "text_only_doc":
        for _ in range(int(rng.integers(1, 4))):
            spans.append(text_span())
    elif family == "multi_table_page":
        spans += [page(2), text_span()]
    elif family == "multi_page_doc":
        n_pages = int(rng.choice([2, 3, 4, 8], p=[0.4, 0.3, 0.2, 0.1]))
        for _ in range(n_pages):
            spans.append(page(1))
        spans.append(text_span())
    elif family == "no_table_page":
        spans += [page(0), text_span()]
    elif family == "classify_mix":
        spans += [page(1, keywords=doc_index % 2 == 0), text_span()]
    else:
        spans += [page(1), text_span()]
    return DocSpec(doc_id=doc_id, family=family, spans=spans)


def media_ref_for(doc_id: str, page_no: int) -> str:
    return f"media/{doc_id}/p{page_no}.png"


def build_doc(doc_index: int, seed: int = SEED, hidpi_scale: int = 1) -> dict:
    """Materialize one document: input spans, media payloads, golden spans.

    ``hidpi_scale > 1`` stores each page at k x the base raster (exact
    nearest-neighbor upscale — how a higher-DPI rasterization of the same
    ruled/glyph content looks, reference preprocessing.py:10-28 dpi arg).
    Golden spans are IDENTICAL to the base corpus: resolution changes the
    pixels, never the content."""
    spec = make_doc_spec(doc_index, seed)
    in_spans: list[dict] = []
    golden: list[dict] = []
    media: list[tuple[str, bytes]] = []
    page_no = 0
    for kind, payload in spec.spans:
        offset = len(in_spans)
        if kind == "text":
            in_spans.append(
                {"kind": "text", "text": payload, "media_ref": "", "offset": offset}
            )
            golden.append({"kind": "text", "text": payload, "media_ref": ""})
        else:
            ref = media_ref_for(spec.doc_id, page_no)
            page_img, _bboxes = render_page(payload.tables, title=payload.title)
            if hidpi_scale > 1:
                page_img = np.kron(
                    page_img, np.ones((hidpi_scale, hidpi_scale), dtype=np.uint8)
                )
            media.append((ref, png.encode_gray(page_img)))
            in_spans.append(
                {"kind": "media", "text": "", "media_ref": ref, "offset": offset}
            )
            golden.append({"kind": "media", "text": "", "media_ref": ref})
            for table in payload.tables:
                pairs = [(rect, ocr_text(raw)) for rect, raw in logical_cell_rects(table)]
                for text in emit_table_spans(pairs):
                    golden.append({"kind": "text", "text": text, "media_ref": ""})
            page_no += 1
    for i, g in enumerate(golden):
        g["offset"] = i
    return {
        "doc_id": spec.doc_id,
        "spans": in_spans,
        "golden": golden,
        "media": media,
    }


def _write_batch(docs: list[dict], out_dir: str) -> tuple[pa.Table, pa.Table, pa.Table]:
    doc_tbl = pa.Table.from_pylist(
        [{"doc_id": d["doc_id"], "spans": d["spans"]} for d in docs], schema=DOC_SCHEMA
    )
    gold_tbl = pa.Table.from_pylist(
        [{"doc_id": d["doc_id"], "spans": d["golden"]} for d in docs], schema=DOC_SCHEMA
    )
    media_rows = []
    for d in docs:
        for ref, payload in d["media"]:
            path = os.path.join(out_dir, ref)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "wb") as f:
                f.write(payload)
            media_rows.append({"media_ref": ref, "payload": payload})
    media_tbl = pa.Table.from_pylist(
        media_rows,
        schema=pa.schema([("media_ref", pa.string()), ("payload", pa.large_binary())]),
    )
    return doc_tbl, gold_tbl, media_tbl


def generate_corpus(
    out_dir: str,
    n_docs: int | None = None,
    tier: str = "t1",
    seed: int = SEED,
    force: bool = False,
) -> str:
    """Generate (or reuse) a corpus directory; returns ``out_dir``.

    Parallelized over documents with ray.data when a session is active;
    output is identical either way (per-doc determinism)."""
    n = n_docs if n_docs is not None else TIERS[tier]
    hidpi_scale = TIER_HIDPI_SCALE.get(tier, 1)
    manifest_path = os.path.join(out_dir, "MANIFEST.json")
    if not force and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if (
            m.get("n_docs") == n
            and m.get("seed") == seed
            and m.get("hidpi_scale", 1) == hidpi_scale
        ):
            return out_dir
    os.makedirs(out_dir, exist_ok=True)

    import ray

    use_ray = ray.is_initialized() and n >= 64
    if use_ray:
        import ray.data

        # Media files are written inside the tasks; the small doc/golden
        # tables come back to the driver for one consolidated write.
        def gen_tables(batch: pa.Table) -> pa.Table:
            docs = [
                build_doc(int(i), seed, hidpi_scale=hidpi_scale)
                for i in batch["id"].to_pylist()
            ]
            d, g, _m = _write_batch(docs, out_dir)
            import io

            sink_d, sink_g = io.BytesIO(), io.BytesIO()
            pq.write_table(d, sink_d)
            pq.write_table(g, sink_g)
            return pa.Table.from_pylist(
                [{"docs_pq": sink_d.getvalue(), "golden_pq": sink_g.getvalue()}]
            )

        res = (
            ray.data.range(n)
            .map_batches(gen_tables, batch_size=16, batch_format="pyarrow")
            .take_all()
        )
        import io

        doc_parts = [pq.read_table(io.BytesIO(r["docs_pq"])) for r in res]
        gold_parts = [pq.read_table(io.BytesIO(r["golden_pq"])) for r in res]
        doc_tbl = pa.concat_tables(doc_parts).sort_by("doc_id")
        gold_tbl = pa.concat_tables(gold_parts).sort_by("doc_id")
        media_tbl = None  # media sidecar built below only for small tiers
    else:
        docs = [build_doc(i, seed, hidpi_scale=hidpi_scale) for i in range(n)]
        doc_tbl, gold_tbl, media_tbl = _write_batch(docs, out_dir)

    # documents.parquet is a DIRECTORY of ~256-doc shards: reads parallelize
    # across shards (one task each) instead of one serial read+split task —
    # the layout a Lance/parquet corpus has at scale (one fragment per
    # partition). Single-shard for tiny tiers.
    doc_dir = os.path.join(out_dir, "documents.parquet")
    if os.path.isfile(doc_dir):
        os.remove(doc_dir)
    elif os.path.isdir(doc_dir):
        import shutil

        shutil.rmtree(doc_dir)
    os.makedirs(doc_dir)
    shard_rows = 256
    n_shards = max(1, -(-doc_tbl.num_rows // shard_rows))
    for s in range(n_shards):
        pq.write_table(
            doc_tbl.slice(s * shard_rows, shard_rows),
            os.path.join(doc_dir, f"part-{s:05d}.parquet"),
        )
    pq.write_table(gold_tbl, os.path.join(out_dir, "golden.parquet"))
    if media_tbl is not None:
        pq.write_table(media_tbl, os.path.join(out_dir, "media.parquet"))
    with open(manifest_path, "w") as f:
        json.dump(
            {"n_docs": n, "seed": seed, "tier": tier, "hidpi_scale": hidpi_scale}, f
        )
    return out_dir


def golden_cells(corpus_dir: str) -> "ray.data.Dataset":
    """Ground-truth cell rows (``metrics.CELL_ROW_COLUMNS`` schema) for a
    generated corpus — the GOLD side of ``metrics.grits_corpus``. Derived
    from the same deterministic doc specs that produced the corpus (seed
    from MANIFEST.json), entirely distributed: each task regenerates the
    logical tables for its slice of doc_ids and emits
    ``render.logical_cell_rects`` with the golden OCR normalization —
    never touching the rendered images."""
    import ray.data

    from .render import logical_cell_rects, ocr_text

    with open(os.path.join(corpus_dir, "MANIFEST.json")) as f:
        seed = json.load(f)["seed"]

    def cells(batch: pa.Table) -> pa.Table:
        rows = []
        for doc_id in batch["doc_id"].to_pylist():
            spec = make_doc_spec(int(doc_id.rsplit("-", 1)[1]), seed)
            for offset, (kind, payload) in enumerate(spec.spans):
                if kind != "media":
                    continue
                for table_no, table in enumerate(payload.tables):
                    for rect, raw in logical_cell_rects(table):
                        rows.append(
                            {
                                "doc_id": doc_id,
                                "offset": offset,
                                "table_no": table_no,
                                "x1": rect[0],
                                "y1": rect[1],
                                "x2": rect[2],
                                "y2": rect[3],
                                "text": ocr_text(raw),
                            }
                        )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("doc_id", pa.string()),
                    ("offset", pa.int64()),
                    ("table_no", pa.int64()),
                    ("x1", pa.int64()),
                    ("y1", pa.int64()),
                    ("x2", pa.int64()),
                    ("y2", pa.int64()),
                    ("text", pa.string()),
                ]
            ),
        )

    return ray.data.read_parquet(
        os.path.join(corpus_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(cells, batch_format="pyarrow")
