"""The flagship extraction pipeline (SURVEY.md §4.2 physical plan).

    read_parquet(documents)                      # column-pruned read
      .map_batches(explode_spans)                # doc -> span rows (skew fix 1)
      .map_batches(DecodePages, actor pool)      # store read + PNG decode
      .map_batches(detect_tables)                # page -> marker + tables (skew fix 2)
      .map_batches(grid_to_cells)                # table -> cell rows (skew fix 3)
      .map_batches(OcrCells, actor pool)         # the stateful $$$ stage
      .groupby('doc_id').map_groups(assemble)    # the ONLY shuffle (key: doc_id)

Everything upstream of the groupby is embarrassingly parallel and streams
with backpressure; blocks are Arrow end to end. Batch sizes are small for
image-carrying stages (a page is ~100 KB-1 MB raw) and large for cell rows.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import ray.data

from ..stages import (
    DecodePages,
    OcrCells,
    assemble_doc,
    detect_tables,
    explode_spans,
    grid_to_cells,
)


@dataclass
class ExtractConfig:
    """Stage sizing knobs. Defaults target the 32-CPU sandbox node; on a real
    cluster, scale actor-pool maxima with cluster CPU count (they are
    autoscaling (min, max) pools, so oversizing is safe)."""

    decode_batch_size: int = 16
    detect_batch_size: int = 8
    ocr_batch_size: int = 512
    decode_pool: tuple[int, int] = (1, 8)
    ocr_pool: tuple[int, int] = (1, 8)
    ocr_backend: str = "synthetic-glyph"
    # Optional semantic gate (reference recognition.py:78-97): drop tables
    # whose combined cell text fails the fuzzy keyword classifier.
    classify_filter: bool = False


def documents_path(corpus_dir: str) -> str:
    return os.path.join(corpus_dir, "documents.parquet")


def build_extraction_pipeline(
    corpus_dir: str,
    config: ExtractConfig | None = None,
    docs: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Dataset of results (doc_id, spans) for every document in the corpus.

    ``docs`` overrides the input dataset (used by the resume path to feed a
    partition-filtered input)."""
    cfg = config or ExtractConfig()
    if docs is None:
        docs = ray.data.read_parquet(
            documents_path(corpus_dir), columns=["doc_id", "spans"]
        )
    work = docs.map_batches(explode_spans, batch_format="pyarrow")
    work = work.map_batches(
        DecodePages,
        fn_constructor_kwargs={"media_root": corpus_dir},
        concurrency=cfg.decode_pool,
        batch_size=cfg.decode_batch_size,
        batch_format="pyarrow",
    )
    work = work.map_batches(
        detect_tables, batch_size=cfg.detect_batch_size, batch_format="pyarrow"
    )
    work = work.map_batches(
        grid_to_cells, batch_size=cfg.detect_batch_size, batch_format="pyarrow"
    )
    work = work.map_batches(
        OcrCells,
        fn_constructor_kwargs={"backend": cfg.ocr_backend},
        concurrency=cfg.ocr_pool,
        batch_size=cfg.ocr_batch_size,
        batch_format="pyarrow",
    )
    assemble = (
        functools.partial(assemble_doc, classify_filter=True)
        if cfg.classify_filter
        else assemble_doc
    )
    return work.groupby("doc_id").map_groups(assemble, batch_format="pyarrow")


def build_serialization_pipeline(
    corpus_dir: str,
    config: ExtractConfig | None = None,
) -> ray.data.Dataset:
    """Same DAG, but the per-doc reduction emits reference-parity YAML/JSON
    serializations per table (export.py:77-122 ``save``) instead of span
    rows: (doc_id, page_offset, table_no, yaml, json)."""
    from ..stages import serialize_tables

    cfg = config or ExtractConfig()
    docs = ray.data.read_parquet(
        documents_path(corpus_dir), columns=["doc_id", "spans"]
    )
    work = docs.map_batches(explode_spans, batch_format="pyarrow")
    work = work.map_batches(
        DecodePages,
        fn_constructor_kwargs={"media_root": corpus_dir},
        concurrency=cfg.decode_pool,
        batch_size=cfg.decode_batch_size,
        batch_format="pyarrow",
    )
    work = work.map_batches(
        detect_tables, batch_size=cfg.detect_batch_size, batch_format="pyarrow"
    )
    work = work.map_batches(
        grid_to_cells, batch_size=cfg.detect_batch_size, batch_format="pyarrow"
    )
    work = work.map_batches(
        OcrCells,
        fn_constructor_kwargs={"backend": cfg.ocr_backend},
        concurrency=cfg.ocr_pool,
        batch_size=cfg.ocr_batch_size,
        batch_format="pyarrow",
    )
    return work.groupby("doc_id").map_groups(serialize_tables, batch_format="pyarrow")
