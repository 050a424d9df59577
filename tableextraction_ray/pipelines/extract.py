"""The flagship extraction pipeline (SURVEY.md §4.2 physical plan).

    read_parquet(documents)                      # column-pruned read
      .map_batches(explode_spans)                # doc -> span rows (skew fix 1)
      .map_batches(DecodePages)                  # store read + PNG decode (stateful)
      .map_batches(detect_tables)                # page -> marker + tables (skew fix 2)
      .map_batches(grid_to_cells)                # table -> cell rows (skew fix 3)
      .map_batches(OcrCells)                     # the stateful $$$ stage
      .repartition(2 x CPUs)                     # narrow the exchange
      .groupby('doc_id').map_groups(assemble)    # the ONLY shuffle (key: doc_id)

Everything upstream of the groupby is embarrassingly parallel and streams
with backpressure; blocks are Arrow end to end. Batch sizes are small for
image-carrying stages (a page is ~100 KB-1 MB raw) and large for cell rows.

Stateful-stage execution mode (``ExtractConfig.stage_mode``):
- ``auto`` (default): deterministic cheap-state backends (synthetic-glyph
  OCR, filesystem decode) run as plain TASKS with the stage instance cached
  per worker process — identical build-once semantics, full scheduler
  elasticity, none of the actor-pool autoscaler's ramp/variance. Heavy
  model backends (easyocr / maskrcnn / tatr) automatically run as ACTOR
  pools, the right home for an expensive model load (+ ``num_gpus``).
- ``actors`` / ``tasks``: force one mode (bench comparisons, GPU configs).
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
from ..stages.decode import decode_pages_task
from ..stages.ocr_stage import ocr_cells_task

HEAVY_OCR_BACKENDS = {"easyocr"}
# Model-based detectors hold a loaded network per actor; morphology is a
# pure function and stays a plain task.
HEAVY_DETECT_BACKENDS = {"maskrcnn", "tatr"}


@dataclass
class ExtractConfig:
    """Stage sizing knobs. Pool maxima default to the cluster CPU count
    (resolved at pipeline-build time) so the same config scales from the
    8-CPU scaling-bench run to a multi-node cluster without edits — a fixed
    cap was the original N->4N scaling bottleneck (actor pools pinned at 8
    idled 3/4 of a 32-CPU run)."""

    decode_batch_size: int = 16
    detect_batch_size: int = 8
    ocr_batch_size: int = 64
    decode_pool: tuple[int, int] | None = None
    ocr_pool: tuple[int, int] | None = None
    ocr_backend: str = "synthetic-glyph"
    # Detector backends (stages/registry.py): 'morphology' (deterministic
    # default) | 'maskrcnn' | 'tatr'. Model backends run as actor pools
    # (model loaded once per actor) and are a pure config change on a
    # cluster with torch installed.
    table_backend: str = "morphology"
    cell_backend: str = "morphology"
    # 'actors' (default): stateful stages are autoscaling actor pools —
    # stable parallelism at every cluster size. 'tasks': cheap-state
    # backends as plain tasks with per-worker cached state; measured
    # FASTER at 32 CPUs but 2x slower at 8 (Ray fuses the whole
    # task chain into one operator whose resource budget throttles small
    # clusters), so it stays opt-in.
    stage_mode: str = "actors"  # actors | tasks | auto
    # Optional semantic gate (reference recognition.py:78-97): drop tables
    # whose combined cell text fails the fuzzy keyword classifier.
    classify_filter: bool = False
    # Two-DPI production flow (reference extractor.py:24-33: rasterize at
    # 50 AND 500 DPI, detect tables on the cheap pages, crop/OCR the sharp
    # ones; resize_tables_cells detection.py:607-628 scales the boxes).
    # dpi_scale = high/low ratio; the corpus stores the HIGH raster and
    # detection/grid run on its exact k x subsample. 1 = single-resolution.
    dpi_scale: int = 1

    def use_actors(self) -> bool:
        if self.stage_mode == "actors":
            return True
        if self.stage_mode == "tasks":
            return False
        return self.ocr_backend in HEAVY_OCR_BACKENDS

    def resolved_pools(self) -> tuple[tuple[int, int], tuple[int, int]]:
        """CPU-proportional autoscaling pools (actor mode). Minima matter:
        starting from 1 actor, the autoscaler's ramp eats most of a short
        run; but the SUM of all pool minima must leave >= 2 CPUs for the
        read / repartition / shuffle tasks or the pipeline livelocks
        (observed at num_cpus=4 when minima summed to the CPU count).

        Tiny single nodes (< 16 CPUs) keep a conservative OCR min of
        cpus//2: the reservation allocator pins the pool at its min, so
        raising it is measurably faster (bench tier at num_cpus=8:
        min 4 -> 203 s, ocr_pool=(5,8) -> 165 s, ocr_pool=(6,8) with
        decode_pool=(1,1) -> 137 s) — but those settings leave only ONE
        free CPU, eroding the 2-CPU livelock reserve that protects the
        <= 6-CPU shapes and the heavier dual-DPI / resume flows. On a
        real N-node cluster every node takes the >= 16-CPU branch, so
        the default favors hang-free robustness on the tiny shape;
        operators who want the faster tiny-node profile pass
        ``ocr_pool=(cpus - 2, cpus)`` explicitly."""
        decode, ocr = self.decode_pool, self.ocr_pool
        if decode is None or ocr is None:
            from ..util import cluster_cpus

            cpus = cluster_cpus()
            decode_min = 1 if cpus < 16 else 2
            # OCR (the dominant stage) gets nearly everything: Ray Data's
            # reservation allocator effectively pins an actor pool at its
            # min, so a low min idles CPUs (measured 21/32 busy at min=22,
            # 510 docs/s at min=26, but min=28 starves decode/sort).
            ocr_share = cpus - 6 if cpus >= 16 else cpus // 2
            ocr_min = max(1, min(ocr_share, cpus - decode_min - 2))
            decode = decode or (decode_min, max(4, cpus // 4))
            ocr = ocr or (ocr_min, cpus)
        return decode, ocr

    def cluster_cpus(self) -> int:
        from ..util import cluster_cpus

        return cluster_cpus()


def documents_path(corpus_dir: str) -> str:
    return os.path.join(corpus_dir, "documents.parquet")


def _resolve_dpi(corpus_dir: str, cfg: ExtractConfig) -> ExtractConfig:
    """Dual-DPI corpora advertise their high-raster factor in
    MANIFEST.json (datagen TIER_HIDPI_SCALE); pick it up automatically so
    every pipeline flavor (extract / serialize / cells / verify) runs the
    detect-cheap-OCR-sharp flow on such a corpus without per-call-site
    config."""
    if cfg.dpi_scale != 1:
        return cfg
    manifest = os.path.join(corpus_dir, "MANIFEST.json")
    if os.path.exists(manifest):
        import dataclasses
        import json

        with open(manifest) as f:
            k = int(json.load(f).get("hidpi_scale", 1))
        if k > 1:
            return dataclasses.replace(cfg, dpi_scale=k)
    return cfg


def _build_work_stream(
    corpus_dir: str, cfg: ExtractConfig, docs: ray.data.Dataset | None
) -> tuple[ray.data.Dataset, int]:
    """Shared explode -> decode -> detect -> grid -> OCR stream; returns the
    cell-level work stream and the cluster CPU count for shuffle sizing."""
    cfg = _resolve_dpi(corpus_dir, cfg)
    cpus = cfg.cluster_cpus()
    if docs is None:
        # Block granularity scales with DATA (~128 docs/block, floor of 10
        # blocks/CPU): tying it to CPU count alone left 750-doc blocks on
        # the 8-CPU scaling run — a 14 s skew tail from multi-page docs at
        # 47 % utilization — while blocks that are too FINE pay the
        # all-to-all width before the doc_id exchange (measured at the
        # 60k-doc bench tier, 32 CPUs: 64 docs/block 52.9 s, 128/block
        # 44.4 s, 256/block 45.8 s — the skew tail returns). Row count
        # comes from parquet footers (cheap).
        import pyarrow.dataset as pads

        n_rows = pads.dataset(documents_path(corpus_dir)).count_rows()
        docs = ray.data.read_parquet(
            documents_path(corpus_dir),
            columns=["doc_id", "spans"],
            override_num_blocks=max(10 * cpus, -(-n_rows // 128)),
        )
    work = docs.map_batches(explode_spans, batch_format="pyarrow")
    if cfg.use_actors():
        decode_pool, ocr_pool = cfg.resolved_pools()
        work = work.map_batches(
            DecodePages,
            fn_constructor_kwargs={"media_root": corpus_dir},
            concurrency=decode_pool,
            batch_size=cfg.decode_batch_size,
            batch_format="pyarrow",
        )
    else:
        work = work.map_batches(
            functools.partial(decode_pages_task, media_root=corpus_dir),
            batch_size=cfg.decode_batch_size,
            batch_format="pyarrow",
        )
    if cfg.table_backend in HEAVY_DETECT_BACKENDS:
        from ..stages.detect import DetectTables

        work = work.map_batches(
            DetectTables,
            fn_constructor_kwargs={
                "backend": cfg.table_backend,
                "dpi_scale": cfg.dpi_scale,
            },
            concurrency=(1, max(2, cpus // 2)),
            batch_size=cfg.detect_batch_size,
            batch_format="pyarrow",
        )
    else:
        work = work.map_batches(
            functools.partial(detect_tables, dpi_scale=cfg.dpi_scale),
            batch_size=cfg.detect_batch_size,
            batch_format="pyarrow",
        )
    if cfg.cell_backend in HEAVY_DETECT_BACKENDS:
        from ..stages.grid import GridCells

        work = work.map_batches(
            GridCells,
            fn_constructor_kwargs={
                "backend": cfg.cell_backend,
                "dpi_scale": cfg.dpi_scale,
            },
            concurrency=(1, max(2, cpus // 2)),
            batch_size=cfg.detect_batch_size,
            batch_format="pyarrow",
        )
    else:
        work = work.map_batches(
            functools.partial(grid_to_cells, dpi_scale=cfg.dpi_scale),
            batch_size=cfg.detect_batch_size,
            batch_format="pyarrow",
        )
    if cfg.use_actors():
        work = work.map_batches(
            OcrCells,
            fn_constructor_kwargs={
                "backend": cfg.ocr_backend,
                "dpi_scale": cfg.dpi_scale,
            },
            concurrency=ocr_pool,
            batch_size=cfg.ocr_batch_size,
            batch_format="pyarrow",
        )
    else:
        work = work.map_batches(
            functools.partial(
                ocr_cells_task, backend=cfg.ocr_backend, dpi_scale=cfg.dpi_scale
            ),
            batch_size=cfg.ocr_batch_size,
            batch_format="pyarrow",
        )
    # Fine blocks above (skew control) but a NARROW sort below: a keyed
    # exchange over ~1000 blocks is O(blocks^2) transfers and dominated an
    # 8-CPU run; the linear merge-repartition to 2 blocks/CPU costs far
    # less than the width it saves. (With coarse blocks the repartition
    # isn't worth it — granularity and shuffle width trade off, so both
    # knobs are set explicitly.)
    return work.repartition(2 * cpus), cpus


def build_extraction_pipeline(
    corpus_dir: str,
    config: ExtractConfig | None = None,
    docs: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Dataset of results (doc_id, spans) for every document in the corpus.

    ``docs`` overrides the input dataset (used by the resume path to feed a
    partition-filtered input)."""
    cfg = config or ExtractConfig()
    work, _ = _build_work_stream(corpus_dir, cfg, docs)
    assemble = (
        functools.partial(assemble_doc, classify_filter=True)
        if cfg.classify_filter
        else assemble_doc
    )
    return work.groupby("doc_id").map_groups(assemble, batch_format="pyarrow")


def build_cells_pipeline(
    corpus_dir: str,
    config: ExtractConfig | None = None,
    docs: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Cell-level intermediate of the same DAG (one row per OCR'd cell,
    ``metrics.CELL_ROW_COLUMNS`` schema) — the prediction side of the
    corpus GriTS evaluation harness (reference grits.py:813+ scores a
    dataset of tables; here the 'dataset of tables' is this stream grouped
    per (doc_id, offset, table_no)). No shuffle: the groupby happens
    inside ``metrics.grits_corpus``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..metrics import CELL_ROW_COLUMNS

    cfg = config or ExtractConfig()
    work, _ = _build_work_stream(corpus_dir, cfg, docs)

    def project(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["kind"], pa.scalar("cell")))
        return pa.Table.from_pydict({c: t[c] for c in CELL_ROW_COLUMNS})

    return work.map_batches(project, batch_format="pyarrow")


def build_serialization_pipeline(
    corpus_dir: str,
    config: ExtractConfig | None = None,
) -> ray.data.Dataset:
    """Same DAG, but the per-doc reduction emits reference-parity YAML/JSON
    serializations per table (export.py:77-122 ``save``) instead of span
    rows: (doc_id, page_offset, table_no, yaml, json)."""
    from ..stages import serialize_tables

    cfg = config or ExtractConfig()
    work, _ = _build_work_stream(corpus_dir, cfg, None)
    return work.groupby("doc_id").map_groups(serialize_tables, batch_format="pyarrow")
