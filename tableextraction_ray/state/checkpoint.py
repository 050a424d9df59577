"""Partition-addressed checkpointed output with lineage + resume.

SURVEY.md §4.1 design: the reference has no extraction checkpointing (its
output files are truncate-then-append, ``table_extraction/export.py:98-105``);
at 10^12-doc scale a run MUST be resumable. Scheme:

- documents are assigned to ``num_parts`` partitions by a deterministic hash
  of ``doc_id`` (crc32), independent of input order/layout;
- each partition's results are written to ``out_dir/part=NNNNN/`` followed
  atomically by a ``_DONE.json`` manifest carrying lineage (partition hash
  spec, doc count, span count, corpus manifest) and stage metrics;
- on restart, partitions with a valid manifest are skipped entirely — the
  anti-join against finished work is a pushed-down hash-bucket filter on the
  input read, not a shuffle (SURVEY.md §2.5).

Partitions are processed in waves of independent streaming pipelines; within
a wave each partition still fans out across the whole cluster, so resume
granularity costs little pipelining. Failure injection is tested in
``tests/test_resume.py``.

Known tradeoff (deliberate): each partition's input is the FULL documents
read with a pushed-down crc32 bucket filter — num_parts metadata-cheap scans
of the doc table in exchange for resume granularity with zero shuffle. At
Lance/parquet scale the filter prunes at the fragment level when the corpus
is hash-bucketed on doc_id; with num_parts ~ tens the re-scan cost stays a
small constant factor on the (footer-only) read, not on compute.
"""

from __future__ import annotations

import json
import os
import time
import zlib

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..pipelines.extract import ExtractConfig, build_extraction_pipeline, documents_path


def doc_partition(doc_id: str, num_parts: int) -> int:
    return zlib.crc32(doc_id.encode("utf-8")) % num_parts


def _part_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part:05d}")


def _manifest_path(out_dir: str, part: int) -> str:
    return os.path.join(_part_dir(out_dir, part), "_DONE.json")


def list_done_parts(out_dir: str, num_parts: int) -> set[int]:
    done = set()
    for part in range(num_parts):
        path = _manifest_path(out_dir, part)
        if os.path.exists(path):
            try:
                with open(path) as f:
                    m = json.load(f)
                if m.get("num_parts") == num_parts:
                    done.add(part)
            except (json.JSONDecodeError, OSError):
                continue
    return done


def _sweep_stale_parts(out_dir: str, num_parts: int) -> int:
    """Delete part dirs left by a run with a DIFFERENT partitioning: any
    ``part=NNNNN`` whose index >= num_parts, or whose manifest records
    another num_parts. Without this, resuming into an out_dir written with
    a larger num_parts silently ships stale/duplicate documents —
    ``read_results`` reads every part dir. Returns the number removed."""
    import re
    import shutil

    removed = 0
    if not os.path.isdir(out_dir):
        return removed
    for name in os.listdir(out_dir):
        m = re.fullmatch(r"part=(\d{5})", name)
        if not m:
            continue
        idx = int(m.group(1))
        stale = idx >= num_parts
        if not stale:
            manifest = _manifest_path(out_dir, idx)
            if os.path.exists(manifest):
                try:
                    with open(manifest) as f:
                        stale = json.load(f).get("num_parts") != num_parts
                except (json.JSONDecodeError, OSError):
                    stale = True  # unreadable manifest: rewrite below anyway
        if stale:
            shutil.rmtree(os.path.join(out_dir, name))
            removed += 1
    return removed


def run_partitioned(
    corpus_dir: str,
    out_dir: str,
    num_parts: int = 4,
    config: ExtractConfig | None = None,
) -> dict:
    """Run (or resume) the extraction, one checkpointed partition at a time.
    Returns overall metrics including how many partitions were skipped."""
    os.makedirs(out_dir, exist_ok=True)
    stale = _sweep_stale_parts(out_dir, num_parts)
    done = list_done_parts(out_dir, num_parts)
    skipped = len(done)
    totals = {"docs": 0, "spans": 0, "wall_s": 0.0, "stale_parts_removed": stale}

    for part in range(num_parts):
        if part in done:
            continue
        t0 = time.time()

        def part_filter(batch: pa.Table, part=part) -> pa.Table:
            ids = batch["doc_id"].to_pylist()
            mask = pa.array(
                [zlib.crc32(d.encode("utf-8")) % num_parts == part for d in ids]
            )
            return batch.filter(mask)

        docs = ray.data.read_parquet(
            documents_path(corpus_dir), columns=["doc_id", "spans"]
        ).map_batches(part_filter, batch_format="pyarrow")
        result = build_extraction_pipeline(corpus_dir, config=config, docs=docs)

        part_dir = _part_dir(out_dir, part)
        if os.path.exists(part_dir):
            # No (valid) manifest: a partial write from a crashed run —
            # discard it so the rewrite can't leave duplicate files.
            import shutil

            shutil.rmtree(part_dir)
        os.makedirs(part_dir, exist_ok=True)
        # Persist RESULT_SCHEMA exactly (doc_id, spans) — no internal
        # counting columns — so read_results matches the golden schema;
        # the manifest metrics below come from one aggregation pass over
        # the written data.
        result.write_parquet(part_dir)
        written = ray.data.read_parquet(part_dir)
        n_docs = written.count()
        kind_totals = written.map_batches(
            _span_kind_counts, batch_format="pyarrow"
        ).aggregate(
            ray.data.aggregate.Sum("n_spans"),
            ray.data.aggregate.Sum("n_text"),
            ray.data.aggregate.Sum("n_media"),
        )
        n_spans = int(kind_totals["sum(n_spans)"] or 0)
        wall = time.time() - t0
        manifest = {
            "part": part,
            "num_parts": num_parts,
            "partition_fn": "crc32(doc_id) % num_parts",
            "corpus_dir": os.path.abspath(corpus_dir),
            "docs": n_docs,
            "spans": n_spans,
            # Stage metrics (lineage sidecar): span-kind mix per partition.
            # A media marker with no following table text spans is the
            # signature of a decode-degraded page (stages/decode.py) —
            # monitoring n_text/n_media drift catches silent data loss.
            "text_spans": int(kind_totals["sum(n_text)"] or 0),
            "media_spans": int(kind_totals["sum(n_media)"] or 0),
            "wall_s": wall,
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        tmp = _manifest_path(out_dir, part) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, _manifest_path(out_dir, part))  # atomic commit
        totals["docs"] += n_docs
        totals["spans"] += n_spans
        totals["wall_s"] += wall

    totals["skipped_parts"] = skipped
    totals["num_parts"] = num_parts
    return totals


def _span_kind_counts(batch: pa.Table) -> pa.Table:
    """Per-block partial counts of span kinds (combiner for the manifest
    metrics aggregation)."""
    spans = batch["spans"].combine_chunks()
    flat = pc.list_flatten(spans)
    kinds = flat.field("kind")
    return pa.Table.from_pydict(
        {
            "n_spans": pa.array([len(flat)], type=pa.int64()),
            "n_text": pa.array(
                [pc.sum(pc.equal(kinds, "text")).as_py() or 0], type=pa.int64()
            ),
            "n_media": pa.array(
                [pc.sum(pc.equal(kinds, "media")).as_py() or 0], type=pa.int64()
            ),
        }
    )


def read_results(out_dir: str) -> ray.data.Dataset:
    """Read a (possibly resumed) partitioned run's results."""
    return ray.data.read_parquet(out_dir)
