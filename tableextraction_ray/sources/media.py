"""Media store source: content-addressed binary payloads as a Dataset.

The corpus media store is a directory tree ``media/<doc_id>/p<N>.png``
(a bucket prefix at scale). Two layouts are supported transparently:

- a ``media.parquet`` sidecar (media_ref, payload) — small tiers/tests;
- the file tree itself via ``ray.data.read_binary_files`` — the scale
  layout: each file is read by the task that processes it, nothing is
  centralized through the driver.

Both return the same schema: (media_ref: string, payload: large_binary).
Plays the role of the reference's file-upload/readers
(``table_extraction/preprocessing.py:10-62``, ``main.py:20-36``) as a
distributed source.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data


def read_media(corpus_dir: str) -> ray.data.Dataset:
    sidecar = os.path.join(corpus_dir, "media.parquet")
    if os.path.exists(sidecar):
        return ray.data.read_parquet(sidecar)

    media_root = os.path.join(corpus_dir, "media")

    def to_refs(batch: pa.Table) -> pa.Table:
        # Path strings are rewritten in Python (tiny); the payload column is
        # passed through as the ORIGINAL Arrow buffer — round 1 rebuilt it
        # via a Python list (numpy batch format), copying the whole store
        # twice and costing more than the file reads themselves.
        refs = [
            os.path.join("media", os.path.relpath(p, media_root))
            for p in batch["path"].to_pylist()
        ]
        payload = batch["bytes"]
        if not pa.types.is_large_binary(payload.type):
            payload = payload.cast(pa.large_binary())
        return pa.Table.from_arrays(
            [pa.array(refs, type=pa.string()), payload],
            names=["media_ref", "payload"],
        )

    # Hundreds of read tasks over the (many small file) store: per-file
    # task overhead dominates a default-parallelism read.
    files = ray.data.read_binary_files(
        media_root, include_paths=True, override_num_blocks=256
    )
    return files.map_batches(to_refs, batch_format="pyarrow")
