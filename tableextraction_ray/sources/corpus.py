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


def read_golden(corpus_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(corpus_dir, "golden.parquet"))
