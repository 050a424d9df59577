"""Fetch + decode media payloads (PNG page images -> raw grayscale).

Replaces the reference's rasterization step
(``table_extraction/preprocessing.py:10-62``): our corpus media are already
rendered page images addressed by ``media_ref``; at 100 TB scale this stage
is the content-addressed object-store read + decode, so it runs as an actor
pool (connection/store handle opened once per actor in ``__init__``, reads
in ``__call__``). Non-media rows pass through untouched.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import png
from .explode import work_table


class DecodePages:
    """map_batches actor: resolve media_ref against the media store and
    attach the decoded grayscale image to each media row.

    ``media_root`` is the store root (a directory here; a bucket at scale).
    If ``inline_payloads`` maps refs to bytes (small tiers / tests), the
    store read is skipped — this is the FIXTURES.md §1 sidecar layout.
    """

    def __init__(self, media_root: str, inline_payloads: dict[str, bytes] | None = None):
        self.media_root = media_root
        self.inline = inline_payloads

    def _read(self, ref: str) -> bytes:
        if self.inline is not None and ref in self.inline:
            return self.inline[ref]
        path = os.path.join(self.media_root, ref)
        with open(path, "rb") as f:
            return f.read()

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch["kind"], "media")
        if not pc.any(mask).as_py():
            return batch
        media = batch.filter(mask)
        passthrough = batch.filter(pc.invert(mask))

        imgs: list[bytes] = []
        hs: list[int] = []
        ws: list[int] = []
        for ref in media["media_ref"].to_pylist():
            # Per-document error tolerance (SURVEY.md §4.1): a missing or
            # corrupt payload degrades to an empty image (img_h = -1); the
            # doc's media marker still flows to assembly, downstream stages
            # skip detection for it, and the run continues. The reference
            # aborts the whole document on any exception (extractor.py:34-36).
            try:
                arr = png.decode_gray(self._read(ref))
            except (OSError, ValueError) as exc:
                import logging

                logging.getLogger(__name__).warning(
                    "media %s unreadable (%s); emitting bare marker", ref, exc
                )
                imgs.append(b"")
                hs.append(-1)
                ws.append(-1)
                continue
            imgs.append(arr.tobytes())
            hs.append(arr.shape[0])
            ws.append(arr.shape[1])
        decoded = work_table(
            {
                "doc_id": media["doc_id"],
                "offset": media["offset"],
                "kind": media["kind"],
                "media_ref": media["media_ref"],
                "img": pa.array(imgs, type=pa.large_binary()),
                "img_h": pa.array(hs, type=pa.int32()),
                "img_w": pa.array(ws, type=pa.int32()),
            }
        )
        return pa.concat_tables([passthrough, decoded], promote_options="none")


def image_from_row(img: bytes, h: int, w: int) -> np.ndarray:
    """Zero-copy view of a raw grayscale payload column value."""
    return np.frombuffer(img, dtype=np.uint8).reshape(h, w)


# Task-mode twin of the DecodePages actor (see ocr_stage.ocr_cells_task):
# worker-process-cached instance, same decode-once-per-process state.
_TASK_INSTANCE: dict[str, DecodePages] = {}


def decode_pages_task(batch: pa.Table, media_root: str) -> pa.Table:
    inst = _TASK_INSTANCE.get(media_root)
    if inst is None:
        inst = _TASK_INSTANCE[media_root] = DecodePages(media_root=media_root)
    return inst(batch)
