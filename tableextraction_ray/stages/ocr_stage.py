"""OCR stage: cell crops -> cell text (actor pool).

The reference's dominant cost: a per-cell EasyOCR call with the reader
rebuilt per document (``table_extraction/recognition.py:167-238``). Here the
recognizer state (glyph decode table for the synthetic backend; an EasyOCR
reader for the optional real backend) is built ONCE per actor in
``__init__`` and each ``__call__`` recognizes a whole batch of cells —
exactly the state/actor split SURVEY.md §2.3 commits to.

Output contract per cell (reference recognition.py:226-232): empty crop ->
'', else recognized text with a trailing space per line, then de-hyphenated
(recognition.py:151-164, applied at :228). The image column is dropped.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..textproc import remove_hyphenated_words
from .decode import image_from_row
from .explode import work_table
from .registry import get_backend


class OcrCells:
    def __init__(self, backend: str = "synthetic-glyph", dpi_scale: int = 1):
        # Registry-resolved recognizer, constructed ONCE per actor. For
        # 'easyocr' the gated constructor raises NotImplementedError when
        # torch/easyocr are absent (its body is complete — registry.py).
        # ``dpi_scale``: input-resolution normalization for the two-DPI
        # flow — the synthetic glyph recognizer reads base-scale glyphs,
        # so high-DPI crops are exact-subsampled back before recognition
        # (the deterministic analog of EasyOCR resizing every crop to its
        # fixed 64x600 network input, reference
        # easy_ocr/user_network/fine-tuned_easyocr.yaml). A real OCR
        # backend would consume the sharp crop directly (dpi_scale left 1).
        self.backend = backend
        self.dpi_scale = dpi_scale if backend == "synthetic-glyph" else 1
        self.recognize = get_backend("ocr", backend)()
        if backend == "synthetic-glyph":
            # Force-build the glyph decode table once per actor.
            from ..glyphs import _decode_table

            _decode_table()

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch["kind"], "cell")
        if not pc.any(mask).as_py():
            return batch
        cells = batch.filter(mask)
        passthrough = batch.filter(pc.invert(mask))

        texts: list[str] = []
        imgs = cells["img"].to_pylist()
        hs = cells["img_h"].to_pylist()
        ws = cells["img_w"].to_pylist()
        for img, h, w in zip(imgs, hs, ws):
            if h <= 0 or w <= 0 or not img:
                texts.append("")
                continue
            crop = image_from_row(img, h, w)
            if self.dpi_scale > 1:
                crop = crop[:: self.dpi_scale, :: self.dpi_scale]
            decoded = self.recognize(crop)
            texts.append(remove_hyphenated_words(decoded + " ") if decoded else "")

        out = work_table(
            {
                "doc_id": cells["doc_id"],
                "offset": cells["offset"],
                "kind": cells["kind"],
                "media_ref": cells["media_ref"],
                "table_no": cells["table_no"],
                "x1": cells["x1"],
                "y1": cells["y1"],
                "x2": cells["x2"],
                "y2": cells["y2"],
                "text": pa.array(texts, type=pa.string()),
            }
        )
        return pa.concat_tables([passthrough, out], promote_options="none")


# Per-worker-process cached instance for task-mode execution: Ray reuses
# worker processes, so this is the same build-once-recognize-many semantics
# as the actor pool, without pool management. Used for deterministic
# (cheap-state) backends; heavy model backends run as real actor pools.
_TASK_INSTANCE: dict[tuple[str, int], OcrCells] = {}


def ocr_cells_task(
    batch: pa.Table, backend: str = "synthetic-glyph", dpi_scale: int = 1
) -> pa.Table:
    key = (backend, dpi_scale)
    inst = _TASK_INSTANCE.get(key)
    if inst is None:
        inst = _TASK_INSTANCE[key] = OcrCells(backend=backend, dpi_scale=dpi_scale)
    return inst(batch)
