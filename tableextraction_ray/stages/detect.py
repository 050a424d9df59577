"""Table-region detection stage (page -> media marker + table crops).

Plays the role of the reference's model-based detector
(``table_extraction/detection.py:80-122`` get_tables_maskrcnn) with the
deterministic morphology backend
(:func:`tableextraction_ray.geometry.detect_table_regions`). Each media row
fans out into its marker row (kind='media', image dropped — markers are part
of the output span contract) plus one kind='table' row per detected region,
``table_no`` assigned in reading order (y, x) — the order that defines the
span emission order at assembly.

The second skew fix (SURVEY.md §4.1): a multi-table page fans out into
per-table rows here, so downstream grid/OCR work is table-granular.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .. import geometry
from .decode import image_from_row
from .explode import work_table


def detect_tables(batch: pa.Table, dpi_scale: int = 1) -> pa.Table:
    """Default morphology path (plain task; no model state to hold)."""
    return _detect_with(batch, geometry.detect_table_regions, dpi_scale)


class DetectTables:
    """Registry-dispatched table detection for heavy model backends
    (maskrcnn / tatr): the detector (model on device) is built ONCE per
    actor here, selected by ``ExtractConfig(table_backend=...)`` — the
    config-change-not-code-change contract the OCR stage already follows
    (ocr_stage.OcrCells)."""

    def __init__(self, backend: str = "morphology", dpi_scale: int = 1):
        from .registry import get_backend

        self.detector = get_backend("table_detector", backend)()
        self.dpi_scale = dpi_scale

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _detect_with(batch, self.detector, self.dpi_scale)


def _detect_with(batch: pa.Table, detector, dpi_scale: int = 1) -> pa.Table:
    mask = pc.equal(batch["kind"], "media")
    if not pc.any(mask).as_py():
        return batch
    media = batch.filter(mask)
    passthrough = batch.filter(pc.invert(mask))

    cols: dict[str, list] = {k: [] for k in (
        "doc_id", "offset", "kind", "media_ref", "table_no",
        "x1", "y1", "x2", "y2", "img", "img_h", "img_w",
    )}

    def add(doc_id, offset, kind, media_ref, table_no=-1,
            bbox=(-1, -1, -1, -1), img=b"", h=-1, w=-1):
        cols["doc_id"].append(doc_id)
        cols["offset"].append(offset)
        cols["kind"].append(kind)
        cols["media_ref"].append(media_ref)
        cols["table_no"].append(table_no)
        cols["x1"].append(bbox[0])
        cols["y1"].append(bbox[1])
        cols["x2"].append(bbox[2])
        cols["y2"].append(bbox[3])
        cols["img"].append(img)
        cols["img_h"].append(h)
        cols["img_w"].append(w)

    doc_ids = media["doc_id"].to_pylist()
    offsets = media["offset"].to_pylist()
    refs = media["media_ref"].to_pylist()
    imgs = media["img"].to_pylist()
    hs = media["img_h"].to_pylist()
    ws = media["img_w"].to_pylist()
    for doc_id, offset, ref, img, h, w in zip(doc_ids, offsets, refs, imgs, hs, ws):
        add(doc_id, offset, "media", ref)  # marker row, image dropped
        if h <= 0 or w <= 0 or not img:
            continue  # unreadable payload: marker only (decode error row)
        page = image_from_row(img, h, w)
        if dpi_scale > 1:
            # Two-DPI production flow (reference extractor.py:24-33 +
            # detection.py:98-122): DETECT on the cheap low-DPI raster
            # (exact k x subsample of the stored high-DPI page — how the
            # same vector content rasterizes at dpi/k), then crop the
            # SHARP page for downstream cell detection + OCR. Low bbox
            # (x1..x2 inclusive) maps to high rows [x1*k, (x2+1)*k) —
            # the inclusive-bbox translation of resize_tables_cells'
            # int-truncation scaling (detection.py:607-628).
            low = page[::dpi_scale, ::dpi_scale]
            for table_no, (x1, y1, x2, y2) in enumerate(detector(low)):
                crop = page[
                    y1 * dpi_scale : (y2 + 1) * dpi_scale,
                    x1 * dpi_scale : (x2 + 1) * dpi_scale,
                ]
                add(
                    doc_id, offset, "table", ref, table_no,
                    (
                        x1 * dpi_scale,
                        y1 * dpi_scale,
                        (x2 + 1) * dpi_scale - 1,
                        (y2 + 1) * dpi_scale - 1,
                    ),
                    crop.tobytes(), crop.shape[0], crop.shape[1],
                )
            continue
        for table_no, (x1, y1, x2, y2) in enumerate(detector(page)):
            crop = page[y1 : y2 + 1, x1 : x2 + 1]
            add(
                doc_id, offset, "table", ref, table_no,
                (x1, y1, x2, y2), crop.tobytes(), crop.shape[0], crop.shape[1],
            )

    out = work_table({k: v for k, v in cols.items()})
    return pa.concat_tables([passthrough, out], promote_options="none")
