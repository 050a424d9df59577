"""Grid-reconstruction stage (table crop -> cell rows with crops).

The reference's empirical cell path (``table_extraction/detection.py:221-604``
lines -> nodes -> cells) run per table row, emitting one kind='cell' row per
reconstructed cell with the cell's crop attached (the reference crops with
``image[min(y):max(y), min(x):max(x)]``, recognition.py:223 — preserved).
Cell-level fan-out is the third skew fix: the OCR pool sees uniform small
units regardless of table size. A table with no reconstructable cells
contributes nothing (its media marker already flowed through detect).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .. import geometry
from .decode import image_from_row
from .explode import work_table


def grid_to_cells(batch: pa.Table, dpi_scale: int = 1) -> pa.Table:
    """Default morphology path (plain task; no model state to hold)."""
    return _grid_with(batch, geometry.grid_cells, dpi_scale)


class GridCells:
    """Registry-dispatched cell detection for heavy model backends
    (maskrcnn / tatr), model built ONCE per actor; selected by
    ``ExtractConfig(cell_backend=...)`` (same contract as DetectTables /
    OcrCells)."""

    def __init__(self, backend: str = "morphology", dpi_scale: int = 1):
        from .registry import get_backend

        self.cell_fn = get_backend("cell_detector", backend)()
        self.dpi_scale = dpi_scale

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _grid_with(batch, self.cell_fn, self.dpi_scale)


def _grid_with(batch: pa.Table, cell_fn, dpi_scale: int = 1) -> pa.Table:
    mask = pc.equal(batch["kind"], "table")
    if not pc.any(mask).as_py():
        return batch
    tables = batch.filter(mask)
    passthrough = batch.filter(pc.invert(mask))

    cols: dict[str, list] = {k: [] for k in (
        "doc_id", "offset", "kind", "media_ref", "table_no",
        "x1", "y1", "x2", "y2", "img", "img_h", "img_w",
    )}
    for row in tables.to_pylist():
        table_img = image_from_row(row["img"], row["img_h"], row["img_w"])
        if dpi_scale > 1:
            # Two-DPI flow: reconstruct the grid on the CHEAP raster (the
            # exact k x subsample of the high-DPI crop), then scale the
            # cell rects to high-DPI coordinates with the reference's
            # int-truncation semantics (geometry.scale_cells, reference
            # detection.py:607-628 resize_tables_cells) and crop the
            # SHARP image for OCR — detect cheap, OCR sharp.
            rects = geometry.scale_cells(
                cell_fn(table_img[::dpi_scale, ::dpi_scale]), 1, dpi_scale
            )
        else:
            rects = cell_fn(table_img)
        for (x1, y1, x2, y2) in rects:
            crop = table_img[min(y1, y2) : max(y1, y2), min(x1, x2) : max(x1, x2)]
            cols["doc_id"].append(row["doc_id"])
            cols["offset"].append(row["offset"])
            cols["kind"].append("cell")
            cols["media_ref"].append(row["media_ref"])
            cols["table_no"].append(row["table_no"])
            cols["x1"].append(x1)
            cols["y1"].append(y1)
            cols["x2"].append(x2)
            cols["y2"].append(y2)
            cols["img"].append(crop.tobytes())
            cols["img_h"].append(crop.shape[0])
            cols["img_w"].append(crop.shape[1])

    out = work_table(cols)
    return pa.concat_tables([passthrough, out], promote_options="none")
