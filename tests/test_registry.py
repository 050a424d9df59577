"""Stage/backend registry tests (SURVEY.md §2.9)."""

import numpy as np
import pytest

from tableextraction_ray.stages import registry


class TestRegistry:
    def test_backend_listing(self):
        assert registry.backends("table_detector") == ["maskrcnn", "morphology", "tatr"]
        assert registry.backends("cell_detector") == ["maskrcnn", "morphology", "tatr"]
        assert registry.backends("ocr") == ["easyocr", "synthetic-glyph"]

    def test_unknown_backend_error_names_known(self):
        with pytest.raises(KeyError, match="synthetic-glyph"):
            registry.get_backend("ocr", "tesseract")

    def test_default_backends_work(self):
        from tableextraction_ray.render import LogicalCell, LogicalTable, render_table

        table = LogicalTable(
            n_rows=2,
            n_cols=2,
            cells=[
                LogicalCell(0, 1, 0, 1, "h1"),
                LogicalCell(0, 1, 1, 2, "h2"),
                LogicalCell(1, 2, 0, 1, "a"),
                LogicalCell(1, 2, 1, 2, "b"),
            ],
        )
        img = render_table(table)
        det = registry.get_backend("table_detector", "morphology")()
        regions = det(img)
        assert len(regions) >= 1
        cells = registry.get_backend("cell_detector", "morphology")()(img)
        assert len(cells) == 4

    def test_heavy_backends_are_gated(self):
        for stage, name in [
            ("table_detector", "maskrcnn"),
            ("table_detector", "tatr"),
            ("cell_detector", "maskrcnn"),
            ("cell_detector", "tatr"),
            ("ocr", "easyocr"),
        ]:
            with pytest.raises(NotImplementedError, match="requires"):
                registry.get_backend(stage, name)()


class TestDispatchedStages:
    """The registry-dispatched stage classes must be drop-in equivalents of
    the plain-function morphology path (the config-change contract for
    model backends rides on this seam)."""

    def _work_batch(self):
        import pyarrow as pa

        from tableextraction_ray.render import LogicalCell, LogicalTable, render_table
        from tableextraction_ray.stages.explode import work_table

        table = LogicalTable(
            n_rows=2,
            n_cols=2,
            cells=[
                LogicalCell(0, 1, 0, 1, "h1"),
                LogicalCell(0, 1, 1, 2, "h2"),
                LogicalCell(1, 2, 0, 1, "a"),
                LogicalCell(1, 2, 1, 2, "b"),
            ],
        )
        img = render_table(table)
        return work_table(
            {
                "doc_id": ["d7"],
                "offset": [0],
                "kind": ["media"],
                "media_ref": ["m/7.png"],
                "table_no": [-1],
                "x1": [-1], "y1": [-1], "x2": [-1], "y2": [-1],
                "img": [img.tobytes()],
                "img_h": [img.shape[0]],
                "img_w": [img.shape[1]],
            }
        )

    def test_detect_class_matches_function(self):
        from tableextraction_ray.stages.detect import DetectTables, detect_tables

        batch = self._work_batch()
        assert DetectTables(backend="morphology")(batch).equals(detect_tables(batch))

    def test_grid_class_matches_function(self):
        from tableextraction_ray.stages.detect import detect_tables
        from tableextraction_ray.stages.grid import GridCells, grid_to_cells

        batch = detect_tables(self._work_batch())
        assert GridCells(backend="morphology")(batch).equals(grid_to_cells(batch))

    def test_heavy_backend_config_is_wired(self):
        """A heavy detector backend flows from ExtractConfig into the
        stage constructor: building the actor raises the torch gate, not a
        wiring error."""
        from tableextraction_ray.stages.detect import DetectTables
        from tableextraction_ray.stages.grid import GridCells

        with pytest.raises(NotImplementedError, match="torch"):
            DetectTables(backend="maskrcnn")
        with pytest.raises(NotImplementedError, match="torch"):
            GridCells(backend="tatr")
