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
