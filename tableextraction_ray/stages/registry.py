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


_DETECTION_CLASSES = ("__background__", "table", "plot")
_CELL_CLASSES = ("__background__", "cell", "head")


def _build_maskrcnn(torch, weights_path: str, n_classes: int, quantized: bool = False):
    """Mask R-CNN resnet50-FPN-v2 with the reference's head surgery
    (inference.py:26-40: 91-class COCO skeleton, cls/bbox/mask heads
    re-sized to the fine-tuned class count) loaded from ``ckpt['model']``
    onto cuda-when-available. Shared by both Mask R-CNN backends; built
    ONCE per actor — the reference re-runs all of this per page
    (inference.py:12-67 called from detection.py:103-110).

    ``quantized=True`` applies post-load int8 DYNAMIC quantization to the
    Linear layers (reference README.md:282-290 / TableExtraction.ipynb
    cells 23-26 ``torch.quantization.quantize_dynamic(model,
    {torch.nn.Linear}, dtype=torch.qint8)``) — the reference's memory/CPU
    relief option for clusters without GPUs; forces CPU (dynamic
    quantization is a CPU path)."""
    import torch.nn as nn  # pragma: no cover - torch absent in sandbox
    import torchvision  # pragma: no cover

    model = torchvision.models.detection.maskrcnn_resnet50_fpn_v2(  # pragma: no cover
        weights=None, num_classes=91
    )
    model.roi_heads.box_predictor.cls_score = nn.Linear(1024, n_classes, bias=True)  # pragma: no cover
    model.roi_heads.box_predictor.bbox_pred = nn.Linear(1024, n_classes * 4, bias=True)  # pragma: no cover
    model.roi_heads.mask_predictor.mask_fcn_logits = nn.Conv2d(  # pragma: no cover
        256, n_classes, kernel_size=(1, 1), stride=(1, 1)
    )
    device = torch.device(  # pragma: no cover
        "cuda" if (torch.cuda.is_available() and not quantized) else "cpu"
    )
    ckpt = torch.load(weights_path, map_location=device)  # pragma: no cover
    model.load_state_dict(ckpt["model"])  # pragma: no cover
    model = model.to(device).eval()  # pragma: no cover
    if quantized:  # pragma: no cover
        model = torch.quantization.quantize_dynamic(
            model, {torch.nn.Linear}, dtype=torch.qint8
        )
    return model, device  # pragma: no cover


def _maskrcnn_detections(torch, model, device, page, score_threshold: float):
    """One forward pass -> [(label_idx, score, (x1, y1, x2, y2))] above the
    threshold. The reference keeps detections whose score is STRICTLY above
    threshold and relies on torchvision returning scores sorted descending
    (infer_utils.py:32-48 list truncation); the explicit mask here is
    order-independent but selects the same set. Boxes are int-truncated
    exactly as infer_utils.py:42."""
    gray = page if page.ndim == 2 else page[..., 0]  # pragma: no cover
    rgb = torch.from_numpy(gray).float().div_(255.0)  # pragma: no cover
    tensor = rgb.unsqueeze(0).expand(3, -1, -1).unsqueeze(0).to(device)  # pragma: no cover
    with torch.no_grad():  # pragma: no cover
        out = model(tensor)[0]
    dets = []  # pragma: no cover
    scores = out["scores"].detach().cpu().numpy()  # pragma: no cover
    boxes = out["boxes"].detach().cpu().numpy()  # pragma: no cover
    labels = out["labels"].detach().cpu().numpy()  # pragma: no cover
    for score, box, label in zip(scores, boxes, labels):  # pragma: no cover
        if score > score_threshold:
            dets.append(
                (int(label), float(score), (int(box[0]), int(box[1]), int(box[2]), int(box[3])))
            )
    return dets  # pragma: no cover


@register("table_detector", "maskrcnn")
class MaskRcnnTableDetector:
    """Mask R-CNN table/plot detector (reference maskrcnn/inference.py:12-67
    via detection.py:80-122 get_tables_maskrcnn: classes
    ['__background__','table','plot'], keep label 'table', score > 0.8).
    The body is complete; only the torch/torchvision import is gated — on a
    GPU cluster this backend is a config change
    (``ExtractConfig(table_backend='maskrcnn')``), not a code change. Model
    loads ONCE here in __init__ — the reference reloads per page."""

    def __init__(
        self,
        weights_path: str = "weights/detect_table_plot.pth",
        score_threshold: float = 0.8,
        quantized: bool = False,
    ):
        self.torch = _require("torch", "Mask R-CNN table detection (GPU cluster)")
        self.score_threshold = score_threshold  # pragma: no cover
        self.model, self.device = _build_maskrcnn(  # pragma: no cover
            self.torch, weights_path, len(_DETECTION_CLASSES), quantized=quantized
        )

    def __call__(self, page):  # pragma: no cover - torch absent
        return [
            box
            for label, _score, box in _maskrcnn_detections(
                self.torch, self.model, self.device, page, self.score_threshold
            )
            if _DETECTION_CLASSES[label] == "table"
        ]


@register("table_detector", "tatr")
class TatrTableDetector:
    """Table Transformer (DETR r18, PubTables-1M) detection backend
    (reference detection.py:32-77 get_tables_detr + transformer/core.py:84-144
    TableRecognizer: ImageNet-normalize, forward, bbox postprocess, keep
    class 'table' at score >= 0.9). Inference goes through the public
    HuggingFace ``transformers`` port of the same architecture instead of
    the reference's vendored DETR training fork; the body is complete and
    gated only on the torch + transformers imports."""

    def __init__(
        self,
        model_name: str = "microsoft/table-transformer-detection",
        score_threshold: float = 0.9,
    ):
        self.torch = _require("torch", "TATR/DETR table detection (GPU cluster)")
        transformers = _require("transformers", "TATR/DETR table detection (GPU cluster)")  # pragma: no cover
        self.score_threshold = score_threshold  # pragma: no cover
        self.device = self.torch.device("cuda" if self.torch.cuda.is_available() else "cpu")  # pragma: no cover
        self.model = (  # pragma: no cover
            transformers.TableTransformerForObjectDetection.from_pretrained(model_name)
            .to(self.device)
            .eval()
        )

    def _predict(self, page):  # pragma: no cover - torch absent
        """ImageNet-normalized forward + softmax/box postprocess (the
        transformers equivalent of core.py:116-131 predict); returns
        [(label_name, score, (x1, y1, x2, y2))] in page pixels."""
        import numpy as np

        torch = self.torch
        gray = page if page.ndim == 2 else page[..., 0]
        rgb = np.repeat(gray[..., None], 3, axis=2).astype("float32") / 255.0
        mean = np.asarray([0.485, 0.456, 0.406], dtype="float32")
        std = np.asarray([0.229, 0.224, 0.225], dtype="float32")
        tensor = torch.from_numpy(((rgb - mean) / std).transpose(2, 0, 1)).unsqueeze(0).to(self.device)
        with torch.no_grad():
            out = self.model(pixel_values=tensor)
        probs = out.logits.softmax(-1)[0, :, :-1]  # drop 'no object'
        scores, labels = probs.max(-1)
        h, w = gray.shape
        dets = []
        id2label = self.model.config.id2label
        for score, label, (cx, cy, bw, bh) in zip(
            scores.tolist(), labels.tolist(), out.pred_boxes[0].tolist()
        ):
            x1 = int((cx - bw / 2) * w)
            y1 = int((cy - bh / 2) * h)
            x2 = int((cx + bw / 2) * w)
            y2 = int((cy + bh / 2) * h)
            dets.append((id2label[label], score, (x1, y1, x2, y2)))
        return dets

    def __call__(self, page):  # pragma: no cover - torch absent
        return [
            box
            for label, score, box in self._predict(page)
            if score >= self.score_threshold and label == "table"
        ]


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
    """Mask R-CNN cell detector (reference detection.py:174-218
    get_cells_maskrcnn: best_cell_detection.pth, score > 0.6, every box
    kept regardless of label, cells sorted (x1, y1)). Complete body, torch
    import gated; model built once per actor via the shared
    :func:`_build_maskrcnn`."""

    def __init__(
        self,
        weights_path: str = "weights/best_cell_detection.pth",
        score_threshold: float = 0.6,
        quantized: bool = False,
    ):
        self.torch = _require("torch", "Mask R-CNN cell detection (GPU cluster)")
        self.score_threshold = score_threshold  # pragma: no cover
        self.model, self.device = _build_maskrcnn(  # pragma: no cover
            self.torch, weights_path, len(_CELL_CLASSES), quantized=quantized
        )

    def __call__(self, table_image):  # pragma: no cover - torch absent
        cells = [
            box
            for _label, _score, box in _maskrcnn_detections(
                self.torch, self.model, self.device, table_image, self.score_threshold
            )
        ]
        return sorted(cells, key=lambda c: (c[0], c[1]))  # detection.py:199


@register("cell_detector", "tatr")
class TatrCellDetector:
    """TATR structure-recognition backend (reference detection.py:141-171
    get_cells_detr: TATR-v1.1-All, 125 queries, score >= 0.9) through the
    public transformers port, then the in-repo post-processing library
    (tatr.apply_class_thresholds -> objects_to_structures ->
    structure_to_cells) instead of the reference's raw box dump — the
    reference appends EVERY structure-class box (rows, columns, headers)
    as a 'cell' and flattens across tables (documented bug, SURVEY.md
    §2.3); here the structure classes are composed into actual grid cell
    boxes per table. Complete body, torch + transformers imports gated."""

    #: reference transformer/core.py structure_config.json thresholds per
    #: class, as used by tatr.apply_class_thresholds.
    CLASS_THRESHOLDS = {
        "table": 0.5,
        "table row": 0.5,
        "table column": 0.5,
        "table column header": 0.5,
        "table projected row header": 0.5,
        "table spanning cell": 0.5,
        "no object": 10.0,
    }

    def __init__(
        self,
        model_name: str = "microsoft/table-transformer-structure-recognition",
        score_threshold: float = 0.9,
    ):
        self.torch = _require("torch", "TATR structure recognition (GPU cluster)")
        transformers = _require("transformers", "TATR structure recognition (GPU cluster)")  # pragma: no cover
        self.score_threshold = score_threshold  # pragma: no cover
        self.device = self.torch.device("cuda" if self.torch.cuda.is_available() else "cpu")  # pragma: no cover
        self.model = (  # pragma: no cover
            transformers.TableTransformerForObjectDetection.from_pretrained(model_name)
            .to(self.device)
            .eval()
        )

    def __call__(self, table_image):  # pragma: no cover - torch absent
        import numpy as np

        from .. import tatr

        torch = self.torch
        gray = table_image if table_image.ndim == 2 else table_image[..., 0]
        rgb = np.repeat(gray[..., None], 3, axis=2).astype("float32") / 255.0
        mean = np.asarray([0.485, 0.456, 0.406], dtype="float32")
        std = np.asarray([0.229, 0.224, 0.225], dtype="float32")
        tensor = torch.from_numpy(((rgb - mean) / std).transpose(2, 0, 1)).unsqueeze(0).to(self.device)
        with torch.no_grad():
            out = self.model(pixel_values=tensor)
        probs = out.logits.softmax(-1)[0, :, :-1]
        scores, labels = probs.max(-1)
        h, w = gray.shape
        id2label = self.model.config.id2label
        objects = []
        for score, label, (cx, cy, bw, bh) in zip(
            scores.tolist(), labels.tolist(), out.pred_boxes[0].tolist()
        ):
            objects.append(
                {
                    "label": id2label[label],
                    "score": score,
                    "bbox": [
                        (cx - bw / 2) * w,
                        (cy - bh / 2) * h,
                        (cx + bw / 2) * w,
                        (cy + bh / 2) * h,
                    ],
                }
            )
        objects = tatr.apply_class_thresholds(objects, self.CLASS_THRESHOLDS)
        structures = tatr.objects_to_structures_refined(
            objects, tokens=[], class_thresholds=self.CLASS_THRESHOLDS
        )
        cells = tatr.refined_structure_to_cells(structures, tokens=[])
        boxes = [
            (int(b[0]), int(b[1]), int(b[2]), int(b[3]))
            for b in (c["bbox"] for c in cells)
        ]
        return sorted(boxes, key=lambda c: (c[1], c[0]))


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
