"""Raw-file ingestion front door: PDF / image files -> the interleaved
corpus model.

The reference's entry point is a file upload rasterized with poppler/cv2
(``table_extraction/preprocessing.py:10-62`` bytes_file_to_array /
pdf_file_to_array / image_file_to_array, ``main.py:20-36``). Here the same
step is a DISTRIBUTED source: ``ingest_files`` reads raw files with
``ray.data.read_binary_files`` (each file rasterized by the task that read
it — nothing funnels through the driver), fans every file out into one
grayscale page per media span, writes page payloads to a content-addressed
media store, and emits the (doc_id, spans) interleaved table the extraction
pipeline consumes.

Media-kind dispatch is by file extension:

- ``.png``  — REAL in-sandbox path (the repo codec, gray/RGB/RGBA; color
  converts via the OpenCV-parity ``grayzation`` kernel);
- ``.pdf``  — ``pdf2image``/poppler backend: body fully written, import-
  gated (constructing the backend raises NotImplementedError naming the
  missing dependency — wiring it up where poppler exists is a config
  change, not a code change);
- ``.jpg/.jpeg/.bmp/.tiff`` — cv2/PIL backend, same gating pattern.

Backends register under the ``rasterizer`` stage of the typed registry, so
pipelines select them by name like every other swappable stage.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data

from .. import png
from ..stages.registry import get_backend, register


def _require(module: str, context: str):
    try:
        return __import__(module)
    except ImportError:  # pragma: no cover - exercised via gate tests
        raise NotImplementedError(
            f"backend requires {module!r} which is not installed; {context}"
        ) from None


@register("rasterizer", "png")
class PngRasterizer:
    """Decode a PNG payload into a single grayscale page (the real sandbox
    path — repo codec, no external deps). RGB/RGBA inputs convert through
    the fixed-point ``grayzation`` kernel (reference preprocessing.py:81-94)."""

    def __call__(self, payload: bytes) -> list[np.ndarray]:
        return [png.decode_gray(payload)]


@register("rasterizer", "pdf2image")
class PdfRasterizer:
    """PDF bytes -> one grayscale page array per page at ``dpi`` (reference
    ``bytes_file_to_array``, preprocessing.py:10-29, minus its hardcoded
    Windows poppler path). Import-gated: construction raises without
    pdf2image/poppler; the body below is complete."""

    def __init__(self, dpi: int = 300):
        mod = _require("pdf2image", "PDF rasterization (poppler)")
        self._convert = mod.convert_from_bytes
        self.dpi = dpi

    def __call__(self, payload: bytes) -> list[np.ndarray]:  # pragma: no cover
        pages = self._convert(payload, dpi=self.dpi)
        out = []
        for page in pages:
            arr = np.asarray(page)  # PIL RGB
            if arr.ndim == 3:
                arr = png.grayzation(arr[:, :, :3])
            out.append(arr.astype(np.uint8, copy=False))
        return out


@register("rasterizer", "cv2")
class Cv2ImageRasterizer:
    """JPEG/BMP/TIFF decode via OpenCV (reference ``image_file_to_array``,
    preprocessing.py:49-62: imread is BGR, converted to RGB then gray).
    Import-gated; body complete."""

    def __init__(self):
        self._cv2 = _require("cv2", "JPEG/BMP/TIFF decoding")

    def __call__(self, payload: bytes) -> list[np.ndarray]:  # pragma: no cover
        cv2 = self._cv2
        bgr = cv2.imdecode(np.frombuffer(payload, dtype=np.uint8), cv2.IMREAD_COLOR)
        if bgr is None:
            raise ValueError("cv2 could not decode payload")
        rgb = bgr[:, :, ::-1]
        return [png.grayzation(np.ascontiguousarray(rgb))]


_EXT_BACKEND = {
    ".png": "png",
    ".pdf": "pdf2image",
    ".jpg": "cv2",
    ".jpeg": "cv2",
    ".bmp": "cv2",
    ".tiff": "cv2",
    ".tif": "cv2",
}


class FileRasterizer:
    """Per-actor dispatch table: extension -> constructed backend (backends
    built lazily ONCE per actor, so a PNG-only ingest never trips the
    pdf2image gate)."""

    def __init__(self, dpi: int = 300):
        self.dpi = dpi
        self._backends: dict[str, object] = {}

    def rasterize(self, path: str, payload: bytes) -> list[np.ndarray]:
        ext = os.path.splitext(path)[1].lower()
        name = _EXT_BACKEND.get(ext)
        if name is None:
            raise ValueError(f"unsupported media kind {ext!r} for {path!r}")
        backend = self._backends.get(name)
        if backend is None:
            cls = get_backend("rasterizer", name)
            kwargs = {"dpi": self.dpi} if name == "pdf2image" else {}
            backend = self._backends[name] = cls(**kwargs)
        return backend(payload)


DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        (
            "spans",
            pa.list_(
                pa.struct(
                    [
                        ("kind", pa.string()),
                        ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32()),
                    ]
                )
            ),
        ),
    ]
)


class IngestFiles:
    """map_batches actor: raw file (path, bytes) -> one interleaved document
    (doc_id = the file's base name; one media span per rasterized page) +
    page payloads re-encoded as grayscale PNG into the media store. The
    store write happens in the task that rasterized the page — resumable
    (content-addressed paths are idempotent) and never driver-bound."""

    def __init__(self, media_root: str, dpi: int = 300, on_error: str = "skip"):
        if on_error not in ("skip", "raise"):
            raise ValueError(f"on_error must be 'skip' or 'raise', got {on_error!r}")
        self.media_root = media_root
        self.rasterizer = FileRasterizer(dpi=dpi)
        self.on_error = on_error
        self.n_skipped = 0

    def __call__(self, batch: dict) -> pa.Table:
        import logging
        import zlib

        rows = []
        for path, payload in zip(batch["path"], batch["bytes"]):
            # Disambiguate same-stem inputs (a/scan.pdf vs b/scan.pdf vs
            # scan.png): a bare basename would collide in doc_id AND in the
            # media store (last writer wins). The full-path crc makes the
            # id deterministic per source file and unique across the tree.
            stem = os.path.splitext(os.path.basename(path))[0]
            doc_id = f"{stem}-{zlib.crc32(path.encode('utf-8')) & 0xFFFFFFFF:08x}"
            try:
                pages = self.rasterizer.rasterize(path, bytes(payload))
            except (ValueError, NotImplementedError) as exc:
                # Poison-pill contract (same as ImageStats / media_dims):
                # one stray .txt or truncated scan in a 10^8-file tree must
                # not abort the distributed ingest. 'raise' keeps strict
                # runs strict; NotImplementedError (a gated backend on a
                # machine without its dependency) stays fatal there too.
                if self.on_error == "raise":
                    raise
                self.n_skipped += 1
                logging.getLogger(__name__).warning(
                    "ingest_files: skipping %s (%s); %d skipped by this worker",
                    path, exc, self.n_skipped,
                )
                continue
            spans = []
            for page_no, page in enumerate(pages):
                ref = f"media/{doc_id}/p{page_no}.png"
                out_path = os.path.join(self.media_root, ref)
                os.makedirs(os.path.dirname(out_path), exist_ok=True)
                tmp = out_path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(png.encode_gray(page))
                os.replace(tmp, out_path)  # idempotent on re-run
                spans.append(
                    {"kind": "media", "text": "", "media_ref": ref, "offset": page_no}
                )
            rows.append({"doc_id": doc_id, "spans": spans})
        return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)


def ingest_files(
    input_dir: str,
    corpus_dir: str,
    dpi: int = 300,
    concurrency: tuple[int, int] | None = None,
    on_error: str = "skip",
) -> ray.data.Dataset:
    """Distributed raw-file ingestion: every PDF/image under ``input_dir``
    becomes one interleaved document whose pages live in ``corpus_dir``'s
    media store. Returns the (doc_id, spans) Dataset — write it with
    ``ds.write_parquet(corpus_dir + '/documents.parquet')`` to complete a
    corpus the extraction pipeline can run on.

    ``on_error='skip'`` (default) skips unsupported extensions and
    undecodable payloads with a counted warning — the repo's degrade-
    don't-die contract; pass ``'raise'`` for strict runs where any
    unreadable input should abort."""
    if concurrency is None:
        from ..util import cluster_cpus

        cpus = cluster_cpus()
        concurrency = (max(1, cpus - 4), max(2, cpus))
    files = ray.data.read_binary_files(input_dir, include_paths=True)
    return files.map_batches(
        IngestFiles,
        fn_constructor_kwargs={
            "media_root": corpus_dir,
            "dpi": dpi,
            "on_error": on_error,
        },
        concurrency=concurrency,
        batch_size=4,  # pages are large; keep payload batches small
        batch_format="numpy",
    )
