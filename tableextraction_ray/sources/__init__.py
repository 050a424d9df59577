"""Dataset sources for the engine's storage layouts."""

from .annotations import parse_pascal_voc, read_coco, read_pascal_voc, voc_to_coco
from .corpus import (
    read_documents,
    read_documents_csv,
    read_documents_jsonl,
    read_documents_lance,
    read_golden,
)
from .media import read_media
from .rasterize import FileRasterizer, ingest_files
from .tokens import PdfTokenExtractor, read_page_tokens, tokens_for_page

__all__ = [
    "FileRasterizer",
    "ingest_files",
    "parse_pascal_voc",
    "read_pascal_voc",
    "read_coco",
    "voc_to_coco",
    "read_documents",
    "read_documents_csv",
    "read_documents_jsonl",
    "read_documents_lance",
    "read_golden",
    "read_media",
]
