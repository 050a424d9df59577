"""Ray Data pipeline stages (SURVEY.md §4.2 physical plan).

Every stage is a batch transform over the unified work-row stream (one
Arrow-typed schema from explode to assembly), so interleaved text spans flow
through the same streaming pipeline as media spans with zero extra passes
over the input. Stateful stages (OCR) are callable classes used as
map_batches actor pools; pure stages are stateless functions.
"""

from .explode import WORK_SCHEMA, empty_work_table, explode_spans, work_table
from .decode import DecodePages
from .detect import detect_tables
from .grid import grid_to_cells
from .ocr_stage import OcrCells
from .assemble import (
    RESULT_SCHEMA,
    SERIALIZED_SCHEMA,
    assemble_doc,
    explode_result_spans,
    serialize_tables,
)

__all__ = [
    "WORK_SCHEMA",
    "RESULT_SCHEMA",
    "empty_work_table",
    "work_table",
    "explode_spans",
    "DecodePages",
    "detect_tables",
    "grid_to_cells",
    "OcrCells",
    "assemble_doc",
    "serialize_tables",
    "SERIALIZED_SCHEMA",
    "explode_result_spans",
]
