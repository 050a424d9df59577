"""Training-annotation readers as distributed sources.

The reference parses PascalVOC XML annotations single-file-at-a-time for
model training (``table_extraction/transformer/src/table_datasets.py:24-56``
read_pascal_voc). Here the same parse is a Ray Data source: one task per
annotation file via ``read_binary_files``, emitting one row per labeled box
— the table a training-data pipeline joins against its image corpus.

Schema: (filename: string, label: string, xmin, ymin, xmax, ymax: int32).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import pyarrow as pa
import ray.data

BOX_SCHEMA = pa.schema(
    [
        ("filename", pa.string()),
        ("label", pa.string()),
        ("xmin", pa.int32()),
        ("ymin", pa.int32()),
        ("xmax", pa.int32()),
        ("ymax", pa.int32()),
    ]
)


def parse_pascal_voc(xml_bytes: bytes, source_name: str = "") -> list[dict]:
    """One annotation XML -> box rows (reference semantics: float coords in
    the XML truncate through int(float(...)), one row per <object>)."""
    root = ET.fromstring(xml_bytes)
    fn_el = root.find("filename")
    filename = fn_el.text if fn_el is not None and fn_el.text else source_name
    rows = []
    for obj in root.iter("object"):
        name = obj.find("name")
        box = obj.find("bndbox")
        if name is None or box is None:
            continue

        def coord(tag: str) -> int:
            el = box.find(tag)
            return int(float(el.text)) if el is not None and el.text else 0

        rows.append(
            {
                "filename": filename,
                "label": name.text or "",
                "xmin": coord("xmin"),
                "ymin": coord("ymin"),
                "xmax": coord("xmax"),
                "ymax": coord("ymax"),
            }
        )
    return rows


def read_pascal_voc(annotations_dir: str) -> ray.data.Dataset:
    """Directory of PascalVOC XMLs -> Dataset of box rows (one read task
    per file; parse inside the task)."""

    def parse_batch(batch: dict) -> pa.Table:
        rows: list[dict] = []
        for path, data in zip(batch["path"], batch["bytes"]):
            rows.extend(parse_pascal_voc(bytes(data), os.path.basename(path)))
        return pa.Table.from_pylist(rows, schema=BOX_SCHEMA)

    files = ray.data.read_binary_files(annotations_dir, include_paths=True)
    return files.map_batches(parse_batch, batch_format="numpy")
