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


# --- COCO (reference table_datasets.py:331-455 PDFTablesDataset) ----------

COCO_SCHEMA = pa.schema(
    [
        ("image_id", pa.int64()),
        ("ann_id", pa.int64()),
        ("filename", pa.string()),
        ("category_id", pa.int32()),
        ("x", pa.int32()),
        ("y", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("area", pa.int64()),
        ("iscrowd", pa.int32()),
    ]
)

#: reference src/main.py:141-154 get_class_map('detection')
DETECTION_CLASS_MAP = {"table": 0, "table rotated": 1, "no object": 2}


def _stable_id(key: str) -> int:
    """Deterministic 63-bit id from a string key (md5 low bits). The
    reference enumerates page_ids into sequential ids on one machine
    (table_datasets.py:406-441); at 10^8+ images a global enumeration is a
    needless all-to-all, so ids are content-derived — stable across runs,
    partitionings and cluster sizes."""
    import hashlib

    return int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big") >> 1


def voc_to_coco(
    boxes: ray.data.Dataset, class_map: dict[str, int] | None = None
) -> ray.data.Dataset:
    """PascalVOC box rows -> COCO-style annotation rows (the distributed
    twin of PDFTablesDataset(make_coco=True), table_datasets.py:405-443):
    bbox becomes (x, y, width, height), area = width * height, iscrowd=0,
    labels outside the class map (and the 'no object' class) are dropped.
    Pure per-row transform — no shuffle, no driver materialization;
    image_id/ann_id are stable content hashes (see _stable_id)."""
    cmap = dict(class_map or DETECTION_CLASS_MAP)
    no_object = cmap.get("no object")
    keep = {name: cid for name, cid in cmap.items() if cid != no_object}

    def to_coco(batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.to_pylist():
            cid = keep.get(r["label"])
            if cid is None:
                continue
            w = r["xmax"] - r["xmin"]
            h = r["ymax"] - r["ymin"]
            # ann_id from CONTENT (filename + label + bbox), never a batch
            # sequence counter: one file's boxes split across batches would
            # restart a counter and collide/shift with partitioning. Exact
            # duplicate annotations (same file, label AND bbox) collapse to
            # one id — they are semantically one annotation.
            ann_key = (
                f"{r['filename']}#{r['label']}#"
                f"{r['xmin']},{r['ymin']},{r['xmax']},{r['ymax']}"
            )
            rows.append(
                {
                    "image_id": _stable_id(r["filename"]),
                    "ann_id": _stable_id(ann_key),
                    "filename": r["filename"],
                    "category_id": cid,
                    "x": r["xmin"],
                    "y": r["ymin"],
                    "width": w,
                    "height": h,
                    "area": w * h,
                    "iscrowd": 0,
                }
            )
        return pa.Table.from_pylist(rows, schema=COCO_SCHEMA)

    return boxes.map_batches(to_coco, batch_format="pyarrow")


def read_coco(path: str) -> ray.data.Dataset:
    """COCO JSON file(s) -> annotation-row Dataset (COCO_SCHEMA). One read
    task per shard file via read_binary_files; each shard is self-contained
    (its own images/categories sections), so the image-filename and
    category joins happen inside the task that parsed the shard — no
    shuffle. Sharded COCO (one json per image subset) is the layout a
    100 TB annotation store would use; a single monolithic json still
    works as one task."""
    import json

    def parse(batch: dict) -> pa.Table:
        rows = []
        for data in batch["bytes"]:
            doc = json.loads(bytes(data))
            images = {img["id"]: img.get("file_name", "") for img in doc.get("images", [])}
            for ann in doc.get("annotations", []):
                x, y, w, h = (int(v) for v in ann["bbox"])
                rows.append(
                    {
                        "image_id": int(ann["image_id"]),
                        "ann_id": int(ann["id"]),
                        "filename": images.get(ann["image_id"], ""),
                        "category_id": int(ann["category_id"]),
                        "x": x,
                        "y": y,
                        "width": w,
                        "height": h,
                        "area": int(ann.get("area", w * h)),
                        "iscrowd": int(ann.get("iscrowd", 0)),
                    }
                )
        return pa.Table.from_pylist(rows, schema=COCO_SCHEMA)

    files = ray.data.read_binary_files(path)
    return files.map_batches(parse, batch_format="numpy")
