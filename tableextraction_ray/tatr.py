"""TATR-style structure post-processing: detections -> grid -> cells -> text.

The richer structure-recognition semantics the reference's DETR path uses
(SURVEY.md §2.10; reference surface
``/root/reference/table_extraction/transformer/src/eval_utils.py:35-49
(iou/iob), 17-32 (class thresholds), 194-223/489-543 (nms), 226-281
(slotting), 79-163 (objects->structures), 778-947 (structure->cells),
340-397 (span text)``) — reimplemented from scratch against the published
Table-Transformer semantics, as the library behind the engine's ``tatr``
detector backend. Detections are plain dicts ``{bbox: (x1,y1,x2,y2),
label: str, score: float}``; tokens are ``{bbox, text, span_num, line_num,
block_num}``.

Everything here is pure and per-table local: inside the engine it runs
within a single map_batches stage, never across a shuffle boundary.
"""

from __future__ import annotations

Box = tuple[float, float, float, float]


def area(b: Box) -> float:
    return max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])


def intersect(b1: Box, b2: Box) -> Box:
    return (
        max(b1[0], b2[0]),
        max(b1[1], b2[1]),
        min(b1[2], b2[2]),
        min(b1[3], b2[3]),
    )


def iou(b1: Box, b2: Box) -> float:
    """Intersection over union of two boxes."""
    inter = area(intersect(b1, b2))
    union = area(b1) + area(b2) - inter
    return inter / union if union > 0 else 0.0


def iob(b1: Box, b2: Box) -> float:
    """Intersection over the area of box1 — containment of b1 in b2."""
    a1 = area(b1)
    return area(intersect(b1, b2)) / a1 if a1 > 0 else 0.0


def apply_class_thresholds(
    objects: list[dict], thresholds: dict[str, float]
) -> list[dict]:
    """Keep detections whose score meets their class threshold (missing
    class -> keep)."""
    return [
        o
        for o in objects
        if o["score"] >= thresholds.get(o["label"], float("-inf"))
    ]


def nms(objects: list[dict], iou_threshold: float = 0.5) -> list[dict]:
    """Greedy score-descending suppression of same-label overlaps."""
    kept: list[dict] = []
    for o in sorted(objects, key=lambda x: -x["score"]):
        if all(
            o["label"] != k["label"] or iou(o["bbox"], k["bbox"]) < iou_threshold
            for k in kept
        ):
            kept.append(o)
    return kept


def nms_by_containment(
    objects: list[dict], iob_threshold: float = 0.5
) -> list[dict]:
    """Suppress a detection when it is mostly contained in a
    higher-scoring one (same label)."""
    kept: list[dict] = []
    for o in sorted(objects, key=lambda x: -x["score"]):
        if all(
            o["label"] != k["label"]
            or iob(o["bbox"], k["bbox"]) < iob_threshold
            for k in kept
        ):
            kept.append(o)
    return kept


def slot_into_containers(
    containers: list[dict], tokens: list[dict], unique: bool = True
) -> list[list[int]]:
    """Assign each token to the container(s) with the highest bbox overlap
    (IoB of the token in the container). ``unique`` -> best container only;
    zero-overlap tokens stay unassigned. Returns per-container token-index
    lists."""
    slots: list[list[int]] = [[] for _ in containers]
    for ti, tok in enumerate(tokens):
        overlaps = [iob(tok["bbox"], c["bbox"]) for c in containers]
        if unique:
            best, best_i = 0.0, -1
            for ci, ov in enumerate(overlaps):
                if ov > best:
                    best, best_i = ov, ci
            if best_i >= 0:
                slots[best_i].append(ti)
        else:
            for ci, ov in enumerate(overlaps):
                if ov > 0:
                    slots[ci].append(ti)
    return slots


def objects_to_structures(
    objects: list[dict],
    class_thresholds: dict[str, float] | None = None,
) -> dict[str, list[dict]]:
    """Split thresholded detections into the structure groups the TATR
    label-space defines, rows sorted top-to-bottom, columns left-to-right;
    a row is marked ``header=True`` when a column-header region contains
    it (IoB >= 0.5)."""
    if class_thresholds:
        objects = apply_class_thresholds(objects, class_thresholds)
    rows = sorted(
        (o for o in objects if o["label"] == "table row"),
        key=lambda o: o["bbox"][1],
    )
    columns = sorted(
        (o for o in objects if o["label"] == "table column"),
        key=lambda o: o["bbox"][0],
    )
    headers = [o for o in objects if o["label"] == "table column header"]
    supercells = [o for o in objects if o["label"] == "table spanning cell"]
    for r in rows:
        r["header"] = any(iob(r["bbox"], h["bbox"]) >= 0.5 for h in headers)
    return {
        "rows": rows,
        "columns": columns,
        "headers": headers,
        "supercells": nms_by_containment(supercells),
    }


def structure_to_cells(
    structure: dict[str, list[dict]], tokens: list[dict] | None = None
) -> list[dict]:
    """Row x column intersection grid -> cell dicts ``{bbox, row, col,
    header, text}``; spanning cells merge their covered grid positions
    (IoB >= 0.5 with the supercell) into one cell anchored at the min
    (row, col). Token text joins in span order."""
    rows, cols = structure["rows"], structure["columns"]
    supercells = structure.get("supercells", [])
    grid: dict[tuple[int, int], dict] = {}
    merged: dict[tuple[int, int], tuple[int, int]] = {}
    for sc in supercells:
        covered = [
            (ri, ci)
            for ri, r in enumerate(rows)
            for ci, c in enumerate(cols)
            if iob(intersect(r["bbox"], c["bbox"]), sc["bbox"]) >= 0.5
        ]
        if covered:
            anchor = min(covered)
            for pos in covered:
                merged[pos] = anchor
    for ri, r in enumerate(rows):
        for ci, c in enumerate(cols):
            anchor = merged.get((ri, ci), (ri, ci))
            box = intersect(r["bbox"], c["bbox"])
            if anchor in grid:
                if (ri, ci) != anchor:
                    b = grid[anchor]["bbox"]
                    grid[anchor]["bbox"] = (
                        min(b[0], box[0]),
                        min(b[1], box[1]),
                        max(b[2], box[2]),
                        max(b[3], box[3]),
                    )
            elif anchor == (ri, ci):
                grid[anchor] = {
                    "bbox": box,
                    "row": ri,
                    "col": ci,
                    "header": bool(r.get("header")),
                    "text": "",
                }
    cells = [grid[k] for k in sorted(grid)]
    if tokens:
        slots = slot_into_containers(cells, tokens, unique=True)
        for cell, idxs in zip(cells, slots):
            cell["text"] = extract_text_from_spans([tokens[i] for i in idxs])
    return cells


def extract_text_from_spans(spans: list[dict]) -> str:
    """Join token spans in reading order (block, line, span), hyphen-aware:
    a span ending in '-' joins the next span with no space (the reference's
    line-join rule, eval_utils.py:340-397)."""
    ordered = sorted(
        spans,
        key=lambda s: (
            s.get("block_num", 0),
            s.get("line_num", 0),
            s.get("span_num", 0),
        ),
    )
    out = ""
    for s in ordered:
        text = s["text"]
        if not out:
            out = text
        elif out.endswith("-"):
            out = out[:-1] + text
        else:
            out += " " + text
    return out
