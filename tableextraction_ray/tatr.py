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
    container_objects: list[dict],
    package_objects: list[dict],
    overlap_threshold: float = 0.5,
    unique_assignment: bool = True,
    forced_assignment: bool = False,
) -> tuple[list[list[int]], list[list[int]], list[float]]:
    """Slot each package into the container holding the largest fraction
    of it (reference eval_utils.py:226-281): the best container gets the
    package only when that fraction meets ``overlap_threshold`` — or
    unconditionally under ``forced_assignment``; non-unique assignment
    additionally slots into every container over the threshold. Returns
    ``(container_assignments, package_assignments, best_match_scores)``
    exactly like the reference (ties break to the first container, the
    reference's stable score-descending sort)."""
    return slot_by_best_overlap(
        container_objects,
        package_objects,
        overlap_threshold=overlap_threshold,
        unique_assignment=unique_assignment,
        forced_assignment=forced_assignment,
    )


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
        # reference eval_utils.py:881-887 slots text spans into cells at
        # overlap_threshold=0.001, unique.
        slots, _, _ = slot_into_containers(
            cells, tokens, overlap_threshold=0.001, unique_assignment=True
        )
        for cell, idxs in zip(cells, slots):
            cell["text"] = extract_text_from_spans([tokens[i] for i in idxs])
    return cells


# --------------------------------------------------------------------------
# Structure refinement / alignment (reference eval_utils.py:166-192 refine,
# 400-412 sorts, 414-443 align rows/columns, 489-543 customizable nms,
# 546-594 align_headers, 598-714 align_supercells, 717-744 nms_supercells,
# 747-775 header_supercell_tree, 950-1001 remove_supercell_overlap) —
# reimplemented from the published Table-Transformer semantics. All pure
# and per-table local; objects are the same plain dicts as above, with
# supercells gaining ``row_numbers`` / ``column_numbers`` once aligned.
# Divergences from the reference (documented, deliberate):
# - bboxes are tuples; functions return new dicts instead of mutating
#   caller lists in place (align_headers/align_supercells still set the
#   ``header`` flag on the row dicts they are given, as callers rely on it);
# - refine_rows/columns skip the token-containment NMS when no tokens are
#   supplied (the reference suppresses every row but the top-scoring one on
#   token-less input — an artifact of slotting zero packages).
# --------------------------------------------------------------------------


def sort_objects_by_score(objects: list[dict], reverse: bool = True) -> list[dict]:
    sign = -1 if reverse else 1
    return sorted(objects, key=lambda o: sign * o["score"])


def sort_objects_left_to_right(objects: list[dict]) -> list[dict]:
    """Order by horizontal center (x1 + x2)."""
    return sorted(objects, key=lambda o: o["bbox"][0] + o["bbox"][2])


def sort_objects_top_to_bottom(objects: list[dict]) -> list[dict]:
    """Order by vertical center (y1 + y2)."""
    return sorted(objects, key=lambda o: o["bbox"][1] + o["bbox"][3])


def overlaps(b1: Box, b2: Box, threshold: float = 0.5) -> bool:
    """True when more than ``threshold`` of b1's area lies inside b2."""
    a1 = area(b1)
    return a1 > 0 and area(intersect(b1, b2)) / a1 >= threshold


def slot_by_best_overlap(
    containers: list[dict],
    packages: list[dict],
    overlap_threshold: float = 0.5,
    unique_assignment: bool = True,
    forced_assignment: bool = False,
) -> tuple[list[list[int]], list[list[int]], list[float]]:
    """Threshold-aware slotting (reference slot_into_containers, 226-281):
    each package goes to the container holding the largest fraction of it,
    only when that fraction meets ``overlap_threshold`` (or always, under
    ``forced_assignment``); non-unique assignment adds every container over
    the threshold. Returns (container_assignments, package_assignments,
    best_match_scores)."""
    container_assignments: list[list[int]] = [[] for _ in containers]
    package_assignments: list[list[int]] = [[] for _ in packages]
    best_scores: list[float] = []
    if not containers or not packages:
        return container_assignments, package_assignments, best_scores
    for pi, pkg in enumerate(packages):
        scores = sorted(
            ((iob(pkg["bbox"], c["bbox"]), -ci) for ci, c in enumerate(containers)),
            reverse=True,
        )
        best, neg_ci = scores[0]
        best_scores.append(best)
        if forced_assignment or best >= overlap_threshold:
            container_assignments[-neg_ci].append(pi)
            package_assignments[pi].append(-neg_ci)
        if not unique_assignment:
            for sc, nci in scores[1:]:
                if sc >= overlap_threshold:
                    container_assignments[-nci].append(pi)
                    package_assignments[pi].append(-nci)
                else:
                    break
    return container_assignments, package_assignments, best_scores


def nms_by_shared_containment(
    container_objects: list[dict],
    package_objects: list[dict],
    overlap_threshold: float = 0.5,
) -> list[dict]:
    """Containment NMS (reference nms_by_containment, 194-223): containers
    score-descending; suppress one that holds no packages, or shares any
    package with a higher-scoring surviving container. (The top-scoring
    container survives even when empty — reference behavior.)"""
    containers = sort_objects_by_score(container_objects)
    assignments, _, _ = slot_by_best_overlap(
        containers, package_objects, overlap_threshold, unique_assignment=True
    )
    suppression = [False] * len(containers)
    for j in range(1, len(containers)):
        pkgs_j = set(assignments[j])
        if not pkgs_j:
            suppression[j] = True
            continue
        for i in range(j):
            if not suppression[i] and pkgs_j & set(assignments[i]):
                suppression[j] = True
                break
    return [c for c, s in zip(containers, suppression) if not s]


def remove_objects_without_content(
    tokens: list[dict], objects: list[dict]
) -> list[dict]:
    """Keep only objects whose bbox contains some token text (reference
    295-303; pure — returns the kept list)."""
    kept = []
    for obj in objects:
        inside = [t for t in tokens if overlaps(t["bbox"], obj["bbox"], 0.5)]
        if extract_text_from_spans(inside).strip():
            kept.append(obj)
    return kept


def refine_rows(rows: list[dict], tokens: list[dict] | None = None) -> list[dict]:
    """Reference refine_rows (166-177): token-containment NMS + empty-row
    removal (when tokens are given), then top-to-bottom order."""
    if tokens:
        rows = nms_by_shared_containment(rows, tokens, 0.5)
        rows = remove_objects_without_content(tokens, rows)
    if len(rows) > 1:
        rows = sort_objects_top_to_bottom(rows)
    return rows


def refine_columns(columns: list[dict], tokens: list[dict] | None = None) -> list[dict]:
    """Reference refine_columns (180-192): same as refine_rows, ordered
    left-to-right."""
    if tokens:
        columns = nms_by_shared_containment(columns, tokens, 0.5)
        columns = remove_objects_without_content(tokens, columns)
    if len(columns) > 1:
        columns = sort_objects_left_to_right(columns)
    return columns


def align_columns(columns: list[dict], bbox: Box) -> list[dict]:
    """Stretch every column vertically to the table bbox (reference 414-428)."""
    return [
        {**c, "bbox": (c["bbox"][0], bbox[1], c["bbox"][2], bbox[3])}
        for c in columns
    ]


def align_rows(rows: list[dict], bbox: Box) -> list[dict]:
    """Stretch every row horizontally to the table bbox (reference 430-443)."""
    return [
        {**r, "bbox": (bbox[0], r["bbox"][1], bbox[2], r["bbox"][3])}
        for r in rows
    ]


def nms_overlap(
    objects: list[dict],
    match_criteria: str = "object2_overlap",
    match_threshold: float = 0.05,
    keep_metric: str = "score",
    keep_higher: bool = True,
) -> list[dict]:
    """The reference's customizable NMS (489-543): label-agnostic; by
    default suppress a lower-confidence object whose area overlaps a kept
    higher-confidence one by more than 5%."""
    if not objects:
        return []
    if keep_metric == "score":
        objs = sort_objects_by_score(objects, reverse=keep_higher)
    elif keep_metric == "area":
        objs = sorted(
            objects, key=lambda o: (-area(o["bbox"]) if keep_higher else area(o["bbox"]))
        )
    else:
        raise ValueError(f"unknown keep_metric {keep_metric!r}")
    suppression = [False] * len(objs)
    for j in range(1, len(objs)):
        aj = area(objs[j]["bbox"])
        for i in range(j):
            if suppression[i]:
                continue
            ai = area(objs[i]["bbox"])
            inter = area(intersect(objs[i]["bbox"], objs[j]["bbox"]))
            if match_criteria == "object1_overlap":
                denom = ai
            elif match_criteria == "object2_overlap":
                denom = aj
            elif match_criteria == "iou":
                denom = ai + aj - inter
            else:
                raise ValueError(f"unknown match_criteria {match_criteria!r}")
            if denom > 0 and inter / denom >= match_threshold:
                suppression[j] = True
                break
    return [o for o, s in zip(objs, suppression) if not s]


def _hull(b1: Box | None, b2: Box) -> Box:
    if b1 is None:
        return b2
    return (min(b1[0], b2[0]), min(b1[1], b2[1]), max(b1[2], b2[2]), max(b1[3], b2[3]))


def align_headers(headers: list[dict], rows: list[dict]) -> list[dict]:
    """Reference align_headers (546-594): the header becomes the convex
    hull of the consecutive top run of rows it vertically overlaps >= 50%
    of (rows above the first overlapped row are pulled in — the reference's
    top-extension quirk); those rows get ``header=True`` (set in place);
    everything past the first gap is dropped (single-header rule)."""
    for row in rows:
        row["header"] = False
    header_row_nums: list[int] = []
    for header in headers:
        for row_num, row in enumerate(rows):
            row_height = row["bbox"][3] - row["bbox"][1]
            overlap_h = min(row["bbox"][3], header["bbox"][3]) - max(
                row["bbox"][1], header["bbox"][1]
            )
            if row_height > 0 and overlap_h / row_height >= 0.5:
                header_row_nums.append(row_num)
    if not header_row_nums:
        return []
    if header_row_nums[0] > 0:
        header_row_nums = list(range(header_row_nums[0] + 1)) + header_row_nums
    rect: Box | None = None
    last = -1
    for row_num in header_row_nums:
        if row_num != last + 1:
            break  # gap -> ignore further (multi-header unsupported)
        rows[row_num]["header"] = True
        rect = _hull(rect, rows[row_num]["bbox"])
        last = row_num
    return [{"bbox": rect}]


def align_supercells(
    supercells: list[dict], rows: list[dict], columns: list[dict]
) -> list[dict]:
    """Reference align_supercells (598-714): snap each supercell to the
    rows/columns it overlaps >= 50% of (span/projected-row-header cells use
    the laxer max(row, supercell) fraction; header span cells halve the
    column bar), forbid spanning the header boundary (drop the smaller row
    group), require >= 2 covered grid positions, and propagate header span
    cells upward one single-row copy per header row above them."""
    aligned: list[dict] = []
    for sc0 in supercells:
        sc = dict(sc0)
        sc["header"] = False
        header_rows: set[int] = set()
        data_rows: set[int] = set()
        sc_h = sc["bbox"][3] - sc["bbox"][1]
        for rn, row in enumerate(rows):
            rh = row["bbox"][3] - row["bbox"][1]
            ov = min(row["bbox"][3], sc["bbox"][3]) - max(row["bbox"][1], sc["bbox"][1])
            if rh <= 0:
                continue
            frac = max(ov / rh, ov / sc_h) if ("span" in sc and sc_h > 0) else ov / rh
            if frac >= 0.5:
                (header_rows if row.get("header") else data_rows).add(rn)
        if header_rows and data_rows:
            # A supercell cannot cross the header boundary: keep the larger
            # group (ties keep the header side, as in the reference).
            if len(data_rows) > len(header_rows):
                header_rows = set()
            else:
                data_rows = set()
        sc["header"] = bool(header_rows)
        if not sc["header"] and "span" in sc:
            continue  # span supercells must live in the header
        row_nums = sorted(header_rows | data_rows)
        row_rect: Box | None = None
        for rn in row_nums:
            row_rect = _hull(row_rect, rows[rn]["bbox"])
        if row_rect is None:
            continue
        col_nums: list[int] = []
        col_rect: Box | None = None
        sc_w = sc["bbox"][2] - sc["bbox"][0]
        for cn, col in enumerate(columns):
            cw = col["bbox"][2] - col["bbox"][0]
            ov = min(col["bbox"][2], sc["bbox"][2]) - max(col["bbox"][0], sc["bbox"][0])
            if cw <= 0:
                continue
            if "span" in sc and sc_w > 0:
                frac = max(ov / cw, ov / sc_w)
                if sc["header"]:
                    frac *= 2  # effective threshold 0.25 for header spans
            else:
                frac = ov / cw
            if frac >= 0.5:
                col_nums.append(cn)
                col_rect = _hull(col_rect, col["bbox"])
        if col_rect is None:
            continue
        sc["bbox"] = intersect(row_rect, col_rect)
        if row_nums and col_nums and (len(row_nums) > 1 or len(col_nums) > 1):
            sc["row_numbers"] = row_nums
            sc["column_numbers"] = col_nums
            aligned.append(sc)
            if "span" in sc and sc["header"] and len(col_nums) > 1:
                # Header span cells imply (propagated) single-row span
                # cells in every header row above them.
                for rn in range(0, min(row_nums)):
                    span_cols = [columns[c] for c in col_nums]
                    bbox = (
                        min(c["bbox"][0] for c in span_cols),
                        min(rows[r]["bbox"][1] for r in row_nums),
                        max(c["bbox"][2] for c in span_cols),
                        max(rows[r]["bbox"][3] for r in row_nums),
                    )
                    aligned.append(
                        {
                            "row_numbers": [rn],
                            "column_numbers": list(col_nums),
                            "score": sc["score"],
                            "propagated": True,
                            "header": True,
                            "bbox": bbox,
                        }
                    )
    return aligned


def remove_supercell_overlap(supercell1: dict, supercell2: dict) -> None:
    """Reference 950-1001: shrink the LOWER-confidence supercell2 one
    row/column at a time (whichever removes fewer grid cells) until it no
    longer shares a grid position with supercell1. Mutates supercell2."""
    common_rows = set(supercell1["row_numbers"]) & set(supercell2["row_numbers"])
    common_cols = set(supercell1["column_numbers"]) & set(supercell2["column_numbers"])
    while common_rows and common_cols:
        if len(supercell2["row_numbers"]) < len(supercell2["column_numbers"]):
            min_c, max_c = min(supercell2["column_numbers"]), max(supercell2["column_numbers"])
            if max_c in common_cols:
                common_cols.remove(max_c)
                supercell2["column_numbers"].remove(max_c)
            elif min_c in common_cols:
                common_cols.remove(min_c)
                supercell2["column_numbers"].remove(min_c)
            else:
                supercell2["column_numbers"] = []
                common_cols = set()
        else:
            min_r, max_r = min(supercell2["row_numbers"]), max(supercell2["row_numbers"])
            if max_r in common_rows:
                common_rows.remove(max_r)
                supercell2["row_numbers"].remove(max_r)
            elif min_r in common_rows:
                common_rows.remove(min_r)
                supercell2["row_numbers"].remove(min_r)
            else:
                supercell2["row_numbers"] = []
                common_rows = set()


def nms_supercells(supercells: list[dict]) -> list[dict]:
    """Reference 717-744: score-descending; shrink each lower-confidence
    supercell out of every kept one's grid footprint, suppressing it when
    it no longer spans (>= 2 positions in some direction)."""
    supercells = [dict(sc) for sc in sort_objects_by_score(supercells)]
    for sc in supercells:
        sc["row_numbers"] = list(sc["row_numbers"])
        sc["column_numbers"] = list(sc["column_numbers"])
    suppression = [False] * len(supercells)
    for j in range(1, len(supercells)):
        for i in range(j):
            remove_supercell_overlap(supercells[i], supercells[j])
        sc = supercells[j]
        if (
            (len(sc["row_numbers"]) < 2 and len(sc["column_numbers"]) < 2)
            or not sc["row_numbers"]
            or not sc["column_numbers"]
        ):
            suppression[j] = True
    return [sc for sc, s in zip(supercells, suppression) if not s]


def header_supercell_tree(supercells: list[dict]) -> list[dict]:
    """Reference 747-775: header supercells must form a tree — a cell whose
    column span is not covered by EXACTLY ONE ancestor supercell in every
    row above it has multiple (or missing) parents and is eliminated.
    Pure variant: returns the surviving supercell list (reference mutates)."""
    kept_ids = {id(sc) for sc in supercells}
    header_scs = sort_objects_by_score([sc for sc in supercells if sc.get("header")])
    for sc in header_scs:
        ancestors_by_row: dict[int, int] = {}
        min_row = min(sc["row_numbers"])
        # Ancestors are counted over the ORIGINAL header snapshot — a
        # supercell already eliminated in an earlier iteration still counts
        # (reference behavior: the loop reads header_supercells, removal
        # happens only in the output list).
        for sc2 in header_scs:
            if max(sc2["row_numbers"]) < min_row and set(
                sc["column_numbers"]
            ).issubset(set(sc2["column_numbers"])):
                for r2 in sc2["row_numbers"]:
                    ancestors_by_row[r2] = ancestors_by_row.get(r2, 0) + 1
        for row in range(0, min_row):
            if ancestors_by_row.get(row, 0) != 1:
                kept_ids.discard(id(sc))
                break
    return [sc for sc in supercells if id(sc) in kept_ids]


DEFAULT_STRUCTURE_THRESHOLDS = {
    "table row": 0.5,
    "table column": 0.5,
    "table column header": 0.5,
    "table spanning cell": 0.5,
    "table projected row header": 0.5,
}


def refine_table_structures(
    table_bbox: Box,
    table_structures: dict[str, list[dict]],
    tokens: list[dict] | None = None,
    class_thresholds: dict[str, float] | None = None,
) -> dict[str, list[dict]]:
    """Reference refine_table_structures (446-487): threshold + NMS + align
    headers to their row run, split supercells into span/subheader groups,
    align them to the grid, resolve overlaps, and prune non-tree header
    supercells."""
    th = {**DEFAULT_STRUCTURE_THRESHOLDS, **(class_thresholds or {})}
    rows = table_structures["rows"]
    columns = table_structures["columns"]
    headers = [
        h
        for h in table_structures.get("headers", [])
        if h["score"] >= th["table column header"]
    ]
    headers = nms_overlap(headers)
    headers = align_headers(headers, rows)
    raw_sc = table_structures.get("supercells", [])
    spans = [
        sc
        for sc in raw_sc
        if not sc.get("subheader") and sc["score"] >= th["table spanning cell"]
    ]
    subheaders = [
        sc
        for sc in raw_sc
        if sc.get("subheader") and sc["score"] >= th["table projected row header"]
    ]
    supercells = align_supercells(spans + subheaders, rows, columns)
    supercells = nms_supercells(supercells)
    supercells = header_supercell_tree(supercells)
    return {
        "rows": rows,
        "columns": columns,
        "headers": headers,
        "supercells": supercells,
    }


def objects_to_structures_refined(
    objects: list[dict],
    tokens: list[dict] | None = None,
    class_thresholds: dict[str, float] | None = None,
) -> dict[str, list[dict]]:
    """The full reference pipeline (objects_to_table_structures, 79-163):
    label split (span supercells marked ``span``, projected row headers
    ``subheader``), header flags on rows, token-based row/column
    refinement, table bbox shrink to the row/column hulls, row/column
    alignment to it, then the refine_table_structures pass. Robust to
    noisy/overlapping detections where the plain ``objects_to_structures``
    grid assumes clean input."""
    rows = [dict(o) for o in objects if o["label"] == "table row"]
    columns = [dict(o) for o in objects if o["label"] == "table column"]
    headers = [dict(o) for o in objects if o["label"] == "table column header"]
    supercells = [
        {**o, "span": True, "subheader": False}
        for o in objects
        if o["label"] == "table spanning cell"
    ]
    supercells += [
        {**o, "subheader": True}
        for o in objects
        if o["label"] == "table projected row header"
    ]
    for r in rows:
        r["header"] = any(iob(r["bbox"], h["bbox"]) >= 0.5 for h in headers)
    rows = refine_rows(rows, tokens)
    columns = refine_columns(columns, tokens)
    if not rows or not columns:
        return {"rows": rows, "columns": columns, "headers": [], "supercells": []}
    row_rect: Box | None = None
    for r in rows:
        row_rect = _hull(row_rect, r["bbox"])
    col_rect: Box | None = None
    for c in columns:
        col_rect = _hull(col_rect, c["bbox"])
    table_bbox = (col_rect[0], row_rect[1], col_rect[2], row_rect[3])
    columns = align_columns(columns, table_bbox)
    rows = align_rows(rows, table_bbox)
    structures = {
        "rows": rows,
        "columns": columns,
        "headers": headers,
        "supercells": supercells,
    }
    if rows and len(columns) > 1:
        structures = refine_table_structures(
            table_bbox, structures, tokens, class_thresholds
        )
    else:
        # Refinement skipped (degenerate grid — the reference's
        # len(columns) > 1 gate): supercells were never aligned, so they
        # carry no row/column numbers; drop them rather than emit raw boxes.
        structures["supercells"] = []
    return structures


def refined_structure_to_cells(
    structure: dict[str, list[dict]], tokens: list[dict] | None = None
) -> list[dict]:
    """Grid cells from a REFINED structure: supercells already carry
    row_numbers/column_numbers, so merges use them directly instead of the
    bbox-IoB re-derivation in ``structure_to_cells``."""
    rows, cols = structure["rows"], structure["columns"]
    merged: dict[tuple[int, int], tuple[int, int]] = {}
    for sc in structure.get("supercells", []):
        covered = [
            (ri, ci)
            for ri in sc["row_numbers"]
            for ci in sc["column_numbers"]
            if ri < len(rows) and ci < len(cols)
        ]
        if covered:
            anchor = min(covered)
            for pos in covered:
                merged.setdefault(pos, anchor)
    grid: dict[tuple[int, int], dict] = {}
    for ri, r in enumerate(rows):
        for ci, c in enumerate(cols):
            anchor = merged.get((ri, ci), (ri, ci))
            box = intersect(r["bbox"], c["bbox"])
            if anchor in grid:
                if (ri, ci) != anchor:
                    grid[anchor]["bbox"] = _hull(grid[anchor]["bbox"], box)
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
        # reference eval_utils.py:881-887 slots text spans into cells at
        # overlap_threshold=0.001, unique.
        slots, _, _ = slot_into_containers(
            cells, tokens, overlap_threshold=0.001, unique_assignment=True
        )
        for cell, idxs in zip(cells, slots):
            cell["text"] = extract_text_from_spans([tokens[i] for i in idxs])
    return cells


def table_confidence_score(
    cells: list[dict], table_spans: list[dict]
) -> float:
    """Reference eval_utils.py:856-864: confidence that the model's cell
    layout explains the page tokens — slot the spans into the cells at the
    DEFAULT overlap threshold (0.5) and return (mean + min)/2 of the
    per-span best-match scores; 0.0 when either side is empty (the
    reference's bare-except fallback)."""
    _, _, scores = slot_into_containers(cells, table_spans)
    if not scores:
        return 0.0
    return (sum(scores) / len(scores) + min(scores)) / 2


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
