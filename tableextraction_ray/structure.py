"""Per-table structure building: header/record split, nested header tree,
record fill, and the ordered span emission contract.

Reimplements the reference's builder/export semantics:

- group_cells                    ~ ``table_extraction/builder.py:11-57``
- split_into_headers_and_records ~ ``table_extraction/builder.py:60-113``
- create_cell_dict               ~ ``table_extraction/builder.py:268-300``
- build_structure                ~ ``table_extraction/builder.py:335-362``
- fill_structure                 ~ ``table_extraction/builder.py:365-387``
- extract_record_text            ~ ``table_extraction/builder.py:407-426``
- make_serialized_structure      ~ ``table_extraction/export.py:21-74``
- YAML serialization             ~ ``table_extraction/export.py:93-106``

Reference-pinned details: the fixed epsilon=20 px used by row grouping,
header-boundary cut and parent/child adjacency; header cells sorted
``(x, y)`` and record cells ``(y, x)``; record-row text sorted ``(x, y)``;
the positional ``pop(0)`` record fill; and — important — the reference
builds a structure tree for EVERY header cell including ones already
consumed as children (``export.py:52-55``), so child headers re-appear as
trailing top-level trees whose leaves stay unfilled. We reproduce that
faithfully, since it defines the emitted span order.

Documented divergences (SURVEY.md §7.4): a table with no rectangles, no
header cells or no record cells contributes an empty span list (the
reference path would hit an UnboundLocalError at ``export.py:63,73``), and
an inner loop variable in ``make_serialized_structure`` shadows the table
index in the reference (``export.py:65``) without observable effect on the
per-table results we emit.

The span-order contract (FIXTURES.md §3): per table, for each record row
(top to bottom), a pre-order DFS over the header trees in ``(x, y)`` header
order emits the header text then (for filled leaves) the record value.
"""

from __future__ import annotations

import copy
from collections import defaultdict
from typing import Any

Cell = tuple[int, int, int, int]

EPSILON = 20  # fixed pixel tolerance (builder.py:12, :83, :285)


def group_cells(
    cells: list[Cell], epsilon: int = EPSILON
) -> tuple[dict[int, int], list[list[Cell]]]:
    """Group cells into rows by y1 within epsilon of the row's first cell;
    returns ({row_y1: count}, [row cells...]). Sorts the input by y1
    (builder.py:11-57; note the reference compares against the FIRST y1 of
    the group, not a rolling mean)."""
    grouped_dict: dict[int, int] = defaultdict(int)
    grouped_list: list[list[Cell]] = []
    cells = sorted(cells, key=lambda c: c[1])

    current_group: int | None = None
    current_list: list[Cell] = []
    count = 0
    for item in cells:
        if current_group is None:
            current_group = item[1]
            count = 1
            current_list = [item]
        elif abs(item[1] - current_group) <= epsilon:
            count += 1
            current_list.append(item)
        else:
            grouped_dict[int(round(current_group))] = count
            grouped_list.append(current_list)
            current_group = item[1]
            count = 1
            current_list = [item]
    if current_group is not None:
        grouped_dict[int(round(current_group))] = count
        grouped_list.append(current_list)
    return dict(grouped_dict), grouped_list


def split_into_headers_and_records(
    rectangles: list[Cell],
) -> tuple[list[Cell], list[Cell], list[list[Cell]]]:
    """Split cells into header and record cells at the first bottom-up change
    in per-row cell count (builder.py:60-113). Returns (header_cells sorted
    (x, y), record_cells sorted (y, x), record rows grouped by y)."""
    cell_counts, _ = group_cells(rectangles)
    sorted_counts = sorted(cell_counts.items(), reverse=True)

    num_cells = None
    change_y = None
    for y1, count in sorted_counts:
        if num_cells is None:
            num_cells = count
        elif count != num_cells:
            change_y = y1
            break
    if change_y is None:
        change_y = sorted_counts[-1][0]

    record_cells = [c for c in rectangles if c[1] >= change_y + EPSILON]
    _, records_list = group_cells(record_cells)
    record_cells = sorted(record_cells, key=lambda c: (c[1], c[0]))
    header_cells = sorted(
        (c for c in rectangles if c[1] < change_y + EPSILON), key=lambda c: (c[0], c[1])
    )
    return header_cells, record_cells, records_list


def create_cell_dict(cells: list[Cell]) -> dict[Cell, list[Cell]]:
    """Greedy parent->children adjacency over header cells: cell_2 is a child
    of cell_1 if x-contained within +-epsilon and vertically adjacent
    (|y2_1 - y1_2| <= epsilon); consumed children are never re-parented and
    do not get their own entry (builder.py:268-300)."""
    rectangle_dict: dict[Cell, list[Cell]] = {}
    ignore: set[int] = set()
    for i, cell_1 in enumerate(cells):
        if i in ignore:
            continue
        x1a, _y1a, x2a, y2a = cell_1
        children: list[Cell] = []
        for j, cell_2 in enumerate(cells):
            if i == j or j in ignore:
                continue
            x1b, y1b, x2b, _y2b = cell_2
            if (x1a - EPSILON <= x1b < x2b <= x2a + EPSILON) and abs(y2a - y1b) <= EPSILON:
                children.append(cell_2)
                ignore.add(j)
        rectangle_dict[cell_1] = children
    return rectangle_dict


def build_structure(
    cell: Cell,
    rectangle_text_dict: dict[Cell, str],
    header_cell_dict: dict[Cell, list[Cell]],
) -> dict:
    """Recursive ``{text: [children...]}`` tree (builder.py:335-362).
    Missing text maps to None, exactly as the reference's dict.get."""
    text = rectangle_text_dict.get(cell, None)
    node: dict[Any, list] = {text: []}
    for child in header_cell_dict.get(cell, []):
        node[text].append(build_structure(child, rectangle_text_dict, header_cell_dict))
    return node


def fill_structure(structure: list, records_text: list) -> list:
    """DFS through the tree list, replacing empty-list leaves with
    ``records_text.pop(0)`` while values remain (builder.py:365-387).
    Mutates and returns ``structure``; leaves stay ``[]`` once the record
    values run out."""
    if isinstance(structure, list):
        for item in structure:
            for key, value in item.items():
                if isinstance(value, list) and not value:
                    if records_text:
                        item[key] = records_text.pop(0)
                else:
                    fill_structure(value, records_text)
    return structure


def extract_record_text(
    records_list: list[Cell], text_dict: dict[Cell, str]
) -> list[str | None]:
    """Texts of one record row sorted by (x, y); None for cells missing from
    the text map (builder.py:407-426)."""
    ordered = sorted(records_list, key=lambda c: (c[0], c[1]))
    return [text_dict.get(cell, None) for cell in ordered]


def serialize_table(
    rectangles: list[Cell], text_dict: dict[Cell, str]
) -> list[list[dict]]:
    """Per-table list of filled structures, one per record row — the
    reference's ``make_serialized_structure`` body for a single table
    (export.py:39-73). Empty when the table has no cells, no header cells or
    no record cells (divergence note in the module docstring)."""
    if not rectangles:
        return []
    header_cells, record_cells, records_list = split_into_headers_and_records(rectangles)
    if not header_cells or not record_cells:
        return []

    header_cell_dict = create_cell_dict(header_cells)
    structure = [
        build_structure(cell, text_dict, header_cell_dict) for cell in header_cells
    ]
    records_text = [extract_record_text(rec, text_dict) for rec in records_list]
    return [
        fill_structure(copy.deepcopy(structure), list(texts)) for texts in records_text
    ]


def flatten_structures(filled: list[list[dict]]) -> list[str]:
    """Flatten a table's filled structures into the ordered span texts.

    Emission contract (FIXTURES.md §3): record-major; within a record a
    pre-order DFS over the header trees emits the header text (None -> ''),
    then the value for scalar-filled leaves (None -> ''); leaves left as []
    (exhausted records) emit only their header text.
    """
    out: list[str] = []

    def walk(items: list) -> None:
        for item in items:
            for key, value in item.items():
                out.append("" if key is None else str(key))
                if isinstance(value, list):
                    walk(value)
                else:
                    out.append("" if value is None else str(value))

    for record_structure in filled:
        walk(record_structure)
    return out


def emit_table_spans(cells_with_text: list[tuple[Cell, str]]) -> list[str]:
    """Full per-table chain: (cell rect, text) pairs -> ordered span texts."""
    rectangles = [c for c, _ in cells_with_text]
    text_dict = {c: t for c, t in cells_with_text}
    return flatten_structures(serialize_table(rectangles, text_dict))


def to_yaml(filled: list[list[dict]]) -> str:
    """Reference-parity YAML for one table: each record's structure dumped
    with ``default_flow_style=False, allow_unicode=True`` and concatenated
    (export.py:102-105, truncate-then-append file semantics)."""
    import yaml

    return "".join(
        yaml.dump(record, default_flow_style=False, allow_unicode=True)
        for record in filled
    )


def to_json(filled: list[list[dict]]) -> str:
    """Reference-parity JSON for one table: the records list dumped with
    ``ensure_ascii=False`` (export.py:108-119 json branch)."""
    import json

    return json.dumps(filled, ensure_ascii=False)
