"""Table-similarity metrics: GriTS and adjacency P/R/F1.

Pure-Python reimplementation of the published GriTS family (Smock et al.,
"GriTS: Grid table similarity metric for table structure recognition",
public arXiv:2203.12555; reference implementation surface at
``/root/reference/table_extraction/transformer/src/grits.py:98-159,
412-451, 559-589, 628-707``). Exact 2D-MSS is NP-hard; like the paper we
use the factored approximation: an outer sequence alignment over rows whose
pairwise reward is an inner sequence alignment over the rows' cells. Both
orders (rows-outer and columns-outer) are computed and the max taken.

Used by the test-suite to score grid reconstruction quality in addition to
the hard span-equality gate (SURVEY.md §2.10, §5.2).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence


def align_1d(
    seq_a: Sequence, seq_b: Sequence, sim: Callable[[object, object], float]
) -> float:
    """Maximum total similarity of an order-preserving partial matching of
    two sequences (weighted LCS DP). O(len_a * len_b) time."""
    n, m = len(seq_a), len(seq_b)
    prev = [0.0] * (m + 1)
    for i in range(1, n + 1):
        cur = [0.0] * (m + 1)
        ai = seq_a[i - 1]
        for j in range(1, m + 1):
            s = sim(ai, seq_b[j - 1])
            cur[j] = max(prev[j], cur[j - 1], prev[j - 1] + s)
        prev = cur
    return prev[m]


def _grid_mss(
    grid_a: list[list], grid_b: list[list], cell_sim: Callable[[object, object], float]
) -> float:
    """Factored 2D-MSS reward: outer alignment over rows, inner over cells."""

    def row_sim(ra, rb):
        return align_1d(ra, rb, cell_sim)

    return align_1d(grid_a, grid_b, row_sim)


def _transpose(grid: list[list]) -> list[list]:
    if not grid:
        return []
    return [list(col) for col in zip(*grid)]


def grits(
    grid_a: list[list], grid_b: list[list], cell_sim: Callable[[object, object], float]
) -> float:
    """GriTS score in [0, 1]: 2 * MSS-reward / (|A| + |B|), where |G| is the
    cell count; the factored reward is computed rows-outer and columns-outer
    and the larger taken (the factored bound of the paper)."""
    n_a = sum(len(r) for r in grid_a)
    n_b = sum(len(r) for r in grid_b)
    if n_a == 0 and n_b == 0:
        return 1.0
    if n_a == 0 or n_b == 0:
        return 0.0
    by_rows = _grid_mss(grid_a, grid_b, cell_sim)
    by_cols = _grid_mss(_transpose(grid_a), _transpose(grid_b), cell_sim)
    return 2.0 * max(by_rows, by_cols) / (n_a + n_b)


def lcs_similarity(a: str, b: str) -> float:
    """Normalized longest-common-subsequence similarity of two strings —
    the cell-content reward of GriTS_Con (reference grits.py:412-451)."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return align_1d(a, b, lambda x, y: 1.0 if x == y else 0.0) * 2.0 / (len(a) + len(b))


def grits_con(grid_a: list[list[str]], grid_b: list[list[str]]) -> float:
    """GriTS_Content: cells are text strings, reward = normalized LCS."""
    return grits(grid_a, grid_b, lcs_similarity)


def grits_top(
    grid_a: list[list[tuple[int, int]]], grid_b: list[list[tuple[int, int]]]
) -> float:
    """GriTS_Topology: cells are (rowspan, colspan) tuples; reward 1 when
    the spanning structure matches (simple grids: all (1,1) -> pure shape
    alignment)."""
    return grits(grid_a, grid_b, lambda x, y: 1.0 if x == y else 0.0)


def grits_loc(
    grid_a: list[list[tuple[float, float, float, float]]],
    grid_b: list[list[tuple[float, float, float, float]]],
) -> float:
    """GriTS_Location: cells are bounding boxes; reward = IoU (reference
    grits.py:679-684 factored_2dlcs over cells_to_grid(key='bbox') with
    eval_utils.iou). Completes the Top/Con/Loc family."""
    from .tatr import iou

    return grits(grid_a, grid_b, iou)


def adjacency_relations(grid: list[list[str]]) -> set[tuple[str, str, str]]:
    """Direct horizontal/vertical adjacency pairs of non-empty cell texts —
    the basis of the adjacency P/R/F1 metric (reference
    grits.py:628-707)."""
    rels: set[tuple[str, str, str]] = set()
    for i, row in enumerate(grid):
        for j, text in enumerate(row):
            if not text:
                continue
            if j + 1 < len(row) and row[j + 1]:
                rels.add((text, row[j + 1], "h"))
            if i + 1 < len(grid) and j < len(grid[i + 1]) and grid[i + 1][j]:
                rels.add((text, grid[i + 1][j], "v"))
    return rels


def adjacency_f1(
    grid_pred: list[list[str]], grid_true: list[list[str]]
) -> tuple[float, float, float]:
    """(precision, recall, f1) over direct adjacency relations."""
    pred = adjacency_relations(grid_pred)
    true = adjacency_relations(grid_true)
    if not pred and not true:
        return 1.0, 1.0, 1.0
    tp = len(pred & true)
    precision = tp / len(pred) if pred else 0.0
    recall = tp / len(true) if true else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return precision, recall, f1
