"""Pure per-table grid geometry: lines -> nodes -> cells.

Reimplements (from public knowledge of the algorithms, not by copying) the
reference's empirical grid-reconstruction chain with the same semantics:

- line extraction     ~ ``table_extraction/detection.py:221-306`` (get_lines_Hough)
- node extraction     ~ ``table_extraction/detection.py:341-471`` (get_nodes)
- cell reconstruction ~ ``table_extraction/detection.py:501-604`` (get_cells)

Reference-pinned semantics preserved exactly:

- binarization threshold 200 then invert (ink = value <= 200);
- morphological opening with a 1x6 horizontal / 7x1 vertical structuring
  element before segment extraction, minimum segment length 30
  (the reference's HoughLinesP ``minLineLength=30``);
- tolerance ``epsilon = (height + width) * 0.01`` for all node/cell geometry;
- y-axis flip to math coordinates (``height - y``) for lines/nodes, flipped
  back on the final cells;
- node epsilon-ball clustering to the rounded mean, x-then-y snapping of
  near-equal coordinates, sort by ``(-y, x)``, and the iterative
  "coordinate seen only once" fixpoint filter;
- the cell walk over consecutive same-row nodes with the two opposite-corner
  candidates (down-then-left vs left-then-down) resolved by larger area;
- final cells flipped back to image coords and sorted by ``(y1, x1)``.

Documented divergences from the reference (SURVEY.md §7.4):

- we use a deterministic run-length segment extractor instead of the
  probabilistic ``cv2.HoughLinesP`` (same epsilon rule and y-flip; vertical
  segments are emitted with flipped ``y1 < y2`` and horizontal ones with
  ``x1 < x2``, the orientation the node intersection tests assume);
- the per-table loop is correct for every table (the reference clobbers its
  node list at ``detection.py:522``, so only table 0 is right there);
- zero-area cells are dropped: the reference's walk emits degenerate
  bottom-row cells (a stale ``next_y_node`` from a prior iteration), which
  its production Mask R-CNN cell path never produces.

Everything here is pure numpy/python and per-table local: in the Ray
pipeline this runs inside stateless ``map_batches`` stages with no shuffle.
"""

from __future__ import annotations

import numpy as np

Line = tuple[int, int, int, int]
Cell = tuple[int, int, int, int]

MIN_SEGMENT_LEN = 30  # reference HoughLinesP minLineLength (detection.py:274)
BIN_THRESHOLD = 200  # reference threshold (detection.py:240)


def binarize_ink(image: np.ndarray, threshold: int = BIN_THRESHOLD) -> np.ndarray:
    """Grayscale -> bool ink mask (True where value <= threshold), i.e. the
    reference's threshold-then-invert (detection.py:240-241)."""
    return image <= threshold




def _runs_2d(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All maximal horizontal True runs of a 2-D bool mask at once:
    (rows, starts, stops_excl) int arrays, row-major order. One vectorized
    diff instead of a Python loop per row — the hot path of every image
    stage."""
    h, w = mask.shape
    padded = np.zeros((h, w + 2), dtype=np.int8)
    padded[:, 1 : w + 1] = mask
    d = np.diff(padded, axis=1)
    # ONE nonzero scan, then split by transition sign: within each row the
    # +1/-1 transitions strictly alternate (start, stop, start, ...), so
    # the sign-filtered subsequences pair up elementwise exactly like the
    # former separate d==1 / d==-1 scans — same arrays, half the passes
    # (this is the hot path of every page scan).
    rs_all, cs_all = np.nonzero(d)
    up = d[rs_all, cs_all] == 1
    return rs_all[up], cs_all[up], cs_all[~up]



def extract_lines(image: np.ndarray) -> tuple[list[Line], list[Line]]:
    """Extract (vertical_lines, horizontal_lines) from a grayscale table image,
    in y-flipped math coordinates, as the reference's get_lines_Hough does
    (detection.py:221-306) but with a deterministic segment extractor.

    A horizontal segment at image row y spanning columns [x1, x2] becomes
    ``(x1, h - y, x2, h - y)``; a vertical one at column x spanning image rows
    [y1, y2] becomes ``(x, h - y2, x, h - y1)`` so flipped y1 < y2.
    Ruling lines thicker than 1 px yield one segment per pixel-row/column,
    which the node clustering merges (same as the reference's Hough output).
    """
    h, w = image.shape
    ink = binarize_ink(image)
    # Opening with a length-k 1-D element preserves maximal runs >= k at
    # full extent and removes shorter ones; composed with the >= 30 segment
    # filter (30 >= 6, 7) it is EXACTLY "keep maximal ink runs >= 30" — so
    # the erode/dilate passes are skipped outright (2-3x faster page scan,
    # bit-identical output; reference semantics detection.py:244-261 + :270).
    horizontal: list[Line] = []
    rows, starts, stops = _runs_2d(ink)
    keep = stops - starts >= MIN_SEGMENT_LEN
    for y, x1, x2 in zip(rows[keep], starts[keep], stops[keep]):
        horizontal.append((int(x1), int(h - y), int(x2 - 1), int(h - y)))
    vertical: list[Line] = []
    cols, vstarts, vstops = _runs_2d(ink.T)
    keep = vstops - vstarts >= MIN_SEGMENT_LEN
    for x, y1, y2 in zip(cols[keep], vstarts[keep], vstops[keep]):
        vertical.append((int(x), int(h - (y2 - 1)), int(x), int(h - y1)))
    return vertical, horizontal


def _cluster_nodes(nodes: list[tuple[int, int]], epsilon: float) -> list[tuple[int, int]]:
    """Epsilon-ball clustering to the rounded mean, preserving first-seen
    order (the reference's KDTree query_ball_point pass,
    detection.py:415-434), without scipy.

    Operates on UNIQUE nodes carrying their multiplicities (the V x H pair
    loop appends endpoints once per pair, so duplicates are heavy): cluster
    means weighted by count are bit-identical to means over the duplicated
    list (integer coordinates sum exactly in float64), and first-seen order
    of unique nodes equals the original iteration's seed order."""
    uniq: dict[tuple[int, int], int] = {}
    for n in nodes:
        uniq[n] = uniq.get(n, 0) + 1
    pts = np.asarray(list(uniq.keys()), dtype=np.float64)
    cnt = np.asarray(list(uniq.values()), dtype=np.float64)
    visited = np.zeros(len(pts), dtype=bool)
    e2 = epsilon * epsilon
    out: list[tuple[int, int]] = []
    for i in range(len(pts)):
        if visited[i]:
            continue
        d2 = ((pts - pts[i]) ** 2).sum(axis=1)
        idxs = np.flatnonzero(d2 <= e2)
        visited[idxs] = True
        total = cnt[idxs].sum()
        if total > 1:
            mean = np.round((pts[idxs] * cnt[idxs, None]).sum(axis=0) / total).astype(int)
            out.append((int(mean[0]), int(mean[1])))
        else:
            out.append((int(pts[i, 0]), int(pts[i, 1])))
    return out


def extract_nodes(
    shape: tuple[int, int],
    vertical_lines: list[Line],
    horizontal_lines: list[Line],
) -> list[tuple[int, int]]:
    """Grid vertices from line intersections, reference get_nodes semantics
    (detection.py:341-471): intersection/endpoint-touch tests within epsilon,
    border-proximity and extreme-corner nodes, epsilon clustering, x-then-y
    snapping, sort by (-y, x), and the coordinate-count fixpoint filter."""
    height, width = shape
    epsilon = (height + width) * 0.01
    if not vertical_lines or not horizontal_lines:
        return []

    extreme = [width, height, 0, 0]
    nodes: list[tuple[int, int]] = []
    for v_x1, v_y1, v_x2, v_y2 in vertical_lines:
        for h_x1, h_y1, h_x2, h_y2 in horizontal_lines:
            extreme = [
                min(extreme[0], v_x1, v_x2, h_x1, h_x2),
                min(extreme[1], v_y1, v_y2, h_y1, h_y2),
                max(extreme[2], v_x1, v_x2, h_x1, h_x2),
                max(extreme[3], v_y1, v_y2, h_y1, h_y2),
            ]
            if (
                ((h_x1 - epsilon <= v_x1 <= h_x2 + epsilon)
                 and (v_y1 - epsilon <= h_y1 <= v_y2 + epsilon))
                or (abs(h_x1 - v_x1) <= epsilon and v_y1 - epsilon <= h_y1 <= v_y2 + epsilon)
                or (abs(h_x2 - v_x1) <= epsilon and v_y1 - epsilon <= h_y1 <= v_y2 + epsilon)
                or (abs(h_y1 - v_y1) <= epsilon and h_x1 - epsilon <= v_x1 <= h_x2 + epsilon)
                or (abs(h_y1 - v_y2) <= epsilon and h_x1 - epsilon <= v_x1 <= h_x2 + epsilon)
            ):
                nodes.append((v_x1, h_y1))

            # Border-proximity endpoints (2*epsilon band).
            if (v_x1 <= 2 * epsilon or v_y1 <= 2 * epsilon
                    or abs(v_x1 - width) <= 2 * epsilon
                    or abs(v_y1 - 2 * height) <= 2 * epsilon):
                nodes.append((v_x1, v_y1))
            if (v_x2 <= 2 * epsilon or v_y2 <= 2 * epsilon
                    or abs(v_x2 - width) <= 2 * epsilon
                    or abs(v_y2 - height) <= 2 * epsilon):
                nodes.append((v_x2, v_y2))
            if (h_x1 <= 2 * epsilon or h_y1 <= 2 * epsilon
                    or abs(h_x1 - width) <= 2 * epsilon
                    or abs(h_y1 - height) <= 2 * epsilon):
                nodes.append((h_x1, h_y1))
            if (h_x2 <= 2 * epsilon or h_y2 <= 2 * epsilon
                    or abs(h_x2 - width) <= 2 * epsilon
                    or abs(h_y2 - height) <= 2 * epsilon):
                nodes.append((h_x2, h_y2))
            if v_y1 <= epsilon or v_y2 <= epsilon:
                nodes.append((0, 0))
                nodes.append((width, 0))

            nodes.append((v_x1, v_y1))
            nodes.append((v_x2, v_y2))
            nodes.append((h_x1, h_y1))
            nodes.append((h_x2, h_y2))

    nodes.append((extreme[0], extreme[1]))
    nodes.append((extreme[0], extreme[3]))
    nodes.append((extreme[2], extreme[1]))
    nodes.append((extreme[2], extreme[3]))

    clustered = _cluster_nodes(nodes, epsilon)

    nodes_sorted = sorted(clustered, key=lambda n: n[0])
    for i in range(len(nodes_sorted) - 1):
        if abs(nodes_sorted[i][0] - nodes_sorted[i + 1][0]) <= epsilon:
            nodes_sorted[i + 1] = (nodes_sorted[i][0], nodes_sorted[i + 1][1])
    nodes_sorted = sorted(nodes_sorted, key=lambda n: n[1])
    for i in range(len(nodes_sorted) - 1):
        if abs(nodes_sorted[i][1] - nodes_sorted[i + 1][1]) <= epsilon:
            nodes_sorted[i + 1] = (nodes_sorted[i + 1][0], nodes_sorted[i][1])
    nodes_sorted = sorted(nodes_sorted, key=lambda n: (-n[1], n[0]))

    # Fixpoint: drop nodes whose x or y coordinate occurs only once.
    while True:
        count_x: dict[int, int] = {}
        count_y: dict[int, int] = {}
        for x, y in nodes_sorted:
            count_x[x] = count_x.get(x, 0) + 1
            count_y[y] = count_y.get(y, 0) + 1
        filtered = [(x, y) for x, y in nodes_sorted if count_x[x] > 1 and count_y[y] > 1]
        if len(filtered) == len(nodes_sorted):
            break
        nodes_sorted = filtered
    return nodes_sorted


def extract_cells(shape: tuple[int, int], nodes: list[tuple[int, int]]) -> list[Cell]:
    """Walk the (-y, x)-sorted nodes into cell rectangles, reference
    get_cells semantics (detection.py:501-604), returning image-coordinate
    cells sorted by (y1, x1). Zero-area cells are dropped (see module
    docstring divergence note)."""
    height, width = shape
    epsilon = (height + width) * 0.01
    cells: list[Cell] = []
    next_y_node: tuple[int, int] | None = None  # reference keeps this stale across iterations
    for i in range(len(nodes) - 1):
        current = nodes[i]
        if abs(nodes[i + 1][1] - current[1]) <= epsilon:
            next_x = nodes[i + 1]
        else:
            continue

        # Case 1: down from the right neighbor.
        opposite_1 = None
        for node in nodes:
            if abs(node[0] - next_x[0]) <= epsilon and node[1] < next_x[1]:
                opposite_1 = node
                break

        for node in nodes:
            if abs(node[0] - current[0]) <= epsilon and node[1] < current[1]:
                next_y_node = node
                break

        # Case 2: right from the node below the current one.
        opposite_2 = None
        if next_y_node is not None:
            for node in nodes:
                if abs(node[1] - next_y_node[1]) <= epsilon and node[0] > next_y_node[0]:
                    opposite_2 = node
                    break

        if opposite_1 is None and opposite_2 is None:
            continue
        if opposite_1 is not None and opposite_2 is None:
            cells.append((current[0], current[1], opposite_1[0], opposite_1[1]))
            continue
        if opposite_1 is None and opposite_2 is not None:
            cells.append((current[0], current[1], opposite_2[0], opposite_2[1]))
            continue

        area_1 = abs(current[0] - opposite_1[0]) * abs(current[1] - opposite_1[1])
        area_2 = abs(current[0] - opposite_2[0]) * abs(current[1] - opposite_2[1])
        if area_1 > area_2:
            cells.append((current[0], current[1], opposite_1[0], opposite_1[1]))
        else:
            cells.append((current[0], current[1], opposite_2[0], opposite_2[1]))

    flipped = [(x1, height - y1, x2, height - y2) for x1, y1, x2, y2 in cells]
    flipped = [c for c in flipped if c[0] != c[2] and c[1] != c[3]]
    return sorted(flipped, key=lambda c: (c[1], c[0]))


def grid_cells(table_image: np.ndarray) -> list[Cell]:
    """Full per-table chain: lines -> nodes -> cells on a grayscale crop."""
    v, hz = extract_lines(table_image)
    nodes = extract_nodes(table_image.shape, v, hz)
    if not nodes:
        return []
    return extract_cells(table_image.shape, nodes)


def detect_table_regions(
    page_image: np.ndarray,
    min_size: int = 40,
) -> list[Cell]:
    """Find ruled-table regions on a grayscale page image.

    Plays the role of the reference's model-based table detector
    (``table_extraction/detection.py:80-122``) with a deterministic
    morphology backend: build the ruling-line mask (same 1x6/7x1 opening +
    min-length rule as :func:`extract_lines`), connected-components label it,
    and return bounding boxes (x1, y1, x2, y2) inclusive of components that
    contain both horizontal and vertical ruling, sorted by (y1, x1) — the
    reading order that defines ``table_no``.
    """
    ink = binarize_ink(page_image)
    # Long-run extraction == opening + min-length filter (see extract_lines
    # note). Connectivity runs over the SEGMENTS, not pixels: a ruling mask
    # is exactly the union of its long runs, and two runs are 8-connected
    # iff their bounding intervals overlap when dilated by 1 (maximal runs
    # in one row are >= 2 apart, so same-row runs never connect — identical
    # components to pixel-level labeling at a fraction of the work; tables
    # are dozens of segments, not thousands of pixel runs).
    rows, starts, stops = _runs_2d(ink)
    keep = stops - starts >= MIN_SEGMENT_LEN
    hy, hx1, hx2 = rows[keep], starts[keep], stops[keep] - 1  # inclusive
    cols, vstarts, vstops = _runs_2d(ink.T)
    keep = vstops - vstarts >= MIN_SEGMENT_LEN
    vx, vy1, vy2 = cols[keep], vstarts[keep], vstops[keep] - 1
    nh, nv = len(hy), len(vx)
    n = nh + nv
    if n == 0:
        return []
    # Segment boxes: (x1, y1, x2, y2) inclusive; h first, then v.
    bx1 = np.concatenate([hx1, vx]).astype(np.int64)
    bx2 = np.concatenate([hx2, vx]).astype(np.int64)
    by1 = np.concatenate([hy, vy1]).astype(np.int64)
    by2 = np.concatenate([hy, vy2]).astype(np.int64)
    # Pairwise 8-connectivity: dilated-interval overlap on both axes.
    ox = (bx1[:, None] <= bx2[None, :] + 1) & (bx1[None, :] <= bx2[:, None] + 1)
    oy = (by1[:, None] <= by2[None, :] + 1) & (by1[None, :] <= by2[:, None] + 1)
    adj = ox & oy
    parent = np.arange(n)

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ii, jj = np.nonzero(np.triu(adj, k=1))
    for a, b in zip(ii.tolist(), jj.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.asarray([find(i) for i in range(n)])
    regions: list[Cell] = []
    for r in np.unique(roots):
        members = roots == r
        if not (members[:nh].any() and members[nh:].any()):
            continue  # needs both horizontal and vertical ruling
        x1, x2 = int(bx1[members].min()), int(bx2[members].max())
        y1, y2 = int(by1[members].min()), int(by2[members].max())
        if x2 - x1 + 1 < min_size or y2 - y1 + 1 < min_size:
            continue
        regions.append((x1, y1, x2, y2))
    return sorted(regions, key=lambda r: (r[1], r[0]))


def _label_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """8-connected component labeling via run-based union-find (no scipy)."""
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent: list[int] = [0]

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    all_rows, all_starts, all_stops = _runs_2d(mask)
    prev_runs: list[tuple[int, int, int]] = []  # (start, stop, label)
    prev_row = -2
    next_label = 0
    i = 0
    n_runs = len(all_rows)
    while i < n_runs:
        y = all_rows[i]
        j = i
        while j < n_runs and all_rows[j] == y:
            j += 1
        if y != prev_row + 1:
            prev_runs = []
        cur_runs: list[tuple[int, int, int]] = []
        for k in range(i, j):
            x1, x2 = int(all_starts[k]), int(all_stops[k])
            lbl = 0
            for px1, px2, plbl in prev_runs:
                # 8-connectivity: runs [x1, x2-1] and [px1, px2] touch even diagonally.
                if px1 <= x2 and x1 <= px2 + 1:
                    if lbl == 0:
                        lbl = plbl
                    else:
                        union(lbl, plbl)
            if lbl == 0:
                next_label += 1
                parent.append(next_label)
                lbl = next_label
            labels[y, x1:x2] = lbl
            cur_runs.append((x1, x2 - 1, lbl))
        prev_runs = cur_runs
        prev_row = y
        i = j

    # Resolve unions to compact ids (lut over the tiny provisional-label
    # space; one fancy-index over the image, no full-image sort).
    roots = np.array([find(v) for v in range(len(parent))], dtype=np.int32)
    uniq_roots = sorted(set(roots[1:].tolist()))
    n = len(uniq_roots)
    lut = np.zeros(len(parent), dtype=np.int32)
    for c, r in enumerate(uniq_roots, start=1):
        lut[r] = c
    compact = lut[roots]  # provisional id -> compact id
    return compact[labels], n


def scale_cells(cells: list[Cell], low_dpi: int, high_dpi: int) -> list[Cell]:
    """Scale cell bboxes detected at low DPI to high-DPI coordinates with
    the reference's int() truncation semantics
    (``table_extraction/detection.py:607-628`` resize_tables_cells) — the
    two-DPI trick: detect on the cheap raster, crop/OCR on the sharp one.
    The engine carries the factor instead of both rasters (SURVEY.md §1.2)."""
    factor = high_dpi / low_dpi
    return [
        (int(x1 * factor), int(y1 * factor), int(x2 * factor), int(y2 * factor))
        for x1, y1, x2, y2 in cells
    ]
