"""Pure deterministic box-geometry kernels.

Re-implementation (from observed behavior) of the geometry primitives the
reference engine's post-processing relies on; semantics match
``/root/reference/src/yomitoku/utils/misc.py:35-134,182-448``. These are the
byte-identity-critical scalar functions shared by every Ray stage and by the
single-process oracle; keep them dependency-free (no cv2/networkx) so they can
ship to any worker cheaply.
"""

from __future__ import annotations

import math


def calc_intersection(rect_a, rect_b):
    """Integer-truncated intersection box of two xyxy rects, or ``None``.

    Parity: utils/misc.py:75-91 (coords cast with ``int()`` before clipping).
    """
    ax1, ay1, ax2, ay2 = map(int, rect_a)
    bx1, by1, bx2, by2 = map(int, rect_b)

    ix1 = max(ax1, bx1)
    iy1 = max(ay1, by1)
    ix2 = min(ax2, bx2)
    iy2 = min(ay2, by2)

    if max(0, ix2 - ix1) == 0 or max(0, iy2 - iy1) == 0:
        return None
    return [ix1, iy1, ix2, iy2]


def calc_overlap_ratio(rect_a, rect_b):
    """(intersection area / area of rect_b, intersection). utils/misc.py:35-50."""
    intersection = calc_intersection(rect_a, rect_b)
    if intersection is None:
        return 0, None
    ix1, iy1, ix2, iy2 = intersection
    bx1, by1, bx2, by2 = rect_b
    b_area = (bx2 - bx1) * (by2 - by1)
    return ((ix2 - ix1) * (iy2 - iy1)) / b_area, intersection


def is_contained(rect_a, rect_b, threshold=0.8):
    """True iff rect_b is (mostly) inside rect_a. utils/misc.py:53-72."""
    overlap_ratio, _ = calc_overlap_ratio(rect_a, rect_b)
    return overlap_ratio > threshold


def calc_iou(rect_a, rect_b):
    """Standard IoU with int-truncated intersection. utils/misc.py:182-201."""
    intersection = calc_intersection(rect_a, rect_b)
    if intersection is None:
        return 0
    ix1, iy1, ix2, iy2 = intersection
    ax1, ay1, ax2, ay2 = rect_a
    bx1, by1, bx2, by2 = rect_b
    a_area = (ax2 - ax1) * (ay2 - ay1)
    b_area = (bx2 - bx1) * (by2 - by1)
    overlap_area = (ix2 - ix1) * (iy2 - iy1)
    return overlap_area / (a_area + b_area - overlap_area)


def is_intersected_horizontal(rect_a, rect_b, threshold=0.5):
    """1-D y-band overlap >= threshold * min height. utils/misc.py:94-109."""
    _, ay1, _, ay2 = map(int, rect_a)
    _, by1, _, by2 = map(int, rect_b)
    iy1 = max(ay1, by1)
    iy2 = min(ay2, by2)
    min_height = min(ay2 - ay1, by2 - by1)
    overlap_height = max(0, iy2 - iy1)
    return (overlap_height / min_height) >= threshold


def is_intersected_vertical(rect_a, rect_b):
    """Any 1-D x-band overlap. utils/misc.py:112-125."""
    ax1, _, ax2, _ = map(int, rect_a)
    bx1, _, bx2, _ = map(int, rect_b)
    ix1 = max(ax1, bx1)
    ix2 = min(ax2, bx2)
    return max(0, ix2 - ix1) != 0


def quad_to_xyxy(quad):
    """4-point quad -> axis-aligned xyxy. utils/misc.py:128-134."""
    x1 = min(x for x, _ in quad)
    y1 = min(y for _, y in quad)
    x2 = max(x for x, _ in quad)
    y2 = max(y for _, y in quad)
    return x1, y1, x2, y2


def filter_by_flag(elements, flags):
    """Keep elements whose flag is truthy. utils/misc.py:16-18."""
    assert len(elements) == len(flags)
    return [element for element, flag in zip(elements, flags) if flag]


def combine_flags(flag1, flag2):
    """Elementwise OR of two bool lists. document_analyzer.py:19-20."""
    return [f1 or f2 for f1, f2 in zip(flag1, flag2)]


def clamp(t, lo, hi):
    return max(lo, min(hi, t))


def point_to_segment_distance(px, py, ax, ay, bx, by):
    """Min distance from point to segment. utils/misc.py:208-221."""
    abx, aby = bx - ax, by - ay
    apx, apy = px - ax, py - ay
    denom = abx * abx + aby * aby
    if denom == 0:
        return math.hypot(px - ax, py - ay)
    t = clamp((apx * abx + apy * aby) / denom, 0.0, 1.0)
    cx, cy = ax + t * abx, ay + t * aby
    return math.hypot(px - cx, py - cy)


def right_edge_to_left_edge_dist(box_a, box_b):
    """Vertex-to-edge distances A.right vs B.left. utils/misc.py:224-244."""
    ax1, ay1, ax2, ay2 = box_a
    bx1, by1, bx2, by2 = box_b
    d1 = point_to_segment_distance(ax2, ay1, bx1, by1, bx1, by2)
    d2 = point_to_segment_distance(ax2, ay2, bx1, by1, bx1, by2)
    d3 = point_to_segment_distance(bx1, by1, ax2, ay1, ax2, ay2)
    d4 = point_to_segment_distance(bx1, by2, ax2, ay1, ax2, ay2)
    return max(d1, d4), max(d2, d3), max(d3, d4), max(d1, d2)


def top_edge_to_bottom_edge_dist(box_a, box_b):
    """Vertex-to-edge distances A.bottom vs B.top. utils/misc.py:247-267."""
    ax1, ay1, ax2, ay2 = box_a
    bx1, by1, bx2, by2 = box_b
    d1 = point_to_segment_distance(ax1, ay2, bx1, by1, bx2, by1)
    d2 = point_to_segment_distance(ax2, ay2, bx1, by1, bx2, by1)
    d3 = point_to_segment_distance(bx1, by1, ax1, ay2, ax2, ay2)
    d4 = point_to_segment_distance(bx2, by1, ax1, ay2, ax2, ay2)
    return max(d1, d4), max(d2, d3), max(d3, d4), max(d1, d2)


def overlap_interval(i1, i2, j1, j2):
    """Overlap length of [i1,i2] and [j1,j2]. utils/misc.py:270-274."""
    return max(0.0, min(i2, j2) - max(i1, j1))


def point_distance(p, q):
    px, py = p
    qx, qy = q
    return math.hypot(px - qx, py - qy)


def gap_interval(interval_a, interval_b):
    """Min gap between two 1-D intervals (0 if overlapping). utils/misc.py:283-296."""
    a1, a2 = interval_a
    b1, b2 = interval_b
    if b2 < a1:
        return a1 - b2
    if a2 < b1:
        return b1 - a2
    return 0.0


def is_right_adjacent(
    box_a,
    box_b,
    dist_threshold=15,
    overlap_ratio_th=0.1,
    ignore_dist_threshold=10,
    rule="soft",
):
    """Is box_b adjacent to the right of box_a. utils/misc.py:299-353.

    Rules: hard = strict 1:1 corner match; soft = any vertex/edge distance
    below threshold (N:M allowed); nest = child-edge only (d3).
    """
    ax1, ay1, ax2, ay2 = box_a
    bx1, by1, bx2, by2 = box_b

    if bx1 < ax1:
        return False
    if overlap_interval(ay1, ay2, by1, by2) < overlap_ratio_th * min(
        ay2 - ay1, by2 - by1
    ):
        return False
    if point_distance((ax2, ay2), (bx1, by1)) < ignore_dist_threshold:
        return False
    if point_distance((ax2, ay1), (bx1, by2)) < ignore_dist_threshold:
        return False

    d1, d2, d3, d4 = right_edge_to_left_edge_dist(box_a, box_b)
    if rule == "hard":
        if (
            point_distance((ax2, ay1), (bx1, by1)) < dist_threshold
            and point_distance((ax2, ay2), (bx1, by2)) < dist_threshold
        ):
            return True
    elif rule == "soft":
        if min(d1, d2, d3, d4) < dist_threshold:
            return True
    elif rule == "nest":
        if d3 < dist_threshold:
            return True
    return False


def is_bottom_adjacent(
    box_a,
    box_b,
    dist_threshold=15,
    overlap_ratio_th=0.1,
    ignore_dist_threshold=10,
    rule="soft",
):
    """Is box_b adjacent below box_a. utils/misc.py:356-427.

    Extra rule 'child': nested (d3) but NOT a strict 1:1 corner match.
    """
    ax1, ay1, ax2, ay2 = box_a
    bx1, by1, bx2, by2 = box_b

    if by1 < ay1:
        return False
    if overlap_interval(ax1, ax2, bx1, bx2) < overlap_ratio_th * min(
        ax2 - ax1, bx2 - bx1
    ):
        return False
    if point_distance((ax2, ay2), (bx1, by1)) < ignore_dist_threshold:
        return False
    if point_distance((ax1, ay2), (bx2, by1)) < ignore_dist_threshold:
        return False

    d1, d2, d3, d4 = top_edge_to_bottom_edge_dist(box_a, box_b)
    hard = (
        point_distance((ax1, ay2), (bx1, by1)) < dist_threshold
        and point_distance((ax2, ay2), (bx2, by1)) < dist_threshold
    )
    if rule == "hard":
        if hard:
            return True
    elif rule == "soft":
        if min(d1, d2, d3, d4) < dist_threshold:
            return True
    elif rule == "nest":
        if d3 < dist_threshold:
            return True
    elif rule == "child":
        if not hard and d3 < dist_threshold:
            return True
    return False


def convert_table_array(table):
    """Cell grid -> 2-D string array (spans replicated). utils/misc.py:137-154."""
    table_array = [["" for _ in range(table.n_col)] for _ in range(table.n_row)]
    for cell in table.cells:
        row = cell.row - 1
        col = cell.col - 1
        for i in range(row, row + cell.row_span):
            for j in range(col, col + cell.col_span):
                table_array[i][j] = cell.contents
    return table_array


def convert_table_array_to_dict(table_array, header_row=1):
    """2-D array -> list of row dicts keyed by joined headers. utils/misc.py:157-179."""
    n_cols = len(table_array[0])
    n_rows = len(table_array)

    header_cols = []
    for i in range(n_cols):
        header = [table_array[j][i] for j in range(header_row)]
        if len(header) > 0:
            header_cols.append("_".join(header))
        else:
            header_cols.append(f"col_{i}")

    table_dict = []
    for i in range(header_row, n_rows):
        table_dict.append({header_cols[j]: table_array[i][j] for j in range(n_cols)})
    return table_dict
