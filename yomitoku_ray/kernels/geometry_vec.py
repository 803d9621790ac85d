"""Vectorized all-pairs box-geometry kernels.

Batch (numpy) forms of the scalar predicates in ``geometry.py``; semantics
match ``/root/reference/src/yomitoku/utils/misc.py:35-427`` bit-for-bit:
every arithmetic step mirrors the scalar float64 operation order, so the
boolean matrices returned here agree element-wise with the scalar
``is_right_adjacent`` / ``is_bottom_adjacent`` / ``calc_overlap_ratio``
calls they replace (asserted exhaustively in tests/test_geometry.py).

These exist because the table/semantic parsers need adjacency over ALL cell
pairs: the scalar nested loop is O(n^2) Python calls per table and was the
top profile entry; one broadcasted evaluation of the same formulas is ~100x
cheaper and keeps byte parity.
"""

from __future__ import annotations

import numpy as np


def _pt_seg_v(px, py, x, y1, y2):
    """Distance from points (px, py) to vertical segments (x, y1)-(x, y2).

    Same op order as geometry.point_to_segment_distance with abx == 0 (the
    x-difference contributes exactly 0 to dot/denominator, cx == x exactly).
    Degenerate (zero-length) segments divide by a dummy 1 instead of 0 —
    the np.errstate context manager this replaces cost more than the whole
    kernel on the small matrices the parsers feed — and are overwritten
    with the exact point distance below, so results are unchanged.
    """
    aby = y2 - y1
    denom = aby * aby
    degen = denom == 0
    any_degen = bool(np.any(degen))
    apy = py - y1
    safe = np.where(degen, 1.0, denom) if any_degen else denom
    t = np.clip((apy * aby) / safe, 0.0, 1.0)
    cy = y1 + t * aby
    d = np.hypot(px - x, py - cy)
    if any_degen:
        d = np.where(degen, np.hypot(px - x, py - y1), d)
    return d


def _pt_seg_h(px, py, x1, x2, y):
    """Distance from points (px, py) to horizontal segments (x1, y)-(x2, y)."""
    abx = x2 - x1
    denom = abx * abx
    degen = denom == 0
    any_degen = bool(np.any(degen))
    apx = px - x1
    safe = np.where(degen, 1.0, denom) if any_degen else denom
    t = np.clip((apx * abx) / safe, 0.0, 1.0)
    cx = x1 + t * abx
    d = np.hypot(px - cx, py - y)
    if any_degen:
        d = np.where(degen, np.hypot(px - x1, py - y), d)
    return d


def _split_ab(A, B):
    """(n,4) x (m,4) -> broadcastable coordinate planes."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    ax1, ay1, ax2, ay2 = (A[:, k, None] for k in range(4))
    bx1, by1, bx2, by2 = (B[None, :, k] for k in range(4))
    return ax1, ay1, ax2, ay2, bx1, by1, bx2, by2


def right_adjacency_matrix(
    A,
    B,
    dist_threshold=15,
    overlap_ratio_th=0.1,
    ignore_dist_threshold=10,
    rule="soft",
):
    """(n, m) bool: is B[j] adjacent to the right of A[i].

    Element-wise identical to geometry.is_right_adjacent (misc.py:299-353).
    """
    ax1, ay1, ax2, ay2, bx1, by1, bx2, by2 = _split_ab(A, B)

    ok = bx1 >= ax1
    ov = np.maximum(0.0, np.minimum(ay2, by2) - np.maximum(ay1, by1))
    ok &= ov >= overlap_ratio_th * np.minimum(ay2 - ay1, by2 - by1)
    ok &= np.hypot(ax2 - bx1, ay2 - by1) >= ignore_dist_threshold
    ok &= np.hypot(ax2 - bx1, ay1 - by2) >= ignore_dist_threshold

    d1 = _pt_seg_v(ax2, ay1, bx1, by1, by2)
    d2 = _pt_seg_v(ax2, ay2, bx1, by1, by2)
    d3 = _pt_seg_v(bx1, by1, ax2, ay1, ay2)
    d4 = _pt_seg_v(bx1, by2, ax2, ay1, ay2)
    # right_edge_to_left_edge_dist returns (max(d1,d4), max(d2,d3),
    # max(d3,d4), max(d1,d2)) — the caller's d1..d4 are these maxima.
    e1 = np.maximum(d1, d4)
    e2 = np.maximum(d2, d3)
    e3 = np.maximum(d3, d4)
    e4 = np.maximum(d1, d2)

    if rule == "hard":
        cond = (np.hypot(ax2 - bx1, ay1 - by1) < dist_threshold) & (
            np.hypot(ax2 - bx1, ay2 - by2) < dist_threshold
        )
    elif rule == "soft":
        cond = np.minimum(np.minimum(e1, e2), np.minimum(e3, e4)) < dist_threshold
    elif rule == "nest":
        cond = e3 < dist_threshold
    else:
        raise ValueError(f"unknown rule {rule!r}")
    return ok & cond


def bottom_adjacency_matrix(
    A,
    B,
    dist_threshold=15,
    overlap_ratio_th=0.1,
    ignore_dist_threshold=10,
    rule="soft",
):
    """(n, m) bool: is B[j] adjacent below A[i].

    Element-wise identical to geometry.is_bottom_adjacent (misc.py:356-427),
    including the 'child' rule (nested but not a strict corner match).
    """
    ax1, ay1, ax2, ay2, bx1, by1, bx2, by2 = _split_ab(A, B)

    ok = by1 >= ay1
    ov = np.maximum(0.0, np.minimum(ax2, bx2) - np.maximum(ax1, bx1))
    ok &= ov >= overlap_ratio_th * np.minimum(ax2 - ax1, bx2 - bx1)
    ok &= np.hypot(ax2 - bx1, ay2 - by1) >= ignore_dist_threshold
    ok &= np.hypot(ax1 - bx2, ay2 - by1) >= ignore_dist_threshold

    d1 = _pt_seg_h(ax1, ay2, bx1, bx2, by1)
    d2 = _pt_seg_h(ax2, ay2, bx1, bx2, by1)
    d3 = _pt_seg_h(bx1, by1, ax1, ax2, ay2)
    d4 = _pt_seg_h(bx2, by1, ax1, ax2, ay2)
    e1 = np.maximum(d1, d4)
    e2 = np.maximum(d2, d3)
    e3 = np.maximum(d3, d4)
    e4 = np.maximum(d1, d2)

    hard = (np.hypot(ax1 - bx1, ay2 - by1) < dist_threshold) & (
        np.hypot(ax2 - bx2, ay2 - by1) < dist_threshold
    )
    if rule == "hard":
        cond = hard
    elif rule == "soft":
        cond = np.minimum(np.minimum(e1, e2), np.minimum(e3, e4)) < dist_threshold
    elif rule == "nest":
        cond = e3 < dist_threshold
    elif rule == "child":
        cond = ~hard & (e3 < dist_threshold)
    else:
        raise ValueError(f"unknown rule {rule!r}")
    return ok & cond


def overlap_ratio_matrix(A, B):
    """(n, m) float: calc_overlap_ratio(A[i], B[j])[0] for every pair.

    Intersection coordinates are int-truncated exactly as
    geometry.calc_intersection does (misc.py:75-91); a pair with no
    intersection scores 0.0. ``B`` rows must have positive area whenever a
    positive intersection exists (guaranteed for boxes containing one).
    """
    A_raw = np.asarray(A, dtype=np.float64)
    B_raw = np.asarray(B, dtype=np.float64)
    Ai = np.trunc(A_raw).astype(np.int64)
    Bi = np.trunc(B_raw).astype(np.int64)
    ax1, ay1, ax2, ay2 = (Ai[:, k, None] for k in range(4))
    bx1, by1, bx2, by2 = (Bi[None, :, k] for k in range(4))
    iw = np.maximum(0, np.minimum(ax2, bx2) - np.maximum(ax1, bx1))
    ih = np.maximum(0, np.minimum(ay2, by2) - np.maximum(ay1, by1))
    inter = (iw * ih).astype(np.float64)
    # Scalar parity: calc_intersection truncates the coords, but b_area is
    # computed from the RAW rect_b values (misc.py:40-42); pairs with an
    # empty truncated intersection return 0 early.
    b_area = (B_raw[None, :, 2] - B_raw[None, :, 0]) * (
        B_raw[None, :, 3] - B_raw[None, :, 1]
    )
    nz = (iw > 0) & (ih > 0)
    out = np.zeros(np.broadcast(inter, b_area).shape, dtype=np.float64)
    np.divide(
        inter, np.broadcast_to(b_area, out.shape), out=out, where=nz & (b_area != 0)
    )
    return out
