"""Reading-order estimation: spatial precedence DAG + priority DFS.

Deterministic re-implementation of the reference's reading-order semantics
(``/root/reference/src/yomitoku/reading_order.py:14-223``). Three direction
modes build a precedence graph over element boxes (an edge u->v means "u is
read before v" between elements that overlap on the cross axis with no third
element between them), then a priority DFS with open-list re-queuing emits
the order. The graph construction here is vectorized: the reference's pair
loop with an O(n) betweenness scan per pair is O(n^3); the same predicate
factorizes into boolean matrix products, and parity with the scalar port
was locked in by tests/data/reading_order_golden.json (60 frozen layouts)
plus thousands of randomized parity trials before the scalar twin was
retired.

This is the central per-page "sort" of the engine: it runs per row inside
``map_batches`` — never as a Ray-level sort, because order is a per-document
notion.
"""

from __future__ import annotations

import numpy as np

from .graph import Node


def _priority_dfs(nodes, direction):
    """Priority DFS with open-list re-queuing; parity: reading_order.py:14-82
    including its control-flow quirks (in-loop list mutation, the
    ``direction in "top2bottom"`` substring test, ties re-sorted reversed).
    """
    if len(nodes) == 0:
        return []

    pending_nodes = sorted(nodes, key=lambda x: x.prop["distance"])
    visited = [False] * len(nodes)
    n_visited = 0  # == sum(visited): entries only flip False -> True
    start = pending_nodes.pop(0)
    stack = [start]

    order = []
    open_list = []
    open_set = set()  # ids in open_list (nodes are identity-compared)

    while n_visited < len(nodes):
        while stack:
            is_updated = False
            current = stack.pop()
            if not visited[current.id]:
                parents = current.parents
                if all(visited[parent.id] for parent in parents) or len(parents) == 0:
                    visited[current.id] = True
                    n_visited += 1
                    order.append(current.id)
                    is_updated = True
                else:
                    if id(current) not in open_set:
                        open_list.append(current)
                        open_set.add(id(current))

            if is_updated:
                # same traversal as the reference's reversed()-with-remove
                # loop: open_list has no duplicates, so it empties fully in
                # reverse order onto the stack.
                stack.extend(reversed(open_list))
                open_list.clear()
                open_set.clear()

            if len(current.children) > 0:
                stack.append(current)

            if len(current.children) == 0:
                children = []
                for node in stack:
                    if current in node.parents:
                        children.append(node)
                        stack.remove(node)

                if direction in "top2bottom":
                    children = sorted(
                        children, key=lambda x: x.prop["box"][0], reverse=True
                    )
                elif direction in ["right2left", "left2right"]:
                    children = sorted(
                        children, key=lambda x: x.prop["box"][1], reverse=True
                    )

                stack.extend(children)
                continue

            child = current.children.pop(0)
            stack.append(child)

        for node in pending_nodes:
            if id(node) in open_set:
                continue
            stack.append(node)
            pending_nodes.remove(node)
            break
        else:
            if n_visited < len(nodes) and len(open_list) != 0:
                node = open_list.pop(0)
                open_set.discard(id(node))
                visited[node.id] = True
                n_visited += 1
                order.append(node.id)

    return order


def _between_matrix(axis_mask, lo, hi):
    """between[i, j] = exists k: axis_mask[k, i] and k's interval lies
    strictly inside the band (lo[i], hi[j]) or the mirrored band
    (lo[j], hi[i]).

    ``lo``/``hi`` are the per-node far/near edges on the flow axis (y2/y1
    for top2bottom, x2/x1 for the horizontal modes). Exact vectorization of
    reading_order.py:85-120: the existential over k factorizes into
    per-(i,k) and per-(j,k) terms, so "exists k" becomes a boolean matrix
    product (float32 BLAS). The k==i / k==j cases self-eliminate because a
    box can't lie strictly beyond its own edges.
    """
    s1 = hi  # k's leading edge (y1 / x1)
    s2 = lo  # k's trailing edge (y2 / x2)
    above = (s1[None, :] > lo[:, None]) & (s2[None, :] > lo[:, None])  # [x, k]
    below = (s1[None, :] < hi[:, None]) & (s2[None, :] < hi[:, None])  # [x, k]
    mask_ik = axis_mask.T  # [i, k]
    a = (above & mask_ik).astype(np.float32)
    b = below.astype(np.float32)
    c = (below & mask_ik).astype(np.float32)
    d = above.astype(np.float32)
    return (a @ b.T + c @ d.T) > 0


def _add_edges(nodes, cross_mask, between, forward):
    """Emit precedence links in the reference's (i, j) iteration order.

    ``forward[i, j]`` True when i precedes j by the mode's edge rule; edges
    for cross-overlapping, un-shadowed pairs only. ``add_link`` dedupes, so
    visiting both (i, j) and (j, i) matches the scalar behavior.
    """
    n = len(nodes)
    for i in range(n):
        node = nodes[i]
        for j in range(n):
            if i == j:
                continue
            if cross_mask[i, j] and not between[i, j]:
                if forward[i, j]:
                    node.add_link(nodes[j])
                else:
                    nodes[j].add_link(node)


def _build_graph_small(nodes, direction):
    """Pure-python twin of :func:`_build_graph` for small n.

    The numpy path pays ~50us of fixed array-construction overhead per
    call; word-level reading order runs once per table cell / paragraph
    (tens of thousands of 2-6-element calls per 1k pages), where that
    overhead dominates. All predicates below are integer comparisons with
    the exact semantics of the vectorized path (equivalence fuzz-tested in
    tests/test_reading_order.py); results are bit-identical.
    """
    n = len(nodes)
    boxes = [node.prop["box"] for node in nodes]
    x1 = [int(b[0]) for b in boxes]
    y1 = [int(b[1]) for b in boxes]
    x2 = [int(b[2]) for b in boxes]
    y2 = [int(b[3]) for b in boxes]

    if direction == "top2bottom":
        cross = [
            [min(x2[i], x2[j]) - max(x1[i], x1[j]) > 0 for j in range(n)]
            for i in range(n)
        ]
        lo, hi = y2, y1  # far/near edges on the flow axis
        forward = lambda i, j: y1[i] < y1[j]  # noqa: E731
        distance = [x1[i] + y1[i] for i in range(n)]
        child_key = 0
    else:
        h = [y2[i] - y1[i] for i in range(n)]
        cross = [
            [
                2 * max(min(y2[i], y2[j]) - max(y1[i], y1[j]), 0) >= min(h[i], h[j])
                for j in range(n)
            ]
            for i in range(n)
        ]
        lo, hi = x2, x1
        if direction == "right2left":
            forward = lambda i, j: x2[i] >= x2[j]  # noqa: E731
            mx = max(x2)
            distance = [(mx - x2[i]) + y1[i] for i in range(n)]
        else:  # left2right
            forward = lambda i, j: x2[i] <= x2[j]  # noqa: E731
            distance = [x1[i] * 1 + y1[i] * 5 for i in range(n)]
        child_key = 1

    def between(i, j):
        # exists k crossing i whose interval lies strictly inside the
        # (lo[i], hi[j]) band or the mirrored (lo[j], hi[i]) band — the
        # scalar form of _between_matrix (k == i / k == j self-eliminate)
        for k in range(n):
            if not cross[k][i]:
                continue
            above_ik = hi[k] > lo[i] and lo[k] > lo[i]
            below_jk = hi[k] < hi[j] and lo[k] < hi[j]
            if above_ik and below_jk:
                return True
            below_ik = hi[k] < hi[i] and lo[k] < hi[i]
            above_jk = hi[k] > lo[j] and lo[k] > lo[j]
            if below_ik and above_jk:
                return True
        return False

    for i in range(n):
        node = nodes[i]
        for j in range(n):
            if i == j:
                continue
            if cross[i][j] and not between(i, j):
                if forward(i, j):
                    node.add_link(nodes[j])
                else:
                    nodes[j].add_link(node)

    for i, node in enumerate(nodes):
        node.prop["distance"] = distance[i]
        node.children = sorted(node.children, key=lambda x: x.prop["box"][child_key])


# Below this size the pure-python graph build beats the numpy one (fixed
# array-construction overhead vs O(n^2)..O(n^3) scalar loops).
_SMALL_GRAPH_N = 10


def _build_graph(nodes, direction):
    """Graph construction for all three modes; parity with
    reading_order.py:123-198 (edge predicates, distance keys, child sort).
    """
    if len(nodes) <= _SMALL_GRAPH_N:
        return _build_graph_small(nodes, direction)
    boxes = np.asarray([node.prop["box"] for node in nodes], dtype=np.int64)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]

    if direction == "top2bottom":
        # cross axis = x: any horizontal overlap (is_intersected_vertical)
        ix = np.minimum(x2[:, None], x2[None, :]) - np.maximum(x1[:, None], x1[None, :])
        cross = ix > 0
        between = _between_matrix(cross, y2, y1)
        forward = y1[:, None] < y1[None, :]  # upper box reads first
        distance = x1 + y1
        child_key = 0  # children sorted by x1
    else:
        # cross axis = y: >=50% overlap of the shorter height
        # (is_intersected_horizontal @0.5; ints, so 2*overlap >= min_h)
        iy = np.minimum(y2[:, None], y2[None, :]) - np.maximum(y1[:, None], y1[None, :])
        h = y2 - y1
        min_h = np.minimum(h[:, None], h[None, :])
        cross = 2 * np.maximum(iy, 0) >= min_h
        between = _between_matrix(cross, x2, x1)
        if direction == "right2left":
            forward = x2[:, None] >= x2[None, :]  # rightmost first (ties: i)
            distance = (int(x2.max()) - x2) + y1
        else:  # left2right
            forward = x2[:, None] <= x2[None, :]  # leftmost first (ties: i)
            distance = x1 * 1 + y1 * 5
        child_key = 1  # children sorted by y1

    _add_edges(nodes, cross, between, forward)
    for i, node in enumerate(nodes):
        node.prop["distance"] = int(distance[i])
        node.children = sorted(node.children, key=lambda x: x.prop["box"][child_key])


def _chain_order(elements, direction):
    """Reading order for a STRICT CHAIN, or None if not one.

    A chain = elements pairwise overlapping on the cross axis and strictly
    separated on the flow axis (every box ends before the next begins).
    ~2/3 of real word-level calls are chains (single text lines / single
    stacked columns); for them the precedence graph is provably a path —
    every non-adjacent pair has the middle element strictly inside the
    betweenness band, so the only edges are consecutive ones and the DFS
    emits the flow-axis sort. Checks are O(n log n):

    - flow separation: strict ``far_edge[i] < near_edge[i+1]`` down the sort;
    - pairwise cross overlap: 1-D Helly — intervals pairwise intersect iff
      ``min(right) > max(left)`` (top2bottom); for the horizontal modes the
      >=50%-of-min-height predicate is implied by the conservative
      ``2*(min(y2) - max(y1)) >= max(height)``, which only under-triggers.
    """
    boxes = [list(e.box) for e in elements]
    if direction == "top2bottom":
        idx = sorted(range(len(boxes)), key=lambda i: boxes[i][1])
        for a, b in zip(idx, idx[1:]):
            if not boxes[a][3] < boxes[b][1]:
                return None
        if not min(b[2] for b in boxes) > max(b[0] for b in boxes):
            return None
        return idx
    # horizontal flow: conservative common-band check
    if 2 * (min(b[3] for b in boxes) - max(b[1] for b in boxes)) < max(
        b[3] - b[1] for b in boxes
    ):
        return None
    idx = sorted(range(len(boxes)), key=lambda i: boxes[i][0])
    for a, b in zip(idx, idx[1:]):
        if not boxes[a][2] < boxes[b][0]:
            return None
    if direction == "right2left":
        idx.reverse()
    return idx


def prediction_reading_order(elements, direction):
    """Assign ``order`` ints to elements in reading order (mutates in place).

    Parity: reading_order.py:201-223. ``elements`` need only expose a ``box``
    attribute (xyxy) and a writable ``order`` attribute.
    """
    if len(elements) < 2:
        return elements
    if direction not in ("top2bottom", "right2left", "left2right"):
        raise ValueError(f"Invalid direction: {direction}")

    chain = _chain_order(elements, direction)
    if chain is not None:
        for i, index in enumerate(chain):
            elements[index].order = i
        return elements

    nodes = [Node(i, {"box": list(element.box)}) for i, element in enumerate(elements)]
    _build_graph(nodes, direction)

    order = _priority_dfs(nodes, direction)
    for i, index in enumerate(order):
        elements[index].order = i

    return elements
