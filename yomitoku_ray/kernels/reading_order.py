"""Reading-order estimation: spatial precedence DAG + priority DFS.

Faithful re-implementation of the reference's reading-order semantics
(``/root/reference/src/yomitoku/reading_order.py:14-223``), including its
control-flow quirks (open-list re-queuing, in-loop list mutation, the
``direction in "top2bottom"`` substring test). This is the central per-page
"sort" of the engine: it runs per row inside ``map_batches`` — never as a
Ray-level sort, because order is a per-document notion.
"""

from __future__ import annotations

import numpy as np

from .geometry import is_intersected_horizontal, is_intersected_vertical
from .graph import Node

# Above this node count the O(n^2) pair loop with its O(n) betweenness scan
# switches to a vectorized numpy build with identical edge semantics and
# identical add_link ordering (verified by the parity test in
# tests/test_reading_order.py). Boxes are ints, so numpy int comparisons are
# exact replicas of the scalar code.
_VECTORIZE_MIN_NODES = 8


def _priority_dfs(nodes, direction):
    """Parity: reading_order.py:14-82."""
    if len(nodes) == 0:
        return []

    pending_nodes = sorted(nodes, key=lambda x: x.prop["distance"])
    visited = [False] * len(nodes)
    start = pending_nodes.pop(0)
    stack = [start]

    order = []
    open_list = []

    while not all(visited):
        while stack:
            is_updated = False
            current = stack.pop()
            if not visited[current.id]:
                parents = current.parents
                if all(visited[parent.id] for parent in parents) or len(parents) == 0:
                    visited[current.id] = True
                    order.append(current.id)
                    is_updated = True
                else:
                    if current not in open_list:
                        open_list.append(current)

            if is_updated:
                for open_node in reversed(open_list):
                    stack.append(open_node)
                    open_list.remove(open_node)

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
            if node in open_list:
                continue
            stack.append(node)
            pending_nodes.remove(node)
            break
        else:
            if not all(visited) and len(open_list) != 0:
                node = open_list.pop(0)
                visited[node.id] = True
                order.append(node.id)

    return order


def _exist_other_node_between_vertical(node, other_node, nodes):
    """Parity: reading_order.py:85-101."""
    for search_node in nodes:
        if search_node is node or search_node is other_node:
            continue

        _, sy1, _, sy2 = search_node.prop["box"]
        _, oy1, _, oy2 = other_node.prop["box"]
        _, ny1, _, ny2 = node.prop["box"]

        if is_intersected_vertical(search_node.prop["box"], node.prop["box"]):
            if ny2 < sy1 < oy1 and ny2 < sy2 < oy1:
                return True
            if oy2 < sy1 < ny1 and oy2 < sy2 < ny1:
                return True
    return False


def _exist_other_node_between_horizontal(node, other_node, nodes):
    """Parity: reading_order.py:104-120."""
    for search_node in nodes:
        if search_node is node or search_node is other_node:
            continue

        sx1, _, sx2, _ = search_node.prop["box"]
        ox1, _, ox2, _ = other_node.prop["box"]
        nx1, _, nx2, _ = node.prop["box"]

        if is_intersected_horizontal(search_node.prop["box"], node.prop["box"]):
            if nx2 < sx1 < ox1 and nx2 < sx2 < ox1:
                return True
            if ox2 < sx1 < nx1 and ox2 < sx2 < nx1:
                return True
    return False


def _create_graph_top2bottom(nodes):
    """Parity: reading_order.py:123-145."""
    for i, node in enumerate(nodes):
        for j, other_node in enumerate(nodes):
            if i == j:
                continue
            if is_intersected_vertical(node.prop["box"], other_node.prop["box"]):
                ty = node.prop["box"][1]
                oy = other_node.prop["box"][1]
                if _exist_other_node_between_vertical(node, other_node, nodes):
                    continue
                if ty < oy:
                    node.add_link(other_node)
                else:
                    other_node.add_link(node)

            node.prop["distance"] = node.prop["box"][0] + node.prop["box"][1]

    for node in nodes:
        node.children = sorted(node.children, key=lambda x: x.prop["box"][0])


def _create_graph_right2left(nodes):
    """Parity: reading_order.py:148-171."""
    max_x = max(node.prop["box"][2] for node in nodes)

    for i, node in enumerate(nodes):
        for j, other_node in enumerate(nodes):
            if i == j:
                continue
            if is_intersected_horizontal(node.prop["box"], other_node.prop["box"]):
                tx = node.prop["box"][2]
                ox = other_node.prop["box"][2]
                if _exist_other_node_between_horizontal(node, other_node, nodes):
                    continue
                if tx < ox:
                    other_node.add_link(node)
                else:
                    node.add_link(other_node)

            node.prop["distance"] = (max_x - node.prop["box"][2]) + node.prop["box"][1]

    for node in nodes:
        node.children = sorted(node.children, key=lambda x: x.prop["box"][1])


def _create_graph_left2right(nodes, x_weight=1, y_weight=5):
    """Parity: reading_order.py:174-198."""
    for i, node in enumerate(nodes):
        for j, other_node in enumerate(nodes):
            if i == j:
                continue
            if is_intersected_horizontal(node.prop["box"], other_node.prop["box"]):
                tx = node.prop["box"][2]
                ox = other_node.prop["box"][2]
                if _exist_other_node_between_horizontal(node, other_node, nodes):
                    continue
                if ox < tx:
                    other_node.add_link(node)
                else:
                    node.add_link(other_node)

            node.prop["distance"] = (
                node.prop["box"][0] * x_weight + node.prop["box"][1] * y_weight
            )

    for node in nodes:
        node.children = sorted(node.children, key=lambda x: x.prop["box"][1])


def _boxes_array(nodes):
    return np.asarray([node.prop["box"] for node in nodes], dtype=np.int64)


def _between_matrix(axis_mask, lo, hi):
    """between[i, j] = exists k: axis_mask[k, i] and lo[i] < k's interval < hi[j]
    (both interval endpoints strictly inside), OR the (j, i)-mirrored band.

    ``lo``/``hi`` are the per-node far/near edges on the flow axis (y2/y1 for
    top2bottom, x2/x1 for horizontal modes). Exact vectorization of
    reading_order.py:85-120 — the k==i / k==j cases self-eliminate because a
    box can't be strictly beyond its own edges.
    """
    s1 = hi  # k's leading edge (y1 / x1)
    s2 = lo  # k's trailing edge (y2 / x2)
    # The existential over k factorizes into per-(i,k) and per-(j,k) terms,
    # so "exists k" is a boolean matrix product (computed via float32 BLAS):
    #   band (i -> j): mask[k,i] & s1[k],s2[k] > lo[i]  (A)  &  < hi[j]  (B)
    #   band (j -> i): mask[k,i] & s1[k],s2[k] < hi[i]  (C)  &  > lo[j]  (D)
    above = (s1[None, :] > lo[:, None]) & (s2[None, :] > lo[:, None])  # [x, k]
    below = (s1[None, :] < hi[:, None]) & (s2[None, :] < hi[:, None])  # [x, k]
    mask_ik = axis_mask.T  # [i, k]
    a = (above & mask_ik).astype(np.float32)
    b = below.astype(np.float32)
    c = (below & mask_ik).astype(np.float32)
    d = above.astype(np.float32)
    return (a @ b.T + c @ d.T) > 0


def _vec_create_graph_top2bottom(nodes):
    boxes = _boxes_array(nodes)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    # is_intersected_vertical: any x-overlap (geometry.py:73-79)
    ix = np.minimum(x2[:, None], x2[None, :]) - np.maximum(x1[:, None], x1[None, :])
    vi = ix > 0
    between = _between_matrix(vi, y2, y1)
    for i, node in enumerate(nodes):
        for j, other_node in enumerate(nodes):
            if i == j:
                continue
            if vi[i, j] and not between[i, j]:
                if y1[i] < y1[j]:
                    node.add_link(other_node)
                else:
                    other_node.add_link(node)
        node.prop["distance"] = int(x1[i] + y1[i])
    for node in nodes:
        node.children = sorted(node.children, key=lambda x: x.prop["box"][0])


def _horizontal_mask(boxes):
    """is_intersected_horizontal @0.5 as a matrix (geometry.py:65-70)."""
    y1, y2 = boxes[:, 1], boxes[:, 3]
    iy = np.minimum(y2[:, None], y2[None, :]) - np.maximum(y1[:, None], y1[None, :])
    h = y2 - y1
    min_h = np.minimum(h[:, None], h[None, :])
    overlap = np.maximum(iy, 0)
    # (overlap / min_h) >= 0.5  <=>  2*overlap >= min_h  (min_h > 0, ints)
    return 2 * overlap >= min_h


def _vec_create_graph_right2left(nodes):
    boxes = _boxes_array(nodes)
    x1, y1, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2]
    max_x = int(x2.max())
    hi_mask = _horizontal_mask(boxes)
    between = _between_matrix(hi_mask, x2, x1)
    for i, node in enumerate(nodes):
        for j, other_node in enumerate(nodes):
            if i == j:
                continue
            if hi_mask[i, j] and not between[i, j]:
                if x2[i] < x2[j]:
                    other_node.add_link(node)
                else:
                    node.add_link(other_node)
        node.prop["distance"] = int((max_x - x2[i]) + y1[i])
    for node in nodes:
        node.children = sorted(node.children, key=lambda x: x.prop["box"][1])


def _vec_create_graph_left2right(nodes, x_weight=1, y_weight=5):
    boxes = _boxes_array(nodes)
    x1, y1, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2]
    hi_mask = _horizontal_mask(boxes)
    between = _between_matrix(hi_mask, x2, x1)
    for i, node in enumerate(nodes):
        for j, other_node in enumerate(nodes):
            if i == j:
                continue
            if hi_mask[i, j] and not between[i, j]:
                if x2[j] < x2[i]:
                    other_node.add_link(node)
                else:
                    node.add_link(other_node)
        node.prop["distance"] = int(x1[i] * x_weight + y1[i] * y_weight)
    for node in nodes:
        node.children = sorted(node.children, key=lambda x: x.prop["box"][1])


def prediction_reading_order(elements, direction):
    """Assign ``order`` ints to elements in reading order (mutates in place).

    Parity: reading_order.py:201-223. ``elements`` need only expose a ``box``
    attribute (xyxy) and a writable ``order`` attribute.
    """
    if len(elements) < 2:
        return elements

    nodes = [Node(i, {"box": list(element.box)}) for i, element in enumerate(elements)]
    vec = len(nodes) >= _VECTORIZE_MIN_NODES
    if direction == "top2bottom":
        (_vec_create_graph_top2bottom if vec else _create_graph_top2bottom)(nodes)
    elif direction == "right2left":
        (_vec_create_graph_right2left if vec else _create_graph_right2left)(nodes)
    elif direction == "left2right":
        (_vec_create_graph_left2right if vec else _create_graph_left2right)(nodes)
    else:
        raise ValueError(f"Invalid direction: {direction}")

    order = _priority_dfs(nodes, direction)
    for i, index in enumerate(order):
        elements[index].order = i

    return elements
