"""Key-value extraction over cell adjacency DAGs.

Port of the reference's KV parser (``/root/reference/src/yomitoku/
kv_parser.py:14-345``): group matching (best-overlap N:1 with pseudo-group
for orphans), directional adjacency DAG (R/L/D/U), per-cluster direction
vote (more distinct leaves wins), DFS key-path collection, keyless orphan
items. Uses networkx like the reference so edge/iteration order matches.
"""

from __future__ import annotations

import networkx as nx

from ..kernels.geometry import (
    calc_overlap_ratio,
    is_bottom_adjacent,
    is_contained,
    is_right_adjacent,
)
from .schemas import KvItem

PSEUDO_GROUP_ID = "__unmatched__"


def _matching_group_and_cells(nodes, groups):
    """Parity: kv_parser.py:14-91."""
    match = {
        "header_to_group": {},
        "group_to_cells": {},
        "cell_to_group": {},
        "group_to_headers": {},
    }
    if len(groups) == 0:
        return match

    matched_cell_to_group = {}
    for cell in nodes["cell"] + nodes["empty"]:
        best_group_id = None
        best_ratio = 0.0
        for group in groups:
            if is_contained(group.box, cell.box, threshold=0.2):
                ratio = calc_overlap_ratio(cell.box, group.box)[0]
                if ratio > best_ratio:
                    best_ratio = ratio
                    best_group_id = group.id
        if best_group_id is not None:
            matched_cell_to_group[cell.id] = best_group_id

    matched_header_to_group = {}
    for header in nodes["header"]:
        best_group_id = None
        best_ratio = 0.0
        for group in groups:
            if is_contained(group.box, header.box, threshold=0.2):
                ratio = calc_overlap_ratio(header.box, group.box)[0]
                if ratio > best_ratio:
                    best_ratio = ratio
                    best_group_id = group.id
        if best_group_id is not None:
            matched_header_to_group[header.id] = best_group_id

    unmatched_cells = [
        c.id for c in nodes["cell"] + nodes["empty"] if c.id not in matched_cell_to_group
    ]
    unmatched_headers = [
        h.id for h in nodes["header"] if h.id not in matched_header_to_group
    ]
    if unmatched_cells or unmatched_headers:
        for cell_id in unmatched_cells:
            matched_cell_to_group[cell_id] = PSEUDO_GROUP_ID
        for header_id in unmatched_headers:
            matched_header_to_group[header_id] = PSEUDO_GROUP_ID

    match["cell_to_group"] = matched_cell_to_group
    match["header_to_group"] = matched_header_to_group

    group_to_cells = {}
    for cell_id, group_id in matched_cell_to_group.items():
        group_to_cells.setdefault(group_id, []).append(cell_id)
    match["group_to_cells"] = group_to_cells

    group_to_headers = {}
    for header_id, group_id in matched_header_to_group.items():
        group_to_headers.setdefault(group_id, []).append(header_id)
    match["group_to_headers"] = group_to_headers
    return match


def _calc_adjacent_header_to_cell(dag, match, headers, cells):
    """Parity: kv_parser.py:94-121."""
    cell_to_group = match["cell_to_group"]
    header_to_group = match["header_to_group"]
    for header in headers:
        header_group_id = header_to_group.get(header.id)
        if header_group_id is None:
            continue
        for cell in cells:
            cell_group_id = cell_to_group.get(cell.id)
            if cell_group_id is None:
                continue
            if header_group_id != cell_group_id:
                continue
            if is_right_adjacent(header.box, cell.box):
                dag.add_edge(header.id, cell.id, dir="R")
                dag.add_edge(cell.id, header.id, dir="L")
            if is_bottom_adjacent(header.box, cell.box):
                dag.add_edge(header.id, cell.id, dir="D")
                dag.add_edge(cell.id, header.id, dir="U")


def _calc_adjacent_header_to_header(dag, match, nodes):
    """Parity: kv_parser.py:124-160."""
    header_to_group = match["header_to_group"]
    for node in nodes:
        for potential_parent in nodes:
            if node.id == potential_parent.id:
                continue
            pg = header_to_group.get(potential_parent.id)
            ng = header_to_group.get(node.id)
            if pg is None or ng is None:
                continue
            is_same_group = pg == ng
            has_unmatched = pg == PSEUDO_GROUP_ID or ng == PSEUDO_GROUP_ID
            if not is_same_group and not has_unmatched:
                continue
            if is_right_adjacent(potential_parent.box, node.box):
                dag.add_edge(potential_parent.id, node.id, dir="R")
                dag.add_edge(node.id, potential_parent.id, dir="L")
            if is_bottom_adjacent(potential_parent.box, node.box):
                dag.add_edge(potential_parent.id, node.id, dir="D")
                dag.add_edge(node.id, potential_parent.id, dir="U")


def _calc_adjacent_cell_to_cell(dag, match, nodes):
    """Parity: kv_parser.py:163-196."""
    cell_to_group = match["cell_to_group"]
    for node in nodes:
        node_group_id = cell_to_group.get(node.id)
        if node_group_id is None:
            continue
        for potential_parent in nodes:
            if node.id == potential_parent.id:
                continue
            pg = cell_to_group.get(potential_parent.id)
            if pg is None:
                continue
            if node_group_id != pg:
                continue
            if is_right_adjacent(potential_parent.box, node.box):
                dag.add_edge(potential_parent.id, node.id, dir="R")
                dag.add_edge(node.id, potential_parent.id, dir="L")
            if is_bottom_adjacent(potential_parent.box, node.box):
                dag.add_edge(potential_parent.id, node.id, dir="D")
                dag.add_edge(node.id, potential_parent.id, dir="U")


def get_kv_items_dag(nodes, groups):
    """Parity: kv_parser.py:199-229."""
    match = _matching_group_and_cells(nodes, groups)
    dag = nx.DiGraph()
    for node in nodes["header"] + nodes["cell"] + nodes["empty"]:
        dag.add_node(
            node.id, id=node.id, bbox=node.box, role=node.role, contents=node.contents
        )
    _calc_adjacent_header_to_cell(dag, match, nodes["header"], nodes["cell"])
    _calc_adjacent_header_to_cell(dag, match, nodes["header"], nodes["empty"])
    _calc_adjacent_header_to_header(dag, match, nodes["header"])
    _calc_adjacent_cell_to_cell(dag, match, nodes["cell"])
    return dag


def _merge_bbox(box1, box2):
    return [
        min(box1[0], box2[0]),
        min(box1[1], box2[1]),
        max(box1[2], box2[2]),
        max(box1[3], box2[3]),
    ]


def _find_root_headers(dag, direction, node_set=None):
    """Parity: kv_parser.py:241-262."""
    if node_set is None:
        node_set = set(dag.nodes)
    # sorted: set iteration must not leak PYTHONHASHSEED into output order
    headers = [n for n in sorted(node_set) if dag.nodes[n]["role"] == "header"]
    roots = []
    for h in headers:
        has_parent_header = False
        for u in dag.predecessors(h):
            if u not in node_set:
                continue
            if dag.nodes[u]["role"] != "header":
                continue
            if dag[u][h].get("dir") == direction:
                has_parent_header = True
                break
        if not has_parent_header:
            roots.append(h)
    return roots


def _dfs_collect_kv(dag, node_id, key_path, kv_items, cells, kv_cells, allowed_dir):
    """Parity: kv_parser.py:265-290."""
    node = dag.nodes[node_id]
    if node["role"] in ("cell", "empty"):
        keys = list(key_path)
        box = (
            _merge_bbox(cells[node_id].box, cells[keys[0]].box)
            if keys
            else cells[node_id].box
        )
        kv_items.append(KvItem(id=None, key=keys, value=node_id, box=box))
        kv_cells[node_id] = cells[node_id]
        for k in keys:
            kv_cells[k] = cells[k]
        return

    new_key_path = key_path + [node_id]
    for v in dag.successors(node_id):
        if v in new_key_path:
            continue
        if dag[node_id][v].get("dir") == allowed_dir:
            _dfs_collect_kv(dag, v, new_key_path, kv_items, cells, kv_cells, allowed_dir)


def parse_kv_items(clustered_nodes, nodes, cells):
    """Parity: kv_parser.py:293-345."""
    dag = get_kv_items_dag(clustered_nodes, nodes["group"])

    kv_items = []
    kv_cells = {}

    for component in nx.weakly_connected_components(dag):
        node_set = set(component)

        h_root_headers = _find_root_headers(dag, "R", node_set)
        h_kv_items = []
        h_kv_cells = {}
        for root_id in h_root_headers:
            _dfs_collect_kv(dag, root_id, [], h_kv_items, cells, h_kv_cells, "R")

        v_root_headers = _find_root_headers(dag, "D", node_set)
        v_kv_items = []
        v_kv_cells = {}
        for root_id in v_root_headers:
            _dfs_collect_kv(dag, root_id, [], v_kv_items, cells, v_kv_cells, "D")

        h_leaves = len({kv.value for kv in h_kv_items})
        v_leaves = len({kv.value for kv in v_kv_items})

        if v_leaves > h_leaves:
            kv_items.extend(v_kv_items)
            kv_cells.update(v_kv_cells)
            remove_dirs = ("R", "L")
        else:
            kv_items.extend(h_kv_items)
            kv_cells.update(h_kv_cells)
            remove_dirs = ("D", "U")

        edges_to_remove = [
            (u, v)
            for u, v, d in dag.edges(node_set, data=True)
            if v in node_set and d.get("dir") in remove_dirs
        ]
        dag.remove_edges_from(edges_to_remove)

    visited_values = {kv.value for kv in kv_items}
    for cell in clustered_nodes["cell"] + clustered_nodes["empty"]:
        if cell.id not in visited_values:
            kv_items.append(KvItem(id=None, key=[], value=cell.id, box=cell.box))
            kv_cells[cell.id] = cells[cell.id]

    return kv_items, dag, kv_cells
