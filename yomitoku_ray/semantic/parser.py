"""Semantic form parsing: role clustering, grid-vs-KV classification, ids.

Port of the reference's TableSemanticParser deterministic core
(``/root/reference/src/yomitoku/table_semantic_parser.py:39-224,309-388,
471-541,624-741``). The neural CellDetector is replaced by the DOM cell
detector (``detect_cells_from_page``): ``th`` -> header, ``td`` with text ->
cell, empty ``td`` -> empty, each ``<tbody>`` of a multi-tbody table -> a
group region (the analogue of the reference's visual group class,
table_cell_detector.py:185-474).
"""

from __future__ import annotations

import numpy as np

from ..kernels.geometry import quad_to_xyxy
from ..kernels.geometry_vec import (
    bottom_adjacency_matrix,
    right_adjacency_matrix,
)
from ..kernels.graph import LabeledDiGraph
from ..kernels.reading_order import prediction_reading_order
from ..models import Paragraph
from .grid_parser import parse_grid_from_bottom_up
from .kv_parser import parse_kv_items
from .schemas import (
    SemanticDocument,
    SemanticParagraph,
    TableSemanticContents,
)


def _split_nodes_with_role(cells):
    """Parity: table_semantic_parser.py:39-55."""
    nodes = {"header": [], "group": [], "cell": [], "empty": []}
    for cell in cells:
        if cell.role not in nodes:
            nodes[cell.role] = []
        nodes[cell.role].append(cell)
    return nodes


def get_cell_by_id(cells, cell_id):
    for cell in cells:
        if cell.id == cell_id:
            return cell
    return None


def _get_cluster_nodes(clusters, nodes):
    """Parity: table_semantic_parser.py:65-81."""
    clustered_nodes_list = []
    for cluster in clusters:
        clustered_nodes = {"header": [], "cell": [], "empty": []}
        # components are sets: iterate sorted so output is independent of
        # PYTHONHASHSEED (each Ray worker has its own) — the reference
        # iterates the raw set (table_semantic_parser.py:75), which is
        # nondeterministic across processes; a distributed engine can't be.
        for id in sorted(cluster):
            node = get_cell_by_id(nodes["header"] + nodes["cell"] + nodes["empty"], id)
            clustered_nodes[node.role].append(node)
        clustered_nodes_list.append(clustered_nodes)
    return clustered_nodes_list


def drop_single_out_edge_by_type(G, edge_type):
    """Parity: table_semantic_parser.py:84-92."""
    to_remove = []
    for u in G.nodes:
        outs = [(u, v) for v in G.succ_by(u, edge_type)]
        if len(outs) == 1:
            to_remove.append(outs[0])
    G.remove_edges_from(to_remove)
    return to_remove


def _weakly_cluster_nodes_with_graph(nodes):
    """Heuristic adjacency DAG + weakly connected components.

    Parity: table_semantic_parser.py:101-187 — edge insertion order and
    same-pair label overwrites match the reference's nested loops exactly;
    the adjacency predicates themselves are evaluated as broadcasted
    matrices (kernels/geometry_vec) instead of O(n^2) scalar calls.
    """
    dag = LabeledDiGraph()
    for role in nodes:
        for node in nodes[role]:
            if role not in ["header", "cell", "empty"]:
                continue
            dag.add_node(node.id, bbox=node.box, role=node.role)

    H = nodes["header"]
    CE = nodes["cell"] + nodes["empty"]
    E = nodes["empty"]
    hb = np.asarray([h.box for h in H], dtype=np.float64) if H else None
    ceb = np.asarray([c.box for c in CE], dtype=np.float64) if CE else None

    if H:
        if CE:
            hc_nest = bottom_adjacency_matrix(hb, ceb, rule="nest")
            hc_soft = right_adjacency_matrix(hb, ceb, rule="soft")
        hh_soft = right_adjacency_matrix(hb, hb, rule="soft")
        hh_child = bottom_adjacency_matrix(hb, hb, rule="child")
    for i, header in enumerate(H):
        if CE:
            for j in np.nonzero(hc_nest[i] | hc_soft[i])[0]:
                cell = CE[j]
                if hc_nest[i, j]:
                    dag.add_edge(header.id, cell.id, dir="D")
                if hc_soft[i, j]:
                    dag.add_edge(header.id, cell.id, dir="D")
        for j in np.nonzero(hh_soft[i] | hh_child[i])[0]:
            header2 = H[j]
            if header.id == header2.id:
                continue
            if hh_soft[i, j]:
                dag.add_edge(header.id, header2.id, dir="D")
            if hh_child[i, j]:
                dag.add_edge(header.id, header2.id, dir="nest")

    drop_single_out_edge_by_type(dag, edge_type="nest")
    dag.relabel_edges("nest", "D")

    if CE:
        cc_soft = right_adjacency_matrix(ceb, ceb, rule="soft")
        cc_hard = bottom_adjacency_matrix(ceb, ceb, rule="hard")
        for i, cell1 in enumerate(CE):
            for j in np.nonzero(cc_soft[i] | cc_hard[i])[0]:
                cell2 = CE[j]
                if cell1.id == cell2.id:
                    continue
                if cc_soft[i, j]:
                    dag.add_edge(cell1.id, cell2.id, dir="D")
                if cc_hard[i, j]:
                    dag.add_edge(cell1.id, cell2.id, dir="D")

    if E and H:
        eb = np.asarray([e.box for e in E], dtype=np.float64)
        eh_bot = bottom_adjacency_matrix(eb, hb, rule="hard")
        eh_rgt = right_adjacency_matrix(eb, hb, rule="hard")
        for i, empty in enumerate(E):
            for j in np.nonzero(eh_bot[i] | eh_rgt[i])[0]:
                header = H[j]
                if eh_bot[i, j]:
                    dag.add_edge(empty.id, header.id, dir="D")
                if eh_rgt[i, j]:
                    dag.add_edge(empty.id, header.id, dir="D")

    return list(dag.weakly_connected_components()), dag


def _count_edge_components(pairs):
    """Connected-component count over ONLY the nodes incident to ``pairs``
    (the nx.Graph(edge_list) semantics: isolates excluded)."""
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    return len({find(u) for u in parent})


def is_grid_cluster(nodes):
    """Parity: table_semantic_parser.py:190-224.

    The reference builds a DiGraph where a later right-hard edge OVERWRITES
    a bottom-hard edge on the same ordered pair (single dir attr); the V
    subgraph therefore contains bottom-hard pairs that are NOT right-hard.
    """
    CE = nodes["cell"] + nodes["empty"]
    if not CE:
        return False
    boxes = np.asarray([c.box for c in CE], dtype=np.float64)
    bot = bottom_adjacency_matrix(boxes, boxes, rule="hard")
    rgt = right_adjacency_matrix(boxes, boxes, rule="hard")
    np.fill_diagonal(bot, False)
    np.fill_diagonal(rgt, False)
    ids = [c.id for c in CE]
    # same-id (not just same-index) pairs are skipped, as in the reference
    if len(set(ids)) != len(ids):
        for i in range(len(ids)):
            for j in range(len(ids)):
                if i != j and ids[i] == ids[j]:
                    bot[i, j] = rgt[i, j] = False

    v_pairs = [
        (ids[i], ids[j]) for i, j in zip(*np.nonzero(bot & ~rgt))
    ]
    h_pairs = [(ids[i], ids[j]) for i, j in zip(*np.nonzero(rgt))]
    return _count_edge_components(h_pairs) > 1 and _count_edge_components(v_pairs) > 1


def sort_cells(cells, offset=0):
    """Sort by (y1 // min_height, x1), remap ids c0... Parity: :309-329."""
    cells = list(cells)
    if len(cells) == 0:
        return cells, {}

    min_height = min((cell.box[3] - cell.box[1]) for cell in cells)

    values = [c for c in cells if c.role in ["cell", "header", "empty"]]
    groups = [c for c in cells if c.role == "group"]

    values = sorted(values, key=lambda x: (x.box[1] // min_height, x.box[0]))
    groups = sorted(groups, key=lambda x: (x.box[1], x.box[0]))

    cells = values + groups
    remap_ids = {}
    for i, cell in enumerate(cells):
        new_id = f"c{str(i + offset)}"
        remap_ids[cell.id] = new_id
        cell.id = new_id
    return cells, remap_ids


def _sort_elements(elements, prefix="t"):
    """Parity: table_semantic_parser.py:332-342."""
    if len(elements) == 0:
        return elements
    min_height = min((e.box[3] - e.box[1]) for e in elements)
    elements = sorted(elements, key=lambda x: (x.box[1] // min_height, x.box[0]))
    for i, elem in enumerate(elements):
        elem.id = f"{prefix}{str(i)}"
    return elements


def _assign_ids(table_information, cell_offset=0):
    """Parity: table_semantic_parser.py:345-388."""
    for i, grid in enumerate(table_information["grids"]):
        grid.id = f"g{i}"
    for i, kv in enumerate(table_information["kv_items"]):
        kv.id = f"kv{i}"

    cells, remap_ids = sort_cells(
        table_information["cells"].values(), offset=cell_offset
    )
    table_information["cells"] = {cell.id: cell for cell in cells}

    for kv in table_information["kv_items"]:
        kv.key = [remap_ids[k] for k in kv.key]
        kv.value = remap_ids[kv.value]

    for grid in table_information["grids"]:
        grid.data = [
            [remap_ids[id] if id is not None else None for id in row]
            for row in grid.data
        ]
        grid.col_headers = [
            [remap_ids[ck] if ck is not None else None for ck in header]
            for header in grid.col_headers
        ]

    return cell_offset + len(cells)


def aggregate_cells(words, cells, overlap_th=0.2, word_boxes=None, word_boxes_np=None):
    """Best-overlap word->cell assignment + per-cell ordered join.

    Parity: table_semantic_parser.py:471-517 (note: cell text strips
    newlines and spaces at the edges, unlike the DocumentAnalyzer join).
    ``cells`` may be SemanticCells or paragraph Elements (anything with
    box/contents and not role 'group').

    The assignment is one broadcasted overlap-ratio matrix
    (kernels/geometry_vec.overlap_ratio_matrix, bit-identical to the scalar
    calc_overlap_ratio loop it replaced — the reference's per-word-per-cell
    nested loop was the top profile entry of the semantic pipeline).
    argmax picks the first maximal cell, matching the scalar strict-``>``
    first-winner rule.
    """
    import numpy as np
    from collections import defaultdict

    from ..kernels.geometry_vec import overlap_ratio_matrix

    cell_word_idxs = defaultdict(list)

    value_cells = [c for c in cells if c.role != "group"]
    if word_boxes is None:
        word_boxes = [quad_to_xyxy(w.points) for w in words]
    if value_cells and len(word_boxes):
        # (cells, words) ratio matrix; scalar loop order = cells inner.
        if word_boxes_np is None:
            word_boxes_np = np.asarray(word_boxes, dtype=np.float64)
        ratios = overlap_ratio_matrix(
            np.asarray([c.box for c in value_cells], dtype=np.float64),
            word_boxes_np,
        )
        best_idx = np.argmax(ratios, axis=0)  # first max == first strict-> winner
        best_ratio = ratios[best_idx, np.arange(len(word_boxes))]
        for w_i in range(len(words)):
            if best_ratio[w_i] < overlap_th or best_ratio[w_i] <= 0:
                continue
            cell_word_idxs[id(value_cells[best_idx[w_i]])].append(w_i)

    for cell in cells:
        idxs = cell_word_idxs.get(id(cell), [])
        if not idxs:
            cell.contents = ""
            continue
        if len(idxs) == 1:
            # single-word cell (the common case): reading order is the
            # identity and the join is the word itself — skip the
            # Paragraph/order/sort machinery (same bytes, ~noop cost)
            cell.contents = words[idxs[0]].content.replace("\n", "").strip()
            continue
        contained = [
            Paragraph(
                box=list(word_boxes[i]),
                contents=words[i].content,
                direction=words[i].direction,
                order=0,
                role=None,
            )
            for i in idxs
        ]
        dirs = [w.direction for w in contained]
        direction = (
            "horizontal"
            if dirs.count("horizontal") >= dirs.count("vertical")
            else "vertical"
        )
        order = "left2right" if direction == "horizontal" else "right2left"
        prediction_reading_order(contained, order)
        contained = sorted(contained, key=lambda x: x.order)
        text = "\n".join(w.contents for w in contained)
        cell.contents = text.replace("\n", "").strip()


def replace_table_to_paragraphs(tables, paragraphs):
    """Degenerate tables (<2 real cells) demoted to paragraphs.

    Parity: table_semantic_parser.py:519-540.
    """
    new_table_list = []
    for table in tables:
        cnt_cell = sum(1 for c in table["cells"] if c.role in ["cell", "header"])
        if cnt_cell < 2:
            paragraphs.append(
                SemanticParagraph(
                    id=None, box=list(table["box"]), contents="", score=1.0, role=None
                )
            )
        else:
            new_table_list.append(table)
    return new_table_list


def parse_semantic_tables(
    semantic_tables,
    words,
    paragraphs,
    merge_same_column_values=False,
    grid_only=False,
    kv_only=False,
) -> SemanticDocument:
    """Per-page semantic parse. Parity: table_semantic_parser.py:624-741.

    ``semantic_tables``: list of dicts {box, cells: list[SemanticCell]}
    (cells include group regions); ``paragraphs``: list[SemanticParagraph].
    """
    # Word boxes are table-independent: compute once per page, not once per
    # aggregate_cells call (the quad_to_xyxy-per-table repeat was a top
    # profile entry at 100k-page scale). The vectorized batch form plus a
    # single float64 view also hoists the per-table np.asarray conversion.
    from ..analyze import word_boxes_array

    wb_np = word_boxes_array(words)
    word_boxes = wb_np.tolist()
    wb_f = wb_np.astype(np.float64)
    for table in semantic_tables:
        aggregate_cells(words, table["cells"], word_boxes=word_boxes, word_boxes_np=wb_f)
    aggregate_cells(words, paragraphs, word_boxes=word_boxes, word_boxes_np=wb_f)

    semantic_tables = replace_table_to_paragraphs(semantic_tables, paragraphs)

    semantic_info = []
    cell_offset = 0
    for i, table in enumerate(semantic_tables):
        cells = {cell.id: cell for cell in table["cells"]}

        table_information = {
            "id": f"t{i}",
            "box": list(table["box"]),
            "cells": {},
            "style": "border",
            "kv_items": [],
            "grids": [],
        }

        nodes = _split_nodes_with_role(table["cells"])
        if not grid_only:
            clusters, dag = _weakly_cluster_nodes_with_graph(nodes)
            cluster_nodes_list = _get_cluster_nodes(clusters, nodes)
        else:
            cluster_nodes_list = [nodes]

        for clustered_nodes in cluster_nodes_list:
            if not kv_only and is_grid_cluster(clustered_nodes):
                grid, grid_cells, dag = parse_grid_from_bottom_up(
                    cells, clustered_nodes, merge_same_column_values
                )
                if grid is None:
                    continue
                table_information["grids"].append(grid)
                table_information["cells"].update(grid_cells)
            else:
                kv_items, dag, kv_cells = parse_kv_items(clustered_nodes, nodes, cells)
                table_information["kv_items"].extend(kv_items)
                table_information["cells"].update(kv_cells)

        for cell in cells.values():
            if cell.id not in table_information["cells"]:
                table_information["cells"][cell.id] = cell

        table_information["kv_items"] = sorted(
            table_information["kv_items"],
            key=lambda kv: table_information["cells"][kv.value].box[1],
        )
        table_information["grids"] = sorted(
            table_information["grids"], key=lambda g: g.box[1]
        )
        for j, grid in enumerate(table_information["grids"]):
            grid.id = f"g{j}"
        for j, kv in enumerate(table_information["kv_items"]):
            kv.id = f"kv{j}"

        cell_offset = _assign_ids(table_information, cell_offset)
        semantic_info.append(TableSemanticContents(**table_information))

    semantic_info = _sort_elements(semantic_info, prefix="t")
    paragraphs = _sort_elements(paragraphs, prefix="p")

    return SemanticDocument(tables=semantic_info, paragraphs=paragraphs, words=words)
