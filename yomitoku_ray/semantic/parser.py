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

import networkx as nx

from ..kernels.geometry import (
    calc_overlap_ratio,
    is_bottom_adjacent,
    is_right_adjacent,
    quad_to_xyxy,
)
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


def drop_single_out_edge_by_type(G, edge_type, type_key="type"):
    """Parity: table_semantic_parser.py:84-92."""
    to_remove = []
    for u in G.nodes():
        outs = [(u, v) for v in G.successors(u) if G[u][v].get(type_key) == edge_type]
        if len(outs) == 1:
            to_remove.append(outs[0])
    G.remove_edges_from(to_remove)
    return to_remove


def replace_edge_type(G, from_type, to_type, key="type"):
    for _, _, d in G.edges(data=True):
        if d.get(key) == from_type:
            d[key] = to_type


def _weakly_cluster_nodes_with_graph(nodes):
    """Heuristic adjacency DAG + weakly connected components.

    Parity: table_semantic_parser.py:101-187.
    """
    dag = nx.DiGraph()
    for role in nodes:
        for node in nodes[role]:
            if role not in ["header", "cell", "empty"]:
                continue
            dag.add_node(node.id, bbox=node.box, role=node.role)

    for header in nodes["header"]:
        for cell in nodes["cell"] + nodes["empty"]:
            if is_bottom_adjacent(header.box, cell.box, rule="nest"):
                dag.add_edge(header.id, cell.id, dir="D")
            if is_right_adjacent(header.box, cell.box, rule="soft"):
                dag.add_edge(header.id, cell.id, dir="D")

        for header2 in nodes["header"]:
            if header.id == header2.id:
                continue
            if is_right_adjacent(header.box, header2.box, rule="soft"):
                dag.add_edge(header.id, header2.id, dir="D")
            if is_bottom_adjacent(header.box, header2.box, rule="child"):
                dag.add_edge(header.id, header2.id, dir="nest")

    drop_single_out_edge_by_type(dag, edge_type="nest", type_key="dir")
    replace_edge_type(dag, from_type="nest", to_type="D", key="dir")

    for cell1 in nodes["cell"] + nodes["empty"]:
        for cell2 in nodes["cell"] + nodes["empty"]:
            if cell1.id == cell2.id:
                continue
            if is_right_adjacent(cell1.box, cell2.box, rule="soft"):
                dag.add_edge(cell1.id, cell2.id, dir="D")
            if is_bottom_adjacent(cell1.box, cell2.box, rule="hard"):
                dag.add_edge(cell1.id, cell2.id, dir="D")

    for empty in nodes["empty"]:
        for header in nodes["header"]:
            if is_bottom_adjacent(empty.box, header.box, rule="hard"):
                dag.add_edge(empty.id, header.id, dir="D")
            if is_right_adjacent(empty.box, header.box, rule="hard"):
                dag.add_edge(empty.id, header.id, dir="D")

    return list(nx.weakly_connected_components(dag)), dag


def is_grid_cluster(nodes):
    """Parity: table_semantic_parser.py:190-224."""
    G = nx.DiGraph()
    for cell in nodes["cell"] + nodes["empty"]:
        G.add_node(cell.id, bbox=cell.box, role=cell.role)
    for cell1 in nodes["cell"] + nodes["empty"]:
        for cell2 in nodes["cell"] + nodes["empty"]:
            if cell1.id == cell2.id:
                continue
            if is_bottom_adjacent(cell1.box, cell2.box, rule="hard"):
                G.add_edge(cell1.id, cell2.id, dir="V")
            if is_right_adjacent(cell1.box, cell2.box, rule="hard"):
                G.add_edge(cell1.id, cell2.id, dir="H")

    VG = nx.Graph((u, v, d) for u, v, d in G.edges(data=True) if d.get("dir") == "V")
    HG = nx.Graph((u, v, d) for u, v, d in G.edges(data=True) if d.get("dir") == "H")

    h_components = list(nx.connected_components(HG))
    v_components = list(nx.connected_components(VG))

    return len(h_components) > 1 and len(v_components) > 1


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


def aggregate_cells(words, cells, overlap_th=0.2):
    """Best-overlap word->cell assignment + per-cell ordered join.

    Parity: table_semantic_parser.py:471-517 (note: cell text strips
    newlines and spaces at the edges, unlike the DocumentAnalyzer join).
    ``cells`` may be SemanticCells or paragraph Elements (anything with
    box/contents and not role 'group').
    """
    from collections import defaultdict

    cell_words = defaultdict(list)

    for word in words:
        word_box = quad_to_xyxy(word.points)
        best_cell = None
        best_ratio = 0
        for cell in cells:
            if cell.role == "group":
                continue
            ratio, _ = calc_overlap_ratio(cell.box, word_box)
            if ratio > best_ratio:
                best_ratio = ratio
                best_cell = cell
        if best_cell is None or best_ratio < overlap_th:
            continue
        cell_words[id(best_cell)].append(
            Paragraph(
                box=list(word_box),
                contents=word.content,
                direction=word.direction,
                order=0,
                role=None,
            )
        )

    for cell in cells:
        contained = cell_words.get(id(cell), [])
        if not contained:
            cell.contents = ""
            continue
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
    for table in semantic_tables:
        aggregate_cells(words, table["cells"])
    aggregate_cells(words, paragraphs)

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
