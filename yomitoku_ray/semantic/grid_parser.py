"""Grid reconstruction from a cell adjacency DAG (bottom-up).

Port of the reference's grid parser (``/root/reference/src/yomitoku/
grid_parser.py:17-829``): soft-adjacency DAG -> unit-cell expansion (multi-
out nodes split into ``__dupN`` nodes with bbox intervals repaired to be
contiguous) -> row/col line clusters -> id matrix -> spans from extents ->
column headers from all-header rows -> optional same-header column merge
via union-find. Control flow kept line-for-line; networkx used like the
reference so iteration order matches.
"""

from __future__ import annotations

from collections import deque
from itertools import count

import networkx as nx

from ..kernels.geometry import is_bottom_adjacent, is_right_adjacent
from ..kernels.union_find import UnionFind
from .schemas import TableGrid


def get_line_with_head(dag, head, dir_value):
    """BFS along dir_value edges. Parity: utils/misc.py:430-448."""
    line_nodes = []
    queue = deque([head])
    while queue:
        u = queue.popleft()
        if u not in dag.nodes:
            continue
        line_nodes.append(u)
        for v in dag.successors(u):
            if dag[u][v].get("dir") == dir_value:
                queue.append(v)
    return line_nodes


def _get_grid_dag(nodes):
    """Parity: grid_parser.py:17-54."""
    dag = nx.DiGraph()
    cells = nodes["cell"] + nodes["empty"] + nodes["header"]
    for cell in cells:
        dag.add_node(cell.id, bbox=cell.box, role=cell.role, contents=cell.contents)
    for cell1 in cells:
        for cell2 in cells:
            if cell1.id == cell2.id:
                continue
            if is_bottom_adjacent(
                cell1.box, cell2.box, rule="soft", dist_threshold=20, overlap_ratio_th=0.25
            ):
                dag.add_edge(cell1.id, cell2.id, dir="D")
                dag.add_edge(cell2.id, cell1.id, dir="U")
            if is_right_adjacent(
                cell1.box, cell2.box, rule="soft", dist_threshold=20, overlap_ratio_th=0.25
            ):
                dag.add_edge(cell1.id, cell2.id, dir="R")
                dag.add_edge(cell2.id, cell1.id, dir="L")
    return dag


def split_bbox_by_right_neighbors_exact(G, u, right_nodes, bbox_key="bbox"):
    """Vertical split of u's bbox by right-neighbor y-intervals.

    Parity: grid_parser.py:57-116 (interval clipping + contiguity repair).
    """
    ux1, uy1, ux2, uy2 = G.nodes[u][bbox_key]
    if not right_nodes:
        return [(ux1, uy1, ux2, uy2)]

    rights = sorted(
        right_nodes,
        key=lambda n: (G.nodes[n][bbox_key][1] + G.nodes[n][bbox_key][3]) / 2.0,
    )
    intervals = []
    for n in rights:
        _, ry1, _, ry2 = G.nodes[n][bbox_key]
        intervals.append((max(uy1, ry1), min(uy2, ry2)))

    fixed = []
    cur = uy1
    for a, b in intervals:
        a = max(a, cur)
        b = max(b, a)
        fixed.append([a, b])
        cur = b
    if fixed:
        fixed[-1][1] = uy2
    for i in range(len(fixed)):
        a, b = fixed[i]
        if b - a <= 1e-3:
            if i + 1 < len(fixed) and fixed[i + 1][1] - fixed[i + 1][0] > 2e-3:
                take = (fixed[i + 1][1] - fixed[i + 1][0]) * 0.1
                fixed[i][1] = fixed[i][0] + take
                fixed[i + 1][0] = fixed[i][1]
    return [(ux1, a, ux2, b) for a, b in fixed]


def split_bbox_by_down_neighbors_exact_x(G, u, down_nodes, bbox_key="bbox"):
    """Horizontal split of u's bbox by down-neighbor x-intervals.

    Parity: grid_parser.py:119-174.
    """
    ux1, uy1, ux2, uy2 = G.nodes[u][bbox_key]
    if not down_nodes:
        return [(ux1, uy1, ux2, uy2)]

    downs = sorted(
        down_nodes,
        key=lambda n: (G.nodes[n][bbox_key][0] + G.nodes[n][bbox_key][2]) / 2.0,
    )
    intervals = []
    for n in downs:
        dx1, _, dx2, _ = G.nodes[n][bbox_key]
        intervals.append((max(ux1, dx1), min(ux2, dx2)))

    fixed = []
    cur = ux1
    for a, b in intervals:
        a = max(a, cur)
        b = max(b, a)
        fixed.append([a, b])
        cur = b
    if fixed:
        fixed[-1][1] = ux2
    for i in range(len(fixed)):
        a, b = fixed[i]
        if b - a <= 1e-3:
            if i + 1 < len(fixed) and fixed[i + 1][1] - fixed[i + 1][0] > 2e-3:
                take = (fixed[i + 1][1] - fixed[i + 1][0]) * 0.1
                fixed[i][1] = fixed[i][0] + take
                fixed[i + 1][0] = fixed[i][1]
    return [(a, uy1, b, uy2) for a, b in fixed]


def normalize_row_with_out_edges(
    dag, head, dir_key="dir", out_edge_type="R", in_edge_type="L"
):
    """Split multi-out nodes horizontally to 1:1. Parity: grid_parser.py:177-305."""
    G = dag.copy()
    queue = deque([head])
    dup_counter = count(1)

    while queue:
        u = queue.popleft()
        if u not in G.nodes:
            continue

        outs_fwd = [v for v in G.successors(u) if G[u][v].get(dir_key) == out_edge_type]

        if out_edge_type == "R":
            outs_bwd = [p for p in G.predecessors(u) if G[p][u].get(dir_key) == "R"]

            def ok_adj(bwd, dup):
                return is_right_adjacent(
                    G.nodes[bwd]["bbox"],
                    G.nodes[dup]["bbox"],
                    rule="soft",
                    dist_threshold=20,
                    ignore_dist_threshold=10,
                    overlap_ratio_th=0.25,
                )

        elif out_edge_type == "L":
            outs_bwd = [p for p in G.predecessors(u) if G[p][u].get(dir_key) == "L"]

            def ok_adj(bwd, dup):
                return is_right_adjacent(
                    G.nodes[dup]["bbox"],
                    G.nodes[bwd]["bbox"],
                    rule="soft",
                    dist_threshold=20,
                    ignore_dist_threshold=10,
                    overlap_ratio_th=0.25,
                )

        else:
            outs_bwd = []

            def ok_adj(bwd, dup):
                return False

        up_cells = [p for p in G.predecessors(u) if G[p][u].get(dir_key) == "D"]
        down_cells = [v for v in G.successors(u) if G[u][v].get(dir_key) == "D"]

        if len(outs_fwd) > 1:
            seg_bboxes = split_bbox_by_right_neighbors_exact(G, u, outs_fwd, "bbox")
            seg_bboxes = sorted(seg_bboxes, key=lambda box: box[1])
            outs_fwd = sorted(outs_fwd, key=lambda n: G.nodes[n]["bbox"][1])

            base_attr = dict(G.nodes[u])
            dups = []
            for bb in seg_bboxes:
                nu = f"{u}__dup{next(dup_counter)}"
                attr = dict(base_attr)
                attr["bbox"] = bb
                G.add_node(nu, **attr)
                dups.append(nu)

            for out, dup in zip(outs_fwd, dups):
                G.add_edge(dup, out, dir=out_edge_type)
                G.add_edge(out, dup, dir=in_edge_type)
            for p in up_cells:
                G.add_edge(dups[0], p, dir="U")
                G.add_edge(p, dups[0], dir="D")
            for p in down_cells:
                G.add_edge(dups[-1], p, dir="D")
                G.add_edge(p, dups[-1], dir="U")
            for a, b in zip(dups, dups[1:]):
                G.add_edge(a, b, dir="D")
                G.add_edge(b, a, dir="U")
            for bwd in outs_bwd:
                for dup in dups:
                    if ok_adj(bwd, dup):
                        G.add_edge(bwd, dup, dir=out_edge_type)
                        G.add_edge(dup, bwd, dir=in_edge_type)
                        queue.append(bwd)

            G.remove_node(u)
            for dup in dups:
                queue.append(dup)
        else:
            for v in outs_fwd:
                queue.append(v)

    return G


def normalize_col_with_out_edges(
    dag, head, dir_key="dir", out_edge_type="D", in_edge_type="U"
):
    """Split multi-out nodes vertically to 1:1. Parity: grid_parser.py:308-421."""
    G = dag.copy()
    queue = deque([head])
    dup_counter = count(1)

    while queue:
        u = queue.popleft()
        if u not in G.nodes:
            continue

        outs_fwd = [v for v in G.successors(u) if G[u][v].get(dir_key) == out_edge_type]
        if out_edge_type == "D":
            outs_bwd = [p for p in G.predecessors(u) if G[p][u].get(dir_key) == "D"]

            def ok_adj(bwd, dup):
                return is_bottom_adjacent(
                    G.nodes[bwd]["bbox"],
                    G.nodes[dup]["bbox"],
                    rule="soft",
                    dist_threshold=20,
                    ignore_dist_threshold=10,
                    overlap_ratio_th=0.25,
                )

        elif out_edge_type == "U":
            outs_bwd = [v for v in G.successors(u) if G[u][v].get(dir_key) == "D"]

            def ok_adj(bwd, dup):
                return is_bottom_adjacent(
                    G.nodes[dup]["bbox"],
                    G.nodes[bwd]["bbox"],
                    rule="soft",
                    dist_threshold=20,
                    ignore_dist_threshold=10,
                    overlap_ratio_th=0.25,
                )

        else:
            outs_bwd = []

            def ok_adj(bwd, dup):
                return False

        left_cells = [p for p in G.predecessors(u) if G[p][u].get(dir_key) == "R"]
        right_cells = [v for v in G.successors(u) if G[u][v].get(dir_key) == "R"]

        if len(outs_fwd) > 1:
            seg_bboxes = split_bbox_by_down_neighbors_exact_x(G, u, outs_fwd, "bbox")
            seg_bboxes = sorted(seg_bboxes, key=lambda box: box[0])
            outs_fwd = sorted(outs_fwd, key=lambda n: G.nodes[n]["bbox"][0])

            base_attr = dict(G.nodes[u])
            dups = []
            for bb in seg_bboxes:
                nu = f"{u}__dup{next(dup_counter)}"
                attr = dict(base_attr)
                attr["bbox"] = bb
                G.add_node(nu, **attr)
                dups.append(nu)

            for out, dup in zip(outs_fwd, dups):
                G.add_edge(dup, out, dir=out_edge_type)
                G.add_edge(out, dup, dir=in_edge_type)
            for p in left_cells:
                G.add_edge(dups[0], p, dir="L")
                G.add_edge(p, dups[0], dir="R")
            for p in right_cells:
                G.add_edge(dups[-1], p, dir="R")
                G.add_edge(p, dups[-1], dir="L")
            for i in range(len(dups) - 1):
                G.add_edge(dups[i], dups[i + 1], dir="R")
                G.add_edge(dups[i + 1], dups[i], dir="L")
            for bwd in outs_bwd:
                for dup in dups:
                    if ok_adj(bwd, dup):
                        G.add_edge(bwd, dup, dir=out_edge_type)
                        G.add_edge(dup, bwd, dir=in_edge_type)
                        queue.append(bwd)

            for dup in dups:
                queue.append(dup)
            G.remove_node(u)
        else:
            for v in outs_fwd:
                queue.append(v)

    return G


def _components_with_isolates(dag, dir_value):
    """Parity: grid_parser.py:457-467."""
    G = nx.Graph()
    G.add_nodes_from(dag.nodes())
    G.add_edges_from(
        (u, v) for u, v, d in dag.edges(data=True) if d.get("dir") == dir_value
    )
    return list(nx.connected_components(G))


def _cluster_heads_by_in_degree(dag, dir_value):
    """Parity: grid_parser.py:470-490."""
    comps = _components_with_isolates(dag, dir_value)
    H = nx.DiGraph(
        (u, v, d) for u, v, d in dag.edges(data=True) if d.get("dir") == dir_value
    )
    H.add_nodes_from(dag.nodes())

    heads = []
    for comp in comps:
        cand = [n for n in comp if H.in_degree(n) == 0]
        if cand:
            heads.extend(sorted(cand))
        else:
            heads.append(min(comp))
    return heads, comps


def expand_dir_to_uit_row(dag, dir_key="dir"):
    """Parity: grid_parser.py:424-454."""
    G = dag.copy()
    line_heads, _ = _cluster_heads_by_in_degree(G, dir_value="R")
    for head in line_heads:
        G = normalize_row_with_out_edges(
            G, head, dir_key=dir_key, in_edge_type="L", out_edge_type="R"
        )
    line_heads, _ = _cluster_heads_by_in_degree(G, dir_value="L")
    for head in line_heads:
        G = normalize_row_with_out_edges(
            G, head, dir_key=dir_key, in_edge_type="R", out_edge_type="L"
        )
    return G


def expand_dir_to_uit_col(dag, dir_key="dir"):
    """Parity: grid_parser.py:493-523."""
    G = dag.copy()
    line_heads, _ = _cluster_heads_by_in_degree(G, dir_value="D")
    for head in line_heads:
        G = normalize_col_with_out_edges(
            G, head, dir_key=dir_key, in_edge_type="U", out_edge_type="D"
        )
    line_heads, _ = _cluster_heads_by_in_degree(G, dir_value="U")
    for head in line_heads:
        G = normalize_col_with_out_edges(
            G, head, dir_key=dir_key, in_edge_type="D", out_edge_type="U"
        )
    return G


def _calc_spans_and_indices_from_raw_grid(raw_data):
    """Parity: grid_parser.py:526-559."""
    pos = {}
    for r, row in enumerate(raw_data):
        for c, cell_id in enumerate(row):
            if cell_id is None:
                continue
            if cell_id not in pos:
                pos[cell_id] = [r, r, c, c]
            else:
                pos[cell_id][0] = min(pos[cell_id][0], r)
                pos[cell_id][1] = max(pos[cell_id][1], r)
                pos[cell_id][2] = min(pos[cell_id][2], c)
                pos[cell_id][3] = max(pos[cell_id][3], c)

    info = {}
    for cell_id, (rmin, rmax, cmin, cmax) in pos.items():
        info[cell_id] = {
            "row": rmin,
            "col": cmin,
            "row_span": rmax - rmin + 1,
            "col_span": cmax - cmin + 1,
        }
    return info


def _expand_grid_to_unit(dag):
    dag = expand_dir_to_uit_row(dag)
    dag = expand_dir_to_uit_col(dag)
    return dag


def _get_grid_from_dag(dag):
    """Parity: grid_parser.py:570-608."""
    row_root = _cluster_heads_by_in_degree(dag, dir_value="R")[0]
    col_root = _cluster_heads_by_in_degree(dag, dir_value="D")[0]

    row_root = sorted(row_root, key=lambda n: dag.nodes[n]["bbox"][1])
    col_root = sorted(col_root, key=lambda n: dag.nodes[n]["bbox"][0])

    raw_data = []
    for r_head in row_root:
        row_nodes = get_line_with_head(dag, r_head, dir_value="R")
        row_nodes = sorted(row_nodes, key=lambda n: dag.nodes[n]["bbox"][0])
        row = []
        for c_head in col_root:
            c_nodes = get_line_with_head(dag, c_head, dir_value="D")
            c_nodes = sorted(c_nodes, key=lambda n: dag.nodes[n]["bbox"][1])
            cell_id = set(row_nodes).intersection(set(c_nodes))
            if cell_id:
                # deterministic tie-break (reference takes list(set)[0],
                # which is hash-seed-dependent)
                row.append(sorted(cell_id)[0])
            else:
                row.append(None)
        raw_data.append(row)
    return raw_data


def _assign_cell_positions(cells, data):
    """Parity: grid_parser.py:611-619."""
    cell_info = _calc_spans_and_indices_from_raw_grid(data)
    for cell_id, info in cell_info.items():
        cell = cells[cell_id]
        cell.row = info["row"]
        cell.col = info["col"]
        cell.row_span = info["row_span"]
        cell.col_span = info["col_span"]


def _remove_dup_suffix_from_data(grid):
    """Parity: grid_parser.py:622-632."""
    return [
        [cell_id.split("__dup")[0] if cell_id is not None else None for cell_id in row]
        for row in grid
    ]


def _get_col_headers_from_grid(grid, is_header_row, cells, clustered_nodes):
    """Parity: grid_parser.py:635-671."""
    n_cols = len(grid[0])
    n_rows = len(grid)

    header_ids = set()
    col_headers = []
    for col_idx in range(n_cols):
        col_header = []
        for row_idx in range(n_rows):
            if is_header_row[row_idx]:
                if grid[row_idx][col_idx] is not None:
                    col_header.append(grid[row_idx][col_idx])
                    header_ids.add(grid[row_idx][col_idx])
        col_header = sorted(set(col_header))  # seed-independent base order
        col_header = sorted(col_header, key=lambda h: cells[h].box[1])
        col_headers.append(col_header)

    grid_cells = set()
    for cluster in clustered_nodes.values():
        for cell in cluster:
            grid_cells.add(cell.id)

    for cell in cells.values():
        if cell.id not in header_ids and cell.role == "header" and cell.id in grid_cells:
            cell.role = "cell"

    return col_headers


def _get_grid_bbox(grid, cells):
    """Parity: grid_parser.py:674-695."""
    x1_list, y1_list, x2_list, y2_list = [], [], [], []
    for row in grid:
        for cell_id in row:
            if cell_id is None:
                continue
            x1, y1, x2, y2 = cells[cell_id].box
            x1_list.append(x1)
            y1_list.append(y1)
            x2_list.append(x2)
            y2_list.append(y2)
    if not x1_list:
        return (0.0, 0.0, 0.0, 0.0)
    return (min(x1_list), min(y1_list), max(x2_list), max(y2_list))


def merge_cells(cell1, cell2):
    """Parity: grid_parser.py:698-730."""
    cell1_ids = set(cell1.id.split("_"))
    cell2_ids = set(cell2.id.split("_"))
    if cell1_ids.issubset(cell2_ids):
        return cell2, False
    if cell2_ids.issubset(cell1_ids):
        return cell1, False

    x1_1, y1_1, x2_1, y2_1 = cell1.box
    x1_2, y1_2, x2_2, y2_2 = cell2.box
    new_contents = cell1.contents + cell2.contents
    new_cell = type(cell1)(
        id=f"{cell1.id}_{cell2.id}",
        box=[min(x1_1, x1_2), min(y1_1, y1_2), max(x2_1, x2_2), max(y2_1, y2_2)],
        role=cell1.role,
        contents=new_contents.strip(),
        row=min(cell1.row, cell2.row),
        col=min(cell1.col, cell2.col),
        row_span=cell1.row_span + cell2.row_span,
        col_span=cell1.col_span + cell2.col_span,
    )
    return new_cell, True


def _merge_same_column_values(grid, col_headers, cells):
    """Parity: grid_parser.py:733-784."""
    union_find = UnionFind(len(col_headers))
    for c1 in range(len(col_headers)):
        if not col_headers[c1]:
            continue
        for c2 in range(c1 + 1, len(col_headers)):
            if not col_headers[c2]:
                continue
            if col_headers[c1][-1] == col_headers[c2][-1]:
                union_find.union(c1, c2)

    new_col_headers = []
    for group in union_find.groups():
        merged = []
        for c in group:
            merged.extend(col_headers[c])
        merged = sorted(set(merged))
        merged = sorted(merged, key=lambda h: cells[h].box[1])
        new_col_headers.append(merged)

    new_grid = []
    for row in grid:
        new_row = []
        for group in union_find.groups():
            cell_ids = [row[c] for c in group if row[c] is not None]
            if not cell_ids:
                new_row.append(None)
            else:
                merged_cell = cells[cell_ids[0]]
                for cid in cell_ids[1:]:
                    merged_cell, is_merged = merge_cells(merged_cell, cells[cid])
                new_row.append(merged_cell.id)
                cells[merged_cell.id] = merged_cell
        new_grid.append(new_row)

    grid_cells = set()
    for row in new_grid:
        for cell_id in row:
            if cell_id is not None:
                grid_cells.add(cell_id)
    cells = {cid: cell for cid, cell in cells.items() if cid in grid_cells}

    return new_grid, new_col_headers, cells


def parse_grid_from_bottom_up(cells, clustered_nodes, merge_same_column_values=False):
    """Parity: grid_parser.py:787-829."""
    dag = _get_grid_dag(clustered_nodes)
    dag = _expand_grid_to_unit(dag)

    grid = _get_grid_from_dag(dag)
    if len(grid) == 0 or len(grid[0]) == 0:
        return None, None, dag

    roles = [
        [
            dag.nodes[cell_id]["role"] if cell_id is not None else "empty"
            for cell_id in row
        ]
        for row in grid
    ]
    is_header_row = [
        all(role == "header" or role == "empty" for role in row) for row in roles
    ]

    grid = _remove_dup_suffix_from_data(grid)
    grid_box = list(map(int, _get_grid_bbox(grid, cells)))
    _assign_cell_positions(cells, grid)
    col_headers = _get_col_headers_from_grid(grid, is_header_row, cells, clustered_nodes)

    if merge_same_column_values:
        grid, col_headers, cells = _merge_same_column_values(grid, col_headers, cells)

    return (
        TableGrid(
            id=None,
            n_row=len(grid),
            n_col=len(grid[0]) if grid else 0,
            box=grid_box,
            data=grid,
            col_headers=col_headers,
        ),
        cells,
        dag,
    )
