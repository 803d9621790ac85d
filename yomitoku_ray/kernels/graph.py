"""Tiny graph structures used by reading order and table parsing.

``Node`` matches the reference's spatial-DAG node (utils/graph.py:1-20);
``DiGraph`` is a minimal dependency-free stand-in for the networkx digraph the
reference uses for table line traversal (utils/misc.py:430-448) — workers
should not need networkx for a 20-line BFS.
"""

from __future__ import annotations

from collections import deque


class Node:
    """Spatial-DAG node; parity with utils/graph.py:1-20."""

    __slots__ = ("id", "prop", "parents", "children", "is_locked")

    def __init__(self, id, prop):
        self.id = id
        self.prop = prop
        self.parents = []
        self.children = []
        self.is_locked = False

    def add_link(self, node):
        if node in self.children:
            return
        self.children.append(node)
        node.parents.append(self)

    def __repr__(self):
        if "contents" in self.prop:
            return str(self.prop["contents"])
        return "node"


class DiGraph:
    """Minimal directed graph with edge attributes (insertion-ordered)."""

    def __init__(self):
        self._succ = {}
        self._pred = {}
        self._edge_attrs = {}

    @property
    def nodes(self):
        return self._succ.keys()

    def add_node(self, u):
        if u not in self._succ:
            self._succ[u] = []
            self._pred[u] = []

    def add_edge(self, u, v, **attrs):
        self.add_node(u)
        self.add_node(v)
        if v not in self._succ[u]:
            self._succ[u].append(v)
            self._pred[v].append(u)
        self._edge_attrs[(u, v)] = attrs

    def successors(self, u):
        return list(self._succ.get(u, ()))

    def predecessors(self, u):
        return list(self._pred.get(u, ()))

    def edge(self, u, v):
        return self._edge_attrs.get((u, v), {})

    def in_degree(self, u):
        return len(self._pred.get(u, ()))

    def out_degree(self, u):
        return len(self._succ.get(u, ()))

    def remove_edge(self, u, v):
        if v in self._succ.get(u, ()):
            self._succ[u].remove(v)
            self._pred[v].remove(u)
            self._edge_attrs.pop((u, v), None)

    def weakly_connected_components(self):
        seen = set()
        for start in self._succ:
            if start in seen:
                continue
            comp = []
            queue = deque([start])
            seen.add(start)
            while queue:
                u = queue.popleft()
                comp.append(u)
                for v in self._succ.get(u, ()) + self._pred.get(u, ()):
                    if v not in seen:
                        seen.add(v)
                        queue.append(v)
            yield comp


class _NodesView:
    """Mapping-ish view over a LabeledDiGraph's nodes: ``u in G.nodes``,
    ``G.nodes[u] -> attr dict``, iteration in insertion order."""

    __slots__ = ("_attrs",)

    def __init__(self, attrs):
        self._attrs = attrs

    def __contains__(self, u):
        return u in self._attrs

    def __getitem__(self, u):
        return self._attrs[u]

    def __iter__(self):
        return iter(self._attrs)

    def __len__(self):
        return len(self._attrs)

    def __call__(self):
        return list(self._attrs)


class LabeledDiGraph:
    """Directed graph whose edges carry ONE string label (``dir``).

    Purpose-built replacement for the networkx DiGraphs the semantic/table
    parsers used: same observable semantics (insertion-ordered nodes and
    successors, add_edge overwrites the label of an existing edge — the
    networkx attr-update behavior the parsers rely on) at a fraction of the
    per-operation cost. Node attrs live in one dict per node.
    """

    __slots__ = ("_succ", "_pred", "_attrs")

    def __init__(self):
        self._succ = {}  # u -> {v: label} (insertion-ordered)
        self._pred = {}  # v -> {u: label}
        self._attrs = {}  # u -> attr dict

    # -- nodes ----------------------------------------------------------
    @property
    def nodes(self):
        return _NodesView(self._attrs)

    def add_node(self, u, **attrs):
        if u not in self._attrs:
            self._attrs[u] = {}
            self._succ[u] = {}
            self._pred[u] = {}
        self._attrs[u].update(attrs)

    def remove_node(self, u):
        for v in self._succ.pop(u, {}):
            self._pred[v].pop(u, None)
        for p in self._pred.pop(u, {}):
            self._succ[p].pop(u, None)
        self._attrs.pop(u, None)

    # -- edges ----------------------------------------------------------
    def add_edge(self, u, v, dir=None):
        self.add_node(u)
        self.add_node(v)
        self._succ[u][v] = dir
        self._pred[v][u] = dir

    def remove_edge(self, u, v):
        self._succ.get(u, {}).pop(v, None)
        self._pred.get(v, {}).pop(u, None)

    def remove_edges_from(self, pairs):
        for u, v in pairs:
            self.remove_edge(u, v)

    def edge_dir(self, u, v):
        return self._succ.get(u, {}).get(v)

    def edges(self):
        """Yield (u, v, label) in insertion order."""
        for u, nbrs in self._succ.items():
            for v, lab in nbrs.items():
                yield u, v, lab

    def relabel_edges(self, from_label, to_label):
        for u, nbrs in self._succ.items():
            for v, lab in nbrs.items():
                if lab == from_label:
                    nbrs[v] = to_label
                    self._pred[v][u] = to_label

    # -- traversal ------------------------------------------------------
    def successors(self, u):
        return list(self._succ.get(u, ()))

    def predecessors(self, u):
        return list(self._pred.get(u, ()))

    def succ_by(self, u, label):
        return [v for v, lab in self._succ.get(u, {}).items() if lab == label]

    def pred_by(self, u, label):
        return [p for p, lab in self._pred.get(u, {}).items() if lab == label]

    def in_degree_by(self, u, label):
        return sum(1 for lab in self._pred.get(u, {}).values() if lab == label)

    def copy(self):
        G = LabeledDiGraph()
        G._attrs = {u: dict(a) for u, a in self._attrs.items()}
        G._succ = {u: dict(n) for u, n in self._succ.items()}
        G._pred = {u: dict(n) for u, n in self._pred.items()}
        return G

    # -- components -----------------------------------------------------
    def weakly_connected_components(self):
        """Components over all edges, yielded as sets in node-insertion
        order (networkx iteration-order parity)."""
        seen = set()
        for start in self._attrs:
            if start in seen:
                continue
            comp = set()
            stack = [start]
            seen.add(start)
            while stack:
                u = stack.pop()
                comp.add(u)
                for v in self._succ.get(u, {}):
                    if v not in seen:
                        seen.add(v)
                        stack.append(v)
                for p in self._pred.get(u, {}):
                    if p not in seen:
                        seen.add(p)
                        stack.append(p)
            yield comp

    def components_by(self, label):
        """Undirected connected components of the ``label``-edge subgraph,
        isolates included, in node-insertion order."""
        adj = {u: [] for u in self._attrs}
        for u, nbrs in self._succ.items():
            for v, lab in nbrs.items():
                if lab == label:
                    adj[u].append(v)
                    adj[v].append(u)
        seen = set()
        comps = []
        for start in self._attrs:
            if start in seen:
                continue
            comp = set()
            stack = [start]
            seen.add(start)
            while stack:
                u = stack.pop()
                comp.add(u)
                for v in adj[u]:
                    if v not in seen:
                        seen.add(v)
                        stack.append(v)
            comps.append(comp)
        return comps


def get_line_with_head(dag: DiGraph, head, dir_value):
    """Collect nodes reachable from head via edges labeled dir=dir_value.

    Parity: utils/misc.py:430-448 (BFS, duplicates allowed as in reference).
    """
    line_nodes = []
    queue = deque([head])
    while queue:
        u = queue.popleft()
        if u not in dag.nodes:
            continue
        line_nodes.append(u)
        for v in dag.successors(u):
            if dag.edge(u, v).get("dir") == dir_value:
                queue.append(v)
    return line_nodes
