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
