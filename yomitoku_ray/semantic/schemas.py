"""Semantic table model: cells / kv items / grids + query & view layer.

Re-implementation of the reference's semantic schemas and their query
methods (``/root/reference/src/yomitoku/schemas/table_semantic_parser.py:
26-700``) as plain dataclasses (Arrow enforces shape at stage boundaries;
see ``yomitoku_ray.schemas``). Method-level parity notes cite the reference
lines.
"""

from __future__ import annotations

import re
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from ..kernels.geometry import (
    calc_overlap_ratio,
    is_bottom_adjacent,
    is_contained,
    is_right_adjacent,
)


def make_unique_all(seq):
    """Duplicate keys get an occurrence-index suffix element.

    Parity: schemas/table_semantic_parser.py:26-40.
    """
    counter = defaultdict(int)
    result = []
    for x in seq:
        key = tuple(x)
        idx = counter[key]
        result.append(x + [idx])
        counter[key] += 1
    for res, x in zip(result, seq):
        if counter[tuple(x)] == 1:
            res.pop()
    return result


def normalize(text: str) -> str:
    """Strip half/full-width spaces. Parity: :43-45."""
    return re.sub(r"[ 　]", "", text)


@dataclass
class SemanticCell:
    """CellSchema parity (:56-95)."""

    contents: Optional[str]
    role: Optional[str]  # cell | header | empty | group
    id: Optional[str]
    box: List[int]
    row: Optional[int] = None
    col: Optional[int] = None
    row_span: Optional[int] = None
    col_span: Optional[int] = None
    meta: dict = field(default_factory=dict)

    def to_dict(self):
        return {
            "meta": dict(self.meta),
            "contents": self.contents,
            "role": self.role,
            "id": self.id,
            "box": list(self.box),
            "row": self.row,
            "col": self.col,
            "row_span": self.row_span,
            "col_span": self.col_span,
        }


@dataclass
class KvItem:
    """KvItemSchema parity (:117-128)."""

    id: Optional[str]
    key: List[str]
    value: str
    box: Optional[List[int]] = None

    def to_dict(self):
        return {
            "id": self.id,
            "key": list(self.key),
            "value": self.value,
            "box": list(self.box) if self.box is not None else None,
        }


@dataclass
class TableGrid:
    """TableGridSchema parity (:130-154)."""

    id: Optional[str]
    box: List[int]
    n_row: int
    n_col: int
    col_headers: List[List[str]]
    data: List[List[Optional[str]]]

    def to_dict(self):
        return {
            "id": self.id,
            "box": list(self.box),
            "n_row": self.n_row,
            "n_col": self.n_col,
            "col_headers": [list(h) for h in self.col_headers],
            "data": [list(r) for r in self.data],
        }


@dataclass
class TableSemanticContents:
    """TableSemanticContentsSchema parity (:157-377) incl. queries + views."""

    id: Optional[str]
    style: str
    box: List[int]
    cells: Dict[str, SemanticCell]
    kv_items: List[KvItem]
    grids: List[TableGrid]

    # -- queries (:190-317) -------------------------------------------------

    def safe_contents(self, cell_id, ignore_space=True) -> str:
        c = self.cells.get(cell_id)
        contents = (c.contents or "") if c is not None else ""
        if not ignore_space:
            return contents
        return contents.replace(" ", "")

    def find_cell_by_id(self, cell_id) -> Optional[SemanticCell]:
        return self.cells.get(str(cell_id))

    def search_cells_by_bbox(self, box) -> List[SemanticCell]:
        out = []
        for cell in self.cells.values():
            if cell.role == "group":
                continue
            if is_contained(box, cell.box, threshold=0.5):
                out.append(cell)
        return out

    def search_cells_by_query(self, query: str) -> List[SemanticCell]:
        q = normalize(query)
        out = []
        for cell in self.cells.values():
            if not cell.contents:
                continue
            if cell.role == "group":
                continue
            if q in normalize(cell.contents):
                out.append(cell)
        return out

    def _search_adjacent(self, key, predicate) -> List[SemanticCell]:
        query_cells = self.search_cells_by_query(key)
        if not query_cells:
            return []
        cells = []
        for cell in self.cells.values():
            if cell.role == "group":
                continue
            for query_cell in query_cells:
                if predicate(query_cell, cell):
                    cells.append(cell)
        return cells

    def search_cells_below_key_text(self, key):
        return self._search_adjacent(key, lambda q, c: is_bottom_adjacent(q.box, c.box))

    def search_cells_right_of_key_text(self, key):
        return self._search_adjacent(key, lambda q, c: is_right_adjacent(q.box, c.box))

    def search_cells_left_of_key_text(self, key):
        return self._search_adjacent(key, lambda q, c: is_right_adjacent(c.box, q.box))

    def search_cells_upper_key_text(self, key):
        return self._search_adjacent(key, lambda q, c: is_bottom_adjacent(c.box, q.box))

    def search_kv_items_by_key(self, key: str) -> List[dict]:
        """Parity: :289-317 (incl. the reference's grid-side quirk of
        appending one result per data row with an empty value list)."""
        q = normalize(key)
        results: List[dict] = []

        for kv_item in self.kv_items:
            key_cells = [self.cells.get(k) for k in kv_item.key]
            value_cell = self.cells.get(kv_item.value)
            key_text = "".join((kc.contents or "") for kc in key_cells if kc)
            if q in normalize(key_text):
                results.append({"key": key_cells, "value": value_cell})

        for grid in self.grids:
            for i, col in enumerate(grid.col_headers):
                col_cells = [self.cells.get(ck) for ck in col]
                col_text = "".join(
                    self.safe_contents(c.contents) for c in col_cells if c
                )
                if q in normalize(col_text):
                    value_cells = []
                    for row in grid.data:
                        results.append({"key": col_cells, "value": value_cells})

        return results

    # -- views (:458-549) ---------------------------------------------------

    def kv_items_to_dict(self, merge_values=False, separator="\n") -> dict:
        """Parity: :462-514."""
        parsed = {}
        keys, vals = [], []
        for kv in self.kv_items:
            keys.append([self.safe_contents(i) for i in kv.key])
            vals.append(self.safe_contents(kv.value))

        if not merge_values:
            keys = make_unique_all(keys)
            for k, v in zip(keys, vals):
                parsed["_".join(map(str, k))] = str(v)
        else:
            grouped = defaultdict(list)
            for kv, k, v in zip(self.kv_items, keys, vals):
                key_str = "_".join(map(str, k))
                grouped[key_str].append((v, self.cells.get(kv.value)))
            for key_str, items in grouped.items():
                if len(items) == 1:
                    parsed[key_str] = str(items[0][0])
                else:
                    cells_with_boxes = [(v, c) for v, c in items if c is not None]
                    if cells_with_boxes:
                        boxes = [c.box for _, c in cells_with_boxes]
                        x_spread = max(b[0] for b in boxes) - min(b[0] for b in boxes)
                        y_spread = max(b[1] for b in boxes) - min(b[1] for b in boxes)
                        if y_spread >= x_spread:
                            cells_with_boxes.sort(key=lambda x: x[1].box[1])
                        else:
                            cells_with_boxes.sort(key=lambda x: x[1].box[0])
                        parsed[key_str] = separator.join(
                            str(v) for v, _ in cells_with_boxes
                        )
                    else:
                        parsed[key_str] = separator.join(str(v) for v, _ in items)
        return parsed

    def grids_to_dict(self, ignore_space=True) -> List[dict]:
        """Parity: :516-549."""
        results = []
        for grid in self.grids:
            row_record_list = []
            for row in grid.data:
                parsed_row = {}
                cell_id_list = set()
                col_key_list, value_list = [], []
                for i, cell in enumerate(row):
                    if cell in grid.col_headers[i]:
                        continue
                    ck = [
                        self.safe_contents(h, ignore_space)
                        for h in grid.col_headers[i]
                    ]
                    v = self.safe_contents(cell, ignore_space)
                    if cell in cell_id_list:
                        continue
                    col_key_list.append(ck)
                    value_list.append(v)
                    cell_id_list.add(cell)

                col_key_list = make_unique_all(col_key_list)
                for ck, v in zip(col_key_list, value_list):
                    parsed_row["_".join(map(str, ck))] = v
                if parsed_row:
                    row_record_list.append(parsed_row)
            results.append({"id": grid.id, "rows": row_record_list})
        return results

    def to_dict(self):
        return {
            "id": self.id,
            "style": self.style,
            "box": list(self.box),
            "cells": {cid: c.to_dict() for cid, c in self.cells.items()},
            "kv_items": [kv.to_dict() for kv in self.kv_items],
            "grids": [g.to_dict() for g in self.grids],
        }


@dataclass
class SemanticParagraph:
    """Element-shaped paragraph with id (parser re-assigns p0..)."""

    id: Optional[str]
    box: List[int]
    score: float
    role: Optional[str]
    contents: Optional[str] = None

    def to_dict(self):
        return {
            "id": self.id,
            "box": list(self.box),
            "score": self.score,
            "role": self.role,
            "contents": self.contents,
        }


@dataclass
class SemanticDocument:
    """TableSemanticParserSchema parity (:604-700)."""

    tables: List[TableSemanticContents]
    paragraphs: List[SemanticParagraph]
    words: list

    def find_table_by_id(self, table_id) -> Optional[TableSemanticContents]:
        for table in self.tables:
            if table.id == str(table_id):
                return table
        return None

    def search_words_by_position(self, bbox) -> str:
        """Words contained@0.5 in bbox, reading-ordered, concatenated.

        Parity: schemas/table_semantic_parser.py:620-646 (words joined with
        "" — unlike the element join, which uses newline).
        """
        from ..kernels.geometry import is_contained, quad_to_xyxy
        from ..kernels.reading_order import prediction_reading_order

        hits = []
        directions = []
        for word in self.words:
            word_box = quad_to_xyxy(word.points)
            if is_contained(bbox, word_box, threshold=0.5):
                hits.append(
                    SemanticParagraph(
                        id=None,
                        box=list(word_box),
                        score=1.0,
                        role=None,
                        contents=word.content,
                    )
                )
                directions.append(word.direction)
        cnt_h = directions.count("horizontal")
        cnt_v = directions.count("vertical")
        order = "left2right" if cnt_h > cnt_v else "right2left"
        for h in hits:
            h.order = 0
        prediction_reading_order(hits, order)
        hits = sorted(hits, key=lambda x: x.order)
        return "".join(h.contents for h in hits)

    def find_table_by_position(self, box) -> Optional[TableSemanticContents]:
        """Parity: :680-692 (best-overlap-wins @0.5)."""
        ratios = [calc_overlap_ratio(box, t.box)[0] for t in self.tables]
        if not ratios:
            return None
        max_idx = ratios.index(max(ratios))
        return self.tables[max_idx] if ratios[max_idx] > 0.5 else None

    def search_kv_items_by_key(self, key: str) -> List[dict]:
        results = []
        for table in self.tables:
            results.extend(table.search_kv_items_by_key(key))
        return results

    def to_dict(self, merge_values=False, separator="\n"):
        """Parity: :660-671 (kv/grid dict view per table id)."""
        results = {}
        for table in self.tables:
            results[table.id] = {
                "kv_items": table.kv_items_to_dict(
                    merge_values=merge_values, separator=separator
                ),
                "grids": table.grids_to_dict(),
            }
        return results

    def dump(self):
        return {
            "tables": [t.to_dict() for t in self.tables],
            "paragraphs": [p.to_dict() for p in self.paragraphs],
            "words": [w.to_dict() for w in self.words],
        }

    # -- templates (:702-794) ----------------------------------------------

    def save_template(self, include_kv=True, include_grids=True) -> dict:
        """Template snapshot of this document's tables.

        Parity: schemas/table_semantic_parser.py:708-745 (dict form; the
        caller serializes — no file side effect in the engine).
        """
        template_tables = []
        for t in self.tables:
            tmp_cells = {}
            for cid, c in t.cells.items():
                if c.role == "group":
                    continue
                tmp_cells[str(cid)] = {
                    "id": str(c.id) if c.id is not None else str(cid),
                    "box": list(c.box) if c.box is not None else None,
                    "role": c.role,
                    "contents": c.contents,
                }
            template_tables.append(
                {
                    "id": t.id,
                    "style": t.style,
                    "box": list(t.box),
                    "cells": tmp_cells,
                    "kv_items": [kv.to_dict() for kv in t.kv_items]
                    if include_kv
                    else None,
                    "grids": [g.to_dict() for g in t.grids] if include_grids else None,
                }
            )
        return {
            "meta": {"template_version": "beta", "match_policy": "cell_id"},
            "tables": template_tables,
        }

    def apply_template(self, template: dict) -> "SemanticDocument":
        """Override roles/contents (and kv/grids) from a template.

        Parity: schemas/table_semantic_parser.py:748-794: tables matched by
        position (best overlap > 0.5), cells by id or bbox policy.
        """
        policy = template.get("meta", {}).get("match_policy", "cell_id")
        for tmp_table in template.get("tables", []):
            table = self.find_table_by_position(tmp_table["box"])
            if table is None:
                continue
            for tcell in tmp_table.get("cells", {}).values():
                cell = _match_template_cell(table, tcell, policy)
                if cell is None:
                    continue
                if tcell.get("role") is not None:
                    cell.role = tcell["role"]
                if tcell.get("contents") is not None:
                    cell.contents = tcell["contents"]
            if tmp_table.get("kv_items") is not None:
                table.kv_items = [
                    KvItem(
                        id=kv.get("id"),
                        key=list(kv["key"]),
                        value=kv["value"],
                        box=kv.get("box"),
                    )
                    for kv in tmp_table["kv_items"]
                ]
            if tmp_table.get("grids") is not None:
                table.grids = [
                    TableGrid(
                        id=g.get("id"),
                        box=list(g["box"]),
                        n_row=g["n_row"],
                        n_col=g["n_col"],
                        col_headers=[list(h) for h in g["col_headers"]],
                        data=[list(r) for r in g["data"]],
                    )
                    for g in tmp_table["grids"]
                ]
        return self


def _match_template_cell(table, tcell: dict, policy="cell_id"):
    """Parity: schemas/table_semantic_parser.py:748-764."""
    if policy == "cell_id":
        if not tcell.get("id"):
            return None
        return table.cells.get(str(tcell["id"]))
    if policy == "bbox":
        if not tcell.get("box"):
            return None
        candidates = table.search_cells_by_bbox(list(tcell["box"]))
        return candidates[0] if candidates else None
    return None
