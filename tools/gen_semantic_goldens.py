"""Generate the semantic-parser golden corpus.

Mirrors the reference's conformance pattern
(``/root/reference/tests/test_table_semantic_from_json.py:116-148``: 10
captured cell-layout inputs -> goldens). Inputs here are deterministic
synthetic cell layouts (seeded; structurally similar to the reference's
debug_table_raw_{0..9} — role-tagged cells with boxes, spans, groups) and
goldens are the parser output dicts. Regenerate with:

    python tools/gen_semantic_goldens.py

Committing refreshed goldens is a deliberate act: a diff here means the
parser semantics changed.
"""

from __future__ import annotations

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yomitoku_ray.semantic.parser import parse_semantic_tables  # noqa: E402
from yomitoku_ray.semantic.schemas import SemanticCell  # noqa: E402

DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "data")
CELL_W, CELL_H, GAP = 140, 44, 12


def _grid_layout(r: random.Random, idx: int):
    """Grid-style layout: header row + data rows, optional span."""
    n_rows = r.randint(3, 5)
    n_cols = r.randint(2, 4)
    cells = []
    cid = 0
    x0, y0 = 40, 40
    span = None
    if r.random() < 0.5 and n_rows > 3 and n_cols > 2:
        span = (r.randint(1, n_rows - 2), r.randint(0, n_cols - 2))
    occupied = set()
    for i in range(n_rows):
        for j in range(n_cols):
            if (i, j) in occupied:
                continue
            rs = cs = 1
            if span == (i, j):
                rs, cs = 2, 2
                for a in range(i, i + rs):
                    for b in range(j, j + cs):
                        occupied.add((a, b))
            x1 = x0 + j * (CELL_W + GAP)
            y1 = y0 + i * (CELL_H + GAP)
            x2 = x1 + cs * CELL_W + (cs - 1) * GAP
            y2 = y1 + rs * CELL_H + (rs - 1) * GAP
            role = "header" if i == 0 else ("empty" if r.random() < 0.1 else "cell")
            text = f"h{j}" if role == "header" else (
                "" if role == "empty" else f"v{i}{j}"
            )
            cells.append(
                SemanticCell(
                    contents=text, role=role, id=f"sc{cid}", box=[x1, y1, x2, y2]
                )
            )
            cid += 1
    box = [x0 - 8, y0 - 8, x0 + n_cols * (CELL_W + GAP), y0 + n_rows * (CELL_H + GAP)]
    return {"box": box, "cells": cells}


def _kv_layout(r: random.Random, idx: int):
    """KV-style layout: header/value pairs, each pair wrapped in a group."""
    n_pairs = r.randint(2, 5)
    nested = r.random() < 0.4
    cells = []
    cid = 0
    x0, y0 = 40, 40
    for i in range(n_pairs):
        y1 = y0 + i * (CELL_H + GAP)
        x = x0
        n_keys = 2 if nested and r.random() < 0.5 else 1
        group_x2 = x0
        for kk in range(n_keys):
            cells.append(
                SemanticCell(
                    contents=f"key{i}" + (f"_{kk}" if n_keys > 1 else ""),
                    role="header",
                    id=f"sc{cid}",
                    box=[x, y1, x + CELL_W, y1 + CELL_H],
                )
            )
            cid += 1
            x += CELL_W + GAP
        val_role = "empty" if r.random() < 0.15 else "cell"
        cells.append(
            SemanticCell(
                contents="" if val_role == "empty" else f"val{i}",
                role=val_role,
                id=f"sc{cid}",
                box=[x, y1, x + CELL_W, y1 + CELL_H],
            )
        )
        cid += 1
        group_x2 = x + CELL_W
        cells.append(
            SemanticCell(
                contents=None,
                role="group",
                id=f"sc{cid}",
                box=[x0 - 4, y1 - 4, group_x2 + 4, y1 + CELL_H + 4],
            )
        )
        cid += 1
    box = [x0 - 8, y0 - 8, x0 + 4 * (CELL_W + GAP), y0 + n_pairs * (CELL_H + GAP)]
    return {"box": box, "cells": cells}


def _mixed_layout(r: random.Random, idx: int):
    """A KV block above a grid block in one table region."""
    kv = _kv_layout(r, idx)
    grid = _grid_layout(r, idx)
    y_shift = max(c.box[3] for c in kv["cells"]) + 60
    for c in grid["cells"]:
        c.id = f"sc{len(kv['cells']) + int(c.id[2:])}"
        c.box = [c.box[0], c.box[1] + y_shift, c.box[2], c.box[3] + y_shift]
    box = [
        min(kv["box"][0], grid["box"][0]),
        kv["box"][1],
        max(kv["box"][2], grid["box"][2]),
        grid["box"][3] + y_shift,
    ]
    return {"box": box, "cells": kv["cells"] + grid["cells"]}


def build_case(idx: int):
    r = random.Random(1000 + idx)
    kind = ["grid", "kv", "mixed"][idx % 3]
    layout = {"grid": _grid_layout, "kv": _kv_layout, "mixed": _mixed_layout}[kind](r, idx)
    return kind, layout


def case_input_dict(layout):
    return {
        "box": layout["box"],
        "cells": [c.to_dict() for c in layout["cells"]],
    }


def run_case(layout):
    doc = parse_semantic_tables([layout], [], [])
    return {
        "n_tables": len(doc.tables),
        "tables": [t.to_dict() for t in doc.tables],
        "views": doc.to_dict(),
    }


def main():
    os.makedirs(DATA_DIR, exist_ok=True)
    for idx in range(10):
        kind, layout = build_case(idx)
        inp = case_input_dict(layout)
        golden = run_case(layout)
        with open(os.path.join(DATA_DIR, f"semantic_raw_{idx}.json"), "w") as f:
            json.dump({"kind": kind, **inp}, f, ensure_ascii=False, indent=2, sort_keys=True)
        with open(os.path.join(DATA_DIR, f"semantic_raw_{idx}.golden.json"), "w") as f:
            json.dump(golden, f, ensure_ascii=False, indent=2, sort_keys=True)
        print(idx, kind, "tables:", golden["n_tables"],
              "grids:", sum(len(t["grids"]) for t in golden["tables"]),
              "kv:", sum(len(t["kv_items"]) for t in golden["tables"]))


if __name__ == "__main__":
    main()
