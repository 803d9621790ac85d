"""Golden-file conformance for the semantic parser.

Mirrors the reference's corpus pattern (tests/test_table_semantic_from_json
.py:116-148): stored cell-layout inputs -> parser -> compare against
goldens. Two layers: the reference's order-insensitive metrics (n_tables /
n_grids / n_kv_items / grid-shape Counter) and the stricter byte-level dict
equality the north rule demands.
"""

import glob
import json
import os
from collections import Counter

import pytest

from yomitoku_ray.semantic.parser import parse_semantic_tables
from yomitoku_ray.semantic.schemas import SemanticCell

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
CASES = sorted(glob.glob(os.path.join(DATA_DIR, "semantic_raw_*.json")))
CASES = [c for c in CASES if not c.endswith(".golden.json")]


def _load_case(path):
    with open(path) as f:
        data = json.load(f)
    cells = [
        SemanticCell(
            contents=c["contents"],
            role=c["role"],
            id=c["id"],
            box=c["box"],
            row=c["row"],
            col=c["col"],
            row_span=c["row_span"],
            col_span=c["col_span"],
        )
        for c in data["cells"]
    ]
    with open(path.replace(".json", ".golden.json")) as f:
        golden = json.load(f)
    return {"box": data["box"], "cells": cells}, golden


def _metrics(tables):
    return {
        "n_tables": len(tables),
        "n_grids": sum(len(t["grids"]) for t in tables),
        "n_kv_items": sum(len(t["kv_items"]) for t in tables),
        "grid_shapes": Counter(
            (g["n_row"], g["n_col"]) for t in tables for g in t["grids"]
        ),
    }


@pytest.mark.parametrize("path", CASES, ids=[os.path.basename(c) for c in CASES])
def test_semantic_golden(path):
    layout, golden = _load_case(path)
    doc = parse_semantic_tables([layout], [], [])
    got = {
        "n_tables": len(doc.tables),
        "tables": [t.to_dict() for t in doc.tables],
        "views": doc.to_dict(),
    }
    # Reference-style order-insensitive metrics...
    gm, em = _metrics(got["tables"]), _metrics(golden["tables"])
    assert gm == em, path
    # ...then strict equality (tightened per the north rule).
    assert json.loads(json.dumps(got)) == golden, path


def test_corpus_present():
    assert len(CASES) == 10
