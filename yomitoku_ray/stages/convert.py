"""Dataclass <-> Arrow-row conversion at stage boundaries."""

from __future__ import annotations

from ..detect import Detections
from ..models import Element, Table, TableCell, TableLine, Word


def detections_to_row(det: Detections) -> dict:
    return {
        "words": [w.to_dict() for w in det.words],
        "paragraphs": [
            {"box": list(p.box), "score": p.score, "role": p.role}
            for p in det.paragraphs
        ],
        "tables": [t.to_dict() for t in det.tables],
        "figures": [
            {"box": list(f.box), "score": f.score, "role": f.role}
            for f in det.figures
        ],
        "n_boilerplate": det.n_boilerplate,
        "truncated": det.truncated,
    }


def empty_detections_row() -> dict:
    return {
        "words": [],
        "paragraphs": [],
        "tables": [],
        "figures": [],
        "n_boilerplate": 0,
        "truncated": False,
    }


def row_to_detections(row: dict) -> Detections:
    det = Detections()
    det.words = [
        Word(
            points=[list(p) for p in w["points"]],
            content=w["content"],
            direction=w["direction"],
            rec_score=w["rec_score"],
            det_score=w["det_score"],
        )
        for w in row["words"]
    ]
    det.paragraphs = [
        Element(id=None, box=list(p["box"]), score=p["score"], role=p["role"])
        for p in row["paragraphs"]
    ]
    det.tables = [
        Table(
            box=list(t["box"]),
            n_row=t["n_row"],
            n_col=t["n_col"],
            rows=[TableLine(box=list(x["box"]), score=x["score"]) for x in t["rows"]],
            cols=[TableLine(box=list(x["box"]), score=x["score"]) for x in t["cols"]],
            spans=[TableLine(box=list(x["box"]), score=x["score"]) for x in t["spans"]],
            cells=[
                TableCell(
                    col=c["col"],
                    row=c["row"],
                    col_span=c["col_span"],
                    row_span=c["row_span"],
                    box=list(c["box"]),
                    contents=c["contents"],
                )
                for c in t["cells"]
            ],
            order=t["order"],
        )
        for t in row["tables"]
    ]
    det.figures = [
        Element(id=None, box=list(f["box"]), score=f["score"], role=f["role"])
        for f in row["figures"]
    ]
    det.n_boilerplate = row.get("n_boilerplate", 0)
    det.truncated = row.get("truncated", False)
    return det
