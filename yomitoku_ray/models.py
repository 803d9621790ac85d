"""Lightweight in-row document model.

These dataclasses mirror the reference's Pydantic result schemas
(``/root/reference/src/yomitoku/schemas/document_analyzer.py:9-227``) but stay
plain Python: inside a Ray batch UDF a row's elements are short-lived scratch
objects, and Pydantic validation per word would dominate runtime. Arrow
schemas (``yomitoku_ray.schemas``) enforce structure at stage boundaries
instead — the Ray-native analogue of ``extra=forbid``.

``to_dict()`` reproduces ``model_dump()`` key sets exactly so the canonical
JSON export is byte-identical.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional


@dataclass(slots=True)
class Word:
    """WordPrediction parity (schemas/document_analyzer.py:137-157)."""

    points: list  # 4 x [x, y]
    content: str
    direction: str  # "horizontal" | "vertical"
    rec_score: float
    det_score: float

    def to_dict(self):
        return {
            "points": [list(p) for p in self.points],
            "content": self.content,
            "direction": self.direction,
            "rec_score": self.rec_score,
            "det_score": self.det_score,
        }


@dataclass(slots=True)
class Paragraph:
    """ParagraphSchema parity (schemas/document_analyzer.py:32-52)."""

    box: list  # [x1, y1, x2, y2]
    contents: Optional[str]
    direction: Optional[str]
    order: Optional[int] = 0
    role: Optional[str] = None

    def to_dict(self):
        return {
            "box": list(self.box),
            "contents": self.contents,
            "direction": self.direction,
            "order": self.order,
            "role": self.role,
        }


@dataclass(slots=True)
class Element:
    """Layout element pre-aggregation (schemas/document_analyzer.py:9-29)."""

    id: Optional[str]
    box: list
    score: float
    role: Optional[str]
    contents: Optional[str] = None
    order: int = 0


@dataclass(slots=True)
class TableCell:
    """TableCellSchema parity (schemas/document_analyzer.py:55-79)."""

    col: int
    row: int
    col_span: int
    row_span: int
    box: list
    contents: Optional[str] = None

    def to_dict(self):
        return {
            "col": self.col,
            "row": self.row,
            "col_span": self.col_span,
            "row_span": self.row_span,
            "box": list(self.box),
            "contents": self.contents,
        }


@dataclass(slots=True)
class TableLine:
    """TableLineSchema parity (schemas/document_analyzer.py:82-91)."""

    box: list
    score: float

    def to_dict(self):
        return {"box": list(self.box), "score": self.score}


@dataclass(slots=True)
class Table:
    """TableStructureRecognizerSchema parity (schemas/document_analyzer.py:93-119)."""

    box: list
    n_row: int
    n_col: int
    rows: List[TableLine] = field(default_factory=list)
    cols: List[TableLine] = field(default_factory=list)
    spans: List[TableLine] = field(default_factory=list)
    cells: List[TableCell] = field(default_factory=list)
    order: int = 0

    def to_dict(self):
        return {
            "box": list(self.box),
            "n_row": self.n_row,
            "n_col": self.n_col,
            "rows": [r.to_dict() for r in self.rows],
            "cols": [c.to_dict() for c in self.cols],
            "spans": [s.to_dict() for s in self.spans],
            "cells": [c.to_dict() for c in self.cells],
            "order": self.order,
        }


@dataclass(slots=True)
class Figure:
    """FigureSchema parity (schemas/document_analyzer.py:189-204)."""

    box: list
    order: Optional[int] = 0
    paragraphs: List[Paragraph] = field(default_factory=list)
    direction: Optional[str] = None

    def to_dict(self):
        return {
            "box": list(self.box),
            "order": self.order,
            "paragraphs": [p.to_dict() for p in self.paragraphs],
            "direction": self.direction,
        }


@dataclass(slots=True)
class Document:
    """DocumentAnalyzerSchema parity (schemas/document_analyzer.py:207-227)."""

    paragraphs: List[Paragraph] = field(default_factory=list)
    tables: List[Table] = field(default_factory=list)
    figures: List[Figure] = field(default_factory=list)
    words: List[Word] = field(default_factory=list)

    def to_dict(self):
        return {
            "paragraphs": [p.to_dict() for p in self.paragraphs],
            "tables": [t.to_dict() for t in self.tables],
            "figures": [f.to_dict() for f in self.figures],
            "words": [w.to_dict() for w in self.words],
        }
