"""Canonical JSON rendering.

Byte-identity is defined by the exact serializer kwargs of the reference
(``/root/reference/src/yomitoku/export/export_json.py:88-97``):
``ensure_ascii=False, indent=4, sort_keys=True, separators=(",", ": ")``.
"""

from __future__ import annotations

import json


def dumps_canonical_json(data) -> str:
    """Parity: export_json.py:88-97 (string form, no file write)."""
    return json.dumps(
        data,
        ensure_ascii=False,
        indent=4,
        sort_keys=True,
        separators=(",", ": "),
    )


def convert_json(document, ignore_line_break=False) -> str:
    """Render a Document to its canonical JSON string.

    Parity: export_json.py:7-15,39-58 (the line-break strip mutates contents
    exactly as the reference does before dumping).
    """
    if ignore_line_break:
        for table in document.tables:
            for cell in table.cells:
                cell.contents = cell.contents.replace("\n", "")
        for paragraph in document.paragraphs:
            paragraph.contents = paragraph.contents.replace("\n", "")

    return fast_document_json(document)


# ---------------------------------------------------------------------------
# Schema-specialized canonical serializer.
#
# json.dumps with indent falls back to the pure-Python encoder (the C
# encoder only handles indent=None), which profiling showed at ~37% of the
# whole pipeline. The document schema is fixed, so the canonical layout
# (sorted keys, indent=4, separators=(",", ": ")) can be emitted directly
# with f-strings + C-encoded leaf strings. Byte-identity with
# ``dumps_canonical_json(document.to_dict())`` is asserted by
# tests/test_fast_json.py over the synthetic corpus.
# ---------------------------------------------------------------------------

_P = [" " * (4 * i) for i in range(10)]
_P2, _P3, _P4, _P5 = _P[2], _P[3], _P[4], _P[5]


def _js(s):
    if s is None:
        return "null"
    # encode_basestring is exactly what json.dumps(s, ensure_ascii=False)
    # applies to a leaf string, minus the per-call JSONEncoder construction
    # (dumps only caches the ensure_ascii=True encoder).
    return json.encoder.encode_basestring(s)


def _box_json(box, lvl):
    # Serves both xyxy boxes (4 ints) and quad points (2 ints).
    p = _P[lvl + 1]
    if len(box) == 4:
        b0, b1, b2, b3 = box
        return f"[\n{p}{int(b0)},\n{p}{int(b1)},\n{p}{int(b2)},\n{p}{int(b3)}\n{_P[lvl]}]"
    if len(box) == 2:
        b0, b1 = box
        return f"[\n{p}{int(b0)},\n{p}{int(b1)}\n{_P[lvl]}]"
    inner = f",\n{p}".join(str(int(v)) for v in box)
    return f"[\n{p}{inner}\n{_P[lvl]}]"


def _points_json(points, lvl):
    p = _P[lvl + 1]
    pts = f",\n{p}".join(_box_json(pt, lvl + 1) for pt in points)
    return f"[\n{p}{pts}\n{_P[lvl]}]"


def _word_json(w, lvl):
    # Words only appear in document.words (lvl 2); the flat single-f-string
    # form skips ~10 nested builder calls per word — the words list is by
    # far the largest block of the document JSON.
    if lvl == 2 and len(w.points) == 4:
        (x0, y0), (x1, y1), (x2, y2), (x3, y3) = w.points
        return (
            f'{{\n{_P3}"content": {_js(w.content)},\n'
            f'{_P3}"det_score": {w.det_score!r},\n'
            f'{_P3}"direction": {_js(w.direction)},\n'
            f'{_P3}"points": [\n'
            f"{_P4}[\n{_P5}{int(x0)},\n{_P5}{int(y0)}\n{_P4}],\n"
            f"{_P4}[\n{_P5}{int(x1)},\n{_P5}{int(y1)}\n{_P4}],\n"
            f"{_P4}[\n{_P5}{int(x2)},\n{_P5}{int(y2)}\n{_P4}],\n"
            f"{_P4}[\n{_P5}{int(x3)},\n{_P5}{int(y3)}\n{_P4}]\n"
            f'{_P3}],\n'
            f'{_P3}"rec_score": {w.rec_score!r}\n'
            f"{_P2}}}"
        )
    p = _P[lvl + 1]
    return (
        f"{{\n"
        f'{p}"content": {_js(w.content)},\n'
        f'{p}"det_score": {repr(w.det_score)},\n'
        f'{p}"direction": {_js(w.direction)},\n'
        f'{p}"points": {_points_json(w.points, lvl + 1)},\n'
        f'{p}"rec_score": {repr(w.rec_score)}\n'
        f"{_P[lvl]}}}"
    )


def _paragraph_json(par, lvl):
    p = _P[lvl + 1]
    order = "null" if par.order is None else str(int(par.order))
    return (
        f"{{\n"
        f'{p}"box": {_box_json(par.box, lvl + 1)},\n'
        f'{p}"contents": {_js(par.contents)},\n'
        f'{p}"direction": {_js(par.direction)},\n'
        f'{p}"order": {order},\n'
        f'{p}"role": {_js(par.role)}\n'
        f"{_P[lvl]}}}"
    )


def _cell_json(c, lvl):
    p = _P[lvl + 1]
    return (
        f"{{\n"
        f'{p}"box": {_box_json(c.box, lvl + 1)},\n'
        f'{p}"col": {int(c.col)},\n'
        f'{p}"col_span": {int(c.col_span)},\n'
        f'{p}"contents": {_js(c.contents)},\n'
        f'{p}"row": {int(c.row)},\n'
        f'{p}"row_span": {int(c.row_span)}\n'
        f"{_P[lvl]}}}"
    )


def _line_json(ln, lvl):
    p = _P[lvl + 1]
    return (
        f"{{\n"
        f'{p}"box": {_box_json(ln.box, lvl + 1)},\n'
        f'{p}"score": {repr(ln.score)}\n'
        f"{_P[lvl]}}}"
    )


def _list_json(items, lvl, fn):
    if not items:
        return "[]"
    p = _P[lvl + 1]
    body = f",\n{p}".join(fn(it, lvl + 1) for it in items)
    return f"[\n{p}{body}\n{_P[lvl]}]"


def _table_json(t, lvl):
    p = _P[lvl + 1]
    return (
        f"{{\n"
        f'{p}"box": {_box_json(t.box, lvl + 1)},\n'
        f'{p}"cells": {_list_json(t.cells, lvl + 1, _cell_json)},\n'
        f'{p}"cols": {_list_json(t.cols, lvl + 1, _line_json)},\n'
        f'{p}"n_col": {int(t.n_col)},\n'
        f'{p}"n_row": {int(t.n_row)},\n'
        f'{p}"order": {int(t.order)},\n'
        f'{p}"rows": {_list_json(t.rows, lvl + 1, _line_json)},\n'
        f'{p}"spans": {_list_json(t.spans, lvl + 1, _line_json)}\n'
        f"{_P[lvl]}}}"
    )


def _figure_json(f, lvl):
    p = _P[lvl + 1]
    order = "null" if f.order is None else str(int(f.order))
    return (
        f"{{\n"
        f'{p}"box": {_box_json(f.box, lvl + 1)},\n'
        f'{p}"direction": {_js(f.direction)},\n'
        f'{p}"order": {order},\n'
        f'{p}"paragraphs": {_list_json(f.paragraphs, lvl + 1, _paragraph_json)}\n'
        f"{_P[lvl]}}}"
    )


def fast_document_json(document) -> str:
    p = _P[1]
    return (
        f"{{\n"
        f'{p}"figures": {_list_json(document.figures, 1, _figure_json)},\n'
        f'{p}"paragraphs": {_list_json(document.paragraphs, 1, _paragraph_json)},\n'
        f'{p}"tables": {_list_json(document.tables, 1, _table_json)},\n'
        f'{p}"words": {_list_json(document.words, 1, _word_json)}\n'
        f"}}"
    )


# ---------------------------------------------------------------------------
# Generic fast canonical serializer.
#
# The semantic stage serializes three differently-shaped payloads
# (doc.dump(), views, extraction results); profiling put the generic
# json.dumps(indent=4) pure-Python encoder at ~43% of the stage's CPU.
# This recursive emitter produces byte-identical output for plain JSON
# trees (str keys, str/int/float/bool/None leaves, list/tuple/dict
# containers) using the C encoder for leaf strings; anything outside that
# shape falls back to dumps_canonical_json for the whole call, so byte
# identity is unconditional (asserted by tests/test_fast_json.py).
# ---------------------------------------------------------------------------

class _Unsupported(Exception):
    pass


# C-accelerated string escaper — the exact function the stdlib encoder
# uses for ensure_ascii=False (json.dumps per leaf would rebuild a whole
# JSONEncoder per call, which profiling showed dominates).
_esc = json.encoder.encode_basestring
_INF = float("inf")


# per-level "\n<indent>" strings, grown on demand
_NLP = ["\n" + " " * (4 * i) for i in range(10)]


def _nlp(lvl: int) -> str:
    while len(_NLP) <= lvl:
        _NLP.append("\n" + " " * (4 * len(_NLP)))
    return _NLP[lvl]


def _enc_any(o, lvl: int, out: list) -> None:
    t = type(o)
    if t is str:
        out.append(_esc(o))
    elif t is int:
        out.append(repr(o))
    elif o is None:
        out.append("null")
    elif o is True:
        out.append("true")
    elif o is False:
        out.append("false")
    elif t is float:
        if o != o:
            out.append("NaN")
        elif o == _INF:
            out.append("Infinity")
        elif o == -_INF:
            out.append("-Infinity")
        else:
            out.append(repr(o))
    elif t is list or t is tuple:
        if not o:
            out.append("[]")
            return
        p = _nlp(lvl + 1)
        for v in o:
            # boxes/points dominate these payloads: emit int-only lists
            # without one recursive call per element
            if type(v) is not int:
                break
        else:
            out.append("[" + p + ("," + p).join([repr(v) for v in o]))
            out.append(_nlp(lvl) + "]")
            return
        sep = "," + p
        out.append("[")
        out.append(p)
        first = True
        for v in o:
            if not first:
                out.append(sep)
            first = False
            _enc_any(v, lvl + 1, out)
        out.append(_nlp(lvl) + "]")
    elif t is dict:
        if not o:
            out.append("{}")
            return
        p = _nlp(lvl + 1)
        sep = "," + p
        out.append("{")
        out.append(p)
        try:
            keys = sorted(o)
        except TypeError as exc:  # mixed-type keys: json would raise too
            raise _Unsupported from exc
        first = True
        for k in keys:
            if type(k) is not str:
                raise _Unsupported  # json would coerce; rare — fall back
            if not first:
                out.append(sep)
            first = False
            out.append(_esc(k))
            out.append(": ")
            _enc_any(o[k], lvl + 1, out)
        out.append(_nlp(lvl) + "}")
    else:
        raise _Unsupported  # unknown type: let the stdlib raise its error


# ---------------------------------------------------------------------------
# Schema-specialized canonical serializers for the semantic stage.
#
# SemanticExtractStage serializes doc.dump() and doc.to_dict() per page;
# profiling put the generic _enc_any walk at ~28% of the stage's CPU. The
# semantic schemas are fixed (semantic/schemas.py), so both payloads get
# the same direct-emit treatment as fast_document_json. Byte identity with
# fast_canonical_json over the synthetic corpus plus hand-built edge
# fixtures is asserted by tests/test_fast_json.py; anything outside the
# expected shape falls back to the generic (itself fallback-guarded) path.
# ---------------------------------------------------------------------------


def _null_int(v):
    return "null" if v is None else repr(v)


def _float_json(v):
    if v != v:
        return "NaN"
    if v == _INF:
        return "Infinity"
    if v == -_INF:
        return "-Infinity"
    return repr(v)


def _js_strict(s):
    if s is None:
        return "null"
    if type(s) is not str:
        raise _Unsupported
    return _esc(s)


def _int_list_json(box, lvl):
    """list[int] (boxes, spans) — generic int emit, no truncation."""
    if not box:
        return "[]"
    p = _P[lvl + 1]
    for v in box:
        if type(v) is not int:
            raise _Unsupported
    return f"[\n{p}" + f",\n{p}".join(map(repr, box)) + f"\n{_P[lvl]}]"


def _str_list_json(xs, lvl):
    if not xs:
        return "[]"
    p = _P[lvl + 1]
    return f"[\n{p}" + f",\n{p}".join(_js_strict(x) for x in xs) + f"\n{_P[lvl]}]"


def _nested_str_list_json(rows, lvl):
    if not rows:
        return "[]"
    p = _P[lvl + 1]
    return (
        f"[\n{p}"
        + f",\n{p}".join(_str_list_json(r, lvl + 1) for r in rows)
        + f"\n{_P[lvl]}]"
    )


def _sem_cell_json(c, lvl):
    p = _P[lvl + 1]
    if c.meta:
        parts: list = []
        _enc_any(c.meta, lvl + 1, parts)
        meta = "".join(parts)
    else:
        meta = "{}"
    return (
        f"{{\n"
        f'{p}"box": {_int_list_json(c.box, lvl + 1)},\n'
        f'{p}"col": {_null_int(c.col)},\n'
        f'{p}"col_span": {_null_int(c.col_span)},\n'
        f'{p}"contents": {_js_strict(c.contents)},\n'
        f'{p}"id": {_js_strict(c.id)},\n'
        f'{p}"meta": {meta},\n'
        f'{p}"role": {_js_strict(c.role)},\n'
        f'{p}"row": {_null_int(c.row)},\n'
        f'{p}"row_span": {_null_int(c.row_span)}\n'
        f"{_P[lvl]}}}"
    )


def _sem_kv_json(kv, lvl):
    p = _P[lvl + 1]
    box = "null" if kv.box is None else _int_list_json(kv.box, lvl + 1)
    return (
        f"{{\n"
        f'{p}"box": {box},\n'
        f'{p}"id": {_js_strict(kv.id)},\n'
        f'{p}"key": {_str_list_json(kv.key, lvl + 1)},\n'
        f'{p}"value": {_js_strict(kv.value)}\n'
        f"{_P[lvl]}}}"
    )


def _sem_grid_json(g, lvl):
    p = _P[lvl + 1]
    return (
        f"{{\n"
        f'{p}"box": {_int_list_json(g.box, lvl + 1)},\n'
        f'{p}"col_headers": {_nested_str_list_json(g.col_headers, lvl + 1)},\n'
        f'{p}"data": {_nested_str_list_json(g.data, lvl + 1)},\n'
        f'{p}"id": {_js_strict(g.id)},\n'
        f'{p}"n_col": {repr(g.n_col)},\n'
        f'{p}"n_row": {repr(g.n_row)}\n'
        f"{_P[lvl]}}}"
    )


def _sorted_str_keys(d):
    try:
        keys = sorted(d)
    except TypeError as exc:
        raise _Unsupported from exc
    for k in keys:
        if type(k) is not str:
            raise _Unsupported
    return keys


def _sem_cells_json(cells, lvl):
    if not cells:
        return "{}"
    p = _P[lvl + 1]
    body = f",\n{p}".join(
        f"{_esc(k)}: {_sem_cell_json(cells[k], lvl + 1)}"
        for k in _sorted_str_keys(cells)
    )
    return f"{{\n{p}{body}\n{_P[lvl]}}}"


def _sem_table_json(t, lvl):
    p = _P[lvl + 1]
    return (
        f"{{\n"
        f'{p}"box": {_int_list_json(t.box, lvl + 1)},\n'
        f'{p}"cells": {_sem_cells_json(t.cells, lvl + 1)},\n'
        f'{p}"grids": {_list_json(t.grids, lvl + 1, _sem_grid_json)},\n'
        f'{p}"id": {_js_strict(t.id)},\n'
        f'{p}"kv_items": {_list_json(t.kv_items, lvl + 1, _sem_kv_json)},\n'
        f'{p}"style": {_js_strict(t.style)}\n'
        f"{_P[lvl]}}}"
    )


def _sem_par_json(par, lvl):
    p = _P[lvl + 1]
    return (
        f"{{\n"
        f'{p}"box": {_int_list_json(par.box, lvl + 1)},\n'
        f'{p}"contents": {_js_strict(par.contents)},\n'
        f'{p}"id": {_js_strict(par.id)},\n'
        f'{p}"role": {_js_strict(par.role)},\n'
        f'{p}"score": {_float_json(par.score)}\n'
        f"{_P[lvl]}}}"
    )


def _sem_word_json(w, lvl):
    # Word boxes in the semantic path may be plain int quads of any shape;
    # delegate to the document-schema word emitter (same key set).
    return _word_json(w, lvl)


def fast_semantic_dump_json(doc) -> str:
    """Byte-identical to ``fast_canonical_json(doc.dump())`` for
    SemanticDocument, without building the intermediate dict tree."""
    p = _P[1]
    try:
        return (
            f"{{\n"
            f'{p}"paragraphs": {_list_json(doc.paragraphs, 1, _sem_par_json)},\n'
            f'{p}"tables": {_list_json(doc.tables, 1, _sem_table_json)},\n'
            f'{p}"words": {_list_json(doc.words, 1, _sem_word_json)}\n'
            f"}}"
        )
    except (_Unsupported, TypeError, AttributeError):
        return fast_canonical_json(doc.dump())


def _views_rows_json(rows, lvl):
    """list[dict[str, str]] — a grid's parsed row records."""
    if not rows:
        return "[]"
    p = _P[lvl + 1]
    return (
        f"[\n{p}"
        + f",\n{p}".join(_flat_str_dict_json(r, lvl + 1) for r in rows)
        + f"\n{_P[lvl]}]"
    )


def _flat_str_dict_json(d, lvl):
    if not d:
        return "{}"
    p = _P[lvl + 1]
    body = f",\n{p}".join(
        f"{_esc(k)}: {_js_strict(d[k])}" for k in _sorted_str_keys(d)
    )
    return f"{{\n{p}{body}\n{_P[lvl]}}}"


def _views_grid_json(g, lvl):
    if len(g) != 2:  # exactly {"id", "rows"} — anything else diverges
        raise _Unsupported
    p = _P[lvl + 1]
    return (
        f"{{\n"
        f'{p}"id": {_js_strict(g["id"])},\n'
        f'{p}"rows": {_views_rows_json(g["rows"], lvl + 1)}\n'
        f"{_P[lvl]}}}"
    )


def fast_views_json(views) -> str:
    """Byte-identical to ``fast_canonical_json(doc.to_dict())`` for the
    fixed views shape {table_id: {"grids": [...], "kv_items": {str: str}}}."""
    try:
        if not views:
            return "{}"
        p, q = _P[1], _P[2]
        parts = []
        for tid in _sorted_str_keys(views):
            v = views[tid]
            if len(v) != 2:  # exactly {"grids", "kv_items"}
                raise _Unsupported
            grids = v["grids"]
            if grids:
                r = _P[3]
                gbody = f",\n{r}".join(_views_grid_json(g, 3) for g in grids)
                gs = f"[\n{r}{gbody}\n{q}]"
            else:
                gs = "[]"
            parts.append(
                f"{_esc(tid)}: {{\n"
                f'{q}"grids": {gs},\n'
                f'{q}"kv_items": {_flat_str_dict_json(v["kv_items"], 2)}\n'
                f"{p}}}"
            )
        return f"{{\n{p}" + f",\n{p}".join(parts) + "\n}"
    except (_Unsupported, TypeError, AttributeError, KeyError):
        return fast_canonical_json(views)


def fast_canonical_json(data) -> str:
    """Byte-identical to :func:`dumps_canonical_json` on plain JSON trees
    (str keys; str/int/float/bool/None leaves; list/tuple/dict containers),
    several times faster; falls back to the stdlib for anything exotic."""
    out: list = []
    try:
        _enc_any(data, 0, out)
    except _Unsupported:
        return dumps_canonical_json(data)
    return "".join(out)
