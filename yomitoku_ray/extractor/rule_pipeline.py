"""Rule-based field extraction over a SemanticDocument.

Re-implementation of the reference's extraction semantics
(``/root/reference/src/yomitoku/extractor/rule_pipeline.py:19-361`` and
``extractor/pipeline.py:19-137``), behavior pinned by exact-output tests.
The scalar cascade order is byte-identity-critical and runs as an ordered
strategy chain: cell_id -> bbox -> KV-key match (optional multi-value merge
sorted by the dominant spread axis) -> cell substring -> paragraph
substring -> regex over cells/paragraphs/words -> not_found.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Dict, List

from ..functions.normalize import apply_normalize
from ..kernels.geometry import calc_overlap_ratio, quad_to_xyxy


@dataclass
class ResolvedElement:
    """Provenance atom (extractor/resolver.py:12-18 shape)."""

    id: str
    box: List[int]
    contents: str
    label: str = ""


@dataclass
class ResolvedField:
    """One extracted field with provenance (extractor/resolver.py:20-27)."""

    name: str
    value: Any
    raw_text: str
    elements: List[ResolvedElement] = field(default_factory=list)
    confidence: str = "low"
    source: str = "cell_search"


def _normalize_text(text: str) -> str:
    """Space-insensitive match key (rule_pipeline.py:19-20)."""
    return re.sub(r"[ 　]", "", text)


def _elem(obj, obj_id=None) -> ResolvedElement:
    return ResolvedElement(
        id=obj_id if obj_id is not None else obj.id,
        box=list(obj.box),
        contents=obj.contents or "",
    )


def _hit(fs, value, raw_text, elements, confidence, source) -> ResolvedField:
    return ResolvedField(
        name=fs.name,
        value=value,
        raw_text=raw_text,
        elements=elements,
        confidence=confidence,
        source=source,
    )


def _cell_hit(fs, cell, confidence, source) -> ResolvedField:
    contents = cell.contents or ""
    return _hit(fs, contents, contents, [_elem(cell)], confidence, source)


# -- scalar cascade strategies (ordered; each returns ResolvedField | None) --


def _by_cell_id(doc, fs):
    if not fs.cell_id:
        return None
    for table in doc.tables:
        cell = table.find_cell_by_id(fs.cell_id)
        if cell is not None:
            return _cell_hit(fs, cell, "high", "cell_id")
    return None


def _by_bbox(doc, fs):
    if not fs.bbox:
        return None
    for table in doc.tables:
        cells = table.search_cells_by_bbox(fs.bbox)
        if cells:
            return _cell_hit(fs, cells[0], "high", "bbox")
    return None


def _sort_by_spread_axis(cells):
    """Y-order when the value cells spread vertically, else X-order."""
    boxes = [c.box for c in cells]
    x_spread = max(b[0] for b in boxes) - min(b[0] for b in boxes)
    y_spread = max(b[1] for b in boxes) - min(b[1] for b in boxes)
    cells.sort(key=(lambda c: c.box[1]) if y_spread >= x_spread else (lambda c: c.box[0]))


def _by_kv_key(doc, fs):
    if not fs.description:
        return None
    kv_results = doc.search_kv_items_by_key(fs.description)
    if not kv_results:
        return None

    if getattr(fs, "merge_values", False) and len(kv_results) > 1:
        value_cells = [kv["value"] for kv in kv_results if kv["value"] is not None]
        if value_cells:
            _sort_by_spread_axis(value_cells)
            joined = fs.separator.join(c.contents or "" for c in value_cells)
            return _hit(
                fs, joined, joined, [_elem(c) for c in value_cells], "high", "kv"
            )
        return None

    value_cell = kv_results[0]["value"]
    if value_cell is None or isinstance(value_cell, list):
        return None
    return _cell_hit(fs, value_cell, "high", "kv")


def _by_cell_query(doc, fs):
    if not fs.description:
        return None
    for table in doc.tables:
        cells = table.search_cells_by_query(fs.description)
        if cells:
            return _cell_hit(fs, cells[0], "medium", "cell_query")
    return None


def _by_paragraph_query(doc, fs):
    if not fs.description:
        return None
    needle = _normalize_text(fs.description)
    for paragraph in doc.paragraphs:
        if paragraph.contents and needle in _normalize_text(paragraph.contents):
            contents = paragraph.contents or ""
            pid = paragraph.id or "p0"
            return _hit(fs, contents, contents, [_elem(paragraph, pid)], "medium", "paragraph")
    return None


def _by_regex(doc, fs):
    """Regex sweep: cells first, then paragraphs, then raw words
    (rule_pipeline.py:68-138)."""
    if not fs.regex:
        return None
    pattern = re.compile(fs.regex)

    for table in doc.tables:
        for cell in table.cells.values():
            if cell.role == "group" or not cell.contents:
                continue
            m = pattern.search(cell.contents)
            if m:
                return _hit(
                    fs, m.group(0), cell.contents, [_elem(cell)], "high", "regex"
                )

    for i, paragraph in enumerate(doc.paragraphs):
        if not paragraph.contents:
            continue
        m = pattern.search(paragraph.contents)
        if m:
            pid = paragraph.id or f"p{i}"
            return _hit(
                fs, m.group(0), paragraph.contents, [_elem(paragraph, pid)], "high", "regex"
            )

    for i, word in enumerate(doc.words):
        if not word.content:
            continue
        m = pattern.search(word.content)
        if m:
            el = ResolvedElement(
                id=f"w{i}", box=list(quad_to_xyxy(word.points)), contents=word.content
            )
            return _hit(fs, m.group(0), word.content, [el], "high", "regex")
    return None


_SCALAR_CHAIN = (_by_cell_id, _by_bbox, _by_kv_key, _by_cell_query, _by_paragraph_query, _by_regex)


def _extract_scalar_field(doc, fs) -> ResolvedField:
    for strategy in _SCALAR_CHAIN:
        result = strategy(doc, fs)
        if result is not None:
            return result
    return _hit(fs, "", "", [], "low", "not_found")


# -- table extraction --------------------------------------------------------


def _column_matches(table, header_cell_ids, col_schema) -> bool:
    """Header match precedence: cell_id > bbox overlap@0.5 > normalized
    substring of the joined header text (rule_pipeline.py:265-284)."""
    if col_schema.cell_id:
        return col_schema.cell_id in header_cell_ids
    if col_schema.bbox:
        return any(
            (cell := table.cells.get(cid)) is not None
            and cell.box
            and calc_overlap_ratio(col_schema.bbox, list(cell.box))[0] > 0.5
            for cid in header_cell_ids
        )
    key = col_schema.description if col_schema.description else col_schema.name
    header_text = "".join(
        (table.cells.get(cid).contents or "")
        for cid in header_cell_ids
        if table.cells.get(cid)
    )
    return _normalize_text(key) in _normalize_text(header_text)


def _extract_table_field(doc, fs) -> ResolvedField:
    """Grid rows -> records keyed by matched schema columns
    (rule_pipeline.py:287-361; all-header rows skipped)."""
    if not fs.columns:
        return _hit(fs, [], "", [], "low", "not_found")

    records: List[dict] = []
    elements: List[ResolvedElement] = []

    for table in doc.tables:
        for grid in table.grids:
            col_map: Dict[str, List[int]] = {}
            for col_idx, header_ids in enumerate(grid.col_headers):
                for col_schema in fs.columns:
                    if _column_matches(table, header_ids, col_schema):
                        col_map.setdefault(col_schema.name, []).append(col_idx)
                        break
            if not col_map:
                continue

            header_ids_flat = {cid for ids in grid.col_headers for cid in ids}
            for row in grid.data:
                present = [cid for cid in row if cid is not None]
                if present and all(cid in header_ids_flat for cid in present):
                    continue

                record = {}
                for name, col_indices in col_map.items():
                    values, cell_ids = [], []
                    for col_idx in col_indices:
                        if col_idx >= len(row) or row[col_idx] is None:
                            continue
                        cid = row[col_idx]
                        cell = table.cells.get(cid)
                        cell_ids.append(cid)
                        if cell:
                            values.append(cell.contents or "")
                            elements.append(
                                ResolvedElement(
                                    id=cid,
                                    box=list(cell.box),
                                    contents=cell.contents or "",
                                    label=name,
                                )
                            )
                    record[name] = {"value": "".join(values), "cell_ids": cell_ids}
                if record:
                    records.append(record)

    if records:
        return _hit(fs, records, "", elements, "high", "grid")
    return _hit(fs, [], "", elements, "low", "not_found")


# -- normalization + output builders ----------------------------------------


def _normalize_resolved_fields(fields, schema, skip_normalize=False):
    """Apply per-field/column normalize rules (extractor/pipeline.py:19-55)."""
    if skip_normalize:
        return fields
    by_name = {f.name: f for f in schema.fields}
    for rf in fields:
        fs = by_name.get(rf.name)
        if fs is None:
            continue
        if fs.structure in ("scalar", "kv") and isinstance(rf.value, str):
            rf.value = apply_normalize(rf.value, fs.normalize)
        elif fs.structure == "table" and isinstance(rf.value, list):
            col_rules = {
                c.name: c.normalize for c in (fs.columns or []) if c.normalize
            }
            for row in rf.value:
                if not isinstance(row, dict):
                    continue
                for name, cell_val in row.items():
                    rule = col_rules.get(name)
                    if rule and isinstance(cell_val, dict):
                        cell_val["value"] = apply_normalize(
                            cell_val.get("value", ""), rule
                        )
    return fields


def _build_output(fields) -> Dict[str, Any]:
    """Provenance-rich output (extractor/pipeline.py:58-111)."""
    output: Dict[str, Any] = {"fields": {}, "metadata": {"schema_version": "1.0"}}
    for rf in fields:
        boxes = {e.id: e.box for e in rf.elements}
        texts = {e.id: e.contents for e in rf.elements}

        if isinstance(rf.value, list):
            records = []
            for row in rf.value:
                if not isinstance(row, dict):
                    records.append(row)
                    continue
                enriched = {}
                for name, cell_val in row.items():
                    if isinstance(cell_val, dict):
                        ids = cell_val.get("cell_ids", [])
                        enriched[name] = {
                            **cell_val,
                            "raw_text": " ".join(
                                texts[c] for c in ids if c in texts
                            ),
                            "bboxes": [boxes[c] for c in ids if c in boxes],
                        }
                    else:
                        enriched[name] = cell_val
                records.append(enriched)
            output["fields"][rf.name] = {
                "structure": "table",
                "records": records,
                "source": rf.source,
            }
        else:
            output["fields"][rf.name] = {
                "structure": "kv",
                "value": rf.value,
                "raw_text": rf.raw_text,
                "confidence": rf.confidence,
                "source": rf.source,
                "cell_ids": [e.id for e in rf.elements],
                "bboxes": [e.box for e in rf.elements],
            }
    return output


def _build_simple_output(fields) -> Dict[str, Any]:
    """Values-only output (extractor/pipeline.py:114-137)."""
    output: Dict[str, Any] = {}
    for rf in fields:
        if isinstance(rf.value, list):
            records = []
            for row in rf.value:
                if not isinstance(row, dict):
                    records.append(row)
                    continue
                records.append(
                    {
                        name: (v.get("value", "") if isinstance(v, dict) else v)
                        for name, v in row.items()
                    }
                )
            output[rf.name] = records
        elif isinstance(rf.value, dict):
            output[rf.name] = rf.value.get("value", "")
        else:
            output[rf.name] = rf.value
    return output


def run_rule_extraction(
    semantic_info,
    schema,
    no_normalize: bool = False,
    simple: bool = False,
) -> Dict[str, Any]:
    """Per-document rule extraction (rule_pipeline.py:364-403 minus
    file/visualization side effects — the Ray stage writes the result as a
    column)."""
    resolved = [
        _extract_table_field(semantic_info, fs)
        if fs.structure == "table"
        else _extract_scalar_field(semantic_info, fs)
        for fs in schema.fields
    ]
    resolved = _normalize_resolved_fields(resolved, schema, skip_normalize=no_normalize)
    return _build_simple_output(resolved) if simple else _build_output(resolved)
