"""Rule-based field extraction over a SemanticDocument.

Port of the reference's scalar cascade and table extraction
(``/root/reference/src/yomitoku/extractor/rule_pipeline.py:19-361``) and the
output builders (``extractor/pipeline.py:19-137``). The cascade order is
byte-identity-critical: cell_id -> bbox -> KV-key match (optional
multi-value merge sorted by dominant spread axis) -> cell substring ->
paragraph substring -> regex over cells/paragraphs/words -> not_found.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Dict, List

from ..functions.normalize import apply_normalize
from ..kernels.geometry import calc_overlap_ratio, quad_to_xyxy


@dataclass
class ResolvedElement:
    """Parity: extractor/resolver.py:12-18."""

    id: str
    box: List[int]
    contents: str
    label: str = ""


@dataclass
class ResolvedField:
    """Parity: extractor/resolver.py:20-27."""

    name: str
    value: Any
    raw_text: str
    elements: List[ResolvedElement] = field(default_factory=list)
    confidence: str = "low"
    source: str = "cell_search"


def _normalize_text(text: str) -> str:
    """Parity: rule_pipeline.py:19-20."""
    return re.sub(r"[ 　]", "", text)


def _extract_scalar_by_cell_id(semantic_info, field_schema):
    """Parity: rule_pipeline.py:23-42."""
    for table in semantic_info.tables:
        cell = table.find_cell_by_id(field_schema.cell_id)
        if cell is not None:
            contents = cell.contents or ""
            return ResolvedField(
                name=field_schema.name,
                value=contents,
                raw_text=contents,
                elements=[ResolvedElement(id=cell.id, box=list(cell.box), contents=contents)],
                confidence="high",
                source="cell_id",
            )
    return None


def _extract_scalar_by_bbox(semantic_info, field_schema):
    """Parity: rule_pipeline.py:45-65."""
    for table in semantic_info.tables:
        cells = table.search_cells_by_bbox(field_schema.bbox)
        if cells:
            cell = cells[0]
            contents = cell.contents or ""
            return ResolvedField(
                name=field_schema.name,
                value=contents,
                raw_text=contents,
                elements=[ResolvedElement(id=cell.id, box=list(cell.box), contents=contents)],
                confidence="high",
                source="bbox",
            )
    return None


def _extract_scalar_by_regex(semantic_info, field_schema):
    """Parity: rule_pipeline.py:68-138 (cells -> paragraphs -> words)."""
    pattern = re.compile(field_schema.regex)

    for table in semantic_info.tables:
        for cell_id, cell in table.cells.items():
            if cell.role == "group" or not cell.contents:
                continue
            m = pattern.search(cell.contents)
            if m:
                return ResolvedField(
                    name=field_schema.name,
                    value=m.group(0),
                    raw_text=cell.contents,
                    elements=[
                        ResolvedElement(id=cell.id, box=list(cell.box), contents=cell.contents)
                    ],
                    confidence="high",
                    source="regex",
                )

    for i, paragraph in enumerate(semantic_info.paragraphs):
        if not paragraph.contents:
            continue
        m = pattern.search(paragraph.contents)
        if m:
            pid = paragraph.id or f"p{i}"
            return ResolvedField(
                name=field_schema.name,
                value=m.group(0),
                raw_text=paragraph.contents,
                elements=[
                    ResolvedElement(id=pid, box=list(paragraph.box), contents=paragraph.contents)
                ],
                confidence="high",
                source="regex",
            )

    for i, word in enumerate(semantic_info.words):
        if not word.content:
            continue
        m = pattern.search(word.content)
        if m:
            box = list(quad_to_xyxy(word.points))
            return ResolvedField(
                name=field_schema.name,
                value=m.group(0),
                raw_text=word.content,
                elements=[ResolvedElement(id=f"w{i}", box=box, contents=word.content)],
                confidence="high",
                source="regex",
            )
    return None


def _extract_scalar_field(semantic_info, field_schema):
    """Parity: rule_pipeline.py:141-262 (full cascade)."""
    if field_schema.cell_id:
        result = _extract_scalar_by_cell_id(semantic_info, field_schema)
        if result is not None:
            return result

    if field_schema.bbox:
        result = _extract_scalar_by_bbox(semantic_info, field_schema)
        if result is not None:
            return result

    if field_schema.description:
        kv_results = semantic_info.search_kv_items_by_key(field_schema.description)
        if kv_results:
            if getattr(field_schema, "merge_values", False) and len(kv_results) > 1:
                value_cells = [kv["value"] for kv in kv_results if kv["value"] is not None]
                if value_cells:
                    boxes = [cell.box for cell in value_cells]
                    x_spread = max(b[0] for b in boxes) - min(b[0] for b in boxes)
                    y_spread = max(b[1] for b in boxes) - min(b[1] for b in boxes)
                    if y_spread >= x_spread:
                        value_cells.sort(key=lambda c: c.box[1])
                    else:
                        value_cells.sort(key=lambda c: c.box[0])
                    sep = field_schema.separator
                    contents = sep.join(c.contents or "" for c in value_cells)
                    return ResolvedField(
                        name=field_schema.name,
                        value=contents,
                        raw_text=contents,
                        elements=[
                            ResolvedElement(
                                id=c.id, box=list(c.box), contents=c.contents or ""
                            )
                            for c in value_cells
                        ],
                        confidence="high",
                        source="kv",
                    )
            else:
                kv = kv_results[0]
                value_cell = kv["value"]
                if value_cell is not None and not isinstance(value_cell, list):
                    contents = value_cell.contents or ""
                    return ResolvedField(
                        name=field_schema.name,
                        value=contents,
                        raw_text=contents,
                        elements=[
                            ResolvedElement(
                                id=value_cell.id, box=list(value_cell.box), contents=contents
                            )
                        ],
                        confidence="high",
                        source="kv",
                    )

    if field_schema.description:
        for table in semantic_info.tables:
            cells = table.search_cells_by_query(field_schema.description)
            if cells:
                cell = cells[0]
                contents = cell.contents or ""
                return ResolvedField(
                    name=field_schema.name,
                    value=contents,
                    raw_text=contents,
                    elements=[
                        ResolvedElement(id=cell.id, box=list(cell.box), contents=contents)
                    ],
                    confidence="medium",
                    source="cell_query",
                )

    if field_schema.description:
        q = _normalize_text(field_schema.description)
        for i, paragraph in enumerate(semantic_info.paragraphs):
            if paragraph.contents and q in _normalize_text(paragraph.contents):
                contents = paragraph.contents or ""
                pid = paragraph.id or "p0"
                return ResolvedField(
                    name=field_schema.name,
                    value=contents,
                    raw_text=contents,
                    elements=[
                        ResolvedElement(id=pid, box=list(paragraph.box), contents=contents)
                    ],
                    confidence="medium",
                    source="paragraph",
                )

    if field_schema.regex:
        result = _extract_scalar_by_regex(semantic_info, field_schema)
        if result is not None:
            return result

    return ResolvedField(
        name=field_schema.name,
        value="",
        raw_text="",
        elements=[],
        confidence="low",
        source="not_found",
    )


def _match_col_header(table, header_cell_ids, col_schema):
    """Parity: rule_pipeline.py:265-284."""
    if col_schema.cell_id:
        return col_schema.cell_id in header_cell_ids

    if col_schema.bbox:
        for cid in header_cell_ids:
            cell = table.cells.get(cid)
            if cell and cell.box:
                overlap = calc_overlap_ratio(col_schema.bbox, list(cell.box))[0]
                if overlap > 0.5:
                    return True
        return False

    match_key = col_schema.description if col_schema.description else col_schema.name
    header_text = "".join(
        (table.cells.get(cid).contents or "")
        for cid in header_cell_ids
        if table.cells.get(cid)
    )
    return _normalize_text(match_key) in _normalize_text(header_text)


def _extract_table_field(semantic_info, field_schema):
    """Parity: rule_pipeline.py:287-361."""
    if not field_schema.columns:
        return ResolvedField(
            name=field_schema.name,
            value=[],
            raw_text="",
            elements=[],
            confidence="low",
            source="not_found",
        )

    records = []
    elements = []

    for table in semantic_info.tables:
        for grid in table.grids:
            col_index_map: Dict[str, List[int]] = {}
            for col_idx, header_cell_ids in enumerate(grid.col_headers):
                for col_schema in field_schema.columns:
                    if _match_col_header(table, header_cell_ids, col_schema):
                        col_index_map.setdefault(col_schema.name, []).append(col_idx)
                        break

            if not col_index_map:
                continue

            all_header_ids = {cid for col_ids in grid.col_headers for cid in col_ids}

            for row in grid.data:
                non_none_ids = [cid for cid in row if cid is not None]
                if non_none_ids and all(cid in all_header_ids for cid in non_none_ids):
                    continue

                row_record = {}
                for schema_col_name, col_indices in col_index_map.items():
                    values = []
                    cell_ids = []
                    for col_idx in col_indices:
                        if col_idx >= len(row):
                            continue
                        cell_id = row[col_idx]
                        if cell_id is not None:
                            cell = table.cells.get(cell_id)
                            if cell:
                                contents = cell.contents or ""
                                values.append(contents)
                                cell_ids.append(cell_id)
                                elements.append(
                                    ResolvedElement(
                                        id=cell_id,
                                        box=list(cell.box),
                                        contents=contents,
                                        label=schema_col_name,
                                    )
                                )
                            else:
                                cell_ids.append(cell_id)
                    row_record[schema_col_name] = {
                        "value": "".join(values),
                        "cell_ids": cell_ids,
                    }
                if row_record:
                    records.append(row_record)

    confidence = "high" if records else "low"
    source = "grid" if records else "not_found"
    return ResolvedField(
        name=field_schema.name,
        value=records,
        raw_text="",
        elements=elements,
        confidence=confidence,
        source=source,
    )


def _normalize_resolved_fields(fields, schema, skip_normalize=False):
    """Parity: extractor/pipeline.py:19-55."""
    if skip_normalize:
        return fields

    schema_map = {f.name: f for f in schema.fields}
    for rf in fields:
        fs = schema_map.get(rf.name)
        if fs is None:
            continue
        if fs.structure in ("scalar", "kv"):
            if isinstance(rf.value, str):
                rf.value = apply_normalize(rf.value, fs.normalize)
        elif fs.structure == "table" and isinstance(rf.value, list):
            col_map = {c.name: c for c in fs.columns} if fs.columns else {}
            for row in rf.value:
                if not isinstance(row, dict):
                    continue
                for col_name, col_val in row.items():
                    col_schema = col_map.get(col_name)
                    if col_schema and col_schema.normalize and isinstance(col_val, dict):
                        col_val["value"] = apply_normalize(
                            col_val.get("value", ""), col_schema.normalize
                        )
    return fields


def _build_output(fields) -> Dict[str, Any]:
    """Provenance-rich output. Parity: extractor/pipeline.py:58-111."""
    output: Dict[str, Any] = {"fields": {}, "metadata": {"schema_version": "1.0"}}
    for rf in fields:
        box_lookup = {elem.id: elem.box for elem in rf.elements}
        contents_lookup = {elem.id: elem.contents for elem in rf.elements}

        if isinstance(rf.value, list):
            records = []
            for row in rf.value:
                if not isinstance(row, dict):
                    records.append(row)
                    continue
                enriched_row = {}
                for col_name, col_val in row.items():
                    if isinstance(col_val, dict):
                        cell_ids = col_val.get("cell_ids", [])
                        bboxes = [box_lookup[cid] for cid in cell_ids if cid in box_lookup]
                        raw_text = " ".join(
                            contents_lookup[cid] for cid in cell_ids if cid in contents_lookup
                        )
                        enriched_row[col_name] = {
                            **col_val,
                            "raw_text": raw_text,
                            "bboxes": bboxes,
                        }
                    else:
                        enriched_row[col_name] = col_val
                records.append(enriched_row)
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
                "cell_ids": [elem.id for elem in rf.elements],
                "bboxes": [elem.box for elem in rf.elements],
            }
    return output


def _build_simple_output(fields) -> Dict[str, Any]:
    """Parity: extractor/pipeline.py:114-137."""
    output: Dict[str, Any] = {}
    for rf in fields:
        if isinstance(rf.value, list):
            records = []
            for row in rf.value:
                if not isinstance(row, dict):
                    records.append(row)
                    continue
                simple_row = {}
                for col_name, col_val in row.items():
                    if isinstance(col_val, dict):
                        simple_row[col_name] = col_val.get("value", "")
                    else:
                        simple_row[col_name] = col_val
                records.append(simple_row)
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
    """Per-document rule extraction. Parity: rule_pipeline.py:364-403
    (minus file/visualization side effects — the result is a value, the Ray
    stage writes it as a column)."""
    resolved: List[ResolvedField] = []
    for field_schema in schema.fields:
        if field_schema.structure == "table":
            rf = _extract_table_field(semantic_info, field_schema)
        else:
            rf = _extract_scalar_field(semantic_info, field_schema)
        resolved.append(rf)

    resolved = _normalize_resolved_fields(resolved, schema, skip_normalize=no_normalize)
    return _build_simple_output(resolved) if simple else _build_output(resolved)
