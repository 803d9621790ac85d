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

    return dumps_canonical_json(document.to_dict())
