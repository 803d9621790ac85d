"""CSV rendering of an analyzed document.

Parity with ``/root/reference/src/yomitoku/export/export_csv.py:7-158``:
per-element rows, tables emitted as the full 2-D grid, one blank line after
every element, QUOTE_MINIMAL. The result is a string column (the reference
writes a file with ``newline=""``; ``io.StringIO`` + ``csv.writer`` yields
identical bytes with \r\n line terminators).
"""

from __future__ import annotations

import csv
import io


def table_to_csv(table, ignore_line_break):
    """Parity: export_csv.py:7-27."""
    num_rows = table.n_row
    num_cols = table.n_col
    table_array = [["" for _ in range(num_cols)] for _ in range(num_rows)]

    for cell in table.cells:
        row = cell.row - 1
        col = cell.col - 1
        contents = cell.contents
        if ignore_line_break:
            contents = contents.replace("\n", "")
        for i in range(row, row + cell.row_span):
            for j in range(col, col + cell.col_span):
                if i == row and j == col:
                    table_array[i][j] = contents
    return table_array


def paragraph_to_csv(paragraph, ignore_line_break):
    """Parity: export_csv.py:30-36."""
    contents = paragraph.contents
    if ignore_line_break:
        contents = contents.replace("\n", "")
    return contents


def convert_csv(document, ignore_line_break=False, export_figure_letter=True):
    """Parity: export_csv.py:60-117 (minus figure crop side-effects)."""
    elements = []
    for table in document.tables:
        elements.append(
            {
                "type": "table",
                "box": table.box,
                "element": table_to_csv(table, ignore_line_break),
                "order": table.order,
            }
        )
    for paragraph in document.paragraphs:
        elements.append(
            {
                "type": "paragraph",
                "box": paragraph.box,
                "element": paragraph_to_csv(paragraph, ignore_line_break),
                "order": paragraph.order,
            }
        )
    if export_figure_letter:
        for figure in document.figures:
            paragraphs = sorted(figure.paragraphs, key=lambda x: x.order)
            for paragraph in paragraphs:
                elements.append(
                    {
                        "type": "paragraph",
                        "box": paragraph.box,
                        "element": paragraph_to_csv(paragraph, ignore_line_break),
                        "order": figure.order,
                    }
                )

    elements = sorted(elements, key=lambda x: x["order"])
    return elements


def render_csv(elements) -> str:
    """Parity: export_csv.py:144-157 (string form)."""
    buf = io.StringIO()
    writer = csv.writer(buf, quoting=csv.QUOTE_MINIMAL)
    for element in elements:
        if element["type"] == "table":
            writer.writerows(element["element"])
        else:
            writer.writerow([element["element"]])
        writer.writerow([""])
    return buf.getvalue()
