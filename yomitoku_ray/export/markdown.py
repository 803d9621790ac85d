"""Markdown rendering of an analyzed document.

Parity with ``/root/reference/src/yomitoku/export/export_markdown.py:7-146``.
Differences from the reference, forced by the web-text target: figures have no
raster image to crop, so the ``<img>`` element references a deterministic
name derived from the caller-supplied ``doc_stem`` (the reference derives it
from the output file path, export_markdown.py:89-91) and nothing is written
to disk — the rendered markdown is a string column, not a file.
"""

from __future__ import annotations

import re

_SPECIAL_CHARS = re.compile(r"([`*{}[\]()#+!~|-])")


def escape_markdown_special_chars(text):
    """Parity: export_markdown.py:7-9."""
    return _SPECIAL_CHARS.sub(r"\\\1", text)


def paragraph_to_md(paragraph, ignore_line_break):
    """Parity: export_markdown.py:12-27."""
    contents = escape_markdown_special_chars(paragraph.contents)
    if ignore_line_break:
        contents = contents.replace("\n", "")
    else:
        contents = contents.replace("\n", "<br>")
    if paragraph.role == "section_headings":
        contents = "# " + contents
    return {
        "order": paragraph.order,
        "box": paragraph.box,
        "md": contents + "\n",
    }


def table_to_md(table, ignore_line_break):
    """Parity: export_markdown.py:30-67 (incl. first-row separator line)."""
    num_rows = table.n_row
    num_cols = table.n_col
    table_array = [["" for _ in range(num_cols)] for _ in range(num_rows)]

    for cell in table.cells:
        row = cell.row - 1
        col = cell.col - 1
        contents = cell.contents
        for i in range(row, row + cell.row_span):
            for j in range(col, col + cell.col_span):
                contents = escape_markdown_special_chars(contents)
                if ignore_line_break:
                    contents = contents.replace("\n", "")
                else:
                    contents = contents.replace("\n", "<br>")
                if i == row and j == col:
                    table_array[i][j] = contents

    table_md = ""
    for i in range(num_rows):
        row = "|".join(table_array[i])
        table_md += f"|{row}|\n"
        if i == 0:
            header = "|".join(["-" for _ in range(num_cols)])
            table_md += f"|{header}|\n"

    return {"order": table.order, "box": table.box, "md": table_md}


def figure_to_md(
    figures,
    doc_stem,
    export_figure_letter=False,
    ignore_line_break=False,
    width=200,
    figure_dir="figures",
):
    """Parity: export_markdown.py:70-111, minus the crop-to-disk side effect."""
    elements = []
    for i, figure in enumerate(figures):
        figure_name = f"{doc_stem}_figure_{i}.png"
        elements.append(
            {
                "order": figure.order,
                "md": f'<img src="{figure_dir}/{figure_name}" width="{width}px"><br>',
            }
        )
        if export_figure_letter:
            paragraphs = sorted(figure.paragraphs, key=lambda x: x.order)
            for paragraph in paragraphs:
                element = paragraph_to_md(paragraph, ignore_line_break)
                elements.append({"order": figure.order, "md": element["md"]})
    return elements


def convert_markdown(
    document,
    doc_stem="doc",
    ignore_line_break=False,
    export_figure_letter=True,
    export_figure=True,
    figure_width=200,
    figure_dir="figures",
):
    """Render a Document to markdown. Parity: export_markdown.py:114-146.

    Note ``export_figure_letter`` defaults True here (False in the reference
    CLI): in the web-text domain the figure's nested text is the content.
    """
    elements = []
    for table in document.tables:
        elements.append(table_to_md(table, ignore_line_break))
    for paragraph in document.paragraphs:
        elements.append(paragraph_to_md(paragraph, ignore_line_break))
    if export_figure:
        elements.extend(
            figure_to_md(
                document.figures,
                doc_stem,
                export_figure_letter,
                ignore_line_break,
                figure_width,
                figure_dir=figure_dir,
            )
        )

    elements = sorted(elements, key=lambda x: x["order"])
    markdown = "\n".join(element["md"] for element in elements)
    return markdown, elements
