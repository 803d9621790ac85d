"""Markdown rendering of an analyzed document.

Byte-parity with the reference exporter
(``/root/reference/src/yomitoku/export/export_markdown.py:7-146``), pinned
by tests/test_oracle.py and the pipeline identity gate. Differences forced
by the web-text target: figures have no raster crop, so the ``<img>`` src
uses a deterministic ``doc_stem``-derived name (the reference derives it
from the output file path) and nothing is written to disk — markdown is a
string column. One simplification with identical output: the reference
re-escapes a spanning cell's text once per covered grid position but only
writes the first (anchor) position (export_markdown.py:43-52), so a single
escape at the anchor yields the same bytes.
"""

from __future__ import annotations

import re

_SPECIAL = re.compile(r"([`*{}[\]()#+!~|-])")


def escape_markdown_special_chars(text):
    """Backslash-escape markdown metacharacters (export_markdown.py:7-9)."""
    return _SPECIAL.sub(r"\\\1", text)


def _prep(text, ignore_line_break):
    """Escape + newline policy shared by paragraphs and cells."""
    text = escape_markdown_special_chars(text)
    return text.replace("\n", "" if ignore_line_break else "<br>")


def paragraph_to_md(paragraph, ignore_line_break):
    """Paragraph -> md line; section headings get '# ' (:12-27)."""
    contents = _prep(paragraph.contents, ignore_line_break)
    if paragraph.role == "section_headings":
        contents = "# " + contents
    return {"order": paragraph.order, "box": paragraph.box, "md": contents + "\n"}


def table_to_md(table, ignore_line_break):
    """Table -> pipe grid with a separator line after the first row (:30-67).
    Span cells render at their anchor position only."""
    grid = [["" for _ in range(table.n_col)] for _ in range(table.n_row)]
    for cell in table.cells:
        grid[cell.row - 1][cell.col - 1] = _prep(cell.contents, ignore_line_break)

    lines = []
    for i, row in enumerate(grid):
        lines.append("|" + "|".join(row) + "|\n")
        if i == 0:
            lines.append("|" + "|".join("-" * table.n_col) + "|\n")
    return {"order": table.order, "box": table.box, "md": "".join(lines)}


def figure_to_md(
    figures,
    doc_stem,
    export_figure_letter=False,
    ignore_line_break=False,
    width=200,
    figure_dir="figures",
):
    """Figure -> img ref (+ nested paragraph text when requested) (:70-111)."""
    out = []
    for i, figure in enumerate(figures):
        out.append(
            {
                "order": figure.order,
                "md": f'<img src="{figure_dir}/{doc_stem}_figure_{i}.png" width="{width}px"><br>',
            }
        )
        if export_figure_letter:
            for paragraph in sorted(figure.paragraphs, key=lambda x: x.order):
                out.append(
                    {
                        "order": figure.order,
                        "md": paragraph_to_md(paragraph, ignore_line_break)["md"],
                    }
                )
    return out


def convert_markdown(
    document,
    doc_stem="doc",
    ignore_line_break=False,
    export_figure_letter=True,
    export_figure=True,
    figure_width=200,
    figure_dir="figures",
):
    """All elements -> md fragments, sorted by order, joined with "\\n"
    (:114-146). ``export_figure_letter`` defaults True here (False in the
    reference CLI): in the web-text domain the figure's nested text IS the
    content."""
    elements = [table_to_md(t, ignore_line_break) for t in document.tables]
    elements += [paragraph_to_md(p, ignore_line_break) for p in document.paragraphs]
    if export_figure:
        elements += figure_to_md(
            document.figures,
            doc_stem,
            export_figure_letter,
            ignore_line_break,
            figure_width,
            figure_dir=figure_dir,
        )

    elements.sort(key=lambda x: x["order"])
    return "\n".join(e["md"] for e in elements), elements
