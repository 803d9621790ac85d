"""HTML rendering of an analyzed document.

Parity with ``/root/reference/src/yomitoku/export/export_html.py:9-191``
except the final lxml pretty-print (export_html.py:183-187): lxml is not
available in this environment, so the deterministic un-prettified
concatenation is the output contract here (documented deviation; the string
is stable either way).
"""

from __future__ import annotations

import re
from html import escape

_URL_REGEX = re.compile(r"https?://[^\s<>]")


def convert_text_to_html(text):
    """HTML-escape with URL passthrough regex. Parity: export_html.py:9-20.

    (The reference's replace_url also escapes, so the net effect is a full
    escape — reproduced literally.)
    """
    return _URL_REGEX.sub(lambda m: escape(m.group(0)), escape(text))


def add_td_tag(contents, row_span, col_span):
    return f'<td rowspan="{row_span}" colspan="{col_span}">{contents}</td>'


def add_table_tag(contents):
    return f'<table border="1" style="border-collapse: collapse">{contents}</table>'


def add_tr_tag(contents):
    return f"<tr>{contents}</tr>"


def add_p_tag(contents):
    return f"<p>{contents}</p>"


def add_h1_tag(contents):
    return f"<h1>{contents}</h1>"


def table_to_html(table, ignore_line_break):
    """Parity: export_html.py:47-81."""
    pre_row = 1
    rows = []
    row = []
    for cell in table.cells:
        if cell.row != pre_row:
            rows.append(add_tr_tag("".join(row)))
            row = []

        contents = cell.contents
        if contents is None:
            contents = ""
        contents = convert_text_to_html(contents)
        if ignore_line_break:
            contents = contents.replace("\n", "")
        else:
            contents = contents.replace("\n", "<br>")

        row.append(add_td_tag(contents, cell.row_span, cell.col_span))
        pre_row = cell.row
    rows.append(add_tr_tag("".join(row)))

    return {
        "box": table.box,
        "order": table.order,
        "html": add_table_tag("".join(rows)),
    }


def paragraph_to_html(paragraph, ignore_line_break):
    """Parity: export_html.py:84-100."""
    contents = convert_text_to_html(paragraph.contents)
    if ignore_line_break:
        contents = contents.replace("\n", "")
    else:
        contents = contents.replace("\n", "<br>")
    if paragraph.role == "section_headings":
        contents = add_h1_tag(contents)
    return {
        "box": paragraph.box,
        "order": paragraph.order,
        "html": add_p_tag(contents),
    }


def figure_to_html(
    figures,
    doc_stem,
    export_figure_letter=False,
    ignore_line_break=False,
    figure_dir="figures",
    width=200,
):
    """Parity: export_html.py:103-146, minus crop-to-disk side effects."""
    elements = []
    for i, figure in enumerate(figures):
        figure_name = f"{doc_stem}_figure_{i}.png"
        elements.append(
            {
                "order": figure.order,
                "html": f'<img src="{figure_dir}/{figure_name}" width="{width}"><br>',
            }
        )
        if export_figure_letter:
            paragraphs = sorted(figure.paragraphs, key=lambda x: x.order)
            for paragraph in paragraphs:
                contents = paragraph_to_html(paragraph, ignore_line_break)
                elements.append({"order": figure.order, "html": contents["html"]})
    return elements


def convert_html(
    document,
    doc_stem="doc",
    ignore_line_break=False,
    export_figure=True,
    export_figure_letter=True,
    figure_width=200,
    figure_dir="figures",
):
    """Parity: export_html.py:149-191 (no lxml pretty-print; see module doc)."""
    elements = []
    for table in document.tables:
        elements.append(table_to_html(table, ignore_line_break))
    for paragraph in document.paragraphs:
        elements.append(paragraph_to_html(paragraph, ignore_line_break))
    if export_figure:
        elements.extend(
            figure_to_html(
                document.figures,
                doc_stem,
                export_figure_letter,
                ignore_line_break,
                width=figure_width,
                figure_dir=figure_dir,
            )
        )

    elements = sorted(elements, key=lambda x: x["order"])
    html_string = "".join(element["html"] for element in elements)
    return html_string, elements
