"""Exporter tests with exact expected strings (mirrors the reference's
tests/test_export.py:37-456 style — absolute anchors independent of the
oracle, so renderer drift cannot hide behind pipeline/oracle symmetry)."""

from yomitoku_ray.export.csv_export import convert_csv, render_csv
from yomitoku_ray.export.html_export import convert_html
from yomitoku_ray.export.json_export import convert_json
from yomitoku_ray.export.markdown import convert_markdown, escape_markdown_special_chars
from yomitoku_ray.models import Document, Figure, Paragraph, Table, TableCell
from yomitoku_ray.render import extract_text_with_spans


def _doc():
    cells = [
        TableCell(col=1, row=1, col_span=1, row_span=1, box=[0, 0, 50, 20], contents="h1"),
        TableCell(col=2, row=1, col_span=1, row_span=1, box=[50, 0, 100, 20], contents="h2"),
        TableCell(col=1, row=2, col_span=2, row_span=1, box=[0, 20, 100, 40], contents="wide*v"),
    ]
    return Document(
        paragraphs=[
            Paragraph(box=[0, 60, 100, 80], contents="line1\nline2", direction="horizontal", order=1, role=None),
            Paragraph(box=[0, 100, 100, 120], contents="Head|ing", direction="horizontal", order=2, role="section_headings"),
        ],
        tables=[Table(box=[0, 0, 100, 40], n_row=2, n_col=2, cells=cells, order=0)],
        figures=[
            Figure(box=[0, 140, 100, 180], order=3, direction="horizontal",
                   paragraphs=[Paragraph(box=[5, 145, 95, 175], contents="cap", direction="horizontal", order=0, role=None)])
        ],
    )


def test_markdown_exact():
    md, _ = convert_markdown(_doc(), doc_stem="s")
    expected = (
        "|h1|h2|\n"
        "|-|-|\n"
        "|wide\\*v||\n"
        "\n"
        "line1<br>line2\n"
        "\n"
        "# Head\\|ing\n"
        "\n"
        '<img src="figures/s_figure_0.png" width="200px"><br>\n'
        "cap\n"
    )
    assert md == expected


def test_markdown_ignore_line_break():
    md, _ = convert_markdown(_doc(), doc_stem="s", ignore_line_break=True)
    assert "line1line2\n" in md and "<br>l" not in md


def test_escape_chars():
    assert escape_markdown_special_chars("a*b|c#d-e") == "a\\*b\\|c\\#d\\-e"


def test_csv_exact():
    csv_text = render_csv(convert_csv(_doc()))
    # csv.writer parity quirks (export_csv.py:144-157): span cells write at
    # their anchor only; the blank separator row is a single quoted empty
    # field; embedded newlines force quoting.
    expected = (
        "h1,h2\r\n"
        "wide*v,\r\n"
        '""\r\n'
        '"line1\nline2"\r\n'
        '""\r\n'
        "Head|ing\r\n"
        '""\r\n'
        "cap\r\n"
        '""\r\n'
    )
    assert csv_text == expected


def test_html_exact():
    html, _ = convert_html(_doc(), doc_stem="s")
    expected = (
        '<table border="1" style="border-collapse: collapse">'
        '<tr><td rowspan="1" colspan="1">h1</td><td rowspan="1" colspan="1">h2</td></tr>'
        '<tr><td rowspan="1" colspan="2">wide*v</td></tr></table>'
        "<p>line1<br>line2</p>"
        "<p><h1>Head|ing</h1></p>"
        '<img src="figures/s_figure_0.png" width="200"><br>'
        "<p>cap</p>"
    )
    assert html == expected


def test_json_canonical_prefix():
    js = convert_json(_doc())
    assert js.startswith('{\n    "figures": [\n')
    assert '"contents": "line1\\nline2"' in js
    assert js.endswith("\n}")


def test_extracted_text_and_spans_exact():
    text, spans = extract_text_with_spans(_doc())
    assert text == "h1\nh2\nwide*v\nline1\nline2\nHead|ing\ncap"
    assert [s["elem_type"] for s in spans] == ["table", "paragraph", "paragraph", "figure"]
    raw = text.encode("utf-8")
    assert raw[spans[0]["start"] : spans[0]["end"]] == b"h1\nh2\nwide*v"
    assert raw[spans[3]["start"] : spans[3]["end"]] == b"cap"
