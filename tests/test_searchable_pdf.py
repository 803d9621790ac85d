"""Searchable-PDF writer (S8): structure validity, text round trip,
vertical runs, engine integration, MCP surface.

Mirrors the reference's test strategy (tests/test_cli.py exercises
create_searchable_pdf through the CLI): the invisible text layer must be
recoverable by a standard extractor — here proven with an independent
parse of the content streams and xref.
"""

import base64
import re
import zlib

import pytest

from yomitoku_ray.export.searchable_pdf import (
    _calc_font_size,
    create_searchable_pdf,
    document_to_pdf_page,
    extract_pdf_text,
)


def _page(words, w=600, h=800):
    return {"width": w, "height": h, "words": words}


def test_font_size_rate_scan():
    # 10 chars in a 200x20 box: width model fs*10 ~ 200 -> fs ~ 20*0.99
    fs = _calc_font_size("abcdefghij", 20, 200)
    assert 17 <= fs <= 20
    assert _calc_font_size("", 20, 200) is None


def test_text_round_trip_multipage():
    pdf = create_searchable_pdf(
        [
            _page([{"text": "hello", "box": [10, 10, 110, 30]},
                   {"text": "世界", "box": [10, 40, 60, 60]}]),
            _page([{"text": "second", "box": [5, 5, 95, 25]}]),
        ]
    )
    assert pdf.startswith(b"%PDF-1.4")
    texts = extract_pdf_text(pdf)
    assert texts == ["hello 世界", "second"]


def test_vertical_run_per_char():
    pdf = create_searchable_pdf(
        [_page([{"text": "縦書き", "box": [100, 50, 120, 170], "direction": "vertical"}])]
    )
    # each char emitted separately with the -90 rotation matrix
    assert extract_pdf_text(pdf) == ["縦 書 き"]
    stream = zlib.decompress(
        re.search(rb"stream\n(.*?)\nendstream", pdf, re.DOTALL).group(1)
    ) if b"/FlateDecode" not in pdf[:200] else None
    raw = b"".join(
        zlib.decompress(m) for m in re.findall(rb"stream\n(.*?)\nendstream", pdf, re.DOTALL)
    )
    assert raw.count(b"0 -1 1 0") == 3  # one rotated Tm per character


def test_xref_offsets_are_exact():
    pdf = create_searchable_pdf([_page([{"text": "x", "box": [0, 0, 10, 10]}])])
    xref_pos = int(re.search(rb"startxref\n(\d+)\n", pdf).group(1))
    assert pdf[xref_pos : xref_pos + 4] == b"xref"
    # every in-use entry must point at "N 0 obj"
    m = re.search(rb"xref\n0 (\d+)\n", pdf[xref_pos:])
    n_entries = int(m.group(1))
    rows = pdf[xref_pos:].split(b"\n")[2 : 2 + n_entries]
    assert len(rows) == n_entries
    for oid, line in enumerate(rows):
        if line.endswith(b" n "):
            off = int(line.split(b" ")[0])
            assert pdf[off:].startswith(f"{oid} 0 obj".encode())
    assert sum(1 for l in rows if l.endswith(b" f ")) == 1  # only obj 0 free


def test_invisible_render_mode_and_tounicode():
    pdf = create_searchable_pdf([_page([{"text": "abc", "box": [0, 0, 30, 10]}])])
    raw = b"".join(
        zlib.decompress(m) for m in re.findall(rb"stream\n(.*?)\nendstream", pdf, re.DOTALL)
    )
    assert b"3 Tr" in raw  # invisible text render mode
    assert b"begincidchar" in raw  # ToUnicode CMap present
    assert b"/Encoding /Identity-H" in pdf


def test_engine_integration_words_recoverable(ray_session):
    from yomitoku_ray.analyze import aggregate_document
    from yomitoku_ray.detect import detect_page
    from yomitoku_ray.dom import decode_html

    html = b"<html><body><h1>title words</h1><p>alpha beta gamma delta</p></body></html>"
    det = detect_page(decode_html(html))
    doc = aggregate_document(det.words, det.paragraphs, det.tables, det.figures)
    pdf = create_searchable_pdf([document_to_pdf_page(doc)])
    text = extract_pdf_text(pdf)[0]
    for w in ("title", "words", "alpha", "delta"):
        assert w in text


def test_mcp_pdf_format(tmp_path, monkeypatch):
    from yomitoku_ray.serve.mcp_server import process_document

    (tmp_path / "p.html").write_bytes(
        b"<html><body><p>searchable layer works</p></body></html>"
    )
    monkeypatch.setenv("RESOURCE_DIR", str(tmp_path))
    out = process_document("p.html", "pdf")
    pdf = base64.b64decode(out)
    assert pdf.startswith(b"%PDF-1.4")
    text = extract_pdf_text(pdf)[0]
    assert "searchable" in text and "layer" in text
