"""Searchable-PDF writer (S8): invisible text layer, pure stdlib.

Parity target: the reference's ``utils/searchable_pdf.py:29-229`` — per
page: page size from the layout, per-container font size fitted by a
0.50..0.99 rate scan against the box (``_calc_font_size`` :43-57), text
placed at ``(x1, h - y2 + (bh - fs)/2)``, vertical runs rotated -90° per
character (:195-218), pages assembled into one PDF. The reference draws a
raster page image under visible text; the web-text engine has no raster,
so the text layer uses PDF render mode 3 (invisible) — the standard OCR
text-layer construction — over a blank page.

No reportlab: the writer emits PDF 1.4 objects directly — a Type0 /
Identity-H CID font whose CIDs ARE Unicode code points, a /ToUnicode CMap
built from the exact code points used (what makes extraction/search work
in any reader), content streams with hex-encoded CID strings, and a
correct xref table. Glyph outlines are not embedded (no font files in the
container) — legal for an invisible layer; text extraction, the point of
S8, is fully functional and round-trip-tested via ``extract_pdf_text``.
"""

from __future__ import annotations

import zlib


def _calc_font_size(content: str, bbox_height: float, bbox_width: float):
    """Rate-scan fit mirroring the reference (:43-57); the width model is
    the CID default advance (1 em per character, /DW 1000)."""
    if not content or bbox_height <= 0:
        return None
    best, min_diff = None, float("inf")
    rate = 0.5
    while rate < 1.0:
        font_size = bbox_height * rate
        text_w = font_size * len(content)
        diff = abs(text_w - bbox_width)
        if diff < min_diff:
            min_diff = diff
            best = font_size
        rate += 0.01
    return best


def _hex_cids(text: str) -> str:
    """Text -> hex CID string (CID == BMP code point; others replaced)."""
    return "".join(f"{min(ord(c), 0xFFFD) if ord(c) > 0xFFFF else ord(c):04X}" for c in text)


def _to_unicode_cmap(codepoints: set[int]) -> bytes:
    pairs = "\n".join(f"<{cp:04X}> <{cp:04X}>" for cp in sorted(codepoints))
    return (
        "/CIDInit /ProcSet findresource begin\n"
        "12 dict begin\nbegincmap\n"
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def\n"
        "/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        f"{len(codepoints)} begincidchar\n{pairs}\nendcidchar\n"
        "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n"
    ).encode("ascii")


def create_searchable_pdf(pages: list[dict]) -> bytes:
    """pages: [{"width": W, "height": H, "words": [{"text", "box":
    [x1,y1,x2,y2], "direction": "horizontal"|"vertical"}]}] -> PDF bytes.

    Coordinates are top-left-origin layout boxes (the engine's convention);
    the writer converts to PDF's bottom-left origin exactly like the
    reference (``base_y = h - y2 + (bh - fs) * 0.5``).
    """
    codepoints: set[int] = set()
    content_streams: list[bytes] = []
    for page in pages:
        h = float(page["height"])
        ops = ["BT", "3 Tr"]
        for wd in page.get("words", []):
            text = wd.get("text") or ""
            if not text:
                continue
            x1, y1, x2, y2 = (float(v) for v in wd["box"])
            bw, bh = x2 - x1, y2 - y1
            vertical = wd.get("direction") == "vertical"
            if vertical:
                fs = _calc_font_size(text, bw, bh)
            else:
                fs = _calc_font_size(text, bh, bw)
            if not fs:
                continue
            codepoints.update(min(ord(c), 0xFFFD) if ord(c) > 0xFFFF else ord(c) for c in text)
            if vertical:
                # Per-char -90° rotation (reference :205-218).
                char_h = bh / len(text)
                for j, ch in enumerate(text):
                    cx = x1 + (bw - fs) / 2
                    cy = (h - y1) - j * char_h - char_h / 2 + fs / 2
                    ops.append(
                        f"/F1 {fs:.2f} Tf 0 -1 1 0 {cx:.2f} {cy:.2f} Tm <{_hex_cids(ch)}> Tj"
                    )
            else:
                base_y = h - y2 + (bh - fs) * 0.5
                ops.append(
                    f"/F1 {fs:.2f} Tf 1 0 0 1 {x1:.2f} {base_y:.2f} Tm <{_hex_cids(text)}> Tj"
                )
        ops.append("ET")
        content_streams.append("\n".join(ops).encode("ascii"))

    objects: dict[int, bytes] = {}
    n_pages = len(pages)
    first_page_obj = 7
    page_obj_ids = [first_page_obj + 2 * i for i in range(n_pages)]

    kids = " ".join(f"{oid} 0 R" for oid in page_obj_ids)
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    objects[3] = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /YomitokuRay-Invisible"
        b" /Encoding /Identity-H /DescendantFonts [4 0 R] /ToUnicode 6 0 R >>"
    )
    objects[4] = (
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /YomitokuRay-Invisible"
        b" /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >>"
        b" /FontDescriptor 5 0 R /DW 1000 /CIDToGIDMap /Identity >>"
    )
    objects[5] = (
        b"<< /Type /FontDescriptor /FontName /YomitokuRay-Invisible /Flags 4"
        b" /FontBBox [0 -200 1000 900] /ItalicAngle 0 /Ascent 800 /Descent -200"
        b" /CapHeight 700 /StemV 80 >>"
    )
    cmap = zlib.compress(_to_unicode_cmap(codepoints))
    objects[6] = (
        f"<< /Length {len(cmap)} /Filter /FlateDecode >>\nstream\n".encode()
        + cmap
        + b"\nendstream"
    )
    for i, page in enumerate(pages):
        w, h = float(page["width"]), float(page["height"])
        stream = zlib.compress(content_streams[i])
        oid = page_obj_ids[i]
        objects[oid] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w:.2f} {h:.2f}]"
            f" /Resources << /Font << /F1 3 0 R >> >> /Contents {oid + 1} 0 R >>"
        ).encode()
        objects[oid + 1] = (
            f"<< /Length {len(stream)} /Filter /FlateDecode >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    max_obj = max(objects)
    offsets = {}
    for oid in range(1, max_obj + 1):
        if oid not in objects:
            continue
        offsets[oid] = len(out)
        out += f"{oid} 0 obj\n".encode() + objects[oid] + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {max_obj + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for oid in range(1, max_obj + 1):
        if oid in offsets:
            out += f"{offsets[oid]:010d} 00000 n \n".encode()
        else:
            out += b"0000000000 65535 f \n"
    out += (
        f"trailer\n<< /Size {max_obj + 1} /Root 1 0 R >>\nstartxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _poly2rect(points):
    """4-corner polygon -> [x1, y1, x2, y2] (reference :29-41)."""
    xs = [p[0] for p in points]
    ys = [p[1] for p in points]
    return [min(xs), min(ys), max(xs), max(ys)]


def document_to_pdf_page(document, width: float | None = None, height: float | None = None) -> dict:
    """Engine Document -> one page dict for :func:`create_searchable_pdf`.

    Words carry 4-corner ``points`` (WordPrediction parity); the page size
    defaults to the layout extent plus a margin.
    """
    words = []
    max_x, max_y = 1.0, 1.0
    for w in document.words:
        box = _poly2rect(w.points)
        max_x = max(max_x, box[2])
        max_y = max(max_y, box[3])
        words.append({"text": w.content, "box": box, "direction": w.direction})
    return {
        "width": width if width is not None else max_x + 40,
        "height": height if height is not None else max_y + 40,
        "words": words,
    }


def extract_pdf_text(pdf: bytes) -> list[str]:
    """Round-trip reader: per-page text recovered from the content streams
    through the Identity CID encoding (what any PDF text extractor does).
    Used by tests and by the conformance gate for this writer."""
    import re

    # page objects in /Kids order -> their /Contents object ids
    kids_m = re.search(rb"/Kids \[([^\]]*)\]", pdf)
    if not kids_m:
        raise ValueError("no /Kids")
    page_ids = [int(x) for x in re.findall(rb"(\d+) 0 R", kids_m.group(1))]
    texts = []
    for pid in page_ids:
        pm = re.search(rb"\n%d 0 obj\n(.*?)\nendobj\n" % pid, pdf, re.DOTALL)
        cm = re.search(rb"/Contents (\d+) 0 R", pm.group(1))
        cid = int(cm.group(1))
        sm = re.search(
            rb"\n%d 0 obj\n.*?stream\n(.*?)\nendstream" % cid, pdf, re.DOTALL
        )
        stream = zlib.decompress(sm.group(1))
        words = []
        for hexstr in re.findall(rb"<([0-9A-Fa-f]+)> Tj", stream):
            s = hexstr.decode("ascii")
            words.append(
                "".join(chr(int(s[k : k + 4], 16)) for k in range(0, len(s), 4))
            )
        texts.append(" ".join(words))
    return texts
