"""fast_document_json must be byte-identical to the canonical json.dumps."""

from yomitoku_ray.analyze import aggregate_document
from yomitoku_ray.detect import detect_page
from yomitoku_ray.dom import decode_html
from yomitoku_ray.export.json_export import dumps_canonical_json, fast_document_json
from yomitoku_ray.synth.pages import gen_page


def test_fast_json_byte_identity_over_corpus():
    n = 0
    for i in range(120):
        p = gen_page(i)
        try:
            text = decode_html(p["html"])
        except Exception:
            continue
        det = detect_page(text)
        doc = aggregate_document(det.words, det.paragraphs, det.tables, det.figures)
        assert fast_document_json(doc) == dumps_canonical_json(doc.to_dict()), p["url"]
        n += 1
    assert n > 100


def test_fast_json_edge_strings():
    from yomitoku_ray.models import Document, Paragraph

    doc = Document(
        paragraphs=[
            Paragraph(box=[0, 1, 2, 3], contents='quote " back \\ new\nline \t 日本語',
                      direction=None, order=None, role=None)
        ]
    )
    assert fast_document_json(doc) == dumps_canonical_json(doc.to_dict())
