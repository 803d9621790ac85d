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


def test_fast_canonical_json_hypothesis_identity():
    """Generic fast serializer must be byte-identical to the stdlib
    canonical form on arbitrary plain JSON trees (the semantic stage's
    payload shape), and fall back safely on exotic inputs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from yomitoku_ray.export.json_export import (
        dumps_canonical_json,
        fast_canonical_json,
    )

    leaves = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(10**18), max_value=10**18),
        st.floats(allow_nan=False),  # NaN can't compare-by-string reliably
        st.text(),
    )
    trees = st.recursive(
        leaves,
        lambda c: st.one_of(
            st.lists(c, max_size=5), st.dictionaries(st.text(max_size=8), c, max_size=5)
        ),
        max_leaves=30,
    )

    @settings(max_examples=300, deadline=None)
    @given(trees)
    def check(tree):
        assert fast_canonical_json(tree) == dumps_canonical_json(tree)

    check()
    # NaN: both paths emit the literal
    assert fast_canonical_json([float("nan")]) == dumps_canonical_json([float("nan")])
    # non-str keys take the stdlib fallback and still match
    weird = {1: "a", 2: [True]}
    assert fast_canonical_json(weird) == dumps_canonical_json(weird)


def test_semantic_stage_uses_fast_serializer_byte_identically(ray_session):
    from yomitoku_ray.synth.pages import generate_pages_table
    import yomitoku_ray.stages.semantic_stage as ss
    from yomitoku_ray.export.json_export import dumps_canonical_json

    t = generate_pages_table(150)
    stage = ss.SemanticExtractStage()
    fast = stage(t)
    orig = ss.fast_canonical_json
    try:
        ss.fast_canonical_json = dumps_canonical_json
        slow = stage(t)
    finally:
        ss.fast_canonical_json = orig
    assert fast.equals(slow)
