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
    orig = (ss.fast_canonical_json, ss.fast_semantic_dump_json, ss.fast_views_json)
    try:
        ss.fast_canonical_json = dumps_canonical_json
        ss.fast_semantic_dump_json = lambda doc: dumps_canonical_json(doc.dump())
        ss.fast_views_json = dumps_canonical_json
        slow = stage(t)
    finally:
        ss.fast_canonical_json, ss.fast_semantic_dump_json, ss.fast_views_json = orig
    assert fast.equals(slow)


def test_semantic_specialized_serializers_edge_fixtures():
    """fast_semantic_dump_json / fast_views_json vs the generic path on
    hand-built edge shapes: empty doc, None-heavy fields, non-empty meta,
    lexicographic cell-id sorting (c10 < c2), empty grids/kv, and the
    fallback for out-of-schema shapes."""
    from yomitoku_ray.export.json_export import (
        dumps_canonical_json,
        fast_semantic_dump_json,
        fast_views_json,
    )
    from yomitoku_ray.semantic.schemas import (
        KvItem,
        SemanticCell,
        SemanticDocument,
        SemanticParagraph,
        TableGrid,
        TableSemanticContents,
    )
    from yomitoku_ray.models import Word

    def mk_cell(cid, **kw):
        base = dict(contents=None, role=None, id=cid, box=[0, 0, 1, 1])
        base.update(kw)
        return SemanticCell(**base)

    docs = [
        SemanticDocument(tables=[], paragraphs=[], words=[]),
        SemanticDocument(
            tables=[
                TableSemanticContents(
                    id="t0",
                    style="border",
                    box=[1, 2, 3, 4],
                    cells={
                        "c2": mk_cell("c2", contents="a\n\"b\"", role="header",
                                      row=0, col=1, row_span=2, col_span=1),
                        "c10": mk_cell("c10", meta={"k": [1, 2.5, None, "€"]}),
                    },
                    kv_items=[
                        KvItem(id="kv0", key=["k1", "k2"], value="c2", box=None),
                        KvItem(id=None, key=[], value="c10", box=[5, 6, 7, 8]),
                    ],
                    grids=[
                        TableGrid(id="g0", box=[0, 0, 9, 9], n_row=2, n_col=1,
                                  col_headers=[["h", None]], data=[[None], ["x"]]),
                        TableGrid(id=None, box=[], n_row=0, n_col=0,
                                  col_headers=[], data=[]),
                    ],
                )
            ],
            paragraphs=[
                SemanticParagraph(id="p0", box=[1, 1, 2, 2], score=0.875,
                                  role="section_headings", contents="日本語"),
                SemanticParagraph(id=None, box=[0, 0, 0, 0], score=1.0, role=None),
            ],
            words=[
                Word(points=[[0, 0], [1, 0], [1, 1], [0, 1]], content="w",
                     direction="horizontal", rec_score=0.9, det_score=0.81),
                Word(points=[[0, 0], [1, 1]], content="odd-quad",
                     direction="vertical", rec_score=0.5, det_score=0.5),
            ],
        ),
    ]
    for doc in docs:
        assert fast_semantic_dump_json(doc) == dumps_canonical_json(doc.dump())
        views = doc.to_dict()
        assert fast_views_json(views) == dumps_canonical_json(views)

    # out-of-schema views shapes take the fallback and still match
    for weird in (
        {"t0": {"grids": [], "kv_items": {}, "extra": 1}},
        {"t0": {"grids": [{"id": "g", "rows": [], "extra": 2}], "kv_items": {}}},
        {"t0": {"grids": [{"id": "g", "rows": [{"k": 3}]}], "kv_items": {}}},
        {1: {"grids": [], "kv_items": {}}},
    ):
        assert fast_views_json(weird) == dumps_canonical_json(weird)
