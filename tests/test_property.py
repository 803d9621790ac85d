"""Property-based tests (hypothesis) over the deterministic kernels —
stronger than the reference's fixture-only suite (SURVEY §5 notes it has no
randomized tests)."""

from hypothesis import given, settings, strategies as st

import yomitoku_ray.kernels.reading_order as ro
from yomitoku_ray.kernels.geometry import (
    calc_intersection,
    calc_iou,
    calc_overlap_ratio,
    is_contained,
    quad_to_xyxy,
)
from yomitoku_ray.models import Paragraph

boxes = st.tuples(
    st.integers(0, 1000), st.integers(0, 1500), st.integers(1, 300), st.integers(1, 200)
).map(lambda t: [t[0], t[1], t[0] + t[2], t[1] + t[3]])


@given(boxes, boxes)
def test_intersection_symmetric_and_contained(a, b):
    ia = calc_intersection(a, b)
    ib = calc_intersection(b, a)
    assert ia == ib
    if ia is not None:
        x1, y1, x2, y2 = ia
        assert x1 < x2 and y1 < y2
        assert x1 >= max(a[0], b[0]) and x2 <= min(a[2], b[2])


@given(boxes, boxes)
def test_iou_bounds_and_symmetry(a, b):
    v = calc_iou(a, b)
    assert 0 <= v <= 1
    assert v == calc_iou(b, a)
    assert calc_iou(a, a) == 1.0


@given(boxes)
def test_self_containment(a):
    assert is_contained(a, a)
    ratio, inter = calc_overlap_ratio(a, a)
    assert ratio == 1.0 and inter == list(map(int, a))


@given(st.lists(st.tuples(st.integers(0, 60), st.integers(0, 60)), min_size=4, max_size=4))
def test_quad_to_xyxy_bounds(pts):
    x1, y1, x2, y2 = quad_to_xyxy(pts)
    assert x1 <= x2 and y1 <= y2
    assert all(x1 <= x <= x2 and y1 <= y <= y2 for x, y in pts)


elements = st.lists(boxes, min_size=2, max_size=24).map(
    lambda bs: [
        Paragraph(box=list(b), contents="", direction="horizontal", order=0) for b in bs
    ]
)


@settings(max_examples=40, deadline=None)
@given(elements, st.sampled_from(["top2bottom", "right2left", "left2right"]))
def test_reading_order_is_permutation(elems, direction):
    ro.prediction_reading_order(elems, direction)
    assert sorted(e.order for e in elems) == list(range(len(elems)))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(alphabet="abc あい", min_size=0, max_size=30), min_size=1, max_size=10))
def test_tokenize_preserves_nonspace_content(texts):
    from yomitoku_ray.detect import tokenize

    for text in texts:
        toks = tokenize(text)
        assert "".join(toks) == "".join(text.split())
