"""Reading-order DFS tests on hand-built layouts."""

from yomitoku_ray.kernels.reading_order import prediction_reading_order
from yomitoku_ray.models import Paragraph


def para(box):
    return Paragraph(box=box, contents="", direction="horizontal", order=0)


def orders(elements):
    return [e.order for e in elements]


def test_single_column_top2bottom():
    elems = [para([10, 300, 200, 340]), para([10, 10, 200, 50]), para([10, 150, 200, 190])]
    prediction_reading_order(elems, "top2bottom")
    ranked = sorted(elems, key=lambda e: e.order)
    assert [e.box[1] for e in ranked] == [10, 150, 300]


def test_two_columns_top2bottom():
    # Left column should be fully read before the right column starts.
    left = [para([10, 10, 200, 50]), para([10, 100, 200, 140]), para([10, 200, 200, 240])]
    right = [para([300, 10, 500, 50]), para([300, 100, 500, 140])]
    elems = left + right
    prediction_reading_order(elems, "top2bottom")
    assert sorted(orders(left)) == [0, 1, 2]
    assert sorted(orders(right)) == [3, 4]


def test_right2left_vertical_pages():
    # Vertical Japanese: rightmost column first.
    cols = [para([500, 10, 540, 300]), para([300, 10, 340, 300]), para([100, 10, 140, 300])]
    prediction_reading_order(cols, "right2left")
    ranked = sorted(cols, key=lambda e: e.order)
    assert [e.box[0] for e in ranked] == [500, 300, 100]


def test_left2right():
    elems = [para([300, 10, 400, 50]), para([10, 10, 100, 50]), para([150, 10, 250, 50])]
    prediction_reading_order(elems, "left2right")
    ranked = sorted(elems, key=lambda e: e.order)
    assert [e.box[0] for e in ranked] == [10, 150, 300]


def test_short_lists_are_noop():
    one = [para([0, 0, 10, 10])]
    assert prediction_reading_order(one, "top2bottom") is one
    assert prediction_reading_order([], "top2bottom") == []


def test_all_orders_assigned_unique():
    import random

    r = random.Random(7)
    elems = [
        para([x, y, x + 80, y + 30])
        for x, y in ((r.randrange(0, 900), r.randrange(0, 1200)) for _ in range(40))
    ]
    prediction_reading_order(elems, "top2bottom")
    assert sorted(orders(elems)) == list(range(40))
