"""_split_text_across_cells geometry (J4) on hand-built fixtures, mirroring
the reference's tests/test_document_analyzer.py style."""

from yomitoku_ray.analyze import split_text_across_cells
from yomitoku_ray.models import Table, TableCell, TableLine


def _table():
    # 2 rows x 2 cols, rows y:[0,50),[50,100); cols x:[0,100),[100,200)
    rows = [TableLine(box=[0, 0, 200, 50], score=1.0), TableLine(box=[0, 50, 200, 100], score=1.0)]
    cols = [TableLine(box=[0, 0, 100, 100], score=1.0), TableLine(box=[100, 0, 200, 100], score=1.0)]
    cells = [
        TableCell(col=1, row=1, col_span=1, row_span=1, box=[0, 0, 100, 50]),
        TableCell(col=2, row=1, col_span=1, row_span=1, box=[100, 0, 200, 50]),
        TableCell(col=1, row=2, col_span=1, row_span=1, box=[0, 50, 100, 100]),
        TableCell(col=2, row=2, col_span=1, row_span=1, box=[100, 50, 200, 100]),
    ]
    return Table(box=[0, 0, 200, 100], n_row=2, n_col=2, rows=rows, cols=cols, spans=[], cells=cells)


def test_horizontal_word_split_across_columns():
    # One wide horizontal word spanning both columns of row 1.
    points = [[[10, 10], [190, 10], [190, 40], [10, 40]]]
    scores = [0.9]
    new_points, new_scores = split_text_across_cells(points, scores, [_table()])
    # Clipped into the two cell x-ranges of row 1.
    assert len(new_points) == 2
    xs = sorted((p[0][0], p[1][0]) for p in new_points)
    assert xs[0] == (10, 100) and xs[1] == (100, 190)
    assert all(s == 0.9 for s in new_scores)


def test_word_outside_table_passes_through():
    points = [[[300, 10], [400, 10], [400, 40], [300, 40]]]
    scores = [0.5]
    new_points, new_scores = split_text_across_cells(points, scores, [_table()])
    assert new_points == points and new_scores == scores


def test_vertical_word_split_across_rows():
    # Tall vertical word spanning both rows in column 1.
    points = [[[20, 5], [50, 5], [50, 95], [20, 95]]]
    scores = [0.7]
    new_points, _ = split_text_across_cells(points, scores, [_table()])
    assert len(new_points) == 2
    ys = sorted((p[0][1], p[2][1]) for p in new_points)
    assert ys[0] == (5, 50) and ys[1] == (50, 95)


def test_noise_fragments_dropped():
    # A word barely overlapping the second column: the clipped fragment is
    # < 15px wide -> dropped by is_noise (document_analyzer.py:248-253).
    points = [[[10, 10], [108, 10], [108, 40], [10, 40]]]
    scores = [0.9]
    new_points, _ = split_text_across_cells(points, scores, [_table()])
    assert len(new_points) == 1
    assert new_points[0][1][0] == 100  # only the wide left fragment kept
