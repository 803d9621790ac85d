"""Visualizer tests: deterministic numpy-canvas overlays + PNG round trip."""
import json

import numpy as np

from yomitoku_ray.kernels.png import decode_png
from yomitoku_ray.visualize import (
    PALETTE,
    blank_canvas,
    det_visualizer,
    draw_arrow,
    draw_rect,
    draw_text,
    layout_visualizer,
    reading_order_visualizer,
    table_visualizer,
    to_png,
    visualize_document,
)

DOC = {
    "paragraphs": [
        {"box": [10, 10, 60, 30], "order": 0, "role": "page_header", "contents": "x"},
        {"box": [10, 40, 60, 60], "order": 1, "role": None, "contents": "y"},
    ],
    "tables": [
        {
            "box": [70, 10, 140, 60],
            "order": 2,
            "cells": [
                {"box": [72, 12, 100, 30], "row": 0, "col": 0},
                {"box": [102, 12, 138, 30], "row": 0, "col": 1},
            ],
        }
    ],
    "figures": [{"box": [10, 70, 140, 100], "order": 3}],
    "words": [{"points": [[12, 12], [30, 12], [30, 20], [12, 20]], "content": "w"}],
}


def test_draw_rect_exact_pixels():
    c = blank_canvas(20, 20)
    draw_rect(c, [2, 3, 10, 8], (1, 2, 3), thickness=1)
    assert c[3, 2].tolist() == [1, 2, 3]  # top-left corner
    assert c[7, 9].tolist() == [1, 2, 3]  # bottom-right inside edge
    assert c[5, 5].tolist() == [255, 255, 255]  # interior untouched
    draw_rect(c, [0, 0, 5, 5], (9, 9, 9), fill=True)
    assert c[4, 4].tolist() == [9, 9, 9]


def test_draw_text_and_arrow():
    c = blank_canvas(40, 20)
    draw_text(c, "0", (1, 1), (0, 0, 0))
    assert (c == 0).any()  # glyph painted
    c2 = blank_canvas(40, 20)
    draw_arrow(c2, (2, 10), (35, 10), (5, 5, 5))
    assert c2[10, 20].tolist() == [5, 5, 5]  # shaft
    assert (c2[:, 30:] == 5).any()  # arrowhead barbs near tip


def test_overlays_deterministic_and_png_roundtrip():
    a = visualize_document(DOC)
    b = visualize_document(DOC)
    assert np.array_equal(a, b)
    png = to_png(a)
    assert np.array_equal(decode_png(png)[:, :, :3], a)


def test_each_visualizer_paints_its_color():
    assert (layout_visualizer(DOC) == np.array(PALETTE["table"])).all(axis=-1).any()
    assert (det_visualizer(DOC) == np.array(PALETTE["word"])).all(axis=-1).any()
    assert (table_visualizer(DOC) == np.array(PALETTE["cell"])).all(axis=-1).any()
    ro = reading_order_visualizer(DOC)
    assert (ro == np.array(PALETTE["arrow"])).all(axis=-1).any()


def test_on_real_document(ray_session):
    from yomitoku_ray.stages.fused_stage import FusedExtractStage
    from yomitoku_ray.synth.pages import generate_pages_table

    t = FusedExtractStage()(generate_pages_table(6))
    rendered = 0
    for row in t.to_pylist():
        if row["error"] is not None:
            continue
        doc = json.loads(row["doc_json"])
        px = visualize_document(doc)
        assert px.ndim == 3 and px.shape[2] == 3 and px.size > 0
        rendered += 1
    assert rendered >= 4


def test_cli_visualize(ray_session, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from yomitoku_ray.__main__ import main
    from yomitoku_ray.pipelines.extract import ExtractConfig, extract_pages
    from yomitoku_ray.synth.pages import generate_pages_table

    pq.write_table(generate_pages_table(20), str(tmp_path / "pages.parquet"))
    extract_pages(str(tmp_path / "pages.parquet"), ExtractConfig()).write_parquet(
        str(tmp_path / "out")
    )
    viz = tmp_path / "viz"
    main(["visualize", str(tmp_path / "out"), str(viz), "--limit", "10"])
    files = glob.glob(str(viz / "*.png"))
    assert len(files) >= 5
    px = decode_png(open(files[0], "rb").read())
    assert px.size > 0


def test_extraction_visualizer_exact_pixels():
    from yomitoku_ray.extractor.rule_pipeline import ResolvedElement, ResolvedField
    from yomitoku_ray.visualize import _EXTRACT_COLOR, extraction_visualizer

    fields = [
        ResolvedField(
            name="TOTAL",
            value="12",
            raw_text="12",
            elements=[ResolvedElement(id="c1", box=[20, 30, 60, 50], contents="12")],
            confidence="high",
        )
    ]
    canvas = extraction_visualizer(fields)
    # translucent fill inside the box: 15% red over white, integer blend
    want_fill = tuple(((15 * c + 85 * 255) // 100) for c in _EXTRACT_COLOR)
    assert tuple(canvas[40, 40]) == want_fill
    # 2px stroke on the box edge is pure red
    assert tuple(canvas[30, 40]) == _EXTRACT_COLOR
    # label chip above the box is filled red with white glyph pixels inside
    assert tuple(canvas[25, 21]) == _EXTRACT_COLOR
    chip = canvas[19:30, 20:58]
    assert (chip == 255).all(axis=2).any()  # some white text pixels
    # outside everything stays white
    assert tuple(canvas[5, 5]) == (255, 255, 255)
    # determinism: same input -> byte-identical canvas
    assert np.array_equal(canvas, extraction_visualizer(fields))


def test_extraction_visualizer_dict_fields_and_alpha():
    from yomitoku_ray.visualize import _EXTRACT_COLOR, extraction_visualizer

    def fill_at(conf):
        fields = [
            {
                "name": "F",
                "confidence": conf,
                "elements": [{"label": "", "box": [10, 20, 40, 40]}],
            }
        ]
        canvas = extraction_visualizer(fields)
        return tuple(canvas[30, 25])

    for conf, pct in (("high", 15), ("medium", 25), ("low", 40), ("???", 20)):
        want = tuple(((pct * c + (100 - pct) * 255) // 100) for c in _EXTRACT_COLOR)
        assert fill_at(conf) == want, conf
