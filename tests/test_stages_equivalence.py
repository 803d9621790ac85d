"""Fused vs staged pipeline: identical bytes; vectorized reading-order parity."""

import pyarrow.parquet as pq
import pytest

import yomitoku_ray.kernels.reading_order as ro
from yomitoku_ray.models import Paragraph
from yomitoku_ray.pipelines.extract import ExtractConfig, extract_pages
from yomitoku_ray.synth.pages import generate_pages_table


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("eq_pages") / "pages.parquet"
    pq.write_table(generate_pages_table(50, start=500), str(path))
    return str(path)


def test_fused_equals_staged(ray_session, pages_path):
    fused = (
        extract_pages(pages_path, ExtractConfig(fused=True, detect_concurrency=2))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    staged = (
        extract_pages(pages_path, ExtractConfig(fused=False, detect_concurrency=2))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(fused.columns) == list(staged.columns)
    for col in ("url", "extracted_text", "markdown", "html", "csv", "doc_json"):
        assert fused[col].tolist() == staged[col].tolist(), col


def test_reading_order_matches_frozen_goldens():
    """60 frozen layouts recorded while the scalar reference port and the
    vectorized builder were parity-verified side by side."""
    import json, os

    path = os.path.join(os.path.dirname(__file__), "data", "reading_order_golden.json")
    for case in json.load(open(path)):
        elems = [
            Paragraph(box=list(b), contents="", direction="horizontal", order=0)
            for b in case["boxes"]
        ]
        ro.prediction_reading_order(elems, case["direction"])
        assert [e.order for e in elems] == case["orders"], case["direction"]
