"""Fused vs staged pipeline: identical bytes; vectorized reading-order parity."""

import copy
import random

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


def test_vectorized_reading_order_parity():
    r = random.Random(77)
    for trial in range(12):
        n = r.randint(2, 60)
        elems = [
            Paragraph(
                box=[x, y, x + r.randrange(20, 250), y + r.randrange(10, 80)],
                contents="",
                direction="horizontal",
                order=0,
            )
            for x, y in ((r.randrange(0, 1000), r.randrange(0, 1500)) for _ in range(n))
        ]
        for d in ("top2bottom", "right2left", "left2right"):
            old = ro._VECTORIZE_MIN_NODES
            try:
                ro._VECTORIZE_MIN_NODES = 10**9
                a = [e.order for e in ro.prediction_reading_order(copy.deepcopy(elems), d)]
                ro._VECTORIZE_MIN_NODES = 0
                b = [e.order for e in ro.prediction_reading_order(copy.deepcopy(elems), d)]
            finally:
                ro._VECTORIZE_MIN_NODES = old
            assert a == b, (trial, d, n)
