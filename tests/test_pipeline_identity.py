"""Ray pipeline vs single-process oracle: byte-identical output per url.

The conformance gate of the whole engine (north rule: byte-identical
extracted text per url, match rate 100%).
"""

import pyarrow.parquet as pq
import pytest

from yomitoku_ray.oracle import analyze_html_bytes
from yomitoku_ray.pipelines.extract import ExtractConfig, extract_pages
from yomitoku_ray.synth.pages import generate_pages_table

N_PAGES = 80


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("pages") / "pages.parquet"
    pq.write_table(generate_pages_table(N_PAGES), str(path))
    return str(path)


def test_pipeline_matches_oracle_bytes(ray_session, pages_path):
    cfg = ExtractConfig(detect_concurrency=2, detect_batch_size=16)
    result = extract_pages(pages_path, cfg).to_pandas()
    assert len(result) == N_PAGES

    src = pq.read_table(pages_path).to_pylist()
    by_url = {row["url"]: row for row in src}
    n_checked = 0
    for _, row in result.iterrows():
        oracle_out, oracle_err = analyze_html_bytes(
            by_url[row["url"]]["html"], row["url"]
        )
        if oracle_err is not None:
            assert row["error"] is not None
            continue
        assert row["error"] is None
        for col in ("extracted_text", "markdown", "html", "csv", "doc_json"):
            assert row[col] == oracle_out[col], (row["url"], col)
        got_spans = [dict(s) for s in row["spans"]]
        assert got_spans == oracle_out["spans"], row["url"]
        n_checked += 1
    assert n_checked > 60


def test_pipeline_output_schema(ray_session, pages_path):
    from yomitoku_ray.schemas import RESULT_SCHEMA

    ds = extract_pages(pages_path, ExtractConfig(detect_concurrency=2))
    out_schema = ds.schema()
    assert out_schema.names == [f.name for f in RESULT_SCHEMA]
