"""JSONL sink + source: deterministic bytes, lossless type round trips,
foreign-shard tolerance, and the e2e drive from the extract pipeline."""

import glob
import gzip
import json

import pyarrow as pa
import pytest

from yomitoku_ray.export.jsonl import (
    encode_jsonl_block,
    encode_jsonl_row,
    iter_jsonl_rows,
    read_jsonl,
    write_jsonl,
)


def _doc_table(n=10):
    return pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array([f"doc {i} body ünïcödé é" for i in range(n)]),
            "lang": pa.array(["en", "ja"] * (n // 2)),
            "score": pa.array([i / 3 for i in range(n)], pa.float64()),
        }
    )


def test_encode_row_deterministic_and_compact():
    row = {"a": 1, "b": "x\ny", "c": None}
    line = encode_jsonl_row(row, ["a", "b", "c"])
    assert line == b'{"a":1,"b":"x\\ny","c":null}\n'
    # key order follows the columns argument, not dict insertion
    assert encode_jsonl_row({"b": 2, "a": 1}, ["a", "b"]) == b'{"a":1,"b":2}\n'


def test_encode_lossless_special_types():
    from datetime import datetime, timezone

    row = {
        "ts": datetime(2026, 8, 19, 3, 4, 5, 123456, tzinfo=timezone.utc),
        "blob": b"\x00\xff\x01",
        "nan": float("nan"),
    }
    obj = json.loads(encode_jsonl_row(row, ["ts", "blob", "nan"]))
    assert obj["ts"] == 1787108645123456
    assert obj["blob"] == "AP8B"
    assert obj["nan"] is None


def test_block_bytes_identical_across_calls():
    t = _doc_table()
    assert encode_jsonl_block(t) == encode_jsonl_block(t)
    assert gzip.compress(encode_jsonl_block(t), 6, mtime=0) == gzip.compress(
        encode_jsonl_block(t), 6, mtime=0
    )


@pytest.mark.parametrize("compression", [None, "gzip"])
def test_roundtrip_dataset(ray_session, tmp_path, compression):
    import ray.data

    t = _doc_table(20)
    out = str(tmp_path / "shards")
    write_jsonl(ray.data.from_arrow(t), out, compression=compression)
    suffix = "*.jsonl.gz" if compression == "gzip" else "*.jsonl"
    assert glob.glob(f"{out}/{suffix}")
    got = read_jsonl(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = t.to_pandas()
    assert list(got.columns) == list(want.columns)
    for c in want.columns:
        assert got[c].tolist() == want[c].tolist()


def test_roundtrip_timestamp_and_binary_cols(ray_session, tmp_path):
    import ray.data

    t = pa.table(
        {
            "url": pa.array(["u1", "u2", "u3"]),
            "warc_ts": pa.array([1, 1787108645123456, None], pa.timestamp("us")),
            "html": pa.array([b"<p>a</p>", b"\x00\xff", None], pa.binary()),
        }
    )
    out = str(tmp_path / "shards")
    write_jsonl(ray.data.from_arrow(t), out)
    got = (
        read_jsonl(out, timestamp_cols=["warc_ts"], binary_cols=["html"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert got["warc_ts"].astype("datetime64[us]").equals(
        t.to_pandas()["warc_ts"].astype("datetime64[us]")
    )
    want_html = t.column("html").to_pylist()
    got_html = [None if v is None else bytes(v) for v in got["html"]]
    assert got_html == want_html


def test_foreign_shard_missing_and_extra_keys(ray_session, tmp_path):
    p = tmp_path / "foreign.jsonl"
    p.write_text('{"a":1}\n\n{"a":2,"b":"x"}\n{"b":"y"}\n')
    got = read_jsonl(str(p)).to_pandas()
    assert list(got.columns) == ["a", "b"]
    a = got["a"].tolist()
    assert a[:2] == [1, 2] and (a[2] is None or a[2] != a[2])  # null or NaN
    assert got["b"].tolist() == [None, "x", "y"]


def test_malformed_line_names_shard_and_line():
    with pytest.raises(ValueError, match=r"bad\.jsonl:2"):
        list(iter_jsonl_rows([b'{"a":1}\n', b"{oops\n"], path="bad.jsonl"))


def test_extract_to_jsonl_chain(ray_session, tmp_path):
    """Pages -> extract -> jsonl shards -> read back: text byte-identical."""
    import pyarrow.parquet as pq
    import ray.data

    from yomitoku_ray.pipelines.extract import ExtractConfig, extract_pages
    from yomitoku_ray.synth.pages import generate_pages_table

    src = str(tmp_path / "pages.parquet")
    pq.write_table(generate_pages_table(40), src)
    ds = extract_pages(src, ExtractConfig()).select_columns(
        ["url", "extracted_text"]
    )
    want = {
        r["url"]: r["extracted_text"]
        for r in ds.take_all()
        if r["extracted_text"] is not None
    }
    out = str(tmp_path / "shards")
    write_jsonl(ds, out)
    got = read_jsonl(out).to_pandas()
    got_map = {
        u: t for u, t in zip(got["url"], got["extracted_text"]) if t is not None
    }
    assert got_map == want
