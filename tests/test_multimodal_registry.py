"""Multimodal stub stages, OCR pipeline, registry, CLI smoke."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from yomitoku_ray.registry import get_stage, list_stages, recursive_update
from yomitoku_ray.stages.multimodal import (
    DecoderBackend,
    ImageFeatureStage,
    ImageMetaStage,
    make_fake_png,
    sniff_image_meta,
)


def test_sniff_png_meta():
    blob = make_fake_png(320, 240, seed=1)
    meta = sniff_image_meta(blob)
    assert meta["format"] == "png"
    assert (meta["width"], meta["height"]) == (320, 240)
    assert meta["n_bytes"] == len(blob)


def test_sniff_unknown():
    meta = sniff_image_meta(b"not an image at all")
    assert meta["format"] == "unknown" and meta["width"] == -1


def test_image_meta_stage_batch():
    batch = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "image": pa.array([make_fake_png(8, 8), b"junk"], pa.binary()),
        }
    )
    out = ImageMetaStage()(batch)
    metas = out.column("image_meta").to_pylist()
    assert metas[0]["format"] == "png" and metas[1]["format"] == "unknown"


def test_feature_stage_fake_is_deterministic():
    blob = make_fake_png(8, 8, seed=2)
    batch = pa.table({"image": pa.array([blob, blob], pa.binary())})
    out = ImageFeatureStage(backend_mode="fake")(batch)
    feats = out.column("image_features").to_pylist()
    assert feats[0] == feats[1]
    assert len(feats[0]["embedding"]) == 16


def test_feature_stage_strict_raises():
    with pytest.raises(NotImplementedError):
        DecoderBackend("strict").decode_image(b"x")


def test_registry_merge_and_resolution():
    cfg, stage = get_stage("extract", {"reading_order": "left2right"})
    assert cfg["reading_order"] == "left2right"
    assert cfg["ignore_ruby"] is False  # default preserved
    assert "extract" in list_stages() and "semantic" in list_stages()
    with pytest.raises(KeyError):
        get_stage("nope")


def test_recursive_update_nested():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    recursive_update(base, {"a": {"c": 9}, "e": 4})
    assert base == {"a": {"b": 1, "c": 9}, "d": 3, "e": 4}


def test_ocr_pipeline(ray_session, tmp_path):
    from yomitoku_ray.pipelines.ocr import ocr_pages
    from yomitoku_ray.synth.pages import generate_pages_table

    path = str(tmp_path / "pages.parquet")
    pq.write_table(generate_pages_table(20), path)
    df = ocr_pages(path, concurrency=1).to_pandas()
    assert len(df) == 20
    ok = df[df["error"].isna()]
    assert (ok["n_words"] > 0).all()
    row = ok.iloc[0]
    assert len(row["words"]) == row["n_words"]
    assert row["content"].count("\n") == row["n_words"] - 1


def test_cli_synth_and_extract(ray_session, tmp_path):
    from yomitoku_ray.__main__ import main

    pages = str(tmp_path / "p.parquet")
    out = str(tmp_path / "out")
    main(["synth", pages, "--rows", "30"])
    main(["--num-cpus", "4", "extract", pages, out])
    t = pq.read_table(out)
    assert t.num_rows == 30


def test_rows_only_queries_self_check(ray_session):
    """The rows-only driver queries carry analytic ok columns (VERDICT r4
    #5, the warc_roundtrip pattern); every row must self-verify."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    q = entry.queries()
    sf = "/root/testdata/sf0.001"
    expect = {
        "paged_extract": ["ok_shape"],
        "image_features_summary": ["ok_dims", "ok_format"],
        "audio_features_summary": ["ok_gate"],
        "video_frames_summary": ["ok"],
        "warc_split_parity": ["ok_split", "ok_src"],
    }
    for name, cols in expect.items():
        df = q[name](sf)
        assert len(df) > 0, name
        for c in cols:
            assert int(df[c].sum()) == len(df), (name, c)
