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


def test_image_dhash_lossless_format_invariance(ray_session):
    """The same pixels hash identically across PNG/BMP/netpbm; a small
    patch flip moves only a few gradient bits."""
    import numpy as np

    from yomitoku_ray.kernels.bmp import encode_bmp
    from yomitoku_ray.kernels.netpbm import encode_netpbm
    from yomitoku_ray.kernels.png import encode_png
    from yomitoku_ray.stages.multimodal import DecoderBackend, ImageDHashStage

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (24, 40, 3), dtype=np.uint8)
    be = DecoderBackend(mode="strict")
    hashes = {
        enc.__name__: ImageDHashStage.dhash_of_pixels(be.decode_image(enc(px)))
        for enc in (encode_png, encode_bmp, encode_netpbm)
    }
    assert len(set(hashes.values())) == 1, hashes
    near = px.copy()
    near[:3, :5] = 255 - near[:3, :5]
    h0 = next(iter(hashes.values()))
    h1 = ImageDHashStage.dhash_of_pixels(be.decode_image(encode_png(near)))
    ham = bin(h0 ^ h1).count("1")
    assert 0 < ham <= 8


def test_image_dhash_stage_error_isolation(ray_session):
    """Garbage blobs get dhash 0 + an error string; the batch survives."""
    import pyarrow as pa

    from yomitoku_ray.stages.multimodal import ImageDHashStage
    from yomitoku_ray.kernels.png import encode_png
    import numpy as np

    px = np.zeros((8, 9, 3), dtype=np.uint8)
    batch = pa.table(
        {
            "img_id": pa.array([0, 1, 2], pa.int64()),
            "image": pa.array([encode_png(px), b"\x00garbage", None], pa.binary()),
        }
    )
    out = ImageDHashStage()(batch)
    errs = out.column("dhash_error").to_pylist()
    assert errs[0] is None and errs[1] is not None and errs[2] is not None


def test_hamming_pairs_u64_exact_radius(ray_session):
    """Pigeonhole completeness on a hand-built hash set."""
    import pandas as pd
    import ray.data

    from yomitoku_ray.functions.dedup import hamming_pairs_u64

    rows = [
        {"img_id": 0, "h": 0b1111000},
        {"img_id": 1, "h": 0b1111001},   # ham 1 from 0
        {"img_id": 2, "h": 0b1111111},   # ham 3 from 0, 2 from 1
        {"img_id": 3, "h": (1 << 63) | 0b1010101},  # far from all
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    got = hamming_pairs_u64(ds, "img_id", "h", n_chunks=4, hamming_max=3)
    pairs = {(a, b): h for a, b, h in got.itertuples(index=False)}
    assert pairs == {(0, 1): 1, (0, 2): 3, (1, 2): 2}


def test_audio_fingerprint_volume_invariant_noise_robust(ray_session):
    import numpy as np

    from yomitoku_ray.kernels.audio import decode_wav, encode_wav
    from yomitoku_ray.stages.multimodal import AudioFingerprintStage

    rate = 16000
    t = np.arange(rate) / rate
    base = np.concatenate(
        [0.6 * np.sin(2 * np.pi * (500 * (1 << (i % 5))) * t[: rate // 8])
         for i in range(8)]
    )
    fp = AudioFingerprintStage.fingerprint_of
    x0, r0 = decode_wav(encode_wav(base, rate))
    xs, _ = decode_wav(encode_wav(0.25 * base, rate))
    rng = np.random.RandomState(3)
    xn, _ = decode_wav(encode_wav(base + 0.05 * rng.randn(len(base)), rate))
    h0, hs, hn = fp(x0, r0), fp(xs, r0), fp(xn, r0)
    assert h0 == hs  # amplitude invariance
    assert bin(h0 ^ hn).count("1") <= 7  # noise robustness
    assert h0 != 0


def test_audio_fingerprint_stage_error_isolation(ray_session):
    import numpy as np
    import pyarrow as pa

    from yomitoku_ray.kernels.audio import encode_wav
    from yomitoku_ray.stages.multimodal import AudioFingerprintStage

    good = encode_wav(np.sin(np.arange(8000) / 10.0), 8000)
    batch = pa.table(
        {
            "clip_id": pa.array([0, 1], pa.int64()),
            "audio": pa.array([good, b"not-a-wav"], pa.binary()),
        }
    )
    out = AudioFingerprintStage()(batch)
    errs = out.column("fp_error").to_pylist()
    assert errs[0] is None and errs[1] is not None


def test_video_middle_frame_dhash_stable_under_reencode(ray_session):
    import numpy as np

    from yomitoku_ray.kernels.avi import decode_avi_frame, encode_mjpeg_avi, index_avi
    from yomitoku_ray.stages.multimodal import ImageDHashStage

    def mid_hash(blob):
        spans = index_avi(blob)["frames"]
        return ImageDHashStage.dhash_of_pixels(
            decode_avi_frame(blob, spans[len(spans) // 2])
        )

    y, x = np.mgrid[0:48, 0:64]
    frames = []
    for i in range(6):
        f = (127 + 120 * np.sin(x / (3 + i)) * np.cos(y / (4 + i))).astype(np.uint8)
        frames.append(np.stack([f, np.roll(f, i, axis=1), 255 - f], axis=2))
    h90 = mid_hash(encode_mjpeg_avi(frames, quality=90))
    h30 = mid_hash(encode_mjpeg_avi(frames, quality=30))
    hinv = mid_hash(encode_mjpeg_avi([255 - f for f in frames], quality=90))
    assert bin(h90 ^ h30).count("1") <= 2  # perceptual hash survives q30
    assert bin(h90 ^ hinv).count("1") > 32  # inversion flips the gradients


def test_hamming_pairs_u64_rep_star_for_identical_hashes(ray_session):
    """An identical-hash clique emits min-id-rep star pairs (hamming 0,
    O(clique)), and near pairs connect cliques through their reps."""
    import pandas as pd
    import ray.data

    from yomitoku_ray.functions.dedup import hamming_pairs_u64

    rows = [
        {"img_id": 0, "h": 0b1111000},
        {"img_id": 1, "h": 0b1111000},
        {"img_id": 2, "h": 0b1111000},   # clique {0,1,2}
        {"img_id": 3, "h": 0b1111001},   # ham 1 from the clique hash
        {"img_id": 4, "h": (1 << 62)},   # far
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    got = hamming_pairs_u64(ds, "img_id", "h", n_chunks=4, hamming_max=3)
    pairs = {(a, b): h for a, b, h in got.itertuples(index=False)}
    # stars: rep 0 -> members 1,2 at distance 0; near: rep 0 -> 3 only
    assert pairs == {(0, 1): 0, (0, 2): 0, (0, 3): 1}
