"""Lossy VP8 codec: bool coder, normative transforms, pixel pins, loop
filter behavior, corruption/bomb guards, webp integration."""

import numpy as np
import pytest

from yomitoku_ray.kernels import vp8_tables as T
from yomitoku_ray.kernels.vp8 import (
    BoolDecoder,
    BoolEncoder,
    Vp8Error,
    decode_vp8,
    decode_vp8_planes,
    encode_vp8,
    encode_webp_lossy,
    fdct4x4,
    fwht4x4,
    idct4x4,
    iwht4x4,
)
from yomitoku_ray.kernels.webp import WebpError, decode_webp, encode_webp_lossless


def test_bool_coder_round_trip_fuzz():
    rng = np.random.RandomState(7)
    for trial in range(400):
        n = int(rng.randint(1, 500))
        probs = rng.randint(1, 255, n)
        bits = rng.randint(0, 2, n)
        be = BoolEncoder()
        for p, b in zip(probs, bits):
            be.write_bool(int(p), int(b))
        bd = BoolDecoder(be.get_bytes())
        assert [bd.read_bool(int(p)) for p in probs] == list(bits), trial


def test_bool_coder_primitives():
    be = BoolEncoder()
    be.write_literal(7, 93)
    be.write_signed(6, -17)
    be.write_tree(T.KF_Y_MODE_TREE, T.KF_Y_MODE_PROBS, T.TM_PRED)
    be.write_tree(T.COEFF_TREE, [128] * 11, T.CAT6_TOKEN)
    bd = BoolDecoder(be.get_bytes())
    assert bd.read_literal(7) == 93
    assert bd.read_signed(6) == -17
    assert bd.read_tree(T.KF_Y_MODE_TREE, T.KF_Y_MODE_PROBS) == T.TM_PRED
    assert bd.read_tree(T.COEFF_TREE, [128] * 11) == T.CAT6_TOKEN


def test_idct_dc_only_analytic():
    # normative property, derivable by hand from the §14.4 butterfly:
    # a DC-only block inverts to the constant (DC + 4) >> 3
    for dc in (-1000, -37, -1, 0, 1, 5, 123, 2047):
        assert idct4x4([dc] + [0] * 15) == [(dc + 4) >> 3] * 16


def test_iwht_dc_only_analytic():
    # §14.3: DC-only Y2 block inverts to the constant (DC + 3) >> 3
    for dc in (-800, -5, 0, 7, 64, 999):
        assert iwht4x4([dc] + [0] * 15) == [(dc + 3) >> 3] * 16


def test_forward_transforms_near_invert():
    rng = np.random.RandomState(3)
    for _ in range(300):
        blk = rng.randint(-255, 256, 16)
        assert np.abs(np.array(idct4x4(fdct4x4(blk))) - blk).max() <= 1
        blk2 = rng.randint(-800, 801, 16)
        assert np.abs(np.array(iwht4x4(fwht4x4(blk2))) - blk2).max() <= 1


def test_flat_planes_decode_exactly():
    for val, mode in ((60, T.DC_PRED), (128, T.TM_PRED), (200, T.B_PRED), (17, T.V_PRED)):
        y = np.full((37, 51), val, np.uint8)
        u = np.full((19, 26), 100, np.uint8)
        v = np.full((19, 26), 180, np.uint8)
        chunk = encode_vp8(y, u, v, qindex=4, filter_level=40, ymode=mode)
        y2, u2, v2, _ = decode_vp8_planes(chunk)
        assert (y2 == val).all(), mode  # loop filter is identity on flat
        assert (u2 == 100).all() and (v2 == 180).all()


def test_error_scales_with_quantizer_and_all_modes_work():
    rng = np.random.RandomState(5)
    y = rng.randint(0, 256, (37, 51)).astype(np.uint8)
    u = np.full((19, 26), 100, np.uint8)
    v = np.full((19, 26), 180, np.uint8)
    means = []
    for qi in (0, 8, 40):
        y2, _, _, _ = decode_vp8_planes(encode_vp8(y, u, v, qindex=qi, filter_level=0))
        means.append(float(np.abs(y2.astype(int) - y.astype(int)).mean()))
    assert means[0] < 1.0 and means[0] < means[1] < means[2]
    for mode in (T.DC_PRED, T.V_PRED, T.H_PRED, T.TM_PRED, T.B_PRED):
        y2, _, _, _ = decode_vp8_planes(
            encode_vp8(y, u, v, qindex=8, filter_level=0, ymode=mode, uvmode=T.TM_PRED)
        )
        assert float(np.abs(y2.astype(int) - y.astype(int)).mean()) < 4.0, mode


def test_loop_filter_behavior():
    yy, xx = np.mgrid[0:48, 0:48]
    y = ((yy * 2 + xx * 3) % 256).astype(np.uint8)
    u = np.full((24, 24), 100, np.uint8)
    v = np.full((24, 24), 180, np.uint8)
    base, *_ = decode_vp8_planes(encode_vp8(y, u, v, qindex=80, filter_level=0))
    filt, *_ = decode_vp8_planes(encode_vp8(y, u, v, qindex=80, filter_level=40))
    assert (base != filt).any()  # the filter engages on smooth blocking
    # ... and moves the reconstruction TOWARD the source (deblocking)
    assert (
        np.abs(filt.astype(int) - y.astype(int)).mean()
        < np.abs(base.astype(int) - y.astype(int)).mean()
    )
    # simple filter: luma only
    rng = np.random.RandomState(5)
    yr = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    ur = rng.randint(80, 120, (16, 16)).astype(np.uint8)
    vr = rng.randint(160, 200, (16, 16)).astype(np.uint8)
    b = decode_vp8_planes(encode_vp8(yr, ur, vr, qindex=30, filter_level=0))
    s = decode_vp8_planes(encode_vp8(yr, ur, vr, qindex=30, filter_level=30, filter_type=1))
    n = decode_vp8_planes(encode_vp8(yr, ur, vr, qindex=30, filter_level=30))
    assert (b[0] != s[0]).any()  # simple filter changes luma
    assert (b[1] == s[1]).all() and (b[2] == s[2]).all()  # but never chroma
    assert (b[1] != n[1]).any()  # normal filter reaches chroma


def test_decode_is_deterministic_and_encoder_stable():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (21, 33, 3)).astype(np.uint8)
    blob = encode_webp_lossy(img, qindex=12, filter_level=8)
    assert blob == encode_webp_lossy(img, qindex=12, filter_level=8)
    a = decode_webp(blob)
    b = decode_webp(blob)
    assert np.array_equal(a, b) and a.shape == (21, 33, 3)


def test_webp_entry_handles_both_arms():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (24, 20, 3)).astype(np.uint8)
    assert np.array_equal(decode_webp(encode_webp_lossless(img)), img)
    out = decode_webp(encode_webp_lossy(img, qindex=8, filter_level=10))
    assert out.shape == (24, 20, 3)
    flat = np.full((20, 20, 3), (120, 64, 200), np.uint8)
    o2 = decode_webp(encode_webp_lossy(flat, qindex=4, filter_level=20))
    # flat image: only YUV<->RGB rounding survives the codec
    assert int(np.abs(o2.astype(int) - flat.astype(int)).max()) <= 1


def test_inter_frame_and_bad_magic_raise():
    y = np.full((16, 16), 99, np.uint8)
    u = v = np.full((8, 8), 128, np.uint8)
    chunk = bytearray(encode_vp8(y, u, v))
    chunk[0] |= 1  # key_frame bit: 1 = inter
    with pytest.raises(Vp8Error):
        decode_vp8_planes(bytes(chunk))
    chunk = bytearray(encode_vp8(y, u, v))
    chunk[3] = 0x00  # start code
    with pytest.raises(Vp8Error):
        decode_vp8_planes(bytes(chunk))


def test_decode_bomb_cap():
    y = np.full((16, 16), 99, np.uint8)
    u = v = np.full((8, 8), 128, np.uint8)
    chunk = bytearray(encode_vp8(y, u, v))
    chunk[6:8] = (4000).to_bytes(2, "little")  # claim 4000px wide
    chunk[8:10] = (4000).to_bytes(2, "little")
    with pytest.raises(Vp8Error, match="cap"):
        decode_vp8_planes(bytes(chunk), max_pixels=1 << 20)


def test_corruption_fuzz_only_codec_errors_escape():
    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    blob = bytearray(encode_webp_lossy(img, qindex=10, filter_level=10))
    for trial in range(300):
        mut = bytearray(blob)
        for _ in range(int(rng.randint(1, 4))):
            mut[int(rng.randint(0, len(mut)))] = int(rng.randint(0, 256))
        try:
            decode_webp(bytes(mut), max_pixels=64 * 64)
        except WebpError:
            pass  # the only error class allowed out


def test_strict_backend_decodes_lossy_webp():
    from yomitoku_ray.stages.multimodal import DecoderBackend

    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (20, 28, 3)).astype(np.uint8)
    px = DecoderBackend(mode="strict").decode_image(
        bytes(encode_webp_lossy(img, qindex=8, filter_level=12))
    )
    assert px.shape == (20, 28, 3)


def test_sniff_dims_lossy():
    from yomitoku_ray.kernels.webp import sniff_webp_dims

    img = np.zeros((33, 47, 3), np.uint8)
    assert sniff_webp_dims(encode_webp_lossy(img)) == (47, 33)


def test_vp8_options_property_fuzz():
    """Randomized sizes x modes x quantizers x filter settings: every
    combination must round-trip with bounded error and no exception
    (the webp-options fuzz pattern)."""
    rng = np.random.RandomState(41)
    modes = (T.DC_PRED, T.V_PRED, T.H_PRED, T.TM_PRED, T.B_PRED)
    for trial in range(40):
        h = int(rng.randint(4, 40))
        w = int(rng.randint(4, 40))
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        # low-pass half the trials: smooth content exercises the filter mask
        if trial % 2:
            img = (img.astype(np.int32) // 4 + 96).astype(np.uint8)
        kw = dict(
            qindex=int(rng.randint(0, 128)),
            filter_level=int(rng.randint(0, 64)),
            sharpness=int(rng.randint(0, 8)),
            filter_type=int(rng.randint(0, 2)),
            ymode=modes[int(rng.randint(0, len(modes)))],
            uvmode=modes[int(rng.randint(0, 4))],
        )
        blob = encode_webp_lossy(img, **kw)
        out = decode_webp(blob)
        assert out.shape == (h, w, 3), (trial, kw)
        err = float(np.abs(out.astype(int) - img.astype(int)).mean())
        # worst case: max quantizer + chroma subsampling on noise
        assert err < 90.0, (trial, kw, err)


def test_vp8_large_dims_and_odd_sizes():
    # 1-px edges, prime dims, exactly-16 multiples
    for h, w in ((1, 1), (1, 37), (37, 1), (16, 16), (48, 32), (17, 31)):
        img = np.full((h, w, 3), (200, 30, 90), np.uint8)
        out = decode_webp(encode_webp_lossy(img, qindex=4, filter_level=10))
        assert out.shape == (h, w, 3)
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1
