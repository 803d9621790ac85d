"""Netpbm (P1-P6) codec: round trips, hand-built ASCII/bitmap/16-bit
variants with analytic pixels, stage integration."""

import numpy as np
import pytest

from yomitoku_ray.kernels.netpbm import NetpbmError, decode_netpbm, encode_netpbm

RNG = np.random.RandomState(0xFEED)


def test_p6_p5_roundtrip():
    rgb = RNG.randint(0, 256, (9, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_netpbm(encode_netpbm(rgb)), rgb)
    gray = RNG.randint(0, 256, (5, 11), dtype=np.uint8)
    assert np.array_equal(decode_netpbm(encode_netpbm(gray)), gray)


def test_ascii_variants_with_comments():
    p2 = b"P2 # gray\n3 2\n# another\n255\n0 128 255\n10 20 30\n"
    out = decode_netpbm(p2)
    assert out.tolist() == [[0, 128, 255], [10, 20, 30]]
    p3 = b"P3\n2 1 255\n255 0 0  0 0 255\n"
    assert decode_netpbm(p3).tolist() == [[[255, 0, 0], [0, 0, 255]]]
    p1 = b"P1\n4 2\n0110\n1 0 0 1\n"
    out = decode_netpbm(p1)  # 1 = black
    assert out.tolist() == [[255, 0, 0, 255], [0, 255, 255, 0]]


def test_p4_bitmap_packing():
    # 10 px wide: 2 bytes per row, 6 padding bits
    row0 = 0b10110000, 0b01000000  # pixels: 1,0,1,1,0,0,0,0,0,1
    blob = b"P4\n10 1\n" + bytes(row0)
    out = decode_netpbm(blob)
    assert out.tolist() == [[0, 255, 0, 0, 255, 255, 255, 255, 255, 0]]


def test_16bit_maxval_scales():
    vals = np.array([[0, 32768, 65535]], dtype=">u2")
    blob = b"P5 3 1 65535\n" + vals.tobytes()
    assert decode_netpbm(blob).tolist() == [[0, 128, 255]]
    # non-255 8-bit maxval scales too (rounded)
    blob = b"P5 2 1 100\n" + bytes([0, 100])
    assert decode_netpbm(blob).tolist() == [[0, 255]]


def test_errors():
    with pytest.raises(NetpbmError):
        decode_netpbm(b"P7 not supported")
    with pytest.raises(NetpbmError):
        decode_netpbm(b"P5 3 1 255\n\x00\x01")  # truncated
    with pytest.raises(NetpbmError):
        decode_netpbm(b"P2 2 1 100\n50 200\n")  # sample > maxval


def test_stage_integration():
    from yomitoku_ray.stages.multimodal import DecoderBackend, sniff_image_meta

    rgb = RNG.randint(0, 256, (6, 8, 3), dtype=np.uint8)
    blob = encode_netpbm(rgb)
    meta = sniff_image_meta(blob)
    assert meta["format"] == "pnm" and (meta["width"], meta["height"]) == (8, 6)
    out = DecoderBackend(mode="strict").decode_image(blob)
    assert np.array_equal(out, rgb)
