"""BMP / baseline-TIFF codec tests: round trips, variants, error policy."""
import numpy as np
import pytest

from yomitoku_ray.kernels.bmp import BmpError, decode_bmp, encode_bmp
from yomitoku_ray.kernels.tiff import TiffError, decode_tiff, encode_tiff


def _rand(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, np.uint8)


def test_bmp_roundtrip_rgb_and_gray():
    for shape in [(7, 5, 3), (16, 16, 3), (9, 13), (1, 1, 3)]:
        img = _rand(shape, seed=sum(shape))
        want = img if img.ndim == 3 else np.repeat(img[:, :, None], 3, axis=2)
        assert np.array_equal(decode_bmp(encode_bmp(img)), want)


def test_bmp_topdown_and_32bpp():
    import struct

    img = _rand((4, 3, 3), seed=2)
    blob = bytearray(encode_bmp(img))
    # flip to top-down: negate height, reorder rows in place
    h, w = 4, 3
    stride = (w * 3 + 3) & ~3
    rows = [bytes(blob[54 + r * stride : 54 + (r + 1) * stride]) for r in range(h)]
    blob[54:] = b"".join(reversed(rows))
    struct.pack_into("<i", blob, 22, -h)
    assert np.array_equal(decode_bmp(bytes(blob)), img)


def test_bmp_palette():
    import struct

    # hand-build an 8-bit palette BMP: 2x2 indices into a 4-color palette
    pal = bytes([10, 20, 30, 0, 40, 50, 60, 0, 70, 80, 90, 0, 100, 110, 120, 0])
    idx_rows = bytes([0, 1, 0, 0]) + bytes([2, 3, 0, 0])  # stride 4, bottom-up
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 8, 0, 0, 4, 0)
    off = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(idx_rows), 0, 0, off)
    px = decode_bmp(hdr + dib + pal + idx_rows)
    assert px[1, 0].tolist() == [30, 20, 10]  # bottom row first in file
    assert px[0, 1].tolist() == [120, 110, 100]


def test_bmp_errors():
    with pytest.raises(BmpError):
        decode_bmp(b"nope")
    with pytest.raises(BmpError):
        decode_bmp(b"BM" + b"\x00" * 60)  # zero dims


def test_tiff_roundtrip_variants():
    p1 = _rand((11, 7, 3), 1)
    p2 = _rand((5, 9), 2)
    for pb in (False, True):
        pages = decode_tiff(encode_tiff([p1, p2], packbits=pb))
        assert len(pages) == 2
        assert np.array_equal(pages[0], p1)
        assert np.array_equal(pages[1], np.repeat(p2[:, :, None], 3, axis=2))


def test_tiff_packbits_long_runs():
    flat = np.full((3, 300), 7, np.uint8)
    got = decode_tiff(encode_tiff([flat], packbits=True))[0]
    assert np.array_equal(got[:, :, 0], flat)


def test_tiff_big_endian_and_whiteiszero():
    # hand-build a minimal big-endian gray page with photometric 0
    import struct

    img = np.array([[0, 128], [255, 64]], np.uint8)
    data = img.tobytes()
    out = bytearray(b"MM\x00*" + struct.pack(">I", 8))
    entries = []

    def tag(tid, typ, count, value4):
        entries.append(struct.pack(">HHI", tid, typ, count) + value4)

    data_off = 8 + 2 + 12 * 8 + 4
    tag(256, 4, 1, struct.pack(">I", 2))
    tag(257, 4, 1, struct.pack(">I", 2))
    tag(258, 3, 1, struct.pack(">HH", 8, 0))
    tag(259, 3, 1, struct.pack(">HH", 1, 0))
    tag(262, 3, 1, struct.pack(">HH", 0, 0))  # WhiteIsZero
    tag(273, 4, 1, struct.pack(">I", data_off))
    tag(278, 4, 1, struct.pack(">I", 2))
    tag(279, 4, 1, struct.pack(">I", len(data)))
    out += struct.pack(">H", len(entries)) + b"".join(entries) + struct.pack(">I", 0)
    out += data
    px = decode_tiff(bytes(out))[0]
    assert np.array_equal(px[:, :, 0], 255 - img)  # inverted


def test_tiff_errors():
    with pytest.raises(TiffError):
        decode_tiff(b"II*\x00garbage")
    with pytest.raises(TiffError):
        decode_tiff(b"PDF-nope")


def test_backend_decodes_bmp_and_tiff():
    from yomitoku_ray.stages.multimodal import DecoderBackend, sniff_image_meta

    be = DecoderBackend(mode="strict")
    img = _rand((6, 8, 3), 9)
    assert np.array_equal(be.decode_image(encode_bmp(img)), img)
    assert np.array_equal(be.decode_image(encode_tiff([img])), img)
    m = sniff_image_meta(encode_bmp(img))
    assert (m["format"], m["width"], m["height"]) == ("bmp", 8, 6)
    m = sniff_image_meta(encode_tiff([img], packbits=True))
    assert (m["format"], m["width"], m["height"]) == ("tiff", 8, 6)


def test_tiff_lzw_roundtrips():
    rng = np.random.default_rng(4)
    big = rng.integers(0, 256, (40, 200, 3), np.uint8)     # crosses 9->10->11 bit widths
    huge = rng.integers(0, 256, (120, 300, 3), np.uint8)   # forces CLEAR table resets
    flat = np.full((20, 300), 9, np.uint8)
    for img, kw in [
        (big, dict(lzw=True)),
        (huge, dict(lzw=True)),
        (flat, dict(lzw=True)),
        (big, dict(lzw=True, predictor=True)),
    ]:
        got = decode_tiff(encode_tiff([img], **kw))[0]
        want = img if img.ndim == 3 else np.repeat(img[:, :, None], 3, axis=2)
        assert np.array_equal(got, want), kw


def test_tiff_lzw_predictor_compresses_gradients():
    grad = np.tile(np.arange(256, dtype=np.uint8), (30, 4))[:, :900]
    plain = encode_tiff([grad], lzw=True)
    pred = encode_tiff([grad], lzw=True, predictor=True)
    assert len(pred) < len(plain) / 3  # differencing turns ramps into runs
    assert np.array_equal(
        decode_tiff(pred)[0][:, :, 0], grad
    )
