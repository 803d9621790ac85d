"""Baseline JPEG codec: analytic ground truth + decoder robustness.

Mirrors the PNG/GIF codec test strategy: pixels are pinned against values
computable by hand (flat fields are DC-only, so quantization is exact),
round trips bound the lossy error, and malformed/unsupported inputs must
raise JpegError (never a raw crash) so the per-row error policy holds.
"""

import numpy as np
import pytest

from yomitoku_ray.kernels.jpeg import JpegError, decode_jpeg, encode_jpeg


def test_flat_gray_exact():
    for val in (0, 64, 128, 200, 255):
        px = np.full((16, 24), val, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=90))
        assert out.shape == (16, 24)
        assert int(np.abs(out.astype(int) - val).max()) == 0, val


def test_flat_color_exact_444_and_420():
    px = np.zeros((20, 28, 3), np.uint8)
    px[:] = (180, 60, 30)
    for sub in (False, True):
        out = decode_jpeg(encode_jpeg(px, quality=95, subsample=sub))
        assert out.shape == px.shape
        assert int(np.abs(out.astype(int) - px.astype(int)).max()) == 0, sub


def test_gradient_tight_roundtrip():
    g = np.linspace(0, 255, 64).astype(np.uint8)
    px = np.stack(
        [np.tile(g, (40, 1)), np.tile(g[::-1], (40, 1)), np.full((40, 64), 77, np.uint8)],
        axis=-1,
    )
    out = decode_jpeg(encode_jpeg(px, quality=95))
    assert int(np.abs(out.astype(int) - px.astype(int)).max()) <= 2


def test_odd_sizes_and_subsample_shapes():
    rng = np.random.RandomState(3)
    for shape in [(1, 1), (7, 9), (8, 8), (21, 13), (33, 50)]:
        px = rng.randint(0, 256, (*shape, 3)).astype(np.uint8)
        for sub in (False, True):
            out = decode_jpeg(encode_jpeg(px, quality=90, subsample=sub))
            assert out.shape == px.shape, (shape, sub)


def test_block_dc_values_analytic():
    """Two flat 8x8 blocks side by side: each decodes to its own flat value
    (DC-only blocks, exact through quantization at any quality)."""
    px = np.zeros((8, 16), np.uint8)
    px[:, :8] = 40
    px[:, 8:] = 220
    out = decode_jpeg(encode_jpeg(px, quality=75))
    assert np.all(out[:, :8] == 40)
    assert np.all(out[:, 8:] == 220)


def test_deterministic_bytes():
    px = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    assert encode_jpeg(px, 90) == encode_jpeg(px, 90)
    assert encode_jpeg(px, 90, subsample=True) == encode_jpeg(px, 90, subsample=True)


def test_errors_are_jpeg_error():
    with pytest.raises(JpegError):
        decode_jpeg(b"not a jpeg at all")
    with pytest.raises(JpegError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no scan
    # SOF2 with a baseline-shaped scan (Ss=0, Se=63) is invalid per T.81
    blob = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    i = bytes(blob).find(b"\xff\xc0")
    blob[i + 1] = 0xC2
    with pytest.raises(JpegError):
        decode_jpeg(bytes(blob))
    # lossless SOF3 stays an explicit unsupported error (sequential SOF9
    # and progressive SOF10 arithmetic are supported — test_jpeg_arith.py)
    blob[i + 1] = 0xC3
    with pytest.raises(JpegError):
        decode_jpeg(bytes(blob))


def test_truncated_stream_keeps_decoded_prefix():
    px = np.full((32, 32), 100, dtype=np.uint8)
    blob = encode_jpeg(px, 90)
    cut = decode_jpeg(blob[: len(blob) - (len(blob) - blob.find(b"\xff\xda")) // 2])
    assert cut.shape == (32, 32)  # browser behavior: prefix decoded, rest DC-0


def test_restart_marker_path():
    """Hand-inject a DRI segment + restart markers via re-encode: the
    decoder must resync and reset DC predictors."""
    # Build a jpeg with restart markers by splicing: encode two halves and
    # verify our decoder handles a DRI=1 stream produced by rewriting the
    # entropy segment of a 2-MCU image.
    px = np.zeros((8, 16), np.uint8)
    px[:, :8] = 50
    px[:, 8:] = 200
    blob = bytearray(encode_jpeg(px, 90))
    sos_at = bytes(blob).find(b"\xff\xda")
    # insert DRI (interval 1) just before SOS
    dri = b"\xff\xdd\x00\x04\x00\x01"
    # re-encode entropy data per-MCU with restart in between
    from yomitoku_ray.kernels.jpeg import _BitWriter, _enc_table, _DC_LUMA, _AC_LUMA
    from yomitoku_ray.kernels.jpeg import _encode_plane_blocks, _scaled_qtable, _Q_LUMA, ZIGZAG
    from yomitoku_ray.kernels.jpeg import _encode_block

    q = _scaled_qtable(_Q_LUMA, 90)
    coef = _encode_plane_blocks(px.astype(np.float64))
    div = q[ZIGZAG].astype(np.float64)
    zz = np.round(coef / div[None, :]).astype(np.int64)
    dc_t, ac_t = _enc_table(*_DC_LUMA), _enc_table(*_AC_LUMA)

    parts = []
    for bi in range(2):
        bw = _BitWriter()
        _encode_block(bw, zz[bi], [0], 0, dc_t, ac_t)  # DC pred resets per interval
        bw.flush()
        parts.append(bytes(bw.buf))
    entropy = parts[0] + b"\xff\xd0" + parts[1]
    header = bytes(blob[:sos_at]) + dri
    sos_len = 2 + int.from_bytes(blob[sos_at + 2 : sos_at + 4], "big")
    sos_seg = bytes(blob[sos_at : sos_at + sos_len])
    out = decode_jpeg(header + sos_seg + entropy + b"\xff\xd9")
    assert np.all(out[:, :8] == 50)
    assert np.all(out[:, 8:] == 200)


def test_backend_decodes_jpeg():
    from yomitoku_ray.stages.multimodal import DecoderBackend

    px = np.zeros((12, 12, 3), np.uint8)
    px[:] = (10, 250, 120)
    out = DecoderBackend(mode="strict").decode_image(encode_jpeg(px, 95))
    assert out.shape == (12, 12, 3)
    assert int(np.abs(out.astype(int) - px.astype(int)).max()) <= 1


class TestProgressive:
    """SOF2 decode: spectral selection + successive approximation must
    reproduce the baseline encoding's pixels exactly (same coefficients,
    reordered across scans)."""

    def _check(self, img, sub, succ, q=90):
        from yomitoku_ray.kernels.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        blob = encode_jpeg_progressive(img, quality=q, subsample=sub, successive=succ)
        assert blob[:2] == b"\xff\xd8" and b"\xff\xc2" in blob[:200]  # SOF2
        assert np.array_equal(decode_jpeg(blob), base)

    def test_grayscale_spectral(self):
        rng = np.random.default_rng(10)
        self._check(rng.integers(0, 256, (24, 40), dtype=np.uint8), False, False)

    def test_grayscale_successive(self):
        rng = np.random.default_rng(11)
        self._check(rng.integers(0, 256, (24, 40), dtype=np.uint8), False, True)

    def test_color_444_successive(self):
        rng = np.random.default_rng(12)
        self._check(rng.integers(0, 256, (40, 56, 3), dtype=np.uint8), False, True)

    def test_color_420_successive_odd_dims(self):
        rng = np.random.default_rng(13)
        self._check(rng.integers(0, 256, (37, 29, 3), dtype=np.uint8), True, True, q=70)

    def test_color_420_spectral(self):
        rng = np.random.default_rng(14)
        self._check(rng.integers(0, 256, (32, 48, 3), dtype=np.uint8), True, False)

    def test_smooth_image_quality(self):
        # low-frequency content: progressive decode stays visually exact
        x = np.linspace(0, 255, 64, dtype=np.uint8)
        img = np.repeat(x[None, :], 48, axis=0)
        self._check(np.stack([img, img[:, ::-1], img], axis=-1), False, True)

    def test_strict_backend_decodes_progressive(self):
        from yomitoku_ray.kernels.jpeg import encode_jpeg_progressive
        from yomitoku_ray.stages.multimodal import DecoderBackend

        rng = np.random.default_rng(15)
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        blob = encode_jpeg_progressive(img, successive=True)
        px = DecoderBackend(mode="strict").decode_image(blob)
        assert px.shape == (16, 16, 3)
