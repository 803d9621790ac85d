"""Arithmetic-coded JPEG (SOF9, T.81 Annex D/F): cross-gate + robustness.

The entropy layer is lossless over quantized coefficients, so decoding an
arithmetic encoding must be BIT-IDENTICAL to decoding the Huffman encoding
of the same image at the same settings (both encoders share the
quantization front half). That equality is the primary gate — it exercises
every encoder/decoder branch pair against each other without needing a
foreign bitstream. Structural invariants of the from-memory Qe table are
pinned separately (see the provenance note in kernels/jpeg_arith.py).
"""

import numpy as np
import pytest

from yomitoku_ray.kernels.jpeg import JpegError, decode_jpeg, encode_jpeg
from yomitoku_ray.kernels.jpeg_arith import (
    FIXED_BIN,
    QE_TABLE,
    ArithDecoder,
    ArithEncoder,
    encode_jpeg_arith,
    encode_jpeg_arith_progressive,
)


def _assert_matches_huffman(px, quality, subsample=False, restart_interval=0):
    dh = decode_jpeg(encode_jpeg(px, quality, subsample=subsample))
    da = decode_jpeg(
        encode_jpeg_arith(
            px, quality, subsample=subsample, restart_interval=restart_interval
        )
    )
    assert dh.shape == da.shape
    assert np.array_equal(dh, da)


def test_gray_matches_huffman():
    rng = np.random.RandomState(11)
    for shape in [(8, 8), (16, 24), (33, 41), (1, 1)]:
        _assert_matches_huffman(rng.randint(0, 256, shape).astype(np.uint8), 90)


def test_color_444_matches_huffman():
    rng = np.random.RandomState(12)
    for q in (35, 60, 95):
        px = rng.randint(0, 256, (24, 17, 3)).astype(np.uint8)
        _assert_matches_huffman(px, q)


def test_color_420_matches_huffman():
    rng = np.random.RandomState(13)
    for shape in [(64, 64, 3), (21, 13, 3), (80, 56, 3)]:
        px = rng.randint(0, 256, shape).astype(np.uint8)
        _assert_matches_huffman(px, 50, subsample=True)


def test_restart_intervals_match_huffman():
    rng = np.random.RandomState(14)
    px = rng.randint(0, 256, (48, 48, 3)).astype(np.uint8)
    for rst in (1, 2, 3, 7):
        _assert_matches_huffman(px, 85, restart_interval=rst)


def test_smooth_image_eob_heavy():
    y, x = np.mgrid[0:100, 0:140]
    grad = ((x + y) % 256).astype(np.uint8)
    px = np.stack([grad, grad[::-1], (x % 256).astype(np.uint8)], axis=-1)
    _assert_matches_huffman(px, 80)


def test_progressive_spectral_matches_huffman():
    """SOF10 spectral-selection-only script (DC scan + per-component AC
    scan): decoded pixels identical to the baseline Huffman encoding."""
    rng = np.random.RandomState(21)
    for shape, sub in [((16, 16), False), ((24, 17, 3), False), ((64, 64, 3), True)]:
        px = rng.randint(0, 256, shape).astype(np.uint8)
        dh = decode_jpeg(encode_jpeg(px, 75, subsample=sub))
        da = decode_jpeg(encode_jpeg_arith_progressive(px, 75, subsample=sub))
        assert np.array_equal(dh, da), (shape, sub)


def test_progressive_successive_matches_huffman():
    """SOF10 with successive approximation (all four Annex G.2 scan
    kinds: DC first/refine, AC first/refine)."""
    rng = np.random.RandomState(22)
    for shape, sub in [((33, 41), False), ((48, 48, 3), False), ((80, 56, 3), True)]:
        px = rng.randint(0, 256, shape).astype(np.uint8)
        dh = decode_jpeg(encode_jpeg(px, 85, subsample=sub))
        da = decode_jpeg(
            encode_jpeg_arith_progressive(px, 85, subsample=sub, successive=True)
        )
        assert np.array_equal(dh, da), (shape, sub)


def test_progressive_restart_intervals_match_huffman():
    rng = np.random.RandomState(23)
    px = rng.randint(0, 256, (48, 48, 3)).astype(np.uint8)
    for rst, succ in [(2, False), (3, True)]:
        dh = decode_jpeg(encode_jpeg(px, 85))
        da = decode_jpeg(
            encode_jpeg_arith_progressive(
                px, 85, successive=succ, restart_interval=rst
            )
        )
        assert np.array_equal(dh, da), (rst, succ)


def test_progressive_truncation_keeps_decoded_scans():
    """Cutting after the first scans must still reconstruct (the Huffman
    progressive policy): a prefix decodes, never a crash."""
    rng = np.random.RandomState(24)
    px = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    blob = encode_jpeg_arith_progressive(px, 85, successive=True)
    full = decode_jpeg(blob)
    for cut in (len(blob) * 3 // 4, len(blob) // 2):
        try:
            out = decode_jpeg(blob[:cut] + b"\xff\xd9")
        except JpegError:
            continue  # cut inside the very first scan's headers
        assert out.shape == full.shape


def test_flat_field_exact():
    px = np.full((16, 24), 128, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_arith(px, 90))
    assert np.all(out == 128)


def test_stream_is_smaller_than_huffman_on_noise():
    rng = np.random.RandomState(15)
    px = rng.randint(0, 256, (64, 64)).astype(np.uint8)
    bh = encode_jpeg(px, 90)
    ba = encode_jpeg_arith(px, 90)
    assert len(ba) < len(bh)


def test_deterministic_bytes():
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert encode_jpeg_arith(px, 75) == encode_jpeg_arith(px, 75)


def test_truncated_stream_keeps_decoded_prefix_or_raises_jpeg_error():
    rng = np.random.RandomState(16)
    px = rng.randint(0, 256, (48, 48, 3)).astype(np.uint8)
    blob = encode_jpeg_arith(px, 85)
    full = decode_jpeg(blob)
    for cut in (len(blob) - 5, len(blob) // 2, len(blob) * 3 // 4):
        try:
            out = decode_jpeg(blob[:cut] + b"\xff\xd9")
        except JpegError:
            continue  # cut fell inside headers: hard error is correct
        assert out.shape == full.shape  # decoded prefix stands


def test_bitflip_fuzz_only_jpeg_error_escapes():
    rng = np.random.RandomState(17)
    px = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    blob = bytearray(encode_jpeg_arith(px, 85))
    for trial in range(120):
        mut = bytearray(blob)
        i = rng.randint(2, len(mut))
        mut[i] ^= 1 << rng.randint(0, 8)
        try:
            out = decode_jpeg(bytes(mut))
            assert out.dtype == np.uint8
        except JpegError:
            pass  # the only exception allowed out


def test_dac_conditioning_validation():
    px = np.full((8, 8), 99, np.uint8)
    blob = bytearray(encode_jpeg_arith(px, 90))
    i = blob.find(b"\xff\xcc")
    assert i >= 0
    # corrupt the AC Kx byte to 0 (spec range is 1..63)
    kx_pos = i + 4 + 3  # len(2) + (tb,val) DC pair + tc/tb byte of AC pair
    assert blob[kx_pos] == 5
    blob[kx_pos] = 0
    with pytest.raises(JpegError):
        decode_jpeg(bytes(blob))


def test_qm_coder_bit_roundtrip_fuzz():
    rng = np.random.RandomState(18)
    for trial in range(25):
        nbits = int(rng.randint(1, 2500))
        p = rng.choice([0.5, 0.9, 0.05, 0.98, 0.01])
        bits = (rng.rand(nbits) < p).astype(int).tolist()
        enc = ArithEncoder()
        st = bytearray(4)
        for i, b in enumerate(bits):
            enc.code(b, st, i % 4)
        data = enc.flush() + b"\xff\xd9"
        dec = ArithDecoder(data, 0)
        st2 = bytearray(4)
        out = [dec.decode(st2, i % 4) for i in range(nbits)]
        assert out == bits, (trial, p, nbits)


def test_qm_coder_handles_stuffed_ff_and_carry():
    """20k coin-flip bits against an adapting context reliably produce 0xFF
    output bytes (stuffing) and carries; the roundtrip must survive them."""
    rng = np.random.RandomState(0)
    bits = (rng.rand(20000) < 0.5).astype(int).tolist()
    enc = ArithEncoder()
    st = bytearray(2)
    for i, b in enumerate(bits):
        enc.code(b, st, i % 2)
    data = enc.flush() + b"\xff\xd9"
    assert b"\xff\x00" in data  # stuffing actually exercised
    dec = ArithDecoder(data, 0)
    st2 = bytearray(2)
    assert [dec.decode(st2, i % 2) for i in range(20000)] == bits


def test_synth_arith_rows_decode_in_strict_mode():
    """The images table's jpegarith arm must decode under the strict
    backend (no fake-pixel fallback) with the generator's analytic
    dimensions."""
    from yomitoku_ray.stages.multimodal import DecoderBackend
    from yomitoku_ray.synth.images import gen_image

    be = DecoderBackend(mode="strict")
    seen = {"jpegarith": 0, "jpegprogarith": 0}
    for i in range(200):
        row = gen_image(i)
        if row["kind"] not in seen:
            continue
        seen[row["kind"]] += 1
        px = be.decode_image(row["image"])
        rng = np.random.RandomState(0xC0FFEE ^ i)
        eh, ew = int(rng.randint(4, 24)), int(rng.randint(4, 24))
        assert px.shape[:2] == (eh, ew)
        assert px.dtype == np.uint8
    assert seen["jpegarith"] >= 5 and seen["jpegprogarith"] >= 3


def test_qe_table_structural_invariants():
    """Pins what IS verifiable in-sandbox about the from-memory Table D.3
    transcription (see the provenance note): probability ranges, transition
    targets in range, switch flags only where the MPS sense can flip
    (qe near 0.5), and the fixed bin's self-loop."""
    assert len(QE_TABLE) == 114  # 113 adaptive states + the fixed bin
    for idx, (qe, nlps, nmps, switch) in enumerate(QE_TABLE):
        assert 0 < qe <= 0x5B12, idx
        assert 0 <= nlps < len(QE_TABLE), idx
        assert 0 <= nmps < len(QE_TABLE), idx
        if switch:
            assert qe > 0x5000, idx  # only near-equiprobable states switch
    qe, nlps, nmps, switch = QE_TABLE[FIXED_BIN]
    assert (nlps, nmps, switch) == (FIXED_BIN, FIXED_BIN, 0)
    # NMPS chains must reach the most-skewed state (qe == 1) from state 0
    seen = set()
    i = 0
    while i not in seen:
        seen.add(i)
        i = QE_TABLE[i][2]
    assert any(QE_TABLE[j][0] == 0x0001 for j in seen)
