"""GIF decoder: round trips, real LZW (growth + KwKwK), interlace, errors."""

import struct

import numpy as np
import pytest

from yomitoku_ray.kernels.gif import (
    GifError,
    decode_gif,
    encode_gif,
    lzw_encode_degenerate,
)
from yomitoku_ray.stages.multimodal import DecoderBackend


def _px(h, w, colors, seed):
    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, size=(colors, 3), dtype=np.uint8)
    idx = rng.randint(0, colors, size=(h, w))
    return palette[idx]


def test_round_trip_exact():
    for colors in (2, 4, 17, 256):
        px = _px(9, 13, colors, seed=colors)
        assert (decode_gif(encode_gif(px)) == px).all()


def test_rejects_garbage():
    with pytest.raises(GifError):
        decode_gif(b"not a gif")
    with pytest.raises(GifError):
        decode_gif(encode_gif(_px(4, 4, 4, 0))[:20])


def _lzw_encode_full(indices, min_code):
    """A REAL LZW compressor (dictionary growth, variable code size) to
    exercise the decoder's growth and KwKwK paths."""
    clear = 1 << min_code
    end = clear + 1
    out_codes = []
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code + 1
    out_codes.append((clear, code_size))
    buf = ()
    for v in indices:
        cand = buf + (int(v),)
        if cand in table:
            buf = cand
            continue
        out_codes.append((table[buf], code_size))
        table[cand] = next_code
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        next_code += 1
        buf = (int(v),)
    if buf:
        out_codes.append((table[buf], code_size))
    out_codes.append((end, code_size))
    bitbuf = bytearray()
    acc = nbits = 0
    for code, size in out_codes:
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            bitbuf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        bitbuf.append(acc & 0xFF)
    out = [bytes([min_code])]
    for i in range(0, len(bitbuf), 255):
        c = bitbuf[i : i + 255]
        out.append(bytes([len(c)]) + bytes(c))
    out.append(b"\x00")
    return b"".join(out)


def _manual_gif(idx, palette, lzw_stream, iflags=0):
    h, w = idx.shape
    bits = 2
    while (1 << bits) < len(palette):
        bits += 1
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    return b"".join(
        [
            b"GIF89a",
            struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0),
            pal.tobytes(),
            b"\x21\xf9",  # graphic control extension (skipped by decoder)
            bytes([4, 0, 0, 0, 0, 0]),
            b"\x2c",
            struct.pack("<HHHHB", 0, 0, w, h, iflags),
            lzw_stream,
            b"\x3b",
        ]
    )


def test_real_lzw_with_growth():
    rng = np.random.RandomState(7)
    palette = rng.randint(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.randint(0, 4, size=(24, 32))
    # repeated runs force dictionary growth and KwKwK sequences
    idx[::2] = idx[0]
    stream = _lzw_encode_full(idx.ravel(), 2)
    out = decode_gif(_manual_gif(idx, palette, stream))
    assert (out == palette[idx]).all()


def test_interlaced_decode():
    palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.arange(32).reshape(8, 4) % 4
    # interlace storage order: rows 0; 4; 2,6; 1,3,5,7
    order = [0, 4, 2, 6, 1, 3, 5, 7]
    stored = idx[order].ravel()
    stream = lzw_encode_degenerate(stored, 2)
    out = decode_gif(_manual_gif(idx, palette, stream, iflags=0x40))
    assert (out == palette[idx]).all()


def test_backend_decodes_gif():
    px = _px(6, 6, 8, seed=3)
    got = DecoderBackend("strict").decode_image(encode_gif(px))
    assert (got == px).all()
