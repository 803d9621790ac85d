"""Pure-stdlib GIF decoder (LZW + numpy) and a minimal encoder for tests.

Decodes the first frame of GIF87a/GIF89a — global/local color tables,
interlacing, 3-12-bit LZW with dictionary growth and clear codes. Animated
GIFs yield frame 0 (the feature-extraction convention). Malformed data
raises ``GifError``. The encoder writes a valid non-interlaced GIF87a using
the clear-code-per-pixel LZW degenerate form (correct, compact enough for
round-trip tests).

With ``kernels/png.py`` this makes PNG and GIF pixel decode REAL in the
multimodal stages; JPEG (DCT) remains the documented stub seam.
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    pass


def _color_table(data: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    end = pos + 3 * n
    if end > len(data):
        raise GifError("truncated color table")
    return np.frombuffer(data[pos:end], dtype=np.uint8).reshape(n, 3), end


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = []
    while True:
        if pos >= len(data):
            raise GifError("truncated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(out), pos
        out.append(data[pos : pos + n])
        if len(out[-1]) != n:
            raise GifError("truncated sub-block")
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # Bit reader: GIF packs codes LSB-first.
    bitpos = 0
    total_bits = 8 * len(data)

    def read_code(size: int) -> int:
        nonlocal bitpos
        if bitpos + size > total_bits:
            raise GifError("lzw stream exhausted")
        v = 0
        for i in range(size):
            byte = data[(bitpos + i) >> 3]
            if (byte >> ((bitpos + i) & 7)) & 1:
                v |= 1 << i
        bitpos += size
        return v

    def reset():
        return {i: (i,) for i in range(clear)}, min_code_size + 1

    table, code_size = reset()
    prev: tuple | None = None
    while n_out < n_pixels:
        code = read_code(code_size)
        if code == clear:
            table, code_size = reset()
            prev = None
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif prev is not None and code == len(table) + 2:
            entry = prev + (prev[0],)
        else:
            raise GifError("bad lzw code")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = entry[:take]
        n_out += take
        if prev is not None:
            table[len(table) + 2] = prev + (entry[0],)
            if len(table) + 2 >= (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if n_out < n_pixels:
        raise GifError("lzw underrun")
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(blob: bytes) -> np.ndarray:
    """GIF bytes -> first frame as (H, W, 3) uint8 RGB."""
    if len(blob) < 13 or blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a gif")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _color_table(blob, pos, 2 << (flags & 7))
    while pos < len(blob):
        marker = blob[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension: label + sub-blocks
            if pos >= len(blob):
                raise GifError("truncated extension")
            pos += 1
            _, pos = _sub_blocks(blob, pos)
            continue
        if marker != 0x2C:
            raise GifError(f"unexpected block 0x{marker:02x}")
        if pos + 9 > len(blob):
            raise GifError("truncated image descriptor")
        _l, _t, w, h, iflags = struct.unpack("<HHHHB", blob[pos : pos + 9])
        pos += 9
        table = gct
        if iflags & 0x80:
            table, pos = _color_table(blob, pos, 2 << (iflags & 7))
        if table is None:
            raise GifError("no color table")
        if pos >= len(blob):
            raise GifError("missing lzw header")
        min_code = blob[pos]
        pos += 1
        if not (2 <= min_code <= 11):
            raise GifError(f"bad lzw min code size {min_code}")
        data, pos = _sub_blocks(blob, pos)
        idx = _lzw_decode(data, min_code, w * h).reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            rows = []
            for start, step in _INTERLACE_PASSES:
                rows.extend(range(start, h, step))
            deinter = np.empty_like(idx)
            deinter[np.array(rows)] = idx
            idx = deinter
        if idx.max(initial=0) >= len(table):
            raise GifError("palette index out of range")
        return table[idx]
    raise GifError("no image data")


def encode_gif(px: np.ndarray) -> bytes:
    """(H, W, 3) uint8 with <= 256 distinct colors -> GIF87a bytes."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise GifError("too many colors for gif")
    bits = max(2, int(np.ceil(np.log2(max(2, len(palette))))))
    table_n = 1 << bits
    pal = np.zeros((table_n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette

    out = [b"GIF87a", struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0), pal.tobytes()]
    out.append(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0))
    out.append(lzw_encode_degenerate(idx, bits))
    out.append(b"\x3b")
    return b"".join(out)


def lzw_encode_degenerate(indices, min_code: int) -> bytes:
    """LZW stream (min-code byte + sub-blocks + terminator) with a clear
    code before every pixel: the dictionary never grows, the code size
    stays fixed — valid for any decoder, used by the encoder and by tests
    assembling custom (e.g. interlaced) images."""
    clear = 1 << min_code
    end = clear + 1
    code_size = min_code + 1
    bitbuf = bytearray()
    acc = 0
    nbits = 0

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            bitbuf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    for v in indices:
        put(int(v))
        put(clear)
    put(end)
    if nbits:
        bitbuf.append(acc & 0xFF)
    out = [bytes([min_code])]
    for i in range(0, len(bitbuf), 255):
        chunk = bitbuf[i : i + 255]
        out.append(bytes([len(chunk)]) + bytes(chunk))
    out.append(b"\x00")
    return b"".join(out)
