"""Pure-stdlib PNG codec (zlib + numpy): real pixel decode with no image
library.

Supports the full common web grammar: color types 0 (gray), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA); bit depths 8 everywhere, 1/2/4
for gray and palette, 16 for the non-palette types (converted to 8-bit
via the high byte, PIL-compatible); Adam7 interlace. Anything else
raises ``PngError`` — callers fall back to their configured stub policy.
The encoder (filter-0 rows + zlib, 8-bit) exists so tests can round-trip
real pixels: decode(encode(px)) == px exactly; interlaced and odd-depth
decode paths are pinned by hand-built files with analytic pixels.

This makes the multimodal image stages' decode step REAL for PNG payloads
(SURVEY S9 continuation) instead of a stub.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class PngError(ValueError):
    pass


_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(blob: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array (C = 1, 2, 3 or 4; palette
    expanded to RGB)."""
    if len(blob) < 8 or blob[:8] != _MAGIC:
        raise PngError("not a png")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = []
    plte = None
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise PngError("truncated chunk")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if width is None or not idat:
        raise PngError("missing IHDR/IDAT")
    depth_ok = (
        bit_depth == 8
        or (bit_depth == 16 and color_type in (0, 2, 4, 6))
        or (bit_depth in (1, 2, 4) and color_type in (0, 3))
    )
    if not depth_ok or interlace not in (0, 1) or color_type not in _CHANNELS:
        raise PngError(
            f"unsupported png (depth={bit_depth}, color={color_type}, interlace={interlace})"
        )
    ch = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise PngError(f"bad idat: {e}") from e
    bpp = max(1, (ch * bit_depth) // 8)  # filter byte lag

    def decode_sub(offset: int, w: int, h: int):
        """Unfilter + sample-expand one (sub-)image; returns ((h, w, ch)
        uint8, next offset)."""
        stride = (w * ch * bit_depth + 7) // 8
        need = (stride + 1) * h
        sub = raw[offset : offset + need]
        if len(sub) != need:
            raise PngError("bad raw length")
        arr = np.frombuffer(sub, dtype=np.uint8).reshape(h, stride + 1)
        out = _unfilter(arr, bpp, stride)
        if bit_depth == 8:
            samples = out
        elif bit_depth == 16:
            # PIL-compatible 8-bit conversion: big-endian high byte
            samples = out.reshape(h, stride // 2, 2)[:, :, 0]
        else:
            bits = np.unpackbits(out, axis=1)  # PNG packs MSB-first
            groups = bits[:, : (stride * 8 // bit_depth) * bit_depth].reshape(
                h, -1, bit_depth
            )
            weights = 1 << np.arange(bit_depth - 1, -1, -1)
            samples = (groups * weights).sum(axis=2).astype(np.uint8)[:, :w]
            if color_type == 0:  # gray: scale 2^d-1 -> 255 (exact multiples)
                samples = samples * np.uint8(255 // ((1 << bit_depth) - 1))
        return samples.reshape(h, w, ch), offset + need

    if interlace == 0:
        px, _ = decode_sub(0, width, height)
    else:  # Adam7
        px = np.zeros((height, width, ch), dtype=np.uint8)
        offset = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub, offset = decode_sub(offset, pw, ph)
            px[y0::dy, x0::dx] = sub
    if color_type == 3:
        if plte is None:
            raise PngError("palette png without PLTE")
        # PLTE may legally carry fewer than 256 entries; out-of-range pixel
        # indices must fail as PngError (per-row fallback policy), not a raw
        # IndexError that kills the whole batch.
        if px[:, :, 0].max(initial=0) >= len(plte):
            raise PngError("palette index out of range")
        px = plte[px[:, :, 0]]
    return px


# Adam7 pass grid: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter(arr: np.ndarray, bpp: int, stride: int) -> np.ndarray:
    """(h, stride+1) filtered scanlines -> (h, stride) uint8 bytes."""
    h = len(arr)
    filters = arr[:, 0]
    rows = arr[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    for y in range(h):
        f = filters[y]
        cur = rows[y]
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        if f == 0:
            out[y] = cur
        elif f == 1:  # sub: sequential along x, per-channel lag
            acc = cur.copy()
            for x in range(bpp, stride):
                acc[x] = (acc[x] + acc[x - bpp]) & 0xFF
            out[y] = acc
        elif f == 2:  # up
            out[y] = (cur + prev) & 0xFF
        elif f == 3:  # average
            acc = cur.copy()
            for x in range(stride):
                left = acc[x - bpp] if x >= bpp else 0
                acc[x] = (acc[x] + ((left + prev[x]) >> 1)) & 0xFF
            out[y] = acc
        elif f == 4:  # paeth
            acc = cur.copy()
            for x in range(stride):
                left = acc[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                acc[x] = (acc[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
            out[y] = acc
        else:
            raise PngError(f"bad filter {f}")
    return out.astype(np.uint8)


def encode_png(px: np.ndarray) -> bytes:
    """(H, W, C) uint8 -> PNG bytes (filter 0, one IDAT). C in {1, 2, 3, 4}."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def to_gray(px: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 -> (H, W) float64 luma in [0, 1] (Rec.601 weights)."""
    px = px.astype(np.float64)
    c = px.shape[2]
    if c == 1:
        g = px[:, :, 0]
    elif c == 2:  # gray + alpha
        g = px[:, :, 0]
    else:
        g = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    return g / 255.0


def resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via pure index maps (deterministic)."""
    h, w = px.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // max(out_h, 1), h - 1)
    xs = np.minimum((np.arange(out_w) * w) // max(out_w, 1), w - 1)
    return px[ys][:, xs]


def block_mean_embedding(px: np.ndarray, grid: int = 4) -> np.ndarray:
    """gray block means over a grid x grid tiling, scaled to [-1, 1] —
    a real, deterministic low-frequency image signature (grid²-dim)."""
    g = to_gray(px)
    h, w = g.shape
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    out = np.zeros(grid * grid, dtype=np.float32)
    for i in range(grid):
        for j in range(grid):
            cell = g[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
            out[i * grid + j] = 2.0 * float(cell.mean()) - 1.0
    return out
