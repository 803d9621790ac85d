"""BMP codec (pure numpy/struct): the uncompressed Windows DIB family.

Closes the bmp arm of the reference's image-load surface
(``/root/reference/src/yomitoku/data/functions.py:33-78`` loads bmp via
PIL). Decode supports BITMAPINFOHEADER-and-later headers with BI_RGB
8-bit-palette / 24-bit / 32-bit data, bottom-up and top-down; everything
else raises :class:`BmpError` (honest per-row error policy). The encoder
(24-bit bottom-up) exists so tests are self-contained.
"""

from __future__ import annotations

import struct

import numpy as np


class BmpError(ValueError):
    pass


def decode_bmp(blob: bytes) -> np.ndarray:
    """BMP bytes -> (H, W, 3) uint8 RGB pixels."""
    if blob[:2] != b"BM" or len(blob) < 54:
        raise BmpError("not a BMP")
    data_off = struct.unpack("<I", blob[10:14])[0]
    hdr_size = struct.unpack("<I", blob[14:18])[0]
    if hdr_size < 40:
        raise BmpError(f"unsupported DIB header size {hdr_size}")
    w, h_raw = struct.unpack("<ii", blob[18:26])
    planes, bpp = struct.unpack("<HH", blob[26:30])
    compression = struct.unpack("<I", blob[30:34])[0]
    clr_used = struct.unpack("<I", blob[46:50])[0]
    if planes != 1:
        raise BmpError("bad plane count")
    if compression not in (0, 3):  # BI_RGB; BI_BITFIELDS tolerated for 32bpp
        raise BmpError(f"unsupported compression {compression}")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0 or w > 1 << 16 or h > 1 << 16:
        raise BmpError("bad dimensions")

    if bpp == 8:
        n_pal = clr_used or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            blob, dtype=np.uint8, count=4 * n_pal, offset=pal_off
        ).reshape(n_pal, 4)[:, :3][:, ::-1]  # BGRA quads -> RGB
        stride = (w + 3) & ~3
        raw = np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=data_off)
        idx = raw.reshape(h, stride)[:, :w]
        px = pal[idx]
    elif bpp in (24, 32):
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        if len(blob) < data_off + stride * h:
            raise BmpError("truncated pixel data")
        raw = np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=data_off)
        rows = raw.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
        px = rows[:, :, :3][:, :, ::-1]  # BGR(A) -> RGB
    else:
        raise BmpError(f"unsupported bit depth {bpp}")
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px)


def encode_bmp(px: np.ndarray) -> bytes:
    """(H, W, 3) or (H, W) uint8 -> 24-bit bottom-up BI_RGB BMP bytes."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return hdr + dib + data
