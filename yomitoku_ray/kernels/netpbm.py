"""Netpbm codec (PBM/PGM/PPM, P1-P6): the last trivial arm of the
reference's image-load surface (``/root/reference/src/yomitoku/data/
functions.py:33-78`` loads whatever PIL/cv2 accepts, which includes
netpbm). Both ASCII (P1-P3) and binary (P4-P6) variants, 8-bit and
16-bit maxval (16-bit scaled down to 8 like cv2's IMREAD_COLOR path);
comments and arbitrary whitespace per the spec. Encoder writes binary
P5/P6 for self-contained round trips.
"""

from __future__ import annotations

import re

import numpy as np


class NetpbmError(ValueError):
    pass


_TOKEN = re.compile(rb"(?:\s|#[^\n]*\n)*(\S+)")


def _tokens(data: bytes, pos: int, n: int) -> tuple[list[int], int]:
    out = []
    while len(out) < n:
        m = _TOKEN.match(data, pos)
        if not m:
            raise NetpbmError("truncated header")
        tok = m.group(1)
        # a comment can open mid-token-scan; the regex consumed it already
        try:
            out.append(int(tok))
        except ValueError:
            raise NetpbmError(f"bad header token {tok[:16]!r}") from None
        pos = m.end()
    return out, pos


def decode_netpbm(blob: bytes) -> np.ndarray:
    """Netpbm bytes -> (H, W) uint8 gray (PBM/PGM) or (H, W, 3) RGB (PPM)."""
    if len(blob) < 2 or blob[0:1] != b"P" or blob[1:2] not in b"123456":
        raise NetpbmError("not a netpbm file")
    kind = int(blob[1:2])
    bitmap = kind in (1, 4)
    channels = 3 if kind in (3, 6) else 1
    (w, h), pos = _tokens(blob, 2, 2)
    if w <= 0 or h <= 0 or w > 1 << 16 or h > 1 << 16:
        raise NetpbmError("bad dimensions")
    maxval = 1
    if not bitmap:
        (maxval,), pos = _tokens(blob, pos, 1)
        if not 0 < maxval < 65536:
            raise NetpbmError(f"bad maxval {maxval}")
    n_vals = w * h * channels

    if kind in (1, 2, 3):  # ASCII
        if kind == 1:
            # P1 digits may abut: every 0/1 character is a sample
            body = re.sub(rb"#[^\n]*", b"", blob[pos:])
            digits = [c - 48 for c in body if c in (48, 49)]
            if len(digits) < n_vals:
                raise NetpbmError("truncated P1 data")
            vals = np.array(digits[:n_vals], dtype=np.uint16)
        else:
            vals_list, pos = _tokens(blob, pos, n_vals)
            vals = np.array(vals_list, dtype=np.uint32)
    else:  # binary: exactly ONE whitespace byte after the header
        pos += 1
        if kind == 4:
            stride = (w + 7) // 8
            raw = np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=pos)
            bits = np.unpackbits(raw.reshape(h, stride), axis=1)[:, :w]
            vals = bits.astype(np.uint16).reshape(-1)
        elif maxval < 256:
            if len(blob) < pos + n_vals:
                raise NetpbmError("truncated pixel data")
            vals = np.frombuffer(blob, dtype=np.uint8, count=n_vals, offset=pos).astype(
                np.uint32
            )
        else:
            if len(blob) < pos + 2 * n_vals:
                raise NetpbmError("truncated pixel data")
            vals = (
                np.frombuffer(blob, dtype=">u2", count=n_vals, offset=pos)
                .astype(np.uint32)
            )
    if not bitmap and vals.max(initial=0) > maxval:
        raise NetpbmError("sample exceeds maxval")
    if bitmap:
        px = ((1 - vals) * 255).astype(np.uint8)  # 1 = black per spec
    elif maxval == 255:
        px = vals.astype(np.uint8)
    else:
        px = ((vals * 255 + maxval // 2) // maxval).astype(np.uint8)
    px = px.reshape((h, w) if channels == 1 else (h, w, 3))
    return np.ascontiguousarray(px)


def encode_netpbm(px: np.ndarray) -> bytes:
    """(H, W) -> binary P5; (H, W, 3) -> binary P6."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        head = b"P5 %d %d 255\n" % (px.shape[1], px.shape[0])
    elif px.ndim == 3 and px.shape[2] == 3:
        head = b"P6 %d %d 255\n" % (px.shape[1], px.shape[0])
    else:
        raise NetpbmError("expected (H,W) gray or (H,W,3) RGB")
    return head + px.tobytes()
