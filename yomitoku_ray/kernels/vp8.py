"""VP8 intra-frame (key frame) codec — the lossy half of WebP.

Decoder per RFC 6386: boolean entropy decoder (§7), frame/key-frame header
(§9), intra mode parsing (§11), DCT token decoding with per-band contexts
(§13), dequantization (§14.1), inverse WHT/DCT (§14.3-14.4), all ten 4x4
B-modes plus the four 16x16 / chroma predictors (§12), and the full normal
+ simple in-loop deblocking filter (§15). Inter frames raise — a still
lossy WebP is exactly one key frame (reference load surface:
``/root/reference/src/yomitoku/data/functions.py:33-78`` accepts any
PIL-decodable image, which includes lossy WebP).

The paired encoder emits spec-layout bitstreams (same headers, trees and
tables) with a fixed mode policy (16x16 DC/V/H/TM or all-B_DC 4x4),
forward DCT/WHT matched to the normative inverses, and drift-free
reconstruction (the encoder reconstructs through the decoder's own
integer transforms). Round trips are therefore exact at the bitstream
level and pixel-pinned in tests.

See ``vp8_tables.py`` for the table-provenance caveat: two large
probability tables are documented placeholders, so FOREIGN lossy webp
bitstreams (e.g. libwebp output) would misparse until the canonical
constants are dropped in; this repo's own encoder/decoder pair — the only
source of lossy webp in this offline sandbox — is exact.

Plane note: VP8 is YUV 4:2:0. ``decode_vp8`` returns the exact decoded
planes; the RGB conversion on top (BT.601 studio range, nearest-neighbor
chroma upsample) is NOT normative in VP8 and is documented here as this
repo's deterministic choice, inverse-paired with the encoder's RGB input
path.
"""

from __future__ import annotations

import struct

import numpy as np

from . import vp8_tables as T


class Vp8Error(ValueError):
    """Malformed or unsupported VP8 bitstream."""


# ---------------------------------------------------------------------------
# Boolean entropy coder (RFC 6386 §7)
# ---------------------------------------------------------------------------


class BoolDecoder:
    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def read_bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        # renormalize (shift in zeros past end-of-data, per spec)
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                    self.pos += 1
        return ret

    def read_literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bool(128)
        return v

    def read_signed(self, n: int) -> int:
        v = self.read_literal(n)
        return -v if self.read_bool(128) else v

    def read_tree(self, tree, probs, start: int = 0) -> int:
        i = tree[start + self.read_bool(probs[start >> 1])]
        while i > 0:
            i = tree[i + self.read_bool(probs[i >> 1])]
        return T.leaf_value(i)


class BoolEncoder:
    """Carry-exact mirror of :class:`BoolDecoder` (round-trip fuzz-pinned).

    ``low`` is kept as an unbounded int so carries propagate through
    Python's big-int addition instead of the RFC's add_one_to_output walk;
    the flush emits the accumulated interval base padded to whole bytes,
    which the decoder reads back bit-exactly (it zero-fills past EOF).
    """

    __slots__ = ("low", "range", "shift")

    def __init__(self):
        self.low = 0
        self.range = 255
        self.shift = 0  # renormalization shifts performed so far

    def write_bool(self, prob: int, value: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if value:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.low <<= 1
            self.range <<= 1
            self.shift += 1

    def write_literal(self, n: int, v: int) -> None:
        for i in range(n - 1, -1, -1):
            self.write_bool(128, (v >> i) & 1)

    def write_signed(self, n: int, v: int) -> None:
        self.write_literal(n, abs(v))
        self.write_bool(128, 1 if v < 0 else 0)

    def write_tree(self, tree, probs, value: int, start: int = 0) -> None:
        # walk the tree once to find the leaf path, then emit the bits
        path = []
        i = start
        while True:
            found = None
            for b in (0, 1):
                j = tree[i + b]
                if j <= 0 and T.leaf_value(j) == value:
                    found = b
                    break
            if found is not None:
                path.append((i, found))
                break
            # descend the branch whose subtree contains the value
            b = self._branch_containing(tree, i, value)
            path.append((i, b))
            i = tree[i + b]
        for i, b in path:
            self.write_bool(probs[i >> 1], b)

    def _branch_containing(self, tree, i, value) -> int:
        def contains(j) -> bool:
            if j <= 0:
                return T.leaf_value(j) == value
            return contains(tree[j]) or contains(tree[j + 1])

        if contains(tree[i]):
            return 0
        if contains(tree[i + 1]):
            return 1
        raise Vp8Error(f"value {value} not in tree")

    def get_bytes(self) -> bytes:
        # Invariant: low + range <= 2^(shift + 8) (the interval doubles per
        # renorm shift and only ever shrinks within a write). The decoder
        # seeds a 16-bit window and consumes one bit per shift, i.e. it
        # reads the first (shift + 16) stream bits; any codeword V with
        # low*256 <= V < (low + range)*256 decodes back exactly, so emit
        # V = low << 8 in (shift + 16) bits, zero-padded to whole bytes.
        total_bits = self.shift + 16
        pad = (-total_bits) % 8
        v = self.low << (8 + pad)
        n_bytes = (total_bits + pad) // 8
        return v.to_bytes(n_bytes, "big") if n_bytes else b"\x00\x00"


# ---------------------------------------------------------------------------
# Inverse transforms (RFC 6386 §14.3-14.4) — normative integer math
# ---------------------------------------------------------------------------

_COS = 20091  # (cos(pi/8)*sqrt(2) - 1) << 16
_SIN = 35468  # (sin(pi/8)*sqrt(2)) << 16


def iwht4x4(coeffs):
    """Inverse Walsh-Hadamard for the Y2 (DC) block; returns 16 ints."""
    ip = list(coeffs)
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


def idct4x4(coeffs):
    """Normative inverse DCT; 16 ints in natural (row-major) order."""
    ip = list(coeffs)
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * _SIN) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _COS) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _COS) >> 16)
        t2 = (ip[12 + i] * _SIN) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * _SIN) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * _COS) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * _COS) >> 16)
        t2 = (tmp[r + 3] * _SIN) >> 16
        d1 = t1 + t2
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


# Encoder-side forward transforms (NON-normative; matched to the inverses
# above so that inverse(forward(x)) == x for small residuals pre-quant —
# the libvpx fdct/walsh shape).


def fdct4x4(block):
    ip = [int(v) for v in block]
    tmp = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = (ip[r] + ip[r + 3]) * 8
        b1 = (ip[r + 1] + ip[r + 2]) * 8
        c1 = (ip[r + 1] - ip[r + 2]) * 8
        d1 = (ip[r] - ip[r + 3]) * 8
        tmp[r] = a1 + b1
        tmp[r + 2] = a1 - b1
        tmp[r + 1] = (c1 * 2217 + d1 * 5352 + 14500) >> 12
        tmp[r + 3] = (d1 * 2217 - c1 * 5352 + 7500) >> 12
    out = [0] * 16
    for i in range(4):
        a1 = tmp[i] + tmp[12 + i]
        b1 = tmp[4 + i] + tmp[8 + i]
        c1 = tmp[4 + i] - tmp[8 + i]
        d1 = tmp[i] - tmp[12 + i]
        out[i] = (a1 + b1 + 7) >> 4
        out[8 + i] = (a1 - b1 + 7) >> 4
        out[4 + i] = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (1 if d1 != 0 else 0)
        out[12 + i] = (d1 * 2217 - c1 * 5352 + 51000) >> 16
    return out


def fwht4x4(block):
    ip = [int(v) for v in block]
    tmp = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = (ip[r] + ip[r + 2]) * 4
        d1 = (ip[r + 1] + ip[r + 3]) * 4
        c1 = (ip[r + 1] - ip[r + 3]) * 4
        b1 = (ip[r] - ip[r + 2]) * 4
        tmp[r] = a1 + d1 + (1 if a1 != 0 else 0)
        tmp[r + 1] = b1 + c1
        tmp[r + 2] = b1 - c1
        tmp[r + 3] = a1 - d1
    out = [0] * 16
    for i in range(4):
        a1 = tmp[i] + tmp[8 + i]
        d1 = tmp[4 + i] + tmp[12 + i]
        c1 = tmp[4 + i] - tmp[12 + i]
        b1 = tmp[i] - tmp[8 + i]
        a2 = a1 + d1
        b2 = b1 + c1
        c2 = b1 - c1
        d2 = a1 - d1
        a2 += 1 if a2 < 0 else 0
        b2 += 1 if b2 < 0 else 0
        c2 += 1 if c2 < 0 else 0
        d2 += 1 if d2 < 0 else 0
        out[i] = (a2 + 3) >> 3
        out[4 + i] = (b2 + 3) >> 3
        out[8 + i] = (c2 + 3) >> 3
        out[12 + i] = (d2 + 3) >> 3
    return out


# ---------------------------------------------------------------------------
# Dequantization (RFC 6386 §14.1)
# ---------------------------------------------------------------------------


def _clamp_q(x: int) -> int:
    return 0 if x < 0 else (127 if x > 127 else x)


def quant_factors(qi: int, deltas) -> dict:
    """(dc, ac) factor pairs per plane; deltas = dict of the 5 header deltas."""
    y1dc = T.DC_QLOOKUP[_clamp_q(qi + deltas.get("y1dc", 0))]
    y1ac = T.AC_QLOOKUP[_clamp_q(qi)]
    y2dc = T.DC_QLOOKUP[_clamp_q(qi + deltas.get("y2dc", 0))] * 2
    y2ac = T.AC_QLOOKUP[_clamp_q(qi + deltas.get("y2ac", 0))] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = T.DC_QLOOKUP[_clamp_q(qi + deltas.get("uvdc", 0))]
    if uvdc > 132:
        uvdc = 132
    uvac = T.AC_QLOOKUP[_clamp_q(qi + deltas.get("uvac", 0))]
    return {"y1": (y1dc, y1ac), "y2": (y2dc, y2ac), "uv": (uvdc, uvac)}


# ---------------------------------------------------------------------------
# Intra predictors (RFC 6386 §12.2-12.3)
# ---------------------------------------------------------------------------


def _clamp255(a: np.ndarray) -> np.ndarray:
    return np.clip(a, 0, 255)


def pred_dc(above, left, have_above, have_left, size):
    """DC predictor, 16x16 or 8x8 (RFC 6386 §12.2): both sides ->
    (sum + size) >> log2(2*size); one side -> (sum + size/2) >>
    log2(size); neither -> 128."""
    if have_above and have_left:
        s = int(above[:size].sum()) + int(left[:size].sum())
        shift = 5 if size == 16 else 4
        v = (s + size) >> shift
    elif have_above:
        s = int(above[:size].sum())
        v = (s + (size >> 1)) >> (4 if size == 16 else 3)
    elif have_left:
        s = int(left[:size].sum())
        v = (s + (size >> 1)) >> (4 if size == 16 else 3)
    else:
        v = 128
    return np.full((size, size), v, dtype=np.int32)


def pred_tm(above, left, corner, size):
    a = above[:size].astype(np.int32)[None, :]
    l = left[:size].astype(np.int32)[:, None]
    return _clamp255(a + l - int(corner))


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def pred_b(mode, A, L, P):
    """4x4 subblock predictor. A: 8 above pixels (incl. above-right),
    L: 4 left pixels, P: above-left corner. All Python ints."""
    out = np.zeros((4, 4), dtype=np.int32)
    if mode == T.B_DC_PRED:
        out[:] = (sum(A[:4]) + sum(L) + 4) >> 3
    elif mode == T.B_TM_PRED:
        for r in range(4):
            for c in range(4):
                v = L[r] + A[c] - P
                out[r, c] = 0 if v < 0 else (255 if v > 255 else v)
    elif mode == T.B_VE_PRED:
        row = [
            _avg3(P, A[0], A[1]),
            _avg3(A[0], A[1], A[2]),
            _avg3(A[1], A[2], A[3]),
            _avg3(A[2], A[3], A[4]),
        ]
        out[:] = np.array(row)[None, :]
    elif mode == T.B_HE_PRED:
        col = [
            _avg3(P, L[0], L[1]),
            _avg3(L[0], L[1], L[2]),
            _avg3(L[1], L[2], L[3]),
            _avg3(L[2], L[3], L[3]),
        ]
        out[:] = np.array(col)[:, None]
    elif mode == T.B_LD_PRED:
        # down-left diagonal over the 8 above pixels
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    out[r, c] = _avg3(A[i], A[i + 1], A[i + 2])
                else:
                    out[r, c] = _avg3(A[6], A[7], A[7])
    elif mode == T.B_RD_PRED:
        # down-right: edge walk E[0..8] = L3..L0, P, A0..A3; diag d = c - r
        E = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                d = c - r
                out[r, c] = _avg3(E[d + 3], E[d + 4], E[d + 5])
    elif mode == T.B_VR_PRED:
        # vertical-right: same edge walk; d = 2c - r
        E = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                d = 2 * c - r
                if d >= 0 and d % 2 == 0:
                    out[r, c] = _avg2(E[4 + (d >> 1)], E[5 + (d >> 1)])
                elif d >= 1:
                    out[r, c] = _avg3(E[4 + (d >> 1)], E[5 + (d >> 1)], E[6 + (d >> 1)])
                elif d == -1:
                    out[r, c] = _avg3(E[3], E[4], E[5])
                elif d == -2:
                    out[r, c] = _avg3(E[2], E[3], E[4])
                else:  # d == -3
                    out[r, c] = _avg3(E[1], E[2], E[3])
    elif mode == T.B_VL_PRED:
        # vertical-left over the 8 above pixels; d = 2c + r, two specials
        for r in range(4):
            for c in range(4):
                d = 2 * c + r
                if d % 2 == 0:
                    out[r, c] = _avg2(A[d >> 1], A[(d >> 1) + 1])
                else:
                    out[r, c] = _avg3(A[d >> 1], A[(d >> 1) + 1], A[(d >> 1) + 2])
        out[2, 3] = _avg3(A[4], A[5], A[6])
        out[3, 3] = _avg3(A[5], A[6], A[7])
    elif mode == T.B_HD_PRED:
        # horizontal-down: E[0..7] = L3..L0, P, A0..A2; d = 2r - c
        E = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2]]
        for r in range(4):
            for c in range(4):
                d = 2 * r - c
                if d >= 0 and d % 2 == 0:
                    out[r, c] = _avg2(E[3 - (d >> 1)], E[4 - (d >> 1)])
                elif d >= 1:
                    k = (d + 1) >> 1
                    out[r, c] = _avg3(E[3 - k], E[4 - k], E[5 - k])
                elif d == -1:
                    out[r, c] = _avg3(E[3], E[4], E[5])
                elif d == -2:
                    out[r, c] = _avg3(E[4], E[5], E[6])
                else:  # d == -3
                    out[r, c] = _avg3(E[5], E[6], E[7])
    elif mode == T.B_HU_PRED:
        for r in range(4):
            for c in range(4):
                d = 2 * r + c
                if d in (0, 2, 4):
                    out[r, c] = _avg2(L[d >> 1], L[(d >> 1) + 1])
                elif d in (1, 3):
                    out[r, c] = _avg3(L[d >> 1], L[(d >> 1) + 1], L[(d >> 1) + 2])
                elif d == 5:
                    out[r, c] = _avg3(L[2], L[3], L[3])
                else:  # d >= 6
                    out[r, c] = L[3]
    else:
        raise Vp8Error(f"bad b mode {mode}")
    return out


# ---------------------------------------------------------------------------
# Loop filter (RFC 6386 §15) — vectorized along each edge
# ---------------------------------------------------------------------------


def _c(a):
    return np.clip(a, -128, 127)


def _filter_mask(I, E, p3, p2, p1, p0, q0, q1, q2, q3):
    return (
        (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= E)
        & (np.abs(p3 - p2) <= I)
        & (np.abs(p2 - p1) <= I)
        & (np.abs(p1 - p0) <= I)
        & (np.abs(q1 - q0) <= I)
        & (np.abs(q2 - q1) <= I)
        & (np.abs(q3 - q2) <= I)
    )


def _hev_mask(thresh, p1, p0, q0, q1):
    return (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)


def _subblock_filter(hev_t, I, E, px):
    """px: (n, 8) signed int32 [p3..p0, q0..q3]; filtered in place."""
    p3, p2, p1, p0, q0, q1, q2, q3 = (px[:, i] for i in range(8))
    mask = _filter_mask(I, E, p3, p2, p1, p0, q0, q1, q2, q3)
    hev = _hev_mask(hev_t, p1, p0, q0, q1)
    a = _c(np.where(hev, _c(p1 - q1), 0) + 3 * (q0 - p0))
    F = _c(a + 4) >> 3
    Eadj = _c(a + 3) >> 3
    nq0 = _c(q0 - F)
    np0 = _c(p0 + Eadj)
    a2 = (F + 1) >> 1
    nq1 = _c(q1 - np.where(hev, 0, a2))
    np1 = _c(p1 + np.where(hev, 0, a2))
    px[:, 3] = np.where(mask, np0, p0)
    px[:, 4] = np.where(mask, nq0, q0)
    px[:, 2] = np.where(mask, np1, p1)
    px[:, 5] = np.where(mask, nq1, q1)


def _mb_filter(hev_t, I, E, px):
    p3, p2, p1, p0, q0, q1, q2, q3 = (px[:, i] for i in range(8))
    mask = _filter_mask(I, E, p3, p2, p1, p0, q0, q1, q2, q3)
    hev = _hev_mask(hev_t, p1, p0, q0, q1)
    # hev branch: common_adjust with outer taps
    a = _c(_c(p1 - q1) + 3 * (q0 - p0))
    F = _c(a + 4) >> 3
    Eadj = _c(a + 3) >> 3
    hq0 = _c(q0 - F)
    hp0 = _c(p0 + Eadj)
    # non-hev branch: 3-tap wide filter
    w = _c(_c(p1 - q1) + 3 * (q0 - p0))
    a27 = _c((27 * w + 63) >> 7)
    a18 = _c((18 * w + 63) >> 7)
    a9 = _c((9 * w + 63) >> 7)
    wq0 = _c(q0 - a27)
    wp0 = _c(p0 + a27)
    wq1 = _c(q1 - a18)
    wp1 = _c(p1 + a18)
    wq2 = _c(q2 - a9)
    wp2 = _c(p2 + a9)
    px[:, 3] = np.where(mask, np.where(hev, hp0, wp0), p0)
    px[:, 4] = np.where(mask, np.where(hev, hq0, wq0), q0)
    px[:, 2] = np.where(mask, np.where(hev, p1, wp1), p1)
    px[:, 5] = np.where(mask, np.where(hev, q1, wq1), q1)
    px[:, 1] = np.where(mask, np.where(hev, p2, wp2), p2)
    px[:, 6] = np.where(mask, np.where(hev, q2, wq2), q2)


def _simple_filter(E, px):
    """Simple filter: px (n, 4) = [p1, p0, q0, q1]."""
    p1, p0, q0, q1 = (px[:, i] for i in range(4))
    mask = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= E
    a = _c(_c(p1 - q1) + 3 * (q0 - p0))
    F = _c(a + 4) >> 3
    Eadj = _c(a + 3) >> 3
    px[:, 2] = np.where(mask, _c(q0 - F), q0)
    px[:, 1] = np.where(mask, _c(p0 + Eadj), p0)


def _gather_v(plane, y0, n, x):
    """(n, 8) signed window across vertical edge at column x."""
    return plane[y0 : y0 + n, x - 4 : x + 4].astype(np.int32) - 128


def _scatter_v(plane, y0, n, x, px):
    plane[y0 : y0 + n, x - 4 : x + 4] = (px + 128).astype(np.uint8)


def _gather_h(plane, x0, n, y):
    return plane[y - 4 : y + 4, x0 : x0 + n].T.astype(np.int32) - 128


def _scatter_h(plane, x0, n, y, px):
    plane[y - 4 : y + 4, x0 : x0 + n] = (px.T + 128).astype(np.uint8)


def _loop_filter_frame(planes, mbs, hdr):
    """Apply the in-loop deblocking filter in MB raster order (§15.2)."""
    level0 = hdr["filter_level"]
    sharpness = hdr["sharpness"]
    simple = hdr["filter_type"] == 1
    if level0 == 0:
        return
    y, u, v = planes
    mb_rows, mb_cols = hdr["mb_rows"], hdr["mb_cols"]
    for r in range(mb_rows):
        for c in range(mb_cols):
            mb = mbs[r * mb_cols + c]
            level = level0
            seg = hdr["segment_lf"]
            if seg is not None:
                sv = seg[mb["segment"]]
                level = sv if hdr["segment_abs"] else level + sv
            if hdr["lf_deltas"] is not None:
                ref_d, mode_d = hdr["lf_deltas"]
                level += ref_d[0]  # intra frame
                if mb["ymode"] == T.B_PRED:
                    level += mode_d[0]
            level = 0 if level < 0 else (63 if level > 63 else level)
            if level == 0:
                continue
            interior = level
            if sharpness:
                interior >>= 2 if sharpness > 4 else 1
                if interior > 9 - sharpness:
                    interior = 9 - sharpness
            if interior < 1:
                interior = 1
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
            mb_lim = ((level + 2) * 2) + interior
            sub_lim = (level * 2) + interior
            interior_edges = mb["has_coeffs"] or mb["ymode"] == T.B_PRED
            yx, yy = c * 16, r * 16
            cx, cy = c * 8, r * 8
            if simple:
                if c > 0:
                    px = y[yy : yy + 16, yx - 2 : yx + 2].astype(np.int32) - 128
                    _simple_filter(mb_lim, px)
                    y[yy : yy + 16, yx - 2 : yx + 2] = (px + 128).astype(np.uint8)
                if interior_edges:
                    for dx in (4, 8, 12):
                        px = y[yy : yy + 16, yx + dx - 2 : yx + dx + 2].astype(np.int32) - 128
                        _simple_filter(sub_lim, px)
                        y[yy : yy + 16, yx + dx - 2 : yx + dx + 2] = (px + 128).astype(np.uint8)
                if r > 0:
                    px = y[yy - 2 : yy + 2, yx : yx + 16].T.astype(np.int32) - 128
                    _simple_filter(mb_lim, px)
                    y[yy - 2 : yy + 2, yx : yx + 16] = (px.T + 128).astype(np.uint8)
                if interior_edges:
                    for dy in (4, 8, 12):
                        px = y[yy + dy - 2 : yy + dy + 2, yx : yx + 16].T.astype(np.int32) - 128
                        _simple_filter(sub_lim, px)
                        y[yy + dy - 2 : yy + dy + 2, yx : yx + 16] = (px.T + 128).astype(np.uint8)
                continue
            # normal filter: Y + chroma
            if c > 0:
                px = _gather_v(y, yy, 16, yx)
                _mb_filter(hev_t, interior, mb_lim, px)
                _scatter_v(y, yy, 16, yx, px)
                for pl, px0 in ((u, cx), (v, cx)):
                    pw = _gather_v(pl, cy, 8, px0)
                    _mb_filter(hev_t, interior, mb_lim, pw)
                    _scatter_v(pl, cy, 8, px0, pw)
            if interior_edges:
                for dx in (4, 8, 12):
                    px = _gather_v(y, yy, 16, yx + dx)
                    _subblock_filter(hev_t, interior, sub_lim, px)
                    _scatter_v(y, yy, 16, yx + dx, px)
                pw = _gather_v(u, cy, 8, cx + 4)
                _subblock_filter(hev_t, interior, sub_lim, pw)
                _scatter_v(u, cy, 8, cx + 4, pw)
                pw = _gather_v(v, cy, 8, cx + 4)
                _subblock_filter(hev_t, interior, sub_lim, pw)
                _scatter_v(v, cy, 8, cx + 4, pw)
            if r > 0:
                px = _gather_h(y, yx, 16, yy)
                _mb_filter(hev_t, interior, mb_lim, px)
                _scatter_h(y, yx, 16, yy, px)
                for pl in (u, v):
                    pw = _gather_h(pl, cx, 8, cy)
                    _mb_filter(hev_t, interior, mb_lim, pw)
                    _scatter_h(pl, cx, 8, cy, pw)
            if interior_edges:
                for dy in (4, 8, 12):
                    px = _gather_h(y, yx, 16, yy + dy)
                    _subblock_filter(hev_t, interior, sub_lim, px)
                    _scatter_h(y, yx, 16, yy + dy, px)
                pw = _gather_h(u, cx, 8, cy + 4)
                _subblock_filter(hev_t, interior, sub_lim, pw)
                _scatter_h(u, cx, 8, cy + 4, pw)
                pw = _gather_h(v, cx, 8, cy + 4)
                _subblock_filter(hev_t, interior, sub_lim, pw)
                _scatter_h(v, cx, 8, cy + 4, pw)


# ---------------------------------------------------------------------------
# Header + mode + token decoding (RFC 6386 §9, §11, §13)
# ---------------------------------------------------------------------------


def _parse_header(data: bytes, max_pixels: int):
    if len(data) < 10:
        raise Vp8Error("VP8 chunk too short")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    key_frame = (tag & 1) == 0
    part1_size = tag >> 5
    if not key_frame:
        raise Vp8Error("inter (non-key) VP8 frames are out of scope")
    if data[3:6] != b"\x9d\x01\x2a":
        raise Vp8Error("bad VP8 keyframe start code")
    width = (data[6] | (data[7] << 8)) & 0x3FFF
    height = (data[8] | (data[9] << 8)) & 0x3FFF
    if width == 0 or height == 0:
        raise Vp8Error("zero VP8 dimensions")
    if width * height > max_pixels:
        raise Vp8Error(f"VP8 dims {width}x{height} exceed the decode cap")
    if part1_size == 0:
        raise Vp8Error("empty first partition")
    if 10 + part1_size > len(data):
        raise Vp8Error("first partition overruns chunk")
    bd = BoolDecoder(data[10 : 10 + part1_size])

    hdr: dict = {"width": width, "height": height}
    hdr["color_space"] = bd.read_literal(1)
    hdr["clamping"] = bd.read_literal(1)

    # segmentation (§9.3)
    seg_enabled = bd.read_literal(1)
    hdr["segment_q"] = None
    hdr["segment_lf"] = None
    hdr["segment_abs"] = False
    hdr["segment_tree_probs"] = None
    update_map = 0
    if seg_enabled:
        update_map = bd.read_literal(1)
        update_data = bd.read_literal(1)
        if update_data:
            hdr["segment_abs"] = bool(bd.read_literal(1))
            q = [0] * 4
            for i in range(4):
                if bd.read_bool(128):
                    q[i] = bd.read_signed(7)
            lf = [0] * 4
            for i in range(4):
                if bd.read_bool(128):
                    lf[i] = bd.read_signed(6)
            hdr["segment_q"] = q
            hdr["segment_lf"] = lf
        if update_map:
            probs = [255, 255, 255]
            for i in range(3):
                if bd.read_bool(128):
                    probs[i] = bd.read_literal(8)
            hdr["segment_tree_probs"] = probs
    hdr["update_map"] = update_map

    # loop filter (§9.4)
    hdr["filter_type"] = bd.read_literal(1)
    hdr["filter_level"] = bd.read_literal(6)
    hdr["sharpness"] = bd.read_literal(3)
    hdr["lf_deltas"] = None
    if bd.read_literal(1):  # lf delta enabled
        ref_d, mode_d = [0] * 4, [0] * 4
        if bd.read_literal(1):  # update
            for i in range(4):
                if bd.read_bool(128):
                    ref_d[i] = bd.read_signed(6)
            for i in range(4):
                if bd.read_bool(128):
                    mode_d[i] = bd.read_signed(6)
        hdr["lf_deltas"] = (ref_d, mode_d)

    # token partitions (§9.5)
    n_parts = 1 << bd.read_literal(2)
    part_base = 10 + part1_size
    sizes = []
    table = 3 * (n_parts - 1)
    if part_base + table > len(data):
        raise Vp8Error("partition size table overruns chunk")
    off = part_base + table
    for i in range(n_parts - 1):
        p = part_base + 3 * i
        sz = data[p] | (data[p + 1] << 8) | (data[p + 2] << 16)
        sizes.append(sz)
    for i, sz in enumerate(sizes):
        if off + sz > len(data):
            raise Vp8Error(f"token partition {i} overruns chunk")
        off += sz
    starts = []
    off = part_base + table
    for sz in sizes:
        starts.append((off, sz))
        off += sz
    starts.append((off, len(data) - off))  # last partition: rest of chunk
    hdr["partitions"] = [BoolDecoder(data[s : s + n]) for s, n in starts]

    # quantizer (§9.6)
    qi = bd.read_literal(7)
    deltas = {}
    for name in ("y1dc", "y2dc", "y2ac", "uvdc", "uvac"):
        if bd.read_bool(128):
            deltas[name] = bd.read_signed(4)
    hdr["qi"] = qi
    hdr["q_deltas"] = deltas

    hdr["refresh_entropy"] = bd.read_literal(1)

    # coefficient probability updates (§13.4)
    probs = [
        [[list(p) for p in ctxs] for ctxs in bands]
        for bands in T.DEFAULT_COEFF_PROBS
    ]
    for bt in range(4):
        for band in range(8):
            for ctx in range(3):
                for tok in range(11):
                    if bd.read_bool(T.COEFF_UPDATE_PROBS[bt][band][ctx][tok]):
                        probs[bt][band][ctx][tok] = bd.read_literal(8)
    hdr["coeff_probs"] = probs

    hdr["mb_no_skip"] = bd.read_literal(1)
    hdr["prob_skip"] = bd.read_literal(8) if hdr["mb_no_skip"] else 0

    hdr["mb_cols"] = (width + 15) // 16
    hdr["mb_rows"] = (height + 15) // 16
    return hdr, bd


def _decode_block_tokens(bd, probs, ctx, first_coeff, qdc, qac):
    """One 4x4 block's dequantized coefficients (natural order) + nz flag.

    ``ctx`` enters as above_nz + left_nz and tracks the just-decoded
    magnitude class (0/1/2) along the scan; a ZERO token forbids EOB next
    (tree entered at node 2), both per §13.3.
    """
    coeffs = [0] * 16
    i = first_coeff
    nonzero = False
    prev_zero = False
    while i < 16:
        p = probs[T.COEFF_BANDS[i]][ctx]
        tok = bd.read_tree(T.COEFF_TREE, p, start=2 if prev_zero else 0)
        if tok == T.EOB_TOKEN:
            break
        if tok == T.ZERO_TOKEN:
            ctx = 0
            prev_zero = True
            i += 1
            continue
        prev_zero = False
        v = T.CAT_BASE[tok]
        if tok >= T.CAT1_TOKEN:
            extra = 0
            for pb in T.CAT_PROBS[tok]:
                extra = (extra << 1) | bd.read_bool(pb)
            v += extra
        ctx = 1 if v == 1 else 2
        if bd.read_bool(128):
            v = -v
        coeffs[T.ZIGZAG[i]] = v * (qdc if i == 0 else qac)
        nonzero = True
        i += 1
    return coeffs, nonzero


# 16x16-mode -> implied subblock mode for B-mode context (RFC 6386 §11.3)
_MODE_TO_SUB = {
    T.DC_PRED: T.B_DC_PRED,
    T.V_PRED: T.B_VE_PRED,
    T.H_PRED: T.B_HE_PRED,
    T.TM_PRED: T.B_TM_PRED,
}


def _decode_modes(bd, hdr):
    """Per-MB prediction records from the first partition (raster order)."""
    mb_rows, mb_cols = hdr["mb_rows"], hdr["mb_cols"]
    mbs = []
    above_sub = [[T.B_DC_PRED] * 4 for _ in range(mb_cols)]
    for r in range(mb_rows):
        left_sub = [T.B_DC_PRED] * 4
        for c in range(mb_cols):
            mb = {"segment": 0, "skip": 0}
            if hdr["update_map"]:
                mb["segment"] = bd.read_tree(
                    T.MB_SEGMENT_TREE, hdr["segment_tree_probs"]
                )
            if hdr["mb_no_skip"]:
                mb["skip"] = bd.read_bool(hdr["prob_skip"])
            ymode = bd.read_tree(T.KF_Y_MODE_TREE, T.KF_Y_MODE_PROBS)
            mb["ymode"] = ymode
            if ymode == T.B_PRED:
                subs = [0] * 16
                for sr in range(4):
                    for sc in range(4):
                        A = above_sub[c][sc] if sr == 0 else subs[(sr - 1) * 4 + sc]
                        L = left_sub[sr] if sc == 0 else subs[sr * 4 + sc - 1]
                        m = bd.read_tree(T.B_MODE_TREE, T.KF_B_MODE_PROBS[A][L])
                        subs[sr * 4 + sc] = m
                mb["sub"] = subs
            else:
                mb["sub"] = [_MODE_TO_SUB[ymode]] * 16
            above_sub[c] = mb["sub"][12:16]
            left_sub = [mb["sub"][3], mb["sub"][7], mb["sub"][11], mb["sub"][15]]
            mb["uvmode"] = bd.read_tree(T.UV_MODE_TREE, T.KF_UV_MODE_PROBS)
            mbs.append(mb)
    return mbs


def _borders(plane, y0, x0, size, have_above, have_left, want_right4=False):
    """(corner, above, left) per the §12.2 edge conventions; ``above`` has
    ``size`` (+4 when want_right4) entries, replication past the plane's
    right edge."""
    h, w = plane.shape
    n = size + (4 if want_right4 else 0)
    if have_above:
        end = min(x0 + n, w)
        above = plane[y0 - 1, x0:end].astype(np.int32)
        if end < x0 + n:  # replicate rightmost above pixel past the frame
            above = np.concatenate(
                [above, np.full(x0 + n - end, int(above[-1]), dtype=np.int32)]
            )
    else:
        above = np.full(n, 127, dtype=np.int32)
    if have_left:
        left = plane[y0 : y0 + size, x0 - 1].astype(np.int32)
    else:
        left = np.full(size, 129, dtype=np.int32)
    if have_above and have_left:
        corner = int(plane[y0 - 1, x0 - 1])
    elif have_above:
        corner = 127 if y0 == 0 else 129
    elif have_left:
        corner = 129 if x0 == 0 else 127
    else:
        corner = 127
    if not have_above:
        corner = 127  # the above border row (127) owns the corner
    return corner, above, left


def _predict_16_or_8(mode, plane, y0, x0, size, have_above, have_left):
    corner, above, left = _borders(plane, y0, x0, size, have_above, have_left)
    if mode == T.DC_PRED:
        return pred_dc(above, left, have_above, have_left, size)
    if mode == T.V_PRED:
        return np.repeat(above[:size][None, :], size, axis=0)
    if mode == T.H_PRED:
        return np.repeat(left[:size][:, None], size, axis=1)
    if mode == T.TM_PRED:
        return pred_tm(above, left, corner, size)
    raise Vp8Error(f"bad 16x16/chroma mode {mode}")


def _add_residual(plane, y0, x0, pred4, coeffs):
    res = np.array(idct4x4(coeffs), dtype=np.int32).reshape(4, 4)
    plane[y0 : y0 + 4, x0 : x0 + 4] = np.clip(pred4 + res, 0, 255).astype(np.uint8)


def decode_vp8_planes(data: bytes, max_pixels: int = 64_000_000):
    """VP8 key frame -> (y, u, v) uint8 planes + header dict."""
    hdr, bd = _parse_header(data, max_pixels)
    mb_rows, mb_cols = hdr["mb_rows"], hdr["mb_cols"]
    mbs = _decode_modes(bd, hdr)

    # per-segment quant factors
    if hdr["segment_q"] is not None:
        seg_q = []
        for s in range(4):
            qi = hdr["segment_q"][s] if hdr["segment_abs"] else hdr["qi"] + hdr["segment_q"][s]
            seg_q.append(quant_factors(_clamp_q(qi), hdr["q_deltas"]))
    else:
        seg_q = [quant_factors(hdr["qi"], hdr["q_deltas"])] * 4

    y = np.zeros((mb_rows * 16, mb_cols * 16), dtype=np.uint8)
    u = np.zeros((mb_rows * 8, mb_cols * 8), dtype=np.uint8)
    v = np.zeros((mb_rows * 8, mb_cols * 8), dtype=np.uint8)

    probs = hdr["coeff_probs"]
    parts = hdr["partitions"]
    n_parts = len(parts)
    above_y = [[0] * 4 for _ in range(mb_cols)]
    above_u = [[0] * 2 for _ in range(mb_cols)]
    above_v = [[0] * 2 for _ in range(mb_cols)]
    above_y2 = [0] * mb_cols

    for r in range(mb_rows):
        td = parts[r % n_parts]
        left_y, left_u, left_v, left_y2 = [0] * 4, [0] * 2, [0] * 2, 0
        for c in range(mb_cols):
            mb = mbs[r * mb_cols + c]
            q = seg_q[mb["segment"]]
            has_y2 = mb["ymode"] != T.B_PRED
            y_coeffs = [[0] * 16 for _ in range(16)]
            u_coeffs = [[0] * 16 for _ in range(4)]
            v_coeffs = [[0] * 16 for _ in range(4)]
            has_coeffs = False
            if mb["skip"]:
                left_y, left_u, left_v = [0] * 4, [0] * 2, [0] * 2
                above_y[c] = [0] * 4
                above_u[c] = [0] * 2
                above_v[c] = [0] * 2
                if has_y2:
                    above_y2[c] = 0
                    left_y2 = 0
            else:
                if has_y2:
                    ctx = above_y2[c] + left_y2
                    c2, nz2 = _decode_block_tokens(
                        td, probs[1], ctx, 0, q["y2"][0], q["y2"][1]
                    )
                    above_y2[c] = left_y2 = int(nz2)
                    has_coeffs |= nz2
                    dcs = iwht4x4(c2)
                bt = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for sr in range(4):
                    for sc in range(4):
                        ctx = above_y[c][sc] + left_y[sr]
                        bc, nz = _decode_block_tokens(
                            td, probs[bt], ctx, first, q["y1"][0], q["y1"][1]
                        )
                        if has_y2:
                            bc[0] = dcs[sr * 4 + sc]
                        y_coeffs[sr * 4 + sc] = bc
                        above_y[c][sc] = left_y[sr] = int(nz)
                        has_coeffs |= nz
                for plane_coeffs, above_c, left_c in (
                    (u_coeffs, above_u, left_u),
                    (v_coeffs, above_v, left_v),
                ):
                    for sr in range(2):
                        for sc in range(2):
                            ctx = above_c[c][sc] + left_c[sr]
                            bc, nz = _decode_block_tokens(
                                td, probs[2], ctx, 0, q["uv"][0], q["uv"][1]
                            )
                            plane_coeffs[sr * 2 + sc] = bc
                            above_c[c][sc] = left_c[sr] = int(nz)
                            has_coeffs |= nz
            if mb["skip"] and has_y2:
                # skipped 16x16 MB: prediction only, zero residual
                pass
            mb["has_coeffs"] = bool(has_coeffs)

            # ---- reconstruction ----
            y0, x0 = r * 16, c * 16
            have_above, have_left = r > 0, c > 0
            if has_y2:
                pred = _predict_16_or_8(
                    mb["ymode"], y, y0, x0, 16, have_above, have_left
                )
                for sr in range(4):
                    for sc in range(4):
                        _add_residual(
                            y,
                            y0 + sr * 4,
                            x0 + sc * 4,
                            pred[sr * 4 : sr * 4 + 4, sc * 4 : sc * 4 + 4],
                            y_coeffs[sr * 4 + sc],
                        )
            else:
                # B_PRED: per-subblock prediction over a bordered canvas
                corner, above, left = _borders(
                    y, y0, x0, 16, have_above, have_left, want_right4=True
                )
                buf = np.zeros((17, 21), dtype=np.int32)
                buf[0, 0] = corner
                buf[0, 1:21] = above
                buf[1:17, 0] = left
                for sr in range(4):
                    for sc in range(4):
                        br, bc_ = sr * 4, sc * 4
                        if sc < 3:
                            A = [int(t) for t in buf[br, bc_ + 1 : bc_ + 9]]
                        else:
                            A = [int(t) for t in buf[br, bc_ + 1 : bc_ + 5]] + [
                                int(t) for t in buf[0, 17:21]
                            ]
                        L = [int(t) for t in buf[br + 1 : br + 5, bc_]]
                        P = int(buf[br, bc_])
                        pred = pred_b(mb["sub"][sr * 4 + sc], A, L, P)
                        res = np.array(
                            idct4x4(y_coeffs[sr * 4 + sc]), dtype=np.int32
                        ).reshape(4, 4)
                        buf[br + 1 : br + 5, bc_ + 1 : bc_ + 5] = np.clip(
                            pred + res, 0, 255
                        )
                y[y0 : y0 + 16, x0 : x0 + 16] = buf[1:17, 1:17].astype(np.uint8)
            cy, cx = r * 8, c * 8
            for plane, coeffs_list in ((u, u_coeffs), (v, v_coeffs)):
                pred = _predict_16_or_8(
                    mb["uvmode"], plane, cy, cx, 8, have_above, have_left
                )
                for sr in range(2):
                    for sc in range(2):
                        _add_residual(
                            plane,
                            cy + sr * 4,
                            cx + sc * 4,
                            pred[sr * 4 : sr * 4 + 4, sc * 4 : sc * 4 + 4],
                            coeffs_list[sr * 2 + sc],
                        )

    _loop_filter_frame((y, u, v), mbs, hdr)
    w, h = hdr["width"], hdr["height"]
    return (
        y[:h, :w],
        u[: (h + 1) // 2, : (w + 1) // 2],
        v[: (h + 1) // 2, : (w + 1) // 2],
        hdr,
    )


def yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Deterministic BT.601 studio-range conversion with nearest-neighbor
    chroma upsampling (non-normative; inverse-paired with rgb_to_yuv)."""
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w].astype(np.int32)
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w].astype(np.int32)
    cc = y.astype(np.int32) - 16
    d = uu - 128
    e = vv - 128
    r = (298 * cc + 409 * e + 128) >> 8
    g = (298 * cc - 100 * d - 208 * e + 128) >> 8
    b = (298 * cc + 516 * d + 128) >> 8
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def rgb_to_yuv(px: np.ndarray):
    px = px.astype(np.int64)
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = np.clip(((66 * r + 129 * g + 25 * b + 128) >> 8) + 16, 0, 255).astype(np.uint8)
    h, w = y.shape
    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    rp = np.pad(px, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    q = rp.reshape(ph // 2, 2, pw // 2, 2, 3).sum(axis=(1, 3))  # 2x2 sums (x4)
    r2, g2, b2 = q[:, :, 0], q[:, :, 1], q[:, :, 2]
    u = np.clip((((-38 * r2 - 74 * g2 + 112 * b2) // 4 + 128) >> 8) + 128, 0, 255)
    v = np.clip((((112 * r2 - 94 * g2 - 18 * b2) // 4 + 128) >> 8) + 128, 0, 255)
    return y, u.astype(np.uint8), v.astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (spec-layout bitstream; fixed mode policy; drift-free recon)
# ---------------------------------------------------------------------------


def _quantize_block(coeffs, qdc, qac):
    """Levels (zigzag order) + dequantized coefficients (natural order)."""
    levels = [0] * 16
    deq = [0] * 16
    for i in range(16):
        cpos = T.ZIGZAG[i]
        q = qdc if i == 0 else qac
        c = coeffs[cpos]
        lvl = int(abs(c)) // q
        if lvl > 2047:
            lvl = 2047
        if c < 0:
            lvl = -lvl
        levels[i] = lvl
        deq[cpos] = lvl * q
    return levels, deq


def _encode_block_tokens(be, probs, ctx, first_coeff, levels):
    """Mirror of _decode_block_tokens over quantized levels (zigzag)."""
    last = -1
    for i in range(first_coeff, 16):
        if levels[i]:
            last = i
    i = first_coeff
    prev_zero = False
    nonzero = last >= first_coeff
    while i < 16:
        p = probs[T.COEFF_BANDS[i]][ctx]
        start = 2 if prev_zero else 0
        if i > last:
            be.write_tree(T.COEFF_TREE, p, T.EOB_TOKEN, start=start)
            break
        v = levels[i]
        a = abs(v)
        if a == 0:
            be.write_tree(T.COEFF_TREE, p, T.ZERO_TOKEN, start=start)
            ctx = 0
            prev_zero = True
            i += 1
            continue
        prev_zero = False
        if a <= 4:
            tok = [None, T.ONE_TOKEN, T.TWO_TOKEN, T.THREE_TOKEN, T.FOUR_TOKEN][a]
            be.write_tree(T.COEFF_TREE, p, tok, start=start)
        else:
            for tok in (T.CAT1_TOKEN, T.CAT2_TOKEN, T.CAT3_TOKEN, T.CAT4_TOKEN, T.CAT5_TOKEN, T.CAT6_TOKEN):
                nbits = len(T.CAT_PROBS[tok])
                if a < T.CAT_BASE[tok] + (1 << nbits):
                    break
            be.write_tree(T.COEFF_TREE, p, tok, start=start)
            extra = a - T.CAT_BASE[tok]
            for bidx, pb in enumerate(T.CAT_PROBS[tok]):
                nbits = len(T.CAT_PROBS[tok])
                be.write_bool(pb, (extra >> (nbits - 1 - bidx)) & 1)
        ctx = 1 if a == 1 else 2
        be.write_bool(128, 1 if v < 0 else 0)
        i += 1
    return nonzero, ctx


def _pad_to(plane, mh, mw):
    h, w = plane.shape
    return np.pad(plane, ((0, mh - h), (0, mw - w)), mode="edge")


def encode_vp8(
    y: np.ndarray,
    u: np.ndarray,
    v: np.ndarray,
    *,
    qindex: int = 12,
    filter_level: int = 20,
    sharpness: int = 0,
    filter_type: int = 0,
    ymode: int = T.DC_PRED,
    uvmode: int = T.DC_PRED,
) -> bytes:
    """Planes -> VP8 key-frame chunk. ``ymode`` may be any 16x16 mode or
    B_PRED (all-subblock B_DC_PRED policy)."""
    height, width = y.shape
    if height == 0 or width == 0 or height > 0x3FFF or width > 0x3FFF:
        raise Vp8Error("unencodable dimensions")
    mb_rows, mb_cols = (height + 15) // 16, (width + 15) // 16
    ys = _pad_to(y, mb_rows * 16, mb_cols * 16).astype(np.int32)
    us = _pad_to(u, mb_rows * 8, mb_cols * 8).astype(np.int32)
    vs = _pad_to(v, mb_rows * 8, mb_cols * 8).astype(np.int32)
    q = quant_factors(qindex, {})

    recon_y = np.zeros_like(ys, dtype=np.uint8)
    recon_u = np.zeros_like(us, dtype=np.uint8)
    recon_v = np.zeros_like(vs, dtype=np.uint8)

    head = BoolEncoder()
    head.write_literal(1, 0)  # color space
    head.write_literal(1, 0)  # clamping
    head.write_literal(1, 0)  # segmentation disabled
    head.write_literal(1, filter_type & 1)
    head.write_literal(6, filter_level)
    head.write_literal(3, sharpness)
    head.write_literal(1, 0)  # lf deltas disabled
    head.write_literal(2, 0)  # 1 token partition
    head.write_literal(7, qindex)
    for _ in range(5):
        head.write_bool(128, 0)  # no quant deltas
    head.write_literal(1, 0)  # refresh entropy
    for bt in range(4):
        for band in range(8):
            for ctx in range(3):
                for tok in range(11):
                    head.write_bool(T.COEFF_UPDATE_PROBS[bt][band][ctx][tok], 0)
    head.write_literal(1, 1)  # mb_no_coeff_skip
    head.write_literal(8, 128)  # prob_skip_false

    tok = BoolEncoder()
    probs = T.DEFAULT_COEFF_PROBS
    has_y2 = ymode != T.B_PRED
    sub_policy = T.B_DC_PRED

    # pass 1: per-MB transform/quant + reconstruction (so later MBs predict
    # from the same pixels the decoder will have), collecting per-MB data
    mb_data = []
    for r in range(mb_rows):
        for c in range(mb_cols):
            y0, x0 = r * 16, c * 16
            cy, cx = r * 8, c * 8
            have_above, have_left = r > 0, c > 0
            y_levels = [None] * 16
            if has_y2:
                pred = _predict_16_or_8(
                    ymode, recon_y, y0, x0, 16, have_above, have_left
                )
                res = ys[y0 : y0 + 16, x0 : x0 + 16] - pred
                dct = [
                    fdct4x4(res[sr * 4 : sr * 4 + 4, sc * 4 : sc * 4 + 4].ravel())
                    for sr in range(4)
                    for sc in range(4)
                ]
                y2_in = [dct[k][0] for k in range(16)]
                wht = fwht4x4(y2_in)
                y2_levels, y2_deq = _quantize_block(wht, q["y2"][0], q["y2"][1])
                dcs = iwht4x4(y2_deq)
                deq_blocks = []
                for k in range(16):
                    lv, dq = _quantize_block(dct[k], q["y1"][0], q["y1"][1])
                    lv[0] = 0  # DC travels via Y2
                    dq[0] = dcs[k]
                    y_levels[k] = lv
                    deq_blocks.append(dq)
                for sr in range(4):
                    for sc in range(4):
                        k = sr * 4 + sc
                        resid = np.array(idct4x4(deq_blocks[k]), dtype=np.int32).reshape(4, 4)
                        recon_y[y0 + sr * 4 : y0 + sr * 4 + 4, x0 + sc * 4 : x0 + sc * 4 + 4] = np.clip(
                            pred[sr * 4 : sr * 4 + 4, sc * 4 : sc * 4 + 4] + resid, 0, 255
                        ).astype(np.uint8)
            else:
                y2_levels = None
                corner, above, left = _borders(
                    recon_y, y0, x0, 16, have_above, have_left, want_right4=True
                )
                buf = np.zeros((17, 21), dtype=np.int32)
                buf[0, 0] = corner
                buf[0, 1:21] = above
                buf[1:17, 0] = left
                for sr in range(4):
                    for sc in range(4):
                        br, bc_ = sr * 4, sc * 4
                        if sc < 3:
                            A = [int(t) for t in buf[br, bc_ + 1 : bc_ + 9]]
                        else:
                            A = [int(t) for t in buf[br, bc_ + 1 : bc_ + 5]] + [
                                int(t) for t in buf[0, 17:21]
                            ]
                        L = [int(t) for t in buf[br + 1 : br + 5, bc_]]
                        P = int(buf[br, bc_])
                        pred = pred_b(sub_policy, A, L, P)
                        src = ys[y0 + br : y0 + br + 4, x0 + bc_ : x0 + bc_ + 4]
                        lv, dq = _quantize_block(
                            fdct4x4((src - pred).ravel()), q["y1"][0], q["y1"][1]
                        )
                        y_levels[sr * 4 + sc] = lv
                        resid = np.array(idct4x4(dq), dtype=np.int32).reshape(4, 4)
                        buf[br + 1 : br + 5, bc_ + 1 : bc_ + 5] = np.clip(
                            pred + resid, 0, 255
                        )
                recon_y[y0 : y0 + 16, x0 : x0 + 16] = buf[1:17, 1:17].astype(np.uint8)
            uv_levels = {"u": [None] * 4, "v": [None] * 4}
            for key, src_p, rec_p in (("u", us, recon_u), ("v", vs, recon_v)):
                pred = _predict_16_or_8(
                    uvmode, rec_p, cy, cx, 8, have_above, have_left
                )
                res = src_p[cy : cy + 8, cx : cx + 8] - pred
                for sr in range(2):
                    for sc in range(2):
                        lv, dq = _quantize_block(
                            fdct4x4(
                                res[sr * 4 : sr * 4 + 4, sc * 4 : sc * 4 + 4].ravel()
                            ),
                            q["uv"][0],
                            q["uv"][1],
                        )
                        uv_levels[key][sr * 2 + sc] = lv
                        resid = np.array(idct4x4(dq), dtype=np.int32).reshape(4, 4)
                        rec_p[cy + sr * 4 : cy + sr * 4 + 4, cx + sc * 4 : cx + sc * 4 + 4] = np.clip(
                            pred[sr * 4 : sr * 4 + 4, sc * 4 : sc * 4 + 4] + resid, 0, 255
                        ).astype(np.uint8)
            skip = (
                (y2_levels is None or not any(y2_levels))
                and not any(any(b) for b in y_levels)
                and not any(any(b) for b in uv_levels["u"])
                and not any(any(b) for b in uv_levels["v"])
            )
            mb_data.append((skip, y2_levels, y_levels, uv_levels))

    # pass 2: emit modes (first partition) and tokens (token partition)
    above_y = [[0] * 4 for _ in range(mb_cols)]
    above_u = [[0] * 2 for _ in range(mb_cols)]
    above_v = [[0] * 2 for _ in range(mb_cols)]
    above_y2 = [0] * mb_cols
    for r in range(mb_rows):
        left_y, left_u, left_v, left_y2 = [0] * 4, [0] * 2, [0] * 2, 0
        for c in range(mb_cols):
            skip, y2_levels, y_levels, uv_levels = mb_data[r * mb_cols + c]
            head.write_bool(128, 1 if skip else 0)  # mb_skip (prob 128)
            head.write_tree(T.KF_Y_MODE_TREE, T.KF_Y_MODE_PROBS, ymode)
            if ymode == T.B_PRED:
                # context-correct writes: all-B_DC policy keeps ctx constant
                for _ in range(16):
                    head.write_tree(
                        T.B_MODE_TREE,
                        T.KF_B_MODE_PROBS[sub_policy][sub_policy],
                        sub_policy,
                    )
            head.write_tree(T.UV_MODE_TREE, T.KF_UV_MODE_PROBS, uvmode)
            if skip:
                left_y, left_u, left_v = [0] * 4, [0] * 2, [0] * 2
                above_y[c] = [0] * 4
                above_u[c] = [0] * 2
                above_v[c] = [0] * 2
                if has_y2:
                    above_y2[c] = 0
                    left_y2 = 0
                continue
            if has_y2:
                ctx = above_y2[c] + left_y2
                nz, _ = _encode_block_tokens(tok, probs[1], ctx, 0, y2_levels)
                above_y2[c] = left_y2 = int(nz)
            bt = 0 if has_y2 else 3
            first = 1 if has_y2 else 0
            for sr in range(4):
                for sc in range(4):
                    ctx = above_y[c][sc] + left_y[sr]
                    nz, _ = _encode_block_tokens(
                        tok, probs[bt], ctx, first, y_levels[sr * 4 + sc]
                    )
                    above_y[c][sc] = left_y[sr] = int(nz)
            for key, above_c, left_c in (("u", above_u, left_u), ("v", above_v, left_v)):
                for sr in range(2):
                    for sc in range(2):
                        ctx = above_c[c][sc] + left_c[sr]
                        nz, _ = _encode_block_tokens(
                            tok, probs[2], ctx, 0, uv_levels[key][sr * 2 + sc]
                        )
                        above_c[c][sc] = left_c[sr] = int(nz)

    part1 = head.get_bytes()
    part2 = tok.get_bytes()
    if len(part1) >= 1 << 19:
        raise Vp8Error("first partition too large")
    tag = (0) | (0 << 1) | (1 << 4) | (len(part1) << 5)
    out = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    out += b"\x9d\x01\x2a"
    out += struct.pack("<HH", width, height)
    return out + part1 + part2


def encode_webp_lossy(px: np.ndarray, **kw) -> bytes:
    """(H, W, 3) RGB -> lossy .webp bytes (RIFF/VP8 chunk)."""
    y, u, v = rgb_to_yuv(px)
    chunk = encode_vp8(y, u, v, **kw)
    pad = b"\x00" if len(chunk) % 2 else b""
    riff = b"WEBP" + b"VP8 " + struct.pack("<I", len(chunk)) + chunk + pad
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_vp8(data: bytes, max_pixels: int = 64_000_000) -> np.ndarray:
    """VP8 chunk -> (H, W, 3) RGB (see module docstring re conversion)."""
    y, u, v, _hdr = decode_vp8_planes(data, max_pixels)
    return yuv_to_rgb(y, u, v)
