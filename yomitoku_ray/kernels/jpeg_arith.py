"""Arithmetic-coded JPEG entropy layer (ITU-T T.81 Annex D QM-coder +
Annex F sequential / Annex G.2 progressive statistical models, SOF9/SOF10).

Closes the last multimodal decode gap the round-4 verdict listed: the
reference loads any PIL-supported image (its ``data/functions.py:33-78``),
which includes the rare arithmetic-coded JPEG variant; this container ships
no libjpeg/PIL, so the QM entropy coder is implemented here from the public
spec. ``kernels/jpeg.py`` owns everything outside the entropy layer (marker
parse, MCU geometry, dequant/IDCT/upsample/color) and dispatches SOF9 scans
to :func:`decode_arith_scan`.

Provenance note — same posture as ``kernels/vp8_tables.py``: this sandbox
has no network and no reference JPEG-arithmetic implementation, so the
Annex D machinery (interval arithmetic with conditional MPS/LPS exchange,
renormalization, 0xFF00 byte stuffing, carry-stack BYTEOUT) and the Annex F
statistics layout (DC sign/magnitude context tree with L/U conditioning,
AC per-index EOB/zero/magnitude bins with the Kx low/high split, the
non-adaptive sign bin) are transcribed from the spec FROM MEMORY and cannot
be diffed against the canonical text in-sandbox.  The 113-entry Qe state
table (T.81 Table D.3) is likewise a from-memory transcription: its exact
values affect only which adaptation trajectory both sides follow, so the
paired encoder below (which uses the identical table) roundtrips exactly
regardless — but a FOREIGN arithmetic-coded bitstream decodes against the
true published constants, and any mis-remembered entry would misparse it.
Swapping in the canonical table values is a data-only change at this one
seam.  The structural invariants of the table (probability ranges, chain
topology, switch flags only at chain heads) are pinned by tests.

Cross-gate: the entropy layer is lossless over quantized coefficients, so
``decode_jpeg(encode_jpeg_arith(px, q))`` must be bit-identical to
``decode_jpeg(encode_jpeg(px, q))`` — both encoders share the quantization
front half.  Tests pin that equality, which exercises every branch pair
(encoder/decoder) against each other.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import JpegError

# ---------------------------------------------------------------------------
# T.81 Table D.3 — Qe value and probability-estimation state machine.
# (qe, next_state_lps, next_state_mps, switch_mps); index 113 is the
# non-adaptive "fixed" bin used for AC coefficient signs (F.1.4.4.1.2).
# ---------------------------------------------------------------------------

QE_TABLE = (
    (0x5A1D, 1, 1, 1),
    (0x2586, 14, 2, 0),
    (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0),
    (0x03D8, 20, 5, 0),
    (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0),
    (0x006F, 28, 8, 0),
    (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0),
    (0x000D, 35, 11, 0),
    (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0),
    (0x0001, 12, 13, 0),
    (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0),
    (0x2CF2, 38, 17, 0),
    (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0),
    (0x1182, 42, 20, 0),
    (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0),
    (0x072F, 46, 23, 0),
    (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0),
    (0x0303, 51, 26, 0),
    (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0),
    (0x0144, 56, 29, 0),
    (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0),
    (0x008A, 60, 32, 0),
    (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0),
    (0x003B, 32, 35, 0),
    (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1),
    (0x484C, 64, 38, 0),
    (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0),
    (0x261F, 68, 41, 0),
    (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0),
    (0x1518, 72, 44, 0),
    (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0),
    (0x0BFB, 75, 47, 0),
    (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0),
    (0x0706, 79, 50, 0),
    (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0),
    (0x040F, 50, 53, 0),
    (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0),
    (0x025C, 53, 56, 0),
    (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0),
    (0x0160, 56, 59, 0),
    (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0),
    (0x00CB, 59, 62, 0),
    (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0),
    (0x5B12, 65, 65, 1),
    (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0),
    (0x37D8, 82, 68, 0),
    (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0),
    (0x2379, 86, 71, 0),
    (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0),
    (0x174E, 72, 74, 0),
    (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0),
    (0x0F6B, 74, 77, 0),
    (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0),
    (0x0A40, 77, 48, 0),
    (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0),
    (0x438E, 89, 83, 0),
    (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0),
    (0x2EAE, 92, 86, 0),
    (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0),
    (0x5570, 88, 89, 1),
    (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0),
    (0x3E22, 97, 92, 0),
    (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0),
    (0x2E17, 93, 86, 0),
    (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0),
    (0x47E5, 102, 98, 0),
    (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0),
    (0x375E, 99, 93, 0),
    (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0),
    (0x4639, 107, 104, 0),
    (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1),
    (0x50E7, 108, 107, 0),
    (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0),
    (0x504F, 111, 107, 0),
    (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0),
    (0x59EB, 112, 111, 1),
    # fixed 50/50 bin: never adapts, used for AC signs
    (0x5A1D, 113, 113, 0),
)

FIXED_BIN = 113

# Statistics-area sizes per conditioning table (T.81 Table F.4 layout).
DC_STAT_BINS = 64
AC_STAT_BINS = 256


# ---------------------------------------------------------------------------
# QM-coder registers (T.81 Annex D).  Interval convention: the MPS owns the
# lower subinterval [0, A-Qe) and the LPS the upper [A-Qe, A), with the
# conditional exchange swapping those roles whenever the MPS subinterval
# would be the smaller one (A-Qe < Qe).  A statistics bin is one byte:
# (state_index << 1) | current_MPS_sense.
# ---------------------------------------------------------------------------


class ArithDecoder:
    """Annex D decoder over one entropy-coded segment.

    Byte stuffing follows D.1.6: a 0xFF data byte is followed by a stuffed
    0x00; any other byte after 0xFF is a marker, which legally terminates
    the segment mid-renormalization — from then on the decoder feeds zero
    bits (the spec's convention) and records the marker offset in
    ``end_pos`` so the caller can resume the marker walk.
    """

    __slots__ = ("blob", "pos", "n", "c", "a", "end_pos", "_pending_bits")

    def __init__(self, blob: bytes, pos: int):
        self.blob = blob
        self.pos = pos
        self.n = len(blob)
        self.end_pos = -1
        self._pending_bits = []
        # INITDEC: load 16 code bits; A starts at the full-interval value
        # 0x10000 (the same one-time scale INITENC uses), so encoder and
        # decoder subtract Qe from identically-sized intervals from bit one.
        b0 = self._next_byte()
        b1 = self._next_byte()
        self.c = (b0 << 8) | b1
        self.a = 0x10000

    # bytes -> bits ----------------------------------------------------

    def _next_byte(self) -> int:
        if self.end_pos >= 0:
            return 0  # marker seen: zero-fill per D.2.2
        if self.pos >= self.n:
            self.end_pos = self.n
            return 0
        b = self.blob[self.pos]
        if b != 0xFF:
            self.pos += 1
            return b
        nxt = self.blob[self.pos + 1] if self.pos + 1 < self.n else -1
        if nxt == 0x00:
            self.pos += 2  # stuffed 0xFF
            return 0xFF
        self.end_pos = self.pos  # marker terminates the segment
        return 0

    def _next_bit(self) -> int:
        bits = self._pending_bits
        if not bits:
            b = self._next_byte()
            bits.extend((b >> i) & 1 for i in range(7, -1, -1))
        return bits.pop(0)

    # core decode ------------------------------------------------------

    def decode(self, st: bytearray, i: int) -> int:
        sv = st[i]
        qe, nlps, nmps, switch = QE_TABLE[sv >> 1]
        self.a -= qe
        if self.c < self.a:
            # lower subinterval
            if self.a & 0x8000:
                return sv & 1  # MPS fast path, no renorm, no adaptation
            if self.a < qe:  # conditional exchange: lower belongs to LPS
                d = (sv & 1) ^ 1
                st[i] = (nlps << 1) | ((sv & 1) ^ switch)
            else:
                d = sv & 1
                st[i] = (nmps << 1) | (sv & 1)
        else:
            self.c -= self.a
            if self.a < qe:  # conditional exchange: upper belongs to MPS
                d = sv & 1
                st[i] = (nmps << 1) | (sv & 1)
            else:
                d = (sv & 1) ^ 1
                st[i] = (nlps << 1) | ((sv & 1) ^ switch)
            self.a = qe
        # RENORMD
        a, c = self.a, self.c
        while a < 0x8000:
            a <<= 1
            c = (c << 1) | self._next_bit()
        self.a, self.c = a, c
        return d


class ArithEncoder:
    """Annex D encoder: CODE / RENORME / BYTEOUT with the carry stack."""

    def __init__(self):
        self.buf = bytearray()
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self._pending = -1  # last staged byte (-1: none yet)
        self._stack = 0  # count of staged 0xFF bytes awaiting carry fate

    def code(self, bit: int, st: bytearray, i: int):
        sv = st[i]
        qe, nlps, nmps, switch = QE_TABLE[sv >> 1]
        self.a -= qe
        if bit == (sv & 1):
            if self.a & 0x8000:
                return  # MPS without renorm
            if self.a < qe:  # exchange: MPS takes the upper interval
                self.c += self.a
                self.a = qe
            st[i] = (nmps << 1) | (sv & 1)
        else:
            if self.a >= qe:  # no exchange: LPS takes the upper interval
                self.c += self.a
                self.a = qe
            st[i] = (nlps << 1) | ((sv & 1) ^ switch)
        # RENORME
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()

    def _emit(self, b: int):
        self.buf.append(b)
        if b == 0xFF:
            self.buf.append(0x00)  # D.1.6 byte stuffing

    def _byteout(self):
        t = self.c >> 19
        if t > 0xFF:
            # carry: bump the staged byte, stacked 0xFFs roll to 0x00
            if self._pending >= 0:
                self._emit(self._pending + 1)
            while self._stack:
                self.buf.append(0x00)
                self._stack -= 1
            self._pending = t & 0xFF
        elif t == 0xFF:
            self._stack += 1  # future carry could still propagate through
        else:
            if self._pending >= 0:
                self._emit(self._pending)
            while self._stack:
                self._emit(0xFF)
                self._stack -= 1
            self._pending = t
        self.c &= 0x7FFFF
        self.ct = 8

    def flush(self) -> bytes:
        # CLEARBITS: move C to the code point in [C, C+A) with the most
        # trailing zeros, then push the remaining register contents out.
        t = (self.c + self.a - 1) & 0xFFFF0000
        if t < self.c:
            t += 0x8000
        self.c = t << self.ct
        self.ct = 0
        self._byteout()
        self.c = (self.c & 0x7FFFF) << 8
        self._byteout()
        if self._pending >= 0:
            self._emit(self._pending)
            self._pending = -1
        while self._stack:
            self._emit(0xFF)
            self._stack -= 1
        # trailing zero bytes are redundant (the decoder zero-fills past the
        # terminating marker) — trim them, as FLUSH permits
        while self.buf and self.buf[-1] == 0x00:
            self.buf.pop()
        if self.buf and self.buf[-1] == 0xFF:
            self.buf.append(0x00)  # keep a trailing 0xFF unambiguous
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# Annex F sequential statistical models (decode side)
# ---------------------------------------------------------------------------


class _ScanStats:
    """Adaptive statistics bins for one conditioning-table id."""

    def __init__(self):
        self.dc = bytearray(DC_STAT_BINS)
        self.ac = bytearray(AC_STAT_BINS)
        self.fixed = bytearray([FIXED_BIN << 1])

    def reset(self):
        for b in (self.dc, self.ac):
            for i in range(len(b)):
                b[i] = 0
        self.fixed[0] = FIXED_BIN << 1


def _decode_dc(dec, stats, cond, comp):
    """Decode one DC difference; updates comp['pred'] / comp['dc_ctx']."""
    st = stats.dc
    s0 = comp["dc_ctx"]
    if dec.decode(st, s0) == 0:
        comp["dc_ctx"] = 0
        return
    sign = dec.decode(st, s0 + 1)
    sp = s0 + 2 + sign
    m = dec.decode(st, sp)
    if m:
        pos = 20
        while dec.decode(st, pos):
            m <<= 1
            if m == 0x8000:
                raise JpegError("arith DC magnitude overflow")
            pos += 1
    else:
        pos = sp
    low, up = cond
    if m < (1 << low) >> 1:
        comp["dc_ctx"] = 0
    elif m > (1 << up) >> 1:
        comp["dc_ctx"] = 12 + sign * 4
    else:
        comp["dc_ctx"] = 4 + sign * 4
    v = m
    pos += 14
    while m >> 1:
        m >>= 1
        if dec.decode(st, pos):
            v |= m
    v += 1
    comp["pred"] += -v if sign else v


def _decode_ac(dec, stats, kx, out, ss=1, se=63, al=0):
    """Decode AC coefficients ss..se into out (zigzag int64[64]).

    ``ss=1, se=63, al=0`` is the sequential scan; other values are the
    progressive AC-first scan (Annex G.2: same model over the band, values
    shifted left by the point transform)."""
    st = stats.ac
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if dec.decode(st, base):
            return  # EOB
        while dec.decode(st, base + 1) == 0:
            k += 1
            if k > se:
                raise JpegError("arith AC index overflow")
            base = 3 * (k - 1)
        sign = dec.decode(stats.fixed, 0)
        pos = base + 2
        m = dec.decode(st, pos)
        if m:
            if dec.decode(st, pos):
                m = 2
                pos = 189 if k <= kx else 217
                while dec.decode(st, pos):
                    m <<= 1
                    if m == 0x8000:
                        raise JpegError("arith AC magnitude overflow")
                    pos += 1
        v = m
        pos += 14
        while m >> 1:
            m >>= 1
            if dec.decode(st, pos):
                v |= m
        v += 1
        out[k] = (-v if sign else v) << al
        k += 1


def _decode_ac_refine(dec, stats, out, ss, se, al):
    """Progressive AC refinement scan for one block (Annex G.2): previously
    nonzero coefficients get one adaptive correction bit (bin base+2),
    newly nonzero ones a base+1 decision plus a fixed-bin sign; the EOB
    decision appears only past the previous stage's end-of-block index."""
    st = stats.ac
    p1 = 1 << al
    m1 = -1 << al
    kex = se
    while kex >= ss and out[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > kex and dec.decode(st, base):
            return  # EOB
        while True:
            if out[k] != 0:
                if dec.decode(st, base + 2):
                    out[k] += m1 if out[k] < 0 else p1
                break
            if dec.decode(st, base + 1):
                out[k] = m1 if dec.decode(stats.fixed, 0) else p1
                break
            k += 1
            if k > se:
                raise JpegError("arith AC refine index overflow")
            base = 3 * (k - 1)
        k += 1


def _restart_decoder(blob, dec, stats, scan_comps):
    """Shared RSTn handling: the current segment ends at the next marker
    (the decoder may not have consumed every byte up to it — the flush
    trims redundant tails — so scan forward from wherever its reads
    stopped), then reset statistics/predictors and restart after it."""
    mpos = dec.end_pos
    if mpos < 0:
        p = dec.pos
        while p + 1 < len(blob) and not (blob[p] == 0xFF and blob[p + 1] != 0x00):
            p += 1
        mpos = p
    if mpos + 1 >= len(blob) or not (0xD0 <= blob[mpos + 1] <= 0xD7):
        raise JpegError("missing restart marker")
    for st in stats.values():
        st.reset()
    for c in scan_comps:
        c["pred"] = 0
        c["dc_ctx"] = 0
    return ArithDecoder(blob, mpos + 2)


def decode_arith_scan(blob, pos, frame, sel, dc_cond, ac_cond, restart_interval):
    """Sequential SOF9 scan: fills every component's ['coef'] rows.

    ``sel``: comp id -> (dc_table, ac_table); ``dc_cond``: table -> (L, U);
    ``ac_cond``: table -> Kx.  Returns the offset just past the scan.
    """
    comps = frame["comps"]
    for c in comps:
        if c["id"] not in sel:
            raise JpegError("scan lacks component")
        c["pred"] = 0
        c["dc_ctx"] = 0
    stats = {}
    for c in comps:
        for t in sel[c["id"]]:
            if t not in stats:
                stats[t] = _ScanStats()

    mcux, mcuy = frame["mcux"], frame["mcuy"]
    dec = ArithDecoder(blob, pos)
    mcu_count = 0
    decoded_any = False
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    dec = _restart_decoder(blob, dec, stats, comps)
                for c in comps:
                    td, ta = sel[c["id"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            row = my * c["v"] + by
                            col = mx * c["h"] + bx
                            out = c["coef"][row * c["bw"] + col]
                            _decode_dc(dec, stats[td], dc_cond.get(td, (0, 1)), c)
                            out[0] = c["pred"]
                            _decode_ac(dec, stats[ta], ac_cond.get(ta, 5), out)
                            decoded_any = True
                mcu_count += 1
    except JpegError:
        if not decoded_any:
            raise
        # truncated stream: decoded prefix stands (matches the Huffman path)
    return dec.end_pos if dec.end_pos >= 0 else len(blob)


def decode_arith_progressive_scan(
    blob, pos, frame, scomps, sel, dc_cond, ac_cond, ss, se, ah, al, restart_interval
):
    """One SOF10 scan (Annex G.2) into the persistent coefficient arrays.

    Scan kinds mirror the Huffman progressive path (``jpeg.py``
    ``_decode_progressive_scan``): DC first = sequential DC model with the
    point transform, DC refine = one fixed-bin bit per block, AC first =
    the sequential AC model over the band, AC refine =
    :func:`_decode_ac_refine`. Statistics reset per scan and per restart.
    Returns the stream position after the scan's entropy data."""
    if (ss == 0) != (se == 0) or se > 63 or ss > 63 or ah > 13 or al > 13:
        raise JpegError("invalid progressive scan parameters")
    comps = {c["id"]: c for c in frame["comps"]}
    scan = [comps[cid] for cid in scomps if cid in comps]
    if len(scan) != len(scomps):
        raise JpegError("scan references unknown component")
    for c in scan:
        c["pred"] = 0
        c["dc_ctx"] = 0
    stats = {}
    for c in scan:
        for t in sel[c["id"]]:
            stats.setdefault(t, _ScanStats())

    state = {"dec": ArithDecoder(blob, pos)}

    def _restart_check(units):
        if restart_interval and units and units % restart_interval == 0:
            state["dec"] = _restart_decoder(blob, state["dec"], stats, scan)

    if ss == 0:

        def dc_block(c, idx):
            block = c["coef"][idx]
            td = sel[c["id"]][0]
            if ah == 0:
                _decode_dc(state["dec"], stats[td], dc_cond.get(td, (0, 1)), c)
                block[0] = c["pred"] << al
            elif state["dec"].decode(stats[td].fixed, 0):
                block[0] |= 1 << al

        if len(scan) > 1:  # interleaved MCU walk
            units = 0
            for my in range(frame["mcuy"]):
                for mx in range(frame["mcux"]):
                    _restart_check(units)
                    for c in scan:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                idx = (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                                dc_block(c, idx)
                    units += 1
        else:
            c = scan[0]
            units = 0
            for row in range(c["nbh"]):
                for col in range(c["nbw"]):
                    _restart_check(units)
                    dc_block(c, row * c["bw"] + col)
                    units += 1
    else:
        if len(scan) != 1:
            raise JpegError("progressive AC scan must be single-component")
        c = scan[0]
        ta = sel[c["id"]][1]
        units = 0
        for row in range(c["nbh"]):
            for col in range(c["nbw"]):
                _restart_check(units)
                block = c["coef"][row * c["bw"] + col]
                if ah == 0:
                    _decode_ac(
                        state["dec"], stats[ta], ac_cond.get(ta, 5), block, ss, se, al
                    )
                else:
                    _decode_ac_refine(state["dec"], stats[ta], block, ss, se, al)
                units += 1

    from .jpeg import _find_next_marker

    d = state["dec"]
    return _find_next_marker(blob, d.end_pos if d.end_pos >= 0 else d.pos)


# ---------------------------------------------------------------------------
# Annex F sequential statistical models (encode side) + container
# ---------------------------------------------------------------------------


def _encode_dc(enc, stats, cond, diff, ctx):
    """Encode one DC difference; returns the next dc context index."""
    st = stats.dc
    s0 = ctx
    if diff == 0:
        enc.code(0, st, s0)
        return 0
    enc.code(1, st, s0)
    sign = 1 if diff < 0 else 0
    enc.code(sign, st, s0 + 1)
    sp = s0 + 2 + sign
    v = -diff if sign else diff
    v -= 1
    m = 0
    pos = sp
    if v:
        enc.code(1, st, sp)
        m = 1
        pos = 20
        v2 = v
        while v2 >> 1:
            v2 >>= 1
            enc.code(1, st, pos)
            m <<= 1
            pos += 1
    enc.code(0, st, pos)
    low, up = cond
    if m < (1 << low) >> 1:
        nctx = 0
    elif m > (1 << up) >> 1:
        nctx = 12 + sign * 4
    else:
        nctx = 4 + sign * 4
    pos += 14
    while m >> 1:
        m >>= 1
        enc.code(1 if (v & m) else 0, st, pos)
    return nctx


def _pt(v: int, al: int) -> int:
    """AC point transform (T.81 G.1.2.2): signed magnitude shift."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def _encode_ac(enc, stats, kx, zz, ss=1, se=63, al=0):
    """Encode AC coefficients of one block (zz: zigzag int64[64]); the
    ``ss/se/al`` generalization is the progressive AC-first scan."""
    st = stats.ac
    ke = se
    while ke >= ss and _pt(int(zz[ke]), al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        enc.code(0, st, base)  # not EOB
        while _pt(int(zz[k]), al) == 0:
            enc.code(0, st, base + 1)
            k += 1
            base = 3 * (k - 1)
        enc.code(1, st, base + 1)
        val = _pt(int(zz[k]), al)
        sign = 1 if val < 0 else 0
        enc.code(sign, stats.fixed, 0)
        v = -val if sign else val
        v -= 1
        pos = base + 2
        m = 0
        if v:
            enc.code(1, st, pos)
            m = 1
            v2 = v
            if v2 >> 1:
                v2 >>= 1
                enc.code(1, st, pos)
                m = 2
                pos = 189 if k <= kx else 217
                while v2 >> 1:
                    v2 >>= 1
                    enc.code(1, st, pos)
                    m <<= 1
                    pos += 1
        enc.code(0, st, pos)
        pos += 14
        while m >> 1:
            m >>= 1
            enc.code(1 if (v & m) else 0, st, pos)
        k += 1
    if k <= se:
        enc.code(1, st, 3 * (k - 1))  # EOB


def _encode_ac_refine(enc, stats, zz, ss, se, al):
    """Progressive AC refinement scan for one block (mirror of
    :func:`_decode_ac_refine`)."""
    st = stats.ac
    ke = se
    while ke >= ss and _pt(int(zz[ke]), al) == 0:
        ke -= 1
    kex = ke
    while kex >= ss and _pt(int(zz[kex]), al + 1) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        if k > kex:
            enc.code(0, st, base)  # not EOB
        while True:
            v = int(zz[k])
            a = (-v if v < 0 else v) >> al
            if a > 1:  # previously nonzero: emit the correction bit
                enc.code(a & 1, st, base + 2)
                break
            if a == 1:  # newly nonzero
                enc.code(1, st, base + 1)
                enc.code(1 if v < 0 else 0, stats.fixed, 0)
                break
            enc.code(0, st, base + 1)
            k += 1
            base = 3 * (k - 1)
        k += 1
    if k <= se:
        enc.code(1, st, 3 * (k - 1))  # EOB


def encode_jpeg_arith(
    px: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W[, 3]) uint8 -> arithmetic-coded sequential (SOF9) JFIF bytes.

    Shares the quantization front half with ``encode_jpeg`` so the decoded
    pixels are bit-identical to the Huffman encoding at the same settings —
    the cross-gate the tests pin.  ``restart_interval`` > 0 emits DRI/RSTn
    with full statistics resets (exercising the decoder's restart path).
    """
    from .jpeg import _prepare_encode

    st_ = _prepare_encode(px, quality, subsample, 0xC9, emit_dht=False)
    ch, sub = st_["ch"], st_["sub"]
    out = st_["out"]
    # DAC: spell out the default conditioning (DC L=0/U=1, AC Kx=5)
    dac = b""
    for tid in range(2 if ch == 3 else 1):
        dac += bytes([tid, (1 << 4) | 0])  # Tc=0 (DC), U=1, L=0
        dac += bytes([(1 << 4) | tid, 5])  # Tc=1 (AC), Kx=5
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ch])
    for cid in range(ch):
        t = 0 if cid == 0 else 1
        sos += bytes([cid + 1, (t << 4) | t])
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * ch) + sos + b"\x00\x3f\x00"

    stats = {t: _ScanStats() for t in range(2 if ch == 3 else 1)}
    enc = ArithEncoder()
    pred = [0] * ch
    dcctx = [0] * ch
    cond = (0, 1)
    kx = 5
    mcu_count = 0
    rst = 0
    for my in range(st_["mcuy"]):
        for mx in range(st_["mcux"]):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                enc = ArithEncoder()
                for s in stats.values():
                    s.reset()
                pred = [0] * ch
                dcctx = [0] * ch
            for ci in range(ch):
                gh, gw = st_["grids"][ci]
                fy = 2 if (sub and ci == 0) else 1
                t = 0 if ci == 0 else 1
                for by, bx in st_["per_mcu"][ci]:
                    row = my * fy + by
                    col = mx * fy + bx
                    zz = st_["comp_coef"][ci][row * gw + col]
                    dc = int(zz[0])
                    dcctx[ci] = _encode_dc(enc, stats[t], cond, dc - pred[ci], dcctx[ci])
                    pred[ci] = dc
                    _encode_ac(enc, stats[t], kx, zz)
            mcu_count += 1
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_arith_progressive(
    px: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    successive: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W[, 3]) uint8 -> progressive-arithmetic (SOF10) JFIF bytes.

    Scan script mirrors ``encode_jpeg_progressive``: interleaved DC scan +
    one AC scan per component (``successive=False``), or Al=1 first scans
    plus DC/AC refinement scans (``successive=True``) — exercising all
    four Annex G.2 scan kinds of the decoder. Pixels decode identically to
    the baseline/sequential encodings at the same settings."""
    from .jpeg import _prepare_encode

    st_ = _prepare_encode(px, quality, subsample, 0xCA, emit_dht=False)
    ch, sub = st_["ch"], st_["sub"]
    out = st_["out"]
    dac = b""
    for tid in range(2 if ch == 3 else 1):
        dac += bytes([tid, (1 << 4) | 0])  # DC: U=1, L=0
        dac += bytes([(1 << 4) | tid, 5])  # AC: Kx=5
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    w, h = st_["w"], st_["h"]
    hmax = 2 if sub else 1
    nb = []  # non-interleaved block geometry per component
    for ci in range(ch):
        hi = 2 if (sub and ci == 0) else 1
        nb.append(
            (-(-(-(-(h * hi) // hmax)) // 8), -(-(-(-(w * hi) // hmax)) // 8))
        )
    cond = (0, 1)
    kx = 5

    def sos(comp_ids, ss, se, ah, al):
        seg = bytes([len(comp_ids)])
        for cid in comp_ids:
            t = 0 if cid == 0 else 1
            seg += bytes([cid + 1, (t << 4) | t])
        return (
            b"\xff\xda"
            + struct.pack(">H", 6 + 2 * len(comp_ids))
            + seg
            + bytes([ss, se, (ah << 4) | al])
        )

    def dc_scan(al, refine):
        nonlocal out
        out += sos(list(range(ch)), 0, 0, 1 if refine else 0, al)
        enc = ArithEncoder()
        stats = {t: _ScanStats() for t in range(2 if ch == 3 else 1)}
        pred = [0] * ch
        dcctx = [0] * ch
        units = 0
        rst = 0
        for my in range(st_["mcuy"]):
            for mx in range(st_["mcux"]):
                if restart_interval and units and units % restart_interval == 0:
                    out += enc.flush() + bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) & 7
                    enc = ArithEncoder()
                    for s in stats.values():
                        s.reset()
                    pred = [0] * ch
                    dcctx = [0] * ch
                for ci in range(ch):
                    _gh, gw = st_["grids"][ci]
                    fy = 2 if (sub and ci == 0) else 1
                    t = 0 if ci == 0 else 1
                    for by, bx in st_["per_mcu"][ci]:
                        v0 = int(
                            st_["comp_coef"][ci][(my * fy + by) * gw + (mx * fy + bx)][0]
                        )
                        if refine:
                            enc.code((v0 >> al) & 1, stats[t].fixed, 0)
                        else:
                            v = v0 >> al
                            dcctx[ci] = _encode_dc(
                                enc, stats[t], cond, v - pred[ci], dcctx[ci]
                            )
                            pred[ci] = v
                units += 1
        out += enc.flush()

    def ac_scans(al, refine):
        nonlocal out
        for ci in range(ch):
            out += sos([ci], 1, 63, 1 if refine else 0, al)
            enc = ArithEncoder()
            t = 0 if ci == 0 else 1
            stats = {t: _ScanStats()}
            _gh, gw = st_["grids"][ci]
            nbh, nbw = nb[ci]
            units = 0
            rst = 0
            for row in range(nbh):
                for col in range(nbw):
                    if restart_interval and units and units % restart_interval == 0:
                        out += enc.flush() + bytes([0xFF, 0xD0 + rst])
                        rst = (rst + 1) & 7
                        enc = ArithEncoder()
                        stats[t].reset()
                    zz = st_["comp_coef"][ci][row * gw + col]
                    if refine:
                        _encode_ac_refine(enc, stats[t], zz, 1, 63, al)
                    else:
                        _encode_ac(enc, stats[t], kx, zz, 1, 63, al)
                    units += 1
            out += enc.flush()

    al_first = 1 if successive else 0
    dc_scan(al_first, refine=False)
    ac_scans(al_first, refine=False)
    if successive:
        dc_scan(0, refine=True)
        ac_scans(0, refine=True)
    out += b"\xff\xd9"
    return bytes(out)
