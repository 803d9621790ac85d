"""Vectorized single-block MD5 over batches of short ASCII messages.

The deterministic corpus-sampling predicate (``dedup.corpus_sample``,
``clean.contamination_check``) is ``md5(str(doc_id)) % mod`` — previously a
per-row ``hashlib`` loop, the only per-row Python in otherwise vectorized
stages (VERDICT r3 item #5). A decimal int64 is at most 20 ASCII bytes, well
under MD5's 55-byte single-block limit, so the whole batch reduces to 64
rounds of uint32 numpy lane arithmetic — one MD5 computed across N messages
simultaneously. Output is bit-identical to ``hashlib.md5`` (pinned by
tests/test_md5_vec.py against hashlib directly).

Public MD5 algorithm per RFC 1321; this is an original numpy formulation.
"""

from __future__ import annotations

import numpy as np

# Per-round left-rotate amounts and sine-derived constants (RFC 1321).
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4
    + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_K = np.floor(np.abs(np.sin(np.arange(1, 65, dtype=np.float64))) * 2**32).astype(
    np.uint64
).astype(np.uint32)

_INIT = (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476)


def _rotl(x: np.ndarray, s: int) -> np.ndarray:
    return (x << np.uint32(s)) | (x >> np.uint32(32 - s))


_CHUNK = 1 << 16  # lanes per pass: keeps the working set in cache


def _md5_blocks(blocks: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(N, 64) uint8 padded single blocks -> (a, b) uint32 digest words."""
    n = len(blocks)
    out_a = np.empty(n, dtype=np.uint32)
    out_b = np.empty(n, dtype=np.uint32)
    for lo in range(0, n, _CHUNK):
        hi = min(lo + _CHUNK, n)
        # transpose so m[g] is a contiguous lane vector per round
        m = np.ascontiguousarray(
            np.ascontiguousarray(blocks[lo:hi]).view("<u4").reshape(hi - lo, 16).T
        )
        A = np.full(hi - lo, _INIT[0], dtype=np.uint32)
        B = np.full(hi - lo, _INIT[1], dtype=np.uint32)
        C = np.full(hi - lo, _INIT[2], dtype=np.uint32)
        D = np.full(hi - lo, _INIT[3], dtype=np.uint32)
        with np.errstate(over="ignore"):
            for i in range(64):
                if i < 16:
                    f = (B & C) | (~B & D)
                    g = i
                elif i < 32:
                    f = (D & B) | (~D & C)
                    g = (5 * i + 1) % 16
                elif i < 48:
                    f = B ^ C ^ D
                    g = (3 * i + 5) % 16
                else:
                    f = C ^ (B | ~D)
                    g = (7 * i) % 16
                f += A
                f += _K[i]
                f += m[g]
                A, D, C = D, C, B
                B = C + _rotl(f, int(_S[i]))
            out_a[lo:hi] = np.uint32(_INIT[0]) + A
            out_b[lo:hi] = np.uint32(_INIT[1]) + B
    return out_a, out_b


def md5_u64_of_ints(ids: np.ndarray) -> np.ndarray:
    """u64 of the first 8 md5 digest bytes (little-endian) of ``str(id)``
    per element — the vectorized twin of ``dedup._md5_u64(str(int(i)))``
    and of DuckDB's predicate on the same decimal strings."""
    ids = np.asarray(ids, dtype=np.int64)
    if ids.size == 0:
        return np.zeros(0, dtype=np.uint64)
    # int64 -> fixed-width unicode; codepoints are the ASCII bytes,
    # zero-padded on the right (numpy U-arrays null-pad after the text).
    strs = ids.astype("U21")
    codes = strs.view(np.uint32).reshape(ids.size, 21)
    lengths = (codes != 0).sum(axis=1)
    blocks = np.zeros((ids.size, 64), dtype=np.uint8)
    blocks[:, :21] = codes.astype(np.uint8)
    blocks[np.arange(ids.size), lengths] = 0x80
    # bit length as little-endian u64 in bytes 56..63
    blocks.view("<u8")[:, 7] = lengths.astype(np.uint64) * 8
    a, b = _md5_blocks(blocks)
    return a.astype(np.uint64) | (b.astype(np.uint64) << np.uint64(32))
