"""VP8 (RFC 6386) constant tables used by the lossy decoder/encoder pair.

Provenance note — read before trusting foreign bitstreams: this sandbox has
no network and no reference VP8 implementation, so these constants are
transcribed from RFC 6386 / libvpx FROM MEMORY and cannot be diffed against
the canonical text in-sandbox. The small tables (trees, coefficient bands,
zigzag, category extra-bit probabilities, mode probabilities, quantizer
lookups) are high-confidence transcriptions. The two large probability
tables (``KF_B_MODE_PROBS`` 10x10x9 and ``COEFF_UPDATE_PROBS`` /
``DEFAULT_COEFF_PROBS`` 4x8x3x11) are NOT reliably reproducible from
memory, so they are DOCUMENTED PLACEHOLDERS (uniform 128): entropy-coder
probabilities only affect compression ratio for bitstreams produced by this
repo's own paired encoder (which uses the identical tables), but a foreign
encoder's stream decodes against the true spec constants — with these
placeholders it would misparse. All *algorithms* (bool coder, header
layout, token trees, dequant, IWHT/IDCT, predictors, loop filter) follow
the spec exactly; swapping in the canonical table values is a data-only
change at this one seam.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Intra modes
# ---------------------------------------------------------------------------

DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4

(
    B_DC_PRED,
    B_TM_PRED,
    B_VE_PRED,
    B_HE_PRED,
    B_LD_PRED,
    B_RD_PRED,
    B_VR_PRED,
    B_VL_PRED,
    B_HD_PRED,
    B_HU_PRED,
) = range(10)

# Tree encoding: positive = internal node index, negative-ish handled by
# storing leaves as (-value - 1) < 0? We keep the RFC convention: leaves
# are encoded as negative numbers via two's-complement of the value, i.e.
# leaf(v) = -v; value 0 leaves use the fact that the RFC trees never need
# -0 ambiguity because we store leaves as (-v - 1) and decode accordingly.
# To stay close to the RFC text we instead store leaves as -(v + 1).


def leaf(v: int) -> int:
    return -(v + 1)


def leaf_value(x: int) -> int:
    return -x - 1


# RFC 6386 11.3: kf_ymode_tree / kf_ymode_prob
KF_Y_MODE_TREE = [leaf(B_PRED), 2, 4, 6, leaf(DC_PRED), leaf(V_PRED), leaf(H_PRED), leaf(TM_PRED)]
KF_Y_MODE_PROBS = [145, 156, 163, 128]

# RFC 6386 11.4: uv_mode_tree / kf_uv_mode_prob
UV_MODE_TREE = [leaf(DC_PRED), 2, leaf(V_PRED), 4, leaf(H_PRED), leaf(TM_PRED)]
KF_UV_MODE_PROBS = [142, 114, 183]

# RFC 6386 11.5: bmode_tree
B_MODE_TREE = [
    leaf(B_DC_PRED), 2,
    leaf(B_TM_PRED), 4,
    leaf(B_VE_PRED), 6,
    8, 12,
    leaf(B_HE_PRED), 10,
    leaf(B_RD_PRED), leaf(B_VR_PRED),
    leaf(B_LD_PRED), 14,
    leaf(B_VL_PRED), 16,
    leaf(B_HD_PRED), leaf(B_HU_PRED),
]

# PLACEHOLDER (see module docstring): kf_bmode_prob[above][left][9]
KF_B_MODE_PROBS = [[[128] * 9 for _ in range(10)] for _ in range(10)]

# mb_segment_tree
MB_SEGMENT_TREE = [2, 4, leaf(0), leaf(1), leaf(2), leaf(3)]

# ---------------------------------------------------------------------------
# Coefficient tokens (RFC 6386 13.2)
# ---------------------------------------------------------------------------

(
    ZERO_TOKEN,
    ONE_TOKEN,
    TWO_TOKEN,
    THREE_TOKEN,
    FOUR_TOKEN,
    CAT1_TOKEN,
    CAT2_TOKEN,
    CAT3_TOKEN,
    CAT4_TOKEN,
    CAT5_TOKEN,
    CAT6_TOKEN,
    EOB_TOKEN,
) = range(12)

COEFF_TREE = [
    leaf(EOB_TOKEN), 2,
    leaf(ZERO_TOKEN), 4,
    leaf(ONE_TOKEN), 6,
    8, 12,
    leaf(TWO_TOKEN), 10,
    leaf(THREE_TOKEN), leaf(FOUR_TOKEN),
    14, 16,
    leaf(CAT1_TOKEN), leaf(CAT2_TOKEN),
    18, 20,
    leaf(CAT3_TOKEN), leaf(CAT4_TOKEN),
    leaf(CAT5_TOKEN), leaf(CAT6_TOKEN),
]

# Extra-bit probabilities and base values per category (RFC 6386 13.2)
CAT_PROBS = {
    CAT1_TOKEN: [159],
    CAT2_TOKEN: [165, 145],
    CAT3_TOKEN: [173, 148, 140],
    CAT4_TOKEN: [176, 155, 140, 135],
    CAT5_TOKEN: [180, 157, 141, 134, 130],
    CAT6_TOKEN: [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
}
CAT_BASE = {
    ONE_TOKEN: 1,
    TWO_TOKEN: 2,
    THREE_TOKEN: 3,
    FOUR_TOKEN: 4,
    CAT1_TOKEN: 5,
    CAT2_TOKEN: 7,
    CAT3_TOKEN: 11,
    CAT4_TOKEN: 19,
    CAT5_TOKEN: 35,
    CAT6_TOKEN: 67,
}

# coeff band per coefficient position (RFC 6386 13.3)
COEFF_BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]

# zigzag scan order (RFC 6386 14.1)
ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

# PLACEHOLDERS (see module docstring): [block_type][band][ctx][11]
DEFAULT_COEFF_PROBS = [
    [[[128] * 11 for _ in range(3)] for _ in range(8)] for _ in range(4)
]
COEFF_UPDATE_PROBS = [
    [[[240] * 11 for _ in range(3)] for _ in range(8)] for _ in range(4)
]

# ---------------------------------------------------------------------------
# Quantizer lookups (RFC 6386 14.1) — high-confidence transcription
# ---------------------------------------------------------------------------

DC_QLOOKUP = [
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118,
    122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157,
]

AC_QLOOKUP = [
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108,
    110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201, 205, 209,
    213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
]

assert len(DC_QLOOKUP) == 128 and len(AC_QLOOKUP) == 128
