"""Property-based tests (hypothesis) for the round-4 kernels: codec round
trips and bit-identity twins must hold on arbitrary inputs, not just the
fixed fixtures."""
import hashlib

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from yomitoku_ray.kernels.bmp import decode_bmp, encode_bmp
from yomitoku_ray.kernels.md5_vec import md5_u64_of_ints
from yomitoku_ray.kernels.tiff import _LzwWriter, _lzw_decode, decode_tiff, encode_tiff


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=50))
def test_md5_vec_matches_hashlib(ids):
    arr = np.array(ids, dtype=np.int64)
    want = np.array(
        [
            int.from_bytes(hashlib.md5(str(int(i)).encode()).digest()[:8], "little")
            for i in arr
        ],
        dtype=np.uint64,
    )
    assert np.array_equal(md5_u64_of_ints(arr), want)


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=4000))
def test_lzw_roundtrip_arbitrary_bytes(data):
    if not data:
        return
    assert _lzw_decode(_LzwWriter().encode(data), len(data)) == data


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.booleans(),
    st.integers(0, 2**32 - 1),
)
def test_bmp_tiff_roundtrip_arbitrary_shapes(h, w, gray, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w) if gray else (h, w, 3), np.uint8)
    want = img if img.ndim == 3 else np.repeat(img[:, :, None], 3, axis=2)
    assert np.array_equal(decode_bmp(encode_bmp(img)), want)
    for kw in ({}, {"packbits": True}, {"lzw": True}, {"lzw": True, "predictor": True}):
        assert np.array_equal(decode_tiff(encode_tiff([img], **kw))[0], want), kw


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcx", min_size=1, max_size=8), min_size=1, max_size=6
    ),
    st.lists(
        st.tuples(
            st.text(alphabet="abcx", min_size=1, max_size=2),
            st.text(alphabet="abcx", min_size=1, max_size=2),
        ),
        max_size=6,
    ),
)
def test_bpe_apply_matches_reference_loop(words, merges):
    from yomitoku_ray.functions.bpe import bpe_token_counts

    def ref_apply(word):
        symbols = list(word)
        for a, b in merges:
            i = 0
            while i < len(symbols) - 1:
                if symbols[i] == a and symbols[i + 1] == b:
                    symbols[i : i + 2] = [a + b]
                else:
                    i += 1
        return len(symbols)

    got = bpe_token_counts(pd.Series(words), merges)
    assert got.tolist() == [ref_apply(w) for w in words]


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.integers(3, 4),
    st.integers(0, 8),
    st.sampled_from([None, 0, 1, 5, 7, 11, 12, 13]),
    st.booleans(),
    st.integers(0, 2**32 - 1),
)
def test_webp_roundtrip_property(h, w, ch, cache_bits, predictor, subg, seed):
    """Any uint8 image survives encode->decode bit-exactly under any
    option combination (the decoder paths compose)."""
    import numpy as np

    from yomitoku_ray.kernels.webp import decode_webp, encode_webp_lossless

    px = np.random.RandomState(seed).randint(0, 256, (h, w, ch), dtype=np.uint8)
    blob = encode_webp_lossless(
        px, cache_bits=cache_bits, predictor=predictor, subtract_green=subg
    )
    assert np.array_equal(decode_webp(blob), px)
