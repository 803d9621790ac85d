"""Vectorized single-block MD5 must be bit-identical to hashlib."""
import hashlib

import numpy as np

from yomitoku_ray.kernels.md5_vec import md5_u64_of_ints


def _ref(i: int) -> int:
    return int.from_bytes(hashlib.md5(str(int(i)).encode()).digest()[:8], "little")


def test_matches_hashlib_on_edge_and_random_ids():
    rng = np.random.default_rng(7)
    ids = np.concatenate(
        [
            rng.integers(-(2**62), 2**62, 2000),
            np.array([0, 1, -1, 9, 10, 2**63 - 1, -(2**63) + 1, 10**18]),
        ]
    ).astype(np.int64)
    ref = np.array([_ref(i) for i in ids], dtype=np.uint64)
    assert np.array_equal(md5_u64_of_ints(ids), ref)


def test_empty_and_chunk_boundary():
    assert md5_u64_of_ints(np.array([], dtype=np.int64)).shape == (0,)
    n = (1 << 16) + 3  # crosses the internal chunk boundary
    ids = np.arange(n, dtype=np.int64)
    out = md5_u64_of_ints(ids)
    for i in (0, 1, (1 << 16) - 1, 1 << 16, n - 1):
        assert int(out[i]) == _ref(i)
