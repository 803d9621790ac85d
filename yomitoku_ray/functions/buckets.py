"""Coarse-bucket sizing for the wide shuffles.

Every heavy exchange in this package (minhash banding, simhash chunks,
dup-component propagation, window/segment/bigram explodes, the relational
per-entity kernels) shuffles on ``key & mask`` where ``mask = n_buckets - 1``
and a WHOLE bucket is later held in ONE ``map_groups`` pandas frame. The
bucket count therefore sets peak per-task memory: it must scale with the
input, not sit at a constant.

Sizing rule (the ``CorpusConfig.digest_buckets`` treatment, promoted here):

    n_buckets = next_pow2(shuffled_bytes / bytes_per_bucket)
                clamped to [1024, 2**22]

- ``shuffled_bytes`` is estimated as input parquet FILE bytes times a
  per-operator ``expansion`` factor: ~1 for row-shaped exchanges (pair
  graphs, per-entity event rows), ~16 for token-window explodes where one
  compressed input byte becomes an occurrence row (window text + ids,
  measured ~10-20x at the test scales).
- ``bytes_per_bucket`` targets what one map_groups task should hold in its
  heap; 64 MiB of estimated exchange bytes leaves an order of magnitude of
  headroom against pandas overhead inside a multi-GiB worker heap.
- The floor (1024) amortizes per-group overhead (~90 us per map_groups
  group measured in round 2 — the reason these shuffles are coarse at all);
  the cap (4M buckets) bounds the shuffle's metadata at any input size.

Result invariance: the bucket key only co-locates work — every operator
computes exact within-bucket results and the union over buckets is the
answer, so output is invariant to ``n_buckets`` (pinned by
``tests/test_bucket_invariance.py`` at two counts). At 100 TB a token
explode (~10**14 shuffled bytes) resolves to the 2**22 cap: ~25 MB per
bucket, still one comfortable task.

Every public operator that shuffles coarsely takes ``n_buckets: int | None``
— ``None`` applies this rule to its input files; an explicit power of two
overrides it.
"""

from __future__ import annotations

import os

BYTES_PER_BUCKET = 64 * 2**20
MIN_BUCKETS = 1024
MAX_BUCKETS = 1 << 22


def input_bytes(paths: str | list[str] | tuple[str, ...]) -> int:
    """Total file bytes under the given file/directory paths (0 when a
    path cannot be stat'ed — e.g. a non-local filesystem — which falls the
    sizing back to the floor; pass ``n_buckets`` explicitly there)."""
    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    total = 0
    for p in paths:
        try:
            if os.path.isdir(p):
                for root, _, files in os.walk(p):
                    for f in files:
                        total += os.path.getsize(os.path.join(root, f))
            else:
                total += os.path.getsize(p)
        except OSError:
            continue
    return total


def n_buckets_for(
    paths: str | list[str] | tuple[str, ...],
    *,
    expansion: float = 1.0,
    bytes_per_bucket: int = BYTES_PER_BUCKET,
) -> int:
    est = input_bytes(paths) * expansion
    n = MIN_BUCKETS
    while n < MAX_BUCKETS and n * bytes_per_bucket < est:
        n <<= 1
    return n


def resolve_mask(
    n_buckets: int | None = None,
    *,
    paths: str | list[str] | tuple[str, ...] | None = None,
    expansion: float = 1.0,
) -> int:
    """The ``key & mask`` mask for a coarse shuffle: explicit ``n_buckets``
    (validated power of two) wins; else the sizing rule over ``paths``;
    else the floor."""
    if n_buckets is not None:
        if n_buckets < 1 or (n_buckets & (n_buckets - 1)) != 0:
            raise ValueError(f"n_buckets must be a positive power of two, got {n_buckets}")
        return n_buckets - 1
    if paths is not None:
        return n_buckets_for(paths, expansion=expansion) - 1
    return MIN_BUCKETS - 1
