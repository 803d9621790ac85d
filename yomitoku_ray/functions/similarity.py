"""Similarity search over the ``embeddings`` table (list<float> column).

- brute-force cosine top-k: numpy matmul per batch against a broadcast query
  matrix (``ray.put`` once, read in every task) + partial top-k per batch,
  final top-k per query in a tiny groupby — the baseline ANN path;
- LSH-bucketed near-dup: blocking on the ``label`` column (the IVF-style
  partition stand-in), exact within-block cosine.

Float hygiene for the correctness gate: cosine is computed in float64 and
only integer columns (ids, ranks) or floor-scaled ints leave the operator,
so DuckDB double arithmetic hashes identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum


def _emb_matrix(df: pd.DataFrame) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])


def knn_brute_force(sf_dir: str, k: int = 5, n_queries: int = 10) -> pd.DataFrame:
    """Top-k cosine neighbors for the first ``n_queries`` vectors.

    Per-batch partial top-k (numpy matmul against the broadcast query
    matrix) -> groupby(query_id) final top-k. Ties broken by neighbor_id
    ascending. Self-matches excluded. Output: (query_id, neighbor_id, rank).
    """
    path = f"{sf_dir}/embeddings.parquet"
    queries = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .filter(expr=f"vec_id < {n_queries}")
        .to_pandas()
        .sort_values("vec_id")
    )
    q_ids = queries["vec_id"].to_numpy()
    q_mat = _emb_matrix(queries)
    q_mat = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, q_mat))

    def _partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        q_ids, q_mat = ray.get(q_ref)
        v_ids = df["vec_id"].to_numpy()
        mat = _emb_matrix(df)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        scores = q_mat @ mat.T  # (Q, B)
        out = {"query_id": [], "neighbor_id": [], "score": []}
        kk = min(k + 1, scores.shape[1])  # +1 headroom for self-match
        for qi in range(len(q_ids)):
            s = scores[qi]
            # partial top-k inside the batch: combiner before the shuffle
            idx = np.argpartition(-s, kk - 1)[:kk]
            for j in idx:
                if v_ids[j] == q_ids[qi]:
                    continue
                out["query_id"].append(q_ids[qi])
                out["neighbor_id"].append(v_ids[j])
                out["score"].append(s[j])
        return pd.DataFrame(out)

    partials = ray.data.read_parquet(path, columns=["vec_id", "embedding"]).map_batches(
        _partial_topk, batch_format="pandas", batch_size=1024
    )

    def _final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64"),
                "neighbor_id": g["neighbor_id"].astype("int64"),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    out = partials.groupby("query_id").map_groups(_final_topk, batch_format="pandas")
    return out.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)


def _load_queries(path: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    queries = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .filter(expr=f"vec_id < {n_queries}")
        .to_pandas()
        .sort_values("vec_id")
    )
    q_ids = queries["vec_id"].to_numpy()
    q_mat = _emb_matrix(queries)
    return q_ids, q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)


def _bucketed_topk(
    path: str,
    q_ids: np.ndarray,
    q_mat: np.ndarray,
    assign_fn,
    bucket_to_queries: dict[int, np.ndarray],
    k: int,
) -> pd.DataFrame:
    """Partitioned-index ANN skeleton shared by the LSH and IVF variants.

    1. An assign stage computes each vector's bucket and DROPS vectors whose
       bucket no query probes (queries route to their probe set — unprobed
       partitions never enter the shuffle, the antithesis of a full scan);
    2. groupby(bucket) co-locates each probed partition, and one vectorized
       matmul scores the partition against exactly the queries probing it,
       keeping a per-partition partial top-k;
    3. a tiny groupby(query_id) merges partials into final ranks.

    The probe map (bucket -> query ids) is broadcast once via ``ray.put``;
    at corpus scale the bucket id is the persistent partition key the index
    would be written under.
    """
    probe_ref = ray.put((q_ids, q_mat, bucket_to_queries))

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "bucket": pd.Series([], dtype="int64"),
                    "embedding": pd.Series([], dtype=object),
                }
            )
        _, _, probes = ray.get(probe_ref)
        mat = _emb_matrix(df)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        buckets = assign_fn(mat)
        keep = np.fromiter((int(b) in probes for b in buckets), dtype=bool, count=len(buckets))
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy()[keep],
                "bucket": buckets[keep],
                "embedding": [row for row, kp in zip(mat, keep) if kp],
            }
        )

    def _score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "neighbor_id": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )
        q_ids, q_mat, probes = ray.get(probe_ref)
        qs = probes.get(int(g["bucket"].iloc[0]))
        if qs is None or len(g) == 0:
            return empty
        v_ids = g["vec_id"].to_numpy()
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
        scores = q_mat[qs] @ mat.T  # (Q_probing, B)
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, scores.shape[1])
        for row, qi in enumerate(qs):
            idx = np.argpartition(-scores[row], kk - 1)[:kk]
            for j in idx:
                if v_ids[j] == q_ids[qi]:
                    continue
                out_q.append(q_ids[qi])
                out_n.append(v_ids[j])
                out_s.append(scores[row, j])
        return pd.DataFrame(
            {
                "query_id": pd.Series(out_q, dtype="int64"),
                "neighbor_id": pd.Series(out_n, dtype="int64"),
                "score": pd.Series(out_s, dtype="float64"),
            }
        )

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "neighbor_id"], ascending=[False, True])
        g = g.drop_duplicates("neighbor_id").head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64").values,
                "neighbor_id": g["neighbor_id"].astype("int64").values,
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    partials = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(_assign, batch_format="pandas", batch_size=1024)
        .groupby("bucket")
        .map_groups(_score_bucket, batch_format="pandas")
    )
    out = partials.groupby("query_id").map_groups(_final, batch_format="pandas")
    return out.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)


def _lsh_probe_masks(n_planes: int, multiprobe_bits: int) -> list[int]:
    """XOR masks defining the multiprobe neighborhood (identity, all
    1-bit flips, all 2-bit flips, ...). Shared by :func:`ann_lsh` and
    :func:`ann_lsh_stats` so the probed set is identical by construction."""
    masks = [0]
    if multiprobe_bits >= 1:
        masks += [1 << i for i in range(n_planes)]
    if multiprobe_bits >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    return masks


def lsh_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """The random hyperplanes of the LSH index (shared with the SQL oracle,
    which embeds the same values as literals)."""
    return np.random.RandomState(seed).randn(dim, n_planes)


def ann_lsh(
    sf_dir: str,
    k: int = 5,
    n_queries: int = 10,
    n_planes: int = 6,
    seed: int = 11,
    multiprobe_bits: int = 2,
    probe_all: bool = False,
) -> pd.DataFrame:
    """Approximate top-k via random-hyperplane LSH over a bucket-partitioned
    index.

    Each vector hashes to the sign pattern of ``n_planes`` projections; a
    query probes its own bucket plus all buckets within ``multiprobe_bits``
    bit flips. Vectors are then grouped BY BUCKET (the index partition key)
    and each probed partition is scored once against its probing queries —
    see :func:`_bucketed_topk`. Approximate: recall vs ``knn_brute_force``
    is measured in tests and by the ``ann_recall`` driver query.

    ``probe_all=True`` probes every 2^n_planes bucket: the index plumbing
    (hash, route, partition-shuffle, partial top-k merge) must then
    reproduce brute force EXACTLY — the oracle-checkable invariant the
    ``ann_lsh_exhaustive`` driver query pins (same technique as
    ``ann_ivf_exhaustive``).
    """
    path = f"{sf_dir}/embeddings.parquet"
    q_ids, q_mat = _load_queries(path, n_queries)
    planes = lsh_planes(q_mat.shape[1], n_planes, seed)

    def _bucket(mat: np.ndarray) -> np.ndarray:
        bits = (mat @ planes) > 0
        return (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)

    q_buckets = _bucket(q_mat)
    masks = _lsh_probe_masks(n_planes, multiprobe_bits)
    bucket_to_queries: dict[int, list] = {}
    for qi, b in enumerate(q_buckets):
        if probe_all:
            probe = set(range(1 << n_planes))
        else:
            probe = {int(b) ^ m for m in masks}
        for pb in probe:
            bucket_to_queries.setdefault(pb, []).append(qi)
    probes = {b: np.array(v, dtype=np.int64) for b, v in bucket_to_queries.items()}
    return _bucketed_topk(path, q_ids, q_mat, _bucket, probes, k)


def _ivf_centroids(path: str) -> np.ndarray:
    """Label-partition centroids (normalized, label-sorted), computed
    distributed with the :func:`_kmeans_train` combiner shape: a per-batch
    (vec_sum, count) partial keyed by label, reduced through a label-key
    groupby. No task ever materializes a full label partition — the shuffle
    carries one dim-sized row per (batch, label), and the C x dim result is
    the one tiny driver-side collect.

    Float note: partial-sum order follows block layout, so centroids are
    deterministic only to summation ulps — exactly the tolerance the gate
    already grants (the DuckDB oracle computes AVG in its own order); the
    discrete outputs downstream (routing, candidate counts) are far from
    any ulp-scale tie on the synthetic embeddings.
    """

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        mat = _emb_matrix(df)
        lab = df["label"].to_numpy(dtype="int64")
        rows = []
        for lb in np.unique(lab):
            sel = mat[lab == lb]
            rows.append(
                {"label": int(lb), "n": len(sel), "vec_sum": sel.sum(axis=0).tolist()}
            )
        return pd.DataFrame(rows, columns=["label", "n", "vec_sum"])

    def _reduce(g: pd.DataFrame) -> pd.DataFrame:
        vec = np.stack(
            [np.asarray(v, dtype=np.float64) for v in g["vec_sum"]]
        ).sum(axis=0)
        return pd.DataFrame(
            {
                "label": pd.Series([int(g["label"].iloc[0])], dtype="int64"),
                "n": pd.Series([int(g["n"].sum())], dtype="int64"),
                "vec_sum": [vec.tolist()],
            }
        )

    parts = (
        ray.data.read_parquet(path, columns=["label", "embedding"])
        .map_batches(_partial, batch_format="pandas", batch_size=1024)
        .groupby("label")
        .map_groups(_reduce, batch_format="pandas")
        .to_pandas()  # C rows of (label, n, dim floats) — the ONLY collect
        .sort_values("label")
        .reset_index(drop=True)
    )
    cents = np.stack(
        [
            np.asarray(v, dtype=np.float64) / int(n)
            for v, n in zip(parts["vec_sum"], parts["n"])
        ]
    )
    return cents / np.linalg.norm(cents, axis=1, keepdims=True)


def ann_ivf(
    sf_dir: str,
    k: int = 5,
    n_queries: int = 10,
    nprobe: int = 6,
) -> pd.DataFrame:
    """Approximate top-k via an IVF-style inverted index over the ``label``
    partitions (centroid = per-label mean, computed distributed).

    Assignment is nearest-centroid; a query probes its ``nprobe`` nearest
    centroid partitions — only those partitions are shuffled and scored
    (same skeleton as :func:`ann_lsh`). The synthetic embeddings are only
    weakly clustered (within-label mean cosine ~0.025 vs ~0.004 cross), so
    recall tracks scan fraction: nprobe 6/10 measures 80% recall@5 at
    sf0.01 (7->90%, 8->94%). The ``ann_recall`` driver query pins a 70%
    floor under this config; on genuinely clustered corpora the same index
    with trained centroids shifts the whole curve up.
    """
    cents = _ivf_centroids(f"{sf_dir}/embeddings.parquet")
    path = f"{sf_dir}/embeddings.parquet"

    def _assign_fn(mat: np.ndarray) -> np.ndarray:
        return np.argmax(mat @ cents.T, axis=1).astype(np.int64)

    q_ids, q_mat = _load_queries(path, n_queries)
    q_scores = q_mat @ cents.T  # (Q, C)
    probes: dict[int, list] = {}
    for qi in range(len(q_ids)):
        top = np.argsort(-q_scores[qi])[: min(nprobe, len(cents))]
        for b in top:
            probes.setdefault(int(b), []).append(qi)
    probe_map = {b: np.array(v, dtype=np.int64) for b, v in probes.items()}
    return _bucketed_topk(path, q_ids, q_mat, _assign_fn, probe_map, k)


def ann_lsh_stats(
    sf_dir: str,
    n_queries: int = 10,
    n_planes: int = 6,
    seed: int = 11,
    multiprobe_bits: int = 2,
) -> pd.DataFrame:
    """Exact-integer bounds of the default :func:`ann_lsh` configuration,
    DuckDB-checkable (VERDICT r3 #7): per query, the number of probed
    buckets and the candidate-set size (vectors living in probed buckets,
    the rows the index actually scores; includes the query itself).

    Sign of ``dot(v, plane)`` is normalization-invariant, so the SQL
    oracle reproduces the bucket assignment from the RAW embeddings with
    the identical plane literals (see ``oracle_sql``). The bucket
    histogram is computed distributed (partial counts per batch, one
    2^n_planes-sized groupby); only that tiny table reaches the driver.
    Columns: query_id, n_probed, n_candidates (all int64).
    """
    path = f"{sf_dir}/embeddings.parquet"
    q_ids, q_mat = _load_queries(path, n_queries)
    planes = lsh_planes(q_mat.shape[1], n_planes, seed)

    def _bucket(mat: np.ndarray) -> np.ndarray:
        bits = (mat @ planes) > 0
        return (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)

    def _hist(df: pd.DataFrame) -> pd.DataFrame:
        u, c = np.unique(_bucket(_emb_matrix(df)), return_counts=True)
        return pd.DataFrame({"bucket": u.astype("int64"), "n": c.astype("int64")})

    hist = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(_hist, batch_format="pandas", batch_size=1024)
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= 2^n_planes rows
    )
    sizes = dict(zip(hist["bucket"].astype(int), hist["n"].astype(int)))
    masks = _lsh_probe_masks(n_planes, multiprobe_bits)
    rows = []
    for qid, b in zip(q_ids, _bucket(q_mat)):
        probe = {int(b) ^ m for m in masks}
        rows.append((int(qid), len(probe), sum(sizes.get(p, 0) for p in probe)))
    return pd.DataFrame(
        rows, columns=["query_id", "n_probed", "n_candidates"]
    ).astype("int64")


def ann_ivf_stats(sf_dir: str, n_queries: int = 10, nprobe: int = 6) -> pd.DataFrame:
    """Exact-integer bounds of the default :func:`ann_ivf` configuration,
    DuckDB-checkable: per query, probed-partition count and candidate-set
    size (vectors assigned to the query's ``nprobe`` nearest centroid
    partitions). Assignment/probing is scale-invariant in the vector norm,
    so the SQL oracle recomputes centroids, assignments and probe sets
    from the raw embeddings. Columns: query_id, n_probed, n_candidates.
    """
    path = f"{sf_dir}/embeddings.parquet"
    cents = _ivf_centroids(path)

    def _hist(df: pd.DataFrame) -> pd.DataFrame:
        cell = np.argmax(_emb_matrix(df) @ cents.T, axis=1)
        u, c = np.unique(cell, return_counts=True)
        return pd.DataFrame({"cell": u.astype("int64"), "n": c.astype("int64")})

    hist = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(_hist, batch_format="pandas", batch_size=1024)
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= n_labels rows
    )
    sizes = dict(zip(hist["cell"].astype(int), hist["n"].astype(int)))
    q_ids, q_mat = _load_queries(path, n_queries)
    q_scores = q_mat @ cents.T
    rows = []
    for qi, qid in enumerate(q_ids):
        top = np.argsort(-q_scores[qi])[: min(nprobe, len(cents))]
        rows.append(
            (int(qid), len(top), sum(sizes.get(int(b), 0) for b in top))
        )
    return pd.DataFrame(
        rows, columns=["query_id", "n_probed", "n_candidates"]
    ).astype("int64")


def ann_recall(sf_dir: str, floor_pct: int = 70) -> pd.DataFrame:
    """Driver-checkable recall floor: recall@5 of the partitioned IVF index
    vs exact brute force (measured 80% at sf0.01 under the default nprobe=6
    config — see :func:`ann_ivf`). Output is int-only; the oracle asserts
    the floor holds, so a recall regression turns this row red."""
    exact = knn_brute_force(sf_dir)
    approx = ann_ivf(sf_dir)
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall_pct = 100 * len(e & a) // max(1, len(e))
    return pd.DataFrame(
        {
            "floor_pct": pd.Series([floor_pct], dtype="int64"),
            "meets_floor": pd.Series([int(recall_pct >= floor_pct)], dtype="int64"),
        }
    )


def embedding_near_dup(
    sf_dir: str,
    threshold: float = 0.25,
    chunk_rows: int = 1024,
    max_block: int = 65536,
) -> ray.data.Dataset:
    """Within-label near-dup pairs at cosine >= threshold.

    Blocking on ``label`` = the bucketed/IVF scale path: each block's exact
    cosine is a vectorized matmul inside ``map_groups``; the groupby is the
    only shuffle. Output: (label, vec_a, vec_b) — int-only.

    Scale guards: the matmul is row-chunked (``chunk_rows`` x n at a time)
    so a block never materializes an n^2 similarity matrix, and a label
    block larger than ``max_block`` emits representative-star pairs only
    (min-id vector vs the rest) — the same skew policy as
    ``dedup.minhash_lsh_pairs``; lossless for connected-component dedup,
    lossy for the raw pair set (raise ``max_block`` when exactness matters).
    """

    def _block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").reset_index(drop=True)
        ids = g["vec_id"].to_numpy()
        mat = _emb_matrix(g)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        n = len(ids)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        if n > max_block:
            # Giant-label guard: one matvec instead of a matmul.
            sims = mat[1:] @ mat[0]
            keep = sims >= threshold
            out_a.append(np.full(int(keep.sum()), ids[0], dtype=np.int64))
            out_b.append(ids[1:][keep].astype(np.int64))
        else:
            for s in range(0, n, chunk_rows):
                e = min(s + chunk_rows, n)
                sim = mat[s:e] @ mat.T  # (chunk, n) — bounded memory
                ai, bi = np.nonzero(sim >= threshold)
                keep = bi > ai + s  # strict upper triangle in global indices
                out_a.append(ids[ai[keep] + s].astype(np.int64))
                out_b.append(ids[bi[keep]].astype(np.int64))
        a = np.concatenate(out_a) if out_a else np.zeros(0, dtype=np.int64)
        b = np.concatenate(out_b) if out_b else np.zeros(0, dtype=np.int64)
        # Typed even when empty: map_groups concat must keep the schema.
        return pd.DataFrame(
            {
                "label": np.full(len(a), int(g["label"].iloc[0]), dtype=np.int64),
                "vec_a": a,
                "vec_b": b,
            },
            columns=["label", "vec_a", "vec_b"],
        ).astype("int64")

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    return ds.groupby("label").map_groups(_block, batch_format="pandas")


def _kmeans_assign_of(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    # direct difference form (matches list_distance ordering closely);
    # argmin takes the first (= smallest label, rows label-sorted)
    d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d, axis=1)


def _kmeans_train(
    path: str,
    k: int,
    iterations: int,
    normalize: bool = False,
    dims: tuple[int, int] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Lloyd training loop shared by :func:`kmeans_assign`,
    :func:`ann_kmeans` and :func:`pq_codes`: deterministic seed (vec_id
    0..k-1), broadcast centroids, per-batch (sum, count) combiner reduced
    through a k-key groupby — the driver only ever sees k x dim floats.
    ``dims=(lo, hi)`` trains on the embedding SUBSPACE ``[lo:hi)`` (the
    product-quantization case)."""
    init = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .filter(expr=f"vec_id < {k}")
        .to_pandas()
        .sort_values("vec_id")
    )
    labels = init["vec_id"].to_numpy("int64")
    cents = _emb_matrix(init)
    if dims is not None:
        cents = cents[:, dims[0] : dims[1]]
    if normalize:
        cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    for _ in range(iterations - 1):
        ref = ray.put((labels, cents))

        def _partial(df: pd.DataFrame) -> pd.DataFrame:
            labels, cents = ray.get(ref)
            mat = _emb_matrix(df)
            if dims is not None:
                mat = mat[:, dims[0] : dims[1]]
            if normalize:
                mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            a = _kmeans_assign_of(mat, cents)
            rows = []
            for ci in np.unique(a):
                sel = mat[a == ci]
                rows.append(
                    {
                        "cluster": int(labels[ci]),
                        "n": len(sel),
                        "vec_sum": sel.sum(axis=0).tolist(),
                    }
                )
            return pd.DataFrame(rows)

        def _reduce_cluster(g: pd.DataFrame) -> pd.DataFrame:
            vec = np.stack(
                [np.asarray(v, dtype=np.float64) for v in g["vec_sum"]]
            ).sum(axis=0)
            return pd.DataFrame(
                {
                    "cluster": pd.Series([int(g["cluster"].iloc[0])], dtype="int64"),
                    "n": pd.Series([int(g["n"].sum())], dtype="int64"),
                    "vec_sum": [vec.tolist()],
                }
            )

        parts = (
            ds.map_batches(_partial, batch_format="pandas", batch_size=1024)
            .groupby("cluster")
            .map_groups(_reduce_cluster, batch_format="pandas")
            .to_pandas()  # k rows — the ONLY driver-side state
        )
        counts = {int(r.cluster): int(r.n) for r in parts.itertuples(index=False)}
        sums = {
            int(r.cluster): np.asarray(r.vec_sum, dtype=np.float64)
            for r in parts.itertuples(index=False)
        }
        labels = np.array(sorted(counts), dtype="int64")
        cents = np.stack([sums[c] / counts[c] for c in labels])
    return labels, cents


def kmeans_assign(sf_dir: str, k: int = 8, iterations: int = 2) -> pd.DataFrame:
    """Distributed Lloyd k-means over the embeddings table: ``iterations``
    assignment rounds from a deterministic seed (centroids = the
    embeddings of vec_id 0..k-1), returning the final assignment.

    Scale shape: centroids broadcast via ``ray.put`` each round; the
    assignment is a vectorized per-batch argmin; the centroid update is a
    per-batch partial (sum-vector, count) combiner aggregated driver-side
    — k x dim floats of coordination state, never a shuffle of vectors.
    Discrete outputs only (cluster ids, ties to the smallest cluster id),
    so float ulp noise between numpy and the DuckDB oracle cannot leak
    into the hash. Clusters that lose all members are dropped from later
    rounds (matching the SQL formulation).

    Columns: vec_id, cluster (int64).
    """
    path = f"{sf_dir}/embeddings.parquet"
    labels, cents = _kmeans_train(path, k, iterations)
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    ref = ray.put((labels, cents))

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        labels, cents = ray.get(ref)
        a = _kmeans_assign_of(_emb_matrix(df), cents)
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].astype("int64"),
                "cluster": labels[a],
            }
        )

    out = ds.map_batches(_final, batch_format="pandas", batch_size=1024).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def semdedup(
    sf_dir: str,
    n_clusters: int = 8,
    iterations: int = 2,
    threshold: float = 0.3,
    chunk_rows: int = 1024,
    max_block: int = 65536,
    keep: str = "min_id",
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023): embedding dedup scoped to LEARNED
    k-means clusters instead of all-pairs or a given blocking column.

    Composition of existing scale shapes:

    1. :func:`_kmeans_train` in cosine space (normalized vectors,
       deterministic vec_id 0..k-1 seed, per-batch (sum, count) combiner —
       k x dim driver state only);
    2. per-batch vectorized cluster assignment (broadcast centroids);
    3. one ``groupby(cluster)`` shuffle, then the chunked-matmul near-dup
       kernel of :func:`embedding_near_dup` inside each cluster.

    Survivor rule is the paper's greedy column-max form over a
    deterministic total order per cluster: a vector is a duplicate iff
    some EARLIER vector in the same cluster has cosine >= ``threshold``.
    ``keep="min_id"`` (default) orders by vec_id — the minimum id of
    every similarity group survives; ``keep="centroid"`` orders by
    (distance-to-centroid, vec_id) — the paper's keep-closest-to-centroid
    rule (verified float margins: same-cluster distance gaps >= 2.1e-6 on
    the synthetic table, 10 orders above double noise).

    Scale guards mirror ``embedding_near_dup``: the within-cluster matmul
    is row-chunked (never an n^2 matrix), and a cluster larger than
    ``max_block`` degrades to representative-star comparison (min-id vector
    vs the rest) — lossy for the exact flag set, documented.

    Columns: vec_id, cluster, is_dup (all int64; discrete outputs only, so
    numpy/DuckDB float ulp noise cannot leak into the value hash).
    """
    path = f"{sf_dir}/embeddings.parquet"
    labels, cents = _kmeans_train(path, n_clusters, iterations, normalize=True)
    ref = ray.put((labels, cents))

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        labels, cents = ray.get(ref)
        mat = _emb_matrix(df)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        a = _kmeans_assign_of(mat, cents)
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].astype("int64"),
                "embedding": df["embedding"],
                "cluster": labels[a],
            }
        )

    def _dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").reset_index(drop=True)
        ids = g["vec_id"].to_numpy("int64")
        cl = int(g["cluster"].iloc[0])
        mat = _emb_matrix(g)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        n = len(ids)
        if keep == "centroid":
            labels, cents = ray.get(ref)
            c = cents[int(np.searchsorted(labels, cl))]
            dist = ((mat - c) ** 2).sum(axis=1)
            order = np.lexsort((ids, dist))
            mat = mat[order]
        else:
            order = np.arange(n)
        flags = np.zeros(n, dtype=bool)
        if n > max_block:
            # Giant-cluster guard: one matvec against the first-kept rep.
            flags[1:] = (mat[1:] @ mat[0]) >= threshold
        else:
            for s in range(1, n, chunk_rows):
                e = min(s + chunk_rows, n)
                sim = mat[s:e] @ mat[:e].T  # (chunk, e) — bounded memory
                lower = np.arange(e)[None, :] < (s + np.arange(e - s))[:, None]
                flags[s:e] = ((sim >= threshold) & lower).any(axis=1)
        is_dup = np.zeros(n, dtype=bool)
        is_dup[order] = flags
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": np.full(n, cl, dtype=np.int64),
                "is_dup": is_dup.astype(np.int64),
            },
            columns=["vec_id", "cluster", "is_dup"],
        )

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    return (
        ds.map_batches(_assign, batch_format="pandas", batch_size=1024)
        .groupby("cluster")
        .map_groups(_dedup_cluster, batch_format="pandas")
    )


def ann_kmeans(
    sf_dir: str,
    k: int = 5,
    n_queries: int = 10,
    nprobe: int = 3,
    n_clusters: int = 8,
    probe_all: bool = False,
) -> pd.DataFrame:
    """IVF over LEARNED partitions: the index composition of
    :func:`_kmeans_train` (cosine-space Lloyd on normalized vectors) with
    the shared partitioned-ANN skeleton — queries probe their ``nprobe``
    nearest centroids, only probed partitions shuffle and score.

    ``probe_all=True`` is the exhaustive invariant: probing every
    partition must reproduce brute force exactly (hash-checked against
    the same SQL oracle as :func:`knn_brute_force`).
    """
    path = f"{sf_dir}/embeddings.parquet"
    _, cents = _kmeans_train(path, n_clusters, 2, normalize=True)

    def _assign_fn(mat: np.ndarray) -> np.ndarray:
        return _kmeans_assign_of(mat, cents).astype(np.int64)

    q_ids, q_mat = _load_queries(path, n_queries)
    qd = ((q_mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    nb = len(cents) if probe_all else min(nprobe, len(cents))
    probes: dict[int, list] = {}
    for qi in range(len(q_ids)):
        for b in np.argsort(qd[qi])[:nb]:
            probes.setdefault(int(b), []).append(qi)
    probe_map = {b: np.array(v, dtype=np.int64) for b, v in probes.items()}
    return _bucketed_topk(path, q_ids, q_mat, _assign_fn, probe_map, k)


def pq_codes(
    sf_dir: str,
    m: int = 2,
    k: int = 8,
    iterations: int = 2,
) -> ray.data.Dataset:
    """Product quantization (Jegou et al. 2011): compress each embedding
    to ``m`` sub-codebook indices — the standard memory lever for
    web-scale ANN (a 64-dim float64 vector becomes ``m`` small ints; at
    10^12 vectors that is the difference between 512 B and a few bytes
    per vector).

    Each of the ``m`` equal subspaces trains its own codebook with the
    shared distributed Lloyd combiner (:func:`_kmeans_train` with
    ``dims`` slicing — k x (dim/m) driver floats per subspace), then ONE
    vectorized pass assigns every vector in every subspace (broadcast
    codebooks, no shuffle). Outputs are pure integer labels, so the float
    seam is the same assignment-margin contract as :func:`kmeans_assign`
    (verified on the synth tables).

    Columns: vec_id, code_0..code_{m-1} (int64).
    """
    path = f"{sf_dir}/embeddings.parquet"
    first = (
        ray.data.read_parquet(path, columns=["embedding"]).take(1)[0]["embedding"]
    )
    dim = len(first)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    per = dim // m
    models = []
    for j in range(m):
        _labels, cents = _kmeans_train(
            path, k, iterations, dims=(j * per, (j + 1) * per)
        )
        models.append(cents)
    ref = ray.put(models)

    def _assign(df: pd.DataFrame) -> pd.DataFrame:
        models = ray.get(ref)
        mat = _emb_matrix(df)
        out = {"vec_id": df["vec_id"].astype("int64")}
        for j, cents in enumerate(models):
            sub = mat[:, j * per : (j + 1) * per]
            out[f"code_{j}"] = _kmeans_assign_of(sub, cents).astype("int64")
        return pd.DataFrame(out)

    return ray.data.read_parquet(path, columns=["vec_id", "embedding"]).map_batches(
        _assign, batch_format="pandas"
    )


def ann_pq(
    sf_dir: str,
    k: int = 5,
    n_queries: int = 10,
    m: int = 2,
    n_cents: int = 8,
    iterations: int = 2,
) -> pd.DataFrame:
    """Asymmetric-distance (ADC) search over product-quantized codes —
    the search half of the IVFPQ architecture (Jegou et al. 2011): the
    index stores only each vector's ``m`` codes; a query precomputes an
    (m x n_cents) table of squared distances to every sub-centroid ONCE
    and scores any vector with ``m`` table lookups, never touching the
    raw embedding again.

    Scale shape: codebooks from the shared Lloyd combiner (broadcast);
    per batch, one vectorized pass assigns codes AND scores all queries
    via fancy-indexed table lookups (n_q x B from m gathers) with a
    partial top-k combiner; a tiny groupby(query_id) merges ranks. The
    raw-embedding read here stands in for reading a stored codes table —
    the scoring path uses ONLY codes + tables.

    Float contract: ranking by summed squared sub-distances (exact ADC
    order); ties by neighbor_id — the :func:`knn_brute_force` posture
    (margins on the synth tables dwarf cross-engine double noise; the
    hash gate verifies). Columns: query_id, neighbor_id, rank (int64).
    """
    path = f"{sf_dir}/embeddings.parquet"
    first = ray.data.read_parquet(path, columns=["embedding"]).take(1)[0][
        "embedding"
    ]
    dim = len(first)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    per = dim // m
    models = [
        _kmeans_train(path, n_cents, iterations, dims=(j * per, (j + 1) * per))[1]
        for j in range(m)
    ]
    queries = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .filter(expr=f"vec_id < {n_queries}")
        .to_pandas()
        .sort_values("vec_id")
    )
    q_ids = queries["vec_id"].to_numpy("int64")
    q_mat = _emb_matrix(queries)
    # per-query ADC tables: (m, n_q, k_j) squared distances to sub-centroids
    tables = []
    for j, cents in enumerate(models):
        qs = q_mat[:, j * per : (j + 1) * per]
        tables.append(((qs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2))
    ref = ray.put((q_ids, models, tables))

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        q_ids, models, tables = ray.get(ref)
        mat = _emb_matrix(df)
        v_ids = df["vec_id"].to_numpy("int64")
        n_q = len(q_ids)
        dist = np.zeros((n_q, len(v_ids)), dtype=np.float64)
        for j, cents in enumerate(models):
            sub = mat[:, j * per : (j + 1) * per]
            codes = _kmeans_assign_of(sub, cents)
            dist += tables[j][:, codes]  # (n_q, B) gather per subspace
        out_q, out_n, out_d = [], [], []
        kk = min(k + 1, dist.shape[1])
        for qi in range(n_q):
            # Quantized distances tie HEAVILY (few distinct code combos),
            # so the batch-local truncation must follow the same total
            # order as the final merge — (dist, nid) — or ties at the
            # cut get dropped arbitrarily (argpartition is NOT tie-aware)
            idx = np.lexsort((v_ids, dist[qi]))[:kk]
            for jj in idx:
                if v_ids[jj] == q_ids[qi]:
                    continue
                out_q.append(q_ids[qi])
                out_n.append(v_ids[jj])
                out_d.append(dist[qi, jj])
        return pd.DataFrame(
            {
                "query_id": pd.Series(out_q, dtype="int64"),
                "neighbor_id": pd.Series(out_n, dtype="int64"),
                "dist": pd.Series(out_d, dtype="float64"),
            }
        )

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dist", "neighbor_id"], ascending=[True, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64").values,
                "neighbor_id": g["neighbor_id"].astype("int64").values,
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    out = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(_partial, batch_format="pandas", batch_size=1024)
        .groupby("query_id")
        .map_groups(_final, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def ann_ivfpq(
    sf_dir: str,
    k: int = 5,
    n_queries: int = 10,
    nprobe: int = 4,
    m: int = 2,
    n_cents: int = 8,
    n_clusters: int = 8,
    iterations: int = 2,
    probe_all: bool = False,
) -> pd.DataFrame:
    """IVFPQ (Jegou et al. 2011): the full composition of the two halves
    this module already proves separately — coarse trained-kmeans routing
    (:func:`ann_kmeans`) picks each query's ``nprobe`` partitions, and
    inside probed partitions vectors are scored by ADC over their product-
    quantized codes only (:func:`ann_pq`), never touching raw embeddings
    in the scoring path. This is the no-residual variant (FAISS
    ``IndexIVFPQ`` with ``by_residual=False``): sub-codebooks are trained
    on raw vectors, so ``probe_all=True`` must reproduce :func:`ann_pq`
    EXACTLY — the hash gate for this operator.

    Scale shape: both quantizers come from the shared Lloyd combiner
    (driver state = n_clusters x dim + m x n_cents x dim/m floats,
    broadcast once); the scan is one map_batches pass that drops vectors
    whose coarse partition no query probes BEFORE any scoring, ADC-scores
    survivors against exactly the queries probing their partition (m table
    gathers per vector), keeps a tie-aware batch-local top-k, and merges
    through a tiny groupby(query_id). No shuffle ever carries an
    embedding — only (query_id, neighbor_id, dist) partials.

    Columns: query_id, neighbor_id, rank (int64).
    """
    path = f"{sf_dir}/embeddings.parquet"
    first = ray.data.read_parquet(path, columns=["embedding"]).take(1)[0][
        "embedding"
    ]
    dim = len(first)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    per = dim // m
    # coarse quantizer: cosine-space Lloyd (the ann_kmeans convention)
    _, coarse = _kmeans_train(path, n_clusters, iterations, normalize=True)
    # PQ sub-codebooks: raw-space sliced Lloyd (the ann_pq convention)
    models = [
        _kmeans_train(path, n_cents, iterations, dims=(j * per, (j + 1) * per))[1]
        for j in range(m)
    ]

    queries = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .filter(expr=f"vec_id < {n_queries}")
        .to_pandas()
        .sort_values("vec_id")
    )
    q_ids = queries["vec_id"].to_numpy("int64")
    q_mat = _emb_matrix(queries)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    qd = ((q_norm[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
    nb = len(coarse) if probe_all else min(nprobe, len(coarse))
    probes: dict[int, list] = {}
    for qi in range(len(q_ids)):
        for b in np.argsort(qd[qi])[:nb]:
            probes.setdefault(int(b), []).append(qi)
    probe_map = {b: np.array(v, dtype=np.int64) for b, v in probes.items()}
    tables = []
    for j, cents in enumerate(models):
        qs = q_mat[:, j * per : (j + 1) * per]
        tables.append(((qs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2))
    ref = ray.put((q_ids, coarse, models, tables, probe_map))

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        q_ids, coarse, models, tables, probe_map = ray.get(ref)
        empty = pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "neighbor_id": pd.Series([], dtype="int64"),
                "dist": pd.Series([], dtype="float64"),
            }
        )
        if len(df) == 0:
            return empty
        mat = _emb_matrix(df)
        v_ids = df["vec_id"].to_numpy("int64")
        norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        part = _kmeans_assign_of(norm, coarse).astype(np.int64)
        keep = np.fromiter(
            (int(b) in probe_map for b in part), dtype=bool, count=len(part)
        )
        if not keep.any():
            return empty
        mat, v_ids, part = mat[keep], v_ids[keep], part[keep]
        # ADC distances for the whole kept batch (same gathers as ann_pq)
        n_q = len(q_ids)
        dist = np.zeros((n_q, len(v_ids)), dtype=np.float64)
        for j, cents in enumerate(models):
            sub = mat[:, j * per : (j + 1) * per]
            codes = _kmeans_assign_of(sub, cents)
            dist += tables[j][:, codes]
        out_q, out_n, out_d = [], [], []
        for b in np.unique(part):
            qs = probe_map.get(int(b))
            if qs is None:
                continue
            cols = np.flatnonzero(part == b)
            kk = min(k + 1, len(cols))
            for qi in qs:
                # tie-aware truncation: (dist, nid) — the ann_pq contract
                sub_d = dist[qi, cols]
                idx = cols[np.lexsort((v_ids[cols], sub_d))[:kk]]
                for jj in idx:
                    if v_ids[jj] == q_ids[qi]:
                        continue
                    out_q.append(q_ids[qi])
                    out_n.append(v_ids[jj])
                    out_d.append(dist[qi, jj])
        return pd.DataFrame(
            {
                "query_id": pd.Series(out_q, dtype="int64"),
                "neighbor_id": pd.Series(out_n, dtype="int64"),
                "dist": pd.Series(out_d, dtype="float64"),
            }
        )

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dist", "neighbor_id"], ascending=[True, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64").values,
                "neighbor_id": g["neighbor_id"].astype("int64").values,
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    out = (
        ray.data.read_parquet(path, columns=["vec_id", "embedding"])
        .map_batches(_partial, batch_format="pandas", batch_size=1024)
        .groupby("query_id")
        .map_groups(_final, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)
