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


def ann_lsh(
    sf_dir: str,
    k: int = 5,
    n_queries: int = 10,
    n_planes: int = 12,
    seed: int = 11,
    multiprobe_bits: int = 1,
) -> pd.DataFrame:
    """Approximate top-k via random-hyperplane LSH bucketing (scale path).

    Each vector hashes to the sign pattern of ``n_planes`` projections; a
    query only scores vectors whose bucket is within ``multiprobe_bits``
    Hamming distance of its own (multiprobe). Same partial-top-k skeleton as
    the brute-force baseline, but each batch scores only candidates — at
    corpus scale this is the bucketed/IVF posture: the bucket id is also a
    valid groupby/partition key. Output (query_id, neighbor_id, rank);
    approximate — recall measured against ``knn_brute_force`` in tests.
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

    dim = q_mat.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.randn(dim, n_planes)

    def _bucket(mat: np.ndarray) -> np.ndarray:
        bits = (mat @ planes) > 0
        return (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)

    q_buckets = _bucket(q_mat)
    # Multiprobe: allowed buckets per query = own bucket + single-bit flips.
    allowed = []
    for b in q_buckets:
        s = {int(b)}
        if multiprobe_bits >= 1:
            s.update(int(b) ^ (1 << i) for i in range(n_planes))
        allowed.append(s)
    state_ref = ray.put((q_ids, q_mat, planes, allowed))

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        q_ids, q_mat, planes, allowed = ray.get(state_ref)
        v_ids = df["vec_id"].to_numpy()
        mat = _emb_matrix(df)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        buckets = _bucket(mat)
        out = {"query_id": [], "neighbor_id": [], "score": []}
        for qi in range(len(q_ids)):
            cand = np.array(
                [j for j in range(len(v_ids)) if int(buckets[j]) in allowed[qi]],
                dtype=np.int64,
            )
            if len(cand) == 0:
                continue
            s = q_mat[qi] @ mat[cand].T
            kk = min(k + 1, len(cand))
            idx = np.argpartition(-s, kk - 1)[:kk]
            for j in idx:
                if v_ids[cand[j]] == q_ids[qi]:
                    continue
                out["query_id"].append(q_ids[qi])
                out["neighbor_id"].append(v_ids[cand[j]])
                out["score"].append(s[j])
        return pd.DataFrame(out)

    partials = ray.data.read_parquet(path, columns=["vec_id", "embedding"]).map_batches(
        _partial, batch_format="pandas", batch_size=1024
    )

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "neighbor_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64").values,
                "neighbor_id": g["neighbor_id"].astype("int64").values,
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    out = partials.groupby("query_id").map_groups(_final, batch_format="pandas")
    return out.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)


def embedding_near_dup(sf_dir: str, threshold: float = 0.25) -> ray.data.Dataset:
    """Within-label near-dup pairs at cosine >= threshold.

    Blocking on ``label`` = the bucketed/IVF scale path: each block's exact
    cosine is a vectorized matmul inside ``map_groups``; the groupby is the
    only shuffle. Output: (label, vec_a, vec_b) — int-only.
    """

    def _block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").reset_index(drop=True)
        ids = g["vec_id"].to_numpy()
        mat = _emb_matrix(g)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sim = mat @ mat.T
        ai, bi = np.triu_indices(len(ids), k=1)
        keep = sim[ai, bi] >= threshold
        # Typed even when empty: map_groups concat must keep the schema.
        return pd.DataFrame(
            {
                "label": np.full(int(keep.sum()), int(g["label"].iloc[0]), dtype=np.int64),
                "vec_a": ids[ai[keep]].astype(np.int64),
                "vec_b": ids[bi[keep]].astype(np.int64),
            },
            columns=["label", "vec_a", "vec_b"],
        ).astype("int64")

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    return ds.groupby("label").map_groups(_block, batch_format="pandas")
