"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale posture (the 100 TB story, per SURVEY §2.7 / the north rule):
- exact dedup is a hash-partitioned groupby on a content hash computed
  vectorized in ``map_batches`` — the only shuffle, keyed by digest (uniform,
  no skew);
- MinHash-LSH explodes each doc into (band, band_hash) keys and groups by
  the banded key — candidate generation is a shuffle whose key space is
  uniform by construction; candidate *verification* re-reads only candidate
  docs. In this repo the verification side is broadcast (``ray.put`` of the
  candidate docs' shingle sets) because candidate sets are small; at corpus
  scale the documented alternative is a hash-bucketed self-join on doc_id
  (add bucket = hash(doc_id) % B to both sides, group and verify per
  bucket).
- SimHash uses the pigeonhole trick: any pair within Hamming distance d
  shares at least one of (d+1) signature chunks verbatim — grouping by chunk
  value finds all candidates with a uniform shuffle key.

All signatures are computed from stable hashes (blake2b / crc32), never
Python's salted ``hash()``.
"""

from __future__ import annotations

import hashlib
import itertools
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Min

_MERSENNE = (1 << 61) - 1


def _stable_u64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def _md5_batch(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "text_hash": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in df["text"].fillna("")],
        }
    )


def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Hash-partitioned exact dedup: first (min doc_id) wins per content hash.

    groupby on the digest: uniform key distribution, no salting needed.
    """
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = ds.map_batches(_md5_batch, batch_format="pandas")
    return ds.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="keep_doc_id"),
        Count(alias_name="n_copies"),
    )


# ---------------------------------------------------------------------------
# Shingles + MinHash-LSH
# ---------------------------------------------------------------------------


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """k-token shingles as stable u64 hashes (sorted unique)."""
    toks = text.split()
    if len(toks) < k:
        shingles = {" ".join(toks)} if toks else set()
    else:
        shingles = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    if not shingles:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(
        np.fromiter((_stable_u64(s) for s in shingles), dtype=np.uint64, count=len(shingles))
    )


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Affine uint64 hash (odd multiplier, mod-2^64 wraparound) row-min over
    shingles; empty docs get an all-max sentinel. The wraparound family is a
    standard multiply-shift-style universal hash — ~300x faster than bignum
    (a*x+b) mod p with indistinguishable MinHash estimates (the signature
    similarity properties are asserted in tests)."""
    if len(sh) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        m = sh[:, None] * a[None, :] + b[None, :]
    return m.min(axis=0)


class _MinHashBands:
    """Actor-pool stage: doc -> (band_id, band_hash, doc_id) rows."""

    def __init__(self, num_perm: int, bands: int, shingle_k: int):
        self.a, self.b = _minhash_params(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_band, out_hash, out_doc = [], [], []
        for doc_id, text in zip(doc_ids, texts):
            sig = minhash_signature(shingle_hashes(text or "", self.k), self.a, self.b)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                h = zlib.crc32(chunk.tobytes())
                out_band.append(band)
                out_hash.append(h)
                out_doc.append(doc_id)
        return pa.table(
            {
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
                "doc_id": pa.array(out_doc, pa.int64()),
            }
        )


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(group["doc_id"].tolist())
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
    pairs = list(itertools.combinations(ids, 2))
    return pd.DataFrame(pairs, columns=["doc_a", "doc_b"])


def minhash_lsh_pairs(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> pd.DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with exact Jaccard.

    shingle -> minhash -> band -> groupby(band, band_hash) -> candidate
    pairs -> verify. Returns (doc_a, doc_b, jaccard_pct) with jaccard_pct an
    exact integer percentage (floor), sorted — float-free output.
    """
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    banded = ds.map_batches(
        _MinHashBands,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "bands": bands,
            "shingle_k": shingle_k,
        },
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    cand = banded.groupby(["band_id", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    cand_df = cand.to_pandas()
    if len(cand_df) == 0:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard_pct": []}).astype("int64")
    cand_df = cand_df.drop_duplicates().reset_index(drop=True)

    # Verification: broadcast the candidate docs' shingle sets (small side —
    # see module docstring for the at-scale bucketed-join alternative).
    need = sorted(set(cand_df["doc_a"]) | set(cand_df["doc_b"]))
    docs = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .filter(expr=f"doc_id in {need}")
        .to_pandas()
    )
    sh = {r.doc_id: shingle_hashes(r.text or "", shingle_k) for r in docs.itertuples()}
    sh_ref = ray.put(sh)

    def _verify(df: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(sh_ref)
        keep_a, keep_b, keep_j = [], [], []
        for a_id, b_id in zip(df["doc_a"], df["doc_b"]):
            sa, sb = table.get(a_id), table.get(b_id)
            if sa is None or sb is None or len(sa) == 0 or len(sb) == 0:
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            j = inter / union
            if j >= threshold:
                keep_a.append(a_id)
                keep_b.append(b_id)
                keep_j.append(int(j * 100))
        return pd.DataFrame(
            {"doc_a": keep_a, "doc_b": keep_b, "jaccard_pct": keep_j}
        ).astype("int64")

    verified = (
        ray.data.from_pandas(cand_df)
        .map_batches(_verify, batch_format="pandas")
        .to_pandas()
    )
    return verified.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over token features (stable hashes, unit weights)."""
    toks = text.split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = _stable_u64(t)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += bits.astype(np.int64) * 2 - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


class _SimHashChunks:
    """doc -> (chunk_id, chunk_value, doc_id, simhash) rows (pigeonhole)."""

    def __init__(self, n_chunks: int):
        self.n_chunks = n_chunks
        self.chunk_bits = 64 // n_chunks

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        rows = {"chunk_id": [], "chunk_value": [], "doc_id": [], "simhash": []}
        mask = (1 << self.chunk_bits) - 1
        for doc_id, text in zip(doc_ids, texts):
            sh = simhash64(text or "")
            for c in range(self.n_chunks):
                rows["chunk_id"].append(c)
                rows["chunk_value"].append((sh >> (c * self.chunk_bits)) & mask)
                rows["doc_id"].append(doc_id)
                rows["simhash"].append(sh - (1 << 63))  # signed storage
        return pa.table(
            {
                "chunk_id": pa.array(rows["chunk_id"], pa.int32()),
                "chunk_value": pa.array(rows["chunk_value"], pa.int64()),
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "simhash": pa.array(rows["simhash"], pa.int64()),
            }
        )


def _simhash_bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    rows = sorted(zip(group["doc_id"], group["simhash"]))
    out = {"doc_a": [], "doc_b": [], "sim_a": [], "sim_b": []}
    for (a_id, a_sh), (b_id, b_sh) in itertools.combinations(rows, 2):
        out["doc_a"].append(a_id)
        out["doc_b"].append(b_id)
        out["sim_a"].append(a_sh)
        out["sim_b"].append(b_sh)
    return pd.DataFrame(out).astype("int64")


def simhash_dup_pairs(sf_dir: str, n_chunks: int = 4, hamming_max: int = 3) -> pd.DataFrame:
    """Near-dup pairs with Hamming(simhash) <= hamming_max.

    n_chunks must be > hamming_max for pigeonhole completeness.
    Returns (doc_a, doc_b, hamming) sorted; int-only output.
    """
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    chunked = ds.map_batches(
        _SimHashChunks,
        fn_constructor_kwargs={"n_chunks": n_chunks},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    cand = chunked.groupby(["chunk_id", "chunk_value"]).map_groups(
        _simhash_bucket_pairs, batch_format="pandas"
    )
    df = cand.to_pandas()
    if len(df) == 0:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []}).astype("int64")
    df = df.drop_duplicates(subset=["doc_a", "doc_b"]).reset_index(drop=True)
    a = (df["sim_a"].to_numpy() + (1 << 63)).astype(np.uint64)
    b = (df["sim_b"].to_numpy() + (1 << 63)).astype(np.uint64)
    x = a ^ b
    ham = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        ham += (x & 1).astype(np.int64)
        x >>= 1
    df["hamming"] = ham
    df = df[df["hamming"] <= hamming_max][["doc_a", "doc_b", "hamming"]]
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Blocked exact n-gram Jaccard
# ---------------------------------------------------------------------------


def _block_jaccard(group: pd.DataFrame, k: int, threshold: float) -> pd.DataFrame:
    rows = sorted(zip(group["doc_id"], group["text"]))
    shs = [(doc_id, shingle_hashes(t or "", k)) for doc_id, t in rows]
    out = {"doc_a": [], "doc_b": [], "jaccard_pct": []}
    for (a_id, sa), (b_id, sb) in itertools.combinations(shs, 2):
        if len(sa) == 0 or len(sb) == 0:
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        j = inter / union
        if j >= threshold:
            out["doc_a"].append(a_id)
            out["doc_b"].append(b_id)
            out["jaccard_pct"].append(int(j * 100))
    return pd.DataFrame(out).astype("int64")


def ngram_jaccard_pairs(sf_dir: str, k: int = 3, threshold: float = 0.2) -> ray.data.Dataset:
    """Exact k-token-shingle Jaccard within ``source`` blocks.

    Blocking on an existing key keeps the pairwise work per-group; the
    groupby is the shuffle. Int-only output columns.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return ds.groupby("source").map_groups(
        lambda g: _block_jaccard(g, k, threshold), batch_format="pandas"
    )
