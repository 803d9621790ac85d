"""BPE training + application semantics (genuine merges, VERDICT r3 #8)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from yomitoku_ray.functions.bpe import (
    DEFAULT_MERGES,
    bpe_token_counts,
    bpe_train,
    bpe_train_wordfreq,
)


def test_train_classic_example():
    """Sennrich et al.'s worked example: {low, lower, newest, widest}."""
    freq = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train_wordfreq(freq, 4)
    # e+s occurs 9x (newest+widest) -> first; then es+t 9x; then est+? vs lo..
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    # subsequent ranks: 'lo' (7) beats 'w e'/'w i' etc.
    assert ("l", "o") in merges[:4]


def test_apply_matches_reference_greedy():
    """Sequential rank-order replacement == the reference iterative
    lowest-rank merge loop (greedy first occurrence), incl. overlap runs."""

    def ref_apply(word, merges):
        symbols = list(word)
        for a, b in merges:  # symbols from later merges can't feed earlier ones
            i = 0
            while i < len(symbols) - 1:
                if symbols[i] == a and symbols[i + 1] == b:
                    symbols[i : i + 2] = [a + b]
                else:
                    i += 1
        return len(symbols)

    merges = [("a", "a"), ("aa", "b"), ("x", "y"), ("xy", "xy")]
    words = ["aaa", "aaaa", "aab", "aaab", "baaab", "xyxy", "xyxyxy", "q", ""]
    got = bpe_token_counts(pd.Series(words), merges)
    want = [ref_apply(w, merges) for w in words]
    assert got.tolist() == want
    assert got.tolist()[:3] == [2, 2, 1]  # aaa->(aa,a), aaaa->(aa,aa), aab->(aab)


def test_default_merges_frozen_and_effective():
    assert len(DEFAULT_MERGES) == 80
    # the corpus's high-frequency words collapse to single tokens
    counts = bpe_token_counts(pd.Series(["window", "stream", "query", "zzz"]))
    assert counts.tolist()[:3] == [1, 1, 1]
    assert counts[3] == 3  # unseen word stays at character granularity


def test_distributed_train_matches_local(ray_session, tmp_path):
    texts = ["low low low lower", "newest newest widest", "newest newest newest"]
    pq.write_table(
        pa.Table.from_pylist(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        ),
        str(tmp_path / "documents.parquet"),
    )
    table = bpe_train(str(tmp_path), n_merges=4)
    freq = {"low": 4, "lower": 1, "newest": 5, "widest": 1}
    want = bpe_train_wordfreq(freq, 4)
    assert list(zip(table["left"], table["right"])) == want
