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


def test_oracle_agrees_on_prefix_ambiguous_corpus(ray_session, tmp_path):
    """The hypothesis-found failure class (symbol prefix ambiguity, e.g.
    'xba' under [('b','a'), ('x','b')]): Ray apply, the recursive-CTE SQL
    oracle and the reference loop must all agree on a corpus built to
    trigger it under the shipped merge table."""
    import re

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    sys_path_added = "/root/repo"
    import sys

    if sys_path_added not in sys.path:
        sys.path.insert(0, sys_path_added)
    import __ray_entry__ as entry
    from yomitoku_ray.functions.bpe import DEFAULT_MERGES, bpe_apply

    texts = [
        "atata data the theta batch batchatch",
        "windowindow sortsort queryquery",
        "xba abab ababa thethe",
        "er err erer rere",
    ]
    pq.write_table(
        pa.Table.from_pylist([{"doc_id": i, "text": t} for i, t in enumerate(texts)]),
        str(tmp_path / "documents.parquet"),
    )
    df = (
        entry.queries()["token_count_bpe"](str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    sq = (
        con.execute(entry.oracle_sql()["token_count_bpe"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert df[sorted(df.columns)].astype("int64").equals(
        sq[sorted(sq.columns)].astype("int64")
    )
    tok = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")
    for i, t in enumerate(texts):
        want = sum(len(bpe_apply(w, DEFAULT_MERGES)) for w in tok.findall(t))
        assert int(df.loc[i, "n_bpe_subtokens"]) == want
