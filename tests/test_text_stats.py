"""Text-analysis operators: BPE-ish token runs and winnowing fingerprints."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from yomitoku_ray.functions.dedup import _md5_u64
from yomitoku_ray.functions.text_stats import (
    BPE_TOKEN_REGEX,
    token_count_bpe,
    winnow_fingerprints,
)


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("textstats")
    rows = [
        {"doc_id": 0, "text": "hello world, it's 42 degrees!"},
        {"doc_id": 1, "text": "  "},  # whitespace-only
        {"doc_id": 2, "text": "one two three four five six seven"},
        {"doc_id": 3, "text": "ab"},  # shorter than the winnow window
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    return str(d)


def test_bpe_token_runs(ray_session, docs_dir):
    df = token_count_bpe(docs_dir).to_pandas().set_index("doc_id").sort_index()
    # "hello world, it's 42 degrees!" ->
    # hello|world|,|it|'|s|42|degrees|! = 9 runs; 5 whitespace tokens
    assert df.loc[0, "n_bpe_tokens"] == 9
    assert df.loc[0, "n_ws_tokens"] == 5
    assert df.loc[1, "n_ws_tokens"] == 0 and df.loc[1, "n_bpe_tokens"] == 0
    import re

    assert re.findall(BPE_TOKEN_REGEX, "it's 42!") == ["it", "'", "s", "42", "!"]


def test_winnow_fingerprints_manual(ray_session, docs_dir):
    df = winnow_fingerprints(docs_dir, w=4).to_pandas().set_index("doc_id").sort_index()
    # whitespace-only doc emits no row
    assert list(df.index) == [0, 2, 3]
    # doc 3 ("ab"): one token -> one whole-doc window -> fp = its hash
    h = _md5_u64("ab")
    assert df.loc[3, "n_fp"] == 1
    assert df.loc[3, "fp_checksum"] == h % ((1 << 61) - 1)
    # doc 2: recompute windows by hand
    toks = "one two three four five six seven".split()
    hs = np.array([_md5_u64(t) for t in toks], dtype=np.uint64)
    mins = {int(hs[i : i + 4].min()) for i in range(len(hs) - 3)}
    assert df.loc[2, "n_fp"] == len(mins)
    assert df.loc[2, "fp_checksum"] == sum(mins) % ((1 << 61) - 1)


def test_top_terms_and_percentiles(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from yomitoku_ray.functions.text_stats import doc_length_percentiles, top_terms

    rows = [
        {"doc_id": 0, "text": "a a a b b c"},      # 6 tokens
        {"doc_id": 1, "text": "a b"},               # 2
        {"doc_id": 2, "text": "c c c c"},           # 4
        {"doc_id": 3, "text": ""},                  # 0
    ]
    d = tmp_path / "tt"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))

    tt = top_terms(str(d), k=3)
    assert list(zip(tt["term"], tt["n"])) == [("c", 5), ("a", 4), ("b", 3)]

    pcts = doc_length_percentiles(str(d)).set_index("pct")["n_tokens"]
    # lengths sorted: 0, 2, 4, 6 (n=4). ceil ranks: p50 -> rank 2 -> 2;
    # p75 -> rank 3 -> 4; p99 -> rank 4 -> 6; p10 -> rank 1 -> 0.
    assert pcts[50] == 2 and pcts[75] == 4 and pcts[99] == 6 and pcts[10] == 0


def test_bigram_coverage_exact(ray_session, tmp_path):
    """Hand-computable corpus: 'a b' occurs 6x (common at min_count=5),
    'b c' 2x (rare); empty and one-word docs report zeros."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from yomitoku_ray.functions.text_stats import bigram_coverage

    texts = [
        "a b a b a b",     # 5 bigrams: ab,ba,ab,ba,ab -> ab x3, ba x2
        "a b a b a b",     # same
        "b c x",           # b c, c x
        "b c",             # b c ... wait recount below
        "solo",
        "",
    ]
    pq.write_table(
        pa.Table.from_pylist(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        ),
        str(tmp_path / "documents.parquet"),
    )
    df = (
        bigram_coverage(str(tmp_path), min_count=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # corpus counts: 'a b' 6, 'b a' 4, 'b c' 2, 'c x' 1
    assert df["doc_id"].tolist() == [0, 1, 2, 3, 4, 5]
    assert df["n_bigrams"].tolist() == [5, 5, 2, 1, 0, 0]
    # only 'a b' reaches min_count=5: docs 0/1 have 3 occurrences each
    assert df["n_common"].tolist() == [3, 3, 0, 0, 0, 0]


def test_top_supplier_per_nation_shapes(ray_session):
    from yomitoku_ray.functions.relational import top_supplier_per_nation

    df = top_supplier_per_nation("/root/testdata/sf0.001")
    assert list(df.columns) == ["n_name", "s_name", "revenue_cents"]
    assert df["n_name"].is_unique
    assert (df["revenue_cents"] > 0).all()
