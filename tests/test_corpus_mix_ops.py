"""Hand-computed cases for the corpus-mixing / substring-dup operators:
dup_ngram_spans (exact window-dup signal + interval-union coverage),
source_mix_weights (integer-ppm sqrt temperature weights) and
term_cooccurrence (windowed unordered pair counts)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from yomitoku_ray.functions.clean import source_mix_weights
from yomitoku_ray.functions.dedup import dup_ngram_spans
from yomitoku_ray.functions.text_stats import term_cooccurrence


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpusmix")
    rows = [
        {"doc_id": 0, "source": "sA", "text": "a b c d e"},
        {"doc_id": 1, "source": "sA", "text": "a b c x y z"},
        {"doc_id": 2, "source": "sB", "text": "q r s"},
        {"doc_id": 3, "source": "sB", "text": "t u"},
        {"doc_id": 4, "source": "sB", "text": "a b c d e"},
        {"doc_id": 5, "source": "sB", "text": "m n m n m n"},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    return str(d)


def test_dup_ngram_spans_manual(ray_session, corpus_dir):
    df = dup_ngram_spans(corpus_dir, w=3).to_pandas().set_index("doc_id").sort_index()
    assert list(df.index) == [0, 1, 2, 3, 4, 5]
    # docs 0 and 4 are identical: every window duplicated, full coverage
    for i in (0, 4):
        assert df.loc[i, "n_windows"] == 3
        assert df.loc[i, "n_dup_windows"] == 3
        assert df.loc[i, "n_dup_positions"] == 5
    # doc 1 shares only "a b c" -> one dup window covering 3 positions
    assert df.loc[1, "n_windows"] == 4
    assert df.loc[1, "n_dup_windows"] == 1
    assert df.loc[1, "n_dup_positions"] == 3
    # doc 2: unique window; doc 3: shorter than w
    assert df.loc[2].tolist() == [1, 0, 0]
    assert df.loc[3].tolist() == [0, 0, 0]
    # doc 5: WITHIN-doc repetition ("m n m" x2, "n m n" x2) counts as dup;
    # intervals [0,2][1,3][2,4][3,5] union to all 6 positions
    assert df.loc[5].tolist() == [4, 4, 6]


def test_source_mix_weights_manual(ray_session, tmp_path):
    rows = [
        {"doc_id": 0, "source": "sA", "text": "w " * 7 + "w"},  # 8 tokens
        {"doc_id": 1, "source": "sA", "text": "w " * 7 + "w"},  # 8 tokens
        {"doc_id": 2, "source": "sB", "text": "w " * 8 + "w"},  # 9 tokens
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    df = source_mix_weights(str(tmp_path)).set_index("source")
    # isqrt(16)=4, isqrt(9)=3, total 7
    assert df.loc["sA", "n_docs"] == 2 and df.loc["sA", "n_tokens"] == 16
    assert df.loc["sB", "n_docs"] == 1 and df.loc["sB", "n_tokens"] == 9
    assert df.loc["sA", "weight_ppm"] == 4_000_000 // 7
    assert df.loc["sB", "weight_ppm"] == 3_000_000 // 7


def test_term_cooccurrence_manual(ray_session, tmp_path):
    rows = [
        {"doc_id": 0, "text": "a b a"},
        {"doc_id": 1, "text": "b c"},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    df = term_cooccurrence(str(tmp_path), window=3, k=10)
    got = list(df.itertuples(index=False, name=None))
    # "a b a": dist-1 pairs (a,b)x2; dist-2 pair (a,a). "b c": (b,c).
    # order: count desc, then (wa, wb) asc
    assert got == [("a", "b", 2), ("a", "a", 1), ("b", "c", 1)]


def test_dup_ngram_spans_default_window(ray_session, corpus_dir):
    # default w=5: only the identical doc pair has 5-token dup windows
    df = dup_ngram_spans(corpus_dir).to_pandas().set_index("doc_id").sort_index()
    assert df.loc[0].tolist() == [1, 1, 5]
    assert df.loc[4].tolist() == [1, 1, 5]
    assert df.loc[1, "n_dup_windows"] == 0
    # "m n m n m n" has 2 windows, both unique at w=5
    assert df.loc[5].tolist() == [2, 0, 0]


def test_substring_dedup_rollup_manual(ray_session, corpus_dir):
    from yomitoku_ray.functions.clean import substring_dedup_rollup

    df = substring_dedup_rollup(corpus_dir, w=3).set_index("source")
    # from test_dup_ngram_spans_manual: per-doc dup coverage
    #   sA: doc0 (5 tok, 5 dup) + doc1 (6 tok, 3 dup)
    #   sB: doc2 (3,0) doc3 (2,0) doc4 (5,5) doc5 (6,6)
    assert df.loc["sA"].tolist() == [2, 11, 8, 3]
    assert df.loc["sB"].tolist() == [4, 16, 11, 5]


def test_source_length_percentiles_manual(ray_session, tmp_path):
    from yomitoku_ray.functions.text_stats import source_length_percentiles

    # sA: token lengths 1..5 (total 5 docs — NOT divisible by 100, the case
    # that exposed DuckDB's truncating // in the oracle's ceil formula)
    rows = [
        {"doc_id": i, "source": "sA", "text": " ".join(["w"] * (i + 1))}
        for i in range(5)
    ] + [{"doc_id": 10, "source": "sB", "text": "w w w"}]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    df = source_length_percentiles(str(tmp_path))
    a = df[df.source == "sA"].set_index("pct")["n_tokens"]
    # type-1: smallest v with cum >= ceil(p*5/100)
    assert a.loc[10] == 1   # ceil(0.5)=1 -> first value
    assert a.loc[25] == 2   # ceil(1.25)=2
    assert a.loc[50] == 3   # ceil(2.5)=3
    assert a.loc[75] == 4
    assert a.loc[90] == 5   # ceil(4.5)=5
    assert a.loc[99] == 5
    b = df[df.source == "sB"].set_index("pct")["n_tokens"]
    assert (b == 3).all()


def test_cross_corpus_near_dup_sides(ray_session):
    """Every returned pair crosses the old/new boundary with the advertised
    orientation (doc_new in the md5%5==0 sample, doc_old not)."""
    import numpy as np

    from yomitoku_ray.functions.dedup import cross_corpus_near_dup
    from yomitoku_ray.kernels.md5_vec import md5_u64_of_ints

    df = cross_corpus_near_dup("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    new = md5_u64_of_ints(df["doc_new"].to_numpy("int64")) % np.uint64(5) == 0
    old = md5_u64_of_ints(df["doc_old"].to_numpy("int64")) % np.uint64(5) == 0
    assert new.all() and not old.any()
    assert (df["jaccard_pct"] >= 50).all()


def test_tfidf_top_terms_manual(ray_session, tmp_path):
    from yomitoku_ray.functions.text_stats import tfidf_top_terms

    rows = [
        {"doc_id": 0, "text": "apple apple banana"},   # apple tf2/df2=1.0 beats banana tf1/df1=1.0? tie -> apple
        {"doc_id": 1, "text": "apple cherry cherry cherry"},  # cherry tf3/df1=3.0
        {"doc_id": 2, "text": "apple"},                # only apple tf1/df3
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    df = tfidf_top_terms(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    # df: apple=3, banana=1, cherry=1
    # doc0: apple 2/3=0.667 vs banana 1/1=1.0 -> banana
    assert df.loc[0, "term"] == "banana" and df.loc[0, "tf"] == 1 and df.loc[0, "df"] == 1
    assert df.loc[1, "term"] == "cherry" and df.loc[1, "tf"] == 3
    assert df.loc[2, "term"] == "apple" and df.loc[2, "df"] == 3
