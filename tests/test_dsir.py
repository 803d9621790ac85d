"""DSIR importance weights (text_stats.dsir_weights)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from yomitoku_ray.functions.text_stats import dsir_weights

SF001 = "/root/testdata/sf0.001"


def _local_dsir(path, B=1024, target_lang="en", scale=1_000_000):
    """Single-process recompute of the full operator."""
    from yomitoku_ray.functions.dedup import _batch_token_codes

    df = pq.read_table(path).to_pandas().sort_values("doc_id").reset_index(drop=True)
    uh, codes, counts = _batch_token_codes(df["text"].fillna("").tolist())
    occ = (uh % np.uint64(B)).astype(np.int64)[codes]
    di = np.repeat(np.arange(len(df)), counts)
    tmask = (df["lang"].fillna("") == target_lang).to_numpy()[di]
    r = np.bincount(occ, minlength=B)
    t = np.bincount(occ[tmask], minlength=B)
    T, R = t.sum(), r.sum()
    s = np.floor(
        scale * (np.log((t + 1.0) / (T + B)) - np.log((r + 1.0) / (R + B)))
    ).astype(np.int64)
    w = np.zeros(len(df), dtype=np.int64)
    np.add.at(w, di, s[occ])
    keep = counts > 0
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy("int64")[keep],
            "n_tokens": counts[keep].astype("int64"),
            "weight_scaled": w[keep],
        }
    )


def test_dsir_matches_local_recompute(ray_session):
    got = (
        dsir_weights(SF001)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    want = _local_dsir(f"{SF001}/documents.parquet").astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_dsir_targets_rank_higher(ray_session):
    """Target-language documents must have higher mean importance weight —
    the operator's whole point is up-weighting target-like raw text."""
    got = dsir_weights(SF001).to_pandas()
    docs = pq.read_table(
        f"{SF001}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pandas()
    m = got.merge(docs, on="doc_id")
    # normalize by length: per-token mean log-ratio
    m["per_tok"] = m["weight_scaled"] / m["n_tokens"]
    en = m[m.lang == "en"]["per_tok"].mean()
    rest = m[m.lang != "en"]["per_tok"].mean()
    assert en > rest


def test_dsir_empty_and_target_edge(ray_session, tmp_path):
    rows = [
        {"doc_id": 0, "text": "alpha beta gamma", "lang": "en"},
        {"doc_id": 1, "text": "alpha beta gamma", "lang": "de"},
        {"doc_id": 2, "text": "   ", "lang": "en"},  # whitespace-only: no row
        {"doc_id": 3, "text": "delta epsilon", "lang": "en"},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    out = dsir_weights(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [0, 1, 3]
    # identical text -> identical weight regardless of the doc's own lang
    w = out.set_index("doc_id")["weight_scaled"]
    assert w[0] == w[1]
    assert list(out["n_tokens"]) == [3, 3, 2]


def test_dsir_deterministic(ray_session):
    a = dsir_weights(SF001).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = dsir_weights(SF001).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_dsir_select_topk(ray_session):
    from yomitoku_ray.functions.text_stats import dsir_select

    sel = dsir_select(SF001, k=10).to_pandas().sort_values("rank")
    assert list(sel["rank"]) == list(range(1, 11))
    w = _local_dsir(f"{SF001}/documents.parquet")
    want = w.sort_values(
        ["weight_scaled", "doc_id"], ascending=[False, True]
    ).head(10)
    assert list(sel["doc_id"]) == list(want["doc_id"])
    # descending weights with deterministic tie-break
    assert (sel["weight_scaled"].diff().dropna() <= 0).all()


def test_dsir_select_multibatch_partial_topk(ray_session, tmp_path):
    """>1 batch forces the per-batch partial top-k combiner path."""
    rng = np.random.RandomState(11)
    vocab = [f"tok{i}" for i in range(50)]
    rows = []
    for i in range(3000):
        n = 5 + int(rng.randint(0, 20))
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(rng.choice(vocab, n)),
                "lang": "en" if i % 3 == 0 else "de",
            }
        )
    pq.write_table(
        pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet")
    )
    from yomitoku_ray.functions.text_stats import dsir_select

    sel = dsir_select(str(tmp_path), k=25).to_pandas().sort_values("rank")
    w = _local_dsir(str(tmp_path / "documents.parquet"))
    want = w.sort_values(
        ["weight_scaled", "doc_id"], ascending=[False, True]
    ).head(25)
    assert list(sel["doc_id"]) == list(want["doc_id"])
    assert list(sel["weight_scaled"]) == list(want["weight_scaled"])


def test_dsir_degenerate_corpora(ray_session, tmp_path):
    # all-empty corpus: no rows, no crash (empty aggregate frame)
    d = tmp_path / "empty"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["", "   "]),
                "lang": pa.array(["en", "de"]),
            }
        ),
        str(d / "documents.parquet"),
    )
    assert len(dsir_weights(str(d)).to_pandas()) == 0
    # no target-language docs: smoothing keeps weights finite, and
    # identical texts still weigh identically
    d2 = tmp_path / "notarget"
    d2.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["hello world", "hello world"]),
                "lang": pa.array(["de", "fr"]),
            }
        ),
        str(d2 / "documents.parquet"),
    )
    out = dsir_weights(str(d2)).to_pandas()
    assert len(out) == 2 and out["weight_scaled"].nunique() == 1


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_dsir_cross_engine_fuzz(ray_session, tmp_path, seed):
    """Random ASCII corpora: the Ray operator must agree with the DuckDB
    oracle EXACTLY (the correctness gate generalized beyond the fixed synth
    tables). Alphabet stays ASCII space/tab/newline — the repo-wide token
    convention (Python str.split vs regex '\\s+') diverges only on exotic
    whitespace the corpus tables never contain."""
    import duckdb

    import __ray_entry__ as entry

    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(30)] + ["a", "bb", "ccc", "Zz9", "#!?"]
    seps = np.array([" ", "  ", "\t", "\n", " \n "], dtype=object)
    rows = []
    for i in range(120):
        n = int(rng.randint(0, 25))
        toks = rng.choice(vocab, n)
        text = "".join(
            t + s for t, s in zip(toks, rng.choice(seps, n))
        ).rstrip()
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": str(rng.choice(["en", "de", "fr"])),
            }
        )
    d = tmp_path / "fuzz"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    got = (
        dsir_weights(str(d))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    want = (
        con.execute(entry.oracle_sql()["dsir_weights"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)])


def test_dsir_driver_state_is_bucket_sized(ray_session, monkeypatch):
    """Building dsir_weights must collect only the B-row bucket-count
    aggregate on the driver — never document- or token-sized data."""
    import ray.data as rd

    real_to_pandas = rd.Dataset.to_pandas
    sizes = []

    def _spy(self, *a, **k):
        df = real_to_pandas(self, *a, **k)
        sizes.append(len(df))
        return df

    def _boom(*a, **k):
        raise AssertionError("from_pandas on the driver in dsir chain")

    monkeypatch.setattr(rd, "from_pandas", _boom)
    monkeypatch.setattr(rd.Dataset, "to_pandas", _spy)
    ds = dsir_weights(SF001)  # chain construction collects the counts
    monkeypatch.undo()
    assert len(sizes) == 1 and sizes[0] <= 1024
    assert ds.count() == 500


def test_dsir_bigram_mode(ray_session, tmp_path):
    """Bigram features: a doc whose unigrams match the target but whose
    bigram ORDER does not gets separated from the true target doc."""
    from yomitoku_ray.functions.text_stats import _dsir_feature_occ

    # feature extraction shape: n tokens -> n + (n-1) features
    occ, fdi, counts, n_feats = _dsir_feature_occ(["a b c", "x", ""], True)
    assert list(counts) == [3, 1, 0]
    assert list(n_feats) == [5, 1, 0]
    assert len(occ) == 6 and list(fdi) == [0, 0, 0, 1, 0, 0]

    rows = [
        {"doc_id": 0, "text": "alpha beta gamma", "lang": "en"},
        {"doc_id": 1, "text": "gamma beta alpha", "lang": "de"},  # same unigrams
        {"doc_id": 2, "text": "alpha beta gamma", "lang": "de"},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    uni = dsir_weights(str(tmp_path)).to_pandas().set_index("doc_id")
    bi = (
        dsir_weights(str(tmp_path), bigrams=True).to_pandas().set_index("doc_id")
    )
    # unigram models cannot tell 0/1/2 apart; bigrams separate doc 1
    assert uni.loc[0, "weight_scaled"] == uni.loc[1, "weight_scaled"]
    assert bi.loc[0, "weight_scaled"] == bi.loc[2, "weight_scaled"]
    assert bi.loc[1, "weight_scaled"] < bi.loc[0, "weight_scaled"]
    assert list(bi["n_feats"]) == [5, 5, 5]


@pytest.mark.parametrize("seed", [6, 7])
def test_dsir_bigram_cross_engine_fuzz(ray_session, tmp_path, seed):
    import duckdb

    import __ray_entry__ as entry

    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(25)]
    rows = []
    for i in range(100):
        n = int(rng.randint(0, 20))
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(rng.choice(vocab, n)),
                "lang": str(rng.choice(["en", "de"])),
            }
        )
    d = tmp_path / "fuzz"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    got = (
        dsir_weights(str(d), bigrams=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    want = (
        con.execute(entry.oracle_sql()["dsir_weights_bigram"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )
