"""CCNet-style perplexity buckets (text_stats.ccnet_perplexity)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from yomitoku_ray.functions.text_stats import ccnet_perplexity

SF001 = "/root/testdata/sf0.001"


def _oracle(dirpath: str) -> pd.DataFrame:
    import duckdb

    import __ray_entry__ as entry

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dirpath}/documents.parquet')"
    )
    want = (
        con.execute(entry.oracle_sql()["ccnet_perplexity"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("doc_id", "n_trans", "nll_scaled", "ppl_bucket"):
        want[c] = want[c].astype("int64")
    return want


def _run(dirpath: str, **kw) -> pd.DataFrame:
    return (
        ccnet_perplexity(dirpath, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_ccnet_matches_oracle_sf001(ray_session):
    got = _run(SF001)
    want = _oracle(SF001)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_ccnet_terciles_are_even(ray_session):
    """Per language the head/middle/tail buckets split into near-equal
    thirds — the defining CCNet property (type-1 terciles: sizes differ by
    at most the duplicate mass at the cut values)."""
    got = _run(SF001)
    for _lang, sub in got.groupby("lang"):
        counts = sub["ppl_bucket"].value_counts()
        n = len(sub)
        assert counts.get(0, 0) >= n // 3  # head holds at least a third
        assert counts.get(0, 0) + counts.get(1, 0) >= 2 * n // 3


def test_ccnet_fluent_text_lands_in_head(ray_session, tmp_path):
    """A document made of the reference slice's own common transitions
    must score lower perplexity (head) than same-lang gibberish (tail)."""
    train_text = "the cat sat on the mat " * 20
    rng = np.random.RandomState(7)
    gibberish = " ".join(f"zq{rng.randint(1_000_000)}" for _ in range(60))
    rows = [
        {"doc_id": 0, "text": train_text.strip(), "lang": "en", "source": "src0"},
        # scored docs (source != src0 so they do not retrain the model)
        {"doc_id": 1, "text": ("the cat sat on the mat " * 5).strip(),
         "lang": "en", "source": "src1"},
        {"doc_id": 2, "text": gibberish, "lang": "en", "source": "src1"},
        {"doc_id": 3, "text": "on the mat sat the cat", "lang": "en",
         "source": "src1"},
    ]
    d = tmp_path / "t"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    got = _run(str(d)).set_index("doc_id")
    fluent = got.loc[1, "nll_scaled"] / got.loc[1, "n_trans"]
    junk = got.loc[2, "nll_scaled"] / got.loc[2, "n_trans"]
    assert fluent < junk
    assert got.loc[1, "ppl_bucket"] < got.loc[2, "ppl_bucket"]


def test_ccnet_missing_lang_uniform_fallback(ray_session, tmp_path):
    """A language absent from the reference slice scores under the uniform
    model floor(scale*ln(1/B)) — and still gets its own terciles."""
    rows = [
        {"doc_id": 0, "text": "aa bb cc", "lang": "en", "source": "src0"},
        {"doc_id": 1, "text": "xx yy zz ww", "lang": "xx", "source": "src1"},
        {"doc_id": 2, "text": "one two", "lang": "xx", "source": "src1"},
    ]
    d = tmp_path / "t"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    got = _run(str(d), n_buckets=256).set_index("doc_id")
    uniform = int(np.floor(1_000_000 * np.log(1.0 / 256)))
    assert got.loc[1, "nll_scaled"] == -uniform * 3
    assert got.loc[2, "nll_scaled"] == -uniform * 1
    pd.testing.assert_frame_equal(
        _run(str(d), n_buckets=256).reset_index(drop=True),
        _oracle(str(d)),
        check_like=True,
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ccnet_cross_engine_fuzz(ray_session, tmp_path, seed):
    """Random ASCII corpora (with a src0 reference slice): Ray must agree
    with the DuckDB oracle EXACTLY, including empty/one-token docs and
    langs missing from the slice."""
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(30)] + ["a", "bb", "ccc", "Zz9", "#!?"]
    seps = np.array([" ", "  ", "\t", "\n", " \n "], dtype=object)
    rows = []
    for i in range(150):
        n = int(rng.randint(0, 25))
        toks = rng.choice(vocab, n)
        text = "".join(t + s for t, s in zip(toks, rng.choice(seps, n))).rstrip()
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": str(rng.choice(["en", "de", "fr", "xx"])),
                "source": str(rng.choice(["src0", "src1", "src2"])),
            }
        )
    d = tmp_path / "fuzz"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    got = _run(str(d))
    want = _oracle(str(d))
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_ccnet_float_seam_margins(ray_session):
    """Every frozen per-(lang,b1,b2) value scale*ln((c+1)/(ctx+B)) must sit
    far from a floor boundary, so numpy-vs-DuckDB double noise (if any)
    cannot flip an int64 score. Recomputes the exact seam inputs for the
    sf0.001 reference slice."""
    df = pq.read_table(
        f"{SF001}/documents.parquet", columns=["lang", "text", "source"]
    ).to_pandas()
    df = df[df["source"] == "src0"]
    from yomitoku_ray.functions.text_stats import _ccnet_transitions

    B, scale = 256, 1_000_000
    _t_di, key, lang_tr = _ccnet_transitions(df.reset_index(drop=True), B)
    worst = 1.0
    for lang in pd.unique(lang_tr):
        c = np.zeros(B * B, dtype=np.int64)
        ks, cs = np.unique(key[lang_tr == lang], return_counts=True)
        c[ks] = cs
        c2 = c.reshape(B, B)
        ctx = c2.sum(axis=1)
        v = scale * np.log((c2 + 1.0) / (ctx[:, None] + float(B)))
        frac = np.abs(v - np.round(v))
        worst = min(worst, float(frac.min()))
    u = scale * np.log(1.0 / B)
    worst = min(worst, abs(u - round(u)))
    assert worst > 1e-3  # >= 10 orders above double ulp at this magnitude


def test_ccnet_driver_state_is_bounded(ray_session, monkeypatch):
    """Only the (lang,key) count aggregate and the (lang,ppl_q) histogram
    ever reach the driver — never document- or token-sized frames."""
    import ray.data as rd

    real_to_pandas = rd.Dataset.to_pandas
    sizes = []

    def _spy(self, *a, **k):
        df = real_to_pandas(self, *a, **k)
        sizes.append(len(df))
        return df

    def _boom(*a, **k):
        raise AssertionError("from_pandas on the driver in ccnet chain")

    monkeypatch.setattr(rd, "from_pandas", _boom)
    monkeypatch.setattr(rd.Dataset, "to_pandas", _spy)
    ds = ccnet_perplexity(SF001)
    monkeypatch.undo()
    assert len(sizes) == 2
    assert sizes[0] <= 5 * 256 * 256  # |langs| x B^2 LM counts
    assert sizes[1] <= 5 * 12_000  # |langs| x ppl_q value space
    assert ds.count() == 500


def test_ccnet_deterministic(ray_session):
    a = _run(SF001)
    b = _run(SF001)
    pd.testing.assert_frame_equal(a, b)


def test_ccnet_no_train_slice_uniform_model(ray_session, tmp_path):
    """A corpus with NO train_source docs must not crash (the aggregate
    returns a column-less frame): every lang falls back to the uniform
    model and the result still matches the oracle's coalesce path."""
    rows = [
        {"doc_id": i, "text": f"alpha beta gamma g{i}", "lang": "en",
         "source": "src1"}
        for i in range(6)
    ]
    d = tmp_path / "t"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    got = _run(str(d))
    assert len(got) == 6
    uniform = int(np.floor(1_000_000 * np.log(1.0 / 256)))
    assert (got["nll_scaled"] == -uniform * 3).all()
    pd.testing.assert_frame_equal(got, _oracle(str(d)), check_like=True)


def test_ccnet_fully_empty_table(ray_session, tmp_path):
    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()),
         ("lang", pa.string()), ("source", pa.string())]
    )
    d = tmp_path / "t"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist([], schema=schema),
                   str(d / "documents.parquet"))
    assert len(ccnet_perplexity(str(d)).to_pandas()) == 0


# ---------------------------------------------------------------------------
# token_entropy (lexical diversity)
# ---------------------------------------------------------------------------

from yomitoku_ray.functions.text_stats import token_entropy


def _ent_oracle(dirpath: str) -> pd.DataFrame:
    import duckdb

    import __ray_entry__ as entry

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dirpath}/documents.parquet')"
    )
    return (
        con.execute(entry.oracle_sql()["token_entropy"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )


def test_entropy_matches_oracle_sf001(ray_session):
    got = (
        token_entropy(SF001)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, _ent_oracle(SF001))


def test_entropy_semantics(ray_session, tmp_path):
    """Repetition -> zero entropy; all-distinct -> n*floor(scale*ln n);
    and the scaled value tracks true entropy within floor error."""
    rows = [
        {"doc_id": 0, "text": "spam spam spam spam"},           # H = 0
        {"doc_id": 1, "text": "a b c d"},                        # H = ln 4
        {"doc_id": 2, "text": "a a b b"},                        # H = ln 2
    ]
    d = tmp_path / "t"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    got = token_entropy(str(d)).to_pandas().set_index("doc_id")
    s = lambda c: int(np.floor(1_000_000 * np.log(c)))  # noqa: E731
    assert got.loc[0, "ent_scaled"] == 4 * s(4) - 4 * s(4)  # == 0
    assert got.loc[1, "ent_scaled"] == 4 * s(4)  # all c_i = 1, ln 1 = 0
    assert got.loc[2, "ent_scaled"] == 4 * s(4) - 4 * s(2)
    # scaled/(scale*n) ~ true entropy
    approx = got["ent_scaled"] / (1_000_000 * got["n_tokens"])
    assert abs(approx.loc[1] - np.log(4)) < 1e-5
    assert abs(approx.loc[2] - np.log(2)) < 1e-5
    pd.testing.assert_frame_equal(
        token_entropy(str(d)).to_pandas().sort_values("doc_id")
        .reset_index(drop=True).astype("int64"),
        _ent_oracle(str(d)),
    )


def test_entropy_ln_value_space_margins():
    """The seam is floor(scale*ln(c)) over counts: c=1 is exactly 0.0;
    the worst margin over 2..10^6 must stay orders above the ~1-ulp
    cross-engine ln disagreement (measured: 6.0e-7 at c=632754, ~200
    ulps at that magnitude)."""
    c = np.arange(2, 1_000_001, dtype=np.float64)
    v = 1_000_000.0 * np.log(c)
    frac = np.abs(v - np.round(v))
    assert frac.min() > 5e-7
    ulp = np.spacing(v[np.argmin(frac)])
    assert frac.min() / ulp > 100  # 100+ ulps of headroom at the worst point


@pytest.mark.parametrize("seed", [0, 1])
def test_entropy_cross_engine_fuzz(ray_session, tmp_path, seed):
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(15)]  # small vocab -> many repeats
    rows = []
    for i in range(150):
        n = int(rng.randint(0, 60))
        rows.append({"doc_id": i, "text": " ".join(rng.choice(vocab, n))})
    d = tmp_path / "fuzz"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    got = (
        token_entropy(str(d))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, _ent_oracle(str(d)))


def test_ccnet_head_middle_selection(ray_session):
    """The CCNet selection keeps exactly the bucket<=1 rows."""
    import __ray_entry__ as entry

    full = _run(SF001)
    kept = (
        entry.queries()["ccnet_head_middle"](SF001)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = full[full["ppl_bucket"] <= 1].reset_index(drop=True)
    pd.testing.assert_frame_equal(kept, want)
    assert 0 < len(kept) < len(full)
