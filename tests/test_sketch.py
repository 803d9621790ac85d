"""HyperLogLog distinct-token sketch (functions/sketch.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from yomitoku_ray.functions.sketch import (
    HLL_LC_SCALE,
    HLL_M,
    HLL_RHO_MAX,
    HLL_W_BITS,
    _bit_length_u64,
    hll_distinct_tokens,
    hll_estimate,
)

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
        con.execute(entry.oracle_sql()["hll_distinct_tokens"])
        .df()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    for c in ("v_zeros", "est_distinct"):
        want[c] = want[c].astype("int64")
    return want


def test_hll_matches_oracle_sf001(ray_session):
    got = hll_distinct_tokens(SF001).sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, _oracle(SF001))


def test_hll_bit_length_exact_at_float_boundary():
    """The reason for the integer bit_length: w in [2^53, 2^54) where
    float64 log2 can round a near-power-of-two up a bucket."""
    vals = np.array(
        [1, 2, 3, (1 << 53) - 1, 1 << 53, (1 << 54) - 1], dtype=np.uint64
    )
    got = _bit_length_u64(vals)
    want = np.array([v.bit_length() for v in vals.tolist()], dtype=np.int64)
    assert (got == want).all()


def test_hll_linear_counting_seam_entire_input_space():
    """The only float seam is floor(scale*ln(m/V)) for V in 1..m — small
    enough to verify EXHAUSTIVELY, two ways: (1) DuckDB's ln produces the
    bit-identical double for every one of the m inputs (same libm), so
    both engines floor the same value; (2) every value still sits orders
    of magnitude above double ulp (~2e-10 here) from a floor boundary
    (the closest, V=303, is 9e-5 away; V=m gives exactly 0.0)."""
    import math

    import duckdb

    duck = (
        duckdb.connect()
        .execute(
            "SELECT v, 1000000.0 * ln(1024.0 / v) FROM range(1, 1025) t(v) ORDER BY v"
        )
        .fetchall()
    )
    for v, dx in duck:
        x = HLL_LC_SCALE * np.log(HLL_M / v)
        # engines may differ by ~1 ulp (observed at V=9); the FLOOR must
        # not, and the boundary margin must dwarf the disagreement
        assert math.floor(x) == math.floor(dx), v
        if v == HLL_M:
            assert x == 0.0 and dx == 0.0
            continue
        margin = abs(x - round(x))
        assert margin > 1e-6, v
        assert abs(x - dx) < margin / 50, v


def test_hll_raw_path_accuracy(ray_session, tmp_path):
    """A large random vocabulary drives the estimator onto the raw path;
    the estimate must land within ~4 standard errors (1.04/sqrt(m) ~
    3.25%) of the true distinct count, and still match the oracle."""
    rng = np.random.RandomState(5)
    n_vocab = 60_000
    vocab = np.array([f"tok{i:06d}" for i in range(n_vocab)], dtype=object)
    rows = []
    for i in range(300):
        words = vocab[rng.randint(0, n_vocab, 400)]
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(words),
                "lang": "en",
                "source": "src0",
            }
        )
    d = tmp_path / "t"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    got = hll_distinct_tokens(str(d))
    exact = len(
        {w for r in rows for w in r["text"].split()}
    )
    est = int(got.loc[0, "est_distinct"])
    assert est > 2560  # raw path (no zero-register shortcut)
    assert abs(est - exact) / exact < 0.13  # 4 sigma at p=10
    pd.testing.assert_frame_equal(
        got.sort_values("lang").reset_index(drop=True), _oracle(str(d))
    )


def test_hll_merge_is_order_free(ray_session, tmp_path):
    """Splitting the same corpus into different files (different batch /
    block boundaries) must yield the identical register table and
    estimate — the defining property of a mergeable sketch."""
    rng = np.random.RandomState(9)
    vocab = np.array([f"v{i}" for i in range(5000)], dtype=object)
    rows = [
        {
            "doc_id": i,
            "text": " ".join(vocab[rng.randint(0, 5000, 50)]),
            "lang": str(rng.choice(["en", "de"])),
            "source": "src0",
        }
        for i in range(400)
    ]
    a = tmp_path / "one"
    b = tmp_path / "many"
    a.mkdir()
    b.mkdir()
    t = pa.Table.from_pylist(rows)
    pq.write_table(t, str(a / "documents.parquet"))
    (b / "documents.parquet").mkdir()
    for j in range(8):
        pq.write_table(
            t.slice(j * 50, 50), str(b / "documents.parquet" / f"part{j}.parquet")
        )
    ga = hll_distinct_tokens(str(a)).sort_values("lang").reset_index(drop=True)
    gb = hll_distinct_tokens(str(b)).sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(ga, gb)


@pytest.mark.parametrize("seed", [0, 1])
def test_hll_cross_engine_fuzz(ray_session, tmp_path, seed):
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(500)] + ["a", "bb", "#!?"]
    rows = []
    for i in range(150):
        n = int(rng.randint(0, 40))
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(rng.choice(vocab, n)),
                "lang": str(rng.choice(["en", "de", "fr"])),
                "source": "src0",
            }
        )
    d = tmp_path / "fuzz"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    got = hll_distinct_tokens(str(d)).sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, _oracle(str(d)))


def test_hll_estimator_integer_edges():
    """hll_estimate is pure integer: all-zero registers (V=m) -> 0; one
    filled register stays on the linear-counting branch."""
    all_zero = HLL_M * (1 << HLL_RHO_MAX)
    assert hll_estimate(all_zero, HLL_M) == 0
    one_set = (HLL_M - 1) * (1 << HLL_RHO_MAX) + (1 << (HLL_RHO_MAX - 3))
    e = hll_estimate(one_set, HLL_M - 1)
    assert 0 < e < 10


def test_hll_driver_state_is_register_sized(ray_session, monkeypatch):
    import ray.data as rd

    real_to_pandas = rd.Dataset.to_pandas
    sizes = []

    def _spy(self, *a, **k):
        df = real_to_pandas(self, *a, **k)
        sizes.append(len(df))
        return df

    monkeypatch.setattr(rd.Dataset, "to_pandas", _spy)
    out = hll_distinct_tokens(SF001)
    monkeypatch.undo()
    assert len(sizes) == 1 and sizes[0] <= 5 * HLL_M
    assert len(out) == 5


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

from yomitoku_ray.functions.sketch import CMS_D, CMS_W, cms_top_term_counts


def _cms_oracle(dirpath: str) -> pd.DataFrame:
    import duckdb

    import __ray_entry__ as entry

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dirpath}/documents.parquet')"
    )
    want = (
        con.execute(entry.oracle_sql()["cms_top_term_counts"])
        .df()
        .sort_values(["n_exact", "term"], ascending=[False, True])
        .reset_index(drop=True)
    )
    for c in ("n_exact", "n_cms"):
        want[c] = want[c].astype("int64")
    return want


def test_cms_matches_oracle_sf001(ray_session):
    got = (
        cms_top_term_counts(SF001)
        .sort_values(["n_exact", "term"], ascending=[False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _cms_oracle(SF001))
    # the defining one-sided guarantee
    assert (got["n_cms"] >= got["n_exact"]).all()


def test_cms_overcount_only_large_vocab(ray_session, tmp_path):
    """A vocabulary far above w forces collisions: estimates may exceed
    the exact counts but can never undercount, and the heavy hitters
    stay within the epsilon*N additive bound with room to spare."""
    rng = np.random.RandomState(3)
    vocab = np.array([f"t{i}" for i in range(40_000)], dtype=object)
    rows = []
    for i in range(200):
        words = vocab[rng.randint(0, 40_000, 300)].tolist()
        words += ["heavy"] * 50  # one true heavy hitter
        rows.append({"doc_id": i, "text": " ".join(words), "lang": "en",
                     "source": "src0"})
    d = tmp_path / "t"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    got = cms_top_term_counts(str(d))
    assert (got["n_cms"] >= got["n_exact"]).all()
    n_total = 200 * 350
    # The additive bound eN/w holds per query with prob 1 - 2^-d, not
    # hard: most terms must sit within a few multiples, stragglers allowed
    # (this seed has one term colliding with a heavy in every row).
    over = got["n_cms"] - got["n_exact"]
    assert (over <= 4 * 2 * n_total // CMS_W).sum() >= 17
    assert got.loc[0, "term"] == "heavy" and got.loc[0, "n_exact"] == 10_000
    pd.testing.assert_frame_equal(
        got.sort_values(["n_exact", "term"], ascending=[False, True])
        .reset_index(drop=True),
        _cms_oracle(str(d)),
    )


def test_cms_merge_is_order_free(ray_session, tmp_path):
    """Different file/batch splits of the same corpus produce the same
    sketch (SUM merge is commutative/associative)."""
    rng = np.random.RandomState(4)
    vocab = np.array([f"v{i}" for i in range(2000)], dtype=object)
    rows = [
        {"doc_id": i, "text": " ".join(vocab[rng.randint(0, 2000, 80)]),
         "lang": "en", "source": "src0"}
        for i in range(300)
    ]
    a = tmp_path / "one"
    b = tmp_path / "many"
    a.mkdir(); b.mkdir()
    t = pa.Table.from_pylist(rows)
    pq.write_table(t, str(a / "documents.parquet"))
    (b / "documents.parquet").mkdir()
    for j in range(6):
        pq.write_table(
            t.slice(j * 50, 50), str(b / "documents.parquet" / f"p{j}.parquet")
        )
    pd.testing.assert_frame_equal(
        cms_top_term_counts(str(a)), cms_top_term_counts(str(b))
    )


def test_cms_driver_state_is_sketch_sized(ray_session, monkeypatch):
    import ray.data as rd

    real_to_pandas = rd.Dataset.to_pandas
    sizes = []

    def _spy(self, *a, **k):
        df = real_to_pandas(self, *a, **k)
        sizes.append(len(df))
        return df

    monkeypatch.setattr(rd.Dataset, "to_pandas", _spy)
    out = cms_top_term_counts(SF001)
    monkeypatch.undo()
    # the CMS cells + top_terms' vocabulary-sized aggregate
    assert sizes and sizes[0] <= CMS_D * CMS_W
    assert len(out) == 20


def test_sketches_fully_empty_table(ray_session, tmp_path):
    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()),
         ("lang", pa.string()), ("source", pa.string())]
    )
    d = tmp_path / "t"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist([], schema=schema),
                   str(d / "documents.parquet"))
    assert len(hll_distinct_tokens(str(d))) == 0
    assert len(cms_top_term_counts(str(d))) == 0


def test_bit_length_hypothesis_fuzz():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                    min_size=1, max_size=50))
    def check(vals):
        arr = np.array(vals, dtype=np.uint64)
        got = _bit_length_u64(arr)
        want = np.array([v.bit_length() for v in vals], dtype=np.int64)
        assert (got == want).all()

    check()
