"""Driver-contract smoke: entry() + representative queries at sf0.001."""

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def test_entry_runs(ray_session):
    import __ray_entry__ as m

    ds = m.entry()
    assert ds.count() == 1000
    names = ds.schema().names
    for col in ("url", "extracted_text", "markdown", "doc_json", "spans", "error"):
        assert col in names


def test_queries_and_oracles_consistent():
    import __ray_entry__ as m

    q = m.queries()
    o = m.oracle_sql()
    assert set(o) <= set(q), "every oracle key needs a query"
    assert len(q) >= 20


def test_match_rate_query_is_100(ray_session):
    import __ray_entry__ as m

    df = m.queries()["extract_match_rate"](SF)
    assert df.iloc[0]["match_rate_pct"] == 100
    assert df.iloc[0]["n_checked"] == 200


def test_semantic_match_rate_query_is_100(ray_session):
    import __ray_entry__ as m

    df = m.queries()["semantic_match_rate"](SF)
    assert df.iloc[0]["match_rate_pct"] == 100
    assert df.iloc[0]["n_checked"] == 200
    assert df.iloc[0]["n_match"] == 200


def test_domain_skew_query(ray_session):
    import __ray_entry__ as m

    df = m.queries()["domain_skew"](SF)
    assert len(df) == 20
    assert (df["n_pages"].values[:-1] >= df["n_pages"].values[1:]).all()
