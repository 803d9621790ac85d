"""Corpus-cleaning operators: PII scrub stage, Gopher repetition signals,
and the dedup-resolved corpus rollup."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from yomitoku_ray.functions.clean import (
    PII_PATTERNS,
    PatternScrubStage,
    dedup_corpus,
    gopher_repetition,
    pack_sequences,
    props_scrub,
    quality_topk,
)


def test_pii_scrub_exact_strings():
    stage = PatternScrubStage(column="text", patterns=PII_PATTERNS)
    batch = pd.DataFrame(
        {
            "text": [
                "mail me at alice.smith+tag@example.co.uk today",
                "call +1 (555) 123-4567 or 555 987 6543 now",
                "server at 192.168.0.1 and 10.0.0.255, not 1.2.3",
                "nothing sensitive here",
            ]
        }
    )
    out = stage(batch)
    assert out["text"].tolist() == [
        "mail me at <EMAIL> today",
        "call <PHONE> or <PHONE> now",
        "server at <IP> and <IP>, not 1.2.3",
        "nothing sensitive here",
    ]
    assert out["n_email"].tolist() == [1, 0, 0, 0]
    assert out["n_phone"].tolist() == [0, 2, 0, 0]
    assert out["n_ipv4"].tolist() == [0, 0, 2, 0]
    assert out["n_email"].dtype == "int64"


def test_scrub_sequential_order():
    # Counts are taken against the text as it stands when the pattern
    # runs: the email pattern fires first, so its digits never reach
    # the phone pattern.
    stage = PatternScrubStage(
        column="text",
        patterns={"a": (r"xy", "<A>"), "b": (r"<A>z", "<B>")},
    )
    out = stage(pd.DataFrame({"text": ["xyz"]}))
    assert out["text"].tolist() == ["<B>"]
    assert out["n_a"].tolist() == [1]
    assert out["n_b"].tolist() == [1]


def test_scrub_out_column_preserves_original():
    stage = PatternScrubStage(
        column="text", patterns={"num": (r"[0-9]+", "#")}, out_column="clean"
    )
    out = stage(pd.DataFrame({"text": ["a1b22c"]}))
    assert out["text"].tolist() == ["a1b22c"]
    assert out["clean"].tolist() == ["a#b#c"]
    assert out["n_num"].tolist() == [2]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clean")
    docs = [
        # repeated single word: top_word_frac = 1.0, all bigrams identical
        {"doc_id": 0, "text": "spam spam spam spam spam", "source": "a"},
        # diverse: every word and bigram unique
        {"doc_id": 1, "text": "one two three four five six seven eight nine ten", "source": "a"},
        {"doc_id": 2, "text": "  ", "source": "b"},  # whitespace-only: dropped
        {"doc_id": 3, "text": "solo", "source": "b"},  # one word, no bigrams
        # near-duplicate pair (shared shingles ≥ 50% Jaccard)
        {"doc_id": 4, "text": "alpha beta gamma delta epsilon zeta", "source": "b"},
        {"doc_id": 5, "text": "alpha beta gamma delta epsilon zeta eta", "source": "b"},
    ]
    for r in docs:
        r["lang"] = "en"
        r["n_chars"] = len(r["text"])
    pq.write_table(pa.Table.from_pylist(docs), str(d / "documents.parquet"))
    return str(d)


def test_gopher_repetition_exact(ray_session, corpus_dir):
    # top_word_pct=20: a 6-word all-distinct doc (top word 1/6 ≈ 17%)
    # passes, while spam/solo still fail — exercises the parameter.
    df = (gopher_repetition(corpus_dir, top_word_pct=20)
          .to_pandas().sort_values("doc_id").set_index("doc_id"))
    assert list(df.index) == [0, 1, 3, 4, 5]  # empty doc 2 dropped
    assert df.loc[0].tolist() == [5, 1, 5, 4, 1, 0]  # all-spam: dropped
    assert df.loc[1].tolist() == [10, 10, 1, 9, 9, 1]  # diverse: kept
    # single word: no bigrams; top word is 100% of one word -> dropped
    assert df.loc[3].tolist() == [1, 1, 1, 0, 0, 0]
    assert df.loc[4, "keep"] == 1 and df.loc[5, "keep"] == 1


def test_dedup_corpus_rollup(ray_session, corpus_dir):
    df = dedup_corpus(corpus_dir).set_index("source")
    # docs 4/5 are the only near-dup pair: min id 4 kept, 5 dropped
    assert df.loc["a", "n_docs"] == 2 and df.loc["a", "n_kept"] == 2
    assert df.loc["b", "n_docs"] == 4 and df.loc["b", "n_kept"] == 3
    assert (
        df.loc["b", "kept_chars"]
        == len("  ") + len("solo") + len("alpha beta gamma delta epsilon zeta")
    )


def test_quality_topk_rank_and_ties(ray_session, tmp_path):
    # doc 0: 'the' x3 -> n_stop 3; doc 1: 'the and' -> 2; doc 2: 'of to' -> 2
    # (tie with doc 1, doc_id ascending wins); doc 3: no stopwords -> 0.
    docs = [
        {"doc_id": 0, "text": "the the the", "source": "a"},
        {"doc_id": 1, "text": "the and cat", "source": "a"},
        {"doc_id": 2, "text": "of to dog", "source": "a"},
        {"doc_id": 3, "text": "xyzzy", "source": "a"},
        {"doc_id": 4, "text": "is it", "source": "b"},
    ]
    for r in docs:
        r["lang"], r["n_chars"] = "en", len(r["text"])
    pq.write_table(pa.Table.from_pylist(docs), str(tmp_path / "documents.parquet"))
    df = quality_topk(str(tmp_path), k=3)
    a = df[df["source"] == "a"]
    assert a["doc_id"].tolist() == [0, 1, 2]  # doc 3 cut by k=3
    assert a["n_stop"].tolist() == [3, 2, 2]
    assert a["rk"].tolist() == [1, 2, 3]
    b = df[df["source"] == "b"]
    assert b["doc_id"].tolist() == [4] and b["rk"].tolist() == [1]


def test_pack_sequences_prefix_scan(ray_session, tmp_path):
    # token counts: 3, 4, 2, 5, 1 -> exclusive offsets 0, 3, 7, 9, 14.
    # bucket_shift=1 forces three buckets {0,1},{2,3},{4} so offsets must
    # cross bucket boundaries through the broadcast prefix.
    texts = ["a b c", "d e f g", "h i", "j k l m n", "o"]
    docs = [
        {"doc_id": i, "text": t, "source": "s", "lang": "en", "n_chars": len(t)}
        for i, t in enumerate(texts)
    ]
    pq.write_table(pa.Table.from_pylist(docs), str(tmp_path / "documents.parquet"))
    df = (pack_sequences(str(tmp_path), seq_len=4, bucket_shift=1)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert df["doc_id"].tolist() == [0, 1, 2, 3, 4]
    assert df["tok_offset"].tolist() == [0, 3, 7, 9, 14]
    assert df["seq_id"].tolist() == [0, 0, 1, 2, 3]
    # docs 1/2/3 cross a multiple-of-4 token boundary (3..6, 7..8, 9..13)
    assert df["spans_boundary"].tolist() == [0, 1, 1, 1, 0]


def test_contamination_check_vs_bruteforce(ray_session, tmp_path):
    import numpy as np

    from yomitoku_ray.functions.dedup import _md5_u64, shingle_hashes
    from yomitoku_ray.functions.clean import contamination_check

    # 20 docs; evens carry a shared 4-token phrase (2 shared 3-gram
    # shingles), odds are unique. Which docs are "eval" is decided by the
    # md5 residue, so compute the expected answer by brute force here.
    docs = []
    for i in range(20):
        text = (
            f"shared phrase across docs plus word{i}"
            if i % 2 == 0
            else f"unique{i} filler{i} body{i} tail{i}"
        )
        docs.append(
            {"doc_id": i, "text": text, "source": "s", "lang": "en",
             "n_chars": len(text)}
        )
    pq.write_table(pa.Table.from_pylist(docs), str(tmp_path / "documents.parquet"))

    mod = 3
    is_eval = {r["doc_id"]: _md5_u64(str(r["doc_id"])) % mod == 0 for r in docs}
    ev = np.unique(
        np.concatenate(
            [shingle_hashes(r["text"]) for r in docs if is_eval[r["doc_id"]]]
            or [np.zeros(0, dtype=np.uint64)]
        )
    )
    expected = {}
    for r in docs:
        if is_eval[r["doc_id"]]:
            continue
        n = int(np.isin(shingle_hashes(r["text"]), ev).sum())
        if n >= 1:
            expected[r["doc_id"]] = n
    assert expected, "fixture must produce at least one contaminated doc"

    df = contamination_check(str(tmp_path), sample_mod=mod).to_pandas()
    assert dict(zip(df["doc_id"], df["n_shared"])) == expected


def test_props_scrub_rollup(ray_session, tmp_path):
    rows = [
        {"event_type": "click", "props": '{"k": 7}'},
        {"event_type": "click", "props": '{"k": 123}'},
        {"event_type": "view", "props": '{"k": 0}'},
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "events.parquet"))
    df = props_scrub(str(tmp_path)).set_index("event_type")
    assert df.loc["click", "n_events"] == 2
    assert df.loc["click", "n_matches"] == 2
    # both props become '{"k": <NUM>}' (12 chars)
    assert df.loc["click", "redacted_chars"] == 24
    assert df.loc["view", "redacted_chars"] == 12


def test_segment_dedup_cross_doc(ray_session, tmp_path):
    from yomitoku_ray.functions.clean import segment_dedup

    shared = " ".join(f"s{k}" for k in range(10))  # one full shared segment
    docs = [
        # doc 0: shared segment + unique tail (tail is a short segment)
        {"doc_id": 0, "text": shared + " tail0 tail1"},
        # doc 1: same shared segment + its own unique words
        {"doc_id": 1, "text": shared + " other words here"},
        # doc 2: entirely unique, repeated WITHIN the doc (kept: within-doc
        # repeats don't disqualify)
        {"doc_id": 2, "text": ("u " * 20).strip()},
        # doc 3: empty text -> zero segments, still present in output
        {"doc_id": 3, "text": ""},
    ]
    for r in docs:
        r["lang"], r["source"], r["n_chars"] = "en", "a", len(r["text"])
    pq.write_table(pa.Table.from_pylist(docs), str(tmp_path / "documents.parquet"))
    df = (
        segment_dedup(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert df["doc_id"].tolist() == [0, 1, 2, 3]
    assert df.loc[0, "clean_text"] == "tail0 tail1"  # shared segment dropped
    assert df.loc[0, "n_kept"] == 1 and df.loc[0, "n_dropped"] == 1
    assert df.loc[1, "clean_text"] == "other words here"
    # doc 2: 'u'x10 twice -> same seg_text twice in ONE doc -> both kept
    assert df.loc[2, "n_kept"] == 2 and df.loc[2, "n_dropped"] == 0
    assert df.loc[3, "clean_text"] == "" and df.loc[3, "n_kept"] == 0
    assert df.loc[3, "n_dropped"] == 0


def test_event_pagerank_integer_fixed_point(ray_session, tmp_path):
    import datetime as dt

    from yomitoku_ray.functions.relational import event_pagerank

    t0 = dt.datetime(2024, 1, 1)
    # user 1: a -> b -> a ; user 2: b -> b
    rows = [
        {"event_id": 1, "user_id": 1, "event_type": "a", "ts": t0},
        {"event_id": 2, "user_id": 1, "event_type": "b", "ts": t0 + dt.timedelta(minutes=1)},
        {"event_id": 3, "user_id": 1, "event_type": "a", "ts": t0 + dt.timedelta(minutes=2)},
        {"event_id": 4, "user_id": 2, "event_type": "b", "ts": t0},
        {"event_id": 5, "user_id": 2, "event_type": "b", "ts": t0 + dt.timedelta(minutes=3)},
    ]
    for r in rows:
        r["value"], r["props"] = 1.0, "{}"
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "events.parquet"))
    df = event_pagerank(str(tmp_path), iterations=1).set_index("event_type")
    # edges: a->b w1, b->a w1, b->b w1; out_w: a=1, b=2; in_w: a=1, b=2
    assert df.loc["a", "out_w"] == 1 and df.loc["b", "out_w"] == 2
    assert df.loc["a", "in_w"] == 1 and df.loc["b", "in_w"] == 2
    S = 1_000_000_000
    base = (15 * S) // 100
    # r1[a] = base + (85*S*1)//(100*2) ; r1[b] = base + (85*S*1)//(100*1)
    #                                           + (85*S*1)//(100*2)
    assert df.loc["a", "pr3"] == base + (85 * S) // 200
    assert df.loc["b", "pr3"] == base + (85 * S) // 100 + (85 * S) // 200


def test_corpus_split_deterministic_strata(ray_session, tmp_path):
    from yomitoku_ray.functions.clean import corpus_split
    from yomitoku_ray.kernels.md5_vec import md5_u64_of_ints

    docs = [
        {"doc_id": i, "text": "x" * (i + 1), "source": "s" + str(i % 2)}
        for i in range(50)
    ]
    for r in docs:
        r["lang"], r["n_chars"] = "en", len(r["text"])
    pq.write_table(pa.Table.from_pylist(docs), str(tmp_path / "documents.parquet"))
    df = corpus_split(str(tmp_path))
    # exact reconstruction from the same residue rule
    import numpy as np

    res = md5_u64_of_ints(np.arange(50, dtype="int64")) % np.uint64(100)
    split = np.where(res < 10, "test", np.where(res < 20, "val", "train"))
    for (src, sp), grp in pd.DataFrame(
        {"src": ["s" + str(i % 2) for i in range(50)], "sp": split,
         "chars": [i + 1 for i in range(50)]}
    ).groupby(["src", "sp"]):
        row = df[(df["source"] == src) & (df["split"] == sp)]
        assert int(row["n_docs"].iloc[0]) == len(grp)
        assert int(row["n_chars"].iloc[0]) == int(grp["chars"].sum())
    assert int(df["n_docs"].sum()) == 50


def test_events_spike_days_integer_sigma(ray_session, tmp_path):
    import datetime as dt

    from yomitoku_ray.functions.relational import events_spike_days

    rows = []
    eid = 0
    # type 'a': 1 event/day for 9 days, 10 events on day 10 -> spike
    for day in range(9):
        rows.append({"event_id": (eid := eid + 1), "user_id": 1, "event_type": "a",
                     "ts": dt.datetime(2024, 1, 1 + day)})
    for k in range(10):
        rows.append({"event_id": (eid := eid + 1), "user_id": 1, "event_type": "a",
                     "ts": dt.datetime(2024, 1, 10, k)})
    # type 'b': perfectly flat -> zero variance, no spikes
    for day in range(5):
        rows.append({"event_id": (eid := eid + 1), "user_id": 2, "event_type": "b",
                     "ts": dt.datetime(2024, 1, 1 + day)})
    for r in rows:
        r["value"], r["props"] = 1.0, "{}"
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "events.parquet"))
    df = events_spike_days(str(tmp_path))
    a = df[df["event_type"] == "a"]
    assert a["is_spike"].tolist() == [0] * 9 + [1]
    b = df[df["event_type"] == "b"]
    assert b["is_spike"].sum() == 0


def test_segment_dedup_leading_space_not_empty(ray_session, tmp_path):
    """A doc starting with a space (or containing runs of spaces) is not an
    empty doc: its segments must participate in cross-doc dedup (ADVICE r4:
    the old ws[0] != '' guard silently dropped all of them)."""
    import sys

    import duckdb

    from yomitoku_ray.functions.clean import segment_dedup

    shared = " ".join(f"s{k}" for k in range(10))
    docs = [
        {"doc_id": 0, "text": " " + shared + "  x0 x1"},  # leading + double space
        {"doc_id": 1, "text": shared + " y0"},
        {"doc_id": 2, "text": "   "},  # all spaces -> genuinely empty
    ]
    for r in docs:
        r["lang"], r["source"], r["n_chars"] = "en", "a", len(r["text"])
    pq.write_table(pa.Table.from_pylist(docs), str(tmp_path / "documents.parquet"))
    df = (
        segment_dedup(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert df.loc[0, "clean_text"] == "x0 x1"  # shared segment dropped, tail kept
    assert df.loc[0, "n_kept"] == 1 and df.loc[0, "n_dropped"] == 1
    assert df.loc[1, "clean_text"] == "y0"
    assert df.loc[2, "clean_text"] == "" and df.loc[2, "n_kept"] == 0
    assert df.loc[2, "n_dropped"] == 0

    # the DuckDB oracle agrees bit-for-bit on the same adversarial table
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    sql = entry.oracle_sql()["segment_dedup"]
    ora = con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        df.astype({"n_kept": "int64", "n_dropped": "int64"}),
        ora.astype({"n_kept": "int64", "n_dropped": "int64"}),
        check_like=True,
    )
