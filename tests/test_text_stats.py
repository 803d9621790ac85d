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
