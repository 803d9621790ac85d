"""Deterministic synthetic Common-Crawl-style pages table.

Schema exactly per BASELINE.json input_hint / FIXTURES.md §1:
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``.

Every page is a pure function of ``(seed, row_index)`` so any worker can
generate any shard independently (no coordination, no external data) and the
oracle/pipeline comparison is reproducible across runs and parallelism
levels. Content grammar per FIXTURES.md §2: headings, paragraphs, tables
with row/col spans, figures with nested captions, ruby runs, vertical-text
blocks, nav/aside link farms (boilerplate), and ~2% malformed rows.
"""

from __future__ import annotations

import random

import pyarrow as pa

SEED = 42

_JA_WORDS = (
    "東京 大阪 京都 名古屋 横浜 神戸 福岡 札幌 仙台 広島 "
    "会社 銀行 学校 病院 駅前 市場 公園 図書館 美術館 商店街 "
    "経済 政治 文化 歴史 科学 技術 産業 貿易 金融 観光 "
    "発表 報告 調査 研究 開発 販売 生産 計画 提案 決定 "
    "今日 明日 昨日 今年 去年 来年 午前 午後 毎日 毎週"
).split()

_JA_PARTICLES = "の は が を に で と も から まで".split()

_EN_WORDS = (
    "the quick brown fox jumps over lazy dog data pipeline stream "
    "cluster node shard batch arrow parquet table column row vector "
    "index query filter merge sort group window join scan extract "
    "document content layout heading footer figure caption span cell"
).split()

_RUBY_PAIRS = [
    ("東京", "とうきょう"),
    ("大阪", "おおさか"),
    ("名古屋", "なごや"),
    ("経済", "けいざい"),
    ("技術", "ぎじゅつ"),
    ("観光", "かんこう"),
]

_DOMAINS = [f"site{i:03d}.example.jp" for i in range(40)] + [
    "news.example.jp",
    "blog.example.com",
    "shop.example.jp",
    "wiki.example.org",
    "portal.example.jp",
]

_TS_BASE_US = 1_700_000_000_000_000  # fixed epoch base (us)


def _ja_sentence(r: random.Random, n_words=None) -> str:
    n = n_words or r.randint(4, 10)
    parts = []
    for _ in range(n):
        parts.append(r.choice(_JA_WORDS))
        if r.random() < 0.6:
            parts.append(r.choice(_JA_PARTICLES))
    return "".join(parts) + "。"


def _en_sentence(r: random.Random, n_words=None) -> str:
    n = n_words or r.randint(5, 12)
    return " ".join(r.choice(_EN_WORDS) for _ in range(n)) + "."


def _sentence(r: random.Random, lang: str, n_words=None) -> str:
    if lang == "ja":
        return _ja_sentence(r, n_words)
    return _en_sentence(r, n_words)


def _ruby_run(r: random.Random) -> str:
    base, reading = r.choice(_RUBY_PAIRS)
    return f"<ruby>{base}<rt>{reading}</rt></ruby>"


def _paragraph_html(r: random.Random, lang: str) -> str:
    n = r.randint(1, 4)
    body = []
    for _ in range(n):
        s = _sentence(r, lang)
        if lang == "ja" and r.random() < 0.25:
            s = _ruby_run(r) + s
        body.append(s)
    cls = ' class="vertical"' if lang == "ja" and r.random() < 0.08 else ""
    return f"<p{cls}>{' '.join(body)}</p>"


def _table_html(r: random.Random, lang: str) -> str:
    n_rows = r.randint(2, 5)
    n_cols = r.randint(2, 4)
    # Optional one span cell.
    span_cell = None
    if r.random() < 0.5 and n_rows > 2 and n_cols > 2:
        sr = r.randint(1, n_rows - 2)
        sc = r.randint(0, n_cols - 2)
        span_cell = (sr, sc, r.choice([1, 2]), r.choice([1, 2]))

    occupied = set()
    rows_html = []
    for i in range(n_rows):
        cells = []
        j = 0
        while j < n_cols:
            if (i, j) in occupied:
                j += 1
                continue
            tag = "th" if i == 0 else "td"
            word = r.choice(_JA_WORDS if lang == "ja" else _EN_WORDS)
            attrs = ""
            if span_cell and span_cell[0] == i and span_cell[1] == j:
                _, _, rs, cs = span_cell
                rs = min(rs + 1, n_rows - i)
                cs = min(cs + 1, n_cols - j)
                attrs = f' rowspan="{rs}" colspan="{cs}"'
                for ri in range(i, i + rs):
                    for ci in range(j, j + cs):
                        occupied.add((ri, ci))
            cells.append(f"<{tag}{attrs}>{word}{j}</{tag}>")
            j += 1
        rows_html.append("<tr>" + "".join(cells) + "</tr>")
    return "<table>" + "".join(rows_html) + "</table>"


def _figure_html(r: random.Random, lang: str) -> str:
    cap = _sentence(r, lang)
    body = _sentence(r, lang) if r.random() < 0.5 else ""
    inner = f"<figcaption>{cap}</figcaption>"
    if body:
        inner += f"<p>{body}</p>"
    return f"<figure>{inner}</figure>"


def _nav_html(r: random.Random) -> str:
    links = "".join(
        f'<a href="/cat/{i}">{r.choice(_EN_WORDS)}</a> ' for i in range(r.randint(4, 9))
    )
    return f"<nav>{links}</nav>"


def gen_page(i: int, seed: int = SEED) -> dict:
    """Deterministic page row for global index ``i``."""
    r = random.Random((seed << 20) ^ i)

    # Zipf-ish domain skew: a few hot domains absorb much of the traffic.
    z = r.paretovariate(1.1)
    domain = _DOMAINS[min(int(z) - 1, len(_DOMAINS) - 1)]
    url = f"https://{domain}/p/{seed}/{i:08d}"
    ts = _TS_BASE_US + i * 1_000_000 + r.randint(0, 999_999)
    lang = "ja" if r.random() < 0.75 else "en"

    roll = r.random()
    if roll < 0.02:
        # Malformed/truncated/empty rows exercise the per-row error policy.
        kind = r.randint(0, 2)
        if kind == 0:
            html = b""
        elif kind == 1:
            html = b"\xff\xfe\x00\x01 garbage \x80\x81" * 4
        else:
            html = ("<html><body><p>" + _sentence(r, lang)).encode("utf-8")[:40]
        return {"url": url, "warc_ts": ts, "html": html, "text": "", "lang": lang}

    title = _sentence(r, lang, 3)
    parts = [f"<header>{title}</header>"]
    parts.append(_nav_html(r))
    n_sections = r.randint(1, 4)
    for s in range(n_sections):
        parts.append(f"<h{min(s % 3 + 1, 3)}>{_sentence(r, lang, 3)}</h{min(s % 3 + 1, 3)}>")
        for _ in range(r.randint(1, 4)):
            parts.append(_paragraph_html(r, lang))
        if r.random() < 0.45:
            parts.append(_table_html(r, lang))
        if r.random() < 0.3:
            parts.append(_figure_html(r, lang))
    if r.random() < 0.4:
        parts.append(_nav_html(r))
    parts.append(f"<footer>copyright {domain}</footer>")

    html_text = (
        "<html><head><meta charset='utf-8'><title>t</title>"
        "<script>var x=1;</script><style>p{}</style></head><body>"
        + "".join(parts)
        + "</body></html>"
    )

    import re as _re

    visible = _re.sub(r"<[^>]+>", " ", html_text)
    visible = " ".join(visible.split())

    enc = "utf-8"
    if lang == "ja" and r.random() < 0.1:
        enc = r.choice(["shift-jis", "euc-jp"])
    try:
        html = html_text.encode(enc)
    except UnicodeEncodeError:
        html = html_text.encode("utf-8")

    return {"url": url, "warc_ts": ts, "html": html, "text": visible, "lang": lang}


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def generate_pages_table(n: int, seed: int = SEED, start: int = 0) -> pa.Table:
    """Rows [start, start+n) as one Arrow table."""
    rows = [gen_page(i, seed) for i in range(start, start + n)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


SF_ROWS = {"0.001": 1_000, "0.01": 10_000, "0.1": 100_000}


def rows_for_sf_dir(sf_dir: str) -> int:
    for key, n in SF_ROWS.items():
        if f"sf{key}" in sf_dir:
            return n
    return 1_000


def ensure_pages_parquet(sf_dir: str, cache_root: str = "/tmp/yomitoku_ray_pages") -> str:
    """Generate (once, cached) the pages parquet for a testdata sf dir."""
    return ensure_pages_parquet_n(rows_for_sf_dir(sf_dir), cache_root)


def ensure_pages_parquet_n(n: int, cache_root: str = "/tmp/yomitoku_ray_pages") -> str:
    """Generate (once, cached) a pages parquet with exactly ``n`` rows.

    Written as multiple row-grouped files via parallel Ray tasks so the
    bench's read stage has enough input blocks to parallelize over.
    """
    import os

    import pyarrow.parquet as pq
    out_dir = os.path.join(cache_root, f"n{n}_seed{SEED}")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir

    tmp_dir = out_dir + ".tmp"
    os.makedirs(tmp_dir, exist_ok=True)
    shard_rows = 5_000
    shards = [(s, min(shard_rows, n - s)) for s in range(0, n, shard_rows)]

    import ray

    if n > shard_rows and ray.is_initialized():
        # Parallel shard generation when a Ray session already exists; the
        # serial path below keeps this callable from contexts that must not
        # own (or implicitly start) a Ray session, e.g. oracle preparation.
        @ray.remote
        def _write(shard_idx, start, count):
            t = generate_pages_table(count, SEED, start)
            pq.write_table(t, os.path.join(tmp_dir, f"part-{shard_idx:05d}.parquet"))
            return count

        ray.get([_write.remote(i, s, c) for i, (s, c) in enumerate(shards)])
    else:
        for i, (s, c) in enumerate(shards):
            t = generate_pages_table(c, SEED, s)
            pq.write_table(t, os.path.join(tmp_dir, f"part-{i:05d}.parquet"))

    import shutil

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)  # stale partial dir from a killed run
    os.replace(tmp_dir, out_dir)
    with open(done, "w") as f:
        f.write(str(n))
    return out_dir
