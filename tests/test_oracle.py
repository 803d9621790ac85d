"""Oracle behavior tests over the synthetic page grammar."""

import json

from yomitoku_ray.oracle import analyze_html_bytes
from yomitoku_ray.synth.pages import gen_page


def test_basic_page_structure():
    html = (
        "<html><body>"
        "<header>site head</header>"
        "<h1>Title Here</h1>"
        "<p>alpha beta gamma</p>"
        "<table><tr><th>k1</th><th>k2</th></tr><tr><td>v1</td><td>v2</td></tr></table>"
        "<footer>the footer</footer>"
        "</body></html>"
    ).encode("utf-8")
    out, err = analyze_html_bytes(html, "http://x/1")
    assert err is None
    doc = json.loads(out["doc_json"])
    roles = [p["role"] for p in doc["paragraphs"]]
    assert "page_header" in roles and "page_footer" in roles
    assert "section_headings" in roles
    assert len(doc["tables"]) == 1
    t = doc["tables"][0]
    assert t["n_row"] == 2 and t["n_col"] == 2
    cell_texts = {(c["row"], c["col"]): c["contents"] for c in t["cells"]}
    assert cell_texts[(1, 1)] == "k1" and cell_texts[(2, 2)] == "v2"
    # Header is first in reading order, footer last.
    ordered = sorted(doc["paragraphs"], key=lambda p: p["order"])
    assert ordered[0]["role"] == "page_header"
    assert ordered[-1]["role"] == "page_footer"
    assert "k1" in out["extracted_text"] and "alpha" in out["extracted_text"]


def test_rowspan_colspan_cells():
    html = (
        "<html><body><table>"
        "<tr><th>a</th><th>b</th><th>c</th></tr>"
        '<tr><td rowspan="2">big</td><td>x</td><td>y</td></tr>'
        "<tr><td>z</td><td>w</td></tr>"
        "</table></body></html>"
    ).encode("utf-8")
    out, err = analyze_html_bytes(html, "http://x/2")
    assert err is None
    doc = json.loads(out["doc_json"])
    t = doc["tables"][0]
    span_cells = [c for c in t["cells"] if c["row_span"] > 1 or c["col_span"] > 1]
    assert len(span_cells) == 1
    sc = span_cells[0]
    assert sc["row"] == 2 and sc["col"] == 1 and sc["row_span"] == 2
    assert sc["contents"] == "big"
    # 3x3 grid minus one merged cell -> 8 cells
    assert len(t["cells"]) == 8


def test_boilerplate_nav_dropped():
    nav = "".join(f'<a href="/{i}">link{i}</a> ' for i in range(8))
    html = (
        f"<html><body><nav>{nav}</nav><p>real content sentence here</p></body></html>"
    ).encode("utf-8")
    out, err = analyze_html_bytes(html, "http://x/3")
    assert err is None
    assert "link0" not in out["extracted_text"]
    assert "real" in out["extracted_text"]


def test_figure_nesting():
    html = (
        "<html><body><figure><figcaption>caption words</figcaption>"
        "<p>figure body text</p></figure><p>outside text</p></body></html>"
    ).encode("utf-8")
    out, err = analyze_html_bytes(html, "http://x/4")
    assert err is None
    doc = json.loads(out["doc_json"])
    assert len(doc["figures"]) == 1
    fig_texts = [p["contents"] for p in doc["figures"][0]["paragraphs"]]
    assert any("caption" in t for t in fig_texts)
    # Nested paragraphs must not remain top-level.
    top_texts = " ".join(p["contents"] for p in doc["paragraphs"])
    assert "caption" not in top_texts
    assert "outside" in top_texts


def test_vertical_text_direction():
    html = (
        '<html><body><p class="vertical">縦書きのテキストです全部縦です</p></body></html>'
    ).encode("utf-8")
    out, err = analyze_html_bytes(html, "http://x/5")
    assert err is None
    doc = json.loads(out["doc_json"])
    assert all(w["direction"] == "vertical" for w in doc["words"])
    assert doc["paragraphs"][0]["direction"] == "vertical"


def test_ruby_filter_on_off():
    html = (
        "<html><body><p><ruby>東京<rt>とうきょう</rt></ruby>は首都圏の中心です"
        "そして大阪は西日本の中心です</p></body></html>"
    ).encode("utf-8")
    with_ruby, err1 = analyze_html_bytes(html, "http://x/6", ignore_ruby=False)
    without_ruby, err2 = analyze_html_bytes(html, "http://x/6", ignore_ruby=True)
    assert err1 is None and err2 is None
    assert "とうきょう" in with_ruby["extracted_text"]
    assert "とうきょう" not in without_ruby["extracted_text"]
    assert "東京" in without_ruby["extracted_text"]


def test_nfkc_normalization():
    html = "<html><body><p>ＡＢＣ１２３ ｶﾀｶﾅ</p></body></html>".encode("utf-8")
    out, err = analyze_html_bytes(html, "http://x/7")
    assert err is None
    assert "ABC123" in out["extracted_text"]
    assert "カタカナ" in out["extracted_text"]


def test_error_rows():
    out, err = analyze_html_bytes(b"", "http://x/e1")
    assert err is not None and out["extracted_text"] == ""
    out, err = analyze_html_bytes(b"\xff\xfe\x00\x01 garbage \x80\x81" * 4, "http://x/e2")
    assert err is not None


def test_shift_jis_decoding():
    html = "<html><body><p>日本語のテスト文章ですこれは</p></body></html>".encode("shift-jis")
    out, err = analyze_html_bytes(html, "http://x/8")
    assert err is None
    assert "日本語" in out["extracted_text"]


def test_canonical_json_kwargs():
    html = "<html><body><p>json test content</p></body></html>".encode("utf-8")
    out, err = analyze_html_bytes(html, "http://x/9")
    doc = json.loads(out["doc_json"])
    expected = json.dumps(
        doc, ensure_ascii=False, indent=4, sort_keys=True, separators=(",", ": ")
    )
    assert out["doc_json"] == expected


def test_spans_offsets_match_text():
    p = gen_page(3)
    out, err = analyze_html_bytes(p["html"], p["url"])
    assert err is None
    raw = out["extracted_text"].encode("utf-8")
    for span in out["spans"]:
        seg = raw[span["start"] : span["end"]].decode("utf-8")
        assert "\n".join(seg.split("\n")) == seg  # decodable slice
    # Non-overlapping and ordered by start.
    starts = [s["start"] for s in out["spans"]]
    assert starts == sorted(starts)


def test_synthetic_corpus_error_rate():
    n_err = 0
    for i in range(200):
        p = gen_page(i)
        _, err = analyze_html_bytes(p["html"], p["url"])
        if err:
            n_err += 1
    assert 0 < n_err < 20  # ~2% malformed rows by construction


def test_determinism():
    p = gen_page(11)
    a, _ = analyze_html_bytes(p["html"], p["url"])
    b, _ = analyze_html_bytes(p["html"], p["url"])
    assert a == b


def test_orientation_fallback_recovers_flip_text():
    """M5: a flip-text (180-degree) word decodes low-confidence, retries
    through the rotated decode path and comes back upright; clean words
    never enter the retry path (parity with text_recognizer.py:205-225)."""
    from yomitoku_ray.detect import (
        REC_ORIENTATION_FALLBACK_THRESH,
        _rec_score,
        _rotate180_decode,
        detect_page,
    )

    # "hello" rendered upside down: reverse, then map each glyph to its
    # 180-degree form (the inverse of the decode map)
    flipped = "hello"[::-1].translate(
        str.maketrans("acefghijkmrtvwyunqbpd96", "ɐɔǝɟƃɥᴉɾʞɯɹʇʌʍʎnubqdp69")
    )
    # sanity: the synthetic flip word scores below the gate and decodes back
    assert _rec_score(flipped, 2) < REC_ORIENTATION_FALLBACK_THRESH
    assert _rotate180_decode(flipped) == "hello"

    html = f"<html><body><p>{flipped} world</p></body></html>"
    det = detect_page(html)
    contents = {w.content for w in det.words}
    assert "hello" in contents  # recovered
    assert "world" in contents  # untouched
    for w in det.words:
        assert w.rec_score >= REC_ORIENTATION_FALLBACK_THRESH or "�" in w.content


def test_orientation_fallback_keeps_unfixable_garbage():
    from yomitoku_ray.detect import detect_page

    html = "<html><body><p>abc�def normal</p></body></html>"
    det = detect_page(html)
    garbled = [w for w in det.words if "�" in w.content]
    assert garbled  # kept, not dropped
    assert all(w.rec_score < 0.75 for w in garbled)  # retry did not lie


def test_token_width_latin1_trick_parity():
    """_token_width's latin-1 count must equal the per-char sum for every
    char class (ASCII, latin-1 high bytes, CJK, emoji, surrogates-escapes,
    mixed)."""
    from yomitoku_ray.detect import FONT, _char_width, _token_width

    samples = [
        "",
        "hello",
        "café",  # U+00E9 (<= 0xFF, narrow)
        "ÿþ",  # 0xFF boundary chars
        "Ā",  # first wide char
        "日本語テスト",
        "mix日本mix",
        "a\U0001F600b",  # astral
        "\udcff".encode("utf-8", "surrogatepass").decode("utf-8", "surrogatepass"),
    ]
    for full_w in {w for w, _ in FONT.values()}:
        for s in samples:
            assert _token_width(s, full_w) == sum(
                _char_width(c, full_w) for c in s
            ), (s, full_w)
