"""HTML robustness: entities, comments, nesting, malformed structures."""

from yomitoku_ray.oracle import analyze_html_bytes


def run(html: str):
    out, err = analyze_html_bytes(html.encode("utf-8"), "http://t/x")
    return out, err


def test_entities_decoded():
    out, err = run("<html><body><p>a &amp; b &lt;c&gt; &#x65E5;</p></body></html>")
    assert err is None
    assert "a & b <c> 日" in out["extracted_text"].replace("\n", " ")


def test_comments_ignored():
    out, err = run("<html><body><!-- hidden --><p>visible text here</p><!-- more --></body></html>")
    assert err is None
    assert "visible" in out["extracted_text"]
    assert "hidden" not in out["extracted_text"]


def test_script_style_skipped():
    out, err = run(
        "<html><head><style>p{color:red}</style></head><body>"
        "<script>var hidden = 'nope';</script><p>real content</p></body></html>"
    )
    assert err is None
    assert "real" in out["extracted_text"]
    assert "nope" not in out["extracted_text"] and "color" not in out["extracted_text"]


def test_nested_table_text_folds_into_cell():
    out, err = run(
        "<html><body><table><tr><td>outer "
        "<table><tr><td>inner</td></tr></table></td><td>b</td></tr>"
        "<tr><td>c</td><td>d</td></tr></table></body></html>"
    )
    assert err is None
    joined = out["extracted_text"]
    assert "outer" in joined and "inner" in joined


def test_deeply_nested_divs():
    html = "<html><body>" + "<div>" * 80 + "<p>deep text</p>" + "</div>" * 80 + "</body></html>"
    out, err = run(html)
    assert err is None
    assert "deep" in out["extracted_text"]


def test_unclosed_tags_tolerated():
    out, err = run("<html><body><p>first para<p>second para<div>third</body></html>")
    assert err is None
    text = out["extracted_text"]
    assert "first" in text and "second" in text and "third" in text


def test_mismatched_close_tags():
    out, err = run("<html><body><p>text</span></b></p></body></html>")
    assert err is None
    assert "text" in out["extracted_text"]


def test_attributes_with_angle_brackets():
    out, err = run('<html><body><p title="a>b">content body</p></body></html>')
    assert err is None
    assert "content" in out["extracted_text"]


def test_no_body_tag():
    out, err = run("<p>bare paragraph without body wrapper</p>")
    assert err is None
    assert "bare" in out["extracted_text"]


def test_vertical_text_in_table_cell():
    out, err = run(
        "<html><body><table><tr>"
        "<th>見出し</th><td>縦書きテキストのセルの内容です</td>"
        "</tr><tr><th>次</th><td>別内容</td></tr></table></body></html>"
    )
    assert err is None
    assert "見出し" in out["extracted_text"]
