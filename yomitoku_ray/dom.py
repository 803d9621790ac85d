"""Tolerant HTML -> DOM tree (stdlib only).

The analogue of the reference's image loading + preprocessing
(``/root/reference/src/yomitoku/data/functions.py:33-78,196-264``): our
"pixels" are the raw HTML byte stream (BASELINE.json input_hint), so this
module owns byte validation, charset decoding (whitelist mirroring
``cli/main.py:82-91``) and best-effort parsing of malformed markup (a bad
document must produce an error row, never kill a block —
``cli/main.py:548-549`` at row granularity).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Optional

MIN_HTML_BYTES = 32  # analogue of MIN_IMAGE_SIZE (reference constants.py:6)
WARN_HTML_BYTES = 720  # analogue of WARNING_IMAGE_SIZE (constants.py:7)
MAX_HTML_BYTES = 8 * 1024 * 1024  # giant-doc guard (wide-record skew control)

SUPPORTED_ENCODINGS = ["utf-8", "utf-8-sig", "shift-jis", "euc-jp", "cp932"]

VOID_ELEMENTS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

# Elements whose open tag implicitly closes a same-name ancestor.
_AUTOCLOSE_SAME = {"p", "li", "tr", "td", "th", "option", "dt", "dd"}
# td/th close an open td/th; tr closes tr and any open td/th.
_AUTOCLOSE_MAP = {
    "td": {"td", "th"},
    "th": {"td", "th"},
    "tr": {"tr", "td", "th"},
    "li": {"li"},
    "p": {"p"},
    "dt": {"dt", "dd"},
    "dd": {"dt", "dd"},
}

_RAWTEXT = {"script", "style"}


class DomNode:
    """DOM node ("#text" for text nodes, "#root" for the root). Plain
    __slots__ class, hand-written init: this is the hottest allocation in
    the extract stage (one per tag/text run per page)."""

    __slots__ = ("tag", "attrs", "children", "text", "parent")

    def __init__(
        self,
        tag: str,
        attrs: Optional[dict] = None,
        children: Optional[List["DomNode"]] = None,
        text: str = "",
        parent: Optional["DomNode"] = None,
    ):
        self.tag = tag
        self.attrs = {} if attrs is None else attrs
        self.children = [] if children is None else children
        self.text = text
        self.parent = parent

    def append(self, node: "DomNode"):
        node.parent = self
        self.children.append(node)

    def iter(self):
        yield self
        for child in self.children:
            yield from child.iter()

    def find_all(self, tag):
        return [n for n in self.iter() if n.tag == tag]

    def direct(self, tag):
        return [c for c in self.children if c.tag == tag]

    def text_content(self):
        if self.tag == "#text":
            return self.text
        return "".join(c.text_content() for c in self.children)

    def attr(self, name, default=""):
        return self.attrs.get(name, default)


class DecodeError(ValueError):
    pass


def decode_html(raw: bytes) -> str:
    """Decode HTML bytes with the whitelisted encodings.

    Mirrors the reference's encoding whitelist (cli/main.py:82-91); sniffing
    order is fixed and deterministic. Raises DecodeError when nothing fits
    and errors="strict" fails for all candidates.
    """
    if len(raw) < MIN_HTML_BYTES:
        raise DecodeError(f"html too small: {len(raw)} bytes < {MIN_HTML_BYTES}")
    if len(raw) > MAX_HTML_BYTES:
        # Truncate, don't fail: one multi-MB page must not blow up a block.
        raw = raw[:MAX_HTML_BYTES]
    if raw.startswith(b"\xef\xbb\xbf"):
        return raw.decode("utf-8-sig", errors="strict")
    for enc in ("utf-8", "shift-jis", "euc-jp", "cp932"):
        try:
            return raw.decode(enc, errors="strict")
        except (UnicodeDecodeError, LookupError):
            continue
    raise DecodeError("undecodable html bytes (no whitelisted encoding fits)")


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = DomNode("#root")
        self.stack = [self.root]
        self._raw_skip = 0

    @property
    def top(self):
        return self.stack[-1]

    def _autoclose_for(self, tag):
        closers = _AUTOCLOSE_MAP.get(tag)
        if not closers:
            return
        # Close up to the nearest matching ancestor, but never cross a
        # structural boundary (table, body, div, section).
        barrier = {"table", "body", "#root", "div", "section", "article", "figure"}
        for i in range(len(self.stack) - 1, 0, -1):
            t = self.stack[i].tag
            if t in barrier:
                return
            if t in closers:
                del self.stack[i:]
                return

    def handle_starttag(self, tag, attrs):
        if self._raw_skip:
            return
        if tag in _RAWTEXT:
            self._raw_skip += 1
            return
        if tag in _AUTOCLOSE_MAP:
            self._autoclose_for(tag)
        node = DomNode(tag, dict(attrs) if attrs else {})
        top = self.stack[-1]
        node.parent = top
        top.children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        if self._raw_skip:
            return
        self.top.append(DomNode(tag, dict(attrs) if attrs else {}))

    def handle_endtag(self, tag):
        if tag in _RAWTEXT:
            if self._raw_skip:
                self._raw_skip -= 1
            return
        if self._raw_skip:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # Unmatched close tag: ignore (tolerant parse).

    def handle_data(self, data):
        if self._raw_skip:
            return
        if not data or data.isspace():
            return
        node = DomNode("#text", text=data)
        top = self.stack[-1]
        node.parent = top
        top.children.append(node)


def parse_html_stdlib(text: str) -> DomNode:
    """Reference parse via html.parser (the equivalence baseline for the
    fast tokenizer; also the fallback). Never raises on malformed markup."""
    builder = _TreeBuilder()
    try:
        builder.feed(text)
        builder.close()
    except Exception:
        # html.parser is already tolerant; belt-and-braces for pathological
        # inputs — return whatever tree was built so far.
        pass
    return builder.root


def parse_html(text: str) -> DomNode:
    """Best-effort parse; never raises on malformed markup.

    Default path is the flat fast tokenizer (fast_html.feed_events), which
    emits the same event stream as html.parser without its line-tracking
    overhead (~2x on the headline stage; tree-identity pinned by
    tests/test_fast_html.py). A mirrored stdlib abort (unknown marked
    section) yields the same partial tree; any OTHER scanner exception
    falls back to a full stdlib parse.
    """
    from .fast_html import feed_events

    builder = _TreeBuilder()
    try:
        feed_events(text, builder)
        return builder.root
    except ValueError:
        return builder.root  # mirrored stdlib abort -> same partial tree
    except Exception:
        return parse_html_stdlib(text)
