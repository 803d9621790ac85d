"""Fast HTML tokenizer: html.parser event semantics without its overhead.

The headline extract stage spends ~1.6 ms/page inside ``HTMLParser.feed``
(VERDICT r3 #6). Most of that cost is bookkeeping our pipeline never uses:
line/column tracking (``updatepos`` walks every data chunk), CDATA-mode
regex swapping, and layered method dispatch. This module re-implements the
tokenizer loop as a flat scanner that emits the SAME event stream into the
same ``_TreeBuilder`` handlers:

- it reuses ``html.parser``'s own tolerant module regexes
  (``tagfind_tolerant``, ``attrfind_tolerant``,
  ``locatestarttagend_tolerant``, ``endtagfind``) so start/end-tag
  micro-grammar is identical by construction;
- data chunking mirrors ``HTMLParser.goahead`` exactly, including the
  lone-``<`` → separate ``handle_data('<')`` quirk and the tolerant
  EOF recovery for incomplete constructs;
- script/style content is skipped in one regex jump to the exact
  ``</\\s*tag\\s*>`` close condition the stdlib applies in CDATA mode
  (content inside is dropped by the tree builder either way).

Equivalence with the stdlib path is pinned by tests/test_fast_html.py
(tree-identity over the synthetic corpus, the edge-case suite and
adversarial constructs); ``parse_html`` falls back to the stdlib builder
if the scanner ever raises.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import (  # tolerant micro-grammar shared with the stdlib
    attrfind_tolerant,
    locatestarttagend_tolerant,
    tagfind_tolerant,
)

_RAWTEXT = {"script", "style"}
# exact stdlib CDATA close condition: endtagfind match whose name lowers to
# the open rawtext element
_RAW_CLOSE = {
    t: re.compile(r"</\s*%s\s*>" % t, re.IGNORECASE) for t in _RAWTEXT
}
_ENDTAGFIND = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_COMMENTCLOSE = re.compile(r"--\s*>")
# fast paths for the overwhelmingly common shapes; anything else falls
# through to the faithful stdlib-mirroring slow paths below
_SIMPLE_START = re.compile(r"<([a-zA-Z][a-zA-Z0-9]*)\s*>")
_SIMPLE_END = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
# _markupbase marked-section grammar
_DECLNAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
_MARKEDSECTIONCLOSE = re.compile(r"]\s*]\s*>")
_MSMARKEDSECTIONCLOSE = re.compile(r"]\s*--\s*>")


def feed_events(rawdata: str, builder) -> None:
    """Scan ``rawdata`` and drive ``builder``'s handle_starttag /
    handle_startendtag / handle_endtag / handle_data with the same calls
    ``HTMLParser(convert_charrefs=True).feed`` would make (modulo rawtext
    content, which the builder discards)."""
    i, n = 0, len(rawdata)
    find = rawdata.find
    startswith = rawdata.startswith
    while i < n:
        # -- data run up to the next '<' (charrefs converted, as stdlib) --
        j = find("<", i)
        if j < 0:
            j = n
        if i < j:
            chunk = rawdata[i:j]
            builder.handle_data(unescape(chunk) if "&" in chunk else chunk)
        i = j
        if i >= n:
            break
        # -- classify the construct at '<' ---------------------------------
        c = rawdata[i + 1] if i + 1 < n else ""
        if c.isalpha() and c.isascii():
            sm = _SIMPLE_START.match(rawdata, i)
            if sm is not None:
                tag = sm.group(1).lower()
                builder.handle_starttag(tag, [])
                k = sm.end()
                if tag in _RAWTEXT:
                    cm = _RAW_CLOSE[tag].search(rawdata, k)
                    if cm is None:
                        k = n
                    else:
                        builder.handle_endtag(tag)
                        k = cm.end()
            else:
                k = _parse_starttag(rawdata, i, builder)
        elif c == "/":
            # well-formed close tag: its '>' is necessarily the first '>'
            em = _SIMPLE_END.match(rawdata, i)
            if em is not None:
                builder.handle_endtag(em.group(1).lower())
                k = em.end()
            else:
                k = _parse_endtag(rawdata, i, builder)
        elif startswith("<!--", i):
            cm = _COMMENTCLOSE.search(rawdata, i + 4)
            k = cm.end() if cm else -1
        elif startswith("<![", i):
            k = _parse_marked_section(rawdata, i)
        elif c == "?" or c == "!":
            # PI / declaration / bogus comment: the builder has no
            # handlers, so only the skip width matters. Doctype scans for
            # '>' after its 9-char keyword, the others from i+2; both are
            # the first '>' after i+1 either way.
            gt = find(">", i + 2)
            k = gt + 1 if gt >= 0 else -1
        elif i + 1 < n:
            builder.handle_data("<")
            i += 1
            continue
        else:
            builder.handle_data("<")
            break
        if k < 0:
            # incomplete construct at EOF: stdlib tolerant recovery
            # (HTMLParser.goahead, `if k < 0: ... if not end: break`) —
            # note the stdlib unescapes this chunk under convert_charrefs.
            k = find(">", i + 1)
            if k < 0:
                k = find("<", i + 1)
                if k < 0:
                    k = i + 1
            else:
                k += 1
            chunk = rawdata[i:k]
            builder.handle_data(unescape(chunk) if "&" in chunk else chunk)
        i = k


def _parse_marked_section(rawdata: str, i: int) -> int:
    """Mirror of _markupbase.parse_marked_section skip widths. Unknown
    section keywords raise, exactly like the stdlib (whose error() call
    aborts feed(); parse_html turns either abort into a partial tree)."""
    if i + 3 >= len(rawdata):
        return -1  # stdlib _scan_name: i == n -> incomplete
    m = _DECLNAME.match(rawdata, i + 3)
    if not m:
        raise ValueError("malformed marked section")  # stdlib error() abort
    if m.end() == len(rawdata):
        return -1  # name runs to end of buffer -> incomplete
    name = m.group().strip().lower()
    if name in ("temp", "cdata", "ignore", "include", "rcdata"):
        cm = _MARKEDSECTIONCLOSE.search(rawdata, i + 3)
    elif name in ("if", "else", "endif"):
        cm = _MSMARKEDSECTIONCLOSE.search(rawdata, i + 3)
    else:
        raise ValueError("unknown status keyword in marked section")
    return cm.end() if cm else -1


def _check_whole_start_tag(rawdata: str, i: int) -> int:
    """Verbatim port of HTMLParser.check_for_whole_start_tag (sans the
    unreachable buffer-boundary arm — we always see the whole document)."""
    m = locatestarttagend_tolerant.match(rawdata, i)
    j = m.end()
    nxt = rawdata[j : j + 1]
    if nxt == ">":
        return j + 1
    if nxt == "/":
        if rawdata.startswith("/>", j):
            return j + 2
        return -1
    if nxt == "":
        return -1  # end of input
    if nxt in (
        "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ):
        return -1
    return j if j > i else i + 1


def _parse_starttag(rawdata: str, i: int, builder) -> int:
    """Mirror of HTMLParser.parse_starttag, reusing the stdlib's tolerant
    regexes."""
    endpos = _check_whole_start_tag(rawdata, i)
    if endpos < 0:
        return endpos

    tm = tagfind_tolerant.match(rawdata, i + 1)
    tag = tm.group(1).lower()
    attrs = []
    k = tm.end()
    while k < endpos:
        am = attrfind_tolerant.match(rawdata, k)
        if not am:
            break
        attrname, rest, attrvalue = am.group(1, 2, 3)
        if not rest:
            attrvalue = None
        elif (
            attrvalue[:1] == "'" == attrvalue[-1:]
            or attrvalue[:1] == '"' == attrvalue[-1:]
        ):
            attrvalue = attrvalue[1:-1]
        if attrvalue and "&" in attrvalue:
            attrvalue = unescape(attrvalue)
        attrs.append((attrname.lower(), attrvalue))
        k = am.end()
    end = rawdata[k:endpos].strip()
    if end not in (">", "/>"):
        builder.handle_data(rawdata[i:endpos])
        return endpos
    if end.endswith("/>"):
        builder.handle_startendtag(tag, attrs)
        return endpos
    builder.handle_starttag(tag, attrs)
    if tag in _RAWTEXT:
        # CDATA mode: skip to the exact stdlib close condition; content is
        # dropped by the builder's _raw_skip either way.
        cm = _RAW_CLOSE[tag].search(rawdata, endpos)
        if cm is None:
            return len(rawdata)  # unclosed rawtext: consume the rest
        builder.handle_endtag(tag)
        return cm.end()
    return endpos


def _parse_endtag(rawdata: str, i: int, builder) -> int:
    """Mirror of HTMLParser.parse_endtag (non-CDATA branch)."""
    gt = rawdata.find(">", i + 1)
    if gt < 0:
        return -1
    gtpos = gt + 1
    m = _ENDTAGFIND.match(rawdata, i)
    if not m:
        nm = tagfind_tolerant.match(rawdata, i + 2)
        if not nm:
            if rawdata.startswith("</>", i):
                return i + 3
            # bogus comment: skip to '>'
            return gtpos
        tagname = nm.group(1).lower()
        gt2 = rawdata.find(">", nm.end())
        builder.handle_endtag(tagname)
        return gt2 + 1 if gt2 >= 0 else len(rawdata)
    builder.handle_endtag(m.group(1).lower())
    return gtpos
