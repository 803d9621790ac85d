"""Value-normalizer registry (scalar UDF layer).

Re-implementation of the reference's normalization rules
(``/root/reference/src/yomitoku/extractor/normalizer.py:7-201``): same rule
names, same patterns, same Japanese era offsets, verified by exact in/out
pairs in tests/test_normalize_extract.py. The reference's jaconv dependency
is replaced with direct Unicode codepoint tables (full-width ASCII
U+FF01-U+FF5E <-> ASCII, ideographic space -> space, kana blocks shifted by
0x60) — exactly what jaconv does for the flag combination the reference
uses (digit=True, ascii=True, kana=False). Rules are declared as data
(pattern tables) where the reference writes one function per variant.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Optional

_REGISTRY: Dict[str, Callable[[str], str]] = {}


def register(name: str):
    """Decorator registry (user-extension surface; parity: normalizer.py:10-15)."""

    def decorator(fn: Callable[[str], str]):
        _REGISTRY[name] = fn
        return fn

    return decorator


def get_normalizer(name: str) -> Optional[Callable[[str], str]]:
    return _REGISTRY.get(name)


def list_normalizers():
    return sorted(_REGISTRY)


def apply_normalize(text, rule: Optional[str]) -> str:
    """Registry dispatch with pass-through defaults (normalizer.py:22-30)."""
    if rule is None:
        return text if isinstance(text, str) else str(text)
    if not isinstance(text, str):
        text = str(text)
    fn = get_normalizer(rule)
    return text if fn is None else fn(text)


# -- width / kana codepoint tables (jaconv stand-ins) ------------------------

_Z2H = {0x3000: 0x20, **{cp: cp - 0xFEE0 for cp in range(0xFF01, 0xFF5F)}}
_K2H = {cp: cp - 0x60 for cp in range(0x30A1, 0x30F7)}
_H2K = {cp: cp + 0x60 for cp in range(0x3041, 0x3097)}


def z2h(text: str) -> str:
    """Full-width ASCII/digits -> half-width (kana untouched)."""
    return text.translate(_Z2H)


def kata2hira(text: str) -> str:
    return text.translate(_K2H)


def hira2kata(text: str) -> str:
    return text.translate(_H2K)


# -- simple strip/keep rules -------------------------------------------------

_KEEP_RULES = {
    # name -> (pre-transform, removal pattern)
    "strip_spaces": (None, r"[\s　]+"),
    "alphanumeric": (z2h, r"[^a-zA-Z0-9]"),
    "hiragana": (kata2hira, r"[^぀-ゟ]"),
    "katakana": (hira2kata, r"[^゠-ヿ]"),
}

for _name, (_pre, _pat) in _KEEP_RULES.items():

    def _make(pre, pat):
        rx = re.compile(pat)

        def rule(text: str) -> str:
            if pre is not None:
                text = pre(text)
            return rx.sub("", text)

        return rule

    register(_name)(_make(_pre, _pat))


@register("numeric")
def numeric(text: str) -> str:
    text = z2h(text).replace(",", "").replace("、", "")
    return re.sub(r"[^\d.\-+]", "", text)


# -- digit-grouping rules (phone / postal) -----------------------------------


def _digit_groups(text: str, groupings: dict) -> str:
    """Keep digits only; hyphenate by the grouping matching the length."""
    digits = re.sub(r"[^\d]", "", z2h(text))
    parts = groupings.get(len(digits))
    if not parts:
        return digits
    out, pos = [], 0
    for width in parts:
        out.append(digits[pos : pos + width])
        pos += width
    return "-".join(out)


@register("phone_jp")
def phone_jp(text: str) -> str:
    return _digit_groups(text, {11: (3, 4, 4), 10: (3, 3, 4)})


@register("postal_code_jp")
def postal_code_jp(text: str) -> str:
    return _digit_groups(text, {7: (3, 4)})


# -- date rules (Japanese eras + western forms) ------------------------------

# era -> year offset (era year 1 == offset + 1)
_ERAS = [("令和", 2018), ("平成", 1988), ("昭和", 1925), ("大正", 1911), ("明治", 1867)]
_ERA_ABBREV = {"R": 2018, "H": 1988, "S": 1925, "T": 1911, "M": 1867}

_DATE_PATTERNS = [
    # (compiled pattern, year-offset resolver) — tried in order
    *(
        (re.compile(rf"{era}\s*(\d+)\s*年\s*(\d+)\s*月\s*(\d+)\s*日"), offset)
        for era, offset in _ERAS
    ),
    (
        re.compile(r"([RHSTM])\s*(\d{1,2})\s*[/\-\.]\s*(\d{1,2})\s*[/\-\.]\s*(\d{1,2})"),
        "abbrev",
    ),
    (re.compile(r"([RHSTM])\s*(\d{1,2})\s*年\s*(\d{1,2})\s*月\s*(\d{1,2})\s*日"), "abbrev"),
    (re.compile(r"(\d{4})\s*年\s*(\d{1,2})\s*月\s*(\d{1,2})\s*日"), 0),
    (re.compile(r"(\d{4})[/\-](\d{1,2})[/\-](\d{1,2})"), 0),
]


def _parse_date(text: str):
    """(year, month, day) or None; order/semantics of normalizer.py:74-109."""
    text = z2h(text)
    for pattern, offset in _DATE_PATTERNS:
        m = pattern.search(text)
        if not m:
            continue
        g = m.groups()
        if offset == "abbrev":
            era_offset = _ERA_ABBREV.get(g[0])
            if not era_offset:
                continue
            return era_offset + int(g[1]), int(g[2]), int(g[3])
        return offset + int(g[0]), int(g[1]), int(g[2])
    return None


def _date_rule(fmt: str):
    def rule(text: str) -> str:
        parsed = _parse_date(text)
        if parsed is None:
            return text
        y, mo, d = parsed
        return fmt.format(y=y, mo=mo, d=d)

    return rule


register("date_jp")(_date_rule("{y:04d}-{mo:02d}-{d:02d}"))
register("date_yyyymmdd")(_date_rule("{y:04d}{mo:02d}{d:02d}"))


# -- time rules --------------------------------------------------------------

_TIME_PATTERNS = [
    (re.compile(r"(\d{1,2})\s*時\s*(\d{1,2})\s*分\s*(\d{1,2})\s*秒"), True),
    (re.compile(r"(\d{1,2})\s*時\s*(\d{1,2})\s*分"), False),
    (re.compile(r"(\d{1,2})\s*:\s*(\d{1,2})\s*:\s*(\d{1,2})"), True),
    (re.compile(r"(\d{1,2})\s*:\s*(\d{1,2})"), False),
]


def _time_rule(render):
    def rule(text: str) -> str:
        text = z2h(text)
        for pattern, has_seconds in _TIME_PATTERNS:
            m = pattern.search(text)
            if not m:
                continue
            g = [int(x) for x in m.groups()]
            return render(g[0], g[1], g[2] if has_seconds else None)
        return text

    return rule


def _render_jp(h, m, s):
    return f"{h}時{m:02d}分" + (f"{s:02d}秒" if s is not None else "")


def _render_hms(h, m, s):
    return f"{h:02d}:{m:02d}:" + (f"{s:02d}" if s is not None else "00")


register("time_jp")(_time_rule(_render_jp))
register("time_hms")(_time_rule(_render_hms))
