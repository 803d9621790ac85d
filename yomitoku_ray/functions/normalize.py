"""Value-normalizer registry (scalar UDF layer).

Port of the reference's normalizer registry (``/root/reference/src/yomitoku/
extractor/normalizer.py:7-201``): same rule names, same regexes, same era
offsets. The reference uses the jaconv package for width/kana conversion;
jaconv isn't available here, so ``z2h``/``kata2hira``/``hira2kata`` are
implemented from the Unicode codepoint mappings (full-width ASCII
U+FF01-U+FF5E <-> ASCII, ideographic space U+3000 -> space, kana blocks
shifted by 0x60) — the exact conversions jaconv performs for the flag
combinations the reference uses (digit=True, ascii=True, kana=False).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Optional

_REGISTRY: Dict[str, Callable[[str], str]] = {}


def register(name: str):
    """Decorator registry. Parity: normalizer.py:10-15."""

    def decorator(fn: Callable[[str], str]):
        _REGISTRY[name] = fn
        return fn

    return decorator


def get_normalizer(name: str) -> Optional[Callable[[str], str]]:
    return _REGISTRY.get(name)


def list_normalizers():
    return sorted(_REGISTRY)


def apply_normalize(text, rule: Optional[str]) -> str:
    """Parity: normalizer.py:22-30."""
    if rule is None:
        return text if isinstance(text, str) else str(text)
    if not isinstance(text, str):
        text = str(text)
    fn = get_normalizer(rule)
    if fn is None:
        return text
    return fn(text)


# -- width / kana conversion (jaconv stand-ins) -----------------------------

_Z2H_TABLE = {0x3000: 0x20}
_Z2H_TABLE.update({cp: cp - 0xFEE0 for cp in range(0xFF01, 0xFF5F)})

_KATA2HIRA = {cp: cp - 0x60 for cp in range(0x30A1, 0x30F7)}
_HIRA2KATA = {cp: cp + 0x60 for cp in range(0x3041, 0x3097)}


def z2h(text: str) -> str:
    """Full-width ASCII/digits -> half-width (kana untouched)."""
    return text.translate(_Z2H_TABLE)


def kata2hira(text: str) -> str:
    return text.translate(_KATA2HIRA)


def hira2kata(text: str) -> str:
    return text.translate(_HIRA2KATA)


# -- rules (normalizer.py:33-201) -------------------------------------------


@register("strip_spaces")
def strip_spaces(text: str) -> str:
    return re.sub(r"[\s　]+", "", text)


@register("numeric")
def numeric(text: str) -> str:
    text = z2h(text)
    text = text.replace(",", "").replace("、", "")
    return re.sub(r"[^\d.\-+]", "", text)


@register("phone_jp")
def phone_jp(text: str) -> str:
    text = z2h(text)
    digits = re.sub(r"[^\d]", "", text)
    if len(digits) == 11:
        return f"{digits[:3]}-{digits[3:7]}-{digits[7:]}"
    if len(digits) == 10:
        return f"{digits[:3]}-{digits[3:6]}-{digits[6:]}"
    return digits


_ERA_KANJI_MAP = {
    "令和": 2018,
    "平成": 1988,
    "昭和": 1925,
    "大正": 1911,
    "明治": 1867,
}

_ERA_ABBREV_MAP = {"R": 2018, "H": 1988, "S": 1925, "T": 1911, "M": 1867}


def _parse_date(text: str):
    """Parity: normalizer.py:74-109 (era kanji, era abbrev, western forms)."""
    text = z2h(text)

    for era, offset in _ERA_KANJI_MAP.items():
        m = re.search(rf"{era}\s*(\d+)\s*年\s*(\d+)\s*月\s*(\d+)\s*日", text)
        if m:
            return offset + int(m.group(1)), int(m.group(2)), int(m.group(3))

    m = re.search(
        r"([RHSTM])\s*(\d{1,2})\s*[/\-\.]\s*(\d{1,2})\s*[/\-\.]\s*(\d{1,2})", text
    )
    if m:
        offset = _ERA_ABBREV_MAP.get(m.group(1))
        if offset:
            return offset + int(m.group(2)), int(m.group(3)), int(m.group(4))

    m = re.search(r"([RHSTM])\s*(\d{1,2})\s*年\s*(\d{1,2})\s*月\s*(\d{1,2})\s*日", text)
    if m:
        offset = _ERA_ABBREV_MAP.get(m.group(1))
        if offset:
            return offset + int(m.group(2)), int(m.group(3)), int(m.group(4))

    m = re.search(r"(\d{4})\s*年\s*(\d{1,2})\s*月\s*(\d{1,2})\s*日", text)
    if m:
        return int(m.group(1)), int(m.group(2)), int(m.group(3))

    m = re.search(r"(\d{4})[/\-](\d{1,2})[/\-](\d{1,2})", text)
    if m:
        return int(m.group(1)), int(m.group(2)), int(m.group(3))

    return None


@register("date_jp")
def date_jp(text: str) -> str:
    result = _parse_date(text)
    if result:
        year, month, day = result
        return f"{year:04d}-{month:02d}-{day:02d}"
    return text


@register("date_yyyymmdd")
def date_yyyymmdd(text: str) -> str:
    result = _parse_date(text)
    if result:
        year, month, day = result
        return f"{year:04d}{month:02d}{day:02d}"
    return text


@register("time_jp")
def time_jp(text: str) -> str:
    text = z2h(text)
    m = re.search(r"(\d{1,2})\s*時\s*(\d{1,2})\s*分\s*(\d{1,2})\s*秒", text)
    if m:
        return f"{int(m.group(1))}時{int(m.group(2)):02d}分{int(m.group(3)):02d}秒"
    m = re.search(r"(\d{1,2})\s*時\s*(\d{1,2})\s*分", text)
    if m:
        return f"{int(m.group(1))}時{int(m.group(2)):02d}分"
    m = re.search(r"(\d{1,2})\s*:\s*(\d{1,2})\s*:\s*(\d{1,2})", text)
    if m:
        return f"{int(m.group(1))}時{int(m.group(2)):02d}分{int(m.group(3)):02d}秒"
    m = re.search(r"(\d{1,2})\s*:\s*(\d{1,2})", text)
    if m:
        return f"{int(m.group(1))}時{int(m.group(2)):02d}分"
    return text


@register("time_hms")
def time_hms(text: str) -> str:
    text = z2h(text)
    m = re.search(r"(\d{1,2})\s*時\s*(\d{1,2})\s*分\s*(\d{1,2})\s*秒", text)
    if m:
        return f"{int(m.group(1)):02d}:{int(m.group(2)):02d}:{int(m.group(3)):02d}"
    m = re.search(r"(\d{1,2})\s*時\s*(\d{1,2})\s*分", text)
    if m:
        return f"{int(m.group(1)):02d}:{int(m.group(2)):02d}:00"
    m = re.search(r"(\d{1,2})\s*:\s*(\d{1,2})\s*:\s*(\d{1,2})", text)
    if m:
        return f"{int(m.group(1)):02d}:{int(m.group(2)):02d}:{int(m.group(3)):02d}"
    m = re.search(r"(\d{1,2})\s*:\s*(\d{1,2})", text)
    if m:
        return f"{int(m.group(1)):02d}:{int(m.group(2)):02d}:00"
    return text


@register("alphanumeric")
def alphanumeric(text: str) -> str:
    text = z2h(text)
    return re.sub(r"[^a-zA-Z0-9]", "", text)


@register("hiragana")
def hiragana(text: str) -> str:
    text = kata2hira(text)
    return re.sub(r"[^぀-ゟ]", "", text)


@register("katakana")
def katakana(text: str) -> str:
    text = hira2kata(text)
    return re.sub(r"[^゠-ヿ]", "", text)


@register("postal_code_jp")
def postal_code_jp(text: str) -> str:
    text = z2h(text)
    digits = re.sub(r"[^\d]", "", text)
    if len(digits) == 7:
        return f"{digits[:3]}-{digits[3:]}"
    return digits
