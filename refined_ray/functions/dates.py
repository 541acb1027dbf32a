"""Date-mention parsing and normalization with doc-level format
inference (≙ reference M13: DateHandler / SpanDateHandler,
src/refined/utilities/numeric_handling/date_utils.py:97-370).

Behavioral contract (re-expressed from scratch, verified against the
reference's golden test dicts — date_utils.py:246-285 and
date_test_examples.py — in tests/test_dates.py):

- A mention may split into several dates ("1945 to 1999" → two), each
  carrying its char offset in the original mention.
- Qualifier prefixes ("early ", "mid-", "the year ", …) are stripped.
- Numeric day/month dates with BOTH fields ≤ 12 and no letters are
  ambiguous (US vs UK order): per-mention they resolve to nulls with
  ``known_format=False``; a second, doc-level pass
  (``infer_doc_format`` + ``apply_doc_format``) resolves them when the
  document's other dates reveal exactly one consistent order.
- Mentions containing any unrecognized word do NOT parse ("this
  Christmas", "16 years", "the 1980s", "19th century" all reject).

Parsing is per-mention Python over short strings — date spans are a
tiny fraction of a corpus and arrive pre-extracted; the doc-level pass
is a vectorizable fold over each document's mention list (one map call
per partition, reference person-coref-style doc locality).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_PREFIX_RE = re.compile(
    r"^(early|late|mid|the start of|the end of|the middle of|the year)( |-)",
    re.IGNORECASE,
)
_RANGE_RE = re.compile(r"\s?--\s?| - | to ")
_HAS_ALPHA_RE = re.compile(r"[a-zA-Z]")
_TOKEN_RE = re.compile(r"[a-zA-Z]+\.?|\d+[a-zA-Z]*|[^\sa-zA-Z0-9,]+")

_MONTHS = {}
for _i, _names in enumerate([
    ("january", "jan"), ("february", "feb"), ("march", "mar"),
    ("april", "apr"), ("may",), ("june", "jun"), ("july", "jul"),
    ("august", "aug"), ("september", "sep", "sept"), ("october", "oct"),
    ("november", "nov"), ("december", "dec"),
]):
    for _n in _names:
        _MONTHS[_n] = _i + 1

_ORDINAL_RE = re.compile(r"^(\d{1,2})(st|nd|rd|th)$", re.IGNORECASE)
_SEPARATORS = {"/", "-", ".", ","}


@dataclass
class ParsedDate:
    """One resolved date. ``None`` fields are unknown/unresolved."""

    text: str
    day: int | None = None
    month: int | None = None
    year: int | None = None
    offset: int = 0
    known_format: bool = True
    # retained for the doc-level second pass over ambiguous numerics
    _nums: tuple[int, int] | None = None


def split_date_text(text: str) -> list[tuple[str, int]]:
    """Range split: "1945 to 1999" → [("1945",0), ("1999",8)]."""
    parts = _RANGE_RE.split(text)
    if len(parts) == 1:
        return [(text, 0)]
    out, cursor = [], 0
    for p in parts:
        start = text.index(p, cursor)
        cursor = start + len(p)
        out.append((p, start))
    return out


def _tokenize(text: str) -> list[str] | None:
    """Lex a single-date string into month/day/year/separator tokens.
    Returns None when any token is unrecognizable as date vocabulary."""
    toks = []
    for raw in _TOKEN_RE.findall(text):
        t = raw.lower()
        if t in _SEPARATORS:
            continue
        if t.rstrip(".") in _MONTHS:
            toks.append(("month", _MONTHS[t.rstrip(".")]))
            continue
        m = _ORDINAL_RE.match(t)
        if m:
            toks.append(("ordinal", int(m.group(1))))
            continue
        if t.isdigit():
            toks.append(("num", int(t)))
            continue
        if all(c in _SEPARATORS for c in t):
            continue
        return None  # unknown word → not a date ("century", "years", …)
    return toks


def _numeric_shape(text: str) -> tuple[int, int] | None:
    """d1<sep>d2[<sep>year] purely-numeric shape → (d1, d2), else None."""
    m = re.fullmatch(r"\s*(\d{1,2})[/.\-](\d{1,2})(?:[/.\-](\d{2,4}))?\s*", text)
    if m is None:
        return None
    return int(m.group(1)), int(m.group(2))


def parse_date_mention(text: str) -> list[ParsedDate]:
    """Mention text → list of ParsedDate (possibly empty).

    ≙ DateHandler.resolve_dates (date_utils.py:107-118); ambiguity and
    ordering rules match dateutil's month-first default + the
    reference's can_identify_format gate (date_utils.py:34-49).
    """
    out = []
    for part, offset in split_date_text(text):
        d = _parse_single(part, offset)
        if d is not None:
            out.append(d)
    return out


def _parse_single(text: str, offset: int) -> ParsedDate | None:
    cleaned = _PREFIX_RE.sub("", text)
    toks = _tokenize(cleaned)
    if not toks:
        return None

    day = month = year = None
    nums: list[int] = []
    for kind, val in toks:
        if kind == "month":
            if month is not None:
                return None
            month = val
        elif kind == "ordinal":
            if day is not None or not 1 <= val <= 31:
                return None
            day = val
        else:
            nums.append(val)

    if month is not None:
        # month name present → assign numbers as day/year by magnitude
        for v in nums:
            if v >= 100 or (32 <= v <= 99):
                if year is not None:
                    return None
                year = v if v >= 100 else 1900 + v
            elif 1 <= v <= 31:
                if day is not None:
                    return None
                day = v
            else:
                return None
        return ParsedDate(text=text, day=day, month=month, year=year, offset=offset)

    if day is not None:  # lone ordinal ("23rd") + optional year
        if len(nums) > 1:
            return None
        if nums:
            if nums[0] < 1000:
                return None
            year = nums[0]
        return ParsedDate(text=text, day=day, month=month, year=year, offset=offset)

    # pure numbers
    if len(nums) == 1:
        v = nums[0]
        if v >= 1000:
            return ParsedDate(text=text, year=v, offset=offset)
        if 32 <= v <= 99:
            # two-digit years resolve but are filtered by the span-level
            # incorrect-resolution check (date_utils.py:361-370)
            return ParsedDate(text=text, year=(1900 + v if v >= 69 else 2000 + v),
                              offset=offset)
        if 1 <= v <= 31:
            return ParsedDate(text=text, day=v, offset=offset)
        return None
    if len(nums) in (2, 3):
        shape = _numeric_shape(cleaned)
        if shape is None:
            return None
        d1, d2 = shape
        year = None
        if len(nums) == 3:
            y = nums[2]
            year = y if y >= 100 else (1900 + y if y >= 69 else 2000 + y)
        # dateutil default: month first, unless impossible
        if d1 > 12 and 1 <= d2 <= 12 and d1 <= 31:
            day, month = d1, d2
        elif d2 > 12 and 1 <= d1 <= 12 and d2 <= 31:
            day, month = d2, d1
        elif 1 <= d1 <= 12 and 1 <= d2 <= 12:
            month, day = d1, d2
        else:
            return None
        p = ParsedDate(text=text, day=day, month=month, year=year, offset=offset,
                       _nums=(d1, d2))
        if day <= 12 and not _HAS_ALPHA_RE.search(text):
            # ambiguous US/UK order → clear until doc-level inference
            p.day = p.month = p.year = None
            p.known_format = False
        return p
    return None


def date_doc_format(p: ParsedDate) -> str | None:
    """What this date reveals about the document's numeric date order
    (≙ Date.get_doc_format, date_utils.py:51-73)."""
    if p.day is None or p.month is None:
        return None
    if _HAS_ALPHA_RE.search(p.text):
        return None
    if p.day <= 12:
        return None
    numbers_only = "".join(c for c in p.text if c.isdigit())
    if numbers_only.startswith(str(p.day)):
        return "day_first"
    return "month_first"


def infer_doc_format(dates: list[ParsedDate]) -> str | None:
    """Exactly-one revealed order across the doc's dates, else None."""
    fmts = {f for f in (date_doc_format(d) for d in dates) if f is not None}
    return next(iter(fmts)) if len(fmts) == 1 else None


def apply_doc_format(dates: list[ParsedDate], fmt: str | None) -> list[ParsedDate]:
    """Second pass: resolve ambiguous numerics with the doc's format
    (≙ DateHandler.resolve_multiple, date_utils.py:120-143)."""
    if fmt is None:
        return dates
    out = []
    for p in dates:
        if p.known_format or p._nums is None:
            out.append(p)
            continue
        d1, d2 = p._nums
        q = _parse_single_with_format(p, d1, d2, fmt)
        out.append(q)
    return out


def _parse_single_with_format(p: ParsedDate, d1: int, d2: int, fmt: str) -> ParsedDate:
    year = None
    m = re.fullmatch(r"\s*\d{1,2}[/.\-]\d{1,2}[/.\-](\d{2,4})\s*", p.text)
    if m:
        y = int(m.group(1))
        year = y if y >= 100 else (1900 + y if y >= 69 else 2000 + y)
    if fmt == "day_first":
        day, month = d1, d2
    else:
        day, month = d2, d1
    if not (1 <= month <= 12 and 1 <= day <= 31):
        return p
    return ParsedDate(text=p.text, day=day, month=month, year=year,
                      offset=p.offset, known_format=True, _nums=(d1, d2))


def check_incorrect_resolution(p: ParsedDate) -> ParsedDate | None:
    """Span-level filter: 2-char year-only texts are usually ages, not
    years (≙ SpanDateHandler._check_for_incorrect_resolution)."""
    if p.year is not None and len(p.text) == 2:
        return None
    return p


def resolve_doc_dates(texts: list[str]) -> list[ParsedDate]:
    """Full doc-local fold: parse every mention, infer the doc's
    numeric order, re-resolve ambiguous ones, drop misresolutions
    (≙ SpanDateHandler.resolve_spans, date_utils.py:297-331)."""
    dates: list[ParsedDate] = []
    for t in texts:
        dates.extend(parse_date_mention(t))
    dates = apply_doc_format(dates, infer_doc_format(dates))
    return [d for d in (check_incorrect_resolution(p) for p in dates) if d is not None]
