"""Golden tests for the date operator (M13) — expectations re-expressed
from the reference's inline test dicts (date_utils.py:246-285,
date_test_examples.py TEST_DATE_MENTIONS / TEST_MULTI_MENTIONS)."""

from __future__ import annotations

import pytest

from refined_ray.functions.dates import (
    apply_doc_format,
    infer_doc_format,
    parse_date_mention,
    resolve_doc_dates,
)


def _dmyk(text):
    """parse → list of (day, month, year, known_format) tuples."""
    return [(p.day, p.month, p.year, p.known_format) for p in parse_date_mention(text)]


GOLDEN = {
    # years
    "2012": [(None, None, 2012, True)],
    "the start of 2012": [(None, None, 2012, True)],
    "the end of 2012": [(None, None, 2012, True)],
    "the year 1988": [(None, None, 1988, True)],
    "1945 to 1988": [(None, None, 1945, True), (None, None, 1988, True)],
    # days
    "23rd": [(23, None, None, True)],
    # months
    "February": [(None, 2, None, True)],
    "early June": [(None, 6, None, True)],
    "early-June": [(None, 6, None, True)],
    "mid-June": [(None, 6, None, True)],
    "late-June": [(None, 6, None, True)],
    # day + month
    "February 21st": [(21, 2, None, True)],
    "Feb 21st": [(21, 2, None, True)],
    "Feb. 21st": [(21, 2, None, True)],
    # month + year
    "March 2021": [(None, 3, 2021, True)],
    # full dates
    "February 21st 2009": [(21, 2, 2009, True)],
    "Feb. 21st 2009": [(21, 2, 2009, True)],
    "30/01/2021": [(30, 1, 2021, True)],
    "01/30/2021": [(30, 1, 2021, True)],
    "01/01/2021": [(None, None, None, False)],  # ambiguous US/UK
    "30-01-2021": [(30, 1, 2021, True)],
    "01-30-2021": [(30, 1, 2021, True)],
    "30.01.2021": [(30, 1, 2021, True)],
    # not dates: decades / centuries / relative phrases
    "80s": [],
    "the 1980s": [],
    "the 1960s to the 1980s": [],
    "the early forties": [],
    "the nineteenth century": [],
    "nineteenth century": [],
    "the 19th century": [],
    "19th century": [],
    "the fifth century A.D.": [],
    "1-day": [],
    "bimonthly": [],
    "this Christmas": [],
    "three to four months": [],
    "Two Days": [],
    "16 years": [],
    "the months": [],
    "years past": [],
    "many months": [],
    "Earlier this week": [],
    "Twenty-five years later": [],
    "century-old": [],
    "This July": [],
}


@pytest.mark.parametrize("text,expected", GOLDEN.items(), ids=list(GOLDEN))
def test_golden_date_mentions(text, expected):
    assert _dmyk(text) == expected


def test_range_split_offsets():
    ps = parse_date_mention("1945 to 1988")
    assert [(p.text, p.offset) for p in ps] == [("1945", 0), ("1988", 8)]


def test_multi_mention_format_inference_resolves():
    # ≙ TEST_MULTI_MENTIONS case 1: the unambiguous first date reveals
    # month-first; the ambiguous second then resolves
    ps = parse_date_mention("01/30/2021") + parse_date_mention("01/02/2021")
    fmt = infer_doc_format(ps)
    assert fmt == "month_first"
    out = apply_doc_format(ps, fmt)
    assert (out[0].day, out[0].month, out[0].year) == (30, 1, 2021)
    assert (out[1].day, out[1].month, out[1].year) == (2, 1, 2021)
    assert out[1].known_format


def test_multi_mention_all_ambiguous_stays_unresolved():
    # ≙ TEST_MULTI_MENTIONS case 2
    ps = parse_date_mention("01/02/2021") + parse_date_mention("01/03/2021")
    assert infer_doc_format(ps) is None
    out = apply_doc_format(ps, None)
    assert all(not p.known_format for p in out)
    assert all(p.day is None for p in out)


def test_day_first_inference():
    ps = parse_date_mention("30/01/2021") + parse_date_mention("01/02/2021")
    fmt = infer_doc_format(ps)
    assert fmt == "day_first"
    out = apply_doc_format(ps, fmt)
    assert (out[1].day, out[1].month, out[1].year) == (1, 2, 2021)


def test_conflicting_formats_block_inference():
    # one date implies day-first, another month-first → no inference
    ps = parse_date_mention("30/01/2021") + parse_date_mention("01/30/2021") \
        + parse_date_mention("01/02/2021")
    assert infer_doc_format(ps) is None


def test_two_char_year_filtered_at_doc_level():
    # "86" parses as a year but is usually an age → dropped by the
    # incorrect-resolution check (reference date_utils.py:361-370)
    out = resolve_doc_dates(["86", "March 2021"])
    assert [(p.day, p.month, p.year) for p in out] == [(None, 3, 2021)]
