"""Unit + property tests for span cleanup / overlap merge (M11/M12 ≙
reference general_utils.py:144-238)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from refined_ray.stages.spans import clean_spans, merge_spans


def _s(start, text):
    return {"start": start, "ln": len(text), "text": text}


# ------------------------------ clean_spans ------------------------------


def test_drop_degenerate_spans():
    spans = [_s(0, "x"), _s(5, "\n\n"), _s(9, "\n\n\n"), _s(14, "the"), _s(20, "keep me")]
    assert clean_spans(spans) == [_s(20, "keep me")]


def test_strip_leading_and_trailing_newlines():
    out = clean_spans([_s(10, "\n\nhello\n\n")])
    assert out == [{"start": 12, "ln": 5, "text": "hello"}]


def test_strip_at_most_two_newlines_each_side():
    out = clean_spans([_s(0, "\n\n\nabc")])
    assert out == [{"start": 2, "ln": 4, "text": "\nabc"}]


def test_unbalanced_quote_stripped_balanced_kept():
    assert clean_spans([_s(3, '"abc')]) == [{"start": 4, "ln": 3, "text": "abc"}]
    assert clean_spans([_s(3, 'abc"')]) == [{"start": 3, "ln": 3, "text": "abc"}]
    assert clean_spans([_s(3, '"abc"')]) == [_s(3, '"abc"')]


def test_newline_strip_exposing_the_is_dropped():
    assert clean_spans([_s(0, "the\n")]) == []


def test_title_first_mention_split():
    out = clean_spans([_s(0, "Alan Turing\n\nAlan Turing was")])
    assert out == [
        {"start": 0, "ln": 11, "text": "Alan Turing"},
        {"start": 13, "ln": 15, "text": "Alan Turing was"},
    ]


def test_title_split_only_at_doc_start():
    # start != 0 → no split
    out = clean_spans([_s(5, "A\n\nB was here")])
    assert out == [_s(5, "A\n\nB was here")]


def test_every_span_inspected_once():
    # the reference removes list elements while iterating, silently
    # skipping the NEXT span; the clean implementation must not
    spans = [_s(0, "\n\n"), _s(3, "\n\n"), _s(6, "\n\n"), _s(9, "ok span")]
    assert clean_spans(spans) == [_s(9, "ok span")]


# ------------------------------ merge_spans ------------------------------


def test_priority_wins_on_overlap():
    pri = [_s(10, "abcde")]
    add = [_s(8, "xxx"), _s(14, "yy"), _s(20, "free")]
    out = merge_spans(add, pri)
    assert out == [_s(10, "abcde"), _s(20, "free")]


def test_touching_spans_do_not_overlap():
    # [10,15) and [15,17) share no index
    out = merge_spans([_s(15, "zz")], [_s(10, "abcde")])
    assert out == [_s(10, "abcde"), _s(15, "zz")]


def test_merge_sorted_by_start():
    out = merge_spans([_s(0, "aa")], [_s(30, "bb"), _s(10, "cc")])
    assert [s["start"] for s in out] == [0, 10, 30]


_span_list = st.lists(
    st.tuples(st.integers(0, 60), st.integers(1, 8)).map(
        lambda t: {"start": t[0], "ln": t[1], "text": "x" * t[1]}),
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(_span_list, _span_list)
def test_merge_properties(add, pri):
    out = merge_spans(add, pri)
    # all prioritized spans survive
    for p in pri:
        assert p in out
    taken = set()
    for p in pri:
        taken.update(range(p["start"], p["start"] + p["ln"]))
    for s in out:
        if s in pri:
            continue
        # surviving additional spans share no char with any prioritized
        assert not (set(range(s["start"], s["start"] + s["ln"])) & taken)
    # overlapping additional spans contribute nothing beyond the
    # prioritized copies: every output span either is a prioritized one
    # or overlaps no taken char (checked above), so the output size is
    # |pri| + |non-overlapping additional|
    n_free = sum(1 for a in add
                 if not (set(range(a["start"], a["start"] + a["ln"])) & taken))
    assert len(out) == len(pri) + n_free
    # sorted by start
    assert [s["start"] for s in out] == sorted(s["start"] for s in out)
