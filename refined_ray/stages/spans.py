"""Span cleanup and overlap merge (M11/M12 ≙ reference
general_utils.py:144-238: correct_spans / merge_spans).

Spans are plain dicts {start:int, ln:int, text:str} (char space) or
{start:int, ln:int} (token-ordinal space) — the operators only assume
half-open intervals [start, start+ln).

Differences from the reference, by design:
- correct_spans mutates its list while iterating over it (a Python
  footgun that silently SKIPS the element after every removal);
  ``clean_spans`` applies the same rules as a pure filter+transform,
  so every span is inspected exactly once.
- merge_spans builds a per-character Python set of taken indices
  (O(total span length)); ``merge_spans`` here does a vectorized
  interval-overlap test against the sorted prioritized intervals
  (O((n+m) log m)) — same result, no per-char materialization.

Both run inside per-doc map calls: span lists are doc-local, so the
operators need no cross-batch state (SURVEY §2.9 doc-locality rule).
"""

from __future__ import annotations

import numpy as np

_DROP_TEXTS = {"\n\n", "\n\n\n", "\n\n\n\n", "the"}


def clean_spans(spans: list[dict]) -> list[dict]:
    """≙ correct_spans (general_utils.py:144-209): drop degenerate
    spans, trim newline edges (≤2 each side), strip unbalanced quotes,
    split a leading title+first-paragraph span on its "\\n\\n"."""
    out: list[dict] = []
    for s in spans:
        text, start = s["text"], s["start"]
        if len(text) == 1 or text in _DROP_TEXTS:
            continue
        if len(text) > 2:
            for _ in range(2):
                if text.startswith("\n"):
                    text, start = text[1:], start + 1
            for _ in range(2):
                if text.endswith("\n"):
                    text = text[:-1]
            if text.startswith('"') and not text.endswith('"'):
                text, start = text[1:], start + 1
            if text.endswith('"') and not text.startswith('"'):
                text = text[:-1]
            if text == "the":
                continue
            if start == 0 and text.count("\n\n") == 1:
                first, second = text.split("\n\n")
                out.append({"start": 0, "ln": len(first), "text": first})
                out.append({"start": text.find("\n\n") + 2, "ln": len(second),
                            "text": second})
                continue
        out.append({**s, "start": start, "ln": len(text), "text": text})
    return out


def merge_spans(additional: list[dict], prioritized: list[dict]) -> list[dict]:
    """≙ merge_spans (general_utils.py:212-238): all prioritized spans
    plus every additional span overlapping none of them, sorted by
    start (stable, like the reference's sort_spans), with -ln as a
    deterministic tiebreak."""
    if not prioritized:
        merged = list(additional)
    else:
        p_start = np.array([p["start"] for p in prioritized], dtype=np.int64)
        p_end = p_start + np.array([p["ln"] for p in prioritized], dtype=np.int64)
        order = np.argsort(p_start)
        p_start, p_end = p_start[order], p_end[order]
        # intervals from the same detector may themselves overlap; make
        # the end array monotone so one searchsorted decides overlap
        p_end = np.maximum.accumulate(p_end)
        merged = list(prioritized)
        if additional:
            a_start = np.array([a["start"] for a in additional], dtype=np.int64)
            a_end = a_start + np.array([a["ln"] for a in additional], dtype=np.int64)
            # overlap iff some prioritized interval starts before a_end
            # AND ends after a_start
            k = np.searchsorted(p_start, a_end, side="left")
            overlaps = (k > 0) & (p_end[np.maximum(k - 1, 0)] > a_start)
            merged.extend(a for a, ov in zip(additional, overlaps) if not ov)
    merged.sort(key=lambda s: (s["start"], -s["ln"]))
    return merged
