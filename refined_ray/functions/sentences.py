"""Sentence splitting with char-offset spans (M7 ≙ the reference's
pickled NLTK Punkt splitter, preprocessor.py:240-247, re-expressed as
a deterministic rule-based splitter — no pickled model artifacts).

Contract:
- A sentence boundary is a run of ``.!?`` followed by whitespace.
- A '.' does NOT end a sentence after a known abbreviation, after a
  single-letter initial ("J. Smith"), or inside a number ("3.14" has
  no following whitespace so it never matches).
- Spans are [start, end) char offsets into the ORIGINAL text and
  include the terminal punctuation; inter-sentence whitespace belongs
  to neither span.
"""

from __future__ import annotations

import re

_BOUNDARY = re.compile(r"([.!?]+)(\s+)")
_LAST_WORD = re.compile(r"(\S+)$")

# Frozen abbreviation list — part of the splitter contract (mirrored
# into SQL oracles where needed).
ABBREVIATIONS = frozenset({
    "mr", "mrs", "ms", "dr", "prof", "st", "vs", "etc", "eg", "ie",
    "fig", "inc", "ltd", "jr", "sr", "dept", "est", "approx",
})


def split_sentences(text: str) -> list[tuple[int, int]]:
    """→ list of (start, end) char spans, one per sentence."""
    spans: list[tuple[int, int]] = []
    start = 0
    for m in _BOUNDARY.finditer(text):
        punct = m.group(1)
        if punct.startswith("."):
            w = _LAST_WORD.search(text[start:m.start(1)])
            if w:
                word = w.group(1).rstrip(".").lower()
                if word in ABBREVIATIONS or len(word) == 1:
                    continue  # abbreviation / initial — not a boundary
        spans.append((start, m.end(1)))
        start = m.end()
    if start < len(text):
        spans.append((start, len(text)))
    return spans


def sentence_texts(text: str) -> list[str]:
    return [text[s:e] for s, e in split_sentences(text)]
