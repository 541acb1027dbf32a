"""Deterministic word tokenization with char offsets.

The engine's tokenizer contract (≙ reference tokenize at
preprocessor.py:211-238, simplified to a subword-free regex): tokens
are maximal ``[a-z0-9]+`` runs of the lowercased text.  The same token
stream is expressible in DuckDB as
``unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))`` which is what
the correctness oracles use.
"""

from __future__ import annotations

import re

import numpy as np

TOKEN_RE = re.compile(r"[a-z0-9]+")
TOKEN_SQL = "regexp_extract_all(lower({col}), '[a-z0-9]+')"

# Tiny english stopword list shared by mention detection, quality
# scoring and language-ID. Kept deliberately small + frozen: it is part
# of the engine/oracle contract (mirrored into SQL IN-lists).
STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")
STOPWORD_SET = frozenset(STOPWORDS)


def tokenize(text: str) -> list[str]:
    return TOKEN_RE.findall(text.lower())


def tokenize_with_offsets(text: str) -> list[tuple[str, int, int]]:
    """(token, start, end) char offsets into the *original* text."""
    return [(m.group(0), m.start(), m.end()) for m in TOKEN_RE.finditer(text.lower())]


def tokenize_batch(texts) -> tuple[list[str], np.ndarray]:
    """Tokenize a batch of texts into one flat token list + doc offsets.

    Returns (flat_tokens, starts) where ``starts`` has len(texts)+1
    entries and doc i's tokens are flat_tokens[starts[i]:starts[i+1]].
    The flat layout feeds the segment-vectorized MinHash/SimHash
    kernels (np.minimum.reduceat) without per-doc Python loops.
    """
    flat: list[str] = []
    starts = np.empty(len(texts) + 1, dtype=np.int64)
    starts[0] = 0
    findall = TOKEN_RE.findall
    for i, t in enumerate(texts):
        toks = findall(t.lower())
        flat.extend(toks)
        starts[i + 1] = len(flat)
    return flat, starts
