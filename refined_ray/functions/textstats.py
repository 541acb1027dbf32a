"""Text-analysis kernels: token counts, quality scores, language-ID,
document fingerprints.

These back the training-data-pipeline operators (token counting,
quality scoring, langid, fingerprinting) that run over the `documents`
/ web-page tables.  Counting kernels are defined so a DuckDB oracle
can reproduce them exactly (see the SQL fragments in
pipelines/queries.py); ratios are emitted as int numerator/denominator
plus the IEEE division both engines compute identically.
"""

from __future__ import annotations

import numpy as np

from .hashing import hash_str_array, splitmix64
from .tokenize import STOPWORDS, tokenize_batch

_U64 = np.uint64

# Frozen per-language marker token lists for the n-gram/stopword
# language-ID heuristic.  With no real multilingual corpora in the
# sandbox this scores overlap with per-language function words; the
# pipeline contract (vectorized scoring → argmax per doc) matches what
# a real fastText-style classifier stage would do.
LANG_MARKERS: dict[str, frozenset] = {
    "en": frozenset(STOPWORDS),
    "de": frozenset({"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"}),
    "fr": frozenset({"le", "la", "les", "et", "est", "ne", "un", "une", "des", "dans"}),
    "es": frozenset({"el", "la", "los", "las", "y", "es", "no", "un", "una", "en"}),
}


def token_stats_batch(texts, pretok=None) -> dict[str, np.ndarray]:
    """Per-text counters: n_tokens, n_stopwords, n_unique_tokens,
    n_chars, plus stopword_ratio (= n_stopwords/n_tokens, 0 if empty).

    ``pretok``: optional (flat, starts) from ``tokenize_batch`` so a
    caller computing several signals tokenizes the batch ONCE."""
    flat, starts = pretok if pretok is not None else tokenize_batch(texts)
    n_docs = len(starts) - 1
    n_tokens = np.diff(starts).astype(np.int64)
    n_stop = np.zeros(n_docs, dtype=np.int64)
    n_uniq = np.zeros(n_docs, dtype=np.int64)
    stop = set(STOPWORDS)
    for d in range(n_docs):
        seg = flat[starts[d] : starts[d + 1]]
        n_stop[d] = sum(1 for t in seg if t in stop)
        n_uniq[d] = len(set(seg))
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    ratio = np.zeros(n_docs, dtype=np.float64)
    nz = n_tokens > 0
    ratio[nz] = n_stop[nz] / n_tokens[nz]
    return {
        "n_tokens": n_tokens,
        "n_stopwords": n_stop,
        "n_unique_tokens": n_uniq,
        "n_chars": n_chars,
        "stopword_ratio": ratio,
    }


def quality_score_batch(texts, stats=None) -> np.ndarray:
    """Heuristic quality in [0,1]: blends length band, stopword presence
    and lexical diversity — the shape of C4/Gopher-style quality rules.

    ``stats``: optional precomputed ``token_stats_batch`` dict (shares
    the tokenize + counter pass with other signals)."""
    s = stats if stats is not None else token_stats_batch(texts)
    nt = s["n_tokens"].astype(np.float64)
    len_score = np.clip(nt / 50.0, 0.0, 1.0)
    stop_score = np.clip(s["stopword_ratio"] * 5.0, 0.0, 1.0)
    div = np.zeros_like(nt)
    nz = nt > 0
    div[nz] = s["n_unique_tokens"][nz] / nt[nz]
    return (len_score + stop_score + div) / 3.0


def langid_batch(texts, pretok=None) -> tuple[np.ndarray, np.ndarray]:
    """(lang_code, score) per text by marker-token overlap argmax.

    Ties and zero-marker docs resolve to 'und' (undetermined).
    ``pretok``: optional (flat, starts) from ``tokenize_batch``.
    """
    flat, starts = pretok if pretok is not None else tokenize_batch(texts)
    n_docs = len(starts) - 1
    langs = list(LANG_MARKERS)
    counts = np.zeros((n_docs, len(langs)), dtype=np.int64)
    for d in range(n_docs):
        seg = flat[starts[d] : starts[d + 1]]
        for li, lang in enumerate(langs):
            mk = LANG_MARKERS[lang]
            counts[d, li] = sum(1 for t in seg if t in mk)
    best = counts.argmax(axis=1)
    best_n = counts[np.arange(n_docs), best]
    total = np.maximum(np.diff(starts), 1)
    codes = np.array(langs, dtype=object)[best]
    codes[best_n == 0] = "und"
    return codes, best_n / total


_FP_SEED = _U64(0xCBF29CE484222325)
_FP_R = _U64(0x9E3779B97F4A7C15)  # odd → invertible multiplier mod 2^64


def fingerprint_batch(texts) -> np.ndarray:
    """Order-sensitive uint64 document fingerprint — ≙ a content-defined
    chunking / winnowing fingerprint base; identical token streams ⇒
    identical fingerprints, permuted streams ⇒ different ones.

    Polynomial rolling hash fp = mix(seed ^ Σ h_i·r^i ^ len·r), fully
    vectorized over the batch's flat token-hash stream (power table +
    one reduceat) — no per-token Python loop (the round-1 FNV chain was
    inherently sequential).  Batch-split invariant: per-doc positions
    restart at every segment and empty docs take the seed path."""
    flat, starts = tokenize_batch(texts)
    n_docs = len(starts) - 1
    starts = np.asarray(starts, dtype=np.int64)
    lens = np.diff(starts)
    base = np.full(n_docs, _FP_SEED, dtype=_U64)
    with np.errstate(over="ignore"):
        mixed_len = lens.astype(_U64) * _FP_R
        if not flat:
            return splitmix64(base ^ mixed_len)
        h = hash_str_array(flat)
        pos = np.arange(len(h), dtype=np.int64) - np.repeat(starts[:-1], lens)
        maxlen = int(lens.max())
        pows = np.ones(maxlen, dtype=_U64)
        if maxlen > 1:
            np.multiply.accumulate(np.full(maxlen - 1, _FP_R, dtype=_U64), out=pows[1:])
        terms = h * pows[pos]
        sums = np.zeros(n_docs, dtype=_U64)
        nonempty = np.flatnonzero(lens > 0)
        if len(nonempty):
            sums[nonempty] = np.add.reduceat(terms, starts[:-1][nonempty])
        return splitmix64(base ^ sums ^ mixed_len)
