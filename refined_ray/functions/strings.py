"""Batched string-similarity kernels for the pairwise scorer.

≙ the "Jaro-Winkler/Levenshtein" half of the north-rule pair scorer
(the reference scores candidate pairs with learned features,
entity_disambiguation_layer.py:36-119; our from-scratch scorer combines
classical string similarity with embedding similarity).

`levenshtein_batch` is a numpy anti-diagonal-free DP vectorized ACROSS
the pair batch: strings are truncated to `max_len` code points and
packed into uint8/int32 matrices, then the L1 outer loop runs
`max_len` iterations of (batch, L2) vectorized ops — no per-pair
Python loop.  Jaro-Winkler's greedy matching is inherently
sequential, so it runs per *unique* pair with an LRU cache (pair keys
in web dedup are highly repetitive).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


def _pack(strs, max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """Pack strings into an (n, max_len) int32 codepoint matrix + lengths."""
    n = len(strs)
    mat = np.zeros((n, max_len), dtype=np.int32)
    lens = np.empty(n, dtype=np.int32)
    for i, s in enumerate(strs):
        s = s[:max_len]
        lens[i] = len(s)
        if s:
            mat[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)[: len(s)].astype(np.int32)
    return mat, lens


def levenshtein_batch(a_strs, b_strs, max_len: int = 64) -> np.ndarray:
    """Row-wise Levenshtein distance between two equal-length string
    sequences, vectorized across the batch."""
    assert len(a_strs) == len(b_strs)
    n = len(a_strs)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    A, la = _pack(a_strs, max_len)
    B, lb = _pack(b_strs, max_len)
    L = int(max(la.max(initial=0), 1))
    M = int(max(lb.max(initial=0), 1))
    # prev/cur rows of the DP matrix, batched: shape (n, M+1)
    prev = np.broadcast_to(np.arange(M + 1, dtype=np.int32), (n, M + 1)).copy()
    big = np.int32(1 << 20)
    for i in range(1, L + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1 : i]  # (n, 1)
        sub = prev[:, :-1] + (ai != B[:, :M]).astype(np.int32)
        dele = prev[:, 1:] + 1
        np.minimum(sub, dele, out=sub)
        # insertion has a row-internal dependency → sequential over M,
        # but each step is vectorized over the batch.
        for j in range(1, M + 1):
            cur[:, j] = np.minimum(sub[:, j - 1], cur[:, j - 1] + 1)
        # rows already finished (i > la) keep their final value
        done = i > la
        if done.any():
            cur[done] = prev[done]
        prev = cur
        if bool((la <= i).all()):
            break
    out = prev[np.arange(n), np.minimum(lb, M)]
    # exact distance for empty-vs-nonempty edge cases falls out naturally
    return np.minimum(out, big)


def levenshtein_similarity_batch(a_strs, b_strs, max_len: int = 64) -> np.ndarray:
    """1 − dist/max(len) in [0, 1]; both-empty → 1.0."""
    d = levenshtein_batch(a_strs, b_strs, max_len).astype(np.float64)
    denom = np.maximum(
        np.array([min(len(s), max_len) for s in a_strs], dtype=np.float64),
        np.array([min(len(s), max_len) for s in b_strs], dtype=np.float64),
    )
    out = np.ones(len(a_strs), dtype=np.float64)
    nz = denom > 0
    out[nz] = 1.0 - d[nz] / denom[nz]
    return out


@lru_cache(maxsize=1 << 16)
def _jw_cached(s1: str, s2: str) -> float:
    return jaro_winkler(s1, s2)


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Scalar Jaro-Winkler similarity (standard definition)."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    f1 = [False] * l1
    f2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not f2[j] and s2[j] == c:
                f1[i] = f2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(l1):
        if f1[i]:
            while not f2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    jaro = (m / l1 + m / l2 + (m - t / 2) / m) / 3.0
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return jaro + prefix * prefix_weight * (1.0 - jaro)


def jaro_winkler_batch(a_strs, b_strs) -> np.ndarray:
    """Row-wise Jaro-Winkler; memoized on unique pairs (repetitive keys)."""
    return np.array([_jw_cached(a, b) for a, b in zip(a_strs, b_strs)], dtype=np.float64)
