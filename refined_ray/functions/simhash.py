"""64-bit SimHash fingerprints, segment-vectorized.

SimHash near-dup: docs whose fingerprints differ in ≤ k bits are
candidate duplicates.  Blocking at scale: split the 64 bits into
(k+1) bands — two docs within Hamming distance k agree exactly on at
least one band (pigeonhole), so grouping by (band_id, band_value)
finds all candidates without an all-pairs scan.
"""

from __future__ import annotations

import numpy as np

from .hashing import hash_str_array
from .tokenize import tokenize_batch

_U64 = np.uint64
SIMHASH_BANDS = 4  # 4 × 16-bit bands → exact recall for hamming ≤ 3


def simhash_batch(texts) -> np.ndarray:
    """uint64 SimHash per text (token-frequency weighted)."""
    flat, starts = tokenize_batch(texts)
    n_docs = len(starts) - 1
    if not flat:
        return np.zeros(n_docs, dtype=_U64)
    tok_h = hash_str_array(flat)
    # (S, 64) sign matrix: bit set → +1 else −1; accumulate per doc.
    bits = ((tok_h[:, None] >> np.arange(64, dtype=_U64)[None, :]) & _U64(1)).astype(np.int32)
    signs = bits * 2 - 1  # {0,1} → {−1,+1}
    sums = np.zeros((n_docs, 64), dtype=np.int64)
    # reduceat only over NONEMPTY segment starts: empty segments have
    # zero length, so the start of the next nonempty segment equals the
    # end of the current one and the reduceat boundaries are exact.
    # (Clipping starts into the flat array — the previous approach —
    # corrupted the preceding doc's segment whenever trailing docs were
    # empty, making fingerprints batch-boundary-dependent.)
    nonempty = np.flatnonzero(np.diff(starts) > 0)
    if len(nonempty):
        sums[nonempty] = np.add.reduceat(signs, starts[nonempty], axis=0)
    pos = (sums > 0).astype(np.uint8)
    return np.packbits(pos, axis=1, bitorder="little").view(_U64).ravel()


def simhash_band_values(fp: np.ndarray, num_bands: int = SIMHASH_BANDS) -> np.ndarray:
    """(n, num_bands) band values (band id folded in)."""
    width = 64 // num_bands
    mask = _U64((1 << width) - 1)
    out = np.empty((len(fp), num_bands), dtype=_U64)
    for b in range(num_bands):
        out[:, b] = ((fp >> _U64(b * width)) & mask) | (_U64(b) << _U64(56))
    return out


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise Hamming distance between uint64 arrays."""
    x = a ^ b
    # numpy>=2 lacks portable popcount on uint64 → bytes view + unpackbits.
    by = x.view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(by, axis=1).sum(axis=1)
