"""Zero-copy numpy views over Arrow variable-width binary columns.

Companion to stages/scoring._binary_to_matrix (fixed-width blobs);
this handles RAGGED blobs (per-row sorted hash sets, token lists) via
offset math on the raw Arrow buffers — no per-cell .as_py() round
trips in hot verification loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def binary_segments(col) -> tuple[np.ndarray, np.ndarray]:
    """binary/string (incl. large_) column → (flat uint8 view, int64 offsets).

    ``flat[offsets[i]:offsets[i+1]]`` is row i's blob.  Offsets are
    normalized to start at 0; ``flat`` is a view into the Arrow data
    buffer (no copy).  Rows must be non-null.
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    wide = pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type)
    off_dtype = np.int64 if wide else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset: arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    flat = data[offs[0]: offs[-1]]
    return flat, offs - offs[0]


def u64_segments(col) -> tuple[np.ndarray, np.ndarray]:
    """binary column whose blobs are little-endian uint64 arrays →
    (flat <u8-typed values, int64 element offsets)."""
    flat, offs = binary_segments(col)
    return flat.view("<u8"), offs // 8


def exact_jaccard_pairs(col_a, col_b) -> np.ndarray:
    """Row-wise EXACT Jaccard between two binary columns whose blobs
    are sorted-distinct uint64 sets.

    Fully vectorized: both sets of every pair are distinct within
    themselves, so after one lexsort of (pair, value) over the
    concatenated streams each adjacent duplicate IS one intersection
    element — counted per pair with bincount.  Zero rows → empty array;
    two empty sets → Jaccard 1.0 (same convention as the SQL oracles).
    """
    n = len(col_a)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    A, offa = u64_segments(col_a)
    B, offb = u64_segments(col_b)
    na, nb = np.diff(offa), np.diff(offb)
    pid = np.concatenate([np.repeat(np.arange(n), na),
                          np.repeat(np.arange(n), nb)])
    vals = np.concatenate([A, B])
    order = np.lexsort((vals, pid))
    p, v = pid[order], vals[order]
    dup = (p[1:] == p[:-1]) & (v[1:] == v[:-1])
    inter = np.bincount(p[1:][dup], minlength=n)
    union = na + nb - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


def exact_containment_pairs(col_a, col_b) -> np.ndarray:
    """Row-wise EXACT containment |A∩B| / |A| between two binary
    columns of sorted-distinct uint64 sets (the asymmetric twin of
    ``exact_jaccard_pairs``, same lexsort+bincount kernel).  Empty A →
    containment 1.0 (vacuously contained, matching the convention
    that two empty sets are identical)."""
    n = len(col_a)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    A, offa = u64_segments(col_a)
    B, offb = u64_segments(col_b)
    na, nb = np.diff(offa), np.diff(offb)
    pid = np.concatenate([np.repeat(np.arange(n), na),
                          np.repeat(np.arange(n), nb)])
    vals = np.concatenate([A, B])
    order = np.lexsort((vals, pid))
    p, v = pid[order], vals[order]
    dup = (p[1:] == p[:-1]) & (v[1:] == v[:-1])
    inter = np.bincount(p[1:][dup], minlength=n)
    return np.where(na > 0, inter / np.maximum(na, 1), 1.0)
