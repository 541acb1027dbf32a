"""Deterministic hash embeddings — the bi-encoder stand-in.

≙ the reference's precomputed description bi-encoder embeddings
(preprocessor.py:188-200, ed_layer_2.py:61-132: 300-d vectors scored by
dot product).  The container has no model weights or GPU, so the
embedding function is a deterministic feature-hashing encoder: each
token hashes to one of `dim` buckets with a ±1 sign, token-frequency
weighted, L2-normalized.  The *pipeline* contract (an embedding column
scored by cosine inside an actor pool) is identical to dropping in a
real encoder — swap `embed_batch` for a model forward and nothing
else changes.
"""

from __future__ import annotations

import numpy as np

from .hashing import hash_str_array
from .tokenize import tokenize_batch

EMBED_DIM = 64


def embed_batch(texts, dim: int = EMBED_DIM) -> np.ndarray:
    """(n, dim) float32 L2-normalized hash embeddings."""
    flat, starts = tokenize_batch(texts)
    h = hash_str_array(flat) if flat else np.empty(0, dtype=np.uint64)
    return embed_from_hashes(h, starts, dim)


def embed_from_hashes(tok_h: np.ndarray, starts: np.ndarray, dim: int = EMBED_DIM) -> np.ndarray:
    """Embeddings from precomputed token hashes (flat segment layout)."""
    n_docs = len(starts) - 1
    out = np.zeros((n_docs, dim), dtype=np.float32)
    if len(tok_h):
        h = tok_h
        buckets = (h % np.uint64(dim)).astype(np.int64)
        signs = np.where((h >> np.uint64(63)) & np.uint64(1), -1.0, 1.0).astype(np.float32)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(starts))
        np.add.at(out, (doc_idx, buckets), signs)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out


def cosine_rowwise(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise cosine of two (n, d) matrices (assumed L2-normalized)."""
    return np.einsum("ij,ij->i", a, b)
