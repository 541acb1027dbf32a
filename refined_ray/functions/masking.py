"""Training-time whole-mention masking (M16 ≙ reference mask_mentions,
utilities/dataset_utils.py:8-67): each mention is masked with
``mask_prob``; a masked mention is replaced by per-token RANDOM vocab
ids with ``random_word_prob``, else by the [MASK] id.  Decisions are
PER MENTION (whole-mention masking), replacements per token.

Vectorized + seeded: one RNG draw per distinct mention id, scattered
back to tokens with searchsorted — deterministic under a fixed seed
(the reference used the global ``random`` module; a distributed
training pipeline needs per-batch reproducibility instead).
"""

from __future__ import annotations

import numpy as np


def mask_mentions_batch(
    token_ids: np.ndarray,
    span_ids: np.ndarray,
    mask_token_id: int,
    vocab_size: int,
    mask_prob: float = 0.80,
    random_word_prob: float = 0.05,
    seed: int = 0,
) -> np.ndarray:
    """token_ids: int64 token ids; span_ids: per-token mention id
    (0 = not part of a mention).  Returns the masked token ids."""
    token_ids = np.asarray(token_ids, dtype=np.int64)
    span_ids = np.asarray(span_ids, dtype=np.int64)
    out = token_ids.copy()
    uniq = np.unique(span_ids[span_ids > 0])
    if not len(uniq):
        return out
    rng = np.random.default_rng(seed)
    masked = rng.random(len(uniq)) < mask_prob
    randomized = masked & (rng.random(len(uniq)) < random_word_prob)

    in_mention = span_ids > 0
    pos = np.searchsorted(uniq, span_ids[in_mention])
    tok_masked = np.zeros(len(token_ids), dtype=bool)
    tok_random = np.zeros(len(token_ids), dtype=bool)
    tok_masked[in_mention] = masked[pos]
    tok_random[in_mention] = randomized[pos]

    out[tok_masked] = mask_token_id
    n_rand = int(tok_random.sum())
    if n_rand:
        out[tok_random] = rng.integers(0, vocab_size, size=n_rand, dtype=np.int64)
    return out
