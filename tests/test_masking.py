"""Tests for whole-mention masking (M16)."""

from __future__ import annotations

import numpy as np

from refined_ray.functions.masking import mask_mentions_batch

MASK = 50_000
VOCAB = 50_001


def test_whole_mention_masked_together():
    token_ids = np.arange(10, dtype=np.int64)
    span_ids = np.array([0, 1, 1, 1, 0, 2, 2, 0, 0, 0], dtype=np.int64)
    out = mask_mentions_batch(token_ids, span_ids, MASK, VOCAB,
                              mask_prob=1.0, random_word_prob=0.0, seed=3)
    # every mention token masked, all others untouched
    assert (out[span_ids > 0] == MASK).all()
    assert (out[span_ids == 0] == token_ids[span_ids == 0]).all()


def test_mask_prob_zero_is_identity():
    token_ids = np.arange(8, dtype=np.int64)
    span_ids = np.array([1, 1, 0, 2, 2, 0, 3, 3], dtype=np.int64)
    out = mask_mentions_batch(token_ids, span_ids, MASK, VOCAB,
                              mask_prob=0.0, seed=1)
    assert (out == token_ids).all()


def test_seeded_determinism():
    rng = np.random.default_rng(9)
    token_ids = rng.integers(0, VOCAB, 500).astype(np.int64)
    span_ids = np.repeat(np.arange(100, dtype=np.int64), 5)
    a = mask_mentions_batch(token_ids, span_ids, MASK, VOCAB, seed=7)
    b = mask_mentions_batch(token_ids, span_ids, MASK, VOCAB, seed=7)
    c = mask_mentions_batch(token_ids, span_ids, MASK, VOCAB, seed=8)
    assert (a == b).all()
    assert (a != c).any()


def test_masking_decision_is_per_mention_not_per_token():
    token_ids = np.zeros(600, dtype=np.int64)
    span_ids = np.repeat(np.arange(1, 101, dtype=np.int64), 6)
    out = mask_mentions_batch(token_ids, span_ids, MASK, VOCAB,
                              mask_prob=0.5, random_word_prob=0.0, seed=11)
    # within each mention: all-or-nothing
    for m in range(1, 101):
        vals = out[span_ids == m]
        assert (vals == MASK).all() or (vals == 0).all()
    frac = sum((out[span_ids == m] == MASK).all() for m in range(1, 101)) / 100
    assert 0.3 < frac < 0.7  # ~mask_prob


def test_random_replacement_draws_per_token():
    token_ids = np.zeros(400, dtype=np.int64)
    span_ids = np.repeat(np.arange(1, 101, dtype=np.int64), 4)
    out = mask_mentions_batch(token_ids, span_ids, MASK, VOCAB,
                              mask_prob=1.0, random_word_prob=1.0, seed=5)
    # replaced with per-token random ids: varied, not the MASK constant
    assert (out != MASK).any()
    assert len(np.unique(out)) > 100
    # a random draw can land on the original id (0) occasionally, but
    # the overwhelming majority must differ
    assert (out != 0).mean() > 0.95
