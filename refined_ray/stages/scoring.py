"""Pairwise scoring: an actor-pool ``map_batches`` stage over candidate
pairs enriched with both sides' payloads.

≙ the reference's ED scorer feature combiner
(entity_disambiguation_layer.py:36-119: a linear layer over
[description bi-encoder dot product, PEM prior, type distance]),
re-expressed from scratch for symmetric record linkage:

  features per pair:
    est_jaccard  MinHash signature agreement (≙ candidate overlap)
    cos_sim      hash-embedding cosine (≙ bi-encoder dot product, T3)
    jw_sim       Jaro-Winkler on normalized head keys
    lev_sim      normalized Levenshtein on head keys
  score = fixed convex combination (a learned layer would slot in the
  same place; weights are part of the engine contract, not trained).

The scorer is a callable CLASS → Ray actor pool: the (tiny, here)
model state — weights, thresholds, any side tables — is built once per
actor in ``__init__``; ``__call__`` is fully vectorized per batch.
With a real GPU bi-encoder this same class would carry the model and
``num_gpus=1``; nothing else in the pipeline changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.minhash import NUM_PERMS
from ..functions.strings import jaro_winkler_batch, levenshtein_similarity_batch

# est_jaccard dominates the convex combination: it is the only feature
# with a provable margin on near-duplicate corpora (cross-entity page
# pairs sit at J ≤ 0.2, needed intra-entity links at J ≥ 0.45; with 128
# permutations the estimate's σ ≈ 0.045, so τ = 0.5 leaves >2σ on both
# sides once the weighted secondary features are added).  Cosine over
# hash embeddings is deliberately down-weighted: bag-of-words cosine is
# near-1 for same-domain text and only breaks ties.
DEFAULT_THRESHOLD = 0.5
WEIGHTS = {"est_jaccard": 0.70, "cos_sim": 0.10, "jw_sim": 0.10, "lev_sim": 0.10}


def _binary_to_matrix(col, dtype_str: str) -> np.ndarray:
    """binary column of fixed-width blobs → (n, w) matrix."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    buf = b"".join(arr.to_pylist())
    return np.frombuffer(buf, dtype=dtype_str).reshape(len(arr), -1)


class PairScorer:
    """Actor-pool scorer. Input batch columns: a, b, n_shared_blocks,
    sig_a, sig_b, emb_a, emb_b, head_a, head_b.  Output adds the four
    feature columns + ``score``."""

    def __init__(self, weights: dict | None = None):
        w = weights or WEIGHTS
        self.w = np.array([w["est_jaccard"], w["cos_sim"], w["jw_sim"], w["lev_sim"]])

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        sig_a = _binary_to_matrix(batch["sig_a"], "<u8")
        sig_b = _binary_to_matrix(batch["sig_b"], "<u8")
        emb_a = _binary_to_matrix(batch["emb_a"], "<f4")
        emb_b = _binary_to_matrix(batch["emb_b"], "<f4")
        head_a = batch["head_a"].to_pylist()
        head_b = batch["head_b"].to_pylist()

        est_j = (sig_a == sig_b).mean(axis=1)
        cos = np.einsum("ij,ij->i", emb_a, emb_b).astype(np.float64)
        jw = jaro_winkler_batch(head_a, head_b)
        lev = levenshtein_similarity_batch(head_a, head_b)

        feats = np.stack([est_j, np.clip(cos, 0.0, 1.0), jw, lev], axis=1)
        score = feats @ self.w

        out = batch.select(["a", "b", "n_shared_blocks", "block_size", "capped"])
        for name, col in (("est_jaccard", est_j), ("cos_sim", cos), ("jw_sim", jw),
                          ("lev_sim", lev), ("score", score)):
            out = out.append_column(name, pa.array(col, type=pa.float64()))
        return out


def attach_payloads(pairs, payload, num_partitions: int = 16):
    """Hash-join both pair sides to the payload table (narrow columns).

    Two hash-partitioned joins (Ray Dataset.join) on page_id.  The
    payload side carries only (page_id, sig, emb, head) — urls and
    token counts stay out of the pair stream.
    """
    side = payload.select_columns(["page_id", "sig", "emb", "head"])
    a_side = side.rename_columns({"page_id": "a", "sig": "sig_a", "emb": "emb_a", "head": "head_a"})
    b_side = side.rename_columns({"page_id": "b", "sig": "sig_b", "emb": "emb_b", "head": "head_b"})
    enriched = pairs.join(a_side, join_type="inner", num_partitions=num_partitions, on=("a",))
    enriched = enriched.join(b_side, join_type="inner", num_partitions=num_partitions, on=("b",))
    return enriched


def score_pairs(enriched, threshold: float = DEFAULT_THRESHOLD, concurrency=(1, 8), **map_kwargs):
    """Run the scorer actor pool and filter to edges (score ≥ τ)."""
    scored = enriched.map_batches(
        PairScorer, batch_format="pyarrow", concurrency=concurrency, **map_kwargs
    )
    edges = scored.filter(expr=f"score >= {threshold}")
    return scored, edges
