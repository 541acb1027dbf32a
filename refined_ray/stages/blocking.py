"""Blocking stage: emit (block_key, page_id) rows from the payload table.

Two blocking channels, unioned (north rule: "MinHash-LSH band keys
plus normalized-mention keys"):

  B1  LSH band keys over the MinHash signature, with ADAPTIVE geometry:
      - sparse docs (< SPARSE_MAX shingles): 64 bands × 2 rows — the
        wide s-curve needed to catch J ≥ 0.45 between short pages.
      - fat docs (≥ FAT_MIN shingles): 32 bands × 4 rows — halves the
        shuffled rows per page.  The s-curve midpoint moves up: miss
        at J=0.5 is (1-0.5⁴)³² ≈ 0.13, but true matches between LONG
        documents in this corpus regime (mirror dropout ≤ 4%,
        near-dup docs at shingle-J ≥ 0.8) sit at J ≥ 0.8, where miss
        = (1-0.8⁴)³² ≈ 5e-8.  Pairs straddling the size boundary are covered
        because the geometries OVERLAP: docs in [FAT_MIN, SPARSE_MAX)
        emit BOTH key sets, and J ≥ 0.5 forces size ratio ≥ 0.5, so
        two docs with J ≥ 0.5 always share at least one geometry.
  B2  normalized-mention key — stable hash of the page's normalized
      head surface (≙ the reference's PEM surface-form key, the probe
      key of candidate generation, candidate_generator.py:62-94).

Rows are deliberately NARROW (two int64s): the payload (signatures,
embeddings) does NOT ride along with every band row — that would
multiply shuffle bytes ~30-60×.  Pairs are joined/broadcast back to
the payload after enumeration + dedup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash_str_array, splitmix64
from ..functions.minhash import band_keys

# Channel salts keep the three key spaces disjoint.
_MENTION_CHANNEL_SALT = np.uint64(0x5EED0001)
_FAT_CHANNEL_SALT = np.uint64(0x5EED0002)

SPARSE_BANDS = 64   # × 2 rows
FAT_BANDS = 32      # × 4 rows
FAT_MIN_SHINGLES = 384
SPARSE_MAX_SHINGLES = 2 * FAT_MIN_SHINGLES  # overlap zone emits both


def decode_sig_column(col, n_rows: int) -> np.ndarray:
    """binary sig column → (n, NUM_PERMS) uint16 matrix (zero-copy),
    widened to uint64 for the band-key mixer."""
    from .scoring import _binary_to_matrix

    return _binary_to_matrix(col, "<u2").astype(np.uint64)


def emit_block_keys_batch(batch: pa.Table) -> pa.Table:
    """payload rows → (block_key:int64, page_id:int64) rows."""
    n = batch.num_rows
    page_ids = batch["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    sig = decode_sig_column(batch["sig"], n)
    n_tokens = batch["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_shingles = np.maximum(n_tokens - 2, 1)

    keys_parts, pids_parts = [], []

    sparse = n_shingles < SPARSE_MAX_SHINGLES
    if sparse.any():
        bands = band_keys(sig[sparse], SPARSE_BANDS)
        keys_parts.append(bands.ravel().view(np.int64))
        pids_parts.append(np.repeat(page_ids[sparse], SPARSE_BANDS))

    fat = n_shingles >= FAT_MIN_SHINGLES
    if fat.any():
        bands = splitmix64(band_keys(sig[fat], FAT_BANDS) ^ _FAT_CHANNEL_SALT)
        keys_parts.append(bands.ravel().view(np.int64))
        pids_parts.append(np.repeat(page_ids[fat], FAT_BANDS))

    heads = batch["head"].to_pylist()
    m_keys = splitmix64(hash_str_array(heads) ^ _MENTION_CHANNEL_SALT).view(np.int64)
    nonempty = np.array([len(h) > 0 for h in heads], dtype=bool)
    keys_parts.append(m_keys[nonempty])
    pids_parts.append(page_ids[nonempty])

    return pa.table(
        {
            "block_key": pa.array(np.concatenate(keys_parts), type=pa.int64()),
            "page_id": pa.array(np.concatenate(pids_parts), type=pa.int64()),
        }
    )


def emit_block_keys(payload_ds, **map_kwargs):
    return payload_ds.map_batches(emit_block_keys_batch, batch_format="pyarrow", **map_kwargs)
