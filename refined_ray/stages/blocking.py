"""Blocking stage: emit (block_key, page_id) rows from the payload table.

Two blocking channels, unioned (north rule: "MinHash-LSH band keys
plus normalized-mention keys"):

  B1  LSH band keys — 64 bands × 2 rows over the MinHash signature.
  B2  normalized-mention key — stable hash of the page's normalized
      head surface (≙ the reference's PEM surface-form key, the probe
      key of candidate generation, candidate_generator.py:62-94).

Rows are deliberately NARROW (two uint64s): the payload (signatures,
embeddings) does NOT ride along with every band row — at 64 bands per
page that would multiply shuffle bytes 64×.  Pairs are joined back to
the payload table after enumeration + dedup (stages/pairs.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash_str_array, splitmix64
from ..functions.minhash import NUM_BANDS, band_keys

# Channel salt keeps mention-key blocks disjoint from LSH band blocks.
_MENTION_CHANNEL_SALT = np.uint64(0x5EED0001)


def decode_sig_column(col, n_rows: int) -> np.ndarray:
    """binary sig column → (n, NUM_PERMS) uint64 matrix (one copy)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    buf = b"".join(arr.to_pylist())
    return np.frombuffer(buf, dtype="<u8").reshape(n_rows, -1)


def emit_block_keys_batch(batch: pa.Table) -> pa.Table:
    """payload rows → (block_key:int64, page_id:int64) rows."""
    n = batch.num_rows
    page_ids = batch["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    sig = decode_sig_column(batch["sig"], n)

    bands = band_keys(sig, NUM_BANDS)  # (n, NUM_BANDS) uint64
    b_keys = bands.ravel().view(np.int64)
    b_pids = np.repeat(page_ids, NUM_BANDS)

    heads = batch["head"].to_pylist()
    m_keys = splitmix64(hash_str_array(heads) ^ _MENTION_CHANNEL_SALT).view(np.int64)
    nonempty = np.array([len(h) > 0 for h in heads], dtype=bool)

    return pa.table(
        {
            "block_key": pa.array(np.concatenate([b_keys, m_keys[nonempty]]), type=pa.int64()),
            "page_id": pa.array(np.concatenate([b_pids, page_ids[nonempty]]), type=pa.int64()),
        }
    )


def emit_block_keys(payload_ds, **map_kwargs):
    return payload_ds.map_batches(emit_block_keys_batch, batch_format="pyarrow", **map_kwargs)
