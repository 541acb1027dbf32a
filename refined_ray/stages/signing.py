"""Per-page signature stage: ids, MinHash signatures, hash embeddings,
normalized head keys.

Produces the narrow per-page *payload* table that both the blocking
stage (band keys) and the scoring stage (signature/embedding features)
consume — computed once, reused twice, so the expensive tokenization
never runs twice over the corpus.

Output schema (one row per page):
  page_id:uint64   stable blake2b hash of url (partitioning key)
  url:string
  head:string      normalized first-N-token surface (≙ reference
                   normalize_surface_form M1, loaders.py:137-148) —
                   the "normalized mention" blocking + JW/Lev key
  sig:binary   MinHash signature — 128 uint64 little-endian (1024 B)
  emb:binary   hash embedding — 64 float32 little-endian (256 B)
  n_tokens:int32

Signatures/embeddings ride as opaque binary blobs rather than Arrow
fixed-size lists because the pair-enrichment hash join (pyarrow acero)
rejects nested types in non-key fields; consumers decode them
zero-copy with np.frombuffer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.embeddings import EMBED_DIM, embed_from_hashes
from ..functions.hashing import hash_str_array, stable_hash64_str
from ..functions.minhash import NUM_PERMS, minhash_signatures, shingle_hashes
from ..functions.normalize import normalize_surface_array
from ..functions.tokenize import tokenize_batch

HEAD_TOKENS = 8


def page_id_array(urls) -> np.ndarray:
    # int64 (two's-complement view of the 64-bit hash): Ray's hash-join
    # type promotion rejects uint64, and int64 orders/joins identically.
    return np.array([stable_hash64_str(u) for u in urls], dtype=np.uint64).view(np.int64)


def sign_pages_batch(batch: pa.Table, text_col: str = "extracted_text") -> pa.Table:
    urls = batch["url"].to_pylist()
    texts = batch[text_col].to_pylist()
    n = len(urls)

    flat, starts = tokenize_batch(texts)
    tok_h = hash_str_array(flat) if flat else __import__("numpy").empty(0, dtype="uint64")
    sh, sh_starts = shingle_hashes(flat, starts, tok_h=tok_h)
    sig = minhash_signatures(sh, sh_starts)  # (n, 128)
    emb = embed_from_hashes(tok_h, starts)  # (n, 64)

    heads = [" ".join(flat[starts[i] : min(starts[i] + HEAD_TOKENS, starts[i + 1])]) for i in range(n)]
    head_norm = normalize_surface_array(pa.array(heads, type=pa.string()))

    return pa.table(
        {
            "page_id": pa.array(page_id_array(urls), type=pa.int64()),
            "url": batch["url"],
            "head": head_norm,
            "sig": pa.array([sig[i].tobytes() for i in range(n)], type=pa.binary()),
            "emb": pa.array([emb[i].tobytes() for i in range(n)], type=pa.binary()),
            "n_tokens": pa.array(np.diff(starts).astype(np.int32)),
        }
    )


def sign_pages(pages, text_col: str = "extracted_text", **map_kwargs):
    return pages.map_batches(
        lambda b: sign_pages_batch(b, text_col=text_col), batch_format="pyarrow", **map_kwargs
    )
