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


def sign_pages_batch(batch: pa.Table, text_col: str = "extracted_text",
                     emit_sets: bool = False) -> pa.Table:
    """``emit_sets=True`` adds a ``set`` column (sorted-distinct shingle
    hashes, little-endian uint64 bytes) enabling the exact-verification
    tier of the ER pipeline — ~8 B per distinct shingle per page, so
    only requested when exact semantics are needed."""
    import pyarrow.compute as pc

    from ..functions.tokenize import tokenize_hash_arrow

    urls = batch["url"].to_pylist()
    n = batch.num_rows

    # Arrow-native tokenize+hash: C++ lower/split + buffer-level numpy
    # hashing — the py-regex/py-string path costs ~0.2 ms/KB and was
    # the pipeline's single largest compute sink at benchmark scale.
    tok_h, starts, tokens = tokenize_hash_arrow(batch[text_col])
    sh, sh_starts = shingle_hashes(None, starts, tok_h=tok_h)
    # store the low 16 bits of each minhash bucket: bucket-equality
    # (all est_jaccard and banding need) gains a false-match prob of
    # only 2^-16 per bucket, while signature bytes drop 4x (1 KB ->
    # 256 B/page) across payload, shuffle, broadcast and compare.
    sig = minhash_signatures(sh, sh_starts).astype(np.uint16)  # (n, 128)
    emb = embed_from_hashes(tok_h, starts)  # (n, 64)

    # heads: first ≤8 tokens per doc, gathered + joined in Arrow
    h_start = starts[:-1]
    h_end = np.minimum(h_start + HEAD_TOKENS, starts[1:])
    cnt = h_end - h_start
    idx = np.repeat(h_start, cnt) + (np.arange(cnt.sum(), dtype=np.int64)
                                     - np.repeat(np.cumsum(cnt) - cnt, cnt))
    head_flat = tokens.take(pa.array(idx, type=pa.int64()))
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(cnt, out=offsets[1:])
    head_list = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int64()).cast(pa.int32()), head_flat)
    heads = pc.binary_join(head_list, " ")
    head_norm = normalize_surface_array(heads)

    cols = {
        "page_id": pa.array(page_id_array(urls), type=pa.int64()),
        "url": batch["url"],
        "head": head_norm,
        "sig": pa.array([sig[i].tobytes() for i in range(n)], type=pa.binary()),
        "emb": pa.array([emb[i].tobytes() for i in range(n)], type=pa.binary()),
        "n_tokens": pa.array(np.diff(starts).astype(np.int32)),
    }
    if emit_sets:
        # per-doc sorted-distinct shingle sets, one lexsort + segment
        # dedup over the flat stream (no per-doc np.unique loop)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(sh_starts))
        order = np.lexsort((sh, doc_idx))
        d_s, v_s = doc_idx[order], sh[order]
        if len(d_s):  # a whole batch of <3-token docs yields zero shingles
            keep = np.r_[True, (d_s[1:] != d_s[:-1]) | (v_s[1:] != v_s[:-1])]
            d_s, v_s = d_s[keep], v_s[keep]
        set_counts = np.bincount(d_s, minlength=n)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(set_counts * 8, out=offsets[1:])
        cols["set"] = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offsets.astype(np.int32).tobytes()),
             pa.py_buffer(v_s.tobytes())])
    return pa.table(cols)


def sign_pages(pages, text_col: str = "extracted_text", emit_sets: bool = False,
               **map_kwargs):
    return pages.map_batches(
        lambda b: sign_pages_batch(b, text_col=text_col, emit_sets=emit_sets),
        batch_format="pyarrow", **map_kwargs
    )
