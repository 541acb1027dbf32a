"""MinHash signatures + LSH band keys, segment-vectorized.

The reference has no sketches (SURVEY.md §2.5); MinHash-LSH is the
blocking stage the north rule adds: shingle → minhash → band →
bucket-groupby.  All kernels operate on a *flat* token array with
per-doc segment offsets (see functions.tokenize.tokenize_batch) so a
whole Arrow batch is signed with numpy reduceat calls — no per-doc
Python loop in the hot path.

Default geometry: 128 permutations = 64 bands × 2 rows.  The LSH
s-curve catches Jaccard ≥ 0.45 with p ≈ 1-(1-0.45²)^64 ≈ 1-6e-7 —
sized against the synthetic corpus's worst-case same-document mirror
Jaccard (~0.45 for 10-token pages with one dropped token) — while
unrelated word-soup pages (shingle-J ≈ 1e-3) collide with
p ≈ 64·J² ≈ 6e-5 per pair; those spurious candidates are rejected by
signature-Jaccard verification in the scoring stage.
"""

from __future__ import annotations

import numpy as np

from .hashing import hash_str_array, splitmix64

_U64 = np.uint64
NUM_PERMS = 128
NUM_BANDS = 64
ROWS_PER_BAND = NUM_PERMS // NUM_BANDS
SHINGLE_K = 3

# Fixed per-permutation seeds (never change: signatures are persisted).
_PERM_SEEDS = splitmix64(np.arange(1, NUM_PERMS + 1, dtype=_U64) * _U64(0x9E3779B97F4A7C15))
_BAND_SALT = splitmix64(np.arange(NUM_BANDS, dtype=_U64) + _U64(0xABCDEF12345))


def shingle_hashes(flat_tokens: list[str], starts: np.ndarray, k: int = SHINGLE_K,
                   tok_h: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
    """k-token shingle hashes for a batch of docs in flat layout.

    Returns (flat_shingles:uint64, sh_starts) in the same segment
    layout.  Docs shorter than k tokens get a single shingle covering
    all their tokens (so every doc has ≥1 shingle and a signature).
    ``tok_h`` lets callers reuse precomputed token hashes.
    """
    if tok_h is None:
        tok_h = hash_str_array(flat_tokens)
    n_docs = len(starts) - 1
    lens = np.diff(starts)
    sh_counts = np.maximum(lens - (k - 1), 1)
    sh_counts[lens == 0] = 1  # empty doc → one sentinel shingle
    sh_starts = np.empty(n_docs + 1, dtype=np.int64)
    sh_starts[0] = 0
    np.cumsum(sh_counts, out=sh_starts[1:])

    flat_sh = np.empty(sh_starts[-1], dtype=_U64)
    n_tok = len(tok_h)
    with np.errstate(over="ignore"):
        # Rolling combine over the WHOLE flat token array: pos i holds
        # mix(t[i..i+k-1]).  Shingles that would cross a doc boundary are
        # simply never selected below — no per-doc loop.
        if n_tok >= k:
            acc = tok_h[: n_tok - k + 1].copy()
            for j in range(1, k):
                acc = acc * _U64(0xC2B2AE3D27D4EB4F) + tok_h[j : n_tok - k + 1 + j]
            acc = splitmix64(acc)
        else:
            acc = np.empty(0, dtype=_U64)

        # Gather each doc's shingle positions vectorially: for doc d the
        # positions are starts[d] .. starts[d]+sh_counts[d]-1.
        long_docs = lens >= k
        if long_docs.any():
            cnt = sh_counts[long_docs]
            base = np.repeat(starts[:-1][long_docs], cnt)
            offs = np.arange(cnt.sum(), dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            dst = np.repeat(sh_starts[:-1][long_docs], cnt) + offs
            flat_sh[dst] = acc[base + offs]

        # Short docs (< k tokens): one shingle over all their tokens.
        for d in np.nonzero(~long_docs)[0]:
            s, e = starts[d], starts[d + 1]
            if e > s:
                a = tok_h[s]
                for j in range(s + 1, e):
                    a = a * _U64(0xC2B2AE3D27D4EB4F) + tok_h[j]
                flat_sh[sh_starts[d]] = splitmix64(np.array([a], dtype=_U64))[0]
            else:
                flat_sh[sh_starts[d]] = _U64(0)
    return flat_sh, sh_starts


# Docs with fewer shingles than this use the classic O(P·S) permutation
# sweep; docs at/above it use one-permutation hashing.  See
# minhash_signatures for why the split exists.
OPH_MIN_SHINGLES = 3 * NUM_PERMS


def _classic_signatures(flat_sh: np.ndarray, starts: np.ndarray, num_perms: int,
                        chunk: int = 2048) -> np.ndarray:
    """Full permutation sweep: sig[d,p] = min_p over d's shingles.

    Processed in ``chunk``-shingle slices so the (chunk, P) permuted
    temporary stays cache-resident (~2 MB).  The naive single (P, S)
    broadcast is 5× slower alone and ~200× slower when 32 Ray workers
    run it concurrently — each task then streams a ~550 MB temporary
    through DRAM and the node saturates on memory bandwidth."""
    n_docs = len(starts) - 1
    seeds = _PERM_SEEDS[:num_perms]
    out = np.full((n_docs, num_perms), np.iinfo(np.uint64).max, dtype=_U64)
    S = len(flat_sh)
    for lo in range(0, S, chunk):
        hi = min(lo + chunk, S)
        permuted = splitmix64(flat_sh[lo:hi, None] ^ seeds[None, :])  # (c, P)
        d0 = int(np.searchsorted(starts, lo, side="right")) - 1
        d1 = int(np.searchsorted(starts, hi, side="left"))
        cuts = np.clip(starts[d0:d1 + 1], lo, hi) - lo
        red = np.minimum.reduceat(permuted, cuts[:-1], axis=0)
        np.minimum(out[d0:d1], red, out=out[d0:d1])
    return out


def minhash_signatures(flat_shingles: np.ndarray, sh_starts: np.ndarray, num_perms: int = NUM_PERMS) -> np.ndarray:
    """(n_docs, num_perms) uint64 signature matrix — hybrid sketch.

    - SPARSE docs (< OPH_MIN_SHINGLES shingles): classic per-permutation
      MinHash.  One-permutation hashing is UNSAFE here: with many empty
      buckets, rotational densification copies one value across bucket
      runs, so two nearly-disjoint docs sharing a single hot shingle can
      agree on whole bands — measured as a candidate-pair explosion
      (~7× pairs, 12 GB of enriched pairs on the amplified corpus).
      The classic sweep is cheap exactly when docs are small.
    - FAT docs (≥ OPH_MIN_SHINGLES): one-permutation hashing (bucket =
      top bits of rehash, min per bucket; Li et al.'s one-pass sketch).
      At ≥ 3 shingles per bucket on average, empties are ≤ 5% (e^-3),
      filled by cyclic copy from the left — too sparse to form the
      correlated runs that break the sparse case — so bucket-equality
      probability ≈ Jaccard and the O(S) pass is 15-20× faster than the
      permutation sweep on long documents.

    Identical shingle sets ⇒ identical signatures on either path, and
    both paths are fully deterministic.
    """
    n_docs = len(sh_starts) - 1
    if num_perms & (num_perms - 1):
        raise ValueError("num_perms must be a power of two")
    counts = np.diff(sh_starts)
    sparse = counts < OPH_MIN_SHINGLES
    sig = np.empty((n_docs, num_perms), dtype=_U64)

    if sparse.any():
        # gather sparse docs' shingles into their own flat layout
        sp_counts = counts[sparse]
        sp_starts = np.empty(sparse.sum() + 1, dtype=np.int64)
        sp_starts[0] = 0
        np.cumsum(sp_counts, out=sp_starts[1:])
        base = np.repeat(sh_starts[:-1][sparse], sp_counts)
        offs = np.arange(sp_counts.sum(), dtype=np.int64) - np.repeat(sp_starts[:-1], sp_counts)
        sig[sparse] = _classic_signatures(flat_shingles[base + offs], sp_starts, num_perms)

    fat = ~sparse
    if fat.any():
        shift = _U64(64 - int(np.log2(num_perms)))
        fat_counts = counts[fat]
        if sparse.any():
            base = np.repeat(sh_starts[:-1][fat], fat_counts)
            offs = np.arange(fat_counts.sum(), dtype=np.int64) - np.repeat(
                np.cumsum(fat_counts) - fat_counts, fat_counts)
            gathered = flat_shingles[base + offs]
        else:
            # every doc fat → the gather is the identity; skip one full
            # pass over the (large) shingle stream
            gathered = flat_shingles
        h = splitmix64(gathered ^ _PERM_SEEDS[0])
        bucket = (h >> shift).astype(np.int64)
        n_fat = int(fat.sum())
        doc_idx = np.repeat(np.arange(n_fat, dtype=np.int64), fat_counts)

        sentinel = _U64(0xFFFFFFFFFFFFFFFF)
        fsig = np.full(n_fat * num_perms, sentinel, dtype=_U64)
        np.minimum.at(fsig, doc_idx * num_perms + bucket, h)
        fsig = fsig.reshape(n_fat, num_perms)
        # Empty buckets are filled with a PER-DOC value derived from the
        # doc's global min hash and the bucket index.  Copy-from-neighbor
        # densification is UNSAFE under LSH banding: the copy source is
        # often the band's other row, degenerating a 2-row band to one
        # effective row whenever two docs have aligned empties — at 3%
        # empties that corrupted ~14% of pairs' bands and inflated
        # candidates 2.3×.  Doc-unique fillers can never match across
        # docs with different shingle sets (identical sets ⇒ identical
        # fillers, preserving sig equality); the only cost is an
        # est_jaccard bias of ≈ the empty fraction (≤5% here).
        empty = fsig == sentinel
        if empty.any():
            doc_min = fsig.min(axis=1)  # real min exists: ≥1 shingle per doc
            bucket_ids = np.arange(num_perms, dtype=_U64)
            filler = splitmix64(doc_min[:, None] ^ splitmix64(bucket_ids)[None, :]
                                ^ _U64(0xF111E7))
            fsig = np.where(empty, filler, fsig)
        sig[fat] = fsig
    return sig


def band_keys(signatures: np.ndarray, num_bands: int = NUM_BANDS) -> np.ndarray:
    """(n_docs, num_bands) uint64 LSH block keys.

    Each band key hashes that band's signature rows together with the
    band id, so keys from different bands never collide into one block.
    """
    n_docs, p = signatures.shape
    r = p // num_bands
    bands = signatures.reshape(n_docs, num_bands, r)
    with np.errstate(over="ignore"):
        acc = bands[:, :, 0].copy()
        for j in range(1, r):
            acc = splitmix64(acc * _U64(0xC2B2AE3D27D4EB4F) + bands[:, :, j])
        acc = splitmix64(acc ^ _BAND_SALT[None, :num_bands])
    return acc


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Row-wise Jaccard estimate between two (n, P) signature matrices."""
    return (sig_a == sig_b).mean(axis=1)
