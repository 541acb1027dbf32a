"""Deterministic word tokenization with char offsets.

The engine's tokenizer contract (≙ reference tokenize at
preprocessor.py:211-238, simplified to a subword-free regex): tokens
are maximal ``[a-z0-9]+`` runs of the lowercased text.  The same token
stream is expressible in DuckDB as
``unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))`` which is what
the correctness oracles use.
"""

from __future__ import annotations

import re

import numpy as np

TOKEN_RE = re.compile(r"[a-z0-9]+")
TOKEN_SQL = "regexp_extract_all(lower({col}), '[a-z0-9]+')"

# Tiny english stopword list shared by mention detection, quality
# scoring and language-ID. Kept deliberately small + frozen: it is part
# of the engine/oracle contract (mirrored into SQL IN-lists).
STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")
STOPWORD_SET = frozenset(STOPWORDS)


def tokenize(text: str) -> list[str]:
    return TOKEN_RE.findall(text.lower())


def tokenize_with_offsets(text: str) -> list[tuple[str, int, int]]:
    """(token, start, end) char offsets into the *original* text."""
    return [(m.group(0), m.start(), m.end()) for m in TOKEN_RE.finditer(text.lower())]


def flat_tokens_arrow(arr):
    """All tokens of an Arrow string array as ONE flat string array
    (instances, not vocabulary) — the TOKEN_RE/TOKEN_SQL contract with
    tokenization fully in C++ (utf8_lower + split_pattern_regex).
    Use when per-doc structure is not needed (e.g. corpus-wide token
    counting); ``tokenize_hash_arrow`` keeps the per-doc offsets."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = pc.split_pattern_regex(
        pc.utf8_lower(arr), pattern="[^a-z0-9]+").flatten()
    # split leaves empty tokens at text edges
    return flat.filter(pc.greater(pc.utf8_length(flat), 0))


def tokenize_arrow_offsets(arr) -> tuple["object", np.ndarray]:
    """Arrow-native tokenize with per-doc offsets — the tokenize-only
    half of ``tokenize_hash_arrow`` for callers that need doc structure
    but not the engine hash (they usually dictionary-encode the result
    themselves, so running the hash here would waste a vocab pass).

    Input: pyarrow string array (or chunked).  Returns (tokens: flat
    arrow string array of kept tokens, starts:int64 doc offsets) with
    doc i's tokens at ``tokens[starts[i]:starts[i+1]]``.  Tokenization
    runs entirely in C++ (utf8_lower + split_pattern_regex); empty
    edge tokens from the split are dropped."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lower = pc.utf8_lower(arr)
    split = pc.split_pattern_regex(lower, pattern="[^a-z0-9]+")
    split = split.combine_chunks() if isinstance(split, pa.ChunkedArray) else split
    flat = split.flatten()
    list_offs = np.frombuffer(split.buffers()[1], dtype=np.int32)[
        split.offset: split.offset + len(split) + 1].astype(np.int64)

    str_offs = np.frombuffer(flat.buffers()[1], dtype=np.int32)[
        flat.offset: flat.offset + len(flat) + 1].astype(np.int64)
    tok_len = np.diff(str_offs)
    keep = tok_len > 0  # split leaves empty tokens at text edges

    # per-doc counts of kept tokens → new starts
    doc_counts = np.diff(list_offs)
    drop_per_doc = np.zeros(len(doc_counts), dtype=np.int64)
    if (~keep).any():
        dropped_pos = np.nonzero(~keep)[0]
        doc_of = np.searchsorted(list_offs, dropped_pos, side="right") - 1
        np.add.at(drop_per_doc, doc_of, 1)
        flat = flat.filter(pa.array(keep))
    starts = np.zeros(len(doc_counts) + 1, dtype=np.int64)
    np.cumsum(doc_counts - drop_per_doc, out=starts[1:])
    return flat, starts


def tokenize_hash_arrow(arr, hasher=None) -> tuple[np.ndarray, np.ndarray, "object"]:
    """Arrow-native tokenize + hash for the signing hot path.

    Input: pyarrow string array (or chunked).  Returns
    (tok_h:uint64 flat token hashes, starts:int64 doc offsets,
    tokens:list<string> arrow ListArray of the kept tokens per doc).

    Tokenization runs entirely in C++ (``tokenize_arrow_offsets``)
    and hashing reads the Arrow values buffer directly with ~max_len
    vectorized numpy passes — no per-token python objects.  The hash is
    an FNV-1a over the first 24 bytes mixed with the token length, then
    splitmix64-finalized; it differs from ``hash_str_array`` by design
    (both are engine-internal: only within-pipeline consistency
    matters).
    """
    import pyarrow.compute as pc

    kept_tokens, starts = tokenize_arrow_offsets(arr)

    # Hash the VOCABULARY, not every instance: dictionary-encode is one
    # C++ hash-table pass over the token stream, after which the FNV
    # byte loop runs over |vocab| strings only and instances gather the
    # result (measured 10× over hashing all 8M instances per block —
    # the token stream's DRAM traffic was the signing stage's largest
    # cost and the main single-node scaling limiter).
    enc = pc.dictionary_encode(kept_tokens)
    dic = enc.dictionary
    vocab_h = _fnv_hash_strview(dic) if hasher is None else hasher(dic)
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    tok_h = vocab_h[idx]
    return tok_h, starts, kept_tokens


def tokenize_hash_full(arr) -> tuple[np.ndarray, np.ndarray, "object"]:
    """``tokenize_hash_arrow`` with the FULL-string stable hash
    (``hash_str_array`` over the vocabulary) instead of the 24-byte
    FNV prefix hash.  Use when token grouping must equal string
    equality up to ~2⁻⁶⁴ random collisions (LM scoring, HLL
    cardinality) — the prefix hash collides DETERMINISTICALLY for
    same-length tokens sharing their first 24 bytes, which is fine
    for MinHash sketches but not for exact-count aggregation.  Same
    vocabulary-first layout: the expensive hash runs |vocab| times,
    instances gather."""
    from .hashing import hash_str_array

    return tokenize_hash_arrow(
        arr, hasher=lambda dic: hash_str_array(dic.to_numpy(zero_copy_only=False)))


def _fnv_hash_strview(arr) -> np.ndarray:
    """uint64 hash per string of an Arrow string array, reading the
    values buffer directly (FNV-1a over the first 24 bytes ⊕ length,
    splitmix64-finalized)."""
    from .hashing import splitmix64

    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    str_offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset: arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = np.diff(str_offs)
    tok_start = str_offs[:-1]
    acc = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    max_iter = int(min(lens.max(initial=0), 24))
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for i in range(max_iter):
            m = lens > i
            acc[m] = (acc[m] ^ data[tok_start[m] + i]) * prime
        acc ^= lens.astype(np.uint64) << np.uint64(56)
    return splitmix64(acc)


def tokenize_batch(texts) -> tuple[list[str], np.ndarray]:
    """Tokenize a batch of texts into one flat token list + doc offsets.

    Returns (flat_tokens, starts) where ``starts`` has len(texts)+1
    entries and doc i's tokens are flat_tokens[starts[i]:starts[i+1]].
    The flat layout feeds the segment-vectorized MinHash/SimHash
    kernels (np.minimum.reduceat) without per-doc Python loops.
    """
    flat: list[str] = []
    starts = np.empty(len(texts) + 1, dtype=np.int64)
    starts[0] = 0
    findall = TOKEN_RE.findall
    for i, t in enumerate(texts):
        toks = findall(t.lower())
        flat.extend(toks)
        starts[i + 1] = len(flat)
    return flat, starts
