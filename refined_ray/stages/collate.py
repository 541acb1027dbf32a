"""Window collation — the model-feeding tensorization stage (M9/O4).

≙ the reference's ``convert_batch_elements_to_batched_tns`` +
``collate_batch_elements_tns`` + ``pad``
(preprocessing_utils.py:182-211, 257-441, 444-464): docs are split
into ≤``max_seq``-token windows, windows are sorted by token length
(descending — the reference's O4 "batch similar lengths together"
padding-efficiency trick, preprocessing_utils.py:196-199), grouped
into micro-batches of ``max_batch_size``, and each window's token-id
row is padded with ``pad_value`` so a model actor can stack a
micro-batch into one dense matrix with zero per-row python work.

Differences from the reference, by design:
- token ids are the engine's deterministic token hashes
  (functions/tokenize.tokenize_hash_arrow), not a learned subword
  vocabulary — the container has no model; the collation CONTRACT
  (shapes, pad sentinel, mask arithmetic) is the operator under test;
- output is an Arrow table (one row per window, ``token_ids`` a
  fixed-size or variable list column), not torch tensors: a scorer
  actor reshapes a micro-batch zero-copy via numpy.

Everything is segment-vectorized: the scatter that fills the padded
id matrix is one fancy-indexed numpy assignment per Arrow batch, no
per-window python loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PAD_VALUE = 0  # ≙ the reference's all-zeros padding sentinel row
               # (preprocessor.py:188-200 asserts row 0 of the
               # description memmap is zeros)


def _empty_windows(max_seq: int, pad_to_longest: bool) -> pa.Table:
    ids_type = (pa.list_(pa.int64(), max_seq) if not pad_to_longest
                else pa.large_list(pa.int64()))
    return pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "window_idx": pa.array([], type=pa.int64()),
        "n_tokens": pa.array([], type=pa.int64()),
        "n_pad": pa.array([], type=pa.int64()),
        "microbatch": pa.array([], type=pa.int64()),
        "token_ids": pa.array([], type=ids_type),
    })


def _collate_windows(doc_ids: np.ndarray, doc_of: np.ndarray,
                     widx: np.ndarray, n_tokens: np.ndarray,
                     src_start: np.ndarray, tok_h: np.ndarray, *,
                     max_seq: int, max_batch_size: int, pad_value: int,
                     pad_to_longest: bool) -> pa.Table:
    """Shared collation tail: O4 length sort, micro-batching, and the
    one-scatter padded-id fill, given per-window (doc, index, length,
    flat-token start) arrays.  Both the fixed-size and the
    sentence-boundary window builders end here."""
    total = len(n_tokens)

    # O4 length bucketing: stable sort by n_tokens descending, then
    # chop into micro-batches — windows of similar length share a
    # micro-batch so fixed-shape stacking wastes minimal pad slots.
    order = np.argsort(-n_tokens, kind="stable")
    doc_of, widx = doc_of[order], widx[order]
    n_tokens, src_start = n_tokens[order], src_start[order]
    microbatch = np.arange(total, dtype=np.int64) // max_batch_size

    if pad_to_longest:
        # pad each window to the longest in its micro-batch
        n_mb = int(microbatch[-1]) + 1
        mb_longest = np.zeros(n_mb, dtype=np.int64)
        np.maximum.at(mb_longest, microbatch, n_tokens)
        pad_len = mb_longest[microbatch]
    else:
        pad_len = np.full(total, max_seq, dtype=np.int64)

    out_off = np.concatenate(([0], np.cumsum(pad_len)))
    flat = np.full(int(out_off[-1]), pad_value, dtype=np.int64)
    # one vectorized scatter: window w's tokens land at
    # out_off[w] + [0, n_tokens[w])
    seg = (np.arange(int(n_tokens.sum()), dtype=np.int64)
           - np.repeat(np.cumsum(n_tokens) - n_tokens, n_tokens))
    flat[np.repeat(out_off[:-1], n_tokens) + seg] = \
        tok_h[np.repeat(src_start, n_tokens) + seg]

    if pad_to_longest:
        token_ids = pa.LargeListArray.from_arrays(
            pa.array(out_off, type=pa.int64()),
            pa.array(flat, type=pa.int64()))
    else:
        token_ids = pa.FixedSizeListArray.from_arrays(
            pa.array(flat, type=pa.int64()), max_seq)

    return pa.table({
        "doc_id": pa.array(doc_ids[doc_of], type=pa.int64()),
        "window_idx": pa.array(widx, type=pa.int64()),
        "n_tokens": pa.array(n_tokens, type=pa.int64()),
        "n_pad": pa.array(pad_len - n_tokens, type=pa.int64()),
        "microbatch": pa.array(microbatch, type=pa.int64()),
        "token_ids": token_ids,
    })


def collate_windows_batch(b: pa.Table, *, max_seq: int = 64,
                          max_batch_size: int = 16,
                          pad_value: int = PAD_VALUE,
                          pad_to_longest: bool = False) -> pa.Table:
    """Collate one Arrow batch of (doc_id, text) into padded windows.

    Output columns (one row per window):
    - ``doc_id``, ``window_idx``  — window identity (deterministic,
      batch-boundary independent: a doc's windows depend only on its
      own text);
    - ``n_tokens``               — real tokens in the window;
    - ``n_pad``                  — pad slots appended;
    - ``microbatch``             — micro-batch ordinal within this
      Arrow batch after the length sort (batch-LOCAL, like the
      reference's batching — not globally deterministic);
    - ``token_ids``              — padded int64 token-hash row;
      ``fixed_size_list<int64>[max_seq]`` when ``pad_to_longest`` is
      False (global fixed pad, ≙ ``pad(seq_len=max_seq)``), else a
      variable list padded to the longest window in the micro-batch
      (≙ ``pad(seq_len=-1)`` per collate group).
    """
    from ..functions.tokenize import tokenize_hash_arrow

    if b.num_rows == 0 or "text" not in b.schema.names:
        return _empty_windows(max_seq, pad_to_longest)

    tok_h, starts, _ = tokenize_hash_arrow(b["text"])
    tok_h = tok_h.view(np.int64)  # reinterpret, no copy
    doc_ids = np.asarray(b["doc_id"].to_pylist(), dtype=np.int64)

    lens = np.diff(starts)
    n_win = -(-lens // max_seq)  # ceil; empty docs → 0 windows
    total = int(n_win.sum())
    if total == 0:
        return _empty_windows(max_seq, pad_to_longest)

    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), n_win)
    widx = (np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(n_win) - n_win, n_win))
    n_tokens = np.minimum(max_seq, lens[doc_of] - widx * max_seq)
    src_start = starts[:-1][doc_of] + widx * max_seq

    return _collate_windows(doc_ids, doc_of, widx, n_tokens, src_start,
                            tok_h, max_seq=max_seq,
                            max_batch_size=max_batch_size,
                            pad_value=pad_value,
                            pad_to_longest=pad_to_longest)


def greedy_sentence_pack(counts, max_seq: int) -> np.ndarray:
    """The reference's ``Doc._to_batch_elements_e2e`` greedy fold
    (doc_types.py:275-369) over ONE doc's per-sentence token counts →
    int64 array of window sizes, in order.

    Semantics, matching the reference branch by branch:
    - a sentence that would overflow the open window closes it first;
    - a sentence that fits (≤ max_seq) always lands whole in one window;
    - a sentence alone longer than max_seq is split into ``max_seq``
      chunks, EACH chunk its own window (including the remainder — the
      reference flushes after every part, so the tail chunk does not
      stay open for the next sentence);
    - zero-token sentences never appear (the reference's
      ``sent_to_tokens`` defaultdict only holds sentences that received
      tokens).

    Windows take contiguous tokens in sentence order, so window starts
    are 1 + the exclusive prefix sum of the returned sizes.  The fold
    is inherently sequential per doc (as in the reference); cross-doc
    parallelism comes from ``map_batches``.
    """
    out: list[int] = []
    cur = 0
    for s in counts:
        s = int(s)
        if s == 0:
            continue
        if cur > 0 and cur + s > max_seq:
            out.append(cur)
            cur = 0
        if cur + s <= max_seq:
            cur += s
        else:  # cur == 0 and s > max_seq: split the long sentence
            full, rem = divmod(s, max_seq)
            out.extend([max_seq] * full)
            if rem:
                out.append(rem)
    if cur:
        out.append(cur)
    return np.asarray(out, dtype=np.int64)


def sentence_windows_batch(b: pa.Table, *, max_seq: int = 64,
                           max_batch_size: int = 16,
                           pad_value: int = PAD_VALUE,
                           pad_to_longest: bool = False) -> pa.Table:
    """M8 e2e variant: collated windows that never split a sentence
    (unless a single sentence alone exceeds ``max_seq``) — ≙
    ``Doc._to_batch_elements_e2e`` (doc_types.py:275-369) fed by the
    engine's rule-based splitter (functions/sentences.py ≙ the
    reference's Punkt model, preprocessor.py:240-247).

    Token→sentence assignment matches the reference exactly
    (doc_types.py:285-295): a token belongs to the current sentence
    until its start offset reaches the sentence's end boundary, and
    the cursor advances AT MOST ONE sentence per token (so a token
    that jumps past several token-free sentences lands on
    ``prev+1``, not its raw searchsorted slot) with tokens past the
    last boundary clamping to the last sentence.  Expressed here as
    one ``searchsorted`` plus a cumulative-minimum recurrence
    ``assign[i] = min(raw[i], assign[i-1]+1)`` (vectorized as
    ``arange + minimum(1, cummin(raw - arange))``) instead of the
    reference's per-token advance loop.

    Cost shape: the sentence splitter and offset tokenizer are python
    regex passes per doc (exactly the reference's per-doc cost); the
    packing fold is per-doc sequential over SENTENCE counts (≪ token
    count), and the padded-id scatter is the same single vectorized
    assignment as ``collate_windows_batch``.
    """
    from ..functions.sentences import split_sentences
    from ..functions.tokenize import _fnv_hash_strview, tokenize_with_offsets

    if b.num_rows == 0 or "text" not in b.schema.names:
        return _empty_windows(max_seq, pad_to_longest)

    texts = b["text"].to_pylist()
    doc_ids = np.asarray(b["doc_id"].to_pylist(), dtype=np.int64)

    flat_tokens: list[str] = []
    win_sizes: list[np.ndarray] = []  # per-doc window size arrays
    for text in texts:
        toks = tokenize_with_offsets(text)
        if not toks:
            win_sizes.append(np.empty(0, dtype=np.int64))
            continue
        flat_tokens.extend(t for t, _, _ in toks)
        ends = np.asarray([e for _, e in split_sentences(text)] or [len(text)],
                          dtype=np.int64)
        # token offsets live in text.lower() space; sentence boundaries
        # in original space.  For the rare chars whose lowercase has a
        # different LENGTH (e.g. 'İ' -> 'i̇'), translate the boundaries
        # into lowered space so searchsorted compares like with like.
        if len(text.lower()) != len(text):
            per_char = np.fromiter((len(c.lower()) for c in text),
                                   dtype=np.int64, count=len(text))
            cmap = np.concatenate(([0], np.cumsum(per_char)))
            ends = cmap[ends]
        tstarts = np.asarray([s for _, s, _ in toks], dtype=np.int64)
        raw = np.minimum(np.searchsorted(ends, tstarts, side="right"),
                         len(ends) - 1)
        # reference advances the sentence cursor at most ONE step per
        # token (doc_types.py:287-294): assign[i] = min(raw[i],
        # assign[i-1]+1), assign[-1] ≡ 0 — a cummin over raw - arange
        ar = np.arange(len(raw), dtype=np.int64)
        assign = ar + np.minimum(np.int64(1),
                                 np.minimum.accumulate(raw - ar))
        counts = np.bincount(assign, minlength=len(ends))
        win_sizes.append(greedy_sentence_pack(counts, max_seq))

    n_win = np.asarray([len(w) for w in win_sizes], dtype=np.int64)
    total = int(n_win.sum())
    if total == 0:
        return _empty_windows(max_seq, pad_to_longest)

    n_tokens = np.concatenate([w for w in win_sizes if len(w)])
    doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), n_win)
    widx = (np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(n_win) - n_win, n_win))
    # flat-token start of each window: per-doc exclusive prefix sum of
    # window sizes, offset by the doc's position in the flat stream
    doc_tok_start = np.concatenate(
        ([0], np.cumsum([int(w.sum()) for w in win_sizes])))[:-1]
    win_off = np.cumsum(n_win) - n_win  # each doc's first window slot
    cum = np.cumsum(n_tokens) - n_tokens
    seg_base = np.repeat(cum[win_off[n_win > 0]], n_win[n_win > 0])
    src_start = doc_tok_start[doc_of] + (cum - seg_base)

    tok_h = _fnv_hash_strview(pa.array(flat_tokens, type=pa.string())
                              ).view(np.int64)

    return _collate_windows(doc_ids, doc_of, widx, n_tokens, src_start,
                            tok_h, max_seq=max_seq,
                            max_batch_size=max_batch_size,
                            pad_value=pad_value,
                            pad_to_longest=pad_to_longest)


def collate_windows_sentences(ds, *, max_seq: int = 64,
                              max_batch_size: int = 16,
                              pad_value: int = PAD_VALUE,
                              pad_to_longest: bool = False):
    """Dataset(doc_id, text) → sentence-boundary collated windows (see
    ``sentence_windows_batch``)."""

    def fn(b: pa.Table) -> pa.Table:
        return sentence_windows_batch(
            b, max_seq=max_seq, max_batch_size=max_batch_size,
            pad_value=pad_value, pad_to_longest=pad_to_longest)

    return ds.map_batches(fn, batch_format="pyarrow")


def collate_windows(ds, *, max_seq: int = 64, max_batch_size: int = 16,
                    pad_value: int = PAD_VALUE,
                    pad_to_longest: bool = False):
    """Dataset(doc_id, text) → Dataset of padded, micro-batched windows
    (see ``collate_windows_batch``).  Stateless ``map_batches`` — the
    downstream model stage is the stateful actor pool that consumes
    micro-batches (stages/scoring.py shows that pattern)."""

    def fn(b: pa.Table) -> pa.Table:
        return collate_windows_batch(
            b, max_seq=max_seq, max_batch_size=max_batch_size,
            pad_value=pad_value, pad_to_longest=pad_to_longest)

    return ds.map_batches(fn, batch_format="pyarrow")
