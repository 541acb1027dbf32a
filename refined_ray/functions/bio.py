"""BIO tag-sequence decoding → token-index spans (M10).

Re-expresses the reference's ``bio_to_offset_pairs``
(``/root/reference/src/refined/utilities/md_dataset_utils.py:136-190``)
as a flat segment-vectorized kernel: the whole batch's tag stream is
decoded in a handful of numpy passes instead of a per-token Python
loop per document.

Semantics (identical to the reference, ``use_labels`` mode):
- ``O`` outside an entity: nothing; inside: closes the open span.
- ``B`` always starts a span (closing any open one — B-B and I-B
  boundaries split).
- ``I`` continues an open span; an ``I`` with no open span (doc start
  or preceded by ``O``) is a malformed start and OPENS one, exactly as
  the reference's "malformed by start ent" branch does.
- a span still open at the document's last token is closed there.

Spans are half-open token-index pairs ``[start, end)`` local to the
document.
"""

from __future__ import annotations

import numpy as np

TAG_O, TAG_B, TAG_I = 0, 1, 2


def bio_decode_flat(tags: np.ndarray, starts: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a flat batch tag stream into spans.

    ``tags``: int8/int64 array over all docs' tokens, values in
    {TAG_O, TAG_B, TAG_I}.  ``starts``: len(docs)+1 offsets — doc i's
    tags are ``tags[starts[i]:starts[i+1]]`` (tokenize_batch layout).

    Returns ``(doc_idx, span_start, span_end)`` with token indices
    LOCAL to each doc and ``end`` exclusive.
    """
    tags = np.asarray(tags, dtype=np.int8)
    n = len(tags)
    if n == 0:
        z = np.array([], dtype=np.int64)
        return z, z, z

    doc_start = np.zeros(n, dtype=bool)
    firsts = np.asarray(starts[:-1], dtype=np.int64)
    doc_start[firsts[firsts < n]] = True  # empty docs contribute no flag

    prev_is_o = np.empty(n, dtype=bool)
    prev_is_o[0] = True
    prev_is_o[1:] = tags[:-1] == TAG_O
    boundary_before = doc_start | prev_is_o

    is_start = (tags == TAG_B) | ((tags == TAG_I) & boundary_before)
    span_starts = np.flatnonzero(is_start)
    if len(span_starts) == 0:
        z = np.array([], dtype=np.int64)
        return z, z, z

    # a span running at position j ends before j when tags[j] != I or a
    # new document begins at j; sentinel n closes spans at batch end
    break_pos = np.flatnonzero((tags != TAG_I) | doc_start)
    break_pos = np.append(break_pos, n)
    span_ends = break_pos[np.searchsorted(break_pos, span_starts, side="right")]

    # O spans never open: is_start is False on O tags by construction,
    # but a B span of length >= 1 always includes its own position even
    # when break_pos contains it (side="right" skips self)
    doc_idx = np.searchsorted(starts, span_starts, side="right") - 1
    offs = starts[doc_idx]
    return doc_idx.astype(np.int64), (span_starts - offs).astype(np.int64), \
        (span_ends - offs).astype(np.int64)


def bio_decode(tag_seq) -> set[tuple[int, int]]:
    """Single-sequence convenience wrapper (reference call shape)."""
    t = np.asarray(tag_seq, dtype=np.int8)
    _, s, e = bio_decode_flat(t, np.array([0, len(t)], dtype=np.int64))
    return set(zip(s.tolist(), e.tolist()))
