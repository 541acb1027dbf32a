"""Gates for the BIO decode kernel (functions/bio.py, M10).

The naive loop below re-implements the documented semantics of the
reference's bio_to_offset_pairs (md_dataset_utils.py:136-190)
independently; the vectorized kernel must match it on golden branch
cases and on random tag streams with random doc boundaries.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from refined_ray.functions.bio import TAG_B, TAG_I, TAG_O, bio_decode, bio_decode_flat

O, B, I = TAG_O, TAG_B, TAG_I


def naive(tags):
    out, in_ent, start = set(), False, None
    for idx, t in enumerate(tags):
        if not in_ent:
            if t != O:        # B starts; bare I is a malformed start
                start, in_ent = idx, True
        else:
            if t == O:
                out.add((start, idx))
                in_ent = False
            elif t == B:
                out.add((start, idx))
                start = idx
    if in_ent:
        out.add((start, len(tags)))
    return out


def test_golden_branches():
    # B-I run, malformed I start, B-B split, close-at-end
    assert bio_decode([O, B, I, O, I, I, B, B]) == \
        {(1, 3), (4, 6), (6, 7), (7, 8)}
    assert bio_decode([]) == set()
    assert bio_decode([O, O]) == set()
    assert bio_decode([I]) == {(0, 1)}          # malformed start at doc start
    assert bio_decode([B, I, I]) == {(0, 3)}    # still open at end


@settings(max_examples=200, deadline=None)
@given(st.lists(st.lists(st.sampled_from([O, B, I]), max_size=12), max_size=6))
def test_flat_decode_matches_naive_per_doc(docs):
    flat = np.array([t for d in docs for t in d], dtype=np.int8)
    starts = np.cumsum([0] + [len(d) for d in docs]).astype(np.int64)
    di, s, e = bio_decode_flat(flat, starts)
    got = {}
    for d, a, b in zip(di.tolist(), s.tolist(), e.tolist()):
        got.setdefault(d, set()).add((a, b))
    for i, d in enumerate(docs):
        assert got.get(i, set()) == naive(d), (i, d)


def test_spans_never_cross_doc_boundary(ray_session):
    from refined_ray.pipelines.queries_ext import q_bio_spans

    rows = q_bio_spans("/root/testdata/sf0.001").take_all()
    assert len(rows) > 0
    assert all(0 <= r["start_tok"] < r["end_tok"] for r in rows)
