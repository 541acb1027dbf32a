"""Exact-substring dedup (Lee et al. 2022 family): rolling-hash
kernel, span semantics, broadcast/join probe parity, and the cut
invariants.  The bit-exact gate vs DuckDB runs through the driver
oracle (exact_substring_spans / exact_substring_dedup)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_rolling_window_hashes_matches_naive():
    from refined_ray.functions.hashing import rolling_window_hashes

    rng = np.random.default_rng(3)
    codes = rng.integers(32, 1 << 20, size=300).astype(np.uint64)
    L, B = 11, 0x9E3779B97F4A7C15

    def naive(i):
        acc = np.uint64(0)
        with np.errstate(over="ignore"):
            for k in range(L):
                acc = acc * np.uint64(B) + codes[i + k]
        return acc

    h = rolling_window_hashes(codes, L, B)
    assert h.size == codes.size - L + 1
    assert all(h[i] == naive(i) for i in range(h.size))
    # equal windows hash equal; input shorter than L yields nothing
    codes2 = codes.copy()
    codes2[100:111] = codes[7:18]
    h2 = rolling_window_hashes(codes2, L, B)
    assert h2[100] == h2[7]
    assert rolling_window_hashes(codes[:5], L, B).size == 0
    # even bases are not invertible mod 2^64 — must refuse
    import pytest

    with pytest.raises(ValueError):
        rolling_window_hashes(codes, L, 42)


def test_merge_spans_islands():
    from refined_ray.pipelines.queries_webtext import (_ESS_L,
                                                       _ess_merge_spans)

    did = np.array([1, 1, 1, 2], dtype=np.int64)
    # windows at 5 and 5+L merge (adjacent); 5+2*L+1 starts a new span
    pos = np.array([5, 5 + _ESS_L, 5 + 2 * _ESS_L + 1, 9], dtype=np.int64)
    out = _ess_merge_spans(did, pos).to_pydict()
    assert out["doc_id"] == [1, 1, 2]
    assert out["span_start"] == [5, 5 + 2 * _ESS_L + 1, 9]
    assert out["span_end"] == [5 + 2 * _ESS_L, 5 + 3 * _ESS_L + 1,
                               9 + _ESS_L]
    assert _ess_merge_spans(np.empty(0, np.int64),
                            np.empty(0, np.int64)).num_rows == 0


def test_windows_np_positions_and_boundaries():
    """Windows never cross doc boundaries; positions are 1-based; a
    shared substring in two docs hashes identically."""
    from refined_ray.pipelines.queries_webtext import (_ESS_L,
                                                       _ess_windows_np)

    shared = "x" * 10 + "shared-segment-" * 3  # > L chars total with pad
    a = ("A" * 30) + shared
    b = shared + ("B" * 25)
    ids = np.array([7, 8], dtype=np.int64)
    did, pos, h1, h2 = _ess_windows_np(ids, [a, b])
    assert did.min() == 7 and did.max() == 8
    assert pos[did == 7].min() == 1
    assert (pos[did == 7].max() == len(a) - _ESS_L + 1)
    # the shared suffix of a == shared prefix of b: window starting at
    # a's len(a)-len(shared)+1 equals b's window at 1
    ia = np.flatnonzero((did == 7) & (pos == len(a) - len(shared) + 1))[0]
    ib = np.flatnonzero((did == 8) & (pos == 1))[0]
    assert h1[ia] == h1[ib] and h2[ia] == h2[ib]
    # doc shorter than L emits no windows
    did2, pos2, _, _ = _ess_windows_np(np.array([1], dtype=np.int64),
                                       ["tiny"])
    assert did2.size == 0


def test_probe_paths_parity(ray_session):
    """Forced join probe == broadcast probe (the counted dispatch's
    two sides), on the real corpus."""
    from refined_ray.pipelines.queries_webtext import q_exact_substring_spans

    b = q_exact_substring_spans(SF, probe="broadcast").to_pandas() \
        .sort_values(["doc_id", "span_start"]).reset_index(drop=True)
    j = q_exact_substring_spans(SF, probe="join").to_pandas() \
        .sort_values(["doc_id", "span_start"]).reset_index(drop=True)
    assert b.equals(j)
    assert len(b) > 0  # the planted footers guarantee duplicated spans


def test_dedup_probe_paths_parity(ray_session):
    """The dedup query's two shapes — in-probe cut (broadcast) vs
    serialize + repartition + left_outer join + cut (join) — emit
    identical corpora."""
    from refined_ray.pipelines.queries_webtext import q_exact_substring_dedup

    b = q_exact_substring_dedup(SF, probe="broadcast").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    j = q_exact_substring_dedup(SF, probe="join").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert b.equals(j)


def test_cut_invariants(ray_session):
    """Every cut doc: removed == sum of its span lengths; text_clean
    contains no duplicated L-window of its own spans (the footers are
    gone); untouched docs pass through byte-identical."""
    from refined_ray.pipelines.queries_webtext import (
        _ESS_F0, q_exact_substring_dedup, q_exact_substring_spans)

    spans = q_exact_substring_spans(SF).to_pandas()
    out = q_exact_substring_dedup(SF).to_pandas().set_index("doc_id")
    per_doc = (spans.assign(n=spans.span_end - spans.span_start)
               .groupby("doc_id").n.sum())
    for did, n in per_doc.items():
        assert out.loc[did, "removed_chars"] == n
    untouched = out[~out.index.isin(per_doc.index)]
    assert (untouched.removed_chars == 0).all()
    # the planted footer never survives a cut
    assert not out.text_clean.str.contains(_ESS_F0[:40], regex=False).any()
