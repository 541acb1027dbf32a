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


def test_differential_vs_naive_python(ray_session, tmp_path):
    """Engine vs a from-first-principles pure-python replay on random
    mini-corpora with forced repeats — catches anything the planted
    fixture corpus can't (window-boundary off-by-ones, same-doc-only
    dup handling, multi-span docs)."""
    import pyarrow.parquet as pq

    from refined_ray.pipelines.queries_webtext import (
        _ESS_F0, _ESS_F1, _ESS_L, q_exact_substring_spans)

    rng = np.random.default_rng(11)
    alpha = list("abcdef ")
    texts = []
    for i in range(40):
        t = "".join(rng.choice(alpha, size=int(rng.integers(10, 160))))
        texts.append(t)
    # force repeats: doc 5 contains doc 3's middle; doc 9 repeats its
    # own prefix twice
    texts[3] = "".join(rng.choice(alpha, size=120))
    texts[5] = texts[5][:20] + texts[3][30:30 + _ESS_L + 7] + texts[5][20:]
    texts[9] = texts[9] + texts[9][:_ESS_L + 3]
    ids = list(range(40))
    d = tmp_path / "mini"
    d.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                             "text": pa.array(texts, type=pa.string())}),
                   str(d / "documents.parquet"))

    # naive replay, including the planted-footer augmentation
    aug = [t + ("" if i % 3 == 2 else (_ESS_F0 if i % 2 == 0 else _ESS_F1))
           for i, t in zip(ids, texts)]
    from collections import Counter

    counts: Counter = Counter()
    for t in aug:
        for p in range(len(t) - _ESS_L + 1):
            counts[t[p:p + _ESS_L]] += 1
    expected = []
    for i, t in zip(ids, aug):
        dup_pos = [p + 1 for p in range(len(t) - _ESS_L + 1)
                   if counts[t[p:p + _ESS_L]] > 1]
        start = prev = None
        for p in dup_pos:
            if start is None:
                start = prev = p
            elif p - prev > _ESS_L:
                expected.append((i, start, prev + _ESS_L))
                start = prev = p
            else:
                prev = p
        if start is not None:
            expected.append((i, start, prev + _ESS_L))

    got = sorted(map(tuple, q_exact_substring_spans(str(d))
                     .to_pandas().itertuples(index=False)))
    assert got == sorted(expected)
    assert any(i == 9 for i, _, _ in expected)  # self-dup case exercised
    assert any(i == 5 for i, _, _ in expected)  # cross-doc case exercised


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
