"""Regression tests for the round-1 ADVICE findings:

1. simhash batch-boundary determinism with empty docs (medium)
2. disk-exchange writer retry idempotence via deterministic file names
3. disk-exchange all-empty input keeps the full input schema
4. docs_without_neardup on a corpus with no near-dup pairs
5. broadcast/join scorer head-truncation equivalence for non-ASCII
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def test_simhash_independent_of_trailing_empty_docs():
    from refined_ray.functions.simhash import simhash_batch

    solo = simhash_batch(["a b c"])
    with_trailing_empty = simhash_batch(["a b c", ""])
    with_inner_empty = simhash_batch(["a b c", "", "x y"])
    assert solo[0] == with_trailing_empty[0]
    assert solo[0] == with_inner_empty[0]
    assert with_inner_empty[2] == simhash_batch(["x y"])[0]
    # empty docs hash to the all-zero fingerprint, deterministically
    assert with_trailing_empty[1] == np.uint64(0)


def test_simhash_batch_split_invariance():
    from refined_ray.functions.simhash import simhash_batch

    texts = ["alpha beta gamma", "", "delta", "epsilon zeta eta theta", ""]
    whole = simhash_batch(texts)
    parts = np.concatenate([simhash_batch(texts[:2]), simhash_batch(texts[2:])])
    assert (whole == parts).all()


def test_exchange_file_ids_retry_idempotent_and_collision_free():
    """Round-2 ADVICE: names are deterministic given (task id, call index,
    content) — a retried task replaces its files — but two byte-identical
    blocks (different task or call slot) can never collide on one name."""
    from refined_ray.stages.exchange import block_file_id

    tbl = pa.table({"k": pa.array([1, 2, 3], type=pa.int64())})
    # retry: same task, same replay order, same content -> same name
    assert block_file_id(tbl, "task-a", 0) == block_file_id(tbl, "task-a", 0)
    # byte-identical blocks in different tasks or call slots -> distinct
    assert block_file_id(tbl, "task-a", 0) != block_file_id(tbl, "task-b", 0)
    assert block_file_id(tbl, "task-a", 0) != block_file_id(tbl, "task-a", 1)
    # different content -> distinct
    tbl2 = pa.table({"k": pa.array([1, 2, 4], type=pa.int64())})
    assert block_file_id(tbl, "task-a", 0) != block_file_id(tbl2, "task-a", 0)


def test_exchange_duplicate_blocks_keep_all_rows(ray_session, tmp_path):
    """Two byte-identical input blocks must BOTH survive the exchange
    (round-2 ADVICE: pure content-hash names silently dropped one)."""
    import ray.data as rd

    from refined_ray.stages.exchange import exchange_map_partitions

    tbl = pa.table({"k": pa.array(np.arange(50) % 7, type=pa.int64()),
                    "v": pa.array(np.arange(50) % 5, type=pa.int64())})
    # union of two identical single-block datasets -> 2 identical blocks
    ds = rd.from_arrow(tbl).union(rd.from_arrow(tbl))

    def ident(t: pa.Table) -> pa.Table:
        return t

    out, clean = exchange_map_partitions(ds, ["k"], ident, 4,
                                         exchange_root=str(tmp_path))
    assert out.count() == 100
    clean()


def test_exchange_all_empty_input_preserves_schema(ray_session):
    import ray.data as rd

    from refined_ray.stages.exchange import exchange_map_partitions

    empty = pa.table({"k": pa.array([], type=pa.int64()),
                      "payload": pa.array([], type=pa.string())})

    def needs_payload(t: pa.Table) -> pa.Table:
        # accesses a NON-key column — round 1 synthesized key-only
        # schemas for all-empty inputs and this raised KeyError
        return t.select(["k", "payload"])

    ds = rd.from_arrow(empty)
    out, clean = exchange_map_partitions(ds, ["k"], needs_payload, 2)
    res = out.take_all()
    clean()
    assert res == []


def test_docs_without_neardup_no_dups(ray_session, tmp_path, monkeypatch):
    """Anti-join must not crash when the pair table is empty."""
    import pyarrow.parquet as pq

    from refined_ray.pipelines.queries_ext import q_docs_without_neardup

    # corpus of 4 completely distinct docs -> zero near-dup pairs
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon",
                          "one two three four five",
                          "red green blue yellow purple",
                          "cat dog bird fish mouse"], type=pa.string()),
        "lang": pa.array(["en"] * 4), "source": pa.array(["s"] * 4),
        "n_chars": pa.array([30] * 4, type=pa.int64()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q_docs_without_neardup(str(tmp_path))
    ids = sorted(r["doc_id"] for r in out.take_all())
    assert ids == [0, 1, 2, 3]


def test_scorer_head_truncation_broadcast_equals_join_path():
    """Non-ASCII heads must score identically on both attachment paths:
    chars-then-encode (S64) round-trips exactly."""
    heads = ["über straße " + "é" * 20, "плохой час " + "ж" * 10, "ascii head only"]
    s64 = np.array([h[:16].encode("utf-8") for h in heads], dtype="S64")
    decoded = [s.decode("utf-8", "ignore") for s in s64]
    assert decoded == [h[:16] for h in heads]


def test_simhash_candidates_broadcast_join_parity(ray_session, monkeypatch):
    """Both fingerprint-attachment paths (counted-budget broadcast vs
    two hash joins) must produce identical candidate sets."""
    import refined_ray.pipelines.queries_ext as qx

    sf = "/root/testdata/sf0.001"
    bcast = {(r["doc_a"], r["doc_b"], r["hamming"])
             for r in qx.q_simhash_candidates(sf).take_all()}
    monkeypatch.setattr(qx, "SIMHASH_BROADCAST_MAX_BYTES", 0)
    joined = {(r["doc_a"], r["doc_b"], r["hamming"])
              for r in qx.q_simhash_candidates(sf).take_all()}
    assert bcast == joined and len(bcast) > 0


# ---- round-2 ADVICE regressions ----

def test_sign_pages_emit_sets_degenerate_batches():
    """The set-dedup keep mask raised IndexError when the flat shingle
    stream was EMPTY (round-2 ADVICE medium): np.r_[True, ...] has
    length 1 while d_s/v_s are length 0.  That happens on a zero-row
    batch; tiny docs (<3 tokens) still get one sentinel shingle each."""
    from refined_ray.stages.signing import sign_pages_batch

    # zero-row batch -> empty shingle stream (the crash case)
    empty = pa.table({"url": pa.array([], type=pa.string()),
                      "extracted_text": pa.array([], type=pa.string())})
    out0 = sign_pages_batch(empty, text_col="extracted_text", emit_sets=True)
    assert out0.num_rows == 0 and "set" in out0.column_names

    # all-tiny batch: every doc keeps its single sentinel shingle
    batch = pa.table({"url": pa.array(["u1", "u2"]),
                      "extracted_text": pa.array(["one two", "x"])})
    out = sign_pages_batch(batch, text_col="extracted_text", emit_sets=True)
    assert out.num_rows == 2
    assert all(len(s) == 8 for s in out["set"].to_pylist())  # 1 shingle = 8 B


def test_asof_join_keeps_nullable_payload(ray_session):
    """drop_null was table-wide: a null in a PAYLOAD column silently
    dropped the row even though key/ts were valid (round-2 ADVICE)."""
    import ray.data as rd

    left = pa.table({
        "k": pa.array([1, 1], type=pa.int64()),
        "lt": pa.array([np.datetime64("2020-01-01T00:00:10", "us"),
                        np.datetime64("2020-01-01T00:00:20", "us")]),
        "lpay": pa.array(["x", None], type=pa.string()),  # null payload
    })
    right = pa.table({
        "k": pa.array([1], type=pa.int64()),
        "rt": pa.array([np.datetime64("2020-01-01T00:00:00", "us")]),
        "tb": pa.array([0], type=pa.int64()),
        "rpay": pa.array([None], type=pa.string()),  # null payload
    })
    from refined_ray.stages.asof import asof_join

    out = asof_join(rd.from_arrow(left), rd.from_arrow(right), key="k",
                    left_ts="lt", right_ts="rt",
                    left_cols=["k", "lt", "lpay"],
                    right_cols=["rt", "tb", "rpay"],
                    right_tiebreak="tb", num_partitions=2)
    rows = sorted(out.take_all(), key=lambda r: r["lt"])
    assert len(rows) == 2  # both left rows match despite null payloads
    assert rows[1]["lpay"] is None and rows[0]["rpay"] is None


def test_interval_join_keeps_nullable_payload(ray_session):
    import ray.data as rd

    from refined_ray.stages.rangejoin import interval_join

    left = pa.table({"k": pa.array([1], type=pa.int64()),
                     "t": pa.array([500], type=pa.int64()),
                     "lpay": pa.array([None], type=pa.string())})
    right = pa.table({"k": pa.array([1], type=pa.int64()),
                      "s": pa.array([0], type=pa.int64()),
                      "e": pa.array([1000], type=pa.int64()),
                      "rpay": pa.array([None], type=pa.string())})
    out = interval_join(rd.from_arrow(left), rd.from_arrow(right), key="k",
                        left_ts="t", r_start="s", r_end="e",
                        bucket_us=1000, num_partitions=2)
    rows = out.take_all()
    assert len(rows) == 1 and rows[0]["lpay"] is None


def test_zip_with_index_int_key(ray_session):
    """zip_with_index pinned pa.string() in its empty/meta paths; an
    int64-keyed dataset must work (round-2 ADVICE)."""
    import ray.data as rd

    from refined_ray.stages.index import zip_with_index

    tbl = pa.table({"k": pa.array([30, 10, 20, 10, 30], type=pa.int64())})
    out = zip_with_index(rd.from_arrow(tbl), "k")
    rows = sorted((r["k"], r["idx"]) for r in out.take_all())
    assert rows == [(10, 0), (20, 1), (30, 2)]


def test_ann_ivf_respects_k(ray_session):
    """per-batch partial top-k was hardcoded [:5] (round-2 ADVICE):
    k > 5 must return up to k neighbors per query."""
    from refined_ray.pipelines.queries_ext import q_ann_ivf

    out = q_ann_ivf("/root/testdata/sf0.001", k=8, max_qid=3,
                    n_cells=4, n_probe=4)
    import collections

    per_q = collections.Counter(r["query_id"] for r in out.take_all())
    assert per_q and max(per_q.values()) == 8


# ------------------------------------------------------------------
# Round-4 ADVICE regressions
# ------------------------------------------------------------------


def test_wet_missing_content_length_fails_loudly():
    """ADVICE r4 #1: a record without Content-Length must raise, not
    default to a 0-byte payload and misparse the real payload as the
    next record."""
    import io

    from refined_ray.sources.wet import iter_wet_records

    raw = (b"WARC/1.0\r\nWARC-Type: conversion\r\n"
           b"WARC-Target-URI: http://x\r\n\r\n"
           b"WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 2\r\n\r\n"
           b"hi\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        list(iter_wet_records(io.BufferedReader(io.BytesIO(raw))))


def test_wet_writer_rejects_crlf_header_injection(tmp_path):
    """ADVICE r4 #4: CR/LF in url/date values breaks WARC framing;
    the writer must refuse rather than emit a shard the reader
    rejects or misparses."""
    from refined_ray.sources.wet import write_wet_shard

    bad = [{"url": "http://x/\r\nWARC-Type: conversion", "text": "t"}]
    with pytest.raises(ValueError, match="CR/LF"):
        write_wet_shard(bad, str(tmp_path / "s.warc.wet.gz"))
    bad2 = [{"url": "http://x", "date": "2024\n-01-01", "text": "t"}]
    with pytest.raises(ValueError, match="CR/LF"):
        write_wet_shard(bad2, str(tmp_path / "s2.warc.wet.gz"))


def test_dsir_bucket_counts_null_lang(ray_session, tmp_path):
    """ADVICE r4 #2: null lang values must count as non-target (SQL
    FILTER semantics), not crash the int64 conversion."""
    import os

    import pyarrow.parquet as pq

    from refined_ray.pipelines.queries_webtext import q_dsir_select

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["alpha beta", "alpha gamma", "beta delta"]),
        "lang": pa.array(["en", None, "de"]),
    }), os.path.join(sf, "documents.parquet"))
    out = q_dsir_select(sf).to_pandas()
    assert len(out) > 0  # no TypeError; null lang treated as non-target


def test_wet_records_restages_on_layout_change(ray_session):
    """ADVICE r4 #5: a q_wet_records call with a different
    docs_per_shard must restage the fixture, not silently reuse the
    stale shard layout."""
    import os

    from refined_ray.pipelines.queries_readers import _fixture_dir, q_wet_records

    sf = "/root/testdata/sf0.001"
    n1 = q_wet_records(sf, docs_per_shard=200).count()
    d = os.path.join(_fixture_dir(sf), "wetdump")
    shards_200 = sorted(f for f in os.listdir(d) if f.endswith(".gz"))
    n2 = q_wet_records(sf, docs_per_shard=50).count()
    shards_50 = sorted(f for f in os.listdir(d) if f.endswith(".gz"))
    assert n1 == n2  # same records either way
    assert len(shards_50) > len(shards_200)  # actually restaged
    # restore the default layout for other tests/queries
    q_wet_records(sf, docs_per_shard=200)
