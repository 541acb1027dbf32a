"""Gates for the round-2 operator additions that have no SQL oracle
(corpus shuffle) plus smoke checks for the per-doc span/date queries."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_corpus_shuffle_is_deterministic_permutation(ray_session):
    from refined_ray.pipelines.queries_ext import q_corpus_shuffle

    out1 = q_corpus_shuffle(SF).to_pandas().sort_values("block_pos")
    out2 = q_corpus_shuffle(SF).to_pandas().sort_values("block_pos")
    orig = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).to_pandas()
    # permutation of the corpus
    assert sorted(out1.doc_id) == sorted(orig.doc_id)
    # fixed seed → identical order across runs
    assert (out1.doc_id.to_numpy() == out2.doc_id.to_numpy()).all()
    # actually shuffled (astronomically unlikely to be identity)
    assert (out1.doc_id.to_numpy() != np.sort(out1.doc_id.to_numpy())).any()


def test_span_merge_matches_duckdb(ray_session):
    import duckdb

    from refined_ray.pipelines.queries_ext import EXT_ORACLES, q_span_merge

    mine = q_span_merge(SF).to_pandas().sort_values(
        ["doc_id", "start_ord"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    theirs = con.execute(EXT_ORACLES["span_merge"]).fetchdf().sort_values(
        ["doc_id", "start_ord"]).reset_index(drop=True)
    assert len(mine) == len(theirs)
    assert (mine.doc_id.values == theirs.doc_id.values).all()
    assert (mine.start_ord.values == theirs.start_ord.values).all()
    assert (mine.ln.values == theirs.ln.values).all()


def test_date_doc_infer_matches_duckdb(ray_session):
    import duckdb

    from refined_ray.pipelines.queries_ext import EXT_ORACLES, q_date_doc_infer

    mine = q_date_doc_infer(SF).to_pandas().sort_values(
        ["o_custkey", "o_orderkey"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    theirs = con.execute(EXT_ORACLES["date_doc_infer"]).fetchdf().sort_values(
        ["o_custkey", "o_orderkey"]).reset_index(drop=True)
    assert len(mine) == len(theirs)
    for c in ["day", "month", "year"]:
        assert (mine[c].values == theirs[c].values).all(), c


def test_window_sentences_matches_duckdb(ray_session):
    import duckdb

    from refined_ray.pipelines.queries_ext import (
        _sql_window_sentences, q_window_sentences)

    mine = q_window_sentences(SF).to_pandas().sort_values(
        ["doc_id", "window_idx"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    theirs = con.execute(_sql_window_sentences()).fetchdf().sort_values(
        ["doc_id", "window_idx"]).reset_index(drop=True)
    assert len(mine) == len(theirs) > 0
    for c in ["doc_id", "window_idx", "start_tok", "n_tokens"]:
        assert (mine[c].astype("int64").values
                == theirs[c].astype("int64").values).all(), c


def test_corpus_split_and_decontaminate_match_duckdb(ray_session):
    import duckdb

    from refined_ray.pipelines.queries_ext import (
        EXT_ORACLES, q_corpus_split, q_decontaminate)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")

    mine = q_corpus_split(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    theirs = con.execute(EXT_ORACLES["corpus_split"]).fetchdf().sort_values(
        "doc_id").reset_index(drop=True)
    assert (mine.bucket.values == theirs.bucket.values).all()
    assert (mine.split.values == theirs.split.values).all()
    # all three splits non-empty at 500 docs, roughly 80/10/10
    frac = mine.split.value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9 and frac["test"] > 0.03

    mine_d = q_decontaminate(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    theirs_d = con.execute(EXT_ORACLES["decontaminate"]).fetchdf().sort_values(
        "doc_id").reset_index(drop=True)
    assert len(mine_d) == len(theirs_d) > 0
    assert (mine_d.doc_id.values == theirs_d.doc_id.values).all()
    assert (mine_d.n_contaminated.astype("int64").values
            == theirs_d.n_contaminated.astype("int64").values).all()


def test_doc_repetition_hand_case_and_oracle(ray_session):
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from refined_ray.pipelines.queries_ext import EXT_ORACLES, q_doc_repetition

    # hand case via the same batch function, isolated from parquet
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "aa bb cc\naa bb cc\nxx",   # dup line: 8 of 18 chars; 1 of 5 3-grams duplicated
            "one two three four",        # no repetition
            "",                          # degenerate
        ], type=pa.string()),
    }))
    # route through the public query machinery by monkey-free call:
    import refined_ray.pipelines.queries as q
    orig = q._read
    try:
        q._read = lambda sf, t, cols=None: ds
        out = {r["doc_id"]: r for r in q_doc_repetition("unused").take_all()}
    finally:
        q._read = orig
    # dup line "aa bb cc" repeats once: 8 of 18 line chars
    assert abs(out[1]["dup_line_frac"] - 8 / 18) < 1e-6
    assert abs(out[1]["dup_ngram_frac"] - 1 / 5) < 1e-6
    assert out[2]["dup_line_frac"] == 0.0 and out[2]["dup_ngram_frac"] == 0.0
    assert out[3]["dup_line_frac"] == 0.0 and out[3]["dup_ngram_frac"] == 0.0

    # oracle parity on the real table
    mine = q_doc_repetition(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    theirs = con.execute(EXT_ORACLES["doc_repetition"]).fetchdf().sort_values(
        "doc_id").reset_index(drop=True)
    for c in ["dup_line_frac", "dup_ngram_frac"]:
        assert (mine[c].values == theirs[c].values).all(), c


def test_presum_groupby_matches_direct(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from refined_ray.pipelines.queries import _presum_groupby

    t = pa.table({
        "k": pa.array(["a", "b", "a", "c", "b", "a", "c"],
                      type=pa.string()),
        "v": pa.array([1.5, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0], type=pa.float64()),
        "w": pa.array([1, 2, 3, 4, 5, 6, 7], type=pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(3)  # force multiple partial blocks
    got = {r["k"]: r for r in _presum_groupby(
        ds, ["k"], sums=[("v", "sv"), ("w", "sw")], count="n",
        num_partitions=2).take_all()}
    direct = {r["k"]: r for r in rd.from_arrow(t).groupby("k").aggregate(
        Sum("v", alias_name="sv"), Sum("w", alias_name="sw"),
        Count(alias_name="n")).take_all()}
    assert set(got) == set(direct) == {"a", "b", "c"}
    for k in got:
        assert got[k]["sv"] == direct[k]["sv"]
        assert got[k]["sw"] == direct[k]["sw"]
        assert got[k]["n"] == direct[k]["n"]
