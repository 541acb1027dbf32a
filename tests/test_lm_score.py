"""Unigram-LM quality score: DuckDB oracle parity and broadcast/join
attachment-path equivalence (the join path is the 100-TB fallback)."""

from __future__ import annotations

import duckdb

from conftest import SF_SMALL
from refined_ray.pipelines import queries_ext


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_doc_lm_score_matches_oracle(ray_session):
    mine = _canon(queries_ext.q_doc_lm_score(SF_SMALL).to_pandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_SMALL}/documents.parquet'")
    theirs = _canon(con.execute(queries_ext.SQL_DOC_LM_SCORE).fetchdf())
    assert len(mine) == len(theirs) > 0
    for c in mine.columns:
        assert (mine[c].values == theirs[c].values).all(), c


def test_doc_lm_score_join_path_parity(ray_session, monkeypatch):
    bcast = _canon(queries_ext.q_doc_lm_score(SF_SMALL).to_pandas())
    monkeypatch.setattr(queries_ext, "VOCAB_BROADCAST_MAX_BYTES", 0)
    joined = _canon(queries_ext.q_doc_lm_score(SF_SMALL).to_pandas())
    assert bcast.equals(joined)


def test_doc_tfidf_topk_matches_oracle(ray_session):
    mine = _canon(queries_ext.q_doc_tfidf_topk(SF_SMALL).to_pandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_SMALL}/documents.parquet'")
    theirs = _canon(con.execute(queries_ext.SQL_DOC_TFIDF_TOPK).fetchdf())
    assert len(mine) == len(theirs) > 0
    for c in mine.columns:
        assert (mine[c].values == theirs[c].values).all(), c


def test_doc_tfidf_topk_join_path_parity(ray_session, monkeypatch):
    bcast = _canon(queries_ext.q_doc_tfidf_topk(SF_SMALL).to_pandas())
    monkeypatch.setattr(queries_ext, "VOCAB_BROADCAST_MAX_BYTES", 0)
    joined = _canon(queries_ext.q_doc_tfidf_topk(SF_SMALL).to_pandas())
    assert bcast.equals(joined)
