"""Exact distributed quantiles: oracle parity at sf0.001."""

from __future__ import annotations

import duckdb

from conftest import SF_SMALL
from refined_ray.pipelines import queries_ext


def test_token_quantiles_matches_oracle(ray_session):
    mine = queries_ext.q_token_quantiles(SF_SMALL).to_pandas() \
        .sort_values("q").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_SMALL}/documents.parquet'")
    theirs = con.execute(queries_ext.SQL_TOKEN_QUANTILES).fetchdf() \
        .sort_values("q").reset_index(drop=True)
    assert len(mine) == 5
    assert (mine.q.values == theirs.q.values).all()
    assert (mine.n_tokens.values == theirs.n_tokens.values).all()
    # quantile values are non-decreasing in q (order-statistics sanity)
    assert (mine.n_tokens.diff().dropna() >= 0).all()
