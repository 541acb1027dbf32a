"""Exact distributed quantiles: oracle parity at sf0.001."""

from __future__ import annotations

import duckdb

from conftest import SF_SMALL
from refined_ray.pipelines import queries_ext


def test_value_quantiles_by_type_matches_oracle(ray_session):
    mine = queries_ext.q_value_quantiles_by_type(SF_SMALL).to_pandas() \
        .sort_values(["event_type", "q"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_SMALL}/events.parquet'")
    theirs = con.execute(queries_ext.SQL_VALUE_QUANTILES_BY_TYPE).fetchdf() \
        .sort_values(["event_type", "q"]).reset_index(drop=True)
    assert len(mine) == len(theirs) > 0
    for c in mine.columns:
        assert (mine[c].values == theirs[c].values).all(), c
    # per group, quantile values are non-decreasing in q
    for _, grp in mine.groupby("event_type"):
        assert (grp.sort_values("q").value_q.diff().dropna() >= 0).all()


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


def test_ccnet_buckets_terciles(ray_session):
    """Bucket sizes are exact terciles (rank-based, deterministic
    ties) and the head holds the LOWEST lm scores."""
    from refined_ray.pipelines.queries_ext import q_ccnet_buckets

    out = q_ccnet_buckets("/root/testdata/sf0.001").to_pandas()
    n = len(out)
    sizes = out["bucket"].value_counts()
    assert abs(sizes["head"] - n / 3) <= 1
    assert abs(sizes["tail"] - n / 3) <= 1
    assert sizes.sum() == n
    assert out[out.bucket == "head"].lm_score.max() <= \
        out[out.bucket == "middle"].lm_score.min() + 1e-12
    assert out[out.bucket == "middle"].lm_score.max() <= \
        out[out.bucket == "tail"].lm_score.min() + 1e-12
