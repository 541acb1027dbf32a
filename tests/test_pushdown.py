"""Prune-at-the-read: predicate pushed into the parquet scan."""

from __future__ import annotations

import duckdb

from conftest import SF_SMALL
from refined_ray.pipelines import queries_ext


def test_clicks_daily_matches_oracle_with_scan_filter(ray_session):
    mine = queries_ext.q_clicks_daily(SF_SMALL).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_SMALL}/events.parquet'")
    theirs = con.execute(queries_ext.SQL_CLICKS_DAILY).fetchdf() \
        .sort_values("day").reset_index(drop=True)
    assert len(mine) == len(theirs) > 0
    assert (mine.day.astype(str).values == theirs.day.astype(str).values).all()
    assert (mine.n_clicks.values == theirs.n_clicks.values).all()
