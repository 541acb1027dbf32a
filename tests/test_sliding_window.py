"""Sliding-window aggregate: RANGE-window oracle parity, including a
seeded random instance dense with same-user timestamp ties (the case
where ROWS and RANGE semantics diverge)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from conftest import SF_SMALL
from refined_ray.pipelines import queries_ext


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_events_sliding_count_matches_oracle(ray_session):
    mine = _canon(queries_ext.q_events_sliding_count(SF_SMALL).to_pandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_SMALL}/events.parquet'")
    theirs = _canon(con.execute(queries_ext.SQL_EVENTS_SLIDING_COUNT).fetchdf())
    assert len(mine) == len(theirs) > 0
    for c in mine.columns:
        assert (mine[c].astype(str).values == theirs[c].astype(str).values).all(), c


def test_events_sliding_count_with_ties(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    n = 600
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 4, n).astype(np.int64),
        # coarse grid => many exact same-user timestamp ties
        "ts": pd.to_datetime(rng.integers(0, 30, n) * 600, unit="s"),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    df.to_parquet(sf / "events.parquet", index=False)
    mine = _canon(queries_ext.q_events_sliding_count(str(sf)).to_pandas())
    con = duckdb.connect()
    con.register("events", df)
    theirs = _canon(con.execute(queries_ext.SQL_EVENTS_SLIDING_COUNT).fetchdf())
    assert len(mine) == len(theirs) == n
    for c in mine.columns:
        assert (mine[c].astype(str).values == theirs[c].astype(str).values).all(), c
