"""Range (interval) join stage: DuckDB inequality-join oracle parity
plus banding edge semantics (bucket-boundary spans, no duplicate pairs
when an interval covers many buckets)."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import ray.data as rd

from conftest import SF_SMALL
from refined_ray.pipelines import queries_ext
from refined_ray.stages.rangejoin import interval_join


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_events_range_join_matches_oracle(ray_session):
    mine = _canon(queries_ext.q_events_range_join(SF_SMALL).to_pandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_SMALL}/events.parquet'")
    theirs = _canon(con.execute(queries_ext.SQL_EVENTS_RANGE_JOIN).fetchdf())
    assert len(mine) == len(theirs) > 0
    for c in mine.columns:
        assert (mine[c].astype(str).values == theirs[c].astype(str).values).all(), c


def test_interval_join_randomized_vs_duckdb(ray_session):
    """Seeded random instance: intervals of wildly different spans
    (sub-bucket to many-bucket) vs the plain inequality join."""
    import numpy as np

    rng = np.random.default_rng(11)
    nl, nr = 400, 120
    left = pa.table({
        "eid": pa.array(np.arange(nl), type=pa.int64()),
        "k": pa.array(rng.integers(0, 5, nl), type=pa.int64()),
        "t": pa.array(rng.integers(0, 1000, nl), type=pa.int64()),
    })
    s = rng.integers(0, 1000, nr)
    span = rng.integers(0, 400, nr)
    right = pa.table({
        "k": pa.array(rng.integers(0, 6, nr), type=pa.int64()),
        "s": pa.array(s, type=pa.int64()),
        "e": pa.array(s + span, type=pa.int64()),
        "w": pa.array(np.arange(nr), type=pa.int64()),
    })
    out = interval_join(rd.from_arrow(left), rd.from_arrow(right), key="k",
                        left_ts="t", r_start="s", r_end="e", bucket_us=64,
                        num_partitions=3).to_pandas()
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    oracle = con.execute("""
        SELECT l.eid, l.k, l.t, r.s, r.e, r.w
        FROM l JOIN r ON l.k = r.k AND l.t >= r.s AND l.t <= r.e
    """).fetchdf()
    a, b = _canon(out), _canon(oracle)
    assert len(a) == len(b) > 0
    for c in a.columns:
        assert (a[c].values == b[c].values).all(), c


def test_interval_join_banding_no_duplicates(ray_session):
    # interval spans 5 buckets (width 10); events at boundaries and
    # outside; each matching pair must appear exactly once
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
        "t": pa.array([10, 35, 59, 60, 35], type=pa.int64()),
        "eid": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1], type=pa.int64()),
        "s": pa.array([10], type=pa.int64()),
        "e": pa.array([59], type=pa.int64()),
        "w": pa.array([7], type=pa.int64()),
    }))
    out = interval_join(left, right, key="k", left_ts="t", r_start="s",
                        r_end="e", bucket_us=10, num_partitions=2).to_pandas()
    # eid 0 (t=10, start boundary), 1, 2 (t=59, end boundary) match;
    # eid 3 (t=60 > end) and eid 4 (other key) do not
    assert sorted(out.eid.tolist()) == [0, 1, 2]
    assert (out.w == 7).all()
    assert len(out) == len(out.drop_duplicates(["eid", "w"]))
