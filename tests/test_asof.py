"""As-of join stage: DuckDB native ASOF JOIN oracle parity plus edge
semantics (equal timestamps match, pre-first-order events drop,
right-side ties resolve to the smallest tiebreak)."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import ray.data as rd

from conftest import SF_SMALL
from refined_ray.pipelines import queries_ext
from refined_ray.stages.asof import asof_join


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_events_asof_order_matches_duckdb_asof(ray_session):
    mine = _canon(queries_ext.q_events_asof_order(SF_SMALL).to_pandas())
    con = duckdb.connect()
    for t in ["events", "orders"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    theirs = _canon(con.execute(queries_ext.SQL_EVENTS_ASOF_ORDER).fetchdf())
    assert len(mine) == len(theirs) > 0
    for c in mine.columns:
        assert (mine[c].astype(str).values == theirs[c].astype(str).values).all(), c


def test_asof_join_randomized_vs_duckdb(ray_session):
    """Seeded random instance with few keys, many ties and duplicate
    timestamps — the adversarial shapes for the forward-fill."""
    import numpy as np

    rng = np.random.default_rng(42)
    nl, nr = 400, 200
    lts = np.sort(rng.integers(0, 50, nl)).astype("datetime64[us]")
    left = pa.table({
        "eid": pa.array(np.arange(nl), type=pa.int64()),
        "k": pa.array(rng.integers(0, 6, nl), type=pa.int64()),
        "lts": pa.array(lts),
    })
    right = pa.table({
        "k": pa.array(rng.integers(0, 8, nr), type=pa.int64()),
        "rts": pa.array(rng.integers(0, 50, nr).astype("datetime64[us]")),
        "tb": pa.array(rng.permutation(nr), type=pa.int64()),
        "pay": pa.array(rng.integers(0, 1000, nr), type=pa.int64()),
    })
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right), key="k",
                    left_ts="lts", right_ts="rts",
                    left_cols=["eid", "k", "lts"],
                    right_cols=["rts", "tb", "pay"],
                    right_tiebreak="tb", num_partitions=3).to_pandas()
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    oracle = con.execute("""
        WITH rr AS (
          SELECT * FROM r
          QUALIFY row_number() OVER (PARTITION BY k, rts ORDER BY tb) = 1
        )
        SELECT l.eid, l.k, l.lts, rr.rts, rr.tb, rr.pay
        FROM l ASOF JOIN rr ON l.k = rr.k AND l.lts >= rr.rts
    """).fetchdf()
    a, b = _canon(out), _canon(oracle)
    assert len(a) == len(b) > 0
    for c in a.columns:
        assert (a[c].astype(str).values == b[c].astype(str).values).all(), c


def test_asof_join_edge_semantics(ray_session):
    import numpy as np

    dt = lambda *s: pa.array(np.array(s, dtype="datetime64[us]"))  # noqa: E731
    left = rd.from_arrow(pa.table({
        "eid": pa.array([1, 2, 3, 4], type=pa.int64()),
        "k": pa.array([7, 7, 7, 8], type=pa.int64()),
        "lts": dt("2024-01-05", "2024-01-10", "2024-01-01", "2024-01-05"),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([7, 7, 7, 9], type=pa.int64()),
        "rts": dt("2024-01-05", "2024-01-05", "2024-01-08", "2024-01-01"),
        "tb": pa.array([20, 10, 30, 1], type=pa.int64()),
    }))
    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts",
                    left_cols=["eid", "k", "lts"], right_cols=["rts", "tb"],
                    right_tiebreak="tb", num_partitions=2).to_pandas()
    got = {int(r.eid): int(r.tb) for r in out.itertuples()}
    # eid=1 at 01-05: equal-ts match, tie -> smallest tiebreak (10)
    # eid=2 at 01-10: latest prior is 01-08 (30)
    # eid=3 at 01-01: before any order -> dropped
    # eid=4 key 8: no right rows for key -> dropped
    assert got == {1: 10, 2: 30}
