"""HyperLogLog sketch: kernel properties (determinism, merge =
union) and end-to-end accuracy of corpus_cardinality vs exact
distinct counts."""

from __future__ import annotations

import duckdb
import numpy as np

from conftest import SF_SMALL
from refined_ray.functions.hashing import hash_str_array
from refined_ray.functions.hll import hll_estimate, hll_merge, hll_partial
from refined_ray.pipelines.queries_ext import q_corpus_cardinality


def test_hll_kernel_accuracy_and_merge():
    rng = np.random.default_rng(7)
    a = [f"key-{i}" for i in range(20_000)]
    b = [f"key-{i}" for i in range(10_000, 35_000)]  # overlaps a
    ha, hb = hash_str_array(np.array(a, dtype=object)), \
        hash_str_array(np.array(b, dtype=object))
    # split-and-merge equals one-shot (order/batching independence)
    parts = [hll_partial(h) for h in np.array_split(ha, 7)]
    assert (hll_merge(parts) == hll_partial(ha)).all()
    # merged estimate ≈ |a ∪ b| = 35_000
    est = hll_estimate(hll_merge([hll_partial(ha), hll_partial(hb)]))
    assert abs(est / 35_000 - 1) < 0.05
    # small range: linear counting keeps tiny sets accurate
    small = hll_estimate(hll_partial(ha[:300]))
    assert abs(small / 300 - 1) < 0.05
    del rng


def test_type_user_cardinality_within_5pct_of_exact(ray_session):
    from refined_ray.pipelines.queries_ext import q_type_user_cardinality

    out = q_type_user_cardinality(SF_SMALL).to_pandas().set_index("event_type")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_SMALL}/events.parquet'")
    exact = con.execute(
        "SELECT event_type, count(DISTINCT user_id) AS n FROM events "
        "WHERE event_type IS NOT NULL AND user_id IS NOT NULL GROUP BY 1"
    ).fetchdf().set_index("event_type")
    assert sorted(out.index) == sorted(exact.index)
    for g in exact.index:
        assert abs(out.loc[g, "estimate"] / exact.loc[g, "n"] - 1) < 0.05, g


def test_corpus_cardinality_within_5pct_of_exact(ray_session):
    out = q_corpus_cardinality(SF_SMALL).to_pandas().set_index("metric")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_SMALL}/documents.parquet'")
    exact_tok = con.execute(
        "SELECT count(DISTINCT tok) FROM (SELECT unnest("
        "regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM documents)"
    ).fetchone()[0]
    exact_src = con.execute("SELECT count(DISTINCT source) FROM documents").fetchone()[0]
    assert abs(out.loc["distinct_tokens", "estimate"] / exact_tok - 1) < 0.05
    assert abs(out.loc["distinct_sources", "estimate"] / exact_src - 1) < 0.05
    # determinism: a second run returns identical estimates
    again = q_corpus_cardinality(SF_SMALL).to_pandas().set_index("metric")
    assert (again.estimate == out.estimate).all()
