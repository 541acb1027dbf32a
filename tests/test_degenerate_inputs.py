"""Degenerate-input parity: operators must agree with their DuckDB
oracle on an EMPTY corpus (schema-correct, 0-row tables).  The sf
fixtures can never exercise this edge: empty reads produce schemaless
blocks (the zero-column trap), map UDFs are not invoked on empty
inputs, and SQL aggregates still emit rows — three independent ways
engine and oracle can silently diverge."""
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# session-2 operators + every previously-crashing computational query
# hardened with the _empty_guard short-circuit
OPS = ["set_similarity_join", "containment_join", "knn_classify",
       "bm25_topk", "edit_distance_join", "event_funnel",
       "user_retention", "event_transitions", "event_rate_anomaly",
       "host_triangles", "token_pmi", "event_trend", "part_skyline",
       "user_cumulative",
       "ann_topk", "blocking_quality", "corpus_clean", "csv_customers",
       "decontaminate", "el_eval", "embedding_kmeans",
       "events_asof_order", "events_range_join", "global_pad",
       "host_pagerank", "neardup_keep", "supplier_per_region",
       "top_customers",
       "wet_records", "wet_ingest", "wikidata_fanout"]
# intentionally absent: wiki_redirects — its staged .sql.gz fixture is
# degenerate without documents and the reader's short-line gate raises
# LOUDLY by contract (the reference drops short INSERT lines; silently
# fabricating the oracle's planted decoy row would defeat the gate)

TABLES = {
    "documents": {"doc_id": pa.int64(), "text": pa.string(),
                  "lang": pa.string(), "source": pa.string(),
                  "n_chars": pa.int64()},
    "events": {"event_id": pa.int64(), "ts": pa.timestamp("us"),
               "user_id": pa.int64(), "event_type": pa.string(),
               "value": pa.float64(), "props": pa.string()},
    "part": {"p_partkey": pa.int64(), "p_name": pa.string(),
             "p_brand": pa.string(), "p_type": pa.string(),
             "p_size": pa.int32(), "p_retailprice": pa.float64()},
    "embeddings": {"vec_id": pa.int64(),
                   "embedding": pa.list_(pa.float32()),
                   "label": pa.int32()},
    "region": {"r_regionkey": pa.int32(), "r_name": pa.string()},
    "nation": {"n_nationkey": pa.int32(), "n_name": pa.string(),
               "n_regionkey": pa.int32()},
    "customer": {"c_custkey": pa.int64(), "c_name": pa.string(),
                 "c_nationkey": pa.int32(), "c_acctbal": pa.float64(),
                 "c_mktsegment": pa.string()},
    "supplier": {"s_suppkey": pa.int64(), "s_name": pa.string(),
                 "s_nationkey": pa.int32(), "s_acctbal": pa.float64()},
    "orders": {"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
               "o_orderstatus": pa.string(),
               "o_totalprice": pa.float64(),
               "o_orderdate": pa.timestamp("us"),
               "o_orderpriority": pa.string()},
    "lineitem": {"l_orderkey": pa.int64(), "l_partkey": pa.int64(),
                 "l_suppkey": pa.int64(), "l_linenumber": pa.int32(),
                 "l_quantity": pa.float64(),
                 "l_extendedprice": pa.float64(),
                 "l_discount": pa.float64(), "l_tax": pa.float64(),
                 "l_shipdate": pa.timestamp("us"),
                 "l_returnflag": pa.string(),
                 "l_linestatus": pa.string()},
}


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for name, schema in TABLES.items():
        pq.write_table(
            pa.table({c: pa.array([], type=t)
                      for c, t in schema.items()}),
            d / f"{name}.parquet")
    return str(d)


@pytest.mark.parametrize("name", OPS)
def test_empty_corpus_parity(ray_session, empty_sf, name):
    import __ray_entry__ as entry

    res = entry.queries()[name](empty_sf)
    eng = res if isinstance(res, pd.DataFrame) else res.to_pandas()

    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM "
                    f"read_parquet('{os.path.join(empty_sf, tbl)}"
                    f".parquet')")
    want = con.execute(entry.oracle_sql()[name]).fetchdf()

    assert len(eng) == len(want), (len(eng), len(want))
    if len(want):
        cols = sorted(want.columns)
        assert sorted(eng.columns) == cols
        a = eng[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_class_prune_partial_empty_nation(ray_session, tmp_path):
    """PARTIAL-empty parity (regression): with `nation` empty but
    `customer` populated, the engine fabricated a 'r?' placeholder
    class for the unknown region; the SQL's region arm is an inner
    join and contributes nothing — both sides must emit exactly
    {own class, other nation} per customer (own nation pruned via the
    customer->nation DAG edge, which needs no nation row)."""
    import shutil

    import __ray_entry__ as entry

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sf"
    d.mkdir()
    for t, schema in TABLES.items():
        s = os.path.join(src, f"{t}.parquet")
        if t == "nation":
            pq.write_table(pa.table({c: pa.array([], type=ty)
                                     for c, ty in schema.items()}),
                           d / "nation.parquet")
        elif os.path.exists(s):
            shutil.copy(s, d / f"{t}.parquet")

    got = entry.queries()["class_prune"](str(d)).to_pandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d / t}.parquet')")
    want = con.execute(entry.oracle_sql()["class_prune"]).fetchdf()
    a = sorted(map(tuple, got.itertuples(index=False, name=None)))
    b = sorted(map(tuple, want.itertuples(index=False, name=None)))
    assert a == b
    assert not any(c == "r?" for _, c in a)


def test_flagship_scrubs_null_pages(ray_session):
    """Crawl hygiene: records with a NULL url or html (truncated
    fetches, redirect stubs — routine in real Common-Crawl parquet)
    must be scrubbed at the ingest boundary, not crash signing."""
    import ray.data as rd

    from refined_ray.pipelines.entity_resolution import payload_from_pages
    from refined_ray.sources.webpages import ensure_webpages

    path = ensure_webpages("/root/testdata/sf0.001")
    base = pq.read_table(path, columns=["url", "html"])
    nulls = pa.table({
        "url": pa.array([None, "https://x.example/p", None],
                        type=pa.string()),
        "html": pa.array([b"<html><body>hi</body></html>", None, None],
                         type=pa.binary()),
    })
    pages = rd.from_arrow(pa.concat_tables([base, nulls]))
    payload = payload_from_pages(pages).materialize()
    assert payload.count() == base.num_rows  # the 3 null rows dropped
