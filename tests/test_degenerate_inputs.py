"""Degenerate-input parity: every session-added operator must agree
with its DuckDB oracle on an EMPTY corpus (schema-correct, 0-row
tables).  The sf fixtures can never exercise this edge: empty reads
produce schemaless blocks (the zero-column trap), map UDFs are not
invoked on empty inputs, and SQL aggregates still emit rows — three
independent ways engine and oracle can silently diverge."""
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

OPS = ["set_similarity_join", "containment_join", "knn_classify",
       "bm25_topk", "edit_distance_join", "event_funnel",
       "user_retention", "event_transitions", "event_rate_anomaly",
       "host_triangles", "token_pmi", "event_trend", "part_skyline",
       "user_cumulative"]


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    pq.write_table(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string()),
        "lang": pa.array([], type=pa.string()),
        "source": pa.array([], type=pa.string()),
        "n_chars": pa.array([], type=pa.int64())}),
        d / "documents.parquet")
    pq.write_table(pa.table({
        "event_id": pa.array([], type=pa.int64()),
        "ts": pa.array([], type=pa.timestamp("us")),
        "user_id": pa.array([], type=pa.int64()),
        "event_type": pa.array([], type=pa.string()),
        "value": pa.array([], type=pa.float64()),
        "props": pa.array([], type=pa.string())}),
        d / "events.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([], type=pa.int64()),
        "p_name": pa.array([], type=pa.string()),
        "p_brand": pa.array([], type=pa.string()),
        "p_type": pa.array([], type=pa.string()),
        "p_size": pa.array([], type=pa.int32()),
        "p_retailprice": pa.array([], type=pa.float64())}),
        d / "part.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float32())),
        "label": pa.array([], type=pa.int32())}),
        d / "embeddings.parquet")
    return str(d)


@pytest.mark.parametrize("name", OPS)
def test_empty_corpus_parity(ray_session, empty_sf, name):
    import __ray_entry__ as entry

    res = entry.queries()[name](empty_sf)
    eng = res if isinstance(res, pd.DataFrame) else res.to_pandas()

    con = duckdb.connect()
    for tbl in ("documents", "events", "part", "embeddings"):
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM "
                    f"read_parquet('{os.path.join(empty_sf, tbl)}"
                    f".parquet')")
    want = con.execute(entry.oracle_sql()[name]).fetchdf()

    assert len(eng) == len(want), (len(eng), len(want))
    if len(want):
        a = eng.sort_index(axis=1).sort_values(
            list(sorted(eng.columns))).reset_index(drop=True)
        b = want.sort_index(axis=1).sort_values(
            list(sorted(want.columns))).reset_index(drop=True)
        assert list(a.columns) == list(b.columns)
        for c in a.columns:
            assert list(a[c]) == list(b[c]), c
