"""Table-linking pipeline (≙ reference API table-linking job): oracle
parity is covered by the driver gate; here we check broadcast/join
path equivalence and NIL semantics."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def _run(cells_tbl, pem_tbl, monkeypatch=None, force_join=False, k=2):
    import ray.data as rd

    import refined_ray.pipelines.table_linking as tl

    if force_join:
        monkeypatch.setattr(tl, "BROADCAST_MAX_PEM_ROWS", 0)
    out = tl.link_cells(rd.from_arrow(cells_tbl), rd.from_arrow(pem_tbl), k=k)
    return out.to_pandas().sort_values(
        ["row_id", "col", "rank"]).reset_index(drop=True)


CELLS = pa.table({
    "row_id": pa.array([1, 2, 3], type=pa.int64()),
    "col": pa.array(["c0", "c0", "c0"], type=pa.string()),
    "surface": pa.array(["The Apple", "banana", "unknown thing"], type=pa.string()),
})
PEM = pa.table({
    "surface": pa.array(["apple", "apple", "banana"], type=pa.string()),
    "entity": pa.array(["Q1", "Q2", "Q3"], type=pa.string()),
    "cnt": pa.array([3, 1, 5], type=pa.int64()),
    "prob": pa.array([0.75, 0.25, 1.0], type=pa.float64()),
})


def test_linking_normalizes_and_ranks(ray_session):
    out = _run(CELLS, PEM)
    # "The Apple" normalizes to "apple" → two candidates ranked by prob
    r1 = out[out.row_id == 1]
    assert list(r1.entity) == ["Q1", "Q2"]
    assert list(r1["rank"]) == [1, 2]
    assert list(r1.surface) == ["The Apple", "The Apple"]  # original kept
    # banana → one candidate; unknown → NIL = no rows
    assert list(out[out.row_id == 2].entity) == ["Q3"]
    assert len(out[out.row_id == 3]) == 0


def test_join_path_equals_broadcast(ray_session, monkeypatch):
    base = _run(CELLS, PEM)
    joined = _run(CELLS, PEM, monkeypatch=monkeypatch, force_join=True)
    pd.testing.assert_frame_equal(base, joined)


def test_koala_nested_shape(ray_session):
    """Golden test of the Koala nesting (job_service.py:181-230):
    per-row candidates with is_match/types, the null candidate on NIL
    cells, and the histogram+argmax column classification."""
    import ray.data as rd

    from refined_ray.pipelines.table_linking import (entity_coarse_type,
                                                     koala_table_link)

    out = koala_table_link(rd.from_arrow(CELLS), rd.from_arrow(PEM), k=2)
    rows = {r["row_id"]: r for r in out.take_all()}
    assert set(rows) == {1, 2, 3}

    r1 = rows[1]
    assert r1["idRow"] == "row_1" and r1["idColumn"] == 0
    assert r1["data"] == ["The Apple"]
    c = r1["candidates"]
    assert [x["id"] for x in c] == ["Q1", "Q2"]
    assert [x["is_match"] for x in c] == [True, False]
    assert c[0]["score"] == 0.75 and c[0]["description"] == ""
    t1 = entity_coarse_type(["Q1"])[0]
    assert c[0]["types"] == [{"id": t1, "name": t1}]
    assert c[1]["types"] == [] and r1["coarse"] == t1

    # NIL cell → single null candidate, coarse OTHER
    c3 = rows[3]["candidates"]
    assert len(c3) == 1
    assert c3[0]["id"] == "null" and c3[0]["name"] == "unknown thing"
    assert c3[0]["score"] == 0.0 and not c3[0]["is_match"]
    assert c3[0]["types"] == [] and rows[3]["coarse"] == "OTHER"

    # column classification: histogram over {t1, t3, OTHER}, ties by name
    t3 = entity_coarse_type(["Q3"])[0]
    hist = {}
    for v in (t1, t3, "OTHER"):
        hist[v] = hist.get(v, 0) + 1
    want = min(hist.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert rows[1]["col_coarse"] == want
    assert all(r["n_cells"] == 3 for r in rows.values())


def test_koala_multi_column_cells_stay_separate(ray_session):
    """Candidates must group by (row_id, col): two cells sharing a
    row_id in different columns each keep exactly their own top-k
    (review finding: row_id-only grouping merged both cells' lists)."""
    import ray.data as rd

    from refined_ray.pipelines.table_linking import koala_table_link

    cells = pa.table({
        "row_id": pa.array([7, 7], type=pa.int64()),
        "col": pa.array(["0", "1"], type=pa.string()),
        "surface": pa.array(["apple", "banana"], type=pa.string()),
    })
    out = koala_table_link(rd.from_arrow(cells), rd.from_arrow(PEM), k=2)
    rows = {r["col"]: r for r in out.take_all()}
    assert set(rows) == {"0", "1"}
    assert [c["id"] for c in rows["0"]["candidates"]] == ["Q1", "Q2"]
    assert [c["id"] for c in rows["1"]["candidates"]] == ["Q3"]
    assert rows["0"]["idColumn"] == 0 and rows["1"]["idColumn"] == 1
    assert rows["0"]["data"] == ["apple"] and rows["1"]["data"] == ["banana"]
    # each cell's rank-1 is its own match
    assert rows["0"]["candidates"][0]["is_match"]
    assert rows["1"]["candidates"][0]["is_match"]
