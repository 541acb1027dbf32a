"""e2e tests for the HTTP job-service facade (http_service.py ≙
refined_api.py:55-260 + job_service.py:17-310): a live local server is
driven over real HTTP through create→poll→results, multipart ingest,
pagination, cancellation, and the synchronous /link route, and the
per-cell candidates are checked against the CLI-path pipeline
(koala_table_link) on the same inputs."""

from __future__ import annotations

import json
import threading
import time
import urllib.request

import pytest

SF = "/root/testdata/sf0.001"


def _req(base, path, payload=None, method=None):
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(
        base + path, data=data, method=method or ("POST" if data else "GET"),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _wait_done(base, job_id, timeout=120):
    t0 = time.time()
    while time.time() - t0 < timeout:
        code, view = _req(base, f"/jobs/{job_id}")
        assert code == 200
        if view["status"] in ("done", "failed", "cancelled"):
            return view
        time.sleep(0.2)
    raise AssertionError("job did not finish")


@pytest.fixture(scope="module")
def server(ray_session):
    from refined_ray.http_service import serve

    srv, svc = serve(SF, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}", svc
    srv.shutdown()
    svc.shutdown()


def _surfaces(n=4):
    """First token of the first n docs — guaranteed PEM hits."""
    import pyarrow.parquet as pq

    from refined_ray.functions.tokenize import tokenize_batch

    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
    out = []
    for did, text in sorted(zip(t["doc_id"].to_pylist(), t["text"].to_pylist())):
        flat, starts = tokenize_batch([text])
        if starts[1] > starts[0]:
            out.append(flat[starts[0]])
        if len(out) == n:
            break
    return out


def test_inline_job_end_to_end(server):
    base, _ = server
    surfs = _surfaces(3)
    code, resp = _req(base, "/jobs", {
        "header": ["mention", "year"],
        "link_columns": ["mention"],
        "top_k": 3,
        "table_name": "t1",
        "rows": [{"cells": [s, str(2000 + i)]} for i, s in enumerate(surfs)],
    })
    assert code == 202 and resp["status"] == "queued" and resp["mode"] == "inline"
    job_id = resp["job_id"]

    # results 400 until done (reference :296-298)
    code, err = _req(base, f"/jobs/{job_id}/results")
    if code == 400:
        assert "not completed" in err["detail"]

    view = _wait_done(base, job_id)
    assert view["status"] == "done", view
    assert view["results"] == {"segments": 1, "cells": 3}
    assert view["progress"]["row_index"] == 3

    code, page = _req(base, f"/jobs/{job_id}/results")
    assert code == 200 and page["ok"] and page["next_cursor"] is None
    assert [c["cell_id"] for c in page["items"]] == ["0:0", "1:0", "2:0"]
    assert [c["mention"] for c in page["items"]] == surfs

    # HTTP candidates == CLI-path pipeline on the same cells
    import pyarrow as pa
    import ray.data as rd

    from refined_ray.pipelines.queries import q_pem_table
    from refined_ray.pipelines.table_linking import koala_table_link

    cells = rd.from_arrow(pa.table({
        "row_id": pa.array(range(len(surfs)), type=pa.int64()),
        "col": pa.array(["0"] * len(surfs), type=pa.string()),
        "surface": pa.array(surfs, type=pa.string()),
    }))
    want = {r["row_id"]: r["candidates"] for r in
            koala_table_link(cells, q_pem_table(SF), k=3).take_all()}
    for c in page["items"]:
        assert c["candidate_ranking"] == want[c["row"]]

    # nested koala metadata shape (job_service.py:216-230)
    job = server[1].jobs[job_id]
    res = job["result"]
    assert res["status"] == "DONE" and res["header"] == ["mention", "year"]
    assert set(res["classified_columns"]["NE"]) == {"0"}
    assert res["classified_columns"]["LIT"] == {"1": "DATE"}
    (tinfo,) = res["column_types"]["0"]["types"]
    assert tinfo["count"] == 3 and tinfo["id"] == res["classified_columns"]["NE"]["0"]
    assert res["rows"][1]["data"] == [surfs[1], "2001"]


def test_multipart_flow_and_pagination(server):
    base, _ = server
    surfs = _surfaces(4)
    code, resp = _req(base, "/jobs", {
        "header": ["m"], "link_columns": ["m"], "mode": "multipart",
        "total_parts": 2, "total_rows": 4, "top_k": 2, "rows": [],
    })
    assert code == 202 and resp["status"] == "ingesting"
    job_id = resp["job_id"]
    assert resp["upload"]["finalized_url"] == f"/jobs/{job_id}/finalize"

    code, p1 = _req(base, f"/jobs/{job_id}/parts",
                    {"part_number": 1, "rows": [{"cells": [s]} for s in surfs[:2]]})
    assert code == 200 and p1["received_rows"] == 2
    code, _ = _req(base, f"/jobs/{job_id}/parts",
                   {"part_number": 2, "rows": [{"cells": [s]} for s in surfs[2:]]})
    assert code == 200

    code, view = _req(base, f"/jobs/{job_id}")
    assert view["status"] == "ingesting"
    assert view["ingest"]["received_parts"] == 2
    assert view["ingest"]["received_rows"] == 4

    code, fin = _req(base, f"/jobs/{job_id}/finalize", {}, method="POST")
    assert code == 200 and fin["status"] == "queued"
    view = _wait_done(base, job_id)
    assert view["status"] == "done" and view["results"]["cells"] == 4

    # integer-cursor pagination (job_service.py:286-303)
    code, page1 = _req(base, f"/jobs/{job_id}/results?limit=3")
    assert [c["row"] for c in page1["items"]] == [0, 1, 2]
    assert page1["next_cursor"] == "3" and page1["total"] == 4
    code, page2 = _req(base, f"/jobs/{job_id}/results?cursor=3&limit=3")
    assert [c["row"] for c in page2["items"]] == [3]
    assert page2["next_cursor"] is None


def test_link_single_and_errors(server):
    base, _ = server
    surf = _surfaces(1)[0]
    code, resp = _req(base, "/link", {"text": surf})
    assert code == 200 and resp["text"] == surf
    (ent,) = resp["entities"]
    assert ent["mention"] == surf and ent["predicted_qid"]
    assert 0 < ent["confidence"] <= 1 and ent["type"] in (
        "PERSON", "ORG", "LOC", "OTHER")
    # unknown mention → empty entity list (NIL)
    code, resp = _req(base, "/link", {"text": "zzzzunknownzz"})
    assert code == 200 and resp["entities"] == []
    # 404s
    code, _ = _req(base, "/jobs/doesnotexist-0000")
    assert code == 404
    code, _ = _req(base, "/jobs/doesnotexist-0000/results")
    assert code == 404


def test_cancel_before_run(server):
    base, svc = server
    # multipart job, never finalized: cancel must stick and the worker
    # must never touch it
    code, resp = _req(base, "/jobs", {
        "header": ["m"], "link_columns": ["m"], "mode": "multipart",
        "rows": [],
    })
    job_id = resp["job_id"]
    code, c = _req(base, f"/jobs/{job_id}:cancel", {}, method="POST")
    assert code == 200 and c["status"] == "cancelled"
    # drive the worker's cancelled guard directly (≙ job_service.py's
    # per-row cancellation check): a cancelled job on the queue is a
    # no-op — no result, status unchanged
    svc.queue.put(job_id)
    time.sleep(0.5)
    assert svc.jobs[job_id]["result"] is None
    assert svc.jobs[job_id]["status"] == "cancelled"


def test_state_guards(server):
    base, svc = server
    # cancel then finalize → 409, job stays cancelled (no resurrection)
    code, resp = _req(base, "/jobs", {
        "header": ["m"], "link_columns": ["m"], "mode": "multipart",
        "rows": [],
    })
    job_id = resp["job_id"]
    _req(base, f"/jobs/{job_id}:cancel", {}, method="POST")
    code, err = _req(base, f"/jobs/{job_id}/finalize", {}, method="POST")
    assert code == 409
    assert svc.jobs[job_id]["status"] == "cancelled"
    # parts after cancel → 409
    code, err = _req(base, f"/jobs/{job_id}/parts",
                     {"part_number": 1, "rows": [{"cells": ["x"]}]})
    assert code == 409
    # double-finalize → second one 409 (job must not run twice)
    code, resp = _req(base, "/jobs", {
        "header": ["m"], "link_columns": ["m"], "mode": "multipart",
        "rows": [],
    })
    jid2 = resp["job_id"]
    _req(base, f"/jobs/{jid2}/parts",
         {"part_number": 1, "rows": [{"cells": [_surfaces(1)[0]]}]})
    code1, _ = _req(base, f"/jobs/{jid2}/finalize", {}, method="POST")
    code2, _ = _req(base, f"/jobs/{jid2}/finalize", {}, method="POST")
    assert code1 == 200 and code2 == 409
    view = _wait_done(base, jid2)
    # cancel after done → 409, results stay reachable
    code, _ = _req(base, f"/jobs/{jid2}:cancel", {}, method="POST")
    assert code == 409
    code, page = _req(base, f"/jobs/{jid2}/results")
    assert code == 200 and page["total"] == 1


def test_malformed_input_gets_http_error(server):
    base, _ = server
    import urllib.request

    # invalid JSON body → 400, not a dropped connection
    req = urllib.request.Request(base + "/jobs", data=b"not json",
                                 method="POST",
                                 headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected HTTPError")
    except urllib.error.HTTPError as e:
        assert e.code == 400

    # non-numeric limit → 400
    code, resp = _req(base, "/jobs", {
        "header": ["m"], "link_columns": ["m"],
        "rows": [{"cells": [_surfaces(1)[0]]}],
    })
    job_id = resp["job_id"]
    _wait_done(base, job_id)
    code, err = _req(base, f"/jobs/{job_id}/results?limit=abc")
    assert code == 400
    # limit=0 clamps to 1: pagination still advances
    code, page = _req(base, f"/jobs/{job_id}/results?limit=0")
    assert code == 200 and len(page["items"]) == 1


# -- API-key auth (≙ api/tests/test_apikey.py + security.py) ----------


def _req_key(base, path, key=None, payload=None):
    data = json.dumps(payload).encode() if payload is not None else None
    headers = {"Content-Type": "application/json"}
    if key is not None:
        headers["X-API-Key"] = key
    req = urllib.request.Request(
        base + path, data=data, method="POST" if data else "GET",
        headers=headers)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def auth_server(ray_session):
    from refined_ray.http_service import serve

    srv, svc = serve(SF, port=0, api_key="CORRECT_API_KEY")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}"
    srv.shutdown()
    svc.shutdown()


def test_apikey_missing_forbidden(auth_server):
    # the reference's test #1: no key → 403 "API key missing"
    code, body = _req_key(auth_server, "/jobs/nonexistent")
    assert code == 403 and body["detail"] == "API key missing"
    # POST routes gated too (before any body parse)
    code, body = _req_key(auth_server, "/link", payload={"text": "x"})
    assert code == 403 and body["detail"] == "API key missing"


def test_apikey_invalid_forbidden(auth_server):
    # test #2: wrong key → 403 with the distinct detail
    code, body = _req_key(auth_server, "/jobs/nonexistent",
                          key="wrong-password")
    assert code == 403 and body["detail"] == "Could not validate credentials"


def test_apikey_valid_passes_through(auth_server):
    # test #3: valid key → the route's own behavior (here a 404)
    code, body = _req_key(auth_server, "/jobs/00000000-0000-0000-0000-000000000000",
                          key="CORRECT_API_KEY")
    assert code == 404 and body["detail"] == "Job not found"
    # and a real job runs end-to-end under auth
    surf = _surfaces(1)[0]
    code, resp = _req_key(auth_server, "/jobs", key="CORRECT_API_KEY",
                          payload={"header": ["m"], "link_columns": ["m"],
                                   "rows": [{"cells": [surf]}]})
    assert code == 202
    jid = resp["job_id"]
    t0 = time.time()
    while time.time() - t0 < 120:
        code, view = _req_key(auth_server, f"/jobs/{jid}",
                              key="CORRECT_API_KEY")
        assert code == 200
        if view["status"] in ("done", "failed"):
            break
        time.sleep(0.2)
    assert view["status"] == "done"
    code, page = _req_key(auth_server, f"/jobs/{jid}/results",
                          key="CORRECT_API_KEY")
    assert code == 200 and page["total"] == 1


def test_apikey_non_ascii_forbidden(auth_server):
    # regression: hmac.compare_digest(str, str) raises TypeError on
    # non-ASCII (http.server decodes headers as latin-1) — the gate
    # must compare BYTES and answer 403, not drop the connection
    code, body = _req_key(auth_server, "/jobs/nonexistent", key="kl\xfc")
    assert code == 403 and body["detail"] == "Could not validate credentials"


def test_no_key_configured_disables_gate(server):
    # the unauthenticated module fixture keeps working key-less
    base, _ = server
    code, _ = _req(base, "/jobs/nonexistent")
    assert code == 404
