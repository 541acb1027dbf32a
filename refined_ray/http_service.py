"""HTTP job-service facade — the engine's analogue of the reference's
FastAPI surface (api/app/endpoints/refined_api.py:55-260,
api/app/services/job_service.py:17-310), served with the stdlib
``ThreadingHTTPServer`` (FastAPI/uvicorn are absent from this
container; the route/verb/shape contract is what is mirrored, not the
framework).

Endpoints (JSON in/out):

- ``POST /link``                       — synchronous single-text linking
  (≙ refined_api.py:27-52): mention → top candidate + confidence.
- ``POST /jobs``                       — create a table-linking job,
  202 + job_id; ``mode="inline"`` queues it immediately,
  ``mode="multipart"`` opens the part-upload flow (:57-122).
- ``POST /jobs/{id}/parts``            — append a batch of rows (:124-146).
- ``POST /jobs/{id}/finalize``         — flip ingesting → queued and
  start the run (:148-167).
- ``GET  /jobs/{id}``                  — status with ingest / progress /
  results counters (:169-190).
- ``POST /jobs/{id}:cancel``           — cancel (:192-206).
- ``GET  /jobs/{id}/results?cursor&limit`` — flattened per-cell
  candidate rankings with integer-cursor pagination
  (job_service.py:249-310): 400 until the job is done, ``next_cursor``
  null on the last page.

Auth (≙ api/app/utility/security.py get_api_key + the
test_apikey.py contract): when the service is constructed with an
``api_key`` (or ``$REFINED_RAY_API_KEY`` is set), EVERY endpoint
requires the ``X-API-Key`` header — missing key → 403 "API key
missing", wrong key → 403 "Could not validate credentials" (the
reference's two distinct details).  The comparison is
constant-time.  ``api_key=None`` with the env var unset disables the
gate (the reference's settings carry a key unconditionally; the
engine keeps an explicit off switch for embedded/test use).

The "model loaded once at router creation" (refined_api.py:15-20)
maps to the PEM candidate table: built ONCE from the service's staged
corpus directory at startup and reused by every job.  Each job's rows
run through the SAME distributed ``koala_table_link`` pipeline as the
CLI path (pipelines/table_linking.py), so the HTTP and CLI surfaces
return identical per-cell candidates; jobs execute one-at-a-time on a
worker thread (the BackgroundTasks analogue).  Job tables arrive via
the API and are request-sized; corpus-scale linking goes through the
CLI / parquet path, exactly like the reference's note on /link vs
/jobs.
"""

from __future__ import annotations

import json
import re
import threading
import uuid
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from queue import Queue
from typing import Any


def _now() -> str:
    return datetime.now(timezone.utc).isoformat()


class JobService:
    """In-memory job table + single worker thread (the reference keeps
    JOBS as a process-local dict too, job_service.py:14)."""

    def __init__(self, sf_dir: str, top_k_default: int = 3,
                 api_key: str | None = None):
        import os

        self.sf_dir = sf_dir
        self.top_k_default = top_k_default
        self.api_key = (api_key if api_key is not None
                        else os.environ.get("REFINED_RAY_API_KEY") or None)
        self.jobs: dict[str, dict[str, Any]] = {}
        self.lock = threading.Lock()
        self.queue: Queue = Queue()
        self._pem = None
        self._pem_lock = threading.Lock()
        self.worker = threading.Thread(target=self._run_loop, daemon=True)
        self.worker.start()

    # -- "model" -------------------------------------------------------
    def pem(self):
        """The candidate table, built once (≙ load_model at router
        creation, refined_api.py:15-20).  Lock-guarded: concurrent
        first calls from handler threads must not build it twice."""
        with self._pem_lock:
            if self._pem is None:
                from .pipelines.queries import q_pem_table

                self._pem = q_pem_table(self.sf_dir).materialize()
            return self._pem

    # -- job lifecycle -------------------------------------------------
    def create_job(self, header, rows, target_column, top_k, mode,
                   table_name=None, expected_parts=0, expected_rows=0):
        job_id = str(uuid.uuid4())
        now = _now()
        self.jobs[job_id] = {
            "job_id": job_id,
            "status": "queued" if mode == "inline" else "ingesting",
            "mode": mode,
            "created_at": now, "updated_at": now,
            "header": header, "target_column": target_column,
            "top_k": top_k, "rows": rows,
            "table_name": table_name,
            "ingest": {
                "expected_parts": expected_parts if mode == "multipart" else 1,
                "expected_rows": expected_rows if mode == "multipart" else len(rows),
                "received_parts": 0 if mode == "multipart" else 1,
                "received_rows": len(rows),
                "completed_at": None,
            },
            "progress": {"part_number": 0, "row_index": 0,
                         "total_rows": len(rows)},
            "results": {"segments": 0, "cells": 0},
            "result": None, "error": None,
        }
        if mode == "inline":
            self.queue.put(job_id)
        return job_id

    def add_part(self, job_id, part_number, rows):
        job = self.jobs.get(job_id)
        if job is None:
            return None
        if job["status"] != "ingesting":
            # a part after finalize would mutate job["rows"] under the
            # worker's feet (and silently never be linked)
            return "conflict"
        with self.lock:
            job["rows"].extend(rows)
            job["ingest"]["received_parts"] += 1
            job["ingest"]["received_rows"] += len(rows)
            job["progress"]["total_rows"] = len(job["rows"])
            job["updated_at"] = _now()
        return job

    def finalize(self, job_id):
        job = self.jobs.get(job_id)
        if job is None:
            return None
        if job["status"] != "ingesting":
            # double-finalize would run the job twice; finalize after
            # cancel would resurrect it (review finding — the
            # reference's unguarded flip has both defects)
            return "conflict"
        job["status"] = "queued"
        job["ingest"]["completed_at"] = _now()
        job["updated_at"] = _now()
        self.queue.put(job_id)
        return job

    def cancel(self, job_id):
        job = self.jobs.get(job_id)
        if job is None:
            return None
        if job["status"] == "done":
            # cancelling a finished job would strand its results
            # behind the results_page status check
            return "conflict"
        job["status"] = "cancelled"
        job["updated_at"] = _now()
        return job

    # -- execution -----------------------------------------------------
    def _run_loop(self):
        while True:
            job_id = self.queue.get()
            if job_id is None:
                return
            try:
                self._run_job(job_id)
            except Exception as e:  # mirror job_service.py:232-236
                job = self.jobs.get(job_id)
                if job is not None:
                    job["status"] = "failed"
                    job["error"] = str(e)
                    job["updated_at"] = _now()

    def _run_job(self, job_id):
        import pyarrow as pa
        import ray.data as rd

        from .pipelines.table_linking import koala_table_link

        job = self.jobs[job_id]
        if job["status"] == "cancelled":
            return
        job["status"] = "running"
        job["updated_at"] = _now()

        header = job["header"]
        target = job["target_column"]
        tidx = header.index(target) if target in header else 0
        rows = job["rows"]
        cells = rd.from_arrow(pa.table({
            "row_id": pa.array(range(len(rows)), type=pa.int64()),
            "col": pa.array([str(tidx)] * len(rows), type=pa.string()),
            "surface": pa.array([str(r.get(target, "")) for r in rows],
                                type=pa.string()),
        }))
        nested = {r["row_id"]: r for r in koala_table_link(
            cells, self.pem(), k=job["top_k"]).take_all()}
        if job["status"] == "cancelled":  # cancelled mid-run: drop result
            return

        koala_rows = []
        for idx, row in enumerate(rows):
            nr = nested.get(idx)
            koala_rows.append({
                "idRow": f"row_{idx}",
                "data": [str(row.get(h, "")) for h in header],
                "linked_entities": [{
                    "idColumn": tidx,
                    "candidates": (nr or {}).get("candidates", []),
                }],
            })
            job["progress"]["row_index"] = idx + 1
        col_coarse = next(iter(nested.values()))["col_coarse"] if nested else "OTHER"
        lit_map = {str(i): "DATE" for i, h in enumerate(header)
                   if i != tidx and ("year" in h.lower() or "date" in h.lower())}
        job["results"]["segments"] = 1
        job["results"]["cells"] = len(koala_rows)
        job["ingest"]["completed_at"] = job["ingest"]["completed_at"] or _now()
        job["result"] = {
            "header": header,
            "rows": koala_rows,
            "status": "DONE",
            "classified_columns": {"NE": {str(tidx): col_coarse},
                                   "LIT": lit_map},
            "column_types": {str(tidx): {"types": [{
                "id": col_coarse, "name": col_coarse,
                "count": len(koala_rows)}]}},
        }
        if job["status"] == "cancelled":  # cancel landed mid-build
            return
        job["status"] = "done"
        job["updated_at"] = _now()

    # -- synchronous /link --------------------------------------------
    def link_single(self, text: str, k: int = 3):
        import pyarrow as pa
        import ray.data as rd

        from .pipelines.table_linking import link_cells

        cells = rd.from_arrow(pa.table({
            "row_id": pa.array([0], type=pa.int64()),
            "col": pa.array(["c0"], type=pa.string()),
            "surface": pa.array([text], type=pa.string()),
        }))
        cands = sorted(link_cells(cells, self.pem(), k=k).take_all(),
                       key=lambda r: r["rank"])
        if not cands:
            return {"text": text, "entities": []}
        from .pipelines.table_linking import entity_coarse_type

        top = cands[0]
        return {"text": text, "entities": [{
            "mention": text,
            "predicted_qid": top["entity"],
            "confidence": top["prob"],
            "type": entity_coarse_type([top["entity"]])[0],
        }]}

    # -- results pagination (job_service.py:249-310) ------------------
    def results_page(self, job_id, cursor, limit):
        job = self.jobs.get(job_id)
        if job is None:
            return None, (404, "Job not found")
        if job["status"] != "done":
            return None, (400, f"Job not completed yet. Current status "
                               f"{job['status']}")
        all_cells = []
        for row_idx, row in enumerate(job["result"]["rows"]):
            for ent in row["linked_entities"]:
                col_idx = ent["idColumn"]
                all_cells.append({
                    "row": row_idx, "col": col_idx,
                    "cell_id": f"{row_idx}:{col_idx}",
                    "mention": row["data"][col_idx],
                    "candidate_ranking": ent["candidates"],
                })
        start = int(cursor) if (cursor and str(cursor).isdigit()) else 0
        end = start + max(1, limit)  # limit<=0 must still advance the cursor
        page = all_cells[start:end]
        next_cursor = str(end) if end < len(all_cells) else None
        return {"ok": True, "job_id": job_id, "items": page,
                "next_cursor": next_cursor,
                "total": len(all_cells)}, None

    def status_view(self, job_id):
        job = self.jobs.get(job_id)
        if job is None:
            return None
        return {k: job[k] for k in
                ("job_id", "status", "mode", "created_at", "updated_at",
                 "ingest", "progress", "results", "error")}

    def shutdown(self):
        self.queue.put(None)


# ---------------------------------------------------------------------
# HTTP layer
# ---------------------------------------------------------------------

_JOB_RE = re.compile(r"^/jobs/([0-9a-f-]+)$")
_PARTS_RE = re.compile(r"^/jobs/([0-9a-f-]+)/parts$")
_FINAL_RE = re.compile(r"^/jobs/([0-9a-f-]+)/finalize$")
_CANCEL_RE = re.compile(r"^/jobs/([0-9a-f-]+):cancel$")
_RESULTS_RE = re.compile(r"^/jobs/([0-9a-f-]+)/results$")


def _make_handler(svc: JobService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            return json.loads(self.rfile.read(n) or b"{}")

        def _auth_error(self):
            """403 payload when the key gate fails, else None
            (≙ security.py get_api_key: the no-key and wrong-key
            branches carry distinct details, both 403)."""
            if svc.api_key is None:
                return None
            import hmac

            provided = self.headers.get("X-API-Key")
            if not provided:
                return {"detail": "API key missing"}
            # compare bytes: compare_digest(str, str) raises TypeError on
            # any non-ASCII char (http.server decodes headers as latin-1),
            # which would escape the handler and drop the connection.
            if not hmac.compare_digest(
                provided.encode("utf-8", "surrogateescape"),
                svc.api_key.encode("utf-8", "surrogateescape"),
            ):
                return {"detail": "Could not validate credentials"}
            return None

        def do_GET(self):
            err = self._auth_error()
            if err:
                return self._send(403, err)
            try:
                return self._do_get()
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                return self._send(400, {"detail": f"Bad request: {e}"})
            except Exception as e:  # never drop the connection
                return self._send(500, {"detail": f"Internal error: {e}"})

        def do_POST(self):
            err = self._auth_error()
            if err:
                return self._send(403, err)
            try:
                return self._do_post()
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                return self._send(400, {"detail": f"Bad request: {e}"})
            except Exception as e:
                return self._send(500, {"detail": f"Internal error: {e}"})

        def _do_get(self):
            from urllib.parse import parse_qs, urlparse

            u = urlparse(self.path)
            m = _RESULTS_RE.match(u.path)
            if m:
                q = parse_qs(u.query)
                page, err = svc.results_page(
                    m.group(1), (q.get("cursor") or [None])[0],
                    int((q.get("limit") or ["100"])[0]))
                if err:
                    return self._send(err[0], {"detail": err[1]})
                return self._send(200, page)
            m = _JOB_RE.match(u.path)
            if m:
                view = svc.status_view(m.group(1))
                if view is None:
                    return self._send(404, {"detail": "Job not found"})
                return self._send(200, view)
            return self._send(404, {"detail": "Not found"})

        def _do_post(self):
            path = self.path
            if path == "/link":
                body = self._body()
                try:
                    return self._send(200, svc.link_single(
                        body["text"], k=body.get("top_k", 3)))
                except Exception as e:
                    return self._send(500, {"detail": f"Model error: {e}"})
            if path == "/jobs":
                body = self._body()
                header = body.get("header") or []
                mode = body.get("mode") or "inline"
                link_cols = body.get("link_columns") or []
                target = link_cols[0] if link_cols else ""
                rows = []
                for row in body.get("rows") or []:
                    if isinstance(row, dict) and "cells" in row:
                        rows.append(dict(zip(header, row["cells"])))
                    elif isinstance(row, dict):
                        rows.append(row)
                job_id = svc.create_job(
                    header, rows, target,
                    body.get("top_k", svc.top_k_default), mode,
                    table_name=body.get("table_name"),
                    expected_parts=body.get("total_parts") or 0,
                    expected_rows=body.get("total_rows") or 0)
                if mode == "inline":
                    return self._send(202, {
                        "job_id": job_id, "status": "queued",
                        "mode": "inline", "message": "Job accepted"})
                return self._send(202, {
                    "job_id": job_id, "status": "ingesting",
                    "mode": "multipart", "message": "Multipart job created",
                    "upload": {
                        "upload_parts_url": f"/jobs/{job_id}/parts",
                        "finalized_url": f"/jobs/{job_id}/finalize"}})
            m = _PARTS_RE.match(path)
            if m:
                body = self._body()
                job = svc.jobs.get(m.group(1))
                if job is None:
                    return self._send(404, {"detail": "Job not found"})
                header = job["header"]
                rows = [dict(zip(header, r["cells"])) if "cells" in r else r
                        for r in body.get("rows") or []]
                if svc.add_part(m.group(1), body.get("part_number", 0),
                                rows) == "conflict":
                    return self._send(409, {
                        "detail": f"Job not ingesting (status "
                                  f"{job['status']}); parts rejected"})
                return self._send(200, {
                    "job_id": m.group(1),
                    "part_number": body.get("part_number", 0),
                    "received_rows": len(rows), "status": "ingesting"})
            m = _FINAL_RE.match(path)
            if m:
                job = svc.finalize(m.group(1))
                if job is None:
                    return self._send(404, {"detail": "Job not found"})
                if job == "conflict":
                    return self._send(409, {
                        "detail": "Job is not ingesting; finalize rejected"})
                return self._send(200, {"job_id": m.group(1),
                                        "status": "queued",
                                        "message": "Processing started"})
            m = _CANCEL_RE.match(path)
            if m:
                job = svc.cancel(m.group(1))
                if job is None:
                    return self._send(404, {"detail": "Job not found"})
                if job == "conflict":
                    return self._send(409, {
                        "detail": "Job already completed; cancel rejected"})
                return self._send(200, {"job_id": m.group(1),
                                        "status": "cancelled",
                                        "message": "Job cancelled successfully"})
            return self._send(404, {"detail": "Not found"})

    return Handler


def serve(sf_dir: str, host: str = "127.0.0.1", port: int = 0,
          api_key: str | None = None):
    """Start the job service; returns (server, service).  Call
    ``server.serve_forever()`` (or run it on a thread) and
    ``server.shutdown()`` + ``service.shutdown()`` to stop.
    ``api_key`` (or $REFINED_RAY_API_KEY) turns on the X-API-Key gate."""
    svc = JobService(sf_dir, api_key=api_key)
    server = ThreadingHTTPServer((host, port), _make_handler(svc))
    return server, svc
