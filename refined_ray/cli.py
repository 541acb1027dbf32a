"""Command-line entry points: ``python -m refined_ray <subcommand>``.

This is the engine's ``ray job submit`` surface — the analogue of the
reference's script entry points and its FastAPI job service
(/root/reference/api/app/endpoints/refined_api.py:55-167,
api/app/services/job_service.py:17-240): stage data in, run a named
pipeline, get partitioned Parquet out, resume from checkpoints.

Subcommands
-----------
``list``
    Print the catalog: every query name, with ``[oracle]`` when a
    DuckDB twin exists.
``run QUERY --sf-dir D [--out PATH] [--show N]``
    Run one catalog query over the table directory ``D``; write the
    result as Parquet to ``PATH`` (atomic ``.part`` -> rename) or
    print the first ``N`` rows.  Emits one JSON summary line.
``flagship --sf-dir D [--out PATH] [--checkpoint-root R] ...``
    Run the flagship ER pipeline (blocking -> scoring -> clustering).
    With ``--checkpoint-root`` the run is stage-checkpointed and a
    rerun resumes, skipping completed stages (the reference's
    artifact gating, preprocess_all.py:149-336, partition-granular).
``ingest add-part --staging S --table T FILE``
    Stage one Parquet/CSV fragment for table ``T`` (the reference's
    multipart job ingest, job_service.py:62-75).  Content-hash file
    names make re-adding the same fragment idempotent.
``ingest finalize --staging S --dest DIR``
    Verify schema consistency per table and atomically promote each
    staged table to ``DIR/<table>.parquet`` (a directory of parts —
    readable by every catalog query via ``pyarrow.dataset``), with a
    row-count manifest (≙ the ``finalize`` state flip,
    refined_api.py:147-167).

The CLI owns its Ray session (guarded: a pre-initialised session, e.g.
pytest's fixture or ``ray job submit``'s, is reused and left running).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import time


def _ensure_ray() -> bool:
    """Init Ray iff not already up; return True when this call owned it.

    With ``RAY_ADDRESS`` set (a ``ray job submit`` entrypoint, or the
    sandbox's preset ``local``), plain ``ray.init()`` honors it and
    attaches to the cluster; only with no address do we force a fresh
    local instance."""
    import ray

    if ray.is_initialized():
        return False
    if os.environ.get("RAY_ADDRESS"):
        ray.init()
    else:
        ray.init(address="local", include_dashboard=False)
    return True


def _write_parquet_atomic(result, out: str) -> int:
    """Write a query result (Dataset / pandas / pyarrow) to ``out``
    as Parquet via ``.part`` -> rename; return the row count."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    tmp = out + ".part"
    if os.path.exists(tmp):
        shutil.rmtree(tmp) if os.path.isdir(tmp) else os.remove(tmp)
    if hasattr(result, "write_parquet"):  # ray.data.Dataset: stays distributed
        result.write_parquet(tmp)
    else:
        tab = result if isinstance(result, pa.Table) else pa.Table.from_pandas(
            result, preserve_index=False)
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(tab, os.path.join(tmp, "part-0.parquet"))
    if os.path.exists(out):
        shutil.rmtree(out) if os.path.isdir(out) else os.remove(out)
    os.replace(tmp, out)
    return pads.dataset(out).count_rows()


def _head(result, n: int):
    import pyarrow as pa

    if hasattr(result, "to_pandas") and not isinstance(result, pa.Table):
        try:  # ray Dataset
            return result.limit(n).to_pandas(), None
        except TypeError:
            return result.to_pandas().head(n), None
    if isinstance(result, pa.Table):
        return result.slice(0, n).to_pandas(), result.num_rows
    return result.head(n), len(result)


def cmd_list(_args) -> int:
    from refined_ray.pipelines.queries import QUERIES, oracles

    withsql = oracles()
    for name in sorted(QUERIES):
        print(f"{name:28s} {'[oracle]' if name in withsql else '[rows-only]'}")
    print(f"# {len(QUERIES)} queries, {len(withsql)} with DuckDB oracle SQL")
    return 0


def cmd_run(args) -> int:
    from refined_ray.pipelines.queries import QUERIES

    if args.query not in QUERIES:
        print(f"unknown query {args.query!r} — see `python -m refined_ray list`",
              file=sys.stderr)
        return 2
    t0 = time.time()
    result = QUERIES[args.query](args.sf_dir)
    if args.out:
        rows = _write_parquet_atomic(result, args.out)
    else:
        head, rows = _head(result, args.show)
        print(head.to_string())
        if rows is None:
            rows = len(head) if len(head) < args.show else -1  # unknown w/o count
    print(json.dumps({"query": args.query, "rows": rows,
                      "out": args.out, "sec": round(time.time() - t0, 2)}))
    return 0


def cmd_flagship(args) -> int:
    from refined_ray.pipelines.entity_resolution import (
        er_cluster_pages, er_cluster_pages_checkpointed)

    t0 = time.time()
    kw = dict(threshold=args.threshold, amplify=args.amplify, fatten=args.fatten,
              exact_verify=args.exact_verify)
    if args.checkpoint_root:
        ds = er_cluster_pages_checkpointed(args.sf_dir, args.checkpoint_root, **kw)
    else:
        ds = er_cluster_pages(args.sf_dir, **kw)
    if args.out:
        rows = _write_parquet_atomic(ds, args.out)
    else:
        rows = ds.count()
    print(json.dumps({"pipeline": "er_clusters", "rows": rows, "out": args.out,
                      "checkpoint_root": args.checkpoint_root,
                      "sec": round(time.time() - t0, 2)}))
    return 0


# ---------------------------------------------------------------------
# multipart ingest (≙ job_service.add_part / finalize)
# ---------------------------------------------------------------------


def _part_name(path: str) -> str:
    h = hashlib.blake2b(digest_size=12)
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return f"part-{h.hexdigest()}.parquet"


def cmd_ingest_add_part(args) -> int:
    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq

    if os.path.exists(os.path.join(args.staging, "_MANIFEST.json")):
        print("staging dir already finalized", file=sys.stderr)
        return 2
    tdir = os.path.join(args.staging, args.table)
    os.makedirs(tdir, exist_ok=True)
    dest = os.path.join(tdir, _part_name(args.file))
    if os.path.exists(dest):  # idempotent re-add (retry-safe)
        print(json.dumps({"table": args.table, "part": os.path.basename(dest),
                          "dedup": True}))
        return 0
    tmp = dest + ".part"
    if args.file.endswith(".csv"):
        pq.write_table(pacsv.read_csv(args.file), tmp)
    else:
        shutil.copyfile(args.file, tmp)
    os.replace(tmp, dest)
    print(json.dumps({"table": args.table, "part": os.path.basename(dest),
                      "dedup": False}))
    return 0


def cmd_ingest_finalize(args) -> int:
    import pyarrow.dataset as pads

    if os.path.exists(os.path.join(args.staging, "_MANIFEST.json")):
        print("staging dir already finalized", file=sys.stderr)
        return 2
    tables = sorted(d for d in os.listdir(args.staging)
                    if os.path.isdir(os.path.join(args.staging, d)))
    if not tables:
        print("nothing staged", file=sys.stderr)
        return 2
    os.makedirs(args.dest, exist_ok=True)
    manifest = {}
    for t in tables:
        src = os.path.join(args.staging, t)
        # only committed fragments count: a killed add-part leaves a
        # ``*.parquet.part`` temp that must be neither checked nor
        # promoted
        parts = sorted(p for p in os.listdir(src) if p.endswith(".parquet"))
        if not parts:
            print(f"table {t!r}: no committed parts", file=sys.stderr)
            return 3
        try:
            schemas = {str(pads.dataset(os.path.join(src, p)).schema)
                       for p in parts}
        except Exception as e:
            print(f"table {t!r}: unreadable part ({e})", file=sys.stderr)
            return 3
        if len(schemas) > 1:
            print(f"table {t!r}: inconsistent part schemas", file=sys.stderr)
            return 3
        rows = pads.dataset([os.path.join(src, p) for p in parts]).count_rows()
        out = os.path.join(args.dest, f"{t}.parquet")
        tmp = out + ".part"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        for p in parts:
            shutil.copyfile(os.path.join(src, p), os.path.join(tmp, p))
        if os.path.exists(out):
            shutil.rmtree(out) if os.path.isdir(out) else os.remove(out)
        os.replace(tmp, out)
        manifest[t] = {"rows": rows, "parts": parts}
    mpath = os.path.join(args.staging, "_MANIFEST.json")
    with open(mpath + ".part", "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(mpath + ".part", mpath)
    print(json.dumps({"dest": args.dest,
                      "tables": {t: m["rows"] for t, m in manifest.items()}}))
    return 0


def cmd_serve(args) -> int:
    """Run the HTTP job service (≙ the reference's FastAPI app) until
    interrupted: ``python -m refined_ray serve --sf-dir D --port P``."""
    from refined_ray.http_service import serve

    server, svc = serve(args.sf_dir, host=args.host, port=args.port,
                        api_key=args.api_key)
    host, port = server.server_address[:2]
    print(json.dumps({"serving": f"http://{host}:{port}",
                      "sf_dir": args.sf_dir}), flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        svc.shutdown()
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="refined_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list").set_defaults(fn=cmd_list, needs_ray=False)

    r = sub.add_parser("run")
    r.add_argument("query")
    r.add_argument("--sf-dir", required=True)
    r.add_argument("--out")
    r.add_argument("--show", type=int, default=20)
    r.set_defaults(fn=cmd_run, needs_ray=True)

    f = sub.add_parser("flagship")
    f.add_argument("--sf-dir", required=True)
    f.add_argument("--out")
    f.add_argument("--checkpoint-root")
    f.add_argument("--threshold", type=float,
                   default=None)
    f.add_argument("--amplify", type=int, default=1)
    f.add_argument("--fatten", type=int, default=1)
    f.add_argument("--exact-verify", action="store_true")
    f.set_defaults(fn=cmd_flagship, needs_ray=True)

    s = sub.add_parser("serve")
    s.add_argument("--sf-dir", required=True)
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8080)
    s.add_argument("--api-key", default=None,
                   help="require X-API-Key on every request "
                        "(default: $REFINED_RAY_API_KEY, unset = no auth)")
    s.set_defaults(fn=cmd_serve, needs_ray=True)

    ing = sub.add_parser("ingest").add_subparsers(dest="ingest_cmd", required=True)
    a = ing.add_parser("add-part")
    a.add_argument("file")
    a.add_argument("--staging", required=True)
    a.add_argument("--table", required=True)
    a.set_defaults(fn=cmd_ingest_add_part, needs_ray=False)
    fz = ing.add_parser("finalize")
    fz.add_argument("--staging", required=True)
    fz.add_argument("--dest", required=True)
    fz.set_defaults(fn=cmd_ingest_finalize, needs_ray=False)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if getattr(args, "threshold", None) is None and hasattr(args, "threshold"):
        from refined_ray.pipelines.entity_resolution import DEFAULT_THRESHOLD

        args.threshold = DEFAULT_THRESHOLD
    owned = _ensure_ray() if args.needs_ray else False
    try:
        return args.fn(args)
    finally:
        if owned:
            import ray

            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
