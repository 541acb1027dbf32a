"""Disk-backed keyed exchange: an external shuffle built from Ray Data
primitives + partitioned Parquet.

Why it exists: Ray's actor-based hash shuffle serializes every
(block × partition) sub-table through the node's single raylet/plasma
process; on a 32-CPU node the flagship pipeline's two pair exchanges
(~20M narrow rows) plateaued at ~20-40 s REGARDLESS of CPU count.  The
disk exchange turns the same all-to-all into embarrassingly parallel
file I/O:

  map side:    map_batches(writer) — each task splits its batch by
               hash(key) % P and appends one Parquet file per non-empty
               partition under  root/part=<p>/<uuid>.parquet
  barrier:     the writer Dataset is drained (count) — cheap: writers
               emit 1 marker row each
  reduce side: range(P).map_batches(reader) — task p reads ALL files of
               part=<p> (one pq.read_table) and runs ``partition_fn``
               on the complete partition, fusing exchange-read with
               partition processing

Crossover: the exchange pays ~2-3 s of fixed cost (file round-trip +
two executions), so it wins above ~1M rows and loses below — callers
at oracle-gate scale (sf0.01, tens of k rows) keep Ray's keyed
repartition, the flagship benchmark path (≥1M pair rows) uses this.

This is the classic external-shuffle layout (and exactly the
"partitioned parquet + manifest" resumability scheme of SURVEY §4):
on a multi-node cluster `root` is shared storage and a failed reducer
retries by re-reading its partition directory.  Determinism: partition
assignment is splitmix64-based (process-independent) and every
``partition_fn`` used with this exchange sorts its partition
internally, so output is independent of file arrival order.
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import splitmix64

# On a multi-node cluster this must be SHARED storage (NFS / fuse-mounted
# object store) — every reducer reads files written by every node.  It is
# parameterized via env or per-call `exchange_root=` through the pipeline
# API (enumerate_pairs / er_cluster_pages).
EXCHANGE_ROOT = os.environ.get("REFINED_RAY_EXCHANGE_ROOT", "/tmp/refined_ray_exchange")


def _partition_ids(batch: pa.Table, key_cols: list[str], num_partitions: int) -> np.ndarray:
    acc = np.zeros(batch.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in key_cols:
            col = batch[c].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            acc = splitmix64(acc * np.uint64(0xC2B2AE3D27D4EB4F) + splitmix64(col))
    return (acc % np.uint64(num_partitions)).astype(np.int64)


def block_file_id(sorted_tbl: pa.Table, tid: str, call_i: int) -> str:
    """Deterministic exchange-file name: blake2b over (task id, per-task
    call index, block content).  Same task id + same block replay order
    (a Ray task retry) → same name, so retries REPLACE their files;
    byte-identical blocks in different tasks/calls → distinct names, so
    no block's rows can ever be silently dropped by a name collision."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    h.update(tid.encode())
    h.update(str(call_i).encode())
    for col in sorted_tbl.itercolumns():
        for chunk in col.chunks if isinstance(col, pa.ChunkedArray) else [col]:
            for buf in chunk.buffers():
                if buf is not None:
                    h.update(buf)
    return h.hexdigest()


def exchange_map_partitions(ds, key_cols: list[str], partition_fn,
                            num_partitions: int, concurrency: int | None = None,
                            exchange_root: str | None = None):
    """Hash-exchange ``ds`` on ``key_cols`` and apply ``partition_fn``
    to each complete partition.  Returns (Dataset, cleanup_fn); call
    cleanup_fn() once the returned Dataset has been fully consumed."""
    import ray.data as rd

    root = os.path.join(exchange_root or EXCHANGE_ROOT, uuid.uuid4().hex)
    for p in range(num_partitions):
        os.makedirs(os.path.join(root, f"part={p}"), exist_ok=True)

    # Per-task call counter for file naming: reset when the task id
    # changes (Ray retries reuse the task id and replay the same blocks
    # in the same order, so retried names stay identical) but distinct
    # blocks — even byte-identical ones — get distinct names.
    _wstate = {"tid": None, "i": 0}

    def writer(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            part = _partition_ids(batch, key_cols, num_partitions)
            order = np.argsort(part, kind="stable")
            sorted_tbl = batch.take(pa.array(order))
            part_sorted = part[order]
            bounds = np.flatnonzero(np.r_[True, part_sorted[1:] != part_sorted[:-1]])
            sizes = np.diff(np.r_[bounds, len(part_sorted)])
            # Commit protocol: see block_file_id — written to a temp
            # name and atomically renamed so partial writes never land.
            import ray as _ray

            try:
                tid = _ray.get_runtime_context().get_task_id() or ""
            except Exception:
                tid = ""
            if not tid:
                # No stable task id → retried tasks would mint NEW file
                # names instead of replacing their first attempt's
                # files, silently duplicating rows.  The commit protocol
                # depends on task-stable names, so fail loudly.
                raise RuntimeError(
                    "exchange writer requires a Ray task id for its "
                    "retry-replacement commit protocol (retried tasks "
                    "must overwrite their first attempt's files); "
                    "get_task_id() returned nothing — is the writer "
                    "running outside a Ray task?")
            if tid != _wstate["tid"]:
                _wstate["tid"], _wstate["i"] = tid, 0
            call_i, _wstate["i"] = _wstate["i"], _wstate["i"] + 1
            fid = block_file_id(sorted_tbl, tid, call_i)
            for b0, sz in zip(bounds, sizes):
                p = int(part_sorted[b0])
                final = os.path.join(root, f"part={p}", f"{fid}.parquet")
                tmp = final + f".{uuid.uuid4().hex}.tmp"
                pq.write_table(sorted_tbl.slice(int(b0), int(sz)), tmp,
                               compression="none")
                os.replace(tmp, final)
        # marker row carries the input schema so the all-empty fallback
        # can reproduce it (ADVICE: key-only synthetic schemas broke
        # partition_fns that read non-key columns)
        return pa.table({"files": pa.array([batch.num_rows], type=pa.int64()),
                         "schema_ser": pa.array([batch.schema.serialize().to_pybytes()],
                                                type=pa.binary())})

    # drain the writer (the barrier every shuffle has); batch_size=None
    # → one writer call per BLOCK, bounding file count at blocks × P.
    # The marker rows are tiny (1 row + serialized schema per block).
    markers = ds.map_batches(writer, batch_format="pyarrow", batch_size=None).take_all()
    if markers:
        input_schema = pa.ipc.read_schema(pa.py_buffer(markers[0]["schema_ser"]))
    else:
        # zero blocks produced — the input is empty; fetching its schema
        # re-plans a trivially empty pipeline
        sch = ds.schema()
        input_schema = (pa.schema(list(zip(sch.names, sch.types))) if sch is not None
                        else pa.schema([(c, pa.int64()) for c in key_cols]))

    def _empty_input() -> pa.Table:
        # derive the input schema from any written file (partitions can
        # be individually empty); all-empty → the schema captured from
        # the writer markers (exact input schema, non-key columns too)
        for q in range(num_partitions):
            d = os.path.join(root, f"part={q}")
            fs = [f for f in os.listdir(d) if f.endswith(".parquet")]
            if fs:
                return pq.read_table(os.path.join(d, fs[0])).slice(0, 0)
        return input_schema.empty_table()

    def reader(batch: pa.Table) -> pa.Table:
        out = []
        for p in batch["id"].to_pylist():
            d = os.path.join(root, f"part={p}")
            # only committed files — a crashed writer may leave *.tmp
            files = [os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")]
            if not files:
                continue
            tbl = pa.concat_tables([pq.read_table(f) for f in files])
            res = partition_fn(tbl)
            if res.num_rows:
                out.append(res)
        if not out:
            return partition_fn(_empty_input())
        return pa.concat_tables(out)

    out = rd.range(num_partitions).map_batches(
        reader, batch_format="pyarrow", batch_size=1,
    )

    def cleanup():
        # deletion runs on a daemon thread: rmtree over blocks×P small
        # files costs seconds of DRIVER time (a fixed serial term the
        # scaling benchmark pays at every parallelism level) and nothing
        # downstream reads the files again
        import threading

        threading.Thread(target=shutil.rmtree, args=(root,),
                         kwargs={"ignore_errors": True}, daemon=True).start()

    return out, cleanup
