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

EXCHANGE_ROOT = "/tmp/refined_ray_exchange"


def _partition_ids(batch: pa.Table, key_cols: list[str], num_partitions: int) -> np.ndarray:
    acc = np.zeros(batch.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in key_cols:
            col = batch[c].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            acc = splitmix64(acc * np.uint64(0xC2B2AE3D27D4EB4F) + splitmix64(col))
    return (acc % np.uint64(num_partitions)).astype(np.int64)


def exchange_map_partitions(ds, key_cols: list[str], partition_fn,
                            num_partitions: int, concurrency: int | None = None):
    """Hash-exchange ``ds`` on ``key_cols`` and apply ``partition_fn``
    to each complete partition.  Returns (Dataset, cleanup_fn); call
    cleanup_fn() once the returned Dataset has been fully consumed."""
    import ray.data as rd

    root = os.path.join(EXCHANGE_ROOT, uuid.uuid4().hex)
    for p in range(num_partitions):
        os.makedirs(os.path.join(root, f"part={p}"), exist_ok=True)

    def writer(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            part = _partition_ids(batch, key_cols, num_partitions)
            order = np.argsort(part, kind="stable")
            sorted_tbl = batch.take(pa.array(order))
            part_sorted = part[order]
            bounds = np.flatnonzero(np.r_[True, part_sorted[1:] != part_sorted[:-1]])
            sizes = np.diff(np.r_[bounds, len(part_sorted)])
            fid = uuid.uuid4().hex
            for b0, sz in zip(bounds, sizes):
                p = int(part_sorted[b0])
                pq.write_table(
                    sorted_tbl.slice(int(b0), int(sz)),
                    os.path.join(root, f"part={p}", f"{fid}.parquet"),
                    compression="none",
                )
        return pa.table({"files": pa.array([batch.num_rows], type=pa.int64())})

    # drain the writer (the barrier every shuffle has); batch_size=None
    # → one writer call per BLOCK, bounding file count at blocks × P
    ds.map_batches(writer, batch_format="pyarrow", batch_size=None).count()

    def _empty_input() -> pa.Table:
        # derive the input schema from any written file (partitions can
        # be individually empty); all-empty → int64 key columns
        for q in range(num_partitions):
            d = os.path.join(root, f"part={q}")
            fs = os.listdir(d)
            if fs:
                return pq.read_table(os.path.join(d, fs[0])).slice(0, 0)
        return pa.table({c: pa.array([], type=pa.int64()) for c in key_cols})

    def reader(batch: pa.Table) -> pa.Table:
        out = []
        for p in batch["id"].to_pylist():
            d = os.path.join(root, f"part={p}")
            files = [os.path.join(d, f) for f in os.listdir(d)]
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
        shutil.rmtree(root, ignore_errors=True)

    return out, cleanup
