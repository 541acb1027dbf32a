"""Range (interval containment) join: each left row matches every
right interval with the same key and r_start <= left_ts <= r_end.

Like stages/asof.py, an engine addition the reference lacks (SURVEY
§2.4) — built on the classic banding reduction: replicate each
interval to the fixed-width time buckets it covers, bucket each left
row, and the inequality join becomes ONE multi-key hash equi-join on
(key, bucket) plus a vectorized containment filter.  Each left row
lives in exactly one bucket, so a pair can only form once — no
dedup pass is needed.

Bucket width trades replication against join fan-in: intervals
replicate ceil(span/width) times, so pick width ≈ the typical
interval span (callers pass ``bucket_us``).  All timestamps ride as
int64 microseconds — narrow shuffle rows, no timestamp-aggregate
support needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def interval_join(left, right, key: str, left_ts: str,
                  r_start: str, r_end: str, bucket_us: int,
                  num_partitions: int | None = None):
    """left: Dataset(..., key, left_ts:int64 µs); right: Dataset(...,
    key, r_start:int64 µs, r_end:int64 µs).  Returns the inner
    containment join with all left + right payload columns.  Rows
    with null key/timestamps are dropped up front (mirror the SQL
    twin with IS NOT NULL filters)."""
    from .. import default_num_partitions

    nparts = num_partitions or default_num_partitions()

    def bucket_left(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        # only null keys/timestamps are dropped — nullable payload
        # columns must survive (ADVICE fix: drop_null was table-wide)
        b = b.filter(pc.and_(pc.is_valid(b[key]), pc.is_valid(b[left_ts])))
        t = b[left_ts].to_numpy(zero_copy_only=False)
        return b.append_column("_bkt", pa.array(t // bucket_us, type=pa.int64()))

    def explode_right(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = b.filter(pc.and_(pc.and_(pc.is_valid(b[key]), pc.is_valid(b[r_start])),
                             pc.is_valid(b[r_end])))
        if b.num_rows == 0:
            return b.append_column("_bkt", pa.array([], type=pa.int64()))
        s = b[r_start].to_numpy(zero_copy_only=False)
        e = b[r_end].to_numpy(zero_copy_only=False)
        lo, hi = s // bucket_us, e // bucket_us
        reps = (hi - lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(b.num_rows), reps)
        bkt = np.concatenate([np.arange(a, z + 1) for a, z in zip(lo, hi)]) \
            if b.num_rows else np.array([], dtype=np.int64)
        out = b.take(pa.array(idx, type=pa.int64()))
        return out.append_column("_bkt", pa.array(bkt, type=pa.int64()))

    lt = left.map_batches(bucket_left, batch_format="pyarrow")
    rt = right.map_batches(explode_right, batch_format="pyarrow")
    joined = lt.join(rt, join_type="inner", num_partitions=nparts,
                     on=(key, "_bkt"))

    def contain(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.drop_columns(["_bkt"])
        t = b[left_ts].to_numpy(zero_copy_only=False)
        s = b[r_start].to_numpy(zero_copy_only=False)
        e = b[r_end].to_numpy(zero_copy_only=False)
        return b.filter(pa.array((t >= s) & (t <= e))).drop_columns(["_bkt"])

    return joined.map_batches(contain, batch_format="pyarrow")
