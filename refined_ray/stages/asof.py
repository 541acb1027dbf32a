"""As-of join: each left row matches the latest right row with the
same key and right_ts <= left_ts.

An engine addition the reference lacks (SURVEY §2.4: "no range or
as-of joins in the reference") — the canonical enrich-events-with-
most-recent-state operator of event pipelines, here built from Ray
Data primitives per the custom-operator playbook: tag both sides,
union into ONE stream, ONE keyed repartition co-locates every key, and
a vectorized forward-fill per partition finds each left row's match —
no per-event loop, no second shuffle, no cross-partition state.

Determinism: right-side ties on (key, ts) are broken BEFORE matching
by keeping the row with the smallest tiebreak value (the SQL twin's
``QUALIFY row_number() OVER (PARTITION BY key, ts ORDER BY tiebreak)
= 1``); at equal timestamps the right row sorts before the left row,
so ``left_ts >= right_ts`` matches (ASOF's >= semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def asof_join(left, right, key: str, left_ts: str, right_ts: str,
              left_cols: list[str], right_cols: list[str],
              right_tiebreak: str, num_partitions: int | None = None):
    """left/right: Datasets.  Returns Dataset(left_cols + right_cols)
    with one row per left row that has a match (inner as-of).  Null
    keys/timestamps never match and are dropped up front on both
    sides (mirror the SQL twin with ``IS NOT NULL`` filters).

    left_cols must contain key and left_ts; right_cols must contain
    right_ts and right_tiebreak (key rides along as the join column).
    """
    from .. import default_num_partitions

    nparts = num_partitions or default_num_partitions()

    l_payload = [c for c in left_cols if c != key]
    # the key always rides as the join column and is emitted from the
    # left side — never null-fill or duplicate it from right_cols
    r_payload = [c for c in right_cols if c != key]
    l_schema = dict(zip(left.schema().names, left.schema().types))
    r_schema = dict(zip(right.schema().names, right.schema().types))

    def unify_left(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        # only null KEYS/TIMESTAMPS never match (docstring contract);
        # nullable payload columns must survive
        b = b.filter(pc.and_(pc.is_valid(b[key]), pc.is_valid(b[left_ts])))
        cols = {key: b[key], "_side": pa.array(np.ones(b.num_rows, dtype=np.int8))}
        for c in l_payload:
            cols[c] = b[c]
        for c in r_payload:
            cols[c] = pa.nulls(b.num_rows, type=r_schema[c])
        return pa.table(cols)

    def unify_right(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = b.filter(pc.and_(pc.is_valid(b[key]), pc.is_valid(b[right_ts])))
        cols = {key: b[key], "_side": pa.array(np.zeros(b.num_rows, dtype=np.int8))}
        for c in l_payload:
            cols[c] = pa.nulls(b.num_rows, type=l_schema[c])
        for c in r_payload:
            cols[c] = b[c]
        return pa.table(cols)

    lt = left.select_columns(left_cols).map_batches(unify_left, batch_format="pyarrow")
    r_select = r_payload if key in r_payload else [key] + r_payload
    rt = right.select_columns(r_select).map_batches(unify_right, batch_format="pyarrow")

    unified = lt.union(rt).repartition(num_blocks=nparts, keys=[key], sort=False)

    out_schema = {c: l_schema[c] for c in left_cols}
    out_schema.update({c: r_schema[c] for c in r_payload})

    def match_partition(b: pa.Table) -> pa.Table:
        empty = pa.table({c: pa.array([], type=t) for c, t in out_schema.items()})
        if b.num_rows == 0:
            return empty
        k = b[key].to_numpy(zero_copy_only=False)
        side = b["_side"].to_numpy(zero_copy_only=False)
        ts = np.where(side == 1,
                      b[left_ts].to_numpy(zero_copy_only=False).astype("datetime64[us]"),
                      b[right_ts].to_numpy(zero_copy_only=False).astype("datetime64[us]"))
        # tiebreak is only meaningful on right rows (left lanes are
        # null); fill left lanes with 0 instead of casting NaN
        tb_raw = b[right_tiebreak].to_numpy(zero_copy_only=False)
        tb = np.zeros(len(k), dtype=np.int64)
        tb[side == 0] = tb_raw[side == 0].astype(np.int64)
        # (key, ts, side, tiebreak): right rows precede left rows at
        # equal ts; tied right rows order by tiebreak
        order = np.lexsort((tb, side, ts.view(np.int64), k))
        k, side, ts, tb = k[order], side[order], ts[order], tb[order]
        idx = np.arange(len(k))
        # drop all but the FIRST right row of each (key, ts) tie group
        is_r = side == 0
        dup_r = np.zeros(len(k), dtype=bool)
        dup_r[1:] = is_r[1:] & is_r[:-1] & (k[1:] == k[:-1]) \
            & (ts[1:] == ts[:-1])
        live_r = is_r & ~dup_r
        # forward-fill the last live right row's position, reset per key
        last_r = np.maximum.accumulate(np.where(live_r, idx, -1))
        key_start = np.repeat(
            np.flatnonzero(np.r_[True, k[1:] != k[:-1]]),
            np.diff(np.r_[np.flatnonzero(np.r_[True, k[1:] != k[:-1]]), len(k)]))
        matched = (side == 1) & (last_r >= key_start)
        src = order[matched]                 # left rows, original positions
        gather = order[last_r[matched]]      # matched right rows
        cols = {}
        for c in left_cols:
            cols[c] = b[c].take(pa.array(src, type=pa.int64()))
        for c in r_payload:
            cols[c] = b[c].take(pa.array(gather, type=pa.int64()))
        return pa.table(cols) if len(src) else empty

    return unified.map_batches(match_partition, batch_format="pyarrow",
                               batch_size=None)
