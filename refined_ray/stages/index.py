"""Distinct keys → contiguous int64 index, distributed.

≙ the reference's entity-index build (A2: ``build_entity_index`` /
``create_qcode_to_idx``, preprocess_all.py:101-122 — a driver-side
distinct + enumerate).  Here: sorted distinct, then per-block index
ranges computed from ONE metadata row per block — the driver never
sees the data, so the shape holds at any key cardinality.

Shared by the ``entity_index`` catalog query and the offline
corpus-build DAG (pipelines/offline_build.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def zip_with_index(ds, key_col: str, out_key: str | None = None,
                   out_col: str = "idx"):
    """Dataset(… key_col …) → Dataset(out_key, out_col): one row per
    distinct key, sorted, with a contiguous 0..n-1 int64 index."""
    import ray

    from .. import scrub_empty_blocks

    out_key = out_key or key_col
    # derive the key type from the input schema — the API is generic,
    # not string-only (ADVICE fix: empty paths pinned pa.string())
    in_schema = ds.schema()
    key_type = dict(zip(in_schema.names, in_schema.types)).get(key_col, pa.string())
    distinct = ds.groupby(key_col).count().select_columns([key_col]) \
                 .sort(key_col).materialize()
    # the sort shuffle can emit empty (even zero-column) blocks that
    # map_batches UDFs never see — drop them so every surviving block
    # is identifiable by its first key
    distinct = scrub_empty_blocks(
        distinct, fallback_schema=pa.schema([(key_col, key_type)]))

    # per-block (first_key, n_rows) → cumulative start offsets.  The
    # driver sees ONE ROW PER BLOCK, never the data; blocks are sorted
    # and keys globally distinct, so a block's first key identifies it.
    def block_meta(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"first": pa.array([], type=key_type),
                             "n": pa.array([], type=pa.int64())})
        return pa.table({"first": pa.array([b[key_col][0].as_py()], type=key_type),
                         "n": pa.array([b.num_rows], type=pa.int64())})

    meta = sorted((r["first"], r["n"]) for r in
                  distinct.map_batches(block_meta, batch_format="pyarrow",
                                       batch_size=None).take_all())
    offsets, acc = {}, 0
    for first, n in meta:
        offsets[first] = acc
        acc += n
    ref = ray.put(offsets)

    def assign(b: pa.Table, _ref=ref) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({out_key: pa.array([], type=key_type),
                             out_col: pa.array([], type=pa.int64())})
        base = ray.get(_ref)[b[key_col][0].as_py()]
        return pa.table({
            out_key: b[key_col],
            out_col: pa.array(base + np.arange(b.num_rows, dtype=np.int64),
                              type=pa.int64()),
        })

    return distinct.map_batches(assign, batch_format="pyarrow", batch_size=None)
