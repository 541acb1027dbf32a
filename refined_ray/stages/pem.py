"""PEM aggregation: (surface, entity) pairs → P(entity | surface).

≙ the reference's PEM build (generate_pem.py:72-164 — its one true
wide shuffle, done there in a single-process defaultdict over ~18M
keys).  Here: ONE surface-keyed repartition, then a vectorized
lexsort/reduceat segment pass per partition — no per-group pandas
calls (the pattern measured 17× faster in stages/pairs.py).  Shared by
the ``pem_table`` catalog query and the offline corpus-build DAG
(pipelines/offline_build.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash_str_array

_EMPTY = pa.table({"surface": pa.array([], type=pa.string()),
                   "entity": pa.array([], type=pa.string()),
                   "cnt": pa.array([], type=pa.int64()),
                   "prob": pa.array([], type=pa.float64())})


def pem_partition(b: pa.Table) -> pa.Table:
    """One surface-complete partition of (surface, entity) rows →
    (surface, entity, cnt, prob).  Sort keys are hash-primary so
    string comparisons only break ties."""
    n = b.num_rows
    if n == 0:
        return _EMPTY
    s = b["surface"].to_numpy(zero_copy_only=False)
    e = b["entity"].to_numpy(zero_copy_only=False)
    hs = hash_str_array(s).view(np.int64)
    he = hash_str_array(e).view(np.int64)
    # order by (hash(s), s, hash(e), e): integer-primary, object
    # string compares only among hash ties — exact contiguity
    order = np.lexsort((e, he, s, hs))
    s, e = s[order], e[order]
    pair_new = np.r_[True, (s[1:] != s[:-1]) | (e[1:] != e[:-1])]
    pair_starts = np.flatnonzero(pair_new)
    cnt = np.diff(np.r_[pair_starts, n])
    ps, pe = s[pair_starts], e[pair_starts]
    surf_new = np.r_[True, ps[1:] != ps[:-1]]
    surf_starts = np.flatnonzero(surf_new)
    totals = np.add.reduceat(cnt, surf_starts)
    per_pair_tot = np.repeat(totals, np.diff(np.r_[surf_starts, len(ps)]))
    return pa.table({
        "surface": pa.array(ps, type=pa.string()),
        "entity": pa.array(pe, type=pa.string()),
        "cnt": pa.array(cnt, type=pa.int64()),
        "prob": pa.array(cnt / per_pair_tot.astype(np.float64), type=pa.float64()),
    })


def pem_from_pairs(pairs, num_partitions: int | None = None):
    """Dataset(surface, entity) → Dataset(surface, entity, cnt, prob).

    The repartition co-locates every row of a surface, so the segment
    pass computes exact per-surface totals with no second shuffle."""
    from .. import default_num_partitions

    nparts = num_partitions or default_num_partitions()
    parted = pairs.repartition(num_blocks=nparts, keys=["surface"], sort=False)
    return parted.map_batches(pem_partition, batch_format="pyarrow", batch_size=None)
