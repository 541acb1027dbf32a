"""Table linking: link a mention column of a tabular dataset against a
candidate table — the engine's analogue of the reference's FastAPI
table-linking job (api/app/endpoints/refined_api.py:55-167,
services/job_service.py:88-240: per-cell candidate extraction → Koala
rows with per-cell candidates and a best match).

Ray shape (≙ SURVEY §3.3 "job = pipeline over a staged Parquet/CSV
table"):
  cells(row_id, col, surface)
    └─ map_batches(normalize)                       (M1 key)
    └─ candidate attach: broadcast PEM under a counted byte budget,
       else a distributed hash join on the normalized surface (J1)
    └─ per-cell top-k by prior, rank column, best row flagged (O1/O2)

The "job service" concerns map to engine primitives: progress =
per-block streaming (Ray Data); pagination = ``limit``; cancellation =
killing the driver call; multipart ingest = appending parquet
fragments to the staged directory before running.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.normalize import normalize_surface_array

BROADCAST_MAX_PEM_ROWS = 2_000_000


def link_cells(cells, pem, k: int = 3, num_partitions: int = 8):
    """cells: Dataset(row_id:int64, col:string, surface:string);
    pem: Dataset(surface:string, entity:string, cnt:int64, prob:float64)
    → Dataset(row_id, col, surface, rank, entity, prob) with rank 1..k
    per cell (cells with no candidates emit no rows — the caller's NIL
    handling, ≙ my_tests/accuracy.py NIL semantics).

    The PEM side broadcasts when it is provably small (counted row
    budget); otherwise both sides shuffle-join on the normalized
    surface.
    """
    import ray

    def add_norm(b: pa.Table) -> pa.Table:
        return b.append_column("norm", normalize_surface_array(b["surface"]))

    normed = cells.map_batches(add_norm, batch_format="pyarrow")

    pem = pem.materialize()
    if pem.count() <= BROADCAST_MAX_PEM_ROWS:
        # broadcast probe: sorted arrays + searchsorted range lookup
        surfs, ents, probs = [], [], []
        for b in pem.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
            surfs.append(np.asarray(b["surface"].to_pylist(), dtype=object))
            ents.append(np.asarray(b["entity"].to_pylist(), dtype=object))
            probs.append(b["prob"].to_numpy(zero_copy_only=False))
        s = np.concatenate(surfs) if surfs else np.empty(0, object)
        e = np.concatenate(ents) if ents else np.empty(0, object)
        p = np.concatenate(probs) if probs else np.empty(0)
        order = np.lexsort((e, -p, s))  # per surface: prob desc, entity asc
        ref = ray.put((s[order], e[order], p[order]))

        def probe(b: pa.Table, _ref=ref) -> pa.Table:
            # vectorized range gather: per-cell candidate window is
            # [lo, lo+min(hi-lo, k)) in the sorted PEM arrays
            s, e, p = ray.get(_ref)
            norms = np.asarray(b["norm"].to_pylist(), dtype=object)
            lo = np.searchsorted(s, norms, side="left")
            hi = np.searchsorted(s, norms, side="right")
            cnt = np.minimum(hi - lo, k)
            rows = np.repeat(np.arange(b.num_rows), cnt)
            offs = np.arange(cnt.sum(), dtype=np.int64) - np.repeat(
                np.cumsum(cnt) - cnt, cnt)
            j = np.repeat(lo, cnt) + offs
            return pa.table({
                "row_id": b["row_id"].take(pa.array(rows, type=pa.int64())),
                "col": b["col"].take(pa.array(rows, type=pa.int64())),
                "surface": b["surface"].take(pa.array(rows, type=pa.int64())),
                "rank": pa.array(offs + 1, type=pa.int64()),
                "entity": pa.array(e[j], type=pa.string()),
                "prob": pa.array(p[j], type=pa.float64()),
            })

        return normed.map_batches(probe, batch_format="pyarrow")

    # join path: shuffle both sides on the normalized surface
    pem_side = pem.rename_columns({"surface": "norm"})
    joined = normed.join(pem_side, join_type="inner",
                         num_partitions=num_partitions, on=("norm",))

    def topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"row_id": pa.array([], type=pa.int64()),
                             "col": pa.array([], type=pa.string()),
                             "surface": pa.array([], type=pa.string()),
                             "rank": pa.array([], type=pa.int64()),
                             "entity": pa.array([], type=pa.string()),
                             "prob": pa.array([], type=pa.float64())})
        rid = b["row_id"].to_numpy(zero_copy_only=False)
        col = np.asarray(b["col"].to_pylist(), dtype=object)
        surf = np.asarray(b["surface"].to_pylist(), dtype=object)
        ent = np.asarray(b["entity"].to_pylist(), dtype=object)
        prob = b["prob"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ent, -prob, col, rid))
        rid, col, surf, ent, prob = rid[order], col[order], surf[order], ent[order], prob[order]
        new = np.r_[True, (rid[1:] != rid[:-1]) | (col[1:] != col[:-1])]
        starts = np.flatnonzero(new)
        seg_len = np.diff(np.r_[starts, len(rid)])
        pos = np.arange(len(rid)) - np.repeat(starts, seg_len)
        keep = pos < k
        return pa.table({
            "row_id": pa.array(rid[keep], type=pa.int64()),
            "col": pa.array(col[keep], type=pa.string()),
            "surface": pa.array(surf[keep], type=pa.string()),
            "rank": pa.array(pos[keep] + 1, type=pa.int64()),
            "entity": pa.array(ent[keep], type=pa.string()),
            "prob": pa.array(prob[keep], type=pa.float64()),
        })

    parted = joined.repartition(num_blocks=num_partitions,
                                keys=["row_id", "col"], sort=False)
    return parted.map_batches(topk, batch_format="pyarrow", batch_size=None)
