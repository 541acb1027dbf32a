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
import pyarrow.compute as pc

from ..functions.normalize import normalize_surface_array

BROADCAST_MAX_PEM_ROWS = 2_000_000


def link_cells(cells, pem, k: int = 3, num_partitions: int | None = None):
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

    from .. import default_num_partitions

    if num_partitions is None:
        num_partitions = default_num_partitions()

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


# ---------------------------------------------------------------------
# Koala-shaped nested output (≙ job_service.py:100-230: per-row
# linked_entities with per-cell candidates, plus the column-level
# classification built from the A7 histogram+argmax shape)
# ---------------------------------------------------------------------

COARSE_TYPES = ("PERSON", "ORG", "LOC", "OTHER")
_NO_CAND_DESC = "no candidates found"

TYPE_STRUCT = pa.struct([("id", pa.string()), ("name", pa.string())])
CAND_STRUCT = pa.struct([
    ("id", pa.string()), ("name", pa.string()), ("score", pa.float64()),
    ("is_match", pa.bool_()), ("description", pa.string()),
    ("types", pa.list_(TYPE_STRUCT)),
])


def entity_coarse_type(vals) -> list[str]:
    """Deterministic coarse type per entity id — the engine's stand-in
    for the reference's ``span.coarse_mention_type`` (job_service.py:139):
    md5 is the PORTABLE contract (hashlib == DuckDB ``md5()``), so the
    oracle replays the assignment bit-exactly."""
    import hashlib

    return [COARSE_TYPES[int(hashlib.md5(v.encode()).hexdigest()[0], 16) % 4]
            for v in vals]


def koala_table_link(cells, pem, k: int = 3, num_partitions: int | None = None):
    """Nest ``link_cells``'s flat top-k into the reference's Koala
    result rows (job_service.py:181-230): one row per input CELL —
    candidates group by (row_id, col), so same-row cells in different
    columns keep separate candidate lists — with

      row_id, idRow ("row_<id>"), data (list<string> of the row's cell
      values), idColumn, candidates (list<struct{id, name, score,
      is_match, description, types}>), coarse (the cell's coarse type),
      col_coarse / n_cells (column classification: most frequent coarse
      type by histogram+argmax — the A7 shape — and the cell count,
      constant columns ≙ ``classified_columns`` / ``column_types``).

    Semantics mirrored from the reference: candidates are the per-cell
    top-k; the best candidate (rank 1) is flagged ``is_match`` and
    carries the cell's coarse type in ``types``; a cell with NO
    candidates emits one "null candidate" (id='null', name=surface,
    score=0, types empty — job_service.py:172-180) and contributes
    'OTHER' to the histogram.

    Scale shape: cells and flat candidate rows are co-partitioned by
    ONE keyed repartition on row_id; each partition nests its complete
    rows vectorized (offsets + ListArray/StructArray builds, no
    per-row Python beyond the md5 contract); the coarse histogram
    crosses to the driver as ≤4 rows per block."""
    from .. import default_num_partitions

    if num_partitions is None:
        num_partitions = default_num_partitions()
    flat = link_cells(cells, pem, k=k, num_partitions=num_partitions)

    def tag_cell(b: pa.Table) -> pa.Table:
        return pa.table({
            "row_id": b["row_id"], "col": b["col"], "surface": b["surface"],
            "rank": pa.nulls(b.num_rows, type=pa.int64()),
            "entity": pa.nulls(b.num_rows, type=pa.string()),
            "prob": pa.nulls(b.num_rows, type=pa.float64()),
            "kind": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
        })

    def tag_flat(b: pa.Table) -> pa.Table:
        return b.append_column("kind", pa.array(np.ones(b.num_rows, dtype=np.int8)))

    both = cells.map_batches(tag_cell, batch_format="pyarrow").union(
        flat.map_batches(tag_flat, batch_format="pyarrow")) \
        .repartition(num_blocks=num_partitions, keys=["row_id"], sort=False)

    def nest(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "row_id": pa.array([], type=pa.int64()),
            "col": pa.array([], type=pa.string()),
            "idRow": pa.array([], type=pa.string()),
            "data": pa.array([], type=pa.list_(pa.string())),
            "idColumn": pa.array([], type=pa.int64()),
            "candidates": pa.array([], type=pa.list_(CAND_STRUCT)),
            "coarse": pa.array([], type=pa.string()),
        })
        if b.num_rows == 0:
            return empty
        # split kinds BEFORE numpy conversion (null-bearing columns
        # otherwise convert to float64)
        iscell = pc.equal(b["kind"], 0)
        cellr = b.filter(iscell)
        flatr = b.filter(pc.invert(iscell))
        crow = cellr["row_id"].to_numpy(zero_copy_only=False)
        csurf = np.asarray(cellr["surface"].to_pylist(), dtype=object)
        ccol = np.asarray(cellr["col"].to_pylist(), dtype=object)
        frow = flatr["row_id"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        frank = flatr["rank"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        fent = np.asarray(flatr["entity"].to_pylist(), dtype=object)
        fprob = flatr["prob"].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        fcol = np.asarray(flatr["col"].to_pylist(), dtype=object)

        # candidates group by CELL = (row_id, col), not row_id alone —
        # two same-row cells in different columns must not merge.
        # Composite int key via a per-batch shared col→code mapping.
        uniq_cols, inv = np.unique(np.concatenate([ccol, fcol]),
                                   return_inverse=True)
        K = max(len(uniq_cols), 1)
        if len(crow) and int(np.abs(crow).max()) > (1 << 62) // K:
            raise ValueError("row_id × column-count overflows the "
                             "composite cell key; renumber row_id")
        ckey = crow * K + inv[:len(ccol)]
        fkey = frow * K + inv[len(ccol):]

        corder = np.argsort(ckey, kind="stable")
        crow, csurf, ccol, ckey = (crow[corder], csurf[corder],
                                   ccol[corder], ckey[corder])
        forder = np.lexsort((frank, fkey))
        fkey, fent, fprob = fkey[forder], fent[forder], fprob[forder]
        frow = fkey  # searchsorted below runs on the composite key

        lo = np.searchsorted(frow, ckey, side="left")
        hi = np.searchsorted(frow, ckey, side="right")
        n_cand = hi - lo
        has = n_cand > 0
        out_cnt = np.where(has, n_cand, 1)  # NIL cells get a null candidate
        out_row = np.repeat(np.arange(len(crow), dtype=np.int64), out_cnt)
        offs = np.arange(out_cnt.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(out_cnt) - out_cnt, out_cnt)
        j = np.minimum(lo[out_row] + offs, len(frow) - 1 if len(frow) else 0)
        hasx = has[out_row]

        ids = np.where(hasx, fent[j] if len(frow) else "", "null")
        names = np.where(hasx, fent[j] if len(frow) else "", csurf[out_row])
        scores = np.where(hasx, fprob[j] if len(frow) else 0.0, 0.0)
        match = hasx & (offs == 0)
        desc = np.where(hasx, "", _NO_CAND_DESC)

        # cell coarse: md5 type of the rank-1 entity; 'OTHER' for NIL
        top1 = np.where(has, fent[np.minimum(lo, len(frow) - 1 if len(frow) else 0)]
                        if len(frow) else "", "")
        coarse = np.asarray(entity_coarse_type(list(top1)), dtype=object)
        coarse[~has] = "OTHER"

        # types child list: one {coarse, coarse} struct on the match row
        t_off = np.r_[0, np.cumsum(match.astype(np.int64))].astype(np.int32)
        t_vals = pa.array(coarse[out_row][match], type=pa.string())
        types_arr = pa.ListArray.from_arrays(
            pa.array(t_off), pa.StructArray.from_arrays([t_vals, t_vals],
                                                        fields=list(TYPE_STRUCT)))
        cand_child = pa.StructArray.from_arrays([
            pa.array(ids, type=pa.string()),
            pa.array(names, type=pa.string()),
            pa.array(scores, type=pa.float64()),
            pa.array(match),
            pa.array(desc, type=pa.string()),
            types_arr,
        ], fields=list(CAND_STRUCT))
        c_off = np.r_[0, np.cumsum(out_cnt)].astype(np.int32)
        cands = pa.ListArray.from_arrays(pa.array(c_off), cand_child)

        d_off = np.arange(len(crow) + 1, dtype=np.int32)
        data = pa.ListArray.from_arrays(pa.array(d_off),
                                        pa.array(csurf, type=pa.string()))
        # idColumn: the integer column index when the col name IS one
        # (the HTTP facade passes str(target_idx)); other names → 0,
        # the reference's single-target default
        id_of = {c: int(c) if str(c).isdigit() else 0 for c in uniq_cols}
        idcol = np.asarray([id_of[c] for c in ccol], dtype=np.int64)
        return pa.table({
            "row_id": pa.array(crow, type=pa.int64()),
            "col": pa.array(ccol, type=pa.string()),
            "idRow": pa.array([f"row_{r}" for r in crow], type=pa.string()),
            "data": data,
            "idColumn": pa.array(idcol),
            "candidates": cands,
            "coarse": pa.array(coarse, type=pa.string()),
        })

    nested = both.map_batches(nest, batch_format="pyarrow",
                              batch_size=None).materialize()

    # A7 histogram+argmax for the column classification: ≤4 rows per
    # block cross to the driver
    def hist(b: pa.Table) -> pa.Table:
        vals, counts = np.unique(np.asarray(b["coarse"].to_pylist(), dtype=object),
                                 return_counts=True)
        return pa.table({"coarse": pa.array(vals, type=pa.string()),
                         "n": pa.array(counts, type=pa.int64())})

    agg: dict[str, int] = {}
    total = 0
    for r in nested.map_batches(hist, batch_format="pyarrow",
                                batch_size=None).take_all():
        agg[r["coarse"]] = agg.get(r["coarse"], 0) + r["n"]
        total += r["n"]
    col_coarse = min(agg.items(), key=lambda kv: (-kv[1], kv[0]))[0] if agg else "OTHER"

    def attach(b: pa.Table) -> pa.Table:
        return b.append_column(
            "col_coarse", pa.array([col_coarse] * b.num_rows, type=pa.string())
        ).append_column(
            "n_cells", pa.array(np.full(b.num_rows, total, dtype=np.int64)))

    return nested.map_batches(attach, batch_format="pyarrow")


def flatten_koala(nested):
    """Explode the Koala rows back to one row per candidate — the
    oracle-facing projection (the driver's hash gate compares flat
    tables; the nested shape itself is golden-tested in pytest)."""

    def explode(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "row_id": pa.array([], type=pa.int64()),
            "surface": pa.array([], type=pa.string()),
            "idx": pa.array([], type=pa.int64()),
            "cand_id": pa.array([], type=pa.string()),
            "cand_name": pa.array([], type=pa.string()),
            "score": pa.array([], type=pa.float64()),
            "is_match": pa.array([], type=pa.int64()),
            "type_id": pa.array([], type=pa.string()),
            "coarse": pa.array([], type=pa.string()),
            "col_coarse": pa.array([], type=pa.string()),
            "n_cells": pa.array([], type=pa.int64()),
        })
        if b.num_rows == 0:
            return empty
        cands = b["candidates"].combine_chunks()
        cnt = np.asarray(cands.value_lengths(), dtype=np.int64)
        rows = np.repeat(np.arange(b.num_rows, dtype=np.int64), cnt)
        offs = np.arange(cnt.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt)
        child = cands.flatten()
        tlen = np.asarray(child.field("types").value_lengths(), dtype=np.int64)
        tflat = np.asarray(child.field("types").flatten().field("id").to_pylist(),
                           dtype=object)
        type_id = np.full(len(child), "", dtype=object)
        type_id[tlen > 0] = tflat
        data0 = np.asarray(
            pc.list_element(b["data"], 0).to_pylist(), dtype=object)
        ridx = pa.array(rows, type=pa.int64())
        return pa.table({
            "row_id": b["row_id"].take(ridx),
            "surface": pa.array(data0[rows], type=pa.string()),
            "idx": pa.array(offs + 1, type=pa.int64()),
            "cand_id": child.field("id"),
            "cand_name": child.field("name"),
            "score": child.field("score"),
            "is_match": pa.array(
                np.asarray(child.field("is_match"), dtype=np.int64)),
            "type_id": pa.array(type_id, type=pa.string()),
            "coarse": b["coarse"].take(ridx),
            "col_coarse": b["col_coarse"].take(ridx),
            "n_cells": b["n_cells"].take(ridx),
        })

    return nested.map_batches(explode, batch_format="pyarrow")
