"""Evaluation: distributed pairwise precision/recall/F1 for clustering.

≙ the reference's Metrics accumulation + P/R/F1 math
(evaluation/metrics.py:8-88, my_tests/accuracy.py:69-89), re-expressed
so NO pair is ever materialized: pairwise counts over a clustering are
sums of n·(n-1)/2 over group sizes, so three grouped counts give

  tp   = Σ over (pred_cluster, true_entity) cells of C(n_ce, 2)
  pred = Σ over pred clusters of C(n_c, 2);  fp = pred − tp
  true = Σ over true entities of C(n_e, 2);  fn = true − tp

Each is a ``groupby().count()`` (shuffle) + a vectorized fold — this is
exactly how pairwise F1 stays computable at 10^12 rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _cells(assignments, pred_col: str, true_col: str):
    """The (pred, true, n_ce) CELL table — the ONE items-wide shuffle
    both metric families reduce through.  Materialized + scrubbed
    (Ray 2.49 grouped counts can emit zero-column empty blocks that
    crash downstream join/groupby finalize)."""
    from ray.data.aggregate import Count

    from .. import scrub_empty_blocks

    return scrub_empty_blocks(
        assignments.groupby([pred_col, true_col])
        .aggregate(Count(alias_name="n_ce")).materialize())


def _sum_pairs_from_sizes(sizes, col: str) -> int:
    """Σ C(size, 2) over a (…, col) size table."""
    from ray.data.aggregate import Sum

    def pairs(b: pa.Table) -> pa.Table:
        n = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"p": pa.array(n * (n - 1) // 2, type=pa.int64())})

    folded = sizes.map_batches(pairs, batch_format="pyarrow") \
                  .aggregate(Sum("p", alias_name="p"))
    return int(folded["p"] or 0)


# under this many cells the metric folds run as driver numpy over the
# already-aggregated cell table (ONE dataset execution total); above it
# every fold stays a distributed groupby/join chain
CELLS_DRIVER_MAX_ROWS = 5_000_000


def _cells_to_numpy(cells, pred_col: str, true_col: str):
    """Counted-budget driver pull of the cell table (24 B+/cell).
    Returns (pred, true, n_ce) arrays or None when over budget."""
    if cells.count() > CELLS_DRIVER_MAX_ROWS:
        return None
    p_parts, t_parts, n_parts = [], [], []
    for b in cells.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        # native dtypes where possible (int keys sort ~20× faster than
        # object arrays); strings come back as object arrays anyway
        p_parts.append(b[pred_col].to_numpy(zero_copy_only=False))
        t_parts.append(b[true_col].to_numpy(zero_copy_only=False))
        n_parts.append(b["n_ce"].to_numpy(zero_copy_only=False).astype(np.int64))
    if not n_parts:
        return (np.empty(0, object), np.empty(0, object),
                np.empty(0, np.int64))
    return (np.concatenate(p_parts), np.concatenate(t_parts),
            np.concatenate(n_parts))


def pairwise_prf(assignments, pred_col: str, true_col: str,
                 cells=None) -> dict:
    """assignments: Dataset with one row per item, columns pred_col and
    true_col.  Returns tp/fp/fn + precision/recall/f1.

    Scale shape: ONE items-wide grouped count (the cell table, pass a
    precomputed one via ``cells`` to share it with ``bcubed_prf``);
    cluster/entity sizes are Σ n_ce over the (small) cell table, never
    a second pass over items.  Under CELLS_DRIVER_MAX_ROWS the folds
    are driver numpy (counted budget, the flagship's guard pattern);
    beyond it they stay distributed groupby chains."""
    from ray.data.aggregate import Sum

    if cells is None:
        cells = _cells(assignments, pred_col, true_col)
    pulled = _cells_to_numpy(cells, pred_col, true_col)
    if pulled is not None:
        p, t, n = pulled

        def sum_pairs(sizes: np.ndarray) -> int:
            return int(np.sum(sizes * (sizes - 1) // 2))

        def group_sizes(keys: np.ndarray) -> np.ndarray:
            order = np.argsort(keys, kind="stable")
            k = keys[order]
            seg = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
            return np.add.reduceat(n[order], seg) if len(k) else \
                np.empty(0, np.int64)

        tp = sum_pairs(n)
        pred = sum_pairs(group_sizes(p))
        true = sum_pairs(group_sizes(t))
    else:
        tp = _sum_pairs_from_sizes(cells, "n_ce")
        pred = _sum_pairs_from_sizes(
            cells.groupby(pred_col).aggregate(Sum("n_ce", alias_name="n")), "n")
        true = _sum_pairs_from_sizes(
            cells.groupby(true_col).aggregate(Sum("n_ce", alias_name="n")), "n")
    fp, fn = pred - tp, true - tp
    precision = tp / pred if pred else 1.0
    recall = tp / true if true else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn,
            "precision": precision, "recall": recall, "f1": f1}


def bcubed_prf(assignments, pred_col: str, true_col: str,
               num_partitions: int = 8, cells=None) -> dict:
    """B-cubed precision/recall/F1 — the per-item complement to
    ``pairwise_prf`` (pairwise over-weights large clusters; B³ weighs
    every item equally; Bagga & Baldwin 1998 / Amigó et al. 2009).

    Same 10^12-row scale shape as pairwise: item rows reduce to the
    (pred, true) CELL table via one grouped count, cell terms attach
    cluster/entity sizes via two narrow hash joins, and the items
    table is never iterated per item:

      P_b3 = Σ_cells n_ce²/n_c / N      R_b3 = Σ_cells n_ce²/n_e / N
    """
    from ray.data.aggregate import Sum

    from .. import scrub_empty_blocks

    if cells is None:
        cells = _cells(assignments, pred_col, true_col)
    pulled = _cells_to_numpy(cells, pred_col, true_col)
    if pulled is not None:  # driver fast path (counted budget)
        p, t, n = pulled
        n_items = float(n.sum())
        if n_items == 0:  # vacuous clustering: perfect by convention
            return {"b3_precision": 1.0, "b3_recall": 1.0, "b3_f1": 1.0}

        def size_of(keys: np.ndarray) -> np.ndarray:
            order = np.argsort(keys, kind="stable")
            k, nn = keys[order], n[order].astype(np.float64)
            seg = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
            sizes = np.add.reduceat(nn, seg)
            gid = np.cumsum(np.r_[True, k[1:] != k[:-1]]) - 1
            out = np.empty(len(k))
            out[order] = sizes[gid]
            return out

        nf = n.astype(np.float64)
        precision = float(np.sum(nf * nf / size_of(p)) / n_items)
        recall = float(np.sum(nf * nf / size_of(t)) / n_items)
        f1 = 2 * precision * recall / (precision + recall) \
            if precision + recall else 0.0
        return {"b3_precision": precision, "b3_recall": recall, "b3_f1": f1}

    # distributed path: cluster/entity sizes are Σ n_ce over the CELL
    # table — items are shuffled exactly once, downstream is cells-sized
    csize = scrub_empty_blocks(
        cells.groupby(pred_col).aggregate(Sum("n_ce", alias_name="n_c"))
        .materialize())
    esize = scrub_empty_blocks(
        cells.groupby(true_col).aggregate(Sum("n_ce", alias_name="n_e"))
        .materialize())
    joined = cells.join(csize, join_type="inner",
                        num_partitions=num_partitions, on=(pred_col,)) \
                  .join(esize, join_type="inner",
                        num_partitions=num_partitions, on=(true_col,))

    def terms(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            z = pa.array([], type=pa.float64())
            return pa.table({"p": z, "r": z, "n": z})
        n_ce = b["n_ce"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_c = b["n_c"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_e = b["n_e"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"p": pa.array(n_ce * n_ce / n_c),
                         "r": pa.array(n_ce * n_ce / n_e),
                         "n": pa.array(n_ce)})

    agg = joined.map_batches(terms, batch_format="pyarrow").aggregate(
        Sum("p", alias_name="p"), Sum("r", alias_name="r"),
        Sum("n", alias_name="n"))
    n_items = float(agg["n"] or 0.0)
    precision = (agg["p"] or 0.0) / n_items if n_items else 1.0
    recall = (agg["r"] or 0.0) / n_items if n_items else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"b3_precision": precision, "b3_recall": recall, "b3_f1": f1}


def er_quality(sf_dir: str, amplify: int = 1, fatten: int = 1):
    """Flagship-pipeline quality vs the synthetic ground truth →
    one-row Table (the driver-visible metrics artifact)."""
    from .. import read_parquet_clean
    from ..sources.webpages import ensure_webpages
    from .entity_resolution import er_cluster_pages

    out = er_cluster_pages(sf_dir, amplify=amplify, fatten=fatten)
    gt = read_parquet_clean(ensure_webpages(sf_dir, amplify=amplify, fatten=fatten),
                            columns=["url", "entity_id"])
    joined = out.join(gt, join_type="inner", num_partitions=8, on=("url",))
    cells = _cells(joined, "cluster_id", "entity_id")  # the one items shuffle
    m = pairwise_prf(joined, "cluster_id", "entity_id", cells=cells)
    m.update(bcubed_prf(joined, "cluster_id", "entity_id", cells=cells))
    return pa.table({k: pa.array([float(v) if isinstance(v, float) else v])
                     for k, v in m.items()})


def error_pairs(assignments, pred_col: str, true_col: str, id_col: str,
                per_group_cap: int = 100, num_partitions: int = 8):
    """Qualitative FP/FN PAIR dump (≙ the reference's error analysis,
    evaluation.py:107-124 / my_tests/error_analysis.py).

    FP = same predicted cluster, different truth; FN = same truth,
    different predicted cluster.  Pairs are enumerated ONLY within one
    group at a time after a keyed repartition (groups co-located), with
    a per-group cap so one giant broken cluster cannot explode the dump
    — capped groups are flagged in the ``capped`` column, never silent.
    Returns (id_a, id_b, kind, capped).
    """
    import pyarrow as pa

    def _emit(kind: str, key_col: str, other_col: str):
        def em(b: pa.Table) -> pa.Table:
            empty = pa.table({"id_a": pa.array([], type=pa.string()),
                              "id_b": pa.array([], type=pa.string()),
                              "kind": pa.array([], type=pa.string()),
                              "capped": pa.array([], type=pa.bool_())})
            if b.num_rows == 0:
                return empty
            import numpy as np

            keys = np.asarray(b[key_col].to_pylist(), dtype=object)
            other = np.asarray(b[other_col].to_pylist(), dtype=object)
            ids = np.asarray(b[id_col].to_pylist(), dtype=object)
            order = np.argsort(keys, kind="stable")
            keys, other, ids = keys[order], other[order], ids[order]
            seg = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
            sizes = np.diff(np.r_[seg, len(keys)])
            out_a, out_b, out_cap = [], [], []
            for s, n in zip(seg, sizes):
                if n < 2:
                    continue
                i, j = np.triu_indices(n, 1)
                bad = other[s + i] != other[s + j]
                i, j = i[bad], j[bad]
                capped = len(i) > per_group_cap
                if capped:
                    i, j = i[:per_group_cap], j[:per_group_cap]
                a, c = ids[s + i], ids[s + j]
                lo, hi = np.minimum(a, c), np.maximum(a, c)
                out_a.append(lo)
                out_b.append(hi)
                out_cap.append(np.full(len(lo), capped))
            if not out_a:
                return empty
            a = np.concatenate(out_a)
            return pa.table({
                "id_a": pa.array(a, type=pa.string()),
                "id_b": pa.array(np.concatenate(out_b), type=pa.string()),
                "kind": pa.array([kind] * len(a), type=pa.string()),
                "capped": pa.array(np.concatenate(out_cap), type=pa.bool_()),
            })

        part = assignments.repartition(num_blocks=num_partitions,
                                       keys=[key_col], sort=False)
        return part.map_batches(em, batch_format="pyarrow", batch_size=None)

    fp = _emit("fp", pred_col, true_col)
    fn = _emit("fn", true_col, pred_col)
    return fp.union(fn)


def er_errors(sf_dir: str, max_rows: int = 1000):
    """FP/FN url pairs of the flagship run vs ground truth (bounded
    qualitative dump; empty when F1 is 1.0)."""
    from .. import read_parquet_clean
    from ..sources.webpages import ensure_webpages
    from .entity_resolution import er_cluster_pages

    out = er_cluster_pages(sf_dir)
    gt = read_parquet_clean(ensure_webpages(sf_dir),
                            columns=["url", "entity_id"])
    joined = out.join(gt, join_type="inner", num_partitions=8, on=("url",))
    return error_pairs(joined, "cluster_id", "entity_id", "url").limit(max_rows)
