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


def _sum_pairs(ds, keys) -> int:
    """Σ C(group_size, 2) via grouped count + map_batches fold."""
    from ray.data.aggregate import Count, Sum

    counts = ds.groupby(keys).aggregate(Count(alias_name="n"))

    def pairs(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"p": pa.array(n * (n - 1) // 2, type=pa.int64())})

    folded = counts.map_batches(pairs, batch_format="pyarrow").aggregate(Sum("p", alias_name="p"))
    return int(folded["p"] or 0)


def pairwise_prf(assignments, pred_col: str, true_col: str) -> dict:
    """assignments: Dataset with one row per item, columns pred_col and
    true_col.  Returns tp/fp/fn + precision/recall/f1."""
    tp = _sum_pairs(assignments, [pred_col, true_col])
    pred = _sum_pairs(assignments, [pred_col])
    true = _sum_pairs(assignments, [true_col])
    fp, fn = pred - tp, true - tp
    precision = tp / pred if pred else 1.0
    recall = tp / true if true else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn,
            "precision": precision, "recall": recall, "f1": f1}


def bcubed_prf(assignments, pred_col: str, true_col: str,
               num_partitions: int = 8) -> dict:
    """B-cubed precision/recall/F1 — the per-item complement to
    ``pairwise_prf`` (pairwise over-weights large clusters; B³ weighs
    every item equally; Bagga & Baldwin 1998 / Amigó et al. 2009).

    Same 10^12-row scale shape as pairwise: item rows reduce to the
    (pred, true) CELL table via one grouped count, cell terms attach
    cluster/entity sizes via two narrow hash joins, and the items
    table is never iterated per item:

      P_b3 = Σ_cells n_ce²/n_c / N      R_b3 = Σ_cells n_ce²/n_e / N
    """
    from ray.data.aggregate import Count, Sum

    from .. import scrub_empty_blocks

    # grouped counts can emit zero-column empty blocks (Ray 2.49);
    # scrub before the hash joins or their finalize raises ArrowInvalid
    cells = scrub_empty_blocks(assignments.groupby([pred_col, true_col])
                               .aggregate(Count(alias_name="n_ce")).materialize())
    csize = scrub_empty_blocks(assignments.groupby(pred_col)
                               .aggregate(Count(alias_name="n_c")).materialize())
    esize = scrub_empty_blocks(assignments.groupby(true_col)
                               .aggregate(Count(alias_name="n_e")).materialize())
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
    joined = out.join(gt, join_type="inner", num_partitions=8,
                      on=("url",)).materialize()  # consumed by 6 grouped counts
    m = pairwise_prf(joined, "cluster_id", "entity_id")
    m.update(bcubed_prf(joined, "cluster_id", "entity_id"))
    return pa.table({k: pa.array([float(v) if isinstance(v, float) else v])
                     for k, v in m.items()})
