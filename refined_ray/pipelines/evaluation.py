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
    m = pairwise_prf(joined, "cluster_id", "entity_id")
    return pa.table({k: pa.array([float(v) if isinstance(v, float) else v])
                     for k, v in m.items()})
