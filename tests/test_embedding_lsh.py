"""Gates for the LSH-bucketed embedding near-dup scale path.

Two regimes:
- catalog regime (tau=0.45, exhaustive 32x2 geometry): equality with
  the exact all-pairs path is covered by the driver's DuckDB oracle
  (same SQL as embedding_pairs); here we assert parity with the exact
  engine path on the sf0.001 table.
- scale regime (tau=0.9, wide 16x8 bands): planted near-dup clusters
  against random background; precision must be exact (verify is an
  exact cosine), recall >= 0.95 per the banded LSH bound.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _brute_pairs(E: np.ndarray, tau: float) -> set:
    N = E / np.linalg.norm(E, axis=1, keepdims=True)
    S = N @ N.T
    i, j = np.nonzero(np.triu(S >= tau, k=1))
    return set(zip(i.tolist(), j.tolist()))


def test_lsh_matches_exact_path_at_catalog_threshold(ray_session):
    from refined_ray.pipelines.queries import q_embedding_pairs
    from refined_ray.pipelines.queries_ext import q_embedding_neardup_lsh

    exact = {(r["vec_a"], r["vec_b"], r["cos"])
             for r in q_embedding_pairs(SF).take_all()}
    lsh = {(r["vec_a"], r["vec_b"], r["cos"])
           for r in q_embedding_neardup_lsh(SF).take_all()}
    assert lsh == exact and len(exact) > 0


def test_lsh_scale_geometry_recall_and_exact_precision(ray_session, tmp_path):
    from refined_ray.pipelines.queries_ext import q_embedding_neardup_lsh

    rng = np.random.default_rng(13)
    dim, n_clusters, per_cluster, n_background = 32, 8, 5, 200
    rows = []
    for c in range(n_clusters):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        for _ in range(per_cluster):
            # small perturbation (norm ~0.23 vs unit base) → within-
            # cluster cosine ~0.97
            rows.append(base + 0.04 * rng.standard_normal(dim))
    for _ in range(n_background):
        rows.append(rng.standard_normal(dim))
    E = np.array(rows, dtype=np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(len(E), dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in E],
                              type=pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))

    tau = 0.9
    got = {(r["vec_a"], r["vec_b"]): r["cos"]
           for r in q_embedding_neardup_lsh(
               str(tmp_path), threshold=tau,
               n_bands=16, band_bits=8).take_all()}
    truth = _brute_pairs(E.astype(np.float64), tau)
    assert len(truth) >= n_clusters * (per_cluster * (per_cluster - 1) // 2) * 0.9

    # precision: every returned pair is a true pair (verify is exact)
    assert set(got) <= truth
    # recall at the banded-LSH bound
    recall = len(got) / len(truth)
    assert recall >= 0.95
    # reported cosines are the exact values, 6-decimal canonical
    N = E.astype(np.float64)
    N /= np.linalg.norm(N, axis=1, keepdims=True)
    for (a, b), cos in got.items():
        assert abs(cos - float(N[a] @ N[b])) < 1e-6
