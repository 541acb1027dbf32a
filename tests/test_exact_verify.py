"""Exact-verification tier of the flagship ER pipeline: borderline
MinHash estimates re-decided by exact set Jaccard."""

from __future__ import annotations

from itertools import combinations

import pyarrow.parquet as pq


def _pairwise(df, col):
    s = set()
    for _, g in df.groupby(col):
        s.update(combinations(sorted(g.url), 2))
    return s


def test_exact_verify_f1_is_one(ray_session):
    from refined_ray.pipelines.entity_resolution import er_cluster_pages
    from refined_ray.sources.webpages import ensure_webpages

    sf = "/root/testdata/sf0.001"
    out = er_cluster_pages(sf, exact_verify=True).to_pandas()
    gt = pq.read_table(ensure_webpages(sf),
                       columns=["url", "entity_id"]).to_pandas()
    m = out.merge(gt, on="url")
    P, T = _pairwise(m, "cluster_id"), _pairwise(m, "entity_id")
    assert P == T  # tp only: fp == fn == 0


def test_exact_sets_column_emitted(ray_session):
    import numpy as np

    from refined_ray.pipelines.entity_resolution import build_payload

    p = build_payload("/root/testdata/sf0.001", emit_sets=True).take(3)
    for row in p:
        s = np.frombuffer(row["set"], dtype="<u8")
        assert len(s) > 0
        assert (s[1:] > s[:-1]).all()  # sorted distinct (uint64 compare)
