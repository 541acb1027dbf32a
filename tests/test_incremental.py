"""Gates for incremental ER ingest (er_cluster_incremental).

The incremental run (base 4/5 checkpointed, delta 1/5 folded in) must
produce EXACTLY the clustering of the full-corpus run: per-page band
keys don't depend on other pages, the scorer is deterministic, and
connectivity over (base page→cluster edges) ∪ (delta edges) preserves
min-page_id labels.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_incremental_matches_full_run(ray_session, tmp_path):
    from refined_ray.pipelines.entity_resolution import (
        er_cluster_incremental,
        er_cluster_pages,
    )

    full = {(r["url"], r["cluster_id"]) for r in er_cluster_pages(SF).take_all()}
    incr = {(r["url"], r["cluster_id"])
            for r in er_cluster_incremental(SF, str(tmp_path / "ck")).take_all()}
    assert incr == full and len(full) == 999


def test_incremental_second_call_reuses_base_checkpoint(ray_session, tmp_path):
    import json
    import os

    from refined_ray.pipelines.entity_resolution import er_cluster_incremental

    root = str(tmp_path / "ck2")
    first = {(r["url"], r["cluster_id"])
             for r in er_cluster_incremental(SF, root).take_all()}
    # base stages are checkpointed with chained fingerprints
    man = json.load(open(os.path.join(root, "manifest", "stage=labels_base.json")))
    stamp = man["completed_at"]
    second = {(r["url"], r["cluster_id"])
              for r in er_cluster_incremental(SF, root).take_all()}
    man2 = json.load(open(os.path.join(root, "manifest", "stage=labels_base.json")))
    assert second == first
    assert man2["completed_at"] == stamp  # base was NOT recomputed
