"""Checkpoint/resume: stage skipped when manifest matches, invalidated
when the fingerprint changes (≙ reference artifact gating, SURVEY §4)."""

from __future__ import annotations

import tempfile

import pyarrow as pa


def test_stage_checkpoint_resume_and_invalidate(ray_session):
    import ray.data as rd

    from refined_ray.state.manifests import StageCheckpointer

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return rd.from_arrow(pa.table({"x": pa.array([1, 2, 3], type=pa.int64())}))

    with tempfile.TemporaryDirectory() as root:
        cp = StageCheckpointer(root)
        ds1 = cp.run_stage("s1", "fp-a", build)
        assert ds1.count() == 3 and calls["n"] == 1
        man = cp.manifest("s1")
        assert man["rows"] == 3 and man["fingerprint"] == "fp-a"
        assert len(man["partitions"]) >= 1

        # same fingerprint → skipped, parquet re-read
        ds2 = cp.run_stage("s1", "fp-a", build)
        assert ds2.count() == 3 and calls["n"] == 1

        # changed fingerprint → rebuilt
        ds3 = cp.run_stage("s1", "fp-b", build)
        assert ds3.count() == 3 and calls["n"] == 2
        assert cp.manifest("s1")["fingerprint"] == "fp-b"


def test_flagship_checkpoint_resume(ray_session, tmp_path):
    """Kill-and-rerun semantics: a second run with identical inputs
    rebuilds NOTHING; invalidating a mid-stage rebuilds it and
    everything after (≙ SURVEY §5 resume-mid-run test)."""
    from refined_ray.pipelines.entity_resolution import er_cluster_pages_checkpointed
    from refined_ray.state.manifests import StageCheckpointer
    from tests.conftest import SF_SMALL

    root = str(tmp_path / "cp")
    out1 = er_cluster_pages_checkpointed(SF_SMALL, root).to_pandas()
    cp = StageCheckpointer(root)
    stamps = {s: cp.manifest(s)["completed_at"] for s in ("payload", "pairs", "edges", "labels")}
    counters1 = {s: cp.manifest(s)["rows"] for s in stamps}

    # resume: same fingerprints -> all stages skipped (manifests untouched)
    out2 = er_cluster_pages_checkpointed(SF_SMALL, root).to_pandas()
    for s, t in stamps.items():
        assert cp.manifest(s)["completed_at"] == t, s
    a = out1.sort_values("url").reset_index(drop=True)
    b = out2.sort_values("url").reset_index(drop=True)
    assert a.equals(b)

    # mid-run failure simulation: invalidate 'edges' -> edges+labels
    # rebuild, payload+pairs untouched
    cp.invalidate_from("edges")
    cp.invalidate_from("labels")
    out3 = er_cluster_pages_checkpointed(SF_SMALL, root).to_pandas()
    assert cp.manifest("payload")["completed_at"] == stamps["payload"]
    assert cp.manifest("pairs")["completed_at"] == stamps["pairs"]
    assert cp.manifest("edges")["completed_at"] != stamps["edges"]
    assert cp.manifest("edges")["rows"] == counters1["edges"]
    c = out3.sort_values("url").reset_index(drop=True)
    assert a.equals(c)


def test_pairs_manifest_records_skew_counters(ray_session, tmp_path):
    from refined_ray.pipelines.entity_resolution import er_cluster_pages_checkpointed
    from refined_ray.state.manifests import StageCheckpointer
    from tests.conftest import SF_SMALL

    root = str(tmp_path / "cp2")
    er_cluster_pages_checkpointed(SF_SMALL, root).count()
    man = StageCheckpointer(root).manifest("pairs")
    c = man["counters"]
    assert set(c) >= {"n_capped_pairs", "max_block_size_seen", "pair_cap"}
    assert c["pair_cap"] == 64 and c["max_block_size_seen"] >= 1
