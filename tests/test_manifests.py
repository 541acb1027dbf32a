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
