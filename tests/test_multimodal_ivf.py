"""Gates for frame sampling and cell-partitioned IVF storage."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_frame_sampler_fanout_and_stride(ray_session):
    import ray.data as rd

    from refined_ray.stages.multimodal import frame_sample_stage

    blob = bytes(range(256)) * 10  # 10 frames of 256 bytes
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([7], type=pa.int64()),
        "media": pa.array([blob], type=pa.binary()),
    }))
    rows = frame_sample_stage(ds, frame_bytes=256, stride=4).take_all()
    assert [r["frame_idx"] for r in rows] == [0, 4, 8]
    assert all(r["n_frames"] == 10 for r in rows)
    assert all(len(r["frame"]) == 256 for r in rows)
    assert rows[0]["frame"] == bytes(range(256))


def test_ivf_partitioned_matches_inmap_ivf(ray_session):
    from refined_ray.pipelines.queries_ext import q_ann_ivf, q_ann_ivf_partitioned

    base = {(r["query_id"], r["neighbor_id"], r["rank"])
            for r in q_ann_ivf(SF).take_all()}
    part = {(r["query_id"], r["neighbor_id"], r["rank"])
            for r in q_ann_ivf_partitioned(SF).take_all()}
    # same centroids, same probe sets → identical results; only the
    # storage layout (partitioned parquet + pruned read) differs
    assert base == part
