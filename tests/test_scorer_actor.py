"""GPU-shaped scorer path (round-2 verdict item #4): the actor-pool
variant with pool-sizing knobs (concurrency/num_gpus/batch_size), a
deliberately CPU-burning stand-in model, and length-bucketed feeding
must emit EXACTLY the stateless broadcast path's edges.

≙ reference RefinedModel.forward as an actor-pool stage
(refined_model.py:164-343) and sort-by-token-length collation
(preprocessing_utils.py:196-199).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _edges_set(edges):
    return {(r["a"], r["b"]) for r in edges.select_columns(["a", "b"]).take_all()}


def test_actor_scorer_matches_broadcast_path(ray_session):
    """score_pairs_actor (heavy stand-in model, small batches, pool of
    2-4 actors, length bucketing ON) == score_pairs_broadcast edges."""
    from refined_ray.stages.blocking import emit_block_keys
    from refined_ray.stages.pairs import enumerate_pairs
    from refined_ray.stages.scoring import (
        broadcast_payload_ref,
        score_pairs_actor,
        score_pairs_broadcast,
    )
    from refined_ray.pipelines.entity_resolution import build_payload

    payload = build_payload(SF).materialize()
    pairs = enumerate_pairs(emit_block_keys(payload), num_partitions=4) \
        .materialize()
    ref = broadcast_payload_ref(payload)

    _, edges_bcast = score_pairs_broadcast(pairs, payload, payload_ref=ref)
    _, edges_actor = score_pairs_actor(
        pairs, payload, payload_ref=ref,
        concurrency=(2, 4), batch_size=512,  # many small model batches
        length_bucket=True, burn_ms=2.0,     # CPU-burning stand-in model
    )
    b, a = _edges_set(edges_bcast), _edges_set(edges_actor)
    assert len(b) > 0
    assert b == a


def test_actor_scorer_length_bucket_preserves_rows(ray_session):
    """Within one batch, length-bucketed scoring must return the same
    rows IN THE CALLER'S ORDER (perm + inverse perm round-trip)."""
    import ray

    from refined_ray.stages.scoring import PairScorerBroadcast

    ids = np.array([1, 2, 3, 4], dtype=np.int64)
    rng = np.random.default_rng(7)
    sig = rng.integers(0, 1 << 15, size=(4, 8)).astype(np.uint16)
    emb = rng.standard_normal((4, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    heads = np.array([b"a", b"bb ccc dd", b"x y z", b"\xc3\xbcber stra\xc3\x9fe"],
                     dtype="S64")
    ref = ray.put((ids, sig, emb, heads))

    batch = pa.table({"a": pa.array([1, 3, 2], type=pa.int64()),
                      "b": pa.array([4, 2, 1], type=pa.int64())})
    plain = PairScorerBroadcast(ref)(batch)
    bucketed = PairScorerBroadcast(ref, length_bucket=True)(batch)
    assert plain.column_names == bucketed.column_names
    for c in plain.column_names:  # NaN-aware (jw/lev are NaN when decided)
        np.testing.assert_array_equal(
            plain[c].to_numpy(zero_copy_only=False),
            bucketed[c].to_numpy(zero_copy_only=False), err_msg=c)


def test_flagship_scorer_actor_matches_default(ray_session):
    """er_cluster_pages(scorer='actor') must produce the identical
    url→cluster_id mapping as the default path."""
    from refined_ray.pipelines.entity_resolution import er_cluster_pages

    base = {(r["url"], r["cluster_id"])
            for r in er_cluster_pages(SF).take_all()}
    actor = {(r["url"], r["cluster_id"])
             for r in er_cluster_pages(
                 SF, scorer="actor",
                 scorer_kwargs={"concurrency": (2, 4), "batch_size": 2048,
                                "burn_ms": 1.0}).take_all()}
    assert len(base) == 999
    assert base == actor
