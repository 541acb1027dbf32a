"""embedding_kmeans: the integer-lattice deterministic k-means."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _reference_kmeans(vecs, k, n_iters):
    """Pure-python Lloyd on the same integer lattice: seeds = the k
    smallest vec_ids, argmin ties to the lowest cluster, round-half-up
    integer centroid means, empty clusters keep their centroid."""
    ids = sorted(vecs)
    Q = {i: [int(np.floor(x * (1 << 20) + 0.5)) for x in vecs[i]]
         for i in vecs}
    C = [list(Q[i]) for i in ids[:k]]

    def assign():
        out = {}
        for i in ids:
            best = None
            for c, cen in enumerate(C):
                d = sum((a - b) ** 2 for a, b in zip(Q[i], cen))
                if best is None or d < best[1]:
                    best = (c, d)
            out[i] = best
        return out

    for _ in range(n_iters):
        a = assign()
        for c in range(k):
            members = [i for i in ids if a[i][0] == c]
            if not members:
                continue
            n = len(members)
            C[c] = [(2 * sum(Q[i][d] for i in members) + n) // (2 * n)
                    for d in range(len(C[c]))]
    return assign()


def _write(tmp_path, vecs, name="sf"):
    d = tmp_path / name
    d.mkdir()
    ids = sorted(vecs)
    t = pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([vecs[i] for i in ids],
                              type=pa.list_(pa.float32())),
        "label": pa.array([0] * len(ids), type=pa.int32()),
    })
    pq.write_table(t, d / "embeddings.parquet")
    return str(d)


def test_kmeans_differential_vs_reference(ray_session, tmp_path):
    """Random corpus incl. a duplicate-of-seed vector (forces one
    cluster empty through the lowest-id tie rule) — engine must match
    the pure-python reference exactly."""
    from refined_ray.pipelines.queries_ext import q_embedding_kmeans

    rng = np.random.default_rng(42)
    vecs = {i: rng.normal(size=8).astype(np.float32) * 0.3
            for i in range(60)}
    vecs[1] = vecs[0].copy()  # seed 1 ties to seed 0 -> cluster 1 empties

    sf = _write(tmp_path, vecs)
    got = q_embedding_kmeans(sf, k=4, n_iters=3).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    want = _reference_kmeans(vecs, k=4, n_iters=3)

    assert len(got) == len(want)
    for row in got.itertuples(index=False):
        c, d = want[row.vec_id]
        assert (row.cluster, row.dist) == (c, d), row.vec_id
    # identical points must co-cluster with identical distance
    g = got.set_index("vec_id")
    assert g.loc[0].cluster == g.loc[1].cluster
    assert g.loc[0].dist == g.loc[1].dist
    assert set(got.cluster) <= set(range(4))


def test_kmeans_block_structure_invariance(ray_session, tmp_path):
    """The per-round fold is order-independent integer summation, so a
    64-block layout must produce the identical labeling as one block."""
    from refined_ray.pipelines.queries_ext import q_embedding_kmeans

    rng = np.random.default_rng(7)
    vecs = {i: rng.normal(size=16).astype(np.float32) * 0.3
            for i in range(300)}
    sf = _write(tmp_path, vecs)

    one = q_embedding_kmeans(sf).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)

    import ray.data as rd

    from refined_ray.pipelines.queries_ext import (
        _km_assign, _km_quantize, _KM_ITERS, _KM_K)

    # rebuild the pipeline over a shattered layout by monkeypatching is
    # intrusive; instead run the engine's own labeling math over a
    # repartitioned dataset via the public query on a re-sharded COPY
    import pyarrow.parquet as pq2
    d2 = tmp_path / "sharded"
    d2.mkdir()
    t = pq2.read_table(tmp_path / "sf" / "embeddings.parquet")
    pq2.write_table(t, d2 / "embeddings.parquet", row_group_size=5)
    many = q_embedding_kmeans(str(d2)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)

    assert one.equals(many)
