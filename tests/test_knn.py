"""knn_classify: exact integer-lattice k-NN majority-vote classification."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _reference_knn(vecs, labels, k):
    """Pure-python brute force on the same lattice: neighbours by
    (dist ASC, vec_id ASC), modal label with ties to the smallest."""
    ids = sorted(vecs)
    Q = {i: [int(np.floor(x * (1 << 20) + 0.5)) for x in vecs[i]]
         for i in vecs}
    out = {}
    for i in ids:
        cand = sorted(
            (sum((a - b) ** 2 for a, b in zip(Q[i], Q[j])), j)
            for j in ids if j != i)[:k]
        counts = {}
        for _, j in cand:
            counts[labels[j]] = counts.get(labels[j], 0) + 1
        pred = min(counts, key=lambda l: (-counts[l], l))
        out[i] = pred
    return out


def _write(tmp_path, vecs, labels, name="sf"):
    d = tmp_path / name
    d.mkdir()
    ids = sorted(vecs)
    t = pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([vecs[i] for i in ids],
                              type=pa.list_(pa.float32())),
        "label": pa.array([labels[i] for i in ids], type=pa.int32()),
    })
    pq.write_table(t, d / "embeddings.parquet")
    return str(d)


def test_knn_differential_vs_bruteforce(ray_session, tmp_path):
    """Random corpus with planted DUPLICATE vectors (distance-0 ties,
    exercising the (dist, vec_id) tie order) and few labels (forcing
    frequent vote ties, exercising the smallest-label rule)."""
    from refined_ray.pipelines.queries_ext import q_knn_classify

    rng = np.random.default_rng(11)
    vecs = {i: rng.normal(size=8).astype(np.float32) * 0.3
            for i in range(80)}
    # duplicate clumps: 3 copies of vec 0, 2 copies of vec 10
    vecs[1] = vecs[0].copy()
    vecs[2] = vecs[0].copy()
    vecs[11] = vecs[10].copy()
    labels = {i: int(rng.integers(0, 3)) for i in vecs}

    sf = _write(tmp_path, vecs, labels)
    got = q_knn_classify(sf, k=4).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    want = _reference_knn(vecs, labels, k=4)

    assert len(got) == len(want)
    for row in got.itertuples(index=False):
        assert row.pred == want[row.vec_id], row.vec_id
        assert row.label == labels[row.vec_id]
        assert row.correct == int(row.pred == row.label)


def test_knn_chunk_and_block_invariance(ray_session, tmp_path):
    """The per-chunk partial top-k composes under the same total order
    as the global fold, so chunk count and parquet row-group layout
    must not perturb a single prediction."""
    from refined_ray.pipelines.queries_ext import q_knn_classify

    rng = np.random.default_rng(5)
    vecs = {i: rng.normal(size=16).astype(np.float32) * 0.3
            for i in range(150)}
    labels = {i: int(rng.integers(0, 4)) for i in vecs}
    sf = _write(tmp_path, vecs, labels)

    one = q_knn_classify(sf, n_chunks=1).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)

    d2 = tmp_path / "sharded"
    d2.mkdir()
    t = pq.read_table(tmp_path / "sf" / "embeddings.parquet")
    pq.write_table(t, d2 / "embeddings.parquet", row_group_size=7)
    many = q_knn_classify(str(d2), n_chunks=6).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)

    assert one.equals(many)


def test_knn_fewer_candidates_than_k(ray_session, tmp_path):
    """3 vectors with k=5: every vector has only 2 real neighbours;
    the masked self-distance sentinel must NOT leak into the vote
    (regression — singleton chunks emitted dist=int64.max self rows
    that let a vector vote for itself when < k candidates existed)."""
    from refined_ray.pipelines.queries_ext import q_knn_classify

    vecs = {0: np.array([0.1, 0.2], dtype=np.float32),
            1: np.array([0.1, 0.21], dtype=np.float32),
            2: np.array([0.9, 0.9], dtype=np.float32)}
    labels = {0: 7, 1: 7, 2: 3}
    sf = _write(tmp_path, vecs, labels)
    got = q_knn_classify(sf, k=5).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    # vec0: neighbours {1:7, 2:3} -> count tie -> smallest label 3
    # vec1: same -> 3;  vec2: {0:7, 1:7} -> 7
    assert list(got.pred) == [3, 3, 7]
    want = _reference_knn(vecs, labels, k=5)
    assert {r.vec_id: r.pred for r in got.itertuples()} == want
