"""sorted_neighborhood: Hernández-Stolfo windowed blocking."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_sorted_neighborhood_vs_bruteforce(ray_session, tmp_path):
    """Band-crossing correctness: duplicate names (rank ties broken
    by key), shattered row groups, and a window that must pair rows
    landing in DIFFERENT rank bands."""
    import random

    from refined_ray.pipelines.queries_ext import q_sorted_neighborhood

    rng = random.Random(83)
    names = [f"part {rng.randrange(0, 12):02d}" for _ in range(90)]
    names += ["aaa"] * 5 + ["zzz"] * 5  # heavy duplicate-name runs
    rows = list(enumerate(names))
    rng.shuffle(rows)

    d = tmp_path / "sf"
    d.mkdir()
    t = pa.table({
        "p_partkey": pa.array([k for k, _ in rows], type=pa.int64()),
        "p_name": pa.array([n for _, n in rows]),
        "p_brand": pa.array(["b"] * len(rows)),
        "p_type": pa.array(["t"] * len(rows)),
        "p_size": pa.array([1] * len(rows), type=pa.int32()),
        "p_retailprice": pa.array([1.0] * len(rows)),
    })
    pq.write_table(t, d / "part.parquet", row_group_size=11)

    W = 4
    got = sorted(map(tuple, q_sorted_neighborhood(str(d), w=W)
                     .to_pandas().itertuples(index=False, name=None)))

    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    want = sorted((ordered[i][0], ordered[j][0])
                  for i in range(len(ordered))
                  for j in range(i + 1, min(i + W, len(ordered))))
    assert got == want
