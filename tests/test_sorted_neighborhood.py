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


def test_fs_weights_vs_bruteforce(ray_session, tmp_path):
    """Fellegi-Sunter weights vs python replay: frequency-derived u,
    frozen m, per-field agreement; a duplicate-heavy field must get a
    LOW agreement weight (common values are weak evidence)."""
    import math
    import random

    from refined_ray.pipelines.queries_ext import (
        _FS_FIELDS, _FS_M, _SN_W, q_fs_weights)

    rng = random.Random(97)
    n = 60
    rows = []
    for k in range(n):
        rows.append((k, f"name {rng.randrange(0, 8):02d}",
                     f"brand{rng.randrange(0, 2)}",     # near-constant
                     f"type{rng.randrange(0, 12)}",     # diverse
                     rng.randrange(1, 5)))
    d = tmp_path / "sf2"
    d.mkdir()
    t = pa.table({
        "p_partkey": pa.array([r[0] for r in rows], type=pa.int64()),
        "p_name": pa.array([r[1] for r in rows]),
        "p_brand": pa.array([r[2] for r in rows]),
        "p_type": pa.array([r[3] for r in rows]),
        "p_size": pa.array([r[4] for r in rows], type=pa.int32()),
        "p_retailprice": pa.array([1.0] * n),
    })
    pq.write_table(t, d / "part.parquet", row_group_size=13)

    got = {(r.key_a, r.key_b): r.weight
           for r in q_fs_weights(str(d)).to_pandas().itertuples()}

    by_key = {r[0]: r for r in rows}
    u = {}
    for fi, f in enumerate(_FS_FIELDS):
        vals = [str(r[2 + fi]) for r in rows]
        cnt = {}
        for v in vals:
            cnt[v] = cnt.get(v, 0) + 1
        u[f] = sum(c * (c - 1) for c in cnt.values()) / (n * (n - 1))
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    want = {}
    for i in range(len(ordered)):
        for j in range(i + 1, min(i + _SN_W, len(ordered))):
            a, b = ordered[i][0], ordered[j][0]
            s = None
            for fi, f in enumerate(_FS_FIELDS):
                agree = str(by_key[a][2 + fi]) == str(by_key[b][2 + fi])
                term = (math.log(_FS_M / u[f]) if agree
                        else math.log((1 - _FS_M) / (1 - u[f])))
                s = term if s is None else s + term
            want[(a, b)] = float(f"{s:.6f}")
    assert got == want
    # evidence calibration: agreeing on the diverse field must add
    # more weight than agreeing on the near-constant one
    assert math.log(_FS_M / u["p_type"]) > math.log(_FS_M / u["p_brand"])


def test_fingerprint_cluster_vs_bruteforce(ray_session, tmp_path):
    """OpenRefine fingerprint keys: token-order and duplication
    variants MUST collide; distinct-name counting must survive the
    block structure."""
    import random
    import re

    from refined_ray.pipelines.queries_ext import q_fingerprint_cluster

    rng = random.Random(59)
    base = ["red widget", "blue bolt", "hot gear", "small ring"]
    names = []
    for _ in range(50):
        b = rng.choice(base)
        toks = b.split()
        variant = rng.choice([
            b, " ".join(reversed(toks)),
            " ".join(toks + [toks[0]]),     # duplicated token
            "  ".join(toks).upper(),        # case + whitespace
        ])
        names.append(variant)
    d = tmp_path / "sf3"
    d.mkdir()
    t = pa.table({
        "p_partkey": pa.array(range(len(names)), type=pa.int64()),
        "p_name": pa.array(names),
        "p_brand": pa.array(["b"] * len(names)),
        "p_type": pa.array(["t"] * len(names)),
        "p_size": pa.array([1] * len(names), type=pa.int32()),
        "p_retailprice": pa.array([1.0] * len(names)),
    })
    pq.write_table(t, d / "part.parquet", row_group_size=7)

    got = sorted(map(tuple, q_fingerprint_cluster(str(d)).to_pandas()
                     .itertuples(index=False, name=None)))

    groups = {}
    for nm in names:
        fp = " ".join(sorted(set(re.findall(r"[a-z0-9]+", nm.lower()))))
        groups.setdefault(fp, []).append(nm)
    want = sorted((fp, len(v), len(set(v))) for fp, v in groups.items())
    assert got == want
    assert len(got) == len(base)  # every variant collides to its base
