"""edit_distance_join: Ed-Join q-gram prefix filtering + batched DP."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _write(tmp_path, names):
    d = tmp_path / "sf"
    d.mkdir()
    t = pa.table({
        "p_partkey": pa.array(range(len(names)), type=pa.int64()),
        "p_name": pa.array(names),
        "p_brand": pa.array(["b"] * len(names)),
        "p_type": pa.array(["t"] * len(names)),
        "p_size": pa.array([1] * len(names), type=pa.int32()),
        "p_retailprice": pa.array([1.0] * len(names)),
    })
    pq.write_table(t, d / "part.parquet")
    return str(d)


def test_edit_distance_join_vs_bruteforce(ray_session, tmp_path):
    """Adversarial corpus: short strings (the sentinel-bucket path),
    short-vs-longer pairs a q-gram posting alone would MISS, repeated
    grams, near-threshold ed=2 vs ed=3 neighbours, and duplicated
    rows (the distinct stage must collapse them)."""
    import random

    from refined_ray.pipelines.queries_ext import (
        _lev_batch, q_edit_distance_join)

    rng = random.Random(17)
    names = [
        "", "a", "ab", "abc",          # all <= q-1+tau: sentinel bucket
        "abcd", "abcde",               # short-vs-longer boundary pairs
        "gear", "gears", "fears", "pearl",
        "widget", "widgets", "wadget", "woduet",
        "aaaa", "aaab", "aaaaaa",      # repeated grams
        "spring steel bolt", "spring steel bolts",
        "sprung steel bolt", "totally different name",
    ]
    names += ["".join(rng.choice("abcdef")
                      for _ in range(rng.randrange(4, 10)))
              for _ in range(30)]
    rows = names * 2 + names[:5]  # duplicates at the row level

    sf = _write(tmp_path, rows)
    got = sorted(map(tuple, q_edit_distance_join(sf).to_pandas()
                     [["name_a", "name_b", "dist"]]
                     .itertuples(index=False, name=None)))

    uniq = sorted(set(names))
    want = []
    for i in range(len(uniq)):
        for j in range(i + 1, len(uniq)):
            d = _lev(uniq[i], uniq[j])
            if d <= 2:
                want.append((uniq[i], uniq[j], d))
    assert got == sorted(want)

    # the batched DP itself, against the scalar reference on ragged pairs
    a = [uniq[i] for i in range(0, len(uniq), 2)]
    b = [uniq[i] for i in range(1, len(uniq), 2)][:len(a)]
    a = a[:len(b)]
    assert _lev_batch(a, b, 99).tolist() == [_lev(x, y)
                                             for x, y in zip(a, b)]


def test_edit_distance_join_tau1(ray_session, tmp_path):
    """Non-default threshold: tau=1 changes the prefix length AND the
    sentinel bound (grams <= q*tau = 2) — brute-force parity on a
    random corpus with planted ed-1 neighbours."""
    import random

    from refined_ray.pipelines.queries_ext import q_edit_distance_join

    rng = random.Random(43)
    names = ["".join(rng.choice("abcd") for _ in range(rng.randrange(1, 8)))
             for _ in range(40)]
    names += ["gear", "gears", "gearx", "bear"]  # ed-1 chain

    sf = _write(tmp_path, names)
    got = sorted(map(tuple, q_edit_distance_join(sf, tau=1).to_pandas()
                     [["name_a", "name_b", "dist"]]
                     .itertuples(index=False, name=None)))
    uniq = sorted(set(names))
    want = sorted((uniq[i], uniq[j], _lev(uniq[i], uniq[j]))
                  for i in range(len(uniq))
                  for j in range(i + 1, len(uniq))
                  if _lev(uniq[i], uniq[j]) <= 1)
    assert got == want
