"""host_triangles: oriented-wedge triangle counting."""
import itertools

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _reference(doc_ids, rels, mod):
    E = set()
    for d in doc_ids:
        for a, b in rels:
            s, t = d % mod, (a * d + b) % mod
            if s != t:
                E.add((min(s, t), max(s, t)))
    adj = {}
    for x, y in E:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    out = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                out[n] = out.get(n, 0) + 1
    return out


def _write(tmp_path, doc_ids, name):
    d = tmp_path / name
    d.mkdir()
    t = pa.table({
        "doc_id": pa.array(doc_ids, type=pa.int64()),
        "text": pa.array(["x"] * len(doc_ids)),
        "lang": pa.array(["en"] * len(doc_ids)),
        "source": pa.array(["s"] * len(doc_ids)),
        "n_chars": pa.array([1] * len(doc_ids), type=pa.int64()),
    })
    pq.write_table(t, d / "documents.parquet", row_group_size=7)
    return str(d)


def test_host_triangles_vs_bruteforce(ray_session, tmp_path):
    """Random residue subsets drive which edges exist; the engine must
    match the brute-force per-node counts, including duplicate doc_ids
    collapsing to one edge."""
    import random

    from refined_ray.pipelines.queries_webtext import (
        _PR_MOD, _TRI_RELS, q_host_triangles)

    rng = random.Random(7)
    resids = rng.sample(range(_PR_MOD), 18)
    doc_ids = [r + 30 * rng.randrange(0, 5) for r in resids] \
        + [resids[0], resids[0] + 60]  # duplicate-edge fodder

    sf = _write(tmp_path, doc_ids, "sf")
    got = {r.host: r.n_triangles
           for r in q_host_triangles(sf).to_pandas().itertuples()}
    want = _reference(doc_ids, _TRI_RELS, _PR_MOD)
    assert got == want
    assert sum(got.values()) % 3 == 0  # each triangle credits 3 hosts


def test_host_triangles_triangle_free(ray_session, tmp_path):
    """A single residue yields a star — triangle-free; the typed-empty
    short-circuit must return zero rows WITH the output schema."""
    from refined_ray.pipelines.queries_webtext import q_host_triangles

    sf = _write(tmp_path, [0, 30, 60], "sf2")
    got = q_host_triangles(sf)
    assert got.count() == 0
    # schema survives (Ray's to_pandas drops columns on 0-row data,
    # but the Dataset schema is what downstream stages consume)
    assert got.schema().names == ["host", "n_triangles"]
