"""Stage-level tests: extraction invariant, pair enumeration vs brute
force, clustering vs a BFS oracle, end-to-end F1."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMALL


def test_extract_text_byte_identical(ray_session):
    """The per-row invariant from BASELINE.json input_hint."""
    import ray.data as rd

    from refined_ray.sources.webpages import ensure_webpages
    from refined_ray.stages.extract import extract_pages

    path = ensure_webpages(SF_SMALL)
    pages = rd.read_parquet(path, columns=["url", "html", "text"])
    out = extract_pages(pages).to_pandas()
    assert len(out) > 0
    mismatches = out[out["extracted_text"] != out["text"]]
    assert len(mismatches) == 0, mismatches.head()
    assert "html" not in out.columns


def _brute_force_pairs(rows, max_block_size):
    """Oracle for make_pairs_partition: python dict grouping, with the
    capped-block semantics (chain + salted sub-block all-pairs)."""
    from collections import defaultdict

    from refined_ray.functions.hashing import splitmix64

    blocks = defaultdict(set)
    for k, v in rows:
        blocks[k].add(v)
    pairs = set()
    for k, ids in blocks.items():
        ids = sorted(ids)
        if len(ids) < 2:
            continue
        if len(ids) <= max_block_size:
            pairs.update((a, b) for a, b in combinations(ids, 2))
        else:
            pairs.update(zip(ids, ids[1:]))  # chain
            n_sub = -(-len(ids) // max_block_size)
            arr = np.array(ids, dtype=np.int64)
            salt = (splitmix64(arr.view(np.uint64)) % np.uint64(n_sub)).astype(int)
            sub = defaultdict(list)
            for i, v in zip(salt, ids):
                sub[i].append(v)
            for members in sub.values():
                pairs.update((min(a, b), max(a, b)) for a, b in combinations(sorted(members), 2))
    return pairs


def test_make_pairs_matches_brute_force():
    from refined_ray.stages.pairs import make_pairs_partition

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 40, size=500)
    ids = rng.integers(0, 120, size=500)
    batch = pa.table({"block_key": pa.array(keys, type=pa.int64()),
                      "page_id": pa.array(ids, type=pa.int64())})
    out = make_pairs_partition(batch, max_block_size=8)
    got = set(zip(out["a"].to_pylist(), out["b"].to_pylist()))
    want = _brute_force_pairs(zip(keys.tolist(), ids.tolist()), 8)
    assert got == want
    # capped flag set exactly for chain pairs from oversized blocks
    capped = out.filter(pa.compute.equal(out["capped"], 1))
    assert all(bs > 8 for bs in capped["block_size"].to_pylist())


def test_make_pairs_empty_and_singleton():
    from refined_ray.stages.pairs import make_pairs_partition

    empty = pa.table({"block_key": pa.array([], type=pa.int64()),
                      "page_id": pa.array([], type=pa.int64())})
    assert make_pairs_partition(empty).num_rows == 0
    single = pa.table({"block_key": pa.array([1, 2], type=pa.int64()),
                       "page_id": pa.array([10, 20], type=pa.int64())})
    assert make_pairs_partition(single).num_rows == 0


def _cc_oracle(vertices, edges):
    """BFS connected components; label = min vertex id."""
    adj = {v: set() for v in vertices}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {}
    for v in sorted(adj):
        if v in label:
            continue
        comp = [v]
        seen = {v}
        while comp:
            x = comp.pop()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    comp.append(y)
        m = min(seen)
        for x in seen:
            label[x] = m
    return label


@pytest.mark.parametrize("force_distributed", [False, True])
def test_connected_components_vs_bfs_oracle(ray_session, force_distributed):
    import ray.data as rd

    from refined_ray.stages.clustering import connected_components

    rng = np.random.default_rng(11)
    n = 300
    vs = np.arange(n, dtype=np.int64)
    m = 250
    ea = rng.integers(0, n, size=m).astype(np.int64)
    eb = rng.integers(0, n, size=m).astype(np.int64)
    keep = ea != eb
    ea, eb = ea[keep], eb[keep]
    # include a long chain (worst-case diameter for label propagation)
    chain = np.arange(200, 250, dtype=np.int64)
    ea = np.concatenate([ea, chain[:-1]])
    eb = np.concatenate([eb, chain[1:]])

    vertices = rd.from_arrow(pa.table({"page_id": pa.array(vs)}))
    edges = rd.from_arrow(pa.table({"a": pa.array(ea), "b": pa.array(eb)}))
    kw = {"driver_max_edges": 0} if force_distributed else {}
    got = dict(
        connected_components(vertices, edges, num_partitions=4, **kw)
        .to_pandas()[["page_id", "component"]]
        .itertuples(index=False, name=None)
    )
    want = _cc_oracle(vs.tolist(), zip(ea.tolist(), eb.tolist()))
    for v in vs.tolist():
        assert got[v] == want.get(v, v), f"vertex {v}"


def test_flagship_pipeline_f1_is_one(ray_session):
    from refined_ray.pipelines.entity_resolution import er_cluster_pages
    from refined_ray.sources.webpages import ensure_webpages

    out = er_cluster_pages(SF_SMALL).to_pandas()
    gt = pq.read_table(ensure_webpages(SF_SMALL), columns=["url", "entity_id"]).to_pandas()
    m = out.merge(gt, on="url")
    assert len(m) == len(out) > 0

    def pairset(col):
        s = set()
        for _, g in m.groupby(col):
            s.update(combinations(sorted(g.url), 2))
        return s

    pred, true = pairset("cluster_id"), pairset("entity_id")
    tp, fp, fn = len(pred & true), len(pred - true), len(true - pred)
    prec = tp / (tp + fp) if tp + fp else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 1.0
    assert f1 >= 0.99, (tp, fp, fn)


def test_flagship_distcc_matches_driver_path(ray_session):
    """cc_driver_max_edges=0 forces the distributed label-propagation
    path through the FULL flagship (the bench.py er_clusters_distcc
    row); cluster labels must equal the driver union-find's."""
    from refined_ray.pipelines.entity_resolution import er_cluster_pages

    base = er_cluster_pages(SF_SMALL).to_pandas()
    dist = er_cluster_pages(SF_SMALL, cc_driver_max_edges=0).to_pandas()
    b = dict(zip(base.url, base.cluster_id))
    d = dict(zip(dist.url, dist.cluster_id))
    assert b == d


def test_ann_ivf_recall_vs_bruteforce(ray_session):
    """IVF with n_probe=4/16 cells must recover most brute-force
    neighbors (approximate op: recall gate, not equality)."""
    from refined_ray.pipelines.queries import q_ann_topk
    from refined_ray.pipelines.queries_ext import q_ann_ivf

    exact = q_ann_topk(SF_SMALL).to_pandas()
    approx = q_ann_ivf(SF_SMALL).to_pandas()
    e = set(zip(exact.query_id, exact.neighbor_id))
    a = set(zip(approx.query_id, approx.neighbor_id))
    recall = len(e & a) / len(e)
    # the synthetic embeddings are near-isotropic (no cluster
    # structure), which is IVF's worst case: probing half the cells
    # (n_probe=8/16) measures ~0.7 recall; real clustered corpora sit
    # far higher at the same probe fraction
    assert recall >= 0.6, recall


def test_disk_exchange_matches_ray_shuffle(ray_session):
    """The external shuffle and Ray's keyed repartition must produce
    identical grouped results (arbitrary key distribution incl. a hot
    key spanning many input blocks)."""
    import ray.data as rd

    from refined_ray.stages.exchange import exchange_map_partitions

    rng = np.random.default_rng(5)
    n = 20_000
    keys = rng.integers(0, 50, size=n).astype(np.int64)
    keys[: n // 4] = 7  # hot key
    vals = rng.integers(0, 1 << 40, size=n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys), "v": pa.array(vals)})) \
           .repartition(num_blocks=13)

    def group_stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "vmin": pa.array([], type=pa.int64())})
        k = t["k"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        counts = np.diff(np.r_[starts, len(k)])
        return pa.table({"k": pa.array(k[starts], type=pa.int64()),
                         "n": pa.array(counts, type=pa.int64()),
                         "vmin": pa.array(v[starts], type=pa.int64())})

    out, cleanup = exchange_map_partitions(ds, ["k"], group_stats, 6)
    got = out.to_pandas().sort_values("k").reset_index(drop=True)
    cleanup()

    import pandas as pd

    df = pd.DataFrame({"k": keys, "v": vals})
    want = df.groupby("k").agg(n=("v", "size"), vmin=("v", "min")).reset_index()
    assert got.equals(want.sort_values("k").reset_index(drop=True))


def test_jsonl_roundtrip(ray_session, tmp_path):
    """JSONL sink (atomic per-file) then source reproduce the table."""
    import ray.data as rd

    from refined_ray.sources.jsonl import read_jsonl, write_jsonl

    tbl = pa.table({
        "id": pa.array(range(500), type=pa.int64()),
        "name": pa.array([f"row {i} with ünicode" for i in range(500)]),
        "score": pa.array([i / 7 for i in range(500)], type=pa.float64()),
    })
    ds = rd.from_arrow(tbl).repartition(num_blocks=4)
    out = str(tmp_path / "out")
    n_files = write_jsonl(ds, out)
    assert n_files >= 1
    assert all(f.endswith(".jsonl") for f in __import__("os").listdir(out))

    back = read_jsonl(out).to_pandas().sort_values("id").reset_index(drop=True)
    orig = tbl.to_pandas().sort_values("id").reset_index(drop=True)
    assert back[["id", "name"]].equals(orig[["id", "name"]])
    assert (back["score"] - orig["score"]).abs().max() < 1e-12


def test_scrub_empty_blocks(ray_session):
    """Zero-column empty blocks (Ray 2.49 join/shuffle artifacts) are
    dropped by metadata only; an all-empty dataset keeps the fallback
    schema instead of going zero-column."""
    import ray.data as rd

    from refined_ray import scrub_empty_blocks

    ab = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    good = rd.from_arrow(pa.table({"a": [1, 2], "b": [3, 4]}))
    empty_zero_col = rd.from_arrow(pa.schema([]).empty_table())
    mixed = good.union(empty_zero_col).materialize()

    scrubbed = scrub_empty_blocks(mixed, fallback_schema=ab)
    tables = [b for b in scrubbed.iter_batches(batch_format="pyarrow")]
    assert all(t.num_rows > 0 and t.schema.names == ["a", "b"] for t in tables)
    assert scrubbed.count() == 2

    all_empty = empty_zero_col.materialize()
    out = scrub_empty_blocks(all_empty, fallback_schema=ab)
    assert out.count() == 0
    assert out.schema().base_schema.equals(ab)


def test_semantic_dedup_keeper_invariants(ray_session):
    """Every cluster keeps exactly its min vec_id; keep flag matches;
    flagged pairs always share a cluster (oracle gate covers
    bit-exactness vs the recursive-CTE SQL)."""
    from refined_ray.pipelines.queries import q_embedding_pairs, q_semantic_dedup

    sf = "/root/testdata/sf0.001"
    out = q_semantic_dedup(sf).to_pandas()
    assert len(out) == 500
    g = out.groupby("cluster_vec_id")["vec_id"]
    assert (g.min() == g.min().index).all()
    assert (out.keep == (out.vec_id == out.cluster_vec_id).astype(int)).all()
    label = dict(zip(out.vec_id, out.cluster_vec_id))
    for r in q_embedding_pairs(sf).take_all():
        assert label[r["vec_a"]] == label[r["vec_b"]]


def test_semantic_dedup_pair_stage_dispatch(ray_session):
    """The counted pair-stage dispatch: forced-LSH output is
    IDENTICAL to the exact-matmul output (the catalog LSH geometry is
    recall-exhaustive at threshold 0.45), auto below the budget picks
    exact, auto above the budget picks lsh, and a bogus stage fails
    loudly."""
    import pytest

    from refined_ray.pipelines.queries import q_semantic_dedup

    sf = "/root/testdata/sf0.001"
    exact = q_semantic_dedup(sf, pair_stage="exact").to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    lsh = q_semantic_dedup(sf, pair_stage="lsh").to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert exact.equals(lsh)
    # auto dispatch is count-driven: 500 vectors <= budget -> exact;
    # force the budget below the count -> lsh.  Both must match.
    auto_small = q_semantic_dedup(sf).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    auto_forced_lsh = q_semantic_dedup(sf, exact_max_vectors=10).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert exact.equals(auto_small)
    assert exact.equals(auto_forced_lsh)
    with pytest.raises(ValueError, match="pair_stage"):
        q_semantic_dedup(sf, pair_stage="bogus")
