"""Second batch of catalog queries: scalar/JSON functions, per-group
top-k, running windows, anti-joins, candidate generation, SimHash,
multimodal stubs, ER quality metrics.

Same contract as pipelines/queries.py (column names/types and float
canonicalization match the DuckDB oracle exactly)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.normalize import NORMALIZE_SQL, normalize_surface_array, remove_wiki_brackets
from .queries import _canon_round, _read, _sql_round, _TOKS


# ---------------------------------------------------------------------
# M1/M2: normalization scalar functions over a table column
# ---------------------------------------------------------------------


def q_part_norm(sf_dir: str):
    """≙ normalize_surface_form (loaders.py:137-148) + remove_wiki_brackets
    (loaders.py:207-215) applied as vectorized projections."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_name"])

    def norm(b: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": b["p_partkey"],
            "norm_name": normalize_surface_array(remove_wiki_brackets(b["p_name"])),
        })

    return ds.map_batches(norm, batch_format="pyarrow")


_DEBRACKET = r"regexp_replace(p_name, ' \([^()]*\)$', '')"
_NORM_NAME = NORMALIZE_SQL.format(col=_DEBRACKET)
SQL_PART_NORM = f"""
SELECT p_partkey,
       {_NORM_NAME} AS norm_name
FROM part
"""


# ---------------------------------------------------------------------
# O2-style per-group top-k
# ---------------------------------------------------------------------


def q_orders_topk_per_customer(sf_dir: str, k: int = 2):
    """Top-k orders per customer by total price (per-group sort+limit)."""
    import pandas as pd

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["o_custkey", "o_orderkey", "o_totalprice", "rank"]]

    return ds.groupby("o_custkey").map_groups(topk, batch_format="pandas")


SQL_ORDERS_TOPK_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
) WHERE rank <= 2
"""


# ---------------------------------------------------------------------
# Ordered running window per key
# ---------------------------------------------------------------------


def q_user_running_value(sf_dir: str):
    """Per-user running sum of value ordered by (ts, event_id) — the
    ordered-state/window operator (SURVEY §2.9 generalization)."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        out = pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": g["user_id"].to_numpy(),
        })
        out["running_value"] = [float(f"{v:.4f}") for v in g["value"].cumsum()]
        return out

    return ds.groupby("user_id").map_groups(running, batch_format="pandas")


SQL_USER_RUNNING_VALUE = f"""
SELECT event_id, user_id,
       {_sql_round("sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)", 4)} AS running_value
FROM events
"""


# ---------------------------------------------------------------------
# Scalar JSON extraction (≙ ujson-per-line parsing throughout reference)
# ---------------------------------------------------------------------

_K_RE = re.compile(r'"k":\s*(-?\d+)')


def q_events_extract_k(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_id", "props"])

    def extract(b: pa.Table) -> pa.Table:
        ks = [int(m.group(1)) if (m := _K_RE.search(p)) else None
              for p in b["props"].to_pylist()]
        return pa.table({"event_id": b["event_id"],
                         "k": pa.array(ks, type=pa.int64())})

    return ds.map_batches(extract, batch_format="pyarrow")


SQL_EVENTS_EXTRACT_K = """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
"""


# ---------------------------------------------------------------------
# Anti-join: documents with NO near-duplicate partner (≙ M18 NIL filter)
# ---------------------------------------------------------------------


def q_docs_without_neardup(sf_dir: str):
    """Anti-join documents against the near-dup pair table — a true
    distributed ``left_anti`` hash join: the dup-id side never touches
    the driver (round-1 collected every id into a Python set, which is
    unbounded when most of the corpus is duplicated)."""
    from .queries import q_neardup_shingle

    pairs = q_neardup_shingle(sf_dir).materialize()
    ds = _read(sf_dir, "documents", ["doc_id"])
    # Ray's hash join chokes on a fully-empty build side (zero-column
    # blocks); with zero dup pairs the anti-join is the identity.
    if pairs.count() == 0:
        return ds
    dups = pairs.select_columns(["doc_a"]).rename_columns({"doc_a": "dup_id"}) \
                .union(pairs.select_columns(["doc_b"]).rename_columns({"doc_b": "dup_id"}))
    return ds.join(dups, join_type="left_anti", num_partitions=4,
                   on=("doc_id",), right_on=("dup_id",))


from .queries import _sql_shingles  # noqa: E402

SQL_DOCS_WITHOUT_NEARDUP = f"""
WITH sh AS ({_sql_shingles()}),
u AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
c AS (SELECT doc_id, len(shingles) AS n FROM sh),
p AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
  FROM u x JOIN u y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2
),
e AS (
  SELECT a, b FROM p JOIN c ca ON ca.doc_id = a JOIN c cb ON cb.doc_id = b
  WHERE inter / CAST(ca.n + cb.n - inter AS DOUBLE) >= 0.5
),
dups AS (SELECT a AS doc_id FROM e UNION SELECT b FROM e)
SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM dups)
"""


# ---------------------------------------------------------------------
# Candidate generation: per-surface top-k candidates by prior (≙ O1,
# candidate_generator.py:87-94 truncation to max_candidates)
# ---------------------------------------------------------------------


def q_candidate_topk(sf_dir: str, k: int = 3):
    """Per-surface top-k candidates by count (≙ O1 truncation).

    Scale shape: the PEM output is already surface-partitioned (the
    q_pem_table exchange), but a second keyed repartition keeps this
    operator standalone; top-k is one vectorized lexsort + positional
    mask per partition — no per-group pandas calls (~18M surfaces in
    the reference's PEM)."""
    from .. import default_num_partitions
    from ..functions.hashing import hash_str_array
    from .queries import q_pem_table

    pem = q_pem_table(sf_dir)
    nparts = default_num_partitions()
    parted = pem.repartition(num_blocks=nparts, keys=["surface"], sort=False)

    def topk_partition(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({"surface": pa.array([], type=pa.string()),
                             "rank": pa.array([], type=pa.int64()),
                             "entity": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        s = b["surface"].to_numpy(zero_copy_only=False)
        e = b["entity"].to_numpy(zero_copy_only=False)
        c = b["cnt"].to_numpy(zero_copy_only=False)
        hs = hash_str_array(s).view(np.int64)
        # (hash(s), s) groups surfaces exactly; within a surface order
        # by cnt desc, entity asc — matches the SQL row_number() window
        order = np.lexsort((e, -c, s, hs))
        s, e, c = s[order], e[order], c[order]
        seg_new = np.r_[True, s[1:] != s[:-1]]
        seg_starts = np.flatnonzero(seg_new)
        seg_len = np.diff(np.r_[seg_starts, n])
        pos = np.arange(n) - np.repeat(seg_starts, seg_len)
        keep = pos < k
        return pa.table({
            "surface": pa.array(s[keep], type=pa.string()),
            "rank": pa.array(pos[keep] + 1, type=pa.int64()),
            "entity": pa.array(e[keep], type=pa.string()),
            "cnt": pa.array(c[keep], type=pa.int64()),
        })

    return parted.map_batches(topk_partition, batch_format="pyarrow", batch_size=None)


SQL_CANDIDATE_TOPK = f"""
WITH toks AS (
  SELECT source AS entity, unnest(list_distinct({_TOKS})) AS surface FROM documents
), pem AS (
  SELECT surface, entity, count(*) AS cnt FROM toks GROUP BY 1, 2
)
SELECT surface, rank, entity, cnt FROM (
  SELECT surface, entity, cnt,
         row_number() OVER (PARTITION BY surface ORDER BY cnt DESC, entity) AS rank
  FROM pem
) WHERE rank <= 3
"""


# ---------------------------------------------------------------------
# SimHash fingerprints + banded candidates (rows-only: engine hashes)
# ---------------------------------------------------------------------


def q_simhash_fingerprints(sf_dir: str):
    from ..functions.simhash import simhash_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(b: pa.Table) -> pa.Table:
        f = simhash_batch(b["text"].to_pylist())
        return pa.table({"doc_id": b["doc_id"],
                         "simhash": pa.array(f.view(np.int64), type=pa.int64())})

    return ds.map_batches(fp, batch_format="pyarrow")


def q_simhash_candidates(sf_dir: str, max_hamming: int = 12):
    """SimHash near-dup candidates: 4×16-bit band blocking + exact
    Hamming verification (pigeonhole-exact for distance ≤ 3; banded
    recall beyond).  Rows-only (hash-valued).

    Scale shape: fingerprints are computed ONCE into a materialized
    Dataset; band keys derive from it; verification attaches the two
    fingerprints to each pair with distributed hash joins.  No doc's
    fingerprint ever touches the driver (round 1 collected the whole
    corpus into a Python dict — unbounded at 100 TB)."""
    from .. import default_num_partitions
    from ..functions.simhash import SIMHASH_BANDS, hamming_distance, simhash_band_values
    from ..stages.pairs import make_pairs_partition

    fps = q_simhash_fingerprints(sf_dir).materialize()  # computed once, 2 consumers

    def emit(b: pa.Table) -> pa.Table:
        fp = b["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        bands = simhash_band_values(fp)
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "block_key": pa.array(bands.ravel().view(np.int64), type=pa.int64()),
            "page_id": pa.array(np.repeat(ids, SIMHASH_BANDS), type=pa.int64()),
        })

    nparts = default_num_partitions()
    blocks = fps.map_batches(emit, batch_format="pyarrow") \
                .repartition(num_blocks=nparts, keys=["block_key"], sort=False)
    pairs = blocks.map_batches(
        lambda t: make_pairs_partition(t, max_block_size=1 << 20),
        batch_format="pyarrow", batch_size=None,
    ).select_columns(["a", "b"]) \
     .repartition(num_blocks=nparts, keys=["a", "b"], sort=False)

    def dedup(b: pa.Table) -> pa.Table:
        # pairs may arrive from several bands; (a,b) co-locate per the
        # keyed repartition, so one sorted pass per partition dedups
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        if len(a) == 0:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        order = np.lexsort((bb, a))
        a, bb = a[order], bb[order]
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (bb[1:] != bb[:-1])
        return pa.table({"a": pa.array(a[keep], type=pa.int64()),
                         "b": pa.array(bb[keep], type=pa.int64())})

    pairs = pairs.map_batches(dedup, batch_format="pyarrow", batch_size=None).materialize()
    if pairs.count() == 0:  # empty build side breaks Ray's hash join
        import ray.data as rd

        return rd.from_arrow(pa.table({"doc_a": pa.array([], type=pa.int64()),
                                       "doc_b": pa.array([], type=pa.int64()),
                                       "hamming": pa.array([], type=pa.int64())}))

    fa = fps.rename_columns({"doc_id": "a", "simhash": "fp_a"})
    fb = fps.rename_columns({"doc_id": "b", "simhash": "fp_b"})
    enriched = pairs.join(fa, join_type="inner", num_partitions=nparts, on=("a",)) \
                    .join(fb, join_type="inner", num_partitions=nparts, on=("b",))

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64()),
                             "hamming": pa.array([], type=pa.int64())})
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        f_a = b["fp_a"].to_numpy(zero_copy_only=False).view(np.uint64)
        f_b = b["fp_b"].to_numpy(zero_copy_only=False).view(np.uint64)
        d = hamming_distance(f_a, f_b).astype(np.int64)
        m = d <= max_hamming
        return pa.table({"doc_a": pa.array(a[m], type=pa.int64()),
                         "doc_b": pa.array(bb[m], type=pa.int64()),
                         "hamming": pa.array(d[m], type=pa.int64())})

    return enriched.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------
# Multimodal stub pipeline (rows-only)
# ---------------------------------------------------------------------


def q_media_features(sf_dir: str):
    """Treat each document's utf-8 bytes as an opaque media blob and run
    the actor-pool feature extractor (stages/multimodal.py)."""
    from ..stages.multimodal import media_feature_stage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_media(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "media": pa.array([t.encode() for t in b["text"].to_pylist()], type=pa.binary()),
        })

    media = ds.map_batches(to_media, batch_format="pyarrow")
    out = media_feature_stage(media)
    return out.select_columns(["doc_id", "n_bytes", "byte_entropy", "mean_intensity"])


# ---------------------------------------------------------------------
# ER quality metrics (rows-only; distributed pairwise P/R/F1)
# ---------------------------------------------------------------------


def q_er_quality(sf_dir: str):
    from .evaluation import er_quality

    return er_quality(sf_dir)


def q_er_clusters_checkpointed(sf_dir: str):
    """Flagship ER through the per-stage checkpoint/lineage layer; a
    repeated call with unchanged inputs resumes from the manifests."""
    import os

    from .entity_resolution import er_cluster_pages_checkpointed

    root = os.path.join("/tmp/refined_ray_checkpoints",
                        os.path.basename(os.path.normpath(sf_dir)))
    return er_cluster_pages_checkpointed(sf_dir, root)



EXT_QUERIES = {
    "part_norm": q_part_norm,
    "orders_topk_per_customer": q_orders_topk_per_customer,
    "user_running_value": q_user_running_value,
    "events_extract_k": q_events_extract_k,
    "docs_without_neardup": q_docs_without_neardup,
    "candidate_topk": q_candidate_topk,
    "simhash_fingerprints": q_simhash_fingerprints,
    "simhash_candidates": q_simhash_candidates,
    "media_features": q_media_features,
    "er_quality": q_er_quality,
    "er_clusters_checkpointed": q_er_clusters_checkpointed,
}

EXT_ORACLES = {
    "part_norm": SQL_PART_NORM,
    "orders_topk_per_customer": SQL_ORDERS_TOPK_PER_CUSTOMER,
    "user_running_value": SQL_USER_RUNNING_VALUE,
    "events_extract_k": SQL_EVENTS_EXTRACT_K,
    "docs_without_neardup": SQL_DOCS_WITHOUT_NEARDUP,
    "candidate_topk": SQL_CANDIDATE_TOPK,
    # simhash_*, media_features, er_quality: rows-only (engine hashes /
    # model state / requires ground-truth table outside oracle views)
}


# ---------------------------------------------------------------------
# ANN scale path: IVF-bucketed search (vs brute-force q_ann_topk)
# ---------------------------------------------------------------------


def q_ann_ivf(sf_dir: str, k: int = 5, max_qid: int = 10, n_cells: int = 16,
              n_probe: int = 4):
    """IVF approximate top-k: vectors partition into coarse cells
    (deterministic seed centroids), each query searches only its
    ``n_probe`` nearest cells.  At 100 TB the cell assignment is the
    partitioning key and each cell is a parquet partition; here cells
    are groups inside one map stage.  Rows-only (approximate by
    design); recall vs the brute-force oracle is reported by
    tests rather than equality."""
    import ray
    import pandas as pd

    from .queries import _read

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    # Coarse centroids from a BOUNDED sample (n_cells*64 rows via
    # limit()) — never the full matrix on the driver (round 1 loaded
    # all N vectors, the exact materialization IVF exists to avoid).
    # Deterministic: limit() takes the first rows in file order.
    sample = ds.limit(n_cells * 64).take_all()
    S = np.array([r["embedding"] for r in sample], dtype=np.float64)
    norms = np.linalg.norm(S, axis=1, keepdims=True)
    np.divide(S, norms, out=S, where=norms > 0)
    stride = max(len(S) // n_cells, 1)
    C = S[::stride][:n_cells]

    # query vectors: a bounded filtered read (max_qid rows)
    qrows = sorted((r["vec_id"], r["embedding"])
                   for r in ds.filter(expr=f"vec_id < {max_qid}").take_all())
    qids = np.array([v for v, _ in qrows], dtype=np.int64)
    Q = np.array([e for _, e in qrows], dtype=np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]  # (q, n_probe)
    ref = ray.put((qids, Q, probe, C))

    class AssignCells:
        """Cell assignment as its OWN map stage — at 100 TB this column
        is the partition key: write_parquet(partition_cols=["cell"]) once,
        then each query batch reads only its n_probe cell partitions."""

        def __init__(self):
            _, _, self.probe, self.C = ray.get(ref)
            self.probed = np.unique(self.probe)

        def __call__(self, b: pa.Table) -> pa.Table:
            E = np.array(b["embedding"].to_pylist(), dtype=np.float64)
            norms = np.linalg.norm(E, axis=1, keepdims=True)
            np.divide(E, norms, out=E, where=norms > 0)
            cell = np.argmax(E @ self.C.T, axis=1).astype(np.int64)
            # prune: drop every vector in a cell no query probes
            keep = np.isin(cell, self.probed)
            return pa.table({
                "vec_id": b["vec_id"].filter(pa.array(keep)),
                "embedding": b["embedding"].filter(pa.array(keep)),
                "cell": pa.array(cell[keep], type=pa.int64()),
            })

    class IVFSearch:
        def __init__(self):
            self.qids, self.Q, self.probe, _ = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            vids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            E = np.array(b["embedding"].to_pylist(), dtype=np.float64)
            norms = np.linalg.norm(E, axis=1, keepdims=True)
            np.divide(E, norms, out=E, where=norms > 0)
            cell = b["cell"].to_numpy(zero_copy_only=False)
            out_q, out_n, out_c = [], [], []
            for j, qid in enumerate(self.qids):
                in_probe = np.isin(cell, self.probe[j]) & (vids != qid)
                if not in_probe.any():
                    continue
                cos = E[in_probe] @ self.Q[j]
                sel_ids = vids[in_probe]
                order = np.lexsort((sel_ids, -cos))[:5]
                out_q.append(np.full(len(order), qid, dtype=np.int64))
                out_n.append(sel_ids[order])
                out_c.append(cos[order])
            if not out_q:
                return pa.table({"query_id": pa.array([], type=pa.int64()),
                                 "neighbor_id": pa.array([], type=pa.int64()),
                                 "cos": pa.array([], type=pa.float64())})
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), type=pa.int64()),
                "cos": pa.array(np.concatenate(out_c), type=pa.float64()),
            })

    partial = ds.map_batches(AssignCells, batch_format="pyarrow", concurrency=(1, 4)) \
                .map_batches(IVFSearch, batch_format="pyarrow", concurrency=(1, 4))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(k)
        return pd.DataFrame({
            "query_id": g["query_id"].to_numpy(),
            "neighbor_id": g["neighbor_id"].to_numpy(),
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
        })

    return partial.groupby("query_id").map_groups(final_topk, batch_format="pandas")


EXT_QUERIES["ann_ivf"] = q_ann_ivf  # defined below the dict

# complete the catalog registration for the queries_ext-first import
# order (queries.py skips its own update when this module is mid-import)
from .queries import QUERIES as _QUERIES  # noqa: E402

for _k, _v in EXT_QUERIES.items():
    _QUERIES.setdefault(_k, _v)
