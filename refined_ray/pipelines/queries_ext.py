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
from .queries import _canon_round, _read, _sql_round, _STOP_SQL, _TOKS


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
    """Top-k orders per customer by total price (per-group sort+limit).

    Scale shape: ONE keyed repartition co-locates each customer, then a
    single lexsort/segment-rank pass per partition — no per-group
    pandas (round-2 verdict: map_groups is one Python call per customer,
    millions at 100× key cardinality)."""
    from .. import default_num_partitions

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    parted = ds.repartition(num_blocks=default_num_partitions(),
                            keys=["o_custkey"], sort=False)

    def topk_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], type=pa.int64()),
                             "o_orderkey": pa.array([], type=pa.int64()),
                             "o_totalprice": pa.array([], type=pa.float64()),
                             "rank": pa.array([], type=pa.int64())})
        c = b["o_custkey"].to_numpy(zero_copy_only=False)
        o = b["o_orderkey"].to_numpy(zero_copy_only=False)
        p = b["o_totalprice"].to_numpy(zero_copy_only=False)
        order = np.lexsort((o, -p, c))  # per customer: price desc, orderkey asc
        c, o, p = c[order], o[order], p[order]
        seg_start = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        rank = np.arange(len(c), dtype=np.int64) \
            - np.repeat(seg_start, np.diff(np.r_[seg_start, len(c)])) + 1
        keep = rank <= k
        return pa.table({"o_custkey": pa.array(c[keep], type=pa.int64()),
                         "o_orderkey": pa.array(o[keep], type=pa.int64()),
                         "o_totalprice": pa.array(p[keep], type=pa.float64()),
                         "rank": pa.array(rank[keep], type=pa.int64())})

    return parted.map_batches(topk_part, batch_format="pyarrow", batch_size=None)


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
    ordered-state/window operator (SURVEY §2.9 generalization).

    Scale shape: ONE keyed repartition, then a lexsort/segment pass per
    partition — no per-group pandas.  The cumulative sum runs per
    SEGMENT SLICE (a cheap C call per user) rather than the global
    cumsum-minus-offset trick: subtracting a large prefix re-introduces
    FP error that can flip the %.4f canonical rounding vs the oracle's
    sequential window sum."""
    from .. import default_num_partitions

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
    parted = ds.repartition(num_blocks=default_num_partitions(),
                            keys=["user_id"], sort=False)

    def running_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"event_id": pa.array([], type=pa.int64()),
                             "user_id": pa.array([], type=pa.int64()),
                             "running_value": pa.array([], type=pa.float64())})
        u = b["user_id"].to_numpy(zero_copy_only=False)
        e = b["event_id"].to_numpy(zero_copy_only=False)
        t = b["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        v = b["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u, e, v = u[order], e[order], v[order].copy()
        bounds = np.r_[np.flatnonzero(np.r_[True, u[1:] != u[:-1]]), len(u)]
        for s, z in zip(bounds[:-1], bounds[1:]):
            np.cumsum(v[s:z], out=v[s:z])
        run = pa.array([float(f"{x:.4f}") for x in v], type=pa.float64())
        return pa.table({"event_id": pa.array(e, type=pa.int64()),
                         "user_id": pa.array(u, type=pa.int64()),
                         "running_value": run})

    return parted.map_batches(running_part, batch_format="pyarrow",
                              batch_size=None)


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
    from .. import default_num_partitions

    return ds.join(dups, join_type="left_anti",
                   num_partitions=default_num_partitions(),
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


# simhash fingerprints are 16 B/doc; under this budget they attach to
# pairs via one ray.put broadcast, above it via two hash joins
SIMHASH_BROADCAST_MAX_BYTES = 256_000_000


def q_simhash_candidates(sf_dir: str, max_hamming: int = 12):
    """SimHash near-dup candidates: 4×16-bit band blocking + exact
    Hamming verification (pigeonhole-exact for distance ≤ 3; banded
    recall beyond).  Rows-only (hash-valued).

    Scale shape: fingerprints are computed ONCE into a materialized
    Dataset; band keys derive from it; verification attaches the two
    fingerprints to each pair either by a COUNTED-budget broadcast
    (16 B/doc; one ray.put, zero joins — the flagship's payload-guard
    pattern) or, beyond SIMHASH_BROADCAST_MAX_BYTES, by two
    distributed hash joins.  Round 1 collected the whole corpus into
    an unconditional driver dict — unbounded at 100 TB; both paths
    here are bounded and the join fallback is path-parity tested."""
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

    def _verify_arrays(a, bb, f_a, f_b) -> pa.Table:
        d = hamming_distance(f_a, f_b).astype(np.int64)
        m = d <= max_hamming
        return pa.table({"doc_a": pa.array(a[m], type=pa.int64()),
                         "doc_b": pa.array(bb[m], type=pa.int64()),
                         "hamming": pa.array(d[m], type=pa.int64())})

    # Fingerprint attachment: counted-budget broadcast (16 B/doc; one
    # ray.put, zero joins) exactly like the flagship's payload guard —
    # fall back to two hash joins beyond the budget (the 100-TB path).
    FP_ROW_BYTES = 16
    if fps.count() * FP_ROW_BYTES <= SIMHASH_BROADCAST_MAX_BYTES:
        import ray

        ids_parts, fp_parts = [], []
        for blk in ray.get(fps.to_arrow_refs()):  # zero-copy plasma derefs
            ids_parts.append(blk["doc_id"].to_numpy(zero_copy_only=False))
            fp_parts.append(blk["simhash"].to_numpy(zero_copy_only=False))
        ids = np.concatenate(ids_parts) if ids_parts else np.array([], dtype=np.int64)
        fp = (np.concatenate(fp_parts) if fp_parts
              else np.array([], dtype=np.int64)).view(np.uint64)
        order = np.argsort(ids)
        ref = ray.put((ids[order], fp[order]))

        def verify_bcast(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"doc_a": pa.array([], type=pa.int64()),
                                 "doc_b": pa.array([], type=pa.int64()),
                                 "hamming": pa.array([], type=pa.int64())})
            sids, sfp = ray.get(ref)
            a = b["a"].to_numpy(zero_copy_only=False)
            bb = b["b"].to_numpy(zero_copy_only=False)
            f_a = sfp[np.searchsorted(sids, a)]
            f_b = sfp[np.searchsorted(sids, bb)]
            return _verify_arrays(a, bb, f_a, f_b)

        return pairs.map_batches(verify_bcast, batch_format="pyarrow")

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
        return _verify_arrays(a, bb, f_a, f_b)

    return enriched.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------
# M12: span overlap merge over real spans (stages/spans.py ≙ reference
# merge_spans, general_utils.py:212-238).  Spans live in token-ordinal
# space: prioritized = non-stopword runs >= 2 tokens (the mention
# detector's phrases), additional = every single non-stopword token.
# The merge keeps all phrases plus only the isolated tokens.
# ---------------------------------------------------------------------


def q_span_merge(sf_dir: str):
    from ..functions.tokenize import STOPWORD_SET, tokenize_batch
    from ..stages.spans import merge_spans

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def per_doc(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        ids = b["doc_id"].to_pylist()
        flat, starts = tokenize_batch(texts)
        out_id, out_start, out_ln = [], [], []
        for i, did in enumerate(ids):
            toks = flat[starts[i]:starts[i + 1]]
            nonstop = [j for j, t in enumerate(toks) if t not in STOPWORD_SET]
            additional = [{"start": j, "ln": 1, "text": toks[j]} for j in nonstop]
            prioritized = []
            run: list[int] = []
            for j in nonstop + [-2]:
                if run and j != run[-1] + 1:
                    if len(run) >= 2:
                        prioritized.append({"start": run[0], "ln": len(run),
                                            "text": " ".join(toks[run[0]:run[-1] + 1])})
                    run = []
                run.append(j)
            merged = merge_spans(additional, prioritized)
            for s in merged:
                out_id.append(did)
                out_start.append(s["start"] + 1)  # 1-based ordinal (SQL range())
                out_ln.append(s["ln"])
        return pa.table({"doc_id": pa.array(out_id, type=pa.int64()),
                         "start_ord": pa.array(out_start, type=pa.int64()),
                         "ln": pa.array(out_ln, type=pa.int64())})

    return ds.map_batches(per_doc, batch_format="pyarrow")


def _sql_span_merge() -> str:
    from .queries import _STOP_SQL

    return f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS}) AS tok,
         unnest(range(1, len({_TOKS}) + 1)) AS ord
  FROM documents
), nw AS (
  SELECT doc_id, ord FROM t WHERE tok NOT IN {_STOP_SQL}
), isl AS (
  SELECT doc_id, ord,
         ord - row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS island
  FROM nw
)
SELECT doc_id, CAST(min(ord) AS BIGINT) AS start_ord, CAST(count(*) AS BIGINT) AS ln
FROM isl GROUP BY doc_id, island
"""


# ---------------------------------------------------------------------
# M13: date parsing / normalization with doc-level format inference
# (functions/dates.py ≙ reference DateHandler, date_utils.py:97-370)
# ---------------------------------------------------------------------

_MONTH_NAMES = ["", "January", "February", "March", "April", "May", "June",
                "July", "August", "September", "October", "November", "December"]


def _order_date_text(key: int, d) -> str:
    """Deterministic mention text for an order date, 3 formats cycled:
    numeric day-first (ambiguity-bearing), month-name, year-only."""
    f = key % 3
    if f == 0:
        return f"{d.day:02d}/{d.month:02d}/{d.year}"
    if f == 1:
        return f"{_MONTH_NAMES[d.month]} {d.day:02d}, {d.year}"
    return str(d.year)


def q_date_normalize(sf_dir: str):
    """Per-mention date normalization (no doc context): numeric dates
    with both fields <= 12 stay unresolved (known_format=false)."""
    from ..functions.dates import parse_date_mention

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def norm(b: pa.Table) -> pa.Table:
        keys = b["o_orderkey"].to_pylist()
        dates = b["o_orderdate"].to_pylist()
        texts = [_order_date_text(k, d) for k, d in zip(keys, dates)]
        day, mon, yr, kf = [], [], [], []
        for t in texts:
            ps = parse_date_mention(t)
            p = ps[0] if ps else None
            # sentinel 0 = unresolved (avoids nullable-int NaN
            # round-trips in cross-engine comparison)
            day.append(p.day if p and p.day else 0)
            mon.append(p.month if p and p.month else 0)
            yr.append(p.year if p and p.year else 0)
            kf.append(p.known_format if p else False)
        return pa.table({
            "o_orderkey": pa.array(keys, type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "day": pa.array(day, type=pa.int64()),
            "month": pa.array(mon, type=pa.int64()),
            "year": pa.array(yr, type=pa.int64()),
            "known_format": pa.array(kf, type=pa.bool_()),
        })

    return ds.map_batches(norm, batch_format="pyarrow")


SQL_DATE_NORMALIZE = """
WITH t AS (
  SELECT o_orderkey, o_orderkey % 3 AS f,
         day(o_orderdate) AS d, month(o_orderdate) AS m, year(o_orderdate) AS y,
         CASE o_orderkey % 3
           WHEN 0 THEN strftime(o_orderdate, '%d/%m/%Y')
           WHEN 1 THEN strftime(o_orderdate, '%B %d, %Y')
           ELSE CAST(year(o_orderdate) AS VARCHAR) END AS text
  FROM orders
)
SELECT o_orderkey, text,
  CAST(COALESCE(CASE WHEN f=0 THEN (CASE WHEN d>12 THEN d WHEN m>12 THEN m END)
            WHEN f=1 THEN d END, 0) AS BIGINT) AS day,
  CAST(COALESCE(CASE WHEN f=0 THEN (CASE WHEN d>12 THEN m WHEN m>12 THEN d END)
            WHEN f=1 THEN m END, 0) AS BIGINT) AS month,
  CAST(COALESCE(CASE WHEN f=0 THEN (CASE WHEN d>12 OR m>12 THEN y END)
            ELSE y END, 0) AS BIGINT) AS year,
  (NOT (f=0 AND d<=12 AND m<=12)) AS known_format
FROM t
"""


def q_date_doc_infer(sf_dir: str):
    """Doc-level date-format inference: each customer's orders form one
    'document' of numeric day-first date mentions; unambiguous dates
    (day>12, or misparsed month>12) reveal the order and resolve the
    ambiguous ones — the reference's resolve_multiple second pass as a
    keyed-repartition + per-group fold (doc-local state only)."""
    from .. import default_num_partitions
    from ..functions.dates import apply_doc_format, infer_doc_format, parse_date_mention

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"])
    nparts = default_num_partitions()
    parted = ds.repartition(num_blocks=nparts, keys=["o_custkey"], sort=False)

    def per_partition(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({"o_custkey": pa.array([], type=pa.int64()),
                             "o_orderkey": pa.array([], type=pa.int64()),
                             "text": pa.array([], type=pa.string()),
                             "day": pa.array([], type=pa.int64()),
                             "month": pa.array([], type=pa.int64()),
                             "year": pa.array([], type=pa.int64())})
        cust = b["o_custkey"].to_numpy(zero_copy_only=False)
        okey = b["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, cust))
        cust, okey = cust[order], okey[order]
        dates = [b["o_orderdate"][int(i)].as_py() for i in order]
        texts = [f"{d.day:02d}/{d.month:02d}/{d.year}" for d in dates]
        starts = np.flatnonzero(np.r_[True, cust[1:] != cust[:-1]])
        bounds = np.r_[starts, n]
        day = np.full(n, -1, dtype=object)
        mon = np.full(n, -1, dtype=object)
        yr = np.full(n, -1, dtype=object)
        for g in range(len(starts)):
            lo, hi = bounds[g], bounds[g + 1]
            ps = [parse_date_mention(t)[0] for t in texts[lo:hi]]
            ps = apply_doc_format(ps, infer_doc_format(ps))
            for i, p in enumerate(ps):
                day[lo + i] = p.day or 0
                mon[lo + i] = p.month or 0
                yr[lo + i] = p.year or 0
        return pa.table({
            "o_custkey": pa.array(cust, type=pa.int64()),
            "o_orderkey": pa.array(okey, type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "day": pa.array(list(day), type=pa.int64()),
            "month": pa.array(list(mon), type=pa.int64()),
            "year": pa.array(list(yr), type=pa.int64()),
        })

    return parted.map_batches(per_partition, batch_format="pyarrow", batch_size=None)


SQL_DATE_DOC_INFER = """
WITH t AS (
  SELECT o_custkey, o_orderkey,
         day(o_orderdate) AS d, month(o_orderdate) AS m, year(o_orderdate) AS y,
         strftime(o_orderdate, '%d/%m/%Y') AS text
  FROM orders
), g AS (
  SELECT *,
         bool_or(d > 12) OVER (PARTITION BY o_custkey) AS any_df,
         bool_or(d <= 12 AND m > 12) OVER (PARTITION BY o_custkey) AS any_mf
  FROM t
)
SELECT o_custkey, o_orderkey, text,
  CAST(COALESCE(CASE WHEN d>12 THEN d WHEN m>12 THEN m
            WHEN any_df AND NOT any_mf THEN d
            WHEN any_mf AND NOT any_df THEN m END, 0) AS BIGINT) AS day,
  CAST(COALESCE(CASE WHEN d>12 THEN m WHEN m>12 THEN d
            WHEN any_df AND NOT any_mf THEN m
            WHEN any_mf AND NOT any_df THEN d END, 0) AS BIGINT) AS month,
  CAST(COALESCE(CASE WHEN d>12 OR m>12 OR (any_df != any_mf) THEN y END, 0) AS BIGINT) AS year
FROM g
"""


# ---------------------------------------------------------------------
# M14/M15: class-DAG ancestor closure + implication pruning
# (stages/classdag.py ≙ reference class_handler.py:22-122).  The DAG is
# built from the customer→{nation, segment} and nation→region tables —
# a real multi-parent DAG, small enough to broadcast (like the
# reference's ~1.4k-class DAG); the closure runs in an actor pool with
# a per-actor memo.
# ---------------------------------------------------------------------


def _class_dag_edges(sf_dir: str) -> dict[str, list[str]]:
    """child → parents from the small dimension tables (driver-side
    read of bounded side tables, ≙ reference lookups load)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey", "c_mktsegment"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    parents: dict[str, list[str]] = {}
    for k, nk, seg in zip(cust["c_custkey"].to_pylist(),
                          cust["c_nationkey"].to_pylist(),
                          cust["c_mktsegment"].to_pylist()):
        parents[f"c{k}"] = [f"n{nk}", f"seg_{seg}"]
    for nk, rk in zip(nat["n_nationkey"].to_pylist(), nat["n_regionkey"].to_pylist()):
        parents[f"n{nk}"] = [f"r{rk}"]
    return parents


_SQL_CLASS_EDGES = """
edges AS (
  SELECT 'c' || c_custkey AS child, 'n' || c_nationkey AS parent FROM customer
  UNION ALL SELECT 'c' || c_custkey, 'seg_' || c_mktsegment FROM customer
  UNION ALL SELECT 'n' || n_nationkey, 'r' || n_regionkey FROM nation
),
anc AS (
  SELECT child AS node, parent AS anc FROM edges
  UNION
  SELECT a.node, e.parent FROM anc a JOIN edges e ON e.child = a.anc
)
"""


def q_class_closure(sf_dir: str):
    """Per-customer implied class set (remove_self=False): the class
    itself plus every transitive ancestor, exploded to rows."""
    import ray

    from ..stages.classdag import ClassDAG

    ref = ray.put(_class_dag_edges(sf_dir))

    class Closure:
        def __init__(self):
            self.dag = ClassDAG(ray.get(ref))

        def __call__(self, b: pa.Table) -> pa.Table:
            ent, cls = [], []
            for k in b["c_custkey"].to_pylist():
                for c in sorted(self.dag.implied(frozenset([f"c{k}"]),
                                                 remove_self=False)):
                    ent.append(k)
                    cls.append(c)
            return pa.table({"entity": pa.array(ent, type=pa.int64()),
                             "class": pa.array(cls, type=pa.string())})

    ds = _read(sf_dir, "customer", ["c_custkey"])
    return ds.map_batches(Closure, batch_format="pyarrow", concurrency=(1, 4))


SQL_CLASS_CLOSURE = f"""
WITH RECURSIVE {_SQL_CLASS_EDGES}
SELECT CAST(c_custkey AS BIGINT) AS entity, 'c' || c_custkey AS class FROM customer
UNION ALL
SELECT CAST(c_custkey AS BIGINT), a.anc FROM customer
JOIN anc a ON a.node = 'c' || c_custkey
"""


def q_class_prune(sf_dir: str):
    """Type-implication pruning: each customer carries the direct set
    {own class, own nation (implied → pruned), an unrelated nation
    (kept), that nation's region (implied by it → pruned)} — the
    minimal antichain keeps exactly {own class, unrelated nation}."""
    import ray

    from ..stages.classdag import ClassDAG

    ref = ray.put(_class_dag_edges(sf_dir))

    class Prune:
        def __init__(self):
            self.dag = ClassDAG(ray.get(ref))

        def __call__(self, b: pa.Table) -> pa.Table:
            ent, cls = [], []
            for k, nk in zip(b["c_custkey"].to_pylist(),
                             b["c_nationkey"].to_pylist()):
                other = (nk + 7) % 25
                # no fabricated placeholder when the other nation is
                # absent from the DAG: the SQL's region arm is an
                # inner join, so a missing nation contributes NO
                # region element to the direct set
                parents = self.dag.parents.get(f"n{other}")
                direct = frozenset(
                    [f"c{k}", f"n{nk}", f"n{other}"]
                    + ([next(iter(parents))] if parents else []))
                for c in sorted(self.dag.prune(direct)):
                    ent.append(k)
                    cls.append(c)
            return pa.table({"entity": pa.array(ent, type=pa.int64()),
                             "class": pa.array(cls, type=pa.string())})

    ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    return ds.map_batches(Prune, batch_format="pyarrow", concurrency=(1, 4))


SQL_CLASS_PRUNE = f"""
WITH RECURSIVE {_SQL_CLASS_EDGES},
direct AS (
  SELECT c_custkey AS entity, 'c' || c_custkey AS class FROM customer
  UNION ALL SELECT c_custkey, 'n' || c_nationkey FROM customer
  UNION ALL SELECT c_custkey, 'n' || ((c_nationkey + 7) % 25) FROM customer
  UNION ALL SELECT c.c_custkey, 'r' || n.n_regionkey
            FROM customer c JOIN nation n ON n.n_nationkey = (c.c_nationkey + 7) % 25
),
implied AS (
  SELECT DISTINCT d.entity, a.anc AS class
  FROM direct d JOIN anc a ON a.node = d.class
)
SELECT CAST(d.entity AS BIGINT) AS entity, d.class FROM direct d
WHERE NOT EXISTS (SELECT 1 FROM implied i
                  WHERE i.entity = d.entity AND i.class = d.class)
"""


def q_class_selection(sf_dir: str, n_classes: int = 10):
    """A8 class-frequency selection (≙ reference ``select_classes``,
    offline_data_generation/class_selection.py:67-198: counters over
    candidate entities' classes → the chosen-class list).  Distilled to
    its aggregation core: every entity contributes its implied class
    closure, class frequencies accumulate corpus-wide, and the top-N
    classes are chosen with a deterministic (count desc, class asc)
    tie-break.

    Scale shape: the closure stage PRE-AGGREGATES per batch (emits
    (class, partial count) rows, a combiner), so the groupby shuffle
    moves one row per distinct class per block — never one row per
    (entity, class) instance; the top-N is a per-block partial top-N
    followed by a single-block exact merge (the ``token_topk``
    pattern), so the driver never sees the class-frequency table."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.classdag import ClassDAG

    ref = ray.put(_class_dag_edges(sf_dir))

    class ClosureCounts:
        def __init__(self):
            self.dag = ClassDAG(ray.get(ref))

        def __call__(self, b: pa.Table) -> pa.Table:
            from collections import Counter

            ctr: Counter = Counter()
            for k in b["c_custkey"].to_pylist():
                ctr.update(self.dag.implied(frozenset([f"c{k}"]),
                                            remove_self=False))
            return pa.table({"class": pa.array(list(ctr.keys()), type=pa.string()),
                             "cnt": pa.array(list(ctr.values()), type=pa.int64())})

    ds = _read(sf_dir, "customer", ["c_custkey"])
    freq = ds.map_batches(ClosureCounts, batch_format="pyarrow",
                          concurrency=(1, 4)) \
             .groupby("class").aggregate(Sum("cnt", alias_name="n"))

    def topn(b: pa.Table, with_rank: bool = False) -> pa.Table:
        out = {"class": pa.array([], type=pa.string()),
               "n": pa.array([], type=pa.int64())}
        if with_rank:
            out["rank"] = pa.array([], type=pa.int64())
        if b.num_rows == 0:
            return pa.table(out)
        cls = b["class"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((cls, -n))[:n_classes]
        out = {"class": pa.array(cls[order], type=pa.string()),
               "n": pa.array(n[order], type=pa.int64())}
        if with_rank:
            out["rank"] = pa.array(np.arange(1, len(order) + 1, dtype=np.int64))
        return pa.table(out)

    return freq.map_batches(topn, batch_format="pyarrow", batch_size=None) \
        .repartition(1) \
        .map_batches(lambda b: topn(b, with_rank=True),
                     batch_format="pyarrow", batch_size=None)


SQL_CLASS_SELECTION = f"""
WITH RECURSIVE {_SQL_CLASS_EDGES},
closure AS (
  SELECT c_custkey AS entity, 'c' || c_custkey AS class FROM customer
  UNION ALL
  SELECT c_custkey, a.anc FROM customer JOIN anc a ON a.node = 'c' || c_custkey
),
freq AS (SELECT class, count(*) AS n FROM closure GROUP BY 1)
SELECT class, n, rank FROM (
  SELECT class, n, row_number() OVER (ORDER BY n DESC, class) AS rank
  FROM freq
) WHERE rank <= 10
"""


# ---------------------------------------------------------------------
# O6: corpus shuffle (≙ reference shuffle.sh /
# merge_files_and_extract_links.py:105).  rows-only: the permutation is
# engine-internal; the pytest gate asserts it is a permutation and
# deterministic under a fixed seed.
# ---------------------------------------------------------------------


def q_corpus_shuffle(sf_dir: str):
    """Seeded corpus shuffle with DISTRIBUTED position tagging: one
    metadata row per block (first doc_id + row count, doc_ids are
    unique) gives the driver per-block start offsets, and every block
    tags its own positions in parallel — the round-2 serial
    ``concurrency=1`` counter stage is gone (verdict item #6; same
    per-block offset trick as stages/index.py zip_with_index).

    The permutation is a HASH-SORT shuffle (portable md5 draw per
    doc_id, the ``corpus_split`` hash contract, then one global sort):
    ``random_shuffle(seed=...)`` is only reproducible for a fixed
    input block structure, which Ray does not guarantee (dynamic block
    splitting varies with load — observed as a cross-run order flake),
    while the hash draw is reproducible across runs AND cluster
    sizes — the property a training-corpus shuffle actually needs.
    Same all-to-all cost as random_shuffle."""
    import ray

    from ..functions.hashing import md5_hex

    ds = _read(sf_dir, "documents", ["doc_id"])

    def draw(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        h = md5_hex([f"{d}:shuf42" for d in did])
        return pa.table({"doc_id": b["doc_id"],
                         "draw": pa.array([x[:16] for x in h],
                                          type=pa.string())})

    shuffled = ds.map_batches(draw, batch_format="pyarrow") \
        .sort(["draw", "doc_id"]).materialize()

    def block_meta(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"first": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        return pa.table({"first": pa.array([b["doc_id"][0].as_py()], type=pa.int64()),
                         "n": pa.array([b.num_rows], type=pa.int64())})

    # take_all preserves dataset (= shuffle) order, so offsets follow
    # the global shuffled order; the driver sees ONE ROW PER BLOCK
    offsets, acc = {}, 0
    for r in shuffled.map_batches(block_meta, batch_format="pyarrow",
                                  batch_size=None).take_all():
        offsets[r["first"]] = acc
        acc += r["n"]
    ref = ray.put(offsets)

    def assign(b: pa.Table, _ref=ref) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "block_pos": pa.array([], type=pa.int64())})
        base = ray.get(_ref)[b["doc_id"][0].as_py()]
        return pa.table({"doc_id": b["doc_id"],
                         "block_pos": pa.array(
                             base + np.arange(b.num_rows, dtype=np.int64),
                             type=pa.int64())})

    return shuffled.map_batches(assign, batch_format="pyarrow", batch_size=None)


# the md5 draw is portable: DuckDB's md5() replays the exact engine
# permutation, so the shuffle is oracle-gated, not rows-only
SQL_CORPUS_SHUFFLE = """
SELECT doc_id,
       CAST(row_number() OVER (
           ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || ':shuf42'), 1, 16),
                    doc_id) - 1 AS BIGINT) AS block_pos
FROM documents
"""


# ---------------------------------------------------------------------
# S7: CSV table source + ground-truth merge (≙ reference
# dataset_factory.py:312-511: pandas read_csv + GT merge by row id).
# The CSV is staged once from the parquet table (driver-side cache),
# then read DISTRIBUTED with ray.data.read_csv and joined to the
# nation "ground truth" side.
# ---------------------------------------------------------------------


def q_csv_customers(sf_dir: str):
    from .queries import _empty_guard

    empty = _empty_guard(sf_dir, ["customer", "nation"],
                         {"c_custkey": pa.int64(), "c_name": pa.string(),
                          "nation": pa.string(),
                          "c_acctbal": pa.float64()})
    if empty is not None:
        return empty

    import os

    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq
    import ray.data as rd

    cache = os.path.join("/tmp/refined_ray_data/csv_cache",
                         os.path.basename(os.path.normpath(sf_dir)))
    os.makedirs(cache, exist_ok=True)
    csv_path = os.path.join(cache, "customer.csv")
    if not os.path.exists(csv_path):
        t = pq.read_table(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal"])
        tmp = csv_path + ".tmp"
        pacsv.write_csv(t, tmp)
        os.replace(tmp, csv_path)

    customers = rd.read_csv(csv_path)
    gt = _read(sf_dir, "nation", ["n_nationkey", "n_name"])

    def widen(b: pa.Table) -> pa.Table:
        # CSV inference yields int64 keys; align the parquet GT side
        return pa.table({"n_nationkey": b["n_nationkey"].cast(pa.int64()),
                         "n_name": b["n_name"]})

    gt = gt.map_batches(widen, batch_format="pyarrow")
    from .. import default_num_partitions

    joined = customers.join(gt, join_type="inner",
                            num_partitions=default_num_partitions(),
                            on=("c_nationkey",), right_on=("n_nationkey",))

    def project(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b["c_custkey"].cast(pa.int64()),
            "c_name": b["c_name"],
            "nation": b["n_name"],
            "c_acctbal": b["c_acctbal"].cast(pa.float64()),
        })

    return joined.map_batches(project, batch_format="pyarrow")


SQL_CSV_CUSTOMERS = """
SELECT c_custkey, c_name, n_name AS nation, c_acctbal
FROM customer JOIN nation ON n_nationkey = c_nationkey
"""


# ---------------------------------------------------------------------
# J8: main-entity weak labels (≙ reference
# wikipedia_dataset.py:226-274 merge_in_main_entity_mentions: doc title
# parts matched against detected spans → weak supervision).  Title
# analogue: the doc's first two tokens; spans: the non-stopword phrase
# runs; weak label: a phrase sharing >= 1 token with the title.
# ---------------------------------------------------------------------


def q_weak_labels(sf_dir: str):
    from ..functions.tokenize import STOPWORD_SET, tokenize_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def per_doc(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        ids = b["doc_id"].to_pylist()
        flat, starts = tokenize_batch(texts)
        out_id, out_surface = [], []
        for i, did in enumerate(ids):
            toks = flat[starts[i]:starts[i + 1]]
            title_parts = set(toks[:2])
            run: list[str] = []
            for t in toks + [None]:
                if t is not None and t not in STOPWORD_SET:
                    run.append(t)
                else:
                    if len(run) >= 2 and title_parts & set(run):
                        out_id.append(did)
                        out_surface.append(" ".join(run))
                    run = []
        return pa.table({"doc_id": pa.array(out_id, type=pa.int64()),
                         "surface": pa.array(out_surface, type=pa.string())})

    return ds.map_batches(per_doc, batch_format="pyarrow")


def _sql_weak_labels() -> str:
    from .queries import SQL_MENTION_PHRASES

    return f"""
WITH phrases AS ({SQL_MENTION_PHRASES}),
title AS (
  SELECT doc_id, list_slice({_TOKS}, 1, 2) AS parts FROM documents
)
SELECT p.doc_id, p.surface
FROM phrases p JOIN title t ON t.doc_id = p.doc_id
WHERE len(list_intersect(string_split(p.surface, ' '), t.parts)) > 0
"""


# ---------------------------------------------------------------------
# A6: 2-pass global max + fill (≙ reference
# generate_qcode_to_type_indices.py:47-77: pass 1 finds the global max
# classes-per-entity, pass 2 pads every row to that width).  Pass 1 is
# a scalar aggregate; the scalar broadcasts into the pass-2 map.
# ---------------------------------------------------------------------


def q_global_pad(sf_dir: str):
    from ray.data.aggregate import Max

    from ..functions.tokenize import tokenize_batch
    from .queries import _empty_guard

    empty = _empty_guard(sf_dir, "documents",
                         {"doc_id": pa.int64(), "n_tokens": pa.int64(),
                          "padded_width": pa.int64(),
                          "n_pad": pa.int64()})
    if empty is not None:
        return empty

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count_tokens(b: pa.Table) -> pa.Table:
        _, starts = tokenize_batch(b["text"].to_pylist())
        return pa.table({"doc_id": b["doc_id"],
                         "n": pa.array(np.diff(np.asarray(starts)), type=pa.int64())})

    counts = ds.map_batches(count_tokens, batch_format="pyarrow").materialize()
    width = int(counts.aggregate(Max("n", alias_name="w"))["w"])  # pass 1

    def pad(b: pa.Table) -> pa.Table:  # pass 2: fill to the global max
        n = b["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tokens": b["n"],
            "padded_width": pa.array(np.full(len(n), width, dtype=np.int64)),
            "n_pad": pa.array(width - n, type=pa.int64()),
        })

    return counts.map_batches(pad, batch_format="pyarrow")


SQL_GLOBAL_PAD = f"""
WITH c AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
), m AS (SELECT max(n_tokens) AS w FROM c)
SELECT doc_id, n_tokens,
       CAST((SELECT w FROM m) AS BIGINT) AS padded_width,
       CAST((SELECT w FROM m) - n_tokens AS BIGINT) AS n_pad
FROM c
"""


# ---------------------------------------------------------------------
# M7: sentence splitting (functions/sentences.py ≙ reference Punkt
# splitter, preprocessor.py:240-247).  The corpus has no sentence
# punctuation, so each doc's filtered tokens are chunked into 8-token
# sentences joined with ". " — the ENGINE then runs the real splitter
# over that text and must recover the chunk boundaries and exact char
# offsets (the SQL oracle reconstructs them arithmetically).
# ---------------------------------------------------------------------


def q_sentence_split(sf_dir: str, chunk: int = 8):
    from ..functions.sentences import ABBREVIATIONS, split_sentences
    from ..functions.tokenize import tokenize_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def per_doc(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        ids = b["doc_id"].to_pylist()
        flat, starts = tokenize_batch(texts)
        out = {"doc_id": [], "sent_idx": [], "sentence": [], "start": [], "ln": []}
        for i, did in enumerate(ids):
            toks = [t for t in flat[starts[i]:starts[i + 1]]
                    if len(t) >= 2 and t not in ABBREVIATIONS]
            if not toks:
                continue
            text_s = ". ".join(" ".join(toks[j:j + chunk])
                               for j in range(0, len(toks), chunk)) + "."
            for idx, (s, e) in enumerate(split_sentences(text_s)):
                out["doc_id"].append(did)
                out["sent_idx"].append(idx)
                out["sentence"].append(text_s[s:e])
                out["start"].append(s)
                out["ln"].append(e - s)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "sent_idx": pa.array(out["sent_idx"], type=pa.int64()),
            "sentence": pa.array(out["sentence"], type=pa.string()),
            "start": pa.array(out["start"], type=pa.int64()),
            "ln": pa.array(out["ln"], type=pa.int64()),
        })

    return ds.map_batches(per_doc, batch_format="pyarrow")


def _sql_sentence_split() -> str:
    from ..functions.sentences import ABBREVIATIONS

    abbrev_sql = "(" + ", ".join(f"'{a}'" for a in sorted(ABBREVIATIONS)) + ")"
    return f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS}) AS tok,
         unnest(range(1, len({_TOKS}) + 1)) AS ord
  FROM documents
), f AS (
  SELECT doc_id, tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS r
  FROM t WHERE len(tok) >= 2 AND tok NOT IN {abbrev_sql}
), chunks AS (
  SELECT doc_id, CAST((r - 1) // 8 AS BIGINT) AS sent_idx,
         string_agg(tok, ' ' ORDER BY r) || '.' AS sentence
  FROM f GROUP BY 1, 2
)
SELECT doc_id, sent_idx, sentence,
  CAST(COALESCE(sum(len(sentence) + 1) OVER (
      PARTITION BY doc_id ORDER BY sent_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start,
  CAST(len(sentence) AS BIGINT) AS ln
FROM chunks
"""


# ---------------------------------------------------------------------
# T7/D5: candidate generation with person-name coreference, end to end
# (stages/candidates.py).  Mentions = phrase runs + single tokens per
# doc in order; PEM = phrase surface → per-source counts (built with
# the keyed-exchange segment pass); every entity is "human" so
# multi-token mentions propagate their candidates to their parts
# within the SAME document only.  Rows-only: the coref fold is
# stateful-per-doc and not SQL-expressible; pytest gates the fold
# semantics (tests/test_candidates.py).
# ---------------------------------------------------------------------


# phrase-PEM broadcast budget (rows of (surface, entity) instances);
# beyond it the candidate attachment switches to the hash-join path —
# module-level so the path-parity test can force the join path.
PERSON_COREF_BROADCAST_MAX_ROWS = 2_000_000


def _person_coref_join_path(ds, counts, doc_mentions_fn, nparts: int):
    """Over-budget candidate attachment: the phrase PEM stays a Dataset
    (one row per surface, candidate list JSON-serialized), mentions
    LEFT-join to it on the normalized surface, and the person-coref
    fold runs doc-locally inside a doc-keyed segment pass — no driver
    dict, no broadcast, identical rows to the broadcast path (parity
    test forces this path at budget 0)."""
    import json

    from ..functions.normalize import normalize_surface_form
    from ..functions.tokenize import tokenize_batch
    from ..stages.candidates import add_candidates_to_doc

    # per-surface candidate lists: counts is already surface-partitioned,
    # one lexsort/segment pass aggregates (surface, entity) instance rows
    # into the same sorted-by-(-prob, entity) lists the broadcast builds
    def pem_part(b: pa.Table) -> pa.Table:
        empty = pa.table({"psurf": pa.array([], type=pa.string()),
                          "cands_ser": pa.array([], type=pa.string())})
        if b.num_rows == 0:
            return empty
        s = np.asarray(b["surface"].to_pylist(), dtype=object)
        e = np.asarray(b["entity"].to_pylist(), dtype=object)
        order = np.lexsort((e, s))
        s, e = s[order], e[order]
        new_pair = np.r_[True, (s[1:] != s[:-1]) | (e[1:] != e[:-1])]
        pair_start = np.flatnonzero(new_pair)
        pair_cnt = np.diff(np.r_[pair_start, len(s)])
        ps, pe = s[pair_start], e[pair_start]
        surf_start = np.flatnonzero(np.r_[True, ps[1:] != ps[:-1]])
        surf_tot = np.add.reduceat(pair_cnt, surf_start)
        prob = pair_cnt / np.repeat(surf_tot, np.diff(np.r_[surf_start, len(ps)]))
        rows_s, rows_c = [], []
        bounds = np.r_[surf_start, len(ps)]
        for a, z in zip(bounds[:-1], bounds[1:]):
            cand = sorted(((pe[i], float(prob[i])) for i in range(a, z)),
                          key=lambda x: (-x[1], x[0]))
            rows_s.append(ps[a])
            rows_c.append(json.dumps(cand))
        return pa.table({"psurf": pa.array(rows_s, type=pa.string()),
                         "cands_ser": pa.array(rows_c, type=pa.string())})

    pem_ds = counts.map_batches(pem_part, batch_format="pyarrow",
                                batch_size=None)
    # humans = the distinct entities of the PEM (same set the broadcast
    # derives); entity cardinality ≪ surface cardinality, so a driver
    # set is bounded even when the PEM itself is not
    humans = set(counts.unique("entity"))

    def explode_mentions(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        ids = b["doc_id"].to_pylist()
        flat, starts = tokenize_batch(texts)
        out_d, out_o, out_s, out_n = [], [], [], []
        for i, did in enumerate(ids):
            for j, m in enumerate(doc_mentions_fn(flat[starts[i]:starts[i + 1]])):
                out_d.append(did)
                out_o.append(j)
                out_s.append(m)
                out_n.append(normalize_surface_form(m))
        return pa.table({"doc_id": pa.array(out_d, type=pa.int64()),
                         "mention_ord": pa.array(out_o, type=pa.int64()),
                         "surface": pa.array(out_s, type=pa.string()),
                         "norm": pa.array(out_n, type=pa.string())})

    mentions = ds.map_batches(explode_mentions, batch_format="pyarrow")
    joined = mentions.join(pem_ds, join_type="left_outer",
                           num_partitions=nparts,
                           on=("norm",), right_on=("psurf",))
    parted = joined.repartition(num_blocks=nparts, keys=["doc_id"], sort=False)

    out_schema = {"doc_id": pa.int64(), "mention_ord": pa.int64(),
                  "surface": pa.string(), "qcode": pa.string(),
                  "prob": pa.float64()}

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({c: pa.array([], type=t) for c, t in out_schema.items()})
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        o = b["mention_ord"].to_numpy(zero_copy_only=False)
        order = np.lexsort((o, d))
        surf = b["surface"].take(pa.array(order, type=pa.int64())).to_pylist()
        norm = b["norm"].take(pa.array(order, type=pa.int64())).to_pylist()
        ser = b["cands_ser"].take(pa.array(order, type=pa.int64())).to_pylist()
        d, o = d[order], o[order]
        bounds = np.r_[np.flatnonzero(np.r_[True, d[1:] != d[:-1]]), len(d)]
        out = {"doc_id": [], "mention_ord": [], "surface": [],
               "qcode": [], "prob": []}
        for a, z in zip(bounds[:-1], bounds[1:]):
            local_pem = {norm[i]: [tuple(c) for c in json.loads(ser[i])]
                         for i in range(a, z) if ser[i] is not None}
            ms = surf[a:z]
            cands = add_candidates_to_doc(ms, local_pem, humans,
                                          max_candidates=1)
            for j, (m, cl) in enumerate(zip(ms, cands)):
                q, p = cl[0]
                out["doc_id"].append(int(d[a]))
                out["mention_ord"].append(j)
                out["surface"].append(m)
                out["qcode"].append(q)
                out["prob"].append(p)
        return pa.table({c: pa.array(out[c], type=t)
                         for c, t in out_schema.items()})

    return parted.map_batches(fold, batch_format="pyarrow", batch_size=None)


def q_person_coref(sf_dir: str):
    import ray

    from ..functions.tokenize import STOPWORD_SET, tokenize_batch
    from ..stages.candidates import add_candidates_to_doc

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def _doc_mentions(toks: list[str]) -> list[str]:
        out, run = [], []
        for t in toks + [None]:
            if t is not None and t not in STOPWORD_SET:
                run.append(t)
            else:
                if len(run) >= 2:
                    out.append(" ".join(run))
                elif len(run) == 1:
                    out.append(run[0])
                run = []
        return out

    # phrase-level PEM (surface → [(source, prob)]), distributed build
    def explode(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        sources = b["source"].to_pylist()
        flat, starts = tokenize_batch(texts)
        surf, ent = [], []
        for i, src in enumerate(sources):
            toks = flat[starts[i]:starts[i + 1]]
            for m in set(_doc_mentions(toks)):
                surf.append(m)
                ent.append(src)
        return pa.table({"surface": pa.array(surf, type=pa.string()),
                         "entity": pa.array(ent, type=pa.string())})

    from .. import default_num_partitions
    nparts = default_num_partitions()
    counts = ds.map_batches(explode, batch_format="pyarrow") \
               .repartition(num_blocks=nparts, keys=["surface"], sort=False) \
               .materialize()

    # Two attachment paths, like the flagship/SimHash/LM-score guards:
    # under the counted budget the PEM side table broadcasts via
    # ray.put; beyond it (the reference probe works at 18M surfaces,
    # candidate_generator.py:62-94) it stays a Dataset and attaches to
    # mentions via a distributed LEFT hash join, with the coref fold
    # kept doc-local in a doc-keyed segment pass.
    if counts.count() > PERSON_COREF_BROADCAST_MAX_ROWS:
        return _person_coref_join_path(ds, counts, _doc_mentions, nparts)

    pem: dict[str, list[tuple[str, float]]] = {}
    from collections import Counter, defaultdict

    per_surface: dict[str, Counter] = defaultdict(Counter)
    for b in counts.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        for s, e in zip(b["surface"].to_pylist(), b["entity"].to_pylist()):
            per_surface[s][e] += 1
    for s, ctr in per_surface.items():
        total = sum(ctr.values())
        pem[s] = sorted(((e, c / total) for e, c in ctr.items()),
                        key=lambda x: (-x[1], x[0]))
    humans = {e for ctr in per_surface.values() for e in ctr}
    ref = ray.put((pem, humans))

    class Coref:
        def __init__(self):
            self.pem, self.humans = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            texts = b["text"].to_pylist()
            ids = b["doc_id"].to_pylist()
            flat, starts = tokenize_batch(texts)
            out = {"doc_id": [], "mention_ord": [], "surface": [],
                   "qcode": [], "prob": []}
            for i, did in enumerate(ids):
                mentions = _doc_mentions(flat[starts[i]:starts[i + 1]])
                cands = add_candidates_to_doc(mentions, self.pem, self.humans,
                                              max_candidates=1)
                for j, (m, cl) in enumerate(zip(mentions, cands)):
                    q, p = cl[0]
                    out["doc_id"].append(did)
                    out["mention_ord"].append(j)
                    out["surface"].append(m)
                    out["qcode"].append(q)
                    out["prob"].append(p)
            return pa.table({
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "mention_ord": pa.array(out["mention_ord"], type=pa.int64()),
                "surface": pa.array(out["surface"], type=pa.string()),
                "qcode": pa.array(out["qcode"], type=pa.string()),
                "prob": pa.array(out["prob"], type=pa.float64()),
            })

    return ds.map_batches(Coref, batch_format="pyarrow", concurrency=(1, 4))


# ---------------------------------------------------------------------
# A2: distinct → contiguous index (≙ reference build_entity_index,
# preprocess_all.py:112-122: distinct qcodes over PEM → 0..n-1).
# Distributed zip-with-index: distinct + sort, then per-block offsets
# from a cumulative count pass — no driver-side enumerate loop.
# ---------------------------------------------------------------------


def q_entity_index(sf_dir: str):
    """A2 distinct→contiguous index; the distributed zip-with-index
    lives in stages/index.py (shared with the offline-build DAG)."""
    from ..stages.index import zip_with_index

    ds = _read(sf_dir, "documents", ["source"])
    return zip_with_index(ds, "source", out_key="entity", out_col="idx")


SQL_ENTITY_INDEX = """
SELECT source AS entity, CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS idx
FROM (SELECT DISTINCT source FROM documents)
"""


# ---------------------------------------------------------------------
# M8: doc → fixed-size token windows (≙ reference Doc.to_batch_elements,
# doc_types.py:116-273: split a doc into ≤max_seq windows for the model
# stage).  Vectorized across the batch; one row per window.
# ---------------------------------------------------------------------


def q_doc_windows(sf_dir: str, max_seq: int = 64):
    from ..functions.tokenize import tokenize_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def windows(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        ids = np.asarray(b["doc_id"].to_pylist(), dtype=np.int64)
        _, starts = tokenize_batch(texts)
        lens = np.diff(np.asarray(starts, dtype=np.int64))
        n_win = -(-lens // max_seq)  # ceil; 0 windows for empty docs
        doc_rep = np.repeat(ids, n_win)
        widx = np.arange(n_win.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(n_win) - n_win, n_win)
        len_rep = np.repeat(lens, n_win)
        start_tok = widx * max_seq + 1  # 1-based, matching SQL ord
        n_tokens = np.minimum(max_seq, len_rep - widx * max_seq)
        return pa.table({
            "doc_id": pa.array(doc_rep, type=pa.int64()),
            "window_idx": pa.array(widx, type=pa.int64()),
            "start_tok": pa.array(start_tok, type=pa.int64()),
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
        })

    return ds.map_batches(windows, batch_format="pyarrow")


SQL_DOC_WINDOWS = f"""
WITH t AS (
  SELECT doc_id, unnest(range(1, len({_TOKS}) + 1)) AS ord FROM documents
)
SELECT doc_id, CAST((ord - 1) // 64 AS BIGINT) AS window_idx,
       CAST(min(ord) AS BIGINT) AS start_tok,
       CAST(count(*) AS BIGINT) AS n_tokens
FROM t GROUP BY doc_id, (ord - 1) // 64
"""


# ---------------------------------------------------------------------
# M8 e2e variant: sentence-boundary windows (never split a sentence) —
# ≙ Doc._to_batch_elements_e2e (doc_types.py:275-369).  The greedy
# packing fold is stages/collate.greedy_sentence_pack, the SAME core
# the real-splitter stage (collate_windows_sentences) uses; here the
# token→sentence assignment is a fixed cyclic size pattern so a DuckDB
# recursive CTE can replay the fold bit-exactly.  The real-text
# splitter semantics (searchsorted boundary assignment, Punkt-style
# rules) are pytest-gated instead (tests/test_benchmarks_collate.py).
# ---------------------------------------------------------------------

_SENT_CYCLE = (3, 7, 12, 5, 20, 9)  # token counts per synthetic
                                    # sentence, cycling; sums to 56


def q_window_sentences(sf_dir: str, max_seq: int = 16):
    """Greedy sentence packing (M8 e2e): each doc's tokens are grouped
    into synthetic sentences of cyclic sizes ``_SENT_CYCLE`` and packed
    into ≤``max_seq``-token windows that never split a sentence — a
    sentence longer than ``max_seq`` splits into max_seq-chunks, each
    its own window.  ``max_seq=16`` < max(cycle)=20 so every reference
    branch (flush, fit, long-sentence split with remainder) fires."""
    from ..functions.tokenize import tokenize_batch
    from ..stages.collate import greedy_sentence_pack
    from .queries import _read

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    cyc = np.asarray(_SENT_CYCLE, dtype=np.int64)
    cyc_sum = int(cyc.sum())
    cyc_off = np.concatenate(([0], np.cumsum(cyc)[:-1]))

    def windows(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        ids = b["doc_id"].to_pylist()
        _, starts = tokenize_batch(texts)
        lens = np.diff(np.asarray(starts, dtype=np.int64))
        out = {"doc_id": [], "window_idx": [], "start_tok": [], "n_tokens": []}
        for i, L in enumerate(lens):
            L = int(L)
            if L == 0:
                continue
            full, rem = divmod(L, cyc_sum)
            counts = np.concatenate(
                [np.tile(cyc, full),
                 np.clip(rem - cyc_off, 0, cyc)]) if full or rem else cyc[:0]
            w = greedy_sentence_pack(counts, max_seq)
            out["doc_id"].extend([ids[i]] * len(w))
            out["window_idx"].extend(range(len(w)))
            out["start_tok"].extend(1 + np.cumsum(w) - w)
            out["n_tokens"].extend(w)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "window_idx": pa.array(out["window_idx"], type=pa.int64()),
            "start_tok": pa.array(out["start_tok"], type=pa.int64()),
            "n_tokens": pa.array(out["n_tokens"], type=pa.int64()),
        })

    return ds.map_batches(windows, batch_format="pyarrow")


def _sql_window_sentences(max_seq: int = 16) -> str:
    """Recursive-CTE replay of the greedy sentence-packing fold: the
    recursion walks each doc's sentences in order carrying the open
    window's token count and emitting closed windows as a list; a
    final flush closes the last open window."""
    m = max_seq
    cyc = _SENT_CYCLE
    bounds = np.cumsum(cyc)
    case = " ".join(
        f"WHEN (ord-1)%{bounds[-1]} < {int(b)} THEN {j}"
        for j, b in enumerate(bounds[:-1])) + f" ELSE {len(cyc) - 1}"
    return f"""
WITH RECURSIVE t AS (
  SELECT doc_id, unnest(range(1, len({_TOKS}) + 1)) AS ord FROM documents
), s AS (
  SELECT doc_id,
         CAST(((ord-1)//{bounds[-1]})*{len(cyc)}
              + CASE {case} END AS BIGINT) AS sent,
         count(*) AS cnt
  FROM t GROUP BY 1, 2
), seq AS (
  SELECT doc_id, CAST(cnt AS BIGINT) AS cnt,
         row_number() OVER (PARTITION BY doc_id ORDER BY sent) AS rn
  FROM s
), steps AS (
  SELECT doc_id, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS cur,
         CAST([] AS BIGINT[]) AS emitted
  FROM (SELECT DISTINCT doc_id FROM seq)
  UNION ALL
  SELECT q.doc_id, q.rn,
    CASE WHEN q.cnt <= {m} THEN
      (CASE WHEN p.cur > 0 AND p.cur + q.cnt > {m} THEN 0 ELSE p.cur END)
      + q.cnt
    ELSE 0 END,
    (CASE WHEN p.cur > 0 AND p.cur + q.cnt > {m}
          THEN [p.cur] ELSE CAST([] AS BIGINT[]) END)
    || (CASE WHEN q.cnt > {m} THEN
          list_transform(range(CAST(q.cnt // {m} AS BIGINT)),
                         x -> CAST({m} AS BIGINT))
          || (CASE WHEN q.cnt % {m} > 0
               THEN [CAST(q.cnt % {m} AS BIGINT)]
               ELSE CAST([] AS BIGINT[]) END)
        ELSE CAST([] AS BIGINT[]) END)
  FROM steps p JOIN seq q ON q.doc_id = p.doc_id AND q.rn = p.rn + 1
), finals AS (
  SELECT p.doc_id, p.rn + 1 AS rn, CAST(0 AS BIGINT) AS cur,
         [p.cur] AS emitted
  FROM steps p
  WHERE p.cur > 0 AND NOT EXISTS (
    SELECT 1 FROM seq q WHERE q.doc_id = p.doc_id AND q.rn = p.rn + 1)
), allw AS (
  SELECT doc_id, rn, emitted FROM steps WHERE len(emitted) > 0
  UNION ALL
  SELECT doc_id, rn, emitted FROM finals
), flat AS (
  SELECT doc_id, rn, unnest(emitted) AS n_tokens,
         unnest(range(len(emitted))) AS sub
  FROM allw
)
SELECT doc_id,
  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY rn, sub) - 1
       AS BIGINT) AS window_idx,
  CAST(1 + COALESCE(sum(n_tokens) OVER (PARTITION BY doc_id
      ORDER BY rn, sub
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       AS BIGINT) AS start_tok,
  CAST(n_tokens AS BIGINT) AS n_tokens
FROM flat
"""


# ---------------------------------------------------------------------
# Table linking (≙ the reference's FastAPI table-linking job, §3.3):
# link a mention column against the PEM candidate table, top-k per
# cell.  pipelines/table_linking.py holds the reusable pipeline.
# ---------------------------------------------------------------------


def _table_link_cells(b: pa.Table) -> pa.Table:
    """First token of every non-empty doc as a (row_id, col, surface)
    cell — the shared synthetic cell table for both table-link
    queries."""
    from ..functions.tokenize import tokenize_batch

    texts = b["text"].to_pylist()
    ids = b["doc_id"].to_pylist()
    flat, starts = tokenize_batch(texts)
    rid, surf = [], []
    for i, did in enumerate(ids):
        if starts[i + 1] > starts[i]:
            rid.append(did)
            surf.append(flat[starts[i]])
    return pa.table({
        "row_id": pa.array(rid, type=pa.int64()),
        "col": pa.array(["c0"] * len(rid), type=pa.string()),
        "surface": pa.array(surf, type=pa.string()),
    })


def q_table_link(sf_dir: str, k: int = 3):
    from .queries import q_pem_table
    from .table_linking import link_cells

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    cells = docs.map_batches(_table_link_cells, batch_format="pyarrow")
    return link_cells(cells, q_pem_table(sf_dir), k=k)


SQL_TABLE_LINK = f"""
WITH toks AS (
  SELECT source AS entity, unnest(list_distinct({_TOKS})) AS surface FROM documents
), pem AS (
  SELECT surface, entity, count(*) AS cnt,
         count(*) / CAST(sum(count(*)) OVER (PARTITION BY surface) AS DOUBLE) AS prob
  FROM toks GROUP BY 1, 2
), ranked AS (
  SELECT surface, entity, prob,
         row_number() OVER (PARTITION BY surface ORDER BY prob DESC, entity) AS rank
  FROM pem
), cells AS (
  SELECT doc_id AS row_id, 'c0' AS col, list_extract({_TOKS}, 1) AS surface
  FROM documents WHERE len({_TOKS}) >= 1
)
SELECT c.row_id, c.col, c.surface, CAST(r.rank AS BIGINT) AS rank, r.entity, r.prob
FROM cells c JOIN ranked r ON r.surface = c.surface
WHERE r.rank <= 3
"""


def q_table_link_koala(sf_dir: str, k: int = 3):
    """Koala-shaped table linking (≙ job_service.py:181-230): the
    nested per-row result (candidates + null-candidate NIL handling +
    A7 column classification) built by ``koala_table_link``, exploded
    back to flat rows for the oracle gate.  The nested shape itself is
    golden-tested in tests/test_table_linking.py."""
    from .queries import q_pem_table
    from .table_linking import flatten_koala, koala_table_link

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    cells = docs.map_batches(_table_link_cells, batch_format="pyarrow")
    return flatten_koala(koala_table_link(cells, q_pem_table(sf_dir), k=k))


_SQL_COARSE_OF = ("CASE (strpos('0123456789abcdef', substr(md5({e}), 1, 1)) - 1) % 4 "
                  "WHEN 0 THEN 'PERSON' WHEN 1 THEN 'ORG' WHEN 2 THEN 'LOC' "
                  "ELSE 'OTHER' END")

SQL_TABLE_LINK_KOALA = f"""
WITH toks AS (
  SELECT source AS entity, unnest(list_distinct({_TOKS})) AS surface FROM documents
), pem AS (
  SELECT surface, entity, count(*) AS cnt,
         count(*) / CAST(sum(count(*)) OVER (PARTITION BY surface) AS DOUBLE) AS prob
  FROM toks GROUP BY 1, 2
), ranked AS (
  SELECT surface, entity, prob,
         row_number() OVER (PARTITION BY surface ORDER BY prob DESC, entity) AS rank
  FROM pem
), cells AS (
  SELECT doc_id AS row_id, list_extract({_TOKS}, 1) AS surface
  FROM documents WHERE len({_TOKS}) >= 1
), linked AS (
  SELECT c.row_id, c.surface, r.rank, r.entity, r.prob
  FROM cells c LEFT JOIN (SELECT * FROM ranked WHERE rank <= 3) r
    ON r.surface = c.surface
), coarse_c AS (
  SELECT row_id,
         CASE WHEN entity IS NULL THEN 'OTHER'
              ELSE {_SQL_COARSE_OF.format(e='entity')} END AS coarse
  FROM linked WHERE rank = 1 OR rank IS NULL
), hist AS (
  SELECT coarse, count(*) AS n FROM coarse_c GROUP BY 1
)
SELECT l.row_id, l.surface,
       CAST(COALESCE(l.rank, 1) AS BIGINT) AS idx,
       COALESCE(l.entity, 'null') AS cand_id,
       CASE WHEN l.entity IS NULL THEN l.surface ELSE l.entity END AS cand_name,
       COALESCE(l.prob, 0.0) AS score,
       CAST(CASE WHEN l.entity IS NOT NULL AND l.rank = 1 THEN 1 ELSE 0 END
            AS BIGINT) AS is_match,
       CASE WHEN l.entity IS NOT NULL AND l.rank = 1 THEN cc.coarse ELSE '' END
         AS type_id,
       cc.coarse,
       (SELECT coarse FROM hist ORDER BY n DESC, coarse LIMIT 1) AS col_coarse,
       (SELECT CAST(count(*) AS BIGINT) FROM cells) AS n_cells
FROM linked l JOIN coarse_c cc USING (row_id)
"""


# ---------------------------------------------------------------------
# Multimodal stub pipeline (rows-only)
# ---------------------------------------------------------------------


def q_media_frames(sf_dir: str):
    """Video-shaped frame sampling over opaque blobs (rows-only: the
    frame slicing is engine-internal plumbing; the pytest gate checks
    fan-out counts and stride)."""
    from ..stages.multimodal import frame_sample_stage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_media(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "media": pa.array([t.encode() for t in b["text"].to_pylist()],
                              type=pa.binary()),
        })

    media = ds.map_batches(to_media, batch_format="pyarrow")
    out = frame_sample_stage(media)
    return out.select_columns(["doc_id", "frame_idx", "n_frames", "frame_mean"])


def q_media_resize(sf_dir: str):
    """Decode → bilinear resize to 8×8 → bytes (rows-only: stub
    decoder; the resize math is pytest-gated)."""
    from ..stages.multimodal import media_resize_stage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_media(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "media": pa.array([t.encode() for t in b["text"].to_pylist()],
                              type=pa.binary()),
        })

    media = ds.map_batches(to_media, batch_format="pyarrow")
    return media_resize_stage(media).select_columns(["doc_id", "height", "width"])


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


def q_er_clusters_exact(sf_dir: str):
    """Flagship ER with the exact-verification tier: borderline MinHash
    estimates (±0.12 of the 0.5 component threshold) re-decided by
    EXACT set Jaccard over joined shingle sets.  Rows-only (same
    rows/schema as er_clusters; the F1 gates live in pytest)."""
    from .entity_resolution import er_cluster_pages

    return er_cluster_pages(sf_dir, exact_verify=True)


def q_er_errors(sf_dir: str):
    """FP/FN url-pair dump of the flagship run vs ground truth (≙ the
    reference's qualitative error analysis, evaluation.py:107-124 /
    my_tests/error_analysis.py).  Rows-only; empty when F1 is 1.0 —
    the pytest gate plants a broken clustering and checks the exact
    FP/FN pair sets."""
    from .evaluation import er_errors

    return er_errors(sf_dir)


def q_er_clusters_incremental(sf_dir: str):
    """Incremental ingest demo: a standing base (4/5 of pages, per-stage
    checkpointed) plus a delta (1/5, page_id % 5 == 0) folded in without
    re-scoring base×base pairs.  Rows-only (synthetic pages are outside
    the oracle views); the pytest gate asserts the result is IDENTICAL
    to the full-corpus run and F1 1.0 vs ground truth."""
    import os

    from .entity_resolution import er_cluster_incremental

    root = os.path.join("/tmp/refined_ray_checkpoints",
                        os.path.basename(os.path.normpath(sf_dir)) + "-incr")
    return er_cluster_incremental(sf_dir, root)


def q_er_clusters_checkpointed(sf_dir: str):
    """Flagship ER through the per-stage checkpoint/lineage layer; a
    repeated call with unchanged inputs resumes from the manifests."""
    import os

    from .entity_resolution import er_cluster_pages_checkpointed

    root = os.path.join("/tmp/refined_ray_checkpoints",
                        os.path.basename(os.path.normpath(sf_dir)))
    return er_cluster_pages_checkpointed(sf_dir, root)



# ---------------------------------------------------------------------
# Training-data engine additions: deterministic corpus split +
# cross-split n-gram decontamination (the train/test-overlap scrub
# every LLM data pipeline runs before training).  Both oracle-checked.
# ---------------------------------------------------------------------

# md5-hex prefix split boundaries (two lowercase hex chars compare like
# the byte they encode): train < 'cc' (204/256 ≈ 79.7%), val < 'e6'
# (26/256 ≈ 10.2%), test the rest.  md5 is the PORTABLE contract —
# hashlib and DuckDB's md5() agree byte-for-byte, so the assignment is
# reproducible across engines and stable at any scale (a doc's split
# never depends on what else is in the corpus).
SPLIT_TRAIN_MAX = "cc"
SPLIT_VAL_MAX = "e6"


def _md5_buckets(ids) -> list[str]:
    import hashlib

    return [hashlib.md5(str(int(i)).encode()).hexdigest()[:2] for i in ids]


def q_corpus_split(sf_dir: str):
    """Deterministic hash split: doc_id → (bucket, train/val/test).
    Stateless per row, so it runs as a pure projection at any scale;
    the md5-of-key contract (not the engine-internal FNV) is chosen so
    any system — SQL, Spark, a bash script — reproduces the split."""
    from .queries import _read

    ds = _read(sf_dir, "documents", ["doc_id"])

    def assign(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        buckets = _md5_buckets(ids)
        split = ["train" if h < SPLIT_TRAIN_MAX
                 else "val" if h < SPLIT_VAL_MAX else "test"
                 for h in buckets]
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "bucket": pa.array(buckets, type=pa.string()),
            "split": pa.array(split, type=pa.string()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


SQL_CORPUS_SPLIT = f"""
WITH b AS (
  SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < '{SPLIT_TRAIN_MAX}' THEN 'train'
            WHEN bucket < '{SPLIT_VAL_MAX}' THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


def _split_shingle_pairs(sf_dir: str, n: int = 5):
    """Shared first stage of the decontamination family: materialized
    distinct (doc_id, shingle-hash, role) rows for the train/test
    splits (role 0 = train, 1 = test; val dropped).  Shingles are
    64-bit hashes of n-token windows via the MinHash rolling kernel."""
    from ..functions.minhash import shingle_hashes
    from ..functions.tokenize import tokenize_hash_arrow
    from .queries import _read

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def shingles(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "sh": pa.array([], type=pa.int64()),
                          "role": pa.array([], type=pa.int8())})
        if b.num_rows == 0:
            return empty
        ids = np.asarray(b["doc_id"].to_pylist(), dtype=np.int64)
        buckets = np.asarray(_md5_buckets(ids))
        role = np.full(len(ids), -1, dtype=np.int8)  # -1 = val (dropped)
        role[buckets < SPLIT_TRAIN_MAX] = 0          # train
        role[buckets >= SPLIT_VAL_MAX] = 1           # test

        tok_h, starts, _ = tokenize_hash_arrow(b["text"])
        flat_sh, _ = shingle_hashes(None, starts, k=n, tok_h=tok_h)
        lens = np.diff(starts)
        cnt = np.maximum(lens - (n - 1), 1)  # shingle_hashes slot layout
        doc_rep = np.repeat(np.arange(len(ids), dtype=np.int64), cnt)
        # keep only real shingles (docs with >= n tokens) of split docs
        mask = (lens >= n)[doc_rep] & (role[doc_rep] >= 0)
        d, s = doc_rep[mask], flat_sh[mask].view(np.int64)
        if not len(d):
            return empty
        # distinct (doc, shingle): one lexsort + neighbor mask
        order = np.lexsort((s, d))
        d, s = d[order], s[order]
        keep = np.empty(len(d), dtype=bool)
        keep[0] = True
        keep[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1])
        d, s = d[keep], s[keep]
        return pa.table({
            "doc_id": pa.array(ids[d], type=pa.int64()),
            "sh": pa.array(s, type=pa.int64()),
            "role": pa.array(role[d], type=pa.int8()),
        })

    return ds.map_batches(shingles, batch_format="pyarrow").materialize()


def q_decontaminate(sf_dir: str, n: int = 5):
    """Cross-split n-gram decontamination: for every TEST doc, count
    its distinct n-token shingles that also occur anywhere in the
    TRAIN split (docs shorter than n tokens have no shingles).

    Shape at 100 TB: shingles are 64-bit hashes (the same rolling
    kernel the MinHash path uses — the DuckDB oracle compares string
    shingles, so the green row doubles as a collision check), the
    train side collapses to DISTINCT shingles via a keyed groupby, and
    the test⋈train semi-join is a hash-partitioned equi-join on the
    shingle key — no side is ever collected.  The one materialize() is
    the shingle table itself (both splits read it), the role the
    flagship's disk exchange plays at full scale.  The sketch twin
    (``decontaminate_bloom``) replaces the equi-join with a broadcast
    Bloom filter when the train side dwarfs the test side."""
    from ray.data.aggregate import Count

    from .. import default_num_partitions
    from .queries import _empty_guard

    empty = _empty_guard(sf_dir, "documents",
                         {"doc_id": pa.int64(),
                          "n_contaminated": pa.int64()})
    if empty is not None:
        return empty

    pairs = _split_shingle_pairs(sf_dir, n)
    nparts = default_num_partitions()
    train_sh = pairs.filter(expr="role == 0") \
        .groupby("sh", num_partitions=nparts) \
        .aggregate(Count(alias_name="n_train")) \
        .select_columns(["sh"])
    test_sh = pairs.filter(expr="role == 1").select_columns(["doc_id", "sh"])
    hits = test_sh.join(train_sh, join_type="inner",
                        num_partitions=nparts, on=("sh",))
    return hits.groupby("doc_id", num_partitions=nparts).aggregate(
        Count(alias_name="n_contaminated"))


def _sql_decontaminate(n: int = 5) -> str:
    return f"""
WITH sp AS (
  SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len({_TOKS}) - {n} + 2),
           i -> array_to_string(list_slice({_TOKS}, i, i + {n} - 1), ' ')
         ))) AS s
  FROM documents WHERE len({_TOKS}) >= {n}
), train AS (
  SELECT DISTINCT s FROM sh JOIN sp USING (doc_id)
  WHERE b < '{SPLIT_TRAIN_MAX}'
), test AS (
  SELECT doc_id, s FROM sh JOIN sp USING (doc_id)
  WHERE b >= '{SPLIT_VAL_MAX}'
)
SELECT doc_id, count(*) AS n_contaminated
FROM test JOIN train USING (s) GROUP BY 1
"""


def q_doc_repetition(sf_dir: str):
    """Repetition-based quality signals (the Gopher/C4-style filter
    family): per doc, the fraction of line CHARACTERS belonging to
    repeated lines (occurrences beyond a line's first) and the
    fraction of token 3-grams that are duplicates.  One stateless
    vectorized pass — line hashing, 3-gram hashing and the per-doc
    duplicate detection are each a lexsort + neighbor mask over flat
    segment arrays, no per-doc python."""
    from ..functions.minhash import shingle_hashes
    from ..functions.tokenize import _fnv_hash_strview, tokenize_hash_arrow
    from .queries import _canon_round, _read

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _dup_weight(doc_rep: np.ndarray, h: np.ndarray,
                    w: np.ndarray, n_docs: int) -> np.ndarray:
        """Σ weight over occurrences beyond the first of each (doc,
        hash) group, per doc."""
        if not len(doc_rep):
            return np.zeros(n_docs)
        order = np.lexsort((h, doc_rep))
        d, v, wt = doc_rep[order], h[order], w[order]
        dup = np.empty(len(d), dtype=bool)
        dup[0] = False
        dup[1:] = (d[1:] == d[:-1]) & (v[1:] == v[:-1])
        return np.bincount(d[dup], weights=wt[dup], minlength=n_docs)

    def rep(b: pa.Table) -> pa.Table:
        ids = b["doc_id"]
        n = b.num_rows
        text = b["text"].combine_chunks() if isinstance(
            b["text"], pa.ChunkedArray) else b["text"]

        # repeated-line character fraction
        lines = pc.split_pattern(text, pattern="\n")
        lines = lines.combine_chunks() if isinstance(
            lines, pa.ChunkedArray) else lines
        flat = lines.flatten()
        counts = np.diff(lines.offsets.to_numpy())
        doc_rep = np.repeat(np.arange(n, dtype=np.int64), counts)
        ln = pc.utf8_length(flat).to_numpy().astype(np.float64)
        lh = _fnv_hash_strview(flat)
        dupchars = _dup_weight(doc_rep, lh, ln, n)
        totchars = np.bincount(doc_rep, weights=ln, minlength=n)
        line_frac = np.divide(dupchars, totchars,
                              out=np.zeros(n), where=totchars > 0)

        # duplicate token-3-gram fraction
        tok_h, starts, _ = tokenize_hash_arrow(text)
        tlens = np.diff(starts)
        flat_sh, _ = shingle_hashes(None, starts, k=3, tok_h=tok_h)
        cnt = np.maximum(tlens - 2, 1)  # shingle_hashes slot layout
        sh_doc = np.repeat(np.arange(n, dtype=np.int64), cnt)
        real = (tlens >= 3)[sh_doc]  # drop short-doc sentinel shingles
        dup3 = _dup_weight(sh_doc[real], flat_sh[real],
                           np.ones(int(real.sum())), n)
        n3 = np.where(tlens >= 3, tlens - 2, 0).astype(np.float64)
        ngram_frac = np.divide(dup3, n3, out=np.zeros(n), where=n3 > 0)

        return pa.table({
            "doc_id": ids,
            "dup_line_frac": _canon_round(line_frac, 6),
            "dup_ngram_frac": _canon_round(ngram_frac, 6),
        })

    return ds.map_batches(rep, batch_format="pyarrow")


def _sql_doc_repetition() -> str:
    from .queries import _sql_round

    return f"""
WITH lc AS (
  SELECT doc_id, line, len(line) AS ln, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
        FROM documents)
  GROUP BY 1, 2, 3
), la AS (
  SELECT doc_id, sum((c - 1) * ln) AS dupchars, sum(c * ln) AS totchars
  FROM lc GROUP BY 1
), tg AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3 THEN len(toks) - 2 ELSE 0 END AS n3,
         CASE WHEN len(toks) >= 3 THEN len(list_distinct(list_transform(
             range(1, len(toks) - 1),
             i -> array_to_string(list_slice(toks, i, i + 2), ' '))))
              ELSE 0 END AS d3
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
)
SELECT la.doc_id,
  {_sql_round("CASE WHEN totchars > 0 THEN dupchars / CAST(totchars AS DOUBLE) ELSE 0.0 END", 6)} AS dup_line_frac,
  {_sql_round("CASE WHEN n3 > 0 THEN (n3 - d3) / CAST(n3 AS DOUBLE) ELSE 0.0 END", 6)} AS dup_ngram_frac
FROM la JOIN tg USING (doc_id)
"""


EXT_QUERIES = {
    "part_norm": q_part_norm,
    "orders_topk_per_customer": q_orders_topk_per_customer,
    "user_running_value": q_user_running_value,
    "events_extract_k": q_events_extract_k,
    "docs_without_neardup": q_docs_without_neardup,
    "candidate_topk": q_candidate_topk,
    "simhash_fingerprints": q_simhash_fingerprints,
    "simhash_candidates": q_simhash_candidates,
    "date_normalize": q_date_normalize,
    "date_doc_infer": q_date_doc_infer,
    "span_merge": q_span_merge,
    "class_closure": q_class_closure,
    "class_prune": q_class_prune,
    "class_selection": q_class_selection,
    "corpus_shuffle": q_corpus_shuffle,
    "csv_customers": q_csv_customers,
    "weak_labels": q_weak_labels,
    "sentence_split": q_sentence_split,
    "person_coref": q_person_coref,
    "entity_index": q_entity_index,
    "doc_windows": q_doc_windows,
    "window_sentences": q_window_sentences,
    "corpus_split": q_corpus_split,
    "decontaminate": q_decontaminate,
    "doc_repetition": q_doc_repetition,
    "table_link": q_table_link,
    "table_link_koala": q_table_link_koala,
    "global_pad": q_global_pad,
    "media_features": q_media_features,
    "media_frames": q_media_frames,
    "media_resize": q_media_resize,
    "er_quality": q_er_quality,
    "er_clusters_exact": q_er_clusters_exact,
    "er_clusters_checkpointed": q_er_clusters_checkpointed,
    "er_clusters_incremental": q_er_clusters_incremental,
    "er_errors": q_er_errors,
}

EXT_ORACLES = {
    "part_norm": SQL_PART_NORM,
    "corpus_shuffle": SQL_CORPUS_SHUFFLE,
    "orders_topk_per_customer": SQL_ORDERS_TOPK_PER_CUSTOMER,
    "user_running_value": SQL_USER_RUNNING_VALUE,
    "events_extract_k": SQL_EVENTS_EXTRACT_K,
    "docs_without_neardup": SQL_DOCS_WITHOUT_NEARDUP,
    "candidate_topk": SQL_CANDIDATE_TOPK,
    "date_normalize": SQL_DATE_NORMALIZE,
    "date_doc_infer": SQL_DATE_DOC_INFER,
    "span_merge": _sql_span_merge(),
    "class_closure": SQL_CLASS_CLOSURE,
    "class_prune": SQL_CLASS_PRUNE,
    "class_selection": SQL_CLASS_SELECTION,
    "csv_customers": SQL_CSV_CUSTOMERS,
    "weak_labels": _sql_weak_labels(),
    "sentence_split": _sql_sentence_split(),
    "entity_index": SQL_ENTITY_INDEX,
    "doc_windows": SQL_DOC_WINDOWS,
    "window_sentences": _sql_window_sentences(),
    "corpus_split": SQL_CORPUS_SPLIT,
    "decontaminate": _sql_decontaminate(),
    # the query fn lives in queries_webtext (forced multi-shard Bloom);
    # its output equals the exact join, so it shares this oracle
    "decontaminate_bloom_sharded": _sql_decontaminate(),
    "doc_repetition": _sql_doc_repetition(),
    "table_link": SQL_TABLE_LINK,
    "table_link_koala": SQL_TABLE_LINK_KOALA,
    "global_pad": SQL_GLOBAL_PAD,
    # corpus_shuffle: rows-only (engine-internal permutation; pytest
    # gate asserts permutation + fixed-seed determinism)
    # simhash_*, media_features, er_quality: rows-only (engine hashes /
    # model state / requires ground-truth table outside oracle views)
}


# ---------------------------------------------------------------------
# ANN scale path: IVF-bucketed search (vs brute-force q_ann_topk)
# ---------------------------------------------------------------------


def _vsum_fold(b: pa.Table) -> pa.Table:
    """Fold (cell, vsum-bytes, n) partial rows by cell: order-independent
    summation, shared by the IVF and PQ distributed-Lloyd trainers."""
    if b.num_rows == 0:
        return pa.table({"cell": pa.array([], type=pa.int64()),
                         "vsum": pa.array([], type=pa.binary()),
                         "n": pa.array([], type=pa.int64())})
    cell = b["cell"].to_numpy(zero_copy_only=False)
    n = b["n"].to_numpy(zero_copy_only=False)
    V = np.stack([np.frombuffer(v.as_py(), dtype=np.float64)
                  for v in b["vsum"]])
    out_c = np.unique(cell)
    sums = np.zeros((len(out_c), V.shape[1]))
    np.add.at(sums, np.searchsorted(out_c, cell), V)
    cnt = np.zeros(len(out_c), dtype=np.int64)
    np.add.at(cnt, np.searchsorted(out_c, cell), n)
    return pa.table({
        "cell": pa.array(out_c, type=pa.int64()),
        "vsum": pa.array([s.tobytes() for s in sums], type=pa.binary()),
        "n": pa.array(cnt, type=pa.int64()),
    })


def ivf_centroids(ds, n_cells: int, n_iters: int = 2):
    """Coarse IVF centroids: stride-sampled seeds refined by
    ``n_iters`` DISTRIBUTED spherical-Lloyd rounds (round-3 VERDICT
    #8 — seeds alone mis-shape cells on clustered data).

    Scale shape per round (the CC-loop pattern): centroids broadcast
    via ``ray.put``; each block computes per-cell partial (sum-vector,
    count) rows — ≤ ``n_cells`` TINY rows per block, the vectors
    themselves never move; partials fold by ONE keyed repartition on
    cell; exactly ≤ ``n_cells`` folded rows cross to the driver, which
    renormalizes (spherical k-means — the metric is cosine) and
    re-broadcasts.  Empty cells keep their previous centroid.
    Deterministic: seeds are file-order strided, every fold is
    order-independent summation re-sorted by cell."""
    import ray

    from .. import default_num_partitions

    sample = ds.limit(n_cells * 64).take_all()
    S = np.array([r["embedding"] for r in sample], dtype=np.float64)
    norms = np.linalg.norm(S, axis=1, keepdims=True)
    np.divide(S, norms, out=S, where=norms > 0)
    C = S[::max(len(S) // n_cells, 1)][:n_cells].copy()
    dim = C.shape[1]

    for _ in range(n_iters):
        cref = ray.put(C)

        def partial(b: pa.Table, _cref=cref) -> pa.Table:
            empty = pa.table({"cell": pa.array([], type=pa.int64()),
                              "vsum": pa.array([], type=pa.binary()),
                              "n": pa.array([], type=pa.int64())})
            if b.num_rows == 0:
                return empty
            Cc = ray.get(_cref)
            E = np.array(b["embedding"].to_pylist(), dtype=np.float64)
            nn = np.linalg.norm(E, axis=1, keepdims=True)
            np.divide(E, nn, out=E, where=nn > 0)
            cell = np.argmax(E @ Cc.T, axis=1)
            sums = np.zeros((len(Cc), E.shape[1]))
            np.add.at(sums, cell, E)
            cnt = np.bincount(cell, minlength=len(Cc))
            live = np.flatnonzero(cnt)
            return pa.table({
                "cell": pa.array(live, type=pa.int64()),
                "vsum": pa.array([sums[c].tobytes() for c in live],
                                 type=pa.binary()),
                "n": pa.array(cnt[live], type=pa.int64()),
            })

        rows = ds.map_batches(partial, batch_format="pyarrow") \
            .repartition(num_blocks=min(n_cells, default_num_partitions()),
                         keys=["cell"], sort=False) \
            .map_batches(_vsum_fold, batch_format="pyarrow", batch_size=None) \
            .take_all()
        newC = C.copy()
        for r in sorted(rows, key=lambda r: r["cell"]):
            mean = np.frombuffer(r["vsum"], dtype=np.float64)[:dim] / r["n"]
            nrm = np.linalg.norm(mean)
            if nrm > 0:
                newC[r["cell"]] = mean / nrm
        C = newC
    return C


def _query_vectors(ds, max_qid: int):
    """Bounded filtered read of the query vectors (``vec_id < max_qid``),
    sorted by vec_id and L2-normalized with a zero-norm guard (an
    all-zero embedding stays all-zero instead of going NaN through the
    whole scoring chain).  Shared by the IVF / IVF-partitioned / PQ
    paths so the guard lives in exactly one place."""
    qrows = sorted((r["vec_id"], r["embedding"])
                   for r in ds.filter(expr=f"vec_id < {max_qid}").take_all())
    qids = np.array([v for v, _ in qrows], dtype=np.int64)
    Q = np.array([e for _, e in qrows], dtype=np.float64)
    if Q.size:
        norms = np.linalg.norm(Q, axis=1, keepdims=True)
        np.divide(Q, norms, out=Q, where=norms > 0)
    return qids, Q


def q_ann_ivf(sf_dir: str, k: int = 5, max_qid: int = 10, n_cells: int = 16,
              n_probe: int = 8):
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

    # Coarse centroids: bounded-sample seeds + distributed Lloyd
    # rounds (never the full matrix on the driver — ≤ n_cells tiny
    # partial rows per block move, see ivf_centroids)
    C = ivf_centroids(ds, n_cells)

    # query vectors: a bounded filtered read (max_qid rows)
    qids, Q = _query_vectors(ds, max_qid)
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
                order = np.lexsort((sel_ids, -cos))[:k]
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

    # Per-group pandas is fine HERE ONLY: group count == the query set
    # (<=10 rows/group key), driver-scale by construction.  Do NOT copy
    # this pattern onto a high-cardinality key (use a keyed repartition
    # + segment pass instead, as in user_sessions/orders_topk).
    return partial.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def q_ann_ivf_partitioned(sf_dir: str, k: int = 5, max_qid: int = 10,
                          n_cells: int = 16, n_probe: int = 8):
    """IVF with CELL-PARTITIONED STORAGE — the true 100 TB layout: the
    corpus is written once as parquet partitioned by coarse cell, and
    each query batch READS ONLY its probe-cell partitions (I/O pruning,
    not just compute pruning like q_ann_ivf).  Rows-only; the pytest
    gate asserts result parity with q_ann_ivf under identical
    centroids and that non-probed partitions are never read."""
    import os
    import shutil
    import uuid

    import pandas as pd
    import ray
    import ray.data as rd

    from ..stages.exchange import EXCHANGE_ROOT
    from .queries import _read

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    # centroids + queries: same seed + Lloyd scheme as q_ann_ivf, so
    # the parity test compares identical cell geometry
    C = ivf_centroids(ds, n_cells)
    qids, Q = _query_vectors(ds, max_qid)
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]
    ref = ray.put((qids, Q, probe, C))

    # ONE partitioned write (at 100 TB this is the index-build job,
    # amortized over every later query)
    root = os.path.join(EXCHANGE_ROOT, "ivf-" + uuid.uuid4().hex)

    class AssignCells:
        def __init__(self):
            _, _, _, self.C = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            E = np.array(b["embedding"].to_pylist(), dtype=np.float64)
            nn = np.linalg.norm(E, axis=1, keepdims=True)
            np.divide(E, nn, out=E, where=nn > 0)
            cell = np.argmax(E @ self.C.T, axis=1).astype(np.int64)
            # "cell" drives the hive partitioning (stripped from data
            # files); "cellv" keeps the value readable per row
            b = b.append_column("cell", pa.array(cell, type=pa.int64()))
            return b.append_column("cellv", pa.array(cell, type=pa.int64()))

    ds.map_batches(AssignCells, batch_format="pyarrow", concurrency=(1, 4)) \
      .write_parquet(root, partition_cols=["cell"])

    # read ONLY the probed partitions
    import glob

    probed = sorted({int(c) for row in probe for c in row})
    files = [f for c in probed
             for f in glob.glob(os.path.join(root, f"cell={c}", "*.parquet"))]
    from .. import read_parquet_clean
    pruned = read_parquet_clean(files)

    class Search:
        def __init__(self):
            self.qids, self.Q, self.probe, _ = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            vids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            E = np.array(b["embedding"].to_pylist(), dtype=np.float64)
            nn = np.linalg.norm(E, axis=1, keepdims=True)
            np.divide(E, nn, out=E, where=nn > 0)
            cell = b["cellv"].to_numpy(zero_copy_only=False)
            out_q, out_n, out_c = [], [], []
            for j, qid in enumerate(self.qids):
                m = np.isin(cell, self.probe[j]) & (vids != qid)
                if not m.any():
                    continue
                cos = E[m] @ self.Q[j]
                sel = vids[m]
                order = np.lexsort((sel, -cos))[:k]
                out_q.append(np.full(len(order), qid, dtype=np.int64))
                out_n.append(sel[order])
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

    partial = pruned.map_batches(Search, batch_format="pyarrow", concurrency=(1, 4))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(k)
        return pd.DataFrame({
            "query_id": g["query_id"].to_numpy(),
            "neighbor_id": g["neighbor_id"].to_numpy(),
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
        })

    # Per-group pandas is fine HERE ONLY: group count == the query set
    # (<=10 rows/group key), driver-scale by construction.  Do NOT copy
    # this pattern onto a high-cardinality key (use a keyed repartition
    # + segment pass instead, as in user_sessions/orders_topk).
    out = partial.groupby("query_id").map_groups(
        final_topk, batch_format="pandas").materialize()
    shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------
# ANN compression path: product quantization (PQ) — brute = exact,
# IVF = prune reads, PQ = compress memory residency
# ---------------------------------------------------------------------


def pq_codebooks(ds, m_sub: int, ks: int, n_iters: int = 2):
    """Product-quantization codebooks: the embedding dimension splits
    into ``m_sub`` subspaces, each learning ``ks`` centroids so a
    vector stores as ``m_sub`` uint8 codes (dim=64 float32 → 16 bytes
    at m_sub=16: 16× memory reduction).

    Training is the SAME distributed-Lloyd shape as ``ivf_centroids``
    but every subspace trains in the one pass, keyed by
    ``sub*ks + code``: each block emits ≤ m_sub·ks tiny
    (cell, sum-vector, count) partial rows — the vectors themselves
    never move — folded by one keyed repartition per round
    (``_vsum_fold``), with ≤ m_sub·ks folded rows crossing to the
    driver for the re-broadcast.  Vectors are L2-normalized first
    (the metric is cosine), then each subspace runs plain Euclidean
    k-means — the standard PQ-for-cosine construction.  Deterministic:
    strided seeds, order-independent folds, empty cells keep their
    previous centroid.  Returns (m_sub, ks, dim//m_sub) float64."""
    import ray

    from .. import default_num_partitions

    if ks > 256:
        # codes are stored uint8 downstream (the whole point of PQ);
        # a larger ks would silently wrap code values — fail loudly
        raise ValueError(f"ks {ks} > 256 cannot be stored as uint8 codes")
    sample = ds.limit(ks * 64).take_all()
    S = np.array([r["embedding"] for r in sample], dtype=np.float64)
    norms = np.linalg.norm(S, axis=1, keepdims=True)
    np.divide(S, norms, out=S, where=norms > 0)
    dim = S.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    sub = dim // m_sub
    step = max(len(S) // ks, 1)
    seeds = S[::step][:ks]
    B = np.stack([seeds[:, m * sub:(m + 1) * sub] for m in range(m_sub)])

    for _ in range(n_iters):
        bref = ray.put(B)

        def partial(b: pa.Table, _bref=bref) -> pa.Table:
            empty = pa.table({"cell": pa.array([], type=pa.int64()),
                              "vsum": pa.array([], type=pa.binary()),
                              "n": pa.array([], type=pa.int64())})
            if b.num_rows == 0:
                return empty
            Bb = ray.get(_bref)
            M, K, s = Bb.shape
            E = np.array(b["embedding"].to_pylist(), dtype=np.float64)
            nn = np.linalg.norm(E, axis=1, keepdims=True)
            np.divide(E, nn, out=E, where=nn > 0)
            keys, vsums, cnts = [], [], []
            for m in range(M):
                X = E[:, m * s:(m + 1) * s]
                # Euclidean argmin == argmax(x·c − |c|²/2); |x|² constant
                code = np.argmax(X @ Bb[m].T - 0.5 * (Bb[m] ** 2).sum(1), axis=1)
                sums = np.zeros((K, s))
                np.add.at(sums, code, X)
                cnt = np.bincount(code, minlength=K)
                live = np.flatnonzero(cnt)
                keys.append(m * K + live)
                vsums.extend(sums[c].tobytes() for c in live)
                cnts.append(cnt[live])
            return pa.table({
                "cell": pa.array(np.concatenate(keys), type=pa.int64()),
                "vsum": pa.array(vsums, type=pa.binary()),
                "n": pa.array(np.concatenate(cnts), type=pa.int64()),
            })

        rows = ds.map_batches(partial, batch_format="pyarrow") \
            .repartition(num_blocks=min(m_sub * ks, default_num_partitions()),
                         keys=["cell"], sort=False) \
            .map_batches(_vsum_fold, batch_format="pyarrow", batch_size=None) \
            .take_all()
        newB = B.copy()
        # decode with the ACTUAL codebook width K (= B.shape[1]) — the
        # seed sample may yield fewer than ks centroids, and partial()
        # keys cells as m*K+code, not m*ks+code
        K = B.shape[1]
        for r in rows:
            m, c = divmod(r["cell"], K)
            newB[m, c] = np.frombuffer(r["vsum"], dtype=np.float64)[:sub] / r["n"]
        B = newB
    return B


def q_ann_pq(sf_dir: str, k: int = 5, max_qid: int = 10, m_sub: int = 16,
             ks: int = 32, shortlist: int = 100):
    """PQ-compressed approximate top-k with exact rerank: ADC
    (asymmetric distance computation) over uint8 codes selects a
    per-query shortlist, exact cosine re-scores ONLY the shortlist.
    Rows-only (approximate by design); the pytest gate measures
    recall@5 ≥ 0.9 vs brute force at sf0.01 (measured 1.0 at
    m_sub=16, ks=32, shortlist=100, 2 Lloyd rounds).

    Scale shape: at 100 TB the encode stage writes the code column
    once (16 bytes/vector at dim=64 — the whole index fits in a
    fraction of the raw corpus memory) and scans run over codes only;
    here encode + scan are one in-flight pass — per block, each query
    scores all rows via its (m_sub × ks) lookup table (one gather +
    sum per subspace, no per-row Python), keeps the block-local
    top-``shortlist``, and exact-rescores just those rows while the
    uncompressed block is still in flight.  The per-query global merge
    is bounded at shortlist × n_blocks tiny rows."""
    import pandas as pd
    import ray

    from .queries import _read

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    B = pq_codebooks(ds, m_sub, ks)
    sub = B.shape[2]

    qids, Q = _query_vectors(ds, max_qid)
    # per-query ADC lookup tables: (nq, m_sub, ks) partial dot products
    LUT = np.stack([Q[:, m * sub:(m + 1) * sub] @ B[m].T
                    for m in range(B.shape[0])], axis=1)
    ref = ray.put((qids, Q, B, LUT))

    class PQScan:
        def __init__(self):
            self.qids, self.Q, self.B, self.LUT = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                              "neighbor_id": pa.array([], type=pa.int64()),
                              "approx": pa.array([], type=pa.float64()),
                              "cos": pa.array([], type=pa.float64())})
            if b.num_rows == 0:
                return empty
            M, K, s = self.B.shape
            vids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            E = np.array(b["embedding"].to_pylist(), dtype=np.float64)
            nn = np.linalg.norm(E, axis=1, keepdims=True)
            np.divide(E, nn, out=E, where=nn > 0)
            # encode: m_sub uint8 codes per vector (the compressed column)
            codes = np.empty((len(E), M), dtype=np.uint8)
            for m in range(M):
                X = E[:, m * s:(m + 1) * s]
                codes[:, m] = np.argmax(
                    X @ self.B[m].T - 0.5 * (self.B[m] ** 2).sum(1), axis=1)
            # ADC: approx[q, i] = Σ_m LUT[q, m, codes[i, m]]
            approx = np.zeros((len(self.qids), len(E)))
            for m in range(M):
                approx += self.LUT[:, m, codes[:, m]]
            out_q, out_n, out_a, out_c = [], [], [], []
            for j, qid in enumerate(self.qids):
                mask = vids != qid
                if not mask.any():
                    continue
                a = approx[j][mask]
                sel = vids[mask]
                order = np.lexsort((sel, -a))[:shortlist]
                exact = E[mask][order] @ self.Q[j]
                out_q.append(np.full(len(order), qid, dtype=np.int64))
                out_n.append(sel[order])
                out_a.append(a[order])
                out_c.append(exact)
            if not out_q:
                return empty
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), type=pa.int64()),
                "approx": pa.array(np.concatenate(out_a), type=pa.float64()),
                "cos": pa.array(np.concatenate(out_c), type=pa.float64()),
            })

    partial = ds.map_batches(PQScan, batch_format="pyarrow", concurrency=(1, 4))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        # global ADC shortlist first (matches a single-process PQ scan),
        # then exact rerank of the shortlist
        g = g.sort_values(["approx", "neighbor_id"],
                          ascending=[False, True]).head(shortlist)
        g = g.sort_values(["cos", "neighbor_id"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({
            "query_id": g["query_id"].to_numpy(),
            "neighbor_id": g["neighbor_id"].to_numpy(),
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
        })

    # Per-group pandas is fine HERE ONLY: group count == the query set
    # (<=10 rows/group key), driver-scale by construction.  Do NOT copy
    # this pattern onto a high-cardinality key (use a keyed repartition
    # + segment pass instead, as in user_sessions/orders_topk).
    return partial.groupby("query_id").map_groups(final_topk, batch_format="pandas")


# ---------------------------------------------------------------------
# Embedding near-dup, sub-quadratic path: random-hyperplane LSH banding
# ---------------------------------------------------------------------


def q_embedding_neardup_lsh(sf_dir: str, threshold: float = 0.45,
                            n_bands: int = 32, band_bits: int = 2,
                            seed: int = 7):
    """Embedding near-dup via random-hyperplane LSH banding + EXACT
    cosine verification — the sub-quadratic scale path beside the exact
    all-pairs block-matmul plan (queries.py q_embedding_pairs).

    Scale shape: each vector is signed against H = n_bands*band_bits
    fixed hyperplanes (one vectorized matmul per batch; hyperplanes are
    derived from the seed inside every task, never shipped), emits
    ``n_bands`` narrow (block_key:int64, page_id:int64) rows, pairs are
    enumerated by the SAME keyed-repartition machinery as the MinHash /
    SimHash blockers (stages/pairs.py), and the final cosine is decided
    by joining the normalized vectors back onto surviving pairs — so
    precision is exact; recall is the banded LSH bound 1-(1-p^b)^r with
    p = 1 - theta/pi.  No vector ever touches the driver.

    Geometry: the catalog default (32 bands x 2 bits) is deliberately
    recall-exhaustive for the catalog threshold 0.45 (per-pair miss
    probability < 3e-8), making the output deterministically equal to
    the all-pairs DuckDB oracle on the test tables.  At a true
    near-dup threshold (cos >= 0.85) callers use wide bands (e.g.
    n_bands=16, band_bits=8) where a bucket holds ~N/2^b vectors and
    candidate volume is genuinely sub-quadratic — that regime is
    covered by the fixed-seed recall test (tests/test_embedding_lsh.py).
    """
    import ray.data as rd

    from .. import default_num_partitions
    from ..stages.pairs import make_pairs_partition

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    H = n_bands * band_bits

    def normalize_serialize(b: pa.Table) -> pa.Table:
        vids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(vids) == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "emb": pa.array([], type=pa.binary())})
        E = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(E, axis=1, keepdims=True)
        np.divide(E, norms, out=E, where=norms > 0)
        sub = np.ascontiguousarray(E)
        width = sub.shape[1] * 8
        offs = (np.arange(sub.shape[0] + 1, dtype=np.int64) * width).astype(np.int32)
        emb_arr = pa.Array.from_buffers(
            pa.binary(), sub.shape[0],
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(sub.tobytes())])
        return pa.table({"vec_id": pa.array(vids, type=pa.int64()),
                         "emb": emb_arr})

    # normalized vectors computed ONCE, consumed by both the band
    # emitter and the verify joins (simhash_candidates pattern)
    vecs = ds.map_batches(normalize_serialize, batch_format="pyarrow").materialize()

    def _deser(col: pa.ChunkedArray) -> np.ndarray:
        raw = b"".join(col.to_pylist())
        flat = np.frombuffer(raw, dtype=np.float64)
        n = len(col)
        return flat.reshape(n, -1) if n else np.zeros((0, 1))

    def emit_bands(b: pa.Table) -> pa.Table:
        empty = pa.table({"block_key": pa.array([], type=pa.int64()),
                          "page_id": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        E = _deser(b["emb"])
        rng = np.random.default_rng(seed)
        P = rng.standard_normal((E.shape[1], H))
        bits = (E @ P) > 0                                   # (n, H)
        weights = (np.int64(1) << np.arange(band_bits, dtype=np.int64))
        vals = bits.reshape(len(E), n_bands, band_bits) @ weights   # (n, r)
        keys = (np.arange(n_bands, dtype=np.int64) << np.int64(band_bits)) + vals
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "block_key": pa.array(keys.ravel(), type=pa.int64()),
            "page_id": pa.array(np.repeat(ids, n_bands), type=pa.int64()),
        })

    nparts = default_num_partitions()
    blocks = vecs.map_batches(emit_bands, batch_format="pyarrow") \
                 .repartition(num_blocks=nparts, keys=["block_key"], sort=False)
    pairs = blocks.map_batches(
        lambda t: make_pairs_partition(t, max_block_size=1 << 20),
        batch_format="pyarrow", batch_size=None,
    ).select_columns(["a", "b"]) \
     .repartition(num_blocks=nparts, keys=["a", "b"], sort=False)

    def dedup(b: pa.Table) -> pa.Table:
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
    empty_out = pa.table({"vec_a": pa.array([], type=pa.int64()),
                          "vec_b": pa.array([], type=pa.int64()),
                          "cos": pa.array([], type=pa.float64())})
    if pairs.count() == 0:  # empty build side breaks Ray's hash join
        return rd.from_arrow(empty_out)

    va = vecs.rename_columns({"vec_id": "a", "emb": "emb_a"})
    vb = vecs.rename_columns({"vec_id": "b", "emb": "emb_b"})
    enriched = pairs.join(va, join_type="inner", num_partitions=nparts, on=("a",)) \
                    .join(vb, join_type="inner", num_partitions=nparts, on=("b",))

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_out
        A = _deser(b["emb_a"])
        B = _deser(b["emb_b"])
        cos = np.einsum("ij,ij->i", A, B)
        m = cos >= threshold
        a = b["a"].to_numpy(zero_copy_only=False)[m]
        bb = b["b"].to_numpy(zero_copy_only=False)[m]
        return pa.table({
            "vec_a": pa.array(np.minimum(a, bb), type=pa.int64()),
            "vec_b": pa.array(np.maximum(a, bb), type=pa.int64()),
            "cos": _canon_round(list(cos[m]), 6),
        })

    return enriched.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------
# O5-family: deterministic stratified corpus sampling
# ---------------------------------------------------------------------

# per-language keep rates in % — the training-data rebalancing shape
# (downsample the dominant language, keep low-resource ones)
SAMPLE_RATES = {"en": 50, "de": 80, "fr": 80, "es": 80, "zh": 100}
SAMPLE_RATE_DEFAULT = 30


def q_corpus_sample(sf_dir: str):
    """Stratified corpus sampling with per-language keep rates applied
    as SYSTEMATIC thresholds (keep doc iff doc_id % 100 < rate[lang]).

    Deterministic and join-free by construction — unlike RNG sampling
    it is reproducible across runs/partitionings, trivially resumable,
    and exactly SQL-expressible (the oracle below); at 100 TB this is
    a pure streaming filter, no shuffle.  ≙ the reference's seeded
    candidate sampling role (candidate_generator.py:96-119) lifted to
    corpus scale."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    keys = pa.array(list(SAMPLE_RATES), type=pa.string())
    rates_lut = np.array(list(SAMPLE_RATES.values()) + [SAMPLE_RATE_DEFAULT],
                         dtype=np.int64)

    def sample(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "lang": pa.array([], type=pa.string())})
        idx = pc.fill_null(pc.index_in(b["lang"], value_set=keys),
                           len(SAMPLE_RATES))
        rates = rates_lut[idx.to_numpy(zero_copy_only=False)]
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.filter(pa.array(ids % 100 < rates))

    return ds.map_batches(sample, batch_format="pyarrow")


_SAMPLE_CASE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_RATES.items()
) + f" ELSE {SAMPLE_RATE_DEFAULT} END"
SQL_CORPUS_SAMPLE = f"""
SELECT doc_id, lang FROM documents
WHERE doc_id % 100 < {_SAMPLE_CASE}
"""


# ---------------------------------------------------------------------
# M10: BIO tag decode → token spans (full reference semantics)
# ---------------------------------------------------------------------


def q_bio_spans(sf_dir: str):
    """BIO decode ≙ bio_to_offset_pairs (reference
    md_dataset_utils.py:136-190) over a deterministic tagger: a token
    starting with a digit tags ``B``, a stopword tags ``O``, anything
    else tags ``I`` — exercising every decode branch (B-B split,
    B→I continuation, malformed I-start after O / at doc start,
    close-at-end).  Vectorized: one flat numpy decode per batch, no
    per-token Python loop (functions/bio.py)."""
    from ..functions.bio import TAG_B, TAG_I, TAG_O, bio_decode_flat
    from ..functions.tokenize import STOPWORD_SET, tokenize_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def decode(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "start_tok": pa.array([], type=pa.int64()),
                          "end_tok": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        flat, starts = tokenize_batch(b["text"].to_pylist())
        toks = pa.array(flat, type=pa.string())
        is_b = pc.match_substring_regex(toks, "^[0-9]").to_numpy(
            zero_copy_only=False)
        is_o = pc.is_in(toks, value_set=pa.array(sorted(STOPWORD_SET))
                        ).to_numpy(zero_copy_only=False)
        tags = np.full(len(flat), TAG_I, dtype=np.int8)
        tags[is_o] = TAG_O
        tags[is_b] = TAG_B  # digit wins over stopword (none overlap)
        di, s, e = bio_decode_flat(tags, starts)
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids[di], type=pa.int64()),
                         "start_tok": pa.array(s, type=pa.int64()),
                         "end_tok": pa.array(e, type=pa.int64())})

    return ds.map_batches(decode, batch_format="pyarrow")


SQL_BIO_SPANS = f"""
WITH t AS (
  SELECT doc_id,
         unnest({_TOKS}) AS tok,
         generate_subscripts({_TOKS}, 1) AS pos
  FROM documents
), tagged AS (
  SELECT doc_id, pos,
         CASE WHEN regexp_matches(tok, '^[0-9]') THEN 'B'
              WHEN tok IN {_STOP_SQL} THEN 'O'
              ELSE 'I' END AS tag
  FROM t
), marked AS (
  SELECT doc_id, pos, tag,
         CASE WHEN tag = 'B' OR (tag = 'I' AND coalesce(
                  lag(tag) OVER (PARTITION BY doc_id ORDER BY pos),
                  'O') = 'O')
              THEN 1 ELSE 0 END AS is_start
  FROM tagged
), grp AS (
  SELECT doc_id, pos, tag,
         SUM(is_start) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
  FROM marked
)
SELECT doc_id,
       CAST(MIN(pos) - 1 AS BIGINT) AS start_tok,
       CAST(MAX(pos) AS BIGINT) AS end_tok
FROM grp WHERE tag <> 'O'
GROUP BY doc_id, gid
"""


EXT_QUERIES["ann_ivf"] = q_ann_ivf  # defined below the dict
EXT_QUERIES["ann_ivf_partitioned"] = q_ann_ivf_partitioned
EXT_QUERIES["ann_pq"] = q_ann_pq
EXT_QUERIES["embedding_neardup_lsh"] = q_embedding_neardup_lsh
EXT_QUERIES["bio_spans"] = q_bio_spans
EXT_ORACLES["bio_spans"] = SQL_BIO_SPANS
EXT_QUERIES["corpus_sample"] = q_corpus_sample
EXT_ORACLES["corpus_sample"] = SQL_CORPUS_SAMPLE

# identical contract to the exact path -> same all-pairs oracle
from .queries import SQL_EMBEDDING_PAIRS as _SQL_EMB_PAIRS  # noqa: E402

EXT_ORACLES["embedding_neardup_lsh"] = _SQL_EMB_PAIRS

VOCAB_BROADCAST_MAX_BYTES = 256 << 20  # 16 B/token-type → 16M vocab


def _attach_count_column(keyed, counts, key_col: str, val_col: str, make_rows):
    """Attach ``counts`` (Dataset(key_col:int64, val_col:int64)) onto
    ``keyed`` rows: counted-budget broadcast (sorted int64 arrays +
    searchsorted — one ray.put, zero joins) under
    VOCAB_BROADCAST_MAX_BYTES, else a hash join on key_col (the
    100-TB path; same guard shape as the flagship payload and the
    simhash fingerprint attach).  ``make_rows(batch, vals)`` builds
    the output table from each keyed batch plus its per-row int64
    values; it must return a fixed schema and handle len(vals)==0.
    """
    import ray

    from .. import default_num_partitions

    if counts.count() * 16 <= VOCAB_BROADCAST_MAX_BYTES:
        k_parts, v_parts = [], []
        for blk in ray.get(counts.to_arrow_refs()):
            if blk.num_rows == 0 or key_col not in blk.schema.names:
                continue
            k_parts.append(blk[key_col].to_numpy(zero_copy_only=False))
            v_parts.append(blk[val_col].to_numpy(zero_copy_only=False))
        ks = np.concatenate(k_parts) if k_parts else np.array([], dtype=np.int64)
        vs = np.concatenate(v_parts) if v_parts else np.array([], dtype=np.int64)
        order = np.argsort(ks)
        ref = ray.put((ks[order], vs[order]))

        def bcast(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return make_rows(b, np.array([], dtype=np.int64))
            sk, sv = ray.get(ref)
            return make_rows(b, sv[np.searchsorted(
                sk, b[key_col].to_numpy(zero_copy_only=False))])

        return keyed.map_batches(bcast, batch_format="pyarrow")

    joined = keyed.join(counts, join_type="inner",
                        num_partitions=default_num_partitions(), on=(key_col,))

    def from_join(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return make_rows(b, np.array([], dtype=np.int64))
        return make_rows(b, b[val_col].to_numpy(zero_copy_only=False))

    return joined.map_batches(from_join, batch_format="pyarrow")


def q_doc_lm_score(sf_dir: str):
    """Unigram-LM quality score per document (engine addition — the
    CCNet-style LM filter of large-scale training-data pipelines):
    score(doc) = mean over token INSTANCES of -ln(cnt(tok)/N), where
    cnt is the corpus-wide instance count and N the corpus token
    total.  Low score = stereotyped boilerplate, high = rare-token
    soup; both tails get filtered in practice.

    Scale shape: ONE tokenize pass materializes narrow (doc_id,
    hkey:int64) instance rows reused by both the vocabulary count and
    the attach; the vocabulary attaches via counted-budget broadcast
    (sorted int64 arrays + searchsorted) with a hash-join fallback
    beyond the budget (the 100-TB path, same guard as the flagship
    payload); per-doc means reduce as partial (s, n) sums inside
    map_batches before the one doc_id shuffle.  Token identity is the
    64-bit stable hash — collision odds ~V²/2⁻⁶⁴, the same accepted
    false-match budget as the MinHash buckets."""
    from ray.data.aggregate import Sum

    from ..functions.tokenize import tokenize_hash_full

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        tok_h, starts, _toks = tokenize_hash_full(b["text"])
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, np.diff(starts)), type=pa.int64()),
            "hkey": pa.array(tok_h.view(np.int64), type=pa.int64()),
        })

    inst = docs.map_batches(explode, batch_format="pyarrow").materialize()
    n_total = inst.count()
    from ray.data.aggregate import Count

    from .. import scrub_empty_blocks

    # hash-agg partitions with no rows emit zero-COLUMN blocks (Ray
    # 2.49) — scrub before block iteration / join
    counts = scrub_empty_blocks(
        inst.groupby("hkey").aggregate(Count(alias_name="cnt")).materialize(),
        fallback_schema=pa.schema([("hkey", pa.int64()), ("cnt", pa.int64())]))

    def partial(b: pa.Table) -> pa.Table:
        """(doc_id, neglogp) rows → per-doc partial (s, n) sums."""
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.float64()),
                             "n": pa.array([], type=pa.int64())})
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        v = b["neglogp"].to_numpy(zero_copy_only=False)
        order = np.argsort(d, kind="stable")
        d, v = d[order], v[order]
        new = np.r_[True, d[1:] != d[:-1]]
        st = np.flatnonzero(new)
        return pa.table({
            "doc_id": pa.array(d[st], type=pa.int64()),
            "s": pa.array(np.add.reduceat(v, st), type=pa.float64()),
            "n": pa.array(np.diff(np.r_[st, len(d)]), type=pa.int64()),
        })

    def neglogp_rows(b: pa.Table, c: np.ndarray) -> pa.Table:
        if len(c) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "neglogp": pa.array([], type=pa.float64())})
        return pa.table({
            "doc_id": b["doc_id"],
            "neglogp": pa.array(-np.log(c / float(n_total)), type=pa.float64()),
        })

    scored = _attach_count_column(inst, counts, "hkey", "cnt", neglogp_rows)

    folded = scored.map_batches(partial, batch_format="pyarrow") \
                   .groupby("doc_id").aggregate(Sum("s", alias_name="s"),
                                                Sum("n", alias_name="n"))

    def finish(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": b["doc_id"],
            "lm_score": _canon_round(list(s / n), 6),
        })

    return folded.map_batches(finish, batch_format="pyarrow")


SQL_DOC_LM_SCORE = f"""
WITH inst AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
), cnts AS (
  SELECT tok, count(*) AS cnt FROM inst GROUP BY tok
), tot AS (
  SELECT sum(cnt) AS n FROM cnts
)
SELECT i.doc_id,
       {_sql_round("avg(-ln(c.cnt / (SELECT CAST(n AS DOUBLE) FROM tot)))", 6)} AS lm_score
FROM inst i JOIN cnts c ON i.tok = c.tok
GROUP BY i.doc_id
"""

EXT_QUERIES["doc_lm_score"] = q_doc_lm_score
EXT_ORACLES["doc_lm_score"] = SQL_DOC_LM_SCORE


TFIDF_K = 5  # frozen into SQL_DOC_TFIDF_TOPK — change both together


def q_doc_tfidf_topk(sf_dir: str):
    """Top-TFIDF_K TF-IDF terms per document (engine addition —
    keyword extraction for training-data curation; pairs with
    doc_lm_score).

    Scale shape: per-doc tf needs NO shuffle — a document's tokens
    arrive in one row, so tf folds as ONE vectorized lexsort/reduceat
    segment pass per explode batch (tokens via the Arrow-native
    vocabulary-first hasher, no per-doc Python); the doc count rides
    out as a per-doc first-row flag summed map-only (no extra keyed
    shuffle); df is one hkey-keyed count attached back via
    _attach_count_column (counted-budget broadcast, join fallback);
    the final per-doc top-k is a doc_id-keyed repartition + one
    lexsort/segment pass per partition — no per-group pandas.
    Determinism: score ties break on term ASC, mirroring the oracle's
    ``row_number() OVER (ORDER BY score DESC, term ASC)``."""
    from ray.data.aggregate import Count

    from .. import default_num_partitions, scrub_empty_blocks
    from ..functions.tokenize import tokenize_hash_full

    k = TFIDF_K
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode_tf(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        tok_h, starts, toks = tokenize_hash_full(b["text"])
        h = tok_h.view(np.int64)
        didx = np.repeat(np.arange(len(ids)), np.diff(starts))
        t = toks.to_numpy(zero_copy_only=False)
        # one segment pass for ALL docs in the batch: group on
        # (doc, hash) — full-string hash, so hash ties ARE term ties
        order = np.lexsort((h, didx))
        didx, h, t = didx[order], h[order], t[order]
        new = np.r_[True, (didx[1:] != didx[:-1]) | (h[1:] != h[:-1])]
        st = np.flatnonzero(new)
        tf = np.diff(np.r_[st, len(h)])
        gd = didx[st]
        first = np.r_[True, gd[1:] != gd[:-1]] if len(gd) else np.array([], dtype=bool)
        return pa.table({"doc_id": pa.array(ids[gd], type=pa.int64()),
                         "term": pa.array(t[st], type=pa.string()),
                         "tf": pa.array(tf, type=pa.int64()),
                         "hkey": pa.array(h[st], type=pa.int64()),
                         "first": pa.array(first.astype(np.int64), type=pa.int64())})

    keyed = docs.map_batches(explode_tf, batch_format="pyarrow").materialize()
    n_docs = keyed.sum("first")  # docs with >=1 token, no keyed shuffle
    df_ds = scrub_empty_blocks(
        keyed.select_columns(["hkey"]).groupby("hkey")
             .aggregate(Count(alias_name="df")).materialize(),
        fallback_schema=pa.schema([("hkey", pa.int64()), ("df", pa.int64())]))

    def score_rows(b: pa.Table, df: np.ndarray) -> pa.Table:
        if len(df) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "term": pa.array([], type=pa.string()),
                             "score": pa.array([], type=pa.float64())})
        tf = b["tf"].to_numpy(zero_copy_only=False)
        score = tf * np.log(float(n_docs) / df)
        return pa.table({"doc_id": b["doc_id"], "term": b["term"],
                         "score": pa.array(score, type=pa.float64())})

    scored = _attach_count_column(keyed, df_ds, "hkey", "df", score_rows)

    parted = scored.repartition(num_blocks=default_num_partitions(),
                                keys=["doc_id"], sort=False)

    def topk_partition(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "term": pa.array([], type=pa.string()),
                             "rank": pa.array([], type=pa.int64()),
                             "tfidf": pa.array([], type=pa.float64())})
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        t = b["term"].to_numpy(zero_copy_only=False)
        s = b["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((t, -s, d))
        d, t, s = d[order], t[order], s[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        rank = np.arange(len(d)) - np.repeat(starts, np.diff(np.r_[starts, len(d)])) + 1
        keep = rank <= k
        return pa.table({
            "doc_id": pa.array(d[keep], type=pa.int64()),
            "term": pa.array(t[keep], type=pa.string()),
            "rank": pa.array(rank[keep], type=pa.int64()),
            "tfidf": _canon_round(list(s[keep]), 6),
        })

    return parted.map_batches(topk_partition, batch_format="pyarrow",
                              batch_size=None)


SQL_DOC_TFIDF_TOPK = f"""
WITH tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
  GROUP BY doc_id, tok
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), nd AS (
  SELECT count(DISTINCT doc_id) AS n FROM tf
), ranked AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln((SELECT CAST(n AS DOUBLE) FROM nd) / df.df) AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * ln((SELECT CAST(n AS DOUBLE) FROM nd) / df.df) DESC,
                    tf.term ASC) AS rank
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, CAST(rank AS BIGINT) AS rank,
       {_sql_round("score", 6)} AS tfidf
FROM ranked WHERE rank <= {TFIDF_K}
"""

EXT_QUERIES["doc_tfidf_topk"] = q_doc_tfidf_topk
EXT_ORACLES["doc_tfidf_topk"] = SQL_DOC_TFIDF_TOPK


def q_events_asof_order(sf_dir: str):
    """As-of join (engine addition — see stages/asof.py): each event
    enriched with the user's most recent order at event time.  The
    oracle is DuckDB's native ASOF JOIN."""
    from ..stages.asof import asof_join
    from .queries import _empty_guard

    empty = _empty_guard(sf_dir, ["events", "orders"],
                         {"event_id": pa.int64(), "user_id": pa.int64(),
                          "ts": pa.timestamp("us"),
                          "o_orderkey": pa.int64(),
                          "o_orderdate": pa.timestamp("us"),
                          "o_totalprice": pa.float64()})
    if empty is not None:
        return empty

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]) \
        .rename_columns({"o_custkey": "user_id"})
    return asof_join(
        ev, orders, key="user_id", left_ts="ts", right_ts="o_orderdate",
        left_cols=["event_id", "user_id", "ts"],
        right_cols=["o_orderkey", "o_orderdate", "o_totalprice"],
        right_tiebreak="o_orderkey")


SQL_EVENTS_ASOF_ORDER = """
WITH o AS (
  SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    AND o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
  QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                             ORDER BY o_orderkey) = 1
), e AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_id IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
)
SELECT e.event_id, e.user_id, e.ts,
       o.o_orderkey, o.o_orderdate, o.o_totalprice
FROM e ASOF JOIN o ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
"""

EXT_QUERIES["events_asof_order"] = q_events_asof_order
EXT_ORACLES["events_asof_order"] = SQL_EVENTS_ASOF_ORDER


# ---------------------------------------------------------------------
# Conversion-funnel analysis (engine addition): the event-sequence
# operator of product analytics — how many users progress through an
# ordered stage sequence, each transition inside a conversion window.
# Greedy earliest-completion semantics (the standard): stage k's
# timestamp is the EARLIEST qualifying event strictly after stage
# k-1's, within the window.
# ---------------------------------------------------------------------

_FUNNEL_STAGES = ("view", "click", "purchase")
_FUNNEL_WINDOW_US = 2 * 86_400 * 1_000_000  # 2 days


def q_event_funnel(sf_dir: str, stages=_FUNNEL_STAGES,
                   window_us: int = _FUNNEL_WINDOW_US):
    """(stage, event_type, n_users) for a greedy earliest-completion
    funnel: t_1 = min ts of a stage-1 event; t_k = min ts of a
    stage-k event with t_{k-1} < ts <= t_{k-1} + window.

    Scale shape: ONE keyed exchange on user_id co-locates each user's
    history, then the whole funnel runs vectorized inside the
    partition (per-user segment mins via np.minimum.at — no python
    loop over users, no per-user pandas); each block then emits |K|
    tiny (stage, count) partial rows and the fold sums integers.
    Timestamps compare as exact int64 microseconds, so the window
    arithmetic replays bit-exactly against DuckDB INTERVAL math."""
    from .. import default_num_partitions

    stages = tuple(stages)
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    parted = ev.map_batches(lambda b: b.drop_null(),
                            batch_format="pyarrow") \
        .repartition(num_blocks=default_num_partitions(),
                     keys=["user_id"], sort=False)

    def partial(b: pa.Table) -> pa.Table:
        counts = np.zeros(len(stages), dtype=np.int64)
        if b.num_rows:
            u = b["user_id"].to_numpy(zero_copy_only=False)
            ts = b["ts"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").astype(np.int64)
            et = b["event_type"].to_numpy(zero_copy_only=False)
            uu = np.unique(u)
            uid = np.searchsorted(uu, u)
            imax = np.iinfo(np.int64).max
            # stage 1 has no lower bound: prev = -inf, window unbounded
            prev = np.full(len(uu), np.iinfo(np.int64).min)
            hi = np.full(len(uu), imax)
            for s, name in enumerate(stages):
                sel = (et == name) & (ts > prev[uid]) & (ts <= hi[uid])
                smin = np.full(len(uu), imax)
                np.minimum.at(smin, uid[sel], ts[sel])
                reached = smin < imax
                counts[s] = int(reached.sum())
                prev = smin  # unreached users hold imax -> later fail
                hi = smin.copy()
                hi[reached] += window_us
                hi[~reached] = np.iinfo(np.int64).min
        return pa.table({
            "stage": pa.array(np.arange(1, len(stages) + 1),
                              type=pa.int64()),
            "event_type": pa.array(list(stages), type=pa.string()),
            "n_users": pa.array(counts, type=pa.int64())})

    partials = parted.map_batches(partial, batch_format="pyarrow",
                                  batch_size=None).materialize()

    def zero_rows() -> pa.Table:
        return pa.table({
            "stage": pa.array(np.arange(1, len(stages) + 1),
                              type=pa.int64()),
            "event_type": pa.array(list(stages), type=pa.string()),
            "n_users": pa.array(np.zeros(len(stages), dtype=np.int64),
                                type=pa.int64())})

    if partials.count() == 0:
        # empty events: the SQL's per-stage count(*) still emits one
        # 0-count row per stage — match it (map UDFs are not invoked
        # on empty inputs, so the fold alone cannot)
        import ray.data as rd

        return rd.from_arrow(zero_rows())

    def fold(b: pa.Table) -> pa.Table:
        st = b["stage"].to_numpy(zero_copy_only=False)
        n = b["n_users"].to_numpy(zero_copy_only=False)
        tot = np.zeros(len(stages), dtype=np.int64)
        np.add.at(tot, st - 1, n)
        return pa.table({
            "stage": pa.array(np.arange(1, len(stages) + 1),
                              type=pa.int64()),
            "event_type": pa.array(list(stages), type=pa.string()),
            "n_users": pa.array(tot, type=pa.int64())})

    return partials.repartition(num_blocks=1) \
        .map_batches(fold, batch_format="pyarrow", batch_size=None)


def _sql_event_funnel(stages=_FUNNEL_STAGES,
                      window_us: int = _FUNNEL_WINDOW_US) -> str:
    parts = [f"""
WITH e AS (
  SELECT user_id, ts, event_type FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL
),
s1 AS (
  SELECT user_id, min(ts) AS t FROM e
  WHERE event_type = '{stages[0]}' GROUP BY 1
)"""]
    for i in range(1, len(stages)):
        parts.append(f""",
s{i + 1} AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM e JOIN s{i} p ON e.user_id = p.user_id
  WHERE e.event_type = '{stages[i]}'
    AND e.ts > p.t AND epoch_us(e.ts) <= epoch_us(p.t) + {window_us}
  GROUP BY 1
)""")
    selects = [f"SELECT CAST({i + 1} AS BIGINT) AS stage, "
               f"'{s}' AS event_type, count(*) AS n_users FROM s{i + 1}"
               for i, s in enumerate(stages)]
    parts.append("\n" + "\nUNION ALL\n".join(selects))
    return "".join(parts)


EXT_QUERIES["event_funnel"] = q_event_funnel
EXT_ORACLES["event_funnel"] = _sql_event_funnel()


# ---------------------------------------------------------------------
# Cohort retention (engine addition): the other canonical
# event-sequence report — users grouped by first-seen day, counted on
# each later day they return.  All-integer (epoch days), so the replay
# is trivially exact.
# ---------------------------------------------------------------------

_RETENTION_MAX_OFFSET = 7


def q_user_retention(sf_dir: str, max_offset: int = _RETENTION_MAX_OFFSET):
    """(cohort_day, day_offset, n_users): users whose FIRST event fell
    on epoch day ``cohort_day`` and who had >= 1 event on
    ``cohort_day + day_offset``, for offsets 0..max_offset.

    Scale shape: ONE keyed exchange on user_id co-locates each user's
    history; per partition the cohort day and the distinct active-day
    set compute vectorized (lexsort + segment boundaries); each block
    then emits (cohort, offset) partial counts — at most
    days x (max_offset+1) tiny rows — and a single-block integer fold
    finishes.  The user dimension never leaves its partition."""
    from .. import default_num_partitions

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    us_per_day = 86_400 * 1_000_000

    parted = ev.map_batches(lambda b: b.drop_null(),
                            batch_format="pyarrow") \
        .repartition(num_blocks=default_num_partitions(),
                     keys=["user_id"], sort=False)

    empty = pa.table({"cohort_day": pa.array([], type=pa.int64()),
                      "day_offset": pa.array([], type=pa.int64()),
                      "n_users": pa.array([], type=pa.int64())})

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        u = b["user_id"].to_numpy(zero_copy_only=False)
        day = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // us_per_day
        # distinct (user, day), user-sorted -> per-user segments
        order = np.lexsort((day, u))
        u, day = u[order], day[order]
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (day[1:] != day[:-1])
        u, day = u[keep], day[keep]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        sizes = np.diff(np.r_[starts, len(u)])
        cohort = np.repeat(day[starts], sizes)  # first day per user
        off = day - cohort
        m = off <= max_offset
        key = cohort[m] * (max_offset + 1) + off[m]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "cohort_day": pa.array(uk // (max_offset + 1),
                                   type=pa.int64()),
            "day_offset": pa.array(uk % (max_offset + 1),
                                   type=pa.int64()),
            "n_users": pa.array(cnt.astype(np.int64), type=pa.int64())})

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        c = b["cohort_day"].to_numpy(zero_copy_only=False)
        o = b["day_offset"].to_numpy(zero_copy_only=False)
        n = b["n_users"].to_numpy(zero_copy_only=False)
        key = c * (max_offset + 1) + o
        order = np.argsort(key, kind="stable")
        key, n = key[order], n[order]
        seg = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        tot = np.add.reduceat(n, seg)
        return pa.table({
            "cohort_day": pa.array(key[seg] // (max_offset + 1),
                                   type=pa.int64()),
            "day_offset": pa.array(key[seg] % (max_offset + 1),
                                   type=pa.int64()),
            "n_users": pa.array(tot.astype(np.int64), type=pa.int64())})

    return parted.map_batches(partial, batch_format="pyarrow",
                              batch_size=None) \
        .repartition(num_blocks=1) \
        .map_batches(fold, batch_format="pyarrow", batch_size=None)


def _sql_user_retention(max_offset: int = _RETENTION_MAX_OFFSET) -> str:
    return f"""
WITH e AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
a AS (SELECT DISTINCT user_id, day FROM e),
f AS (SELECT user_id, min(day) AS cohort FROM a GROUP BY 1)
SELECT f.cohort AS cohort_day, a.day - f.cohort AS day_offset,
       count(*) AS n_users
FROM a JOIN f USING (user_id)
WHERE a.day - f.cohort <= {max_offset}
GROUP BY 1, 2
"""


EXT_QUERIES["user_retention"] = q_user_retention
EXT_ORACLES["user_retention"] = _sql_user_retention()


# ---------------------------------------------------------------------
# Event-transition counting (engine addition): the first-order Markov
# matrix of per-user event sequences — sequence mining's base
# operator (next-action prediction features, UX flow analysis).
# ---------------------------------------------------------------------


def q_event_transitions(sf_dir: str):
    """(prev_type, event_type, n): global counts of consecutive
    event-type pairs within each user's timeline, ordered by
    (ts, event_id) — event_id breaks same-instant ties exactly like
    the SQL window's ORDER BY.

    Scale shape: ONE keyed exchange on user_id; transitions come from
    one in-partition lexsort + a shifted comparison (no python per
    event); types dictionary-encode so pair counting is integer
    np.unique on codes; each block emits at most |types|² tiny
    partial rows into a single-block fold."""
    from .. import default_num_partitions

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])

    parted = ev.map_batches(lambda b: b.drop_null(),
                            batch_format="pyarrow") \
        .repartition(num_blocks=default_num_partitions(),
                     keys=["user_id"], sort=False)

    empty = pa.table({"prev_type": pa.array([], type=pa.string()),
                      "event_type": pa.array([], type=pa.string()),
                      "n": pa.array([], type=pa.int64())})

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows < 2:
            return empty
        u = b["user_id"].to_numpy(zero_copy_only=False)
        ts = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        col = b["event_type"]
        enc = pc.dictionary_encode(col.combine_chunks()
                                   if isinstance(col, pa.ChunkedArray)
                                   else col)
        dic = enc.dictionary.to_pylist()
        code = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, code = u[order], code[order]
        same = u[1:] == u[:-1]
        key = code[:-1][same] * len(dic) + code[1:][same]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "prev_type": pa.array([dic[k // len(dic)] for k in uk],
                                  type=pa.string()),
            "event_type": pa.array([dic[k % len(dic)] for k in uk],
                                   type=pa.string()),
            "n": pa.array(cnt.astype(np.int64), type=pa.int64())})

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        p = np.array(b["prev_type"].to_pylist(), dtype=object)
        e = np.array(b["event_type"].to_pylist(), dtype=object)
        n = b["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e.astype("U"), p.astype("U")))
        p, e, n = p[order], e[order], n[order]
        seg = np.flatnonzero(np.r_[True, (p[1:] != p[:-1])
                                   | (e[1:] != e[:-1])])
        return pa.table({
            "prev_type": pa.array(p[seg], type=pa.string()),
            "event_type": pa.array(e[seg], type=pa.string()),
            "n": pa.array(np.add.reduceat(n, seg).astype(np.int64),
                          type=pa.int64())})

    return parted.map_batches(partial, batch_format="pyarrow",
                              batch_size=None) \
        .repartition(num_blocks=1) \
        .map_batches(fold, batch_format="pyarrow", batch_size=None)


SQL_EVENT_TRANSITIONS = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND event_type IS NOT NULL
),
s AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM e
)
SELECT prev_type, event_type, count(*) AS n
FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2
"""


EXT_QUERIES["event_transitions"] = q_event_transitions
EXT_ORACLES["event_transitions"] = SQL_EVENT_TRANSITIONS


# ---------------------------------------------------------------------
# Rate-anomaly detection (engine addition): flag hours whose per-type
# event rate sits >= 2 standard deviations from that type's mean —
# the monitoring/alerting primitive over event streams.  All moments
# accumulate as exact integers; the float expressions share one shape
# with the SQL so the z-scores (and the >= 2 cut) replay bit-exactly.
# ---------------------------------------------------------------------

_ANOMALY_Z = 2.0


def q_event_rate_anomaly(sf_dir: str, z_cut: float = _ANOMALY_Z):
    """(event_type, hour, cnt, z) for hours where
    |cnt - mean_type| / std_type >= z_cut, statistics over the hours
    in which the type occurs; population variance, var > 0 guard.

    Scale shape: per-block partial (type, hour) counts pre-aggregate
    BEFORE one keyed exchange (hour rows, never events); per-type
    moments (n, Σc, Σc²) fold from per-block integer partials —
    order-independent, type-dimension tiny — and broadcast in the
    scoring closure; the anomaly cut is a stateless map over the
    count table."""
    from .. import default_num_partitions
    from .queries import _canon_round

    ev = _read(sf_dir, "events", ["event_type", "ts"])
    us_h = 3_600 * 1_000_000

    def cnt_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], type=pa.string()),
                          "hour": pa.array([], type=pa.int64()),
                          "cnt": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        b = b.drop_null()
        et = np.array(b["event_type"].to_pylist(), dtype=object)
        h = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // us_h
        order = np.lexsort((h, et.astype("U")))
        et, h = et[order], h[order]
        seg = np.flatnonzero(np.r_[True, (et[1:] != et[:-1])
                                   | (h[1:] != h[:-1])])
        cnt = np.diff(np.r_[seg, len(h)])
        return pa.table({"event_type": pa.array(et[seg],
                                                type=pa.string()),
                         "hour": pa.array(h[seg], type=pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64),
                                         type=pa.int64())})

    def cnt_fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"event_type": pa.array([],
                                                    type=pa.string()),
                             "hour": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        et = np.array(b["event_type"].to_pylist(), dtype=object)
        h = b["hour"].to_numpy(zero_copy_only=False)
        c = b["cnt"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h, et.astype("U")))
        et, h, c = et[order], h[order], c[order]
        seg = np.flatnonzero(np.r_[True, (et[1:] != et[:-1])
                                   | (h[1:] != h[:-1])])
        return pa.table({
            "event_type": pa.array(et[seg], type=pa.string()),
            "hour": pa.array(h[seg], type=pa.int64()),
            "cnt": pa.array(np.add.reduceat(c, seg).astype(np.int64),
                            type=pa.int64())})

    counts = ev.map_batches(cnt_partial, batch_format="pyarrow") \
        .repartition(num_blocks=default_num_partitions(),
                     keys=["event_type", "hour"], sort=False) \
        .map_batches(cnt_fold, batch_format="pyarrow",
                     batch_size=None).materialize()

    def mom_partial(b: pa.Table) -> pa.Table:
        et = np.array(b["event_type"].to_pylist(), dtype=object)
        c = b["cnt"].to_numpy(zero_copy_only=False)
        order = np.argsort(et.astype("U"), kind="stable")
        et, c = et[order], c[order]
        seg = np.flatnonzero(np.r_[True, et[1:] != et[:-1]]) \
            if len(et) else np.empty(0, dtype=np.int64)
        n = np.diff(np.r_[seg, len(et)]) if len(et) else []
        return pa.table({
            "event_type": pa.array(et[seg] if len(et) else [],
                                   type=pa.string()),
            "n": pa.array(np.asarray(n, dtype=np.int64),
                          type=pa.int64()),
            "sn": pa.array(np.add.reduceat(c, seg).astype(np.int64)
                           if len(et) else [], type=pa.int64()),
            "sq": pa.array(np.add.reduceat(c * c, seg).astype(np.int64)
                           if len(et) else [], type=pa.int64())})

    rows = counts.map_batches(mom_partial,
                              batch_format="pyarrow").take_all()
    mom: dict[str, list[int]] = {}
    for r in rows:  # <= types x blocks tiny rows, integer fold
        m = mom.setdefault(r["event_type"], [0, 0, 0])
        m[0] += r["n"]
        m[1] += r["sn"]
        m[2] += r["sq"]
    stats = {}
    for t, (n, sn, sq) in mom.items():
        mean = sn / n
        var = (sq / n) - (mean * mean)
        stats[t] = (mean, var)

    def flag(b: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], type=pa.string()),
                          "hour": pa.array([], type=pa.timestamp("us")),
                          "cnt": pa.array([], type=pa.int64()),
                          "z": pa.array([], type=pa.float64())})
        if b.num_rows == 0:
            return empty
        et = b["event_type"].to_pylist()
        h = b["hour"].to_numpy(zero_copy_only=False)
        c = b["cnt"].to_numpy(zero_copy_only=False)
        import math

        keep, zs = [], []
        for i, t in enumerate(et):
            mean, var = stats[t]
            if var > 0:
                z = (c[i] - mean) / math.sqrt(var)
                if abs(z) >= z_cut:
                    keep.append(i)
                    zs.append(z)
        return pa.table({
            "event_type": pa.array([et[i] for i in keep],
                                   type=pa.string()),
            "hour": pa.array((h[keep] * us_h)
                             .astype("datetime64[us]")),
            "cnt": pa.array(c[keep], type=pa.int64()),
            "z": _canon_round(zs, 6)})

    return counts.map_batches(flag, batch_format="pyarrow")


def _sql_event_rate_anomaly(z_cut: float = _ANOMALY_Z) -> str:
    from .queries import _sql_round

    mean = "(CAST(s.sn AS DOUBLE) / s.n)"
    var = f"((CAST(s.sq AS DOUBLE) / s.n) - ({mean} * {mean}))"
    z = f"((c.cnt - {mean}) / sqrt({var}))"
    return f"""
WITH c AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS cnt
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
),
s AS (
  SELECT event_type, count(*) AS n, CAST(sum(cnt) AS BIGINT) AS sn,
         CAST(sum(cnt * cnt) AS BIGINT) AS sq
  FROM c GROUP BY 1
)
SELECT c.event_type, c.hour, c.cnt, {_sql_round(z, 6)} AS z
FROM c JOIN s USING (event_type)
WHERE {var} > 0 AND abs({z}) >= {z_cut!r}
"""


EXT_QUERIES["event_rate_anomaly"] = q_event_rate_anomaly
EXT_ORACLES["event_rate_anomaly"] = _sql_event_rate_anomaly()


# ---------------------------------------------------------------------
# Skyline / Pareto-dominance filter (engine addition; the classic
# multi-criteria DB operator, Börzsönyi et al. 2001): rows not
# dominated on (minimize price, minimize size).  The distributed
# 2-phase plan is provably lossless: a row dominated inside its block
# is dominated globally (dominance needs only ONE witness), and every
# global skyline row survives its block's local pass — so local
# frontiers shrink each block before the single-block merge, and the
# exchange moves frontier rows only.
# ---------------------------------------------------------------------


def _skyline2d_local(b: pa.Table) -> pa.Table:
    """Vectorized 2D skyline of one batch, minimizing
    (p_retailprice, p_size).  dominated(p) ⟺ min size among strictly
    cheaper rows <= p.size, OR min size among equal-priced rows <
    p.size — covers all strict/tie combinations; duplicate
    (price, size) points dominate neither each other and ALL stay
    (matching SQL NOT EXISTS with the one-strict clause).  No
    arithmetic on the values, only comparisons, so float exactness is
    a non-issue."""
    empty = pa.table({"p_partkey": pa.array([], type=pa.int64()),
                      "p_retailprice": pa.array([], type=pa.float64()),
                      "p_size": pa.array([], type=pa.int32())})
    if b.num_rows == 0:
        return empty
    b = b.drop_null()
    if b.num_rows == 0:
        return empty
    price = b["p_retailprice"].to_numpy(zero_copy_only=False)
    size = b["p_size"].to_numpy(zero_copy_only=False)
    order = np.lexsort((size, price))
    p, s = price[order], size[order]
    gstart = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
    gsizes = np.diff(np.r_[gstart, len(p)])
    gmin = np.minimum.reduceat(s, gstart)
    prev_min = np.minimum.accumulate(
        np.r_[np.iinfo(np.int64).max, gmin])[:-1]
    dominated = (np.repeat(prev_min, gsizes) <= s) \
        | (np.repeat(gmin, gsizes) < s)
    keep = np.sort(order[~dominated])  # original batch order
    return b.take(pa.array(keep))


def q_part_skyline(sf_dir: str):
    """(p_partkey, p_retailprice, p_size) of every part on the Pareto
    frontier minimizing both price and size.  Scale shape: local
    skyline per block (frontier-sized output), ONE single-block merge
    running the same kernel — see the 2-phase losslessness note
    above; at 100 TB the d=2 frontier is tiny relative to the corpus,
    so the merge side never grows with the data."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])
    return ds.map_batches(_skyline2d_local, batch_format="pyarrow") \
        .repartition(num_blocks=1) \
        .map_batches(_skyline2d_local, batch_format="pyarrow",
                     batch_size=None)


SQL_PART_SKYLINE = """
SELECT p_partkey, p_retailprice, p_size
FROM part p
WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
  AND NOT EXISTS (
    SELECT 1 FROM part q
    WHERE q.p_retailprice IS NOT NULL AND q.p_size IS NOT NULL
      AND q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
      AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size))
"""


EXT_QUERIES["part_skyline"] = q_part_skyline
EXT_ORACLES["part_skyline"] = SQL_PART_SKYLINE


# ---------------------------------------------------------------------
# Grouped trend regression (engine addition): per-type OLS slope over
# daily event counts — the drift/trend detector behind traffic
# dashboards.  Every moment (n, Σx, Σy, Σxy, Σx²) accumulates as an
# exact integer, so the slope/intercept floats have one shared
# expression shape and replay bit-exactly.
# ---------------------------------------------------------------------


def q_event_trend(sf_dir: str):
    """(event_type, n_days, slope, intercept): ordinary least squares
    of daily count (y) on epoch day (x) per event type, over the days
    where the type occurs; types with a singular system (n < 2 or
    zero x-variance) are dropped on both sides.

    Scale shape: per-block (type, day) partial counts -> ONE keyed
    exchange folds exact daily counts; the five regression moments
    reduce per block to |types| integer rows and fold on the driver
    (type-dimension); slope/intercept are a stateless final compute.
    Day indexes are re-based to each type's min day before squaring so
    Σx² stays far inside int64 (epoch-day magnitudes ~2e4 would still
    fit at ~4e8·days² but re-basing keeps the bound independent of the
    calendar)."""
    from .. import default_num_partitions
    from .queries import _canon_round

    ev = _read(sf_dir, "events", ["event_type", "ts"])
    us_day = 86_400 * 1_000_000

    empty_cnt = pa.table({"event_type": pa.array([], type=pa.string()),
                          "day": pa.array([], type=pa.int64()),
                          "cnt": pa.array([], type=pa.int64())})

    def cnt_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_cnt
        b = b.drop_null()
        et = np.array(b["event_type"].to_pylist(), dtype=object)
        day = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // us_day
        order = np.lexsort((day, et.astype("U")))
        et, day = et[order], day[order]
        seg = np.flatnonzero(np.r_[True, (et[1:] != et[:-1])
                                   | (day[1:] != day[:-1])])
        cnt = np.diff(np.r_[seg, len(day)])
        return pa.table({"event_type": pa.array(et[seg],
                                                type=pa.string()),
                         "day": pa.array(day[seg], type=pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64),
                                         type=pa.int64())})

    def cnt_fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_cnt
        et = np.array(b["event_type"].to_pylist(), dtype=object)
        day = b["day"].to_numpy(zero_copy_only=False)
        c = b["cnt"].to_numpy(zero_copy_only=False)
        order = np.lexsort((day, et.astype("U")))
        et, day, c = et[order], day[order], c[order]
        seg = np.flatnonzero(np.r_[True, (et[1:] != et[:-1])
                                   | (day[1:] != day[:-1])])
        return pa.table({
            "event_type": pa.array(et[seg], type=pa.string()),
            "day": pa.array(day[seg], type=pa.int64()),
            "cnt": pa.array(np.add.reduceat(c, seg).astype(np.int64),
                            type=pa.int64())})

    counts = ev.map_batches(cnt_partial, batch_format="pyarrow") \
        .repartition(num_blocks=default_num_partitions(),
                     keys=["event_type", "day"], sort=False) \
        .map_batches(cnt_fold, batch_format="pyarrow",
                     batch_size=None).materialize()

    def mom_partial(b: pa.Table) -> pa.Table:
        cols = {k: [] for k in ("event_type", "n", "sx", "sy",
                                "sxy", "sxx", "minday")}
        if b.num_rows:
            et = np.array(b["event_type"].to_pylist(), dtype=object)
            day = b["day"].to_numpy(zero_copy_only=False)
            c = b["cnt"].to_numpy(zero_copy_only=False)
            order = np.argsort(et.astype("U"), kind="stable")
            et, day, c = et[order], day[order], c[order]
            seg = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
            for i, s in enumerate(seg):
                e = seg[i + 1] if i + 1 < len(seg) else len(et)
                d, cc = day[s:e], c[s:e]
                cols["event_type"].append(et[s])
                cols["n"].append(int(e - s))
                cols["sx"].append(int(d.sum()))
                cols["sy"].append(int(cc.sum()))
                cols["sxy"].append(int((d * cc).sum()))
                cols["sxx"].append(int((d * d).sum()))
                cols["minday"].append(int(d.min()))
        return pa.table({
            "event_type": pa.array(cols["event_type"],
                                   type=pa.string()),
            **{k: pa.array(cols[k], type=pa.int64())
               for k in ("n", "sx", "sy", "sxy", "sxx", "minday")}})

    rows = counts.map_batches(mom_partial,
                              batch_format="pyarrow").take_all()
    # type-dimension integer fold; moments over RAW epoch days first,
    # then shifted to x - minday via binomial identities (exact ints)
    agg: dict[str, list[int]] = {}
    for r in rows:
        m = agg.setdefault(r["event_type"],
                           [0, 0, 0, 0, 0, 1 << 62])
        m[0] += r["n"]
        m[1] += r["sx"]
        m[2] += r["sy"]
        m[3] += r["sxy"]
        m[4] += r["sxx"]
        m[5] = min(m[5], r["minday"])
    out_rows = []
    for t in sorted(agg):
        n, sx, sy, sxy, sxx, d0 = agg[t]
        # shift x -> x - d0: Σx' = Σx - n·d0; Σx'y = Σxy - d0·Σy;
        # Σx'² = Σx² - 2·d0·Σx + n·d0²  (all exact int64 at day scale)
        sx2 = sx - n * d0
        sxy2 = sxy - d0 * sy
        sxx2 = sxx - 2 * d0 * sx + n * d0 * d0
        det = n * sxx2 - sx2 * sx2
        if n < 2 or det == 0:
            continue
        slope = (n * sxy2 - sx2 * sy) / det
        intercept = (sy - slope * sx2) / n
        out_rows.append((t, n, slope, intercept))

    import ray.data as rd

    return rd.from_arrow(pa.table({
        "event_type": pa.array([r[0] for r in out_rows],
                               type=pa.string()),
        "n_days": pa.array([r[1] for r in out_rows], type=pa.int64()),
        "slope": _canon_round([r[2] for r in out_rows], 6),
        "intercept": _canon_round([r[3] for r in out_rows], 6)}))


def _sql_event_trend() -> str:
    from .queries import _sql_round

    slope = "((s.n * s.sxy - s.sx * s.sy) / CAST(s.det AS DOUBLE))"
    intercept = f"((s.sy - {slope} * s.sx) / s.n)"
    return f"""
WITH c AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS day,
         count(*) AS cnt
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
),
x AS (
  SELECT event_type, day - min(day) OVER (PARTITION BY event_type)
           AS xd, cnt
  FROM c
),
s AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(xd) AS BIGINT) AS sx, CAST(sum(cnt) AS BIGINT) AS sy,
         CAST(sum(xd * cnt) AS BIGINT) AS sxy,
         CAST(sum(xd * xd) AS BIGINT) AS sxx,
         CAST(count(*) * sum(xd * xd) - sum(xd) * sum(xd) AS BIGINT)
           AS det
  FROM x GROUP BY 1
)
SELECT event_type, n AS n_days, {_sql_round(slope, 6)} AS slope,
       {_sql_round(intercept, 6)} AS intercept
FROM s WHERE n >= 2 AND det <> 0
"""


EXT_QUERIES["event_trend"] = q_event_trend
EXT_ORACLES["event_trend"] = _sql_event_trend()


# ---------------------------------------------------------------------
# Running (cumulative) window aggregates (engine addition): the
# SUM/COUNT OVER (PARTITION BY user ORDER BY ts) family.  The running
# value sum accumulates in integer CENTS (floor(value·100)) — float
# running sums are summation-order-defined and window engines are free
# to use segment trees, so cross-engine float replay would be flaky by
# construction; integers are exact under ANY association.
# ---------------------------------------------------------------------


def q_user_cumulative(sf_dir: str):
    """Per event: (event_id, user_id, ts, running_n, running_cents)
    where the running aggregates cover the user's events up to and
    including this one under the (ts, event_id) order.

    Scale shape: ONE keyed exchange on user_id; the cumulative pass is
    an in-partition lexsort + vectorized segmented cumsum (global
    cumsum minus each segment's offset — no python per row or per
    user).  Output is row-per-event but needs no further exchange."""
    from .. import default_num_partitions

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    parted = ev.map_batches(lambda b: b.drop_null(),
                            batch_format="pyarrow") \
        .repartition(num_blocks=default_num_partitions(),
                     keys=["user_id"], sort=False)

    def cumulate(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "event_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.timestamp("us")),
            "running_n": pa.array([], type=pa.int64()),
            "running_cents": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        u = b["user_id"].to_numpy(zero_copy_only=False)
        ts = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        cents = np.floor(
            b["value"].to_numpy(zero_copy_only=False) * 100.0) \
            .astype(np.int64)
        order = np.lexsort((eid, ts, u))
        eid, u, ts, cents = eid[order], u[order], ts[order], cents[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        sizes = np.diff(np.r_[starts, len(u)])
        run_n = np.arange(1, len(u) + 1) \
            - np.repeat(starts, sizes)
        csum = np.cumsum(cents)
        seg_base = np.repeat(csum[starts] - cents[starts], sizes)
        run_c = csum - seg_base
        return pa.table({
            "event_id": pa.array(eid, type=pa.int64()),
            "user_id": pa.array(u, type=pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "running_n": pa.array(run_n.astype(np.int64),
                                  type=pa.int64()),
            "running_cents": pa.array(run_c, type=pa.int64())})

    return parted.map_batches(cumulate, batch_format="pyarrow",
                              batch_size=None)


SQL_USER_CUMULATIVE = """
SELECT event_id, user_id, ts,
       CAST(count(*) OVER w AS BIGINT) AS running_n,
       CAST(sum(CAST(floor(value * 100.0) AS BIGINT)) OVER w
            AS BIGINT) AS running_cents
FROM events
WHERE event_id IS NOT NULL AND user_id IS NOT NULL
  AND ts IS NOT NULL AND value IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


EXT_QUERIES["user_cumulative"] = q_user_cumulative
EXT_ORACLES["user_cumulative"] = SQL_USER_CUMULATIVE


# ---------------------------------------------------------------------
# Sorted-neighborhood blocking (engine addition; Hernández & Stolfo
# 1995 — THE classic record-linkage blocking alternative to LSH):
# sort records by a blocking key, slide a window of W, pair every two
# records inside a window.  The distributed form needs global ranks
# and boundary-crossing windows — both handled without any driver
# data pass.
# ---------------------------------------------------------------------

_SN_W = 4


def q_sorted_neighborhood(sf_dir: str, w: int = _SN_W):
    """All part pairs within a sliding window of ``w`` under the
    (p_name, p_partkey) sort order: (key_a, key_b) with key_a the
    lower-ranked row and rank distance in 1..w-1.

    Scale shape: the global rank comes from the distributed
    zip-with-index stage over a COMPOSITE sortable key (name + NUL +
    zero-padded key — byte order equals the SQL's (name, key) ORDER
    BY; the key encodes the row id, so no join re-attaches it); rows
    then post to rank-band ``rk // (w-1)`` AND the next band, which
    provably co-locates every pair with rank distance <= w-1 (widths
    are w-1, so the higher rank lands in the same or next band);
    pairs enumerate per band and dedupe in ONE keyed exchange.  No
    stage materializes the sorted corpus on the driver."""
    from .. import default_num_partitions
    from ..stages.index import zip_with_index
    from .queries import _dedup_ab, _empty_guard

    empty = _empty_guard(sf_dir, "part", {"key_a": pa.int64(),
                                          "key_b": pa.int64()})
    if empty is not None:
        return empty

    nparts = default_num_partitions()
    ds = _read(sf_dir, "part", ["p_partkey", "p_name"])

    def composite(b: pa.Table) -> pa.Table:
        b = b.drop_null()
        keys = [f"{n}\x00{k:012d}"
                for n, k in zip(b["p_name"].to_pylist(),
                                b["p_partkey"].to_pylist())]
        return pa.table({"ck": pa.array(keys, type=pa.string())})

    ranked = zip_with_index(ds.map_batches(composite,
                                           batch_format="pyarrow"),
                            "ck", out_col="rk")

    band_w = w - 1

    def to_bands(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"band": pa.array([], type=pa.int64()),
                             "rk": pa.array([], type=pa.int64()),
                             "pk": pa.array([], type=pa.int64())})
        rk = b["rk"].to_numpy(zero_copy_only=False)
        pk = np.array([int(s.rsplit("\x00", 1)[1])
                       for s in b["ck"].to_pylist()], dtype=np.int64)
        band = rk // band_w
        return pa.table({
            "band": pa.array(np.concatenate([band, band + 1]),
                             type=pa.int64()),
            "rk": pa.array(np.concatenate([rk, rk]), type=pa.int64()),
            "pk": pa.array(np.concatenate([pk, pk]), type=pa.int64())})

    posted = ranked.map_batches(to_bands, batch_format="pyarrow")

    def band_pairs(b: pa.Table) -> pa.Table:
        empty_p = pa.table({"a": pa.array([], type=pa.int64()),
                            "b": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty_p
        band = b["band"].to_numpy(zero_copy_only=False)
        rk = b["rk"].to_numpy(zero_copy_only=False)
        pk = b["pk"].to_numpy(zero_copy_only=False)
        order = np.lexsort((rk, band))
        band, rk, pk = band[order], rk[order], pk[order]
        starts = np.flatnonzero(np.r_[True, band[1:] != band[:-1]])
        sizes = np.diff(np.r_[starts, len(band)])
        a_out, b_out = [], []
        for s, n in zip(starts, sizes):
            if n < 2:
                continue
            r, p = rk[s:s + n], pk[s:s + n]
            # each row appears once per band (duplicate posts land in
            # DIFFERENT bands), so within a band rows are distinct
            ii, jj = np.triu_indices(n, k=1)
            m = (r[jj] - r[ii]) <= band_w
            a_out.append(p[ii[m]])
            b_out.append(p[jj[m]])
        if not a_out:
            return empty_p
        return pa.table({"a": pa.array(np.concatenate(a_out),
                                       type=pa.int64()),
                         "b": pa.array(np.concatenate(b_out),
                                       type=pa.int64())})

    return posted.repartition(num_blocks=nparts, keys=["band"],
                              sort=False) \
        .map_batches(band_pairs, batch_format="pyarrow",
                     batch_size=None) \
        .repartition(num_blocks=nparts, keys=["a", "b"], sort=False) \
        .map_batches(_dedup_ab, batch_format="pyarrow",
                     batch_size=None) \
        .rename_columns({"a": "key_a", "b": "key_b"})


def _sql_sorted_neighborhood(w: int = _SN_W) -> str:
    return f"""
WITH r AS (
  SELECT p_partkey,
         row_number() OVER (ORDER BY p_name, p_partkey) AS rk
  FROM part WHERE p_name IS NOT NULL AND p_partkey IS NOT NULL
)
SELECT x.p_partkey AS key_a, y.p_partkey AS key_b
FROM r x JOIN r y ON y.rk > x.rk AND y.rk <= x.rk + {w - 1}
"""


EXT_QUERIES["sorted_neighborhood"] = q_sorted_neighborhood
EXT_ORACLES["sorted_neighborhood"] = _sql_sorted_neighborhood()


# ---------------------------------------------------------------------
# Fellegi-Sunter linkage weights (engine addition; Fellegi & Sunter
# 1969 — THE classical probabilistic record-linkage model): each
# candidate pair scores the sum over fields of ln(m/u) on agreement
# and ln((1-m)/(1-u)) on disagreement, where u is the chance two
# RANDOM records agree (estimated from value frequencies) and m is
# the match-agreement probability (frozen here — with no labeled
# pairs, the standard EM estimate has no data).
# ---------------------------------------------------------------------

_FS_M = 0.95
_FS_FIELDS = ("p_brand", "p_type", "p_size")


def q_fs_weights(sf_dir: str, m_prob: float = _FS_M):
    """(key_a, key_b, weight) for every sorted-neighborhood candidate
    pair: weight = Σ_field ln(m/u_f) if the field agrees else
    ln((1-m)/(1-u_f)), u_f = Σ_v n_v(n_v-1) / (N(N-1)) over the
    field's value histogram — all exact-integer numerators, one
    shared float expression shape with the SQL.

    Scale shape: per-field value histograms fold from per-block
    partial counts (value rows, never records); the six ln weights
    broadcast as closure scalars; candidate pairs reuse
    q_sorted_neighborhood's machinery and attach both sides' fields
    via two co-partitioned joins (inputs scrubbed of zero-column
    empties per the engine contract); scoring is a stateless map."""
    import math

    from .. import default_num_partitions, scrub_empty_blocks
    from .queries import _canon_round, _empty_guard

    empty = _empty_guard(sf_dir, "part",
                         {"key_a": pa.int64(), "key_b": pa.int64(),
                          "weight": pa.float64()})
    if empty is not None:
        return empty

    nparts = default_num_partitions()
    ds = _read(sf_dir, "part",
               ["p_partkey"] + list(_FS_FIELDS)).materialize()

    # per-field agreement probability u from value histograms: the
    # partials are (field, value, count) rows — value-dimension tiny
    def hist_partial(b: pa.Table) -> pa.Table:
        fs, vs, cs = [], [], []
        for f in _FS_FIELDS:
            v = np.array([str(x) for x in b[f].to_pylist()],
                         dtype=object)
            u, c = np.unique(v.astype("U"), return_counts=True)
            fs += [f] * len(u)
            vs += list(u)
            cs += list(c)
        return pa.table({"f": pa.array(fs, type=pa.string()),
                         "v": pa.array(vs, type=pa.string()),
                         "c": pa.array(np.asarray(cs, dtype=np.int64),
                                       type=pa.int64())})

    rows = ds.map_batches(hist_partial, batch_format="pyarrow").take_all()
    hist: dict[tuple, int] = {}
    n_total = 0
    for r in rows:
        hist[(r["f"], r["v"])] = hist.get((r["f"], r["v"]), 0) + r["c"]
    n_total = ds.count()
    lw = {}
    for f in _FS_FIELDS:
        num = sum(c * (c - 1) for (ff, _), c in hist.items() if ff == f)
        u = num / (n_total * (n_total - 1))
        lw[f] = (math.log(m_prob / u),
                 math.log((1 - m_prob) / (1 - u)))

    pairs = scrub_empty_blocks(
        q_sorted_neighborhood(sf_dir).materialize())
    side = ds.select_columns(["p_partkey"] + list(_FS_FIELDS))
    a_side = side.rename_columns(
        {"p_partkey": "key_a", **{f: f + "_a" for f in _FS_FIELDS}})
    b_side = side.rename_columns(
        {"p_partkey": "key_b", **{f: f + "_b" for f in _FS_FIELDS}})
    enriched = scrub_empty_blocks(
        pairs.join(a_side, join_type="inner", num_partitions=nparts,
                   on=("key_a",)).materialize())
    enriched = enriched.join(b_side, join_type="inner",
                             num_partitions=nparts, on=("key_b",))

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"key_a": pa.array([], type=pa.int64()),
                             "key_b": pa.array([], type=pa.int64()),
                             "weight": pa.array([], type=pa.float64())})
        s = None
        for f in _FS_FIELDS:
            va = np.array([str(x) for x in b[f + "_a"].to_pylist()],
                          dtype=object)
            vb = np.array([str(x) for x in b[f + "_b"].to_pylist()],
                          dtype=object)
            agree = va == vb
            term = np.where(agree, lw[f][0], lw[f][1])
            s = term if s is None else s + term
        return pa.table({
            "key_a": b["key_a"],
            "key_b": b["key_b"],
            "weight": _canon_round(list(s), 6)})

    return enriched.map_batches(score, batch_format="pyarrow")


def _sql_fs_weights(m_prob: float = _FS_M) -> str:
    from .queries import _sql_round

    mr = repr(m_prob)
    omr = repr(1 - m_prob)
    terms = []
    for f in _FS_FIELDS:
        u = (f"((SELECT CAST(sum(c * (c - 1)) AS BIGINT) FROM "
             f"(SELECT count(*) AS c FROM part WHERE {f} IS NOT NULL "
             f"GROUP BY CAST({f} AS VARCHAR)) h)"
             f" / ((SELECT count(*) FROM part)"
             f" * ((SELECT count(*) FROM part) - 1)))")
        terms.append(
            f"CASE WHEN CAST(pa.{f} AS VARCHAR) = CAST(pb.{f} AS VARCHAR)"
            f" THEN ln({mr} / {u}) ELSE ln({omr} / (1 - {u})) END")
    score = terms[0]
    for t in terms[1:]:
        score = f"({score} + {t})"
    return f"""
WITH r AS (
  SELECT p_partkey,
         row_number() OVER (ORDER BY p_name, p_partkey) AS rk
  FROM part WHERE p_name IS NOT NULL AND p_partkey IS NOT NULL
),
p AS (
  SELECT x.p_partkey AS key_a, y.p_partkey AS key_b
  FROM r x JOIN r y ON y.rk > x.rk AND y.rk <= x.rk + {_SN_W - 1}
)
SELECT p.key_a, p.key_b, {_sql_round(score, 6)} AS weight
FROM p JOIN part pa ON pa.p_partkey = p.key_a
       JOIN part pb ON pb.p_partkey = p.key_b
"""


EXT_QUERIES["fs_weights"] = q_fs_weights
EXT_ORACLES["fs_weights"] = _sql_fs_weights()


# ---------------------------------------------------------------------
# Fingerprint-key clustering (engine addition; OpenRefine's
# "fingerprint" method — the standard data-cleaning collision key):
# lowercase, tokenize, sort DISTINCT tokens, rejoin.  Token-order and
# duplication variants of a value ("Widget red" / "red   widget")
# collide on one key; the key groups are the duplicate-candidate
# clusters a cleaning pass reviews.
# ---------------------------------------------------------------------


def q_fingerprint_cluster(sf_dir: str):
    """One row per fingerprint key over part names:
    (fp, n_rows, n_names) — total rows and DISTINCT raw names that
    collide on the key.

    Scale shape: the key is a stateless map (tokenize + per-value
    sort-unique-join inside the batch); per-block partials
    pre-aggregate to (fp, name, count) rows — value-vocabulary rows,
    never records — before ONE fp-keyed exchange; the fold then
    counts rows by integer sum and distinct names by segment
    boundaries, both exact under any block structure."""
    from .. import default_num_partitions
    from ..functions.tokenize import tokenize_batch
    from .queries import _empty_guard

    empty = _empty_guard(sf_dir, "part",
                         {"fp": pa.string(), "n_rows": pa.int64(),
                          "n_names": pa.int64()})
    if empty is not None:
        return empty

    nparts = default_num_partitions()
    ds = _read(sf_dir, "part", ["p_name"])

    def keyed_partial(b: pa.Table) -> pa.Table:
        emp = pa.table({"fp": pa.array([], type=pa.string()),
                        "name": pa.array([], type=pa.string()),
                        "n": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return emp
        names = [x for x in b["p_name"].to_pylist() if x is not None]
        if not names:
            return emp
        flat, starts = tokenize_batch(names)
        fps = [" ".join(sorted(set(flat[starts[i]:starts[i + 1]])))
               for i in range(len(names))]
        f = np.array(fps, dtype=object)
        nm = np.array(names, dtype=object)
        order = np.lexsort((nm.astype("U"), f.astype("U")))
        f, nm = f[order], nm[order]
        seg = np.flatnonzero(np.r_[True, (f[1:] != f[:-1])
                                   | (nm[1:] != nm[:-1])])
        cnt = np.diff(np.r_[seg, len(f)])
        return pa.table({"fp": pa.array(f[seg], type=pa.string()),
                         "name": pa.array(nm[seg], type=pa.string()),
                         "n": pa.array(cnt.astype(np.int64),
                                       type=pa.int64())})

    def fold(b: pa.Table) -> pa.Table:
        emp = pa.table({"fp": pa.array([], type=pa.string()),
                        "n_rows": pa.array([], type=pa.int64()),
                        "n_names": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return emp
        f = np.array(b["fp"].to_pylist(), dtype=object)
        nm = np.array(b["name"].to_pylist(), dtype=object)
        n = b["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nm.astype("U"), f.astype("U")))
        f, nm, n = f[order], nm[order], n[order]
        # collapse duplicate (fp, name) partials, then fold per fp
        pair_seg = np.flatnonzero(np.r_[True, (f[1:] != f[:-1])
                                        | (nm[1:] != nm[:-1])])
        pn = np.add.reduceat(n, pair_seg)
        pf = f[pair_seg]
        fp_seg = np.flatnonzero(np.r_[True, pf[1:] != pf[:-1]])
        rows = np.add.reduceat(pn, fp_seg)
        names = np.diff(np.r_[fp_seg, len(pf)])
        return pa.table({
            "fp": pa.array(pf[fp_seg], type=pa.string()),
            "n_rows": pa.array(rows.astype(np.int64), type=pa.int64()),
            "n_names": pa.array(names.astype(np.int64),
                                type=pa.int64())})

    return ds.map_batches(keyed_partial, batch_format="pyarrow") \
        .repartition(num_blocks=nparts, keys=["fp"], sort=False) \
        .map_batches(fold, batch_format="pyarrow", batch_size=None)


SQL_FINGERPRINT_CLUSTER = """
WITH k AS (
  SELECT array_to_string(list_sort(list_distinct(
             regexp_extract_all(lower(p_name), '[a-z0-9]+'))), ' ')
           AS fp,
         p_name
  FROM part WHERE p_name IS NOT NULL
)
SELECT fp, count(*) AS n_rows, count(DISTINCT p_name) AS n_names
FROM k GROUP BY 1
"""


EXT_QUERIES["fingerprint_cluster"] = q_fingerprint_cluster
EXT_ORACLES["fingerprint_cluster"] = SQL_FINGERPRINT_CLUSTER


def q_events_range_join(sf_dir: str):
    """Range join (engine addition — see stages/rangejoin.py): each
    event matched to every OTHER event-type's activity window
    [min ts, max ts] of the same user that contains it.  The
    inequality join runs as a banded (key, bucket) equi-join; the
    oracle is the plain DuckDB inequality join."""
    from ray.data.aggregate import Max, Min

    from .. import default_num_partitions, scrub_empty_blocks
    from ..stages.rangejoin import interval_join
    from .queries import _empty_guard

    empty = _empty_guard(sf_dir, "events",
                         {"event_id": pa.int64(), "user_id": pa.int64(),
                          "ts": pa.timestamp("us"),
                          "event_type": pa.string(),
                          "other_type": pa.string()})
    if empty is not None:
        return empty

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    # work in the column's NATIVE unit (a µs cast would truncate ns
    # inputs and diverge from the full-precision oracle at window
    # boundaries); the bucket width scales with the unit
    _SCALE = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}
    unit = dict(zip(ev.schema().names, ev.schema().types))["ts"].unit
    day_native = 86_400 * _SCALE[unit]

    def to_int_ts(b: pa.Table) -> pa.Table:
        b = b.drop_null()
        tsi = b["ts"].cast(pa.int64())
        return b.set_column(b.schema.get_field_index("ts"), "tsi", tsi)

    evi = ev.map_batches(to_int_ts, batch_format="pyarrow").materialize()
    windows = scrub_empty_blocks(
        evi.groupby(["user_id", "event_type"])
           .aggregate(Min("tsi", alias_name="w_start"),
                      Max("tsi", alias_name="w_end")).materialize(),
        fallback_schema=pa.schema([("user_id", pa.int64()),
                                   ("event_type", pa.string()),
                                   ("w_start", pa.int64()),
                                   ("w_end", pa.int64())]))
    windows = windows.rename_columns({"event_type": "other_type"})

    # windows span days-to-weeks; ~1-31 replicas at 1-day buckets
    joined = interval_join(evi, windows, key="user_id", left_ts="tsi",
                           r_start="w_start", r_end="w_end",
                           bucket_us=day_native,
                           num_partitions=default_num_partitions())

    def finish(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b["event_type"], b["other_type"])
        b = b.filter(keep)
        return pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "ts": b["tsi"].cast(pa.timestamp(unit)),
            "event_type": b["event_type"],
            "other_type": b["other_type"],
        })

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_EVENTS_RANGE_JOIN = """
WITH e AS (
  SELECT event_id, user_id, ts, event_type FROM events
  WHERE event_id IS NOT NULL AND user_id IS NOT NULL
    AND ts IS NOT NULL AND event_type IS NOT NULL
), w AS (
  SELECT user_id, event_type AS other_type,
         min(ts) AS w_start, max(ts) AS w_end
  FROM e GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts, e.event_type, w.other_type
FROM e JOIN w ON e.user_id = w.user_id
             AND e.ts >= w.w_start AND e.ts <= w.w_end
             AND e.event_type <> w.other_type
"""

EXT_QUERIES["events_range_join"] = q_events_range_join
EXT_ORACLES["events_range_join"] = SQL_EVENTS_RANGE_JOIN


def q_corpus_cardinality(sf_dir: str):
    """HyperLogLog distinct-count estimates (engine addition — the
    reference has no approximate aggregates; a 100-TB corpus needs
    vocabulary / distinct-entity cardinalities without a full distinct
    shuffle).  Two sketches in one pass over documents: distinct
    tokens and distinct sources.

    Scale shape: each batch emits at most 2·4096 (metric, register,
    rank) rows — the shuffle moves sketch state, never keys; the
    register reduction is a tiny groupby-max and the driver folds
    ≤8192 rows into the two estimates.  Deterministic (register maxima
    are order-independent), so the rows-only gate is stable; accuracy
    (~1.6% typical at p=12) is pytest-gated against the exact counts.
    No SQL oracle by nature — DuckDB cannot reproduce the sketch."""
    import ray.data as rd
    from ray.data.aggregate import Max

    from .. import scrub_empty_blocks
    from ..functions.hashing import hash_str_array
    from ..functions.hll import M, hll_estimate, hll_partial
    from ..functions.tokenize import tokenize_hash_full

    docs = _read(sf_dir, "documents", ["source", "text"])

    def partials(b: pa.Table) -> pa.Table:
        tok_h, _starts, _toks = tokenize_hash_full(b["text"])
        tok_reg = hll_partial(tok_h)
        src = b["source"].to_numpy(zero_copy_only=False)
        src_reg = hll_partial(hash_str_array(src))
        metric, reg, rank = [], [], []
        for name, r in (("distinct_tokens", tok_reg), ("distinct_sources", src_reg)):
            nz = np.flatnonzero(r)
            metric.extend([name] * len(nz))
            reg.extend(nz)
            rank.extend(r[nz])
        return pa.table({"metric": pa.array(metric, type=pa.string()),
                         "reg": pa.array(np.asarray(reg, dtype=np.int64), type=pa.int64()),
                         "rank": pa.array(np.asarray(rank, dtype=np.int64), type=pa.int64())})

    merged = scrub_empty_blocks(
        docs.map_batches(partials, batch_format="pyarrow")
            .groupby(["metric", "reg"]).aggregate(Max("rank", alias_name="rank"))
            .materialize(),
        fallback_schema=pa.schema([("metric", pa.string()), ("reg", pa.int64()),
                                   ("rank", pa.int64())]))

    regs = {"distinct_tokens": np.zeros(M, dtype=np.uint8),
            "distinct_sources": np.zeros(M, dtype=np.uint8)}
    for r in merged.take_all():          # bounded: <= 2*M rows
        regs[r["metric"]][r["reg"]] = r["rank"]
    out = pa.table({
        "metric": pa.array(sorted(regs), type=pa.string()),
        "estimate": pa.array([round(hll_estimate(regs[m]), 1) for m in sorted(regs)],
                             type=pa.float64()),
    })
    return rd.from_arrow(out)


EXT_QUERIES["corpus_cardinality"] = q_corpus_cardinality
# rows-only: an HLL estimate is not SQL-reproducible; accuracy is
# pytest-gated against exact distinct counts instead


def q_events_sliding_count(sf_dir: str):
    """Sliding-window aggregate (engine addition — the reference has
    no window semantics, SURVEY §2.9): for every event, the count of
    the SAME user's events in the trailing hour, matching SQL's
    ``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW``.

    Scale shape: ONE user-keyed repartition, then a vectorized
    per-partition pass — sort by (user, ts) and two searchsorted
    calls give every row's window count at once (RANGE semantics by
    construction: counts rows by timestamp value, so ties need no
    special-casing).  No per-user loop, no per-group pandas."""
    from .. import default_num_partitions

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    _SCALE = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}

    def to_int(b: pa.Table) -> pa.Table:
        # work in the column's NATIVE unit (full precision — casting
        # ns inputs to µs would both mis-scale the int view and
        # truncate sub-µs boundaries vs the oracle); emit the unit as
        # a column so the window scales per batch
        b = b.drop_null()
        unit = b["ts"].type.unit
        tsi = b["ts"].cast(pa.int64())
        b = b.set_column(b.schema.get_field_index("ts"), "tsi", tsi)
        return b.append_column(
            "unit_scale", pa.array([_SCALE[unit]] * b.num_rows, type=pa.int64()))

    parted = ev.map_batches(to_int, batch_format="pyarrow") \
               .repartition(num_blocks=default_num_partitions(),
                            keys=["user_id"], sort=False)

    def window_counts(b: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.array([], type=pa.int64()),
                          "user_id": pa.array([], type=pa.int64()),
                          "ts": pa.array([], type=pa.timestamp("us")),
                          "n_window": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        scale = b["unit_scale"][0].as_py()
        WINDOW_US = 3600 * scale
        unit = {1: "s", 10**3: "ms", 10**6: "us", 10**9: "ns"}[scale]
        u = b["user_id"].to_numpy(zero_copy_only=False)
        t = b["tsi"].to_numpy(zero_copy_only=False)
        e = b["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((t, u))
        u, t, e = u[order], t[order], e[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        seg = np.repeat(np.arange(len(starts)), np.diff(np.r_[starts, len(u)]))
        base = starts[seg]
        # two-pointer via searchsorted on a composite (segment, ts)
        # key: segment stride folds the per-user slices into one call.
        # Overflow guard: n_segments x time-span must fit int64 — true
        # for any sane partition (e.g. 1e5 users x a decade of µs
        # ~ 3e22 would NOT, so fall back to per-segment searchsorted)
        span = t.max() - t.min() + WINDOW_US + 1
        if len(starts) * int(span) < (1 << 62):  # Python ints: the
            # guard itself must not wrap in int64
            comp = seg.astype(np.int64) * span + (t - t.min())
            hi = np.searchsorted(comp, comp, side="right")
            lo = np.searchsorted(comp, seg.astype(np.int64) * span
                                 + (t - t.min() - WINDOW_US), side="left")
            n = hi - np.maximum(lo, base)
        else:
            ends = np.r_[starts[1:], len(t)]
            n = np.empty(len(t), dtype=np.int64)
            for s0, s1 in zip(starts, ends):
                seg_t = t[s0:s1]
                n[s0:s1] = (np.searchsorted(seg_t, seg_t, side="right")
                            - np.searchsorted(seg_t, seg_t - WINDOW_US, side="left"))
        return pa.table({"event_id": pa.array(e, type=pa.int64()),
                         "user_id": pa.array(u, type=pa.int64()),
                         "ts": pa.array(t).cast(pa.timestamp(unit)),
                         "n_window": pa.array(n, type=pa.int64())})

    return parted.map_batches(window_counts, batch_format="pyarrow",
                              batch_size=None)


SQL_EVENTS_SLIDING_COUNT = """
SELECT event_id, user_id, ts,
       CAST(count(*) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_window
FROM events
WHERE event_id IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
"""

EXT_QUERIES["events_sliding_count"] = q_events_sliding_count
EXT_ORACLES["events_sliding_count"] = SQL_EVENTS_SLIDING_COUNT


def q_type_user_cardinality(sf_dir: str):
    """Grouped HyperLogLog: distinct USERS per event_type (the keyed
    form of corpus_cardinality — sketch aggregation BY group, the
    shape a fleet actually runs: one row of registers per (group,
    register) and a groupby-max, never a distinct shuffle of the raw
    keys).  Rows-only like corpus_cardinality; accuracy pytest-gated
    vs exact."""
    import ray.data as rd
    from ray.data.aggregate import Max

    from .. import scrub_empty_blocks
    from ..functions.hll import M, hll_estimate, hll_partial

    ev = _read(sf_dir, "events", ["event_type", "user_id"])

    def partials(b: pa.Table) -> pa.Table:
        b = b.drop_null()
        et = b["event_type"].to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        # per-group partial registers within the batch
        order = np.argsort(et, kind="stable")
        et, uid = et[order], uid[order]
        starts = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
        ends = np.r_[starts[1:], len(et)]
        gs, regs, ranks = [], [], []
        from ..functions.hashing import splitmix64

        h = splitmix64(uid.astype(np.uint64))
        for s0, s1 in zip(starts, ends):
            r = hll_partial(h[s0:s1])
            nz = np.flatnonzero(r)
            gs.extend([et[s0]] * len(nz))
            regs.extend(nz)
            ranks.extend(r[nz])
        return pa.table({"event_type": pa.array(gs, type=pa.string()),
                         "reg": pa.array(np.asarray(regs, dtype=np.int64), type=pa.int64()),
                         "rank": pa.array(np.asarray(ranks, dtype=np.int64), type=pa.int64())})

    merged = scrub_empty_blocks(
        ev.map_batches(partials, batch_format="pyarrow")
          .groupby(["event_type", "reg"]).aggregate(Max("rank", alias_name="rank"))
          .materialize(),
        fallback_schema=pa.schema([("event_type", pa.string()),
                                   ("reg", pa.int64()), ("rank", pa.int64())]))

    regs: dict[str, np.ndarray] = {}
    for r in merged.take_all():          # bounded: <= n_groups * M rows
        regs.setdefault(r["event_type"], np.zeros(M, dtype=np.uint8))[r["reg"]] = r["rank"]
    out = pa.table({
        "event_type": pa.array(sorted(regs), type=pa.string()),
        "estimate": pa.array([round(hll_estimate(regs[g]), 1) for g in sorted(regs)],
                             type=pa.float64()),
    })
    return rd.from_arrow(out)


EXT_QUERIES["type_user_cardinality"] = q_type_user_cardinality
# rows-only (HLL, like corpus_cardinality); pytest gates vs exact


def q_clicks_daily(sf_dir: str):
    """Prune-at-the-read demo: the click predicate is pushed into the
    parquet SCAN (``read_parquet(filter=...)`` → fragment/row-group
    statistics prune before bytes leave storage) and only two columns
    are projected — at 100 TB this is the difference between reading
    the corpus and reading the ~4% that matches.  The filter column
    must be projected for the pinned-schema read; it is dropped in
    the first map."""
    import pyarrow.compute as _pc
    from ray.data.aggregate import Count

    from .. import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"],
                            filter=(_pc.field("event_type") == "click"))

    def add_day(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b["ts"], unit="day").cast(pa.timestamp("us"))
        return pa.table({"day": day})

    out = ds.map_batches(add_day, batch_format="pyarrow") \
            .groupby("day").aggregate(Count(alias_name="n_clicks"))

    def pin(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"day": pa.array([], type=pa.timestamp("us")),
                             "n_clicks": pa.array([], type=pa.int64())})
        return b.set_column(b.schema.get_field_index("day"), "day",
                            b["day"].cast(pa.timestamp("us")))

    return out.map_batches(pin, batch_format="pyarrow")


SQL_CLICKS_DAILY = """
SELECT date_trunc('day', ts) AS day, count(*) AS n_clicks
FROM events WHERE event_type = 'click' GROUP BY 1
"""

EXT_QUERIES["clicks_daily"] = q_clicks_daily
EXT_ORACLES["clicks_daily"] = SQL_CLICKS_DAILY


def _block_offsets(sorted_ds, key_cols: list) -> dict:
    """Global row offset per block of a SORTED dataset, keyed by the
    block's first-row key tuple (unique because the sort key ends in a
    unique column — the stages/index.py block-identity trick): ONE
    metadata row per block to the driver, nothing else.  Shared by
    token_quantiles / ccnet_buckets; the caller looks its block up as
    ``offsets[tuple(b[c][0].as_py() for c in key_cols)]``."""
    def block_meta(b: pa.Table) -> pa.Table:
        take = min(1, b.num_rows)
        cols = {f"k{i}": b[c].slice(0, take) for i, c in enumerate(key_cols)}
        cols["rows"] = pa.array([b.num_rows][:take], type=pa.int64())
        return pa.table(cols)

    meta = sorted(
        tuple(r[f"k{i}"] for i in range(len(key_cols))) + (r["rows"],)
        for r in sorted_ds.map_batches(block_meta, batch_format="pyarrow",
                                       batch_size=None).take_all())
    offsets, acc = {}, 0
    for *key, rows in meta:
        offsets[tuple(key)] = acc
        acc += rows
    return offsets


def q_token_quantiles(sf_dir: str):
    """EXACT distributed quantiles of per-doc token counts (engine
    addition — global order statistics with no driver materialization
    and no approximation): distributed sort on (n_tokens, doc_id),
    ONE metadata row per block gives each block its global offset
    (``_block_offsets``), and each block emits only the rows
    whose global rank hits a quantile target — the driver never sees
    more than one meta row per block plus the five result rows."""
    QS = (0.25, 0.5, 0.75, 0.9, 0.99)

    from .. import scrub_empty_blocks
    from ..functions.tokenize import tokenize_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(b: pa.Table) -> pa.Table:
        _flat, starts = tokenize_batch(b["text"].to_pylist())
        return pa.table({"doc_id": b["doc_id"],
                         "n_tokens": pa.array(np.diff(starts), type=pa.int64())})

    snt = scrub_empty_blocks(
        docs.map_batches(counts, batch_format="pyarrow")
            .sort(["n_tokens", "doc_id"]).materialize())
    n = snt.count()
    offsets = _block_offsets(snt, ["n_tokens", "doc_id"])
    rank_to_qs: dict[int, list[float]] = {}
    for q in QS:
        rank_to_qs.setdefault(int(np.floor(q * (n - 1))), []).append(q)

    def pick(b: pa.Table) -> pa.Table:
        empty = pa.table({"q": pa.array([], type=pa.float64()),
                          "n_tokens": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        base = offsets[(b["n_tokens"][0].as_py(), b["doc_id"][0].as_py())]
        qs, vals = [], []
        for rank, qlist in rank_to_qs.items():
            local = rank - base
            if 0 <= local < b.num_rows:
                v = b["n_tokens"][local].as_py()
                for q in qlist:
                    qs.append(q)
                    vals.append(v)
        if not qs:
            return empty
        return pa.table({"q": pa.array(qs, type=pa.float64()),
                         "n_tokens": pa.array(vals, type=pa.int64())})

    return snt.map_batches(pick, batch_format="pyarrow", batch_size=None)


SQL_TOKEN_QUANTILES = f"""
WITH t AS (
  SELECT doc_id, len({_TOKS}) AS n_tokens FROM documents
), s AS (
  SELECT n_tokens, row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS r,
         count(*) OVER () AS n
  FROM t
)
SELECT v.q, s.n_tokens
FROM s JOIN (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)) v(q)
  ON s.r = CAST(floor(v.q * (s.n - 1)) AS BIGINT)
"""

EXT_QUERIES["token_quantiles"] = q_token_quantiles
EXT_ORACLES["token_quantiles"] = SQL_TOKEN_QUANTILES


def q_ccnet_buckets(sf_dir: str):
    """CCNet-style corpus quality bucketing (engine addition —
    Wenzek et al. 2020 split Common Crawl into head/middle/tail by
    LM-perplexity terciles and train on the head): every document gets
    a ``head`` / ``middle`` / ``tail`` label by exact terciles of its
    unigram-LM score (q_doc_lm_score; low score = stereotyped
    boilerplate ≈ CCNet's low perplexity ⇒ head).

    Scale shape: the lm scoring is the existing broadcast-attach
    pipeline; bucketing adds ONE distributed sort on (lm_score,
    doc_id) + the token_quantiles block-offset trick — one metadata
    row per block to the driver, tercile RANKS broadcast back, labels
    assigned per block by pure rank arithmetic.  No driver
    materialization, no approximation, deterministic ties (doc_id)."""
    from .. import scrub_empty_blocks

    scored = scrub_empty_blocks(
        q_doc_lm_score(sf_dir).sort(["lm_score", "doc_id"]).materialize())
    n = scored.count()
    r1 = int(np.floor((n - 1) / 3.0))
    r2 = int(np.floor(2 * (n - 1) / 3.0))
    offsets = _block_offsets(scored, ["lm_score", "doc_id"])

    def assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "lm_score": pa.array([], type=pa.float64()),
                             "bucket": pa.array([], type=pa.string())})
        base = offsets[(b["lm_score"][0].as_py(), b["doc_id"][0].as_py())]
        r = base + np.arange(b.num_rows, dtype=np.int64)
        bucket = np.where(r <= r1, "head",
                          np.where(r <= r2, "middle", "tail"))
        return pa.table({"doc_id": b["doc_id"],
                         "lm_score": b["lm_score"],
                         "bucket": pa.array(bucket.tolist(),
                                            type=pa.string())})

    return scored.map_batches(assign, batch_format="pyarrow",
                              batch_size=None)


SQL_CCNET_BUCKETS = f"""
WITH lm AS ({SQL_DOC_LM_SCORE}),
s AS (
  SELECT doc_id, lm_score,
         row_number() OVER (ORDER BY lm_score, doc_id) - 1 AS r,
         count(*) OVER () AS n
  FROM lm
)
SELECT doc_id, lm_score,
       CASE WHEN r <= CAST(floor((n - 1) / 3.0) AS BIGINT) THEN 'head'
            WHEN r <= CAST(floor(2 * (n - 1) / 3.0) AS BIGINT) THEN 'middle'
            ELSE 'tail' END AS bucket
FROM s
"""

EXT_QUERIES["ccnet_buckets"] = q_ccnet_buckets
EXT_ORACLES["ccnet_buckets"] = SQL_CCNET_BUCKETS


def q_value_quantiles_by_type(sf_dir: str):
    """Per-group EXACT quantiles (engine addition — completes the
    order-statistics family: `token_quantiles` is global, this is
    grouped): p25/50/75/90/99 of event value per event_type.

    Scale shape: ONE group-keyed repartition, then a single
    lexsort/segment pass per partition picks each group's rank-hit
    rows — groups never materialize individually and no per-group
    pandas runs.  Determinism: ranks select on (value, event_id),
    mirroring the oracle's row_number ordering; values pass through
    raw (no arithmetic), so floats compare bit-exact."""
    QS = (0.25, 0.5, 0.75, 0.9, 0.99)

    from .. import default_num_partitions

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    parted = ev.map_batches(lambda b: b.drop_null(), batch_format="pyarrow") \
               .repartition(num_blocks=default_num_partitions(),
                            keys=["event_type"], sort=False)

    def group_quantiles(b: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], type=pa.string()),
                          "q": pa.array([], type=pa.float64()),
                          "value_q": pa.array([], type=pa.float64())})
        if b.num_rows == 0:
            return empty
        g = b["event_type"].to_numpy(zero_copy_only=False)
        v = b["value"].to_numpy(zero_copy_only=False)
        e = b["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, v, g))
        g, v = g[order], v[order]
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        cnt = np.diff(np.r_[starts, len(g)])
        gt, qs, vq = [], [], []
        for q in QS:
            idx = starts + np.floor(q * (cnt - 1)).astype(np.int64)
            gt.extend(g[starts])
            qs.extend([q] * len(starts))
            vq.extend(v[idx])
        return pa.table({"event_type": pa.array(gt, type=pa.string()),
                         "q": pa.array(qs, type=pa.float64()),
                         "value_q": pa.array(vq, type=pa.float64())})

    return parted.map_batches(group_quantiles, batch_format="pyarrow",
                              batch_size=None)


SQL_VALUE_QUANTILES_BY_TYPE = """
WITH e AS (
  SELECT event_type, value, event_id FROM events
  WHERE event_type IS NOT NULL AND value IS NOT NULL AND event_id IS NOT NULL
), s AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) - 1 AS r,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM e
)
SELECT s.event_type, v.q, s.value AS value_q
FROM s JOIN (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)) v(q)
  ON s.r = CAST(floor(v.q * (s.n - 1)) AS BIGINT)
"""

EXT_QUERIES["value_quantiles_by_type"] = q_value_quantiles_by_type
EXT_ORACLES["value_quantiles_by_type"] = SQL_VALUE_QUANTILES_BY_TYPE


# ---------------------------------------------------------------------
# Deterministic distributed k-means over the embedding corpus (engine
# addition; the curation-clustering primitive behind SemDeDup-style
# cluster-then-dedup and domain-discovery pipelines).  Runs on an
# INTEGER lattice so the whole Lloyd iteration is bit-replayable in
# SQL: float dot products cannot be replayed across engines (summation
# order perturbs the last ulp and argmin boundaries drift round over
# round), but int64 squared distances and round-half-up integer
# centroid updates are exact everywhere.
# ---------------------------------------------------------------------

_KM_K = 8
_KM_ITERS = 2
_KM_SCALE = 1 << 20  # quantization: q = floor(x * 2^20 + 0.5)


def _km_quantize(col) -> np.ndarray:
    """Embedding list column -> (rows, dim) int64 lattice points.
    float32 -> float64 is exact, * 2^20 and floor(x + 0.5) are the
    same double ops DuckDB runs, so both sides land on identical
    integers."""
    E = np.array(col.to_pylist(), dtype=np.float64)
    return np.floor(E * float(_KM_SCALE) + 0.5).astype(np.int64)


def _km_assign(E: np.ndarray, C: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cluster, squared-distance) per row — all int64, ties to the
    lowest cluster id (np.argmin first-min == SQL ORDER BY dist,
    cluster LIMIT 1)."""
    d2 = ((E * E).sum(axis=1)[:, None]
          - 2 * (E @ C.T)
          + (C * C).sum(axis=1)[None, :])
    cell = np.argmin(d2, axis=1)
    return cell, d2[np.arange(len(E)), cell]


def q_embedding_kmeans(sf_dir: str, k: int = _KM_K, n_iters: int = _KM_ITERS):
    """Distributed k-means cluster assignment over `embeddings`:
    (vec_id, cluster, dist) after ``n_iters`` Lloyd updates from
    deterministic seeds (the k smallest vec_ids).

    Semantics (mirrored 1:1 in SQL): vectors quantize to the int64
    lattice floor(x * 2^20 + 0.5); distance is exact integer squared
    L2; argmin ties resolve to the lowest cluster id; the centroid
    update is the round-half-up integer mean (2*sum + n) // (2*n)
    per dimension (floor division — numpy's // on int64); a cluster
    that loses every member keeps its previous centroid.

    Scale shape (the ivf_centroids pattern): centroids broadcast via
    ``ray.put`` each round; every block emits at most k partial rows
    (cluster, int64 sum-vector bytes, count) — the vectors themselves
    NEVER move; the driver folds ≤ k × blocks tiny rows (order-
    independent integer sums, so block structure cannot perturb the
    result) and re-broadcasts.  The final labeling pass is stateless
    map_batches.  Seeds come from a bounded filtered read, not a
    global sort.  At 100 TB the per-round exchange is k rows per
    block — independent of corpus size."""
    import ray

    from .queries import _empty_guard

    empty = _empty_guard(sf_dir, "embeddings",
                         {"vec_id": pa.int64(), "cluster": pa.int64(),
                          "dist": pa.int64()})
    if empty is not None:
        return empty

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    # seeds: the k smallest vec_ids via per-block partial top-k +
    # driver fold (bounded: k rows per block cross, never the corpus)
    def seed_partial(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        take = np.argsort(ids)[:k]
        return pa.table({"vec_id": pa.array(ids[take], type=pa.int64()),
                         "q": pa.array(
                             [r.tobytes() for r in
                              _km_quantize(b["embedding"].take(
                                  pa.array(take)))],
                             type=pa.binary())})

    seed_rows = sorted(
        ds.map_batches(seed_partial, batch_format="pyarrow").take_all(),
        key=lambda r: r["vec_id"])[:k]
    C = np.stack([np.frombuffer(r["q"], dtype=np.int64)
                  for r in seed_rows])
    dim = C.shape[1]

    for _ in range(n_iters):
        cref = ray.put(C)

        def partial(b: pa.Table, _cref=cref) -> pa.Table:
            empty = pa.table({"cluster": pa.array([], type=pa.int64()),
                              "qsum": pa.array([], type=pa.binary()),
                              "n": pa.array([], type=pa.int64())})
            if b.num_rows == 0:
                return empty
            Cc = ray.get(_cref)
            E = _km_quantize(b["embedding"])
            cell, _ = _km_assign(E, Cc)
            sums = np.zeros((len(Cc), E.shape[1]), dtype=np.int64)
            np.add.at(sums, cell, E)
            cnt = np.bincount(cell, minlength=len(Cc))
            live = np.flatnonzero(cnt)
            return pa.table({
                "cluster": pa.array(live, type=pa.int64()),
                "qsum": pa.array([sums[c].tobytes() for c in live],
                                 type=pa.binary()),
                "n": pa.array(cnt[live], type=pa.int64())})

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros((k, dim), dtype=np.int64)
        cnt = np.zeros(k, dtype=np.int64)
        for r in rows:  # ≤ k × blocks tiny rows; integer fold is exact
            sums[r["cluster"]] += np.frombuffer(r["qsum"], dtype=np.int64)
            cnt[r["cluster"]] += r["n"]
        live = cnt > 0
        newC = C.copy()
        newC[live] = (2 * sums[live] + cnt[live, None]) \
            // (2 * cnt[live, None])
        C = newC

    cref = ray.put(C)

    def label(b: pa.Table, _cref=cref) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "cluster": pa.array([], type=pa.int64()),
                             "dist": pa.array([], type=pa.int64())})
        Cc = ray.get(_cref)
        E = _km_quantize(b["embedding"])
        cell, dist = _km_assign(E, Cc)
        return pa.table({
            "vec_id": b["vec_id"].cast(pa.int64()),
            "cluster": pa.array(cell.astype(np.int64), type=pa.int64()),
            "dist": pa.array(dist, type=pa.int64())})

    return ds.map_batches(label, batch_format="pyarrow")


def _sql_embedding_kmeans(k: int = _KM_K, n_iters: int = _KM_ITERS) -> str:
    """Unrolled Lloyd replay on the same integer lattice.  The
    centroid update uses floor((2*s + n) / (2*n)) in DOUBLE: 2*s and
    2*n are < 2^53 so the quotient's double error (~2^-32 absolute at
    this magnitude) is far below the 1/(2n) >= 2^-17 granularity of
    the exact rational, hence floor is exact — and DuckDB's integer
    `//` truncates toward zero, which would diverge from numpy's
    floor on negative sums."""
    parts = [f"""
WITH q AS (
  SELECT vec_id,
         unnest(range(1, len(embedding) + 1)) AS dim,
         CAST(floor(unnest(embedding) * {float(_KM_SCALE)} + 0.5) AS BIGINT)
           AS qv
  FROM embeddings
),
sv AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cluster
  FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
),
c0 AS (
  SELECT s.cluster, q.dim, q.qv AS cq
  FROM sv s JOIN q ON q.vec_id = s.vec_id
)"""]
    final = n_iters + 1
    for r in range(1, final + 1):
        parts.append(f""",
d{r} AS (
  SELECT q.vec_id, c.cluster,
         CAST(sum((q.qv - c.cq) * (q.qv - c.cq)) AS BIGINT) AS dist
  FROM q JOIN c{r - 1} c ON q.dim = c.dim
  GROUP BY q.vec_id, c.cluster
),
a{r} AS (
  SELECT vec_id, cluster, dist FROM d{r}
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY dist, cluster) = 1
)""")
        if r == final:
            break
        parts.append(f""",
u{r} AS (
  SELECT a.cluster, q.dim,
         CAST(sum(q.qv) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM a{r} a JOIN q ON q.vec_id = a.vec_id
  GROUP BY a.cluster, q.dim
),
c{r} AS (
  SELECT p.cluster, p.dim,
         COALESCE(CAST(floor((2.0 * u.s + u.n) / (2.0 * u.n)) AS BIGINT),
                  p.cq) AS cq
  FROM c{r - 1} p LEFT JOIN u{r} u USING (cluster, dim)
)""")
    parts.append(f"""
SELECT vec_id, cluster, dist FROM a{final}
""")
    return "".join(parts)


EXT_QUERIES["embedding_kmeans"] = q_embedding_kmeans
EXT_ORACLES["embedding_kmeans"] = _sql_embedding_kmeans()


# ---------------------------------------------------------------------
# Exact distributed k-NN classification over the embedding corpus
# (engine addition; the label-propagation / weak-supervision probe —
# classify every vector by majority vote of its k nearest labeled
# neighbours, the standard curation baseline for label noise and
# cluster-purity checks).  Same integer-lattice contract as
# embedding_kmeans: distances are int64 squared L2 on
# floor(x * 2^20 + 0.5) points, so the neighbour ranking AND the vote
# are bit-replayable in SQL with no float rounding anywhere.
# ---------------------------------------------------------------------

_KNN_K = 5


def q_knn_classify(sf_dir: str, k: int = _KNN_K, n_chunks: int = 8):
    """Exact k-NN majority-vote classification: for every vector,
    (vec_id, label, pred, correct) where pred is the modal label of
    its k nearest neighbours (self excluded).

    Semantics (mirrored 1:1 in SQL): int64 squared L2 on the
    embedding_kmeans lattice; neighbour order is (dist ASC, vec_id
    ASC); the vote breaks count ties to the SMALLEST label.

    Scale shape: the all-pairs kNN graph is inherently O(N²) compute,
    organized as the q_embedding_pairs chunk plan — vectors persist
    once into hash chunks, a C·(C+1)/2 task list fans out block
    compares with a per-actor chunk LRU, and each block emits at most
    k candidate rows PER QUERY (never the full distance matrix).
    Per-query candidates then co-locate with ONE keyed exchange and
    fold to the global top-k + vote inside the partition — the
    k-per-chunk partial top-k composes exactly because both levels
    use the same (dist, vec_id) total order.  At 100 TB the ANN
    family (q_ann_ivf / q_ann_pq) is the right tool; this is the
    exact oracle-matched path, chunk-count-tunable to worker heap."""
    import os
    import shutil
    import uuid

    import hashlib

    import pyarrow.parquet as pq
    import ray.data as rd

    from .. import default_num_partitions
    from ..stages.exchange import EXCHANGE_ROOT

    root = os.path.join(EXCHANGE_ROOT, "knn-" + uuid.uuid4().hex)
    for c in range(n_chunks):
        os.makedirs(os.path.join(root, f"chunk={c}"), exist_ok=True)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def write_chunks(b: pa.Table) -> pa.Table:
        vids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        labs = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        E = _km_quantize(b["embedding"])
        chunk = (vids % n_chunks).astype(np.int64)
        fid = hashlib.blake2b(vids.tobytes(), digest_size=16).hexdigest()
        for c in np.unique(chunk):
            m = chunk == c
            sub = np.ascontiguousarray(E[m])
            width = sub.shape[1] * 8
            offs = (np.arange(sub.shape[0] + 1, dtype=np.int64)
                    * width).astype(np.int32)
            emb_arr = pa.Array.from_buffers(
                pa.binary(), sub.shape[0],
                [None, pa.py_buffer(offs.tobytes()),
                 pa.py_buffer(sub.tobytes())])
            tbl = pa.table({"vec_id": pa.array(vids[m], type=pa.int64()),
                            "label": pa.array(labs[m], type=pa.int64()),
                            "emb": emb_arr})
            final = os.path.join(root, f"chunk={int(c)}", f"{fid}.parquet")
            tmp = final + f".{uuid.uuid4().hex}.tmp"
            pq.write_table(tbl, tmp, compression="none")
            os.replace(tmp, final)
        return pa.table({"n": pa.array([b.num_rows], type=pa.int64())})

    ds.map_batches(write_chunks, batch_format="pyarrow").count()

    _CAND = {"q": pa.int64(), "q_label": pa.int64(), "nb": pa.int64(),
             "nb_label": pa.int64(), "dist": pa.int64()}

    def _empty_cand() -> pa.Table:
        return pa.table({n: pa.array([], type=t) for n, t in _CAND.items()})

    class BlockKnn:
        """q_embedding_pairs' chunk-LRU comparator, emitting per-query
        per-block top-k candidates instead of thresholded pairs.
        Chunks load id-ASCENDING so the stable argsort's positional
        tie-break IS the (dist, vec_id) order the SQL replays."""

        CACHE_CAP = 4

        def __init__(self):
            from collections import OrderedDict

            self._cache: "OrderedDict[int, tuple]" = OrderedDict()

        def _chunk(self, c: int):
            got = self._cache.get(c)
            if got is not None:
                self._cache.move_to_end(c)
                return got
            d = os.path.join(root, f"chunk={c}")
            files = [os.path.join(d, f) for f in os.listdir(d)
                     if f.endswith(".parquet")]
            if not files:
                got = (np.array([], dtype=np.int64),
                       np.array([], dtype=np.int64),
                       np.zeros((0, 1), dtype=np.int64))
            else:
                t = pa.concat_tables([pq.read_table(f) for f in files])
                ids = t["vec_id"].to_numpy(zero_copy_only=False)
                labs = t["label"].to_numpy(zero_copy_only=False)
                flat = np.frombuffer(b"".join(t["emb"].to_pylist()),
                                     dtype=np.int64)
                E = flat.reshape(len(ids), -1)
                order = np.argsort(ids)  # ids unique -> deterministic
                got = (ids[order], labs[order],
                       np.ascontiguousarray(E[order]))
            self._cache[c] = got
            if len(self._cache) > self.CACHE_CAP:
                self._cache.popitem(last=False)
            return got

        @staticmethod
        def _topk(d2, qi, ql, ri, rl):
            """Per-row top-k of an int64 distance matrix; stable sort
            ties break by column position == ascending ref vec_id.
            Rows at the int64.max sentinel (the masked self diagonal)
            are DROPPED — with fewer than k real candidates they would
            otherwise survive the global fold and let a vector vote
            for itself (real distances are bounded by dim·2^42)."""
            kk = min(k, d2.shape[1])
            idx = np.argsort(d2, axis=1, kind="stable")[:, :kk]
            rows = np.repeat(np.arange(d2.shape[0]), kk)
            cols = idx.ravel()
            dist = d2[rows, cols]
            keep = dist < np.iinfo(np.int64).max
            return (np.repeat(qi, kk)[keep], np.repeat(ql, kk)[keep],
                    ri[cols][keep], rl[cols][keep], dist[keep])

        def __call__(self, b: pa.Table) -> pa.Table:
            outs = []
            for i, j in zip(b["i"].to_pylist(), b["j"].to_pylist()):
                ia, la, Ea = self._chunk(i)
                ib, lb, Eb = (ia, la, Ea) if i == j else self._chunk(j)
                if not len(ia) or not len(ib):
                    continue
                # int64 ops only: |q| <= 2^20 -> d2 <= dim * 2^42,
                # far inside int64
                d2 = ((Ea * Ea).sum(axis=1)[:, None]
                      - 2 * (Ea @ Eb.T)
                      + (Eb * Eb).sum(axis=1)[None, :])
                if i == j:
                    d2[ia[:, None] == ib[None, :]] = np.iinfo(np.int64).max
                outs.append(self._topk(d2, ia, la, ib, lb))
                if i != j:
                    outs.append(self._topk(
                        np.ascontiguousarray(d2.T), ib, lb, ia, la))
            if not outs:
                return _empty_cand()
            cat = [np.concatenate([o[c] for o in outs]) for c in range(5)]
            return pa.table({n: pa.array(v, type=pa.int64())
                             for n, v in zip(_CAND, cat)})

    tasks = rd.from_items([{"i": i, "j": j}
                           for i in range(n_chunks)
                           for j in range(i, n_chunks)])
    cand = tasks.map_batches(BlockKnn, batch_format="pyarrow",
                             batch_size=max(2, n_chunks // 2),
                             concurrency=(1, 4))

    def vote(b: pa.Table) -> pa.Table:
        empty = pa.table({"vec_id": pa.array([], type=pa.int64()),
                          "label": pa.array([], type=pa.int64()),
                          "pred": pa.array([], type=pa.int64()),
                          "correct": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        q = b["q"].to_numpy(zero_copy_only=False)
        ql = b["q_label"].to_numpy(zero_copy_only=False)
        nb = b["nb"].to_numpy(zero_copy_only=False)
        nl = b["nb_label"].to_numpy(zero_copy_only=False)
        d = b["dist"].to_numpy(zero_copy_only=False)
        # global top-k per query under the same (dist, nb) total order
        # the per-chunk partials used
        order = np.lexsort((nb, d, q))
        q, ql, nl = q[order], ql[order], nl[order]
        starts = np.flatnonzero(np.r_[True, q[1:] != q[:-1]])
        sizes = np.diff(np.r_[starts, len(q)])
        rank = np.arange(len(q)) - np.repeat(starts, sizes)
        keep = rank < k
        q, ql, nl = q[keep], ql[keep], nl[keep]
        # modal label, count ties -> smallest label: count (q, label)
        # runs, then first row per q under (count DESC, label ASC)
        order = np.lexsort((nl, q))
        q, ql, nl = q[order], ql[order], nl[order]
        seg = np.flatnonzero(np.r_[True, (q[1:] != q[:-1])
                                   | (nl[1:] != nl[:-1])])
        cnt = np.diff(np.r_[seg, len(q)])
        qs, qls, nls = q[seg], ql[seg], nl[seg]
        order = np.lexsort((nls, -cnt, qs))
        qs, qls, nls = qs[order], qls[order], nls[order]
        first = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
        return pa.table({
            "vec_id": pa.array(qs[first], type=pa.int64()),
            "label": pa.array(qls[first], type=pa.int64()),
            "pred": pa.array(nls[first], type=pa.int64()),
            "correct": pa.array((qls[first] == nls[first])
                                .astype(np.int64), type=pa.int64())})

    out = cand.repartition(num_blocks=default_num_partitions(),
                           keys=["q"], sort=False) \
              .map_batches(vote, batch_format="pyarrow",
                           batch_size=None).materialize()
    shutil.rmtree(root, ignore_errors=True)
    return out


def _sql_knn_classify(k: int = _KNN_K) -> str:
    """All-pairs replay on the same integer lattice: per-dim join,
    BIGINT distance sums (order-independent), QUALIFY top-k under
    (dist, nb), modal label under (count DESC, label ASC)."""
    return f"""
WITH q AS (
  SELECT vec_id,
         unnest(range(1, len(embedding) + 1)) AS dim,
         CAST(floor(unnest(embedding) * {float(_KM_SCALE)} + 0.5) AS BIGINT)
           AS qv
  FROM embeddings
),
d AS (
  SELECT a.vec_id AS qid, b.vec_id AS nb,
         CAST(sum((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS dist
  FROM q a JOIN q b ON a.dim = b.dim AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
),
topk AS (
  SELECT qid, nb FROM d
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY dist, nb) <= {k}
),
votes AS (
  SELECT t.qid, CAST(e.label AS BIGINT) AS nb_label, count(*) AS c
  FROM topk t JOIN embeddings e ON e.vec_id = t.nb
  GROUP BY 1, 2
),
pred AS (
  SELECT qid, nb_label AS pred FROM votes
  QUALIFY row_number() OVER (PARTITION BY qid
                             ORDER BY c DESC, nb_label) = 1
)
SELECT e.vec_id, CAST(e.label AS BIGINT) AS label, p.pred,
       CAST(CAST(e.label AS BIGINT) = p.pred AS BIGINT) AS correct
FROM embeddings e JOIN pred p ON p.qid = e.vec_id
"""


EXT_QUERIES["knn_classify"] = q_knn_classify
EXT_ORACLES["knn_classify"] = _sql_knn_classify()


# ---------------------------------------------------------------------
# Edit-distance similarity self-join (engine addition; Ed-Join /
# q-gram-filtering lineage, Xiao et al. 2008): the fuzzy-name-matching
# primitive of every record-linkage pipeline — all DISTINCT value
# pairs within Levenshtein distance tau, with NO false negatives.
# ---------------------------------------------------------------------

_EDJ_Q = 2    # q-gram width
_EDJ_TAU = 2  # edit-distance threshold


def _lev_batch(a_list, b_list, tau: int) -> np.ndarray:
    """Exact Levenshtein over a BATCH of string pairs: one DP whose
    cells are vectors across the pair axis (L² ~ a few hundred numpy
    ops per batch, no per-pair python).  Each pair's answer is read
    at its own (len_a, len_b) cell, so ragged lengths need no
    grouping; cells beyond a pair's lengths are never read."""
    p = len(a_list)
    if p == 0:
        return np.empty(0, dtype=np.int64)
    A = np.array(a_list, dtype="U").view(np.uint32).reshape(p, -1)
    B = np.array(b_list, dtype="U").view(np.uint32).reshape(p, -1)
    la = np.array([len(s) for s in a_list], dtype=np.int64)
    lb = np.array([len(s) for s in b_list], dtype=np.int64)
    wb = B.shape[1]
    res = np.zeros(p, dtype=np.int64)
    prev = np.tile(np.arange(wb + 1, dtype=np.int64), (p, 1))
    m0 = la == 0
    res[m0] = lb[m0]
    rows = np.arange(p)
    for i in range(1, A.shape[1] + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, wb + 1):
            sub = prev[:, j - 1] + (ai != B[:, j - 1])
            np.minimum(sub, prev[:, j] + 1, out=sub)
            np.minimum(sub, cur[:, j - 1] + 1, out=sub)
            cur[:, j] = sub
        m = la == i
        if m.any():
            res[m] = cur[m, lb[m]]
        prev = cur
    return res


def q_edit_distance_join(sf_dir: str, tau: int = _EDJ_TAU):
    """All pairs of DISTINCT part names within Levenshtein distance
    ``tau``: (name_a, name_b, dist) with name_a < name_b.

    Completeness (docstring theorem, mirrored by the brute-force
    test): one edit operation destroys at most q of a string's
    DISTINCT q-gram types (only the ≤q windows overlapping the edit
    position can disappear; shifted windows keep their content), so
    ed(a,b) <= tau gives the overlap bound α = |grams(a) ∩ grams(b)|
    >= max(|grams a|, |grams b|) - q·tau.  When α >= 1, the PPJoin
    two-prefix lemma applies (see q_set_similarity_join for the full
    proof): under a common total order (hash), prefixes of length
    |x| - α + 1 per side must intersect, and q·tau + 1 >= |x| - α + 1
    for both sides — so the bucket join finds the pair.  α >= 1 is
    only guaranteed when some side has > q·tau distinct grams;
    strings with <= q·tau distinct grams (short OR highly repetitive
    — at ed 2 with bigrams, 'abcd'/'dbbd' share zero grams)
    therefore post to ONE sentinel bucket as well: a qualifying
    partner either also has <= q·tau grams (both in the sentinel) or
    has more (the lemma applies).  Exact verification makes
    precision 1.

    Scale shape: vocabulary-first (the scale-correct ER move — the
    join runs over DISTINCT values, row fan-in/fan-out stays with the
    caller): distinct = per-block unique + ONE keyed exchange;
    postings carry only prefix grams (q·tau+1 per value); pair
    enumeration reuses make_pairs_partition inside gram buckets with
    a length pre-filter; pair dedupe is one keyed exchange; verify is
    the vectorized batched DP — never a python loop over pairs."""
    from .. import default_num_partitions

    q = _EDJ_Q
    nparts = default_num_partitions()
    names = _read(sf_dir, "part", ["p_name"])

    def local_unique(b: pa.Table) -> pa.Table:
        u = pc.unique(b["p_name"].combine_chunks()
                      if isinstance(b["p_name"], pa.ChunkedArray)
                      else b["p_name"])
        return pa.table({"name": u.drop_null()})

    distinct = names.map_batches(local_unique, batch_format="pyarrow") \
        .repartition(num_blocks=nparts, keys=["name"], sort=False) \
        .map_batches(local_unique_named, batch_format="pyarrow",
                     batch_size=None) \
        .materialize()

    # postings carry the STRINGS as the pair payload (names are short;
    # grams hash to int64 bucket keys — a rare gram-hash collision only
    # MERGES two buckets, adding candidates the verify rejects, never
    # dropping a true pair)
    def postings(b: pa.Table) -> pa.Table:
        empty = pa.table({"block_key": pa.array([], type=pa.int64()),
                          "name": pa.array([], type=pa.string())})
        if b.num_rows == 0:
            return empty
        from ..functions.hashing import hash_str_array

        vals = b["name"].to_pylist()
        plen = q * tau + 1
        keys, ns = [], []
        gram_strs, gram_doc = [], []
        for d, s in enumerate(vals):
            gs = {s[i:i + q] for i in range(len(s) - q + 1)}
            gram_strs.extend(gs)
            gram_doc.extend([d] * len(gs))
            if len(gs) <= q * tau:
                # the prefix lemma needs max(|grams a|,|grams b|) >
                # q*tau (else the pair may share ZERO grams — e.g.
                # 'abcd'/'dbbd' at ed 2); low-diversity strings post
                # to ONE sentinel bucket too.  A qualifying partner
                # either also has <= q*tau grams (both in the
                # sentinel) or has more (the lemma applies).
                keys.append(-1)
                ns.append(s)
        if gram_strs:
            h = hash_str_array(np.array(gram_strs, dtype=object)) \
                .astype(np.int64, copy=False)
            gd = np.array(gram_doc, dtype=np.int64)
            order = np.lexsort((h, gd))
            gd, h = gd[order], h[order]
            starts = np.flatnonzero(np.r_[True, gd[1:] != gd[:-1]])
            sizes = np.diff(np.r_[starts, len(gd)])
            rank = np.arange(len(gd)) - np.repeat(starts, sizes)
            keep = rank < plen
            keys.extend(h[keep].tolist())
            ns.extend(vals[d] for d in gd[keep])
        return pa.table({"block_key": pa.array(keys, type=pa.int64()),
                         "name": pa.array(ns, type=pa.string())})

    post = distinct.map_batches(postings, batch_format="pyarrow")

    def enumerate_pairs(b: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], type=pa.string()),
                          "b": pa.array([], type=pa.string())})
        if b.num_rows == 0:
            return empty
        k = b["block_key"].to_numpy(zero_copy_only=False)
        v = np.array(b["name"].to_pylist(), dtype=object)
        order = np.lexsort((v.astype("U"), k))
        k, v = k[order], v[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        sizes = np.diff(np.r_[starts, len(k)])
        a_out, b_out = [], []
        for s, n in zip(starts, sizes):
            if n < 2:
                continue
            grp = v[s:s + n]
            lens = np.array([len(x) for x in grp], dtype=np.int64)
            ii, jj = np.triu_indices(n, k=1)
            lf = np.abs(lens[ii] - lens[jj]) <= tau
            dup = grp[ii[lf]] != grp[jj[lf]]  # same name in one bucket
            a_out.append(grp[ii[lf]][dup])
            b_out.append(grp[jj[lf]][dup])
        if not a_out:
            return empty
        return pa.table({"a": pa.array(np.concatenate(a_out)),
                         "b": pa.array(np.concatenate(b_out))})

    pairs = post.repartition(num_blocks=nparts, keys=["block_key"],
                             sort=False) \
        .map_batches(enumerate_pairs, batch_format="pyarrow",
                     batch_size=None) \
        .repartition(num_blocks=nparts, keys=["a", "b"], sort=False) \
        .map_batches(_dedup_str_pairs, batch_format="pyarrow",
                     batch_size=None)

    def verify(b: pa.Table) -> pa.Table:
        empty = pa.table({"name_a": pa.array([], type=pa.string()),
                          "name_b": pa.array([], type=pa.string()),
                          "dist": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        a = b["a"].to_pylist()
        bb = b["b"].to_pylist()
        d = _lev_batch(a, bb, tau)
        m = d <= tau
        return pa.table({"name_a": pa.array(np.array(a, dtype=object)[m]),
                         "name_b": pa.array(np.array(bb, dtype=object)[m]),
                         "dist": pa.array(d[m], type=pa.int64())})

    return pairs.map_batches(verify, batch_format="pyarrow")


def local_unique_named(b: pa.Table) -> pa.Table:
    """Per-partition distinct of the single `name` column (runs after
    the keyed exchange, so partition-local unique IS global)."""
    col = b["name"]
    u = pc.unique(col.combine_chunks()
                  if isinstance(col, pa.ChunkedArray) else col)
    return pa.table({"name": u.drop_null()})


def _dedup_str_pairs(b: pa.Table) -> pa.Table:
    """Keyed-partition (a, b) string-pair dedupe."""
    if b.num_rows == 0:
        return pa.table({"a": pa.array([], type=pa.string()),
                         "b": pa.array([], type=pa.string())})
    a = np.array(b["a"].to_pylist(), dtype="U")
    bb = np.array(b["b"].to_pylist(), dtype="U")
    order = np.lexsort((bb, a))
    a, bb = a[order], bb[order]
    keep = np.ones(len(a), dtype=bool)
    keep[1:] = (a[1:] != a[:-1]) | (bb[1:] != bb[:-1])
    return pa.table({"a": pa.array(a[keep]), "b": pa.array(bb[keep])})


SQL_EDIT_DISTANCE_JOIN = f"""
WITH n AS (SELECT DISTINCT p_name AS name FROM part
           WHERE p_name IS NOT NULL)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM n a JOIN n b ON a.name < b.name
WHERE levenshtein(a.name, b.name) <= {_EDJ_TAU}
"""


EXT_QUERIES["edit_distance_join"] = q_edit_distance_join
EXT_ORACLES["edit_distance_join"] = SQL_EDIT_DISTANCE_JOIN


# offline corpus-build DAG (≙ preprocess_all.py entry point): the end
# artifact (PEM over synthesized anchor pages) is oracle-checked
from .offline_build import SQL_OFFLINE_PEM, q_offline_pem  # noqa: E402

EXT_QUERIES["offline_pem"] = q_offline_pem
EXT_ORACLES["offline_pem"] = SQL_OFFLINE_PEM

# benchmark-file readers (S5/S6) + collation (M9) live in their own
# module; all are oracle-checked
try:
    from .queries_readers import READER_ORACLES, READER_QUERIES  # noqa: E402

    EXT_QUERIES.update(READER_QUERIES)
    EXT_ORACLES.update(READER_ORACLES)
except ImportError as _e:
    # tolerate ONLY the circular re-entry (see the queries_webtext
    # guard below); queries_readers completes its own registration
    from .queries import _mid_import

    if not (getattr(_e, "name", None) and _mid_import(_e.name)):
        raise

# webtext corpus-hygiene ops (PII redaction, canonical-URL dedup,
# global line dedup, near-dup keep, heavy hitters, bloom decontam,
# shard packing, corpus_clean)
try:
    from .queries_webtext import WEBTEXT_ORACLES, WEBTEXT_QUERIES  # noqa: E402

    EXT_QUERIES.update(WEBTEXT_QUERIES)
    EXT_ORACLES.update(WEBTEXT_ORACLES)
except ImportError as _e:
    # tolerate ONLY the circular re-entry (a worker unpickling one of
    # queries_webtext's UDFs imports it first, which re-enters this
    # module mid-import; it completes the registration itself at the
    # end of its body) — a genuine import failure must not silently
    # shrink the catalog
    from .queries import _mid_import

    if not (getattr(_e, "name", None) and _mid_import(_e.name)):
        raise

# complete the catalog registration for the queries_ext-first import
# order (queries.py skips its own update when this module is mid-import)
from .queries import QUERIES as _QUERIES  # noqa: E402

for _k, _v in EXT_QUERIES.items():
    _QUERIES.setdefault(_k, _v)
