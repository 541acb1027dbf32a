"""The engine's query catalog: every operator from SURVEY.md §2 exposed
as a callable ``(sf_dir) -> Dataset/DataFrame/Table`` plus, where
expressible, the exact ANSI-SQL oracle DuckDB runs on the same tables.

Contract (driver correctness gate): the Ray result and the SQL oracle
must match on row count, schema and order-insensitive value hash —
column NAMES and TYPES must agree, float columns are rounded the same
way on both sides, and every threshold comparison is made on a value
both engines compute exactly (integer-derived rationals) wherever
possible.

Reference parity notes cite /root/reference file:line per SURVEY.md §2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenize import STOPWORDS, TOKEN_SQL

_STOP_SQL = "(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"


def _canon_round(col, digits: int) -> pa.Array:
    """Canonicalize a float column to the double nearest its fixed-point
    decimal rendering.  ``round()`` is NOT a cross-engine canonical form:
    pyarrow/numpy/DuckDB each introduce their own last-ulp error when
    scaling, so two sums differing by 1e-14 can round to two different
    doubles.  Routing through the decimal STRING (%.Nf) is exact on both
    sides — the SQL twin is ``CAST(printf('%.Nf', x) AS DOUBLE)``."""
    vals = col.to_pylist() if not isinstance(col, (list, np.ndarray)) else col
    return pa.array([None if v is None else float(f"{v:.{digits}f}") for v in vals],
                    type=pa.float64())


def _sql_round(expr: str, digits: int) -> str:
    return f"CAST(printf('%.{digits}f', {expr}) AS DOUBLE)"


def _read(sf_dir: str, table: str, columns=None):
    from .. import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _empty_guard(sf_dir: str, tables, schema: dict):
    """Typed-empty short-circuit when any input table has zero rows.

    An empty read feeds SCHEMALESS blocks into downstream shuffles and
    joins (the zero-column trap — see scrub_empty_blocks), map UDFs
    are never invoked to repair them, and driver-side folds divide by
    zero — so operators whose oracle returns 0 rows on an empty corpus
    short-circuit here instead.  Costs one parquet FOOTER read per
    table (row count is metadata; no data is scanned; a directory
    counts its fragment footers).  Returns the typed-empty Dataset, or
    None when every input has rows."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    for t in ([tables] if isinstance(tables, str) else tables):
        path = f"{sf_dir}/{t}.parquet"
        if _os.path.isdir(path):
            n = sum(_pq.read_metadata(f).num_rows
                    for f in _glob.glob(_os.path.join(path, "*.parquet")))
        else:
            n = _pq.read_metadata(path).num_rows
        if n == 0:
            import ray.data as rd

            return rd.from_arrow(pa.table(
                {name: pa.array([], type=typ)
                 for name, typ in schema.items()}))
    return None


# =====================================================================
# Relational core: aggregations, joins, sort/limit, filters, windows
# =====================================================================


def _presum_groupby(ds, keys, *, sums=(), count=None, num_partitions=2):
    """Grouped sum/count with a PARTIAL per-block combine: every Arrow
    batch first collapses to its in-block groups via the C++ hash
    aggregator (``pa.Table.group_by``), then a SMALL hash shuffle
    (``num_partitions``) merges the partials.

    This is the 'pre-aggregate inside map_batches before a groupby'
    pattern the 100-TB plan mandates: the shuffle payload drops from
    row count to blocks × in-block groups, and the aggregator pool
    from one-per-CPU (the engine default, right for wide shuffles) to
    a handful — measured 4.6 s → sub-second for the 6-group lineitem
    aggregate at sf0.1, which was pure actor spin-up.  Size
    ``num_partitions`` to the OUTPUT group count, not the input rows:
    partials bound each block's contribution regardless of data size.

    ``sums``: iterable of (source_col, out_name); ``count``: out_name
    for a row count.  Output columns carry the final names already, so
    callers' oracle column names line up.

    Caveat: the partial count is ``count(keys[0])`` (non-null), so rows
    with a NULL first key are not counted — matching SQL ``count(*)``
    GROUP BY semantics only when keys are non-null, which every caller
    here guarantees.
    """
    from ray.data.aggregate import Sum

    keys = list(keys)
    sums = list(sums)

    def partial(b: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c, _ in sums]
        if count is not None:
            aggs.append((keys[0], "count"))
        g = b.group_by(keys).aggregate(aggs)
        cols = {k: g[k] for k in keys}
        for c, out in sums:
            cols[out] = g[f"{c}_sum"]
        if count is not None:
            cols[count] = g[f"{keys[0]}_count"].cast(pa.int64())
        return pa.table(cols)

    reduced = ds.map_batches(partial, batch_format="pyarrow")
    finals = [Sum(out, alias_name=out) for _, out in sums]
    if count is not None:
        finals.append(Sum(count, alias_name=count))
    return reduced.groupby(keys, num_partitions=num_partitions).aggregate(*finals)


def q_lineitem_agg(sf_dir: str):
    """≙ A4/A5 metric-style grouped aggregation (metrics.py:22-36).
    Six output groups → partial combine + 2-partition merge."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])
    out = _presum_groupby(
        ds, ["l_returnflag", "l_linestatus"],
        sums=[("l_quantity", "sum_qty"), ("l_extendedprice", "sum_price")],
        count="n_rows", num_partitions=2)

    def _round(b: pa.Table) -> pa.Table:
        return b.set_column(b.schema.get_field_index("sum_qty"), "sum_qty", _canon_round(b["sum_qty"], 4)) \
                .set_column(b.schema.get_field_index("sum_price"), "sum_price", _canon_round(b["sum_price"], 4))

    return out.map_batches(_round, batch_format="pyarrow")


SQL_LINEITEM_AGG = f"""
SELECT l_returnflag, l_linestatus,
       {_sql_round("sum(l_quantity)", 4)}      AS sum_qty,
       {_sql_round("sum(l_extendedprice)", 4)} AS sum_price,
       count(*)                                AS n_rows
FROM lineitem GROUP BY 1, 2
"""


def q_top_customers(sf_dir: str):
    """Join + grouped sum + global top-k (≙ J7 join, O2 top-k)."""
    from ray.data.aggregate import Sum

    from .. import default_num_partitions

    empty = _empty_guard(sf_dir, ["orders", "customer"],
                         {"c_custkey": pa.int64(),
                          "c_name": pa.string(),
                          "revenue": pa.float64()})
    if empty is not None:
        return empty

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    rev = orders.groupby("o_custkey").aggregate(Sum("o_totalprice", alias_name="revenue"))
    joined = rev.join(cust, join_type="inner", num_partitions=default_num_partitions(),
                      on=("o_custkey",), right_on=("c_custkey",))
    top = joined.sort(["revenue", "o_custkey"], descending=[True, False]).limit(10)

    def _fmt(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b["o_custkey"],
            "c_name": b["c_name"],
            "revenue": _canon_round(b["revenue"], 4),
        })

    return top.map_batches(_fmt, batch_format="pyarrow")


SQL_TOP_CUSTOMERS = f"""
SELECT c_custkey, c_name, {_sql_round("sum(o_totalprice)", 4)} AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
ORDER BY sum(o_totalprice) DESC, c_custkey
LIMIT 10
"""


def q_events_by_type(sf_dir: str):
    """Timestamp filter + grouped count/sum (≙ M17 filters, A7 histogram)."""
    from datetime import datetime

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    cutoff = pa.scalar(datetime(2024, 1, 15), type=pa.timestamp("us"))

    def _filter(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["ts"], cutoff))

    filtered = ds.map_batches(_filter, batch_format="pyarrow")
    out = _presum_groupby(filtered, ["event_type"],
                          sums=[("value", "total_value")],
                          count="n_events", num_partitions=2)

    def _round(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("total_value")
        return b.set_column(i, "total_value", _canon_round(b["total_value"], 4))

    return out.map_batches(_round, batch_format="pyarrow")


SQL_EVENTS_BY_TYPE = f"""
SELECT event_type, count(*) AS n_events, {_sql_round("sum(value)", 4)} AS total_value
FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
GROUP BY 1
"""


def q_part_topk(sf_dir: str):
    """Global sort + limit (≙ O1/O2 top-k truncation)."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
    return ds.sort(["p_retailprice", "p_partkey"], descending=[True, False]).limit(15)


SQL_PART_TOPK = """
SELECT p_partkey, p_name, p_retailprice
FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 15
"""


def q_supplier_per_region(sf_dir: str):
    """Join chain across 3 tables + grouped count (≙ J2 2-step chain)."""
    from ray.data.aggregate import Count

    empty = _empty_guard(sf_dir, ["supplier", "nation", "region"],
                         {"r_name": pa.string(),
                          "n_suppliers": pa.int64()})
    if empty is not None:
        return empty

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    j = sup.join(nat, join_type="inner", num_partitions=2, on=("s_nationkey",), right_on=("n_nationkey",))
    j = j.join(reg, join_type="inner", num_partitions=2, on=("n_regionkey",), right_on=("r_regionkey",))
    return j.groupby("r_name").aggregate(Count(alias_name="n_suppliers"))


SQL_SUPPLIER_PER_REGION = """
SELECT r_name, count(*) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
"""


def q_user_sessions(sf_dir: str):
    """Sessionization: per-user 30-min-gap session count (≙ the engine's
    windowed/ordered-state operator; reference has only doc-local state,
    SURVEY §2.9 — this is the Ray-native generalization).

    Scale shape: ONE keyed repartition co-locates each user, then a
    single lexsort/segment pass per partition counts session starts
    (first event per user, or gap > 30 min) — no per-group pandas, no
    per-user Python invocation (round-2 verdict: the map_groups version
    is millions of calls at 100× key cardinality)."""
    from .. import default_num_partitions

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    parted = ds.repartition(num_blocks=default_num_partitions(),
                            keys=["user_id"], sort=False)

    def sessions_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n_sessions": pa.array([], type=pa.int64())})
        u = b["user_id"].to_numpy(zero_copy_only=False)
        t64 = b["ts"].to_numpy(zero_copy_only=False)  # datetime64[native unit]
        # window math in the column's NATIVE unit (a cast mis-scales
        # int64 views and truncates sub-unit boundaries vs the oracle)
        unit = np.datetime_data(t64.dtype)[0]
        gap_thresh = np.int64(30 * 60) * {"s": 1, "ms": 10**3,
                                          "us": 10**6, "ns": 10**9}[unit]
        t = t64.view(np.int64)
        e = b["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u, t = u[order], t[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        is_start = new_user.copy()
        is_start[1:] |= (t[1:] - t[:-1]) > gap_thresh
        starts = np.flatnonzero(new_user)
        n_sessions = np.add.reduceat(is_start.astype(np.int64), starts)
        return pa.table({"user_id": pa.array(u[starts], type=pa.int64()),
                         "n_sessions": pa.array(n_sessions, type=pa.int64())})

    return parted.map_batches(sessions_part, batch_format="pyarrow",
                              batch_size=None)


SQL_USER_SESSIONS = """
WITH e AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT user_id,
       CAST(sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM e GROUP BY 1
"""


def q_events_hourly(sf_dir: str):
    """Hour-window aggregate (tumbling window as derived-key groupby).

    Deliberately NOT ``_presum_groupby``: events are unordered, so a
    9k-row block holds ~9k distinct (user, hour) groups and the
    partial combine is pure overhead (measured 14 s vs 7.5 s direct at
    sf0.1).  The partial pattern needs in-block key locality — use it
    for low-cardinality keys or key-clustered inputs only."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def add_hour(b: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(b["ts"], unit="hour").cast(pa.timestamp("us"))
        return b.append_column("hour", hour).drop_columns(["ts"])

    keyed = ds.map_batches(add_hour, batch_format="pyarrow")
    out = keyed.groupby(["user_id", "hour"], num_partitions=16).aggregate(
        Count(alias_name="n_events"), Sum("value", alias_name="total_value")
    )

    def _round(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            # pin the empty-batch schema: the hash aggregate emits
            # zero-schema empty blocks, which otherwise trigger
            # "RefBundle with a different schema" warnings downstream
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "hour": pa.array([], type=pa.timestamp("us")),
                             "n_events": pa.array([], type=pa.int64()),
                             "total_value": pa.array([], type=pa.float64())})
        i = b.schema.get_field_index("total_value")
        hi = b.schema.get_field_index("hour")
        b = b.set_column(hi, "hour", b["hour"].cast(pa.timestamp("us")))
        return b.set_column(i, "total_value", _canon_round(b["total_value"], 4))

    return out.map_batches(_round, batch_format="pyarrow")


SQL_EVENTS_HOURLY = f"""
SELECT user_id, date_trunc('hour', ts) AS hour,
       count(*) AS n_events, {_sql_round("sum(value)", 4)} AS total_value
FROM events GROUP BY 1, 2
"""


# =====================================================================
# Text analysis over `documents` (token stats, quality, langid, dedup)
# =====================================================================


def q_doc_token_stats(sf_dir: str):
    """≙ token counting / quality counters (engine addition; tokenizer
    contract matches functions/tokenize.py <-> TOKEN_SQL)."""
    from ..functions.textstats import token_stats_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(b: pa.Table) -> pa.Table:
        s = token_stats_batch(b["text"].to_pylist())
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tokens": pa.array(s["n_tokens"], type=pa.int64()),
            "n_chars": pa.array(s["n_chars"], type=pa.int64()),
            "n_unique_tokens": pa.array(s["n_unique_tokens"], type=pa.int64()),
            "n_stopwords": pa.array(s["n_stopwords"], type=pa.int64()),
            "stopword_ratio": pa.array(s["stopword_ratio"], type=pa.float64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


_TOKS = TOKEN_SQL.format(col="text")
SQL_DOC_TOKEN_STATS = f"""
WITH s AS (
  SELECT doc_id,
         len({_TOKS}) AS n_tokens,
         length(text) AS n_chars,
         len(list_distinct({_TOKS})) AS n_unique_tokens,
         len(list_filter({_TOKS}, t -> t IN {_STOP_SQL})) AS n_stopwords
  FROM documents
)
SELECT doc_id, n_tokens, n_chars, n_unique_tokens, n_stopwords,
       CASE WHEN n_tokens = 0 THEN 0.0
            ELSE n_stopwords / CAST(n_tokens AS DOUBLE) END AS stopword_ratio
FROM s
"""


def q_doc_quality(sf_dir: str):
    """Quality scoring (C4/Gopher-shaped heuristic, engine addition)."""
    from ..functions.textstats import quality_score_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def quality(b: pa.Table) -> pa.Table:
        q = quality_score_batch(b["text"].to_pylist())
        return pa.table({
            "doc_id": b["doc_id"],
            "quality": _canon_round(list(q), 6),
        })

    return ds.map_batches(quality, batch_format="pyarrow")


_QUALITY_EXPR = (
    "(least(nt / 50.0, 1.0)"
    " + least((CASE WHEN nt = 0 THEN 0.0 ELSE ns / CAST(nt AS DOUBLE) END) * 5.0, 1.0)"
    " + (CASE WHEN nt = 0 THEN 0.0 ELSE nu / CAST(nt AS DOUBLE) END)) / 3.0"
)
SQL_DOC_QUALITY = f"""
WITH s AS (
  SELECT doc_id,
         len({_TOKS}) AS nt,
         len(list_distinct({_TOKS})) AS nu,
         len(list_filter({_TOKS}, t -> t IN {_STOP_SQL})) AS ns
  FROM documents
)
SELECT doc_id,
       {_sql_round(_QUALITY_EXPR, 6)} AS quality
FROM s
"""


def q_doc_langid(sf_dir: str):
    """Language-ID heuristic (marker-token argmax; engine addition)."""
    from ..functions.textstats import langid_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def lang(b: pa.Table) -> pa.Table:
        codes, _ = langid_batch(b["text"].to_pylist())
        return pa.table({"doc_id": b["doc_id"], "lang_pred": pa.array(list(codes), type=pa.string())})

    return ds.map_batches(lang, batch_format="pyarrow")


def _marker_sql(lang_markers: dict) -> dict:
    return {k: "(" + ", ".join(f"'{w}'" for w in sorted(v)) + ")" for k, v in lang_markers.items()}


def _sql_doc_langid() -> str:
    from ..functions.textstats import LANG_MARKERS

    m = _marker_sql(LANG_MARKERS)
    # argmax with ties resolved in dict order en,de,fr,es; all-zero -> 'und'
    return f"""
WITH c AS (
  SELECT doc_id,
         len(list_filter({_TOKS}, t -> t IN {m['en']})) AS c_en,
         len(list_filter({_TOKS}, t -> t IN {m['de']})) AS c_de,
         len(list_filter({_TOKS}, t -> t IN {m['fr']})) AS c_fr,
         len(list_filter({_TOKS}, t -> t IN {m['es']})) AS c_es
  FROM documents
)
SELECT doc_id,
       CASE WHEN c_en = 0 AND c_de = 0 AND c_fr = 0 AND c_es = 0 THEN 'und'
            WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
            WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
            WHEN c_fr >= c_es THEN 'fr'
            ELSE 'es' END AS lang_pred
FROM c
"""


def q_exact_dedup(sf_dir: str):
    """Exact dedup: hash-partition by content hash, keep min id per
    group (≙ D1 unique-by-key, general_utils.py:61-67)."""
    from ray.data.aggregate import Count, Min

    from ..functions.hashing import md5_hex

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def key(b: pa.Table) -> pa.Table:
        return pa.table({
            "content_key": pa.array(md5_hex(b["text"].to_pylist()), type=pa.string()),
            "doc_id": b["doc_id"],
        })

    return ds.map_batches(key, batch_format="pyarrow").groupby("content_key").aggregate(
        Min("doc_id", alias_name="keeper_doc_id"), Count(alias_name="n_copies")
    )


SQL_EXACT_DEDUP = """
SELECT md5(text) AS content_key, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
FROM documents GROUP BY 1
"""


def q_pem_table(sf_dir: str):
    """PEM build: P(entity|mention) via ONE surface-keyed exchange + a
    vectorized segment pass per partition (≙ A1, generate_pem.py:72-164
    — the reference's one true wide shuffle, done distributed here).
    mention = token (distinct per doc), entity = source.

    Scale shape: the reference's PEM has ~18M surfaces; round 1 ran a
    hash aggregate THEN millions of per-group pandas calls.  This
    version hash-partitions the exploded (surface, entity) rows once,
    then counts + normalizes in a single lexsort/reduceat pass per
    partition (the pattern measured 17× faster in stages/pairs.py).
    Sort keys are hash-primary so string comparisons only break ties.
    The exchange + segment pass live in stages/pem.py (shared with the
    offline corpus-build DAG)."""
    from ..functions.tokenize import tokenize_batch
    from ..stages.pem import pem_from_pairs

    ds = _read(sf_dir, "documents", ["source", "text"])

    def explode(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        sources = b["source"].to_pylist()
        flat, starts = tokenize_batch(texts)
        surf, ent = [], []
        for i, src in enumerate(sources):
            for t in set(flat[starts[i]:starts[i + 1]]):
                surf.append(t)
                ent.append(src)
        return pa.table({"surface": pa.array(surf, type=pa.string()),
                         "entity": pa.array(ent, type=pa.string())})

    return pem_from_pairs(ds.map_batches(explode, batch_format="pyarrow"))


SQL_PEM_TABLE = f"""
WITH toks AS (
  SELECT source AS entity, unnest(list_distinct({_TOKS})) AS surface FROM documents
)
SELECT surface, entity, count(*) AS cnt,
       count(*) / CAST(sum(count(*)) OVER (PARTITION BY surface) AS DOUBLE) AS prob
FROM toks GROUP BY 1, 2
"""


def q_mention_phrases(sf_dir: str):
    """Mention detection lite: maximal runs of >=2 consecutive
    non-stopword tokens (≙ M10 BIO decode -> spans shape: contiguous
    tag runs to phrases; T6 standalone MD role)."""
    from ..functions.tokenize import STOPWORD_SET, tokenize_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def phrases(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        ids = b["doc_id"].to_pylist()
        flat, starts = tokenize_batch(texts)
        out_id, out_surface = [], []
        for i, did in enumerate(ids):
            toks = flat[starts[i]:starts[i + 1]]
            run: list[str] = []
            for t in toks + [None]:  # sentinel flushes final run
                if t is not None and t not in STOPWORD_SET:
                    run.append(t)
                else:
                    if len(run) >= 2:
                        out_id.append(did)
                        out_surface.append(" ".join(run))
                    run = []
        return pa.table({"doc_id": pa.array(out_id, type=pa.int64()),
                         "surface": pa.array(out_surface, type=pa.string())})

    return ds.map_batches(phrases, batch_format="pyarrow")


SQL_MENTION_PHRASES = f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS}) AS tok,
         unnest(range(1, len({_TOKS}) + 1)) AS ord
  FROM documents
), flagged AS (
  SELECT doc_id, tok, ord,
         CASE WHEN tok IN {_STOP_SQL} THEN 1 ELSE 0 END AS stp
  FROM t
), islands AS (
  SELECT doc_id, tok, ord,
         ord - row_number() OVER (PARTITION BY doc_id, stp ORDER BY ord) AS island
  FROM flagged WHERE stp = 0
)
SELECT doc_id, string_agg(tok, ' ' ORDER BY ord) AS surface
FROM islands GROUP BY doc_id, island HAVING count(*) >= 2
"""


# =====================================================================
# Near-duplicate detection + ER over `documents` (oracle-checkable)
# =====================================================================


def _doc_sign(sf_dir: str, shingle_k: int):
    """documents -> (doc_id, sig binary, set binary (sorted distinct
    shingle hashes), n_distinct) payload Dataset."""
    from ..functions.minhash import minhash_signatures, shingle_hashes
    from ..functions.tokenize import tokenize_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def sign(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        flat, starts = tokenize_batch(texts)
        sh, shs = shingle_hashes(flat, starts, k=shingle_k)
        sig = minhash_signatures(sh, shs)
        n = len(texts)
        sets = [np.unique(sh[shs[i]:shs[i + 1]]) for i in range(n)]
        return pa.table({
            "doc_id": b["doc_id"],
            "sig": pa.array([sig[i].tobytes() for i in range(n)], type=pa.binary()),
            "set": pa.array([s.tobytes() for s in sets], type=pa.binary()),
            "n_distinct": pa.array([len(s) for s in sets], type=pa.int64()),
        })

    return ds.map_batches(sign, batch_format="pyarrow")


def _neardup_pairs(sf_dir: str, shingle_k: int, threshold: float, num_bands: int):
    """LSH candidates -> exact set-Jaccard verification.

    Exactness: with r = 128/num_bands rows per band, a pair at J >= t
    is missed w.p. (1-t^r)^num_bands — at the thresholds used here
    < 1e-8, and the verification Jaccard itself is exact integer math,
    so the result equals the all-pairs SQL oracle.
    """
    from .. import default_num_partitions
    from ..functions.minhash import band_keys
    from ..stages.pairs import make_pairs_partition

    payload = _doc_sign(sf_dir, shingle_k).materialize()

    def emit(b: pa.Table) -> pa.Table:
        n = b.num_rows
        sig = np.frombuffer(b"".join(b["sig"].to_pylist()), dtype="<u8").reshape(n, -1)
        bands = band_keys(sig, num_bands)
        return pa.table({
            "block_key": pa.array(bands.ravel().view(np.int64), type=pa.int64()),
            "page_id": pa.array(np.repeat(b["doc_id"].to_numpy(zero_copy_only=False), num_bands),
                                type=pa.int64()),
        })

    # sort=False on both exchanges: the partition fns sort internally,
    # and Ray's hash-shuffle finalize sort_by() crashes on the
    # zero-column blocks it synthesizes for EMPTY partitions (reproduced
    # with a 4-doc corpus producing zero pairs).
    nparts = default_num_partitions()
    blocks = payload.map_batches(emit, batch_format="pyarrow") \
                    .repartition(num_blocks=nparts, keys=["block_key"], sort=False)
    pairs = blocks.map_batches(
        lambda t: make_pairs_partition(t, max_block_size=1 << 30), batch_format="pyarrow",
        batch_size=None,  # whole-block batches: a block IS the partition
    ).select_columns(["a", "b"]) \
     .repartition(num_blocks=nparts, keys=["a", "b"], sort=False)

    pairs = pairs.map_batches(_dedup_ab, batch_format="pyarrow", batch_size=None).materialize()

    return payload, _verify_pairs(payload, pairs, threshold, nparts)


def _dedup_ab(b: pa.Table) -> pa.Table:
    """Keyed-partition (a, b) pair dedupe (shared by the LSH and
    prefix-filter candidate generators)."""
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


def _verify_pairs(payload, pairs, threshold: float, nparts: int):
    """Deduped candidate (a, b) pairs -> exact-Jaccard-verified
    (doc_a, doc_b, jaccard >= threshold) via two co-partitioned joins
    against the payload's sorted-hash sets.  Shared by the LSH and
    prefix-filter paths."""

    # Fully-empty candidate set (no collisions at all): Ray's hash
    # join synthesizes zero-column blocks for an empty input dataset and
    # acero rejects the key reference — short-circuit.  count() on a
    # materialized dataset is metadata, not recompute.
    if pairs.count() == 0:
        import ray.data as rd

        empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                          "doc_b": pa.array([], type=pa.int64()),
                          "jaccard": pa.array([], type=pa.float64())})
        return rd.from_arrow(empty)

    from .. import scrub_empty_blocks

    side = payload.select_columns(["doc_id", "set", "n_distinct"])
    a_side = side.rename_columns({"doc_id": "a", "set": "set_a", "n_distinct": "na"})
    b_side = side.rename_columns({"doc_id": "b", "set": "set_b", "n_distinct": "nb"})
    # scrub zero-column empty blocks between the chained joins — the
    # engine-wide contract (scrub_empty_blocks): sparse pair sets leave
    # unpopulated join partitions whose schemaless empties flakily
    # crash the SECOND join's finalization
    pairs = scrub_empty_blocks(pairs)
    enriched = scrub_empty_blocks(
        pairs.join(a_side, join_type="inner", num_partitions=nparts,
                   on=("a",)).materialize())
    enriched = enriched.join(b_side, join_type="inner", num_partitions=nparts, on=("b",)).materialize()

    def verify(b: pa.Table) -> pa.Table:
        """Exact set-Jaccard via the shared vectorized kernel
        (functions/arrowbuf.exact_jaccard_pairs) — zero-copy offset
        math, no per-cell .as_py()."""
        from ..functions.arrowbuf import exact_jaccard_pairs

        if b.num_rows == 0:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64()),
                             "jaccard": pa.array([], type=pa.float64())})
        j = exact_jaccard_pairs(b["set_a"], b["set_b"])
        a_ids = b["a"].to_numpy(zero_copy_only=False)
        b_ids = b["b"].to_numpy(zero_copy_only=False)
        m = j >= threshold
        return pa.table({"doc_a": pa.array(a_ids[m], type=pa.int64()),
                         "doc_b": pa.array(b_ids[m], type=pa.int64()),
                         "jaccard": pa.array(j[m], type=pa.float64())})

    return enriched.map_batches(verify, batch_format="pyarrow")


def q_set_similarity_join(sf_dir: str, num: int = 7, den: int = 10):
    """EXACT set-similarity self-join via AllPairs/PPJoin prefix
    filtering (Bayardo et al. 2007 lineage; distributed form after the
    set-similarity-join family in PAPERS.md): every document pair with
    3-token-shingle Jaccard >= num/den.  Unlike the MinHash-LSH path
    (`neardup_shingle`) this has NO false negatives by construction.

    Prefix-filter completeness (the PPJoin two-prefix lemma — both
    sides post only prefixes, so the shared element must lie in BOTH):
    order every doc's distinct shingles by one GLOBAL total order
    (ascending document frequency, ties by hash) and post the first
    p_X = |X| - ceil(t·|X|) + 1 of each doc X.  J(A,B) >= t gives the
    integer overlap α = |A∩B| >= ceil(t·max(|A|,|B|)) (|A∪B| >= max),
    so p_X >= |X| - α + 1 for both sides.  Suppose the prefixes were
    disjoint; wlog the last prefix element of A precedes B's in the
    global order.  Then every element of A∩B lies strictly after A's
    prefix (common elements inside A's prefix would precede B's
    prefix end, hence — being in B and before B's prefix boundary —
    sit in B's prefix too, contradicting disjointness), so
    α <= |A| - p_A = ceil(t·|A|) - 1 < α.  Contradiction — the
    prefixes intersect, the bucket join finds the pair, and exact
    verification makes precision 1.  Completeness holds for ANY total
    order, so the engine orders by (df, shingle HASH) while the SQL
    oracle verifies against the full all-pairs join over shingle
    strings.  ceil(t*n) is computed in integers ((num*n + den-1) //
    den): float t*n rounds the wrong way at exact multiples (0.7*10
    is 7.000000000000001 in doubles).

    Scale shape: df build = per-batch partial counts + ONE hash-keyed
    exchange (vocabulary rows, never shingle instances); df attach =
    co-partitioned join on hash; prefix selection = ONE doc-keyed
    exchange + the segment kernel; posting-list pair enumeration,
    pair dedupe and exact verify REUSE the LSH pair machinery
    (make_pairs_partition runs uncapped here — a pair cap would trade
    away the exactness guarantee; production callers can lower it and
    get the `capped` flag).  Prefix postings are naturally small: the
    prefix keeps each doc's RAREST shingles, so hot shingles almost
    never enter postings."""
    from .. import default_num_partitions
    from ..stages.pairs import make_pairs_partition

    threshold = num / den
    payload = _doc_sign(sf_dir, 3).materialize()
    nparts = default_num_partitions()

    if payload.count() == 0:
        # empty corpus: the df-attach join would see the empty read's
        # schemaless blocks (the zero-column trap) — short-circuit
        # with the oracle's 0-row result
        import ray.data as rd

        return rd.from_arrow(pa.table(
            {"doc_a": pa.array([], type=pa.int64()),
             "doc_b": pa.array([], type=pa.int64()),
             "jaccard": pa.array([], type=pa.float64())}))

    def explode(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"h": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        sets = [np.frombuffer(x, dtype=np.uint64) for x in b["set"].to_pylist()]
        lens = np.array([len(x) for x in sets], dtype=np.int64)
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (np.concatenate(sets) if sets
             else np.empty(0, dtype=np.uint64)).view(np.int64)
        return pa.table({"h": pa.array(h, type=pa.int64()),
                         "doc_id": pa.array(np.repeat(ids, lens), type=pa.int64()),
                         "n": pa.array(np.repeat(lens, lens), type=pa.int64())})

    postings = payload.map_batches(explode, batch_format="pyarrow")

    def df_partial(b: pa.Table) -> pa.Table:
        h = b["h"].to_numpy(zero_copy_only=False)
        u, c = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(u, type=pa.int64()),
                         "df": pa.array(c.astype(np.int64), type=pa.int64())})

    def df_fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"h": pa.array([], type=pa.int64()),
                             "df": pa.array([], type=pa.int64())})
        h = b["h"].to_numpy(zero_copy_only=False)
        c = b["df"].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h, c = h[order], c[order]
        seg = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        return pa.table({"h": pa.array(h[seg], type=pa.int64()),
                         "df": pa.array(np.add.reduceat(c, seg).astype(np.int64),
                                        type=pa.int64())})

    from .. import scrub_empty_blocks

    # df went through a keyed shuffle — scrub the zero-column empty
    # blocks of unpopulated partitions before feeding a hash join
    # (the engine-wide contract; see scrub_empty_blocks)
    df = scrub_empty_blocks(
        postings.map_batches(df_partial, batch_format="pyarrow")
        .repartition(num_blocks=nparts, keys=["h"], sort=False)
        .map_batches(df_fold, batch_format="pyarrow", batch_size=None)
        .materialize())

    enriched = postings.join(df, join_type="inner", num_partitions=nparts,
                             on=("h",))

    def prefix(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"block_key": pa.array([], type=pa.int64()),
                             "page_id": pa.array([], type=pa.int64())})
        doc = b["doc_id"].to_numpy(zero_copy_only=False)
        h = b["h"].to_numpy(zero_copy_only=False)
        dfv = b["df"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h, dfv, doc))
        doc_s, h_s, n_s = doc[order], h[order], n[order]
        starts = np.flatnonzero(np.r_[True, doc_s[1:] != doc_s[:-1]])
        sizes = np.diff(np.r_[starts, len(doc_s)])
        rank = np.arange(len(doc_s)) - np.repeat(starts, sizes)
        plen = n_s - ((num * n_s + den - 1) // den) + 1
        keep = rank < plen
        return pa.table({"block_key": pa.array(h_s[keep], type=pa.int64()),
                         "page_id": pa.array(doc_s[keep], type=pa.int64())})

    pre = enriched.repartition(num_blocks=nparts, keys=["doc_id"], sort=False)         .map_batches(prefix, batch_format="pyarrow", batch_size=None)

    pairs = pre.repartition(num_blocks=nparts, keys=["block_key"], sort=False)         .map_batches(lambda t: make_pairs_partition(t, max_block_size=1 << 30),
                     batch_format="pyarrow", batch_size=None)         .select_columns(["a", "b"])         .repartition(num_blocks=nparts, keys=["a", "b"], sort=False)         .map_batches(_dedup_ab, batch_format="pyarrow", batch_size=None)         .materialize()

    return _verify_pairs(payload, pairs, threshold, nparts)



def q_neardup_shingle(sf_dir: str):
    """MinHash-LSH near-dup over 3-token shingles, exact-verified."""
    _, pairs = _neardup_pairs(sf_dir, shingle_k=3, threshold=0.5, num_bands=64)
    return pairs


def _sql_shingles(col: str = "text") -> str:
    toks = TOKEN_SQL.format(col=col)
    return f"""
  SELECT doc_id,
         CASE WHEN len({toks}) >= 3 THEN
             list_distinct(list_transform(range(1, len({toks}) - 1),
                 i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2]))
         ELSE [array_to_string({toks}, ' ')] END AS shingles
  FROM documents
"""


SQL_SET_SIMILARITY_JOIN = f"""
WITH sh AS ({_sql_shingles()}),
u AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
c AS (SELECT doc_id, len(shingles) AS n FROM sh),
p AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
  FROM u x JOIN u y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       inter / CAST(ca.n + cb.n - inter AS DOUBLE) AS jaccard
FROM p JOIN c ca ON ca.doc_id = doc_a JOIN c cb ON cb.doc_id = doc_b
WHERE inter / CAST(ca.n + cb.n - inter AS DOUBLE) >= 0.7
"""


def q_containment_join(sf_dir: str, num: int = 4, den: int = 5):
    """EXACT set-containment join (the ASYMMETRIC twin of
    q_set_similarity_join — quote/subset detection): every DIRECTED
    document pair (a, b) with |shingles(a) ∩ shingles(b)| /
    |shingles(a)| >= num/den, i.e. a's content appears (almost)
    wholly inside b.

    Completeness: containment >= t means |A∩B| >= ceil(t·|A|) (an
    integer count); if B avoided ALL of A's first |A| - ceil(t·|A|)
    + 1 shingles under the global hash order, the intersection would
    fit inside A's ceil(t·|A|) - 1 element suffix — contradiction.
    So A-side posts its PREFIX and, because containment puts no bound
    on B's extra elements, B-side posts its FULL set (the inverted-
    index shape every quote-detection system carries; a production
    deployment df-caps the B postings at a measured recall cost —
    here it stays uncapped because the oracle demands exactness).
    Directed dedupe (not min/max) since (a in b) and (b in a) are
    different facts.  ceil in integers: (num*n + den-1) // den."""
    from .. import default_num_partitions

    threshold = num / den
    payload = _doc_sign(sf_dir, 3).materialize()
    nparts = default_num_partitions()

    def postings(b: pa.Table) -> pa.Table:
        empty = pa.table({"block_key": pa.array([], type=pa.int64()),
                          "doc_id": pa.array([], type=pa.int64()),
                          "role": pa.array([], type=pa.int8())})
        if b.num_rows == 0:
            return empty
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sets = [np.frombuffer(x, dtype=np.uint64)
                for x in b["set"].to_pylist()]
        keys, docs, roles = [], [], []
        for d, s in zip(ids, sets):
            h = np.sort(s).view(np.int64)  # global order = hash asc
            n = len(h)
            plen = n - ((num * n + den - 1) // den) + 1
            keys.append(h)
            docs.append(np.full(n, d, dtype=np.int64))
            r = np.ones(n, dtype=np.int8)
            r[:plen] = 0  # 0 = prefix (query side), 1 = full (index)
            roles.append(r)
        return pa.table({
            "block_key": pa.array(np.concatenate(keys), type=pa.int64()),
            "doc_id": pa.array(np.concatenate(docs), type=pa.int64()),
            "role": pa.array(np.concatenate(roles), type=pa.int8())})

    post = payload.map_batches(postings, batch_format="pyarrow")

    def enumerate_pairs(b: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "b": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        k = b["block_key"].to_numpy(zero_copy_only=False)
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        r = b["role"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, r, k))
        k, d, r = k[order], d[order], r[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        sizes = np.diff(np.r_[starts, len(k)])
        a_out, b_out = [], []
        for s, n in zip(starts, sizes):
            rr, dd = r[s:s + n], d[s:s + n]
            # prefix occurrences of the gram pair with EVERY document
            # containing it (a doc's prefix grams are also in its own
            # full posting — the a != b mask drops the self pair)
            qa = dd[rr == 0]
            if not len(qa):
                continue
            ii, jj = np.meshgrid(qa, dd, indexing="ij")
            m = ii != jj
            a_out.append(ii[m])
            b_out.append(jj[m])
        if not a_out:
            return empty
        return pa.table({"a": pa.array(np.concatenate(a_out),
                                       type=pa.int64()),
                         "b": pa.array(np.concatenate(b_out),
                                       type=pa.int64())})

    from .. import scrub_empty_blocks

    pairs = scrub_empty_blocks(
        post.repartition(num_blocks=nparts, keys=["block_key"],
                         sort=False)
        .map_batches(enumerate_pairs, batch_format="pyarrow",
                     batch_size=None)
        .repartition(num_blocks=nparts, keys=["a", "b"], sort=False)
        .map_batches(_dedup_ab, batch_format="pyarrow",
                     batch_size=None).materialize())

    import ray.data as rd

    empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                      "doc_b": pa.array([], type=pa.int64()),
                      "containment": pa.array([], type=pa.float64())})
    if pairs.count() == 0:
        return rd.from_arrow(empty)

    side = payload.select_columns(["doc_id", "set", "n_distinct"])
    a_side = side.rename_columns({"doc_id": "a", "set": "set_a",
                                  "n_distinct": "na"})
    b_side = side.select_columns(["doc_id", "set"]) \
        .rename_columns({"doc_id": "b", "set": "set_b"})
    enriched = scrub_empty_blocks(
        pairs.join(a_side, join_type="inner",
                   num_partitions=nparts, on=("a",)).materialize())
    enriched = enriched.join(b_side, join_type="inner",
                             num_partitions=nparts,
                             on=("b",)).materialize()

    def verify(t: pa.Table) -> pa.Table:
        from ..functions.arrowbuf import exact_containment_pairs

        if t.num_rows == 0:
            return empty
        c = exact_containment_pairs(t["set_a"], t["set_b"])
        a_ids = t["a"].to_numpy(zero_copy_only=False)
        b_ids = t["b"].to_numpy(zero_copy_only=False)
        m = c >= threshold
        return pa.table({"doc_a": pa.array(a_ids[m], type=pa.int64()),
                         "doc_b": pa.array(b_ids[m], type=pa.int64()),
                         "containment": pa.array(c[m],
                                                 type=pa.float64())})

    return enriched.map_batches(verify, batch_format="pyarrow")


SQL_CONTAINMENT_JOIN = f"""
WITH sh AS ({_sql_shingles()}),
u AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
c AS (SELECT doc_id, len(shingles) AS n FROM sh),
p AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
  FROM u x JOIN u y ON x.s = y.s AND x.doc_id <> y.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter / CAST(ca.n AS DOUBLE) AS containment
FROM p JOIN c ca ON ca.doc_id = doc_a
WHERE inter / CAST(ca.n AS DOUBLE) >= 0.8
"""


SQL_NEARDUP_SHINGLE = f"""
WITH sh AS ({_sql_shingles()}),
u AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
c AS (SELECT doc_id, len(shingles) AS n FROM sh),
p AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
  FROM u x JOIN u y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       inter / CAST(ca.n + cb.n - inter AS DOUBLE) AS jaccard
FROM p JOIN c ca ON ca.doc_id = doc_a JOIN c cb ON cb.doc_id = doc_b
WHERE inter / CAST(ca.n + cb.n - inter AS DOUBLE) >= 0.5
"""


def q_neardup_token(sf_dir: str):
    """Token-set (1-gram) Jaccard near-dup at tau=0.9 (32x4 LSH)."""
    _, pairs = _neardup_pairs(sf_dir, shingle_k=1, threshold=0.9, num_bands=32)
    return pairs


SQL_NEARDUP_TOKEN = f"""
WITH t AS (SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM documents),
c AS (SELECT doc_id, count(*) AS n FROM t GROUP BY 1),
p AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
  FROM t x JOIN t y ON x.tok = y.tok AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       inter / CAST(ca.n + cb.n - inter AS DOUBLE) AS jaccard
FROM p JOIN c ca ON ca.doc_id = doc_a JOIN c cb ON cb.doc_id = doc_b
WHERE inter / CAST(ca.n + cb.n - inter AS DOUBLE) >= 0.9
"""


def q_doc_clusters(sf_dir: str):
    """Full ER pipeline over `documents` with exact-Jaccard scoring:
    blocking -> pairs -> verify(J >= 0.5) -> connected components.
    Output (doc_id, cluster_doc_id = min doc_id of component).

    This is the SQL-checkable twin of the flagship web-page pipeline:
    the oracle computes the same components with a recursive CTE."""
    from .. import default_num_partitions
    from ..stages.clustering import connected_components

    payload, pairs = _neardup_pairs(sf_dir, shingle_k=3, threshold=0.5, num_bands=64)
    edges = pairs.select_columns(["doc_a", "doc_b"]).rename_columns({"doc_a": "a", "doc_b": "b"})
    vertices = payload.select_columns(["doc_id"]).rename_columns({"doc_id": "page_id"})
    labels = connected_components(vertices, edges, num_partitions=default_num_partitions())
    return labels.rename_columns({"page_id": "doc_id", "component": "cluster_doc_id"})


SQL_DOC_CLUSTERS = f"""
WITH RECURSIVE sh AS ({_sql_shingles()}),
u AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
c AS (SELECT doc_id, len(shingles) AS n FROM sh),
p AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
  FROM u x JOIN u y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
e AS (
  SELECT a, b FROM p JOIN c ca ON ca.doc_id = a JOIN c cb ON cb.doc_id = b
  WHERE inter / CAST(ca.n + cb.n - inter AS DOUBLE) >= 0.5
),
sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
reach(v, u) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.v, s.b FROM reach r JOIN sym s ON r.u = s.a
)
SELECT v AS doc_id, min(u) AS cluster_doc_id FROM reach GROUP BY 1
"""


# =====================================================================
# Similarity search over `embeddings`
# =====================================================================


def _load_query_matrix(sf_dir: str, max_qid: int):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    mask = pc.less(t["vec_id"], max_qid)
    t = t.filter(mask)
    qids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    Q = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(Q, axis=1, keepdims=True)
    np.divide(Q, norms, out=Q, where=norms > 0)  # all-zero vector stays zero, not NaN
    return qids, Q


def q_ann_topk(sf_dir: str, k: int = 5, max_qid: int = 10):
    """Brute-force cosine top-k: broadcast query matrix (ray.put once),
    per-batch float64 matmul + partial top-k, final exact merge per
    query (the baseline ANN; an IVF variant partitions by coarse
    centroid instead — same stages)."""
    import pandas as pd
    import ray

    empty = _empty_guard(sf_dir, "embeddings",
                         {"query_id": pa.int64(),
                          "neighbor_id": pa.int64(),
                          "rank": pa.int64()})
    if empty is not None:
        return empty

    qids, Q = _load_query_matrix(sf_dir, max_qid)
    q_ref = ray.put((qids, Q))

    class PartialTopK:
        def __init__(self):
            self.qids, self.Q = ray.get(q_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            vids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            E = np.array(b["embedding"].to_pylist(), dtype=np.float64)
            norms = np.linalg.norm(E, axis=1, keepdims=True)
            np.divide(E, norms, out=E, where=norms > 0)
            cos = E @ self.Q.T  # (n, q)
            out_q, out_n, out_c = [], [], []
            for j, qid in enumerate(self.qids):
                col = cos[:, j]
                valid = vids != qid
                order = np.lexsort((vids[valid], -col[valid]))[:k]
                sel = np.nonzero(valid)[0][order]
                out_q.append(np.full(len(sel), qid, dtype=np.int64))
                out_n.append(vids[sel])
                out_c.append(col[sel])
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), type=pa.int64()),
                "cos": pa.array(np.concatenate(out_c), type=pa.float64()),
            })

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    partial = ds.map_batches(PartialTopK, batch_format="pyarrow", concurrency=(1, 4))

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(k)
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


SQL_ANN_TOPK = """
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id < 10),
s AS (
  SELECT qid, vec_id AS nid,
         list_cosine_similarity(qe, CAST(embedding AS DOUBLE[])) AS cos
  FROM q, embeddings WHERE vec_id != qid
)
SELECT qid AS query_id, nid AS neighbor_id, rank FROM (
  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
  FROM s
) WHERE rank <= 5
"""


def q_embedding_pairs(sf_dir: str, threshold: float = 0.45, n_chunks: int = 8):
    """All embedding pairs with cosine >= tau — EXACT, distributed as
    C·(C+1)/2 block matmuls over persisted normalized chunks.

    Scale shape: exact all-pairs is inherently O(N²) compute, but the
    plan bounds per-task memory at 2 chunks (N/C rows each) and never
    holds the matrix on the driver (round 1 pq.read_table-ed the whole
    table + broadcast it).  Writers persist each vector once into its
    hash chunk; a tiny C²/2-row task list fans out the block compares.
    At 100 TB the *approximate* family (q_ann_ivf / simhash / MinHash)
    is the right tool; this operator is the exact-threshold oracle-
    matched path, chunk-count-tunable so a chunk fits worker heap."""
    import hashlib
    import os
    import uuid

    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages.exchange import EXCHANGE_ROOT

    root = os.path.join(EXCHANGE_ROOT, "embpairs-" + uuid.uuid4().hex)
    for c in range(n_chunks):
        os.makedirs(os.path.join(root, f"chunk={c}"), exist_ok=True)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def write_chunks(b: pa.Table) -> pa.Table:
        vids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        E = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(E, axis=1, keepdims=True)
        np.divide(E, norms, out=E, where=norms > 0)
        chunk = (vids % n_chunks).astype(np.int64)
        # deterministic (content-hash) file names: a retried writer task
        # replaces its files instead of duplicating them
        fid = hashlib.blake2b(vids.tobytes(), digest_size=16).hexdigest()
        for c in np.unique(chunk):
            m = chunk == c
            # fixed-stride rows → one flat buffer + arithmetic offsets
            # (no per-row python tobytes)
            sub = np.ascontiguousarray(E[m])
            width = sub.shape[1] * 8
            offs = (np.arange(sub.shape[0] + 1, dtype=np.int64) * width).astype(np.int32)
            emb_arr = pa.Array.from_buffers(
                pa.binary(), sub.shape[0],
                [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(sub.tobytes())])
            tbl = pa.table({
                "vec_id": pa.array(vids[m], type=pa.int64()),
                "emb": emb_arr,
            })
            final = os.path.join(root, f"chunk={int(c)}", f"{fid}.parquet")
            tmp = final + f".{uuid.uuid4().hex}.tmp"
            pq.write_table(tbl, tmp, compression="none")
            os.replace(tmp, final)
        return pa.table({"n": pa.array([b.num_rows], type=pa.int64())})

    # barrier: all chunks on storage before any block task reads
    ds.map_batches(write_chunks, batch_format="pyarrow").count()

    class BlockCompare:
        """Actor-pool block comparator with a per-actor chunk LRU:
        the (i,j) task list is i-major and batched, so the row chunk
        stays cache-hot across a batch and column chunks re-read only
        on locality breaks (round 2 re-read every chunk ~C times —
        one `pq.read_table` per (i,j) side)."""

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
                got = (np.array([], dtype=np.int64), np.zeros((0, 1)))
            else:
                t = pa.concat_tables([pq.read_table(f) for f in files])
                ids = t["vec_id"].to_numpy(zero_copy_only=False)
                flat = np.frombuffer(b"".join(t["emb"].to_pylist()),
                                     dtype=np.float64)
                got = (ids, flat.reshape(len(ids), -1))
            self._cache[c] = got
            if len(self._cache) > self.CACHE_CAP:
                self._cache.popitem(last=False)
            return got

        def __call__(self, b: pa.Table) -> pa.Table:
            out_a, out_b, out_c = [], [], []
            for i, j in zip(b["i"].to_pylist(), b["j"].to_pylist()):
                ia, Ma = self._chunk(i)
                ib, Mb = (ia, Ma) if i == j else self._chunk(j)
                if not len(ia) or not len(ib):
                    continue
                cos = Ma @ Mb.T
                if i == j:
                    rows, cols = np.nonzero((cos >= threshold)
                                            & (ia[:, None] < ib[None, :]))
                    va, vb = ia[rows], ib[cols]
                else:
                    # each unordered cross-chunk pair appears exactly
                    # once in the (i<j) block; normalize to (min, max)
                    rows, cols = np.nonzero(cos >= threshold)
                    va = np.minimum(ia[rows], ib[cols])
                    vb = np.maximum(ia[rows], ib[cols])
                out_a.append(va)
                out_b.append(vb)
                out_c.append(cos[rows, cols])
            if not out_a:
                return pa.table({"vec_a": pa.array([], type=pa.int64()),
                                 "vec_b": pa.array([], type=pa.int64()),
                                 "cos": pa.array([], type=pa.float64())})
            return pa.table({
                "vec_a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "vec_b": pa.array(np.concatenate(out_b), type=pa.int64()),
                "cos": _canon_round(list(np.concatenate(out_c)), 6),
            })

    tasks = rd.from_items([{"i": i, "j": j}
                           for i in range(n_chunks) for j in range(i, n_chunks)])
    out = tasks.map_batches(BlockCompare, batch_format="pyarrow",
                            batch_size=max(2, n_chunks // 2),
                            concurrency=(1, 4)).materialize()
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return out


SQL_EMBEDDING_PAIRS = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {_sql_round("list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))", 6)} AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.45
"""


# above this vector count the exact O(N^2) chunked-matmul pair stage
# stops being the right default (at 1e5 vectors it is ~5e9 dot
# products; past that the banded-LSH stage wins) — same counted-budget
# dispatch pattern as clustering.DRIVER_UNION_FIND_MAX_EDGES and the
# broadcast-vs-join byte budget in entity_resolution.
EXACT_PAIRS_MAX_VECTORS = 100_000


def _lsh_bands_for_threshold(threshold: float, band_bits: int = 2,
                             target_miss: float = 1e-7,
                             max_bands: int = 256) -> int:
    """Band count that keeps the banded random-hyperplane LSH per-pair
    miss probability (1 - p^bits)^bands below ``target_miss`` at the
    caller's cosine ``threshold`` (p = 1 - arccos(t)/pi).  The catalog
    default (32 bands x 2 bits) only carries that guarantee at
    t >= 0.45; a lower threshold silently dropping edges would make the
    LSH dispatch diverge from the exact path, so the geometry must be
    derived from the threshold, not assumed.  Never returns fewer than
    the documented 32 bands; raises (forcing the caller to pick
    pair_stage='exact' or widen max_bands) when the threshold is so low
    the bound needs more than ``max_bands`` bands."""
    import math

    theta = math.acos(max(-1.0, min(1.0, float(threshold))))
    p = 1.0 - theta / math.pi
    if p <= 0.0:
        raise ValueError(
            f"cosine threshold {threshold} has zero LSH collision "
            "probability; use pair_stage='exact'")
    if p >= 1.0:
        # threshold >= 1.0: qualifying pairs are bit-identical vectors,
        # every band catches them (miss probability exactly 0) — the
        # log(1 - p^bits) form below would hit log(0)
        return 32
    n = math.ceil(math.log(target_miss) / math.log(1.0 - p ** band_bits))
    if n > max_bands:
        raise ValueError(
            f"cosine threshold {threshold} needs {n} LSH bands for a "
            f"{target_miss:g} miss bound (cap {max_bands}); use "
            "pair_stage='exact' or a coarser threshold")
    return max(32, n)


def q_semantic_dedup(sf_dir: str, threshold: float = 0.45,
                     pair_stage: str = "auto",
                     exact_max_vectors: int = EXACT_PAIRS_MAX_VECTORS):
    """SemDeDup-style semantic deduplication over the embedding
    column: vectors within cosine ``threshold`` of each other collapse
    to one keeper per connected component (keeper = min vec_id).
    Output is corpus-shaped — every vec_id with its component label
    and an int keep flag — so the surviving corpus is ``keep = 1``.

    Composition, all existing machinery: pairs → distributed connected
    components (counted driver/pointer-jumping dispatch in
    stages/clustering).  The pair stage is DISPATCHED BY A COUNT, not
    assumed: ``pair_stage="auto"`` counts the vectors (parquet
    metadata, no scan) and uses the exact chunked-matmul plan
    (``q_embedding_pairs`` — bounded per-task memory, nothing on the
    driver) up to ``exact_max_vectors``, and the sub-quadratic
    banded-LSH plan (``q_embedding_neardup_lsh``, exact-cosine
    verified, band count derived from the threshold via
    ``_lsh_bands_for_threshold`` so the recall bound holds at ANY
    threshold, not just the catalog default) above it — the downstream
    is unchanged either way.
    ``pair_stage="exact"``/``"lsh"`` force a side (parity-tested)."""
    from .. import default_num_partitions
    from ..stages.clustering import connected_components

    if pair_stage == "auto":
        n_vecs = _read(sf_dir, "embeddings", ["vec_id"]).count()
        pair_stage = "exact" if n_vecs <= exact_max_vectors else "lsh"
    if pair_stage == "exact":
        pairs = q_embedding_pairs(sf_dir, threshold=threshold)
    elif pair_stage == "lsh":
        from .queries_ext import q_embedding_neardup_lsh

        pairs = q_embedding_neardup_lsh(
            sf_dir, threshold=threshold,
            n_bands=_lsh_bands_for_threshold(threshold))
    else:
        raise ValueError(f"pair_stage must be auto/exact/lsh, got {pair_stage!r}")
    edges = pairs.select_columns(["vec_a", "vec_b"]) \
                 .rename_columns({"vec_a": "a", "vec_b": "b"})
    vertices = _read(sf_dir, "embeddings", ["vec_id"]) \
        .rename_columns({"vec_id": "page_id"})
    labels = connected_components(vertices, edges,
                                  num_partitions=default_num_partitions())

    def finish(b: pa.Table) -> pa.Table:
        vid = b["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        comp = b["component"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(vid, type=pa.int64()),
            "cluster_vec_id": pa.array(comp, type=pa.int64()),
            "keep": pa.array((vid == comp).astype(np.int64), type=pa.int64()),
        })

    return labels.map_batches(finish, batch_format="pyarrow")


SQL_SEMANTIC_DEDUP = """
WITH RECURSIVE e AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.45
),
sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
reach(v, u) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT r.v, s.b FROM reach r JOIN sym s ON r.u = s.a
)
SELECT v AS vec_id, min(u) AS cluster_vec_id,
       CAST(v = min(u) AS BIGINT) AS keep
FROM reach GROUP BY 1
"""


# =====================================================================
# Flagship web-page ER (rows-only: synthetic pages not in oracle views)
# =====================================================================


def q_er_clusters(sf_dir: str):
    from .entity_resolution import er_cluster_pages

    return er_cluster_pages(sf_dir)


def q_doc_fingerprints(sf_dir: str):
    """Order-sensitive rolling-hash fingerprints (rows-only: the hash
    function is engine-internal)."""
    from ..functions.textstats import fingerprint_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(b: pa.Table) -> pa.Table:
        f = fingerprint_batch(b["text"].to_pylist())
        return pa.table({"doc_id": b["doc_id"],
                         "fingerprint": pa.array(f.view(np.int64), type=pa.int64())})

    return ds.map_batches(fp, batch_format="pyarrow")


# =====================================================================
# Catalog
# =====================================================================

def _ext():
    from .queries_ext import EXT_ORACLES, EXT_QUERIES

    return EXT_QUERIES, EXT_ORACLES


def q_pem_injected(sf_dir: str):
    """PEM with AdditionalEntity injection — the §2.10 extension point
    (≙ preprocess_all.py:184-224 + generate_pem.py:75-82): each
    user-supplied entity contributes ONE link count per normalized
    alias/label to the surface→entity counts BEFORE the P(e|m)
    normalization, so custom KB entities join the candidate table
    without rebuilding it.  The injection is a tiny union ahead of the
    SAME one-exchange pem_from_pairs build (no extra shuffle).

    Fixture entities derive from ``nation``: id ``A<key>`` (the
    reference's A-prefix convention for additional entities,
    preprocess_all.py:191), label = n_name, plus a ``The <NAME>``
    alias that must collapse onto the label's surface through the M1
    normalize contract (lowercase + "the " strip) — so each (surface,
    A<key>) pair carries cnt=2 and dilutes P(e|m) for colliding
    document tokens, exactly like the reference's count bump."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from ..functions.tokenize import tokenize_batch
    from ..stages.pem import pem_from_pairs

    ds = _read(sf_dir, "documents", ["source", "text"])

    def explode(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        sources = b["source"].to_pylist()
        flat, starts = tokenize_batch(texts)
        surf, ent = [], []
        for i, src in enumerate(sources):
            for t in set(flat[starts[i]:starts[i + 1]]):
                surf.append(t)
                ent.append(src)
        return pa.table({"surface": pa.array(surf, type=pa.string()),
                         "entity": pa.array(ent, type=pa.string())})

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"])
    additional = [{"entity_id": f"A{k}", "label": n,
                   "aliases": [f"The {n}"]}
                  for k, n in zip(nat["n_nationkey"].to_pylist(),
                                  nat["n_name"].to_pylist())]
    inj = inject_entity_pairs(additional)

    pairs = ds.map_batches(explode, batch_format="pyarrow").union(
        rd.from_arrow(inj))
    return pem_from_pairs(pairs)


def inject_entity_pairs(additional: list[dict]) -> pa.Table:
    """AdditionalEntity list → (surface, entity) count-pair rows: one
    row per normalized alias + label (generate_pem.py:77-79 bumps the
    link count once per surface form)."""
    from ..functions.normalize import normalize_surface_array

    surf, ent = [], []
    for a in additional:
        for sf in list(a.get("aliases") or ()) + [a["label"]]:
            surf.append(sf)
            ent.append(a["entity_id"])
    return pa.table({
        "surface": normalize_surface_array(pa.array(surf, type=pa.string())),
        "entity": pa.array(ent, type=pa.string()),
    })


QUERIES = {
    "lineitem_agg": q_lineitem_agg,
    "top_customers": q_top_customers,
    "events_by_type": q_events_by_type,
    "part_topk": q_part_topk,
    "supplier_per_region": q_supplier_per_region,
    "user_sessions": q_user_sessions,
    "events_hourly": q_events_hourly,
    "doc_token_stats": q_doc_token_stats,
    "doc_quality": q_doc_quality,
    "doc_langid": q_doc_langid,
    "exact_dedup": q_exact_dedup,
    "pem_table": q_pem_table,
    "pem_injected": q_pem_injected,
    "mention_phrases": q_mention_phrases,
    "neardup_shingle": q_neardup_shingle,
    "set_similarity_join": q_set_similarity_join,
    "containment_join": q_containment_join,
    "neardup_token": q_neardup_token,
    "doc_clusters": q_doc_clusters,
    "ann_topk": q_ann_topk,
    "embedding_pairs": q_embedding_pairs,
    "semantic_dedup": q_semantic_dedup,
    "er_clusters": q_er_clusters,
    "doc_fingerprints": q_doc_fingerprints,
}
def _mid_import(mod_name: str) -> bool:
    """True iff ``mod_name`` is currently being imported (its body is
    executing further up the stack) — the only state in which a
    catalog-module ImportError is a benign circular re-entry."""
    import sys

    m = sys.modules.get(mod_name)
    spec = getattr(m, "__spec__", None) if m is not None else None
    return bool(spec is not None and getattr(spec, "_initializing", False))


try:
    QUERIES.update(_ext()[0])
except ImportError as _e:
    # tolerate ONLY the circular re-entry: the module the failed
    # from-import targeted (e.name) is itself mid-import — it imported
    # this module first and completes the registration at the end of
    # its body.  A genuine import failure (broken dep, missing name in
    # a COMPLETED module) must not silently shrink the catalog.
    if not (getattr(_e, "name", None) and _mid_import(_e.name)):
        raise


from ..functions.normalize import NORMALIZE_SQL as _NORM_SQL  # noqa: E402

NORM_NNAME = _NORM_SQL.format(col="n_name")

SQL_PEM_INJECTED = f"""
WITH toks AS (
  SELECT source AS entity, unnest(list_distinct({_TOKS})) AS surface FROM documents
), inj AS (
  -- each additional entity bumps the count once per surface form:
  -- label and the 'The <NAME>' alias normalize to the SAME surface
  SELECT 'A' || n_nationkey AS entity,
         {NORM_NNAME} AS surface
  FROM nation
  UNION ALL
  SELECT 'A' || n_nationkey, {NORM_NNAME} FROM nation
), pairs AS (
  SELECT entity, surface FROM toks
  UNION ALL SELECT entity, surface FROM inj
)
SELECT surface, entity, count(*) AS cnt,
       count(*) / CAST(sum(count(*)) OVER (PARTITION BY surface) AS DOUBLE) AS prob
FROM pairs GROUP BY 1, 2
"""


def oracles() -> dict[str, str]:
    return {
        "lineitem_agg": SQL_LINEITEM_AGG,
        "top_customers": SQL_TOP_CUSTOMERS,
        "events_by_type": SQL_EVENTS_BY_TYPE,
        "part_topk": SQL_PART_TOPK,
        "supplier_per_region": SQL_SUPPLIER_PER_REGION,
        "user_sessions": SQL_USER_SESSIONS,
        "events_hourly": SQL_EVENTS_HOURLY,
        "doc_token_stats": SQL_DOC_TOKEN_STATS,
        "doc_quality": SQL_DOC_QUALITY,
        "doc_langid": _sql_doc_langid(),
        "exact_dedup": SQL_EXACT_DEDUP,
        "pem_table": SQL_PEM_TABLE,
        "pem_injected": SQL_PEM_INJECTED,
        "mention_phrases": SQL_MENTION_PHRASES,
        "neardup_shingle": SQL_NEARDUP_SHINGLE,
        "set_similarity_join": SQL_SET_SIMILARITY_JOIN,
        "containment_join": SQL_CONTAINMENT_JOIN,
        "neardup_token": SQL_NEARDUP_TOKEN,
        "doc_clusters": SQL_DOC_CLUSTERS,
        "ann_topk": SQL_ANN_TOPK,
        "embedding_pairs": SQL_EMBEDDING_PAIRS,
        "semantic_dedup": SQL_SEMANTIC_DEDUP,
        # er_clusters, doc_fingerprints: rows-only (non-SQL-expressible)
        **_ext()[1],
    }
