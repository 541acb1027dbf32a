"""Webtext corpus-hygiene catalog queries (engine additions): PII
redaction, canonical-URL dedup + latest-crawl selection, C4-style
global line dedup, within-doc duplicate-line trim, near-dup
canonical-document selection, exact and sketch heavy hitters,
Bloom-filter decontamination, token-budget shard packing, per-group
percentile rank, the deflate compressibility signal, DSIR importance
resampling, leakage-safe host-level splits, and the composed
``corpus_clean`` training-data-prep pipeline.

These are the operators a Common-Crawl-scale training-data pipeline
runs between crawling and training (CCNet / C4 / Gopher lineage).
Each derives its input deterministically from the driver's test
tables (no external data) so a DuckDB oracle can replay the result
bit-exactly — the synth is replayed in SQL, while the operator under
test runs only on the Ray side.

Scale shapes: redaction/canonicalization are stateless pyarrow-RE2
projections (zero Python per row); every dedup/argmax/rank is ONE
keyed repartition + the shared ``_lexsort_segments`` pass per
partition (no per-group pandas); heavy hitters pre-aggregate per
block before the shuffle; the sketch variants (bloom, truncated
counts) move sketch state, never keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenize import STOPWORDS, tokenize_batch
from .queries import _canon_round, _read, _TOKS


def _lexsort_segments(primary: np.ndarray, *tiebreaks: np.ndarray):
    """Shared segment kernel: lexsort rows by (primary, *tiebreaks) and
    return (order, seg_starts, seg_sizes) where segments are runs of
    equal ``primary`` values.  Every dedup/argmax query in this module
    is one keyed repartition + this kernel + a projection."""
    order = np.lexsort(tuple(reversed(tiebreaks)) + (primary,))
    sorted_primary = primary[order]
    seg = np.flatnonzero(np.r_[True, sorted_primary[1:] != sorted_primary[:-1]])
    sizes = np.diff(np.r_[seg, len(sorted_primary)])
    return order, seg, sizes

# ---------------------------------------------------------------------
# PII redaction (engine addition; CCNet/privacy-filter family)
# ---------------------------------------------------------------------

# RE2 on both sides (pyarrow + DuckDB): patterns are shared verbatim.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_pii(arr):
    """Vectorized PII scrub of a string array: emails, then NANP-style
    phone numbers, then IPv4 literals, each replaced by a typed token.
    Order matters (an address containing digits must be consumed by
    the email pass first) and is part of the contract."""
    arr = pc.replace_substring_regex(arr, pattern=EMAIL_RE, replacement="<EMAIL>")
    arr = pc.replace_substring_regex(arr, pattern=PHONE_RE, replacement="<PHONE>")
    return pc.replace_substring_regex(arr, pattern=IP_RE, replacement="<IP>")


def q_pii_redact(sf_dir: str):
    """Plant deterministic PII into ``documents.text`` (every doc gets
    an email; every 3rd a phone; every 5th an IP), then run the
    vectorized redaction and count each PII type per doc.  The oracle
    replays the plant and the same RE2 chain."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def redact(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        ids = pa.array(did.astype(str))
        email = pc.binary_join_element_wise(
            " contact user", ids, "@mail.example.com", "")
        phone_num = pa.array((did % 10000).astype(str))
        phone = pc.if_else(
            pa.array(did % 3 == 0),
            pc.binary_join_element_wise(
                " call 415-555-", pc.utf8_lpad(phone_num, 4, "0"), ""),
            "")
        ip = pc.if_else(
            pa.array(did % 5 == 0),
            pc.binary_join_element_wise(
                " from 10.", pa.array((did % 200).astype(str)),
                ".0.", pa.array((did * 7 % 250).astype(str)), ""),
            "")
        aug = pc.binary_join_element_wise(b["text"], email, phone, ip, "")
        return pa.table({
            "doc_id": b["doc_id"],
            "clean": redact_pii(aug),
            "n_email": pc.cast(pc.count_substring_regex(aug, pattern=EMAIL_RE), pa.int64()),
            "n_phone": pc.cast(pc.count_substring_regex(aug, pattern=PHONE_RE), pa.int64()),
            "n_ip": pc.cast(pc.count_substring_regex(aug, pattern=IP_RE), pa.int64()),
        })

    return ds.map_batches(redact, batch_format="pyarrow")


SQL_PII_REDACT = f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
              || CASE WHEN doc_id % 3 = 0
                      THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      ELSE '' END
              || CASE WHEN doc_id % 5 = 0
                      THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
                           || '.0.' || CAST(doc_id * 7 % 250 AS VARCHAR)
                      ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(t,
           '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g'),
           '{IP_RE}', '<IP>', 'g') AS clean,
       CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(t, '{IP_RE}')) AS BIGINT) AS n_ip
FROM aug
"""


# ---------------------------------------------------------------------
# Canonical-URL dedup (engine addition; crawl-dedup family)
# ---------------------------------------------------------------------


def _messy_urls(did: np.ndarray) -> pa.Array:
    """Deterministic messy-URL synth: the canonical form depends only
    on ``v = doc_id % 30`` (30 groups -> heavy dupes), while the
    surface mess — case, default ports, doubled/trailing slashes,
    tracking params, fragments — varies per doc_id.  The oracle
    recomputes the CLOSED-FORM canonical from v, so the query only
    matches if every canonicalization rule fires correctly."""
    v = did % 30
    vs = pa.array(v.astype(str))
    scheme = pc.if_else(pa.array(v % 2 == 0), "http", "https")
    scheme = pc.if_else(pa.array(did % 2 == 0), pc.utf8_upper(scheme), scheme)
    host = pc.binary_join_element_wise("www.site", vs, ".example.com", "")
    host = pc.if_else(pa.array(did % 3 == 0), pc.utf8_upper(host), host)
    # default ports appear per-doc (stripped by canon); a REAL port is
    # a class property (v%5==0) so it survives canonicalization
    default_port = pc.if_else(pa.array(v % 2 == 0), ":80", ":443")
    port = pc.if_else(pa.array(v % 5 == 0), ":8080",
                      pc.if_else(pa.array(did % 4 == 0), default_port, ""))
    slash = pc.if_else(pa.array(did % 5 == 0), "//", "/")
    path = pc.binary_join_element_wise("/articles", slash, "item-", vs, "")
    trail = pc.if_else(pa.array(did % 7 == 0), "/", "")
    ids = pa.array(did.astype(str))
    query = pc.if_else(
        pa.array(did % 2 == 1),
        pc.binary_join_element_wise("?utm_source=s", ids, "&id=", vs, ""),
        pc.binary_join_element_wise("?id=", vs, "&utm_campaign=c", ids, ""))
    fbc = pc.if_else(pa.array(did % 11 == 0), "&fbclid=x", "")
    frag = pc.if_else(pa.array(did % 3 == 0),
                      pc.binary_join_element_wise("#sec", ids, ""), "")
    return pc.binary_join_element_wise(
        scheme, "://", host, port, path, trail, query, fbc, frag, "")


def q_url_dedup(sf_dir: str):
    """Canonicalize messy synthetic URLs (functions/urls.py) and assign
    each page its canonical representative: the min doc_id sharing the
    canonical URL.  Scale shape: stateless canon projection, then ONE
    repartition keyed on canon_url + a lexsort/segment pass (at 100 TB
    you would key the exchange on a hash of the canonical URL and keep
    the string only for in-partition verification)."""
    from .. import default_num_partitions
    from ..functions.urls import canonicalize_urls

    ds = _read(sf_dir, "documents", ["doc_id"])

    def canon(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": b["doc_id"],
                         "canon_url": canonicalize_urls(_messy_urls(did))})

    parted = ds.map_batches(canon, batch_format="pyarrow").repartition(
        num_blocks=default_num_partitions(), keys=["canon_url"], sort=False)

    def assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "canon_url": pa.array([], type=pa.string()),
                             "canonical_doc_id": pa.array([], type=pa.int64())})
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        url = b["canon_url"].to_numpy(zero_copy_only=False)
        order, seg, sizes = _lexsort_segments(url, did)
        did, url = did[order], url[order]
        rep = np.repeat(did[seg], sizes)
        return pa.table({"doc_id": pa.array(did, type=pa.int64()),
                         "canon_url": pa.array(url, type=pa.string()),
                         "canonical_doc_id": pa.array(rep, type=pa.int64())})

    return parted.map_batches(assign, batch_format="pyarrow", batch_size=None)


SQL_URL_DEDUP = """
WITH c AS (
  SELECT doc_id,
         (CASE WHEN (doc_id % 30) % 2 = 0 THEN 'http' ELSE 'https' END)
         || '://www.site' || CAST(doc_id % 30 AS VARCHAR) || '.example.com'
         || CASE WHEN (doc_id % 30) % 5 = 0 THEN ':8080' ELSE '' END
         || '/articles/item-' || CAST(doc_id % 30 AS VARCHAR)
         || '?id=' || CAST(doc_id % 30 AS VARCHAR) AS canon_url
  FROM documents
)
SELECT doc_id, canon_url,
       min(doc_id) OVER (PARTITION BY canon_url) AS canonical_doc_id
FROM c
"""


# ---------------------------------------------------------------------
# Latest-crawl selection per canonical URL (the warc_ts recrawl dedup)
# ---------------------------------------------------------------------

_TS_BASE_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in epoch µs


def q_url_latest(sf_dir: str):
    """Keep only the LATEST crawl of each canonical URL — the
    Common-Crawl recrawl dedup: the same page arrives once per crawl
    with a new ``warc_ts``; a corpus build keeps max(warc_ts), ties to
    min doc_id.  Synthetic warc_ts = 2025-01-01 + (doc_id·37 mod 1000)
    hours, messy URLs as in ``url_dedup``.

    Scale shape: canonicalization projection, ONE canon-keyed
    repartition + lexsort/segment argmax (the ``neardup_keep``
    kernel)."""
    from .. import default_num_partitions
    from ..functions.urls import canonicalize_urls

    ds = _read(sf_dir, "documents", ["doc_id"])

    def canon(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        us = _TS_BASE_US + (did * 37 % 1000) * 3_600_000_000
        return pa.table({
            "doc_id": b["doc_id"],
            "warc_ts": pa.array(us, type=pa.int64()).cast(pa.timestamp("us")),
            "canon_url": canonicalize_urls(_messy_urls(did)),
        })

    parted = ds.map_batches(canon, batch_format="pyarrow").repartition(
        num_blocks=default_num_partitions(), keys=["canon_url"], sort=False)

    def latest(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"canon_url": pa.array([], type=pa.string()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "warc_ts": pa.array([], type=pa.timestamp("us")),
                             "n_crawls": pa.array([], type=pa.int64())})
        url = b["canon_url"].to_numpy(zero_copy_only=False)
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        ts = b["warc_ts"].to_numpy(zero_copy_only=False).view(np.int64)
        order, seg, n = _lexsort_segments(url, -ts, did)
        url, did, ts = url[order], did[order], ts[order]
        return pa.table({
            "canon_url": pa.array(url[seg], type=pa.string()),
            "doc_id": pa.array(did[seg], type=pa.int64()),
            "warc_ts": pa.array(ts[seg], type=pa.int64()).cast(pa.timestamp("us")),
            "n_crawls": pa.array(n, type=pa.int64()),
        })

    return parted.map_batches(latest, batch_format="pyarrow", batch_size=None)


SQL_URL_LATEST = """
WITH c AS (
  SELECT doc_id,
         TIMESTAMP '2025-01-01'
           + INTERVAL (doc_id * 37 % 1000) HOUR AS warc_ts,
         (CASE WHEN (doc_id % 30) % 2 = 0 THEN 'http' ELSE 'https' END)
         || '://www.site' || CAST(doc_id % 30 AS VARCHAR) || '.example.com'
         || CASE WHEN (doc_id % 30) % 5 = 0 THEN ':8080' ELSE '' END
         || '/articles/item-' || CAST(doc_id % 30 AS VARCHAR)
         || '?id=' || CAST(doc_id % 30 AS VARCHAR) AS canon_url
  FROM documents
),
ranked AS (
  SELECT canon_url, doc_id, warc_ts,
         row_number() OVER (PARTITION BY canon_url
                            ORDER BY warc_ts DESC, doc_id) AS rn,
         CAST(count(*) OVER (PARTITION BY canon_url) AS BIGINT) AS n_crawls
  FROM c
)
SELECT canon_url, doc_id, warc_ts, n_crawls FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------
# C4-style global line dedup (engine addition)
# ---------------------------------------------------------------------

_LINE_TOKENS = 10
_BP_VARIANTS = 3  # docs with doc_id % 7 < 3 carry a shared boilerplate line


def q_line_dedup(sf_dir: str):
    """Global exact line-level dedup (the C4 move: drop every repeated
    line corpus-wide, keeping its first occurrence in (doc_id,
    line_idx) order).  "Lines" are 10-token windows of the tokenized
    text plus a planted boilerplate line shared across ~3/7 of docs —
    so the dedup provably removes cross-doc repeats.  Output: the
    surviving lines with their corpus-wide copy count.

    Scale shape: vectorized line construction (Arrow ``binary_join``
    over a ListArray — no per-line Python), then ONE repartition keyed
    on the line string + a lexsort/segment pass.  At 100 TB the
    exchange key becomes a 128-bit line hash; the string rides along
    only for in-partition verification."""
    from .. import default_num_partitions

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def lines(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        flat, starts = tokenize_batch(texts)
        lens = np.diff(starts)
        n_lines = -(-lens // _LINE_TOKENS)  # ceil; 0 for empty docs
        doc_rep = np.repeat(ids, n_lines)
        lidx = np.arange(n_lines.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(n_lines) - n_lines, n_lines)
        # line start offsets into the flat token stream; the final
        # sentinel closes the last list
        line_starts = np.repeat(starts[:-1], n_lines) + lidx * _LINE_TOKENS
        if starts[-1] >= 2**31:  # int32 list offsets: fail loudly, not wrap
            raise ValueError(
                f"batch has {starts[-1]} flat tokens (>= 2^31); lower "
                f"batch_size so ListArray int32 offsets cannot overflow")
        offsets = np.append(line_starts, starts[-1]).astype(np.int32)
        la = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                      pa.array(flat, type=pa.string()))
        content = pa.table({
            "doc_id": pa.array(doc_rep, type=pa.int64()),
            "line_idx": pa.array(lidx, type=pa.int64()),
            "line": pc.binary_join(la, " "),
        })
        bp_mask = ids % 7 < _BP_VARIANTS
        bp_ids = ids[bp_mask]
        bp = pa.table({
            "doc_id": pa.array(bp_ids, type=pa.int64()),
            "line_idx": pa.array(n_lines[bp_mask], type=pa.int64()),
            "line": pc.binary_join_element_wise(
                "please subscribe to newsletter ",
                pa.array((bp_ids % 7).astype(str)), ""),
        })
        return pa.concat_tables([content, bp])

    parted = ds.map_batches(lines, batch_format="pyarrow").repartition(
        num_blocks=default_num_partitions(), keys=["line"], sort=False)

    def keep_first(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "line_idx": pa.array([], type=pa.int64()),
                             "line": pa.array([], type=pa.string()),
                             "n_copies": pa.array([], type=pa.int64())})
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        lix = b["line_idx"].to_numpy(zero_copy_only=False)
        line = b["line"].to_numpy(zero_copy_only=False)
        order, seg, counts = _lexsort_segments(line, did, lix)
        did, lix, line = did[order], lix[order], line[order]
        return pa.table({"doc_id": pa.array(did[seg], type=pa.int64()),
                         "line_idx": pa.array(lix[seg], type=pa.int64()),
                         "line": pa.array(line[seg], type=pa.string()),
                         "n_copies": pa.array(counts, type=pa.int64())})

    return parted.map_batches(keep_first, batch_format="pyarrow", batch_size=None)


SQL_LINE_DEDUP = f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS}) AS tok,
         unnest(range(1, len({_TOKS}) + 1)) AS ord
  FROM documents
),
content AS (
  SELECT doc_id, CAST((ord - 1) // {_LINE_TOKENS} AS BIGINT) AS line_idx,
         string_agg(tok, ' ' ORDER BY ord) AS line
  FROM t GROUP BY doc_id, (ord - 1) // {_LINE_TOKENS}
),
bp AS (
  SELECT doc_id,
         CAST((len({_TOKS}) + {_LINE_TOKENS - 1}) // {_LINE_TOKENS} AS BIGINT) AS line_idx,
         'please subscribe to newsletter ' || CAST(doc_id % 7 AS VARCHAR) AS line
  FROM documents WHERE doc_id % 7 < {_BP_VARIANTS}
),
lines AS (SELECT * FROM content UNION ALL SELECT * FROM bp),
ranked AS (
  SELECT doc_id, line_idx, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, line_idx) AS rn,
         CAST(count(*) OVER (PARTITION BY line) AS BIGINT) AS n_copies
  FROM lines
)
SELECT doc_id, line_idx, line, n_copies FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------
# Near-dup canonical-document selection (engine addition: the keep
# step that turns near-dup clusters into a deduplicated corpus)
# ---------------------------------------------------------------------


def q_neardup_keep(sf_dir: str):
    """For every near-dup cluster (doc_clusters: MinHash-LSH -> exact
    verify -> connected components), select the canonical document to
    KEEP: the longest text (max n_chars), ties to the smallest doc_id.
    Output one row per cluster — the deduplicated corpus manifest.

    Scale shape: reuses the doc_clusters machinery, one hash join to
    attach n_chars, then ONE repartition keyed on the cluster id + a
    lexsort/segment argmax."""
    from .. import default_num_partitions
    from .queries import _empty_guard, q_doc_clusters

    empty = _empty_guard(sf_dir, "documents",
                         {"cluster_doc_id": pa.int64(),
                          "keep_doc_id": pa.int64(),
                          "n_chars": pa.int64(),
                          "cluster_size": pa.int64()})
    if empty is not None:
        return empty

    nparts = default_num_partitions()
    labels = q_doc_clusters(sf_dir)
    meta = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    joined = labels.join(meta, join_type="inner", num_partitions=nparts,
                         on=("doc_id",))
    parted = joined.repartition(num_blocks=nparts,
                                keys=["cluster_doc_id"], sort=False)

    def pick(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"cluster_doc_id": pa.array([], type=pa.int64()),
                             "keep_doc_id": pa.array([], type=pa.int64()),
                             "n_chars": pa.array([], type=pa.int64()),
                             "cluster_size": pa.array([], type=pa.int64())})
        cid = b["cluster_doc_id"].to_numpy(zero_copy_only=False)
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        nch = b["n_chars"].to_numpy(zero_copy_only=False)
        order, seg, size = _lexsort_segments(cid, -nch, did)
        cid, did, nch = cid[order], did[order], nch[order]
        return pa.table({"cluster_doc_id": pa.array(cid[seg], type=pa.int64()),
                         "keep_doc_id": pa.array(did[seg], type=pa.int64()),
                         "n_chars": pa.array(nch[seg], type=pa.int64()),
                         "cluster_size": pa.array(size, type=pa.int64())})

    return parted.map_batches(pick, batch_format="pyarrow", batch_size=None)


def _sql_neardup_keep() -> str:
    from .queries import SQL_DOC_CLUSTERS

    return f"""
WITH labels AS ({SQL_DOC_CLUSTERS}),
j AS (
  SELECT l.cluster_doc_id, l.doc_id, d.n_chars
  FROM labels l JOIN documents d ON l.doc_id = d.doc_id
),
ranked AS (
  SELECT cluster_doc_id, doc_id, n_chars,
         row_number() OVER (PARTITION BY cluster_doc_id
                            ORDER BY n_chars DESC, doc_id) AS rn,
         CAST(count(*) OVER (PARTITION BY cluster_doc_id) AS BIGINT) AS cluster_size
  FROM j
)
SELECT cluster_doc_id, doc_id AS keep_doc_id, n_chars, cluster_size
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------
# Exact corpus-wide heavy hitters (engine addition)
# ---------------------------------------------------------------------


def q_token_topk(sf_dir: str, k: int = 25):
    """Global top-k most frequent tokens with exact counts.

    Scale shape — the canonical pre-aggregation pattern: each block
    collapses its token stream to (token, count) via one C++
    ``value_counts`` pass BEFORE the shuffle (the exchange moves
    vocabulary-sized rows, never token instances), then a keyed
    groupby-sum, per-block partial top-k, and a single-block exact
    merge of ≤ k·num_blocks survivors.  Deterministic tie-break:
    count desc, token asc."""
    from ray.data.aggregate import Sum

    from .. import default_num_partitions

    ds = _read(sf_dir, "documents", ["text"])

    def partial_counts(b: pa.Table) -> pa.Table:
        from ..functions.tokenize import flat_tokens_arrow

        if b.num_rows == 0:
            return pa.table({"tok": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        vc = pc.value_counts(flat_tokens_arrow(b["text"]))
        return pa.table({"tok": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    agg = ds.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("tok", num_partitions=default_num_partitions()) \
        .aggregate(Sum("n", alias_name="n"))

    def topk_part(b: pa.Table, with_rank: bool = False) -> pa.Table:
        if b.num_rows == 0:
            out = {"tok": pa.array([], type=pa.string()),
                   "n": pa.array([], type=pa.int64())}
            if with_rank:
                out["rank"] = pa.array([], type=pa.int64())
            return pa.table(out)
        tok = b["tok"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tok, -n))[:k]
        out = {"tok": pa.array(tok[order], type=pa.string()),
               "n": pa.array(n[order], type=pa.int64())}
        if with_rank:
            out["rank"] = pa.array(np.arange(1, len(order) + 1, dtype=np.int64))
        return pa.table(out)

    survivors = agg.map_batches(topk_part, batch_format="pyarrow",
                                batch_size=None)
    return survivors.repartition(1).map_batches(
        lambda b: topk_part(b, with_rank=True),
        batch_format="pyarrow", batch_size=None)


SQL_TOKEN_TOPK = f"""
WITH t AS (SELECT unnest({_TOKS}) AS tok FROM documents),
c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1)
SELECT tok, n,
       CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT) AS rank
FROM c ORDER BY n DESC, tok LIMIT 25
"""


def q_token_topk_sketch(sf_dir: str, k: int = 25, m: int = 200):
    """Approximate heavy hitters — ``token_topk``'s sketch twin (the
    SpaceSaving/Misra-Gries family): each block keeps only its top-m
    (token, count) rows plus its truncation bound (the count of the
    first DROPPED token, 0 if nothing was dropped); the merge sums
    survivor counts and bounds.  Estimates are one-sided (est ≤ true ≤
    est + max_undercount), so every token whose true count clears the
    k-th estimate by more than the summed bound provably appears.

    Use over the exact path when the vocabulary itself is too big to
    shuffle (web-scale n-grams): the exchange carries ≤ m rows per
    block regardless of block vocabulary.  The bound rides along as a
    null-token row so the same keyed groupby merges counts and bounds
    in one exchange; the gate tests assert the exactness case (bound
    0 -> identical to token_topk) and the undercount contract under
    forced truncation."""
    from ray.data.aggregate import Sum

    from .. import default_num_partitions
    from ..functions.tokenize import flat_tokens_arrow

    ds = _read(sf_dir, "documents", ["text"])

    def partial_sketch(b: pa.Table) -> pa.Table:
        empty = pa.table({"tok": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        vc = pc.value_counts(flat_tokens_arrow(b["text"]))
        tok = vc.field("values").to_numpy(zero_copy_only=False)
        n = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tok, -n))
        bound = int(n[order[m]]) if len(order) > m else 0
        keep = order[:m]
        out = pa.table({"tok": pa.array(tok[keep], type=pa.string()),
                        "n": pa.array(n[keep], type=pa.int64())})
        bound_row = pa.table({"tok": pa.array([None], type=pa.string()),
                              "n": pa.array([bound], type=pa.int64())})
        return pa.concat_tables([out, bound_row])

    agg = ds.map_batches(partial_sketch, batch_format="pyarrow") \
        .groupby("tok", num_partitions=default_num_partitions()) \
        .aggregate(Sum("n", alias_name="n", ignore_nulls=False))

    def trim_part(b: pa.Table) -> pa.Table:
        """Per-partition pre-trim before the single-block merge: each
        token's sum is already FINAL here (tok is the groupby key, so a
        token lives in exactly one partition) — keep this partition's
        top-k plus its bound row; the merge block then holds
        ~k·num_partitions rows instead of ~m·num_blocks."""
        if b.num_rows == 0:
            return pa.table({"tok": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        isnull = pc.is_null(b["tok"]).to_numpy(zero_copy_only=False)
        tok = b["tok"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        t, v = tok[~isnull], n[~isnull]
        keep = np.lexsort((t, -v))[:k]
        return pa.table({
            "tok": pa.array(np.r_[t[keep], tok[isnull]], type=pa.string()),
            "n": pa.array(np.r_[v[keep], n[isnull]], type=pa.int64())})

    agg = agg.map_batches(trim_part, batch_format="pyarrow", batch_size=None)

    def final_topk(b: pa.Table) -> pa.Table:
        schema = {"tok": pa.array([], type=pa.string()),
                  "n_est": pa.array([], type=pa.int64()),
                  "rank": pa.array([], type=pa.int64()),
                  "max_undercount": pa.array([], type=pa.int64())}
        if b.num_rows == 0:
            return pa.table(schema)
        tok = b["tok"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        isnull = pa.compute.is_null(b["tok"]).to_numpy(zero_copy_only=False)
        undercount = int(n[isnull].sum())
        tok, n = tok[~isnull], n[~isnull]
        order = np.lexsort((tok, -n))[:k]
        return pa.table({
            "tok": pa.array(tok[order], type=pa.string()),
            "n_est": pa.array(n[order], type=pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "max_undercount": pa.array(
                np.full(len(order), undercount, dtype=np.int64)),
        })

    return agg.repartition(1).map_batches(final_topk, batch_format="pyarrow",
                                          batch_size=None)


# ---------------------------------------------------------------------
# Bloom-filter decontamination (the broadcast-sketch scale path for
# queries_ext.q_decontaminate's equi-join)
# ---------------------------------------------------------------------

_BLOOM_MAX_BITS = 1 << 30  # 128 MiB broadcast budget


def _bloom_positions(sh: np.ndarray, m: int, n_hashes: int):
    """Double-hashing probe positions for int64 shingle hashes:
    h1 + j*h2 mod m (m a power of two, h2 forced odd)."""
    from ..functions.hashing import splitmix64

    h1 = sh.view(np.uint64)
    h2 = splitmix64(h1 ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    mask = np.uint64(m - 1)
    return [((h1 + np.uint64(j) * h2) & mask).astype(np.int64)
            for j in range(n_hashes)]


_BLOOM_SHARD_SALT = 0xA24BAED4963EE407  # shard hash ≠ position hashes


def _bloom_shards(sh: np.ndarray, n_shards: int) -> np.ndarray:
    """Shard id per shingle hash: a splitmix64 re-mix with its own salt
    so shard assignment is independent of the in-shard probe positions
    (which re-use h1 directly)."""
    from ..functions.hashing import splitmix64

    return (splitmix64(sh.view(np.uint64) ^ np.uint64(_BLOOM_SHARD_SALT))
            & np.uint64(n_shards - 1)).astype(np.int64)


def _set_bits(words: np.ndarray, sh: np.ndarray, m: int, n_hashes: int):
    for idx in _bloom_positions(sh, m, n_hashes):
        np.bitwise_or.at(words, idx >> 6,
                         np.uint64(1) << (idx.view(np.uint64) & np.uint64(63)))


def _test_bits(words: np.ndarray, sh: np.ndarray, m: int, n_hashes: int):
    member = np.ones(len(sh), dtype=bool)
    for idx in _bloom_positions(sh, m, n_hashes):
        bit = (words[idx >> 6]
               >> (idx.view(np.uint64) & np.uint64(63))) & np.uint64(1)
        member &= bit.astype(bool)
    return member


def _tree_or_fold(partials, n_words: int, fanout: int = 4):
    """OR-fold a Dataset of single-row ``words`` partial bitsets into
    ONE row with log_fanout(B) distributed rounds: each round coalesces
    blocks so every task ORs ≤ ``fanout`` partials (task heap =
    fanout · n_words · 8 bytes), all tasks in a round run in parallel.
    Replaces the round-3 driver-serial ``iter_rows`` fold (VERDICT r3
    "What's wrong" #1): total bytes moved ≈ 1.3× the partials, but
    never serially through one process."""

    def or_rows(b: pa.Table) -> pa.Table:
        acc = np.zeros(n_words, dtype=np.uint64)
        for w in b["words"]:
            acc |= np.frombuffer(w.as_py(), dtype=np.uint64)
        return pa.table({"words": pa.array([acc.tobytes()], type=pa.binary())})

    # materialize BEFORE the first count(): on a lazy dataset count()
    # would execute the whole partial-bitset pipeline once and the
    # first repartition would execute it AGAIN (review finding)
    ds = partials.materialize()
    cnt = ds.count()
    while cnt > 1:
        ds = ds.repartition(-(-cnt // fanout)).map_batches(
            or_rows, batch_format="pyarrow", batch_size=None).materialize()
        cnt = ds.count()
    return ds


def q_decontaminate_bloom(sf_dir: str, n: int = 5, bits_per_key: int = 16,
                          n_hashes: int = 4, max_filter_bits: int | None = None):
    """``decontaminate`` with the train side compressed into a Bloom
    filter instead of joined.  One-sided error: counts can only exceed
    the exact join's (superset semantics — safe for decontamination,
    where a false positive merely over-removes).  The pytest gate
    asserts the superset property, a bounded false-positive rate vs
    the exact query, and exact doc-set agreement on the forced
    multi-shard path.

    Two regimes, dispatched on total filter size vs the per-object
    budget (``max_filter_bits``, default 128 MiB):

    - **fits the budget** (one shard): per-block partial bitsets
      (sketch state moves, never keys — the HLL-register pattern)
      OR-folded by a distributed TREE reduction (``_tree_or_fold``),
      then broadcast once via ``ray.put`` and probed inside
      ``map_batches``.
    - **past the budget** (N shards): shingles are hash-ranged into
      N independent sub-filters of ≤ budget bits each.  Train rows
      take ONE keyed repartition on shard so each build task streams
      exactly its shard into its bitset; the test side is then
      CO-PARTITIONED with the filter rows (union + keyed repartition
      on (shard, salt), filter rows replicated once per salt) so each
      probe task holds exactly one sub-filter — no single object ever
      exceeds the budget, nothing folds or fans through the driver,
      and the old hard ``ValueError`` at 1 GiB is gone.  FP rate is
      unchanged: load factor per shard equals the global load factor.

    Use over the join path when the train corpus dwarfs the test set
    (the common case: trillions of train shingles, thousands of eval
    docs): the filter is |train|·bits_per_key bits once, not a
    shuffle of every key."""
    import ray

    from .. import default_num_partitions
    from .queries_ext import _split_shingle_pairs

    budget = max_filter_bits or _BLOOM_MAX_BITS
    if budget < 64 or budget & (budget - 1):
        raise ValueError(f"max_filter_bits must be a power of two >= 64, got {budget}")
    pairs = _split_shingle_pairs(sf_dir, n)
    train = pairs.filter(expr="role == 0").select_columns(["sh"])
    n_train = train.count()
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "n_contaminated": pa.array([], type=pa.int64())})
    if n_train == 0:
        import ray.data as rd

        return rd.from_arrow(empty)
    m_total = 1 << int(np.ceil(np.log2(max(64, n_train * bits_per_key))))
    n_shards = max(1, m_total // budget)
    m = m_total // n_shards  # per-shard bits (power of two)

    test = pairs.filter(expr="role == 1").select_columns(["doc_id", "sh"])

    from ray.data.aggregate import Sum

    def _count_hits(did: np.ndarray) -> pa.Table:
        if not len(did):
            return empty
        u, c = np.unique(did, return_counts=True)
        return pa.table({"doc_id": pa.array(u, type=pa.int64()),
                         "n_contaminated": pa.array(c, type=pa.int64())})

    if n_shards == 1:
        def partial_bits(b: pa.Table) -> pa.Table:
            words = np.zeros(m // 64, dtype=np.uint64)
            _set_bits(words, b["sh"].to_numpy(zero_copy_only=False), m, n_hashes)
            return pa.table({"words": pa.array([words.tobytes()], type=pa.binary())})

        folded_ds = _tree_or_fold(
            train.map_batches(partial_bits, batch_format="pyarrow",
                              batch_size=None),
            m // 64)
        # exactly ONE budget-bounded row crosses to the driver
        folded = np.frombuffer(folded_ds.take_all()[0]["words"], dtype=np.uint64)
        bloom_ref = ray.put(folded)

        def probe(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return empty
            sh = b["sh"].to_numpy(zero_copy_only=False)
            member = _test_bits(ray.get(bloom_ref), sh, m, n_hashes)
            return _count_hits(b["doc_id"].to_numpy(zero_copy_only=False)[member])

        counted = test.map_batches(probe, batch_format="pyarrow")
    else:
        # ---- sharded build: one keyed repartition, partition == shard
        def tag_train(b: pa.Table) -> pa.Table:
            sh = b["sh"].to_numpy(zero_copy_only=False)
            return b.append_column("shard", pa.array(_bloom_shards(sh, n_shards),
                                                     type=pa.int64()))

        def build_shard(b: pa.Table) -> pa.Table:
            fempty = pa.table({"shard": pa.array([], type=pa.int64()),
                               "words": pa.array([], type=pa.binary())})
            if b.num_rows == 0:
                return fempty
            shard = b["shard"].to_numpy(zero_copy_only=False)
            sh = b["sh"].to_numpy(zero_copy_only=False)
            out_s, out_w = [], []
            # a partition usually holds exactly one shard (P == n_shards,
            # shard ids hash-spread); hash collisions just mean one task
            # builds two sub-filters sequentially
            for s in np.unique(shard):
                words = np.zeros(m // 64, dtype=np.uint64)
                _set_bits(words, sh[shard == s], m, n_hashes)
                out_s.append(int(s))
                out_w.append(words.tobytes())
            return pa.table({"shard": pa.array(out_s, type=pa.int64()),
                             "words": pa.array(out_w, type=pa.binary())})

        filters = train.map_batches(tag_train, batch_format="pyarrow") \
            .repartition(num_blocks=n_shards, keys=["shard"], sort=False) \
            .map_batches(build_shard, batch_format="pyarrow", batch_size=None)

        # ---- co-partition probe: replicate each sub-filter once per
        # salt so probe parallelism is P = n_shards·R, not n_shards
        R = max(1, default_num_partitions() // n_shards)

        def replicate(b: pa.Table) -> pa.Table:
            idx = np.repeat(np.arange(b.num_rows, dtype=np.int64), R)
            rep = b.take(pa.array(idx))
            return pa.table({
                "shard": rep["shard"],
                "salt": pa.array(np.tile(np.arange(R, dtype=np.int64),
                                         b.num_rows), type=pa.int64()),
                "doc_id": pa.nulls(len(idx), type=pa.int64()),
                "sh": pa.nulls(len(idx), type=pa.int64()),
                "words": rep["words"],
            })

        def tag_test(b: pa.Table) -> pa.Table:
            from ..functions.hashing import splitmix64

            sh = b["sh"].to_numpy(zero_copy_only=False)
            did = b["doc_id"].to_numpy(zero_copy_only=False)
            salt = (splitmix64(did.view(np.uint64)) % np.uint64(R)).astype(np.int64)
            return pa.table({
                "shard": pa.array(_bloom_shards(sh, n_shards), type=pa.int64()),
                "salt": pa.array(salt, type=pa.int64()),
                "doc_id": b["doc_id"],
                "sh": b["sh"],
                "words": pa.nulls(b.num_rows, type=pa.binary()),
            })

        both = filters.map_batches(replicate, batch_format="pyarrow").union(
            test.map_batches(tag_test, batch_format="pyarrow")) \
            .repartition(num_blocks=n_shards * R, keys=["shard", "salt"],
                         sort=False)

        def probe_part(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return empty
            # split FIRST, convert after: the union's sh/doc_id columns
            # hold nulls on filter rows, and a null-bearing to_numpy
            # silently converts to float64 (whose bit pattern would then
            # be hashed)
            valid = pc.is_valid(b["words"])
            frows = b.filter(valid)
            trows = b.filter(pc.invert(valid))
            fshard = frows["shard"].to_numpy(zero_copy_only=False)
            by_shard = {int(fshard[i]): np.frombuffer(frows["words"][i].as_py(),
                                                      dtype=np.uint64)
                        for i in range(frows.num_rows)}
            sh = trows["sh"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            did = trows["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            tshard = trows["shard"].to_numpy(zero_copy_only=False)
            # a shard with no filter row holds no train shingles →
            # correctly non-member (zeros default)
            member = np.zeros(len(sh), dtype=bool)
            for s, words in by_shard.items():
                smask = tshard == s
                if smask.any():
                    member[smask] = _test_bits(words, sh[smask], m, n_hashes)
            return _count_hits(did[member])

        counted = both.map_batches(probe_part, batch_format="pyarrow",
                                   batch_size=None)

    return counted.groupby("doc_id", num_partitions=default_num_partitions()) \
        .aggregate(Sum("n_contaminated", alias_name="n_contaminated"))


# ---------------------------------------------------------------------
# Token-budget shard assignment (engine addition: training-shard
# packing via a distributed prefix sum)
# ---------------------------------------------------------------------

_SHARD_TOKENS = 4096


def q_token_shards(sf_dir: str, budget: int = _SHARD_TOKENS):
    """Assign every doc (in doc_id order) to a training shard of
    ~``budget`` tokens: shard_id = exclusive-prefix-token-count //
    budget — the deterministic sharding a dataloader uses to cut a
    corpus into equal-token output files.

    Scale shape — a distributed prefix sum (the ``zip_with_index``
    pattern, stages/index.py): per-block token sums travel to the
    driver as ONE metadata row per block, exclusive block offsets are
    broadcast back, and each block adds its in-block exclusive cumsum.
    The driver never sees data rows."""
    import ray

    from .. import scrub_empty_blocks

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(b: pa.Table) -> pa.Table:
        # only n_tokens is needed: tokenize once, diff the offsets
        # (token_stats_batch would also pay the unique/stopword passes)
        _, starts = tokenize_batch(b["text"].to_pylist())
        return pa.table({"doc_id": b["doc_id"],
                         "n_tokens": pa.array(np.diff(starts), type=pa.int64())})

    schema = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64())])
    counted = ds.map_batches(counts, batch_format="pyarrow") \
        .sort("doc_id").materialize()
    counted = scrub_empty_blocks(counted, fallback_schema=schema)

    def block_meta(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"first": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.int64())})
        tot = int(np.sum(b["n_tokens"].to_numpy(zero_copy_only=False)))
        return pa.table({"first": pa.array([b["doc_id"][0].as_py()], type=pa.int64()),
                         "s": pa.array([tot], type=pa.int64())})

    meta = sorted((r["first"], r["s"]) for r in
                  counted.map_batches(block_meta, batch_format="pyarrow",
                                      batch_size=None).take_all())
    offsets, acc = {}, 0
    for first, s in meta:
        offsets[first] = acc
        acc += s
    ref = ray.put(offsets)

    def assign(b: pa.Table, _ref=ref) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_tokens": pa.array([], type=pa.int64()),
                             "shard_id": pa.array([], type=pa.int64())})
        base = ray.get(_ref)[b["doc_id"][0].as_py()]
        nt = b["n_tokens"].to_numpy(zero_copy_only=False)
        excl = base + np.cumsum(nt) - nt
        return pa.table({"doc_id": b["doc_id"],
                         "n_tokens": b["n_tokens"],
                         "shard_id": pa.array(excl // budget, type=pa.int64())})

    return counted.map_batches(assign, batch_format="pyarrow", batch_size=None)


SQL_TOKEN_SHARDS = f"""
WITH s AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
)
SELECT doc_id, n_tokens,
       CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // {_SHARD_TOKENS} AS BIGINT) AS shard_id
FROM s
"""


# ---------------------------------------------------------------------
# Deterministic weighted sampling without replacement (A-Res)
# ---------------------------------------------------------------------

_WS_SEED = ":ws1"
_WS_K = 50


def q_corpus_weighted_sample(sf_dir: str, k: int = _WS_K):
    """Weighted reservoir sampling without replacement (Efraimidis-
    Spirakis A-Res): keep the k docs with the largest ln(u)/w where
    u is a PORTABLE per-doc uniform (md5 of doc_id+seed, the
    ``corpus_split`` hash contract — any system reproduces the draw)
    and w = n_chars + 1 (longer docs proportionally likelier — the
    quality-weighted sampling move of data-mixing pipelines).

    Scale shape: stateless key projection, per-block partial top-k,
    single-block exact merge (the ``token_topk`` pattern) — the
    exchange carries ≤ k rows per block, never the corpus."""
    from ..functions.hashing import md5_hex

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def keys(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        nch = b["n_chars"].to_numpy(zero_copy_only=False)
        hx = md5_hex([f"{d}{_WS_SEED}" for d in did])
        u = (np.array([int(h[:8], 16) for h in hx], dtype=np.float64) + 1.0) \
            / 4294967297.0
        return pa.table({"doc_id": b["doc_id"],
                         "n_chars": b["n_chars"],
                         "key": pa.array(np.log(u) / (nch + 1),
                                         type=pa.float64())})

    def topk(b: pa.Table, with_rank: bool = False) -> pa.Table:
        out = {"doc_id": pa.array([], type=pa.int64()),
               "n_chars": pa.array([], type=pa.int64()),
               "key": pa.array([], type=pa.float64())}
        if with_rank:
            out = {"doc_id": out["doc_id"], "n_chars": out["n_chars"],
                   "rank": pa.array([], type=pa.int64())}
        if b.num_rows == 0:
            return pa.table(out)
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        nch = b["n_chars"].to_numpy(zero_copy_only=False)
        key = b["key"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -key))[:k]
        if with_rank:
            return pa.table({
                "doc_id": pa.array(did[order], type=pa.int64()),
                "n_chars": pa.array(nch[order], type=pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            })
        return pa.table({"doc_id": pa.array(did[order], type=pa.int64()),
                         "n_chars": pa.array(nch[order], type=pa.int64()),
                         "key": pa.array(key[order], type=pa.float64())})

    return ds.map_batches(keys, batch_format="pyarrow") \
        .map_batches(topk, batch_format="pyarrow", batch_size=None) \
        .repartition(1) \
        .map_batches(lambda b: topk(b, with_rank=True),
                     batch_format="pyarrow", batch_size=None)


SQL_CORPUS_WEIGHTED_SAMPLE = f"""
WITH w AS (
  SELECT doc_id, n_chars,
         ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '{_WS_SEED}'), 1, 8)) AS BIGINT) + 1)
            / 4294967297.0) / (n_chars + 1) AS key
  FROM documents
)
SELECT doc_id, n_chars,
       CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS BIGINT) AS rank
FROM w ORDER BY key DESC, doc_id LIMIT {_WS_K}
"""


# ---------------------------------------------------------------------
# Per-row percentile rank within a group (window-function shape)
# ---------------------------------------------------------------------


def q_value_percentile(sf_dir: str):
    """percent_rank() of each event's value within its event_type —
    the per-row window-rank shape (quality-score percentile filtering
    uses exactly this to keep "top X% per domain").

    Scale shape: ONE type-keyed repartition + a lexsort/segment pass —
    rank via each row's position among its group's sorted values
    (average of the SQL RANK convention: ties share their min rank),
    percentile = (rank-1)/(n-1), matching SQL percent_rank exactly."""
    from .. import default_num_partitions
    from .queries import _canon_round

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    parted = ds.repartition(num_blocks=default_num_partitions(),
                            keys=["event_type"], sort=False)

    def pct(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"event_id": pa.array([], type=pa.int64()),
                             "event_type": pa.array([], type=pa.string()),
                             "pct_rank": pa.array([], type=pa.float64())})
        et = b["event_type"].to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        val = b["value"].to_numpy(zero_copy_only=False)
        order, seg, sizes = _lexsort_segments(et, val)
        et, eid, val = et[order], eid[order], val[order]
        pos = np.arange(len(et), dtype=np.int64) - np.repeat(seg, sizes)
        # SQL RANK ties: every row of a tie run takes the run's FIRST
        # position — runs of equal (type, value) map to their start
        tie_start = np.flatnonzero(
            np.r_[True, (et[1:] != et[:-1]) | (val[1:] != val[:-1])])
        tie_sizes = np.diff(np.r_[tie_start, len(et)])
        rank = np.repeat(pos[tie_start], tie_sizes)
        denom = np.maximum(np.repeat(sizes, sizes) - 1, 1)
        return pa.table({
            "event_id": pa.array(eid, type=pa.int64()),
            "event_type": pa.array(et, type=pa.string()),
            "pct_rank": _canon_round(rank / denom, 6),
        })

    return parted.map_batches(pct, batch_format="pyarrow", batch_size=None)


def _sql_value_percentile() -> str:
    from .queries import _sql_round

    return f"""
SELECT event_id, event_type,
       {_sql_round("percent_rank() OVER (PARTITION BY event_type ORDER BY value)", 6)} AS pct_rank
FROM events
"""


# ---------------------------------------------------------------------
# Compression-ratio quality signal (Gopher/RefinedWeb family)
# ---------------------------------------------------------------------


def q_doc_compressibility(sf_dir: str, level: int = 6):
    """Per-doc deflate compression ratio — the classic "too
    compressible = boilerplate/repetition, incompressible = noise"
    quality signal (rows-only: SQL has no deflate; the pytest gate
    pins the ordering and determinism contracts).

    ratio = len(zlib(text_utf8, level)) / max(1, len(text_utf8)).
    Stateless per-doc projection (one C compressor call per doc, the
    md5_hex/exact_dedup precedent), so it streams at any scale."""
    import zlib

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def ratio(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        out = np.empty(len(texts), dtype=np.float64)
        raw_len = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            raw = t.encode("utf-8")
            raw_len[i] = len(raw)
            out[i] = len(zlib.compress(raw, level)) / max(1, len(raw))
        return pa.table({"doc_id": b["doc_id"],
                         "n_bytes": pa.array(raw_len, type=pa.int64()),
                         "compress_ratio": pa.array(out, type=pa.float64())})

    return ds.map_batches(ratio, batch_format="pyarrow")


# ---------------------------------------------------------------------
# Composed training-data-prep pipeline: the end-to-end "corpus_clean"
# ---------------------------------------------------------------------

_CLEAN_MIN_QUALITY = 0.45
_CLEAN_MAX_LINE_FRAC = 0.1
_CLEAN_MAX_NGRAM_FRAC = 0.05


def q_corpus_clean(sf_dir: str):
    """End-to-end corpus cleaning, the composition a real training-data
    pipeline runs (CCNet/C4/Gopher order): language-ID filter (keep
    'en'), quality-score filter, repetition filter, then near-dup
    resolution (keep only each cluster's canonical doc).  Output: the
    kept-document manifest with its headline signals.

    Scale shape: ALL stateless per-doc signals (langid, quality, token
    stats) come from ONE read + ONE map_batches pass — the corpus is
    not re-read per filter.  The repetition signals and the near-dup
    keeper manifest are each their own single pass, attached by
    doc_id-keyed hash joins of already-filtered (shrunken) sides."""
    from .. import default_num_partitions
    from ..functions.textstats import langid_batch, quality_score_batch, token_stats_batch
    from .queries import _canon_round, _empty_guard

    empty = _empty_guard(sf_dir, "documents",
                         {"doc_id": pa.int64(),
                          "quality": pa.float64(),
                          "n_tokens": pa.int64()})
    if empty is not None:
        return empty
    from .queries_ext import q_doc_repetition

    nparts = default_num_partitions()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def signals(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        pretok = tokenize_batch(texts)  # ONE tokenize pass for all signals
        stats = token_stats_batch(texts, pretok=pretok)
        codes, _ = langid_batch(texts, pretok=pretok)
        quality = _canon_round(list(quality_score_batch(texts, stats=stats)), 6)
        n_tokens = pa.array(stats["n_tokens"], type=pa.int64())
        t = pa.table({"doc_id": b["doc_id"],
                      "quality": quality,
                      "n_tokens": n_tokens,
                      "lang_pred": pa.array(list(codes), type=pa.string())})
        keep = pc.and_(pc.equal(t["lang_pred"], "en"),
                       pc.greater_equal(t["quality"], _CLEAN_MIN_QUALITY))
        return t.filter(keep).drop_columns(["lang_pred"])

    sig = ds.map_batches(signals, batch_format="pyarrow")

    def rep_ok(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64())})
        keep = pc.and_(
            pc.less_equal(b["dup_line_frac"], _CLEAN_MAX_LINE_FRAC),
            pc.less_equal(b["dup_ngram_frac"], _CLEAN_MAX_NGRAM_FRAC))
        return b.filter(keep).select(["doc_id"])

    rep = q_doc_repetition(sf_dir).map_batches(rep_ok, batch_format="pyarrow")
    keepers = q_neardup_keep(sf_dir).select_columns(["keep_doc_id"]) \
        .rename_columns({"keep_doc_id": "doc_id"})
    return sig.join(rep, join_type="inner", num_partitions=nparts,
                    on=("doc_id",)) \
              .join(keepers, join_type="inner", num_partitions=nparts,
                    on=("doc_id",))


def _sql_corpus_clean() -> str:
    # direct SQL-constant imports (NOT queries.oracles()): this runs at
    # module level, and both parents may be mid-import — these names
    # are defined before either parent's registration tail, so the
    # composition is safe in every import order
    from .queries import SQL_DOC_QUALITY, _sql_doc_langid
    from .queries import _TOKS as toks
    from .queries_ext import _sql_doc_repetition

    return f"""
WITH lang AS ({_sql_doc_langid()}),
qual AS ({SQL_DOC_QUALITY}),
rep AS ({_sql_doc_repetition()}),
keep AS ({_sql_neardup_keep()})
SELECT d.doc_id, q.quality, CAST(len({toks.replace('text', 'd.text')}) AS BIGINT) AS n_tokens
FROM documents d
JOIN lang l ON l.doc_id = d.doc_id AND l.lang_pred = 'en'
JOIN qual q ON q.doc_id = d.doc_id AND q.quality >= {_CLEAN_MIN_QUALITY}
JOIN rep r ON r.doc_id = d.doc_id
          AND r.dup_line_frac <= {_CLEAN_MAX_LINE_FRAC}
          AND r.dup_ngram_frac <= {_CLEAN_MAX_NGRAM_FRAC}
JOIN keep k ON k.keep_doc_id = d.doc_id
"""


def q_decontaminate_bloom_sharded(sf_dir: str):
    """The FORCED multi-shard Bloom path as its own catalog row: a
    32-KiB (2^18-bit) per-shard budget splits the filter into hash-ranged
    sub-filters (keyed-repartition build + co-partitioned probe), and
    at 64 bits/key + 6 hashes the FP rate (~5e-7 per probe, seedless
    deterministic hashing) makes the output EQUAL the exact join on
    the test tables — so this row shares ``decontaminate``'s DuckDB
    oracle and the driver gate exercises the sharded machinery
    end-to-end, not just pytest."""
    return q_decontaminate_bloom(sf_dir, bits_per_key=64, n_hashes=6,
                                 max_filter_bits=1 << 18)


# ---------------------------------------------------------------------
# Per-domain document caps (engine addition; FineWeb/C4 mix-guard)
# ---------------------------------------------------------------------

_DOMAIN_CAP = 10


def q_domain_caps(sf_dir: str, cap: int = _DOMAIN_CAP):
    """Keep at most ``cap`` docs per canonical HOST, picking the
    highest-quality ones (n_chars DESC, ties to min doc_id): the guard
    against any single domain dominating a training mixture.  Hosts
    come from the same messy-URL synth as ``url_dedup`` so the rank is
    only right if host canonicalization (lowercase, port stripped) is.

    Scale shape: stateless canon+host projection, ONE host-keyed
    repartition + the shared lexsort/segment rank pass — hosts are
    high-cardinality so the hash exchange has no hot key."""
    from .. import default_num_partitions
    from ..functions.urls import canonicalize_urls

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def keys(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        canon = canonicalize_urls(_messy_urls(did))
        host = pc.struct_field(
            pc.extract_regex(canon, r"^[a-z]+://(?P<host>[^/:?#]+)"), "host")
        return pa.table({"host": host, "doc_id": b["doc_id"],
                         "n_chars": b["n_chars"]})

    parted = ds.map_batches(keys, batch_format="pyarrow").repartition(
        num_blocks=default_num_partitions(), keys=["host"], sort=False)

    def pick(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"host": pa.array([], type=pa.string()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "n_chars": pa.array([], type=pa.int64()),
                             "host_rank": pa.array([], type=pa.int64())})
        host = b["host"].to_numpy(zero_copy_only=False)
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        nch = b["n_chars"].to_numpy(zero_copy_only=False)
        order, seg, sizes = _lexsort_segments(host, -nch, did)
        host, did, nch = host[order], did[order], nch[order]
        rank = np.arange(len(did), dtype=np.int64) - np.repeat(seg, sizes) + 1
        keep = rank <= cap
        return pa.table({"host": pa.array(host[keep], type=pa.string()),
                         "doc_id": pa.array(did[keep], type=pa.int64()),
                         "n_chars": pa.array(nch[keep], type=pa.int64()),
                         "host_rank": pa.array(rank[keep], type=pa.int64())})

    return parted.map_batches(pick, batch_format="pyarrow", batch_size=None)


SQL_DOMAIN_CAPS = f"""
WITH c AS (
  SELECT doc_id, n_chars,
         'www.site' || CAST(doc_id % 30 AS VARCHAR) || '.example.com' AS host
  FROM documents
),
r AS (
  SELECT host, doc_id, n_chars,
         CAST(row_number() OVER (PARTITION BY host
                ORDER BY n_chars DESC, doc_id) AS BIGINT) AS host_rank
  FROM c
)
SELECT host, doc_id, n_chars, host_rank FROM r WHERE host_rank <= {_DOMAIN_CAP}
"""


# ---------------------------------------------------------------------
# Token-budget mixture selection (engine addition; data-mixing family)
# ---------------------------------------------------------------------

_MIX_SEED = ":mix1"


def _mix_budget(src: str) -> int:
    """Per-source token budget for the catalog instance — a closed
    form of the driver tables' ``srcN`` naming so the DuckDB oracle
    can replay it.  The operator itself treats budgets as config."""
    return 150 + 40 * (int(src[3:]) % 5)


def q_mixture_budget(sf_dir: str):
    """Deterministic data-mixture selection: within each source, order
    docs by a portable md5 draw (the ``corpus_split`` hash contract)
    and keep docs while the source's EXCLUSIVE token prefix-sum is
    under its budget — the doc that straddles the boundary is kept
    ("fill then stop"), matching how mixing pipelines hit per-source
    token targets.

    Scale shape — a GROUPED distributed prefix sum generalizing
    ``token_shards``: one global sort by (source, draw), then per-block
    per-source-run sums travel to the driver as metadata (≤ sources+1
    rows per block), per-block per-source exclusive offsets broadcast
    back, and each block adds its in-block run-local cumsum.  No data
    row ever moves twice and no source is pinned to one partition."""
    import ray

    from .. import scrub_empty_blocks
    from ..functions.hashing import md5_hex

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def keyed(b: pa.Table) -> pa.Table:
        _, starts = tokenize_batch(b["text"].to_pylist())
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        h = md5_hex([f"{d}{_MIX_SEED}" for d in did])
        return pa.table({"source": b["source"], "doc_id": b["doc_id"],
                         "n_tokens": pa.array(np.diff(starts), type=pa.int64()),
                         "h": pa.array([x[:8] for x in h], type=pa.string())})

    schema = pa.schema([("source", pa.string()), ("doc_id", pa.int64()),
                        ("n_tokens", pa.int64()), ("h", pa.string())])
    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow") \
        .sort(["source", "h", "doc_id"]).materialize()
    keyed_ds = scrub_empty_blocks(keyed_ds, fallback_schema=schema)

    def block_meta(b: pa.Table) -> pa.Table:
        empty = pa.table({"first_source": pa.array([], type=pa.string()),
                          "first_h": pa.array([], type=pa.string()),
                          "first_doc": pa.array([], type=pa.int64()),
                          "source": pa.array([], type=pa.string()),
                          "s": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        src = b["source"].to_numpy(zero_copy_only=False)
        nt = b["n_tokens"].to_numpy(zero_copy_only=False)
        seg = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        sums = np.add.reduceat(nt, seg)
        n = len(seg)
        return pa.table({
            "first_source": pa.array([str(src[0])] * n, type=pa.string()),
            "first_h": pa.array([b["h"][0].as_py()] * n, type=pa.string()),
            "first_doc": pa.array([b["doc_id"][0].as_py()] * n, type=pa.int64()),
            "source": pa.array(src[seg], type=pa.string()),
            "s": pa.array(sums, type=pa.int64()),
        })

    metas = keyed_ds.map_batches(block_meta, batch_format="pyarrow",
                                 batch_size=None).take_all()
    by_block: dict[tuple, list] = {}
    for r in metas:
        bk = (r["first_source"], r["first_h"], r["first_doc"])
        by_block.setdefault(bk, []).append((r["source"], r["s"]))
    offsets: dict[tuple, dict[str, int]] = {}
    acc: dict[str, int] = {}
    for bk in sorted(by_block):
        offsets[bk] = {}
        for src, s in by_block[bk]:
            offsets[bk][src] = acc.get(src, 0)
            acc[src] = acc.get(src, 0) + s
    ref = ray.put(offsets)

    def assign(b: pa.Table, _ref=ref) -> pa.Table:
        empty = pa.table({"source": pa.array([], type=pa.string()),
                          "doc_id": pa.array([], type=pa.int64()),
                          "n_tokens": pa.array([], type=pa.int64()),
                          "cum_before": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        src = b["source"].to_numpy(zero_copy_only=False)
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        nt = b["n_tokens"].to_numpy(zero_copy_only=False)
        bk = (str(src[0]), b["h"][0].as_py(), int(did[0]))
        off = ray.get(_ref)[bk]
        seg = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        sizes = np.diff(np.r_[seg, len(src)])
        cs = np.cumsum(nt)
        base = np.repeat(cs[seg] - nt[seg], sizes)
        excl = (cs - nt - base) + np.repeat(
            np.array([off[s] for s in src[seg]], dtype=np.int64), sizes)
        budget = np.repeat(
            np.array([_mix_budget(s) for s in src[seg]], dtype=np.int64), sizes)
        keep = excl < budget
        return pa.table({"source": pa.array(src[keep], type=pa.string()),
                         "doc_id": pa.array(did[keep], type=pa.int64()),
                         "n_tokens": pa.array(nt[keep], type=pa.int64()),
                         "cum_before": pa.array(excl[keep], type=pa.int64())})

    return keyed_ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


SQL_MIXTURE_BUDGET = f"""
WITH s AS (
  SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         substr(md5(CAST(doc_id AS VARCHAR) || '{_MIX_SEED}'), 1, 8) AS h
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY source
                ORDER BY h, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_before
  FROM s
)
SELECT source, doc_id, n_tokens, cum_before
FROM c
WHERE cum_before < 150 + 40 * (CAST(substr(source, 4) AS BIGINT) % 5)
"""


# ---------------------------------------------------------------------
# Duplicated-ngram fraction (engine addition; Lee et al. 2022 dedup
# signal: how much of a doc is boilerplate shared with other docs)
# ---------------------------------------------------------------------


def q_dup_ngram_fraction(sf_dir: str):
    """Per-doc duplicated-ngram fraction: of a doc's DISTINCT 3-token
    shingles, the fraction that also occur in at least one other doc
    (the corpus-level dup signal of "Deduplicating Training Data Makes
    Language Models Better", Lee et al. 2022).  Shingles are the same
    64-bit rolling hashes as the near-dup/decontamination family (the
    green oracle doubles as a collision check).

    Scale shape: distinct (doc, shingle) explode, ONE shingle-keyed
    repartition + segment dup flag (a shingle row is distinct per doc,
    so segment size == distinct-doc count), then a doc-keyed groupby of
    two int partials — shingle instances never move twice."""
    from ray.data.aggregate import Count, Sum

    from .. import default_num_partitions
    from ..functions.minhash import shingle_hashes

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "sh": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        texts = b["text"].to_pylist()
        flat, starts = tokenize_batch(texts)
        sh, shs = shingle_hashes(flat, starts, k=3)
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        sets = [np.unique(sh[shs[i]:shs[i + 1]]) for i in range(len(texts))]
        counts = np.array([len(s) for s in sets], dtype=np.int64)
        d = np.repeat(did, counts)
        s = np.concatenate(sets)
        return pa.table({"doc_id": pa.array(d, type=pa.int64()),
                         "sh": pa.array(s.view(np.int64), type=pa.int64())})

    parted = ds.map_batches(explode, batch_format="pyarrow").repartition(
        num_blocks=default_num_partitions(), keys=["sh"], sort=False)

    def flag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "dup": pa.array([], type=pa.int64())})
        s = b["sh"].to_numpy(zero_copy_only=False)
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        order, seg, sizes = _lexsort_segments(s, d)
        dup = (np.repeat(sizes, sizes) >= 2).astype(np.int64)
        return pa.table({"doc_id": pa.array(d[order], type=pa.int64()),
                         "dup": pa.array(dup, type=pa.int64())})

    counted = parted.map_batches(flag, batch_format="pyarrow", batch_size=None) \
        .groupby("doc_id", num_partitions=default_num_partitions()) \
        .aggregate(Sum("dup", alias_name="n_dup"),
                   Count(alias_name="n_shingles"))

    def fin(b: pa.Table) -> pa.Table:
        nd = b["n_dup"].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = b["n_shingles"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "n_shingles": pa.array(ns, type=pa.int64()),
                         "n_dup": pa.array(nd, type=pa.int64()),
                         "dup_frac": pa.array(nd / ns, type=pa.float64())})

    return counted.map_batches(fin, batch_format="pyarrow")


def _sql_dup_ngram_fraction() -> str:
    from .queries import _sql_shingles

    return f"""
WITH sh AS ({_sql_shingles()}),
u AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
d AS (SELECT s, count(*) AS nd FROM u GROUP BY 1)
SELECT u.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       sum(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END)
         / CAST(count(*) AS DOUBLE) AS dup_frac
FROM u JOIN d ON u.s = d.s
GROUP BY 1
"""


# ---------------------------------------------------------------------
# Blocking-scheme quality report (ER evaluation: reduction ratio +
# pair completeness vs the shingle-Jaccard near-dup truth)
# ---------------------------------------------------------------------

_BQ_BUCKET = 16


def q_blocking_quality(sf_dir: str):
    """Evaluate an ER blocking scheme — block on (lang, n_tokens//16)
    and report the standard blocking metrics in one row: candidate
    pair count, reduction ratio vs the all-pairs quadratic, and pair
    completeness against the corpus's exact shingle-Jaccard near-dup
    truth (J >= 0.5, the ``neardup_shingle`` output).  The metrics a
    practitioner checks before committing to a blocking key at scale.

    Scale shape: block sizes via ONE keyed groupby count (the result
    is metric-sized — bounded by distinct (lang, bucket) — so the
    driver fold is the er_quality pattern); completeness via two hash
    joins of the (small, pre-filtered) truth pairs against the block
    keys.  No all-pairs materialization anywhere."""
    from ray.data.aggregate import Count

    from .queries import _empty_guard

    empty = _empty_guard(sf_dir, "documents", {"__sentinel": pa.int64()})
    if empty is not None:
        # replicate the SQL's degenerate summary row exactly: counts
        # over empty sets are 0, min/avg aggregates are NULL, and the
        # completeness ratio's COALESCE floor is 1.0
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "n_docs": pa.array([None], type=pa.int64()),
            "n_blocks": pa.array([0], type=pa.int64()),
            "n_candidate_pairs": pa.array([None], type=pa.int64()),
            "reduction_ratio": pa.array([None], type=pa.float64()),
            "n_true_pairs": pa.array([0], type=pa.int64()),
            "n_true_coblocked": pa.array([0], type=pa.int64()),
            "pair_completeness": pa.array([1.0], type=pa.float64())}))

    from .. import default_num_partitions
    from .queries import q_neardup_shingle

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def keys(b: pa.Table) -> pa.Table:
        _, starts = tokenize_batch(b["text"].to_pylist())
        nt = np.diff(starts)
        return pa.table({"doc_id": b["doc_id"], "lang": b["lang"],
                         "bucket": pa.array(nt // _BQ_BUCKET, type=pa.int64())})

    nparts = default_num_partitions()
    keyed = ds.map_batches(keys, batch_format="pyarrow").materialize()
    sizes = keyed.groupby(["lang", "bucket"], num_partitions=nparts) \
        .aggregate(Count(alias_name="c")).take_all()
    n_docs = int(sum(r["c"] for r in sizes))
    n_blocks = len(sizes)
    n_cand = int(sum(r["c"] * (r["c"] - 1) // 2 for r in sizes))

    pairs = q_neardup_shingle(sf_dir) \
        .select_columns(["doc_a", "doc_b"]).materialize()
    n_true = pairs.count()
    if n_true == 0:
        n_cob = 0
    else:
        a_side = keyed.rename_columns(
            {"doc_id": "doc_a", "lang": "lang_a", "bucket": "bucket_a"})
        b_side = keyed.rename_columns(
            {"doc_id": "doc_b", "lang": "lang_b", "bucket": "bucket_b"})
        j = pairs.join(a_side, join_type="inner", num_partitions=nparts,
                       on=("doc_a",))
        j = j.join(b_side, join_type="inner", num_partitions=nparts,
                   on=("doc_b",))
        n_cob = j.filter(
            expr="lang_a == lang_b and bucket_a == bucket_b").count()

    all_pairs = n_docs * (n_docs - 1) / 2.0
    return pa.table({
        "n_docs": pa.array([n_docs], type=pa.int64()),
        "n_blocks": pa.array([n_blocks], type=pa.int64()),
        "n_candidate_pairs": pa.array([n_cand], type=pa.int64()),
        "reduction_ratio": pa.array([1.0 - n_cand / all_pairs],
                                    type=pa.float64()),
        "n_true_pairs": pa.array([n_true], type=pa.int64()),
        "n_true_coblocked": pa.array([n_cob], type=pa.int64()),
        "pair_completeness": pa.array(
            [n_cob / n_true if n_true else 1.0], type=pa.float64()),
    })


def _sql_blocking_quality() -> str:
    from .queries import SQL_NEARDUP_SHINGLE

    return f"""
WITH k AS (
  SELECT doc_id, lang,
         CAST(len({_TOKS}) // {_BQ_BUCKET} AS BIGINT) AS bucket
  FROM documents
),
b AS (SELECT lang, bucket, count(*) AS c FROM k GROUP BY 1, 2),
agg AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(sum(c * (c - 1) // 2) AS BIGINT) AS n_cand
  FROM b
),
truth AS (SELECT doc_a, doc_b FROM ({SQL_NEARDUP_SHINGLE})),
tp AS (
  SELECT CAST(count(*) AS BIGINT) AS n_true,
         CAST(COALESCE(sum(CASE WHEN ka.lang = kb.lang
                                 AND ka.bucket = kb.bucket
                            THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_cob
  FROM truth
  JOIN k ka ON ka.doc_id = truth.doc_a
  JOIN k kb ON kb.doc_id = truth.doc_b
)
SELECT agg.n_docs,
       agg.n_blocks,
       agg.n_cand AS n_candidate_pairs,
       1.0 - agg.n_cand / (agg.n_docs * (agg.n_docs - 1) / 2.0)
         AS reduction_ratio,
       tp.n_true AS n_true_pairs,
       tp.n_cob AS n_true_coblocked,
       CASE WHEN tp.n_true = 0 THEN 1.0
            ELSE tp.n_cob / CAST(tp.n_true AS DOUBLE) END
         AS pair_completeness
FROM agg, tp
"""


# ---------------------------------------------------------------------
# Host-graph PageRank (engine addition; crawl-frontier / URL-filter
# host-reputation family)
# ---------------------------------------------------------------------

_PR_MOD = 30          # host id = doc_id % 30 (the url_dedup host synth)
_PR_DAMPING = 0.85
_PR_ITERS = 3


def q_host_pagerank(sf_dir: str, n_iters: int = _PR_ITERS,
                    damping: float = _PR_DAMPING,
                    max_rank_bytes: int = 512 << 20):
    """Host-level PageRank over a deterministic link multigraph (one
    edge per document: ``doc_id % 30 → (doc_id·7 + 3) % 30``) — the
    host-reputation signal crawl-frontier schedulers and URL filters
    rank by.  Fixed ``n_iters`` power iterations so the DuckDB oracle
    can replay them as unrolled CTEs; rank rounded to 6 digits on both
    sides.

    Scale shape: the EDGES never sit on the driver — they stream once
    into a materialized (src, dst) dataset; per iteration the rank
    vector broadcasts via ``ray.put`` (byte-counted: host-level rank
    state is millions-of-hosts sized, loud failure past the budget
    with the keyed-join fallback named), each block emits per-dst
    partial contribution sums (≤ distinct-dst rows per block), ONE
    small keyed fold reduces them, and ≤ n_hosts tiny rows cross to
    the driver for the update — the ``ivf_centroids`` loop pattern
    with scalar payloads.  Deterministic: order-independent sums,
    host-sorted updates."""
    import ray

    from .. import default_num_partitions
    from .queries import _empty_guard

    empty = _empty_guard(sf_dir, "documents",
                         {"host_id": pa.int64(),
                          "rank": pa.float64()})
    if empty is not None:
        return empty

    ds = _read(sf_dir, "documents", ["doc_id"])

    def edges(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(did % _PR_MOD, type=pa.int64()),
            "dst": pa.array((did * 7 + 3) % _PR_MOD, type=pa.int64()),
        })

    e = ds.map_batches(edges, batch_format="pyarrow").materialize()

    # out-degree (multigraph: multiplicity counts) + node set, via one
    # per-block partial + tiny fold — ≤ n_hosts rows ever move
    def deg_partial(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False)
        dst = b["dst"].to_numpy(zero_copy_only=False)
        s, c = np.unique(src, return_counts=True)
        d = np.unique(dst)
        return pa.table({
            "v": pa.array(np.concatenate([s, d]), type=pa.int64()),
            "d": pa.array(np.concatenate([c, np.zeros(len(d), dtype=np.int64)]),
                          type=pa.int64()),
        })

    # fold the per-block partials by host key BEFORE the driver collect
    # — without this, take_all would concentrate up to
    # 2 × distinct-hosts rows PER BLOCK on the driver; after the fold
    # exactly one row per distinct host crosses, the same bound the
    # per-iteration rank budget below is sized for
    def deg_fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"v": pa.array([], type=pa.int64()),
                             "d": pa.array([], type=pa.int64())})
        v = b["v"].to_numpy(zero_copy_only=False)
        d = b["d"].to_numpy(zero_copy_only=False)
        out_v = np.unique(v)
        acc = np.zeros(len(out_v), dtype=np.int64)
        np.add.at(acc, np.searchsorted(out_v, v), d)
        return pa.table({"v": pa.array(out_v, type=pa.int64()),
                         "d": pa.array(acc, type=pa.int64())})

    rows = e.map_batches(deg_partial, batch_format="pyarrow") \
        .repartition(num_blocks=default_num_partitions(),
                     keys=["v"], sort=False) \
        .map_batches(deg_fold, batch_format="pyarrow", batch_size=None) \
        .take_all()
    vs = np.array([r["v"] for r in rows], dtype=np.int64)
    cs = np.array([r["d"] for r in rows], dtype=np.int64)
    nodes = np.unique(vs)
    deg = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(deg, np.searchsorted(nodes, vs), cs)
    n = len(nodes)

    rank = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        if nodes.nbytes + rank.nbytes + deg.nbytes > max_rank_bytes:
            raise ValueError(
                f"rank state {nodes.nbytes + rank.nbytes + deg.nbytes} bytes "
                f"> budget {max_rank_bytes}; fall back to a keyed-join "
                "iteration (rank dataset joined to edges on src, grouped "
                "by dst) instead of the broadcast")
        ref = ray.put((nodes, rank, deg))

        def contrib(b: pa.Table, _ref=ref) -> pa.Table:
            empty = pa.table({"dst": pa.array([], type=pa.int64()),
                              "s": pa.array([], type=pa.float64())})
            if b.num_rows == 0:
                return empty
            nd, rk, dg = ray.get(_ref)
            src = b["src"].to_numpy(zero_copy_only=False)
            dst = b["dst"].to_numpy(zero_copy_only=False)
            w = rk[np.searchsorted(nd, src)] / dg[np.searchsorted(nd, src)]
            out_d = np.unique(dst)
            s = np.zeros(len(out_d))
            np.add.at(s, np.searchsorted(out_d, dst), w)
            return pa.table({"dst": pa.array(out_d, type=pa.int64()),
                             "s": pa.array(s, type=pa.float64())})

        def fold(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"dst": pa.array([], type=pa.int64()),
                                 "s": pa.array([], type=pa.float64())})
            dst = b["dst"].to_numpy(zero_copy_only=False)
            s = b["s"].to_numpy(zero_copy_only=False)
            out_d = np.unique(dst)
            acc = np.zeros(len(out_d))
            np.add.at(acc, np.searchsorted(out_d, dst), s)
            return pa.table({"dst": pa.array(out_d, type=pa.int64()),
                             "s": pa.array(acc, type=pa.float64())})

        got = e.map_batches(contrib, batch_format="pyarrow") \
            .repartition(num_blocks=min(n, default_num_partitions()),
                         keys=["dst"], sort=False) \
            .map_batches(fold, batch_format="pyarrow", batch_size=None) \
            .take_all()
        new = np.full(n, (1.0 - damping) / n)
        for r in got:
            new[np.searchsorted(nodes, r["dst"])] += damping * r["s"]
        rank = new

    from .queries import _canon_round

    return_table = pa.table({
        "host_id": pa.array(nodes, type=pa.int64()),
        "rank": _canon_round(pa.array(rank, type=pa.float64()), 6),
    })
    import ray.data as rd

    return rd.from_arrow(return_table)


def _sql_host_pagerank() -> str:
    from .queries import _sql_round

    n_expr = "(SELECT cnt FROM n)"
    body = f"SELECT v, 1.0 / {n_expr} AS r FROM nodes"
    for i in range(_PR_ITERS):
        body = f"""
SELECT nodes.v,
       {1.0 - _PR_DAMPING} / {n_expr}
       + {_PR_DAMPING} * COALESCE(SUM(prev.r / deg.d), 0) AS r
FROM nodes
LEFT JOIN e ON e.dst = nodes.v
LEFT JOIN ({body}) prev ON prev.v = e.src
LEFT JOIN deg ON deg.src = e.src
GROUP BY nodes.v"""
    return f"""
WITH e AS (SELECT doc_id % {_PR_MOD} AS src,
                  (doc_id * 7 + 3) % {_PR_MOD} AS dst FROM documents),
nodes AS (SELECT DISTINCT src AS v FROM e UNION SELECT DISTINCT dst FROM e),
n AS (SELECT COUNT(*) AS cnt FROM nodes),
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1)
SELECT v AS host_id, {_sql_round('r', 6)} AS rank FROM ({body}) final
"""


# ---------------------------------------------------------------------
# Triangle counting over the host link graph (engine addition; the
# third classic distributed-graph primitive after PageRank and
# connected components — the clustering-coefficient / community-
# density signal link-spam filters use).  Compact-forward / oriented
# wedge counting (Latapy 2008 lineage).
# ---------------------------------------------------------------------

_TRI_RELS = ((7, 3), (11, 5), (17, 2))


def q_host_triangles(sf_dir: str):
    """(host, n_triangles) for every host on >= 1 triangle of the
    UNDIRECTED simple host graph.  Edge synth: THREE deterministic
    link relations per document, doc_id % 30 -> (a·doc_id + b) % 30
    for (a, b) in _TRI_RELS — host_pagerank's single relation yields
    a functional (out-degree-1) graph, which is triangle-FREE; the
    three-relation union carries 16 triangles, so the oracle
    comparison is non-degenerate.

    Scale shape (oriented wedge counting): the edge multiset streams
    once and dedupes to undirected simple edges with ONE keyed
    exchange; degrees fold from per-block partials (node rows, never
    edges); edges orient low->high under the (degree, id) TOTAL
    order, so every triangle has exactly one apex owning both its
    out-edges and out-degrees are O(sqrt(m))-bounded — hub nodes
    cannot blow up the per-apex pair enumeration; wedges enumerate
    inside ONE src-keyed exchange and the closing edge matches via a
    co-partitioned join on (u, v); matched triangles explode three
    credit rows and fold.  The degree->rank table is node-dimension
    state and broadcasts via ray.put (the pagerank rank-vector
    budget note applies); edges and wedges never sit on the driver."""
    import ray

    from .. import default_num_partitions
    from .queries import _dedup_ab

    nparts = default_num_partitions()
    ds = _read(sf_dir, "documents", ["doc_id"])

    def und_edges(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        aa, bb = [], []
        for fa, fb in _TRI_RELS:
            src = (did % _PR_MOD).astype(np.int64)
            dst = ((did * fa + fb) % _PR_MOD).astype(np.int64)
            m = src != dst
            aa.append(np.minimum(src[m], dst[m]))
            bb.append(np.maximum(src[m], dst[m]))
        return pa.table({"a": pa.array(np.concatenate(aa)),
                         "b": pa.array(np.concatenate(bb))})

    edges = ds.map_batches(und_edges, batch_format="pyarrow") \
        .repartition(num_blocks=nparts, keys=["a", "b"], sort=False) \
        .map_batches(_dedup_ab, batch_format="pyarrow",
                     batch_size=None).materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        n = np.concatenate([b["a"].to_numpy(zero_copy_only=False),
                            b["b"].to_numpy(zero_copy_only=False)])
        u, c = np.unique(n, return_counts=True)
        return pa.table({"node": pa.array(u, type=pa.int64()),
                         "deg": pa.array(c.astype(np.int64),
                                         type=pa.int64())})

    rows = edges.map_batches(deg_partial, batch_format="pyarrow") \
        .take_all()
    agg: dict[int, int] = {}
    for r in rows:  # <= nodes x blocks tiny rows
        agg[r["node"]] = agg.get(r["node"], 0) + r["deg"]
    node_ids = np.array(sorted(agg), dtype=np.int64)
    degs = np.array([agg[n] for n in node_ids], dtype=np.int64)
    # dense rank under the (degree, id) total order
    rank = np.empty(len(node_ids), dtype=np.int64)
    rank[np.lexsort((node_ids, degs))] = np.arange(len(node_ids))
    rref = ray.put((node_ids, rank))

    def _ranks(ids: np.ndarray, table) -> np.ndarray:
        nid, rk = table
        return rk[np.searchsorted(nid, ids)]

    def orient(b: pa.Table, _r=rref) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"src": pa.array([], type=pa.int64()),
                             "dst": pa.array([], type=pa.int64())})
        t = ray.get(_r)
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        swap = _ranks(a, t) > _ranks(bb, t)
        return pa.table({
            "src": pa.array(np.where(swap, bb, a), type=pa.int64()),
            "dst": pa.array(np.where(swap, a, bb), type=pa.int64())})

    oriented = edges.map_batches(orient, batch_format="pyarrow") \
        .materialize()

    def wedges(b: pa.Table, _r=rref) -> pa.Table:
        empty = pa.table({"u": pa.array([], type=pa.int64()),
                          "v": pa.array([], type=pa.int64()),
                          "apex": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        t = ray.get(_r)
        src = b["src"].to_numpy(zero_copy_only=False)
        dst = b["dst"].to_numpy(zero_copy_only=False)
        # per apex: out-neighbours sorted by rank; emit ordered pairs
        order = np.lexsort((_ranks(dst, t), src))
        src, dst = src[order], dst[order]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        sizes = np.diff(np.r_[starts, len(src)])
        us, vs, ap = [], [], []
        for s, n in zip(starts, sizes):
            if n < 2:
                continue
            nb = dst[s:s + n]
            ii, jj = np.triu_indices(n, k=1)
            us.append(nb[ii])
            vs.append(nb[jj])
            ap.append(np.full(len(ii), src[s], dtype=np.int64))
        if not us:
            return empty
        return pa.table({"u": pa.array(np.concatenate(us)),
                         "v": pa.array(np.concatenate(vs)),
                         "apex": pa.array(np.concatenate(ap))})

    w = oriented.repartition(num_blocks=nparts, keys=["src"], sort=False) \
        .map_batches(wedges, batch_format="pyarrow", batch_size=None)

    from .. import scrub_empty_blocks

    closing = oriented.rename_columns({"src": "u", "dst": "v"})
    # w went through a keyed shuffle — scrub zero-column empty blocks
    # before the hash join (engine-wide contract)
    w = scrub_empty_blocks(w.materialize())
    empty_out = pa.table({"host": pa.array([], type=pa.int64()),
                          "n_triangles": pa.array([], type=pa.int64())})
    if w.count() == 0:
        # triangle-free graph: Ray's hash join would synthesize
        # zero-COLUMN blocks from the empty side (the _verify_pairs
        # quirk) — short-circuit with a typed empty result
        import ray.data as rd

        return rd.from_arrow(empty_out)
    tri = w.join(closing, join_type="inner", num_partitions=nparts,
                 on=("u", "v"))

    def credit(b: pa.Table) -> pa.Table:
        n = np.concatenate([b["u"].to_numpy(zero_copy_only=False),
                            b["v"].to_numpy(zero_copy_only=False),
                            b["apex"].to_numpy(zero_copy_only=False)])
        u, c = np.unique(n, return_counts=True)
        return pa.table({"host": pa.array(u, type=pa.int64()),
                         "n_triangles": pa.array(c.astype(np.int64),
                                                 type=pa.int64())})

    def fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"host": pa.array([], type=pa.int64()),
                             "n_triangles": pa.array([],
                                                     type=pa.int64())})
        h = b["host"].to_numpy(zero_copy_only=False)
        c = b["n_triangles"].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h, c = h[order], c[order]
        seg = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        return pa.table({
            "host": pa.array(h[seg], type=pa.int64()),
            "n_triangles": pa.array(
                np.add.reduceat(c, seg).astype(np.int64),
                type=pa.int64())})

    return tri.map_batches(credit, batch_format="pyarrow") \
        .repartition(num_blocks=1) \
        .map_batches(fold, batch_format="pyarrow", batch_size=None)


SQL_HOST_TRIANGLES = f"""
WITH e0 AS ({" UNION ALL ".join(
    f"SELECT doc_id % {_PR_MOD} AS src, "
    f"(doc_id * {fa} + {fb}) % {_PR_MOD} AS dst FROM documents"
    for fa, fb in _TRI_RELS)}),
e AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      FROM e0 WHERE src <> dst),
t AS (
  SELECT a.u AS x, a.v AS y, b.v AS z
  FROM e a JOIN e b ON b.u = a.u AND b.v > a.v
  JOIN e c ON c.u = a.v AND c.v = b.v
),
cr AS (SELECT x AS host FROM t
       UNION ALL SELECT y FROM t
       UNION ALL SELECT z FROM t)
SELECT host, count(*) AS n_triangles FROM cr GROUP BY 1
"""


# ---------------------------------------------------------------------
# Robust winnowing fingerprints (engine addition; Schleimer et al.
# 2003, the MOSS algorithm): per document, the rightmost-minimum
# k-gram hash of every w-window — the guarantee-bearing fingerprint
# selection (any shared substring of >= w+k-1 tokens shares >= 1
# fingerprint) behind plagiarism/clone detection.  Upgrades the
# fingerprint family from rows-only (doc_fingerprints) to
# oracle-gated: hashes are md5-derived, which DuckDB replays exactly.
# ---------------------------------------------------------------------

_WIN_K = 3  # token k-gram width
_WIN_W = 4  # winnow window


def q_doc_winnow(sf_dir: str, k: int = _WIN_K, w: int = _WIN_W):
    """(doc_id, pos, h): the DISTINCT winnowed fingerprints of every
    document — for each window of ``w`` consecutive k-gram positions,
    the rightmost minimum hash; documents with 1..w-1 k-grams
    contribute their single whole-doc window; ties break to the
    RIGHTMOST position (the Schleimer robust-winnowing rule).

    Scale shape: winnowing is strictly per-document — ONE stateless
    map pass, zero shuffle; k-grams build via the Arrow binary-join
    kernel over shifted slices (no python per token) and the md5 runs
    over the batch k-gram VOCABULARY (dictionary-encode first);
    window minima come from one sliding_window_view argmin over the
    reversed window axis (first-min of the reversal IS the rightmost
    minimum)."""
    import hashlib

    from ..functions.tokenize import tokenize_arrow_offsets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "pos": pa.array([], type=pa.int64()),
                      "h": pa.array([], type=pa.int64())})

    def winnow(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, starts = tokenize_arrow_offsets(b["text"])
        n_tok = np.diff(starts)
        if len(flat) < k:
            return empty
        # k-gram strings from shifted slices (arrow kernel, no python
        # per instance); in-doc mask keeps windows that do not cross
        # a document boundary
        parts = [flat.slice(j, len(flat) - k + 1) for j in range(k)]
        joined = pc.binary_join_element_wise(
            *parts, " ")
        doc_of = np.repeat(np.arange(len(ids)), n_tok)
        valid = doc_of[:len(flat) - k + 1] == doc_of[k - 1:]
        if not valid.any():
            return empty
        # md5 over the k-gram VOCABULARY, gathered to instances
        enc = pc.dictionary_encode(joined.filter(pa.array(valid)))
        dic = enc.dictionary.to_pylist()
        vocab_h = np.array(
            [int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
             for s in dic], dtype=np.int64)
        h = vocab_h[enc.indices.to_numpy(zero_copy_only=False)
                    .astype(np.int64)]
        gdoc = doc_of[:len(flat) - k + 1][valid]
        # per-doc 1-based k-gram positions
        gstarts = np.flatnonzero(np.r_[True, gdoc[1:] != gdoc[:-1]])
        gsizes = np.diff(np.r_[gstarts, len(gdoc)])
        pos = np.arange(len(gdoc)) - np.repeat(gstarts, gsizes) + 1

        picks = []  # global indices of selected fingerprints
        if len(h) >= w:
            win = np.lib.stride_tricks.sliding_window_view(h, w)
            ok = gdoc[: len(h) - w + 1] == gdoc[w - 1:]
            if ok.any():
                where = np.flatnonzero(ok)
                arg = w - 1 - np.argmin(win[where, ::-1], axis=1)
                picks.append(where + arg)
        # short docs (1..w-1 grams): one whole-doc window each
        short = np.flatnonzero(gsizes < w)
        for s in short:
            lo = gstarts[s]
            seg = h[lo:lo + gsizes[s]]
            picks.append(np.array(
                [lo + (len(seg) - 1 - np.argmin(seg[::-1]))],
                dtype=np.int64))
        if not picks:
            return empty
        sel = np.unique(np.concatenate(picks))
        return pa.table({
            "doc_id": pa.array(ids[gdoc[sel]], type=pa.int64()),
            "pos": pa.array(pos[sel], type=pa.int64()),
            "h": pa.array(h[sel], type=pa.int64())})

    return ds.map_batches(winnow, batch_format="pyarrow")


def _sql_doc_winnow(k: int = _WIN_K, w: int = _WIN_W) -> str:
    gram = " || ' ' || ".join(
        f"t{j}.t" for j in range(k))
    joins = " ".join(
        f"JOIN tok t{j} ON t{j}.doc_id = t0.doc_id "
        f"AND t{j}.i = t0.i + {j}" for j in range(1, k))
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS t,
         generate_subscripts({_TOKS}, 1) AS i
  FROM documents
),
g AS (
  SELECT t0.doc_id, t0.i AS pos,
         CAST(concat('0x', substr(md5({gram}), 1, 15)) AS BIGINT) AS h
  FROM tok t0 {joins}
),
n AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY 1),
ws AS (
  SELECT doc_id,
         unnest(range(1, greatest(1, ng - {w} + 1) + 1)) AS j
  FROM n
),
m AS (
  SELECT ws.doc_id, ws.j, g.pos, g.h
  FROM ws JOIN g ON g.doc_id = ws.doc_id
              AND g.pos >= ws.j AND g.pos <= ws.j + {w} - 1
),
sel AS (
  SELECT doc_id, pos, h FROM m
  QUALIFY row_number() OVER (PARTITION BY doc_id, j
                             ORDER BY h, pos DESC) = 1
)
SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, h FROM sel
"""


_WC_MIN_SHARED = 2


def q_winnow_candidates(sf_dir: str, min_shared: int = _WC_MIN_SHARED):
    """MOSS step 2 — the fingerprint-index join: all document pairs
    sharing >= ``min_shared`` DISTINCT winnowed fingerprint hashes,
    (doc_a, doc_b, n_shared) with doc_a < doc_b.

    Scale shape: fingerprints (already a tiny sample of each doc)
    dedupe per doc in-map, pairs enumerate inside ONE hash-keyed
    exchange (a bucket is exactly the docs sharing that fingerprint;
    per-bucket pair fan-out is the algorithm's real cost and stays
    uncapped here because the oracle demands exactness — production
    callers drop hyper-common fingerprints the way MOSS drops
    whole-corpus hashes), and per-pair counts fold in ONE
    (a, b)-keyed exchange."""
    from .. import default_num_partitions

    nparts = default_num_partitions()
    fp = q_doc_winnow(sf_dir)

    def per_doc_distinct(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "h": pa.array([], type=pa.int64())})
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        h = b["h"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h, d))
        d, h = d[order], h[order]
        keep = np.ones(len(d), dtype=bool)
        keep[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
        return pa.table({"doc_id": pa.array(d[keep], type=pa.int64()),
                         "h": pa.array(h[keep], type=pa.int64())})

    # winnow emits per-batch rows for whole docs, so the in-map
    # distinct IS global per (doc, h)
    dist = fp.map_batches(per_doc_distinct, batch_format="pyarrow")

    def bucket_pairs(b: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "b": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        h = b["h"].to_numpy(zero_copy_only=False)
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, h))
        h, d = h[order], d[order]
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        sizes = np.diff(np.r_[starts, len(h)])
        a_out, b_out = [], []
        for s, n in zip(starts, sizes):
            if n < 2:
                continue
            grp = d[s:s + n]  # sorted ascending, distinct within h
            ii, jj = np.triu_indices(n, k=1)
            a_out.append(grp[ii])
            b_out.append(grp[jj])
        if not a_out:
            return empty
        a = np.concatenate(a_out)
        bb = np.concatenate(b_out)
        return pa.table({"a": pa.array(a, type=pa.int64()),
                         "b": pa.array(bb, type=pa.int64()),
                         "n": pa.array(np.ones(len(a), dtype=np.int64),
                                       type=pa.int64())})

    def fold_pairs(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                          "doc_b": pa.array([], type=pa.int64()),
                          "n_shared": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((bb, a))
        a, bb, n = a[order], bb[order], n[order]
        seg = np.flatnonzero(np.r_[True, (a[1:] != a[:-1])
                                   | (bb[1:] != bb[:-1])])
        tot = np.add.reduceat(n, seg)
        m = tot >= min_shared
        return pa.table({
            "doc_a": pa.array(a[seg][m], type=pa.int64()),
            "doc_b": pa.array(bb[seg][m], type=pa.int64()),
            "n_shared": pa.array(tot[m].astype(np.int64),
                                 type=pa.int64())})

    return dist.repartition(num_blocks=nparts, keys=["h"], sort=False) \
        .map_batches(bucket_pairs, batch_format="pyarrow",
                     batch_size=None) \
        .repartition(num_blocks=nparts, keys=["a", "b"], sort=False) \
        .map_batches(fold_pairs, batch_format="pyarrow",
                     batch_size=None)


def _sql_winnow_candidates(min_shared: int = _WC_MIN_SHARED) -> str:
    return f"""
WITH f AS (SELECT DISTINCT doc_id, h FROM ({_sql_doc_winnow()}))
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_shared
FROM f x JOIN f y ON x.h = y.h AND x.doc_id < y.doc_id
GROUP BY 1, 2
HAVING count(*) >= {min_shared}
"""


# ---------------------------------------------------------------------
# PMI collocation mining (engine addition): the top adjacent-token
# bigrams by pointwise mutual information — the corpus-analytics
# probe behind phrase detection and tokenizer-merge diagnostics.
# All probabilities come from ONE bigram-count table (N = total
# bigrams, marginals = left/right sums), so the float PMI has a
# single shared expression shape: ln((c·N) / (cl·cr)).
# ---------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOPN = 20


def q_token_pmi(sf_dir: str, min_count: int = _PMI_MIN_COUNT,
                topn: int = _PMI_TOPN):
    """Top-``topn`` adjacent-token bigrams by PMI (count >= min_count),
    ties to (left, right) ascending; (left, right, c, pmi).

    Scale shape: per-block bigram partial counts (vocabulary-pair
    rows, never token instances) -> ONE keyed exchange folds exact
    counts; marginals reduce from the folded table per block and the
    tiny per-block partials fold on the driver (vocab-dimension —
    the broadcast-budget note of host_pagerank applies; the
    distributed alternative is two more keyed joins); N folds the
    same way; scoring + per-block partial top-n then composes under
    (pmi DESC, left, right) into a single-block merge.  Integer
    products stay < 2^63 for corpora up to ~10^9 bigrams with
    per-pair counts <= 10^9 — document-scale guards, not row ops."""
    import math

    from .. import default_num_partitions
    from ..functions.tokenize import tokenize_arrow_offsets
    from .queries import _canon_round

    ds = _read(sf_dir, "documents", ["text"])
    nparts = default_num_partitions()

    empty_big = pa.table({"l": pa.array([], type=pa.string()),
                          "r": pa.array([], type=pa.string()),
                          "c": pa.array([], type=pa.int64())})

    def bigram_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_big
        flat, starts = tokenize_arrow_offsets(b["text"])
        if len(flat) == 0:
            return empty_big
        enc = pc.dictionary_encode(flat)
        dic = np.array(enc.dictionary.to_pylist(), dtype=object)
        code = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        doc_of = np.repeat(np.arange(len(starts) - 1), np.diff(starts))
        same = doc_of[1:] == doc_of[:-1]
        key = code[:-1][same] * len(dic) + code[1:][same]
        if not len(key):
            return empty_big
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "l": pa.array(dic[uk // len(dic)], type=pa.string()),
            "r": pa.array(dic[uk % len(dic)], type=pa.string()),
            "c": pa.array(cnt.astype(np.int64), type=pa.int64())})

    def fold_lr(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_big
        l = np.array(b["l"].to_pylist(), dtype=object)
        r = np.array(b["r"].to_pylist(), dtype=object)
        c = b["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((r.astype("U"), l.astype("U")))
        l, r, c = l[order], r[order], c[order]
        seg = np.flatnonzero(np.r_[True, (l[1:] != l[:-1])
                                   | (r[1:] != r[:-1])])
        return pa.table({
            "l": pa.array(l[seg], type=pa.string()),
            "r": pa.array(r[seg], type=pa.string()),
            "c": pa.array(np.add.reduceat(c, seg).astype(np.int64),
                          type=pa.int64())})

    bigrams = ds.map_batches(bigram_partial, batch_format="pyarrow") \
        .repartition(num_blocks=nparts, keys=["l", "r"], sort=False) \
        .map_batches(fold_lr, batch_format="pyarrow",
                     batch_size=None).materialize()

    def marg_partial(b: pa.Table) -> pa.Table:
        out = {}
        l = b["l"].to_pylist()
        r = b["r"].to_pylist()
        c = b["c"].to_numpy(zero_copy_only=False)
        lm, rm = {}, {}
        for i in range(len(l)):
            lm[l[i]] = lm.get(l[i], 0) + int(c[i])
            rm[r[i]] = rm.get(r[i], 0) + int(c[i])
        toks = sorted(set(lm) | set(rm))
        return pa.table({
            "tok": pa.array(toks, type=pa.string()),
            "cl": pa.array([lm.get(t, 0) for t in toks],
                           type=pa.int64()),
            "cr": pa.array([rm.get(t, 0) for t in toks],
                           type=pa.int64()),
            "n": pa.array([int(c.sum())] + [0] * (len(toks) - 1)
                          if toks else [], type=pa.int64())})

    rows = bigrams.map_batches(marg_partial,
                               batch_format="pyarrow").take_all()
    cl: dict[str, int] = {}
    cr: dict[str, int] = {}
    n_total = 0
    for row in rows:  # vocab-dimension fold, exact integers
        cl[row["tok"]] = cl.get(row["tok"], 0) + row["cl"]
        cr[row["tok"]] = cr.get(row["tok"], 0) + row["cr"]
        n_total += row["n"]

    empty_out = pa.table({"left": pa.array([], type=pa.string()),
                          "right": pa.array([], type=pa.string()),
                          "c": pa.array([], type=pa.int64()),
                          "pmi": pa.array([], type=pa.float64())})
    if n_total == 0:
        import ray.data as rd

        return rd.from_arrow(empty_out)

    def score_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_out
        l = np.array(b["l"].to_pylist(), dtype=object)
        r = np.array(b["r"].to_pylist(), dtype=object)
        c = b["c"].to_numpy(zero_copy_only=False)
        m = c >= min_count
        l, r, c = l[m], r[m], c[m]
        if not len(c):
            return empty_out
        pmi = np.array([math.log((int(cc) * n_total)
                                 / (cl[ll] * cr[rr]))
                        for ll, rr, cc in zip(l, r, c)])
        order = np.lexsort((r.astype("U"), l.astype("U"), -pmi))[:topn]
        return pa.table({"left": pa.array(l[order], type=pa.string()),
                         "right": pa.array(r[order], type=pa.string()),
                         "c": pa.array(c[order], type=pa.int64()),
                         "pmi": pa.array(pmi[order],
                                         type=pa.float64())})

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty_out
        l = np.array(b["left"].to_pylist(), dtype=object)
        r = np.array(b["right"].to_pylist(), dtype=object)
        c = b["c"].to_numpy(zero_copy_only=False)
        pmi = b["pmi"].to_numpy(zero_copy_only=False)
        order = np.lexsort((r.astype("U"), l.astype("U"), -pmi))[:topn]
        return pa.table({"left": pa.array(l[order], type=pa.string()),
                         "right": pa.array(r[order], type=pa.string()),
                         "c": pa.array(c[order], type=pa.int64()),
                         "pmi": _canon_round(list(pmi[order]), 6)})

    return bigrams.map_batches(score_topk, batch_format="pyarrow",
                               batch_size=None) \
        .repartition(num_blocks=1) \
        .map_batches(final, batch_format="pyarrow", batch_size=None)


def _sql_token_pmi(min_count: int = _PMI_MIN_COUNT,
                   topn: int = _PMI_TOPN) -> str:
    from .queries import _sql_round

    pmi = "ln((b.c * g.n) / (lm.cl * rm.cr))"
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS t,
         generate_subscripts({_TOKS}, 1) AS i
  FROM documents
),
bi AS (
  SELECT a.t AS l, b.t AS r FROM tok a
  JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
),
b AS (SELECT l, r, count(*) AS c FROM bi GROUP BY 1, 2),
g AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM b),
lm AS (SELECT l, CAST(sum(c) AS BIGINT) AS cl FROM b GROUP BY 1),
rm AS (SELECT r, CAST(sum(c) AS BIGINT) AS cr FROM b GROUP BY 1)
SELECT b.l AS "left", b.r AS "right", b.c, {_sql_round(pmi, 6)} AS pmi
FROM b CROSS JOIN g
JOIN lm ON lm.l = b.l JOIN rm ON rm.r = b.r
WHERE b.c >= {min_count}
QUALIFY row_number() OVER (ORDER BY {pmi} DESC, b.l, b.r) <= {topn}
"""


# ---------------------------------------------------------------------
# Fuzzy cross-corpus decontamination (engine addition;
# RefinedWeb/FineWeb near-dup decontamination family)
# ---------------------------------------------------------------------

_FD_MOD, _FD_REM = 10, 7
_FD_THRESHOLD = 0.5
_FD_BANDS = 64


def q_fuzzy_decontaminate(sf_dir: str, threshold: float = _FD_THRESHOLD,
                          num_bands: int = _FD_BANDS,
                          max_test_bytes: int = 256 << 20):
    """Fuzzy (MinHash-LSH) cross-corpus decontamination: flag TRAIN
    docs whose 3-shingle Jaccard vs ANY benchmark ("test") doc reaches
    ``threshold``, reporting the best match (max Jaccard, ties to the
    lowest test id).  The test split is the deterministic
    ``doc_id % 10 == 7`` slice — a stand-in benchmark suite, which is
    SMALL next to the train corpus by nature.  The exact n-gram path
    (``decontaminate``) and the Bloom sketch path catch verbatim
    overlap; this is the near-duplicate decontamination that survives
    paraphrase-level edits.

    Scale shape — the asymmetric-broadcast twin of the symmetric
    ``neardup_shingle`` (which needs two keyed exchanges): the
    benchmark side is collected ONCE — its band buckets and exact
    shingle-hash sets broadcast via ``ray.put``, byte-counted with a
    loud over-budget failure — and the train corpus streams through
    ONE signing map pass with NO shuffle: a vectorized ``np.isin``
    over each block's (rows × num_bands) band matrix prunes to
    colliding docs, and exact set-Jaccard runs only on those hits.
    Recall per the LSH bound in ``_neardup_pairs`` (< 1e-8 missed
    pairs at J ≥ 0.5 with 64 bands × 2 rows); the verify is exact
    integer math, so the result equals the all-pairs SQL oracle."""
    import ray

    from ..functions.minhash import band_keys
    from .queries import _doc_sign

    payload = _doc_sign(sf_dir, shingle_k=3).materialize()

    def only_test(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(did % _FD_MOD == _FD_REM))

    test_ds = payload.map_batches(only_test, batch_format="pyarrow")

    # budget check BEFORE the collect — one tiny int row per block
    # crosses to the driver, so an over-budget benchmark side fails
    # loudly instead of OOMing the driver inside take_all (payload is
    # materialized, so this extra metadata scan re-reads object-store
    # blocks, not parquet)
    def bytes_partial(b: pa.Table) -> pa.Table:
        n = 0
        if b.num_rows:
            n = int(pc.sum(pc.binary_length(b["set"])).as_py() or 0) \
                + int(pc.sum(pc.binary_length(b["sig"])).as_py() or 0)
        return pa.table({"bytes": pa.array([n], type=pa.int64())})

    side_bytes = sum(r["bytes"] for r in test_ds.map_batches(
        bytes_partial, batch_format="pyarrow").take_all())
    if side_bytes > max_test_bytes:
        raise ValueError(
            f"benchmark side is {side_bytes} bytes > budget {max_test_bytes}; "
            "shard the test split (run per benchmark suite) or fall back to "
            "the symmetric keyed-exchange path (_neardup_pairs)")

    test_rows = test_ds.take_all()
    test_ids = np.array([r["doc_id"] for r in test_rows], dtype=np.int64)
    test_sets = [np.frombuffer(r["set"], dtype="<u8") for r in test_rows]
    if len(test_rows):
        tsig = np.frombuffer(
            b"".join(r["sig"] for r in test_rows),
            dtype="<u8").reshape(len(test_rows), -1)
        tbands = band_keys(tsig, num_bands)
        buckets: dict[int, list[int]] = {}
        for i in range(len(test_rows)):
            for bk in tbands[i]:
                buckets.setdefault(int(bk), []).append(i)
        all_keys = np.unique(tbands)
    else:
        buckets, all_keys = {}, np.array([], dtype="<u8")
    ref = ray.put((test_ids, test_sets, buckets, all_keys))

    def probe(b: pa.Table, _ref=ref) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "matched_test_id": pa.array([], type=pa.int64()),
                          "jaccard": pa.array([], type=pa.float64())})
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(did % _FD_MOD != _FD_REM))
        if b.num_rows == 0:
            return empty
        t_ids, t_sets, bkt, keys = ray.get(_ref)
        if not len(t_ids):
            return empty
        n = b.num_rows
        sig = np.frombuffer(b"".join(b["sig"].to_pylist()),
                            dtype="<u8").reshape(n, -1)
        bands = band_keys(sig, num_bands)
        hit_mask = np.isin(bands, keys)
        out_d, out_t, out_j = [], [], []
        for i in np.flatnonzero(hit_mask.any(axis=1)):
            cands = sorted({c for bk in bands[i][hit_mask[i]]
                            for c in bkt.get(int(bk), ())})
            S = np.frombuffer(b["set"][i].as_py(), dtype="<u8")
            best_j, best_t = -1.0, -1
            for c in cands:
                inter = len(np.intersect1d(S, t_sets[c], assume_unique=True))
                union = len(S) + len(t_sets[c]) - inter
                j = inter / union if union else 0.0
                if j > best_j or (j == best_j and t_ids[c] < best_t):
                    best_j, best_t = j, int(t_ids[c])
            if best_j >= threshold:
                out_d.append(int(b["doc_id"][i].as_py()))
                out_t.append(best_t)
                out_j.append(best_j)
        return pa.table({"doc_id": pa.array(out_d, type=pa.int64()),
                         "matched_test_id": pa.array(out_t, type=pa.int64()),
                         "jaccard": pa.array(out_j, type=pa.float64())})

    return payload.map_batches(probe, batch_format="pyarrow")


def _sql_fuzzy_decontaminate() -> str:
    from .queries import _sql_shingles

    return f"""
WITH sh AS ({_sql_shingles()}),
u AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
c AS (SELECT doc_id, len(shingles) AS n FROM sh),
p AS (
  SELECT x.doc_id AS train_id, y.doc_id AS test_id, count(*) AS inter
  FROM u x JOIN u y ON x.s = y.s
  WHERE x.doc_id % {_FD_MOD} != {_FD_REM}
    AND y.doc_id % {_FD_MOD} = {_FD_REM}
  GROUP BY 1, 2
),
j AS (
  SELECT train_id, test_id,
         inter / CAST(ca.n + cb.n - inter AS DOUBLE) AS jaccard,
         row_number() OVER (PARTITION BY train_id
           ORDER BY inter / CAST(ca.n + cb.n - inter AS DOUBLE) DESC,
                    test_id) AS rn
  FROM p JOIN c ca ON ca.doc_id = train_id JOIN c cb ON cb.doc_id = test_id
  WHERE inter / CAST(ca.n + cb.n - inter AS DOUBLE) >= {_FD_THRESHOLD}
)
SELECT train_id AS doc_id, test_id AS matched_test_id, jaccard
FROM j WHERE rn = 1
"""


# ---------------------------------------------------------------------
# DSIR importance resampling (engine addition; Xie et al. 2023,
# "Data Selection for Language Models via Importance Resampling")
# ---------------------------------------------------------------------

_DSIR_B = 4096          # hashed-feature buckets = 16^3 (3 hex chars of md5)
_DSIR_K = 50            # resampled corpus size
_DSIR_TARGET_LANG = "en"  # the "target domain" docs defining p_target


def _dsir_buckets(col):
    """Per-token-instance hashed-feature bucket + per-doc offsets.

    The bucket is the first 3 hex chars of md5(token) — the same
    PORTABLE md5 contract as corpus_split (hashlib == DuckDB md5
    byte-for-byte), so a SQL oracle replays the feature hash exactly.
    md5 runs over the VOCABULARY only (dictionary-encode first);
    instances gather the result."""
    import hashlib

    from ..functions.tokenize import tokenize_arrow_offsets

    toks, starts = tokenize_arrow_offsets(col)
    enc = pc.dictionary_encode(toks)
    vocab = enc.dictionary.to_pylist()
    vb = np.array([hashlib.md5(t.encode()).hexdigest()[:3] for t in vocab],
                  dtype="U3")
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return vb[idx], starts


def q_dsir_select(sf_dir: str, k: int = _DSIR_K):
    # k defaults to _DSIR_K, which is FROZEN into the registered oracle
    # SQL (LIMIT clause) — the catalog gate only covers the default;
    # change both together (the TFIDF_K convention).
    """DSIR-style data selection: score every document by its summed
    hashed-unigram log-likelihood ratio between a target distribution
    (docs with ``lang == 'en'``, standing in for the curated target
    corpus) and the raw-corpus distribution, then Gumbel-top-k
    resample — sampling without replacement with probability
    proportional to the importance weight, made
    deterministic by deriving each doc's uniform from a fixed integer
    hash of its id so a SQL oracle replays the draw bit-exactly.

    Both distributions are additively smoothed over the _DSIR_B md5
    feature buckets: lr(b) = ln((t_b+1)/(T+B)) - ln((r_b+1)/(R+B)).

    Scale shape (the DSIR paper's own layout): pass 1 reduces each
    block to a <=B-row partial histogram before ONE tiny groupby (bucket
    counts move, token instances never); the B-row log-ratio table
    broadcasts via ray.put; pass 2 scores map-side with searchsorted
    gathers (zero shuffle); the final top-k keeps k rows per block
    before a k-row global sort.  Nothing instance-sized ever leaves a
    worker."""
    import ray
    from ray.data.aggregate import Sum

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def bucket_counts(b: pa.Table) -> pa.Table:
        empty = pa.table({"b": pa.array([], type=pa.string()),
                          "r": pa.array([], type=pa.int64()),
                          "t": pa.array([], type=pa.int64())})
        if b.num_rows == 0:
            return empty
        binst, starts = _dsir_buckets(b["text"])
        if len(binst) == 0:
            return empty
        # fill_null(False): null lang counts as non-target, matching
        # the SQL FILTER semantics (and .astype chokes on None entries)
        is_t = pc.fill_null(
            pc.equal(b["lang"], _DSIR_TARGET_LANG), False).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(b.num_rows), np.diff(starts))
        order, seg, sizes = _lexsort_segments(binst)
        return pa.table({
            "b": pa.array(binst[order][seg], type=pa.string()),
            "r": pa.array(sizes, type=pa.int64()),
            "t": pa.array(np.add.reduceat(is_t[doc_of][order], seg),
                          type=pa.int64()),
        })

    cnts = docs.map_batches(bucket_counts, batch_format="pyarrow") \
               .groupby("b").aggregate(Sum("r", alias_name="r"),
                                       Sum("t", alias_name="t"))
    # bounded collect: the histogram has <= _DSIR_B rows by construction
    blks = [blk for blk in ray.get(cnts.to_arrow_refs()) if blk.num_rows]
    ct = pa.concat_tables(blks) if blks else pa.table(
        {"b": pa.array([], type=pa.string()),
         "r": pa.array([], type=pa.int64()),
         "t": pa.array([], type=pa.int64())})
    bk = np.asarray(ct["b"].to_pylist(), dtype="U3")
    r = ct["r"].to_numpy(zero_copy_only=False).astype(np.float64)
    t = ct["t"].to_numpy(zero_copy_only=False).astype(np.float64)
    R, T = r.sum(), t.sum()
    lr = np.log((t + 1) / (T + _DSIR_B)) - np.log((r + 1) / (R + _DSIR_B))
    order = np.argsort(bk)
    ref = ray.put((bk[order], lr[order]))

    def score(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "dsir_w": pa.array([], type=pa.float64()),
                          "skey": pa.array([], type=pa.float64())})
        if b.num_rows == 0:
            return empty
        bks, lrs = ray.get(ref)
        binst, starts = _dsir_buckets(b["text"])
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(starts)
        keep = lens > 0  # token-free docs have no feature mass (SQL join drops them)
        if not keep.any():
            return empty
        inst_lr = lrs[np.searchsorted(bks, binst)]
        w = np.add.reduceat(inst_lr, starts[:-1][keep])
        u = ((ids[keep] * 2654435761) % 2**32 + 1) / float(2**32 + 1)
        skey = w - np.log(-np.log(u))
        out = pa.table({
            "doc_id": pa.array(ids[keep], type=pa.int64()),
            "dsir_w": _canon_round(list(w), 6),
            "skey": _canon_round(list(skey), 6),
        })
        # partial top-k: at most k rows leave any block
        sk = out["skey"].to_numpy(zero_copy_only=False)
        top = np.lexsort((ids[keep], -sk))[:k]
        return out.take(pa.array(np.sort(top)))

    scored = docs.map_batches(score, batch_format="pyarrow")
    return scored.sort(["skey", "doc_id"], descending=[True, False]).limit(k)


SQL_DSIR_SELECT = f"""
WITH inst AS (
  SELECT doc_id, lang, unnest({_TOKS}) AS tok FROM documents
), feat AS (
  SELECT doc_id, lang, substr(md5(tok), 1, 3) AS b FROM inst
), cnts AS (
  SELECT b, count(*) AS r,
         count(*) FILTER (WHERE lang = '{_DSIR_TARGET_LANG}') AS t
  FROM feat GROUP BY b
), tot AS (
  SELECT CAST(sum(r) AS DOUBLE) AS rr, CAST(sum(t) AS DOUBLE) AS tt FROM cnts
), lr AS (
  SELECT b, ln((t + 1) / (tt + {_DSIR_B})) - ln((r + 1) / (rr + {_DSIR_B})) AS lr
  FROM cnts, tot
), w AS (
  SELECT f.doc_id, sum(l.lr) AS w
  FROM feat f JOIN lr l USING (b) GROUP BY f.doc_id
), keyed AS (
  SELECT doc_id, w,
         w - ln(-ln(((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 + 1) / 4294967297.0)) AS skey
  FROM w
)
SELECT doc_id, {{w6}} AS dsir_w, {{s6}} AS skey
FROM keyed ORDER BY {{s6}} DESC, doc_id LIMIT {_DSIR_K}
"""


def _sql_dsir_select() -> str:
    from .queries import _sql_round

    return SQL_DSIR_SELECT.format(w6=_sql_round("w", 6),
                                  s6=_sql_round("skey", 6))


# ---------------------------------------------------------------------
# Leakage-safe host-level split (engine addition; group-split family)
# ---------------------------------------------------------------------


def q_host_split(sf_dir: str):
    """Train/val/test assignment by HOST, not by document: every page
    of a site lands in the same split, so near-duplicate pages (mirror
    boilerplate, templated content) can never straddle the train/test
    boundary — the leakage guard corpus_split (per-doc md5) cannot
    give.  Buckets and thresholds are the same portable md5 contract
    as corpus_split, applied to the canonical host string.

    Scale shape: stateless projection (host synth → md5 bucket →
    threshold compare), zero shuffle; md5 runs once per UNIQUE host in
    the batch (dictionary-encode first), documents gather."""
    import hashlib

    from .queries_ext import SPLIT_TRAIN_MAX, SPLIT_VAL_MAX

    ds = _read(sf_dir, "documents", ["doc_id"])

    def assign(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        host = pc.binary_join_element_wise(
            "www.site", pa.array((did % 30).astype(str)), ".example.com", "")
        enc = pc.dictionary_encode(host)
        hb = np.array([hashlib.md5(h.encode()).hexdigest()[:2]
                       for h in enc.dictionary.to_pylist()], dtype="U2")
        bucket = hb[enc.indices.to_numpy(zero_copy_only=False)]
        split = np.where(bucket < SPLIT_TRAIN_MAX, "train",
                         np.where(bucket < SPLIT_VAL_MAX, "val", "test"))
        return pa.table({
            "doc_id": b["doc_id"],
            "host": host,
            "bucket": pa.array(bucket.tolist(), type=pa.string()),
            "split": pa.array(split.tolist(), type=pa.string()),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def _sql_host_split() -> str:
    from .queries_ext import SPLIT_TRAIN_MAX, SPLIT_VAL_MAX

    return f"""
WITH h AS (
  SELECT doc_id,
         'www.site' || CAST(doc_id % 30 AS VARCHAR) || '.example.com' AS host
  FROM documents
), b AS (
  SELECT doc_id, host, substr(md5(host), 1, 2) AS bucket FROM h
)
SELECT doc_id, host, bucket,
       CASE WHEN bucket < '{SPLIT_TRAIN_MAX}' THEN 'train'
            WHEN bucket < '{SPLIT_VAL_MAX}' THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


# ---------------------------------------------------------------------
# Within-document duplicate-line removal (engine addition; the
# map-only self-dedup that Gopher/FineWeb run before the GLOBAL C4
# line dedup — q_line_dedup is the shuffle form, this is the
# shuffle-FREE form)
# ---------------------------------------------------------------------


def q_selfdup_lines(sf_dir: str):
    """Drop repeated lines WITHIN each document (keep the first
    occurrence in line order) and re-join the survivors — boilerplate
    self-repetition trim.  Lines are the same 10-token windows as
    q_line_dedup, plus a planted self-duplicate (docs with
    ``doc_id % 3 == 0`` repeat their own first line at the end) so the
    trim provably fires.  Output per doc: total/kept line counts and
    the cleaned text.

    Scale shape: ZERO shuffle — every step is doc-local, so this is a
    single stateless ``map_batches`` projection that streams at read
    bandwidth no matter the corpus size (contrast q_line_dedup, whose
    corpus-wide semantics force one keyed exchange).  Line build is
    the shared Arrow ``binary_join`` ListArray kernel; the dedup is
    one lexsort + neighbor mask per batch."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def trim(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "n_lines": pa.array([], type=pa.int64()),
                          "n_kept": pa.array([], type=pa.int64()),
                          "clean": pa.array([], type=pa.string())})
        if b.num_rows == 0:
            return empty
        texts = b["text"].to_pylist()
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, starts = tokenize_batch(texts)
        lens = np.diff(starts)
        n_lines = -(-lens // _LINE_TOKENS)  # ceil; 0 for token-free docs
        doc_rep = np.repeat(np.arange(len(ids), dtype=np.int64), n_lines)
        lidx = np.arange(n_lines.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(n_lines) - n_lines, n_lines)
        line_starts = np.repeat(starts[:-1], n_lines) + lidx * _LINE_TOKENS
        if starts[-1] >= 2**31:  # int32 list offsets: fail loudly, not wrap
            raise ValueError(
                f"batch has {starts[-1]} flat tokens (>= 2^31); lower "
                f"batch_size so ListArray int32 offsets cannot overflow")
        offsets = np.append(line_starts, starts[-1]).astype(np.int32)
        la = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                      pa.array(flat, type=pa.string()))
        line = pc.binary_join(la, " ").to_numpy(zero_copy_only=False)

        # plant: docs with doc_id % 3 == 0 (and >=1 line) repeat their
        # own first line after the last
        first_pos = np.flatnonzero(lidx == 0)
        pm = ids[doc_rep[first_pos]] % 3 == 0
        doci = np.r_[doc_rep, doc_rep[first_pos][pm]]
        li = np.r_[lidx, n_lines[doc_rep[first_pos][pm]]]
        ln_ = np.r_[line, line[first_pos][pm]]

        # within-doc first occurrence per distinct line
        order = np.lexsort((li, ln_, doci))
        d_s, l_s = doci[order], ln_[order]
        new_seg = np.r_[True, (d_s[1:] != d_s[:-1]) | (l_s[1:] != l_s[:-1])]
        keep_idx = order[new_seg]
        k_doc, k_li, k_line = doci[keep_idx], li[keep_idx], ln_[keep_idx]
        o2 = np.lexsort((k_li, k_doc))
        k_doc, k_line = k_doc[o2], k_line[o2]

        kept_per_doc = np.bincount(k_doc, minlength=len(ids))
        k_offs = np.r_[0, np.cumsum(kept_per_doc)].astype(np.int32)
        kla = pa.ListArray.from_arrays(
            pa.array(k_offs, type=pa.int32()),
            pa.array(k_line.tolist(), type=pa.string()))
        clean = pc.binary_join(kla, " ")

        m = n_lines > 0  # token-free docs have no lines (SQL drops them)
        tot = n_lines + ((ids % 3 == 0) & m)
        return pa.table({
            "doc_id": pa.array(ids[m], type=pa.int64()),
            "n_lines": pa.array(tot[m], type=pa.int64()),
            "n_kept": pa.array(kept_per_doc[m], type=pa.int64()),
            "clean": clean.filter(pa.array(m)),
        })

    return docs.map_batches(trim, batch_format="pyarrow")


SQL_SELFDUP_LINES = f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS}) AS tok,
         unnest(range(1, len({_TOKS}) + 1)) AS ord
  FROM documents
),
content AS (
  SELECT doc_id, CAST((ord - 1) // {_LINE_TOKENS} AS BIGINT) AS line_idx,
         string_agg(tok, ' ' ORDER BY ord) AS line
  FROM t GROUP BY doc_id, (ord - 1) // {_LINE_TOKENS}
),
nl AS (SELECT doc_id, count(*) AS n_raw FROM content GROUP BY doc_id),
plant AS (
  SELECT c.doc_id, nl.n_raw AS line_idx, c.line
  FROM content c JOIN nl USING (doc_id)
  WHERE c.line_idx = 0 AND c.doc_id % 3 = 0
),
lines AS (SELECT * FROM content UNION ALL SELECT * FROM plant),
ranked AS (
  SELECT doc_id, line_idx, line,
         row_number() OVER (PARTITION BY doc_id, line ORDER BY line_idx) AS rn
  FROM lines
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(line, ' ' ORDER BY line_idx) AS clean
  FROM ranked WHERE rn = 1 GROUP BY doc_id
)
SELECT a.doc_id,
       CAST(nl.n_raw + CASE WHEN a.doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_lines,
       a.n_kept, a.clean
FROM agg a JOIN nl USING (doc_id)
"""


# ---------------------------------------------------------------------
# Per-host boilerplate-line removal (engine addition; the CCNet move:
# a line that appears in "most documents of the same web host" is
# chrome — nav bars, cookie banners, copyright footers — not content,
# and is stripped from EVERY document of that host.  Complements
# q_line_dedup, whose corpus-GLOBAL rule keeps one copy; the host rule
# keeps none, but only fires when the within-host document-frequency
# clears a threshold.)
# ---------------------------------------------------------------------

_HB_HOSTS = 30        # same host derivation as domain_caps / url_dedup
_HB_FRAC = 0.5        # line is boilerplate if it appears in >= this
                      # fraction of the host's line-bearing docs ...
_HB_MIN_DOCS = 2      # ... and in at least this many distinct docs


def q_host_boilerplate(sf_dir: str):
    """Strip per-host boilerplate lines (CCNet-style): for each host,
    any line occurring in >= max(ceil(0.5 * host_docs), 2) distinct
    documents of that host is removed from ALL of them.  "Lines" are
    the module's 10-token windows; hosts derive deterministically from
    doc_id (30 hosts, the domain_caps scheme); the plant appends a
    host-specific copyright footer to 4/5 of each host's docs so the
    rule provably fires on every test corpus.  The denominator counts
    the host's LINE-BEARING docs (a token-free doc contributes no
    lines and no count — documented contract, replayed in SQL).
    Output per doc: host, total/kept line counts, the cleaned text
    ('' when everything was chrome).

    Scale shape: vectorized line build (the shared ListArray +
    ``binary_join`` kernel), then ONE repartition keyed on host —
    after which doc-frequency counting, threshold test, filtering and
    per-doc re-join are all segment passes inside the partition (no
    per-group pandas, no second shuffle).  Host key cardinality is
    millions at web scale (far above the partition count), and a
    pathological mega-host degrades to one partition's worth of
    lexsort — not a driver failure."""
    from .. import default_num_partitions

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def lines(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, starts = tokenize_batch(texts)
        lens = np.diff(starts)
        n_lines = -(-lens // _LINE_TOKENS)  # ceil; 0 for token-free docs
        doc_rep = np.repeat(ids, n_lines)
        lidx = np.arange(n_lines.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(n_lines) - n_lines, n_lines)
        line_starts = np.repeat(starts[:-1], n_lines) + lidx * _LINE_TOKENS
        if starts[-1] >= 2**31:  # int32 list offsets: fail loudly, not wrap
            raise ValueError(
                f"batch has {starts[-1]} flat tokens (>= 2^31); lower "
                f"batch_size so ListArray int32 offsets cannot overflow")
        offsets = np.append(line_starts, starts[-1]).astype(np.int32)
        la = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                      pa.array(flat, type=pa.string()))
        content = pa.table({
            "doc_id": pa.array(doc_rep, type=pa.int64()),
            "line_idx": pa.array(lidx, type=pa.int64()),
            "line": pc.binary_join(la, " "),
        })
        # plant: 4/5 of docs carry their host's copyright footer as a
        # final line (host-specific text, so it can never collide
        # across hosts the way the global newsletter plant does)
        pm = ids % 5 != 4
        bp_ids = ids[pm]
        bp = pa.table({
            "doc_id": pa.array(bp_ids, type=pa.int64()),
            "line_idx": pa.array(n_lines[pm], type=pa.int64()),
            "line": pc.binary_join_element_wise(
                "copyright site ",
                pa.array((bp_ids % _HB_HOSTS).astype(str)),
                " all rights reserved", ""),
        })
        t = pa.concat_tables([content, bp])
        host = pc.binary_join_element_wise(
            "www.site",
            pa.array((t["doc_id"].to_numpy(zero_copy_only=False)
                      % _HB_HOSTS).astype(str)),
            ".example.com", "")
        return t.append_column("host", host)

    parted = ds.map_batches(lines, batch_format="pyarrow").repartition(
        num_blocks=default_num_partitions(), keys=["host"], sort=False)

    def strip(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "host": pa.array([], type=pa.string()),
                          "n_lines": pa.array([], type=pa.int64()),
                          "n_kept": pa.array([], type=pa.int64()),
                          "clean": pa.array([], type=pa.string())})
        if b.num_rows == 0:
            return empty
        host = b["host"].to_numpy(zero_copy_only=False)
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        lix = b["line_idx"].to_numpy(zero_copy_only=False)
        line = b["line"].to_numpy(zero_copy_only=False)

        # host_docs: distinct docs per host (doc_id encodes its host,
        # so distinct doc_id segments within a doc_id sort are enough)
        d_order = np.lexsort((lix, did))
        d_sorted = did[d_order]
        d_new = np.r_[True, d_sorted[1:] != d_sorted[:-1]]
        u_docs = d_sorted[d_new]                      # distinct doc ids
        u_hosts = host[d_order][d_new]
        h_order, h_seg, h_sizes = _lexsort_segments(u_hosts)
        host_docs = {u_hosts[h_order[s]]: int(n)
                     for s, n in zip(h_seg, h_sizes)}

        # doc-frequency per (host, line): sort by (host, line, doc),
        # count distinct docs per (host, line) run
        order = np.lexsort((did, line, host))
        h_s, l_s, d_s = host[order], line[order], did[order]
        pair_new = np.r_[True, (h_s[1:] != h_s[:-1]) | (l_s[1:] != l_s[:-1])]
        doc_new = pair_new | np.r_[True, d_s[1:] != d_s[:-1]]
        pair_id = np.cumsum(pair_new) - 1
        df = np.bincount(pair_id[doc_new])            # distinct-doc freq
        # ceil(nd * _HB_FRAC) with _HB_FRAC = 1/2 kept in integer math
        # so engine and SQL can never disagree on a float boundary
        thresh = np.array([max(_HB_MIN_DOCS, -(-host_docs[h_s[s]] // 2))
                           for s in np.flatnonzero(pair_new)])
        is_bp_pair = df >= thresh
        is_bp = np.empty(len(order), dtype=bool)
        is_bp[order] = is_bp_pair[pair_id]            # back to input order

        keep = ~is_bp
        k_did, k_lix, k_line = did[keep], lix[keep], line[keep]
        o2 = np.lexsort((k_lix, k_did))
        k_did, k_line = k_did[o2], k_line[o2]
        k_new = np.r_[True, k_did[1:] != k_did[:-1]]
        kept_per = np.diff(np.r_[np.flatnonzero(k_new), len(k_did)])

        # every doc in the partition gets an output row, including
        # docs whose every line was chrome (n_kept=0, clean='')
        n_per = np.bincount(
            np.searchsorted(u_docs, d_sorted), minlength=len(u_docs))
        n_kept = np.zeros(len(u_docs), dtype=np.int64)
        if len(k_did):
            n_kept[np.searchsorted(u_docs, k_did[k_new])] = kept_per
        clean = np.full(len(u_docs), "", dtype=object)
        if len(k_did):
            offs = np.r_[0, np.cumsum(kept_per)].astype(np.int32)
            kla = pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()),
                pa.array(k_line.tolist(), type=pa.string()))
            clean[np.searchsorted(u_docs, k_did[k_new])] = (
                pc.binary_join(kla, " ").to_numpy(zero_copy_only=False))
        return pa.table({
            "doc_id": pa.array(u_docs, type=pa.int64()),
            "host": pa.array(u_hosts, type=pa.string()),
            "n_lines": pa.array(n_per, type=pa.int64()),
            "n_kept": pa.array(n_kept, type=pa.int64()),
            "clean": pa.array(clean, type=pa.string()),
        })

    return parted.map_batches(strip, batch_format="pyarrow", batch_size=None)


SQL_HOST_BOILERPLATE = f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS}) AS tok,
         unnest(range(1, len({_TOKS}) + 1)) AS ord
  FROM documents
),
content AS (
  SELECT doc_id, CAST((ord - 1) // {_LINE_TOKENS} AS BIGINT) AS line_idx,
         string_agg(tok, ' ' ORDER BY ord) AS line
  FROM t GROUP BY doc_id, (ord - 1) // {_LINE_TOKENS}
),
bp AS (
  SELECT doc_id,
         CAST((len({_TOKS}) + {_LINE_TOKENS - 1}) // {_LINE_TOKENS} AS BIGINT) AS line_idx,
         'copyright site ' || CAST(doc_id % {_HB_HOSTS} AS VARCHAR)
           || ' all rights reserved' AS line
  FROM documents WHERE doc_id % 5 != 4
),
lines AS (
  SELECT doc_id,
         'www.site' || CAST(doc_id % {_HB_HOSTS} AS VARCHAR)
           || '.example.com' AS host,
         line_idx, line
  FROM (SELECT * FROM content UNION ALL SELECT * FROM bp)
),
hd AS (SELECT host, count(DISTINCT doc_id) AS nd FROM lines GROUP BY host),
lf AS (
  SELECT host, line, count(DISTINCT doc_id) AS df
  FROM lines GROUP BY host, line
),
chrome AS (
  SELECT lf.host, lf.line
  FROM lf JOIN hd USING (host)
  WHERE lf.df >= GREATEST({_HB_MIN_DOCS}, CAST(CEIL(hd.nd * 0.5) AS BIGINT))
),
kept AS (
  SELECT l.* FROM lines l
  LEFT JOIN chrome c ON l.host = c.host AND l.line = c.line
  WHERE c.line IS NULL
),
docs AS (
  SELECT doc_id, host, CAST(count(*) AS BIGINT) AS n_lines
  FROM lines GROUP BY doc_id, host
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(line, ' ' ORDER BY line_idx) AS clean
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, d.host, d.n_lines,
       COALESCE(a.n_kept, 0) AS n_kept,
       COALESCE(a.clean, '') AS clean
FROM docs d LEFT JOIN agg a USING (doc_id)
"""


# ---------------------------------------------------------------------
# BPE merge training (engine addition; the Sennrich-2016 "Neural
# Machine Translation of Rare Words with Subword Units" learner: from
# a word-frequency table, repeatedly merge the most frequent adjacent
# symbol pair — greedy leftmost non-overlapping application, count
# weighted by word frequency, deterministic tie-break).  This is the
# tokenizer-training step of an LLM data pipeline.
# ---------------------------------------------------------------------

_BPE_ROUNDS = 8


def _bpe_flat(block):
    """(vals, offs, lens, cnt) with offs rebased to 0."""
    la = block["symbols"].combine_chunks()
    offs = np.asarray(la.offsets, dtype=np.int64)
    vals = la.values.to_numpy(zero_copy_only=False)[offs[0]:offs[-1]]
    offs = offs - offs[0]
    cnt = block["cnt"].to_numpy(zero_copy_only=False)
    return vals, offs, np.diff(offs), cnt


def _bpe_symbols_table(word: np.ndarray, cnt: np.ndarray) -> pa.Table:
    """(unique words, counts) -> {'symbols': list<string>, 'cnt'} block
    where each word's symbols start as its characters (the Sennrich
    initial state; no end-of-word marker — documented simplification)."""
    lens = np.char.str_len(word.astype(str)).astype(np.int64)
    joined = "".join(word.tolist())
    if len(joined) >= 2**31:
        raise ValueError("vocabulary block exceeds int32 list offsets; "
                         "raise the partition count")
    offs = np.r_[0, np.cumsum(lens)].astype(np.int32)
    la = pa.ListArray.from_arrays(
        pa.array(offs, type=pa.int32()),
        pa.array(list(joined), type=pa.string()))
    return pa.table({"symbols": la,
                     "cnt": pa.array(cnt.astype(np.int64), type=pa.int64())})


def _bpe_to_symbols(b: pa.Table) -> pa.Table:
    """Post-exchange fold: merge duplicate words (one keyed repartition
    upstream guarantees a word lands in exactly one block) and expand
    each to its initial symbol list."""
    empty = pa.table({"symbols": pa.array([], type=pa.list_(pa.string())),
                      "cnt": pa.array([], type=pa.int64())})
    if b.num_rows == 0:
        return empty
    word = b["word"].to_numpy(zero_copy_only=False)
    cnt = b["cnt"].to_numpy(zero_copy_only=False)
    order, seg, _ = _lexsort_segments(word)
    word = word[order][np.r_[seg]]
    total = np.add.reduceat(cnt[order], seg).astype(np.int64)
    return _bpe_symbols_table(word, total)


def _bpe_pair_counts(block) -> pa.Table:
    """Per-block adjacent-pair counts weighted by word frequency; the
    return size is bounded by (|alphabet| + merges-so-far)^2, never by
    corpus size."""
    empty = pa.table({"lhs": pa.array([], type=pa.string()),
                      "rhs": pa.array([], type=pa.string()),
                      "cnt": pa.array([], type=pa.int64())})
    if block.num_rows == 0:
        return empty
    vals, offs, lens, cnt = _bpe_flat(block)
    if len(vals) < 2:
        return empty
    # dictionary-encode once: pair keys become one int64 per pair
    enc = pa.array(vals, type=pa.string()).dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dic = enc.dictionary.to_numpy(zero_copy_only=False)
    valid = np.ones(len(vals) - 1, dtype=bool)
    b_pos = offs[1:] - 1          # last flat slot of each word
    b_pos = b_pos[(b_pos >= 0) & (b_pos < len(valid))]
    valid[b_pos] = False          # pairs may not cross words
    if not valid.any():
        return empty
    key = codes[:-1][valid] * len(dic) + codes[1:][valid]
    w = np.repeat(cnt, lens)[:-1][valid]
    acc = np.zeros(len(dic) * len(dic), dtype=np.int64)
    np.add.at(acc, key, w)
    nz = np.flatnonzero(acc)
    return pa.table({
        "lhs": pa.array(dic[nz // len(dic)], type=pa.string()),
        "rhs": pa.array(dic[nz % len(dic)], type=pa.string()),
        "cnt": pa.array(acc[nz], type=pa.int64())})


def _bpe_apply_merge(block, lhs: str, rhs: str) -> pa.Table:
    """Rewrite every word's symbol list under merge (lhs, rhs) —
    greedy leftmost non-overlapping ("aaa" under (a,a) becomes
    ["aa","a"], never ["a","aa"])."""
    if block.num_rows == 0:
        return block
    vals, offs, lens, cnt = _bpe_flat(block)
    valid = np.zeros(max(len(vals) - 1, 0), dtype=bool)
    if len(valid):
        valid[:] = (vals[:-1] == lhs) & (vals[1:] == rhs)
        b_pos = offs[1:] - 1
        b_pos = b_pos[(b_pos >= 0) & (b_pos < len(valid))]
        valid[b_pos] = False
    cand = np.flatnonzero(valid)
    if not len(cand):
        return block
    # greedy leftmost non-overlapping: within a run of consecutive
    # candidates (only possible when lhs == rhs), keep alternates
    run_start = np.r_[True, np.diff(cand) != 1]
    first = np.flatnonzero(run_start)
    pos_in_run = np.arange(len(cand)) - first[np.cumsum(run_start) - 1]
    keep = cand[pos_in_run % 2 == 0]
    vals2 = vals.copy()
    vals2[keep] = lhs + rhs
    new_vals = np.delete(vals2, keep + 1)
    word_of = np.searchsorted(offs, keep, side="right") - 1
    new_lens = lens - np.bincount(word_of, minlength=len(lens))
    new_offs = np.r_[0, np.cumsum(new_lens)].astype(np.int32)
    la = pa.ListArray.from_arrays(
        pa.array(new_offs, type=pa.int32()),
        pa.array(new_vals.tolist(), type=pa.string()))
    return pa.table({"symbols": la,
                     "cnt": pa.array(cnt, type=pa.int64())})


def _bpe_learn(sf_dir: str, rounds: int = _BPE_ROUNDS) -> pa.Table:
    """Run the distributed Sennrich learner and return the merge table
    (merge_rank, lhs, rhs, cnt) as a driver-side Arrow table (K rows —
    driver-scale by construction).

    Scale shape: the word-frequency table is built with per-batch
    partial counts + ONE keyed exchange (corpus tokens never shuffle
    twice), then materialized as symbol-list blocks that stay in the
    object store.  The K merge rounds are raw per-block Ray tasks —
    the genuinely-iterative case where a Dataset execution per round
    would pay K dispatch floors for vocab-scale work: each round ships
    back only per-block PAIR COUNT partials, whose size is bounded by
    (|alphabet| + K)^2 rows (36 initial symbols + one new symbol per
    round — independent of corpus size), so the driver fold is O(1)
    in the data.  The merge broadcast is two short strings."""
    import ray

    from .. import default_num_partitions
    from ..functions.tokenize import flat_tokens_arrow

    ds = _read(sf_dir, "documents", ["text"])

    def wc_partial(b: pa.Table) -> pa.Table:
        flat = flat_tokens_arrow(b["text"])
        w = flat.to_numpy(zero_copy_only=False)
        u, c = np.unique(w, return_counts=True)
        return pa.table({"word": pa.array(u, type=pa.string()),
                         "cnt": pa.array(c.astype(np.int64), type=pa.int64())})

    parted = ds.map_batches(wc_partial, batch_format="pyarrow").repartition(
        num_blocks=default_num_partitions(), keys=["word"], sort=False)

    words = parted.map_batches(
        _bpe_to_symbols, batch_format="pyarrow", batch_size=None).materialize()
    refs = [block_ref
            for bundle in words.iter_internal_ref_bundles()
            for block_ref, _meta in bundle.blocks]

    count_task = ray.remote(num_cpus=0.5)(_bpe_pair_counts)
    merge_task = ray.remote(num_cpus=0.5)(_bpe_apply_merge)

    out_rank, out_lhs, out_rhs, out_cnt = [], [], [], []
    for r in range(1, rounds + 1):
        partials = [t for t in ray.get([count_task.remote(b) for b in refs])
                    if t.num_rows]
        if not partials:
            break  # vocabulary fully merged — SQL's later rounds go empty too
        folded = pa.concat_tables(partials)
        lhs = folded["lhs"].to_numpy(zero_copy_only=False)
        rhs = folded["rhs"].to_numpy(zero_copy_only=False)
        cnt = folded["cnt"].to_numpy(zero_copy_only=False)
        order = np.lexsort((rhs, lhs))
        l_s, r_s, c_s = lhs[order], rhs[order], cnt[order]
        new = np.r_[True, (l_s[1:] != l_s[:-1]) | (r_s[1:] != r_s[:-1])]
        seg = np.flatnonzero(new)
        sums = np.add.reduceat(c_s, seg)
        best = np.lexsort((r_s[seg], l_s[seg], -sums))[0]
        L, R, C = l_s[seg][best], r_s[seg][best], int(sums[best])
        out_rank.append(r)
        out_lhs.append(L)
        out_rhs.append(R)
        out_cnt.append(C)
        refs = [merge_task.remote(b, L, R) for b in refs]

    return pa.table({
        "merge_rank": pa.array(out_rank, type=pa.int64()),
        "lhs": pa.array(out_lhs, type=pa.string()),
        "rhs": pa.array(out_rhs, type=pa.string()),
        "cnt": pa.array(out_cnt, type=pa.int64())})


def q_bpe_merges(sf_dir: str, rounds: int = _BPE_ROUNDS):
    """Learn the first K BPE merges over the corpus vocabulary and
    return the merge table (merge_rank, lhs, rhs, cnt).

    Semantics (the Sennrich contract): symbols start as the characters
    of each ``[a-z0-9]+`` token (no end-of-word marker — documented
    simplification); each round picks the adjacent pair with the
    highest word-frequency-weighted count (ties: lexicographically
    smallest (lhs, rhs)) and rewrites every word by merging its
    occurrences greedily left-to-right, non-overlapping ("aaa" under
    merge (a,a) becomes ["aa","a"], never ["a","aa"]).

    Scale shape: see ``_bpe_learn``.  The SQL oracle replays all K
    rounds exactly: symbols ride in a '(sym)(sym)' wrapped string whose
    ``replace('(L)(R)','(LR)')`` is the same greedy leftmost
    non-overlapping rewrite (verified equivalent on runs), so the whole
    learner is bit-replayable."""
    import ray.data as rd

    return rd.from_arrow(_bpe_learn(sf_dir, rounds))


def q_bpe_encode(sf_dir: str, rounds: int = _BPE_ROUNDS):
    """Encode the corpus with the learned BPE: per document, the token
    count and the subword count after applying the K learned merges in
    rank order (the tokenizer-APPLICATION step of an LLM data pipeline
    — the real "how many tokens is this corpus under the trained
    tokenizer" measurement, vs the regex proxy in doc_token_stats).

    Scale shape: the merge table is K rows learned once on the driver
    (``_bpe_learn``) and shipped in the map closure — a tiny broadcast,
    never a shuffle.  The encode pass is embarrassingly parallel: per
    batch, tokens are np.unique-memoized so each distinct word is
    encoded ONCE (K vectorized merge sweeps over the batch vocabulary,
    not over token instances), then subword counts scatter back through
    the inverse index and reduce per doc.  Documents never leave their
    block.  The SQL oracle re-learns the same merges (the bpe_merges
    chain, word column carried through) and replays encoding as K
    sequential replace() rewrites per vocabulary word — bit-exact."""
    merges = _bpe_learn(sf_dir, rounds)
    pairs = list(zip(merges["lhs"].to_pylist(), merges["rhs"].to_pylist()))

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def encode(b: pa.Table) -> pa.Table:
        from ..functions.tokenize import tokenize_arrow_offsets

        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks, starts = tokenize_arrow_offsets(b["text"])
        n_tok = np.diff(starts).astype(np.int64)
        n_sub = np.zeros(len(ids), dtype=np.int64)
        if len(toks):
            tok_np = toks.to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(tok_np, return_inverse=True)
            block = _bpe_symbols_table(uniq, np.ones(len(uniq), dtype=np.int64))
            for ml, mr in pairs:
                block = _bpe_apply_merge(block, ml, mr)
            la = block["symbols"].combine_chunks()
            offs = np.asarray(la.offsets, dtype=np.int64)
            per_tok = np.diff(offs - offs[0])[inv]
            doc_of = np.repeat(np.arange(len(ids)), n_tok)
            n_sub = np.bincount(
                doc_of, weights=per_tok, minlength=len(ids)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "n_subwords": pa.array(n_sub, type=pa.int64())})

    return ds.map_batches(encode, batch_format="pyarrow")


def _sql_bpe_chain(rounds: int, carry_word: bool = False) -> str:
    """The shared K-round learner replay.  State is the '(sym)(sym)'
    wrapped word string: pair extraction is regexp_extract_all over the
    wrappers, and the merge rewrite is replace('(L)(R)' -> '(LR)'),
    which is the same greedy leftmost non-overlapping application the
    engine performs on symbol lists (the wrapper makes boundary sharing
    between adjacent matches impossible, so runs resolve identically).
    ``carry_word`` threads the original word through every w{r} so the
    encode oracle can join documents back to final symbol counts.  The
    merge step is a LEFT JOIN ON TRUE (not a cross join) so an
    exhausted vocabulary (empty m{r}) carries w{r-1} through unchanged,
    mirroring the engine's early break."""
    w = "word, " if carry_word else ""
    parts = [f"""
WITH words AS (
  SELECT tok AS word, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
  GROUP BY tok
),
w0 AS (SELECT {w}regexp_replace(word, '(.)', '(\\1)', 'g') AS s, cnt FROM words)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
p{r} AS (
  SELECT unnest(syms[1:len(syms)-1]) AS lhs,
         unnest(syms[2:len(syms)]) AS rhs, cnt
  FROM (SELECT regexp_extract_all(s, '\\(([^)]*)\\)', 1) AS syms, cnt
        FROM w{r - 1})
),
m{r} AS (
  SELECT lhs, rhs, CAST(sum(cnt) AS BIGINT) AS cnt
  FROM p{r} GROUP BY lhs, rhs
  ORDER BY cnt DESC, lhs, rhs LIMIT 1
),
w{r} AS (
  SELECT {"w.word, " if carry_word else ""}CASE WHEN m.lhs IS NULL THEN w.s
         ELSE replace(w.s, '(' || m.lhs || ')(' || m.rhs || ')',
                      '(' || m.lhs || m.rhs || ')') END AS s, w.cnt
  FROM w{r - 1} w LEFT JOIN m{r} m ON TRUE
)""")
    return "".join(parts)


def _sql_bpe_merges(rounds: int = _BPE_ROUNDS) -> str:
    """K-round unrolled replay of the BPE learner (see _sql_bpe_chain)."""
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_rank, lhs, rhs, cnt FROM m{r}"
        for r in range(1, rounds + 1))
    return _sql_bpe_chain(rounds) + "\n" + union


def _sql_bpe_encode(rounds: int = _BPE_ROUNDS) -> str:
    """Re-learn the merges, then count each word's final symbols (the
    '(' count of its wrapped string) and aggregate per document."""
    return _sql_bpe_chain(rounds, carry_word=True) + f""",
vocab AS (
  SELECT word,
         CAST(length(s) - length(replace(s, '(', '')) AS BIGINT) AS n_sub
  FROM w{rounds}
),
dt AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
agg AS (
  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(v.n_sub) AS BIGINT) AS n_subwords
  FROM dt d JOIN vocab v ON d.tok = v.word
  GROUP BY d.doc_id
)
SELECT doc_id,
       COALESCE(a.n_tokens, 0) AS n_tokens,
       COALESCE(a.n_subwords, 0) AS n_subwords
FROM documents LEFT JOIN agg a USING (doc_id)
"""


# ---------------------------------------------------------------------
# Gopher quality rules (engine addition; the Rae-et-al-2021 "Scaling
# Language Models: Methods, Analysis & Insights from Training Gopher"
# per-document repetition/quality rule set, the canonical rule-based
# filter an LLM data pipeline runs before training).  Unlike
# doc_quality's composite score, this emits each rule's signal plus the
# conjunctive keep flag, so a user can tune thresholds per rule.
# ---------------------------------------------------------------------

_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = 50, 100_000
_GOPHER_MEAN_LO, _GOPHER_MEAN_HI = 3.0, 10.0
_GOPHER_SYMBOL_MAX = 0.1      # '#' chars + '...' runs, per word
_GOPHER_BULLET_MAX = 0.9      # fraction of lines starting with a bullet
_GOPHER_ELLIPSIS_MAX = 0.3    # fraction of lines ending with '...'
_GOPHER_ALPHA_MIN = 0.8       # fraction of words containing a letter
# required-word set: the engine's frozen STOPWORDS contract (shared
# with quality scoring / langid) rather than Gopher's original English
# set {the,be,to,of,and,that,have,with} — same rule shape, but keyed to
# the vocabulary the engine's corpora actually exercise; swap the
# constant to retarget.
_GOPHER_REQUIRED = STOPWORDS
_GOPHER_MIN_REQUIRED = 2


def q_gopher_rules(sf_dir: str):
    """Per-document Gopher rule signals + keep flag over `documents`:
    (doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
    ellipsis_frac, alpha_frac, n_required, keep).

    Contract (each rule mirrored 1:1 in the SQL oracle): words are the
    nonempty '\\s+'-split pieces of the raw text; lines are the
    chr(10)-split pieces; a bullet line matches '^\\s*[-*•]'; an
    ellipsis line matches '\\.\\.\\.\\s*$'; symbols are '#' characters
    plus non-overlapping '...' runs; a required word is present when it
    occurs as a full [a-z0-9]+ token of lower(text); keep is the
    conjunction of the published Gopher bounds (module constants).
    Fractions are IEEE doubles computed as the same int/int divisions
    on both sides, so the keep comparisons are bit-identical.

    Scale shape: stateless, zero-shuffle — one pruned-column read and
    one Arrow-kernel map_batches (RE2 splits/matches + np.bincount
    segment sums); documents never leave their block, so the stage
    pipelines with the read at any corpus size."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    req_pats = [f"(^|[^a-z0-9]){w}([^a-z0-9]|$)" for w in _GOPHER_REQUIRED]

    def rules(b: pa.Table) -> pa.Table:
        n = b.num_rows
        txt = b["text"].combine_chunks().cast(pa.string())
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)

        # -- words: nonempty whitespace-split pieces ------------------
        wl = pc.split_pattern_regex(txt, pattern="\\s+")
        offs = np.asarray(wl.offsets, dtype=np.int64)
        vals = wl.values.slice(offs[0], offs[-1] - offs[0])
        offs = offs - offs[0]
        wlen = pc.utf8_length(vals).to_numpy(zero_copy_only=False)
        walpha = pc.match_substring_regex(vals, "[A-Za-z]").to_numpy(
            zero_copy_only=False)
        nonempty = wlen > 0
        doc_of = np.repeat(np.arange(n), np.diff(offs))
        nw = np.bincount(doc_of[nonempty], minlength=n).astype(np.int64)
        chars = np.bincount(doc_of[nonempty], weights=wlen[nonempty],
                            minlength=n)
        nalpha = np.bincount(doc_of[nonempty],
                             weights=walpha[nonempty].astype(np.float64),
                             minlength=n)
        nw_f = np.where(nw == 0, 1, nw).astype(np.float64)  # guarded below
        mean_len = np.where(nw == 0, 0.0, chars / nw_f)
        alpha_frac = np.where(nw == 0, 0.0, nalpha / nw_f)

        # -- symbols: '#' chars + non-overlapping '...' runs ----------
        sym = (pc.count_substring(txt, "#").to_numpy(zero_copy_only=False)
               + pc.count_substring(txt, "...").to_numpy(
                   zero_copy_only=False)).astype(np.float64)
        symbol_ratio = np.where(nw == 0, 0.0, sym / nw_f)

        # -- lines: bullet starts / ellipsis ends ---------------------
        ll = pc.split_pattern(txt, "\n")
        loffs = np.asarray(ll.offsets, dtype=np.int64)
        lvals = ll.values.slice(loffs[0], loffs[-1] - loffs[0])
        loffs = loffs - loffs[0]
        nl = np.diff(loffs).astype(np.float64)  # >= 1 always
        bullet = pc.match_substring_regex(lvals, "^\\s*[-*•]").to_numpy(
            zero_copy_only=False).astype(np.float64)
        ellip = pc.match_substring_regex(lvals, "\\.\\.\\.\\s*$").to_numpy(
            zero_copy_only=False).astype(np.float64)
        ldoc = np.repeat(np.arange(n), np.diff(loffs))
        bullet_frac = np.bincount(ldoc, weights=bullet, minlength=n) / nl
        ellipsis_frac = np.bincount(ldoc, weights=ellip, minlength=n) / nl

        # -- required stop words as full tokens of lower(text) --------
        lower = pc.utf8_lower(txt)
        n_req = np.zeros(n, dtype=np.int64)
        for pat in req_pats:
            n_req += pc.match_substring_regex(lower, pat).to_numpy(
                zero_copy_only=False).astype(np.int64)

        keep = ((nw >= _GOPHER_MIN_WORDS) & (nw <= _GOPHER_MAX_WORDS)
                & (mean_len >= _GOPHER_MEAN_LO) & (mean_len <= _GOPHER_MEAN_HI)
                & (symbol_ratio <= _GOPHER_SYMBOL_MAX)
                & (bullet_frac <= _GOPHER_BULLET_MAX)
                & (ellipsis_frac <= _GOPHER_ELLIPSIS_MAX)
                & (alpha_frac >= _GOPHER_ALPHA_MIN)
                & (n_req >= _GOPHER_MIN_REQUIRED))

        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_words": pa.array(nw, type=pa.int64()),
            "mean_word_len": _canon_round(mean_len.tolist(), 6),
            "symbol_ratio": _canon_round(symbol_ratio.tolist(), 6),
            "bullet_frac": _canon_round(bullet_frac.tolist(), 6),
            "ellipsis_frac": _canon_round(ellipsis_frac.tolist(), 6),
            "alpha_frac": _canon_round(alpha_frac.tolist(), 6),
            "n_required": pa.array(n_req, type=pa.int64()),
            "keep": pa.array(keep.astype(np.int64), type=pa.int64()),
        })

    return ds.map_batches(rules, batch_format="pyarrow")


def _sql_gopher_rules() -> str:
    from .queries import _sql_round

    req = " + ".join(
        f"(CASE WHEN regexp_matches(lt, '(^|[^a-z0-9]){w}([^a-z0-9]|$)')"
        " THEN 1 ELSE 0 END)"
        for w in _GOPHER_REQUIRED)
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')
           AS words,
         string_split(text, chr(10)) AS lines,
         (length(text) - length(replace(text, '#', '')))
           + (length(text) - length(replace(text, '...', ''))) // 3 AS sym,
         lower(text) AS lt
  FROM documents
),
s AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_words,
         CASE WHEN len(words) = 0 THEN 0.0
              ELSE list_sum(list_transform(words, x -> length(x)))
                   / CAST(len(words) AS DOUBLE) END AS mean_word_len,
         CASE WHEN len(words) = 0 THEN 0.0
              ELSE sym / CAST(len(words) AS DOUBLE) END AS symbol_ratio,
         len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]')))
           / CAST(len(lines) AS DOUBLE) AS bullet_frac,
         len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.\\s*$')))
           / CAST(len(lines) AS DOUBLE) AS ellipsis_frac,
         CASE WHEN len(words) = 0 THEN 0.0
              ELSE len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
                   / CAST(len(words) AS DOUBLE) END AS alpha_frac,
         CAST({req} AS BIGINT) AS n_required
  FROM base
),
k AS (
  SELECT s.*,
         CAST(CASE WHEN n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
               AND mean_word_len >= {_GOPHER_MEAN_LO}
               AND mean_word_len <= {_GOPHER_MEAN_HI}
               AND symbol_ratio <= {_GOPHER_SYMBOL_MAX}
               AND bullet_frac <= {_GOPHER_BULLET_MAX}
               AND ellipsis_frac <= {_GOPHER_ELLIPSIS_MAX}
               AND alpha_frac >= {_GOPHER_ALPHA_MIN}
               AND n_required >= {_GOPHER_MIN_REQUIRED}
              THEN 1 ELSE 0 END AS BIGINT) AS keep
  FROM s
)
SELECT doc_id, n_words,
       {_sql_round('mean_word_len', 6)} AS mean_word_len,
       {_sql_round('symbol_ratio', 6)} AS symbol_ratio,
       {_sql_round('bullet_frac', 6)} AS bullet_frac,
       {_sql_round('ellipsis_frac', 6)} AS ellipsis_frac,
       {_sql_round('alpha_frac', 6)} AS alpha_frac,
       n_required, keep
FROM k
"""


# ---------------------------------------------------------------------
# Exact-substring dedup (engine addition; the Lee-et-al-2022
# "Deduplicating Training Data Makes Language Models Better" move:
# find every length-L character window that occurs more than once
# corpus-wide, merge overlapping/adjacent duplicated windows into
# maximal spans, and cut the spans out of the text)
# ---------------------------------------------------------------------

_ESS_L = 40  # duplicated-window length in CHARS (the reference work
             # uses 50 BPE tokens; chars keep the oracle replayable
             # as SQL substr over the same 1-based positions)
_ESS_B1 = 0x9E3779B97F4A7C15  # odd → invertible mod 2^64
_ESS_B2 = 0xC2B2AE3D27D4EB4F
# planted duplication (replayed verbatim in SQL): docs with
# doc_id % 3 != 2 get one of two shared >L-char footers appended, so
# cross-doc duplicated spans provably exist in every test corpus
_ESS_F0 = (" === footer variant 0: this exact disclaimer text repeats "
           "verbatim across many documents in the corpus ===")
_ESS_F1 = _ESS_F0.replace("variant 0", "variant 1")
_ESS_BROADCAST_BUDGET = 512 << 20  # dup-key table bytes before the
                                   # probe switches broadcast → join


def _ess_augmented(sf_dir: str):
    """documents with the planted footers appended (Arrow-vectorized)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def aug(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        foot = np.where(ids % 3 == 2, "",
                        np.where(ids % 2 == 0, _ESS_F0, _ESS_F1))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pc.binary_join_element_wise(
                b["text"].combine_chunks().cast(pa.string()),
                pa.array(foot, type=pa.string()), ""),
        })

    return ds.map_batches(aug, batch_format="pyarrow")


def _ess_windows_np(ids: np.ndarray, texts: list[str]):
    """(doc_id, pos, h1, h2) numpy arrays for every length-L window of
    every doc in the batch; pos is the 1-based char index (== the SQL
    oracle's generate_series i).  One utf-32 decode + two O(total
    chars) rolling-hash passes over the CONCATENATED batch text;
    windows crossing doc boundaries are never selected."""
    from ..functions.hashing import rolling_window_hashes

    L = _ESS_L
    bufs = [t.encode("utf-32-le") for t in texts]
    lens = np.array([len(x) >> 2 for x in bufs], dtype=np.int64)
    m = np.maximum(lens - L + 1, 0)
    tot = int(m.sum())
    empty = np.empty(0, dtype=np.int64)
    if tot == 0:
        return empty, empty, empty, empty
    codes = np.frombuffer(b"".join(bufs), dtype=np.uint32).astype(np.uint64)
    h1_all = rolling_window_hashes(codes, L, _ESS_B1)
    h2_all = rolling_window_hashes(codes, L, _ESS_B2)
    off = np.cumsum(lens) - lens
    local = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
    idx = np.repeat(off, m) + local
    return (np.repeat(ids, m), local + 1,
            h1_all[idx].view(np.int64), h2_all[idx].view(np.int64))


def _ess_empty_spans() -> pa.Table:
    return pa.table({"doc_id": pa.array([], type=pa.int64()),
                     "span_start": pa.array([], type=pa.int64()),
                     "span_end": pa.array([], type=pa.int64())})


def _ess_merge_spans(did: np.ndarray, pos: np.ndarray) -> pa.Table:
    """Gaps-and-islands: duplicated window positions → maximal merged
    spans [span_start, span_end) per doc.  Windows at gap <= L merge
    (overlapping or exactly adjacent), matching the SQL oracle."""
    if did.size == 0:
        return _ess_empty_spans()
    order = np.lexsort((pos, did))
    did, pos = did[order], pos[order]
    brk = np.r_[True, (did[1:] != did[:-1]) | (pos[1:] - pos[:-1] > _ESS_L)]
    starts = np.flatnonzero(brk)
    ends = np.r_[starts[1:], did.size] - 1
    return pa.table({
        "doc_id": pa.array(did[starts], type=pa.int64()),
        "span_start": pa.array(pos[starts], type=pa.int64()),
        "span_end": pa.array(pos[ends] + _ESS_L, type=pa.int64()),
    })


def _ess_dup_keys(sf_dir: str):
    """The global duplicated-window key table (h1, h2): per-batch
    pre-aggregated (distinct key, partial count) rows → ONE keyed
    repartition → segment-sum → keep count > 1.  The shuffle moves
    distinct-key rows, never window instances — the same
    partial-then-shuffle shape as the heavy-hitter queries."""
    from .. import default_num_partitions

    def partial(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, _, h1, h2 = _ess_windows_np(ids, b["text"].to_pylist())
        if h1.size == 0:
            return pa.table({"h1": pa.array([], type=pa.int64()),
                             "h2": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        order = np.lexsort((h2, h1))
        h1, h2 = h1[order], h2[order]
        brk = np.r_[True, (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])]
        seg = np.flatnonzero(brk)
        cnt = np.diff(np.r_[seg, h1.size])
        return pa.table({"h1": pa.array(h1[seg], type=pa.int64()),
                         "h2": pa.array(h2[seg], type=pa.int64()),
                         "cnt": pa.array(cnt, type=pa.int64())})

    parted = _ess_augmented(sf_dir) \
        .map_batches(partial, batch_format="pyarrow") \
        .repartition(num_blocks=default_num_partitions(),
                     keys=["h1", "h2"], sort=False)

    def dup_only(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"h1": pa.array([], type=pa.int64()),
                             "h2": pa.array([], type=pa.int64())})
        h1 = b["h1"].to_numpy(zero_copy_only=False)
        h2 = b["h2"].to_numpy(zero_copy_only=False)
        cnt = b["cnt"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h2, h1))
        h1, h2, cnt = h1[order], h2[order], cnt[order]
        brk = np.r_[True, (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])]
        seg = np.flatnonzero(brk)
        total = np.add.reduceat(cnt, seg)
        keep = total > 1
        return pa.table({"h1": pa.array(h1[seg][keep], type=pa.int64()),
                         "h2": pa.array(h2[seg][keep], type=pa.int64())})

    return parted.map_batches(dup_only, batch_format="pyarrow",
                              batch_size=None).materialize()


def _ess_cut_table(ids: np.ndarray, texts: list[str],
                   spans: pa.Table) -> pa.Table:
    """Cut every span out of its doc's text.  ``spans`` is the
    _ess_merge_spans output for exactly these docs (sorted by
    (doc_id, span_start)); docs without spans pass through unchanged."""
    sd = spans["doc_id"].to_numpy(zero_copy_only=False)
    ss = spans["span_start"].to_numpy(zero_copy_only=False)
    se = spans["span_end"].to_numpy(zero_copy_only=False)
    lo = np.searchsorted(sd, ids, "left")
    hi = np.searchsorted(sd, ids, "right")
    clean, removed = [], []
    for t, a, z in zip(texts, lo, hi):
        if a == z:
            clean.append(t)
            removed.append(0)
            continue
        parts, prev = [], 1
        for s_, e_ in zip(ss[a:z], se[a:z]):
            parts.append(t[prev - 1:s_ - 1])
            prev = e_
        parts.append(t[prev - 1:])
        c = "".join(parts)
        clean.append(c)
        removed.append(len(t) - len(c))
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                     "text_clean": pa.array(clean, type=pa.string()),
                     "removed_chars": pa.array(removed, type=pa.int64())})


def _ess_resolve_probe(sf_dir: str, probe: str):
    """Counted dispatch shared by the spans and dedup queries: build
    the dup-key table once and pick the probe side by its size."""
    dup = _ess_dup_keys(sf_dir)
    if probe == "auto":
        probe = "broadcast" if dup.count() * 16 <= _ESS_BROADCAST_BUDGET \
            else "join"
    if probe not in ("broadcast", "join"):
        raise ValueError(f"probe must be auto/broadcast/join, got {probe!r}")
    return dup, probe


def _ess_broadcast_probe(sf_dir: str, dup, emit: str):
    """Broadcast-side probe: ray.put the dup-key table once, pa.Table
    hash-join per batch, islands merged in-map — ZERO further shuffle.
    ``emit="spans"`` yields the span table; ``emit="clean"`` cuts the
    batch's own texts right in the probe (the docs and their spans are
    already co-located in the batch), skipping the span serialization +
    doc-keyed repartition + left_outer join the distributed path needs."""
    import ray

    blocks = [b for b in ray.get(dup.to_arrow_refs()) if b.num_rows]
    tbl = pa.concat_tables(blocks) if blocks else \
        pa.table({"h1": pa.array([], type=pa.int64()),
                  "h2": pa.array([], type=pa.int64())})
    ref = ray.put(tbl.combine_chunks())

    class Probe:
        def __init__(self):
            self.dup = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            texts = b["text"].to_pylist()
            did, pos, h1, h2 = _ess_windows_np(ids, texts)
            if did.size == 0 or self.dup.num_rows == 0:
                spans = _ess_empty_spans()
            else:
                w = pa.table({"doc_id": pa.array(did, type=pa.int64()),
                              "pos": pa.array(pos, type=pa.int64()),
                              "h1": pa.array(h1, type=pa.int64()),
                              "h2": pa.array(h2, type=pa.int64())})
                hit = w.join(self.dup, keys=["h1", "h2"], join_type="inner")
                spans = _ess_merge_spans(
                    hit["doc_id"].to_numpy(zero_copy_only=False),
                    hit["pos"].to_numpy(zero_copy_only=False))
            if emit == "spans":
                return spans
            return _ess_cut_table(ids, texts, spans)

    return _ess_augmented(sf_dir).map_batches(
        Probe, batch_format="pyarrow", concurrency=(1, 8))


def _ess_spans(sf_dir: str, probe: str = "auto", _dup=None):
    """Duplicated-span table (doc_id, span_start, span_end).

    Probe dispatch BY A COUNT (the semantic_dedup / clustering
    pattern): the dup-key table is broadcast while it fits
    ``_ESS_BROADCAST_BUDGET``; above that the windows dataset
    inner-joins the dup keys distributedly and one doc_id-keyed
    repartition co-locates each doc's hits for the islands merge.
    Both sides are exact on the (h1, h2) 128-bit combined key; the
    two-independent-base widening note lives on rolling_window_hashes.
    ``_dup`` lets q_exact_substring_dedup pass its already-built
    dup-key table through (probe must then be explicit)."""
    from .. import default_num_partitions

    if _dup is None:
        dup, probe = _ess_resolve_probe(sf_dir, probe)
    else:
        dup = _dup
    aug = _ess_augmented(sf_dir)
    if probe == "broadcast":
        return _ess_broadcast_probe(sf_dir, dup, emit="spans")

    if probe != "join":
        raise ValueError(f"probe must be auto/broadcast/join, got {probe!r}")

    def emit(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        did, pos, h1, h2 = _ess_windows_np(ids, b["text"].to_pylist())
        return pa.table({"doc_id": pa.array(did, type=pa.int64()),
                         "pos": pa.array(pos, type=pa.int64()),
                         "h1": pa.array(h1, type=pa.int64()),
                         "h2": pa.array(h2, type=pa.int64())})

    hits = aug.map_batches(emit, batch_format="pyarrow") \
        .join(dup, join_type="inner",
              num_partitions=default_num_partitions(), on=("h1", "h2")) \
        .repartition(num_blocks=default_num_partitions(),
                     keys=["doc_id"], sort=False)

    def merge(b: pa.Table) -> pa.Table:
        return _ess_merge_spans(
            b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["pos"].to_numpy(zero_copy_only=False).astype(np.int64))

    return hits.map_batches(merge, batch_format="pyarrow", batch_size=None)


def q_exact_substring_spans(sf_dir: str, probe: str = "auto"):
    """Every maximal corpus-duplicated character span, per doc: a
    window of _ESS_L chars counts as duplicated when it occurs >= 2
    times ANYWHERE in the corpus (other docs or elsewhere in the same
    doc); overlapping/adjacent duplicated windows merge.  Output
    (doc_id, span_start, span_end), 1-based, end-exclusive.

    Memory: the per-batch window table costs ~32 bytes per input char,
    so a batch's chars x 32 must fit the worker heap — web-page-sized
    docs are fine at default batch sizes; corpora of very fat documents
    should lower map_batches batch_size (same sizing note as the
    multimodal stages)."""
    return _ess_spans(sf_dir, probe=probe)


def q_exact_substring_dedup(sf_dir: str, probe: str = "auto"):
    """The corpus with every duplicated span CUT OUT (all occurrences
    removed, the strict form).  Output (doc_id, text_clean,
    removed_chars).

    Scale shape follows the counted probe dispatch: on the broadcast
    side the probe map already holds each doc's text AND its merged
    spans, so it cuts in place — zero shuffles after the dup-key
    build.  On the join side, spans aggregate per doc into a
    serialized interval string (narrow — joins cannot carry list
    columns) via ONE doc_id-keyed repartition, then a left_outer hash
    join back onto the corpus and a stateless cut map; docs with no
    duplicated span pass through the join with a null interval string
    and are emitted unchanged.  The join side moves the corpus through
    one hash exchange — the unavoidable cost when the dup-key table
    exceeds broadcast budget; it is one corpus pass, same order as a
    sort.  Both sides are parity-tested."""
    from .. import default_num_partitions

    dup, probe = _ess_resolve_probe(sf_dir, probe)
    if probe == "broadcast":
        return _ess_broadcast_probe(sf_dir, dup, emit="clean")

    spans = _ess_spans(sf_dir, probe="join", _dup=dup)
    parted = spans.repartition(num_blocks=default_num_partitions(),
                               keys=["doc_id"], sort=False)

    def ser(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "spans_str": pa.array([], type=pa.string())})
        did = b["doc_id"].to_numpy(zero_copy_only=False)
        s = b["span_start"].to_numpy(zero_copy_only=False)
        e = b["span_end"].to_numpy(zero_copy_only=False)
        order, seg, sizes = _lexsort_segments(did, s)
        did, s, e = did[order], s[order], e[order]
        pair = pa.array([f"{a}:{z}" for a, z in zip(s, e)],
                        type=pa.string())
        offsets = np.r_[seg, did.size].astype(np.int32)
        la = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                      pair)
        return pa.table({"doc_id": pa.array(did[seg], type=pa.int64()),
                         "spans_str": pc.binary_join(la, ";")})

    agg = parted.map_batches(ser, batch_format="pyarrow", batch_size=None)
    joined = _ess_augmented(sf_dir).join(
        agg, join_type="left_outer",
        num_partitions=default_num_partitions(), on=("doc_id",))

    def cut(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = b["text"].to_pylist()
        spans = b["spans_str"].to_pylist()
        clean, removed = [], []
        for t, sp in zip(texts, spans):
            if not sp:
                clean.append(t)
                removed.append(0)
                continue
            parts, prev = [], 1
            for item in sp.split(";"):
                a, z = item.split(":")
                parts.append(t[prev - 1:int(a) - 1])
                prev = int(z)
            parts.append(t[prev - 1:])
            c = "".join(parts)
            clean.append(c)
            removed.append(len(t) - len(c))
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "text_clean": pa.array(clean, type=pa.string()),
                         "removed_chars": pa.array(removed, type=pa.int64())})

    return joined.map_batches(cut, batch_format="pyarrow")


def _sql_ess_ctes() -> str:
    """Shared CTE chain: augmented corpus → all 1-based window
    positions → duplicated grams (count > 1 corpus-wide) → merged
    maximal spans.  Exactly the engine's semantics, replayed on grams
    instead of hashes."""
    return f"""
aug AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 3 = 2 THEN ''
                      WHEN doc_id % 2 = 0 THEN '{_ESS_F0}'
                      ELSE '{_ESS_F1}' END AS text
  FROM documents
),
idx AS (
  SELECT doc_id, unnest(generate_series(1, length(text) - {_ESS_L - 1})) AS i
  FROM aug
),
g AS (
  SELECT idx.doc_id, idx.i,
         substr(a.text, CAST(idx.i AS INTEGER), {_ESS_L}) AS gram
  FROM idx JOIN aug a USING (doc_id)
),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
d AS (SELECT doc_id, i FROM g JOIN dup USING (gram)),
isl AS (
  SELECT doc_id, i,
         CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)
                   <= {_ESS_L} THEN 0 ELSE 1 END AS brk
  FROM d
),
grp AS (
  SELECT doc_id, i, sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS gid
  FROM isl
),
spans AS (
  SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start,
         CAST(max(i) + {_ESS_L} AS BIGINT) AS span_end
  FROM grp GROUP BY doc_id, gid
)"""


def _sql_exact_substring_spans() -> str:
    return (f"WITH {_sql_ess_ctes()}\n"
            "SELECT doc_id, span_start, span_end FROM spans")


def _sql_exact_substring_dedup() -> str:
    return f"""
WITH {_sql_ess_ctes()},
bounds AS (
  SELECT doc_id,
         lag(span_end, 1, CAST(1 AS BIGINT))
             OVER (PARTITION BY doc_id ORDER BY span_start) AS ks,
         span_start AS ke
  FROM spans
  UNION ALL
  SELECT a.doc_id, coalesce(max(s.span_end), 1) AS ks,
         CAST(length(a.text) + 1 AS BIGINT) AS ke
  FROM aug a LEFT JOIN spans s USING (doc_id)
  GROUP BY a.doc_id, length(a.text)
),
clean AS (
  SELECT b.doc_id,
         string_agg(substr(a.text, CAST(b.ks AS INTEGER),
                           CAST(b.ke - b.ks AS INTEGER)),
                    '' ORDER BY b.ks) AS text_clean
  FROM bounds b JOIN aug a USING (doc_id)
  GROUP BY b.doc_id
)
SELECT c.doc_id, coalesce(c.text_clean, '') AS text_clean,
       CAST(length(a.text) - length(coalesce(c.text_clean, ''))
            AS BIGINT) AS removed_chars
FROM clean c JOIN aug a USING (doc_id)
"""


# ---------------------------------------------------------------------
# BM25 ranked retrieval (engine addition): the keyword-search probe a
# training-data pipeline runs for corpus QA ("what does the corpus say
# about X?") and for building retrieval baselines.  Okapi BM25 with
# the Lucene idf (ln(1 + (N - df + 0.5)/(df + 0.5))), k1=1.2, b=0.75.
# Every float expression is written in ONE shape shared by the numpy
# and SQL sides (same literals via repr, same parenthesization, same
# left-assoc term sum), so the ranking replays bit-exactly; only the
# OUTPUT score is canonicalized to 6 dp.
# ---------------------------------------------------------------------

_BM25_TERMS = ("dup", "hash", "merge", "vector")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPN = 20


def q_bm25_topk(sf_dir: str, terms=_BM25_TERMS, topn: int = _BM25_TOPN):
    """Top-``topn`` documents by BM25 score for a fixed term query,
    (doc_id, score), ties at the boundary to the smaller doc_id.

    Scale shape: ONE tokenize pass emits per-doc (dl, tf_j) — 2+|q|
    narrow int columns, the text never moves; corpus constants
    (N, Σdl, df_j) fold from ONE tiny per-block partial row each
    (order-independent integer sums); idf/avgdl broadcast in the map
    closure; scoring emits per-block partial top-n (n rows per block,
    composing under the (score DESC, doc_id ASC) total order the
    final single-block merge reuses) — the exchange moves topn×blocks
    rows, never the corpus.  At 100 TB this is the standard
    stats-pass + broadcast-scalars + partial-top-k plan; an inverted
    index (posting lists keyed by term) only wins when queries vastly
    outnumber corpus passes, and is what q_set_similarity_join's
    posting machinery would supply."""
    import math

    from ..functions.tokenize import tokenize_arrow_offsets

    terms = tuple(terms)
    nt = len(terms)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(b: pa.Table) -> pa.Table:
        cols = {"doc_id": pa.array([], type=pa.int64()),
                "dl": pa.array([], type=pa.int64())}
        cols.update({f"tf{j}": pa.array([], type=pa.int64())
                     for j in range(nt)})
        if b.num_rows == 0:
            return pa.table(cols)
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, starts = tokenize_arrow_offsets(b["text"])
        dl = np.diff(starts)
        tf = np.zeros((len(ids), nt), dtype=np.int64)
        if len(flat):
            enc = pc.dictionary_encode(flat)
            dic = enc.dictionary.to_pylist()
            idx = enc.indices.to_numpy(zero_copy_only=False)
            doc_of = np.repeat(np.arange(len(ids)), dl)
            for j, term in enumerate(terms):
                if term in dic:
                    m = idx == dic.index(term)
                    if m.any():
                        tf[:, j] = np.bincount(doc_of[m],
                                               minlength=len(ids))
        cols = {"doc_id": pa.array(ids, type=pa.int64()),
                "dl": pa.array(dl, type=pa.int64())}
        cols.update({f"tf{j}": pa.array(tf[:, j], type=pa.int64())
                     for j in range(nt)})
        return pa.table(cols)

    st = ds.map_batches(stats, batch_format="pyarrow").materialize()

    def partial(b: pa.Table) -> pa.Table:
        dl = b["dl"].to_numpy(zero_copy_only=False)
        cols = {"n": pa.array([len(dl)], type=pa.int64()),
                "sumdl": pa.array([int(dl.sum())], type=pa.int64())}
        for j in range(nt):
            tf = b[f"tf{j}"].to_numpy(zero_copy_only=False)
            cols[f"df{j}"] = pa.array([int((tf > 0).sum())],
                                      type=pa.int64())
        return pa.table(cols)

    rows = st.map_batches(partial, batch_format="pyarrow").take_all()
    n_docs = sum(r["n"] for r in rows)
    sumdl = sum(r["sumdl"] for r in rows)
    df = [sum(r[f"df{j}"] for r in rows) for j in range(nt)]
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "score": pa.array([], type=pa.float64())})
    if n_docs == 0:
        import ray.data as rd

        return rd.from_arrow(empty)
    avgdl = sumdl / n_docs
    idf = [math.log(1 + (n_docs - df[j] + 0.5) / (df[j] + 0.5))
           for j in range(nt)]

    def score_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        dl = b["dl"].to_numpy(zero_copy_only=False)
        base = _BM25_K1 * ((1 - _BM25_B) + _BM25_B * (dl / avgdl))
        s = None
        for j in range(nt):
            tf = b[f"tf{j}"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            term = idf[j] * ((tf * (_BM25_K1 + 1)) / (tf + base))
            s = term if s is None else s + term
        order = np.lexsort((ids, -s))[:topn]
        return pa.table({"doc_id": pa.array(ids[order], type=pa.int64()),
                         "score": pa.array(s[order], type=pa.float64())})

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        s = b["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:topn]
        return pa.table({"doc_id": pa.array(ids[order], type=pa.int64()),
                         "score": _canon_round(list(s[order]), 6)})

    return st.map_batches(score_topk, batch_format="pyarrow",
                          batch_size=None) \
             .repartition(num_blocks=1) \
             .map_batches(final, batch_format="pyarrow", batch_size=None)


def _sql_bm25_topk(terms=_BM25_TERMS, topn: int = _BM25_TOPN) -> str:
    from .queries import _sql_round

    k1, b = repr(_BM25_K1), repr(_BM25_B)
    k1p1, omb = repr(_BM25_K1 + 1), repr(1 - _BM25_B)
    in_list = ", ".join(f"'{t}'" for t in terms)
    joins, term_exprs = [], []
    for j, t in enumerate(terms):
        joins.append(f"LEFT JOIN tf t{j} ON t{j}.doc_id = d.doc_id "
                     f"AND t{j}.t = '{t}'")
        dfj = f"(SELECT count(*) FROM tf WHERE t = '{t}')"
        term_exprs.append(
            f"ln(1 + (g.n - {dfj} + 0.5) / ({dfj} + 0.5))"
            f" * ((COALESCE(t{j}.tf, 0) * {k1p1})"
            f" / (COALESCE(t{j}.tf, 0) + {k1} * ({omb} + {b}"
            f" * (d.dl / (CAST(g.sumdl AS DOUBLE) / g.n)))))")
    score = term_exprs[0]
    for e in term_exprs[1:]:
        score = f"({score} + {e})"
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS t FROM documents
),
dl AS (
  SELECT d.doc_id, COALESCE(c.c, CAST(0 AS BIGINT)) AS dl
  FROM documents d LEFT JOIN (
    SELECT doc_id, count(*) AS c FROM tok GROUP BY 1) c USING (doc_id)
),
g AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sumdl FROM dl),
tf AS (
  SELECT doc_id, t, count(*) AS tf FROM tok
  WHERE t IN ({in_list}) GROUP BY 1, 2
),
s AS (
  SELECT d.doc_id, {score} AS score_raw
  FROM dl d CROSS JOIN g
  {' '.join(joins)}
)
SELECT doc_id, {_sql_round('score_raw', 6)} AS score FROM s
QUALIFY row_number() OVER (ORDER BY score_raw DESC, doc_id) <= {topn}
"""


WEBTEXT_QUERIES = {
    "bm25_topk": q_bm25_topk,
    "pii_redact": q_pii_redact,
    "url_dedup": q_url_dedup,
    "line_dedup": q_line_dedup,
    "neardup_keep": q_neardup_keep,
    "token_topk": q_token_topk,
    "decontaminate_bloom": q_decontaminate_bloom,
    "decontaminate_bloom_sharded": q_decontaminate_bloom_sharded,
    "corpus_clean": q_corpus_clean,
    "token_shards": q_token_shards,
    "url_latest": q_url_latest,
    "token_topk_sketch": q_token_topk_sketch,
    "doc_compressibility": q_doc_compressibility,
    "value_percentile": q_value_percentile,
    "corpus_weighted_sample": q_corpus_weighted_sample,
    "domain_caps": q_domain_caps,
    "mixture_budget": q_mixture_budget,
    "dup_ngram_fraction": q_dup_ngram_fraction,
    "blocking_quality": q_blocking_quality,
    "fuzzy_decontaminate": q_fuzzy_decontaminate,
    "host_pagerank": q_host_pagerank,
    "host_triangles": q_host_triangles,
    "token_pmi": q_token_pmi,
    "doc_winnow": q_doc_winnow,
    "winnow_candidates": q_winnow_candidates,
    "dsir_select": q_dsir_select,
    "selfdup_lines": q_selfdup_lines,
    "host_boilerplate": q_host_boilerplate,
    "bpe_merges": q_bpe_merges,
    "bpe_encode": q_bpe_encode,
    "gopher_rules": q_gopher_rules,
    "host_split": q_host_split,
    "exact_substring_spans": q_exact_substring_spans,
    "exact_substring_dedup": q_exact_substring_dedup,
}

WEBTEXT_ORACLES = {
    # decontaminate_bloom (default params): rows-only — one-sided
    # sketch error by design; the pytest gate checks superset-of-exact
    # + bounded FP rate.  decontaminate_bloom_sharded IS oracle-gated
    # (equals the exact join at 64 bits/key); its SQL registers from
    # queries_ext's EXT_ORACLES to avoid a module-scope cross import
    # (the circular-import registration pattern).
    "bm25_topk": _sql_bm25_topk(),
    "pii_redact": SQL_PII_REDACT,
    "url_dedup": SQL_URL_DEDUP,
    "line_dedup": SQL_LINE_DEDUP,
    "neardup_keep": _sql_neardup_keep(),
    "token_topk": SQL_TOKEN_TOPK,
    "corpus_clean": _sql_corpus_clean(),
    "token_shards": SQL_TOKEN_SHARDS,
    "url_latest": SQL_URL_LATEST,
    "value_percentile": _sql_value_percentile(),
    "corpus_weighted_sample": SQL_CORPUS_WEIGHTED_SAMPLE,
    "domain_caps": SQL_DOMAIN_CAPS,
    "mixture_budget": SQL_MIXTURE_BUDGET,
    "dup_ngram_fraction": _sql_dup_ngram_fraction(),
    "blocking_quality": _sql_blocking_quality(),
    "fuzzy_decontaminate": _sql_fuzzy_decontaminate(),
    "host_pagerank": _sql_host_pagerank(),
    "host_triangles": SQL_HOST_TRIANGLES,
    "token_pmi": _sql_token_pmi(),
    "doc_winnow": _sql_doc_winnow(),
    "winnow_candidates": _sql_winnow_candidates(),
    "dsir_select": _sql_dsir_select(),
    "selfdup_lines": SQL_SELFDUP_LINES,
    "host_boilerplate": SQL_HOST_BOILERPLATE,
    "bpe_merges": _sql_bpe_merges(),
    "bpe_encode": _sql_bpe_encode(),
    "gopher_rules": _sql_gopher_rules(),
    "host_split": _sql_host_split(),
    "exact_substring_spans": _sql_exact_substring_spans(),
    "exact_substring_dedup": _sql_exact_substring_dedup(),
}

# complete the catalog registration for the webtext-first import order
# (a worker unpickling one of this module's UDFs imports it before
# queries/queries_ext; their registration tails then saw this module
# partially initialized and skipped it)
import sys as _sys  # noqa: E402

_qe = _sys.modules.get(__package__ + ".queries_ext")
if _qe is not None and hasattr(_qe, "EXT_QUERIES"):
    _qe.EXT_QUERIES.update(WEBTEXT_QUERIES)
    _qe.EXT_ORACLES.update(WEBTEXT_ORACLES)
from .queries import QUERIES as _QUERIES  # noqa: E402

for _k, _v in WEBTEXT_QUERIES.items():
    _QUERIES.setdefault(_k, _v)
