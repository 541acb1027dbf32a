"""EL-benchmark evaluation harness — the reference's headline user
workflow (replicate_results.py:1-14): read a benchmark, link its
mentions, emit span-level P/R/F1 + gold-candidate recall per dataset.

≙ reference ``evaluation/evaluation.py`` + ``evaluation/metrics.py``:

- ``process_annotated_document`` span-set semantics
  (evaluation.py:19-126): gold spans are the annotated mentions with
  an in-KB gold entity; predicted spans below the confidence
  threshold become NIL (``Q0``) and are dropped from the linking set
  (:70-83); mention-detection (MD) counts compare span keys
  regardless of the linked entity (:99-105); ``filter_nil`` drops
  predictions that align with mentions annotated WITHOUT a KB entity
  (:84-92 — the M18 NIL-filter role).
- ``Metrics`` arithmetic (metrics.py:57-84) including the reference's
  ``1e-8`` epsilon denominators, reproduced bit-exactly so the SQL
  oracle can replay every float.
- the EL/ED mode split (evaluation.py:310-351 ``evaluate``): EL rows
  score model-detected mentions with ``filter_nil_spans=True``; ED
  rows score the gold-given spans (``spans=doc.spans``,
  evaluation.py:58) with ``filter_nil_spans=False`` — the reference's
  own per-mode defaults.

Model stand-in (same sanctioned pattern as stages/scoring.py:63-104 —
torch is absent from this container): mention detection is the
deterministic dictionary detector (distinct non-stopword tokens of
length >= ``md_min_len`` that appear in the PEM), disambiguation is
the PEM top-1 prior (candidate_generator.py:87-94 truncation order:
count desc, entity asc), and the model confidence score is an
md5-derived uniform in [0, 1) over (surface, entity) — replayable
bit-exactly in SQL via DuckDB's ``md5``.  Span keys are
(doc, surface, start) triples like the reference's
``(span.text, span.start)``; start offsets use
first-substring-occurrence (``str.find`` == SQL ``strpos``), the
contract the S6 reader oracles already pin down.

Scale shape: benchmark corpora are side-table sized (the reference
streams them per line on one core — see sources/benchmarks.py), but
every step here is still distributed Dataset machinery: candidate
ranking is the per-partition lexsort fold (no per-group pandas),
candidate attach is a hash join on the surface key, the NIL filter is
a distributed ``left_anti`` join, and every count is a ``groupby``
with map-side pre-aggregation.  Only the final <= 3-row-per-count
fold touches the driver (the bounded-metadata pattern used
throughout the engine).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# reference eval_all default (evaluation.py:168)
DEFAULT_ED_THRESHOLD = 0.15
# top-k candidates kept per surface for gold-recall (O1 truncation
# role; the catalog's candidate_topk precedent)
DEFAULT_CANDIDATE_K = 3
# dictionary-MD detector: minimum surface length
DEFAULT_MD_MIN_LEN = 4

DATASET_NAMES = ("AIDA", "MSNBC", "WIKI")


def confidence_u32(surfaces, entities) -> np.ndarray:
    """Deterministic model-confidence stand-in: md5(surface|entity)
    first 8 hex chars as a uniform double in [0, 1).  SQL twin:
    ``('0x' || substr(md5(surface || '|' || entity), 1, 8))::UBIGINT
    / 4294967296.0`` — division by 2^32 is exact in IEEE double, so
    both sides produce the identical bit pattern."""
    return np.array(
        [int(hashlib.md5(f"{s}|{e}".encode()).hexdigest()[:8], 16)
         for s, e in zip(surfaces, entities)],
        dtype=np.float64) / 4294967296.0


def dataset_of_ids(ids: np.ndarray) -> pa.Array:
    """doc_id -> benchmark-dataset name (the fixture's 3-way split,
    mirroring eval_all's dataset loop, evaluation.py:189-247)."""
    names = np.asarray(DATASET_NAMES, dtype=object)
    return pa.array(names[ids % 3], type=pa.string())


def rank_candidates(pem, *, k: int):
    """PEM (surface, entity, cnt) -> per-surface ranked candidates
    (surface, rank, entity, conf), rank <= max(k, 1) by (cnt desc,
    entity asc) — candidate_generator.py:87-94 truncation, computed
    with the same keyed-repartition + vectorized lexsort fold as the
    catalog's candidate_topk (no per-group pandas)."""
    from .. import default_num_partitions
    from ..functions.hashing import hash_str_array

    kk = max(int(k), 1)
    parted = pem.repartition(num_blocks=default_num_partitions(),
                             keys=["surface"], sort=False)

    def fold(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({"surface": pa.array([], type=pa.string()),
                             "rank": pa.array([], type=pa.int64()),
                             "entity": pa.array([], type=pa.string()),
                             "conf": pa.array([], type=pa.float64())})
        s = b["surface"].to_numpy(zero_copy_only=False)
        e = b["entity"].to_numpy(zero_copy_only=False)
        c = b["cnt"].to_numpy(zero_copy_only=False)
        hs = hash_str_array(s).view(np.int64)
        order = np.lexsort((e, -c, s, hs))
        s, e = s[order], e[order]
        seg_starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        seg_len = np.diff(np.r_[seg_starts, n])
        pos = np.arange(n) - np.repeat(seg_starts, seg_len)
        keep = pos < kk
        s, e, pos = s[keep], e[keep], pos[keep]
        return pa.table({
            "surface": pa.array(s, type=pa.string()),
            "rank": pa.array(pos + 1, type=pa.int64()),
            "entity": pa.array(e, type=pa.string()),
            "conf": pa.array(confidence_u32(s, e), type=pa.float64()),
        })

    return parted.map_batches(fold, batch_format="pyarrow", batch_size=None)


def dictionary_mention_detect(docs, *, min_len: int = DEFAULT_MD_MIN_LEN):
    """Deterministic mention detection over (doc_id, text): each
    DISTINCT non-stopword token of length >= ``min_len`` becomes one
    detected span at its first substring occurrence (≙ the T5/T6
    tagger role; a dictionary-MD baseline the SQL oracle replays with
    ``strpos``).  Output: (doc_id, dataset, span_start, surface,
    surface_lc)."""
    from ..functions.tokenize import STOPWORD_SET, tokenize

    def detect(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_id, out_start, out_surface, out_lc = [], [], [], []
        for did, text in zip(ids, b["text"].to_pylist()):
            low = text.lower()
            for tok in dict.fromkeys(tokenize(text)):
                if len(tok) < min_len or tok in STOPWORD_SET:
                    continue
                start = low.find(tok)
                out_id.append(did)
                out_start.append(start)
                out_surface.append(text[start:start + len(tok)])
                out_lc.append(tok)
        oid = np.asarray(out_id, dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(oid, type=pa.int64()),
            "dataset": dataset_of_ids(oid),
            "span_start": pa.array(out_start, type=pa.int64()),
            "surface": pa.array(out_surface, type=pa.string()),
            "surface_lc": pa.array(out_lc, type=pa.string()),
        })

    return docs.map_batches(detect, batch_format="pyarrow")


def _distinct_keys(ds, cols: list[str]):
    """Distinct rows over ``cols`` — span-key SET semantics.  The
    reference builds Python sets of span keys (evaluation.py:99-105),
    so a span annotated twice under the same key (e.g. once with an
    in-KB entity and once as NIL — real benchmark files contain such
    duplicates) must count ONCE.  One keyed groupby over
    benchmark-mention-scale rows, map-side pre-aggregated."""
    from ray.data.aggregate import Count

    from .. import scrub_empty_blocks

    return scrub_empty_blocks(
        ds.groupby(cols).aggregate(Count(alias_name="_n"))
        .materialize()).select_columns(cols).materialize()


def _count_by_dataset(ds) -> dict[str, int]:
    """Distributed per-dataset count -> {dataset: n} (<= 3 rows pulled;
    Ray pre-aggregates map-side before the tiny shuffle)."""
    from ray.data.aggregate import Count

    from .. import scrub_empty_blocks

    out = {name: 0 for name in DATASET_NAMES}
    agg = scrub_empty_blocks(
        ds.groupby("dataset").aggregate(Count(alias_name="n")).materialize())
    for row in agg.take_all():
        out[row["dataset"]] = int(row["n"])
    return out


def _metric_row(dataset: str, mode: str, *, num_docs: int, n_gold: int,
                in_cand: int, tp: int, fp: int, fn: int,
                tp_md: int, fp_md: int, fn_md: int) -> dict:
    """One Metrics row — metrics.py:57-84 arithmetic, bit-exact
    (including the 1e-8 epsilons) so the SQL oracle replays it with
    the same IEEE-double operation order."""
    p = tp / (tp + fp + 1e-8)
    r = tp / (tp + fn + 1e-8)
    f1 = (2.0 * p * r) / (p + r + 1e-8)
    p_md = tp_md / (tp_md + fp_md + 1e-8)
    r_md = tp_md / (tp_md + fn_md + 1e-8)
    f1_md = (2.0 * p_md * r_md) / (p_md + r_md + 1e-8)
    accuracy = 1.0 * tp / (n_gold + 1e-8)
    gold_recall = 1.0 * in_cand / (n_gold + 1e-8)
    return {
        "dataset": dataset, "mode": mode, "num_docs": num_docs,
        "num_gold_spans": n_gold, "gold_in_cand": in_cand,
        "tp": tp, "fp": fp, "fn": fn,
        "tp_md": tp_md, "fp_md": fp_md, "fn_md": fn_md,
        "precision": p, "recall": r, "f1": f1,
        "accuracy": accuracy, "gold_recall": gold_recall, "f1_md": f1_md,
    }


def evaluate_benchmarks(mentions, docs, pem, *,
                        ed_threshold: float = DEFAULT_ED_THRESHOLD,
                        k: int = DEFAULT_CANDIDATE_K,
                        md_min_len: int = DEFAULT_MD_MIN_LEN):
    """The eval_all composition: benchmark mention table (from an S6
    reader with ``include_nil=True``) + benchmark doc texts + PEM ->
    one Metrics row per (dataset, mode), mode in {EL, ED}.

    EL rows ≙ evaluation.py:318-327 (model MD, filter_nil_spans=True);
    ED rows ≙ :336-343 (gold spans given, filter_nil_spans=False).
    Returns a 2 x n_datasets-row Dataset with the reference's Metrics
    fields plus the derived P/R/F1/accuracy/gold-recall (rounded to 6
    via the engine's cross-engine float contract)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .. import default_num_partitions, scrub_empty_blocks
    from .queries import _canon_round

    nparts = default_num_partitions()

    def with_dataset_lc(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = b.append_column("dataset", dataset_of_ids(ids))
        return b.append_column(
            "surface_lc", pc.utf8_lower(b["surface"]).combine_chunks()
            if isinstance(b["surface"], pa.ChunkedArray)
            else pc.utf8_lower(b["surface"]))

    mentions = mentions.map_batches(
        with_dataset_lc, batch_format="pyarrow").materialize()

    def split(b: pa.Table, keep_gold: bool) -> pa.Table:
        mask = pc.is_valid(b["gold_qcode"])
        return b.filter(mask if keep_gold else pc.invert(mask))

    # every one of these feeds a hash join below — scrub the
    # zero-column empty blocks Ray's shuffles/filters emit for
    # unpopulated partitions, or sparse inputs flakily crash join
    # finalization (see scrub_empty_blocks; the engine-wide contract)
    # gold spans = annotated mentions WITH an in-KB entity
    # (evaluation.py:34-39); NIL spans = the rest (:49-54)
    gold = scrub_empty_blocks(mentions.map_batches(
        lambda b: split(b, True), batch_format="pyarrow").materialize())
    nil = scrub_empty_blocks(mentions.map_batches(
        lambda b: split(b, False), batch_format="pyarrow")
        .select_columns(["doc_id", "dataset", "span_start",
                         "surface"]).materialize())

    ranked = scrub_empty_blocks(rank_candidates(pem, k=k).materialize())
    top1 = scrub_empty_blocks(
        ranked.filter(expr="rank == 1").materialize())
    detected = scrub_empty_blocks(dictionary_mention_detect(
        docs, min_len=md_min_len).materialize())

    # --- gold-side verdicts: ED predictions + candidate recall -------
    # join keeps gold rows whose surface has candidates; fired = conf
    # over the ed threshold (evaluation.py:70-77 Q0 semantics)
    gold_pred = gold.join(
        top1.select_columns(["surface", "entity", "conf"])
            .rename_columns({"surface": "s_lc"}),
        join_type="inner", num_partitions=nparts,
        on=("surface_lc",), right_on=("s_lc",))

    def ed_verdicts(b: pa.Table) -> pa.Table:
        fired = pc.fill_null(
            pc.greater_equal(b["conf"], ed_threshold), False)
        is_tp = pc.and_(fired, pc.fill_null(
            pc.equal(b["entity"], b["gold_qcode"]), False))
        return pa.table({
            "dataset": b["dataset"],
            "fired": fired.cast(pa.int64()),
            "is_tp": is_tp.cast(pa.int64()),
        })

    ed_agg = scrub_empty_blocks(
        gold_pred.map_batches(ed_verdicts, batch_format="pyarrow")
        .groupby("dataset")
        .aggregate(Sum("fired", alias_name="npred"),
                   Sum("is_tp", alias_name="tp")).materialize())
    ed_npred = {name: 0 for name in DATASET_NAMES}
    ed_tp = {name: 0 for name in DATASET_NAMES}
    for row in ed_agg.take_all():
        ed_npred[row["dataset"]] = int(row["npred"] or 0)
        ed_tp[row["dataset"]] = int(row["tp"] or 0)

    # gold_entity_in_cands (evaluation.py:40-41): gold entity within
    # the top-k candidates of its surface
    in_cand = _count_by_dataset(gold.join(
        ranked.select_columns(["surface", "entity"])
              .rename_columns({"surface": "s_lc", "entity": "e"}),
        join_type="inner", num_partitions=nparts,
        on=("surface_lc", "gold_qcode"), right_on=("s_lc", "e")))

    # --- EL side: model MD -> prediction -> NIL filter ---------------
    # explicit fallback schema: when every prediction is filtered away
    # (possible on small/degenerate benchmarks) the scrub must yield an
    # empty dataset the el_tp join can still resolve key fields on
    pred_schema = pa.schema([
        pa.field("doc_id", pa.int64()), pa.field("dataset", pa.string()),
        pa.field("span_start", pa.int64()), pa.field("surface", pa.string()),
        pa.field("surface_lc", pa.string()), pa.field("entity", pa.string()),
        pa.field("conf", pa.float64())])
    el_pred = scrub_empty_blocks(detected.join(
        top1.select_columns(["surface", "entity", "conf"])
            .rename_columns({"surface": "s_lc"}),
        join_type="inner", num_partitions=nparts,
        on=("surface_lc",), right_on=("s_lc",))
        .filter(expr=f"conf >= {ed_threshold!r}").materialize(),
        fallback_schema=pred_schema)
    # filter_nil (evaluation.py:84-92): drop predictions aligned with
    # NIL-annotated mention keys — a distributed anti-join
    if nil.count() > 0:
        el_pred = scrub_empty_blocks(el_pred.join(
            nil.select_columns(["doc_id", "span_start", "surface"])
               .rename_columns({"doc_id": "n_doc", "span_start": "n_start",
                                "surface": "n_surface"}),
            join_type="left_anti", num_partitions=nparts,
            on=("doc_id", "span_start", "surface"),
            right_on=("n_doc", "n_start", "n_surface")).materialize(),
            fallback_schema=pred_schema)

    # counted dispatch: a fully-filtered prediction set (possible on
    # small/NIL-heavy benchmarks) is all-zero by definition — joining
    # a 0-row dataset would re-enter the zero-column-partition trap
    # inside the join's own shuffle
    zeros = {name: 0 for name in DATASET_NAMES}
    if el_pred.count() > 0:
        el_npred = _count_by_dataset(el_pred)
        el_tp = _count_by_dataset(el_pred.join(
            gold.select_columns(["doc_id", "span_start", "surface",
                                 "gold_qcode"])
                .rename_columns({"doc_id": "g_doc", "span_start": "g_start",
                                 "surface": "g_surface"}),
            join_type="inner", num_partitions=nparts,
            on=("doc_id", "span_start", "surface", "entity"),
            right_on=("g_doc", "g_start", "g_surface", "gold_qcode")))
    else:
        el_npred, el_tp = dict(zeros), dict(zeros)

    # MD counts (evaluation.py:99-105): detected-span keys vs the SET
    # of annotated mention keys (gold ∪ nil), entity-blind.  Set (not
    # multiset) semantics: a span annotated both with an in-KB entity
    # AND as NIL under the same key carries ONE md key, as the
    # reference's set union does — multiset arithmetic would
    # double-count it in tp_md / fn_md and could push fp_md negative.
    key_cols = ["doc_id", "dataset", "span_start", "surface"]
    md_keys = _distinct_keys(
        gold.select_columns(key_cols).union(nil.select_columns(key_cols)),
        key_cols)
    n_md = _count_by_dataset(md_keys)
    # distinct gold keys — the ED-mode predicted-span set (gold ⊆ md)
    n_gold_keys = _count_by_dataset(
        _distinct_keys(gold.select_columns(key_cols), key_cols))
    el_tp_md = _count_by_dataset(detected.join(
        md_keys.select_columns(["doc_id", "span_start", "surface"])
               .rename_columns({"doc_id": "m_doc", "span_start": "m_start",
                                "surface": "m_surface"}),
        join_type="inner", num_partitions=nparts,
        on=("doc_id", "span_start", "surface"),
        right_on=("m_doc", "m_start", "m_surface")))

    # --- base counts --------------------------------------------------
    def docs_dataset(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"dataset": dataset_of_ids(ids)})

    n_docs = _count_by_dataset(
        docs.map_batches(docs_dataset, batch_format="pyarrow"))
    n_gold = _count_by_dataset(gold)
    n_det = _count_by_dataset(detected)

    rows = []
    for name in DATASET_NAMES:
        g = n_gold[name]
        # EL mode: pred/gold span-set algebra — tp from the triple
        # join, fp = |preds| - tp, fn = |gold| - tp; MD counts are
        # over the distinct-key sets (md_keys / n_md above)
        rows.append(_metric_row(
            name, "EL", num_docs=n_docs[name], n_gold=g,
            in_cand=in_cand[name], tp=el_tp[name],
            fp=el_npred[name] - el_tp[name], fn=g - el_tp[name],
            tp_md=el_tp_md[name], fp_md=n_det[name] - el_tp_md[name],
            fn_md=n_md[name] - el_tp_md[name]))
        # ED mode: spans are given (evaluation.py:58), so the
        # predicted MD key set IS the gold key set; gold ⊆ md_spans
        # by reader construction (md_spans = spans ∪ nil), hence
        # tp_md = |gold keys|, fp_md = 0, fn_md = |md| - |gold keys|
        rows.append(_metric_row(
            name, "ED", num_docs=n_docs[name], n_gold=g,
            in_cand=in_cand[name], tp=ed_tp[name],
            fp=ed_npred[name] - ed_tp[name], fn=g - ed_tp[name],
            tp_md=n_gold_keys[name], fp_md=0,
            fn_md=n_md[name] - n_gold_keys[name]))

    cols: dict[str, pa.Array] = {}
    for key in rows[0]:
        vals = [row[key] for row in rows]
        if key in ("dataset", "mode"):
            cols[key] = pa.array(vals, type=pa.string())
        elif isinstance(rows[0][key], int):
            cols[key] = pa.array(vals, type=pa.int64())
        else:
            cols[key] = _canon_round(vals, 6)
    return rd.from_arrow(pa.table(cols))
