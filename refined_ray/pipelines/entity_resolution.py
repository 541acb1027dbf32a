"""The flagship pipeline: blocking + pairwise scoring + transitive
clustering over Parquet web pages (the BASELINE.json north rule).

    read_parquet(url, warc_ts, html, text, lang)
      └─ map_batches(extract_text)      byte-identical text per url
      └─ map_batches(sign_pages)        MinHash sig + hash emb + head key
      ├─ map_batches(emit_block_keys)   adaptive LSH bands + mention key (narrow)
      │    └─ keyed exchange(block_key) → pairs (salted/capped, logged)
      │    └─ keyed exchange(a,b) → deduped pairs
      └─ broadcast payload (or hash joins) → PairScorer actor pool
      └─ filter(score ≥ τ) → edges
      └─ connected_components (min-label propagation + pointer jumping)
      └─ (url, cluster_id = min page_id of component)

Every wide step is keyed on uint64 hashes; the html column dies right
after extraction; the payload table is computed once and consumed by
both blocking and scoring.
"""

from __future__ import annotations

from ..sources.webpages import ensure_webpages
from ..stages.blocking import emit_block_keys
from ..stages.clustering import connected_components
from ..stages.extract import extract_pages
from ..stages.pairs import DEFAULT_MAX_BLOCK_SIZE, enumerate_pairs
from ..stages.scoring import (
    DEFAULT_THRESHOLD,
    attach_payloads,
    score_pairs,
    score_pairs_broadcast,
)
from ..stages.signing import sign_pages

# sig 1024 B + emb 256 B + head/url/ids ≈ 1.4 KB per payload row; the
# broadcast path needs the whole payload resident in every scorer actor
# (zero-copy for the numpy parts via the shared object store on a node).
PAYLOAD_ROW_BYTES = 1400
BROADCAST_MAX_BYTES = 2_000_000_000


def build_payload(sf_dir: str, amplify: int = 1, fatten: int = 1,
                  emit_sets: bool = False):
    """webpages parquet → per-page payload Dataset (the shared table)."""
    import ray.data as rd

    from .. import configure_data_context

    configure_data_context()
    path = ensure_webpages(sf_dir, amplify=amplify, fatten=fatten)
    # Read granularity: ~1000 pages (≈8 MB of text) per block so each
    # extract+sign task's working set stays cache-resident.  Measured on
    # the 320k-page corpus at 8 CPUs: 10k-page blocks → 55 s payload
    # (860 MB peak task heap, DRAM-bound); 1.2k-page blocks → 27 s and
    # 2→8 CPU efficiency 0.83 → 0.89.  Row count comes from parquet
    # footers (metadata-only, no data read).
    import pyarrow.dataset as pads
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    total_rows = pads.dataset(path).count_rows()
    num_blocks = int(min(max(total_rows / 1000, 4 * cpus), 4096))
    from .. import read_parquet_clean

    pages = read_parquet_clean(path, columns=["url", "html"],
                               override_num_blocks=num_blocks)
    return payload_from_pages(pages, emit_sets=emit_sets)


def payload_from_pages(pages, emit_sets: bool = False):
    """(url, html) pages Dataset → payload Dataset (extract + sign).

    Crawl hygiene at the ingest boundary: real Common-Crawl parquet
    carries records with a NULL url or payload (truncated fetches,
    redirect stubs); they are unusable for linkage — a page without a
    url cannot join ground truth or receive a cluster id — so they are
    scrubbed HERE, once, instead of crashing three stages later inside
    signing.  The synthetic corpora are null-free, so this is a no-op
    on every benchmark path."""
    import pyarrow.compute as _pc

    def drop_unusable(b):
        return b.filter(_pc.and_(_pc.is_valid(b["url"]),
                                 _pc.is_valid(b["html"])))

    pages = pages.map_batches(drop_unusable, batch_format="pyarrow")
    extracted = extract_pages(pages)
    return sign_pages(extracted, emit_sets=emit_sets)


def er_cluster_pages(
    sf_dir: str,
    threshold: float = DEFAULT_THRESHOLD,
    max_block_size: int = DEFAULT_MAX_BLOCK_SIZE,
    num_partitions: int | None = None,
    amplify: int = 1,
    fatten: int = 1,
    exchange_root: str | None = None,
    exact_verify: bool = False,
    scorer: str = "auto",
    scorer_kwargs: dict | None = None,
    cc_driver_max_edges: int | None = None,
):
    """Full pipeline → Dataset(url, cluster_id).

    cluster_id = min page_id (stable url hash) of the page's connected
    component — deterministic across runs and partitionings.  The url
    rides through the clustering stage as a pass-through column, so no
    re-attachment join is needed.

    ``cc_driver_max_edges``: override for the clustering stage's
    counted driver-vs-distributed dispatch (clustering.py:134-136);
    pass 0 to force the fully distributed label-propagation path
    (bench.py's ``er_clusters_distcc`` row uses this so the 100-TB
    code path carries a recorded wall time, not just parity tests).

    For a resumable run with per-stage checkpoints, use
    ``er_cluster_pages_checkpointed``.
    """
    from .. import default_num_partitions

    num_partitions = num_partitions or default_num_partitions()
    payload, _scored, edges = er_edges(
        sf_dir, threshold=threshold, max_block_size=max_block_size,
        num_partitions=num_partitions, amplify=amplify, fatten=fatten,
        exchange_root=exchange_root, exact_verify=exact_verify,
        scorer=scorer, scorer_kwargs=scorer_kwargs,
    )

    vertices = payload.select_columns(["page_id", "url"])
    cc_kwargs = ({} if cc_driver_max_edges is None
                 else {"driver_max_edges": cc_driver_max_edges})
    labeled = connected_components(vertices, edges.select_columns(["a", "b"]),
                                   num_partitions=num_partitions, **cc_kwargs)
    return labeled.select_columns(["url", "component"]).rename_columns(
        {"component": "cluster_id"})


# borderline band half-width for the exact-verification tier: the
# 128-perm MinHash estimate has σ ≈ 0.044, so ±0.12 ≈ 2.7σ covers the
# estimates whose true Jaccard may sit on the other side of 0.5
EXACT_VERIFY_MARGIN = 0.12
EXACT_JACCARD_THRESHOLD = 0.5


def er_edges(sf_dir: str, threshold: float = DEFAULT_THRESHOLD,
             max_block_size: int = DEFAULT_MAX_BLOCK_SIZE, num_partitions: int | None = None,
             amplify: int = 1, fatten: int = 1, exchange_root: str | None = None,
             exact_verify: bool = False, payload=None, scorer: str = "auto",
             scorer_kwargs: dict | None = None):
    """Payload + scored pairs + accepted edges (shared pipeline head).

    ``exchange_root``: directory for the disk exchange's partitioned
    files — on a multi-node cluster pass SHARED storage (defaults to
    $REFINED_RAY_EXCHANGE_ROOT or node-local /tmp, single-node only).

    ``exact_verify``: adds the exact tier — pairs whose MinHash
    Jaccard estimate falls inside ±EXACT_VERIFY_MARGIN of the 0.5
    component threshold are re-decided by EXACT set Jaccard (sorted
    shingle sets joined onto just the borderline pairs).  Estimates
    outside the band keep the cheap composite decision.  Costs one
    extra payload column (~8 B/distinct shingle/page) and two joins
    over the (small) borderline subset.

    ``scorer``: "auto" (broadcast under the byte budget, hash joins
    beyond — the default), "actor" (GPU-shaped actor pool,
    score_pairs_actor: pool state in __init__, num_gpus/concurrency/
    batch_size knobs via ``scorer_kwargs``), or "join" (force the
    hash-join attachment).  All three emit identical edges
    (parity-tested)."""
    from .. import default_num_partitions

    num_partitions = num_partitions or default_num_partitions()
    if payload is None:
        payload = build_payload(sf_dir, amplify=amplify, fatten=fatten,
                                emit_sets=exact_verify).materialize()  # reused by 3 consumers

    # Payload attachment: broadcast when the payload fits in worker
    # memory (one ray.put, zero joins — the join path's enriched pair
    # stream is ~25× corpus size since every pair row carries two 1 KB
    # signatures); fall back to two hash joins beyond the budget.
    if scorer not in ("auto", "actor", "join"):
        raise ValueError(f"unknown scorer {scorer!r}")
    n_pages = payload.count()
    payload_bytes = n_pages * PAYLOAD_ROW_BYTES
    if scorer == "actor" and payload_bytes > BROADCAST_MAX_BYTES:
        # the actor pool holds the payload per actor: refuse loudly
        # rather than OOM the driver assembling an over-budget bundle
        raise ValueError(
            f"scorer='actor' needs the payload broadcast, but "
            f"{n_pages} pages ≈ {payload_bytes >> 20} MiB exceeds the "
            f"{BROADCAST_MAX_BYTES >> 20} MiB budget; use scorer='auto' "
            f"(hash-join fallback) or raise BROADCAST_MAX_BYTES")
    use_broadcast = scorer == "actor" or (
        scorer == "auto" and payload_bytes <= BROADCAST_MAX_BYTES)

    # The broadcast assembly is DRIVER-side memcpy over the materialized
    # payload (zero-copy plasma derefs, no dataset execution) — overlap
    # it with the pair-enumeration exchange so its wall time disappears
    # behind the shuffle instead of adding a serial term.
    ref_box: dict = {}
    builder = None
    if use_broadcast:
        import threading

        from ..stages.scoring import broadcast_payload_ref

        builder = threading.Thread(
            target=lambda: ref_box.update(ref=broadcast_payload_ref(payload)))
        builder.start()

    block_rows = emit_block_keys(payload)
    pairs = enumerate_pairs(block_rows, max_block_size=max_block_size,
                            num_partitions=num_partitions,
                            exchange_root=exchange_root)
    # blocking repartitions, pair dedup and the scorer fuse into ONE
    # streaming execution: aggregator pools are sized to cluster CPUs
    # (configure_data_context), so chained shuffle ops pipeline
    # block-by-block instead of thrashing the scheduler, and
    # per-execution actor spin-up is paid once for the whole chain.
    if use_broadcast:
        builder.join()
        if scorer == "actor":
            from ..stages.scoring import score_pairs_actor

            scored, edges = score_pairs_actor(
                pairs, payload, threshold=threshold,
                payload_ref=ref_box["ref"], **(scorer_kwargs or {}))
        else:
            scored, edges = score_pairs_broadcast(pairs, payload, threshold=threshold,
                                                  payload_ref=ref_box["ref"])
    else:
        enriched = attach_payloads(pairs, payload, num_partitions=num_partitions)
        scored, edges = score_pairs(enriched, threshold=threshold)
    if exact_verify:
        edges = _exact_edges_scrubbed(scored, payload, threshold, num_partitions)
    else:
        edges = edges.materialize()
    return payload, scored, edges


def _exact_edges_scrubbed(scored, payload, threshold, num_partitions):
    """Exact tier + empty-block scrub, shared by er_edges and the
    checkpointed flagship: re-decide borderline pairs by exact set
    Jaccard, then drop the hash joins' zero-column empty-partition
    blocks (metadata-only) so downstream clustering shuffles never see
    mixed-schema empties."""
    import pyarrow as pa

    from .. import scrub_empty_blocks

    edges = _exact_verify_edges(scored, payload, threshold=threshold,
                                num_partitions=num_partitions)
    return scrub_empty_blocks(
        edges.materialize(),
        fallback_schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]))


def _exact_verify_edges(scored, payload, threshold: float, num_partitions: int):
    """Tiered decision: inside the borderline estimate band, EXACT set
    Jaccard decides (the estimator cannot be trusted at the 0.5
    component boundary); outside it, estimates ≥ hi accept and low
    estimates fall back to the composite score, which rescues true
    pairs whose MinHash estimate (OPH downward bias up to the empty-
    bucket fraction) undershot the band."""
    import pyarrow as pa

    from ..functions.arrowbuf import exact_jaccard_pairs

    lo = EXACT_JACCARD_THRESHOLD - EXACT_VERIFY_MARGIN
    hi = EXACT_JACCARD_THRESHOLD + EXACT_VERIFY_MARGIN

    # Filter + project in ONE map with a pinned output schema.  Ray
    # 2.49's filter(expr) forwards fully-emptied blocks WITHOUT the
    # downstream select_columns projection (and empty scorer blocks can
    # be zero-column), so a filter().select_columns() chain feeds
    # mixed-schema empty blocks into the hash joins below — whose
    # finalize then crashes (ArrowInvalid) whenever such a block lands
    # in a non-empty aggregator partition.  A single map_batches that
    # always emits (a:int64, b:int64) closes that hazard.
    _AB = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def _band(t: pa.Table, keep_border: bool) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0 or "est_jaccard" not in t.schema.names:
            return _AB.empty_table()
        est, score = t["est_jaccard"], t["score"]
        if keep_border:
            mask = pc.and_(pc.greater(est, lo), pc.less(est, hi))
        else:
            mask = pc.or_(pc.greater_equal(est, hi),
                          pc.and_(pc.less_equal(est, lo),
                                  pc.greater_equal(score, threshold)))
        return t.select(["a", "b"]).filter(mask).cast(_AB)

    confident = scored.map_batches(lambda t: _band(t, False),
                                   batch_format="pyarrow")
    borderline = scored.map_batches(lambda t: _band(t, True),
                                    batch_format="pyarrow")

    from .. import scrub_empty_blocks

    borderline = borderline.materialize()
    if borderline.count() == 0:  # empty build side breaks Ray's hash join
        return confident
    # empty scorer blocks bypass _band (map UDFs never see empty
    # blocks), so scrub them before the joins: a zero-column empty
    # block landing in a non-empty join aggregator partition raises
    # ArrowInvalid (placement-dependent — the round-1 flake)
    borderline = scrub_empty_blocks(borderline, fallback_schema=_AB)

    sets = payload.select_columns(["page_id", "set"])
    a_side = sets.rename_columns({"page_id": "a", "set": "set_a"})
    b_side = sets.rename_columns({"page_id": "b", "set": "set_b"})
    enriched = borderline.join(a_side, join_type="inner",
                               num_partitions=num_partitions, on=("a",)) \
                         .join(b_side, join_type="inner",
                               num_partitions=num_partitions, on=("b",))
    # the joins themselves emit zero-column blocks for empty partitions;
    # drop them so `decide` and the union below see one schema
    enriched = scrub_empty_blocks(enriched.materialize())
    if enriched.count() == 0:
        return confident

    def decide(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        j = exact_jaccard_pairs(b["set_a"], b["set_b"])
        keep = pa.array(j >= EXACT_JACCARD_THRESHOLD)
        return b.select(["a", "b"]).filter(keep)

    verified = enriched.map_batches(decide, batch_format="pyarrow")
    return confident.union(verified)


def er_cluster_pages_checkpointed(
    sf_dir: str,
    checkpoint_root: str,
    threshold: float = DEFAULT_THRESHOLD,
    max_block_size: int = DEFAULT_MAX_BLOCK_SIZE,
    num_partitions: int | None = None,
    amplify: int = 1,
    fatten: int = 1,
    exact_verify: bool = False,
):
    """Flagship pipeline with per-stage Parquet checkpoints + lineage
    manifests (state/manifests.py) — the ``ray job submit`` entry for
    resumable runs (≙ the reference's artifact gating,
    preprocess_all.py:149-336, made partition-granular).

    A rerun with the same inputs skips every completed stage (verified
    by fingerprint); changing an upstream parameter invalidates that
    stage and everything after it, because each stage's fingerprint
    chains the upstream fingerprint.
    """
    import hashlib

    from .. import default_num_partitions
    from ..state.manifests import StageCheckpointer

    num_partitions = num_partitions or default_num_partitions()
    cp = StageCheckpointer(checkpoint_root)

    def fp(*parts) -> str:
        return hashlib.blake2b("|".join(str(p) for p in parts).encode(),
                               digest_size=16).hexdigest()

    # exact_verify changes the payload SCHEMA (adds the shingle-set
    # column), so it is part of the payload fingerprint
    fp_payload = fp("payload", sf_dir, amplify, fatten, exact_verify)
    payload = cp.run_stage("payload", fp_payload,
                           lambda: build_payload(sf_dir, amplify=amplify, fatten=fatten,
                                                 emit_sets=exact_verify))

    # pairs are INVARIANT to the shingle-set column (emit_block_keys /
    # enumerate_pairs never read it), so their fingerprint chains the
    # set-independent payload identity — toggling exact_verify keeps
    # the expensive blocking+pair checkpoint valid
    fp_pairs = fp("pairs", fp("payload", sf_dir, amplify, fatten),
                  max_block_size, num_partitions)
    pairs_fresh = not cp.is_complete("pairs", fp_pairs)
    pairs = cp.run_stage(
        "pairs", fp_pairs,
        lambda: enumerate_pairs(emit_block_keys(payload),
                                max_block_size=max_block_size,
                                num_partitions=num_partitions))
    if pairs_fresh:
        # skew accounting (north rule: caps are logged, never silent)
        from ray.data.aggregate import Max, Sum

        agg = pairs.aggregate(Sum("capped", alias_name="n_capped"),
                              Max("block_size", alias_name="max_block_seen"))
        cp.update_counters("pairs", {
            "n_capped_pairs": int(agg["n_capped"] or 0),
            "max_block_size_seen": int(agg["max_block_seen"] or 0),
            "pair_cap": max_block_size,
        })

    fp_edges = fp("edges", fp_pairs, threshold, exact_verify)

    def build_edges():
        scored, edges = score_pairs_broadcast(pairs, payload, threshold=threshold)
        if exact_verify:
            edges = _exact_edges_scrubbed(scored, payload, threshold,
                                          num_partitions)
        return edges.select_columns(["a", "b"])

    edges = cp.run_stage("edges", fp_edges, build_edges)

    fp_labels = fp("labels", fp_edges)

    def build_labels():
        vertices = payload.select_columns(["page_id", "url"])
        labeled = connected_components(vertices, edges, num_partitions=num_partitions)
        return labeled.select_columns(["url", "component"]).rename_columns(
            {"component": "cluster_id"})

    return cp.run_stage("labels", fp_labels, build_labels)


# ---------------------------------------------------------------------
# Incremental ingest: fold a page DELTA into a standing clustering
# ---------------------------------------------------------------------


def _pages_split(sf_dir: str, holdout_mod: int):
    """Deterministic (base, delta) split of the corpus by page-id hash:
    pages whose stable page_id % holdout_mod == 0 form the delta."""
    import numpy as np
    import pyarrow as pa

    from .. import read_parquet_clean
    from ..stages.signing import page_id_array

    path = ensure_webpages(sf_dir)
    pages = read_parquet_clean(path, columns=["url", "html"])

    def part(keep_delta: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = page_id_array(b["url"].to_pylist())
            m = (ids % np.int64(holdout_mod) == 0) == keep_delta
            return b.filter(pa.array(m))

        return pages.map_batches(f, batch_format="pyarrow")

    return part(False), part(True)


def er_cluster_incremental(
    sf_dir: str,
    checkpoint_root: str,
    holdout_mod: int = 5,
    threshold: float = DEFAULT_THRESHOLD,
    max_block_size: int = DEFAULT_MAX_BLOCK_SIZE,
    num_partitions: int | None = None,
):
    """Incremental ER: cluster a standing BASE corpus once (into
    per-stage checkpoints), then fold the page DELTA in WITHOUT
    re-scoring base×base pairs — the daily-crawl-ingest shape at
    100 TB, where the delta is orders of magnitude smaller than the
    corpus.

    Mechanics:
    - base payload + base labels come from ``StageCheckpointer`` stages
      (chained fingerprints: a repeated call with unchanged inputs
      re-reads Parquet and recomputes nothing);
    - the delta is signed fresh; blocking runs over base ∪ delta (LSH
      band keys are per-page, so base pages keep their keys), but only
      pairs TOUCHING a delta page are scored (membership test against
      a broadcast sorted array of delta ids — 8 B/delta page, bounded
      by the delta size);
    - connectivity is re-solved over (base page → base cluster-id
      edges) ∪ (accepted delta edges), so a delta page that bridges
      two base clusters correctly merges them.

    The demo/test split is deterministic (page_id % holdout_mod == 0
    is the delta); a production caller would pass its own delta pages
    through the same machinery (`payload_from_pages`).

    Returns Dataset(url, cluster_id) over base ∪ delta — identical to
    the full-corpus run whenever no pair cap binds (test-gated at
    sf0.001).
    """
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray

    from .. import default_num_partitions
    from ..state.manifests import StageCheckpointer

    num_partitions = num_partitions or default_num_partitions()
    cp = StageCheckpointer(checkpoint_root)

    def fp(*parts) -> str:
        return hashlib.blake2b("|".join(str(p) for p in parts).encode(),
                               digest_size=16).hexdigest()

    base_pages, delta_pages = _pages_split(sf_dir, holdout_mod)

    fp_pb = fp("payload_base", sf_dir, holdout_mod)
    payload_base = cp.run_stage(
        "payload_base", fp_pb, lambda: payload_from_pages(base_pages)).materialize()

    fp_lb = fp("labels_base", fp_pb, threshold, max_block_size, num_partitions)

    def build_base_labels():
        _, _scored, edges = er_edges(
            sf_dir, threshold=threshold, max_block_size=max_block_size,
            num_partitions=num_partitions, payload=payload_base)
        labeled = connected_components(
            payload_base.select_columns(["page_id", "url"]),
            edges.select_columns(["a", "b"]), num_partitions=num_partitions)
        return labeled.select_columns(["page_id", "component"])

    labels_base = cp.run_stage("labels_base", fp_lb, build_base_labels)

    # ---- incremental part: sign the delta, score only touching pairs
    payload_delta = payload_from_pages(delta_pages).materialize()
    payload_all = payload_base.union(payload_delta).materialize()

    id_chunks = [b["page_id"].to_numpy(zero_copy_only=False)
                 for b in ray.get(payload_delta.to_arrow_refs())
                 if b.num_rows]
    delta_ids = np.sort(np.concatenate(id_chunks)) if id_chunks \
        else np.array([], dtype=np.int64)
    ref_delta = ray.put(delta_ids)

    pairs = enumerate_pairs(emit_block_keys(payload_all),
                            max_block_size=max_block_size,
                            num_partitions=num_partitions)

    def touching_delta(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        ids = ray.get(ref_delta)
        if len(ids) == 0:
            return b.slice(0, 0)

        def member(col):
            v = col.to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.clip(np.searchsorted(ids, v), 0, len(ids) - 1)
            return ids[pos] == v

        return b.filter(pa.array(member(b["a"]) | member(b["b"])))

    pairs_delta = pairs.map_batches(touching_delta, batch_format="pyarrow")
    _scored, edges_delta = score_pairs_broadcast(pairs_delta, payload_all,
                                                 threshold=threshold)

    base_edges = labels_base.rename_columns({"page_id": "a", "component": "b"})
    all_edges = edges_delta.select_columns(["a", "b"]).union(base_edges)
    labeled = connected_components(payload_all.select_columns(["page_id", "url"]),
                                   all_edges, num_partitions=num_partitions)
    return labeled.select_columns(["url", "component"]).rename_columns(
        {"component": "cluster_id"})
