"""The flagship pipeline: blocking + pairwise scoring + transitive
clustering over Parquet web pages (the BASELINE.json north rule).

    read_parquet(url, warc_ts, html, text, lang)
      └─ map_batches(extract_text)      byte-identical text per url
      └─ map_batches(sign_pages)        MinHash sig + hash emb + head key
      ├─ map_batches(emit_block_keys)   64 LSH bands + mention key (narrow)
      │    └─ groupby(block_key) → pairs (salted/capped, logged)
      │    └─ groupby(a,b) → deduped pairs
      └─ join payloads → map_batches(PairScorer actor pool)
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
from ..stages.scoring import DEFAULT_THRESHOLD, attach_payloads, score_pairs
from ..stages.signing import sign_pages


def build_payload(sf_dir: str):
    """webpages parquet → per-page payload Dataset (the shared table)."""
    import ray.data as rd

    from .. import configure_data_context

    configure_data_context()
    pages = rd.read_parquet(ensure_webpages(sf_dir), columns=["url", "html"])
    extracted = extract_pages(pages)
    return sign_pages(extracted)


def er_cluster_pages(
    sf_dir: str,
    threshold: float = DEFAULT_THRESHOLD,
    max_block_size: int = DEFAULT_MAX_BLOCK_SIZE,
    num_partitions: int | None = None,
):
    """Full pipeline → Dataset(url, cluster_id).

    cluster_id = min page_id (stable url hash) of the page's connected
    component — deterministic across runs and partitionings.  The url
    rides through the clustering stage as a pass-through column, so no
    re-attachment join is needed.

    Stage boundaries are ``materialize()`` barriers: each wide op
    (blocking shuffle, pair dedup, payload joins) runs alone rather
    than overlapping with the next shuffle.  Concurrent hash-shuffle
    operators each provision their own aggregator-actor pool, so
    overlapping them multiplies actor count without adding throughput;
    the barrier is also exactly where the checkpointer persists stage
    outputs for resume (state/manifests.py).
    """
    from .. import default_num_partitions

    num_partitions = num_partitions or default_num_partitions()
    payload, _scored, edges = er_edges(
        sf_dir, threshold=threshold, max_block_size=max_block_size,
        num_partitions=num_partitions,
    )

    vertices = payload.select_columns(["page_id", "url"])
    labeled = connected_components(vertices, edges.select_columns(["a", "b"]),
                                   num_partitions=num_partitions)
    return labeled.select_columns(["url", "component"]).rename_columns(
        {"component": "cluster_id"})


def er_edges(sf_dir: str, threshold: float = DEFAULT_THRESHOLD,
             max_block_size: int = DEFAULT_MAX_BLOCK_SIZE, num_partitions: int | None = None):
    """Payload + scored pairs + accepted edges (shared pipeline head)."""
    from .. import default_num_partitions

    num_partitions = num_partitions or default_num_partitions()
    payload = build_payload(sf_dir).materialize()  # reused by 3 consumers
    block_rows = emit_block_keys(payload)
    pairs = enumerate_pairs(block_rows, max_block_size=max_block_size,
                            num_partitions=num_partitions).materialize()
    # joins + scoring map/filter fuse into one streaming execution: the
    # scorer is shuffle-free, so no barrier between them.
    enriched = attach_payloads(pairs, payload, num_partitions=num_partitions)
    scored, edges = score_pairs(enriched, threshold=threshold)
    edges = edges.materialize()
    return payload, scored, edges
