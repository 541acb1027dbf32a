"""Pairwise scoring: an actor-pool ``map_batches`` stage over candidate
pairs enriched with both sides' payloads.

≙ the reference's ED scorer feature combiner
(entity_disambiguation_layer.py:36-119: a linear layer over
[description bi-encoder dot product, PEM prior, type distance]),
re-expressed from scratch for symmetric record linkage:

  features per pair:
    est_jaccard  MinHash signature agreement (≙ candidate overlap)
    cos_sim      hash-embedding cosine (≙ bi-encoder dot product, T3)
    jw_sim       Jaro-Winkler on normalized head keys
    lev_sim      normalized Levenshtein on head keys
  score = fixed convex combination (a learned layer would slot in the
  same place; weights are part of the engine contract, not trained).

The scorer is a callable CLASS → Ray actor pool: the (tiny, here)
model state — weights, thresholds, any side tables — is built once per
actor in ``__init__``; ``__call__`` is fully vectorized per batch.
With a real GPU bi-encoder this same class would carry the model and
``num_gpus=1``; nothing else in the pipeline changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.minhash import NUM_PERMS
from ..functions.strings import jaro_winkler_batch, levenshtein_similarity_batch

# est_jaccard dominates the convex combination: it is the only feature
# with a provable margin on near-duplicate corpora (cross-entity page
# pairs sit at J ≤ 0.2, needed intra-entity links at J ≥ 0.45; with 128
# permutations the estimate's σ ≈ 0.045, so τ = 0.5 leaves >2σ on both
# sides once the weighted secondary features are added).  Cosine over
# hash embeddings is deliberately down-weighted: bag-of-words cosine is
# near-1 for same-domain text and only breaks ties.
DEFAULT_THRESHOLD = 0.5
WEIGHTS = {"est_jaccard": 0.70, "cos_sim": 0.10, "jw_sim": 0.10, "lev_sim": 0.10}


def _binary_to_matrix(col, dtype_str: str) -> np.ndarray:
    """binary column of fixed-width blobs → (n, w) matrix.

    Zero-copy fast path: a binary array's values buffer is contiguous,
    so when all blobs share one width the matrix is a view over the
    Arrow buffer (offsets checked, no python-object round trip — the
    to_pylist/join route costs ~3 ms per 1k rows)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty((0, 0), dtype=dtype_str)
    offs_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
    offs = np.frombuffer(offs_buf, dtype=np.int32)[arr.offset: arr.offset + len(arr) + 1]
    widths = np.diff(offs)
    if (widths == widths[0]).all():
        data = np.frombuffer(data_buf, dtype=np.uint8)[offs[0]: offs[-1]]
        return data.view(dtype_str).reshape(len(arr), -1)
    buf = b"".join(arr.to_pylist())
    return np.frombuffer(buf, dtype=dtype_str).reshape(len(arr), -1)


def _score_features(out_base: pa.Table, sig_a, sig_b, emb_a, emb_b,
                    head_a, head_b, w: np.ndarray,
                    threshold: float = DEFAULT_THRESHOLD) -> pa.Table:
    """Shared feature math for both scorer variants — CASCADE scoring.

    Stage 1 (vectorized, every pair): est_jaccard + cosine give bounds
    [base, base + w_jw + w_lev] on the full score.  Pairs whose bound
    interval does not straddle the threshold are DECIDED without string
    similarity; only the uncertain band (typically a few %) pays the
    O(len²) Jaro-Winkler/Levenshtein stage.  The resulting edge set
    (score ≥ τ) is IDENTICAL to scoring every pair fully; for decided
    pairs the emitted ``score`` is the stage-1 lower bound and
    jw_sim/lev_sim are NaN.

    CONTRACT: string similarities run over the first 16 chars of each
    head only (the cap below) — jw_sim/lev_sim are NOT uncapped-string
    values.  Both scorer variants (broadcast and actor) share this
    semantics (parity-tested); a future model swap must either keep the
    cap or re-derive weights/threshold against uncapped similarities."""
    est_j = (sig_a == sig_b).mean(axis=1)
    cos = np.einsum("ij,ij->i", emb_a, emb_b).astype(np.float64)
    cosc = np.clip(cos, 0.0, 1.0)
    base = w[0] * est_j + w[1] * cosc
    string_budget = w[2] + w[3]
    uncertain = (base < threshold) & (base + string_budget >= threshold)

    jw = np.full(len(base), np.nan)
    lev = np.full(len(base), np.nan)
    score = base.copy()
    if uncertain.any():
        idx = np.nonzero(uncertain)[0]
        # cap similarity inputs: JW is O(len^2) scalar python and the
        # batched Levenshtein DP costs O(len^2) vector passes; the
        # head's discriminative prefix is what matters (JW is
        # prefix-weighted anyway).  16 chars ≈ first 3 tokens.
        ha = [head_a[i][:16] for i in idx]
        hb = [head_b[i][:16] for i in idx]
        jw_u = jaro_winkler_batch(ha, hb)
        lev_u = levenshtein_similarity_batch(ha, hb, max_len=16)
        jw[idx] = jw_u
        lev[idx] = lev_u
        score[idx] = base[idx] + w[2] * jw_u + w[3] * lev_u

    out = out_base
    for name, col in (("est_jaccard", est_j), ("cos_sim", cos), ("jw_sim", jw),
                      ("lev_sim", lev), ("score", score)):
        out = out.append_column(name, pa.array(col, type=pa.float64()))
    return out


class PairScorer:
    """Actor-pool scorer over JOIN-ENRICHED pairs.  Input batch columns:
    a, b, n_shared_blocks, sig_a, sig_b, emb_a, emb_b, head_a, head_b.
    Output adds the four feature columns + ``score``."""

    def __init__(self, weights: dict | None = None, threshold: float = DEFAULT_THRESHOLD):
        w = weights or WEIGHTS
        self.w = np.array([w["est_jaccard"], w["cos_sim"], w["jw_sim"], w["lev_sim"]])
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return _score_features(
            batch.select(["a", "b", "n_shared_blocks", "block_size", "capped"]),
            _binary_to_matrix(batch["sig_a"], "<u2"),
            _binary_to_matrix(batch["sig_b"], "<u2"),
            _binary_to_matrix(batch["emb_a"], "<f4"),
            _binary_to_matrix(batch["emb_b"], "<f4"),
            batch["head_a"].to_pylist(), batch["head_b"].to_pylist(), self.w,
            threshold=self.threshold,
        )


class PairScorerBroadcast:
    """Actor-pool scorer over NARROW pairs with a broadcast payload.

    The payload (page_id-sorted sig/emb matrices + heads) is put in the
    object store ONCE (``ray.put``) and dereferenced per actor in
    ``__init__`` — zero-copy for the numpy matrices.  ``__call__`` looks
    both pair sides up via searchsorted.  This replaces two hash joins
    whose output stream is ~25× the corpus size (each pair row carries
    two 1 KB signatures); use it whenever the payload fits comfortably
    in worker memory (see BROADCAST_MAX_BYTES in the pipeline).

    GPU-shaped knobs (≙ reference RefinedModel.forward,
    refined_model.py:164-343, run via score_pairs_actor):

    - ``length_bucket``: sort each batch by combined head length before
      scoring and scatter back (≙ sort-batch-elements-by-token-length
      collation, preprocessing_utils.py:196-199 — keeps padding waste
      low when a real padded-tensor model sits in the loop).  Output
      rows are identical either way.
    - ``burn_ms``: deliberately CPU-burning stand-in for a heavy model
      forward (per batch) — lets tests/benchmarks exercise pool sizing
      without transformer weights in the container.
    """

    def __init__(self, payload_ref, weights: dict | None = None,
                 threshold: float = DEFAULT_THRESHOLD,
                 length_bucket: bool = False, burn_ms: float = 0.0):
        import ray

        w = weights or WEIGHTS
        self.w = np.array([w["est_jaccard"], w["cos_sim"], w["jw_sim"], w["lev_sim"]])
        self.threshold = threshold
        self.length_bucket = length_bucket
        self.burn_ms = burn_ms
        # all four arrays are numpy → zero-copy views into the shared
        # object-store copy (heads are fixed-width S64 bytes — 16 chars
        # × max UTF-8 width — not python strings, exactly so this deref
        # stays zero-copy per actor)
        self.ids, self.sig, self.emb, self.heads = ray.get(payload_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        if self.burn_ms:
            # heavy-model stand-in: busy numpy work, not sleep, so the
            # pool's CPU slots are genuinely contended like a real model
            import time

            t_end = time.perf_counter() + self.burn_ms / 1000.0
            x = np.ones((64, 64))
            while time.perf_counter() < t_end:
                x = x @ x % 7.0
        perm = inv = None
        if self.length_bucket:
            ha = batch["a"].to_numpy(zero_copy_only=False)
            hb = batch["b"].to_numpy(zero_copy_only=False)
            ia0 = np.searchsorted(self.ids, ha)
            ib0 = np.searchsorted(self.ids, hb)
            # bucket by UTF-8 byte length (S64 entries are NUL-padded;
            # decoding to str would choke on non-ASCII)
            def _blen(idx):
                m = self.heads[idx].view(np.uint8).reshape(len(idx), -1)
                return (m != 0).sum(axis=1)

            lens = _blen(ia0) + _blen(ib0)
            perm = np.argsort(lens, kind="stable")
            inv = np.empty_like(perm)
            inv[perm] = np.arange(len(perm))
            batch = batch.take(pa.array(perm, type=pa.int64()))
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        ia = np.searchsorted(self.ids, a)
        ib = np.searchsorted(self.ids, b)
        out = _score_features(
            batch,
            self.sig[ia], self.sig[ib], self.emb[ia], self.emb[ib],
            [s.decode("utf-8", "ignore") for s in self.heads[ia]],
            [s.decode("utf-8", "ignore") for s in self.heads[ib]], self.w,
            threshold=self.threshold,
        )
        if inv is not None:  # restore the caller's row order
            out = out.take(pa.array(inv, type=pa.int64()))
        return out


def broadcast_payload_ref(payload):
    """Materialize the payload into sorted numpy arrays and ray.put it.

    Reads the already-materialized payload via ``to_arrow_refs`` —
    zero-copy plasma derefs, no fresh streaming-executor run — so this
    DRIVER-side assembly is memcpy-bound (it is a fixed serial cost the
    scaling benchmark pays at every parallelism level)."""
    import ray

    ids_parts, sig_parts, emb_parts, head_parts = [], [], [], []
    for b in _payload_tables(payload):
        ids_parts.append(b["page_id"].to_numpy(zero_copy_only=False))
        sig_parts.append(_binary_to_matrix(b["sig"], "<u2"))
        emb_parts.append(_binary_to_matrix(b["emb"], "<f4"))
        # truncate to 16 CHARACTERS (matching the join path's
        # _score_features cap), then store as S64 — 16 codepoints × max
        # 4 UTF-8 bytes — so no codepoint is ever split mid-sequence and
        # broadcast/join scoring is byte-identical for non-ASCII heads.
        # Vectorized: Arrow codeunit slice → zero-copy buffer scatter
        # into a fixed-width byte matrix (this loop is DRIVER-side
        # serial work, so no per-row python encode).
        import pyarrow.compute as pc

        from ..functions.arrowbuf import binary_segments

        trunc = pc.utf8_slice_codeunits(b["head"].combine_chunks()
                                        if isinstance(b["head"], pa.ChunkedArray)
                                        else b["head"], 0, 16)
        flat, offs = binary_segments(trunc)
        nh = len(offs) - 1
        lens = np.diff(offs)
        mat = np.zeros((nh, 64), dtype=np.uint8)
        if len(flat):
            mat[np.repeat(np.arange(nh), lens),
                np.arange(len(flat)) - np.repeat(offs[:-1], lens)] = flat
        head_parts.append(mat.view("S64").ravel())
    ids = np.concatenate(ids_parts)
    order = np.argsort(ids)
    sig = np.concatenate(sig_parts)[order]
    emb = np.concatenate(emb_parts)[order]
    heads = np.concatenate(head_parts)[order]
    return ray.put((ids[order], sig, emb, heads))


def _payload_tables(payload):
    """Iterate a payload Dataset as Arrow tables, zero-copy when it is
    already materialized (to_arrow_refs), streaming otherwise."""
    import ray

    try:
        refs = payload.to_arrow_refs()
    except Exception:
        refs = None
    if refs is not None:
        for r in refs:
            t = ray.get(r)
            if t.num_rows:
                yield t
    else:
        yield from payload.iter_batches(batch_size=65536, batch_format="pyarrow")


def attach_payloads(pairs, payload, num_partitions: int = 16):
    """Hash-join both pair sides to the payload table (narrow columns).

    Two hash-partitioned joins (Ray Dataset.join) on page_id.  The
    payload side carries only (page_id, sig, emb, head) — urls and
    token counts stay out of the pair stream.
    """
    side = payload.select_columns(["page_id", "sig", "emb", "head"])
    a_side = side.rename_columns({"page_id": "a", "sig": "sig_a", "emb": "emb_a", "head": "head_a"})
    b_side = side.rename_columns({"page_id": "b", "sig": "sig_b", "emb": "emb_b", "head": "head_b"})
    enriched = pairs.join(a_side, join_type="inner", num_partitions=num_partitions, on=("a",))
    enriched = enriched.join(b_side, join_type="inner", num_partitions=num_partitions, on=("b",))
    return enriched


def _default_concurrency():
    # fixed-size pool: autoscaling ramps one actor at a time and the
    # scoring stage is short — pre-create the whole pool instead
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    # never claim more than half the cluster: a pool that demands all
    # CPUs deadlocks against its own upstream shuffle tasks
    return max(2, cpus // 2)


def score_pairs(enriched, threshold: float = DEFAULT_THRESHOLD, concurrency=None, **map_kwargs):
    """Run the join-path scorer actor pool and filter to edges."""
    concurrency = concurrency or _default_concurrency()
    # batch_size subdivides join-output partitions so scoring
    # parallelism is set by the actor pool, not the partition count
    map_kwargs.setdefault("batch_size", 8192)
    scored = enriched.map_batches(
        PairScorer, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"threshold": threshold}, **map_kwargs
    )
    edges = scored.filter(expr=f"score >= {threshold}")
    return scored, edges


def score_pairs_actor(pairs, payload, threshold: float = DEFAULT_THRESHOLD,
                      concurrency=None, num_gpus: float | None = None,
                      batch_size: int = 16384, payload_ref=None,
                      length_bucket: bool = True, burn_ms: float = 0.0,
                      **map_kwargs):
    """GPU-shaped ACTOR-POOL variant of the broadcast scorer.

    The payload deref (and, with a real model, the transformer weights)
    lives in actor ``__init__`` — once per actor, not per batch — and
    the pool knobs pass through end to end:

    - ``concurrency``: actor count (pool size); size to the node's GPU
      count when ``num_gpus`` is set.
    - ``num_gpus``: per-actor GPU share for ``map_batches`` (the
      reference's one-process-per-GPU sharding, run_span_detection.py:
      72-94, replaced by Ray's resource scheduler).
    - ``batch_size``: rows per model invocation (padded-tensor batch).
    - ``length_bucket``: sort each batch by head length before scoring
      (≙ preprocessing_utils.py:196-199), identical output rows.
    - ``burn_ms``: CPU-burning stand-in model cost for tests/benchmarks.

    Edges are row-identical to score_pairs_broadcast (parity-tested)."""
    concurrency = concurrency or _default_concurrency()
    ref = payload_ref if payload_ref is not None else broadcast_payload_ref(payload)
    if num_gpus:
        map_kwargs["num_gpus"] = num_gpus
    scored = pairs.map_batches(
        PairScorerBroadcast, batch_format="pyarrow",
        concurrency=concurrency, batch_size=batch_size,
        fn_constructor_kwargs={"payload_ref": ref, "threshold": threshold,
                               "length_bucket": length_bucket,
                               "burn_ms": burn_ms},
        **map_kwargs)
    edges = scored.filter(expr=f"score >= {threshold}")
    return scored, edges


def score_pairs_broadcast(pairs, payload, threshold: float = DEFAULT_THRESHOLD,
                          concurrency=None, payload_ref=None, **map_kwargs):
    """Broadcast-path scorer: narrow pairs + ray.put payload, no joins.

    ``payload_ref``: a precomputed ``broadcast_payload_ref`` result —
    pass it when the caller overlapped the broadcast build with another
    stage (see er_edges)."""
    map_kwargs.setdefault("batch_size", 16384)
    ref = payload_ref if payload_ref is not None else broadcast_payload_ref(payload)
    w = WEIGHTS
    wv = np.array([w["est_jaccard"], w["cos_sim"], w["jw_sim"], w["lev_sim"]])

    # STATELESS tasks, not an actor pool: pool spin-up costs ~2 s of
    # flat wall per run, while per-task ray.get of the broadcast tuple
    # is a zero-copy plasma deref on the same node — there is no real
    # per-actor state to amortize (the cascade is pure numpy).
    def score(batch: pa.Table, _ref=ref, _w=wv, _t=threshold) -> pa.Table:
        import ray

        if batch.num_rows == 0:
            return batch
        ids, sig, emb, heads = ray.get(_ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        ia = np.searchsorted(ids, a)
        ib = np.searchsorted(ids, b)
        return _score_features(
            batch, sig[ia], sig[ib], emb[ia], emb[ib],
            [s.decode("utf-8", "ignore") for s in heads[ia]],
            [s.decode("utf-8", "ignore") for s in heads[ib]], _w,
            threshold=_t,
        )

    scored = pairs.map_batches(score, batch_format="pyarrow", **map_kwargs)
    edges = scored.filter(expr=f"score >= {threshold}")
    return scored, edges
