"""Distributed connected components (transitive clustering).

≙ the role played by the reference's transitive closure over the class
DAG (class_handler.py:22-85) — here the north rule's distributed
union-find over candidate-pair edges: hash-partitioned label tables
with iterative min-label propagation + pointer jumping until fixpoint.

Algorithm (all steps are Ray Dataset ops — no driver-side edge lists):

  labels(v, lbl) ← (page_id, page_id) for every vertex
  repeat:
    msgs    = edges⋈labels on src → (dst, lbl)            # neighbor mins
    labels' = groupby(v) MIN over labels ∪ msgs           # propagate
    labels' = labels'⋈labels' on (lbl = v) → lbl(lbl(v))  # pointer jump
  until no label changed

Min-label propagation alone needs O(diameter) rounds (capped chains
from the pair stage can have diameter ≤ max_block_size); the pointer
jump doubles the propagation horizon per round → O(log d) rounds.
Each round's label table is one narrow row per vertex, materialized in
the object store (never on the driver); the convergence counter is a
Dataset count().  Labels only decrease, so the loop is monotone and
the fixpoint exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Min

MAX_ROUNDS = 20
# Below this edge count the driver runs a numpy union-find over the
# streamed edge list and broadcasts the label map — the sanctioned
# "small side" fast path (the label table is ~16 B/vertex).  Above it,
# the fully distributed loop runs.  The bound is per-job and checked
# with a count(), never assumed.
DRIVER_UNION_FIND_MAX_EDGES = 5_000_000


def _symmetrize(edges) -> "ray.data.Dataset":  # noqa: F821
    """(a,b) edge list → (src,dst) with both directions."""

    def both(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), type=pa.int64()),
            }
        )

    return edges.map_batches(both, batch_format="pyarrow")


def _union_find_labels(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side connected components, fully vectorized.

    Compacts ids with np.unique, then iterates min-label scatter
    (np.minimum.at over both edge directions) + pointer jumping until
    fixpoint — O((E+V)·log d) numpy ops, no Python per-edge loop (the
    round-1 dict union-find cost seconds of serial driver time at ~1M
    edges, a fixed Amdahl term the scaling benchmark paid at every
    parallelism level).  Roots are MIN ids, matching the distributed
    algorithm exactly.  Returns (sorted endpoint ids, component ids).
    """
    ids = np.unique(np.concatenate([a, b]))  # sorted
    ea = np.searchsorted(ids, a)
    eb = np.searchsorted(ids, b)
    lbl = np.arange(len(ids), dtype=np.int64)
    while True:
        new = lbl.copy()
        np.minimum.at(new, ea, lbl[eb])
        np.minimum.at(new, eb, lbl[ea])
        # pointer jumping until this round's table is idempotent
        while True:
            jumped = new[new]
            if (jumped == new).all():
                break
            new = jumped
        if (new == lbl).all():
            break
        lbl = new
    return ids, ids[lbl]


def connected_components_driver(vertices, edges):
    """Fast path: stream edges to the driver, union-find in numpy,
    broadcast the (small) label arrays back into one map_batches.

    Pass-through: every non-``page_id`` column of ``vertices`` (e.g.
    ``url``) is kept on the output row, so the caller needs no
    re-attachment join."""
    import ray

    chunks_a, chunks_b = [], []
    for batch in edges.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        chunks_a.append(batch["a"].to_numpy(zero_copy_only=False).astype(np.int64))
        chunks_b.append(batch["b"].to_numpy(zero_copy_only=False).astype(np.int64))
    a = np.concatenate(chunks_a) if chunks_a else np.empty(0, np.int64)
    b = np.concatenate(chunks_b) if chunks_b else np.empty(0, np.int64)
    labels_ref = ray.put(_union_find_labels(a, b))

    # stateless tasks, not an actor pool: pool spin-up costs ~2 s of
    # flat wall; ray.get of the shared label arrays inside each task is
    # a zero-copy plasma deref on the same node
    def attach(batch: pa.Table, ref=labels_ref) -> pa.Table:
        ids, comps = ray.get(ref)
        v = batch["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids):
            pos = np.clip(np.searchsorted(ids, v), 0, len(ids) - 1)
            hit = ids[pos] == v
            comp = np.where(hit, comps[pos], v)  # singletons keep own id
        else:
            comp = v
        return batch.append_column("component", pa.array(comp, type=pa.int64()))

    return vertices.map_batches(attach, batch_format="pyarrow")


def connected_components(vertices, edges, num_partitions: int = 16, max_rounds: int = MAX_ROUNDS,
                         driver_max_edges: int = DRIVER_UNION_FIND_MAX_EDGES):
    """vertices: Dataset(page_id, *extra); edges: Dataset(a, b).

    Returns vertices + component:int64 where component is the min
    page_id of the connected component.  Singletons keep their own id.
    Dispatches to the driver fast path when the edge list is provably
    small (counted, not assumed); otherwise runs the distributed
    min-label-propagation + pointer-jumping loop and re-attaches the
    extra vertex columns with one final join.
    """
    edges = edges.materialize()
    if edges.count() <= driver_max_edges:
        return connected_components_driver(vertices, edges)
    extra = [c for c in vertices.columns() if c != "page_id"]
    labels = connected_components_distributed(
        vertices.select_columns(["page_id"]), edges, num_partitions, max_rounds
    )
    if not extra:
        return labels
    return vertices.join(labels, join_type="inner", num_partitions=num_partitions,
                         on=("page_id",))


def _any_label_changed(materialized_labels) -> bool:
    """True iff any row of the MATERIALIZED label table has lbl < old.

    This is the per-round convergence probe.  As a Dataset op
    (``filter(...).count()``) it spins a full streaming execution per
    round (~50 ms measured at bench scale — small next to the round's
    joins, but pure overhead).  Instead: one raw Ray task per block
    (zero-copy plasma deref, any() over two int64 columns) and an
    O(num_blocks) driver fold — ~5x cheaper, and the same
    bounded-driver-work contract as scrub_empty_blocks.  Blocks stay
    distributed; only booleans travel."""
    import ray
    import pyarrow.compute as pc

    def block_changed(block) -> bool:
        # zero-column empty blocks (unpopulated aggregate partitions)
        # have no columns to compare — unchanged by definition
        if block.num_rows == 0:
            return False
        return bool(pc.any(pc.less(block["lbl"], block["old"])).as_py())

    probe = ray.remote(num_cpus=0.25)(block_changed)
    refs = [block_ref
            for bundle in materialized_labels.iter_internal_ref_bundles()
            for block_ref, _meta in bundle.blocks]
    return any(ray.get([probe.remote(r) for r in refs]))


def connected_components_distributed(vertices, edges, num_partitions: int = 16,
                                     max_rounds: int = MAX_ROUNDS):
    """The fully distributed loop (see module docstring)."""

    def init_labels(batch: pa.Table) -> pa.Table:
        v = batch["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"v": pa.array(v, type=pa.int64()), "lbl": pa.array(v, type=pa.int64())})

    labels = vertices.map_batches(init_labels, batch_format="pyarrow").materialize()
    sym = _symmetrize(edges).materialize()
    n_sym = sym.count()
    if n_sym == 0:
        return labels.rename_columns({"v": "page_id", "lbl": "component"})
    # size the per-round shuffles to the DATA, not the cluster: each of
    # the loop's 2-3 joins/groupbys pays a per-partition dispatch floor,
    # so a 64-way exchange over a 15k-row label table is pure overhead.
    # ~64k edge rows per partition; large edge sets still get the full
    # cluster-sized fan-out from the caller's num_partitions.
    num_partitions = max(4, min(num_partitions, n_sym // 65536 + 1))

    for _round in range(max_rounds):
        # neighbor messages: label of src flows to dst
        msgs = sym.join(labels, join_type="inner", num_partitions=num_partitions,
                        on=("src",), right_on=("v",))
        msgs = msgs.select_columns(["dst", "lbl"]).rename_columns({"dst": "v"})

        # carry old label along so the changed-count falls out of the same groupby
        def with_old(batch: pa.Table) -> pa.Table:
            return pa.table({"v": batch["v"], "lbl": batch["lbl"], "old": batch["lbl"]})

        def without_old(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {"v": batch["v"], "lbl": batch["lbl"],
                 "old": pa.array(np.full(n, np.iinfo(np.int64).max, dtype=np.int64), type=pa.int64())}
            )

        combined = labels.map_batches(with_old, batch_format="pyarrow").union(
            msgs.map_batches(without_old, batch_format="pyarrow")
        )
        new_labels = combined.groupby("v").aggregate(
            Min("lbl", alias_name="lbl"), Min("old", alias_name="old")
        ).materialize()

        # Early exit BEFORE the jump join: if the min step changed
        # nothing, every (symmetrized) edge's endpoints already share a
        # label, and a label value can only originate inside its own
        # component — so lbl(lbl) = lbl and the jump is provably the
        # identity.  Skipping it saves the final round's whole join.
        # (The probe is per-block raw tasks, not a Dataset execution —
        # see _any_label_changed.)
        if not _any_label_changed(new_labels):
            labels = new_labels
            break

        # pointer jump: lbl ← lbl(lbl). Labels are always valid vertex
        # ids (mins over ids), so the inner join is total.
        jump_side = new_labels.select_columns(["v", "lbl"]).rename_columns({"v": "jv", "lbl": "jlbl"})
        jumped = new_labels.join(jump_side, join_type="inner", num_partitions=num_partitions,
                                 on=("lbl",), right_on=("jv",))
        # keep the (stale) old column: with_old rebuilds it next round,
        # so no per-round re-materialization pass is needed to drop it
        labels = jumped.select_columns(["v", "jlbl", "old"]) \
            .rename_columns({"jlbl": "lbl"}).materialize()

    return labels.select_columns(["v", "lbl"]) \
        .rename_columns({"v": "page_id", "lbl": "component"})
