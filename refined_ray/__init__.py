"""refined_ray — a Ray-Data-native record-linkage / data-processing engine.

A from-scratch reimplementation of the query and data-processing
capabilities of enRichMyData/ReFinED (entity linking as entity
resolution) expressed as ``ray.data.Dataset`` pipelines:

- ``sources``   — Parquet web-page table readers + the deterministic
                  synthetic Common-Crawl-style page generator.
- ``functions`` — pure, vectorized kernels (normalization, stable
                  hashing, MinHash, SimHash, string similarity, text
                  statistics). No Ray imports: unit-testable in place.
- ``stages``    — Ray Data stages: ``map_batches`` callables and actor
                  classes (extraction, mention emission, blocking,
                  pair scoring, clustering, dedup, ANN, multimodal).
- ``pipelines`` — end-to-end pipelines (the flagship entity-resolution
                  pipeline, PEM build, evaluation metrics).
- ``state``     — per-partition lineage manifests + resume logic.

Nothing in this package calls ``ray.init()`` — sessions are owned by
the caller (bench.py, tests/conftest.py, or the evaluation driver).
"""

__version__ = "0.1.0"


def _install_ray_log_filters() -> None:
    """Mute two known-benign Ray 2.49 log warts, and ONLY those.

    - "Operator produced a RefBundle with a different schema ... new
      schema: ." — hash shuffles/joins/aggregates emit ZERO-COLUMN
      bundles for partitions that received no rows, so every query
      with a possibly-empty shuffle partition logs this.  Only the
      zero-column variant is muted (matched on "new schema: ."); a
      real typed-vs-typed mismatch still warns.
    - "Failed to hash the schemas (for deduplication): unhashable
      type" — Ray's schema-dedup fast path falls back to full
      unification when a schema is unhashable; the fallback is the
      correct path, the warning is noise.

    Installed at package import so worker processes that deserialize
    our UDFs (and hence import this package) filter their forwarded
    logs too.  Where zero-column empties could affect CORRECTNESS
    (join inputs, clustering shuffles) they are removed outright by
    ``scrub_empty_blocks`` / schema-pinning maps — this filter only
    silences the cases that are cosmetic.
    """
    import logging

    class _BenignRayWarts(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            try:
                msg = record.getMessage()
            except Exception:
                return True
            if "a RefBundle with a different schema" in msg:
                return "new schema: ." not in msg
            if "Failed to hash the schemas (for deduplication)" in msg:
                return "unhashable type" not in msg
            return True

    for name in (
        "ray.data._internal.execution.streaming_executor_state",
        "ray.data._internal.arrow_ops.transform_pyarrow",
    ):
        logging.getLogger(name).addFilter(_BenignRayWarts())


_install_ray_log_filters()


def configure_data_context() -> None:
    """Idempotent per-process Ray Data tuning for this engine.

    - HASH_SHUFFLE: required for key-based ``repartition`` (the pair
      stage) and the strategy the engine's joins/groupbys assume.
    - progress bars off (pipelines run headless under driver/bench).

    Safe to call before or after ``ray.init`` (DataContext is
    process-local); never calls ``ray.init`` itself.
    """
    import ray
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.enable_progress_bars = False

    # Size hash-shuffle parallelism to the actual cluster. The library
    # defaults (200 partitions, ≤64 aggregator actors PER SHUFFLE OP)
    # assume a multi-node cluster; on a small node several concurrent
    # shuffle operators would spawn hundreds of aggregator actors and
    # thrash the scheduler. One aggregator per CPU is the right order
    # on any cluster size (partitions-per-aggregator scales instead).
    cpus = None
    if ray.is_initialized():
        cpus = ray.cluster_resources().get("CPU")
    n = int(cpus) if cpus else 8
    ctx.default_hash_shuffle_parallelism = max(2, n)
    ctx.max_hash_shuffle_aggregators = max(2, n // 2)

    # Aggregator actors default to ~1 reserved CPU per partition, so a
    # fused pipeline with several concurrent shuffle/join operators
    # reserves more CPUs than the cluster has and starves its own map
    # operators (measured: 8-CPU run BEATING a 32-CPU run).  Aggregators
    # are concat/merge-bound, not compute-bound — reserve a token share
    # and let the OS schedule them.
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
    ctx.join_operator_actor_num_cpus_per_partition_override = 0.05
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.05

    # Blocks are the unit of task dispatch AND of hash-shuffle pushes,
    # and a push costs ~300 ms regardless of block size.  The library
    # default carves every read into >=200 blocks "for parallelism",
    # which turns a 10 MB shuffle into 20 s of RPC overhead.  2 blocks
    # per CPU keeps every core busy with far fewer dispatches.
    ctx.read_op_min_num_blocks = max(2, 2 * n)


def strip_schema_metadata(ds):
    """Drop Arrow schema/field metadata from every block (zero-copy).

    Parquet files written by pyarrow/pandas carry a ``b'pandas'``
    schema-metadata blob, and a ``pa.Schema`` with metadata is
    UNHASHABLE (``hash(schema)`` raises ``unhashable type: 'dict'``).
    Ray 2.49's block concat calls ``unify_schemas`` which tries
    ``set(schemas)`` as a dedup fast path — with metadata present that
    raises, logs "Failed to hash the schemas" from every shuffle
    aggregator, and falls back to full schema unification on EVERY
    concat.  Stripping the metadata at the read kills the warning at
    its source (driver and worker processes alike) and restores the
    fast path.  ``replace_schema_metadata(None)`` swaps only the
    schema object — no column buffers are touched or copied.
    """
    import pyarrow as pa

    def _strip(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        if any(f.metadata for f in t.schema):
            t = t.cast(pa.schema([f.remove_metadata() for f in t.schema]))
        return t

    return ds.map_batches(_strip, batch_format="pyarrow", batch_size=None)


def read_parquet_clean(path, *, columns=None, **kwargs):
    """``ray.data.read_parquet`` that strips the parquet pandas
    metadata blob — the engine's standard parquet read.

    The stripped schema is passed as ``schema=`` so even the blocks
    built INSIDE the read task (SplitBlocks slices) are metadata-free
    — a downstream strip map can't reach those, and they otherwise
    warn from within the read workers (see strip_schema_metadata).
    Costs one footer read per call; no data is cast or copied (the
    schema is byte-identical minus metadata).
    """
    import pyarrow as pa
    import pyarrow.dataset as pads
    import ray.data as rd

    configure_data_context()
    if "schema" not in kwargs:
        try:
            full = pads.dataset(path).schema.remove_metadata()
            full = pa.schema([f.remove_metadata() for f in full])
            if columns is not None:
                full = pa.schema([full.field(c) for c in columns])
            kwargs["schema"] = full
        except Exception:
            # unreadable footer / exotic path spec: fall back to the
            # post-read strip (covers everything but in-read slices)
            return strip_schema_metadata(
                rd.read_parquet(path, columns=columns, **kwargs))
    return rd.read_parquet(path, columns=columns, **kwargs)


def scrub_empty_blocks(mds, fallback_schema=None):
    """Rebuild a MATERIALIZED dataset without its empty blocks.

    Ray 2.49's hash joins/shuffles emit ZERO-COLUMN empty blocks for
    partitions that received no rows, and ``map_batches`` UDFs are not
    invoked on empty input blocks — so schema pinning inside a UDF
    cannot repair them.  Mixed-schema empty blocks then flakily crash
    downstream join/sort finalization (``ArrowInvalid: No match for
    FieldRef``, placement-dependent) and log "RefBundle with a
    different schema" warnings.  This drops them by block METADATA
    only — no block is fetched or copied; the kept refs are reused in
    place — so it costs O(num_blocks) driver work regardless of data
    size.

    Must be called on a materialized dataset (otherwise the bundle
    iteration would trigger execution here).  When every block is
    empty, returns an empty dataset with ``fallback_schema`` (or the
    dataset's own reported schema).
    """
    import ray.data as rd

    refs = [block_ref
            for bundle in mds.iter_internal_ref_bundles()
            for block_ref, meta in bundle.blocks
            if meta.num_rows is None or meta.num_rows > 0]
    if not refs:
        import pyarrow as pa

        schema = fallback_schema
        if schema is None:
            reported = mds.schema(fetch_if_missing=False)
            schema = getattr(reported, "base_schema", None) or pa.schema([])
        return rd.from_arrow(schema.empty_table())
    return rd.from_arrow_refs(refs)


def default_num_partitions() -> int:
    """Partition count for explicit keyed shuffles/joins.

    Partitions size the shuffle fan-out, NOT map parallelism (maps are
    block-driven); each extra partition adds aggregator-actor startup
    and per-block push RPCs (~300 ms each, size-independent).  At
    sandbox data sizes 8 partitions is the sweet spot (measured 10 s vs
    17 s wall for the flagship pipeline at 32 partitions / 32 CPUs); at
    real scale callers pass num_partitions ≈ data_bytes /
    partition_target (e.g. 100 TB / 2 GB -> 50k) explicitly."""
    import ray

    if ray.is_initialized():
        cpus = ray.cluster_resources().get("CPU")
        if cpus:
            return max(8, int(cpus) // 4)
    return 8
