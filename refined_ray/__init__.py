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


def default_num_partitions() -> int:
    """Partition count for explicit keyed shuffles/joins, ≈ cluster CPUs."""
    import ray

    if ray.is_initialized():
        cpus = ray.cluster_resources().get("CPU")
        if cpus:
            return max(2, int(cpus))
    return 8
