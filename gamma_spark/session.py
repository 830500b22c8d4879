"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]`` but every knob here is chosen for the
1000-executor case: AQE on (runtime re-plan, skew-join splitting, empty
relation propagation — gamma's empty-filter short-circuit, SURVEY O2),
adaptive shuffle partition coalescing, and Arrow for the few pandas-UDF
kernels (distance/codebook math) so Python crossings are batched.
"""

from __future__ import annotations

import os
import threading as _threading

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Catalyst/AQE: runtime re-planning replaces gamma's hard-coded
    # physical heuristics (SURVEY §4 O2/O3/O8).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow batches for pandas UDF kernels (distance matmul, PQ encode).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Parquet scans: keep row-group pruning + dictionary filtering on
    # (these replace gamma's per-field B-tree range index, SURVEY F1).
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Broadcast threshold: query/centroid/codebook tables are small and
    # must broadcast, never shuffle (SURVEY O5/O11).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Event-time determinism: NTZ→TIMESTAMP casts and window bucketing
    # read the session zone; UTC keeps epoch math host-independent and
    # aligned with the DuckDB oracle (ADVICE r2).
    "spark.sql.session.timeZone": "UTC",
}


#: below this estimated input size a repartition costs more than the
#: single-core compute it would parallelize
_REPARTITION_MIN_BYTES = 32 * 1024 * 1024


def ensure_parallelism(df, min_partitions: int | None = None, fanout: float = 1.0):
    """Repartition only when the input is big enough to matter AND
    arrives with too few partitions for a compute-heavy stage (a single
    small parquet file -> 1 partition -> 1 core). ``fanout`` scales the
    size estimate for stages that multiply their input (shingle/token
    explodes). At real scale inputs already have thousands of splits and
    this is a no-op — both checks are metadata-only (optimizer size
    estimate + partition count)."""
    spark = df.sparkSession
    target = min_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    try:
        size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        if size * fanout < _REPARTITION_MIN_BYTES:
            return df
    except Exception:  # stats unavailable: fall through to partition check
        pass
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def partition_for_kernel(df, keys: list[str], ngroups: int | None = None):
    """Pin an explicit hash partitioning for a Python-kernel group stage.

    AQE coalesces post-shuffle partitions by BYTES
    (``coalescePartitions.parallelismFirst`` floors them at
    ``minPartitionSize``, 1 MB), but a cogroup/groupBy feeding a pandas
    kernel costs per-ROW CPU — a few-MB shuffle collapses to one or two
    tasks and the kernel serializes on one core while the rest idle
    (measured: the HNSW 512q fan-out search ran its 8 shard traversals
    in ONE AQE-coalesced task, 4.6 s wall vs 1.5 s at 32-way — guide
    §2.5's skew pathology created by the optimizer itself). A
    user-specified ``repartition(n, keys)`` is exempt from AQE
    coalescing, and hash partitioning on the grouping keys satisfies
    the cogroup's required distribution, so this REPLACES the exchange
    the kernel would have inserted — same exchange count, pinned
    fan-out. ``n = min(shuffle.partitions, ngroups)``: at most one task
    per kernel group, capped by the session's configured parallelism —
    scale-adaptive through conf, never a local constant.

    ``n`` is capped at ``4 * ngroups`` rather than ``ngroups``: hashing
    G keys into exactly G buckets collides badly (G=8 shards into 8
    partitions leaves ~60% odds of a 2-shard straggler task — measured
    2.2 s vs 1.5 s at 4x spread); empty partitions only cost a
    scheduled no-op task, so a 4x spread buys collision-freedom for
    bounded scheduler overhead at any scale (guide §2.5)."""
    p = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if ngroups is not None:
        p = max(1, min(p, 4 * int(ngroups)))
    return df.repartition(p, *keys)


#: active stage_scope collectors (innermost last), PER THREAD: two
#: concurrent streaming queries run their foreachBatch handlers on
#: separate microbatch threads, and a shared stack would register one
#: stream's persists into the other's scope (releasing them mid-batch
#: and leaking its own). stage() registers every persist into the
#: calling thread's innermost scope so repeated-call sites can release
#: them per batch.

_STAGE_TLS = _threading.local()


def _stage_scopes() -> list[list]:
    scopes = getattr(_STAGE_TLS, "scopes", None)
    if scopes is None:
        scopes = _STAGE_TLS.scopes = []
    return scopes


def stage(df):
    """Persist an intermediate that downstream operators consume 2-5x
    (MEMORY_AND_DISK, lazy). Catalyst's exchange reuse does NOT fire
    across the self-joins these pipelines build (the band/bucket
    exchanges differ per side), so without staging the expensive
    signature/annotation subplans are recomputed once per reference.
    This is the single-job analogue of the production pattern at
    100 TB: write the intermediate to a staging table once, read it
    many times.

    Inside a :func:`stage_scope`, the persist is registered for
    release at scope exit — callers that invoke staged operators
    REPEATEDLY in one session (streaming micro-batch handlers) must
    wrap each call, or the pinned storage fraction grows without
    bound (the r8 20-batch soak measured +3-4 persisted RDDs per
    micro-batch until the 8 GiB heap OOM'd at batch ~14).

    ``SPARK_GRAFT_STAGE_LEVEL`` overrides the storage level (any
    ``pyspark.StorageLevel`` name). The default keeps hot intermediates
    on-heap; long single-JVM chains (the pipeline rehearsal at 4M+
    docs) set ``DISK_ONLY`` so staged blocks never compete with task
    execution memory — measured: the 4M curate stage OOMs the default
    8 GiB heap on a slow host with on-heap staging and completes with
    disk staging, while small-corpus timings are unaffected."""
    import os as _os

    from pyspark.storagelevel import StorageLevel

    name = _os.environ.get("SPARK_GRAFT_STAGE_LEVEL", "MEMORY_AND_DISK")
    level = getattr(StorageLevel, name, None)
    if not isinstance(level, StorageLevel):
        allowed = sorted(
            k for k, v in vars(StorageLevel).items()
            if isinstance(v, StorageLevel)
        )
        raise ValueError(
            f"SPARK_GRAFT_STAGE_LEVEL={name!r} is not a "
            f"pyspark.StorageLevel name; allowed: {', '.join(allowed)}"
        )
    df = df.persist(level)
    scopes = _stage_scopes()
    if scopes:
        scopes[-1].append(df)
    return df


def stage_scope():
    """Context manager releasing every :func:`stage` persist made
    inside it (innermost scope wins for nesting). Use around any code
    that calls staged operators repeatedly in one long-lived session —
    the streaming foreachBatch handlers wrap each micro-batch so
    per-batch staged intermediates (shingle streams, signatures, LSH
    pair relations) are unpersisted once the batch's outputs are
    written, keeping storage memory FLAT on an unbounded stream.

    Exit MUST come after the scope's outputs are materialized (the
    handlers write parquet before returning); unpersisting earlier
    would just silently recompute."""
    import contextlib

    @contextlib.contextmanager
    def _scope():
        staged: list = []
        scopes = _stage_scopes()
        scopes.append(staged)
        try:
            yield staged
        finally:
            scopes.pop()
            for df in staged:
                with contextlib.suppress(Exception):
                    df.unpersist()

    return _scope()


def get_spark(
    app_name: str = "gamma_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback 32)
    when no cluster master is configured; on a real cluster the caller's
    spark-submit settings win.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    conf = dict(_DEFAULTS)
    # At 100 TB this would be sized to ~2-3x total executor cores with
    # AQE coalescing down; locally keep it at the core count.
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    conf["spark.ui.enabled"] = "false"
    conf["spark.driver.memory"] = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
