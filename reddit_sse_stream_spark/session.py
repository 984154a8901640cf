"""SparkSession factory tuned for the harness (local[N]) but configured the
way a 1000-executor cluster run would be: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), UTC session timezone (oracle parity with
DuckDB's tz-naive timestamps), Arrow for every Python<->JVM batch boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "reddit_sse_stream_spark") -> SparkSession:
    """Build (or reuse) the session.

    ``spark.sql.shuffle.partitions`` is sized to the executor-thread count:
    on a real cluster this would be ~2-3x total cores (and AQE coalesces
    down); at local[32] on <=sf0.1 data, 32 avoids the classic
    200-tiny-partitions overhead without losing parallelism.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.default.parallelism", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_mem)
        .config("spark.ui.enabled", "false")
        # At 100 TB the scan parallelism is driven by file-split size; 128 MiB
        # is the classic sweet spot for parquet on object storage.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # testdata events.parquet carries TIMESTAMP(NANOS) which Spark's
        # vectorized reader otherwise rejects; read as long + convert in
        # the loader (sources/tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # managed tables (bucketed-layout tests/demos) land outside the repo
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def release_local_checkpoints(spark: SparkSession, full_gc: bool = True) -> int:
    """Unpersist every LOCALLY-CHECKPOINTED RDD still registered with the
    BlockManager, returning how many were released.

    Why this exists: the engine's multi-consumer frames use
    ``localCheckpoint`` (not ``cache``) precisely so blocks are weak-ref
    cleaned when the frame is garbage collected — but "eventually GC'd"
    is not "promptly GC'd".  A long-lived session running many queries
    (bench sweeps, the external driver, a notebook) accumulates dead
    checkpoint blocks faster than the JVM/py4j reference chain lets the
    ContextCleaner reclaim them, and the resulting memory pressure was
    measured to degrade repeat invocations 3-6x (SCALING.md r05 note).
    Harnesses call this BETWEEN queries — a point where no cross-query
    frame survives, so dropping non-recoverable local-checkpoint blocks
    is safe by construction.

    Only ``isLocallyCheckpointed()`` RDDs are touched: CacheManager-pinned
    frames (explicit ``.cache()``, e.g. test fixtures) keep their
    storage, and reliable checkpoints (none in this engine) would too.

    HARD PRECONDITION (ADVICE r05): local checkpoints are NON-RECOVERABLE
    — this sweeps every locally-checkpointed RDD in the session, including
    ones created by OTHER code, so any still-referenced DataFrame backed
    by one (a connected_components result held across queries, a
    concurrently running query's intermediate) fails permanently on its
    next use.  Call it only at a quiescent point where no checkpoint-
    backed frame is live: between bench/sweep queries (bench.py,
    tools/scale_sweep.py — each query is rebuilt from its callable, so
    nothing survives the boundary) or at end-of-suite.  Never call it
    mid-query, from a concurrent thread, or while holding a frame you
    intend to reuse.  (Per-operator checkpoint tracking would narrow the
    blast radius; the session-wide sweep is kept because the library's
    operators deliberately leave no live checkpoint behind after their
    returned DataFrame is materialized, making "between queries" exactly
    the safe point — and a registry would miss third-party checkpoints
    that cause the same degradation.)

    ``full_gc=True`` (default) additionally runs a Python + JVM GC pass:
    the ContextCleaner reclaims dead shuffle files and broadcasts only
    after their weak refs are collected, and without an explicit collect
    the py4j reference chain measured out to "not within a bench sweep" —
    the same degradation class as the checkpoint blocks.  ~100ms on a
    mostly-dead 48g heap, noise next to multi-second queries."""
    jsc = spark.sparkContext._jsc.sc()
    it = jsc.getPersistentRDDs().valuesIterator()
    released = 0
    while it.hasNext():
        rdd = it.next()
        try:
            if rdd.isLocallyCheckpointed():
                rdd.unpersist(False)
                released += 1
        except Exception:
            # an RDD concurrently cleaned by the ContextCleaner can race;
            # releasing the rest still helps
            pass
    if full_gc:
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    return released
