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
