"""SparkSession factory with scale-oriented defaults.

Single place where execution knobs live so tests, bench, and spark-submit
entrypoints share one configuration story. Designed for a multi-executor
cluster; `local[N]` in this sandbox exercises the identical code path
(explicit partitioning, Arrow batching, AQE) per BASELINE.md's sandbox
protocol for the N vs 4N scaling criterion.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


# glibc tuning for the numpy-heavy Arrow workers: without these, every
# fresh large ndarray is a new mmap whose first-touch page faults cost
# ~0.5 s per 100 MB on this kernel (measured: `v & 0x7F` on 10.8M uint64
# fell from 0.56 s to 0.015 s). Keeping big buffers on the heap arena
# reuses already-faulted pages across operations and batches.
MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": "134217728",
    "MALLOC_TRIM_THRESHOLD_": "268435456",
}


def get_spark(
    app_name: str = "femto_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    for k, v in MALLOC_ENV.items():
        os.environ.setdefault(k, v)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus != "*" else "32"
        shuffle_partitions = int(n) if str(n).isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Arrow everywhere: all our custom operators are pandas/Arrow UDFs.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # AQE handles runtime re-planning + skew-join splitting at scale.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Posting blobs are large binary cells; keep task results bounded.
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Let the planner pick shuffled-hash over sort-merge when its size
        # conditions hold (optimization guide §3.1/§9): the engine's join
        # fan-outs (semi-joins, anchor joins, verify chains) are small-
        # per-partition build sides where the sort is pure overhead; the
        # planner still falls back to sort-merge when sizes demand it, so
        # this is scale-neutral, not a local[32] tune.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # catalog-mode index tables (build_index catalog_table=) land in
        # the session catalog's warehouse; keep it out of the repo root
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "FEMTO_WAREHOUSE",
                os.path.join(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), ".scratch", "spark-warehouse"),
            ),
        )
        .config("spark.eventLog.enabled", os.environ.get("FEMTO_EVENTLOG", "false"))
        .config("spark.eventLog.dir", os.environ.get("FEMTO_EVENTLOG_DIR", "/tmp"))
    )
    for k, v in MALLOC_ENV.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
