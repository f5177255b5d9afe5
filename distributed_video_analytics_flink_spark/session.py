"""SparkSession factory with the engine's pinned configuration.

Pinned confs (UTC session time zone, Arrow, AQE) matter for oracle parity
(DuckDB timestamps are UTC-naive) and for scale: AQE re-plans shuffles at
runtime (partition coalescing, skew-join splitting, broadcast demotion), which
is exactly what a 1000-executor / 100 TB deployment needs and is free to turn
on locally.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Shuffle partition count: match cores locally; a real cluster would
    size this to 2-3x total executor cores (or leave AQE to coalesce)."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


ROCKSDB_STATE_STORE = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def get_spark(
    app_name: str = "distributed_video_analytics_flink_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
    rocksdb_state: bool = False,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    Local default is ``local[$SPARK_GRAFT_CPUS]``; on a cluster the master is
    supplied by spark-submit and this factory only pins semantics-bearing and
    scale-bearing confs.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        # Semantics: oracle parity + deterministic timestamps.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for pandas UDF / toPandas paths (the CV + embedding operators).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # Scale: adaptive execution re-plans shuffles at runtime.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        # Broadcast threshold: dims (region/nation/supplier/part) stay
        # broadcast-able well past sf1; AQE can still demote at runtime.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if rocksdb_state:
        # Large-state streaming (the reference declared RocksDB but never
        # enabled it, processor/pom.xml:41-45): per-camera frame state at
        # million-camera scale outgrows the heap-backed store; RocksDB
        # spills to local disk with incremental checkpointing.
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_STATE_STORE
        )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
