"""Batch parquet sources for the testdata star schema.

Parquet scans are the engine's default at-rest format: columnar, splittable,
with predicate pushdown and column pruning handled by Catalyst (verify with
``df.explain`` — PushedFilters / ReadSchema). At 100 TB the same loader works
unchanged; partition pruning comes from directory layout when tables are
written with ``partitionBy`` (see operators.frame_pipeline for the results
table layout).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from distributed_video_analytics_flink_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (``{sf_dir}/{name}.parquet``).

    Timestamp policy: downstream operators always see ``TimestampType`` under
    the UTC session time zone, regardless of how the parquet writer encoded
    the column. Two encodings appear in the wild (and both have appeared in
    this project's testdata across regenerations):

    - TIMESTAMP(NANOS): Spark cannot read it natively; ``nanosAsLong`` reads
      raw int64 and the loader converts to microsecond timestamps (same
      truncation DuckDB applies).
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) — the common pyarrow default:
      Spark 4 infers ``TIMESTAMP_NTZ`` (``inferTimestampNTZ.enabled`` is on
      by default), which breaks ``unix_micros``/``unix_millis`` arithmetic.
      Disabling the inference restores ``TimestampType`` with identical
      microsecond values under the UTC session TZ (wall-clock == instant).

    A defensive NTZ→timestamp cast covers any remaining path (e.g. a conf
    set after a reader was cached). ``tests/test_ntz_ingestion.py`` pins the
    invariant for every testdata table.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    if ntz:
        # NTZ wall-clock values equal UTC instants under the UTC session TZ,
        # so the cast is value-preserving (microsecond-exact).
        df = df.withColumns({c: F.col(c).cast(T.TimestampType()) for c in ntz})
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # exact integer division — double division loses precision at
        # 1e18-ns magnitudes and lands 1us off
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin a scan to ``defaultParallelism`` partitions when it
    yields fewer splits than that (r18, VERDICT r17 #2): a tiny input
    file produces ONE scan task, which serializes any CPU-heavy
    projection fed by it (tokenize/md5/shingle) on a single core — the
    measured cause of text_classifier_train_step's 1.02 8->32-core
    scaling ratio. Scale-adaptive by construction: at 100 TB the scan's
    own splits exceed the core count and this is a no-op (no shuffle is
    added on a real cluster); locally the shuffled bytes are the tiny
    file itself. Apply ONLY in front of projections whose per-row CPU
    dominates the scan (measured per query — several exchange-adjacent
    queries regress because the extra exchange outweighs the
    parallelism; see OPTIMIZATION_r18.md)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        df = df.repartition(n)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view so every capability is
    reachable from both the DataFrame and SQL surfaces (SURVEY.md §7.1)."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
