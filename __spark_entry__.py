"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``distributed_video_analytics_flink_spark.operators``
(one registry entry per implemented operator from SURVEY.md §2 / §2.9 plus
the training-data extensions); this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from distributed_video_analytics_flink_spark import operators as _ops


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: detections per camera per
    day (SURVEY.md §7.2 — the read path the reference's Cassandra layout
    serves), over the events stream-table analog."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _ops.QUERIES["events_per_user_day"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 inventory)."""
    return _ops.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query;
    non-SQL-expressible ops (pandas-UDF CV chain, mapInPandas feature
    extraction, HLL sketches) are omitted -> driver records rows-only."""
    return _ops.oracle_sql()
