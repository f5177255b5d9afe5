"""Bucketed co-located join (SURVEY.md §7 scale stance): when both sides of
a fact-fact join are bucketed on the join key, the sort-merge join reads
bucket-aligned files and the plan contains ZERO shuffle exchanges — the
pattern that turns a recurring 100 TB join into a scan-only operation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.plans import (
    exchange_count,
    join_strategies,
)
from distributed_video_analytics_flink_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8


def test_bucketed_join_has_no_shuffle(spark):
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
    (
        orders.write.bucketBy(N_BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable("orders_bkt")
    )
    (
        customer.withColumnRenamed("c_custkey", "o_custkey")
        .write.bucketBy(N_BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable("customer_bkt")
    )

    o = spark.table("orders_bkt")
    c = spark.table("customer_bkt")
    # disable broadcast so the join strategy decision is bucket-driven, as
    # it would be for two fact tables neither of which fits in memory
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(c, "o_custkey").groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n")
        )
        strategies = join_strategies(joined)
        assert strategies == ["SortMergeJoin"], strategies
        # the only exchange is the final tiny groupBy on mktsegment — the
        # join itself is exchange-free because bucket layouts align
        join_only = o.join(c, "o_custkey").select("o_orderkey", "c_mktsegment")
        assert exchange_count(join_only) == 0, "bucketed join should not shuffle"
        # and it returns the same rows as the unbucketed plan
        plain = (
            load_table(spark, SF, "orders")
            .join(
                load_table(spark, SF, "customer").withColumnRenamed(
                    "c_custkey", "o_custkey"
                ),
                "o_custkey",
            )
            .count()
        )
        assert join_only.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS customer_bkt")
