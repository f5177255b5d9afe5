#!/usr/bin/env python3
"""Interleaved A/B for text_classifier_train_step variants (r18,
VERDICT r17 #2): the r17 rewrite's localCheckpoint barrier serializes a
single-task stage at sf0.1 (documents.parquet is one 594 KB file ->
one scan split), eating the hash-once win in the driver's cold bench.

Variants, all md5-once by construction (verified by plan grep):
  v0  current HEAD shape (barrier pins y/wb/bb, integer fold above)
  v1  v0 + conditional repartition of the scan to defaultParallelism
  v2  repartition + barrier pins (e, wb) only (bb never stored)
  v3  repartition + no checkpoint: a monotonically_increasing_id fence
      column blocks ProjectCollapse/filter-pushdown instead (no barrier
      job at all)

Usage: python scripts/ab_r18_train_step.py [rounds] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from distributed_video_analytics_flink_spark.operators.text_analysis import (  # noqa: E402
    _CLS_BUCKETS,
    _CLS_HALF,
    _CLS_MODW,
    _CLS_MUL,
)
from distributed_video_analytics_flink_spark.operators.dedup import (  # noqa: E402
    _materialize,
)
from distributed_video_analytics_flink_spark.session import get_spark  # noqa: E402
from distributed_video_analytics_flink_spark.sources.tables import (  # noqa: E402
    load_table,
)

B_OF = "cast(conv(substring(md5({t}), 1, 4), 16, 10) as bigint) % {m}"
UNI_B = B_OF.format(t="t", m=_CLS_BUCKETS)
BIG_B = B_OF.format(
    t="concat(element_at(w, i), '_', element_at(w, i + 1))", m=_CLS_BUCKETS
)
WSUM = (
    "aggregate(transform({c}, b -> (b * %d) %% %d - %d),"
    " cast(0 as bigint), (a, x) -> a + x)" % (_CLS_MUL, _CLS_MODW, _CLS_HALF)
)


def _base(spark, sf, repart: bool):
    docs = load_table(spark, sf, "documents").withColumn(
        "w", F.split(F.lower("text"), " ")
    )
    if repart:
        n = spark.sparkContext.defaultParallelism
        if docs.rdd.getNumPartitions() < n:
            docs = docs.repartition(n)
    return docs


def _arrays(docs):
    y = F.when(F.col("lang") == "en", 1).otherwise(-1)
    return docs.select(
        y.alias("y"),
        F.expr(f"transform(w, t -> {UNI_B})").alias("wb"),
        F.expr(
            "if(size(w) < 2, array(),"
            f" transform(sequence(1, size(w) - 1), i -> {BIG_B}))"
        ).alias("bb"),
    )


def _tail_fold(feats):
    score = F.expr(WSUM.format(c="wb") + " + " + WSUM.format(c="bb"))
    p = F.when(score > 0, 1).otherwise(-1)
    return (
        feats.select((F.col("y") - p).alias("e"), F.explode("wb").alias("bucket"))
        .filter(F.col("e") != 0)
        .groupBy("bucket")
        .agg(F.sum("e").alias("grad"), F.count(F.lit(1)).alias("n_updates"))
    )


def v0(spark, sf):
    return _tail_fold(_materialize(_arrays(_base(spark, sf, False))))


def v1(spark, sf):
    return _tail_fold(_materialize(_arrays(_base(spark, sf, True))))


def _e_wb(docs):
    y = F.when(F.col("lang") == "en", 1).otherwise(-1)
    score = F.expr(
        WSUM.format(c=f"transform(w, t -> {UNI_B})")
        + " + "
        + WSUM.format(
            c=(
                "if(size(w) < 2, array(),"
                f" transform(sequence(1, size(w) - 1), i -> {BIG_B}))"
            )
        )
    )
    p = F.when(score > 0, 1).otherwise(-1)
    return docs.select(
        (y - p).alias("e"), F.expr(f"transform(w, t -> {UNI_B})").alias("wb")
    )


def v2(spark, sf):
    feats = _materialize(_e_wb(_base(spark, sf, True)))
    return (
        feats.filter(F.col("e") != 0)
        .select("e", F.explode("wb").alias("bucket"))
        .groupBy("bucket")
        .agg(F.sum("e").alias("grad"), F.count(F.lit(1)).alias("n_updates"))
    )


def v3(spark, sf):
    fenced = _e_wb(_base(spark, sf, True)).withColumn(
        "_nd", F.monotonically_increasing_id()
    )
    return (
        fenced.filter(F.col("e") != 0)
        .select("e", F.explode("wb").alias("bucket"))
        .groupBy("bucket")
        .agg(F.sum("e").alias("grad"), F.count(F.lit(1)).alias("n_updates"))
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="r18-ab-train-step")
    spark.range(1000).selectExpr("sum(id)").collect()

    variants = {"v0": v0, "v1": v1, "v2": v2, "v3": v3}
    # sanity: identical result rows across variants
    ref = sorted(map(tuple, v0(spark, sf).collect()))
    for name, fn in variants.items():
        got = sorted(map(tuple, fn(spark, sf).collect()))
        print(f"{name}: rows_equal_v0={got == ref} ({len(got)} rows)", flush=True)
    # md5-once check per variant
    for name, fn in variants.items():
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        print(f"{name}: md5_occurrences={plan.count('md5')}", flush=True)

    times: dict[str, list[float]] = {n: [] for n in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"train_step {name} r{r}")
            t0 = time.time()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        print(
            f"{name}: min {min(ts):.3f} median {sorted(ts)[len(ts)//2]:.3f}"
            f" runs {[round(t, 3) for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
