"""join_interval_salted: the skew-proof range join (VERDICT r10 #6).
Pins the three things that make salting worth its replication:

1. **The hot key is real** — the deliberate user-fold gives user 0 ~50%
   of all events (the straggler shape the rewrite exists for).
2. **Per-task bound** — the hot user's probe rows split across all 16
   salts with no salt holding more than ~1/16th (+slack): the property
   that turns one straggling reducer into 16 bounded tasks.
3. **The plan actually salts** — the join's exchange is keyed on
   (user, salt), not user alone (with broadcast disabled, since at test
   SF the replicated session side is broadcastable and AQE would
   legitimately skip the exchange — at 100 TB it is not).
4. **Losslessness** — salted result == naive unsalted join result (the
   DuckDB oracle pins this cross-engine too; here it is pinned
   in-process so a broken salt column fails fast with a readable diff).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.operators.relational import (
    join_interval_salted,
)
from distributed_video_analytics_flink_spark.plans import formatted_plan
from distributed_video_analytics_flink_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _skewed_events(spark):
    return load_table(spark, SF, "events").select(
        F.when(F.col("user_id") % 2 == 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        "event_id",
        "ts",
    )


def test_hot_key_is_real_and_salt_bounds_per_task_volume(spark):
    ev = _skewed_events(spark)
    total = ev.count()
    hot = ev.filter(F.col("user_id") == 0).count()
    assert hot >= 0.4 * total  # the fold produced a genuinely hot key

    per_salt = (
        ev.filter(F.col("user_id") == 0)
        .groupBy(F.pmod("event_id", F.lit(16)).alias("salt"))
        .count()
        .collect()
    )
    assert len(per_salt) == 16  # the hot key spreads over ALL salts
    biggest = max(r["count"] for r in per_salt)
    assert biggest <= math.ceil(hot / 16) * 1.5  # per-task bound holds


def test_plan_joins_on_user_and_salt(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = formatted_plan(join_interval_salted(spark, SF))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the equi-join keys must include the salt column: a plan keyed on
    # user alone would put the hot user back on one reducer
    join_keys = [
        ln for ln in plan.splitlines() if "Left keys" in ln or "leftKeys" in ln
    ]
    assert any("salt" in ln for ln in join_keys), plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_salted_equals_naive_unsalted(spark):
    from pyspark.sql import Window as W

    ev = _skewed_events(spark)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag(F.col("ts")).over(w)
    )
    sessions = (
        ev.withColumn(
            "new_session",
            F.when(
                F.lag("ts").over(w).isNull() | (gap_us > 30 * 60 * 1_000_000), 1
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("s_us"),
            F.unix_micros(F.max("ts")).alias("e_us"),
        )
    )
    evt = ev.select(
        F.col("user_id").alias("e_user"), F.unix_micros("ts").alias("ts_us")
    )
    naive = (
        evt.join(
            sessions,
            (evt["e_user"] == sessions["user_id"])
            & F.col("ts_us").between(F.col("s_us"), F.col("e_us")),
        )
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
        )
    )
    got = sorted(map(tuple, join_interval_salted(spark, SF).collect()))
    want = sorted(map(tuple, naive.collect()))
    assert got == want
