"""AQE skew-join handling: SCALE.md claims "AQE's skew-join split covers
the join case" for hot keys — this test makes the claim executable. With
skew thresholds scaled down to test-data sizes (the only way to exercise
the code path off-cluster), a hot-key join must plan
SortMergeJoin(skew=true) with an AQEShuffleRead that splits the skewed
partition, and return exactly the rows of the unskewed plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
}


@pytest.fixture
def skew_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_confs):
    # one hot key (60% of rows) + 31 cold keys, joined to a 32-row dim
    left = spark.range(100_000).select(
        F.when(F.col("id") < 60_000, F.lit(0))
        .otherwise((F.col("id") % 31) + 1)
        .alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(5_000_000, 5_000_032).select(
        (F.col("id") % 32).alias("k"), F.lit(1).alias("w")
    )
    j = left.join(right, "k").select(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    [row] = j.collect()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan
    assert "AQEShuffleRead" in plan and "skewed" in plan
    # values must equal the straightforward computation
    assert row["n"] == 100_000
    assert row["s"] == sum(range(100_000))
