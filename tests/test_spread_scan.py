"""Pins for the r18 spread_small_scan seam (VERDICT r17 #2): a tiny
single-file scan yields ONE task and serializes any CPU-heavy projection
fed by it (md5/shingle/tokenize) on one core — the measured cause of
text_classifier_train_step's 1.02 8->32-core scaling ratio. The helper
round-robins such scans to defaultParallelism and must be a NO-OP when
the scan already has enough splits (at 100 TB the scan's own splits
dominate — no shuffle may be added on a real cluster)."""

from __future__ import annotations

from distributed_video_analytics_flink_spark.sources.tables import (
    load_table,
    spread_small_scan,
)
from tests.conftest import SF_DIR


def test_spread_small_scan_spreads_tiny_scan(spark):
    docs = load_table(spark, SF_DIR, "documents")
    n = spark.sparkContext.defaultParallelism
    assert docs.rdd.getNumPartitions() < n  # the premise: tiny fixture
    spread = spread_small_scan(docs)
    assert spread.rdd.getNumPartitions() == n
    # row-identical: repartition only moves rows
    assert spread.count() == docs.count()


def test_spread_small_scan_noop_when_enough_splits(spark):
    wide = spark.range(0, 1000, 1, spark.sparkContext.defaultParallelism + 3)
    assert spread_small_scan(wide) is wide  # no shuffle added


def test_substring_spans_fingerprint_stage_is_spread(spark):
    """The adopted seam is visible in the plan: a RoundRobin exchange
    sits below the stride-1 window fingerprinting (the md5-heavy stage),
    so its work spreads over the cluster instead of one scan task."""
    from distributed_video_analytics_flink_spark import operators as ops

    plan = (
        ops.QUERIES["dedup_substring_spans"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ROUND_ROBIN" in plan or "RoundRobinPartitioning" in plan, plan[:2000]
