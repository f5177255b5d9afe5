"""Observed pipeline metrics (SURVEY.md §2.8's monitoring role, Spark-native).

The reference's control plane (C1-C7) watches per-operator throughput to
drive its scaler (the ZooKeeper-coordinated rescale loop). Spark's idiomatic
equivalent is the ``Dataset.observe`` API: named aggregate metrics evaluated
INSIDE the running query — zero extra passes, zero extra shuffles — and
surfaced per micro-batch on ``StreamingQueryProgress.observedMetrics``
(batch queries surface them via ``QueryExecutionListener``). A production
deployment points its autoscaler (or alerting) at exactly this stream, the
way the reference's scaler read its Flink metrics; rescaling itself is
dynamic allocation + AQE, per COVERAGE.md §2.8.

Metrics must be aggregate expressions without distinct; they piggyback on
the query's own execution, so a detector that processes zero rows reports
zeros rather than stalling the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MOTION_METRICS_NAME = "motion_metrics"


def with_motion_metrics(detections: DataFrame, name: str = MOTION_METRICS_NAME) -> DataFrame:
    """Attach per-micro-batch observability to a motion-detection stream
    (output of detect_motion_stream / detect_motion_batch): frames
    processed, frames with motion, total boxes, and the max per-frame box
    count (the skew signal a scaler would watch)."""
    return detections.observe(
        name,
        F.count(F.lit(1)).alias("frames"),
        F.sum((F.col("detection_count") > 0).cast("long")).alias("motion_frames"),
        F.sum("detection_count").alias("total_boxes"),
        F.max("detection_count").alias("max_boxes_per_frame"),
    )


def last_observed(progress: dict, name: str = MOTION_METRICS_NAME) -> dict | None:
    """Extract one query's observed metrics from a StreamingQueryProgress
    dict (``q.lastProgress`` / ``q.recentProgress`` entries)."""
    if not progress:
        return None
    return (progress.get("observedMetrics") or {}).get(name)
