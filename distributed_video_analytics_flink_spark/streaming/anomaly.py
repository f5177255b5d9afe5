"""Streaming anomaly detection: the stream twin of `events_anomaly_zscore`.

The batch query derives per-event-type moments and flags 3-sigma outliers
in one pass. A stream cannot see its own full history, so the production
shape is REFERENCE STATS + LIVE SCORING: per-type moments come from the
batch table (recomputed on whatever cadence drift tolerates), broadcast
into the stream, and each arriving event is scored row-locally with the
SAME exact-integer algebra — (cn - S)^2 > 9(Qn - S^2) over 128-bit
decimals — so a replayed stream flags EXACTLY the rows the batch query
flags (pinned by tests/test_streaming.py::test_stream_anomaly_matches_batch).

Scale: the stats side is |event_types| rows (broadcast, no stream state at
all — this needs no watermark and no state store); scoring is codegen'd
arithmetic on the stream side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.functions.portable import cents

_DEC = "decimal(38,0)"


def event_type_moments(events: DataFrame) -> DataFrame:
    """Batch side: per-type (n, S, Q) in exact integer cents."""
    c = cents("value")
    # per-term cast: the SUM accumulator itself must be 128-bit — summing
    # BIGINT squares and casting the result overflows 64-bit mid-aggregate
    # at billion-row types (ADVICE r5)
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(c.cast(_DEC)).alias("s"),
        F.sum((c * c).cast(_DEC)).alias("q"),
    )


def flag_anomalies(stream: DataFrame, moments: DataFrame) -> DataFrame:
    """Stream side: broadcast the moments, keep only >3-sigma events."""
    c = cents("value").cast(_DEC)
    dev = c * F.col("n") - F.col("s")
    var_n2 = F.col("q") * F.col("n") - F.col("s") * F.col("s")
    return (
        stream.join(F.broadcast(moments), "event_type")
        .filter(dev * dev > F.lit(9).cast(_DEC) * var_n2)
        .select("event_id", "event_type", "value")
    )
