"""Streaming joins & dedup — the §2.9 relational surface under Structured
Streaming (the reference has no joins at all; its two streams never meet).

Three first-class streaming capabilities the batch surface already has:

- **Stream-static enrichment**: the frame stream joined to a small static
  dimension (the camera registry — the data-plane form of the reference's
  ZooKeeper ``/dvaf/cameras`` registry, TopicAssignmentManager.java:103-113).
  The static side broadcasts; no state, no watermark needed, the stream side
  never shuffles.
- **Stream-stream interval join**: two unbounded sides buffered in the state
  store, matched on an equi-key plus an event-time range. Both sides carry
  watermarks so the buffered state is bounded: a row can be evicted once the
  other side's watermark passes the end of its join window — this is the
  state-cleanup contract Spark derives from the time-range condition.
- **Streaming dedup**: ``dropDuplicatesWithinWatermark`` keyed by
  (camId, timestamp). The reference's producer runs ``retries=3`` with
  at-least-once acks (VideoProducer.java:64-77), so duplicated frame
  messages are a real wire condition; watermark-bounded dedup state is the
  principled fix (exact dedup state would grow forever — K3's no-watermark
  stance made faithful-but-bounded).

At scale: stream-static joins broadcast the dim per micro-batch (re-reads
pick up registry changes); stream-stream state is per-key-and-window and
partitioned by the join key, so 1000 executors hold disjoint slices; dedup
state size = keys within one watermark horizon, not total history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_cameras(frames: DataFrame, cameras: DataFrame) -> DataFrame:
    """Stream-static broadcast join: attach camera-registry attributes to
    every frame. Catalyst plans the static side as a broadcast per
    micro-batch; left join keeps frames from unregistered cameras flowing
    (the reference would drop to a default topic rather than stall)."""
    return frames.join(F.broadcast(cameras), "camId", "left")


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "camId",
    left_watermark: str = "10 seconds",
    right_watermark: str = "10 seconds",
    tolerance_ms: int = 100,
) -> DataFrame:
    """Stream-stream interval join on ``key`` with |left.ts - right.ts| <=
    tolerance. Both sides are watermarked so buffered join state is evicted
    once the opposite watermark passes a row's match window. Columns come
    back prefixed (l_/r_) since both sides share the frame schema."""
    l = left.withWatermark("timestamp", left_watermark).select(
        F.col(key).alias("l_key"),
        F.col("timestamp").alias("l_ts"),
        F.col("rows").alias("l_rows"),
        F.col("cols").alias("l_cols"),
    )
    r = right.withWatermark("timestamp", right_watermark).select(
        F.col(key).alias("r_key"),
        F.col("timestamp").alias("r_ts"),
        F.col("rows").alias("r_rows"),
        F.col("cols").alias("r_cols"),
    )
    tol = f"INTERVAL {tolerance_ms} MILLISECONDS"
    return l.join(
        r,
        F.expr(
            f"l_key = r_key AND r_ts BETWEEN l_ts - {tol} AND l_ts + {tol}"
        ),
    )


def dedup_frames_stream(frames: DataFrame, within: str = "10 seconds") -> DataFrame:
    """Watermark-bounded streaming dedup on the frame identity
    (camId, timestamp): at-least-once redelivery within the horizon emits
    one row; state for a key is dropped once the watermark passes it."""
    return frames.withWatermark("timestamp", within).dropDuplicatesWithinWatermark(
        ["camId", "timestamp"]
    )
