"""Per-camera FPS aggregation (SURVEY.md §2.5 A1) and its watermarked twin.

The reference's producer counts frames per 2-second wall-clock window and
reports ``frames*1000/elapsed`` to ZooKeeper (VideoEventCreator.java:69-90).
As a query that is a tumbling-window count — here in both the faithful
no-watermark form (state grows forever, like the reference's K3 stance) and
the bounded form with a watermark for late data (the production default at
scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REPORT_INTERVAL_SECONDS = 2  # producer.properties loadReportIntervalMs=2000


def camera_fps(
    frames: DataFrame,
    interval_seconds: int = REPORT_INTERVAL_SECONDS,
    watermark: str | None = "10 seconds",
) -> DataFrame:
    """Tumbling event-time window count per camera -> frames + fps columns.
    Works identically on batch and streaming inputs (same plan, incremental
    execution in streaming). ``watermark=None`` reproduces the reference's
    unbounded-state semantics; streaming append mode requires a watermark to
    ever emit, so the default bounds lateness at 10 s."""
    if watermark is not None and frames.isStreaming:
        frames = frames.withWatermark("timestamp", watermark)
    win = F.window("timestamp", f"{interval_seconds} seconds")
    return frames.groupBy(win.alias("window"), "camId").agg(
        F.count("*").alias("frames"),
        (F.count("*") / F.lit(float(interval_seconds))).alias("fps"),
    )
