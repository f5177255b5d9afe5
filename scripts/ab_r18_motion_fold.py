#!/usr/bin/env python3
"""Interleaved A/B for the r18 batch-motion fold fanout (VERDICT r17
#3): OLD = repartition("camId") at shuffle.partitions (hash collisions
serialize 2-3 cameras per task; AQE may coalesce the ~30 MB partitions
further), NEW = shipped explicit 4x fanout. Replays the bench's
motion_pipeline leg (32 cams x 32 synthetic 640x480 frames) and the
small fixture leg (video_motion_batch) for overhead regression.

Usage: python scripts/ab_r18_motion_fold.py [rounds]
"""

from __future__ import annotations

import base64
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from distributed_video_analytics_flink_spark.operators import video as V  # noqa: E402
from distributed_video_analytics_flink_spark.schemas import FRAME_SCHEMA  # noqa: E402
from distributed_video_analytics_flink_spark.session import get_spark  # noqa: E402

CAMS, PER_CAM = 32, 32


def synthetic_frames(spark):
    n = CAMS * PER_CAM
    idx = spark.range(n).select(
        (F.col("id") % CAMS).alias("cam"),
        (F.col("id") / CAMS).cast("int").alias("i"),
    )

    def _gen(batches):
        for pdf in batches:
            rows = []
            for cam, i in zip(pdf["cam"], pdf["i"]):
                frame = np.full((480, 640, 3), 50, dtype=np.uint8)
                if i % 10 >= 5:
                    x0 = 100 + int(i % 10) * 3
                    frame[100:160, x0 : x0 + 60, :] = 200
                rows.append(
                    (
                        f"cam{cam}",
                        np.datetime64("2024-01-01")
                        + np.timedelta64(33 * int(i), "ms"),
                        480,
                        640,
                        16,
                        base64.b64encode(frame.tobytes()).decode("ascii"),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["camId", "timestamp", "rows", "cols", "type", "data"],
            )

    return idx.repartition(CAMS, "cam").mapInPandas(_gen, FRAME_SCHEMA)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="r18-ab-motion-fold")
    frames = synthetic_frames(spark)
    conf_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # Variant trick: detect_motion_batch computes 4 * shuffle.partitions
    # at call time, so setting the conf to conf/4 while BUILDING the
    # frame reproduces the OLD partition count with the same hash
    # partitioner (repartition(N, camId) with N == conf_parts ==
    # old repartition("camId") placement). The old no-N form could
    # additionally be AQE-coalesced below N, so this A/B is conservative
    # in the old shape's favor.
    results = {"old_1x": [], "new_4x": []}
    out = V.detect_motion_batch(frames).select("camId", "ts_us", "detection_count")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(out)  # warm-up: worker pool + codegen

    for r in range(rounds):
        for tag, mult in (("old_1x", 1), ("new_4x", 4)):
            orig = spark.conf.get("spark.sql.shuffle.partitions")
            try:
                # detect_motion_batch computes 4 * conf; setting conf to
                # conf/4 reproduces the old count exactly
                spark.conf.set(
                    "spark.sql.shuffle.partitions",
                    str(max(1, conf_parts * mult // 4)),
                )
                df = V.detect_motion_batch(frames).select(
                    "camId", "ts_us", "detection_count"
                )
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", orig)
            spark.sparkContext.setJobDescription(f"motion fold {tag} r{r}")
            t0 = time.time()
            force(df)
            results[tag].append(time.time() - t0)
    for tag, ts in results.items():
        print(
            f"{tag}: min {min(ts):.3f} median {sorted(ts)[len(ts)//2]:.3f}"
            f" runs {[round(t,3) for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
