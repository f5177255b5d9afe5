#!/usr/bin/env python3
"""Interleaved A/B for the r13 streaming-motion spread (VERDICT r13 #9).

r13's closing runs recorded motion_stream at 342.8 fps (mid-session) vs
195.7 fps (final battery) with no code change — the question is whether
the spread is host noise (hits every leg) or something specific to the
stateful streaming path (state-store init/commit bimodality). Protocol
per the r5/r10/r12 discipline: ONE session, the BATCH motion leg as the
size-matched control, strict alternation batch/stream every round (a
background-load burst hits both legs equally), fresh checkpoint per
stream run, warm-up per leg outside the timed region.

Verdict criterion: compute each leg's per-round fps and the
stream/batch fps RATIO per round. If the ratio is stable (spread well
under the legs' own spreads) while absolute fps of BOTH legs drifts
together, the r13 spread was host noise. If the stream leg is bimodal
on its own (ratio swings with stream runs while batch holds), the
state path owns it and needs a fix.
"""

from __future__ import annotations

import base64
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_video_analytics_flink_spark.session import get_spark

ROUNDS = int(os.environ.get("AB_ROUNDS", "6"))
CAMS, PER_CAM, PER_FILE = 32, 32, 128
N = CAMS * PER_CAM


def _batch_pipeline(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from distributed_video_analytics_flink_spark.operators.video import (
        detect_motion_batch,
    )
    from distributed_video_analytics_flink_spark.schemas import FRAME_SCHEMA

    idx = spark.range(N).select(
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

    frames = idx.repartition(CAMS, "cam").mapInPandas(_gen, FRAME_SCHEMA)
    return detect_motion_batch(frames).select("camId", "ts_us", "detection_count")


def _write_stream_fixture() -> str:
    tmp_dir = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="ab_stream_", dir=tmp_dir)
    data_dir = os.path.join(root, "frames")
    os.makedirs(data_dir)
    frames = []
    for cam in range(CAMS):
        for i in range(PER_CAM):
            px = np.full((480, 640, 3), 50, dtype=np.uint8)
            if i % 10 >= 5:
                x0 = 100 + (i % 10) * 3
                px[100:160, x0 : x0 + 60, :] = 200
            frames.append(
                {
                    "camId": f"cam{cam}",
                    "timestamp": f"2024-01-01T00:00:{i:02d}.{cam:03d}000+00:00",
                    "rows": 480,
                    "cols": 640,
                    "type": 16,
                    "data": base64.b64encode(px.tobytes()).decode("ascii"),
                }
            )
    for fileno, i in enumerate(range(0, N, PER_FILE)):
        p = os.path.join(data_dir, f"b{fileno:04d}.json")
        with open(p, "w") as fh:
            fh.write("\n".join(json.dumps(f) for f in frames[i : i + PER_FILE]))
        os.utime(p, (1_700_000_000 + fileno, 1_700_000_000 + fileno))
    return root


def main() -> None:
    spark = get_spark(app_name="ab-r13-motion-stream")
    from distributed_video_analytics_flink_spark.streaming import (
        detect_motion_stream,
        file_frame_stream,
    )

    batch = _batch_pipeline(spark)
    root = _write_stream_fixture()
    data_dir = os.path.join(root, "frames")
    ck_base = "/dev/shm" if os.path.isdir("/dev/shm") else root

    def run_batch() -> float:
        t0 = time.time()
        batch.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def run_stream(tag: str) -> float:
        ck = os.path.join(ck_base, f"ab_stream_ck_{os.getpid()}_{tag}")
        t0 = time.time()
        q = (
            detect_motion_stream(
                file_frame_stream(spark, data_dir, max_files_per_trigger=8)
            )
            .writeStream.format("noop")
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        sec = time.time() - t0
        shutil.rmtree(ck, ignore_errors=True)
        return sec

    run_batch()  # warm-ups, untimed region
    run_stream("warmup")
    rows = []
    for r in range(ROUNDS):
        bs = run_batch()
        ss = run_stream(f"t{r}")
        rows.append((round(N / bs, 1), round(N / ss, 1)))
        print(
            f"round {r}: batch {rows[-1][0]:7.1f} fps   stream {rows[-1][1]:7.1f} fps"
            f"   ratio {rows[-1][1] / rows[-1][0]:.3f}",
            flush=True,
        )
    b = sorted(x[0] for x in rows)
    s = sorted(x[1] for x in rows)
    ratios = sorted(x[1] / x[0] for x in rows)
    med = lambda v: v[len(v) // 2]
    print(
        json.dumps(
            {
                "batch_fps": {"min": b[0], "med": med(b), "max": b[-1]},
                "stream_fps": {"min": s[0], "med": med(s), "max": s[-1]},
                "ratio": {
                    "min": round(ratios[0], 3),
                    "med": round(med(ratios), 3),
                    "max": round(ratios[-1], 3),
                },
                "rounds": rows,
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
