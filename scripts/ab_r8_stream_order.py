#!/usr/bin/env python3
"""Round-8 A/B: does the MJPEG bench running immediately before the motion
streaming bench depress its throughput (page-cache / worker-pool / GC
aftermath), or is the r6->r7 drop (365 -> 193 fps) first-run sampling noise
amplified by the early-stop at MOTION_TARGET_FPS=150?

Within ONE Spark session (so a background-load burst hits both arms):
each round times K streaming runs in arm A (stream alone), then forces the
MJPEG batch pipeline once and times K streaming runs in arm B (stream right
after MJPEG). Per-run fps is printed; if the B distribution matches A, the
ordering is innocent and the drop was the early-stop sampling a noisy
first run.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import bench  # noqa: E402
from distributed_video_analytics_flink_spark.session import get_spark  # noqa: E402


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ab-r8-stream-order")
    spark.range(1000).selectExpr("sum(id)").collect()

    # Build the MJPEG bench's job once; force() replays it per arm-B round.
    import shutil
    import tempfile

    import numpy as np

    from distributed_video_analytics_flink_spark.operators.video import (
        detect_motion_batch,
    )
    from distributed_video_analytics_flink_spark.sources.avi import encode_avi
    from distributed_video_analytics_flink_spark.sources.video_files import (
        read_video_files,
    )

    cams, per_cam = 32, 32
    tmp_dir = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="ab_mjpeg_", dir=tmp_dir)
    frames = []
    for i in range(per_cam):
        px = np.full((480, 640, 3), 50, dtype=np.uint8)
        if i % 10 >= 5:
            x0 = 100 + (i % 10) * 3
            px[100:160, x0 : x0 + 60, :] = 200
        frames.append(px)
    data = encode_avi(frames, codec="mjpeg", quality=85)
    for cam in range(cams):
        with open(os.path.join(root, f"cam{cam:02d}.avi"), "wb") as fh:
            fh.write(data)
    mjpeg_out = detect_motion_batch(read_video_files(spark, root, glob="*.avi")).select(
        "camId", "ts_us", "detection_count"
    )

    # Streaming replay fixture + single-run timer, identical to the bench's.
    import base64

    s_root = tempfile.mkdtemp(prefix="ab_stream_", dir=tmp_dir)
    data_dir = os.path.join(s_root, "frames")
    os.makedirs(data_dir)
    s_cams, s_per_cam, per_file = 32, 32, 128
    n = s_cams * s_per_cam
    sframes = []
    for cam in range(s_cams):
        for i in range(s_per_cam):
            px = np.full((480, 640, 3), 50, dtype=np.uint8)
            if i % 10 >= 5:
                x0 = 100 + (i % 10) * 3
                px[100:160, x0 : x0 + 60, :] = 200
            sframes.append(
                {
                    "camId": f"cam{cam}",
                    "timestamp": f"2024-01-01T00:00:{i:02d}.{cam:03d}000+00:00",
                    "rows": 480,
                    "cols": 640,
                    "type": 16,
                    "data": base64.b64encode(px.tobytes()).decode("ascii"),
                }
            )
    for fileno, i in enumerate(range(0, n, per_file)):
        p = os.path.join(data_dir, f"b{fileno:04d}.json")
        with open(p, "w") as fh:
            fh.write("\n".join(json.dumps(f) for f in sframes[i : i + per_file]))
        os.utime(p, (1_700_000_000 + fileno, 1_700_000_000 + fileno))

    from distributed_video_analytics_flink_spark.streaming import (
        detect_motion_stream,
        file_frame_stream,
    )

    ck_base = "/dev/shm" if os.path.isdir("/dev/shm") else s_root

    def stream_once(tag: str) -> float:
        ck = os.path.join(ck_base, f"ab8_ck_{os.getpid()}_{tag}")
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

    stream_once("warmup")
    bench._force(mjpeg_out)  # warm the MJPEG path too

    K = int(os.environ.get("AB_K", "3"))
    ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))
    arms: dict[str, list[float]] = {"alone": [], "after_mjpeg": []}
    for r in range(ROUNDS):
        for k in range(K):
            sec = stream_once(f"a{r}_{k}")
            arms["alone"].append(sec)
            print(
                json.dumps({"round": r, "arm": "alone", "sec": round(sec, 3), "fps": round(n / sec, 1)}),
                flush=True,
            )
        t0 = time.time()
        bench._force(mjpeg_out)
        print(json.dumps({"round": r, "arm": "mjpeg_force", "sec": round(time.time() - t0, 3)}), flush=True)
        for k in range(K):
            sec = stream_once(f"b{r}_{k}")
            arms["after_mjpeg"].append(sec)
            print(
                json.dumps({"round": r, "arm": "after_mjpeg", "sec": round(sec, 3), "fps": round(n / sec, 1)}),
                flush=True,
            )

    summary = {
        arm: {
            "min_fps": round(n / max(v), 1),
            "max_fps": round(n / min(v), 1),
            "median_fps": round(n / statistics.median(v), 1),
            "first_run_fps": round(n / v[0], 1),
        }
        for arm, v in arms.items()
    }
    print("SUMMARY " + json.dumps(summary), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(s_root, ignore_errors=True)


if __name__ == "__main__":
    main()
