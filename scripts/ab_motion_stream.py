#!/usr/bin/env python3
"""Interleaved A/B harness for the motion_stream_640x480 benchmark.

Round-4 verdict flagged a 4x r2->r4 slowdown of the streaming motion bench
(3.74 s -> 15.07 s) with ZERO code diff in the motion path or the bench
function itself (verified: `git diff 5734296 HEAD` touches only bench fencing).
The suspects are the Spark 4.1.2 migration and machine noise (this box swings
2-3x). Per the repo's bench-noise discipline, variants are interleaved within
ONE session so a background-load burst hits all variants equally.

Variants (one streaming run each, repeated R rounds, min per variant):
  base      -- exactly the bench's config (maxFilesPerTrigger=8, session conf)
  1batch    -- all replay files in a single micro-batch
  arrow10k  -- arrow.maxRecordsPerBatch=10000 (session default is 1024)
  rocksdb   -- RocksDB state store provider
  batchmode -- the batch twin (lag-window) on the same frames, for the ratio

Prints one JSON line per run plus a summary; also dumps the per-batch
durationMs breakdown of the slowest and fastest `base` run to show WHERE the
time goes (trigger overhead vs addBatch vs state commit).
"""

from __future__ import annotations

import base64
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from distributed_video_analytics_flink_spark.session import (
    ROCKSDB_STATE_STORE,
    get_spark,
)
from distributed_video_analytics_flink_spark.streaming import (
    detect_motion_stream,
    file_frame_stream,
)

CAMS, PER_CAM, PER_FILE = 32, 32, 128
N = CAMS * PER_CAM


def write_replay(data_dir: str) -> None:
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


def run_stream(spark, data_dir, ck_base, tag, mfpt=8, confs=None):
    saved = {}
    for k, v in (confs or {}).items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    ck = os.path.join(ck_base, f"ab_ck_{os.getpid()}_{tag}_{time.time_ns()}")
    t0 = time.time()
    q = (
        detect_motion_stream(file_frame_stream(spark, data_dir, max_files_per_trigger=mfpt))
        .writeStream.format("noop")
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    progress = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    sec = time.time() - t0
    shutil.rmtree(ck, ignore_errors=True)
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
    return sec, progress


def run_batch(spark):
    """Batch twin — same generator as bench.bench_motion_fps, one timed run."""
    import bench

    t0 = time.time()
    sec, n = bench.bench_motion_fps(spark)  # has its own warmup + min-of-3
    return sec, time.time() - t0


def main():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ab-motion-stream")
    tmp_dir = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="ab_stream_", dir=tmp_dir)
    data_dir = os.path.join(root, "frames")
    os.makedirs(data_dir)
    write_replay(data_dir)
    ck_base = "/dev/shm" if os.path.isdir("/dev/shm") else root

    variants = {
        "base": dict(mfpt=8),
        "1batch": dict(mfpt=64),
        "arrow10k": dict(
            mfpt=8, confs={"spark.sql.execution.arrow.maxRecordsPerBatch": "10000"}
        ),
        "rocksdb": dict(
            mfpt=8,
            confs={"spark.sql.streaming.stateStore.providerClass": ROCKSDB_STATE_STORE},
        ),
    }
    results: dict[str, list[float]] = {k: [] for k in variants}
    progresses: dict[str, list] = {}

    # warmup (spawns python worker pool, compiles the streaming plan)
    sec, _ = run_stream(spark, data_dir, ck_base, "warmup")
    print(json.dumps({"run": "warmup", "sec": round(sec, 2)}), flush=True)

    ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))
    for r in range(ROUNDS):
        for name, v in variants.items():
            sec, prog = run_stream(
                spark, data_dir, ck_base, f"{name}{r}", v["mfpt"], v.get("confs")
            )
            results[name].append(sec)
            progresses.setdefault(name, []).append(prog)
            print(
                json.dumps(
                    {"round": r, "variant": name, "sec": round(sec, 3), "fps": round(N / sec, 1)}
                ),
                flush=True,
            )

    summary = {
        name: {
            "min_sec": round(min(v), 3),
            "max_sec": round(max(v), 3),
            "best_fps": round(N / min(v), 1),
        }
        for name, v in results.items()
    }
    print("SUMMARY " + json.dumps(summary), flush=True)

    # Duration breakdown of best base run
    best_i = results["base"].index(min(results["base"]))
    for p in progresses["base"][best_i]:
        print(
            "BASEPROG "
            + json.dumps(
                {
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "durationMs": p.get("durationMs"),
                    "stateOperators": [
                        {
                            k: so.get(k)
                            for k in (
                                "commitTimeMs",
                                "stateMemory",
                                "numRowsUpdated",
                                "allUpdatesTimeMs",
                            )
                        }
                        for so in p.get("stateOperators", [])
                    ],
                }
            ),
            flush=True,
        )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
