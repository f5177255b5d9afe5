#!/usr/bin/env python3
"""Focused sweep: spark.sql.execution.arrow.maxRecordsPerBatch vs the
motion_stream benchmark, interleaved within one session (bench-noise
discipline). Usage: AB_ROUNDS=3 python3 scripts/ab_arrow_sweep.py 64 256 1024 4096 10000
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ab_motion_stream import N, run_stream, write_replay  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributed_video_analytics_flink_spark.session import get_spark  # noqa: E402


def main():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sizes = [int(a) for a in sys.argv[1:]] or [64, 256, 1024, 4096, 10000]
    spark = get_spark(app_name="ab-arrow-sweep")
    tmp_dir = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="ab_sweep_", dir=tmp_dir)
    data_dir = os.path.join(root, "frames")
    os.makedirs(data_dir)
    write_replay(data_dir)
    ck_base = "/dev/shm" if os.path.isdir("/dev/shm") else root

    sec, _ = run_stream(spark, data_dir, ck_base, "warmup")
    print(json.dumps({"run": "warmup", "sec": round(sec, 2)}), flush=True)

    results = {s: [] for s in sizes}
    for r in range(int(os.environ.get("AB_ROUNDS", "3"))):
        for s in sizes:
            sec, _ = run_stream(
                spark,
                data_dir,
                ck_base,
                f"a{s}_{r}",
                mfpt=8,
                confs={"spark.sql.execution.arrow.maxRecordsPerBatch": str(s)},
            )
            results[s].append(sec)
            print(
                json.dumps({"round": r, "arrow": s, "sec": round(sec, 3), "fps": round(N / sec, 1)}),
                flush=True,
            )
    print(
        "SUMMARY "
        + json.dumps(
            {s: {"min_sec": round(min(v), 3), "best_fps": round(N / min(v), 1)} for s, v in results.items()}
        ),
        flush=True,
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
