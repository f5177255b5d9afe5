#!/usr/bin/env python3
"""Time a list of registry queries in ONE session with the noop sink
(min-of-N), for optimization triage. Not the bench — a working tool.

Usage: python scripts/r17_time_queries.py q1,q2,... [runs] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    from distributed_video_analytics_flink_spark import operators as ops
    from distributed_video_analytics_flink_spark.session import get_spark

    spark = get_spark(app_name="r17-time-queries")
    spark.range(1000).selectExpr("sum(id)").collect()  # JIT warm-up

    for name in names:
        fn = ops.QUERIES[name].fn
        ts = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{name} r{r}")
            t0 = time.time()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        print(f"{name}: min {min(ts):.3f} runs {[round(t,3) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
