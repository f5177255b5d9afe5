#!/usr/bin/env python3
"""Interleaved A/B of the ADOPTED spread_small_scan seams (r18): the
operators import spread_small_scan from sources.tables at call time, so
patching the module attribute to identity reproduces the pre-change
plan exactly. base = identity patch, spread = shipped code.

Usage: python scripts/ab_r18_spread_adopted.py q1,q2,... [rounds] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    import distributed_video_analytics_flink_spark.sources.tables as T
    from distributed_video_analytics_flink_spark import operators as ops
    from distributed_video_analytics_flink_spark.session import get_spark

    spark = get_spark(app_name="r18-ab-spread-adopted")
    spark.range(1000).selectExpr("sum(id)").collect()

    real = T.spread_small_scan
    results = {n: {"base": [], "spread": []} for n in names}
    for r in range(rounds):
        for name in names:
            fn = ops.QUERIES[name].fn
            for tag, impl in (("base", lambda df: df), ("spread", real)):
                T.spread_small_scan = impl
                try:
                    spark.sparkContext.setJobDescription(f"{name} {tag} r{r}")
                    t0 = time.time()
                    fn(spark, sf).write.format("noop").mode("overwrite").save()
                    results[name][tag].append(time.time() - t0)
                finally:
                    T.spread_small_scan = real
    for name in names:
        b, s = results[name]["base"], results[name]["spread"]
        print(
            f"{name}: base min {min(b):.3f} {[round(t,2) for t in b]}"
            f" | spread min {min(s):.3f} {[round(t,2) for t in s]}"
            f" | speedup x{min(b)/max(min(s),1e-9):.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
