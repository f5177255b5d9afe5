#!/usr/bin/env python3
"""Probe (r18): does spreading the tiny single-file scans over
defaultParallelism speed the CPU-heavy queries? Times each named query
normally and with load_table monkeypatched to conditionally repartition
(scan splits < defaultParallelism -> repartition(defaultParallelism)).
Interleaved per round. A measurement tool, not a shipping change.

Usage: python scripts/ab_r18_spread_probe.py q1,q2,... [rounds] [sf_dir]
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

    spark = get_spark(app_name="r18-spread-probe")
    spark.range(1000).selectExpr("sum(id)").collect()

    real_load = T.load_table

    def spread_load(spark_, sf_, table):
        df = real_load(spark_, sf_, table)
        n = spark_.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < n:
            df = df.repartition(n)
        return df

    # every module that imported load_table by name
    import distributed_video_analytics_flink_spark.operators as _ops_pkg

    mods = []
    for mn in list(sys.modules):
        if mn.startswith("distributed_video_analytics_flink_spark"):
            m = sys.modules[mn]
            if getattr(m, "load_table", None) is real_load:
                mods.append(m)

    def set_load(fn):
        T.load_table = fn
        for m in mods:
            m.load_table = fn

    results: dict[str, dict[str, list[float]]] = {
        n: {"base": [], "spread": []} for n in names
    }
    for r in range(rounds):
        for name in names:
            fn = ops.QUERIES[name].fn
            for tag, loader in (("base", real_load), ("spread", spread_load)):
                set_load(loader)
                try:
                    spark.sparkContext.setJobDescription(f"{name} {tag} r{r}")
                    t0 = time.time()
                    fn(spark, sf).write.format("noop").mode("overwrite").save()
                    results[name][tag].append(time.time() - t0)
                finally:
                    set_load(real_load)
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
