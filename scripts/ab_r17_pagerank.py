#!/usr/bin/env python3
"""Interleaved A/B for graph_pagerank_converged's iteration loop: block
size (_PR_BLOCK) and AQE on/off during the fixpoint iterations. The
query's OUTPUT (converged/within_cap/n_nodes booleans) is invariant to
both knobs — only wall-clock moves.

Usage: python scripts/ab_r17_pagerank.py [rounds] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_video_analytics_flink_spark.operators import similarity as S  # noqa: E402
from distributed_video_analytics_flink_spark.session import get_spark  # noqa: E402


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="ab-r17-pagerank")

    def timed(block: int, aqe: bool) -> float:
        # restore the SAVED module default, not a hardcoded value
        # (ADVICE r17 #2: a changed default would silently leave the
        # session at a stale block size)
        old_block = S._PR_BLOCK
        S._PR_BLOCK = block
        old = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        try:
            t0 = time.time()
            df = S.graph_pagerank_converged(spark, sf)
            rows = df.collect()
            dt = time.time() - t0
            assert rows[0]["converged"] and rows[0]["within_iter_cap"], rows
            return dt
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", old)
            S._PR_BLOCK = old_block

    variants = [(5, True), (10, True), (5, False), (10, False)]
    # warm-up (memo build for the shared knn edges)
    timed(5, True)
    results = {v: [] for v in variants}
    for r in range(rounds):
        for v in variants:
            spark.sparkContext.setJobDescription(f"pr block={v[0]} aqe={v[1]} r{r}")
            dt = timed(*v)
            results[v].append(dt)
            print(f"round {r}: block={v[0]} aqe={v[1]}: {dt:.3f}s", flush=True)
    for v, ts in results.items():
        print(f"block={v[0]} aqe={v[1]}: {[round(t,3) for t in sorted(ts)]} min {min(ts):.3f}")


if __name__ == "__main__":
    main()
