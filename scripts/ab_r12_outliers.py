#!/usr/bin/env python3
"""Interleaved A/B for the three r12 bench outliers (VERDICT r12 #3).

One committed r12 closing run (c695c5c) showed agg_hll_union_checked
0.20->0.64 s, subquery_not_in_nulls 0.36->1.09 s, scalar_variant_shred
0.42->1.20 s vs r11 — with no code change to any of them. Two OTHER
same-code r12 runs (42221f7's committed detail, and the driver's own
recording at 6bd77ee) sat at 0.28/0.39/0.46 and 0.29/0.40/0.52, i.e.
inside the r11 noise band — so the hypothesis is one noisy host window,
not a plan change. Per the r5/r10 discipline, this interleaves the three
suspects with three size-matched control queries inside ONE session (a
background-load burst hits suspects and controls equally), R rounds
each, and prints per-query min/median next to the r11 reference.

Verdict criterion: if suspect medians track their controls' drift ratio
(vs r11) rather than holding a 3x regression, the outliers were host
noise — record the dated closure in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_video_analytics_flink_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "5"))

SUSPECTS = ["agg_hll_union_checked", "subquery_not_in_nulls", "scalar_variant_shred"]
CONTROLS = ["agg_distinct", "subquery_exists", "agg_rollup"]
R11 = {  # BENCH_DETAIL_r11.json, same host, sf0.1
    "agg_hll_union_checked": 0.205,
    "subquery_not_in_nulls": 0.363,
    "scalar_variant_shred": 0.421,
}


def main() -> None:
    import distributed_video_analytics_flink_spark.operators as ops

    spark = get_spark()
    names = [n for pair in zip(SUSPECTS, CONTROLS) for n in pair]
    # warm-up: plan + python-worker spawn outside the timed region
    for n in names:
        ops.QUERIES[n].fn(spark, SF_DIR).collect()
    times: dict[str, list[float]] = {n: [] for n in names}
    for r in range(ROUNDS):
        for n in names:  # interleaved: every round touches every query
            t0 = time.time()
            ops.QUERIES[n].fn(spark, SF_DIR).collect()
            times[n].append(round(time.time() - t0, 3))
    out = {}
    for n in names:
        runs = sorted(times[n])
        med = runs[len(runs) // 2]
        out[n] = {
            "runs": times[n],
            "min": runs[0],
            "median": med,
            "r11": R11.get(n),
            "ratio_vs_r11": round(med / R11[n], 2) if n in R11 else None,
        }
    print(json.dumps({"sf_dir": SF_DIR, "rounds": ROUNDS, "results": out}, indent=1))


if __name__ == "__main__":
    main()
