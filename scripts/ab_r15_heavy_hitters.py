"""Interleaved A/B attributing the agg_heavy_hitters_checked timing drift
(VERDICT r14 'What's wrong' #2: 0.50 s r13 driver -> 0.96/1.09 s on two
quiet r14 runs, code untouched since a1e0a6d).

Protocol (the r12/r13 A/B discipline): warm up both legs once, then run
A = agg_heavy_hitters_checked and B = agg_count_min_checked (size-matched
control: same events table, same era, did not drift) strictly
interleaved N times at sf0.1, and additionally decompose A into its three
component jobs (MG candidates mapInPandas, total count, broadcast-join
recount) to localize any intrinsic inflation. One JSON line per run on
stdout; summary at the end.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.session import get_spark

SF = "/root/testdata/sf0.1"
N = 6


def main() -> None:
    spark = get_spark()
    import __spark_entry__ as E

    qa = E.queries()["agg_heavy_hitters_checked"]
    qb = E.queries()["agg_count_min_checked"]

    def run(q):
        t0 = time.monotonic()
        q(spark, SF).collect()
        return time.monotonic() - t0

    # warmup both legs (JIT, python workers, FS cache)
    run(qa), run(qb)

    rows = []
    for i in range(N):
        ta = run(qa)
        tb = run(qb)
        rows.append({"i": i, "hh_s": round(ta, 3), "cm_s": round(tb, 3)})
        print(json.dumps(rows[-1]), flush=True)

    # decomposition of A's three jobs
    from distributed_video_analytics_flink_spark.operators.sketches import (
        HH_K,
        misra_gries_batches,
    )
    from distributed_video_analytics_flink_spark.sources.tables import load_table
    from pyspark.sql import types as T

    ev = load_table(spark, SF, "events")

    def _mg(batches):
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": pd.Series(misra_gries_batches(batches, "user_id"), dtype="int64")}
        )

    t0 = time.monotonic()
    cands = (
        ev.select("user_id")
        .mapInPandas(_mg, T.StructType([T.StructField("user_id", T.LongType())]))
        .distinct()
        .localCheckpoint(eager=True)
    )
    t_phase1 = time.monotonic() - t0
    t0 = time.monotonic()
    n = ev.count()
    t_count = time.monotonic() - t0
    t0 = time.monotonic()
    (
        ev.join(F.broadcast(cands), "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * HH_K > F.lit(n))
        .collect()
    )
    t_phase2 = time.monotonic() - t0

    med = lambda xs: sorted(xs)[len(xs) // 2]
    print(
        json.dumps(
            {
                "hh_median_s": round(med([r["hh_s"] for r in rows]), 3),
                "cm_median_s": round(med([r["cm_s"] for r in rows]), 3),
                "hh_over_cm": round(
                    med([r["hh_s"] for r in rows]) / med([r["cm_s"] for r in rows]), 2
                ),
                "decomp": {
                    "mg_candidates_s": round(t_phase1, 3),
                    "count_s": round(t_count, 3),
                    "recount_join_s": round(t_phase2, 3),
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
