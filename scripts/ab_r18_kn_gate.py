#!/usr/bin/env python3
"""Interleaved A/B for the r18 KN-gate change (VERDICT r17 #4): OLD =
r17 shape (bi.count() gate + separate 1-row n_types aggregate crossJoin-
broadcast into the scoring join), NEW = shipped text_kn_bigram_lm_score
(the gate count doubles as the inlined B literal; no n_types subtree).

Usage: python scripts/ab_r18_kn_gate.py [rounds] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from distributed_video_analytics_flink_spark.operators.dedup import (  # noqa: E402
    _materialize,
)
from distributed_video_analytics_flink_spark.operators import text_analysis as TA  # noqa: E402
from distributed_video_analytics_flink_spark.session import get_spark  # noqa: E402
from distributed_video_analytics_flink_spark.sources.tables import (  # noqa: E402
    load_table,
)


def old_kn(spark, sf_dir):
    """Byte-for-byte the r17 tail (count gate + crossJoin broadcast b)."""
    docs = load_table(spark, sf_dir, "documents")
    arr = docs.select("doc_id", F.split("text", " ").alias("t"))
    ev = arr.select(
        "doc_id",
        "t",
        F.explode(F.expr("if(size(t) < 2, array(), sequence(2, size(t)))")).alias("i"),
    ).select(
        "doc_id",
        F.expr("element_at(t, i - 1)").alias("hist"),
        F.expr("element_at(t, i)").alias("w"),
    )
    bi = _materialize(ev.groupBy("hist", "w").agg(F.count(F.lit(1)).alias("c_bi")))
    h = bi.groupBy("hist").agg(
        F.sum("c_bi").alias("c_hist"), F.count(F.lit(1)).alias("n1p_hist")
    )
    cont = bi.groupBy("w").agg(F.count(F.lit(1)).alias("n1p_w"))
    b = bi.agg(F.count(F.lit(1)).alias("n_types"))
    bstats = bi.join(h, "hist").join(cont, "w")
    p_micro = (
        "cast((cast(greatest(4 * c_bi - 3, 0) as decimal(38,0)) * n_types"
        " + cast(3 as decimal(38,0)) * n1p_hist * n1p_w) * 1000000"
        " div (cast(4 as decimal(38,0)) * c_hist * n_types) as bigint)"
    )
    bstats_side = (
        F.broadcast(bstats) if bi.count() <= TA._KN_BCAST_MAX_TYPES else bstats
    )
    per_doc = (
        ev.join(bstats_side, ["hist", "w"])
        .crossJoin(F.broadcast(b))
        .select("doc_id", F.expr(p_micro).alias("p_micro"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bi"), F.sum("p_micro").alias("sum_p_micro"))
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bi", F.lit(0)).cast("bigint").alias("n_bi"),
        F.coalesce("sum_p_micro", F.lit(0)).cast("bigint").alias("sum_p_micro"),
        F.coalesce(F.expr("sum_p_micro div n_bi"), F.lit(0))
        .cast("bigint")
        .alias("mean_p_micro"),
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="r18-ab-kn-gate")
    spark.range(1000).selectExpr("sum(id)").collect()

    new_fn = TA.text_kn_bigram_lm_score
    ref = sorted(map(tuple, old_kn(spark, sf).collect()))
    got = sorted(map(tuple, new_fn(spark, sf).collect()))
    print(f"rows_equal={got == ref} ({len(got)} rows)", flush=True)

    times = {"old": [], "new": []}
    for r in range(rounds):
        for tag, fn in (("old", old_kn), ("new", new_fn)):
            spark.sparkContext.setJobDescription(f"kn {tag} r{r}")
            t0 = time.time()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            times[tag].append(time.time() - t0)
    for tag, ts in times.items():
        print(
            f"{tag}: min {min(ts):.3f} median {sorted(ts)[len(ts)//2]:.3f}"
            f" runs {[round(t,3) for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
