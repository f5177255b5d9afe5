"""Pins for operators/sketches.py: the Misra-Gries superset guarantee
(the load-bearing claim behind agg_heavy_hitters_checked's two-phase
plan) and the Count-Min never-underestimates contract, both on
adversarially skewed synthetic data the sf tables don't exhibit."""

import collections
import random

import pandas as pd
import pytest

from distributed_video_analytics_flink_spark.operators.sketches import (
    CM_DEPTH,
    CM_WIDTH,
    HH_K,
    misra_gries_batches,
)


def _zipf_stream(rng, n, n_keys, exponent=1.3):
    weights = [1.0 / (i + 1) ** exponent for i in range(n_keys)]
    return rng.choices(range(n_keys), weights=weights, k=n)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("k", [4, 16, 64])
def test_misra_gries_candidates_are_a_superset_of_heavy_hitters(seed, k):
    """Any key with frequency > n/(k+1) in the processed stream must
    survive the k-counter sketch — the classic MG guarantee the
    two-phase plan's phase 1 relies on (per partition; pigeonhole lifts
    it to the global n/k threshold across partitions)."""
    rng = random.Random(seed)
    stream = _zipf_stream(rng, n=5000, n_keys=500)
    # feed as several pandas batches, like mapInPandas does
    batches = [
        pd.DataFrame({"v": pd.Series(stream[i : i + 700], dtype="int64")})
        for i in range(0, len(stream), 700)
    ]
    survivors = set(misra_gries_batches(batches, "v", k=k))
    assert len(survivors) <= k
    freq = collections.Counter(stream)
    n = len(stream)
    heavy = {key for key, c in freq.items() if c * (k + 1) > n}
    missing = heavy - survivors
    assert not missing, f"MG dropped true heavy hitters: {missing}"


def test_misra_gries_empty_and_single_batch_edges():
    assert misra_gries_batches([], "v") == []
    one = [pd.DataFrame({"v": pd.Series([7, 7, 7], dtype="int64")})]
    assert misra_gries_batches(one, "v", k=2) == [7]


def test_heavy_hitters_query_is_exact(spark):
    """The registered query's output must equal the plain
    groupBy-HAVING it replaces (phase 2 recounts candidates exactly, so
    the sketch can only affect the PLAN, never the answer)."""
    from pyspark.sql import functions as F

    from distributed_video_analytics_flink_spark.operators.sketches import (
        agg_heavy_hitters_checked,
    )
    from distributed_video_analytics_flink_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        (r.user_id, r.freq)
        for r in agg_heavy_hitters_checked(spark, sf).collect()  # bounded: <= distinct users
    }
    ev = load_table(spark, sf, "events")
    n = ev.count()
    want = {
        (r.user_id, r.freq)
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * HH_K > n)
        .collect()  # bounded: <= distinct users
    }
    assert got == want


def test_count_min_contract(spark):
    """Every probe estimate >= its exact count, and no estimate exceeds
    exact + n/CM_WIDTH * safety (the CM additive error is ~n/width per
    collision row; depth-min keeps it near that at this skew)."""
    from distributed_video_analytics_flink_spark.operators.sketches import (
        agg_count_min_checked,
    )
    from distributed_video_analytics_flink_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = agg_count_min_checked(spark, sf).collect()  # bounded: <= distinct probed users
    assert rows, "probe split produced no keys"
    n = load_table(spark, sf, "events").count()
    assert CM_DEPTH >= 2 and CM_WIDTH >= 64
    for r in rows:
        assert r.never_underestimates
        assert r.cm_estimate >= r.exact_freq
        assert r.cm_estimate <= r.exact_freq + max(1, (4 * n) // CM_WIDTH), (
            f"estimate for {r.user_id} drifted far beyond the CM bound: {r}"
        )


def test_streaming_mg_state_survives_triggers(spark, tmp_path):
    """The sharded MG table must fold across micro-batches through the
    state store: replay a skewed synthetic stream one file per trigger
    and require the final candidate set to be a superset of the true
    heavy keys (and the seq column to prove >1 stateful trigger ran)."""
    import collections
    import random

    from pyspark.sql import functions as F

    from distributed_video_analytics_flink_spark.streaming.heavy_hitters import (
        heavy_hitter_candidates_stream,
        latest_candidates,
    )

    rng = random.Random(7)
    stream_vals = _zipf_stream(rng, n=6000, n_keys=400)
    chunks = tmp_path / "chunks"
    n_files = 4
    per = len(stream_vals) // n_files
    for i in range(n_files):
        spark.createDataFrame(
            [(int(v),) for v in stream_vals[i * per : (i + 1) * per]],
            "user_id long",
        ).coalesce(1).write.mode("append").parquet(str(chunks))

    src = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunks))
    )
    out = tmp_path / "snaps"
    q = (
        heavy_hitter_candidates_stream(src, n_shards=4, k=32)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    snaps = spark.read.parquet(str(out))
    assert snaps.agg(F.max("seq")).collect()[0][0] >= 2, (
        "stream collapsed to a single trigger — state never roundtripped"
    )
    cands = {r.user_id for r in latest_candidates(snaps).collect()}  # <= shards*k
    freq = collections.Counter(stream_vals)
    n = len(stream_vals)
    heavy = {key for key, c in freq.items() if c * 33 > n}  # k=32 -> n/(k+1)
    assert heavy, "fixture produced no heavy keys; test is vacuous"
    assert heavy <= cands, f"stream sketch dropped heavy keys: {heavy - cands}"
    # bounded state: each shard's final table is <= k entries
    per_shard = (
        latest_candidates(snaps)
        .withColumn("shard", F.col("user_id") % 4)
        .groupBy("shard")
        .count()
        .collect()
    )
    assert all(r["count"] <= 32 for r in per_shard)


def test_count_min_relation_is_sum_mergeable(spark):
    """The claim both the streaming leg and the build-per-day posture
    rest on: CM sketches of disjoint slices, SUM-merged on (d, bucket),
    equal the sketch built over the union."""
    from pyspark.sql import functions as F

    from distributed_video_analytics_flink_spark.operators.sketches import (
        CM_DEPTH,
        _cm_bucket_spark,
    )
    from distributed_video_analytics_flink_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select("user_id")
    depth = F.explode(F.array(*[F.lit(i) for i in range(CM_DEPTH)])).alias("d")

    def sketch(df):
        return (
            df.select("user_id", depth)
            .select("d", _cm_bucket_spark(F.col("user_id"), F.col("d")).alias("bucket"))
            .groupBy("d", "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    half_a = sketch(ev.filter(F.col("user_id") % 2 == 0))
    half_b = sketch(ev.filter(F.col("user_id") % 2 == 1))
    merged = (
        half_a.unionByName(half_b)
        .groupBy("d", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    full = sketch(ev)
    # d*w bounded collects
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in full.collect()}


def test_stream_parity_anchor_detects_drift(spark):
    """The stream==batch anchors in both *_stream_parity queries are two
    directed ``exceptAll`` diffs (ADVICE r13 replaced a vacuous
    full_outer-on-join-keys null filter that could never fire); pin that
    the pattern detects every drift class — a changed count, a missing
    row, an extra row — in either direction."""

    def anchor(x, y):
        return x.exceptAll(y).count() == 0 and y.exceptAll(x).count() == 0

    schema = "d int, bucket int, c long"
    a = spark.createDataFrame([(0, 1, 5), (1, 2, 7)], schema)
    assert anchor(a, a)
    drifted = [
        spark.createDataFrame([(0, 1, 6), (1, 2, 7)], schema),  # changed c
        spark.createDataFrame([(0, 1, 5)], schema),  # missing row
        spark.createDataFrame([(0, 1, 5), (1, 2, 7), (2, 3, 1)], schema),
    ]
    for bad in drifted:
        assert not anchor(a, bad)
        assert not anchor(bad, a)
