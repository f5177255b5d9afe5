"""Frequency-sketch operators: exact heavy hitters via a two-phase
Misra-Gries pass, and a relational Count-Min sketch with a pinned
never-underestimates contract.

Neither exists in the reference (dvaf is a fixed video topology with no
query surface), but both are table stakes for a 100 TB training-data
pipeline: "which hosts/users/boilerplate lines dominate the corpus"
cannot be answered by a full groupBy when the key cardinality is
billions — the sketch passes bound the shuffle to the sketch size.

Cross-engine hashing follows the repo convention (md5 hex prefix ->
integer; see curation._spark_bucket / dedup._duck_minhash_cte) so the
DuckDB oracles replay the exact same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_video_analytics_flink_spark.operators.registry import query
from distributed_video_analytics_flink_spark.sources.tables import load_table

# heavy hitter = key with frequency > n / HH_K (phi = 1/128). At sf0.01
# (10k events, 150 users, max per-user freq ~86) the threshold is 78 ->
# a handful of top users; at sf0.001 every user clears it; at larger SF
# the synthetic per-user counts stay ~66 so the result thins to empty —
# the PLAN is what scales, membership is data-dependent by definition.
HH_K = 128


def misra_gries_batches(batches, column: str, k: int = HH_K):
    """Weighted Misra-Gries over an iterator of pandas batches (ONE
    partition's worth): maintain at most ``k`` counters; inserting into a
    full table subtracts the post-insert minimum from every counter and
    drops zeros. Guarantee (classic MG proof): each decrement round of
    ``d`` removes >= (k+1)*d total weight, so total decrement per key is
    <= n_p/(k+1) — every key with partition frequency > n_p/(k+1)
    finishes with a positive counter. Returns the surviving keys.

    Per batch the heavy lifting is a vectorized ``value_counts``; the
    Python loop touches at most one entry per DISTINCT value per batch
    and the counter table is capped at k entries.
    """
    counters: dict = {}
    for pdf in batches:
        for item, c in pdf[column].value_counts().items():
            if item in counters:
                counters[item] += int(c)
            else:
                counters[item] = int(c)
                if len(counters) > k:
                    d = min(counters.values())
                    counters = {i: v - d for i, v in counters.items() if v > d}
    return list(counters)


@query(
    "agg_heavy_hitters_checked",
    oracle=f"""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS freq
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) * {HH_K} > (SELECT COUNT(*) FROM events)
    ORDER BY freq DESC, user_id ASC
    """,
)
def agg_heavy_hitters_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (frequency > n/128) without ever shuffling the
    raw key stream — the two-phase Misra-Gries pattern:

    Phase 1 (map-only): per-partition MG sketch with k=HH_K=128 counters
    (``mapInPandas``; imperative per-partition state Spark's aggregates
    can't express, but vectorized ``value_counts`` per Arrow batch keeps
    the Python loop off the hot path). Pigeonhole: a key with GLOBAL
    frequency > n/k must exceed n_p/k > n_p/(k+1) in at least one
    partition (if freq_p <= n_p/k everywhere, summing gives freq <= n/k),
    so the union of per-partition survivors is a SUPERSET of the true
    heavy hitters — at most k keys per partition leave the scan.

    Phase 2 (candidates only): broadcast the candidate set back over the
    table; the groupBy shuffles only rows whose key is a candidate (with
    map-side partial aggregation, that's <= |candidates| rows per task),
    and the n/k threshold test cross-multiplies in integers
    (freq * k > n) — no float at the membership boundary.

    At 100 TB with billions of distinct keys a direct
    groupBy-then-HAVING shuffles every (key, partial-count) pair; this
    plan's shuffle is bounded by k * n_partitions candidates regardless
    of key cardinality. Result is EXACT (phase 2 recounts), so the
    oracle is the plain SQL the sketch replaces.
    """
    ev = load_table(spark, sf_dir, "events")

    def _mg(batches):
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": pd.Series(misra_gries_batches(batches, "user_id"), dtype="int64")}
        )

    cands = (
        ev.select("user_id")
        .mapInPandas(_mg, T.StructType([T.StructField("user_id", T.LongType())]))
        .distinct()
    )
    total = ev.agg(F.count(F.lit(1)).alias("n"))
    freqs = (
        ev.join(F.broadcast(cands), "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        freqs.crossJoin(F.broadcast(total))
        .filter(F.col("freq") * HH_K > F.col("n"))
        .select("user_id", "freq")
        .orderBy(F.desc("freq"), F.asc("user_id"))
    )


# Count-Min geometry: d rows of w counters. Overestimate bound per probe
# is ~ e*n/w per row, min over d rows; with fixed data + fixed hashes the
# whole sketch (and thus every estimate) is deterministic, so the oracle
# replays it bit-for-bit.
CM_DEPTH = 4
CM_WIDTH = 512
_PROBE_MOD = 17  # probe keys: user_id % 17 == 0 (deterministic split)


def _cm_bucket_spark(col: F.Column, depth: F.Column) -> F.Column:
    h = F.md5(F.concat(col.cast("string"), F.lit(":"), depth.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % CM_WIDTH


def _cm_bucket_duck(expr: str, depth: str) -> str:
    return (
        f"CAST(('0x' || substring(md5(CAST({expr} AS VARCHAR) || ':' || "
        f"CAST({depth} AS VARCHAR)), 1, 8)) AS BIGINT) % {CM_WIDTH}"
    )


def _cm_oracle() -> str:
    depths = ", ".join(str(i) for i in range(CM_DEPTH))
    return f"""
    WITH depths AS (SELECT unnest([{depths}]) AS d),
    sk AS (
      SELECT d, {_cm_bucket_duck("user_id", "d")} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events CROSS JOIN depths
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT DISTINCT user_id FROM events WHERE user_id % {_PROBE_MOD} = 0
    ),
    est AS (
      SELECT p.user_id, MIN(sk.c) AS cm_estimate
      FROM probes p CROSS JOIN depths dd
      JOIN sk ON sk.d = dd.d
             AND sk.bucket = {_cm_bucket_duck("p.user_id", "dd.d")}
      GROUP BY p.user_id
    ),
    exact AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_freq
      FROM events WHERE user_id % {_PROBE_MOD} = 0 GROUP BY user_id
    )
    SELECT e.user_id, e.exact_freq, est.cm_estimate,
           est.cm_estimate >= e.exact_freq AS never_underestimates
    FROM exact e JOIN est ON e.user_id = est.user_id
    ORDER BY e.user_id
    """


@query("agg_count_min_checked", oracle=_cm_oracle())
def agg_count_min_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch as a RELATION: d=4 hash rows x w=512 counters,
    built with one partial-aggregable groupBy over (depth, bucket) — the
    mergeable-sketch pattern (build per day/partition, SUM-merge the
    (d, bucket, c) relations, never rescan), same posture as
    agg_hll_union_checked. Estimates probe the broadcast sketch (at most
    d*w rows regardless of data size) and take MIN over depths.

    The driver-checked contract is the CM structural guarantee —
    ``never_underestimates`` (counter sums can only overcount collisions)
    — plus the exact frequencies and the estimates themselves, which are
    deterministic given the fixed md5-derived bucket functions, so the
    oracle replays the identical sketch in DuckDB and the value hash
    pins every estimate, not just the boolean.

    Everything is JVM-side Catalyst (md5/conv/explode/groupBy/min); the
    probe side joins against the broadcast sketch so probing N keys
    costs a map-side lookup, not a shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    depth = F.explode(F.array(*[F.lit(i) for i in range(CM_DEPTH)])).alias("d")
    sk = (
        ev.select("user_id")
        .select("user_id", depth)
        .select("d", _cm_bucket_spark(F.col("user_id"), F.col("d")).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probed = ev.filter(F.col("user_id") % _PROBE_MOD == 0)
    probes = probed.select("user_id").distinct()
    est = (
        probes.select("user_id", depth)
        .withColumn("bucket", _cm_bucket_spark(F.col("user_id"), F.col("d")))
        .join(F.broadcast(sk), ["d", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("cm_estimate"))
    )
    exact = probed.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_freq"))
    return (
        exact.join(est, "user_id")
        .select(
            "user_id",
            "exact_freq",
            "cm_estimate",
            (F.col("cm_estimate") >= F.col("exact_freq")).alias(
                "never_underestimates"
            ),
        )
        .orderBy("user_id")
    )


@query(
    "agg_heavy_hitters_stream_parity",
    oracle=f"""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS freq,
           TRUE AS stream_equals_batch
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) * {HH_K} > (SELECT COUNT(*) FROM events)
    ORDER BY freq DESC, user_id ASC
    """,
)
def agg_heavy_hitters_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The heavy-hitters sketch as an UNBOUNDED-STREAM operator, driven
    end-to-end as driver evidence (the replay-parity pattern of
    video_motion_replay_parity / multimodal_audio_replay_parity): the
    events table is replayed as a multi-trigger file stream, a sharded
    Misra-Gries table rides keyed stream state
    (``applyInPandasWithState``; k entries per shard FOREVER — the state
    store never scales with key cardinality, unlike a native streaming
    count), per-trigger snapshots land in an append-mode parquet sink,
    and the final tables feed the same exact candidate recount as the
    batch operator. The result must equal the plain batch
    groupBy-HAVING bit-for-bit — micro-batch boundaries, state
    roundtrips through the store, and snapshot selection all sit inside
    the checked surface, and the ``stream_equals_batch`` anchor is
    computed as multiset equality via two directed ``exceptAll`` diffs
    (either direction surviving non-empty flips the anchor FALSE, which
    the oracle pins TRUE).

    Scale: the stream shuffles each event once (shard groupBy); state is
    n_shards * k longs; the recount joins a broadcast candidate set.
    Bounded collect: none on the data path (the comparison is a 1-row
    aggregate; results are <= distinct-heavy-user rows)."""
    import os
    import shutil
    import tempfile

    from distributed_video_analytics_flink_spark.streaming.heavy_hitters import (
        heavy_hitter_candidates_stream,
        latest_candidates,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id")
    root = tempfile.mkdtemp(prefix="dvafs-hhstream-")
    try:
        chunks = os.path.join(root, "chunks")
        # replay as 6 files / 2 per trigger -> 3 stateful triggers
        ev.repartition(6).write.parquet(chunks)
        snaps_path = os.path.join(root, "snapshots")
        stream = (
            spark.readStream.schema("user_id long")
            .option("maxFilesPerTrigger", 2)
            .parquet(chunks)
        )
        q = (
            heavy_hitter_candidates_stream(stream)
            .writeStream.format("parquet")
            .option("path", snaps_path)
            .option("checkpointLocation", os.path.join(root, "ck"))
            .start()
        )
        q.processAllAvailable()
        q.stop()

        cands = latest_candidates(spark.read.parquet(snaps_path))
        total = ev.agg(F.count(F.lit(1)).alias("n"))
        streamed = (
            ev.join(F.broadcast(cands), "user_id")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("freq"))
            .crossJoin(F.broadcast(total))
            .filter(F.col("freq") * HH_K > F.col("n"))
            .select("user_id", "freq")
        )
        batch = agg_heavy_hitters_checked(spark, sf_dir).select("user_id", "freq")
        # parity anchor: multiset equality via two directed anti-diffs.
        # (A full_outer join ON the compared columns coalesces them, so a
        # null-filter over the join keys can never fire — ADVICE r13.)
        same = (
            streamed.exceptAll(batch).count() == 0  # bounded: 1 scalar
            and batch.exceptAll(streamed).count() == 0  # bounded: 1 scalar
        )
        rows = streamed.collect()  # bounded: heavy hitters only
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [(r.user_id, r.freq, bool(same)) for r in rows],
        "user_id long, freq long, stream_equals_batch boolean",
    ).orderBy(F.desc("freq"), F.asc("user_id"))


def _cm_stream_oracle() -> str:
    base = _cm_oracle()
    return base.replace(
        "SELECT e.user_id, e.exact_freq, est.cm_estimate,",
        "SELECT e.user_id, e.exact_freq, est.cm_estimate,\n"
        "           TRUE AS stream_equals_batch,",
    )


@query("agg_count_min_stream_parity", oracle=_cm_stream_oracle())
def agg_count_min_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Count-Min sketch maintained by NATIVE streaming aggregation —
    the complement of the MG stream leg: where per-key streaming counts
    need unbounded state (hence the MG sketch rides custom state), the
    CM sketch's state is d*w counter rows BY CONSTRUCTION, so Spark's
    own streaming groupBy in complete mode is the right tool — no
    custom stateful operator, and the at-rest sketch is SUM-mergeable
    with any batch-built sketch of other data (same mergeable relation
    as the batch query).

    The events table replays as a multi-trigger file stream; each
    trigger folds its rows into the (d, bucket) counters through the
    state store; the final sketch must equal the batch-built sketch
    EXACTLY (count sums are associative across micro-batches), so the
    probe estimates and the never-underestimates contract are checked
    against the same oracle as the batch query, plus a two-way
    ``exceptAll`` parity anchor over the full (d, bucket, c) counter
    relation — non-probed buckets included.

    Scale: the streaming state is exactly d*w rows forever; one shuffle
    per trigger (the groupBy), partial-aggregated map-side. Bounded
    collect: the comparison scalar and <= |probes| result rows."""
    import os
    import shutil
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events").select("user_id")
    root = tempfile.mkdtemp(prefix="dvafs-cmstream-")
    table = "cm_stream_" + uuid.uuid4().hex[:8]
    depth = F.explode(F.array(*[F.lit(i) for i in range(CM_DEPTH)])).alias("d")
    try:
        chunks = os.path.join(root, "chunks")
        ev.repartition(6).write.parquet(chunks)
        stream = (
            spark.readStream.schema("user_id long")
            .option("maxFilesPerTrigger", 2)
            .parquet(chunks)
        )
        sk_stream = (
            stream.select("user_id", depth)
            .select(
                "d", _cm_bucket_spark(F.col("user_id"), F.col("d")).alias("bucket")
            )
            .groupBy("d", "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        q = (
            sk_stream.writeStream.outputMode("complete")
            .format("memory")
            .queryName(table)
            .option("checkpointLocation", os.path.join(root, "ck"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        streamed_sk = spark.table(table).localCheckpoint()  # d*w rows, bounded

        batch_sk = (
            ev.select("user_id", depth)
            .select(
                "d", _cm_bucket_spark(F.col("user_id"), F.col("d")).alias("bucket")
            )
            .groupBy("d", "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # parity anchor: sketch equality via two directed anti-diffs over
        # the full (d, bucket, c) relation — EVERY counter row is compared,
        # not only probed buckets. (A full_outer join ON the compared
        # columns coalesces them, so a null-filter over the join keys can
        # never fire — ADVICE r13.)
        st = streamed_sk.select("d", "bucket", "c")
        bt = batch_sk.select("d", "bucket", "c")
        same = (
            st.exceptAll(bt).count() == 0  # bounded scalar
            and bt.exceptAll(st).count() == 0  # bounded scalar
        )

        probed = ev.filter(F.col("user_id") % _PROBE_MOD == 0)
        probes = probed.select("user_id").distinct()
        est = (
            probes.select("user_id", depth)
            .withColumn("bucket", _cm_bucket_spark(F.col("user_id"), F.col("d")))
            .join(F.broadcast(streamed_sk), ["d", "bucket"])
            .groupBy("user_id")
            .agg(F.min("c").alias("cm_estimate"))
        )
        exact = probed.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_freq"))
        rows = (
            exact.join(est, "user_id")
            .select("user_id", "exact_freq", "cm_estimate")
            .collect()  # bounded: <= distinct probed users
        )
    finally:
        spark.catalog.dropTempView(table)
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (r.user_id, r.exact_freq, r.cm_estimate, bool(same),
             r.cm_estimate >= r.exact_freq)
            for r in rows
        ],
        "user_id long, exact_freq long, cm_estimate long,"
        " stream_equals_batch boolean, never_underestimates boolean",
    ).orderBy("user_id")


@query(
    "agg_heavy_hitters_skewed_checked",
    oracle=f"""
    WITH sk AS (
      SELECT CASE WHEN event_id % 48 < 3
                  THEN 9000000 + event_id % 48
                  ELSE user_id END AS user_id
      FROM events
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS freq,
           user_id >= 9000000 AS injected
    FROM sk
    GROUP BY user_id
    HAVING COUNT(*) * {HH_K} > (SELECT COUNT(*) FROM sk)
    ORDER BY freq DESC, user_id ASC
    """,
)
def agg_heavy_hitters_skewed_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg_heavy_hitters_checked on a GUARANTEED-skewed key column
    (VERDICT r13 #8): the synthetic events table's per-user frequencies
    thin toward the 1/128 threshold as SF grows, so the plain variant's
    membership can legitimately approach empty — a contract that never
    degenerates needs keys that clear the threshold BY CONSTRUCTION.
    The fixture skew is derived deterministically from event_id (the
    salted-join fixture pattern): rows with ``event_id % 48 < 3`` remap
    to one of three injected keys 9000000..9000002, so each injected
    key carries ~n/48 of the stream (2.08% >> phi = 1/128 = 0.78%) at
    EVERY scale factor — the result always holds >= 3 heavy hitters,
    flagged by the ``injected`` column the oracle pins.

    Plan: identical two-phase Misra-Gries shape as the plain variant
    (per-partition k-counter sketch over the DERIVED key -> candidate
    superset by pigeonhole -> broadcast recount with integer
    cross-multiplied threshold); the remap is a Catalyst projection
    inside the scan stage, so the sketch phase sees the skewed
    distribution exactly as a real boilerplate-dominated corpus would
    present it. Scale: unchanged from the plain variant — phase-1
    shuffle bounded by k * n_partitions candidates regardless of key
    cardinality; the injected keys are precisely the hot keys MG is
    built to survive."""
    ev = load_table(spark, sf_dir, "events")
    skewed = ev.select(
        F.when(
            F.col("event_id") % 48 < 3,
            F.lit(9_000_000) + F.col("event_id") % 48,
        )
        .otherwise(F.col("user_id"))
        .alias("user_id")
    )

    def _mg(batches):
        import pandas as pd

        yield pd.DataFrame(
            {
                "user_id": pd.Series(
                    misra_gries_batches(batches, "user_id"), dtype="int64"
                )
            }
        )

    cands = (
        skewed.mapInPandas(
            _mg, T.StructType([T.StructField("user_id", T.LongType())])
        ).distinct()
    )
    total = skewed.agg(F.count(F.lit(1)).alias("n"))
    freqs = (
        skewed.join(F.broadcast(cands), "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        freqs.crossJoin(F.broadcast(total))
        .filter(F.col("freq") * HH_K > F.col("n"))
        .select(
            "user_id",
            "freq",
            (F.col("user_id") >= 9_000_000).alias("injected"),
        )
        .orderBy(F.desc("freq"), F.asc("user_id"))
    )
