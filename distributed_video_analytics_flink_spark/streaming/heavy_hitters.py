"""Streaming heavy hitters: a sharded Misra-Gries sketch held in keyed
stream state (``applyInPandasWithState``), the unbounded-stream twin of
operators/sketches.agg_heavy_hitters_checked's phase 1.

Why a sketch and not a native streaming groupBy-count: Spark's streaming
aggregation keeps ONE state row per distinct key — at billions of keys
the state store IS the scale problem. The MG table is k entries per
shard, FIXED, no matter how many distinct keys flow through; the exact
frequencies are recovered afterwards by a bounded batch recount of the
candidates only (same two-phase shape as the batch operator).

Guarantee carried across the stream: hash-sharding sends EVERY
occurrence of a key to one shard, so a key with global frequency
> n/k has shard frequency > n_shard/k >= its MG survival threshold
n_shard/(k+1) — the final per-shard tables are a SUPERSET of the true
heavy hitters regardless of shard skew (n_shard <= n always). MG folded
batch-by-batch through state is exactly MG over the concatenated shard
substream, so arbitrary micro-batch boundaries cannot break it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

from distributed_video_analytics_flink_spark.operators.sketches import HH_K

SNAPSHOT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("user_id", T.LongType()),
    ]
)

# MG table as parallel arrays + a snapshot sequence number (monotone per
# shard; the latest snapshot is the final table).
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("seq", T.LongType()),
    ]
)


def _fold_shard(key, pdfs, state, k: int):
    import pandas as pd

    shard = int(key[0])
    if state.exists:
        keys, counts, seq = state.get
        table = dict(zip(keys, counts))
    else:
        table, seq = {}, 0
    for pdf in pdfs:
        for item, c in pdf["user_id"].value_counts().items():
            if item in table:
                table[item] += int(c)
            else:
                table[item] = int(c)
                if len(table) > k:
                    d = min(table.values())
                    table = {i: v - d for i, v in table.items() if v > d}
    seq += 1
    state.update((list(table.keys()), list(table.values()), seq))
    yield pd.DataFrame(
        {
            "shard": pd.Series([shard] * len(table), dtype="int64"),
            "seq": pd.Series([seq] * len(table), dtype="int64"),
            "user_id": pd.Series(list(table.keys()), dtype="int64"),
        }
    )


def heavy_hitter_candidates_stream(
    keyed: DataFrame, n_shards: int = 8, k: int = HH_K
) -> DataFrame:
    """Streaming MG candidate tracker over an unbounded DataFrame with a
    long ``user_id`` column. Emits an append-mode SNAPSHOT of each
    shard's k-entry table after every trigger that touched the shard;
    the final table is the max-``seq`` snapshot per shard (a shard's
    state only changes when rows arrive, so its last emission IS its
    final state). One shuffle: the groupBy on shard."""

    def fold(key, pdfs, state):
        yield from _fold_shard(key, pdfs, state, k)

    return (
        keyed.withColumn("shard", F.col("user_id") % n_shards)
        .groupBy("shard")
        .applyInPandasWithState(
            fold,
            SNAPSHOT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def latest_candidates(snapshots: DataFrame) -> DataFrame:
    """Final candidate set from an at-rest snapshot table: rows of the
    max-seq snapshot per shard."""
    last = snapshots.groupBy("shard").agg(F.max("seq").alias("seq"))
    return snapshots.join(last, ["shard", "seq"]).select("user_id").distinct()
