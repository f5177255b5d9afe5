"""Streaming corpus ingest — the streaming twin of the batch curation
write path (operators/curation.py -> sinks/corpus.py): documents arrive
continuously (a crawl, an upload queue), get watermark-bounded
content-fingerprint dedup, and land append-only in the same
language-partitioned layout the batch sink writes.

Scale contract: dedup state is keyed by md5 fingerprint and bounded by
the watermark horizon (state = fingerprints within the horizon, not all
history — the same bounded-state stance as dedup_frames_stream);
re-crawled duplicates inside the horizon are dropped exactly once per
content. The sink appends per micro-batch under ``partitionBy(lang)``,
so downstream per-language reads stay partition-pruned while ingest
runs. Exactly-once lands on the checkpoint + idempotent-append contract
every other sink here uses (streaming/sinks.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def prepare_corpus_stream(docs: DataFrame) -> DataFrame:
    """Attach the content fingerprint (md5 of the body — the same digest
    the batch dedup operators key on) to a streaming documents frame."""
    return docs.withColumn("fingerprint", F.md5(F.col("text")))


def stream_curated_corpus(
    docs: DataFrame,
    path: str,
    checkpoint: str,
    dedup_within: str = "10 minutes",
    ts_col: str = "ingest_ts",
) -> StreamingQuery:
    """Start the ingest: fingerprint dedup within the watermark horizon,
    then append to the language-partitioned corpus via foreachBatch.
    ``docs`` must carry ``text``, ``lang``, and an event-time ``ts_col``."""
    deduped = (
        prepare_corpus_stream(docs)
        .withWatermark(ts_col, dedup_within)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )

    def _append(batch_df: DataFrame, _batch_id: int) -> None:
        (
            batch_df.drop(ts_col, "fingerprint")
            .write.mode("append")
            .partitionBy("lang")
            .parquet(f"{path}/corpus")
        )

    return (
        deduped.writeStream.foreachBatch(_append)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .start()
    )
