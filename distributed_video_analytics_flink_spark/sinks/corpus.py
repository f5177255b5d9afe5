"""Curated-corpus sink: the write path at the end of the curation
pipeline (dedup -> quality gate -> rebalance -> HERE), laid out so the
downstream trainer's reads prune instead of scan.

Layout contract (the documents analog of the video results table's
(camera_id, day) layout, streaming/sinks.py:84):

- ``partitionBy(lang)`` — language is the universal downstream filter
  (per-language tokenizers, per-language mixing weights), so it becomes
  the directory key and per-language reads are partition-pruned scans.
- Within each language, files are written from a ``repartition(n, doc_id)``
  + ``sortWithinPartitions("doc_id")`` stage: deterministic file contents
  at any parallelism, doc_id-clustered row groups (parquet min/max stats
  make doc_id range probes skip row groups), and a knob (``files_per_lang``)
  to keep file counts sane — a 100 TB corpus write's failure mode is a
  million tiny files, not slow tasks.
- A ``_manifest`` directory (parquet, one row per language: doc count,
  token sum) written from the same DataFrame — the cheap accounting a
  trainer checks before launching a job; reading it never touches the
  corpus files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_curated_corpus(
    docs: DataFrame, path: str, files_per_lang: int = 8
) -> None:
    """Write a curated documents DataFrame (must carry ``doc_id`` and
    ``lang``) partitioned by language, doc_id-clustered within files,
    plus the per-language manifest."""
    (
        docs.repartition(files_per_lang, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(f"{path}/corpus")
    )
    manifest = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("ws_tokens")
        if "text" in docs.columns
        else F.lit(None).cast("long").alias("ws_tokens"),
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")


def read_curated_corpus(
    spark: SparkSession, path: str, lang: str | None = None
) -> DataFrame:
    """Read the corpus back; a ``lang`` filter is a partition-pruned scan
    (the pruning is plan-asserted in tests/test_corpus_sink.py)."""
    df = spark.read.parquet(f"{path}/corpus")
    return df.filter(F.col("lang") == lang) if lang else df


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Per-language accounting without touching corpus files."""
    return spark.read.parquet(f"{path}/_manifest")
