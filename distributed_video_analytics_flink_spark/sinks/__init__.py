"""Batch sinks — the output side of the training-data pipeline."""

from distributed_video_analytics_flink_spark.sinks.corpus import (  # noqa: F401
    read_curated_corpus,
    read_manifest,
    write_curated_corpus,
)
