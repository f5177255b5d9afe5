"""Structured Streaming surface (SURVEY.md §7.3 P3): sources (Kafka
pattern-subscribe, file replay, rate), the stateful motion operator
(applyInPandasWithState), windowed FPS aggregation, and sinks (partitioned
Parquet results table, PNG side-output, Kafka)."""

from distributed_video_analytics_flink_spark.streaming.corpus import (
    maintain_incremental_pairs,
    prepare_corpus_stream,
    stream_curated_corpus,
    stream_incremental_pairs,
    stream_web_pipeline,
    web_pipeline_accounting,
)
from distributed_video_analytics_flink_spark.streaming.fps import camera_fps
from distributed_video_analytics_flink_spark.streaming.joins import (
    dedup_frames_stream,
    enrich_with_cameras,
    interval_join_streams,
)
from distributed_video_analytics_flink_spark.streaming.motion import detect_motion_stream
from distributed_video_analytics_flink_spark.streaming.sinks import (
    build_processing_results,
    kafka_frame_sink,
    png_side_output,
    write_results_batch,
    write_results_stream,
)
from distributed_video_analytics_flink_spark.streaming.sources import (
    file_frame_stream,
    kafka_frame_stream,
    parse_frames,
    rate_frame_stream,
)

__all__ = [
    "camera_fps",
    "dedup_frames_stream",
    "detect_motion_stream",
    "enrich_with_cameras",
    "interval_join_streams",
    "build_processing_results",
    "kafka_frame_sink",
    "png_side_output",
    "write_results_batch",
    "write_results_stream",
    "file_frame_stream",
    "kafka_frame_stream",
    "parse_frames",
    "maintain_incremental_pairs",
    "prepare_corpus_stream",
    "rate_frame_stream",
    "stream_curated_corpus",
    "stream_incremental_pairs",
    "stream_web_pipeline",
    "web_pipeline_accounting",
]
