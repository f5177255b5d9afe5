"""distributed_video_analytics_flink_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``artmkchmv/distributed-video-analytics-flink`` (a Kafka -> Flink ->
Cassandra video/motion-detection pipeline; see SURVEY.md), re-expressed
idiomatically on Spark DataFrame / SQL / Catalyst / Structured Streaming:

- ``session``    — SparkSession factory with pinned confs (UTC, AQE, Arrow).
- ``schemas``    — fixed StructType schemas (frame stream, results table,
                   testdata star schema).
- ``sources``    — batch/stream source builders (parquet tables, Kafka
                   pattern-subscribe, rate/memory test sources).
- ``operators``  — the query surface: relational core (joins, aggregations,
                   window functions, set ops), the video-pipeline operators,
                   and training-data extensions (dedup, similarity search,
                   text analysis, multimodal columns).
- ``functions``  — scalar/vectorized function library (numpy motion detection,
                   portable hashing, tokenization).
- ``streaming``  — stateful streaming operators (per-camera motion state,
                   FPS windows, foreachBatch sinks, checkpointing).
- ``plans``      — plan-inspection helpers (pushdown/broadcast assertions).

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable behavior.
"""

__version__ = "0.1.0"
