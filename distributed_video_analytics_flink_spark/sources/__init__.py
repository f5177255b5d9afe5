"""Source builders: batch parquet tables, Kafka streams, test streams."""

from distributed_video_analytics_flink_spark.sources.tables import (  # noqa: F401
    load_table,
    load_tables,
    register_views,
)
