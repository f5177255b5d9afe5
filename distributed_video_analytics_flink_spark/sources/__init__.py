"""Source builders: batch parquet tables, video-file ingestion (binaryFile
scan + frame extraction), Kafka streams, test streams."""

from distributed_video_analytics_flink_spark.sources.tables import (  # noqa: F401
    load_table,
    load_tables,
    register_views,
)
from distributed_video_analytics_flink_spark.sources.video_files import (  # noqa: F401
    read_video_files,
)
