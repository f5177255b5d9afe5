"""Spark 4 Python Data Source for Y4M video (``spark.read.format("y4m")``).

SPARK-44076's Python Data Source API lets the pure-stdlib Y4M decoder
(sources/y4m.py) plug into the reader surface itself, so video ingestion is
a first-class format instead of a binaryFile+mapInPandas recipe:

    spark.dataSource.register(Y4MDataSource)
    frames = spark.read.format("y4m").load("/data/cams")

Rows come out in the engine's wire-frame schema (camId/timestamp/rows/
cols/type/base64 data — schemas.FRAME_SCHEMA), so the result feeds
``detect_motion_batch`` unchanged.

Scale posture: one InputPartition per FILE — decode executes where Spark
schedules the partition, frames never ship compressed through a shuffle to
a decode stage, and a directory of N files reads N-way parallel (the same
decode-on-the-partition stance as read_video_files, COVERAGE.md S4); the
partition/row machinery is shared with the AVI format
(``sources/frame_datasource.py``). The reference's OpenCV file scan
(VideoEventCreator.java:54-96) is the behavioral model."""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader

from distributed_video_analytics_flink_spark.sources.frame_datasource import (
    FRAME_DDL_SCHEMA,
    FilePartition,
    FrameStreamReader,
    file_partitions,
    permissive_header,
    wire_frame_rows,
)


class Y4MReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")
        self._max_frames = int(options.get("maxframesperfile", 64))

    def partitions(self):
        return file_partitions(self._path, "y4m")

    def read(self, partition: FilePartition):
        from distributed_video_analytics_flink_spark.sources.y4m import (
            Y4MError,
            decode_y4m,
        )

        yield from wire_frame_rows(
            partition.path,
            permissive_header(
                lambda data, mf: decode_y4m(data, max_frames=mf), Y4MError
            ),
            self._max_frames,
        )


class Y4MDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "y4m"

    def schema(self) -> str:
        return FRAME_DDL_SCHEMA

    def reader(self, schema) -> Y4MReader:
        return Y4MReader(self.options)

    def streamReader(self, schema) -> FrameStreamReader:
        """spark.readStream.format("y4m").load(dir): micro-batch over a
        growing directory — one file per InputPartition per batch, same
        wire rows as the batch reader (see FrameStreamReader)."""
        from distributed_video_analytics_flink_spark.sources.y4m import (
            Y4MError,
            decode_y4m,
        )

        return FrameStreamReader(
            self.options,
            "y4m",
            permissive_header(
                lambda data, mf: decode_y4m(data, max_frames=mf), Y4MError
            ),
        )


def register_y4m_source(spark) -> None:
    """Idempotent registration of the y4m format on a session."""
    spark.dataSource.register(Y4MDataSource)
