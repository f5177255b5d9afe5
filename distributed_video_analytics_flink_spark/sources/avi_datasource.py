"""Spark 4 Python Data Source for raw-DIB AVI video
(``spark.read.format("avi")``) — the AVI twin of
``sources/y4m_datasource.py``, sharing its scale posture through
``sources/frame_datasource.py``: one InputPartition per FILE, decode on
the scheduled partition, wire-frame rows (schemas.FRAME_SCHEMA) that
feed ``detect_motion_batch`` unchanged.

    spark.dataSource.register(AviDataSource)
    frames = spark.read.format("avi").load("/data/cams")

The reference's OpenCV file scan (VideoEventCreator.java:54-96) is the
behavioral model; the decoder is the pure offset-math RIFF walk in
``sources/avi.py``."""

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


class AviReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")
        self._max_frames = int(options.get("maxframesperfile", 64))

    def partitions(self):
        return file_partitions(self._path, "avi")

    def read(self, partition: FilePartition):
        from distributed_video_analytics_flink_spark.sources.avi import (
            AviError,
            decode_avi,
        )

        yield from wire_frame_rows(
            partition.path,
            permissive_header(
                lambda data, mf: decode_avi(data, max_frames=mf), AviError
            ),
            self._max_frames,
        )


class AviDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "avi"

    def schema(self) -> str:
        return FRAME_DDL_SCHEMA

    def reader(self, schema) -> AviReader:
        return AviReader(self.options)

    def streamReader(self, schema) -> FrameStreamReader:
        """spark.readStream.format("avi").load(dir): micro-batch over a
        growing directory — one file per InputPartition per batch, same
        wire rows as the batch reader (see FrameStreamReader)."""
        from distributed_video_analytics_flink_spark.sources.avi import (
            AviError,
            decode_avi,
        )

        return FrameStreamReader(
            self.options,
            "avi",
            permissive_header(
                lambda data, mf: decode_avi(data, max_frames=mf), AviError
            ),
        )


def register_avi_source(spark) -> None:
    """Idempotent registration of the avi format on a session."""
    spark.dataSource.register(AviDataSource)
