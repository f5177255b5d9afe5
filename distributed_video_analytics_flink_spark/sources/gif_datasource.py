"""Spark 4 Python Data Source for animated GIF
(``spark.read.format("gif")``) — the GIF twin of
``sources/y4m_datasource.py`` / ``avi_datasource.py``, sharing their
scale posture through ``sources/frame_datasource.py``: one InputPartition
per FILE, decode on the scheduled partition, wire-frame rows
(schemas.FRAME_SCHEMA) that feed ``detect_motion_batch`` unchanged.
Per-file decode is the right granularity for GIF specifically: frames
composite over prior-canvas state (sources/gif.py), so one file is the
smallest independently decodable unit — splitting below file level is
semantically impossible, not just unprofitable.

    spark.dataSource.register(GifDataSource)
    frames = spark.read.format("gif").load("/data/cams")

The adapter keeps ``read_video_files``'s PERMISSIVE stance at both edges:
a corrupt header yields zero rows for that file, a corrupt tail ends the
stream after the good prefix — a bad file never kills the task.

The reference's OpenCV file scan (VideoEventCreator.java:54-96, which
reads GIF through ffmpeg) is the behavioral model; the decoder is the
pure-stdlib LZW + compositing walk in ``sources/gif.py``."""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader

from distributed_video_analytics_flink_spark.sources.frame_datasource import (
    FRAME_DDL_SCHEMA,
    FilePartition,
    FrameStreamReader,
    file_partitions,
    wire_frame_rows,
)


def _decode_permissive(data: bytes, max_frames: int):
    """(header, frames) adapter — the strict-header/permissive-tail
    stance is the ONE shared implementation in gif.decode_gif_permissive
    (also used by video_files._decode_frames_gif), so the binaryFile and
    format('gif') paths cannot drift on which corrupt files kill tasks."""
    from distributed_video_analytics_flink_spark.sources.gif import (
        decode_gif_permissive,
    )

    return decode_gif_permissive(data, max_frames=max_frames)


class GifReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")
        self._max_frames = int(options.get("maxframesperfile", 64))

    def partitions(self):
        return file_partitions(self._path, "gif")

    def read(self, partition: FilePartition):
        yield from wire_frame_rows(
            partition.path, _decode_permissive, self._max_frames
        )


class GifDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "gif"

    def schema(self) -> str:
        return FRAME_DDL_SCHEMA

    def reader(self, schema) -> GifReader:
        return GifReader(self.options)

    def streamReader(self, schema) -> FrameStreamReader:
        """spark.readStream.format("gif").load(dir): micro-batch over a
        growing directory — one file per InputPartition per batch, same
        wire rows as the batch reader (see FrameStreamReader)."""
        return FrameStreamReader(self.options, "gif", _decode_permissive)


def register_gif_source(spark) -> None:
    """Idempotent registration of the gif format on a session."""
    spark.dataSource.register(GifDataSource)
