"""Spark 4 Python Data Source for animated PNG
(``spark.read.format("apng")``) — the APNG twin of
``sources/gif_datasource.py``, sharing the per-file machinery in
``sources/frame_datasource.py``: one InputPartition per FILE, decode on
the scheduled partition, wire-frame rows (FRAME_SCHEMA) that feed
``detect_motion_batch`` unchanged. Per-file decode is the right
granularity for APNG exactly as for GIF: frames composite over
prior-canvas state via fcTL dispose/blend ops (sources/apng.py), so one
file is the smallest independently decodable unit — splitting below file
level is semantically impossible, not just unprofitable.

    spark.dataSource.register(ApngDataSource)
    frames = spark.read.format("apng").load("/data/cams")

The adapter keeps ``read_video_files``'s PERMISSIVE stance at both
edges: a corrupt header (or a plain still PNG, which is NOT an
animation) yields zero rows for that file, a corrupt tail ends the
stream after the good prefix — a bad file never kills the task.

The reference's OpenCV file scan (VideoEventCreator.java:54-96, which
reads APNG through ffmpeg) is the behavioral model; the decoder is the
pure-stdlib acTL/fcTL/fdAT compositing walk in ``sources/apng.py``."""

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
    stance is the ONE shared implementation in
    apng.decode_apng_permissive (also used by
    video_files._decode_frames_apng), so the binaryFile and
    format('apng') paths cannot drift on which corrupt files kill
    tasks."""
    from distributed_video_analytics_flink_spark.sources.apng import (
        decode_apng_permissive,
    )

    return decode_apng_permissive(data, max_frames=max_frames)


class ApngReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")
        self._max_frames = int(options.get("maxframesperfile", 64))

    def partitions(self):
        return file_partitions(self._path, "apng")

    def read(self, partition: FilePartition):
        yield from wire_frame_rows(
            partition.path, _decode_permissive, self._max_frames
        )


class ApngDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "apng"

    def schema(self) -> str:
        return FRAME_DDL_SCHEMA

    def reader(self, schema) -> ApngReader:
        return ApngReader(self.options)

    def streamReader(self, schema) -> FrameStreamReader:
        """spark.readStream.format("apng").load(dir): micro-batch over a
        growing directory — one file per InputPartition per batch, same
        wire rows as the batch reader (see FrameStreamReader)."""
        return FrameStreamReader(self.options, "apng", _decode_permissive)


def register_apng_source(spark) -> None:
    """Idempotent registration of the apng format on a session."""
    spark.dataSource.register(ApngDataSource)
