"""Spark 4 Python Data Source for raw-DIB AVI video
(``spark.read.format("avi")``) — the AVI twin of
``sources/y4m_datasource.py``, sharing its scale posture: one
InputPartition per FILE, decode on the scheduled partition, wire-frame
rows (schemas.FRAME_SCHEMA) that feed ``detect_motion_batch`` unchanged.

    spark.dataSource.register(AviDataSource)
    frames = spark.read.format("avi").load("/data/cams")

The reference's OpenCV file scan (VideoEventCreator.java:54-96) is the
behavioral model; the decoder is the pure offset-math RIFF walk in
``sources/avi.py``."""

from __future__ import annotations

import base64
import datetime as _dt
import glob as _glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from distributed_video_analytics_flink_spark.sources.video_files import (
    _EPOCH_US,
    FRAME_INTERVAL_MS,
)

_SCHEMA = (
    "camId string, timestamp timestamp, rows int, cols int, type int, data string"
)


class _AviFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class AviReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("avi source requires a path: .load('/dir/or/file')")
        self._max_frames = int(options.get("maxframesperfile", 64))

    def partitions(self):
        if os.path.isdir(self._path):
            files = sorted(_glob.glob(os.path.join(self._path, "*.avi")))
        else:
            files = [self._path]
        return [_AviFilePartition(p) for p in files]

    def read(self, partition: _AviFilePartition):
        from distributed_video_analytics_flink_spark.sources.avi import decode_avi

        with open(partition.path, "rb") as f:
            data = f.read()
        cam = os.path.splitext(os.path.basename(partition.path))[0]
        _, frames = decode_avi(data, max_frames=self._max_frames)
        for i, bgr in enumerate(frames):
            ts_us = _EPOCH_US + i * FRAME_INTERVAL_MS * 1000
            yield (
                cam,
                _dt.datetime.fromtimestamp(ts_us / 1e6, tz=_dt.timezone.utc).replace(
                    tzinfo=None
                ),
                int(bgr.shape[0]),
                int(bgr.shape[1]),
                16,
                base64.b64encode(bgr.tobytes()).decode("ascii"),
            )


class AviDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "avi"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> AviReader:
        return AviReader(self.options)


def register_avi_source(spark) -> None:
    """Idempotent registration of the avi format on a session."""
    spark.dataSource.register(AviDataSource)
