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
decode-on-the-partition stance as read_video_files, COVERAGE.md S4).
The reference's OpenCV file scan (VideoEventCreator.java:54-96) is the
behavioral model."""

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


class _Y4MFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class Y4MReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("y4m source requires a path: .load('/dir/or/file')")
        self._max_frames = int(options.get("maxframesperfile", 64))

    def partitions(self):
        if os.path.isdir(self._path):
            files = sorted(_glob.glob(os.path.join(self._path, "*.y4m")))
        else:
            files = [self._path]
        return [_Y4MFilePartition(p) for p in files]

    def read(self, partition: _Y4MFilePartition):
        from distributed_video_analytics_flink_spark.sources.y4m import decode_y4m

        with open(partition.path, "rb") as f:
            data = f.read()
        cam = os.path.splitext(os.path.basename(partition.path))[0]
        _, frames = decode_y4m(data, max_frames=self._max_frames)
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


class Y4MDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "y4m"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> Y4MReader:
        return Y4MReader(self.options)


def register_y4m_source(spark) -> None:
    """Idempotent registration of the y4m format on a session."""
    spark.dataSource.register(Y4MDataSource)
