"""Shared machinery for the per-file video Data Sources (y4m, avi).

Both formats expose the same surface — one InputPartition per file,
decode on the scheduled partition, wire-frame rows (FRAME_SCHEMA) — and
differ only in extension and decoder. This module holds the single copy
of the partition listing and the frame-row emission (camId from the file
stem, timestamps paced FRAME_INTERVAL_MS from the deterministic epoch),
so a timestamp or schema fix lands once for every container format.
"""

from __future__ import annotations

import base64
import datetime as _dt
import glob as _glob
import os
from collections.abc import Callable, Iterator

from pyspark.sql.datasource import DataSourceStreamReader, InputPartition

from distributed_video_analytics_flink_spark.sources.video_files import (
    _EPOCH_US,
    FRAME_INTERVAL_MS,
)

FRAME_DDL_SCHEMA = (
    "camId string, timestamp timestamp, rows int, cols int, type int, data string"
)


class FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def file_partitions(path: str | None, ext: str) -> list[FilePartition]:
    """One InputPartition per file — a directory lists ``*.{ext}``, a
    single file is itself the one partition."""
    if not path:
        raise ValueError(f"{ext} source requires a path: .load('/dir/or/file')")
    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, f"*.{ext}")))
        if not files:
            # a typo'd directory must fail loudly at planning time, not
            # yield a silently-empty DataFrame (ADVICE r6)
            raise ValueError(f"no *.{ext} files under directory {path!r}")
    else:
        if not os.path.isfile(path):
            raise ValueError(f"{ext} source path does not exist: {path!r}")
        files = [path]
    return [FilePartition(p) for p in files]


class FrameStreamReader(DataSourceStreamReader):
    """Micro-batch stream over a growing directory of video files — the
    Structured-Streaming leg of the per-file Data Sources (the engine's
    file-replay analog of the reference's continuous Kafka frame ingest).

    Offset model: ``{"n": <files consumed>}`` against the directory's
    SORTED listing. Contract: the directory is append-only with
    lexicographically increasing names (camera dumps — ``cam-<ts>.avi``
    — satisfy this); a file inserted before already-consumed names is
    not picked up. Each file becomes one InputPartition, decoded on the
    executor exactly like the batch reader, so batch and stream emit
    byte-identical wire rows for the same file. An empty directory is a
    legal stream start (files arrive later), unlike the batch reader's
    planning-time error."""

    def __init__(self, options: dict, ext: str, decode: Callable):
        self._path = options.get("path")
        self._ext = ext
        self._decode = decode
        self._max_frames = int(options.get("maxframesperfile", 64))
        if not self._path:
            raise ValueError(f"{ext} stream requires a path: .load('/dir')")

    def _listing(self) -> list[str]:
        if os.path.isdir(self._path):
            return sorted(_glob.glob(os.path.join(self._path, f"*.{self._ext}")))
        if os.path.isfile(self._path):
            return [self._path]
        raise ValueError(f"{self._ext} stream path does not exist: {self._path!r}")

    def initialOffset(self) -> dict:
        return {"n": 0}

    def latestOffset(self) -> dict:
        # NO trigger pacing on purpose (r16 review): a maxFilesPerTrigger
        # analog needs admission control — latestOffset(start, limit) — so
        # a restarted query's first announcement can be floored at the
        # committed offset. The Python stream API exposes plain
        # latestOffset() only, and a fresh reader announcing LESS than the
        # committed offset makes Spark commit the regression and replay
        # already-consumed files. Tests that need multi-batch delivery
        # append files between processAllAvailable calls instead (the
        # directory contract this source is built for).
        return {"n": len(self._listing())}

    def partitions(self, start: dict, end: dict):
        return [FilePartition(p) for p in self._listing()[start["n"] : end["n"]]]

    def read(self, partition: FilePartition):
        yield from wire_frame_rows(partition.path, self._decode, self._max_frames)

    def commit(self, end: dict) -> None:
        pass  # offsets are positions in a durable listing: nothing to clean

    def stop(self) -> None:
        pass


def permissive_header(
    decode: Callable[[bytes, int], tuple], err: type[Exception]
) -> Callable[[bytes, int], tuple]:
    """Wrap a ``(data, max_frames) -> (header, frames)`` decoder so a
    file whose header fails to parse contributes ZERO rows instead of
    killing the task — the same PERMISSIVE stance as read_video_files'
    dispatch, where each branch guards its format error (r10 review
    follow-up: one corrupt .y4m in a directory previously failed the
    whole ``format("y4m")`` scan, while the binaryFile path tolerated
    it). ``err`` stays format-specific on purpose: catching ValueError
    broadly here would also mask genuine decoder bugs."""

    def _wrapped(data: bytes, max_frames: int):
        try:
            return decode(data, max_frames)
        except err:
            return None, iter(())

    return _wrapped


def wire_frame_rows(
    path: str,
    decode: Callable[[bytes, int | None], tuple],
    max_frames: int,
) -> Iterator[tuple]:
    """Decode one file into wire-format frame tuples (FRAME_SCHEMA order).
    ``decode(data, max_frames) -> (header, iterator of (H, W, 3) BGR)`` —
    the signature both decode_y4m and decode_avi share."""
    with open(path, "rb") as f:
        data = f.read()
    cam = os.path.splitext(os.path.basename(path))[0]
    _, frames = decode(data, max_frames)
    for i, bgr in enumerate(frames):
        ts_us = _EPOCH_US + i * FRAME_INTERVAL_MS * 1000
        yield (
            cam,
            _dt.datetime.fromtimestamp(ts_us / 1e6, tz=_dt.timezone.utc).replace(
                tzinfo=None
            ),
            int(bgr.shape[0]),
            int(bgr.shape[1]),
            16,  # CV_8UC3
            base64.b64encode(bgr.tobytes()).decode("ascii"),
        )
