"""Spark 4 Python Data Source for compressed-passthrough video ingest
(``spark.read.format("videochunks")`` / ``spark.readStream.format(
"videochunks")``) — the chunk-schema sibling of the y4m/avi frame
sources, built for the r9 shuffle posture: MJPEG AVI/MP4 files are
demuxed by pure offset math on the scan partition and emitted as
still-encoded ``chunk`` rows (CHUNK schema), so the downstream motion
keyBy exchange carries ~40 KB JPEG payloads instead of ~921 KB decoded
BGR; the entropy decode runs post-shuffle inside the motion fold
(operators/video.py / streaming/motion.py — one shared decoder).

Non-MJPEG containers (raw-DIB AVI, Y4M) fall back to source-side decode
and flow through the same schema as codec='raw-bgr', so one format
string covers a mixed camera corpus, batch and streaming alike:

    spark.dataSource.register(VideoChunksDataSource)
    chunks = spark.read.format("videochunks").load("/data/cams")
    live   = spark.readStream.format("videochunks").load("/data/cams")

The reference's OpenCV file scan (VideoEventCreator.java:54-96) is the
behavioral model; row content is byte-identical to
``read_video_chunks`` on the same files (shared
``sources/video_files.py::iter_chunk_rows``)."""

from __future__ import annotations

import datetime as _dt
import glob as _glob
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader

from distributed_video_analytics_flink_spark.sources.frame_datasource import (
    FilePartition,
    FrameStreamReader,
)

# ONE schema string by design (r14 review): format("videochunks") rows
# and read_video_chunks rows must never drift — the shared iter_chunk_rows
# exists for exactly that, and the schema rides along with it.
from distributed_video_analytics_flink_spark.sources.video_files import (
    CHUNK_SCHEMA as CHUNK_DDL_SCHEMA,
)
_EXTS = ("avi", "mp4", "y4m", "gif", "apng")


def _chunk_listing(path: str | None, require: bool) -> list[str]:
    """Sorted multi-extension listing. ``require`` distinguishes the batch
    reader (typo'd empty dir must fail loudly at planning time) from the
    stream reader (empty dir is a legal stream start)."""
    if not path:
        raise ValueError("videochunks source requires a path: .load('/dir')")
    if os.path.isdir(path):
        files = sorted(
            f
            for ext in _EXTS
            for f in _glob.glob(os.path.join(path, f"*.{ext}"))
        )
        if not files and require:
            raise ValueError(f"no video files under directory {path!r}")
        return files
    if os.path.isfile(path):
        return [path]
    if require:
        raise ValueError(f"videochunks source path does not exist: {path!r}")
    raise ValueError(f"videochunks stream path does not exist: {path!r}")


def _chunk_rows(path: str, rows: int, cols: int, max_frames: int) -> Iterator[tuple]:
    from distributed_video_analytics_flink_spark.sources.video_files import (
        iter_chunk_rows,
    )

    with open(path, "rb") as f:
        data = f.read()
    cam = os.path.splitext(os.path.basename(path))[0]
    for r in iter_chunk_rows(data, cam, rows, cols, max_frames):
        ts = _dt.datetime.fromtimestamp(r[1] / 1e6, tz=_dt.timezone.utc).replace(
            tzinfo=None
        )
        yield (r[0], ts) + r[2:]


class _ChunkOptions:
    def __init__(self, options: dict):
        self.path = options.get("path")
        self.rows = int(options.get("rows", 480))
        self.cols = int(options.get("cols", 640))
        self.max_frames = int(options.get("maxframesperfile", 64))


class VideoChunksReader(DataSourceReader):
    def __init__(self, options: dict):
        self._o = _ChunkOptions(options)

    def partitions(self):
        return [FilePartition(p) for p in _chunk_listing(self._o.path, require=True)]

    def read(self, partition: FilePartition):
        yield from _chunk_rows(
            partition.path, self._o.rows, self._o.cols, self._o.max_frames
        )


class ChunkStreamReader(FrameStreamReader):
    """Streaming leg: same append-only sorted-listing offset model as the
    frame stream sources (``{"n": files consumed}``), emitting chunk rows.
    Overrides only the listing (multi-extension) and the row emission."""

    def __init__(self, options: dict):
        self._o = _ChunkOptions(options)
        self._path = self._o.path
        if not self._path:
            raise ValueError("videochunks stream requires a path: .load('/dir')")

    def _listing(self) -> list[str]:
        return _chunk_listing(self._path, require=False)

    def read(self, partition: FilePartition):
        yield from _chunk_rows(
            partition.path, self._o.rows, self._o.cols, self._o.max_frames
        )


class VideoChunksDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "videochunks"

    def schema(self) -> str:
        return CHUNK_DDL_SCHEMA

    def reader(self, schema) -> VideoChunksReader:
        return VideoChunksReader(self.options)

    def streamReader(self, schema) -> ChunkStreamReader:
        return ChunkStreamReader(self.options)


def register_videochunks_source(spark) -> None:
    """Idempotent registration of the videochunks format on a session."""
    spark.dataSource.register(VideoChunksDataSource)
