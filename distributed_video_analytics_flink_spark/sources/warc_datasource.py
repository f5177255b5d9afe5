"""Spark 4 Python Data Source for WARC segments
(``spark.read.format("warc")`` / ``spark.readStream.format("warc")``) —
the web-corpus ingest leg, completing the source symmetry: video
(y4m/avi/gif/apng/videochunks), audio (wavaudio), and now the format
100 TB text corpora actually arrive in.

One InputPartition per SEGMENT FILE (Common Crawl ships ~1 GB .warc.gz
segments — the file is the natural work unit), records parsed inside
the scheduled partition via the one shared :func:`warc_record_rows`
(binaryFile path and this format cannot drift), PERMISSIVE per file: a
truncated segment yields its readable prefix plus one error row, never
a dead task.

Column-pruning honesty: Spark's Python Data Source API does NOT push
projection into the reader (plan-verified: the BatchScan lists every
column; the Project sits above it), so ``body`` bytes DO cross the one
Python->JVM Arrow hop even for metadata-only queries — but they are
projected out before any exchange, so page bytes never move BETWEEN
executors. Parsing at the source still beats shipping whole segments:
the alternative (binaryFile + mapInPandas) pays the same Arrow hop on
strictly more bytes (the raw segment).

Streaming reuses the per-file offset model of the video/audio sources
(FrameStreamReader: ``{"n": files consumed}`` over the append-only
sorted listing) — new segments land in a directory, each trigger
ingests the new ones, checkpoint-resumable."""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader

from distributed_video_analytics_flink_spark.sources.frame_datasource import (
    FilePartition,
    FrameStreamReader,
)
from distributed_video_analytics_flink_spark.sources.warc import (
    WARC_RECORDS_DDL,
    warc_record_rows,
)

WARC_EXTS = ("warc", "warc.gz")


def _warc_listing(path: str | None, allow_empty: bool) -> list[str]:
    if not path:
        raise ValueError("warc source requires a path: .load('/dir/or/file')")
    if os.path.isdir(path):
        files = sorted(
            p
            for ext in WARC_EXTS
            for p in _glob.glob(os.path.join(path, f"*.{ext}"))
        )
        if not files and not allow_empty:
            raise ValueError(f"no *.warc / *.warc.gz under directory {path!r}")
        return files
    if not os.path.isfile(path):
        raise ValueError(f"warc source path does not exist: {path!r}")
    return [path]


def _segment_rows(path: str):
    with open(path, "rb") as f:
        raw = f.read()
    yield from warc_record_rows(path, raw)


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")

    def partitions(self):
        return [FilePartition(p) for p in _warc_listing(self._path, allow_empty=False)]

    def read(self, partition: FilePartition):
        yield from _segment_rows(partition.path)


class WarcStreamReader(FrameStreamReader):
    """Streaming leg: shared per-file offset/commit contract; only the
    listing (multi-extension) and row shape differ."""

    def __init__(self, options: dict):
        super().__init__(options, "warc", decode=None)

    def _listing(self) -> list[str]:
        return _warc_listing(self._path, allow_empty=True)

    def read(self, partition: FilePartition):
        yield from _segment_rows(partition.path)


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_RECORDS_DDL

    def reader(self, schema) -> WarcReader:
        return WarcReader(self.options)

    def streamReader(self, schema) -> WarcStreamReader:
        return WarcStreamReader(self.options)


def register_warc_source(spark) -> None:
    """Idempotent registration of the warc format on a session."""
    spark.dataSource.register(WarcDataSource)
