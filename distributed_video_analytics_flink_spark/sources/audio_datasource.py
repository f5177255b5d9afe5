"""Spark 4 Python Data Source for audio clips
(``spark.read.format("wavaudio")`` / ``spark.readStream.format("wavaudio")``)
— the audio twin of the per-file video Data Sources (y4m/avi/gif/apng),
completing the modality symmetry: video had batch AND streaming ingest,
audio was batch-only (r12).

One InputPartition per FILE, decode on the scheduled partition, ONE typed
feature row per clip (AUDIO_FEATURES_DDL) — clips never ship anywhere;
only integers move downstream, which is the multimodal posture at 100 TB
(the shuffle/exchange carries features, not media bytes). The row
arithmetic is the single shared :func:`audio_feature_row`
(sources/audio_files.py), so the binaryFile scan and this format cannot
drift on which clips decode (PCM-16 WAV), stub (mp3/ogg/flac), or error
(junk) — all PERMISSIVE: a bad clip is an error ROW, never a dead task.

Streaming reuses the per-file offset model of the video sources
(FrameStreamReader: ``{"n": files consumed}`` over the append-only sorted
listing) — the file-replay analog of a continuous ingest, same contract.

Reference provenance: the reference pipeline is video-only
(VideoEventCreator.java ingests camera frames); the audio modality is the
engine's LLM-training-data extension (SURVEY.md §2 multimodal family)."""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader

from distributed_video_analytics_flink_spark.sources.audio_files import (
    AUDIO_FEATURES_DDL,
)
from distributed_video_analytics_flink_spark.sources.frame_datasource import (
    FilePartition,
    FrameStreamReader,
)

# The same container set read_audio_features globs: the format must list
# every clip the binaryFile path would, INCLUDING the compressed formats
# whose honest stub rows are part of the contract — listing only *.wav
# would silently drop an mp3 the other path reports (r12 review).
AUDIO_EXTS = ("wav", "mp3", "ogg", "flac")


def _audio_listing(path: str | None, allow_empty: bool) -> list[str]:
    """Sorted listing of every audio clip under ``path``. Batch keeps
    the house planning-time loudness on an empty match (a typo'd
    directory must not read as an empty DataFrame); a stream may start
    on an empty directory (clips arrive later)."""
    if not path:
        raise ValueError("wavaudio source requires a path: .load('/dir/or/file')")
    if os.path.isdir(path):
        files = sorted(
            p
            for ext in AUDIO_EXTS
            for p in _glob.glob(os.path.join(path, f"*.{ext}"))
        )
        if not files and not allow_empty:
            exts = ",".join(AUDIO_EXTS)
            raise ValueError(f"no audio files (*.{{{exts}}}) under directory {path!r}")
        return files
    if not os.path.isfile(path):
        raise ValueError(f"wavaudio source path does not exist: {path!r}")
    return [path]


def _feature_rows(path: str):
    """One file -> one feature tuple in AUDIO_FEATURES_DDL column order."""
    from distributed_video_analytics_flink_spark.sources.audio_files import (
        audio_feature_row,
    )

    with open(path, "rb") as f:
        raw = f.read()
    r = audio_feature_row(path, raw)
    yield (
        r["clipId"],
        r["sample_rate"],
        r["n_channels"],
        r["n_frames"],
        r["duration_ms"],
        r["energy_q"],
        r["zero_crossings"],
        r["peak"],
        r["error"],
    )


class WavAudioReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")

    def partitions(self):
        return [FilePartition(p) for p in _audio_listing(self._path, allow_empty=False)]

    def read(self, partition: FilePartition):
        yield from _feature_rows(partition.path)


class AudioStreamReader(FrameStreamReader):
    """Streaming leg: the video sources' per-file offset model
    (``{"n": files consumed}`` against the sorted append-only listing)
    with feature rows instead of wire frames and the multi-extension
    audio listing — read() and _listing() are the only overrides; the
    offset/commit contract is the single shared copy."""

    def __init__(self, options: dict):
        super().__init__(options, "wav", decode=None)

    def _listing(self) -> list[str]:
        return _audio_listing(self._path, allow_empty=True)

    def read(self, partition: FilePartition):
        yield from _feature_rows(partition.path)


class WavAudioDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wavaudio"

    def schema(self) -> str:
        return AUDIO_FEATURES_DDL

    def reader(self, schema) -> WavAudioReader:
        return WavAudioReader(self.options)

    def streamReader(self, schema) -> AudioStreamReader:
        return AudioStreamReader(self.options)


def register_wavaudio_source(spark) -> None:
    """Idempotent registration of the wavaudio format on a session."""
    spark.dataSource.register(WavAudioDataSource)
