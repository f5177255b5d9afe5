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

from pyspark.sql.datasource import DataSource, DataSourceReader

from distributed_video_analytics_flink_spark.sources.audio_files import (
    AUDIO_FEATURES_DDL,
)
from distributed_video_analytics_flink_spark.sources.frame_datasource import (
    FilePartition,
    FrameStreamReader,
    file_partitions,
)


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
        return file_partitions(self._path, "wav")

    def read(self, partition: FilePartition):
        yield from _feature_rows(partition.path)


class AudioStreamReader(FrameStreamReader):
    """Streaming leg: the video sources' per-file offset model with
    feature rows instead of wire frames (read() is the only override —
    the listing/offset/commit contract is the single shared copy)."""

    def __init__(self, options: dict):
        super().__init__(options, "wav", decode=None)

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
