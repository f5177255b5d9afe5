"""Pin the Kafka source/sink config contract without a broker.

No Kafka broker exists in this container, so S1-S3/O1 can't run end-to-end;
what CAN be verified is that the assembled reader/writer options reproduce
the reference's consumer/producer contract:

- consumer: regex pattern subscription ``{base}-.*`` with dynamic topic
  discovery, earliest/latest switch, large fetch for ~1.2 MiB frames
  (VideoProcessor.java:106-141, TopicScaler.java:136);
- producer: camId-keyed messages for per-camera ordering, gzip compression,
  acks=all, raised max request size (VideoProducer.java:64-77);
- admission control: maxOffsetsPerTrigger as the parallelism/backpressure
  knob (K5).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.streaming.sinks import (
    kafka_frame_payload,
    kafka_writer_options,
)
from distributed_video_analytics_flink_spark.streaming.sources import (
    kafka_reader_options,
)


def test_reader_pattern_subscription():
    opts = kafka_reader_options("broker:9092", topic_base="video-frames")
    assert opts["subscribePattern"] == "video-frames-.*"
    assert "subscribe" not in opts
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["startingOffsets"] == "latest"
    # 10 MiB fetch: frames are ~1.2 MiB base64; reference raises broker
    # max.message.bytes to 10 MiB
    assert opts["kafka.max.partition.fetch.bytes"] == str(10 * 1024 * 1024)


def test_reader_explicit_topic_and_offsets():
    opts = kafka_reader_options(
        "broker:9092", topic="video-frames-cam0", starting_offsets="earliest"
    )
    assert opts["subscribe"] == "video-frames-cam0"
    assert "subscribePattern" not in opts
    assert opts["startingOffsets"] == "earliest"


def test_reader_admission_control():
    opts = kafka_reader_options(
        "b:9092", topic_base="video-frames", max_offsets_per_trigger=64
    )
    assert opts["maxOffsetsPerTrigger"] == "64"
    # and absent when not requested (unbounded trigger)
    assert "maxOffsetsPerTrigger" not in kafka_reader_options(
        "b:9092", topic_base="video-frames"
    )


def test_reader_requires_a_subscription():
    with pytest.raises(ValueError):
        kafka_reader_options("b:9092")


def test_writer_producer_contract():
    opts = kafka_writer_options("broker:9092", "video-frames-cam0", "/tmp/ckpt")
    assert opts["kafka.compression.type"] == "gzip"
    assert opts["kafka.acks"] == "all"
    assert opts["kafka.max.request.size"] == str(5 * 1024 * 1024)
    assert opts["topic"] == "video-frames-cam0"
    assert opts["checkpointLocation"] == "/tmp/ckpt"


def test_payload_is_camid_keyed_json(spark):
    """key=camId gives per-camera ordering on a keyed topic — the property
    the whole per-key stateful pipeline depends on."""
    frames = spark.createDataFrame(
        [("cam0", "2025-01-01T00:00:00.000000Z", 480, 640, 16, "QUJD")],
        "camId string, timestamp string, rows int, cols int, type int, data string",
    )
    out = kafka_frame_payload(frames)
    assert out.columns == ["key", "value"]
    row = out.collect()[0]
    assert row["key"] == "cam0"
    parsed = spark.range(1).select(
        F.from_json(
            F.lit(row["value"]),
            "camId string, timestamp string, rows int, cols int, type int, data string",
        ).alias("f")
    ).select("f.*").collect()[0]
    assert parsed["camId"] == "cam0" and parsed["data"] == "QUJD"
