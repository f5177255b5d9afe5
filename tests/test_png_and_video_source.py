"""Tests for the annotated-PNG side output (CV6/CV7/O4 made real via the
stdlib-zlib PNG writer) and the binaryFile video-file ingestion source (S4).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.functions.png import (
    BOX_BGR,
    annotate_png,
    decode_png_bgr,
    draw_boxes_bgr,
    encode_png_bgr,
)
from distributed_video_analytics_flink_spark.operators.video import (
    detect_motion_batch,
    fixture_frames,
)
from distributed_video_analytics_flink_spark.schemas import FRAME_SCHEMA
from distributed_video_analytics_flink_spark.sources.video_files import read_video_files


def test_png_roundtrip():
    rng = np.random.default_rng(5)
    frame = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
    data = encode_png_bgr(frame)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert np.array_equal(decode_png_bgr(data), frame)


def test_draw_boxes_green_rectangles():
    frame = np.zeros((20, 20, 3), dtype=np.uint8)
    out = draw_boxes_bgr(frame, [(4, 4, 8, 8)])
    assert tuple(out[4, 8]) == BOX_BGR  # top edge
    assert tuple(out[11, 8]) == BOX_BGR  # bottom edge (y+h-1, inside thickness)
    assert tuple(out[8, 4]) == BOX_BGR  # left edge
    assert tuple(out[8, 8]) == (0, 0, 0)  # interior untouched
    assert frame.sum() == 0  # original not mutated


def test_annotate_png_invalid_payload():
    assert annotate_png(b"short", 480, 640, [(0, 0, 5, 5)]) is None


def test_batch_annotate_emits_valid_pngs(spark):
    frames = spark.createDataFrame(fixture_frames(), schema=FRAME_SCHEMA)
    rows = (
        detect_motion_batch(frames, annotate=True)
        .filter(F.col("detection_count") > 0)
        .collect()
    )
    assert len(rows) == 20  # frames 5-9 x 4 cams
    r = next(x for x in rows if (x["ts_us"] % 1_000_000) // 33_000 == 5)
    img = decode_png_bgr(bytes(r["png"]))
    assert img.shape == (48, 64, 3)
    # the golden frame-5 box is (7,7,26,26): its border pixels must be green
    assert tuple(img[7, 20]) == BOX_BGR
    # and non-motion rows (not selected here) carry no png; interior of the
    # moved block survives annotation
    assert tuple(img[20, 20]) == (200, 200, 200)


def test_video_file_source_plumbing(spark, tmp_path):
    """S4: fake 'video' files -> binaryFile scan -> frame rows with the wire
    schema; deterministic across reads; composes with the motion pipeline."""
    vids = tmp_path / "videos"
    vids.mkdir()
    rng = np.random.default_rng(11)
    for name, size in (("camA.mp4", 9000), ("camB.mp4", 5000)):
        (vids / name).write_bytes(rng.integers(0, 256, size, dtype=np.uint8).tobytes())
    (vids / "notes.txt").write_text("ignored by glob")

    frames = read_video_files(spark, str(vids), rows=48, cols=64)
    rows = frames.collect()
    assert {r["camId"] for r in rows} == {"camA", "camB"}
    by_cam = {}
    for r in rows:
        by_cam.setdefault(r["camId"], []).append(r)
    assert len(by_cam["camA"]) == 2 and len(by_cam["camB"]) == 1  # size // 4096
    assert all(r["rows"] == 48 and r["cols"] == 64 and r["type"] == 16 for r in rows)

    again = read_video_files(spark, str(vids), rows=48, cols=64).collect()
    assert sorted(r["data"] for r in again) == sorted(r["data"] for r in rows)

    # composes with the detector end-to-end (camA has 2 frames -> 1 diff)
    det = detect_motion_batch(frames).collect()
    assert len(det) == 3
    cam_a = sorted(
        (r for r in det if r["camId"] == "camA"), key=lambda r: r["ts_us"]
    )
    assert cam_a[0]["detection_count"] == 0  # first frame: no previous
    assert cam_a[1]["detection_count"] >= 1  # moving block detected
