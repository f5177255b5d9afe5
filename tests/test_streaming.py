"""Streaming tests (SURVEY.md §5.3 / FIXTURES.md §4): file-replay
micro-batches through the stateful motion operator, asserting exact
equivalence with the batch operator; malformed-row PERMISSIVE drop;
checkpoint restart idempotence; FPS tumbling windows; results sink layout.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.operators.video import (
    detect_motion_batch,
    fixture_frames,
)
from distributed_video_analytics_flink_spark.schemas import FRAME_SCHEMA
from distributed_video_analytics_flink_spark.streaming import (
    build_processing_results,
    camera_fps,
    detect_motion_stream,
    file_frame_stream,
    parse_frames,
    write_results_batch,
)


def _frame_json(f: dict) -> str:
    return json.dumps(
        {
            "camId": f["camId"],
            "timestamp": f["timestamp"].strftime("%Y-%m-%dT%H:%M:%S.%f+00:00"),
            "rows": f["rows"],
            "cols": f["cols"],
            "type": f["type"],
            "data": f["data"],
        }
    )


def _write_replay_files(dirpath: str, frames_per_file: int = 4) -> int:
    """Interleave cameras, split into files -> one micro-batch per file
    (the engine's shared replay writer; mtime pinning lives there)."""
    from distributed_video_analytics_flink_spark.streaming.sources import (
        write_frame_replay_dir,
    )

    return write_frame_replay_dir(fixture_frames(), dirpath, frames_per_file)


def _collect_stream(spark, stream_df, name: str, checkpoint: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def _key(rows):
    return sorted(
        (
            r["camId"],
            r["ts_us"],
            tuple((b["x"], b["y"], b["w"], b["h"]) for b in r["motion_boxes"]),
            r["detection_count"],
        )
        for r in rows
    )


def test_stream_equals_batch(spark, tmp_path):
    """The applyInPandasWithState operator must produce exactly the batch
    lag-fold results on the same frames, regardless of micro-batching
    (4-frame files interleave cameras, so most micro-batches split a
    camera's sequence across state updates)."""
    data_dir = tmp_path / "frames"
    data_dir.mkdir()
    _write_replay_files(str(data_dir))

    stream = detect_motion_stream(file_frame_stream(spark, str(data_dir)))
    got = _collect_stream(spark, stream, "motion_stream", str(tmp_path / "ck"))

    batch_frames = spark.createDataFrame(fixture_frames(), schema=FRAME_SCHEMA)
    want = detect_motion_batch(batch_frames).collect()

    assert _key(got) == _key(want)
    assert len(got) == 40


def test_malformed_rows_dropped_not_failed(spark, tmp_path):
    """T1/T2: truncated JSON, missing camId, junk timestamps -> dropped rows
    (PERMISSIVE), never a query failure (VideoProcessor.java:143-153)."""
    data_dir = tmp_path / "frames"
    data_dir.mkdir()
    good = [f for f in fixture_frames() if f["camId"] == "cam0"][:3]
    lines = [_frame_json(good[0]), '{"camId": "cam1", "timestamp": "not-a-ts"', _frame_json(good[1])]
    lines += ['{"timestamp": "2024-01-01T00:00:00.000000+00:00"}', "garbage", _frame_json(good[2])]
    # partially-valid record: camId coerces to "123" and survives the null
    # filter, but rows/cols/timestamp/data are null -> must yield a 0-box
    # row (null ts), never a crashed query
    lines += ['{"camId": 123}']
    (data_dir / "b0.json").write_text("\n".join(lines))

    stream = detect_motion_stream(file_frame_stream(spark, str(data_dir)))
    rows = _collect_stream(spark, stream, "motion_malformed", str(tmp_path / "ck"))
    assert sorted(r["camId"] for r in rows) == ["123", "cam0", "cam0", "cam0"]
    partial = next(r for r in rows if r["camId"] == "123")
    assert partial["detection_count"] == 0 and partial["ts_us"] is None


def test_checkpoint_restart_resumes_not_duplicates(spark, tmp_path):
    """K4: stop after the first files, add more, restart from the same
    checkpoint -> state (previous frame per camera) survives, already-read
    files are not re-emitted (FIXTURES.md §4 restart property)."""
    data_dir = tmp_path / "frames"
    data_dir.mkdir()
    frames = sorted(fixture_frames(), key=lambda f: f["timestamp"])
    half = len(frames) // 2  # 20 frames: every camera has frames 0-4 (no motion yet)
    (data_dir / "part1.json").write_text("\n".join(_frame_json(f) for f in frames[:half]))

    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def _run_to_parquet():
        q = (
            detect_motion_stream(file_frame_stream(spark, str(data_dir)))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    _run_to_parquet()
    assert spark.read.parquet(out).count() == half

    (data_dir / "part2.json").write_text("\n".join(_frame_json(f) for f in frames[half:]))
    _run_to_parquet()
    got = spark.read.parquet(out).collect()
    # no re-emission of the first half, and every frame exactly once
    assert len(got) == len(frames)
    batch = detect_motion_batch(spark.createDataFrame(fixture_frames(), schema=FRAME_SCHEMA))
    assert _key(got) == _key(batch.collect())
    # crucially, frame 5's detection proves frame-4 state crossed the restart
    by_idx = {(r["camId"], (r["ts_us"] % 1_000_000) // 33_000): r for r in got}
    assert by_idx[("cam0", 5)]["detection_count"] == 1


@pytest.mark.parametrize("seed", [7, 23])
def test_stream_equals_batch_random_sequences(spark, tmp_path, seed):
    """SURVEY.md §5.4 property: on ARBITRARY frame sequences (random pixel
    content, random camera interleaving, random micro-batch splits, some
    cameras missing from some batches) the streaming stateful fold and the
    batch secondary-sort fold agree exactly."""
    import base64
    from datetime import datetime, timedelta, timezone

    import numpy as np

    rng = np.random.default_rng(seed)
    t0 = datetime(2024, 3, 1, tzinfo=timezone.utc)
    frames = []
    for cam in range(3):
        n = int(rng.integers(4, 12))
        for i in range(n + 1):
            if i == n:  # final frame: guaranteed whole-frame scene change
                px = np.full((32, 32, 3), 255, dtype=np.uint8)
            else:
                px = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
            frames.append(
                {
                    "camId": f"cam{cam}",
                    "timestamp": t0 + timedelta(milliseconds=int(33 * i + cam)),
                    "rows": 32,
                    "cols": 32,
                    "type": 16,
                    "data": base64.b64encode(px.tobytes()).decode("ascii"),
                }
            )
    frames.sort(key=lambda f: f["timestamp"])

    data_dir = tmp_path / "frames"
    data_dir.mkdir()
    i = 0
    fileno = 0
    while i < len(frames):
        step = int(rng.integers(1, 6))
        p = data_dir / f"b{fileno:04d}.json"
        p.write_text("\n".join(_frame_json(f) for f in frames[i : i + step]))
        os.utime(p, (1_700_000_000 + fileno, 1_700_000_000 + fileno))
        i += step
        fileno += 1

    stream = detect_motion_stream(file_frame_stream(spark, str(data_dir)))
    got = _collect_stream(spark, stream, f"motion_rand_{seed}", str(tmp_path / "ck"))

    batch_frames = spark.createDataFrame(frames, schema=FRAME_SCHEMA)
    want = detect_motion_batch(batch_frames).collect()
    assert _key(got) == _key(want)
    # random 32x32 noise diffs almost surely exceed threshold everywhere ->
    # one big component over the area gate; sanity that detections exist
    assert sum(r["detection_count"] for r in got) > 0


def test_camera_fps_windows(spark):
    """A1: 2 s tumbling windows; fixture = 10 frames per cam inside the
    first window -> frames=10, fps=5.0 (a 30 fps camera would show 60)."""
    frames = spark.createDataFrame(fixture_frames(), schema=FRAME_SCHEMA)
    rows = camera_fps(frames).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["frames"] == 10
        assert r["fps"] == pytest.approx(5.0)


def test_rocksdb_state_store_equivalence(spark, tmp_path):
    """The RocksDB state store (the large-state scale path; the reference
    declared the dependency but never enabled it) must produce exactly the
    heap-store results for the stateful motion fold."""
    from distributed_video_analytics_flink_spark.session import ROCKSDB_STATE_STORE

    data_dir = tmp_path / "frames"
    data_dir.mkdir()
    _write_replay_files(str(data_dir))

    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_STATE_STORE)
    try:
        stream = detect_motion_stream(file_frame_stream(spark, str(data_dir)))
        got = _collect_stream(spark, stream, "motion_rocksdb", str(tmp_path / "ck"))
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    batch_frames = spark.createDataFrame(fixture_frames(), schema=FRAME_SCHEMA)
    want = detect_motion_batch(batch_frames).collect()
    assert _key(got) == _key(want)


def test_watermark_finalizes_windows(spark, tmp_path):
    """K3 as a deliberate improvement (the reference has no event-time
    handling at all): append-mode windowed aggregates emit a window exactly
    once the watermark passes its end. Micro-batch 1 carries t=0..4s
    events (watermark still at epoch -> all windows held); micro-batch 2
    jumps event time to 120 s, driving the watermark to 110 s and
    finalizing the early windows with their complete counts."""
    from datetime import timedelta

    data_dir = tmp_path / "frames"
    data_dir.mkdir()
    fx = [f for f in fixture_frames() if f["camId"] == "cam0"]
    t0 = fx[0]["timestamp"]
    early = []
    for k in range(5):
        f = dict(fx[0])
        f["timestamp"] = t0 + timedelta(seconds=k)  # windows [0,2) [2,4) [4,6)
        early.append(f)
    flush = dict(fx[0])
    flush["timestamp"] = t0 + timedelta(seconds=120)

    p1 = data_dir / "b1.json"
    p1.write_text("\n".join(_frame_json(f) for f in early))
    os.utime(p1, (1_700_000_000, 1_700_000_000))
    p2 = data_dir / "b2.json"
    p2.write_text(_frame_json(flush))
    os.utime(p2, (1_700_000_100, 1_700_000_100))

    stream = camera_fps(file_frame_stream(spark, str(data_dir)), watermark="10 seconds")
    rows = _collect_stream(spark, stream, "fps_watermark", str(tmp_path / "ck"))
    got = {
        (r["window"].start - t0.replace(tzinfo=None)).total_seconds(): r["frames"]
        for r in rows
    }
    # the three early windows finalized with complete counts; the 120 s
    # window is still open (watermark 110 < its end) and must NOT appear
    assert got == {0.0: 2, 2.0: 2, 4.0: 1}


def test_streaming_session_windows(spark, tmp_path):
    """Streaming twin of sessionize_session_window: the same
    session_window expression under readStream + watermark. Sessions
    finalize (append mode) once the watermark passes session end; a far-
    future flush event drives the watermark so every earlier session emits
    exactly once, and the finalized sessions must equal the batch
    session_window aggregation over the same events."""
    import json as _json
    from datetime import datetime, timedelta, timezone

    t0 = datetime(2024, 5, 1, tzinfo=timezone.utc)
    events = []
    for user, gaps_min in (
        ("u1", [0, 5, 10, 50, 55, 130]),  # sessions: {0,5,10}, {50,55}, {130}
        ("u2", [0, 29, 58, 95]),          # 29-min gaps chain; 37-min gap splits
        ("u3", [0, 30]),                  # exactly 30 min -> MERGES (> gap splits)
    ):
        for g in gaps_min:
            events.append((user, t0 + timedelta(minutes=g)))
    flush = ("zz", t0 + timedelta(days=2))  # watermark driver

    data_dir = tmp_path / "events"
    data_dir.mkdir()
    p1 = data_dir / "b1.jsonl"
    p1.write_text(
        "\n".join(
            _json.dumps({"user_id": u, "ts": ts.strftime("%Y-%m-%dT%H:%M:%S.%f+00:00")})
            for u, ts in events
        )
    )
    os.utime(p1, (1_700_000_000, 1_700_000_000))
    p2 = data_dir / "b2.jsonl"
    p2.write_text(
        _json.dumps({"user_id": flush[0], "ts": flush[1].strftime("%Y-%m-%dT%H:%M:%S.%f+00:00")})
    )
    os.utime(p2, (1_700_000_100, 1_700_000_100))

    schema = "user_id string, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .json(str(data_dir))
        .withWatermark("ts", "1 minute")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"), "n_events")
    )
    got = _collect_stream(spark, stream, "session_stream", str(tmp_path / "ck"))

    batch = (
        spark.createDataFrame(events, "user_id string, ts timestamp")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"), "n_events")
    )
    keyfn = lambda rows: sorted((r["user_id"], r["session_start"], r["n_events"]) for r in rows)
    assert keyfn(got) == keyfn(batch.collect())
    # semantic pins: u2's 29-min gaps chain (37-min gap splits); u3's
    # exactly-30-min gap MERGES — session_window extends through its end
    per_user = {}
    for r in got:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user["u1"]) == [1, 2, 3]
    assert sorted(per_user["u2"]) == [1, 3]
    assert per_user["u3"] == [2]


def test_processing_results_sink_layout(spark, tmp_path):
    """O2/O3: results land partitioned by (camera_id, day); the per-(cam,
    day) read path prunes partitions; the faithful_count variant carries
    size(motion_boxes) while the reference-faithful default carries 1."""
    frames = spark.createDataFrame(fixture_frames(), schema=FRAME_SCHEMA)
    det = detect_motion_batch(frames)
    det = det.join(
        frames.select(
            "camId",
            (F.unix_micros("timestamp")).alias("ts_us"),
            "rows",
            "cols",
        ),
        ["camId", "ts_us"],
    )
    results = build_processing_results(det, faithful_count=True)
    out = str(tmp_path / "processing_results")
    write_results_batch(results, out)

    back = spark.read.parquet(out)
    assert set(back.columns) == {
        "id", "camera_id", "day", "frame_timestamp", "processing_timestamp",
        "detection_type", "detection_count", "frame_rows", "frame_cols",
        "image_path", "metadata",
    }
    # fixture: frames 5-9 have detections -> 5 rows per camera; counts 1|2
    one_cam = back.filter(
        (F.col("camera_id") == "cam0") & (F.col("day") == "2024-01-01")
    )
    assert one_cam.count() == 5
    assert back.count() == 20
    assert {r["detection_count"] for r in one_cam.collect()} == {1, 2}
    assert one_cam.filter(F.col("image_path").rlike(r"cam0-T-\d+\.png$")).count() == 5
    # partition pruning visible in the plan
    plan = one_cam._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "camera_id=cam0" in plan


# --------------------------------------------------------------------------
# Streaming joins & dedup (streaming/joins.py)
# --------------------------------------------------------------------------


def test_stream_static_join_enriches(spark, tmp_path):
    """Stream-static left join against the camera registry dim: every frame
    comes back with its registry attributes; unregistered cameras survive
    with nulls (left join), matching the batch join exactly."""
    from distributed_video_analytics_flink_spark.streaming import enrich_with_cameras

    data_dir = tmp_path / "frames"
    data_dir.mkdir()
    _write_replay_files(str(data_dir))
    cameras = spark.createDataFrame(
        [("cam0", "lobby"), ("cam1", "gate"), ("cam2", "yard")],
        ["camId", "location"],
    )

    stream = enrich_with_cameras(
        file_frame_stream(spark, str(data_dir)), cameras
    ).select("camId", "timestamp", "location")
    got = _collect_stream(spark, stream, "enriched_stream", str(tmp_path / "ck"))

    batch = spark.createDataFrame(fixture_frames(), schema=FRAME_SCHEMA)
    want = (
        batch.join(F.broadcast(cameras), "camId", "left")
        .select("camId", "timestamp", "location")
        .collect()
    )
    keyfn = lambda rows: sorted((r["camId"], r["timestamp"], r["location"]) for r in rows)
    assert keyfn(got) == keyfn(want)
    assert len(got) == 40
    assert all(r["location"] is None for r in got if r["camId"] == "cam3")


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream inner interval join (two independent file sources over
    the same replay): per-camera pairs within +/-100 ms must match the batch
    join's pairs exactly. Both sides are watermarked so buffered state is
    bounded; inner-join matches emit eagerly, so a finite replay yields the
    complete pair set."""
    from distributed_video_analytics_flink_spark.streaming import interval_join_streams

    data_dir = tmp_path / "frames"
    data_dir.mkdir()
    _write_replay_files(str(data_dir))

    joined = interval_join_streams(
        file_frame_stream(spark, str(data_dir)),
        file_frame_stream(spark, str(data_dir)),
        tolerance_ms=100,
    ).select("l_key", "l_ts", "r_ts")
    got = _collect_stream(spark, joined, "interval_join_stream", str(tmp_path / "ck"))

    batch = spark.createDataFrame(fixture_frames(), schema=FRAME_SCHEMA)
    l = batch.select(F.col("camId").alias("l_key"), F.col("timestamp").alias("l_ts"))
    r = batch.select(F.col("camId").alias("r_key"), F.col("timestamp").alias("r_ts"))
    want = (
        l.join(
            r,
            F.expr(
                "l_key = r_key AND r_ts BETWEEN"
                " l_ts - INTERVAL 100 MILLISECONDS AND l_ts + INTERVAL 100 MILLISECONDS"
            ),
        )
        .select("l_key", "l_ts", "r_ts")
        .collect()
    )
    keyfn = lambda rows: sorted((r["l_key"], r["l_ts"], r["r_ts"]) for r in rows)
    assert keyfn(got) == keyfn(want)
    assert len(got) > 40  # every frame self-matches plus +/-3 neighbors


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark suppresses at-least-once redelivery:
    a replay where every frame appears twice (in-file dup + next-file
    redelivery for the earliest frames) yields exactly the unique frames."""
    from distributed_video_analytics_flink_spark.streaming import dedup_frames_stream

    frames = sorted(fixture_frames(), key=lambda f: f["timestamp"])
    data_dir = tmp_path / "frames"
    data_dir.mkdir()
    per_file = 4
    for fileno, i in enumerate(range(0, len(frames), per_file)):
        chunk = frames[i : i + per_file]
        lines = [_frame_json(f) for f in chunk for _ in (0, 1)]  # in-file dup
        if i >= per_file:  # cross-file redelivery of the previous chunk
            lines += [_frame_json(f) for f in frames[i - per_file : i]]
        path = os.path.join(str(data_dir), f"batch-{i:04d}.json")
        with open(path, "w") as fh:
            fh.write("\n".join(lines))
        os.utime(path, (1_700_000_000 + fileno, 1_700_000_000 + fileno))

    deduped = dedup_frames_stream(
        file_frame_stream(spark, str(data_dir))
    ).select("camId", "timestamp")
    got = _collect_stream(spark, deduped, "dedup_stream", str(tmp_path / "ck"))

    assert len(got) == 40
    assert sorted((r["camId"], r["timestamp"]) for r in got) == sorted(
        (f["camId"], f["timestamp"].replace(tzinfo=None)) for f in fixture_frames()
    )


def test_streaming_corpus_ingest_dedup(spark, tmp_path):
    """Streaming corpus ingest (streaming/corpus.py): re-crawled duplicate
    content across micro-batches is dropped by the watermark-bounded
    fingerprint dedup; survivors land append-only in the batch sink's
    lang-partitioned layout and per-language reads prune."""
    import json as _json
    from datetime import datetime, timedelta, timezone

    t0 = datetime(2024, 6, 1, tzinfo=timezone.utc)
    batch1 = [
        {"doc_id": 1, "text": "alpha beta gamma", "lang": "en"},
        {"doc_id": 2, "text": "uno dos tres", "lang": "es"},
        {"doc_id": 3, "text": "alpha beta gamma", "lang": "en"},  # intra-batch dup
    ]
    batch2 = [
        {"doc_id": 4, "text": "uno dos tres", "lang": "es"},      # cross-batch dup
        {"doc_id": 5, "text": "neu und anders", "lang": "de"},
    ]
    data_dir = tmp_path / "docs_in"
    data_dir.mkdir()
    for i, batch in enumerate((batch1, batch2)):
        p = data_dir / f"b{i}.jsonl"
        p.write_text(
            "\n".join(
                _json.dumps(
                    {**d, "ingest_ts": (t0 + timedelta(seconds=30 * i)).strftime(
                        "%Y-%m-%dT%H:%M:%S.%f+00:00")}
                )
                for d in batch
            )
        )
        os.utime(p, (1_700_000_000 + i * 100,) * 2)

    from distributed_video_analytics_flink_spark.streaming import stream_curated_corpus

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, ingest_ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)  # force separate micro-batches
        .json(str(data_dir))
    )
    q = stream_curated_corpus(
        stream, str(tmp_path / "corpus_out"), str(tmp_path / "ck")
    )
    q.processAllAvailable()
    q.stop()

    back = spark.read.parquet(str(tmp_path / "corpus_out" / "corpus"))
    rows = {r["doc_id"]: r for r in back.collect()}
    # one survivor per distinct content: {1 or 3}, 2, 5 — dups 3/4 dropped
    assert len(rows) == 3
    assert set(back.select("lang").distinct().toPandas()["lang"]) == {"en", "es", "de"}
    texts = sorted(r["text"] for r in rows.values())
    assert texts == ["alpha beta gamma", "neu und anders", "uno dos tres"]
    one_lang = back.filter(F.col("lang") == "es")
    assert one_lang.count() == 1
    plan = one_lang._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "lang=es" in plan


# --------------------------------------------------------------------------
# Keyed upsert sink (merge_results_batch / upsert_results_stream)
# --------------------------------------------------------------------------
_UPSERT_SCHEMA = (
    "camera_id string, day string, frame_timestamp timestamp, "
    "processing_timestamp timestamp, detection_count int"
)


def _upsert_rows(spark, rows):
    return spark.createDataFrame(rows, schema=_UPSERT_SCHEMA)


def test_upsert_stream_last_write_wins(spark, tmp_path):
    """Cassandra-semantics sink: a re-delivered (camera_id, day,
    frame_timestamp) key OVERWRITES the earlier row instead of appending a
    duplicate; fresh keys insert; untouched partitions survive the dynamic
    overwrite; within one batch the later processing_timestamp wins."""
    import datetime as dt

    from distributed_video_analytics_flink_spark.streaming.sinks import (
        merge_results_batch,
        upsert_results_stream,
    )

    t = lambda s: dt.datetime.fromisoformat(s)
    src = tmp_path / "src"
    src.mkdir()
    batch1 = [
        ("cam0", "2024-01-01", t("2024-01-01T00:00:01"), t("2024-01-01T00:00:10"), 1),
        ("cam0", "2024-01-01", t("2024-01-01T00:00:02"), t("2024-01-01T00:00:10"), 1),
        ("cam1", "2024-01-02", t("2024-01-02T00:00:01"), t("2024-01-01T00:00:10"), 1),
    ]
    batch2 = [
        # re-delivery of cam0/t1 -> must overwrite detection_count 1 -> 7
        ("cam0", "2024-01-01", t("2024-01-01T00:00:01"), t("2024-01-01T00:00:20"), 7),
        # same key twice within the batch: later processing_timestamp wins
        ("cam0", "2024-01-01", t("2024-01-01T00:00:03"), t("2024-01-01T00:00:19"), 5),
        ("cam0", "2024-01-01", t("2024-01-01T00:00:03"), t("2024-01-01T00:00:21"), 9),
    ]

    def _write_file(name, rows, mtime):
        p = src / name
        with open(p, "w") as f:
            for r in rows:
                f.write(
                    json.dumps(
                        {
                            "camera_id": r[0],
                            "day": r[1],
                            "frame_timestamp": r[2].isoformat(),
                            "processing_timestamp": r[3].isoformat(),
                            "detection_count": r[4],
                        }
                    )
                    + "\n"
                )
        os.utime(p, (mtime, mtime))

    _write_file("b1.json", batch1, 1_700_000_000)
    _write_file("b2.json", batch2, 1_700_000_100)

    out = str(tmp_path / "table")
    stream = (
        spark.readStream.schema(_UPSERT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = upsert_results_stream(stream, out, str(tmp_path / "ck"))
    q.processAllAvailable()
    q.stop()

    back = spark.read.parquet(out)
    rows = {
        (r["camera_id"], str(r["day"]), r["frame_timestamp"].isoformat()): r[
            "detection_count"
        ]
        for r in back.collect()
    }
    assert rows == {
        ("cam0", "2024-01-01", "2024-01-01T00:00:01"): 7,  # overwritten
        ("cam0", "2024-01-01", "2024-01-01T00:00:02"): 1,  # untouched key
        ("cam0", "2024-01-01", "2024-01-01T00:00:03"): 9,  # within-batch latest
        ("cam1", "2024-01-02", "2024-01-02T00:00:01"): 1,  # untouched partition
    }, rows

    # foreachBatch retry model: re-merging the SAME last batch is a no-op
    merge_results_batch(_upsert_rows(spark, batch2), out)
    again = {
        (r["camera_id"], str(r["day"]), r["frame_timestamp"].isoformat()): r[
            "detection_count"
        ]
        for r in spark.read.parquet(out).collect()
    }
    assert again == rows

    # layout preserved: partition directories + pruning-capable read path
    assert (tmp_path / "table" / "camera_id=cam0" / "day=2024-01-01").exists()
    one = spark.read.parquet(out).filter(
        (F.col("camera_id") == "cam1") & (F.col("day") == "2024-01-02")
    )
    assert one.count() == 1


def test_transform_with_state_builds_and_types(spark, tmp_path):
    """Spark 4 StatefulProcessor twin (transformWithStateInPandas): the
    plan must BUILD against the v2 API — correct output schema, streaming
    DataFrame, camId grouping — without executing (execution needs
    google.protobuf for the state-server wire protocol, absent in this
    container; see the skip below for the full-equivalence drive)."""
    from distributed_video_analytics_flink_spark.streaming.motion import (
        MOTION_STREAM_SCHEMA,
        detect_motion_stream_tws,
    )

    data_dir = tmp_path / "frames"
    data_dir.mkdir()
    _write_replay_files(str(data_dir))
    stream = detect_motion_stream_tws(file_frame_stream(spark, str(data_dir)))
    assert stream.isStreaming
    assert stream.schema == MOTION_STREAM_SCHEMA
    plan = stream._jdf.queryExecution().logical().toString()
    assert "transformWithStateInPySpark" in plan or "TransformWithState" in plan, plan


def test_transform_with_state_motion_equivalence(spark, tmp_path):
    """Spark 4 StatefulProcessor twin (transformWithStateInPandas): same
    fold, same results as the batch operator — and therefore as the
    applyInPandasWithState path — over the multi-micro-batch replay.
    Requires the RocksDB state store (the v2 API's only provider), which
    is also the 100 TB large-state posture.

    ENV BLOCKER: the v2 API's Python state server speaks protobuf; this
    container ships no google.protobuf and installs are not permitted
    (same posture as the Kafka broker — COVERAGE.md records it). The test
    runs wherever protobuf exists."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state server needs protobuf "
        "(not in container; no installs allowed)",
    )
    from distributed_video_analytics_flink_spark.session import ROCKSDB_STATE_STORE
    from distributed_video_analytics_flink_spark.streaming.motion import (
        detect_motion_stream_tws,
    )

    data_dir = tmp_path / "frames"
    data_dir.mkdir()
    _write_replay_files(str(data_dir))

    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_STATE_STORE)
    try:
        stream = detect_motion_stream_tws(file_frame_stream(spark, str(data_dir)))
        got = _collect_stream(spark, stream, "motion_tws", str(tmp_path / "ck"))
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    batch_frames = spark.createDataFrame(fixture_frames(), schema=FRAME_SCHEMA)
    want = detect_motion_batch(batch_frames).collect()
    assert _key(got) == _key(want)
    assert len(got) == 40


def test_observed_motion_metrics(spark, tmp_path):
    """§2.8 monitoring made Spark-native: observe() metrics ride the
    motion stream itself (no second pass) and every micro-batch reports
    frames / motion-frame / box totals that must reconcile exactly with
    the sink's contents."""
    from distributed_video_analytics_flink_spark.streaming.metrics import (
        last_observed,
        with_motion_metrics,
    )

    data_dir = tmp_path / "frames"
    data_dir.mkdir()
    _write_replay_files(str(data_dir))

    stream = with_motion_metrics(
        detect_motion_stream(file_frame_stream(spark, str(data_dir)))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("motion_observed")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    totals = {"frames": 0, "motion_frames": 0, "total_boxes": 0}
    max_boxes = 0
    for p in q.recentProgress:
        m = last_observed(p)
        if m:
            totals["frames"] += m["frames"]
            totals["motion_frames"] += m["motion_frames"]
            totals["total_boxes"] += m["total_boxes"]
            max_boxes = max(max_boxes, m["max_boxes_per_frame"] or 0)
    q.stop()

    rows = spark.sql("SELECT * FROM motion_observed").collect()
    assert totals["frames"] == len(rows) == 40
    assert totals["motion_frames"] == sum(1 for r in rows if r["detection_count"] > 0)
    assert totals["total_boxes"] == sum(r["detection_count"] for r in rows)
    assert max_boxes == max(r["detection_count"] for r in rows)


def test_stream_anomaly_matches_batch(spark, tmp_path):
    """Streaming 3-sigma scoring against broadcast batch moments must flag
    exactly the rows the batch query flags (same exact-integer algebra,
    so replay == batch bit-for-bit)."""
    from distributed_video_analytics_flink_spark.operators import QUERIES
    from distributed_video_analytics_flink_spark.sources.tables import load_table
    from distributed_video_analytics_flink_spark.streaming.anomaly import (
        event_type_moments,
        flag_anomalies,
    )
    from tests.conftest import ORACLE_SF_DIR

    events = load_table(spark, ORACLE_SF_DIR, "events")
    moments = event_type_moments(events)

    # replay the events table as a 4-micro-batch stream
    data_dir = tmp_path / "ev"
    events.repartition(4).write.json(str(data_dir))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "2")
        .json(str(data_dir))
    )
    q = (
        flag_anomalies(stream, moments)
        .writeStream.format("memory")
        .queryName("anomalies_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        r["event_id"] for r in spark.sql("SELECT * FROM anomalies_stream").collect()
    }
    want = {
        r["event_id"]
        for r in QUERIES["events_anomaly_zscore"].fn(spark, ORACLE_SF_DIR).collect()
    }
    assert got == want and len(want) > 0


def test_stream_ema_matches_batch(spark, tmp_path):
    """The state-carried EMA replayed in event-time order across multiple
    micro-batches must land on exactly the batch fold's per-user values
    (same deterministic order, same exact-in-binary alpha)."""
    from distributed_video_analytics_flink_spark.operators import QUERIES
    from distributed_video_analytics_flink_spark.sources.tables import load_table
    from distributed_video_analytics_flink_spark.streaming.ema import ema_stream
    from tests.conftest import ORACLE_SF_DIR

    events = load_table(spark, ORACLE_SF_DIR, "events").select(
        "user_id", "event_id", "ts", "value"
    )

    # two event-time halves, appended sequentially so micro-batch order
    # respects event-time order (the recurrence's cross-batch contract)
    first = events.filter(F.col("ts") <= F.lit("2024-02-01"))
    second = events.filter(F.col("ts") > F.lit("2024-02-01"))
    data_dir = tmp_path / "ev"
    first.coalesce(1).write.json(str(data_dir))

    stream = spark.readStream.schema(events.schema).json(str(data_dir))
    q = (
        ema_stream(stream)
        .writeStream.format("memory")
        .queryName("ema_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    second.coalesce(1).write.mode("append").json(str(data_dir))
    q.processAllAvailable()
    q.stop()

    # last update per user wins (the keyed-upsert read of update mode)
    updates = spark.sql(
        "SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
        "ORDER BY n_events DESC) rn FROM ema_stream) WHERE rn = 1"
    ).collect()
    got = {r["user_id"]: (r["n_events"], r["ema_value"]) for r in updates}
    want = {
        r["user_id"]: (r["n_events"], r["ema_value"])
        for r in QUERIES["events_ema_smoothed"].fn(spark, ORACLE_SF_DIR).collect()
    }
    assert len(want) > 0 and set(got) == set(want)
    for uid, (n, ema) in want.items():
        assert got[uid] == (n, ema), f"user {uid}: stream {got[uid]} != batch {(n, ema)}"


def test_stream_ema_state_survives_restart(spark, tmp_path):
    """Kill the EMA query between micro-batches and restart from the same
    checkpoint: the carried (ema, n) state must survive, so the resumed
    stream still lands exactly on the batch fold — the K4 restart
    contract applied to the recurrence operator."""
    from distributed_video_analytics_flink_spark.operators import QUERIES
    from distributed_video_analytics_flink_spark.sources.tables import load_table
    from distributed_video_analytics_flink_spark.streaming.ema import ema_stream
    from tests.conftest import ORACLE_SF_DIR

    events = load_table(spark, ORACLE_SF_DIR, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    data_dir, ck = str(tmp_path / "ev"), str(tmp_path / "ck")
    events.filter(F.col("ts") <= F.lit("2024-02-01")).coalesce(1).write.json(data_dir)

    out_dir = str(tmp_path / "out")

    def _start():
        # memory sink refuses checkpoint recovery; foreachBatch + parquet
        # append is the recoverable shape (same as the results sink)
        stream = spark.readStream.schema(events.schema).json(data_dir)
        return (
            ema_stream(stream)
            .writeStream.foreachBatch(
                lambda df, _bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", ck)
            .start()
        )

    q = _start()
    q.processAllAvailable()
    q.stop()  # hard stop between batches

    events.filter(F.col("ts") > F.lit("2024-02-01")).coalesce(1).write.mode(
        "append"
    ).json(data_dir)
    q2 = _start()  # same checkpoint: resumes with carried state
    q2.processAllAvailable()
    q2.stop()

    got = {
        r["user_id"]: (r["n_events"], r["ema_value"])
        for r in spark.read.parquet(out_dir)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("n_events"))
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["ema_value"])
        for r in QUERIES["events_ema_smoothed"].fn(spark, ORACLE_SF_DIR).collect()
    }
    assert len(want) > 0
    for uid, nv in want.items():
        assert got[uid] == nv, f"user {uid}: resumed {got[uid]} != batch {nv}"


def test_stream_ema_drops_null_values(spark, tmp_path):
    """NULL values must be excluded from the fold (the operator contract:
    EMA over present values) — not restart the average, not poison it to
    NULL/NaN. A user whose batch is entirely NULL must keep prior state."""
    from distributed_video_analytics_flink_spark.streaming.ema import ema_stream

    data_dir, ck = str(tmp_path / "ev"), str(tmp_path / "ck")
    schema = "user_id long, event_id long, ts timestamp, value double"
    rows1 = [
        (1, 1, "2024-01-01 00:00:00", 10.0),
        (1, 2, "2024-01-01 00:01:00", None),
        (1, 3, "2024-01-01 00:02:00", 20.0),
    ]
    spark.createDataFrame(
        [(u, e, __import__("datetime").datetime.fromisoformat(t), v) for u, e, t, v in rows1],
        schema,
    ).coalesce(1).write.json(data_dir)

    stream = spark.readStream.schema(
        spark.read.json(data_dir, schema=schema).schema
    ).json(data_dir)
    q = (
        ema_stream(stream)
        .writeStream.format("memory")
        .queryName("ema_nulls")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    [row] = spark.sql("SELECT * FROM ema_nulls ORDER BY n_events DESC LIMIT 1").collect()
    # fold over [10.0, 20.0] only: 0.5*20 + 0.5*10 = 15.0; n counts non-null
    assert row["user_id"] == 1
    assert row["n_events"] == 2
    assert row["ema_value"] == 15.0


def test_motion_replay_parity_query(spark):
    """VERDICT r7 #5: the registered replay-parity query must prove the
    streamed results table equals the batch fold through the at-rest
    (camera_id, day)-partitioned layout — one row per fixture camera, all
    parity booleans TRUE, counts matching the golden sequence (5 motion
    frames per camera)."""
    from distributed_video_analytics_flink_spark.operators.video import (
        video_motion_replay_parity,
    )

    rows = video_motion_replay_parity(spark, "/root/testdata/sf0.001").collect()
    assert sorted(r["camera_id"] for r in rows) == ["cam0", "cam1", "cam2", "cam3"]
    assert all(r["stream_equals_batch"] for r in rows)
    assert all(r["n_motion_frames"] == 5 for r in rows)
