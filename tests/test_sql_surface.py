"""SQL-surface tests (SURVEY.md §7.1): every registered SQL function must
agree with the DataFrame-side implementation it mirrors — same kernels, two
call surfaces."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from distributed_video_analytics_flink_spark.operators.dedup import _simhash_signatures
from distributed_video_analytics_flink_spark.operators.sql_surface import (
    register_all,
    register_functions,
)
from distributed_video_analytics_flink_spark.operators.video import (
    detect_motion_batch,
    fixture_frames,
)
from distributed_video_analytics_flink_spark.schemas import FRAME_SCHEMA
from tests.conftest import SF_DIR


def test_sql_scalar_functions(spark):
    register_functions(spark)
    row = spark.sql(
        """
        SELECT dvaf_day(timestamp '2024-03-05 23:30:00') AS day,
               dvaf_image_path('/out', 'cam7', timestamp '2024-01-01 00:00:01') AS path,
               dvaf_fingerprint('  Hello World  ') AS fp,
               dvaf_ws_tokens('a b  c') AS n,
               dvaf_stopword_ratio('the cat is here') AS ratio,
               dvaf_shingles('a b c d') AS sh
        """
    ).collect()[0]
    assert row.day == "2024-03-05"  # session TZ pinned to UTC
    assert row.path == "/out/cam7-T-1704067201000.png"
    assert row.fp == hashlib.md5(b"hello world").hexdigest()
    assert row.n == 4  # split keeps the empty token from the double space
    assert row.ratio == 0.5
    assert row.sh == ["a b c", "b c d"]


def test_sql_simhash_matches_dataframe_pipeline(spark):
    register_all(spark, SF_DIR)
    via_sql = {
        r.doc_id: r.simhash16
        for r in spark.sql(
            "SELECT doc_id, dvaf_simhash16(text) AS simhash16 FROM documents"
        ).collect()
    }
    via_df = {r.doc_id: r.simhash16 for r in _simhash_signatures(spark, SF_DIR).collect()}
    assert via_sql == via_df


def test_sql_cosine_matches_numpy(spark):
    register_all(spark, SF_DIR)
    rows = spark.sql(
        """
        SELECT dvaf_cosine(a.embedding, b.embedding) AS cos,
               a.embedding AS ea, b.embedding AS eb
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.vec_id < 4 AND b.vec_id < 4
        """
    ).collect()
    assert len(rows) == 6

    def dot_q(x: np.ndarray, y: np.ndarray) -> int:
        return int(np.round(x * y * 1e12).astype(np.int64).sum())

    for r in rows:
        ea = np.asarray(r.ea, dtype=np.float64)
        eb = np.asarray(r.eb, dtype=np.float64)
        expected = dot_q(ea, eb) / (math.sqrt(dot_q(ea, ea)) * math.sqrt(dot_q(eb, eb)))
        assert math.isclose(r.cos, expected, rel_tol=1e-12)
        assert -1.001 <= r.cos <= 1.001


def test_sql_motion_boxes_matches_batch_pipeline(spark):
    register_functions(spark)
    frames = spark.createDataFrame(fixture_frames(), schema=FRAME_SCHEMA)
    frames.createOrReplaceTempView("fixture_frames")
    # the ergonomic SQL form: lag() ships prev+cur (2x payload vs the
    # mapInPandas carry) but needs zero pipeline code
    via_sql = spark.sql(
        """
        SELECT camId, unix_micros(timestamp) AS ts_us,
               dvaf_motion_boxes(
                 unbase64(lag(data) OVER (PARTITION BY camId ORDER BY timestamp)),
                 unbase64(data), `rows`, cols) AS motion_boxes
        FROM fixture_frames
        """
    ).collect()
    got = {
        (r.camId, r.ts_us): [(b.x, b.y, b.w, b.h) for b in r.motion_boxes]
        for r in via_sql
    }
    exp = {
        (r.camId, r.ts_us): [(b.x, b.y, b.w, b.h) for b in r.motion_boxes]
        for r in detect_motion_batch(frames).collect()
    }
    assert got == exp
    assert any(boxes for boxes in exp.values())  # scenario actually has motion
