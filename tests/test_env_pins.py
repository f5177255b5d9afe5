"""Environment pins (VERDICT r4 item 7): round 3 died on a silent
environment migration — Spark 4.1 + regenerated testdata flipped parquet
timestamp inference to TIMESTAMP_NTZ and every downstream check failed with
hash noise instead of one clear error. This suite makes the next drift fail
loudly, with remediation text, at bootstrap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from distributed_video_analytics_flink_spark.schemas import TESTDATA_TABLES
from distributed_video_analytics_flink_spark.session import assert_environment
from distributed_video_analytics_flink_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_environment_pins_hold(spark):
    assert_environment(spark)  # must not raise on the supported environment


def test_drift_is_reported_loudly(spark):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(AssertionError, match="timeZone"):
            assert_environment(spark)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_no_testdata_table_leaks_ntz_or_long_timestamps(spark):
    """The load_table contract: downstream operators always see
    TimestampType, never TIMESTAMP_NTZ and never raw int64 nanos —
    regardless of how the current testdata generation encoded it."""
    for name in TESTDATA_TABLES:
        df = load_table(spark, SF_DIR, name)
        for f in df.schema.fields:
            assert not isinstance(f.dataType, T.TimestampNTZType), (
                f"{name}.{f.name} is TIMESTAMP_NTZ — load_table's "
                "normalization regressed (see sources/tables.py docstring)"
            )
        if name == "events":
            assert isinstance(df.schema["ts"].dataType, T.TimestampType)


def test_spark_version_is_known_good(spark):
    import pyspark

    major, minor = (int(x) for x in pyspark.__version__.split(".")[:2])
    assert (major, minor) >= (3, 4), (
        f"Spark {pyspark.__version__} lacks applyInPandasWithState / NTZ "
        "controls the engine depends on"
    )
