"""Guard against timestamp-encoding drift in the testdata parquet.

Round 3 regression: the testdata was regenerated from nanosecond-int64 to
microsecond TIMESTAMP_NTZ columns, Spark 4 inferred ``TIMESTAMP_NTZ``, and
every ``unix_micros``/``unix_millis`` call crashed with DATATYPE_MISMATCH.
The loader now normalizes every encoding to plain ``TimestampType`` under
the UTC session time zone; this test pins that invariant for every testdata
table AND for every registered query's output schema, so the next encoding
drift fails here — loudly, locally — instead of in the driver.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from distributed_video_analytics_flink_spark.schemas import TESTDATA_TABLES
from distributed_video_analytics_flink_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _ntz_fields(schema: T.StructType, prefix: str = "") -> list[str]:
    out = []
    for f in schema.fields:
        name = f"{prefix}{f.name}"
        if isinstance(f.dataType, T.TimestampNTZType):
            out.append(name)
        elif isinstance(f.dataType, T.StructType):
            out.extend(_ntz_fields(f.dataType, f"{name}."))
        elif isinstance(f.dataType, T.ArrayType) and isinstance(
            f.dataType.elementType, T.StructType
        ):
            out.extend(_ntz_fields(f.dataType.elementType, f"{name}[]."))
    return out


@pytest.mark.parametrize("table", TESTDATA_TABLES)
def test_no_ntz_in_loaded_tables(spark, table):
    df = load_table(spark, SF_DIR, table)
    assert _ntz_fields(df.schema) == [], (
        f"{table}: loader leaked TIMESTAMP_NTZ columns — unix_micros "
        "arithmetic downstream will crash"
    )


def test_events_ts_is_utc_instant(spark):
    """The NTZ->timestamp cast must be value-preserving: wall-clock values
    under the UTC session TZ equal the original microsecond instants."""
    from pyspark.sql import functions as F

    df = load_table(spark, SF_DIR, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    row = df.agg(F.min(F.unix_micros("ts")).alias("us")).collect()[0]
    # testdata generator writes 2024-01-01..2024-02-01 timestamps
    assert 1_704_000_000_000_000 < row["us"] < 1_710_000_000_000_000


def test_no_ntz_in_any_registered_query_schema(spark):
    """Every registered query's analyzed output schema is NTZ-free. Most
    queries only get plan-analyzed here, but a few execute driver-side
    actions during construction (the similarity queries collect their
    query/centroid rows; the cluster queries iterate) — acceptable at
    sf0.001, and it means a failure here can also surface a construction
    error rather than an NTZ leak; read the assertion message."""
    from distributed_video_analytics_flink_spark import operators as ops

    leaks = {}
    for name, spec in ops.QUERIES.items():
        df = spec.fn(spark, SF_DIR)
        ntz = _ntz_fields(df.schema)
        if ntz:
            leaks[name] = ntz
    assert leaks == {}
