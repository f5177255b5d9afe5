"""Driver-faithful canonicalization checks.

The round driver compares Spark vs DuckDB through pandas: both results go
``toPandas()`` / ``rel.df()``, are sorted with ``DataFrame.sort_values``
over every column, and value-hashed per cell WITHOUT width normalization.
Two failure classes escaped the (more tolerant) local harness in round 1:

- array-typed output columns: pandas cannot sort list cells
  (``TypeError: unhashable type: 'list'`` — killed ``agg_approx_percentile``);
- DuckDB HUGEINT aggregates: pandas maps them to float64/object, so the
  driver hashes ``3.0`` against Spark's ``3`` (killed ``dedup_simhash`` and
  ``sessionize_events``).

These tests pin both properties for EVERY registered query so the class of
bug cannot re-enter: each Spark result must be pandas-sortable, and for
oracled queries each column's pandas dtype *kind* (integer / float /
object / datetime) must agree between the Spark and DuckDB frames.
"""

from __future__ import annotations

import pytest

from distributed_video_analytics_flink_spark.operators import QUERIES
from tests.conftest import ORACLE_SF_DIR
from tests.oracle_harness import duck_connection

_UNSORTABLE = (list, dict, set, tuple, bytearray)


def _kind(dtype, series):
    """Collapse pandas dtypes into comparable kinds."""
    k = dtype.kind  # i/u int, f float, O object, M datetime, b bool
    if k == "u":
        return "i"
    if k == "M":
        # Spark DATE comes back as object-of-datetime.date, DuckDB DATE as
        # datetime64 — four r01 driver-GREEN queries prove the driver
        # canonicalizes these equal, so collapse date-likes to one kind
        return "date"
    if k == "O":
        # object columns: inspect the first non-null value
        for v in series:
            if v is not None:
                if isinstance(v, bool):
                    return "b"
                if isinstance(v, int):
                    return "i"
                if isinstance(v, float):
                    return "f"
                if isinstance(v, (bytes, bytearray)):
                    return "bytes"
                if isinstance(v, str):
                    return "str"
                return type(v).__name__
        return "null"
    return k


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(ORACLE_SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", list(QUERIES))
def test_spark_output_is_driver_sortable(spark, name):
    """Every query's Spark result must survive the driver's
    ``sort_values`` canonicalization: no list/map/struct cells."""
    pdf = QUERIES[name].fn(spark, ORACLE_SF_DIR).limit(50).toPandas()
    for col in pdf.columns:
        for v in pdf[col]:
            assert not isinstance(v, _UNSORTABLE) and not hasattr(v, "__array__"), (
                f"{name}.{col} yields unsortable cell type "
                f"{type(v).__name__} — the driver will crash on it"
            )
    # the actual driver operation must not raise
    if len(pdf.columns):
        pdf.sort_values(by=list(pdf.columns))


@pytest.mark.parametrize(
    "name", [n for n, s in QUERIES.items() if s.oracle is not None]
)
def test_oracle_dtype_kinds_match_spark(spark, duck, name):
    """For oracled queries, the pandas dtype kind of every column must
    agree between Spark and DuckDB — a DuckDB HUGEINT surfacing as
    float64/object against Spark's int64 hash-mismatches at the driver
    even when values are numerically equal."""
    spec = QUERIES[name]
    spdf = spec.fn(spark, ORACLE_SF_DIR).toPandas()
    ddf = duck.sql(spec.oracle).df()
    s_kinds = {c.lower(): _kind(spdf[c].dtype, spdf[c]) for c in spdf.columns}
    d_kinds = {c.lower(): _kind(ddf[c].dtype, ddf[c]) for c in ddf.columns}
    assert set(s_kinds) == set(d_kinds), f"{name}: column sets differ"
    for col in s_kinds:
        sk, dk = s_kinds[col], d_kinds[col]
        if "null" in (sk, dk):  # empty/all-null side: kind unknowable
            continue
        assert sk == dk, (
            f"{name}.{col}: spark kind {sk} vs duckdb kind {dk} — "
            "driver hashes these differently (e.g. 3 vs 3.0)"
        )
