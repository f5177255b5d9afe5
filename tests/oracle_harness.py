"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its oracle SQL side by side on the same
parquet tables and compares row count, column names, and an
order-insensitive value fingerprint (rows are canonicalized to strings,
sorted, hashed). Keeping this strict locally means driver-side hash
mismatches are caught before a round ends.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
import os

import duckdb

from distributed_video_analytics_flink_spark.schemas import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v) -> str:
    """Canonical string for a cell value, tolerant of cross-engine type
    width differences (int vs long, Decimal vs float) but NOT of value
    differences."""
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr keeps full double precision; -0.0 normalized
        return repr(v + 0.0)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    # Decimal and others: normalize numerics through float when exact
    try:
        f = float(v)
        if f == int(f):
            return str(int(f))
        return repr(f)
    except (TypeError, ValueError):
        return str(v)


def fingerprint(columns: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("|".join(_canon(row[i]) for i in order) for row in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()
    result = {
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "spark_cols": sorted(c.lower() for c in spark_cols),
        "duck_cols": sorted(c.lower() for c in duck_cols),
        "rowcount_match": len(spark_rows) == len(duck_rows),
        "schema_match": sorted(c.lower() for c in spark_cols)
        == sorted(c.lower() for c in duck_cols),
    }
    result["hash_match"] = (
        result["rowcount_match"]
        and result["schema_match"]
        and fingerprint(spark_cols, spark_rows) == fingerprint(duck_cols, duck_rows)
    )
    return result


def diff_sample(spark_df, con: duckdb.DuckDBPyConnection, sql: str, limit: int = 5):
    """First few canonicalized rows unique to each side (debug helper)."""
    spark_cols = spark_df.columns
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    s_rows = {
        "|".join(_canon(tuple(r)[i]) for i in order) for r in spark_df.collect()
    }
    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    d_rows = {"|".join(_canon(row[i]) for i in dorder) for row in rel.fetchall()}
    return sorted(s_rows - d_rows)[:limit], sorted(d_rows - s_rows)[:limit]
