"""Scalar function families: string, date/time, math, array, map, JSON,
conditional — the library the reference's T-series transforms imply
(SURVEY.md §2.2: base64, day-derivation, path formatting, null-coalesce),
generalized into a full scalar surface.

All expressions are JVM-side Catalyst built-ins (whole-stage codegen; no
Python in the hot path). Oracle parity notes are inline where Spark and
DuckDB dialects differ (dayofweek origin, JSON extraction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.operators.registry import query
from distributed_video_analytics_flink_spark.sources.tables import load_table


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LOWER(p_type) AS type_lower,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           LENGTH(p_name) AS name_len,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_name, ' ', '_') AS name_snake,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           REVERSE(p_brand) AS brand_rev,
           TRIM('  ' || p_brand || ' ') AS brand_trim,
           STRPOS(p_name, 'a') AS first_a
    FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String library: case, substring, length, concat, replace, pad,
    reverse, trim, position — mirrors the reference's T9 path formatting
    (format_string, VideoProcessor.java:197-198) generalized."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
        F.instr("p_name", "a").alias("first_a"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT EXTRACT(year FROM o_orderdate)::INT AS y,
           EXTRACT(month FROM o_orderdate)::INT AS m,
           COUNT(*) AS n_orders,
           MIN(CAST(date_trunc('month', o_orderdate) AS DATE)) AS month_start,
           MIN(dayofweek(o_orderdate) + 1)::INT AS min_dow,
           MIN(EXTRACT(doy FROM o_orderdate))::INT AS min_doy,
           MIN(CAST(last_day(o_orderdate) AS DATE)) AS eom,
           MIN(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01'))::INT
               AS min_days_to_2002
    FROM orders GROUP BY 1, 2
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time library: extract, trunc, day-of-week/year, last_day,
    datediff — generalizes the reference's T8 day-derivation
    (CassandraService.java:153). Spark dayofweek is 1=Sunday; DuckDB's is
    0=Sunday, so the oracle adds 1."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min(F.to_date(F.date_trunc("month", "o_orderdate"))).alias("month_start"),
        F.min(F.dayofweek("o_orderdate")).alias("min_dow"),
        F.min(F.dayofyear("o_orderdate")).alias("min_doy"),
        F.min(F.last_day("o_orderdate")).alias("eom"),
        F.min(F.datediff(F.lit("2002-01-01").cast("date"), F.to_date("o_orderdate"))).alias(
            "min_days_to_2002"
        ),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS abs_diff,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
           CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS qty_ceil,
           SQRT(l_extendedprice) AS price_sqrt,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           GREATEST(l_tax, l_discount) AS max_rate,
           LEAST(l_tax, l_discount) AS min_rate
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math library over IEEE-exact operations (abs/floor/ceil/sqrt/mod/sign/
    greatest/least) — bit-identical across engines; libm-dependent functions
    (exp/ln/pow) are exposed by Spark but excluded from the oracle set."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_diff"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_ceil"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@query(
    "scalar_array_funcs",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3],
                           ',') AS first3_sorted
    FROM documents
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array library: split, size, distinct, contains, sort, slice, join —
    the array<T> column surface (embeddings, motion_boxes) exercised on
    document tokens."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), ",").alias(
            "first3_sorted"
        ),
    )


@query(
    "scalar_map_funcs",
    oracle="""
    SELECT event_id,
           event_type AS type_from_map,
           2 AS n_keys,
           round(value * 2 * 100) / 100.0 AS doubled_value
    FROM events WHERE event_id % 50 = 0
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map library: map_from_arrays / element_at / map_keys / transform_values.
    The oracle states the equivalent scalar result (DuckDB needs no map to
    verify the values)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 50 == 0)
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("value")),
        F.array(F.col("event_type"), F.col("value").cast("string")),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("type_from_map"),
        F.size(F.map_keys(m)).alias("n_keys"),
        (F.round(F.col("value") * 2 * 100) / 100.0).alias("doubled_value"),
    )


@query(
    "scalar_json_funcs",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
           COUNT(*) AS n,
           MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events GROUP BY 1
    """,
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the events.props payload column — the engine's
    from_json/get_json_object surface (reference F2, VideoProcessor.java:147,
    generalized from fixed POJO parsing to ad-hoc JSON)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy((k % 10).alias("k_mod")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "scalar_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 300000 THEN 'medium'
                ELSE 'large' END AS bucket,
           o_orderstatus,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1, 2
    """,
)
def scalar_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + conditional aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
        .alias("bucket")
    )
    return orders.groupBy(bucket, F.col("o_orderstatus")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "scalar_base64_roundtrip",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           left(to_base64(encode(text)), 24) AS b64_prefix
    FROM documents WHERE doc_id % 10 = 0
    """,
)
def scalar_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 + binary surface: the reference's T3/T4 transport encoding
    (VideoEventCreator.java:218-233 / MotionDetector.java:94-109) as engine
    built-ins: encode -> base64 -> md5 content hash."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    utf8 = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length(utf8).alias("n_bytes"),
        F.md5(utf8).alias("content_md5"),
        F.substring(F.base64(utf8), 1, 24).alias("b64_prefix"),
    )


@query(
    "scalar_variant_shred",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) // 25 AS k_bucket,
           COUNT(*) AS n,
           -- CAST: DuckDB SUM over ints is HUGEINT -> pandas float64; the
           -- driver would hash 3.0 against Spark's 3 (see test_driver_canon)
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
               AS sum_k,
           COUNT(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                 THEN 1 END) AS n_missing
    FROM events GROUP BY 1
    """,
)
def scalar_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads through Spark 4's VARIANT type:
    ``parse_json`` once into a binary variant, then typed ``variant_get``
    paths — the engine's modern replacement for repeated get_json_object string
    re-parsing (one parse, many typed extractions; at 100 TB the parse
    cost dominates and variant shredding amortizes it; missing paths
    yield NULL, not errors). The oracle states the same result in plain
    JSON-string semantics — VARIANT is an encoding choice, not a
    semantics change.

    Plan shape matters here: the typed paths are shredded to PLAIN columns
    in one projection BEFORE the aggregate. Referencing variant_get
    expressions directly inside groupBy/agg lets CollapseProject inline
    them, and parse_json then re-executes per reference and per aggregate
    phase — measured 15.4 s vs 1.1 s at sf0.1 (14x) for the inlined form.
    Shred first, aggregate plain columns after."""
    ev = load_table(spark, sf_dir, "events")
    shredded = ev.select(
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
        F.expr("variant_get(parse_json(props), '$.missing', 'string')").alias("m"),
    )
    return shredded.groupBy((F.col("k") / F.lit(25)).cast("int").alias("k_bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.count(F.when(F.col("m").isNull(), 1)).alias("n_missing"),
    )


def _zorder_query():
    from distributed_video_analytics_flink_spark.functions.zorder import (
        duck_zorder2,
        zorder2,
    )

    @query(
        "scalar_zorder_key",
        oracle=f"""
        SELECT event_id, user_id,
               CAST(dayofyear(ts) AS BIGINT) AS doy,
               {duck_zorder2("user_id", "CAST(dayofyear(ts) AS BIGINT)")}
                 AS zkey
        FROM events
        """,
    )
    def scalar_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Morton (Z-order) key over (user_id, day-of-year) — the
        multi-dimensional clustering key for write-time layout
        (functions/zorder.py; the data-skipping payoff is measured on real
        parquet row-group stats in tests/test_zorder.py). Pure codegen'd
        bit arithmetic, hash-exact across engines."""
        ev = load_table(spark, sf_dir, "events")
        doy = F.dayofyear("ts").cast("long")
        return ev.select(
            "event_id",
            "user_id",
            doy.alias("doy"),
            zorder2(F.col("user_id"), doy).alias("zkey"),
        )

    return scalar_zorder_key


_zorder_query()
