"""Relational core: scans, joins (all families), aggregations, window
functions, sorts/limits, set operations, subqueries, sessionization.

The reference implements none of these (SURVEY.md §2.9 — no joins, no SQL
windows, no set ops; its only aggregation is a windowed count,
``VideoEventCreator.java:69-90``); the engine exposes them as the query
surface the reference's data model implies, all as Catalyst built-ins so
predicate pushdown / column pruning / join selection / AQE come for free.

Scale notes (100 TB): dimension joins broadcast (region/nation/supplier/part
stay far below the threshold even at sf100), fact-fact joins shuffle on their
key once, aggregations are partial (map-side combine), AQE handles skew and
partition coalescing at runtime.

Oracle determinism: money aggregates use exact integer-cents arithmetic
(functions.portable) so Spark and DuckDB agree bit-for-bit; every LIMIT is
preceded by a total order (unique-key tie-break); timestamps in row-level
outputs are emitted as epoch microseconds (unix_micros <-> epoch_us).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.functions.portable import (
    avg_money,
    cents,
    duck_avg_money,
    duck_sum_money,
    sum_money,
)
from distributed_video_analytics_flink_spark.operators.registry import query
from distributed_video_analytics_flink_spark.sources.tables import load_table


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


def _disc_bp() -> F.Column:
    """(100 - discount-in-hundredths) as exact integer basis points."""
    return 100 - F.round(F.col("l_discount") * 100).cast("long")


def _tax_bp() -> F.Column:
    return 100 + F.round(F.col("l_tax") * 100).cast("long")


# --------------------------------------------------------------------------
# Scans / filter / project
# --------------------------------------------------------------------------
@query(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate < TIMESTAMP '1998-04-01'
      AND l_discount >= 0.05
    """,
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicate scan. Both the filters and the 4-column
    projection reach the parquet reader (PushedFilters / ReadSchema in
    .explain) — at 100 TB this reads a fraction of the table."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _ts("1998-01-01"))
        & (F.col("l_shipdate") < _ts("1998-04-01"))
        & (F.col("l_discount") >= 0.05)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {duck_sum_money("l_quantity", "sum_qty")},
           {duck_sum_money("l_extendedprice", "sum_base_price")},
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
               AS sum_disc_price,
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))
               * (100 + CAST(round(l_tax * 100) AS BIGINT))) / 1000000.0
               AS sum_charge,
           {duck_avg_money("l_quantity", "avg_qty")},
           {duck_avg_money("l_extendedprice", "avg_price")},
           {duck_avg_money("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the hash-aggregate workhorse. Partial
    aggregation means the shuffle carries only |groups| x |partitions| rows
    regardless of input size."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= _ts("2001-09-01"))
    ext_c = cents("l_extendedprice")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        sum_money("l_quantity", "sum_qty"),
        sum_money("l_extendedprice", "sum_base_price"),
        (F.sum(ext_c * _disc_bp()) / 10000.0).alias("sum_disc_price"),
        (F.sum(ext_c * _disc_bp() * _tax_bp()) / 1000000.0).alias("sum_charge"),
        avg_money("l_quantity", "avg_qty"),
        avg_money("l_extendedprice", "avg_price"),
        avg_money("l_discount", "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "forecast_revenue",
    oracle="""
    SELECT SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style selective scan-aggregate — all four predicates reach
    the parquet scan; a single global agg with map-side partials."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    return li.filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & F.col("l_discount").between(0.04, 0.06)
        & (F.col("l_quantity") < 24)
    ).agg((F.sum(cents("l_extendedprice") * disc_c) / 10000.0).alias("revenue"))


# --------------------------------------------------------------------------
# Flagship (SURVEY.md §7.2): detections per camera per day analog
# --------------------------------------------------------------------------
@query(
    "events_per_user_day",
    oracle="""
    SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
    FROM events GROUP BY user_id, CAST(ts AS DATE)
    """,
)
def events_per_user_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: detections-per-camera-per-day — the exact read path the
    reference's Cassandra layout serves (partition key (camera_id, day),
    CassandraService.java:139-140), over the events stream-table analog."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )


# --------------------------------------------------------------------------
# Join families
# --------------------------------------------------------------------------
@query(
    "join_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
               AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
)
def join_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style 3-way equi-join + agg + deterministic top-k."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < _ts("1998-01-01"))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > _ts("1998-01-01"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(cents("l_extendedprice") * _disc_bp()) / 10000.0).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.to_date("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "join_broadcast_dims",
    oracle="""
    SELECT r_name AS region, n_name AS nation,
           COUNT(*) AS n_suppliers,
           SUM(CAST(round(s_acctbal * 100) AS BIGINT)) / 100.0 AS total_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dim joins with explicit broadcast hints: zero shuffle on
    the fact side — the pattern every 100 TB dim join should compile to."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            sum_money("s_acctbal", "total_acctbal"),
        )
    )


@query(
    "join_region_revenue",
    oracle="""
    SELECT n_name AS nation,
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
               AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
)
def join_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way join: local-supplier revenue by nation. Facts
    shuffle on custkey/orderkey; supplier/nation/region broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1999-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(sup),
            (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg((F.sum(cents("l_extendedprice") * _disc_bp()) / 10000.0).alias("revenue"))
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           COALESCE(SUM(CAST(round(o_totalprice * 100) AS BIGINT)), 0) / 100.0
               AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping zero-order customers (count of nulls = 0,
    sum coalesced to 0)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            (F.coalesce(F.sum(cents("o_totalprice")), F.lit(0)) / 100.0).alias("total_spent"),
        )
    )


@query(
    "join_full_outer",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
               FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates with coalesced keys."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return cust.join(sup, cust.nk_c == sup.nk_s, "full_outer").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers with at least one finished order.
    Semi joins never duplicate the left side — cheaest existence check."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no orders at all."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "join_range_events",
    oracle="""
    SELECT e1.event_id AS error_id, COUNT(e2.event_id) AS followups
    FROM events e1
    LEFT JOIN events e2
      ON e2.user_id = e1.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 10 MINUTE
     AND e2.event_id <> e1.event_id
    WHERE e1.event_type = 'error'
    GROUP BY e1.event_id
    """,
)
def join_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: activity within 10 minutes after each error
    event. The equi component (user_id) keys the shuffle so the range
    predicate only scans within each user's rows — the scalable form of a
    range join (never a full cross product)."""
    ev = load_table(spark, sf_dir, "events")
    e1 = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("u1"),
        F.col("ts").alias("t1"),
    )
    e2 = ev.select(
        F.col("event_id").alias("e2_id"), F.col("user_id").alias("u2"), F.col("ts").alias("t2")
    )
    cond = (
        (e2.u2 == e1.u1)
        & (e2.t2 > e1.t1)
        & (e2.t2 <= e1.t1 + F.expr("INTERVAL 10 MINUTES"))
        & (e2.e2_id != e1.error_id)
    )
    return (
        e1.join(e2, cond, "left")
        .groupBy("error_id")
        .agg(F.count("e2_id").alias("followups"))
    )


@query(
    "join_asof_orders",
    oracle="""
    SELECT e.event_id, MAX(o.o_orderdate) AS asof_orderdate
    FROM events e
    LEFT JOIN orders o
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    GROUP BY e.event_id
    """,
)
def join_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the most recent order of the same user at
    or before the event time. Implemented as equi-join on the key + max over
    the qualifying rows — shuffle is keyed by user, so per-key fan-out stays
    bounded; a sort-merge as-of (pd.merge_asof via applyInPandas) is the
    alternative for dense keys (see streaming module)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    cond = (orders.o_custkey == ev.user_id) & (orders.o_orderdate <= ev.ts)
    return (
        ev.join(orders, cond, "left")
        .groupBy("event_id")
        .agg(F.max("o_orderdate").alias("asof_orderdate"))
    )


# --------------------------------------------------------------------------
# Aggregation families
# --------------------------------------------------------------------------
@query(
    "agg_distinct",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events GROUP BY event_type
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (expand + two-phase agg under the hood)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        sum_money("value", "total_value"),
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.75) AS q75,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (sort-based; Spark percentile == DuckDB
    quantile_cont, both linear-interpolated). l_quantity values are small
    integers, so the interpolation arithmetic is exact in doubles and the
    hash comparison is safe. At 100 TB the approx_percentile sketch
    (agg_approx_distinct) replaces this; the exact form is the oracle
    anchor."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@query(
    "subquery_exists",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
    GROUP BY c_mktsegment
    """,
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL surface (Catalyst
    rewrites both to semi/anti joins — same physical shape as join_semi /
    join_anti, declared here as SQL to pin the subquery-handling path)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
        GROUP BY c_mktsegment
        """
    )


@query(
    "agg_salted_hot_keys",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events GROUP BY event_type
    """,
)
def agg_salted_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for skewed keys: phase 1 groups by
    (key, salt) — spreading each hot key over 16 reducers — phase 2 merges
    the partials per key. Result is identical to a plain GROUP BY (the
    oracle states exactly that); the technique is what survives a key that
    owns 30% of 100 TB, where a single reducer would OOM or straggle. Exact
    cents arithmetic keeps the two-phase SUM bit-equal to the one-phase
    oracle regardless of partial grouping."""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(cents("value")).alias("pv_cents"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        (F.sum("pv_cents") / 100.0).alias("total_value"),
    )


@query("agg_approx_distinct")  # HLL sketches differ across engines: rows-only check
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB substitute for
    exact COUNT(DISTINCT): no expand, constant memory per group. Sketch
    values are engine-specific, so no value oracle (driver does rows-only)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_suppliers"),
        F.expr("approx_percentile(l_extendedprice, 0.5)").alias("median_price_approx"),
    )


@query(
    "agg_approx_distinct_checked",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_suppliers,
           TRUE AS parts_within_5pct,
           TRUE AS suppliers_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-checked twin of agg_approx_distinct (VERDICT r4 item 6):
    the HLL++ sketch value itself is engine-specific, but |approx - exact|
    / exact <= 5% is an engine-independent BOOLEAN — so the driver's hash
    compare now asserts the sketch's accuracy contract instead of skipping
    it (the oracle emits literal TRUE; a sketch drifting past tolerance
    hash-mismatches the round). 5% is the default rsd of
    approx_count_distinct; HLL++ is hash-deterministic per dataset, so the
    booleans are stable. The exact counts ride along as the value anchor.
    At 100 TB the exact COUNT(DISTINCT) legs run only at validation SF —
    production uses the sketch alone (see agg_approx_distinct)."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_suppliers"),
        F.approx_count_distinct("l_partkey").alias("ap_parts"),
        F.approx_count_distinct("l_suppkey").alias("ap_supp"),
    )

    def _within(approx: str, exact: str):
        return (
            F.abs(F.col(approx) - F.col(exact)) <= 0.05 * F.col(exact)
        )

    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_suppliers",
        _within("ap_parts", "exact_parts").alias("parts_within_5pct"),
        _within("ap_supp", "exact_suppliers").alias("suppliers_within_5pct"),
    )


@query(
    "agg_approx_percentile_checked",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS p50_in_rank_band,
           TRUE AS p95_in_rank_band,
           TRUE AS p99_in_rank_band
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_percentile_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-checked twin of agg_approx_percentile: the GK sketch's
    guarantee is a RANK bound (error <= n/accuracy = 0.01% at accuracy
    10000), so each approximate percentile must land between the exact
    p±5% rank percentiles — an engine-independent boolean the driver can
    hash-check against literal TRUE (see agg_approx_distinct_checked for
    the pattern). The exact-percentile legs are the validation-SF anchor;
    production keeps only the mergeable sketch."""
    li = load_table(spark, sf_dir, "lineitem")
    ap = "approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 10000)"
    ex = "percentile(l_extendedprice, array(0.45, 0.55, 0.93, 0.97, 1.0))"
    agg = li.groupBy("l_returnflag").agg(
        F.expr(ap).alias("ap"),
        F.expr(ex).alias("ex"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    band = lambda i, lo, hi: F.element_at("ap", i).between(  # noqa: E731
        F.element_at("ex", lo), F.element_at("ex", hi)
    )
    return agg.select(
        "l_returnflag",
        "n_rows",
        band(1, 1, 2).alias("p50_in_rank_band"),
        band(2, 3, 4).alias("p95_in_rank_band"),
        band(3, 4, 5).alias("p99_in_rank_band"),
    )


@query(
    "agg_rollup",
    oracle="""
    WITH o AS (SELECT EXTRACT(year FROM o_orderdate)::INT AS order_year,
                      o_orderpriority, o_totalprice
               FROM orders)
    SELECT order_year, o_orderpriority,
           COUNT(*) AS n_orders,
           SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total,
           2 * GROUPING(order_year) + GROUPING(o_orderpriority) AS gid
    FROM o
    GROUP BY ROLLUP (order_year, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (year -> priority -> grand total) with a
    grouping-id tag distinguishing subtotal levels."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    return orders.rollup("order_year", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        sum_money("o_totalprice", "total"),
        (2 * F.grouping("order_year") + F.grouping("o_orderpriority")).alias("gid"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations of (status, priority)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), sum_money("o_totalprice", "total")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface (temp view + spark.sql)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               SUM(CAST(round(l_quantity * 100) AS BIGINT)) / CAST(100 AS DOUBLE)
                   AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 3)
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(*) AS n,
           SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
           MIN(CAST(l_shipdate AS DATE)) AS first_ship,
           MAX(CAST(l_shipdate AS DATE)) AS last_ship
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/count over numerics and dates (order statistics are exact and
    order-independent, so raw doubles are safe here)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("n"),
        sum_money("l_quantity", "sum_qty"),
        F.min(F.to_date("l_shipdate")).alias("first_ship"),
        F.max(F.to_date("l_shipdate")).alias("last_ship"),
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------
@query(
    "window_ranking",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS prank,
           CUME_DIST() OVER w AS cdist,
           LAG(o_orderkey) OVER w AS prev_orderkey,
           LEAD(o_orderkey) OVER w AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking, distribution (ntile/percent_rank/cume_dist — integer-ratio
    results, exact across engines), and offset window functions over a
    deterministic total order."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@query(
    "window_frames",
    oracle="""
    SELECT o_orderkey, o_custkey,
           SUM(CAST(round(o_totalprice * 100) AS BIGINT))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
               AS running_total,
           SUM(CAST(round(o_totalprice * 100) AS BIGINT))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) / 100.0
               AS moving_3
    FROM orders
    """,
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate window functions with explicit ROWS frames (running total,
    3-row moving sum), exact-cents for cross-engine determinism."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    c = cents("o_totalprice")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        (F.sum(c).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)) / 100.0).alias(
            "running_total"
        ),
        (F.sum(c).over(w.rowsBetween(-2, W.currentRow)) / 100.0).alias("moving_3"),
    )


@query(
    "window_distribution_funcs",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           NTILE(10) OVER w AS decile,
           CUME_DIST() OVER w AS cd,
           PERCENT_RANK() OVER w AS pr
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / cume_dist / percent_rank)
    per order priority. The ORDER BY carries o_orderkey as a tiebreaker:
    ntile assigns ties arbitrarily without it, which would make results
    partitioning-dependent — the determinism rule every windowed query
    here follows. cume_dist/percent_rank values are exact integer ratios,
    safe to hash across engines."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(10).over(w).alias("decile"),
        F.cume_dist().over(w).alias("cd"),
        F.percent_rank().over(w).alias("pr"),
    )


@query(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number — the scalable top-k (no global sort;
    Spark pushes a per-partition rank limit before the shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id, COUNT(*) AS n_events,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
    FROM sessions GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag + gap flag + running sum = session ids,
    then per-session aggregates. One shuffle on user_id serves both the
    window and the final groupBy.

    The gap is computed in microseconds (unix_micros), not seconds-truncated
    casts, so the 30-minute boundary is exactly the oracle's
    ``INTERVAL 30 MINUTE`` comparison (a 1800.4 s gap must NOT split)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag(F.col("ts")).over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull() | (gap_us > 30 * 60 * 1_000_000),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )


@query(
    "sessionize_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sessions AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS sid
      FROM flagged)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def sessionize_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE session_window (the streaming-
    capable twin of sessionize_events' lag/running-sum formulation): one
    groupBy merges overlapping [ts, ts+30min) windows per user — no window
    function pass, so the whole thing is a single partial-aggregable
    shuffle, and the identical expression runs under readStream with a
    watermark (tests/test_streaming.py pins the streaming twin).

    Boundary semantics, pinned by the oracle and by
    tests/test_streaming.py::test_streaming_session_windows: Spark MERGES
    an event landing exactly on the previous session's end (gap == 30 min
    chains; only gap > 30 min splits) — the same rule as the lag-based
    sessionize_events, so both formulations are value-identical and the
    oracle reuses the `> 30 min` comparison."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# Sort / limit / top-k
# --------------------------------------------------------------------------
@query(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark compiles orderBy+limit to TakeOrderedAndProject —
    per-partition heaps + driver merge, no full sort at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------
@query(
    "set_union",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): high-balance customers plus big-order customers."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    b = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.union(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers having both open and finished orders."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customer keys that never ordered (set-op form of anti join)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return cust.exceptAll(orders).distinct()


# --------------------------------------------------------------------------
# Subqueries & conditional aggregation (pivot)
# --------------------------------------------------------------------------
@query(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (
      SELECT 2 * (SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0
                  / COUNT(*))
      FROM orders)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (orders above 2x the mean price),
    via the SQL surface; the exact-cents mean keeps the cut deterministic."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (
          SELECT 2 * (SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                      / CAST(100 AS DOUBLE) / COUNT(*))
          FROM orders)
        """
    )


@query(
    "pivot_event_counts",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (explicit value list — never let pivot scan for distinct values
    at scale) to per-user event-type counts."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
    )
    # pivot yields nulls for absent combos; normalize to 0 like FILTER counts
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ["click", "view", "purchase", "signup", "error"]],
    )


@query(
    "unpivot_event_stats",
    oracle="""
    WITH agg AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
      FROM events GROUP BY event_type
    )
    SELECT event_type, 'n_events' AS metric, n_events AS amount FROM agg
    UNION ALL
    SELECT event_type, 'total_cents' AS metric, total_cents AS amount FROM agg
    """,
)
def unpivot_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide metrics -> long (metric, amount) rows) — the inverse
    of pivot_event_counts, via the native ``DataFrame.unpivot`` (Catalyst
    Expand node: each input row fans out JVM-side, no shuffle added on top
    of the aggregation). Amounts are exact integer cents so long-format
    rows hash identically across engines."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents("value")).alias("total_cents"),
    )
    return agg.unpivot(
        ids=["event_type"],
        values=["n_events", "total_cents"],
        variableColumnName="metric",
        valueColumnName="amount",
    )


@query(
    "timeseries_gapfill",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, MIN(hr) AS hr_min, MAX(hr) AS hr_max FROM hourly
      GROUP BY user_id
    ),
    spine AS (
      SELECT s.user_id, g.hr
      FROM span s, LATERAL (
        SELECT unnest(generate_series(s.hr_min, s.hr_max,
                                      INTERVAL 1 HOUR)) AS hr) g
    )
    SELECT sp.user_id, sp.hr, COALESCE(h.n_events, 0) AS n_events
    FROM spine sp LEFT JOIN hourly h
      ON sp.user_id = h.user_id AND sp.hr = h.hr
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a per-user hourly calendar spine
    (``sequence`` + ``explode`` over each user's [first, last] hour) left-
    joined to observed counts, absent hours coalesced to 0 — the densify
    step before any rolling-window model over sparse event streams.

    Scale shape: the spine is GENERATED, not shuffled — sequence/explode
    fan out JVM-side from one tiny span row per user; the only shuffles
    are the two user-keyed aggregations and the (user, hour) equi-join.
    Span explosion is bounded by time range, not event count, so a 100 TB
    events table with a 1-year horizon yields <=8784 spine rows per user
    regardless of event volume."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select("user_id", F.date_trunc("hour", "ts").alias("hr"))
        .groupBy("user_id", "hr")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    span = hourly.groupBy("user_id").agg(
        F.min("hr").alias("hr_min"), F.max("hr").alias("hr_max")
    )
    spine = span.select(
        "user_id",
        F.explode(
            F.sequence("hr_min", "hr_max", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr"),
    )
    return spine.join(hourly, ["user_id", "hr"], "left").select(
        "user_id", "hr", F.coalesce("n_events", F.lit(0)).alias("n_events")
    )


@query(
    "events_ohlc_hourly",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           arg_min(value, ts) AS open_v,
           MAX(value) AS high_v,
           MIN(value) AS low_v,
           arg_max(value, ts) AS close_v,
           COUNT(*) AS n_events,
           {duck_sum_money("value", "volume")}
    FROM events GROUP BY 1, 2
    """,
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series OHLC rollup (the hypertable/candlestick aggregate):
    open/close via min_by/max_by on the event time — ts is globally unique
    in this data; with colliding timestamps the ordering key would become
    struct(ts, event_id) on both engines — high/low as plain extremes, and
    an order-independent exact-cents volume sum. One partial-aggregated
    shuffle on (hour, type); at 100 TB the bucket key prunes to the
    partition layout if events are stored partitioned by day."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(
        F.expr("min_by(value, ts)").alias("open_v"),
        F.max("value").alias("high_v"),
        F.min("value").alias("low_v"),
        F.expr("max_by(value, ts)").alias("close_v"),
        F.count(F.lit(1)).alias("n_events"),
        sum_money("value", "volume"),
    )


@query(
    "sample_hash_bernoulli",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 4)) AS INTEGER) % 10 = 0
    """,
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% Bernoulli sample keyed on a content hash — the
    reproducible sampling a training pipeline needs (rng-based sample()
    changes membership across retries/partitionings; a hash of the row key
    never does). Embarrassingly parallel: the predicate evaluates at the
    scan, no shuffle, and the same rows are selected at any cluster size."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10)
    return ev.filter(bucket.cast("long") % 10 == 0).select(
        "event_id", "user_id", "event_type", "value"
    )


@query(
    "sample_systematic_per_user",
    oracle="""
    WITH numbered AS (
      SELECT event_id, user_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      FROM events
    )
    SELECT event_id, user_id, ts FROM numbered WHERE rn % 5 = 1
    """,
)
def sample_systematic_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic per-key sampling: every 5th event per user in event-time
    order (the frame-subsampling pattern — 'keep every Nth frame per
    camera' — expressed on the events table). One shuffle on the partition
    key; the window sort is per-key, never global. ts is globally unique in
    this data, so the ordering is total."""
    ev = load_table(spark, sf_dir, "events")
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("ts"))
    return (
        ev.select("event_id", "user_id", "ts", rn.alias("rn"))
        .filter(F.col("rn") % 5 == 1)
        .drop("rn")
    )


@query("agg_approx_percentile")  # sketch internals differ per engine: rows-only
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via the KLL/GK-style mergeable sketch
    (approx_percentile) — the 100 TB alternative to agg_percentiles' exact
    holistic shuffle: sketches partial-aggregate map-side and merge in one
    reduce, so the shuffle carries fixed-size summaries instead of raw
    values. Rows-only check (DuckDB's approx_quantile uses a different
    sketch; the exact-percentile twin agg_percentiles carries the oracle).

    Output is three scalar columns, not one array<double> — the driver's
    canonicalizer (pandas sort_values) cannot sort list cells."""
    li = load_table(spark, sf_dir, "lineitem")
    ap = "approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 10000)"
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(ap).alias("ap"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "l_returnflag",
            F.element_at("ap", 1).alias("price_p50"),
            F.element_at("ap", 2).alias("price_p95"),
            F.element_at("ap", 3).alias("price_p99"),
            "n_rows",
        )
    )


@query(
    "window_sliding_counts",
    oracle="""
    WITH expanded AS (
      SELECT event_type, value,
             time_bucket(INTERVAL '2 seconds', ts) - o.off AS window_start
      FROM events,
           LATERAL (SELECT unnest([INTERVAL '0 seconds', INTERVAL '2 seconds'])
                    AS off) o
    )
    SELECT window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM expanded GROUP BY window_start, event_type
    """,
)
def window_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) event-time window: per event_type, event count and
    value total over 4-second windows advancing every 2 seconds — the
    tumbling/SLIDING/session triple's middle member (SURVEY §2.9 names all
    three; tumbling and session are covered by window_tumbling_fps /
    sessionize_session_window). Spark's window(size, slide) replicates each
    event into size/slide = 2 buckets; the oracle expands the same two
    bucket starts via time_bucket minus each slide offset. Value totals use
    integer-cents arithmetic so the double sum is order-independent.

    Scale: the expansion factor is size/slide (a small constant chosen by
    the query), then one partial-aggregable groupBy — the same shuffle
    shape as a tumbling window, 2x the rows in."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "4 seconds", "2 seconds")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents("value")) / 100.0).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# TPC-H-grade composite queries (Q7/Q10/Q17/Q18/Q19/Q22 analogs)
# --------------------------------------------------------------------------
@query(
    "join_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
               AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def join_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog: revenue lost to returns, per customer and nation.
    Join order the optimizer should pick (and the broadcast hints pin):
    lineitem filtered on returnflag is the fact side; orders joins on its
    key; customer and nation broadcast. One fact shuffle (on l_orderkey to
    meet orders), then the customer-side group-agg; the quarter-wide
    orderdate predicate prunes the orders scan before the join. LIMIT rides
    a total order (revenue, custkey tie-break) so top-20 is deterministic."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-07-01")) & (F.col("o_orderdate") < _ts("1997-10-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev_cents = cents("l_extendedprice") * _disc_bp()
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(rev_cents) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "subquery_correlated_avg",
    oracle="""
    SELECT SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT (SUM(CAST(round(l2.l_quantity * 100) AS BIGINT)) / 100.0
                / COUNT(*)) / 5.0
        FROM lineitem l2 WHERE l2.l_partkey = l_partkey)
    """,
)
def subquery_correlated_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog: small-quantity order revenue — lineitems below 20%
    of their part's average quantity. Declared through the SQL surface so
    Catalyst's subquery decorrelation runs: the correlated scalar subquery
    rewrites to an aggregate-then-join on l_partkey (one shuffle over the
    filtered fact, not a per-row subquery execution — the shape that holds
    at 100 TB). Exact-cents average and /5.0 (not *0.2) keep the cut
    bit-deterministic across engines. Divisions cast through DOUBLE: in
    Spark SQL text ``100.0`` is a DECIMAL(4,1) literal (unlike DataFrame
    ``F.lit(100.0)``), and decimal division's fixed result scale breaks
    bit-parity with the oracle's double arithmetic."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
               / CAST(100 AS DOUBLE) / CAST(7 AS DOUBLE) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (
            SELECT (SUM(CAST(round(l2.l_quantity * 100) AS BIGINT))
                    / CAST(100 AS DOUBLE) / COUNT(*)) / CAST(5 AS DOUBLE)
            FROM lineitem l2 WHERE l2.l_partkey = l_partkey)
        """
    )


@query(
    "agg_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0
             AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 > 300
    )
    SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
           o_totalprice, sum_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    """,
)
def agg_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: customers with any order totaling >300 units.
    Aggregate-then-join: the HAVING cut runs on the lineitem aggregate
    BEFORE any join (at 100 TB the survivor set is tiny — 46 rows at
    sf0.01), so the joins against orders and customer see a filtered,
    broadcastable left side rather than the raw fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg((F.sum(cents("l_quantity")) / 100.0).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        F.broadcast(big)
        .join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


@query(
    "join_disjunctive_parts",
    oracle="""
    SELECT SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
           AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def join_disjunctive_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analog: OR-of-ANDs join predicate mixing both sides.
    Catalyst splits the disjunction: the single-side implications
    (p_brand IN (...), p_size <= 35, l_quantity <= 40) are inferred and
    pushed to the scans while the cross-side residual evaluates post-join —
    the part side stays a broadcast. Declared as one boolean expression;
    no manual union-of-three-joins (which would scan the fact three
    times)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    pred = arm("Brand#12", 15, 1, 21) | arm("Brand#23", 25, 10, 30) | arm("Brand#34", 35, 20, 40)
    rev_cents = cents("l_extendedprice") * _disc_bp()
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(pred)
        .agg((F.sum(rev_cents) / 10000.0).alias("revenue"))
    )


@query(
    "subquery_decorrelated_balance",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_cust,
           SUM(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS total_bal
    FROM customer c
    WHERE c_acctbal > (
        SELECT SUM(CAST(round(c2.c_acctbal * 100) AS BIGINT)) / 100.0
               / COUNT(*)
        FROM customer c2 WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
)
def subquery_decorrelated_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog: well-funded customers with no recent orders
    (dormant accounts). Combines an uncorrelated scalar subquery (global
    positive-balance average — computed once, broadcast as a literal into
    the filter) with a NOT EXISTS
    anti-join. At scale the anti join shuffles on custkey once; the scalar
    subquery is a two-column scan-aggregate, not a per-row probe.

    NOTE: in Spark SQL text a ``100.0`` literal is DECIMAL(4,1), not DOUBLE
    (DataFrame-side ``F.lit(100.0)`` is DOUBLE) — decimal division truncates
    to a fixed scale and breaks bit-parity with the oracle, so every
    SQL-surface division here casts through DOUBLE explicitly."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_cust,
               SUM(CAST(round(c_acctbal * 100) AS BIGINT))
               / CAST(100 AS DOUBLE) AS total_bal
        FROM customer c
        WHERE c_acctbal > (
            SELECT SUM(CAST(round(c2.c_acctbal * 100) AS BIGINT))
                   / CAST(100 AS DOUBLE) / COUNT(*)
            FROM customer c2 WHERE c2.c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_mktsegment
        """
    )


@query(
    "join_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
               AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS INTEGER)
    """,
)
def join_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog: bilateral trade volume between two nations by ship
    year — a 6-table join with a cross-side disjunctive nation predicate.
    Shape at 100 TB: supplier/customer/nation broadcast (nation twice,
    under different aliases); lineitem shuffles once to meet orders; the
    two-year shipdate range prunes the fact scan. The nation-pair
    disjunction evaluates post-join on broadcast columns — no fact-side
    re-scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    rev_cents = cents("l_extendedprice") * _disc_bp()
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg((F.sum(rev_cents) / 10000.0).alias("revenue"))
    )


@query(
    "subquery_not_in_nulls",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_not_in,
           COUNT(CASE WHEN o_custkey NOT IN
                 (SELECT NULLIF(c_custkey, c_custkey) FROM customer
                  WHERE c_acctbal < 0)
                 THEN 1 END) AS n_null_poisoned
    FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    GROUP BY o_orderstatus
    """,
)
def subquery_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN three-valued logic, pinned: the WHERE leg is a null-free NOT
    IN (orders whose customer never dipped below zero — Catalyst plans a
    null-aware anti join), while the n_null_poisoned column runs the same
    predicate against an all-NULL subquery and must count ZERO rows on
    every engine — x NOT IN (NULL, ...) is never TRUE under SQL 3VL.
    Engines (and hand-rolled rewrites to plain anti joins) classically get
    this wrong; the driver hash locks it. At scale the null-aware anti
    join broadcasts the (small, deduplicated) subquery side."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n_not_in,
               COUNT(CASE WHEN o_custkey NOT IN
                     (SELECT NULLIF(c_custkey, c_custkey) FROM customer
                      WHERE c_acctbal < 0)
                     THEN 1 END) AS n_null_poisoned
        FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        GROUP BY o_orderstatus
        """
    )


@query(
    "agg_hll_union_checked",
    oracle="""
    WITH per_seg AS (
      SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS nations
      FROM customer GROUP BY c_mktsegment
    )
    SELECT CAST((SELECT COUNT(DISTINCT c_custkey) FROM customer) AS BIGINT)
               AS exact_global,
           CAST((SELECT COUNT(*) FROM per_seg) AS BIGINT) AS n_segments,
           TRUE AS union_within_5pct
    """,
)
def agg_hll_union_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting: per-segment Apache DataSketches
    HLL sketches (``hll_sketch_agg``) unioned into a global estimate
    (``hll_union_agg`` + ``hll_sketch_estimate``) — THE 100 TB pattern for
    distinct counts over partitioned/incremental data: build sketches per
    partition/day, merge bytes, never rescan. The driver-checked contract
    is the engine-independent boolean |union_estimate - exact|/exact <= 5%
    (lgK=12 → ~1.6% rse; deterministic per dataset), with the exact global
    count and segment count as value anchors. Production keeps only the
    sketch legs; the exact leg exists at validation SF."""
    cust = load_table(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("customer")
    out = spark.sql(
        """
        WITH sk AS (
          SELECT c_mktsegment, hll_sketch_agg(c_custkey) AS s
          FROM customer GROUP BY c_mktsegment
        ),
        u AS (
          SELECT hll_sketch_estimate(hll_union_agg(s)) AS est,
                 COUNT(*) AS n_segments
          FROM sk
        ),
        ex AS (SELECT COUNT(DISTINCT c_custkey) AS exact_global FROM customer)
        SELECT ex.exact_global,
               u.n_segments,
               abs(u.est - ex.exact_global) <= 0.05 * ex.exact_global
                   AS union_within_5pct
        FROM u CROSS JOIN ex
        """
    )
    return out


@query(
    "join_sole_late_supplier",
    oracle="""
    SELECT s_suppkey, s_name,
           COUNT(DISTINCT l1.l_orderkey) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders    ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_suppkey, s_name
    ORDER BY numwait DESC, s_suppkey ASC
    LIMIT 20
    """,
)
def join_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog: suppliers who were the SOLE late shipper on
    multi-supplier finished orders — the hardest classic TPC-H shape: a
    fact self-referenced three ways (base + EXISTS + NOT EXISTS), with the
    anti-join leg correlated on BOTH the order key and the outer query's
    o_orderdate. Declared through the SQL surface so Catalyst plans the
    semi/anti joins itself: all three legs key on l_orderkey, so at 100 TB
    they share one shuffle partitioning of lineitem; supplier broadcasts.
    Counting DISTINCT orderkeys (not raw l1 rows) keeps the metric
    well-defined under multi-lineitem supplier-order pairs."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT s_suppkey, s_name,
               COUNT(DISTINCT l1.l_orderkey) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders    ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_suppkey, s_name
        ORDER BY numwait DESC, s_suppkey ASC
        LIMIT 20
        """
    )


@query(
    "events_funnel_steps",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
    )
    SELECT CASE WHEN p.user_id IS NOT NULL THEN 3
                WHEN c.user_id IS NOT NULL THEN 2
                WHEN v.user_id IS NOT NULL THEN 1
                ELSE 0 END AS funnel_stage,
           COUNT(*) AS n_users
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN v ON u.user_id = v.user_id
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    GROUP BY 1
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view -> click -> purchase, strictly
    event-time ordered): per user, the deepest funnel stage reached, then
    user counts per stage. Each stage is an anchored conditional minimum —
    'first click AFTER the first view', not co-occurrence — which is what
    distinguishes funnel analytics from a pivot count. Every join and
    aggregate keys on user_id, so at 100 TB the whole query is one
    shuffle partitioning reused across stages (AQE coalesces the tiny
    stage outputs); no window sort over the raw event stream is needed."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    users = ev.select("user_id").distinct()
    stage = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(stage.alias("funnel_stage"))
        .groupBy("funnel_stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT cohort_day, day_offset, COUNT(*) AS n_active
    FROM activity WHERE day_offset <= 14
    GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted as
    active per day-offset into their own lifetime — the second standard
    product-analytics shape next to events_funnel_steps (per-entity anchor
    + relative time bucketing + distinct-activity counting). Everything
    keys on user_id until the final tiny (cohort, offset) aggregate: the
    anchor aggregate, the join back, and the per-user-day distinct all
    reuse one shuffle partitioning; at 100 TB the retention matrix itself
    is ~cohorts x horizon rows — broadcastable output from a single fact
    pass."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias("day_offset"),
        )
        .filter(F.col("day_offset") <= 14)
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )


@query(
    "recursive_date_spine",
    oracle="""
    WITH RECURSIVE bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
      FROM events
    ),
    spine(day, hi) AS (
      SELECT lo, hi FROM bounds
      UNION ALL
      SELECT day + 1, hi FROM spine WHERE day < hi
    )
    SELECT s.day, COUNT(e.event_id) AS n_events
    FROM spine s LEFT JOIN events e ON CAST(e.ts AS DATE) = s.day
    GROUP BY s.day
    """,
)
def recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive common table expression — Spark 4's WITH RECURSIVE —
    generating a gap-free calendar spine from the data's own bounds, then
    left-joining per-day event counts (zero-filled on silent days). The
    recursion carries its own bound (``hi`` rides along in the working
    table) since Spark's recursive step supports UNION ALL only and no
    correlated subqueries; each iteration adds one day, so the row count
    is the date span — bounded, acyclic, deterministic. This pins the
    recursive-SQL surface itself; for unbounded-iteration workloads
    (connected components) the engine uses the two-star DataFrame loop
    (dedup.py), which converges by fixpoint rather than a depth cap."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH RECURSIVE bounds AS (
          SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
          FROM events
        ),
        spine(day, hi) AS (
          SELECT lo, hi FROM bounds
          UNION ALL
          SELECT date_add(day, 1), hi FROM spine WHERE day < hi
        )
        SELECT s.day, COUNT(e.event_id) AS n_events
        FROM spine s LEFT JOIN events e ON CAST(e.ts AS DATE) = s.day
        GROUP BY s.day
        """
    )


# --------------------------------------------------------------------------
# TPC-H-grade composite queries, block 2 (Q2/Q8/Q13/Q14/Q15/Q16 analogs)
# --------------------------------------------------------------------------
@query(
    "join_customer_orders_histogram",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT n_orders, COUNT(*) AS n_customers
    FROM per_cust
    GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
)
def join_customer_orders_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog: distribution of order counts per customer,
    including zero-order customers (the reason this is an OUTER join — an
    inner join would silently drop the n_orders=0 bucket). The filter on
    the orders side lives in the join condition, not a WHERE (a WHERE on
    the right side of a left join would turn it inner).

    Scale: orders pre-aggregates per custkey AFTER the join, but the first
    groupBy is on the join key itself so Catalyst reuses the join exchange
    (one shuffle on custkey total); the second aggregation's input is one
    row per customer and its key space (distinct order counts) is tiny, so
    the final shuffle is negligible. No broadcast: both sides are fact-
    scale at 100 TB, and the join key is the natural partitioning."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


@query(
    "agg_promo_revenue_share",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           (100.0 * SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT))
                 ELSE 0 END))
             / SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)))
             AS promo_share_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY ship_month
    ORDER BY ship_month
    """,
)
def agg_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog, widened to a monthly series: percentage of
    discounted revenue coming from promo-type parts. The conditional
    aggregate (CASE inside SUM) computes both the numerator and the
    denominator in ONE pass over the joined fact — the naive two-query
    formulation would scan lineitem twice.

    Scale: part broadcasts (dimension); the year-wide shipdate predicate
    is pushed to the parquet scan; the group key space is 12 months so the
    final exchange is trivial. Share arithmetic: both sums are exact
    integer cents x basis points, and the single double division at the
    end is bit-identical cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = cents("l_extendedprice") * _disc_bp()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("long"))
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            ((F.lit(100.0) * F.sum(promo)) / F.sum(rev)).alias("promo_share_pct")
        )
        .orderBy("ship_month")
    )


@query(
    "join_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT)))
               AS rev_cents_bp
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-10-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, rev_cents_bp / 10000.0 AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE rev_cents_bp = (SELECT MAX(rev_cents_bp) FROM rev)
    ORDER BY s_suppkey
    """,
)
def join_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analog: the supplier(s) with maximum revenue over a
    quarter. The revenue view is computed ONCE and reused for both the
    max-scalar and the final filter (Q15's CREATE VIEW discipline): here
    the per-supplier aggregate is a DataFrame reused on both sides, with
    the 1-row global max broadcast into an equi-join — no second scan of
    lineitem, no window over the whole aggregate. Ties: the integer
    revenue comparison keeps ALL maximal suppliers (Q15 semantics), and
    the unique-key ORDER BY makes the output deterministic regardless.

    Scale: the quarter predicate prunes the fact scan; one shuffle on
    l_suppkey for the aggregate; the max side is one row (broadcast); the
    supplier dimension joins broadcast. Revenue compares in exact integer
    cents x bp — a double comparison could split engines on ties."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-10-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(cents("l_extendedprice") * _disc_bp()).alias("rev_cents_bp")
    )
    mx = rev.agg(F.max("rev_cents_bp").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("rev_cents_bp") == F.col("mx"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_cents_bp") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "join_market_share",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
           (100.0 * SUM(CASE WHEN n2.n_name = 'NATION_3'
                 THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT))
                 ELSE 0 END))
             / SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)))
             AS mkt_share_pct
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'EUROPE'
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def join_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog: NATION_3 suppliers' share of revenue sold into
    EUROPE-region customers, per order year. Six joins, but only ONE is
    fact-fact (lineitem-orders); customer, supplier, region and BOTH
    nation roles (customer's nation for the region gate, supplier's nation
    for the share split) broadcast under distinct aliases. The region
    predicate semi-reduces customers before the fact join ever sees them.

    Scale: one shuffle (l_orderkey vs o_orderkey); everything else is a
    map-side hash probe. The share is a conditional-aggregate ratio in
    exact integer units with one final double division."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    rev = cents("l_extendedprice") * _disc_bp()
    share = F.when(F.col("n2.n_name") == "NATION_3", rev).otherwise(
        F.lit(0).cast("long")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2.n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(((F.lit(100.0) * F.sum(share)) / F.sum(rev)).alias("mkt_share_pct"))
        .orderBy("o_year")
    )


@query(
    "join_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#23'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def join_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog: how many distinct suppliers ship each surviving
    (brand, type, size) part group, excluding suppliers in deficit. The
    NOT IN subquery is declared as an explicit broadcast ANTI join on a
    provably-null-free key (s_suppkey is a primary key), sidestepping the
    three-valued-logic trap that `subquery_not_in_nulls` pins.

    Scale: the three part-side predicates prune the part scan (dimension,
    broadcast); the deficit-supplier exclusion list is far smaller than
    supplier itself (broadcast anti). One fact shuffle for the distinct
    aggregate — Spark's two-level distinct expansion keeps it partial-
    aggregable map-side."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#23")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25))
    )
    li = load_table(spark, sf_dir, "lineitem")
    deficit = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(deficit), F.col("l_suppkey") == F.col("s_suppkey"), "anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "subquery_best_balance_supplier",
    oracle="""
    SELECT r_name, n_name, s_name, s.s_acctbal AS s_acctbal
    FROM supplier s
    JOIN nation ON s.s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE CAST(round(s.s_acctbal * 100) AS BIGINT) = (
      SELECT MAX(CAST(round(s2.s_acctbal * 100) AS BIGINT))
      FROM supplier s2
      WHERE s2.s_nationkey = s.s_nationkey)
    ORDER BY r_name, n_name, s_name
    """,
)
def subquery_best_balance_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog (partsupp-free schema): per nation, the supplier(s)
    holding the nation's maximum account balance, dressed with region and
    nation names. Declared through the SQL surface so Catalyst's
    decorrelation handles the SELF-correlated scalar subquery (the probe
    and the aggregate read the same table — a different decorrelation
    shape from `subquery_correlated_avg`'s cross-table case): it rewrites
    to one per-nation max aggregate plus one equi-join, not a per-row
    re-scan of supplier.

    Scale: supplier scans twice (once aggregated to 25 rows, once as the
    probe side); nation/region broadcast. Balance compares in exact
    integer cents so max-ties resolve identically cross-engine."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region")
    return spark.sql(
        """
        SELECT r_name, n_name, s_name, s.s_acctbal AS s_acctbal
        FROM supplier s
        JOIN nation ON s.s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE CAST(round(s.s_acctbal * 100) AS BIGINT) = (
          SELECT MAX(CAST(round(s2.s_acctbal * 100) AS BIGINT))
          FROM supplier s2
          WHERE s2.s_nationkey = s.s_nationkey)
        ORDER BY r_name, n_name, s_name
        """
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH st AS (
      SELECT event_id, event_type, value,
             CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) AS c,
             CAST(COUNT(*) OVER w AS HUGEINT) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w
                  AS HUGEINT) AS s,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) OVER w
                  AS HUGEINT) AS q
      FROM events
      WINDOW w AS (PARTITION BY event_type)
    )
    SELECT event_id, event_type, value
    FROM st
    WHERE (c * n - s) * (c * n - s) > 9 * (q * n - s * s)
    ORDER BY event_id
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection: events more than 3 population standard deviations
    from their event_type's mean. The 3-sigma test runs in EXACT integer
    arithmetic — |c - S/n| > 3*sqrt((Qn - S^2)/n^2) is algebraically
    (cn - S)^2 > 9(Qn - S^2) with c = value-cents, S/Q/n the per-type
    sum / sum-of-squares / count — so boundary events classify identically
    on any engine and any partitioning (a double mean/stddev comparison
    can flip within an ulp of the cut). The squared terms ride 38-digit
    decimals (Spark) / HUGEINT (DuckDB): cents^2 x n^2 overflows BIGINT at
    ~billion-row types, 128-bit holds to beyond 100 TB. Each c*c term is
    cast to decimal(38,0) BEFORE the SUM so the accumulator itself is
    128-bit — summing BIGINT squares and casting only the result would
    overflow 64-bit during accumulation (ADVICE r5). Ceiling: the final
    q*n and s*s products are decimal(38,0)x(38,0); Spark caps the result
    at precision 38, so past ~10^19 summed square-cents per type (roughly
    10^14 rows of 100k-cent values) the products saturate and ANSI mode
    errors rather than returning wrong rows — at that scale shard the
    z-score by sub-population or switch the moments to doubles with an
    epsilon band.

    Scale: the per-type moments come from one unbounded window over the
    type partitioning — a single shuffle on event_type (5 values here;
    for a skewed type universe the same algebra works as a two-pass
    groupBy-then-broadcast join, trading the window's sort for a tiny
    dimension join). The filter then runs codegen'd per row."""
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    c = cents("value")
    w = W.partitionBy("event_type")
    st = ev.select(
        "event_id",
        "event_type",
        "value",
        c.cast(dec).alias("c"),
        F.count(F.lit(1)).over(w).cast(dec).alias("n"),
        F.sum(c.cast(dec)).over(w).alias("s"),
        F.sum((c * c).cast(dec)).over(w).alias("q"),
    )
    dev = F.col("c") * F.col("n") - F.col("s")
    var_n2 = F.col("q") * F.col("n") - F.col("s") * F.col("s")
    return (
        st.filter(dev * dev > F.lit(9).cast(dec) * var_n2)
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
    )


@query(
    "agg_listagg",
    oracle="""
    WITH dl AS (SELECT DISTINCT source, lang FROM documents)
    SELECT source,
           string_agg(lang, ',' ORDER BY lang) AS langs,
           COUNT(*) AS n_langs
    FROM dl
    GROUP BY source
    ORDER BY source
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — Spark 4's ANSI `LISTAGG ... WITHIN
    GROUP (ORDER BY ...)` (SPARK-42746) against DuckDB's ordered
    string_agg. The WITHIN GROUP ordering is what makes the concatenation
    deterministic (an unordered collect_list + concat_ws depends on
    partition arrival order and could never be oracle-hashed).

    Scale: distinct + per-group sort of the DISTINCT value set — fine
    when group value-cardinality is bounded (languages per source);
    for unbounded sets prefer the explode/groupBy forms that stay
    partial-aggregable. The value set pre-distincts in a CTE rather than
    via listagg(DISTINCT ...): mixing DISTINCT-listagg with a second
    distinct aggregate trips a Spark 4.1 rewrite bug (SortOrder
    ClassCastException in the distinct-expansion), and the pre-distinct
    is the better plan anyway — the sort sees unique values only."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        WITH dl AS (SELECT DISTINCT source, lang FROM documents)
        SELECT source,
               listagg(lang, ',') WITHIN GROUP (ORDER BY lang) AS langs,
               COUNT(*) AS n_langs
        FROM dl
        GROUP BY source
        ORDER BY source
        """
    )


@query(
    "join_interval_overlap",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged),
    sessions AS (
      SELECT user_id, session_id,
             epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) AS e_us
      FROM numbered GROUP BY user_id, session_id)
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           COUNT(*) AS n_pairs,
           CAST(SUM(least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us))
                AS BIGINT) AS overlap_us
    FROM sessions a JOIN sessions b
      ON a.user_id < b.user_id
     AND a.s_us <= b.e_us AND b.s_us <= a.e_us
    GROUP BY a.user_id, b.user_id
    ORDER BY user_a, user_b
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join — concurrent user sessions: which user
    pairs were active at the same time, and for how long. The ORACLE
    declares the naive theta join (sessions x sessions ON ranges
    intersect); the Spark plan is the SCALE shape: each session explodes
    into the hour buckets it covers, the self-join is an EQUI-join on
    bucket (+ user_a < user_b), and each truly-overlapping pair is
    emitted exactly once by the first-covered-bucket predicate
    (bucket == hour(max(starts)) — that instant lies inside both
    intervals, so exactly one bucket row passes; no .distinct() shuffle
    over the pair set). Matching the theta oracle proves the binned
    rewrite lossless.

    Scale: a theta join is a cartesian at 100 TB; the binned form
    shuffles O(sessions x buckets-per-session) rows on a bucket key and
    only intra-bucket pairs exist. Bucket width trades replication
    against bucket population (hour ~ the p99 session length here);
    overlap durations sum in exact integer microseconds."""
    ev = load_table(spark, sf_dir, "events")
    hour_us = 3600 * 1_000_000
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag(F.col("ts")).over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap_us > 30 * 60 * 1_000_000), 1)
        .otherwise(0),
    )
    sessions = (
        flagged.withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("s_us"),
            F.unix_micros(F.max("ts")).alias("e_us"),
        )
    )
    # materialized: the self-join would otherwise recompute the
    # sessionization window + explode once PER SIDE (plan showed 2 fact
    # scans; same discipline as dedup.py::_materialize — localCheckpoint
    # locally, reliable checkpoint/parquet stage on a cluster)
    binned = sessions.select(
        "user_id",
        "s_us",
        "e_us",
        F.explode(
            F.sequence(
                (F.col("s_us") / hour_us).cast("long"),
                (F.col("e_us") / hour_us).cast("long"),
            )
        ).alias("bucket"),
    ).localCheckpoint(eager=False)
    a, b = binned.alias("a"), binned.alias("b")
    first_bucket = F.col("a.bucket") == (
        F.greatest(F.col("a.s_us"), F.col("b.s_us")) / hour_us
    ).cast("long")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.user_id") < F.col("b.user_id"))
        & (F.col("a.s_us") <= F.col("b.e_us"))
        & (F.col("b.s_us") <= F.col("a.e_us")),
    ).filter(first_bucket)
    return (
        pairs.groupBy(
            F.col("a.user_id").alias("user_a"), F.col("b.user_id").alias("user_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                F.least(F.col("a.e_us"), F.col("b.e_us"))
                - F.greatest(F.col("a.s_us"), F.col("b.s_us"))
            ).alias("overlap_us"),
        )
        .orderBy("user_a", "user_b")
    )


@query(
    "join_interval_salted",
    oracle="""
    WITH skewed AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id END AS user_id,
             event_id, ts
      FROM events),
    flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM skewed),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged),
    sessions AS (
      SELECT user_id, session_id,
             epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) AS e_us
      FROM numbered GROUP BY user_id, session_id),
    per_session AS (
      SELECT s.user_id, s.session_id, COUNT(*) AS n_events
      FROM skewed e JOIN sessions s
        ON e.user_id = s.user_id
       AND epoch_us(e.ts) BETWEEN s.s_us AND s.e_us
      GROUP BY s.user_id, s.session_id)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events
    FROM per_session GROUP BY user_id ORDER BY user_id
    """,
)
def join_interval_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof SALTED interval join (VERDICT r10 #6) — the range-join
    twin of agg_salted_hot_keys' two-phase aggregation: events are
    enriched with their containing session (ts BETWEEN session start AND
    end, same user) under a DELIBERATELY hot key — folding the even half
    of the user population into user 0 makes one user own ~50% of all
    events and sessions, the shape where a plain user_id-keyed range
    join sends half the corpus to ONE reducer (the straggler/OOM at
    100 TB).

    The ORACLE declares the naive join (events x sessions ON user +
    range). The Spark plan is the salted shape: the event side carries
    ``salt = pmod(event_id, 16)`` and the (smaller) session side is
    replicated over all 16 salts, so the equi-key is (user_id, salt) —
    the hot user's probe rows spread over 16 tasks with a per-task bound
    of ~1/16th of the hot key (pinned with the plan by
    tests/test_salted_interval_join.py). Matching the oracle proves the
    salted rewrite lossless; the per-session and per-user rollups after
    the join are safe at any skew because partial (map-side) aggregation
    combines before the exchange.

    Scale: salting trades a 16x replication of the SESSION side (the
    small side — one row per ~30-min burst, orders of magnitude fewer
    than events) for an even spread of the event side; S=16 bounds the
    hottest task at hot_key/16 while keeping replication negligible. The
    same rewrite serves any fact-to-interval-dimension enrichment (IP ->
    CIDR block, ts -> calendar period, reading -> validity window) where
    a handful of intervals dominate the matches.

    Honest boundary: the SESSIONIZATION that builds the interval side
    here still windows by bare user_id (the hot user's timeline sorts on
    one task) — that step is this demo's fixture generator, not the
    operator under test; gap-sessionization inherently needs the full
    per-user timeline, and at 100 TB the interval dimension arrives
    precomputed (CIDR tables, validity windows, session stores). What
    this query proves scale-safe is the JOIN: the only stage whose
    volume is events x intervals."""
    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 2 == 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        "event_id",
        "ts",
    )
    n_salts = 16
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag(F.col("ts")).over(w))
    sessions = (
        ev.withColumn(
            "new_session",
            F.when(F.lag("ts").over(w).isNull() | (gap_us > 30 * 60 * 1_000_000), 1)
            .otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("s_us"),
            F.unix_micros(F.max("ts")).alias("e_us"),
        )
    )
    salted_ev = ev.select(
        F.col("user_id").alias("e_user"),
        F.unix_micros("ts").alias("ts_us"),
        F.pmod("event_id", F.lit(n_salts)).alias("salt"),
    )
    # replicate the small (session) side over every salt; the hot user's
    # events then meet their sessions in 16 independent tasks
    rep_sessions = sessions.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    per_session = (
        salted_ev.join(
            rep_sessions,
            (salted_ev["e_user"] == rep_sessions["user_id"])
            & (salted_ev["salt"] == rep_sessions["salt"])
            & F.col("ts_us").between(F.col("s_us"), F.col("e_us")),
        )
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


@query(
    "subquery_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def subquery_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog: per-priority counts of orders with at least one
    late-shipping lineitem (>30 days after the order date; this schema has
    no commitdate, so the lateness predicate adapts). Declared through the
    SQL surface so the correlated EXISTS rewrites to a LEFT SEMI join on
    l_orderkey — one fact shuffle, lineitem never multiplies the order
    rows, and the quarter predicate prunes the orders scan."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01'
          AND o_orderdate <  TIMESTAMP '1997-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "scalar_session_variable",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_discount
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-03-01'
      AND l_discount >= 0.07
    ORDER BY l_orderkey, l_linenumber
    """,
)
def scalar_session_variable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL session variables (SPARK-42849: DECLARE / SET VAR /
    direct reference in queries) — the parameterization surface scripts
    use instead of string-splicing values into SQL. The oracle inlines the
    final variable value; the Spark side must flow it through the
    variable: DECLARE, overwrite with SET VAR (0.05 -> 0.07 — a stale
    declare-default would hash-mismatch), reference it in the predicate.
    Variables resolve at analysis time, so the pushed parquet filter is
    the resolved constant — zero runtime cost."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql("DECLARE OR REPLACE VARIABLE discount_floor DOUBLE DEFAULT 0.05")
    spark.sql("SET VAR discount_floor = 0.07")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, l_discount
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-03-01'
          AND l_discount >= discount_floor
        ORDER BY l_orderkey, l_linenumber
        """
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type,
             COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           (1.0 * n) / SUM(n) OVER (PARTITION BY from_type) AS p
    FROM trans
    ORDER BY from_type, to_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences
    — the sequence-mining primitive behind funnel discovery and
    next-action models: LEAD pairs each event with its user's next one,
    transitions count per (from, to), and row-normalized probabilities
    come from a window sum over the tiny transition table.

    Scale: ONE shuffle on user_id serves the sequencing window; the
    transition aggregate is partial map-side into a |event_types|^2 key
    space (25 here), and the probability normalization windows over that
    tiny table, not the fact. Probabilities are a single integer/integer
    double division — bit-identical cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wp = W.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n",
        ((F.lit(1.0) * F.col("n")) / F.sum("n").over(wp)).alias("p"),
    ).orderBy("from_type", "to_type")


@query(
    "window_rolling_distinct_checked",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
    ),
    rolling AS (
      SELECT d.day,
             COUNT(DISTINCT e.user_id) AS exact_users
      FROM days d
      JOIN events e
        ON CAST(e.ts AS DATE) BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day
    )
    SELECT day, exact_users, TRUE AS est_within_5pct
    FROM rolling
    ORDER BY day
    """,
)
def window_rolling_distinct_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users via MERGEABLE daily HLL
    sketches — the pattern that makes rolling-distinct feasible at 100 TB:
    one sketch per day (built once, incrementally appendable), each day's
    rolling value = union of 7 daily sketch BLOBS (never a rescan of 7
    days of raw events; a naive exact rolling distinct re-shuffles every
    event into 7 windows). The driver-checked contract: per-day exact
    counts as value anchors plus the engine-independent boolean
    |estimate - exact| <= 5% exact (lgK=12 → ~1.6% rse).

    Scale: sketch build = one day-keyed partial aggregate over the fact;
    the union stage operates on |days| x 7 sketch rows of ~4 KB each —
    fact-size independent. The exact leg exists at validation SF only."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS day, hll_sketch_agg(user_id) AS sk
          FROM events GROUP BY CAST(ts AS DATE)
        ),
        spread AS (
          SELECT date_add(day, off) AS day, sk
          FROM daily
          LATERAL VIEW explode(sequence(0, 6)) t AS off
        ),
        est AS (
          SELECT s.day, hll_sketch_estimate(hll_union_agg(s.sk)) AS est
          FROM spread s JOIN daily d ON s.day = d.day  -- only real days
          GROUP BY s.day
        ),
        exact AS (
          SELECT d.day, COUNT(DISTINCT e.user_id) AS exact_users
          FROM (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events) d
          JOIN events e
            ON CAST(e.ts AS DATE) BETWEEN date_sub(d.day, 6) AND d.day
          GROUP BY d.day
        )
        SELECT x.day, x.exact_users,
               abs(e.est - x.exact_users) <= 0.05 * x.exact_users
                 AS est_within_5pct
        FROM exact x JOIN est e ON x.day = e.day
        ORDER BY x.day
        """
    )


@query(
    "events_attribution_last_touch",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type, value,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER w AS touch_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN ts END IGNORE NULLS)
               OVER w AS touch_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT touch_type,
           COUNT(*) AS n_purchases,
           SUM(CAST(round(value * 100) AS BIGINT)) / 100.0
             AS attributed_value
    FROM seq
    WHERE event_type = 'purchase'
      AND touch_type IS NOT NULL
      AND ts - touch_ts <= INTERVAL 7 DAY
    GROUP BY touch_type
    ORDER BY touch_type
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase credits the user's most
    recent preceding NON-purchase event within a 7-day window — the
    conditional last_value(... IGNORE NULLS) pattern over an open-ended
    preceding frame, which expresses "latest earlier row satisfying a
    predicate" without a self-join (the naive formulation is an
    inequality self-join per purchase — quadratic in events-per-user).

    Scale: one shuffle on user_id serves both conditional window columns;
    the attribution aggregate is partial over |event_types| keys.
    Attributed revenue sums in exact integer cents."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    not_purchase = F.col("event_type") != "purchase"
    seq = ev.select(
        "event_type",
        "ts",
        "value",
        F.last(F.when(not_purchase, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(not_purchase, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    week_us = 7 * 86400 * 1_000_000
    return (
        seq.filter(
            (F.col("event_type") == "purchase")
            & F.col("touch_type").isNotNull()
            & (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.col("touch_ts"))
                <= week_us
            )
        )
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            (F.sum(cents("value")) / 100.0).alias("attributed_value"),
        )
        .orderBy("touch_type")
    )


@query(
    "agg_mode_portable",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    ),
    ranked AS (
      SELECT user_id, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type ASC) AS rn
      FROM counts
    )
    SELECT user_id, event_type AS modal_type, n AS n_events
    FROM ranked WHERE rn = 1
    ORDER BY user_id
    """,
)
def agg_mode_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: each user's most frequent event type, ties
    broken alphabetically. Built from count + row_number rather than the
    engines' mode() aggregates, whose tie-breaking is UNSPECIFIED in both
    Spark and DuckDB — an oracle hash over native mode() would flap on any
    tied user. The explicit form costs one extra tiny aggregate and buys
    reproducibility on any engine and any partitioning.

    Scale: the count is partial-aggregable on (user, type); the ranking
    window runs over per-user groups of at most |event_types| rows."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", F.col("event_type").alias("modal_type"), F.col("n").alias("n_events")
        )
        .orderBy("user_id")
    )


@query(
    "join_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))
               - CAST(round(p_retailprice * 100) AS BIGINT)
               * CAST(round(l_quantity * 100) AS BIGINT)) / 10000.0
             AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    ORDER BY nation ASC, o_year DESC
    """,
)
def join_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog: product-line profit by supplying nation and order
    year. The testdata has no partsupp table, so supply cost is proxied by
    the part's retail price per unit (the join/aggregation SHAPE — the
    thing Q9 exercises — is unchanged; only the cost coefficient differs).
    Both profit terms are exact integers in dollars x 1e-4, summed on a
    128-bit decimal accumulator (per-term cast BEFORE the SUM — the
    events_anomaly_zscore discipline; a BIGINT accumulator would wrap at
    ~1e9 rows of ~1e10-magnitude terms while DuckDB auto-promotes to
    HUGEINT), so the sum is order-independent and hash-stable at any
    scale.

    Scale: lineitem is the single fact; part (name-filtered BEFORE the
    join — a semi-reduction that also prunes the fact via the join),
    supplier, and nation broadcast; orders joins on the fact's own
    orderkey, the one unavoidable fact-sized shuffle. The group key
    (nation, year) is tiny, so the final aggregate is map-side-combined
    almost to nothing."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    qty_h = F.round(F.col("l_quantity") * 100).cast("long")
    profit_u = cents("l_extendedprice") * _disc_bp() - cents("p_retailprice") * qty_h
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(profit_u.cast("decimal(38,0)")) / 10000.0).alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@query(
    "agg_correlation_portable",
    oracle="""
    WITH t AS (
      SELECT l_returnflag,
             CAST(CAST(round(l_quantity * 100) AS BIGINT) AS HUGEINT) AS x,
             CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS HUGEINT) AS y
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM t GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
             / sqrt(CAST(n * syy - sy * sy AS DOUBLE) ) AS corr_qty_price
    FROM m ORDER BY l_returnflag
    """,
)
def agg_correlation_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation (quantity vs extended price per return flag)
    from EXACT integer second moments: corr = (nSxy - SxSy) /
    sqrt(nSxx - Sx^2) / sqrt(nSyy - Sy^2), where every S accumulates
    integer cents on 128-bit decimals (per-term cast BEFORE the SUM —
    the events_anomaly_zscore discipline) and floats appear only in the
    final three-operation division, computed in the same order on both
    engines. Spark's built-in corr() accumulates doubles, so its last
    ulp depends on partition order — it could never be driver-hashed.

    Scale: one partial-aggregable groupBy (map-side combine collapses
    each partition to 6 numbers per flag); the moment products n*Sxy etc.
    ride decimal(38,0), which caps at ~10^38 — beyond ~10^15 rows of
    cent-scaled pairs shard the key space first (same ceiling note as
    events_anomaly_zscore)."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    cx = cents("l_quantity")
    cy = cents("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(cx.cast(dec)).alias("sx"),
        F.sum(cy.cast(dec)).alias("sy"),
        F.sum((cx * cx).cast(dec)).alias("sxx"),
        F.sum((cy * cy).cast(dec)).alias("syy"),
        F.sum((cx * cy).cast(dec)).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        (num / F.sqrt(vx) / F.sqrt(vy)).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


@query(
    "events_ema_smoothed",
    oracle="""
    SELECT user_id, CAST(len(l) AS INT) AS n_events,
           list_reduce(l, (acc, x) -> 0.5 * x + 0.5 * acc) AS ema_value
    FROM (SELECT user_id, list(value ORDER BY ts, event_id) AS l
          FROM events WHERE value IS NOT NULL AND NOT isnan(value)
          GROUP BY user_id)
    ORDER BY user_id
    """,
)
def events_ema_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average (alpha = 0.5) of each user's event
    values in time order — the order-DEPENDENT recurrence (ema_t =
    a*x_t + (1-a)*ema_{t-1}) that no commutative aggregate can express.
    The portable shape: collect the per-key sequence sorted on the full
    deterministic key (ts, event_id tie-break), then fold it with
    Catalyst's higher-order aggregate() — a codegen'd lambda, no Python.
    Both engines run the IDENTICAL left fold over the identical order
    with exact-in-binary alpha = 0.5, so the float result is
    bit-reproducible and driver-hashable (a window-based running EMA
    cannot be written in SQL at all without recursion; built-in float
    aggs wouldn't hash).

    Scale: one shuffle on user_id; the fold runs inside the row, bounded
    by per-key history length — right for bounded sequences (sessions,
    per-entity logs). Unbounded streams move the same recurrence into
    applyInPandasWithState, carrying ema as the state value."""
    # NULL and NaN values are excluded up front: the three fold
    # implementations (Spark coalesce, DuckDB list_reduce, the streaming
    # state carry, where Arrow conversion makes NULL and NaN
    # indistinguishable) would each treat an embedded NULL/NaN
    # differently — restart vs propagate vs drop — so the operator's
    # contract is "EMA over the FINITE PRESENT values" and the shared
    # filter makes that identical everywhere.
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    seq = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))).alias("s")
    )
    ema = F.aggregate(
        F.col("s"),
        F.lit(None).cast("double"),
        lambda acc, x: F.coalesce(0.5 * x["value"] + 0.5 * acc, x["value"]),
    )
    return seq.select(
        "user_id", F.size("s").alias("n_events"), ema.alias("ema_value")
    ).orderBy("user_id")


_EMA_SEG = 16  # values per segment; production sizes this to the row budget

# Shared oracle: the SEGMENTED evaluation of the EMA fold (chunk folds +
# in-order affine-map composition). Used by events_ema_segmented (chunks
# split inside the per-key array) and events_ema_partitioned (chunks are
# real rows) — both compute the identical arithmetic, so they pin the
# identical SQL.
_DUCK_EMA_SEGMENTED = f"""
    WITH seq AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS l
      FROM events WHERE value IS NOT NULL AND NOT isnan(value)
      GROUP BY user_id
    ),
    segs AS (
      SELECT user_id, len(l) AS n,
             [CASE WHEN i = 1 THEN {{'a': 0.0::DOUBLE,
                     'b': list_reduce(l[i : i + {_EMA_SEG - 1}],
                                      (acc, x) -> 0.5 * x + 0.5 * acc)}}
                   ELSE {{'a': 0.5::DOUBLE ^ len(l[i : i + {_EMA_SEG - 1}]),
                     'b': list_reduce(list_prepend(0.0::DOUBLE,
                                                   l[i : i + {_EMA_SEG - 1}]),
                                      (acc, x) -> 0.5 * x + 0.5 * acc)}}
              END FOR i IN range(1, len(l) + 1, {_EMA_SEG})] AS maps
      FROM seq
    )
    SELECT user_id, CAST(n AS INT) AS n_events,
           list_reduce(maps,
                       (acc, m) -> {{'a': m.a * acc.a,
                                     'b': m.a * acc.b + m.b}}).b AS ema_value
    FROM segs ORDER BY user_id
    """


@query("events_ema_segmented", oracle=_DUCK_EMA_SEGMENTED)
def events_ema_segmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_ema_smoothed without the per-key row-size ceiling (VERDICT
    r6 #4): the EMA recurrence ema_t = a*x_t + (1-a)*ema_{{t-1}} is AFFINE
    in its initial value, so a segment of m values is one map
    e -> A*e + B with A = (1-a)^m and B = the segment's fold from 0 — and
    affine maps COMPOSE associatively: (A1,B1) then (A2,B2) is
    (A2*A1, A2*B1 + B2). Each segment folds independently (parallel,
    bounded work), then the per-segment (a, b) pairs — two doubles each,
    {_EMA_SEG}x smaller than the raw history — compose in segment order.
    The first segment uses the init-from-first-element semantics
    (a = 0, b = fold seeded by x_1), making the whole composition the
    exact segmented evaluation of the monolithic fold.

    The oracle mirrors the SAME segmentation (chunk folds + map
    composition, alpha = 0.5 exact in binary), so both engines round at
    identical points and the result is bit-reproducible — segmented and
    monolithic agree only to ~ulp (addition order differs), which is why
    this query carries its own oracle rather than reusing
    events_ema_smoothed's (tests/test_ema_segmented.py pins both the
    exact-match-to-numpy-segmented and the ulp-closeness-to-monolithic
    properties).

    Scale: this is the associative-scan shape for order-dependent
    recurrences. Here segments split INSIDE the per-key array (one
    shuffle on user_id, same as the monolithic form) — at 100 TB the
    same (a, b) maps instead come from a groupBy(user_id, segment_no)
    over segment-bucketed rows, composed by a second tiny groupBy over
    coefficient pairs, so no single row ever holds a key's full history.
    The registered form keeps the collect_list so the oracle can pin the
    arithmetic; the composition algebra — the part the ceiling kill
    depends on — is identical in both layouts."""
    seg = _EMA_SEG
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    seqdf = ev.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id, value)))," " s -> s.value)"
        ).alias("v")
    )
    n = F.size("v")
    starts = F.sequence(F.lit(0), F.floor((n - F.lit(1)) / F.lit(seg)).cast("int"))

    def _seg_map(i):
        chunk = F.slice(F.col("v"), i * seg + 1, seg)
        first_b = F.aggregate(
            chunk,
            F.lit(None).cast("double"),
            lambda acc, x: F.coalesce(0.5 * x + 0.5 * acc, x),
        )
        rest_b = F.aggregate(chunk, F.lit(0.0), lambda acc, x: 0.5 * x + 0.5 * acc)
        return F.when(
            i == 0, F.struct(F.lit(0.0).alias("a"), first_b.alias("b"))
        ).otherwise(
            F.struct(F.pow(F.lit(0.5), F.size(chunk)).alias("a"), rest_b.alias("b"))
        )

    maps = F.transform(starts, _seg_map)
    composed = F.aggregate(
        F.slice(maps, 2, F.greatest(F.size(maps) - 1, F.lit(0))),
        F.element_at(maps, 1),
        lambda acc, m: F.struct(
            (m["a"] * acc["a"]).alias("a"), (m["a"] * acc["b"] + m["b"]).alias("b")
        ),
    )
    return seqdf.select(
        "user_id", n.alias("n_events"), composed["b"].alias("ema_value")
    ).orderBy("user_id")


@query("events_ema_partitioned", oracle=_DUCK_EMA_SEGMENTED)
def events_ema_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL row-size-ceiling kill events_ema_segmented's docstring
    promises: segments are REAL ROW GROUPS, not slices of a collected
    array — no row ever holds a key's complete history.

      1. row_number over (user_id ORDER BY ts, event_id) ranks each
         event (one shuffle; the only per-key-global step, and it is
         streaming-friendly: a window never materializes the partition
         as one row);
      2. groupBy(user_id, (rn-1) DIV {_EMA_SEG}) folds each segment —
         collect_list is bounded at {_EMA_SEG} structs per row — into
         its affine (a, b) map (first segment seeded by its first
         value, later segments folded from zero);
      3. groupBy(user_id) composes the per-segment maps in seg_no order
         — {_EMA_SEG} doubles of history become TWO, so the composition
         row is n/{_EMA_SEG} small structs; a corpus where even that is
         too big repeats step 2-3 on seg_no DIV {_EMA_SEG} (the
         composition is associative, so tree depth is log_{_EMA_SEG}).

    Arithmetic is bit-identical to events_ema_segmented (same chunk
    boundaries by rank, same seeds, same in-order composition), so both
    pin the same oracle SQL; tests/test_ema_segmented.py asserts the
    bit-equality on real data and a long synthetic history."""
    seg = _EMA_SEG
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id", "value", F.row_number().over(w).alias("rn")
    )
    segs = ranked.groupBy(
        "user_id", F.expr(f"(rn - 1) DIV {seg}").alias("seg_no")
    ).agg(
        F.expr("transform(array_sort(collect_list(struct(rn, value))), x -> x.value)").alias(
            "v"
        )
    )
    first_b = F.aggregate(
        F.col("v"),
        F.lit(None).cast("double"),
        lambda acc, x: F.coalesce(0.5 * x + 0.5 * acc, x),
    )
    rest_b = F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: 0.5 * x + 0.5 * acc)
    per_seg = segs.select(
        "user_id",
        "seg_no",
        F.size("v").alias("cnt"),
        F.when(
            F.col("seg_no") == 0, F.struct(F.lit(0.0).alias("a"), first_b.alias("b"))
        )
        .otherwise(
            F.struct(F.pow(F.lit(0.5), F.size("v")).alias("a"), rest_b.alias("b"))
        )
        .alias("m"),
    )
    maps = F.expr("transform(array_sort(collect_list(struct(seg_no, m))), x -> x.m)")
    out = per_seg.groupBy("user_id").agg(
        F.sum("cnt").cast("int").alias("n_events"), maps.alias("ms")
    )
    composed = F.aggregate(
        F.slice(F.col("ms"), 2, F.greatest(F.size("ms") - 1, F.lit(0))),
        F.element_at(F.col("ms"), 1),
        lambda acc, m: F.struct(
            (m["a"] * acc["a"]).alias("a"), (m["a"] * acc["b"] + m["b"]).alias("b")
        ),
    )
    return out.select(
        "user_id", "n_events", composed["b"].alias("ema_value")
    ).orderBy("user_id")


@query(
    "window_range_trailing",
    oracle="""
    SELECT user_id, event_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
           SUM(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0 AS sum_7d
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def window_range_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frames — each event's trailing-7-day activity
    (count + exact-cents value sum) for its user: the sliding-window
    feature-engineering shape (recency features for ranking/fraud models)
    that ROWS frames cannot express, because the frame must include
    however many rows fall in the interval, zero or thousands. The order
    key is integer epoch SECONDS on both engines (floor, not round —
    DuckDB CASTs of doubles round while Spark truncates, the shard
    manifest's cross-engine pitfall), so frame boundaries and the
    all-peers-of-equal-key RANGE semantics are bit-identical.

    Scale: one shuffle on user_id; Spark evaluates the range frame with a
    sliding two-pointer over each partition's sort — O(rows) amortized,
    not O(rows x frame). Unbounded keys with bounded interval = bounded
    memory."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-604800, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_7d"),
        (F.sum(cents("value")).over(w) / 100.0).alias("sum_7d"),
    ).orderBy("user_id", "event_id")


@query(
    "agg_important_parts",
    oracle="""
    WITH v AS (
      SELECT l_partkey,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS vq
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (
      SELECT CAST(SUM(vq) AS HUGEINT) AS total,
             CAST(COUNT(*) AS HUGEINT) AS n
      FROM v
    )
    SELECT l_partkey, vq / 100.0 AS part_value
    FROM v, tot
    WHERE CAST(vq AS HUGEINT) * n * 2 > total * 3
    ORDER BY part_value DESC, l_partkey ASC
    """,
)
def agg_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's plan shape (important stock): a grouped aggregate
    filtered AGAINST A SCALAR SUBQUERY of itself — parts whose lineitem
    value exceeds 1.5x the mean part value. (Faithful Q11 sums
    partsupp.supplycost*availqty; the testdata has no partsupp, so
    lineitem value stands in — the aggregate + post-aggregation
    scalar-threshold HAVING is what Q11 exercises.) The threshold test
    cross-multiplies in 128-bit integers (2*vq*n > 3*total) instead of
    dividing — no float enters the boundary decision, so membership is
    exact on any engine at any scale.

    Scale: one partial-aggregable groupBy builds v; the 1-row total
    broadcasts back over it (Spark evaluates the DuckDB scalar subquery
    the same way: aggregate once, broadcast the scalar — never a
    re-scan per group)."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    v = li.groupBy("l_partkey").agg(
        F.sum(cents("l_extendedprice").cast(dec)).alias("vq")
    )
    tot = v.agg(
        F.sum("vq").alias("total"), F.count(F.lit(1)).cast(dec).alias("n")
    )
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("vq") * F.col("n") * 2 > F.col("total") * 3)
        .select("l_partkey", (F.col("vq") / 100.0).alias("part_value"))
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


@query(
    "events_session_paths_topk",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(SUM(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_id
      FROM flagged),
    ranked AS (
      SELECT user_id, session_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS rn
      FROM sessions),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= 3
      GROUP BY user_id, session_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path ASC
    LIMIT 10
    """,
)
def events_session_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the top-10 session-opening event sequences — each
    session reduced to its first 3 events joined 'a>b>c' (the product
    question "how do sessions start", the funnel's exploratory dual:
    events_funnel_steps checks ONE hypothesized order, this surfaces
    the orders that actually happen). Session identity reuses
    sessionize_events' exact 30-minute-gap definition with the
    (ts, event_id) tie-break, so path strings are deterministic and the
    driver hash pins the full top-10 with counts.

    Plan shape at 100 TB: the sessionize window and the per-session
    prefix both ride the ONE user_id shuffle (same-keyed windows
    compose without re-exchange); the prefix cut (rn <= 3) bounds every
    session's contribution to 3 rows BEFORE the path groupBy, so the
    path-count shuffle carries at most 3 short strings per session;
    the final top-10 is TakeOrderedAndProject, never a global sort."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag(F.col("ts")).over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull() | (gap_us > 30 * 60 * 1_000_000), 1
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    ranked = sessions.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
        ),
    ).filter(F.col("rn") <= 3)
    paths = (
        ranked.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(10)
    )
