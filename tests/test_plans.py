"""Physical-plan property tests (SURVEY.md §4.2): the scale guarantees —
predicate pushdown, column pruning, broadcast join selection, partial
aggregation, heap top-k, no accidental cartesian products — asserted on the
actual Catalyst plans so a regression that would only hurt at 100 TB fails
at sf0.001.
"""

from __future__ import annotations

from distributed_video_analytics_flink_spark.operators import QUERIES
from distributed_video_analytics_flink_spark.plans import (
    formatted_plan,
    hash_aggregate_count,
    has_top_k,
    join_strategies,
    pushed_filters,
    scan_schemas,
)

SF = "/root/testdata/sf0.001"


def _q(spark, name):
    return QUERIES[name].fn(spark, SF)


def test_filters_reach_parquet_scan(spark):
    df = _q(spark, "scan_filter_project")
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed and "l_discount" in pushed


def test_scan_prunes_columns(spark):
    """pricing_summary touches 7 of 11 lineitem columns; the scan schema
    must not include the unused join keys."""
    schemas = scan_schemas(_q(spark, "pricing_summary"))
    assert schemas, "no file scan found"
    assert "l_partkey" not in schemas[0] and "l_suppkey" not in schemas[0]
    assert "l_quantity" in schemas[0]


def test_dim_joins_broadcast(spark):
    """The TPC-H-style snowflake join should broadcast every dimension —
    no sort-merge exchange for region/nation/customer at this asymmetry."""
    joins = join_strategies(_q(spark, "join_region_revenue"))
    assert joins and all(j == "BroadcastHashJoin" for j in joins)


def test_no_cartesian_products_anywhere(spark):
    """No registered query may plan a CartesianProduct — the all-pairs
    shapes (dedup, similarity) must stay blocked/bucketed. (Broadcast
    nested-loop against a single-row broadcast side is acceptable and
    appears in the intentionally-tiny query-vector cross joins.)"""
    offenders = {}
    for name, spec in QUERIES.items():
        joins = join_strategies(spec.fn(spark, SF))
        if any(j == "CartesianProduct" for j in joins):
            offenders[name] = joins
    assert not offenders, f"cartesian products in: {offenders}"


def test_aggregations_are_partial(spark):
    """Shuffled aggregations must show partial+final HashAggregate pairs
    (map-side combine) — the shuffle carries group partials, not rows."""
    for name in ("pricing_summary", "events_per_user_day", "dedup_exact"):
        assert hash_aggregate_count(_q(spark, name)) == 2, name


def test_topk_uses_heap_not_global_sort(spark):
    for name in ("sort_limit_topk", "sim_cosine_topk"):
        assert has_top_k(_q(spark, name)), name


def test_codegen_in_final_plan(spark):
    """After AQE finalizes, the relational spine must run inside
    whole-stage codegen (UDF-free queries only — pandas ops break the
    codegen span by design)."""
    for name in ("pricing_summary", "join_region_revenue", "sort_limit_topk"):
        df = _q(spark, name)
        df.collect()
        plan = formatted_plan(df)
        assert "codegen id" in plan, name


def test_motion_pipeline_single_shuffle(spark):
    """The video pipeline's only exchange is the per-camera repartition
    (Flink's keyBy analog); pixel bytes must not be shuffled twice."""
    from distributed_video_analytics_flink_spark.operators.video import (
        detect_motion_batch,
        fixture_frames,
    )
    from distributed_video_analytics_flink_spark.plans import exchange_count
    from distributed_video_analytics_flink_spark.schemas import FRAME_SCHEMA

    frames = spark.createDataFrame(fixture_frames(), schema=FRAME_SCHEMA)
    assert exchange_count(detect_motion_batch(frames)) == 1


def test_rowlocal_operators_never_shuffle(spark):
    """The embarrassingly-parallel operators (hash sampling, PII scrub,
    chunk expansion) must plan zero exchanges — a shuffle here would be a
    100 TB regression with no semantic payoff."""
    from distributed_video_analytics_flink_spark.plans import exchange_count

    for name in ("sample_hash_bernoulli", "text_scrub_pii", "text_chunk_documents"):
        assert exchange_count(_q(spark, name)) == 0, name


def test_centroid_aggregation_is_partial(spark):
    """sim_label_centroids must partial-aggregate the per-dimension sums
    map-side (HashAggregate pairs around the exchange): the shuffle then
    carries one row per (label, dim) regardless of vector count."""
    df = _q(spark, "sim_label_centroids")
    assert hash_aggregate_count(df) >= 2  # partial+final around the exchange
    plan = formatted_plan(df)
    assert "partial_sum" in plan or "partial" in plan.lower()


def test_stratified_sample_is_scan_only(spark):
    """curation_sample_stratified is a pure scan predicate: zero shuffles,
    zero joins — the property that makes the sample reproducible and free
    at any cluster size."""
    from distributed_video_analytics_flink_spark.plans.inspect import exchange_count

    df = _q(spark, "curation_sample_stratified")
    assert exchange_count(df) == 0
    assert not join_strategies(df)


def test_unpivot_uses_expand_no_extra_shuffle(spark):
    """Native unpivot plans an Expand node over the aggregated rows — one
    exchange total (the groupBy), nothing added by the wide->long fanout."""
    from distributed_video_analytics_flink_spark.plans.inspect import exchange_count

    df = _q(spark, "unpivot_event_stats")
    assert "Expand" in formatted_plan(df)
    assert exchange_count(df) == 1
    assert hash_aggregate_count(df) == 2  # partial + final


def test_simhash64_single_shuffle_partial_agg(spark):
    """64 conditional sums still plan as one partial+final HashAggregate
    pair over one exchange — signature width never adds shuffles."""
    from distributed_video_analytics_flink_spark.plans.inspect import exchange_count

    df = _q(spark, "dedup_simhash64")
    assert exchange_count(df) == 1
    assert hash_aggregate_count(df) == 2


def test_session_window_single_shuffle(spark):
    """Native session_window sessionization: one exchange, partial+final
    aggregation with a MergingSessions node — no window-function pass."""
    from distributed_video_analytics_flink_spark.plans.inspect import exchange_count

    df = _q(spark, "sessionize_session_window")
    assert exchange_count(df) == 1
    assert hash_aggregate_count(df) == 2
    plan = formatted_plan(df)
    assert "MergingSessions" in plan
    assert "windowspecdefinition" not in plan  # no window-function pass


def test_gapfill_spine_generated_not_shuffled(spark):
    """timeseries_gapfill: the calendar spine comes from Generate
    (sequence+explode) over one span row per user — at most the two
    keyed aggregations plus the join shuffle, never a cartesian."""
    from distributed_video_analytics_flink_spark.plans.inspect import exchange_count

    df = _q(spark, "timeseries_gapfill")
    plan = formatted_plan(df)
    assert "Generate" in plan
    assert exchange_count(df) <= 3
    assert "CartesianProduct" not in join_strategies(df)


def test_curation_pipeline_shuffle_budget(spark):
    """The flagship curation pass stays within its shuffle budget (digest
    dedup, token stats, doc_id join, final accounting) and every
    aggregation partial-aggregates."""
    from distributed_video_analytics_flink_spark.plans.inspect import exchange_count

    df = _q(spark, "curation_pipeline")
    assert exchange_count(df) <= 5
    assert "CartesianProduct" not in join_strategies(df)
    assert hash_aggregate_count(df) % 2 == 0  # every agg is a partial+final pair
