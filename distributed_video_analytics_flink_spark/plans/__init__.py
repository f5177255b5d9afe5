"""Plan inspection: assertable physical-plan properties (pushdown, pruning,
join strategy, partial aggregation, codegen, top-k) — SURVEY.md §4.2."""

from distributed_video_analytics_flink_spark.plans.inspect import (
    exchange_count,
    formatted_plan,
    hash_aggregate_count,
    has_top_k,
    has_whole_stage_codegen,
    join_strategies,
    plan_report,
    pushed_filters,
    scan_schemas,
    simple_plan,
)

__all__ = [
    "exchange_count",
    "formatted_plan",
    "hash_aggregate_count",
    "has_top_k",
    "has_whole_stage_codegen",
    "join_strategies",
    "plan_report",
    "pushed_filters",
    "scan_schemas",
    "simple_plan",
]
