"""Physical-plan inspection utilities.

The reference has no optimizer (SURVEY.md §4.1); this engine leans on
Catalyst + AQE, so the *guarantees* live in the physical plan. These helpers
make plan properties assertable in tests and inspectable in notebooks —
pushed filters, pruned scan schemas, join strategies, partial aggregation,
whole-stage codegen — i.e., the things that decide whether a query that
passes at sf0.01 still works at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`df.explain("formatted")` as a string (AQE-aware final plan)."""
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the parquet scan (PushedFilters)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def scan_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — column pruning evidence."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))


def _nodes(df: DataFrame) -> list[tuple[int, str]]:
    """Unique (id, node-name) pairs from the formatted plan tree (formatted
    mode prints each node once in the tree and once in the details section —
    dedupe by id)."""
    seen: dict[int, str] = {}
    for m in re.finditer(r"\((\d+)\) ([A-Za-z]+)", formatted_plan(df)):
        seen.setdefault(int(m.group(1)), m.group(2))
    return sorted(seen.items())


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join node names in the plan, e.g. BroadcastHashJoin,
    SortMergeJoin, BroadcastNestedLoopJoin, CartesianProduct."""
    wanted = {
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    }
    return [name for _, name in _nodes(df) if name in wanted]


def hash_aggregate_count(df: DataFrame) -> int:
    """Number of HashAggregate nodes; a shuffled agg shows 2 per grouping
    (partial + final) — partial aggregation is what keeps shuffles small."""
    return sum(1 for _, name in _nodes(df) if name in ("HashAggregate", "ObjectHashAggregate"))


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """Formatted mode tags codegen'd nodes with [codegen id : N]."""
    return "codegen id" in formatted_plan(df)


def has_top_k(df: DataFrame) -> bool:
    """TakeOrderedAndProject = per-partition heap top-k, never a global
    sort of all rows."""
    return any(name == "TakeOrderedAndProject" for _, name in _nodes(df))


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (excluding broadcast exchanges)."""
    return sum(1 for _, name in _nodes(df) if name == "Exchange")


def plan_report(df: DataFrame) -> dict:
    """One-call summary for notebooks / debugging."""
    return {
        "joins": join_strategies(df),
        "pushed_filters": pushed_filters(df),
        "scan_schemas": scan_schemas(df),
        "hash_aggregates": hash_aggregate_count(df),
        "whole_stage_codegen": has_whole_stage_codegen(df),
        "top_k": has_top_k(df),
        "shuffle_exchanges": exchange_count(df),
    }
