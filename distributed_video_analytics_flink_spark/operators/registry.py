"""Central query registry backing ``__spark_entry__.py``.

Each engine capability (SURVEY.md §2 inventory + §2.9 relational surface +
the training-data extensions) registers here as a named query:

- a callable ``(spark, sf_dir) -> DataFrame`` (the Spark-first implementation),
- optionally an ANSI-SQL oracle string DuckDB can run over the same parquet
  tables (omitted only for genuinely non-SQL-expressible operators; the driver
  then records a weaker rows-only check).

Oracle-parity rules (see tests/test_oracle_parity.py, which mirrors the
driver's gate locally):

- alias every computed column identically on both sides (the driver sorts
  columns by name before value-hashing);
- float aggregates use exact integer "cents" arithmetic
  (``functions.portable``) so Spark and DuckDB produce bit-identical doubles
  regardless of summation order;
- cross-system hashing uses md5 hex strings (identical in Spark and DuckDB),
  never engine-native ``hash()``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query implementation and its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
