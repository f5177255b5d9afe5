"""Cross-engine-deterministic arithmetic helpers.

Floating-point SUM/AVG results depend on summation order, which differs
between Spark (partial aggregation across partitions) and any oracle engine.
The testdata money-like columns are 2-decimal doubles, so the engine's
oracled aggregates work in exact integer "cents": ``round(x * 100)`` is an
exact integer for such inputs, integer sums are order-independent, and the
final division back to double is bit-identical on both engines.

This is a correctness-of-comparison device only; non-oracled production
aggregates use plain double/decimal sums. At 100 TB the integer path is
actually *cheaper* than decimal (long adds, whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Exact integer cents of a 2-decimal double column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def sum_money(col: Column | str, alias: str) -> Column:
    """Order-independent SUM of a 2-decimal double, returned as double."""
    return (F.sum(cents(col)) / F.lit(100.0)).alias(alias)


def avg_money(col: Column | str, alias: str) -> Column:
    """Order-independent AVG of a 2-decimal double, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(cents(c)) / F.lit(100.0) / F.count(c)).alias(alias)


# DuckDB-side equivalents (keep in sync with the above):
#   cents(x)      -> CAST(round(x * 100) AS BIGINT)
#   sum_money(x)  -> SUM(CAST(round(x * 100) AS BIGINT)) / 100.0
#   avg_money(x)  -> SUM(CAST(round(x * 100) AS BIGINT)) / 100.0 / COUNT(x)
def duck_cents(expr: str) -> str:
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def duck_sum_money(expr: str, alias: str) -> str:
    return f"SUM({duck_cents(expr)}) / 100.0 AS {alias}"


def duck_avg_money(expr: str, alias: str) -> str:
    return f"SUM({duck_cents(expr)}) / 100.0 / COUNT({expr}) AS {alias}"
