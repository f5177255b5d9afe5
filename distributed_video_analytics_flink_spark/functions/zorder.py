"""Z-order (Morton) interleaving for multi-dimensional data skipping.

A table sorted by one column prunes row groups on that column only; probes
filtered on BOTH user_id AND time read everything under either single-key
sort. Interleaving the two keys' bits into one Morton value and sorting by
THAT gives each parquet row group a tight bounding box in (a, b) space, so
min/max stats skip on both dimensions at once — the layout trick behind
Delta/Iceberg Z-ORDER clustering, implemented here as plain integer
arithmetic usable at write time (`.sortWithinPartitions(zorder2(...))`).

The bit-spread uses the classic mask-shift doubling (x | x<<8 masked,
then <<4, <<2, <<1), all codegen'd long ops — identical in Spark and
DuckDB, so oracle queries can hash the exact key values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SPREAD_STEPS = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]


def _spread16(c: Column) -> Column:
    """Spread a 16-bit value's bits to even positions of a 32-bit value."""
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder2(a: Column | str, b: Column | str) -> Column:
    """Morton-interleave two non-negative 16-bit keys (a even bits, b odd).
    Clamp/scale wider domains into 16 bits before calling (row-group
    pruning needs relative order, not exact values)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _spread16(ca).bitwiseOR(F.shiftleft(_spread16(cb), 1))


def duck_spread16(expr: str) -> str:
    # CAST up front: DuckDB integer literals/columns default to INT32 and
    # << raises on overflow — the odd-key spread's final << 1 exceeds
    # INT32 for keys >= 0x4000 (caught by
    # tests/test_numeric_properties.py::test_zorder_matches_duckdb_expression)
    x = f"(CAST(({expr}) AS BIGINT) & 65535)"
    for shift, mask in _SPREAD_STEPS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def duck_zorder2(a: str, b: str) -> str:
    return f"({duck_spread16(a)} | ({duck_spread16(b)} << 1))"
