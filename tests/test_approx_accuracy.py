"""Value-level accuracy checks for the sketch-based aggregates.

The driver records rows-only for ``agg_approx_distinct`` and
``agg_approx_percentile`` (sketch internals are engine-specific, so no
DuckDB hash oracle). These tests upgrade "runs" to "runs and is
near-right": the approximate answers must sit within the published error
envelopes of the exact answers on the same data.

- approx_count_distinct is HyperLogLog++ with default rsd 0.05; standard
  error at the default precision is ~2%, so 5% relative tolerance is
  generous without being vacuous.
- approx_percentile with accuracy 10000 guarantees rank error <= N/10000;
  we check the returned value lies between neighboring exact percentiles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.operators import QUERIES
from distributed_video_analytics_flink_spark.operators.relational import load_table
from tests.conftest import ORACLE_SF_DIR


def test_approx_count_distinct_within_hll_error(spark):
    approx = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_approx_distinct"].fn(spark, ORACLE_SF_DIR).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in load_table(spark, ORACLE_SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.countDistinct("l_suppkey").alias("suppliers"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, ex in exact.items():
        ap = approx[flag]
        for a_col, e_col in (("approx_parts", "parts"), ("approx_suppliers", "suppliers")):
            rel_err = abs(ap[a_col] - ex[e_col]) / ex[e_col]
            assert rel_err < 0.05, (
                f"{flag}.{a_col}: approx {ap[a_col]} vs exact {ex[e_col]} "
                f"({rel_err:.1%} off — beyond HLL++ rsd envelope)"
            )


def test_approx_percentiles_bracket_exact(spark):
    approx = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_approx_percentile"].fn(spark, ORACLE_SF_DIR).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in load_table(spark, ORACLE_SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            *[
                F.expr(f"percentile(l_extendedprice, {q})").alias(name)
                for name, q in (
                    ("p40", 0.40), ("p60", 0.60),   # bracket p50
                    ("p90", 0.90), ("p97", 0.97),   # bracket p95
                    ("p98", 0.98), ("p100", 1.0),   # bracket p99
                )
            ]
        )
        .collect()
    }
    brackets = [("price_p50", "p40", "p60"), ("price_p95", "p90", "p97"),
                ("price_p99", "p98", "p100")]
    for flag, ap in approx.items():
        ex = exact[flag]
        for col, lo, hi in brackets:
            assert ex[lo] <= ap[col] <= ex[hi], (
                f"{flag}.{col}: {ap[col]} outside exact bracket "
                f"[{ex[lo]}, {ex[hi]}]"
            )


def test_pq_refined_codebook_not_worse(spark):
    """Lloyd monotonicity: one refinement round must not increase any
    subspace's total reconstruction error, and on real (non-degenerate)
    data it should actually move codes and reduce error somewhere."""
    rows = QUERIES["emb_pq_codes_refined"].fn(spark, ORACLE_SF_DIR).collect()
    assert len(rows) == 4  # one row per subspace
    assert all(r["improved"] for r in rows)
    assert all(r["refined_err_q"] <= r["seeded_err_q"] for r in rows)
    assert sum(r["n_moved"] for r in rows) > 0
    assert sum(r["refined_err_q"] for r in rows) < sum(r["seeded_err_q"] for r in rows)
