"""Pins for dedup_incremental_pairs (curation.py): (1) the incremental
carried+delta union equals a FULL LSH recompute over the new snapshot
(two-way exceptAll); (2) the delta x corpus band join is a
ShuffledHashJoin with the DELTA side as the hash BUILD side — the plan
property that makes the operator O(delta), not O(corpus^2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.operators.curation import (
    dedup_incremental_pairs,
)
from distributed_video_analytics_flink_spark.operators.dedup import (
    N_BANDS,
    _bands_from_sigs,
    _first_match_pred,
    minhash_signature_df,
)
from distributed_video_analytics_flink_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _full_recompute_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 != 4)
    bands = _bands_from_sigs(minhash_signature_df(docs.select("doc_id", "text")))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(_first_match_pred(lambda s, i: f"{s}.bh[{i}]", N_BANDS))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )


def test_incremental_equals_full_recompute(spark):
    inc = dedup_incremental_pairs(spark, SF_DIR).select("doc_a", "doc_b")
    full = _full_recompute_pairs(spark, SF_DIR)
    assert inc.exceptAll(full).count() == 0
    assert full.exceptAll(inc).count() == 0
    # and the incremental union is itself duplicate-free
    assert inc.count() == inc.distinct().count()


def test_delta_band_join_builds_on_the_delta(spark):
    """The delta side carries hint('shuffle_hash') and sits LEFT of the
    band join, so the physical plan must contain a ShuffledHashJoin
    building on the left — a regression to sort-merge (corpus-side
    sort) or to broadcasting the CORPUS side would change this."""
    plan = dedup_incremental_pairs(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan[:2000]
    import re

    m = re.search(r"ShuffledHashJoin [^\n]*band_hash[^\n]*", plan)
    assert m and "BuildLeft" in m.group(0), m.group(0) if m else plan[:2000]
