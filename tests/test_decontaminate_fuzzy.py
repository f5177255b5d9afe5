"""curation_decontaminate_fuzzy: MinHash-LSH benchmark decontamination
(the paraphrase-tolerant twin of the exact 8-shingle pass). Pins:

1. **Non-vacuous detection** — on the sf0.1 corpus (the smallest with
   exact duplicates) the query flags documents whose near-identical twin
   sits in the simulated eval split, at estimated Jaccard 1.0.
2. **Broadcast shape** — every join keeps the tiny eval side broadcast;
   the corpus side never shuffles text or shingles.
3. **Subset relation** — exact duplicates of eval docs MUST be flagged
   (estimated Jaccard 1.0 >= any threshold): the fuzzy pass can only
   widen, never miss, the identical-text case.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.operators.curation import (
    curation_decontaminate_fuzzy,
)
from distributed_video_analytics_flink_spark.plans import join_strategies
from distributed_video_analytics_flink_spark.sources.tables import load_table

SF = "/root/testdata/sf0.1"


def test_flags_near_duplicates_of_eval_docs(spark):
    out = curation_decontaminate_fuzzy(spark, SF)
    flagged = out.filter(F.col("contaminated") == 1)
    n = flagged.count()
    assert n > 0, "fixture has no eval near-dups — detection test is vacuous"
    assert flagged.filter(F.col("max_jaccard_est") < 0.5).count() == 0


def test_flagged_docs_have_high_true_jaccard(spark):
    """The MinHash estimate must track reality: every flagged doc's TRUE
    3-token-shingle Jaccard (computed in plain Python, no engine code)
    against its best eval doc clears a sane floor."""
    docs = load_table(spark, SF, "documents")

    def _shingles(text: str) -> set[str]:
        w = text.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    eval_sh = [
        _shingles(r["text"])
        for r in docs.filter(F.col("doc_id") % 97 == 0).collect()
    ]
    out = curation_decontaminate_fuzzy(spark, SF)
    flagged_ids = [
        r["doc_id"] for r in out.filter(F.col("contaminated") == 1).collect()
    ]
    assert flagged_ids
    flagged_docs = docs.filter(F.col("doc_id").isin(flagged_ids)).collect()
    for row in flagged_docs:
        s = _shingles(row["text"])
        best = max(
            (len(s & e) / len(s | e)) if s | e else 0.0 for e in eval_sh
        )
        assert best >= 0.35, f"doc {row['doc_id']} flagged at true jaccard {best}"


def test_eval_side_joins_broadcast(spark):
    joins = join_strategies(curation_decontaminate_fuzzy(spark, SF))
    # the candidate band probe and the signature verify broadcast the tiny
    # eval side; the final docs-LEFT-est join is corpus-sized on both
    # sides, so it is allowed either strategy (pinning it broadcast would
    # encode a small-fixture accident — the r6 ADVICE lesson)
    assert len(joins) == 4
    assert joins.count("BroadcastHashJoin") >= 3
    assert all(
        j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin") for j in joins
    )
