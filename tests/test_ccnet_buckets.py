"""Semantic pin for text_ccnet_ppl_buckets (text_analysis.py): the
oracle proves cross-engine agreement; this plants a corpus where the
fluency ordering is known by construction and asserts the head/middle/
tail split and the CCNet keep rule by hand."""

from __future__ import annotations

from distributed_video_analytics_flink_spark.operators.text_analysis import (
    text_ccnet_ppl_buckets,
)


def test_ccnet_bucket_semantics(spark, tmp_path):
    # one language, 6 docs: docs built from the corpus-dominant token
    # 'the' score highest (head), mixed docs middle, all-hapax docs tail
    rows = [
        (0, "the the the the", "en"),
        (1, "the the the and", "en"),
        (2, "the and rare1 rare2", "en"),
        (3, "the and rare3 rare4", "en"),
        (4, "hapax1 hapax2 hapax3 hapax4", "en"),
        (5, "hapax5 hapax6 hapax7 hapax8", "en"),
        # a second language buckets independently
        (6, "der der der der", "de"),
        (7, "der einzel1 einzel2 einzel3", "de"),
        (8, "einzel4 einzel5 einzel6 einzel7", "de"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, lang, "web", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")

    got = {r["doc_id"]: r.asDict() for r in text_ccnet_ppl_buckets(spark, sf).collect()}
    assert {d: got[d]["ppl_bucket"] for d in range(6)} == {
        0: "head", 1: "head", 2: "middle", 3: "middle", 4: "tail", 5: "tail"
    }
    # the CCNet keep rule: head+middle kept, tail dropped
    assert all(got[d]["kept"] for d in range(4))
    assert not got[4]["kept"] and not got[5]["kept"]
    # per-language independence: de buckets over its own 3 docs
    assert {got[d]["ppl_bucket"] for d in (6, 7, 8)} == {"head", "middle", "tail"}
    assert got[6]["ppl_bucket"] == "head" and got[8]["ppl_bucket"] == "tail"
