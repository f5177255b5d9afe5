"""Pins for exact substring-span dedup (operators/dedup.py::
dedup_substring_spans, Lee et al. 2021 style).

The two load-bearing claims, each pinned on a constructed corpus:
(1) windows SLIDE — a passage repeated at a DIFFERENT token offset in
    another document is still caught (tumbling segmentation would miss
    any alignment shift);
(2) marks MERGE — overlapping duplicated windows collapse to the exact
    token interval of the repeated passage (dup_tokens == passage
    length, not n_dup_windows * k).
"""

from __future__ import annotations

from distributed_video_analytics_flink_spark.operators.dedup import (
    _SPAN_K,
    dedup_substring_spans,
)

P = " ".join(f"p{i}" for i in range(1, 13))  # 12-token repeated passage
Q = " ".join(f"q{i}" for i in range(1, 13))  # second repeated passage


def _write_docs(spark, tmp_path, docs):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


def test_shifted_passage_caught_and_merged(spark, tmp_path):
    assert _SPAN_K == 8  # expectations below are closed-form in k
    docs = [
        f"{P} u1 u2 u3 u4",  # P at offset 0
        f"v1 v2 v3 {P} v4",  # P at offset 3 — alignment-shifted
        "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10",  # unique, 10 tokens
        "d1 d2 d3 d4 d5",  # shorter than k: zero windows
        f"{P} g1 g2 g3 g4 g5 g6 g7 g8 g9 {Q}",  # two separated passages
        f"{Q} w1 w2 w3 w4",  # Q's second occurrence
    ]
    sf = _write_docs(spark, tmp_path, docs)
    out = {
        r["doc_id"]: (
            r["n_windows"],
            r["n_dup_windows"],
            r["n_spans"],
            r["dup_tokens"],
            r["longest_span"],
        )
        for r in dedup_substring_spans(spark, sf).collect()
    }
    # P spans 5 sliding 8-windows; they merge to ONE 12-token interval in
    # both carriers regardless of the offset-3 shift in doc 1.
    assert out[0] == (9, 5, 1, 12, 12)
    assert out[1] == (9, 5, 1, 12, 12)
    assert out[2] == (3, 0, 0, 0, 0)
    assert out[3] == (0, 0, 0, 0, 0)
    # doc 4 carries BOTH passages with a 9-token unique gap: two spans,
    # never bridged (gap > 1 beyond the first span's end).
    assert out[4] == (26, 10, 2, 24, 12)
    assert out[5] == (9, 5, 1, 12, 12)
    # merging is doing real work: naive window-hit accounting would claim
    # n_dup_windows * k = 40 tokens for doc 0; the true union is 12.
    assert out[0][1] * _SPAN_K > out[0][3]


def test_self_repetition_within_one_doc(spark, tmp_path):
    """A document repeating ITS OWN passage is corpus-duplicated too —
    the count is over occurrences, not distinct docs (the Lee et al.
    semantics: the second copy inside one file is still removable)."""
    docs = [f"{P} x1 x2 x3 {P}", "y1 y2 y3 y4 y5 y6 y7 y8 y9"]
    sf = _write_docs(spark, tmp_path, docs)
    out = {r["doc_id"]: r.asDict() for r in dedup_substring_spans(spark, sf).collect()}
    d = out[0]
    # tokens 1-12 and 16-27: two islands of 5 windows each
    assert d["n_dup_windows"] == 10
    assert d["n_spans"] == 2
    assert d["dup_tokens"] == 24
    assert out[1]["n_dup_windows"] == 0


def test_span_rewrite_cuts_exactly_the_spans(spark, tmp_path):
    """dedup_span_rewrite must cut EXACTLY the merged span intervals the
    accounting query reports: per doc, n_removed == dup_tokens and the
    surviving text is the original minus those token ranges."""
    from distributed_video_analytics_flink_spark.operators.dedup import (
        dedup_span_rewrite,
    )

    docs = [
        f"{P} u1 u2 u3 u4",
        f"v1 v2 v3 {P} v4",
        "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10",
        "d1 d2 d3 d4 d5",
    ]
    sf = _write_docs(spark, tmp_path, docs)
    acc = {r["doc_id"]: r.asDict() for r in dedup_substring_spans(spark, sf).collect()}
    rew = {r["doc_id"]: r.asDict() for r in dedup_span_rewrite(spark, sf).collect()}
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    for d in acc:
        assert rew[d]["n_removed"] == acc[d]["dup_tokens"]
        assert rew[d]["n_kept"] + rew[d]["n_removed"] == len(docs[d].split(" "))
    # P (12 tokens) cut from both carriers; unique docs pass verbatim
    assert rew[0]["clean_md5"] == md5("u1 u2 u3 u4")
    assert rew[1]["clean_md5"] == md5("v1 v2 v3 v4")
    assert rew[2]["clean_md5"] == md5(docs[2])
    assert rew[3]["clean_md5"] == md5(docs[3])


def test_line_rewrite_agrees_with_line_accounting(spark):
    """text_line_rewrite and text_line_dedup must tell one story on the
    real fixture corpus: identical per-doc kept-line counts, and the
    rewritten byte count equals the original minus removed characters
    minus the separators that leave with each removed line."""
    from pyspark.sql import functions as F

    from distributed_video_analytics_flink_spark.operators.dedup import (
        text_line_dedup,
        text_line_rewrite,
    )
    from tests.conftest import SF_DIR

    acc = {r["doc_id"]: r.asDict() for r in text_line_dedup(spark, SF_DIR).collect()}
    rew = {r["doc_id"]: r.asDict() for r in text_line_rewrite(spark, SF_DIR).collect()}
    assert set(acc) == set(rew)
    for d, a in acc.items():
        assert rew[d]["n_kept"] == a["n_kept"]
        # all-boiler docs must still be present, as the empty document
        if a["n_kept"] == 0:
            assert rew[d]["clean_chars"] == 0
