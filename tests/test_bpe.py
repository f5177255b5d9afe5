"""Pins for the deterministic BPE tokenizer (functions/bpe.py) and the
line-level corpus dedup operator (operators/dedup.py::text_line_dedup).

The load-bearing claim is that the engine-portable REPLACE CHAIN is exact
BPE: these tests check it against an independent priority-queue encoder
(the textbook algorithm) on the whole pinned vocabulary and under fuzz,
prove the pinned merge table reproduces from the pinned vocab, and pin
the Spark column against the pure-Python counts on constructed text.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.functions.bpe import (
    FIXTURE_VOCAB,
    MERGES,
    bpe_token_count_col,
    encode_py,
    learn_merges,
)


def _chain_count(text: str) -> int:
    """Pure-Python replica of the replace chain over a full document."""
    s = "".join(f"<{c}>" for c in text)
    for a, b in MERGES:
        s = s.replace(f"<{a}><{b}>", f"<{a}{b}>")
    return s.count("<") - text.count("<") - text.count(" ")


def test_pinned_merges_reproduce():
    assert learn_merges(FIXTURE_VOCAB, len(MERGES)) == list(MERGES)


def test_chain_equals_priority_queue_on_vocab():
    for w in FIXTURE_VOCAB:
        assert _chain_count(w) == len(encode_py(w)), w


@pytest.mark.parametrize("seed", [0, 1])
def test_chain_equals_priority_queue_fuzz(seed):
    rng = random.Random(seed)
    for _ in range(1000):
        w = "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(1, 14))
        )
        assert _chain_count(w) == len(encode_py(w)), w


def test_known_counts():
    # closed-form: merges fully collapse frequent vocab, split rare ones
    assert len(encode_py("customer")) == 1
    assert len(encode_py("filter")) == 5
    assert len(encode_py("table")) == 2
    # multi-word text: merges never cross the space symbol
    assert _chain_count("customer filter") == 6


def test_spark_column_matches_python(spark):
    texts = [
        "customer query the spark window",
        "a",
        "filter filter filter",
        "zzz unknown tokens stay char split",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["text"]: r["n"]
        for r in df.select("text", bpe_token_count_col("text").alias("n")).collect()
    }
    for t in texts:
        expected = sum(len(encode_py(w)) for w in t.split(" "))
        assert got[t] == expected, t


def test_line_dedup_closed_form(spark, tmp_path):
    """Constructed corpus with known boilerplate: one 5-token line shared
    by 3 docs (>= k: removed everywhere), another shared by only 2 docs
    (kept). Accounting is exact per document."""
    boiler = "b1 b2 b3 b4 b5"
    rare = "r1 r2 r3 r4 r5"
    uniq = ["u{0} v{0} w{0} x{0} y{0}".format(i) for i in range(4)]
    docs = [
        (0, f"{boiler} {uniq[0]}", "en", "s", 0),
        (1, f"{boiler} {rare}", "en", "s", 0),
        (2, f"{boiler} {uniq[1]}", "en", "s", 0),
        (3, f"{rare} {uniq[2]}", "en", "s", 0),
        (4, uniq[3], "en", "s", 0),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    from distributed_video_analytics_flink_spark.operators.dedup import text_line_dedup

    out = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["n_removed"], r["chars_removed"])
        for r in text_line_dedup(spark, sf).collect()
    }
    assert out[0] == (2, 1, 1, len(boiler))
    assert out[1] == (2, 1, 1, len(boiler))
    assert out[2] == (2, 1, 1, len(boiler))
    assert out[3] == (2, 2, 0, 0)  # rare line occurs only twice: kept
    assert out[4] == (1, 1, 0, 0)


def _big_vocab(n_words: int = 240, seed: int = 7) -> tuple:
    """Deterministic synthetic vocabulary large enough to learn >= 1000
    merges (sum(len) - n_words bounds the learnable merge count)."""
    rng = random.Random(seed)
    return tuple(
        sorted(
            {
                "".join(
                    rng.choice("abcdefghijklmnopqrstuvwxyz")
                    for _ in range(rng.randint(5, 12))
                )
                for _ in range(n_words)
            }
        )
    )


def test_heap_equals_chain_at_1k_merges():
    """VERDICT r13 #6: the heap encoder must be exact BPE at a REALISTIC
    merge count, where the replace chain stops being the right plan. A
    ~1k-rule table is learned from a deterministic synthetic vocabulary;
    the heap and the (parameterized) chain replica must agree on every
    vocab word, on out-of-vocabulary fuzz, and on multi-word documents."""
    from distributed_video_analytics_flink_spark.functions.bpe import (
        chain_count_py,
        encode_heap,
    )

    vocab = _big_vocab()
    merges = tuple(learn_merges(vocab, 1100))
    assert len(merges) >= 1000, len(merges)
    for w in vocab:
        assert chain_count_py(w, merges) == len(encode_heap(w, merges)), w
    rng = random.Random(3)
    for _ in range(300):
        w = "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(1, 20))
        )
        assert chain_count_py(w, merges) == len(encode_heap(w, merges)), w
    doc = " ".join(rng.choice(vocab) for _ in range(50))
    assert chain_count_py(doc, merges) == sum(
        len(encode_heap(w, merges)) for w in doc.split(" ")
    )


def test_heap_equals_scan_reference_at_48_merges():
    from distributed_video_analytics_flink_spark.functions.bpe import encode_heap

    for w in FIXTURE_VOCAB:
        assert encode_heap(w) == encode_py(w), w
    rng = random.Random(11)
    for _ in range(500):
        w = "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(1, 14))
        )
        assert encode_heap(w) == encode_py(w), w


def test_heap_udf_matches_chain_column(spark):
    """The pandas-UDF scale path and the Catalyst chain must produce
    identical counts over real fixture documents."""
    from distributed_video_analytics_flink_spark.functions.bpe import (
        bpe_token_count_udf,
    )
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    out = docs.select(
        bpe_token_count_col("text").alias("chain"),
        bpe_token_count_udf()("text").alias("heap"),
    )
    assert out.filter(F.col("chain") != F.col("heap")).count() == 0


def test_chain_column_matches_heap_on_hostile_text(spark):
    """r14 review regression pins: the Catalyst chain and the heap UDF
    must agree on newlines (bare '.' skipped them), literal '<'/'>' (the
    bracket-count trick needs compensation), empty strings, and nulls
    (both propagate null)."""
    from distributed_video_analytics_flink_spark.functions.bpe import (
        bpe_token_count_udf,
    )

    texts = [
        "spark\nstream",
        "a<b",
        "x>y",
        "<<>>",
        "line one\nline two",
        "",
        None,
        "customer query\nthe spark window",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        "text",
        bpe_token_count_col("text").alias("chain"),
        bpe_token_count_udf()("text").alias("heap"),
    ).collect()
    for r in rows:
        assert r.chain == r.heap, (r.text, r.chain, r.heap)
    got = {r.text: r.chain for r in rows}
    # spot values: every char (incl. \n, <, >) is a symbol, spaces excluded
    from distributed_video_analytics_flink_spark.functions.bpe import encode_heap

    assert got["spark\nstream"] == len(encode_heap("spark\nstream"))
    assert got["a<b"] == 3
    assert got["<<>>"] == 4
    assert got[""] == 0
    assert got[None] is None


def test_bpe_train_merges_matches_reference_learner(spark):
    """The distributed trainer's trajectory == the reference learner
    (functions/bpe.py::learn_merges, frequency-weighted — ONE loop shared
    with the pinned-table reproduction test) run on the identical
    word-frequency table, at sf0.001."""
    import re
    from collections import Counter

    from distributed_video_analytics_flink_spark.operators.text_analysis import (
        _BPE_TRAIN_ROUNDS,
        text_bpe_train_merges,
    )
    from tests.conftest import SF_DIR

    rows = text_bpe_train_merges(spark, SF_DIR).collect()
    texts = [
        r["text"] for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ]
    # fullmatch == the engine's \A[a-z]+\z (a trailing-newline token must
    # be rejected on every engine and in this reference too — r15 review)
    weights = Counter(
        tok
        for t in texts
        for tok in t.lower().split(" ")
        if re.fullmatch("[a-z]+", tok)
    )
    expect = learn_merges(
        tuple(weights), _BPE_TRAIN_ROUNDS, weights=dict(weights), with_counts=True
    )
    got = [(r["lhs"], r["rhs"], r["pair_weight"]) for r in sorted(rows, key=lambda r: r["rank"])]
    assert got == expect
    assert [r["merged"] for r in sorted(rows, key=lambda r: r["rank"])] == [
        a + b for a, b, _ in expect
    ]


def test_learned_table_roundtrips_through_encoders(spark):
    """VERDICT r14 #2 done-criterion: the LEARNED merge table (not the
    pinned one) round-trips through bpe_token_count_udf — heap encoder,
    chain replica, and the Catalyst replace chain all agree under it on
    real corpus text."""
    from distributed_video_analytics_flink_spark.functions.bpe import (
        bpe_token_count_udf,
        chain_count_py,
        encode_heap,
    )
    from distributed_video_analytics_flink_spark.operators.text_analysis import (
        text_bpe_train_merges,
    )
    from tests.conftest import SF_DIR

    learned = tuple(
        (r["lhs"], r["rhs"])
        for r in sorted(
            text_bpe_train_merges(spark, SF_DIR).collect(), key=lambda r: r["rank"]
        )
    )
    assert learned and learned != MERGES[: len(learned)]  # weighted != uniform table
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(120)
    got = (
        docs.select("doc_id", "text")
        .withColumn("n", bpe_token_count_udf(learned)(F.col("text")))
        .collect()
    )
    for r in got:
        assert r["n"] == chain_count_py(r["text"], learned)
    # spot-check the heap encoder directly on a few words
    sample_words = {w for r in got[:10] for w in r["text"].split(" ")[:5]}
    for w in sample_words:
        assert len(encode_heap(w, learned)) == chain_count_py(w, learned)


def test_trained_pack_oracle_parity_on_exhausted_vocab(spark, tmp_path):
    """ADVICE r15: when the vocabulary fully merges before
    _BPE_TRAIN_ROUNDS, the engine breaks its training loop early and
    packs under the shorter learned table, while the oracle's empty b{k}
    CTEs used to NULL-propagate n_tok through the scalar-subquery
    replaces — a guaranteed hash mismatch on a degenerate corpus. The
    COALESCE(chr(1)||chr(1)) sentinel makes an exhausted round an
    identity replace; engine and oracle must agree on this corpus whose
    single word 'ab' exhausts after one merge."""
    import os

    import duckdb

    from distributed_video_analytics_flink_spark.operators.curation import (
        _pack_trained_bpe_oracle,
        curation_pack_sequences_trained_bpe,
    )
    from distributed_video_analytics_flink_spark.operators.text_analysis import (
        text_bpe_train_merges,
    )
    from tests.oracle_harness import compare, duck_connection

    sf_dir = str(tmp_path / "degenerate_sf")
    os.makedirs(sf_dir)
    duckdb.sql(
        f"""
        COPY (
          SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang,
                 source, CAST(n_chars AS BIGINT) AS n_chars
          FROM (VALUES
            (1, 'ab ab', 'en', 'web', 5),
            (2, 'ab', 'en', 'web', 2),
            (3, 'ab ab ab', 'de', 'web', 8)
          ) t(doc_id, text, lang, source, n_chars)
        ) TO '{sf_dir}/documents.parquet' (FORMAT PARQUET)
        """
    )
    # precondition: the loop really exhausts early on this corpus
    assert text_bpe_train_merges(spark, sf_dir).count() == 1

    res = compare(
        curation_pack_sequences_trained_bpe(spark, sf_dir),
        duck_connection(sf_dir),
        _pack_trained_bpe_oracle(),
    )
    assert res["hash_match"], res
