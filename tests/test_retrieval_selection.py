"""Pins for the r15 retrieval/selection scorers:

- ``text_bm25_topk`` (operators/text_analysis.py): the fixed-point BM25
  is replicated in pure Python with ``fractions.Fraction`` — exact
  rational arithmetic, no floats — and compared for EQUALITY, proving
  the cross-multiplied micro-unit form really is
  idf_rational * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) with k1=1.2,
  b=0.75 floored to micro-units.
- ``curation_dsir_importance`` (operators/curation.py): the hashed-bigram
  Laplace-ratio weight is replicated with hashlib.md5 + Fraction and
  compared exactly; selection semantics (target docs never emitted,
  target-vocabulary docs outrank off-domain docs) are pinned on a
  constructed corpus.
"""

from __future__ import annotations

import hashlib
from fractions import Fraction

from distributed_video_analytics_flink_spark.operators.curation import (
    _DSIR_BUCKETS,
    curation_dsir_importance,
)
from distributed_video_analytics_flink_spark.operators.text_analysis import (
    _BM25_TERMS,
    text_bm25_topk,
)


def _write_docs(spark, tmp_path, rows):
    """rows: list of (text, source)."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", src, len(t)) for i, (t, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


# --- pure-Python BM25 replica (exact rationals) ------------------------------

K1 = Fraction(12, 10)
B = Fraction(3, 4)


def _bm25_replica(texts):
    toks = [t.split(" ") for t in texts]
    dls = [len(w) for w in toks]
    n_docs = len(texts)
    avgdl = Fraction(sum(dls), n_docs)
    out = {}
    for i, w in enumerate(toks):
        score = 0
        hits = 0
        for term in _BM25_TERMS:
            tf = w.count(term)
            if tf == 0:
                continue
            df = sum(1 for ws in toks if term in ws)
            idf = Fraction(2 * n_docs - 2 * df + 1, 2 * df + 1)
            sat = (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * Fraction(dls[i]) / avgdl))
            score += int(idf * sat * 1_000_000)  # int() == floor for >= 0
            hits += 1
        if hits:
            out[i] = (score, hits)
    return out


def test_bm25_equals_rational_replica(spark, tmp_path):
    texts = [
        "merge window stream merge stream extra tokens here now",
        "merge merge merge merge",
        "window alone in a much longer document with many filler words trailing",
        "no query terms at all in this document",
        "stream window",
    ]
    sf = _write_docs(spark, tmp_path, [(t, "s") for t in texts])
    got = {
        r["doc_id"]: (r["bm25_micro"], r["n_terms_hit"])
        for r in text_bm25_topk(spark, sf).collect()
    }
    want = _bm25_replica(texts)
    assert got == want
    # doc 3 has no query terms: absent from the result, not scored 0
    assert 3 not in got


def test_bm25_saturation_and_length_norm(spark, tmp_path):
    # Same tf of 'merge', one doc padded with filler: the longer doc must
    # score LOWER (length normalization), and tf growth must saturate
    # (score(tf=8) < 2 * score(tf=1) under k1=1.2).
    texts = [
        "merge alpha",
        "merge " + " ".join(["filler"] * 30),
        "merge merge merge merge merge merge merge merge alpha alpha alpha alpha alpha alpha alpha",
    ]
    sf = _write_docs(spark, tmp_path, [(t, "s") for t in texts])
    got = {r["doc_id"]: r["bm25_micro"] for r in text_bm25_topk(spark, sf).collect()}
    assert got[0] > got[1]
    assert got[2] < 2 * got[0]


# --- pure-Python DSIR replica -------------------------------------------------


def _dsir_bucket(gram: str, buckets: int = _DSIR_BUCKETS) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % buckets


def _dsir_replica(rows, buckets: int = _DSIR_BUCKETS):
    """rows: list of (text, source); returns {doc_id: (weight, mean, n)}."""
    grams = []
    for i, (t, src) in enumerate(rows):
        w = t.split(" ")
        if len(w) < 2:
            continue
        for a, b in zip(w, w[1:]):
            grams.append((i, src == "src0", _dsir_bucket(f"{a} {b}", buckets)))
    c_t, c_r = {}, {}
    for _, is_t, bkt in grams:
        (c_t if is_t else c_r)[bkt] = (c_t if is_t else c_r).get(bkt, 0) + 1
    n_t = sum(1 for _, is_t, _ in grams if is_t)
    n_r = len(grams) - n_t
    out = {}
    for i, is_t, bkt in grams:
        if is_t:
            continue
        ratio = Fraction(
            (c_t.get(bkt, 0) + 1) * (n_r + buckets) * 1_000_000,
            (c_r.get(bkt, 0) + 1) * (n_t + buckets),
        )
        w, n = out.get(i, (0, 0))
        out[i] = (w + int(ratio), n + 1)
    return {i: (w, w // n, n) for i, (w, n) in out.items()}


def test_dsir_equals_python_replica(spark, tmp_path):
    rows = [
        ("spark shuffle join agg window", "src0"),
        ("spark shuffle join agg window spark shuffle", "src0"),
        ("spark shuffle join agg", "src1"),  # target-like raw doc
        ("llama alpaca vicuna gecko iguana", "src1"),  # off-domain raw doc
        ("spark shuffle llama alpaca", "src2"),  # mixed
        ("solo", "src1"),  # < 2 tokens: no bigrams, excluded
        ("spark shuffle join window", None),  # NULL source: raw pool, both engines
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["dsir_weight_micro"], r["mean_ratio_micro"], r["n_grams"])
        for r in curation_dsir_importance(spark, sf).collect()
    }
    assert got == _dsir_replica(rows)
    # target docs are never emitted; the 1-token doc has no bigrams
    assert 0 not in got and 1 not in got and 5 not in got
    # selection signal: target-vocabulary raw doc outranks the off-domain one
    assert got[2][1] > got[3][1]
    # mixed doc sits strictly between
    assert got[2][1] > got[4][1] > got[3][1]


def test_dsir_paper_width_replica_and_plan(spark, tmp_path):
    """The 10k-bucket variant (VERDICT r15 #7): same engine pass at the
    paper's width must equal the Fraction replica at that width, the fit
    must stay a bounded broadcast (at most one row per OCCUPIED bucket),
    and the top-k must remain per-partition heads, not a global sort."""
    from distributed_video_analytics_flink_spark.operators.curation import (
        _DSIR_BUCKETS_PAPER,
        curation_dsir_importance_10k_checked,
    )

    rows = [
        ("spark shuffle join agg window", "src0"),
        ("spark shuffle join agg window spark shuffle", "src0"),
        ("spark shuffle join agg", "src1"),
        ("llama alpaca vicuna gecko iguana", "src1"),
        ("spark shuffle llama alpaca", "src2"),
        ("spark shuffle join window", None),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    df = curation_dsir_importance_10k_checked(spark, sf)
    got = {
        r["doc_id"]: (r["dsir_weight_micro"], r["mean_ratio_micro"], r["n_grams"])
        for r in df.collect()
    }
    assert got == _dsir_replica(rows, _DSIR_BUCKETS_PAPER)
    # at 10k buckets the tiny corpus's bigrams no longer collide: the
    # in-domain raw doc ranks strictly above mixed above off-domain
    assert got[2][1] > got[4][1] > got[3][1]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the fit table broadcasts
    assert "TakeOrderedAndProject" in plan  # top-k = per-partition heads


# --- RRF hybrid fusion ---------------------------------------------------------


def test_rrf_rewards_both_leg_hits(spark, tmp_path):
    from distributed_video_analytics_flink_spark.operators.similarity import (
        sim_hybrid_rrf_topk,
    )

    sf = str(tmp_path)
    # doc 1: top BM25 hit (dense query terms, short) AND top cosine hit
    # (embedding equal to the query vector). doc 2: BM25-only. doc 3:
    # cosine-only (no query terms, near-query embedding).
    docs = [
        (1, "merge window stream merge"),
        (2, "merge window stream filler filler filler filler"),
        (3, "no terms here at all"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    qv = [1.0, -1.0] * 32
    emb = {
        0: qv,  # the query vector
        1: qv,  # identical -> cosine 1.0, rank 1
        2: [-x for x in qv],  # antipode -> cosine -1.0, last
        3: qv[:32] + [0.5 * x for x in qv[32:]],  # close -> rank 2
    }
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in emb.items()],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{sf}/embeddings.parquet")

    got = {r["id"]: r.asDict() for r in sim_hybrid_rrf_topk(spark, sf).collect()}
    # with 3 corpus vectors the cosine HEAD (top-10) holds all of them:
    # cosine ranks are 1 (identical), 2 (half-match), 3 (antipode)
    # doc 1 hit both legs at rank 1: 2 * (1e9 // 61)
    assert got[1]["in_bm25"] and got[1]["in_cosine"]
    assert got[1]["rrf_micro"] == 2 * (1_000_000_000 // 61)
    # doc 2: BM25 rank 2 + cosine rank 3 (antipode)
    assert got[2]["in_bm25"] and got[2]["in_cosine"]
    assert got[2]["rrf_micro"] == 1_000_000_000 // 62 + 1_000_000_000 // 63
    # doc 3: cosine rank 2 only (no query terms -> BM25 never scores it)
    assert got[3]["in_cosine"] and not got[3]["in_bm25"]
    assert got[3]["rrf_micro"] == 1_000_000_000 // 62
    # the double rank-1 hit dominates
    assert got[1]["rrf_micro"] > got[2]["rrf_micro"] > got[3]["rrf_micro"]
