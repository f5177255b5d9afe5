"""Pins for ``text_kn_bigram_lm_score`` (operators/text_analysis.py):

- the fixed-point interpolated Kneser-Ney probability is replicated in
  pure Python with ``fractions.Fraction`` — exact rational arithmetic,
  no floats — and compared for EQUALITY against the engine, proving the
  micro-unit form really is max(c-D,0)/c(h) + D*N1+(h,.)/c(h) *
  N1+(.,w)/B with D = 3/4 floored once per event;
- the interpolated form's defining invariant — sum over the VOCAB of
  P(. | h) == 1 exactly, for every history — is pinned on the Fraction
  replica (the floored engine numbers can't express it; the rational
  form must);
- totality: 0/1-token documents come back with n_bi = 0 and zero
  scores, not missing rows.
"""

from __future__ import annotations

from collections import Counter
from fractions import Fraction

from distributed_video_analytics_flink_spark.operators.text_analysis import (
    text_kn_bigram_lm_score,
)

_D = Fraction(3, 4)


def _write_docs(spark, tmp_path, texts):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


def _kn_stats(texts):
    """Corpus bigram stats exactly as the engine defines them."""
    events = []
    for i, t in enumerate(texts):
        toks = t.split(" ")
        events.extend((i, toks[j - 1], toks[j]) for j in range(1, len(toks)))
    c_bi = Counter((h, w) for _, h, w in events)
    c_hist = Counter()
    n1p_hist = Counter()
    n1p_w = Counter()
    for (h, w), c in c_bi.items():
        c_hist[h] += c
        n1p_hist[h] += 1
        n1p_w[w] += 1
    return events, c_bi, c_hist, n1p_hist, n1p_w, len(c_bi)


def _p_kn(c_bi, c_hist, n1p_hist, n1p_w, b, h, w):
    first = max(c_bi[(h, w)] - _D, Fraction(0)) / c_hist[h]
    lam = _D * n1p_hist[h] / c_hist[h]
    return first + lam * Fraction(n1p_w[w], b)


_TEXTS = [
    "the cat sat on the mat",
    "the cat ran",
    "a dog sat on a log",
    "the dog and the cat",
    "solo",  # 1 token: no bigram events
    "on the mat the cat sat",
]


def test_engine_equals_fraction_replica(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, _TEXTS)
    events, c_bi, c_hist, n1p_hist, n1p_w, b = _kn_stats(_TEXTS)
    want = {i: [0, 0] for i in range(len(_TEXTS))}
    for i, h, w in events:
        p = _p_kn(c_bi, c_hist, n1p_hist, n1p_w, b, h, w)
        assert 0 < p <= 1
        want[i][0] += 1
        want[i][1] += (p.numerator * 1_000_000) // p.denominator
    got = {
        r["doc_id"]: r.asDict()
        for r in text_kn_bigram_lm_score(spark, sf).collect()
    }
    assert set(got) == set(want)
    for i, (n_bi, sum_p) in want.items():
        assert got[i]["n_bi"] == n_bi
        assert got[i]["sum_p_micro"] == sum_p
        assert got[i]["mean_p_micro"] == (sum_p // n_bi if n_bi else 0)


def test_interpolated_kn_sums_to_one_per_history():
    _, c_bi, c_hist, n1p_hist, n1p_w, b = _kn_stats(_TEXTS)
    vocab = list(n1p_w)  # every word that ever follows something
    for h in c_hist:
        total = sum(
            _p_kn(c_bi, c_hist, n1p_hist, n1p_w, b, h, w) for w in vocab
        )
        assert total == 1


def test_short_docs_are_total(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, ["only", "two words", "x y z"])
    rows = {r["doc_id"]: r for r in text_kn_bigram_lm_score(spark, sf).collect()}
    assert len(rows) == 3
    assert rows[0]["n_bi"] == 0 and rows[0]["sum_p_micro"] == 0
    assert rows[0]["mean_p_micro"] == 0
    assert rows[1]["n_bi"] == 1 and rows[2]["n_bi"] == 2


def test_randomized_corpora_match_replica(spark, tmp_path):
    """Seeded random corpora (skewed Zipf-ish vocab, varied doc lengths
    incl. 0-bigram docs) — engine == Fraction replica exactly. Catches
    formula/overflow slips the hand-built fixture can't reach."""
    import random

    rng = random.Random(1616)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(3):
        texts = [
            " ".join(
                rng.choices(vocab, weights=range(len(vocab), 0, -1))[0]
                for _ in range(rng.randint(1, 14))
            )
            for _ in range(rng.randint(4, 10))
        ]
        sf = _write_docs(spark, tmp_path / f"t{trial}", texts)
        events, c_bi, c_hist, n1p_hist, n1p_w, b = _kn_stats(texts)
        want = {i: [0, 0] for i in range(len(texts))}
        for i, h, w in events:
            p = _p_kn(c_bi, c_hist, n1p_hist, n1p_w, b, h, w)
            want[i][0] += 1
            want[i][1] += (p.numerator * 1_000_000) // p.denominator
        got = {
            r["doc_id"]: r.asDict()
            for r in text_kn_bigram_lm_score(spark, sf).collect()
        }
        assert set(got) == set(want), texts
        for i, (n_bi, sum_p) in want.items():
            assert got[i]["n_bi"] == n_bi, texts[i]
            assert got[i]["sum_p_micro"] == sum_p, texts[i]
