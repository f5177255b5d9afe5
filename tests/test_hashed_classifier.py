"""Pins for the hashed-feature linear classifier
(operators/text_analysis.py::text_quality_classifier /
text_classifier_train_step).

The engine-side score is replicated token-for-token in pure Python
(hashlib.md5, the same first-4-hex fold) and compared exactly; the
perceptron step is pinned on constructed corpora where the gradient is
closed-form (every bucket of a misclassified doc moves by y - p per
occurrence, perfectly-classified corpora produce NO update rows).
"""

from __future__ import annotations

import hashlib

from distributed_video_analytics_flink_spark.operators.text_analysis import (
    _CLS_BUCKETS,
    _CLS_HALF,
    _CLS_MODW,
    _CLS_MUL,
    text_classifier_train_epochs,
    text_classifier_train_step,
    text_quality_classifier,
)


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % _CLS_BUCKETS


def _weight(tok: str) -> int:
    return (_bucket(tok) * _CLS_MUL) % _CLS_MODW - _CLS_HALF


def _score(text: str) -> int:
    w = text.lower().split(" ")
    uni = sum(_weight(t) for t in w)
    big = sum(_weight(f"{a}_{b}") for a, b in zip(w, w[1:]))
    return uni + big


def _write_docs(spark, tmp_path, rows):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, lang, "s", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


def test_score_matches_python_replica(spark, tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "single",
        "Mixed CASE Tokens Fold To lower",
        "repeat repeat repeat repeat",
    ]
    sf = _write_docs(spark, tmp_path, [(t, "en") for t in texts])
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_micro"], r["keep"])
        for r in text_quality_classifier(spark, sf).collect()
    }
    for i, t in enumerate(texts):
        s = _score(t)
        assert got[i] == (len(t.split(" ")), s, s > 0), t


def test_train_step_gradient_is_closed_form(spark, tmp_path):
    """One doc per label side, both misclassified by construction: every
    unigram bucket's gradient equals (y - p) * occurrences."""
    # find a token whose weight is negative (so a doc of it scores < 0,
    # p = -1) and one positive — search a tiny candidate pool
    neg = next(t for t in ("alpha", "beta", "gamma", "delta") if _weight(t) < 0)
    pos = next(t for t in ("alpha", "beta", "gamma", "delta") if _weight(t) > 0)
    # doc 0: en (y=+1) but scores negative -> e = +2 on each token hit
    # doc 1: fr (y=-1) but scores positive -> e = -2
    t0 = f"{neg} {neg} {neg}"
    t1 = f"{pos}"
    # guard: bigram weights must not flip the constructed signs
    assert _score(t0) < 0 and _score(t1) > 0
    sf = _write_docs(spark, tmp_path, [(t0, "en"), (t1, "fr")])
    got = {
        r["bucket"]: (r["grad"], r["n_updates"])
        for r in text_classifier_train_step(spark, sf).collect()
    }
    expected = {}
    for tok, e in [(neg, 2), (neg, 2), (neg, 2), (pos, -2)]:
        b = _bucket(tok)
        g, n = expected.get(b, (0, 0))
        expected[b] = (g + e, n + 1)
    assert got == expected


def test_train_step_converged_corpus_is_empty(spark, tmp_path):
    """Correctly-classified docs contribute NOTHING — the pre-explode
    e != 0 filter (per-step work shrinks as the model converges)."""
    pos = next(t for t in ("alpha", "beta", "gamma", "delta") if _weight(t) > 0)
    neg = next(t for t in ("alpha", "beta", "gamma", "delta") if _weight(t) < 0)
    assert _score(pos) > 0 and _score(neg) < 0
    sf = _write_docs(spark, tmp_path, [(pos, "en"), (neg, "fr")])
    assert text_classifier_train_step(spark, sf).count() == 0


def test_applied_update_fixes_the_mistake(spark, tmp_path):
    """The whole point of the step: w' = w + lr*grad must move a
    misclassified doc's score toward its label. Verified in the Python
    replica arithmetic using the ENGINE's gradient output."""
    neg = next(t for t in ("alpha", "beta", "gamma", "delta") if _weight(t) < 0)
    t0 = f"{neg} {neg}"
    assert _score(t0) < 0
    sf = _write_docs(spark, tmp_path, [(t0, "en")])
    grads = {r["bucket"]: r["grad"] for r in text_classifier_train_step(spark, sf).collect()}
    # unigram-leg score under updated weights (lr chosen to overcome the
    # micro-unit magnitude; bigram buckets are not updated by the step)
    lr = _CLS_MODW
    w = t0.split(" ")
    new_uni = sum(_weight(t) + lr * grads.get(_bucket(t), 0) for t in w)
    old_uni = sum(_weight(t) for t in w)
    assert new_uni > old_uni  # moved toward y = +1


def test_epochs_converge_on_separable_corpus(spark, tmp_path):
    """The training-works pin: on a linearly separable corpus (each class
    speaks a disjoint vocabulary), the epoch loop drives misclassification
    to ZERO and keeps it there — and once converged, grad_l1 is 0 too.
    (On the shared-vocabulary synthetic testdata the trajectory
    oscillates; separability is what makes convergence provable.)"""
    en = [" ".join(f"etok{j}" for j in range(5))] * 6
    fr = [" ".join(f"ftok{j}" for j in range(5))] * 6
    rows = [(t, "en") for t in en] + [(t, "fr") for t in fr]
    sf = _write_docs(spark, tmp_path, rows)
    out = {
        r["epoch"]: (r["n_misclassified"], r["grad_l1"])
        for r in text_classifier_train_epochs(spark, sf).collect()
    }
    assert len(out) == 3
    assert out[1][0] > 0  # the init formula misclassifies something
    assert out[2] == (0, 0)  # one update separates the vocabularies
    assert out[3] == (0, 0)  # and stays converged
