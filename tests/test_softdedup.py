"""Pins for ``curation_softdedup_weights`` (operators/curation.py):

- keep-direction: a document duplicated k times is down-weighted to
  ~1/k while a globally-unique document keeps weight exactly 1.0 —
  the defining SoftDeDup semantic (down-weight, never drop);
- mass conservation the hard-dedup legs lack: every input doc_id is
  present in the output with weight > 0;
- totality: documents too short to shingle (< 3 tokens) come back at
  FULL weight (never down-weighted for being short);
- the exact-rational form: weight_micro replicated with integer
  arithmetic on a constructed corpus.
"""

from __future__ import annotations

from distributed_video_analytics_flink_spark.operators.curation import (
    curation_softdedup_weights,
)


def _write_docs(spark, tmp_path, texts):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    return sf


def test_duplicates_downweighted_uniques_kept(spark, tmp_path):
    dup = "the quick brown fox jumps over the lazy dog tonight"
    texts = [dup, dup, dup, "completely different words appear only here once", "hi there"]
    sf = _write_docs(spark, tmp_path, texts)
    rows = {r["doc_id"]: r.asDict() for r in curation_softdedup_weights(spark, sf).collect()}

    # mass conservation: nothing dropped, every weight positive
    assert set(rows) == set(range(len(texts)))
    assert all(r["weight_micro"] > 0 for r in rows.values())

    # the triplicated doc: every shingle appears exactly 3 times ->
    # commonness 3.0, weight exactly 1/3 (floored micro)
    for i in (0, 1, 2):
        assert rows[i]["commonness_micro"] == 3_000_000
        assert rows[i]["weight_micro"] == 1_000_000_000_000 // 3_000_000
    # the unique doc: commonness 1.0, full weight
    assert rows[3]["commonness_micro"] == 1_000_000
    assert rows[3]["weight_micro"] == 1_000_000
    # effective tokens: n_tok * weight
    assert rows[3]["eff_tokens_micro"] == rows[3]["n_tok"] * 1_000_000
    assert rows[0]["eff_tokens_micro"] == rows[0]["n_tok"] * rows[0]["weight_micro"]

    # 2-token doc: no shingles, total at FULL weight
    assert rows[4]["n_sh"] == 0
    assert rows[4]["commonness_micro"] == 1_000_000
    assert rows[4]["weight_micro"] == 1_000_000
    assert rows[4]["n_tok"] == 2


def test_partial_overlap_between_hard_and_soft(spark, tmp_path):
    # one shared shingle between two otherwise-distinct docs: commonness
    # lands strictly between unique (1.0) and duplicated, so the weight
    # is strictly between 1/2 and 1 — the graded signal hard dedup
    # cannot express
    a = "alpha beta gamma delta"
    b = "omega psi alpha beta gamma"
    sf = _write_docs(spark, tmp_path, [a, b])
    rows = {r["doc_id"]: r.asDict() for r in curation_softdedup_weights(spark, sf).collect()}
    # doc a shingles: (alpha beta gamma) x2 corpus-wide, (beta gamma delta) x1
    # -> freq_sum 3, n_sh 2 -> commonness 1.5
    assert rows[0]["commonness_micro"] == 1_500_000
    assert 500_000 < rows[0]["weight_micro"] < 1_000_000
    assert rows[1]["commonness_micro"] == (4 * 1_000_000) // 3


def test_randomized_corpora_match_integer_replica(spark, tmp_path):
    """Seeded random corpora — engine == pure-integer replica of the
    shingle-commonness arithmetic, exactly."""
    import random
    from collections import Counter

    rng = random.Random(1617)
    vocab = [f"w{i}" for i in range(8)]
    for trial in range(3):
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12)))
            for _ in range(rng.randint(4, 9))
        ]
        sf = _write_docs(spark, tmp_path / f"t{trial}", texts)
        shingles = {
            i: [" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)]
            for i, toks in ((i, t.split(" ")) for i, t in enumerate(texts))
        }
        freq = Counter(s for ss in shingles.values() for s in ss)
        got = {
            r["doc_id"]: r.asDict()
            for r in curation_softdedup_weights(spark, sf).collect()
        }
        assert set(got) == set(range(len(texts)))
        for i, ss in shingles.items():
            n_tok = len(texts[i].split(" "))
            if ss:
                common = (sum(freq[s] for s in ss) * 1_000_000) // len(ss)
            else:
                common = 1_000_000
            weight = 1_000_000_000_000 // common
            assert got[i]["n_sh"] == len(ss), texts[i]
            assert got[i]["commonness_micro"] == common, texts[i]
            assert got[i]["weight_micro"] == weight, texts[i]
            assert got[i]["eff_tokens_micro"] == n_tok * weight, texts[i]
