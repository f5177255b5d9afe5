"""Semantic pin for emb_hard_negative_triplets (similarity.py): the
cross-engine oracle proves agreement but not the DPR semantics — this
plants a fixture where the hard negative is known by construction and
asserts roles, ranks, and the hard>easy ordering by hand."""

from __future__ import annotations

from distributed_video_analytics_flink_spark.operators.similarity import (
    emb_hard_negative_triplets,
)


def _vec(**at):
    v = [0.0] * 64
    for i, x in at.items():
        v[int(i)] = x
    return v


def test_hard_negative_semantics(spark, tmp_path):
    # anchors are vec_id < 5; give them distinct one-hot directions.
    # anchor 0 (label 0) gets: a same-label near-copy (10), a same-label
    # weaker copy (11), a WRONG-label near-copy (12 — the hard negative),
    # and wrong-label orthogonals (13, 14 — easy negatives).
    rows = [
        (0, _vec(**{"0": 1.0}), 0),
        (1, _vec(**{"1": 1.0}), 1),
        (2, _vec(**{"2": 1.0}), 2),
        (3, _vec(**{"3": 1.0}), 3),
        (4, _vec(**{"4": 1.0}), 4),
        (10, _vec(**{"0": 0.95, "10": 0.3122499}), 0),
        (11, _vec(**{"0": 0.6, "11": 0.8}), 0),
        (12, _vec(**{"0": 0.9, "12": 0.43588989}), 7),  # hard negative
        (13, _vec(**{"13": 1.0}), 7),  # easy negative
        (14, _vec(**{"14": 1.0}), 8),  # easy negative
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")

    got = emb_hard_negative_triplets(spark, sf).collect()
    a0 = {
        (r["role"], r["rnk"]): (r["vec_id"], r["acos"])
        for r in got
        if r["anchor_id"] == 0
    }
    # positive: the BEST same-label neighbor (10 at cos .95), not 11
    assert a0[("pos", 1)][0] == 10
    # hard negative first: the wrong-label near-copy outranks every
    # orthogonal (the other anchors and 13/14 all sit at cos 0, so the
    # vec_id tie-break fills ranks 2-3 with the lowest ids, 1 then 2)
    assert a0[("neg", 1)][0] == 12
    assert (a0[("neg", 2)][0], a0[("neg", 3)][0]) == (1, 2)
    assert a0[("neg", 1)][1] > a0[("neg", 2)][1]  # hard > easy, strictly
    # every anchor emits exactly 1 positive + 3 negatives... when a
    # same-label neighbor exists; anchors 1-4 are their labels' only
    # members, so they emit negatives only
    for aid in (1, 2, 3, 4):
        roles = sorted(
            (r["role"], r["rnk"]) for r in got if r["anchor_id"] == aid
        )
        assert roles == [("neg", 1), ("neg", 2), ("neg", 3)]
