"""sim_neardup_pairs_bucketed: the skew-hardened near-dup edge generator
(label x LSH bucket), closing the semantic-dedup pipeline's last
label-block-all-pairs shape (VERDICT r5 #3). Mirrors
tests/test_knn_bucketed.py's two pinned properties:

1. **Bounded blocks under label skew** — with 90% of vectors in one label,
   no (label, bucket) block exceeds a small fraction of the hot label.
2. **Exactness within blocks** — emitted pairs are exactly the brute-force
   same-block pairs above threshold, with the same quantized cosine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from distributed_video_analytics_flink_spark.operators.similarity import (
    _Q,
    neardup_pairs_bucketed,
)

DIM = 16
N = 300
HOT_FRACTION = 0.9
N_PLANES = 3  # 8 buckets
THRESHOLD = 0.35


def _np_q(t):
    return (np.floor(np.abs(t) + 0.5) * np.sign(t)).astype(np.int64)


def _make_data():
    rng = np.random.default_rng(7)
    V = rng.normal(size=(N, DIM))
    labels = np.where(np.arange(N) < int(N * HOT_FRACTION), 0, 1 + np.arange(N) % 3)
    planes = rng.normal(size=(N_PLANES, DIM))
    return V, labels.astype(np.int32), planes


def _buckets(V, planes):
    dots = _np_q(V[:, None, :] * planes[None, :, :] * _Q).sum(axis=2)
    return (dots > 0).astype(np.int64) @ (1 << np.arange(N_PLANES))


def _spark_df(spark, V, labels):
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(N, dtype=np.int64),
            "label": labels,
            "embedding": [row.astype(np.float64).tolist() for row in V],
        }
    )
    return spark.createDataFrame(pdf, "vec_id long, label int, embedding array<double>")


def test_bucketed_blocks_bounded_under_label_skew(spark):
    V, labels, planes = _make_data()
    buckets = _buckets(V, planes)
    hot = int((labels == 0).sum())
    assert hot == 270  # the skew premise: 90% one label

    sizes = pd.Series(zip(labels, buckets)).value_counts()
    # Unbucketed, the hot label is ONE block of 270 pairs-squared in a
    # single task. Bucketed, the hottest block must be a small fraction —
    # expected hot/2^planes = ~34; allow 2x margin for uneven splits.
    assert sizes.max() <= 2 * (hot / 2**N_PLANES), sizes.sort_values().tail()

    # And every emitted pair stays inside one (label, bucket) block.
    out = neardup_pairs_bucketed(
        _spark_df(spark, V, labels), [p.tolist() for p in planes], threshold=THRESHOLD
    ).toPandas()
    key = {int(i): (int(l), int(b)) for i, l, b in zip(np.arange(N), labels, buckets)}
    assert len(out) > 0, "threshold too tight for the fixture — test is vacuous"
    for row in out.itertuples():
        assert key[row.vec_a] == (row.label, row.bucket)
        assert key[row.vec_b] == (row.label, row.bucket)
        assert row.vec_a < row.vec_b
        assert row.cosine >= THRESHOLD


def test_bucketed_pairs_match_bruteforce(spark):
    V, labels, planes = _make_data()
    buckets = _buckets(V, planes)
    out = neardup_pairs_bucketed(
        _spark_df(spark, V, labels), [p.tolist() for p in planes], threshold=THRESHOLD
    ).toPandas()

    norms = np.sqrt(_np_q(V * V * _Q).sum(axis=1).astype(np.float64))
    expected = []
    for lb in sorted(set(zip(labels, buckets))):
        idx = np.nonzero((labels == lb[0]) & (buckets == lb[1]))[0]
        if len(idx) < 2:
            continue
        B = V[idx]
        dots = _np_q(B[:, None, :] * B[None, :, :] * _Q).sum(axis=2)
        cos = dots / (norms[idx][:, None] * norms[idx][None, :])
        ii, jj = np.nonzero((cos >= THRESHOLD) & (idx[:, None] < idx[None, :]))
        for a_i, b_j in zip(ii, jj):
            expected.append(
                (int(idx[a_i]), int(idx[b_j]), int(lb[0]), int(lb[1]), float(cos[a_i, b_j]))
            )
    exp = (
        pd.DataFrame(expected, columns=["vec_a", "vec_b", "label", "bucket", "cosine"])
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    got = out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()), exp, check_exact=True)


def test_multiband_union_is_superset_of_each_set(spark):
    """Recall recovery: the multiband union must contain every pair either
    single plane set finds (and, on this fixture, strictly more than one
    set alone — otherwise the union is vacuous)."""
    V, labels, planes = _make_data()
    df = _spark_df(spark, V, labels)
    sets = [planes[0:2], planes[1:3]]
    singles = []
    for ps in sets:
        out = neardup_pairs_bucketed(df, [p.tolist() for p in ps], threshold=THRESHOLD)
        singles.append({(r.vec_a, r.vec_b) for r in out.collect()})
    union = singles[0] | singles[1]
    assert singles[0] != union or singles[1] != union, (
        "fixture degenerate: both plane sets found identical pairs"
    )
    for s in singles:
        assert s <= union
