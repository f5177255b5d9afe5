"""sim_knn_bucketed: the skew-hardened k-NN block key (label x LSH bucket).

VERDICT r4 flagged sim_label_knn's label-only blocks as the straggler risk:
one dominant label means one task doing O(label^2) work. These tests pin the
two properties the bucketed variant exists for:

1. **Bounded blocks under label skew** — with 90% of vectors in one label,
   no (label, bucket) block exceeds a small fraction of the hot label;
   hyperplane signs are independent of the label, so buckets split the hot
   label roughly evenly.
2. **Exactness within blocks** — the argpartition-based inner top-k (with
   threshold + lexsort tie handling) returns exactly the brute-force
   neighbors, same ranks, same deterministic (cosine DESC, id ASC)
   tie-break.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from distributed_video_analytics_flink_spark.operators.similarity import (
    _Q,
    knn_bucketed,
)

DIM = 16
N = 300
HOT_FRACTION = 0.9
N_PLANES = 3  # 8 buckets


def _np_q(t):
    return (np.floor(np.abs(t) + 0.5) * np.sign(t)).astype(np.int64)


def _make_data():
    rng = np.random.default_rng(42)
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
    # Unbucketed, the hot label is ONE block of 270 (100% of the label in a
    # single task). Bucketed, the hottest block must be a small fraction —
    # expected hot/2^planes = ~34; allow 2x margin for uneven splits.
    assert sizes.max() <= 2 * (hot / 2**N_PLANES), sizes.sort_values().tail()

    # And the operator's own output agrees with that blocking: neighbors only
    # ever come from the same (label, bucket) block.
    out = knn_bucketed(_spark_df(spark, V, labels), [p.tolist() for p in planes]).toPandas()
    key = {int(i): (int(l), int(b)) for i, l, b in zip(np.arange(N), labels, buckets)}
    for row in out.itertuples():
        assert key[row.vec_id] == (row.label, row.bucket)
        assert key[row.neighbor_id] == (row.label, row.bucket)


def test_bucketed_knn_matches_bruteforce(spark):
    V, labels, planes = _make_data()
    buckets = _buckets(V, planes)
    out = knn_bucketed(
        _spark_df(spark, V, labels), [p.tolist() for p in planes], k=3
    ).toPandas()

    # Brute-force reference with the same quantized cosine.
    norms = np.sqrt(_np_q(V * V * _Q).sum(axis=1).astype(np.float64))
    expected = []
    for lb in sorted(set(zip(labels, buckets))):
        idx = np.nonzero((labels == lb[0]) & (buckets == lb[1]))[0]
        if len(idx) < 2:
            continue
        B = V[idx]
        dots = _np_q(B[:, None, :] * B[None, :, :] * _Q).sum(axis=2)
        cos = dots / (norms[idx][:, None] * norms[idx][None, :])
        for li, gi in enumerate(idx):
            c = cos[li].copy()
            c[li] = -np.inf
            order = np.lexsort((idx, -c))[: min(3, len(idx) - 1)]
            for r, j in enumerate(order, 1):
                expected.append(
                    (int(gi), int(lb[0]), int(lb[1]), r, int(idx[j]), float(c[j]))
                )
    exp = pd.DataFrame(
        expected, columns=["vec_id", "label", "bucket", "rank", "neighbor_id", "cosine"]
    ).sort_values(["vec_id", "rank"]).reset_index(drop=True)
    got = out.sort_values(["vec_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(exp.dtypes.to_dict()), exp, check_exact=True
    )


def test_tie_break_across_partition_boundary(spark):
    """Duplicate vectors force exact cosine ties at the top-k boundary; the
    partition-threshold + lexsort path must pick the LOWER neighbor ids, as
    the oracle's ORDER BY cosine DESC, neighbor_id ASC does."""
    base = np.ones(DIM)
    # five identical vectors (pairwise cosine exactly 1.0) in one label; with
    # k=3 every vector must choose the three smallest OTHER ids.
    V = np.stack([base] * 5)
    labels = np.zeros(5, dtype=np.int32)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(5, dtype=np.int64),
            "label": labels,
            "embedding": [row.tolist() for row in V],
        }
    )
    df = spark.createDataFrame(pdf, "vec_id long, label int, embedding array<double>")
    out = (
        knn_bucketed(df, [np.ones(DIM).tolist()], k=3)
        .toPandas()
        .sort_values(["vec_id", "rank"])
    )
    for vid, grp in out.groupby("vec_id"):
        others = sorted(set(range(5)) - {vid})
        assert list(grp["neighbor_id"]) == others[:3]
        assert list(grp["rank"]) == [1, 2, 3]
        assert (grp["cosine"] == 1.0).all()
