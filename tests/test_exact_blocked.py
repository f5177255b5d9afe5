"""Pair-cell blocking for the EXACT baselines (sim_neardup_pairs /
sim_label_knn): the last label-block all-pairs shapes, rewritten so
exactness no longer means one O(label^2) task under a dominant label
(r7). Pins:

1. **Bounded cells under label skew** — with 90% of vectors in one
   label, no (label, ci, cj) pair-cell task sees more than two
   id-buckets' worth of rows.
2. **Exactness** — the blocked generators emit EXACTLY the naive
   all-pairs results: same pair set, same quantized cosines, same
   deterministic (cosine DESC, neighbor_id ASC) k-NN ranking across the
   candidate-merge window — including forced cosine ties.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from distributed_video_analytics_flink_spark.operators.similarity import (
    _Q,
    label_knn_exact,
    neardup_pairs_exact,
)

DIM = 16
N = 300
HOT_FRACTION = 0.9
B = 8  # pair-cell id-buckets
THRESHOLD = 0.35
K = 3


def _np_q(t):
    return (np.floor(np.abs(t) + 0.5) * np.sign(t)).astype(np.int64)


def _make_data(with_ties: bool = False):
    rng = np.random.default_rng(7)
    V = rng.normal(size=(N, DIM))
    if with_ties:
        # duplicate vectors force exact cosine ties: the tie-break on
        # neighbor_id must survive the distributed candidate merge
        V[50] = V[10]
        V[51] = V[10]
        V[200] = V[150]
    labels = np.where(np.arange(N) < int(N * HOT_FRACTION), 0, 1 + np.arange(N) % 3)
    return V, labels.astype(np.int32)


def _spark_df(spark, V, labels):
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(N, dtype=np.int64),
            "label": labels,
            "embedding": [row.astype(np.float64).tolist() for row in V],
        }
    )
    return spark.createDataFrame(pdf, "vec_id long, label int, embedding array<double>")


def _cosines(V):
    norms = np.sqrt(_np_q(V * V * _Q).sum(axis=1).astype(np.float64))
    dots = _np_q(V[:, None, :] * V[None, :, :] * _Q).sum(axis=2)
    # The fixture includes a deliberate zero-norm row; its cosines are
    # undefined and never asserted on, so divide warnings are noise here.
    with np.errstate(divide="ignore", invalid="ignore"):
        return dots / (norms[:, None] * norms[None, :])


def test_pair_cells_bound_tasks_under_label_skew(spark):
    """No single task sees more than two id-buckets of the hot label —
    the whole point of the blocking (the naive form put all 270 hot-label
    rows, hence 270^2 scoring, in ONE task)."""
    from distributed_video_analytics_flink_spark.operators.similarity import (
        _pair_cells,
    )

    V, labels = _make_data()
    hot = int((labels == 0).sum())
    assert hot == 270  # the skew premise

    cells = _pair_cells(_spark_df(spark, V, labels), B).toPandas()
    sizes = cells.groupby(["label", "ci", "cj"]).size()
    # each cell holds at most two buckets' rows; expected bucket =
    # hot/B = ~34, so cells stay under ~2*34*margin — far below 270
    assert sizes.max() <= 2 * 2 * (hot / B), sizes.sort_values().tail()
    # the hot label spreads over all B(B+1)/2 cells
    assert len(sizes.loc[0]) == B * (B + 1) // 2
    # replication is exactly B entries per vector (one per partner bucket)
    assert len(cells) == N * B


def test_blocked_pairs_match_naive_all_pairs(spark):
    V, labels = _make_data()
    out = (
        neardup_pairs_exact(_spark_df(spark, V, labels), B, threshold=THRESHOLD)
        .toPandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    cos = _cosines(V)
    expected = []
    for a in range(N):
        for b in range(a + 1, N):
            if labels[a] == labels[b] and cos[a, b] >= THRESHOLD:
                expected.append((a, b, int(labels[a]), cos[a, b]))
    exp = pd.DataFrame(
        expected, columns=["vec_a", "vec_b", "label", "cosine"]
    ).reset_index(drop=True)
    assert len(out) == len(exp) > 0
    assert (out["vec_a"].to_numpy() == exp["vec_a"].to_numpy()).all()
    assert (out["vec_b"].to_numpy() == exp["vec_b"].to_numpy()).all()
    assert (out["label"].to_numpy() == exp["label"].to_numpy()).all()
    assert (out["cosine"].to_numpy() == exp["cosine"].to_numpy()).all()  # bit-equal


def test_blocked_knn_matches_naive_including_ties(spark):
    V, labels = _make_data(with_ties=True)
    out = (
        label_knn_exact(_spark_df(spark, V, labels), B, k=K)
        .toPandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    cos = _cosines(V)
    expected = []
    for v in range(N):
        peers = np.nonzero((labels == labels[v]) & (np.arange(N) != v))[0]
        if len(peers) == 0:
            continue
        order = peers[np.lexsort((peers, -cos[v, peers]))][:K]
        for r, j in enumerate(order, 1):
            expected.append((v, int(labels[v]), r, int(j), cos[v, j]))
    exp = pd.DataFrame(
        expected, columns=["vec_id", "label", "rank", "neighbor_id", "cosine"]
    ).reset_index(drop=True)
    assert len(out) == len(exp) > 0
    for col in ("vec_id", "label", "rank", "neighbor_id"):
        assert (out[col].to_numpy() == exp[col].to_numpy()).all(), col
    assert (out["cosine"].to_numpy() == exp["cosine"].to_numpy()).all()  # bit-equal


def test_degenerate_zero_norm_vector_does_not_starve_neighbors(spark):
    """A zero-quantized-norm embedding makes every cosine against it NaN
    (0/0). NaN candidates must be EXCLUDED from candidacy — not allowed
    to consume top-k slots or poison the per-row kth threshold (r7
    review: np.partition sorts NaN last, which silently dropped finite
    candidates). Healthy vectors must keep exactly the k-NN they'd have
    if the degenerate vector did not exist."""
    V, labels = _make_data()
    V[5] = 0.0  # exact zero vector in the hot label
    out = (
        label_knn_exact(_spark_df(spark, V, labels), B, k=K)
        .toPandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    # the degenerate vector itself emits no rows (all its cosines NaN)
    assert (out["vec_id"] != 5).all()
    assert (out["neighbor_id"] != 5).all()
    assert np.isfinite(out["cosine"].to_numpy()).all()
    cos = _cosines(V)
    expected = []
    for v in range(N):
        if v == 5:
            continue
        peers = np.nonzero(
            (labels == labels[v]) & (np.arange(N) != v) & (np.arange(N) != 5)
        )[0]
        order = peers[np.lexsort((peers, -cos[v, peers]))][:K]
        for r, j in enumerate(order, 1):
            expected.append((v, int(labels[v]), r, int(j), cos[v, j]))
    exp = pd.DataFrame(
        expected, columns=["vec_id", "label", "rank", "neighbor_id", "cosine"]
    ).reset_index(drop=True)
    assert len(out) == len(exp) > 0
    for col in ("vec_id", "label", "rank", "neighbor_id"):
        assert (out[col].to_numpy() == exp[col].to_numpy()).all(), col
    assert (out["cosine"].to_numpy() == exp["cosine"].to_numpy()).all()
    # and the pair generator: the degenerate vector emits no pairs
    pairs = neardup_pairs_exact(
        _spark_df(spark, V, labels), B, threshold=THRESHOLD
    ).toPandas()
    assert (pairs["vec_a"] != 5).all() and (pairs["vec_b"] != 5).all()
    assert np.isfinite(pairs["cosine"].to_numpy()).all()
