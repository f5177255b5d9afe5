"""graph_triangle_count_bucketed: triangle stats whose edge GENERATION
runs on the skew-proof bucketed k-NN generator (VERDICT r6 #1 — the last
label-block-all-pairs shape reachable from a registered query). Pins:

1. **Bounded blocks under label skew** — with 90% of vectors in one label,
   no (label, bucket) scoring block exceeds a small fraction of the hot
   label, so the edge-generation task budget holds (the property the
   exact graph_triangle_count baseline lacks).
2. **Exactness** — triangle_stats over knn_bucketed's edges equals a
   numpy brute force of the same blocked k-NN graph: same nodes, edges,
   wedges, triangles, and clustering coefficient.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from distributed_video_analytics_flink_spark.operators.similarity import (
    _Q,
    knn_bucketed,
    triangle_stats,
)

DIM = 16
N = 300
HOT_FRACTION = 0.9
N_PLANES = 3  # 8 buckets
K = 3


def _np_q(t):
    return (np.floor(np.abs(t) + 0.5) * np.sign(t)).astype(np.int64)


def _make_data():
    rng = np.random.default_rng(11)
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


def _bruteforce_und_edges(V, labels, buckets):
    """The blocked k-NN graph's undirected deduped edge set, by brute
    force: within each (label, bucket) block, each vector's top-K by
    (cosine DESC, vec_id ASC)."""
    norms = np.sqrt(_np_q(V * V * _Q).sum(axis=1).astype(np.float64))
    und = set()
    for lb in sorted(set(zip(labels, buckets))):
        idx = np.nonzero((labels == lb[0]) & (buckets == lb[1]))[0]
        if len(idx) < 2:
            continue
        B = V[idx]
        dots = _np_q(B[:, None, :] * B[None, :, :] * _Q).sum(axis=2)
        cos = dots / (norms[idx][:, None] * norms[idx][None, :])
        for li in range(len(idx)):
            c = cos[li].copy()
            c[li] = -np.inf
            order = np.lexsort((idx, -c))[: min(K, len(idx) - 1)]
            for j in order:
                a, b = int(idx[li]), int(idx[j])
                und.add((min(a, b), max(a, b)))
    return und


def test_triangle_edge_blocks_bounded_under_label_skew(spark):
    V, labels, planes = _make_data()
    buckets = _buckets(V, planes)
    hot = int((labels == 0).sum())
    assert hot == 270  # the skew premise: 90% one label

    sizes = pd.Series(zip(labels, buckets)).value_counts()
    # Unbucketed edge generation scores the hot label as ONE 270-vector
    # block in a single task. Bucketed, the hottest scoring block must be
    # a small fraction — expected hot/2^planes = ~34; allow 2x margin.
    assert sizes.max() <= 2 * (hot / 2**N_PLANES), sizes.sort_values().tail()

    # Every generated edge stays inside one (label, bucket) block, so the
    # triangle stage inherits the bound.
    knn = knn_bucketed(_spark_df(spark, V, labels), [p.tolist() for p in planes], k=K)
    out = knn.toPandas()
    assert len(out) > 0
    key = {int(i): (int(l), int(b)) for i, l, b in zip(np.arange(N), labels, buckets)}
    for row in out.itertuples():
        assert key[row.vec_id] == (row.label, row.bucket)
        assert key[row.neighbor_id] == (row.label, row.bucket)


def test_triangle_stats_match_bruteforce(spark):
    V, labels, planes = _make_data()
    buckets = _buckets(V, planes)
    und = _bruteforce_und_edges(V, labels, buckets)
    assert len(und) > 0

    deg: dict[int, int] = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    n_wedges = sum(d * (d - 1) // 2 for d in deg.values())
    adj: dict[int, set[int]] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    n_tri = sum(
        1
        for (u, v) in und
        for w in adj[u] & adj[v]
        if u < v < w
    )
    assert n_tri > 0, "fixture degenerate: no triangles — exactness vacuous"

    knn = knn_bucketed(_spark_df(spark, V, labels), [p.tolist() for p in planes], k=K)
    row = triangle_stats(knn).collect()[0]
    assert row.n_nodes == len(deg)
    assert row.n_edges == len(und)
    assert row.n_wedges == n_wedges
    assert row.n_triangles == n_tri
    assert row.clustering_coeff == 3 * n_tri / n_wedges
