"""Semantic pins for the r15 embedding-curation passes
(operators/similarity.py::sim_semdedup_checked / curation_proto_prune).

The DuckDB oracle proves cross-engine agreement but would also agree if
BOTH engines flipped a rule the same way; these tests plant a known
duplicate cluster and assert the paper semantics by hand:

- SemDeDup keeps the LEAST prototypical member of a duplicate group
  (Abbas et al. 2023 keep rule) — the planted near-duplicates of seed 0
  must be removed in favour of the rotated low-centroid-cosine copy.
- Prototypicality pruning keeps the HARD half (lowest anchor cosine,
  Sorscher et al. 2022) with an exact floor(n/2) quota per cell.
"""

from __future__ import annotations

from distributed_video_analytics_flink_spark.operators.similarity import (
    curation_proto_prune,
    sim_semdedup_checked,
)


def _vec(**at):
    v = [0.0] * 64
    for i, x in at.items():
        v[int(i)] = x
    return v


def _write_emb(spark, tmp_path, vecs):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{sf}/embeddings.parquet")
    return sf


def _fixture(spark, tmp_path):
    # seeds 0..9 = orthogonal one-hots (cells are unambiguous);
    # vec 10 = seed 0 exactly (ccos 1.0);
    # vec 11 = seed 0 rotated (ccos 0.9, still nearest seed 0);
    # vec 12 lands in cell 1 with LOW anchor cosine (0.2) and no duplicate.
    vecs = [_vec(**{str(i): 1.0}) for i in range(10)]
    vecs.append(_vec(**{"0": 1.0}))  # 10
    vecs.append(_vec(**{"0": 0.9, "10": 0.43588989}))  # 11, unit norm
    vecs.append(_vec(**{"1": 0.2, "11": 0.9798}))  # 12
    return _write_emb(spark, tmp_path, vecs)


def test_semdedup_keeps_least_prototypical(spark, tmp_path):
    sf = _fixture(spark, tmp_path)
    got = {r["cent_id"]: r.asDict() for r in sim_semdedup_checked(spark, sf).collect()}
    # cell 0 holds {seed 0, 10, 11}: all three pairs are duplicates
    # (pairwise cosine >= 0.9); the keep rule removes the HIGHER-ccos
    # member of each pair -> seed 0 (ccos 1.0) and vec 10 (ccos 1.0) go,
    # vec 11 (ccos 0.9, the least prototypical) survives
    c0 = got[0]
    assert c0["n_vectors"] == 3
    assert c0["n_dup_pairs"] == 3
    assert c0["n_removed"] == 2
    assert c0["n_kept"] == 1
    # cell 1 holds {seed 1, vec 12}: cosine 0.2 < tau, nothing removed
    c1 = got[1]
    assert (c1["n_vectors"], c1["n_dup_pairs"], c1["n_removed"], c1["n_kept"]) == (
        2,
        0,
        0,
        2,
    )
    # singleton cells: no pairs, nothing removed
    for c in range(2, 10):
        assert (got[c]["n_vectors"], got[c]["n_kept"]) == (1, 1)


def test_proto_prune_keeps_hard_half(spark, tmp_path):
    sf = _fixture(spark, tmp_path)
    rows = curation_proto_prune(spark, sf).collect()
    kept = {(r["cent_id"], r["vec_id"]): r["proto_rank"] for r in rows}
    # cell 0 (3 members): quota floor(3/2) = 1, and the kept vector is the
    # LOWEST anchor cosine -> vec 11 at rank 1 (the same survivor SemDeDup
    # chooses — the two passes agree on which copy carries information)
    assert kept == {(0, 11): 1, (1, 12): 1}
    # singleton cells keep floor(1/2) = 0 rows — already implied by the
    # exact dict equality above


def _kmeans_fixture(spark, tmp_path):
    """Margins sized for the ITERATED anchoring: cell 0 holds {seed 0,
    exact copy 10, rotated 11 (cos 0.8 to the seed)}; cell 5 holds
    {seed 5, 12 (cos 0.5), 13 (cos 0.9)} with distinct rotation dims so
    every pair clears tau and the post-Lloyd ccos ordering has >= 0.07
    margins (quantization noise is ~1e-5)."""
    vecs = [_vec(**{str(i): 1.0}) for i in range(10)]
    vecs.append(_vec(**{"0": 1.0}))  # 10
    vecs.append(_vec(**{"0": 0.8, "10": 0.6}))  # 11
    vecs.append(_vec(**{"5": 0.5, "11": 0.8660254}))  # 12
    vecs.append(_vec(**{"5": 0.9, "12": 0.43588989}))  # 13
    return _write_emb(spark, tmp_path, vecs)


def test_semdedup_kmeans_keeps_least_prototypical(spark, tmp_path):
    """The k-means-anchored variant applies the same keep rule against
    the ITERATED centroid: in both planted cells the survivor must be
    the member farthest from the post-Lloyd centroid."""
    from distributed_video_analytics_flink_spark.operators.similarity import (
        sim_semdedup_kmeans_checked,
    )

    sf = _kmeans_fixture(spark, tmp_path)
    got = {
        r["cent_id"]: r.asDict()
        for r in sim_semdedup_kmeans_checked(spark, sf).collect()
    }
    # cell 0 {0, 10, 11}: all pairs >= tau; centroid pulls toward the
    # duplicate mass, so 0 and 10 (identical, most prototypical) go and
    # the rotated 11 survives
    assert (got[0]["n_vectors"], got[0]["n_dup_pairs"]) == (3, 3)
    assert (got[0]["n_removed"], got[0]["n_kept"]) == (2, 1)
    # cell 5 {5, 12, 13}: every pair dups (0.5 / 0.9 / 0.45); post-Lloyd
    # ccos ranks 12 (0.75) < 13 (0.91) < 5 (0.93) -> 12 survives
    assert (got[5]["n_vectors"], got[5]["n_dup_pairs"]) == (3, 3)
    assert (got[5]["n_removed"], got[5]["n_kept"]) == (2, 1)
    for c in (1, 2, 3, 4, 6, 7, 8, 9):
        assert (got[c]["n_vectors"], got[c]["n_kept"]) == (1, 1)


def test_proto_prune_kmeans_keeps_hard_half(spark, tmp_path):
    from distributed_video_analytics_flink_spark.operators.similarity import (
        curation_proto_prune_kmeans,
    )

    sf = _kmeans_fixture(spark, tmp_path)
    rows = curation_proto_prune_kmeans(spark, sf).collect()
    kept = {(r["cent_id"], r["vec_id"]): r["proto_rank"] for r in rows}
    # quota floor(3/2) = 1 in both planted cells; the kept member is the
    # LOWEST post-Lloyd anchor cosine: 11 in cell 0, 12 in cell 5
    assert kept == {(0, 11): 1, (5, 12): 1}


def test_semdedup_hot_cell_inherits_pair_cell_blocking(spark, tmp_path):
    """VERDICT r15 #6: the 100 TB story says a pathological cell inherits
    the pair-cell blocking by construction (SemDeDup calls the same
    scorer as sim_neardup_pairs). Plant ONE giant cell (121 of 131
    vectors nearest seed 0) and pin, the way test_lsh_hot_bucket pins
    the LSH analog: (1) every pair-cell task sees at most two buckets'
    rows — never the whole cell; (2) the blocked decomposition still
    reproduces the exact brute-force accounting."""
    import numpy as np
    from pyspark.sql import functions as F

    from distributed_video_analytics_flink_spark.operators.similarity import (
        _EXACT_CELL_BUCKETS,
        _pair_cells,
        _seed_scored_assignments,
        sim_semdedup_checked,
    )

    vecs = [_vec(**{str(i): 1.0}) for i in range(10)]
    for i in range(120):  # all near seed 0, spread over 50 rotation dims
        vecs.append(_vec(**{"0": 0.9, str(10 + i % 50): 0.43588989}))
    sf = _write_emb(spark, tmp_path, vecs)

    # (1) task-size bound: reconstruct the exact frame the accounting
    # feeds the scorer and measure the pair-cell group sizes
    a = _seed_scored_assignments(spark, sf).select(
        "vec_id", F.col("cent_id").cast("int").alias("label"), "embedding"
    )
    sizes = (
        _pair_cells(a, _EXACT_CELL_BUCKETS)
        .groupBy("label", "ci", "cj")
        .count()
        .collect()
    )
    hot_n = 121  # premise: seed 0's cell holds 121 of the 131 vectors
    assert sum(r["count"] for r in sizes if r["label"] == 0) > 0
    max_bucket = (
        _pair_cells(a, _EXACT_CELL_BUCKETS)
        .filter("ci = cj")
        .groupBy("label", "ci")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_bucket < hot_n / 2  # the hot cell is genuinely split
    assert max(r["count"] for r in sizes) <= 2 * max_bucket  # two buckets max

    # (2) exactness under skew: per-cell accounting equals numpy brute
    got = {r["cent_id"]: r.asDict() for r in sim_semdedup_checked(spark, sf).collect()}
    V = np.array(vecs, dtype=np.float64)
    seeds = V[:10]
    cc = (V @ seeds.T) / (
        np.linalg.norm(V, axis=1)[:, None] * np.linalg.norm(seeds, axis=1)[None, :]
    )
    assign = np.argmax(cc, axis=1)
    cell0 = np.nonzero(assign == 0)[0]
    assert len(cell0) == hot_n
    Vn = V[cell0] / np.linalg.norm(V[cell0], axis=1)[:, None]
    sim = Vn @ Vn.T
    iu, ju = np.triu_indices(len(cell0), k=1)
    dup = sim[iu, ju] >= 0.35
    ccos0 = cc[cell0, 0]
    removed = set()
    for i, j, d in zip(iu, ju, dup):
        if d:
            removed.add(cell0[i] if ccos0[i] > ccos0[j] else cell0[j])
    assert got[0]["n_vectors"] == hot_n
    assert got[0]["n_dup_pairs"] == int(dup.sum())
    assert got[0]["n_removed"] == len(removed)
