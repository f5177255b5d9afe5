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
