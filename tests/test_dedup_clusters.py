"""Connected-components operators: the two-star (Kiveris et al.) variant
must match min-label semantics on adversarial graph shapes that the LSH
corpus never produces — long chains (worst case for O(diameter) label
propagation) and multi-component forests — and must converge in O(log n)
composite rounds, which is the whole point of the algorithm."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.operators.dedup import (
    _large_star,
    _small_star,
    dedup_clusters,
    dedup_clusters_twostar,
)
from tests.conftest import SF_DIR


def _run_twostar(spark, edge_list, n_rounds):
    edges = spark.createDataFrame(edge_list, "u long, v long").localCheckpoint()
    prev = (-1, -1)
    rounds = 0
    for _ in range(n_rounds):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.hash("u", "v").cast("long")), F.lit(0)).alias("h"),
        ).collect()[0]
        rounds += 1
        sig = (row["n"], row["h"])
        if sig == prev:
            break
        prev = sig
    labels = {
        r["u"]: r["root"]
        for r in edges.groupBy("u").agg(F.min("v").alias("root")).collect()
    }
    return labels, rounds


def test_twostar_collapses_long_chain_in_log_rounds(spark):
    """A 256-node path graph: label propagation needs ~256 rounds; two-star
    must label every node 0 within ~log2(256)+slack composite rounds."""
    chain = [(i, i + 1) for i in range(255)]
    labels, rounds = _run_twostar(spark, chain, n_rounds=16)
    assert rounds <= 12, f"two-star took {rounds} rounds on a 256-chain"
    assert all(labels[i] == 0 for i in range(1, 256))


def test_twostar_forest_components(spark):
    """Disjoint components keep separate minima; a cycle and a star mix."""
    edges = (
        [(5, 3), (3, 9), (9, 5)]          # cycle {3,5,9} -> 3
        + [(20, 21), (20, 22), (20, 23)]  # star rooted above min -> 20
        + [(40, 41)]                      # pair -> 40
    )
    labels, _ = _run_twostar(spark, edges, n_rounds=16)
    want = {5: 3, 9: 3, 21: 20, 22: 20, 23: 20, 41: 40}
    for node, root in want.items():
        assert labels[node] == root, (node, labels)


def test_twostar_matches_propagation_on_corpus(spark):
    """Both cluster operators are the same function on the real LSH graph."""
    a = {(r["doc_id"], r["cluster_id"]) for r in dedup_clusters(spark, SF_DIR).collect()}
    b = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup_clusters_twostar(spark, SF_DIR).collect()
    }
    assert a == b
