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


def test_twostar_components_matches_union_find_on_random_graphs(spark):
    """The shared twostar_components helper (now also behind
    sim_neardup_clusters) must agree with a pure-Python union-find on
    random graphs — including isolated nodes, which the helper labels as
    their own singleton clusters."""
    import random

    rng = random.Random(7)
    for trial in range(4):
        n = rng.randrange(12, 60)
        nodes = list(range(n))
        m = rng.randrange(0, n * 2)
        edge_list = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edge_list = [(u, v) for u, v in edge_list if u != v]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edge_list:
            parent[find(u)] = find(v)
        # canonical: min node id per component
        comp_min = {}
        for x in nodes:
            r = find(x)
            comp_min[r] = min(comp_min.get(r, x), x)
        want = {x: comp_min[find(x)] for x in nodes}

        from distributed_video_analytics_flink_spark.operators.dedup import (
            twostar_components,
        )

        nodes_df = spark.createDataFrame([(x,) for x in nodes], "id long")
        edges_df = spark.createDataFrame(
            edge_list or [(0, 0)], "u long, v long"
        ).filter(F.col("u") != F.col("v"))
        got = {
            r["id"]: r["cluster_id"]
            for r in twostar_components(nodes_df, edges_df, "id").collect()
        }
        assert got == want, f"trial {trial}: n={n} m={len(edge_list)}"
