"""Property-based and partitioning-independence checks.

- Two-star connected components vs a pure-Python union-find oracle on
  hypothesis-generated random graphs (CC algorithms fail on shapes humans
  don't draw: self-loop-adjacent chains, repeated edges, dense blobs).
- Partitioning independence: a query's RESULT may not depend on
  spark.sql.shuffle.partitions — the property that makes any plan safe to
  rescale from local[32] to 1000 executors. Checked for the round-2
  operators by re-running under a hostile partition count.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.operators import QUERIES
from tests.conftest import SF_DIR
from tests.test_dedup_clusters import _run_twostar


def _union_find_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    # canonical label = min node of the component
    comp_min: dict[int, int] = {}
    for node in list(parent):
        r = find(node)
        comp_min[r] = min(comp_min.get(r, node), node)
    return {node: comp_min[find(node)] for node in parent}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=60,
    )
)
def test_twostar_matches_union_find(spark, edges):
    got, _rounds = _run_twostar(spark, edges, n_rounds=16)
    want = _union_find_labels(edges)
    # twostar's final edge map labels only non-root nodes; roots (component
    # minima) and isolated nodes label themselves
    for node, root in want.items():
        assert got.get(node, node) == root, (node, got, want)


_PARTITION_SENSITIVE_SAFE = [
    # round-2 operators: results must be identical at any shuffle width
    "dedup_clusters_twostar",
    "dedup_simhash64_pairs",
    "curation_pipeline",
    "curation_quality_percentile",
    "sessionize_session_window",
    "timeseries_gapfill",
    "unpivot_event_stats",
]


def test_results_independent_of_shuffle_partitions(spark):
    baseline = {}
    for name in _PARTITION_SENSITIVE_SAFE:
        df = QUERIES[name].fn(spark, SF_DIR)
        baseline[name] = sorted(map(tuple, df.collect()))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        for name in _PARTITION_SENSITIVE_SAFE:
            df = QUERIES[name].fn(spark, SF_DIR)
            assert sorted(map(tuple, df.collect())) == baseline[name], name
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
