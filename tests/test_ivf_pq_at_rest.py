"""sim_ivf_pq_at_rest: IVF+PQ served from the cell-partitioned parquet
index (VERDICT r6 #6 — the composed 100 TB serving shape). Pins:

1. **Partition-pruned scan** — the probe predicate plans as a
   PartitionFilter and the executed scan's metrics read only the probed
   cells' partitions/files.
2. **Codes-only serving** — the index holds (vec_id, codes, cent_id);
   no embedding bytes exist at rest, and the serving plan contains no
   Python evaluation node (ADC is JVM element_at lookups).
3. **Equality with the in-closure twin** — identical top-5 to
   sim_ivf_pq_topk_refined (same probes, codes, integer ADC).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.operators.similarity import (
    _N_PROBE,
    _ivf_coarse_and_query,
    sim_ivf_pq_at_rest,
    sim_ivf_pq_topk_refined,
    write_ivf_pq_index,
)
from distributed_video_analytics_flink_spark.plans import formatted_plan
from distributed_video_analytics_flink_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_at_rest_serving_prunes_to_probed_cells(spark, tmp_path):
    path = write_ivf_pq_index(spark, SF, str(tmp_path / "index"))
    table = spark.read.parquet(path)
    assert sorted(table.columns) == ["cent_id", "codes", "vec_id"]

    emb = load_table(spark, SF, "embeddings")
    _, _, _, _, probes = _ivf_coarse_and_query(emb)
    assert len(probes) == _N_PROBE
    probed = table.filter(F.col("cent_id").isin(probes))

    plan = formatted_plan(probed)
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "cent_id" in pf_line and "IN" in pf_line

    rows = probed.collect()
    populated = {
        r["cent_id"]
        for r in table.select("cent_id").distinct().collect()
        if r["cent_id"] in probes
    }
    assert len(rows) > 0 and {r["cent_id"] for r in rows} == populated

    leaf = probed._jdf.queryExecution().executedPlan().collectLeaves().head()
    metrics = leaf.metrics()
    assert metrics.apply("numPartitions").value() == len(populated)
    assert metrics.apply("numFiles").value() < len(table.inputFiles())


def test_at_rest_serving_is_jvm_only(spark):
    df = sim_ivf_pq_at_rest(spark, SF)
    plan = formatted_plan(df)
    # the SERVING plan reads the coded table and does element_at lookups —
    # no Arrow/Python evaluation anywhere
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_at_rest_matches_in_closure_twin(spark):
    at_rest = [tuple(r) for r in sim_ivf_pq_at_rest(spark, SF).collect()]
    twin = [tuple(r) for r in sim_ivf_pq_topk_refined(spark, SF).collect()]
    assert at_rest == twin and len(at_rest) == 5


def test_index_publish_is_atomic_and_race_tolerant(spark, tmp_path):
    """The build lands in a sibling temp dir and one os.rename exposes
    it — a concurrent reader can never observe a half-written index (the
    old mode-overwrite wrote into the live path). Losing the publish
    race keeps the existing identical index and discards the duplicate
    build."""
    import os

    from distributed_video_analytics_flink_spark.operators import similarity as S

    path = str(tmp_path / "idx")
    write_ivf_pq_index(spark, SF, path)
    files = set(os.listdir(path))
    # a second process misses the per-process memo and builds again onto
    # the same published path: simulate by clearing the memo
    S._IVF_PQ_INDEX_BUILT.discard(path)
    assert write_ivf_pq_index(spark, SF, path) == path
    assert set(os.listdir(path)) == files  # existing index kept intact
    leftovers = [d for d in os.listdir(tmp_path) if d.startswith("idx.build-")]
    assert leftovers == []  # losing build cleaned up
    assert spark.read.parquet(path).count() > 0


def test_index_path_tracks_fixture_content(tmp_path):
    """The index path fingerprints the embeddings source (size+mtime), so
    regenerating the fixture IN PLACE yields a new index path — the
    publish race-loser's 'existing directory is the same index'
    assumption can never pin a stale index to fresh data (r7 review)."""
    from distributed_video_analytics_flink_spark.operators.similarity import (
        ivf_pq_index_path,
    )

    src = tmp_path / "embeddings.parquet"
    src.write_bytes(b"AAA")
    p1 = ivf_pq_index_path(str(tmp_path))
    assert ivf_pq_index_path(str(tmp_path)) == p1  # deterministic
    src.write_bytes(b"BBBB")  # regenerated fixture, same directory
    assert ivf_pq_index_path(str(tmp_path)) != p1


def test_index_cache_root_is_private_and_validated(tmp_path):
    """The index cache lives in a per-user 0700 subdirectory of the temp
    dir (ADVICE r7): another local user cannot squat the predictable path,
    and the publish-race loser only trusts an existing directory after an
    ownership + _SUCCESS completeness check."""
    import os
    import stat

    from distributed_video_analytics_flink_spark.operators.similarity import (
        ivf_pq_index_path,
    )

    src = tmp_path / "embeddings.parquet"
    src.write_bytes(b"AAA")
    p = ivf_pq_index_path(str(tmp_path))
    root = os.path.dirname(p)
    st = os.stat(root)
    assert st.st_uid == os.getuid()
    assert stat.S_IMODE(st.st_mode) == 0o700
    assert f"-{os.getuid()}" in os.path.basename(root)


def test_race_loser_rejects_incomplete_existing_index(spark, tmp_path, monkeypatch):
    """If the directory already at the published path lacks the committer's
    _SUCCESS marker (a crashed half-write — or a squatted fake), the race
    loser refuses to serve from it instead of silently trusting it."""
    import os

    from distributed_video_analytics_flink_spark.operators import similarity as S

    path = str(tmp_path / "idx")
    os.makedirs(path)  # pre-existing, incomplete: no _SUCCESS inside
    monkeypatch.setattr(
        os, "rename", lambda *a, **k: (_ for _ in ()).throw(OSError("race"))
    )
    with pytest.raises(RuntimeError, match="ownership/completeness"):
        S._build_ivf_pq_index(spark, SF, path, None)
    assert path not in S._IVF_PQ_INDEX_BUILT
