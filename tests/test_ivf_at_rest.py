"""IVF at rest: SCALE.md claims a cent_id-partitioned table lets probe
search prune parquet partitions like any other partition filter. This
pins it on real files: write the per-vector assignments
partitionBy(cent_id), probe with a cent_id IN (...) filter, and assert
(a) the filter plans as a PartitionFilter (not a post-scan filter) and
(b) the executed scan's metrics show only the probed partitions' files
were read."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.operators.similarity import ivf_assignments
from distributed_video_analytics_flink_spark.plans import formatted_plan

SF = "/root/testdata/sf0.001"


def test_ivf_partitioned_table_prunes_probed_cells(spark, tmp_path):
    path = str(tmp_path / "ivf_table")
    ivf_assignments(spark, SF).select("vec_id", "cent_id").write.partitionBy(
        "cent_id"
    ).parquet(path)

    table = spark.read.parquet(path)
    all_cells = sorted(r["cent_id"] for r in table.select("cent_id").distinct().collect())
    assert len(all_cells) > 3, "fixture degenerate: too few populated cells"
    probes = [int(c) for c in all_cells[:2]]
    probed = table.filter(F.col("cent_id").isin(probes))

    # (a) the probe lands as a partition filter at planning time
    plan = formatted_plan(probed)
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "cent_id" in pf_line and "IN" in pf_line

    # (b) execute THROUGH the DataFrame's own QueryExecution (count()
    # builds a separate plan whose metrics we couldn't read back) and
    # check the scan metrics: files/partitions read == probed cells only
    rows = probed.collect()
    expected = sum(
        spark.read.parquet(f"{path}/cent_id={p}").count() for p in probes
    )
    assert len(rows) == expected > 0
    assert all(r["cent_id"] in probes for r in rows)

    leaf = probed._jdf.queryExecution().executedPlan().collectLeaves().head()
    metrics = leaf.metrics()
    assert metrics.apply("numPartitions").value() == len(probes)
    assert metrics.apply("numFiles").value() < len(table.inputFiles())
