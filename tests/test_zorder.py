"""Z-order layout: measured row-group skipping on real parquet stats.

The claim behind `functions/zorder.py` is physical, so the test is too:
write the same events three ways (sorted by user, by day, by Morton key),
then for single-dimension probes on EACH dimension count the row groups
whose min/max stats overlap the probe. A single-key sort prunes its own
column and fails the other; the Z-layout must prune BOTH dimensions —
its worst-dimension scan fraction beats each single sort's worst case.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.functions.zorder import zorder2
from distributed_video_analytics_flink_spark.sources.tables import load_table


def _write_layout(df, order_col, path):
    (
        df.orderBy(order_col)
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.block.size", 24 * 1024)
        .option("parquet.page.size", 8 * 1024)
        .parquet(path)
    )


def _overlapping_row_groups(path, probes):
    """Fraction of rows in row groups whose [min, max] intersects every
    (column, lo, hi) probe."""
    f = [e for e in os.listdir(path) if e.endswith(".parquet")]
    assert len(f) == 1
    md = pq.ParquetFile(os.path.join(path, f[0])).metadata
    cols = {md.row_group(0).column(i).path_in_schema: i for i in range(md.num_columns)}
    total = scanned = 0
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        total += rg.num_rows
        hit = True
        for col, lo, hi in probes:
            st = rg.column(cols[col]).statistics
            if st.max < lo or st.min > hi:
                hit = False
                break
        if hit:
            scanned += rg.num_rows
    return scanned / total, md.num_row_groups


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    # sf0.01 (10k events): enough bytes for multiple row groups
    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id",
        "user_id",
        F.dayofyear("ts").cast("long").alias("doy"),
        "value",
    )
    # bit-scale alignment (the part production Z-ORDER does with rank
    # buckets): user spans 8 bits here, doy 5 — interleaving raw values
    # would give the wide column every top bit and the narrow one almost
    # no row-group resolution. Scale both to ~5 bits first.
    ev = ev.withColumn(
        "zkey", zorder2(F.expr("user_id DIV 8"), F.col("doy"))
    )
    layouts = {
        "by_user": "user_id",
        "by_doy": "doy",
        "by_z": "zkey",
    }
    paths = {}
    for name, col in layouts.items():
        paths[name] = str(tmp_path / name)
        _write_layout(ev, col, paths[name])

    # tight probes on each single dimension
    lo_d, hi_d = ev.agg(F.min("doy"), F.max("doy")).collect()[0]
    probe_user = [("user_id", 3, 4)]
    mid = (lo_d + hi_d) // 2
    probe_doy = [("doy", mid, mid + (hi_d - lo_d) // 16)]

    frac = {}
    for name in layouts:
        fu, ngroups = _overlapping_row_groups(paths[name], probe_user)
        fd, _ = _overlapping_row_groups(paths[name], probe_doy)
        assert ngroups >= 4, f"{name}: too few row groups ({ngroups}) to measure"
        frac[name] = {"user": fu, "doy": fd}

    # each single sort is blind on the other dimension (scans ~everything)
    assert frac["by_user"]["doy"] > 0.9, frac
    assert frac["by_doy"]["user"] > 0.9, frac
    # the z layout prunes BOTH: its worst dimension beats both single
    # sorts' worst dimension by a wide margin
    z_worst = max(frac["by_z"].values())
    assert z_worst < 0.7, frac
    assert z_worst < frac["by_user"]["doy"] and z_worst < frac["by_doy"]["user"], frac
