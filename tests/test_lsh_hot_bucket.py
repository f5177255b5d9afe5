"""Hot-bucket hardening of the MinHash-LSH pair join (VERDICT r4 item 4).

Near-dup corpora concentrate mass in a few band buckets (boilerplate text).
These tests pin, on a synthetic boilerplate-heavy corpus:

1. the population cap actually removes over-cap buckets from candidate
   generation — after capping, NO join key (band_id, band_hash) carries
   more than ``cap`` rows per side, so no task can see a quadratic blow-up;
2. pair semantics: boilerplate-only pairs disappear, pairs that also agree
   on a below-cap band survive, and the result matches the DuckDB oracle
   formulation of the same cap on the same synthetic corpus;
3. the uncapped self-join remains AQE-skew-splittable (the runtime safety
   net when a bucket is hot but under the cap), extending
   test_skew_join.py's pattern to a self-join.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.operators.dedup import (
    _minhash_bands,
    minhash_lsh_pairs_capped,
)

BOILER = "the quick brown fox jumps over the lazy dog again and again " * 3
CAP = 8


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    """60 identical boilerplate docs (every band bucket size 60 >> cap) +
     3 'unique' near-dup docs sharing their own small buckets + 20 distinct
    docs. Written as a documents.parquet the operators can load."""
    rows = []
    for i in range(60):
        rows.append((i, BOILER, "en", "web", len(BOILER)))
    near = "completely different content about spark catalyst optimizer internals "
    for i in range(60, 63):
        rows.append((i, near + "tail" + str(i % 2), "en", "web", 80))
    for i in range(63, 83):
        txt = f"document {i} has its own words entirely " + " ".join(
            f"tok{i}_{j}" for j in range(12)
        )
        rows.append((i, txt, "en", "web", len(txt)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    d = tmp_path_factory.mktemp("hotcorpus")
    pdf.to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_cap_bounds_every_join_key(spark, corpus_dir):
    bands = _minhash_bands(spark, corpus_dir)
    raw_sizes = bands.groupBy("band_id", "band_hash").count()
    assert raw_sizes.agg(F.max("count")).collect()[0][0] >= 60  # premise: hot

    # Reconstruct the surviving side exactly as the capped join does: every
    # (band_id, band_hash) the join can shuffle must hold <= CAP rows.
    hot = {
        (r["band_id"], r["band_hash"])
        for r in raw_sizes.filter(F.col("count") > CAP).collect()
    }
    surviving_max = (
        bands.withColumn(
            "is_hot",
            F.udf(lambda b, h: (b, h) in hot, "boolean")("band_id", "band_hash"),
        )
        .filter(~F.col("is_hot"))
        .groupBy("band_id", "band_hash")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert surviving_max is not None and surviving_max <= CAP


def test_capped_pairs_semantics_and_oracle(spark, corpus_dir):
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs_capped(spark, corpus_dir, cap=CAP).collect()
    }
    # boilerplate-only pairs are gone (every agreeing band was hot) ...
    assert not any(a < 60 and b < 60 for a, b in got)
    # ... but the small-bucket near-dups survive: 60/62 share 'tail0' text
    assert (60, 62) in got

    # DuckDB formulation of the identical cap on the identical corpus.
    from distributed_video_analytics_flink_spark.operators import dedup as D

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{corpus_dir}/documents.parquet')"
    )
    oracle = f"""
    WITH {D._duck_minhash_cte()},
    bands AS (
      SELECT doc_id, b.band_id, b.band_hash
      FROM sigs, LATERAL (
        SELECT * FROM (VALUES
          (0, md5(h0 || h1 || h2 || h3)),
          (1, md5(h4 || h5 || h6 || h7)),
          (2, md5(h8 || h9 || h10 || h11)),
          (3, md5(h12 || h13 || h14 || h15))) AS v(band_id, band_hash)
      ) b
    ),
    surviving AS (
      SELECT * FROM bands
      QUALIFY COUNT(*) OVER (PARTITION BY band_id, band_hash) <= {CAP}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM surviving a JOIN surviving b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
    """
    want = set(map(tuple, con.sql(oracle).fetchall()))
    assert got == want


_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
}


def test_aqe_splits_skewed_self_join(spark):
    """The under-cap runtime safety net: a hot (but legal) bucket makes one
    shuffle partition fat; AQE must split it for the SELF-join too."""
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        bands = spark.range(40_000).select(
            F.when(F.col("id") < 24_000, F.lit("hot"))
            .otherwise(F.concat(F.lit("b"), (F.col("id") % 97).cast("string")))
            .alias("band_hash"),
            F.col("id").alias("doc_id"),
        )
        a, b = bands.alias("a"), bands.alias("b")
        j = (
            a.join(
                b,
                (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id") - 23_000),
            )
            .select(F.count(F.lit(1)).alias("n"))
        )
        [row] = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        # hot: ids 0..23999, pairs need a < b - 23000: for b in
        # 23001..23999 there are b - 23000 choices of a => sum 1..999.
        hot_pairs = 999 * 1000 // 2
        cold_pairs = 0  # same-bucket cold ids are < 16000 apart, gap 23k kills all
        assert row["n"] == hot_pairs + cold_pairs
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_cap_is_join_based_not_driver_literals(spark, corpus_dir):
    """r9 VERDICT #2: the hot-bucket exclusion must be a broadcast join,
    not driver-collected hashes re-injected as isin literal lists — plan
    size and driver memory must be independent of how many buckets are
    hot. Pinned two ways: (1) no hot band_hash digest appears anywhere in
    the optimized plan text; (2) the plan contains broadcast left joins
    carrying the hot flags."""
    q = minhash_lsh_pairs_capped(spark, corpus_dir, cap=CAP)
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    hot_hashes = [
        r["band_hash"]
        for r in _minhash_bands(spark, corpus_dir)
        .groupBy("band_id", "band_hash")
        .count()
        .filter(F.col("count") > CAP)
        .collect()
    ]
    assert hot_hashes  # premise: the corpus has hot buckets
    for h in hot_hashes:
        assert h not in plan
    physical = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in physical and "LeftOuter" in physical
