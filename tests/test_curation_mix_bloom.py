"""Pins for curation_decontaminate_bloom (exactness despite the lossy
gate) and curation_source_mix_temperature (alpha-smoothing invariants)."""

SF = "/root/testdata/sf0.001"


def test_bloom_decontaminate_equals_exact_variant(spark):
    """The bloom gate may only change the PLAN: after candidate
    verification the (doc_id, n_hit_shingles, contaminated) triples must
    equal the exact broadcast-join variant's, for every corpus doc."""
    from distributed_video_analytics_flink_spark.operators.curation import (
        curation_decontaminate,
        curation_decontaminate_bloom,
    )

    # bounded collects: one row per corpus doc at sf0.001 (~50 docs)
    bloom = {
        r.doc_id: (r.n_hit_shingles, r.contaminated)
        for r in curation_decontaminate_bloom(spark, SF).collect()
    }
    exact = {
        r.doc_id: (r.n_hit_shingles, r.contaminated)
        for r in curation_decontaminate(spark, SF).collect()
    }
    assert bloom == exact


def test_bloom_candidate_accounting(spark):
    """Candidates bound hits (the bloom has no false negatives, only
    false positives, and the verify join removes exactly the FPs)."""
    from distributed_video_analytics_flink_spark.operators.curation import (
        curation_decontaminate_bloom,
    )

    rows = curation_decontaminate_bloom(spark, SF).collect()  # bounded: per-doc
    assert rows
    for r in rows:
        assert r.n_hit_shingles <= r.n_bloom_candidates
        assert r.n_bloom_false_positives == r.n_bloom_candidates - r.n_hit_shingles
        assert r.contaminated == (1 if r.n_hit_shingles > 0 else 0)


def test_temperature_mix_invariants(spark):
    """alpha=0.5 smoothing: rate is monotone NON-INCREASING in source
    size (low-resource sources upweighted), capped at 10000 bp, and
    kept tokens never exceed the source's total."""
    from distributed_video_analytics_flink_spark.operators.curation import (
        curation_source_mix_temperature,
    )

    rows = curation_source_mix_temperature(spark, SF).collect()  # one row/source
    assert rows
    import math

    tc = sum(r.total_tokens for r in rows)
    sw = sum(r.weight for r in rows)
    for r in rows:
        # exact integer replay of the engine's rate arithmetic
        expect_bp = min(10000, (r.weight * tc * 10000) // (sw * r.total_tokens * 2))
        assert r.rate_bp == expect_bp
        # and the quantized rate tracks the real-valued alpha=0.5 rate:
        # isqrt loses < 1/w relative precision, sum quantization < n/sw
        real = min(
            1.0,
            math.sqrt(r.total_tokens)
            / sum(math.sqrt(x.total_tokens) for x in rows)
            * (tc / 2)
            / r.total_tokens,
        )
        assert abs(r.rate_bp / 10000 - real) < 1 / r.weight + len(rows) / sw
        assert 0 <= r.rate_bp <= 10000
        assert r.tokens_kept <= r.total_tokens
        assert r.n_docs_kept >= 0
        assert r.weight == math.isqrt(r.total_tokens)


def test_exact_quota_is_exact_and_deterministic(spark):
    """Every stratum with >= quota docs yields EXACTLY quota rows (the
    Bernoulli sampler can't promise this); smaller strata yield all
    their docs; two runs pick the identical set."""
    from pyspark.sql import functions as F

    from distributed_video_analytics_flink_spark.operators.curation import (
        _QUOTA_PER_LANG,
        curation_sample_exact_quota,
    )
    from distributed_video_analytics_flink_spark.sources.tables import load_table

    got = curation_sample_exact_quota(spark, SF)
    sizes = {
        r.lang: r.c
        for r in load_table(spark, SF, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()  # bounded: one row per language
    }
    counts = {
        r.lang: r.c
        for r in got.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert counts == {
        lang: min(_QUOTA_PER_LANG, n) for lang, n in sizes.items()
    }
    a = {(r.doc_id, r.lang) for r in got.collect()}  # bounded: quota * langs
    b = {(r.doc_id, r.lang) for r in curation_sample_exact_quota(spark, SF).collect()}
    assert a == b


def test_snapshot_delta_statuses_partition_the_union(spark):
    """Every doc in either snapshot appears exactly once, with the
    status its %10 class dictates by construction."""
    from distributed_video_analytics_flink_spark.operators.curation import (
        curation_snapshot_delta,
    )

    rows = curation_snapshot_delta(spark, SF).collect()  # bounded: one row/doc
    seen = {}
    for r in rows:
        assert r.doc_id not in seen, "doc emitted twice"
        seen[r.doc_id] = r.status
    for doc_id, status in seen.items():
        m = doc_id % 10
        expect = {7: "added", 4: "removed", 3: "changed"}.get(m, "unchanged")
        assert status == expect, (doc_id, status, expect)


def test_incremental_signatures_catch_a_missed_changed_doc(spark):
    """The incremental contract's teeth: carried-forward signatures for
    'changed' docs are genuinely STALE (old text differs), so a delta
    predicate that misses them produces different rows — and the
    registered query (which recomputes them) matches a full recompute."""
    from pyspark.sql import functions as F

    from distributed_video_analytics_flink_spark.operators.curation import (
        curation_incremental_signatures,
    )
    from distributed_video_analytics_flink_spark.operators.dedup import (
        minhash_signature_df,
    )
    from distributed_video_analytics_flink_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    got = curation_incremental_signatures(spark, SF)
    full = minhash_signature_df(
        docs.filter(F.col("doc_id") % 10 != 4).select("doc_id", "text")
    )
    a = {tuple(r) for r in got.drop("recomputed").collect()}  # bounded: 1/doc
    b = {tuple(r) for r in full.collect()}
    assert a == b, "incremental union drifted from full recompute"

    # staleness is real: the old snapshot's signature for a 'changed'
    # doc must differ from its fresh signature (otherwise this contract
    # couldn't catch a missed-changed bug)
    changed = docs.filter(F.col("doc_id") % 10 == 3)
    stale = {
        tuple(r)
        for r in minhash_signature_df(
            changed.select("doc_id", F.reverse("text").alias("text"))
        ).collect()
    }
    fresh = {
        tuple(r)
        for r in minhash_signature_df(changed.select("doc_id", "text")).collect()
    }
    assert stale != fresh


def test_ngram_novelty_invariants(spark):
    from distributed_video_analytics_flink_spark.operators.text_analysis import (
        text_ngram_novelty,
    )

    rows = text_ngram_novelty(spark, SF).collect()  # bounded: one row/doc
    assert rows
    assert any(r.n_novel > 0 for r in rows), "no novel shingles anywhere?"
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles
        assert r.novelty_bp == (r.n_novel * 10000) // r.n_shingles
        assert 0 <= r.novelty_bp <= 10000
