"""Curated-corpus sink: language-partitioned layout, doc_id-clustered
files, partition-pruned read-back, and the manifest accounting path."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.operators.curation import (
    curation_sample_stratified,
)
from distributed_video_analytics_flink_spark.sinks import (
    read_curated_corpus,
    read_manifest,
    write_curated_corpus,
)
from distributed_video_analytics_flink_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_corpus_roundtrip_and_pruning(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    kept = docs.join(
        curation_sample_stratified(spark, SF_DIR).select("doc_id"), "doc_id"
    )
    out = str(tmp_path / "corpus_out")
    write_curated_corpus(kept, out, files_per_lang=4)

    back = read_curated_corpus(spark, out)
    assert back.count() == kept.count()
    # round-trip is lossless per row, not just per count
    assert (
        back.select("doc_id", "lang", "n_chars").exceptAll(
            kept.select("doc_id", "lang", "n_chars")
        ).count() == 0
    )

    one_lang = read_curated_corpus(spark, out, lang="zh")
    want_zh = kept.filter(F.col("lang") == "zh").count()
    assert one_lang.count() == want_zh
    plan = one_lang._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "lang=zh" in plan

    # layout: lang directories; bounded file count per language
    langs = {
        d.split("=", 1)[1]
        for d in os.listdir(os.path.join(out, "corpus"))
        if d.startswith("lang=")
    }
    assert langs == {r["lang"] for r in kept.select("lang").distinct().collect()}
    for lang in langs:
        files = [
            f
            for f in os.listdir(os.path.join(out, "corpus", f"lang={lang}"))
            if f.endswith(".parquet")
        ]
        assert 1 <= len(files) <= 4


def test_corpus_files_doc_id_clustered(spark, tmp_path):
    """sortWithinPartitions gives doc_id-sorted row groups: parquet min/max
    stats then let doc_id range probes skip row groups at read time."""
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "corpus_sorted")
    write_curated_corpus(docs, out, files_per_lang=2)
    lang_dir = next(
        d
        for d in os.listdir(os.path.join(out, "corpus"))
        if d.startswith("lang=")
    )
    for f in os.listdir(os.path.join(out, "corpus", lang_dir)):
        if not f.endswith(".parquet"):
            continue
        col = pq.read_table(
            os.path.join(out, "corpus", lang_dir, f), columns=["doc_id"]
        )["doc_id"].to_pylist()
        assert col == sorted(col), "doc_id not sorted within file"


def test_manifest_accounting(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "corpus_manifest")
    write_curated_corpus(docs, out)
    m = {r["lang"]: r for r in read_manifest(spark, out).collect()}
    want = {
        r["lang"]: r
        for r in docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).alias("ws_tokens"),
        )
        .collect()
    }
    assert set(m) == set(want)
    for lang in want:
        assert m[lang]["n_docs"] == want[lang]["n_docs"]
        assert m[lang]["ws_tokens"] == want[lang]["ws_tokens"]


def test_compact_corpus_binpacks_and_preserves(spark, tmp_path):
    """Compaction: many tiny files per language collapse toward the byte
    target; content is bit-identical; doc_id clustering within the
    rewritten files survives (row-group skipping depends on it); already-
    compact partitions are untouched."""
    from distributed_video_analytics_flink_spark.sinks.corpus import compact_corpus

    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "corpus_root")
    # 16 files per language of a tiny corpus = guaranteed small files
    write_curated_corpus(docs, out, files_per_lang=16)
    root = os.path.join(out, "corpus")
    langs = [e for e in sorted(os.listdir(root)) if e.startswith("lang=")]
    before = {
        e: [f for f in os.listdir(os.path.join(root, e)) if f.endswith(".parquet")]
        for e in langs
    }
    assert all(len(v) == 16 for v in before.values())
    want = spark.read.parquet(root).orderBy("doc_id").collect()

    # huge target -> each partition should collapse to 1 file
    done = compact_corpus(spark, out, target_bytes=1 << 30)
    assert set(done) == {e.split("=", 1)[1] for e in langs}
    for e in langs:
        files = [
            f for f in os.listdir(os.path.join(root, e)) if f.endswith(".parquet")
        ]
        assert len(files) == 1, (e, files)
        # clustering preserved: doc_ids sorted within the rewritten file
        t = pq.read_table(os.path.join(root, e, files[0]), columns=["doc_id"])
        ids = t["doc_id"].to_pylist()
        assert ids == sorted(ids)
    # content identical
    got = spark.read.parquet(root).orderBy("doc_id").collect()
    assert got == want
    # second run: everything already compact -> no-op
    assert compact_corpus(spark, out, target_bytes=1 << 30) == {}


def test_compact_corpus_fence_detects_concurrent_ingest(spark, tmp_path, monkeypatch):
    """The hardened fence (r15, ADVICE r14): a file landing in the
    partition AFTER the snapshot (here: injected during the compaction's
    own materialization step) must abort the swap with a loud error and
    leave the live directory fully intact — original files untouched AND
    the late arrival preserved; no staged debris takes the live name."""
    import pytest

    from distributed_video_analytics_flink_spark.sinks.corpus import compact_corpus

    # patch the CONCRETE class: Spark 4's classic DataFrame subclasses the
    # base and overrides localCheckpoint, shadowing a base-class patch
    DataFrame = type(spark.range(1))

    docs = load_table(spark, SF_DIR, "documents").filter(F.col("lang") == "en")
    out = str(tmp_path / "corpus_root")
    write_curated_corpus(docs, out, files_per_lang=8)
    root = os.path.join(out, "corpus")
    pdir = os.path.join(root, "lang=en")
    before = sorted(os.listdir(pdir))

    sentinel = os.path.join(pdir, "zz-late-microbatch.parquet")
    orig = DataFrame.localCheckpoint

    def hooked(self, eager=True):
        # simulate a streaming micro-batch landing mid-compaction
        if not os.path.exists(sentinel):
            with open(sentinel, "wb") as fh:
                fh.write(b"late")
        return orig(self, eager)

    monkeypatch.setattr(DataFrame, "localCheckpoint", hooked)
    with pytest.raises(RuntimeError, match="changed during compaction"):
        compact_corpus(spark, out, target_bytes=1 << 30)
    monkeypatch.setattr(DataFrame, "localCheckpoint", orig)

    # live directory restored: every original file plus the late arrival
    after = sorted(os.listdir(pdir))
    assert set(before) <= set(after) and os.path.exists(sentinel)
    # no hidden stage/old debris holds the live name hostage, and a retry
    # after the writer quiesces (sentinel removed) succeeds
    os.remove(sentinel)
    done = compact_corpus(spark, out, target_bytes=1 << 30)
    assert "en" in done


def _build_corpus(spark, tmp_path, name):
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / name)
    write_curated_corpus(docs, out, files_per_lang=16)
    return docs, out, os.path.join(out, "corpus")


def test_compact_recovers_retired_partition_after_crash(spark, tmp_path):
    """Crash between rename(pdir, retired) and rename(stage, pdir)
    (ADVICE r15, medium): the only copy of the partition lives under the
    hidden .compact-<lang>.old name. The next invocation must rename it
    back BEFORE clearing any debris — the old behavior rmtree'd it."""
    from distributed_video_analytics_flink_spark.sinks.corpus import compact_corpus

    docs, out, root = _build_corpus(spark, tmp_path, "crash_mid_swap")
    want = spark.read.parquet(root).orderBy("doc_id").collect()
    pdir = os.path.join(root, "lang=en")
    retired = os.path.join(root, ".compact-en.old")
    stage = os.path.join(root, ".compact-en.stage")
    # manufacture the crash state: live gone, originals frozen under the
    # hidden name, a (possibly complete) stage dir next to them
    os.rename(pdir, retired)
    os.makedirs(stage)
    with open(os.path.join(stage, "part-00000-staged.parquet"), "wb") as fh:
        fh.write(b"staged-debris")

    done = compact_corpus(spark, out, target_bytes=1 << 30)
    assert os.path.isdir(pdir)
    assert not os.path.exists(retired) and not os.path.exists(stage)
    # not a single row lost (en itself gets compacted in the same call)
    got = spark.read.parquet(root).orderBy("doc_id").collect()
    assert got == want
    assert "en" in done


def test_compact_merges_retired_when_ingest_recreated_live(spark, tmp_path):
    """Crash mid-swap followed by ingest recreating lang=<lang> with NEW
    rows: the retired files are the only copy of the pre-crash data and
    must be merged into the recreated live directory, not dropped."""
    from distributed_video_analytics_flink_spark.sinks.corpus import compact_corpus

    docs, out, root = _build_corpus(spark, tmp_path, "crash_then_ingest")
    pdir = os.path.join(root, "lang=en")
    retired = os.path.join(root, ".compact-en.old")
    stage = os.path.join(root, ".compact-en.stage")
    n_en_old = spark.read.parquet(root).filter(F.col("lang") == "en").count()
    os.rename(pdir, retired)
    os.makedirs(stage)  # stage present = the swap never happened
    # simulate the streaming ingest recreating the partition with 5 fresh
    # docs (same on-disk schema: the lang directory key is not a column)
    fresh = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("lang") == "en")
        .limit(5)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
        .drop("lang")
    )
    scratch = str(tmp_path / "fresh_microbatch")
    fresh.coalesce(1).write.parquet(scratch)
    os.makedirs(pdir)
    for f in os.listdir(scratch):
        if f.endswith(".parquet"):
            os.rename(os.path.join(scratch, f), os.path.join(pdir, f))

    compact_corpus(spark, out, target_bytes=1 << 30)
    assert not os.path.exists(retired) and not os.path.exists(stage)
    n_en = spark.read.parquet(root).filter(F.col("lang") == "en").count()
    assert n_en == n_en_old + 5  # pre-crash rows AND the fresh ingest


def test_compact_clears_superseded_retired_after_completed_swap(spark, tmp_path):
    """Crash AFTER rename(stage, pdir) but before the retired cleanup:
    retired holds superseded copies of rows already live — recovery must
    clear it (merging would duplicate every row) and row counts hold."""
    import shutil

    from distributed_video_analytics_flink_spark.sinks.corpus import compact_corpus

    docs, out, root = _build_corpus(spark, tmp_path, "crash_post_swap")
    want = spark.read.parquet(root).orderBy("doc_id").collect()
    pdir = os.path.join(root, "lang=en")
    retired = os.path.join(root, ".compact-en.old")
    shutil.copytree(pdir, retired)  # live = new data; retired = old copies

    compact_corpus(spark, out, target_bytes=1 << 30)
    assert not os.path.exists(retired)
    got = spark.read.parquet(root).orderBy("doc_id").collect()
    assert got == want  # no duplicated rows from a bogus merge


def test_compact_recovery_preserves_colliding_retired_files(spark, tmp_path):
    """r16 review: a retired file whose name collides with a live file
    must NOT be cleared as debris — recovery moves the rest, leaves the
    collision frozen under the hidden name, and fails loudly."""
    import shutil

    import pytest

    from distributed_video_analytics_flink_spark.sinks.corpus import compact_corpus

    docs, out, root = _build_corpus(spark, tmp_path, "crash_collide")
    pdir = os.path.join(root, "lang=en")
    retired = os.path.join(root, ".compact-en.old")
    stage = os.path.join(root, ".compact-en.stage")
    os.rename(pdir, retired)
    os.makedirs(stage)  # stage present = swap never happened
    # ingest recreates the live dir and (pathologically) reuses a name
    os.makedirs(pdir)
    collide = next(
        f for f in os.listdir(retired) if f.endswith(".parquet")
    )
    with open(os.path.join(pdir, collide), "wb") as fh:
        fh.write(b"fresh-ingest-bytes")

    with pytest.raises(RuntimeError, match="collide with live names"):
        compact_corpus(spark, out, target_bytes=1 << 30)
    # the colliding retired file survives, frozen, for manual resolution
    assert os.path.exists(os.path.join(retired, collide))
    # and the live copy was not clobbered
    with open(os.path.join(pdir, collide), "rb") as fh:
        assert fh.read() == b"fresh-ingest-bytes"
