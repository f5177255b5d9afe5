"""Curated-corpus sink: the write path at the end of the curation
pipeline (dedup -> quality gate -> rebalance -> HERE), laid out so the
downstream trainer's reads prune instead of scan.

Layout contract (the documents analog of the video results table's
(camera_id, day) layout, streaming/sinks.py:84):

- ``partitionBy(lang)`` — language is the universal downstream filter
  (per-language tokenizers, per-language mixing weights), so it becomes
  the directory key and per-language reads are partition-pruned scans.
- Within each language, files are written from a ``repartition(n, doc_id)``
  + ``sortWithinPartitions("doc_id")`` stage: deterministic file contents
  at any parallelism, doc_id-clustered row groups (parquet min/max stats
  make doc_id range probes skip row groups), and a knob (``files_per_lang``)
  to keep file counts sane — a 100 TB corpus write's failure mode is a
  million tiny files, not slow tasks.
- A ``_manifest`` directory (parquet, one row per language: doc count,
  token sum) written from the same DataFrame — the cheap accounting a
  trainer checks before launching a job; reading it never touches the
  corpus files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_curated_corpus(
    docs: DataFrame, path: str, files_per_lang: int = 8
) -> None:
    """Write a curated documents DataFrame (must carry ``doc_id`` and
    ``lang``) partitioned by language, doc_id-clustered within files,
    plus the per-language manifest."""
    (
        docs.repartition(files_per_lang, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(f"{path}/corpus")
    )
    # the manifest aggregates the JUST-WRITTEN corpus, not `docs` (r14
    # review): docs is the tail of the whole curation lineage, and a
    # second uncached evaluation would re-run dedup/quality/rebalance
    # end-to-end for a per-language count — reading the partition-laid-out
    # parquet back is one cheap pruned scan and also manifests exactly
    # what landed on disk.
    written = docs.sparkSession.read.parquet(f"{path}/corpus")
    manifest = written.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("ws_tokens")
        if "text" in written.columns
        else F.lit(None).cast("long").alias("ws_tokens"),
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")


def read_curated_corpus(
    spark: SparkSession, path: str, lang: str | None = None
) -> DataFrame:
    """Read the corpus back; a ``lang`` filter is a partition-pruned scan
    (the pruning is plan-asserted in tests/test_corpus_sink.py)."""
    df = spark.read.parquet(f"{path}/corpus")
    return df.filter(F.col("lang") == lang) if lang else df


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Per-language accounting without touching corpus files."""
    return spark.read.parquet(f"{path}/_manifest")


def compact_corpus(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 4,
) -> dict:
    """Bin-pack each language partition's data files toward
    ``target_bytes`` — the maintenance pass every append-heavy corpus
    needs (the streaming ingest in streaming/corpus.py lands one file per
    micro-batch per language; a day of 30 s triggers is ~2,880 tiny files
    per language, and at 100 TB the small-file problem kills the scan's
    task-scheduling and footer-reading cost long before I/O does).

    Per language: if the partition holds >= ``min_files_to_compact`` data
    files AND more than ceil(bytes / target_bytes) of them, rewrite it
    through the sink's own layout stage (repartition on doc_id +
    sortWithinPartitions — compaction must not lose the doc_id clustering
    the read path's row-group skipping depends on) with a
    dynamic-partition overwrite of just that directory. Partitions
    already compact are left untouched — compaction cost scales with the
    hot partitions, not the table. Returns {lang: (files_before,
    files_after)} for the partitions rewritten.

    Crash-safety / concurrency (r15, per ADVICE r14): the rewrite STAGES
    to a hidden temp prefix next to the partition and swaps by directory
    rename — never a dynamic overwrite of a live directory. The fence is
    verified on a FROZEN directory: the partition is renamed aside
    first, its listing (name, size, mtime_ns — a same-name rewrite
    changes mtime/size, closing the old frozenset blind spot) is
    compared to the pre-read snapshot, and only then does the staged
    data take the live name; on any mismatch the original directory is
    renamed back untouched and the compaction aborts loudly. A crash
    mid-swap leaves either the original or the fully-staged directory
    (plus debris under hidden names) — never a half-written live
    partition — and the NEXT invocation's recovery preamble puts the
    surviving copy back under the live name before any debris is
    cleared (r16, per ADVICE r15: a crash between the two renames
    leaves the only copy under the hidden ``.compact-<lang>.old`` name,
    invisible to Spark readers; blindly clearing it as debris would be
    data loss, and if ingest has already recreated the live directory
    the retired files are MERGED back in rather than dropped). On an
    object store without rename, swap via a manifest pointer (the
    sinks/index_store.py pattern)."""
    import math
    import os
    import shutil

    root = os.path.join(path, "corpus")
    done: dict = {}
    if not os.path.isdir(root):
        return done

    # --- crash recovery (runs BEFORE any debris clearing) -------------
    # States a crash can leave, keyed by what survives:
    #   live missing + retired present          -> the swap never happened:
    #       the retired dir IS the partition; rename it back. Any stage
    #       dir is then debris (the compaction simply re-runs).
    #   live present + retired present + stage  -> the swap never happened
    #       AND ingest recreated the live dir with NEW rows: the retired
    #       files are the only copy of the pre-crash data and are
    #       disjoint from the fresh ingest — move them into the live dir
    #       (Spark part-file names are content-UUID'd; collisions are
    #       skipped defensively and left for a loud re-run).
    #   live present + retired present, NO stage -> the swap COMPLETED
    #       (stage was renamed to live) and only the retired cleanup was
    #       lost: retired holds superseded copies of rows already live —
    #       clear it, do NOT merge (merging would duplicate rows).
    for entry in sorted(os.listdir(root)):
        if not (entry.startswith(".compact-") and entry.endswith(".old")):
            continue
        lang = entry[len(".compact-") : -len(".old")]
        retired = os.path.join(root, entry)
        live = os.path.join(root, f"lang={lang}")
        stage = os.path.join(root, f".compact-{lang}.stage")
        if not os.path.isdir(live):
            os.rename(retired, live)
            shutil.rmtree(stage, ignore_errors=True)
        elif os.path.isdir(stage):
            stranded = []
            for f in os.listdir(retired):
                if not f.endswith(".parquet") or f.startswith(("_", ".")):
                    continue
                dst = os.path.join(live, f)
                if os.path.exists(dst):
                    stranded.append(f)  # collision: do NOT clobber or drop
                else:
                    os.rename(os.path.join(retired, f), dst)
            shutil.rmtree(stage, ignore_errors=True)
            if stranded:
                # r16 review: clearing the dir here would destroy the only
                # copy of the skipped rows — leave them frozen and fail
                # loudly so an operator resolves the collision by hand
                raise RuntimeError(
                    f"compaction recovery for {entry!r}: {len(stranded)} "
                    f"retired file(s) collide with live names under "
                    f"{retired!r} — resolve manually before re-running"
                )
            shutil.rmtree(retired, ignore_errors=True)
        else:
            shutil.rmtree(retired, ignore_errors=True)

    for entry in sorted(os.listdir(root)):
        if not entry.startswith("lang="):
            continue
        pdir = os.path.join(root, entry)
        files = [
            f
            for f in os.listdir(pdir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        total = sum(os.path.getsize(os.path.join(pdir, f)) for f in files)
        want = max(1, math.ceil(total / target_bytes))
        if len(files) < min_files_to_compact or len(files) <= want:
            continue
        lang = entry.split("=", 1)[1]

        def _listing(d: str) -> frozenset:
            out = set()
            for f in os.listdir(d):
                if f.endswith(".parquet") and not f.startswith(("_", ".")):
                    st = os.stat(os.path.join(d, f))
                    out.add((f, st.st_size, st.st_mtime_ns))
            return frozenset(out)

        # WRITER CONTRACT (r14 review, hardened r15 per ADVICE): the
        # streaming ingest should quiesce the partition being rewritten,
        # and the fence now PROVES it did — stage the compacted bytes to
        # a hidden sibling, rename the live directory aside (freezing
        # it), verify the frozen listing against the pre-read snapshot
        # ((name, size, mtime_ns): same-name rewrites change it), and
        # only then let the staged data take the live name. A file that
        # lands at ANY point before the freeze is detected; the old
        # unguarded window (re-list -> overwrite) is gone.
        snapshot = _listing(pdir)
        part = (
            spark.read.parquet(root)
            .filter(F.col("lang") == lang)
            .localCheckpoint(eager=True)
        )
        stage = os.path.join(root, f".compact-{lang}.stage")
        retired = os.path.join(root, f".compact-{lang}.old")
        # safe: the recovery preamble above already promoted/merged any
        # crash-surviving copies, so anything still here is true debris —
        # and the live directory exists (we are iterating its entry).
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(retired, ignore_errors=True)
        (
            part.drop("lang")  # the directory key, not a data column
            .repartition(want, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(stage)
        )
        os.rename(pdir, retired)  # freeze the live partition
        if _listing(retired) != snapshot:
            os.rename(retired, pdir)  # restore untouched
            shutil.rmtree(stage, ignore_errors=True)
            raise RuntimeError(
                f"corpus partition {entry!r} changed during compaction "
                "(concurrent ingest?): quiesce the writers and retry"
            )
        os.rename(stage, pdir)  # staged bytes take the live name
        shutil.rmtree(retired)
        after = len(
            [
                f
                for f in os.listdir(pdir)
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            ]
        )
        done[lang] = (len(files), after)
    return done
