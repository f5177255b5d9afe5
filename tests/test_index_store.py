"""The publish/list store seam behind the IVF+PQ index lifecycle
(sinks/index_store.py, VERDICT r10 #3). Pins:

1. **Primitive-agnostic lifecycle** — the full build->delete->compact
   contract behind ``sim_ivf_pq_delete_checked`` produces the SAME row
   through the POSIX atomic-rename store and the rename-less
   manifest-pointer store.
2. **Fence semantics through either store** — a concurrent append
   violating compaction's quiesce contract is caught by the
   snapshot-first fences, nothing half-published stays serving, and the
   published-then-retracted copy is QUARANTINED (bytes preserved), not
   deleted — parameterized over both stores.
3. **Rename-less-ness** — the manifest store never renames a directory
   (the object-store constraint is real, not aspirational): publish is
   one atomic small-object write of the pointer.
4. **No reader ever sees a half-published version** — a crash before
   the pointer write leaves the serving name unpublished; a crash
   before POSIX's rename leaves no directory; the publish race loses
   loudly (PublishConflict), never by overwriting the winner.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from distributed_video_analytics_flink_spark.operators import similarity as S
from distributed_video_analytics_flink_spark.operators.similarity import (
    _ivf_pq_delete_lifecycle,
    append_ivf_pq_index,
    compact_ivf_pq_index,
    read_ivf_pq_index,
    write_ivf_pq_index,
)
from distributed_video_analytics_flink_spark.sinks.index_store import (
    ManifestPointerStore,
    PosixRenameStore,
    PublishConflict,
)
from distributed_video_analytics_flink_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

STORES = [PosixRenameStore(), ManifestPointerStore()]
STORE_IDS = ["posix-rename", "manifest-pointer"]


def _copy_vectors(spark, n=5, id_offset=1_000_000):
    emb = load_table(spark, SF, "embeddings")
    return emb.filter(F.col("vec_id").between(1, n)).select(
        (F.col("vec_id") + id_offset).alias("vec_id"), "embedding"
    )


# ---------------------------------------------------------------------------
# 1. The delete-checked lifecycle contract holds through either store
# ---------------------------------------------------------------------------


def test_delete_lifecycle_identical_through_both_stores(spark):
    """sim_ivf_pq_delete_checked's row — visibility counts, invisibility
    booleans, bit-identical survivors, cleared tombstones — must be the
    same tuple whether the versions are published by directory rename or
    by manifest pointer: the lifecycle semantics are primitive-agnostic."""
    rows = [
        _ivf_pq_delete_lifecycle(spark, SF, store=st) for st in STORES
    ]
    assert rows[0] == rows[1]
    n_del, _vis_pre, inv_pre, _vis_post, inv_post, bitid, cleared = rows[0]
    assert n_del > 0 and inv_pre and inv_post and bitid and cleared


# ---------------------------------------------------------------------------
# 2. Fence semantics parameterized over both stores
# ---------------------------------------------------------------------------


def _published_index(spark, tmp_path, store, name="v1"):
    """Build once via the default POSIX path, then publish a copy through
    the store under test (stage+publish, the lifecycle's own pattern)."""
    import shutil

    base = write_ivf_pq_index(spark, SF, str(tmp_path / "base"))
    serving = str(tmp_path / name)
    staged = store.stage(serving)
    shutil.copytree(base, staged)
    store.publish(staged, serving)
    return serving


@pytest.mark.parametrize("store", STORES, ids=STORE_IDS)
def test_compact_fence_catches_append_before_publish(
    spark, tmp_path, store, monkeypatch
):
    """An append landing after the read snapshot but before the publish
    trips the pre-publish fence: nothing is ever published at dst."""
    from pyspark.sql.readwriter import DataFrameWriter

    serving = _published_index(spark, tmp_path, store)
    orig_parquet = DataFrameWriter.parquet
    state = {"armed": True}

    def sneaky_parquet(self, p, **kw):
        out = orig_parquet(self, p, **kw)
        # the compacted copy's write target is a staged location in
        # EITHER store (.build-* for posix, .versions/v-* for manifest)
        if state["armed"] and (".build-" in p or f"{os.sep}v-" in p):
            state["armed"] = False  # the injected append must not recurse
            append_ivf_pq_index(
                _copy_vectors(spark, n=1, id_offset=6_100_000),
                serving,
                store=store,
            )
        return out

    monkeypatch.setattr(DataFrameWriter, "parquet", sneaky_parquet)
    dst = str(tmp_path / "v2")
    with pytest.raises(RuntimeError, match="changed during compaction"):
        compact_ivf_pq_index(spark, serving, dst, store=store)
    monkeypatch.undo()
    assert store.resolve(dst) is None  # nothing published


@pytest.mark.parametrize("store", STORES, ids=STORE_IDS)
def test_compact_toctou_append_after_publish_quarantines(
    spark, tmp_path, store, monkeypatch
):
    """An append landing between the pre-publish re-list and the publish
    is caught by the post-publish fence; the published copy is RETRACTED
    from the serving name but PRESERVED byte-for-byte (quarantine-not-
    delete), through either store's retraction mechanism (directory move
    vs pointer delete)."""
    serving = _published_index(spark, tmp_path, store)
    state = {"armed": True}
    orig_publish = type(store).publish

    def sneaky_publish(self, staged, dst):
        if state["armed"]:
            state["armed"] = False
            append_ivf_pq_index(
                _copy_vectors(spark, n=1, id_offset=7_100_000),
                serving,
                store=store,
            )
        return orig_publish(self, staged, dst)

    monkeypatch.setattr(type(store), "publish", sneaky_publish)
    dst = str(tmp_path / "v2")
    with pytest.raises(RuntimeError, match="preserved at") as exc_info:
        compact_ivf_pq_index(spark, serving, dst, store=store)
    monkeypatch.undo()
    # retracted: a reader resolving the serving name sees nothing
    assert store.resolve(dst) is None
    # ...but preserved: the quarantined copy is complete on disk
    quarantined = str(exc_info.value).rsplit("preserved at ", 1)[1].strip("'\"")
    assert os.path.exists(os.path.join(quarantined, "_model.json"))
    assert any(
        f.endswith(".parquet")
        for _r, _d, fs in os.walk(quarantined)
        for f in fs
    )


# ---------------------------------------------------------------------------
# 3. The manifest store is genuinely rename-less
# ---------------------------------------------------------------------------


def test_manifest_store_never_renames_a_directory(spark, tmp_path, monkeypatch):
    """The object-store constraint is real: a full
    publish->append->delete->compact pass through ManifestPointerStore
    must never call os.rename/os.replace on a DIRECTORY (small-file
    pointer ops are allowed — they model atomic object PUTs; Spark's own
    task-commit renames inside a staged version prefix are file-level)."""
    store = ManifestPointerStore()
    # the shared base build uses the default POSIX store by design; stage
    # it BEFORE arming the guard — only the manifest-store lifecycle below
    # is under the rename-less constraint
    write_ivf_pq_index(spark, SF, str(tmp_path / "base"))
    real_rename, real_replace = os.rename, os.replace

    def no_dir_rename(src, dst, *a, **kw):
        assert not os.path.isdir(src), f"directory rename: {src} -> {dst}"
        return real_rename(src, dst, *a, **kw)

    def no_dir_replace(src, dst, *a, **kw):
        assert not os.path.isdir(src), f"directory replace: {src} -> {dst}"
        return real_replace(src, dst, *a, **kw)

    monkeypatch.setattr(os, "rename", no_dir_rename)
    monkeypatch.setattr(os, "replace", no_dir_replace)
    serving = _published_index(spark, tmp_path, store)
    append_ivf_pq_index(_copy_vectors(spark, n=1), serving, store=store)
    S.delete_from_ivf_pq_index(spark, [1], serving, store=store)
    dst = str(tmp_path / "v2")
    compact_ivf_pq_index(spark, serving, dst, store=store)
    assert read_ivf_pq_index(spark, dst, store=store).count() > 0


# ---------------------------------------------------------------------------
# 4. Publish atomicity: no reader ever sees a half-published version
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("store", STORES, ids=STORE_IDS)
def test_crash_before_publish_leaves_nothing_visible(tmp_path, store):
    """A writer that fully stages a version but dies before publish()
    leaves the serving name unpublished — a reader can never resolve a
    half-published (or even fully-staged-but-uncommitted) version."""
    serving = str(tmp_path / "idx")
    staged = store.stage(serving)
    os.makedirs(staged, exist_ok=True)
    open(os.path.join(staged, "part-0.parquet"), "w").write("x")
    # crash here: no publish
    assert store.resolve(serving) is None
    assert store.list_files(serving) == frozenset()


@pytest.mark.parametrize("store", STORES, ids=STORE_IDS)
def test_publish_race_loses_loudly_and_winner_survives(tmp_path, store):
    serving = str(tmp_path / "idx")
    a, b = store.stage(serving), store.stage(serving)
    if a == b:
        # the POSIX store's staging name is deterministic per (pid, tid) —
        # same-process concurrency is serialized by the build lock, so
        # model the second WRITER as another process's staging dir
        b = a + "-otherpid"
    for staged, marker in ((a, "winner"), (b, "loser")):
        os.makedirs(staged, exist_ok=True)
        open(os.path.join(staged, "who"), "w").write(marker)
    store.publish(a, serving)
    with pytest.raises(PublishConflict):
        store.publish(b, serving)
    live = store.resolve(serving)
    assert open(os.path.join(live, "who")).read() == "winner"


@pytest.mark.parametrize("store", STORES, ids=STORE_IDS)
def test_quarantine_unpublishes_but_preserves(tmp_path, store):
    serving = str(tmp_path / "idx")
    staged = store.stage(serving)
    os.makedirs(staged, exist_ok=True)
    open(os.path.join(staged, "data.parquet"), "w").write("bytes")
    store.publish(staged, serving)
    preserved = store.quarantine(serving)
    assert store.resolve(serving) is None  # retracted from serving
    assert os.path.exists(os.path.join(preserved, "data.parquet"))  # kept


# ---------------------------------------------------------------------------
# 5. Bounded retention (gc): superseded versions / quarantine leftovers
#    expire, the live version and the reader grace window never do
# ---------------------------------------------------------------------------


def _backdate(path: str, age_s: float = 7 * 86400) -> None:
    """Age the ENTIRE tree: gc's grace fence keys on the newest mtime
    anywhere under the artifact (in-progress builds refresh file mtimes;
    supersede stamps the root), so aging only the top directory would
    prove nothing."""
    import time

    old = time.time() - age_s
    targets = [path]
    if os.path.isdir(path):
        for root, dirs, files in os.walk(path):
            targets.extend(os.path.join(root, n) for n in dirs + files)
    for p in targets:
        os.utime(p, (old, old))


def _publish_tiny(store, serving: str, marker: str) -> str:
    staged = store.stage(serving)
    os.makedirs(staged, exist_ok=True)
    open(os.path.join(staged, "data.parquet"), "w").write(marker)
    store.publish(staged, serving)
    return store.resolve(serving)


@pytest.mark.parametrize("store", STORES, ids=STORE_IDS)
def test_gc_never_removes_live_version(tmp_path, store):
    """The live version survives GC at ANY age, with the harshest knobs
    (keep_versions=0, grace_s=0) — liveness is re-resolved inside gc()."""
    serving = str(tmp_path / "idx")
    live = _publish_tiny(store, serving, "live")
    _backdate(live)
    removed = store.gc(serving, keep_versions=0, grace_s=0)
    assert store.resolve(serving) == live
    assert os.path.exists(os.path.join(live, "data.parquet"))
    assert live not in removed


def test_gc_superseded_manifest_version_expires_after_grace(tmp_path):
    """A superseded prefix (quarantined then replaced) survives while a
    concurrent reader could still be scanning it (grace window), then
    expires; the live replacement is untouched. This IS the
    reader-resolved-pre-GC fence: grace > resolve-age keeps the bytes.

    Crucially the grace clock runs from SUPERSEDE time, not build time
    (the prefix here is aged to a week old BEFORE retraction — a version
    that served for days must still get a full grace window after it
    stops serving, because its last readers resolved it seconds ago)."""
    store = ManifestPointerStore()
    serving = str(tmp_path / "idx")
    old_prefix = _publish_tiny(store, serving, "v1")
    _backdate(old_prefix)  # v1 served for a "week" before being replaced
    store.quarantine(serving)  # retraction stamps the supersede time
    live = _publish_tiny(store, serving, "v2")
    reader_path = old_prefix  # a reader resolved v1 just before the swap

    # within grace-from-supersede: nothing to collect despite the old
    # build date; the reader's bytes are intact
    assert store.gc(serving, keep_versions=0, grace_s=3600) == []
    assert open(os.path.join(reader_path, "data.parquet")).read() == "v1"

    # past grace: the superseded prefix expires, live never does
    _backdate(old_prefix)
    removed = store.gc(serving, keep_versions=0, grace_s=3600)
    assert removed == [old_prefix]
    assert not os.path.exists(old_prefix)
    assert store.resolve(serving) == live
    assert open(os.path.join(live, "data.parquet")).read() == "v2"


def test_gc_keeps_last_n_versions_regardless_of_age(tmp_path):
    """Iceberg's retain-last posture: the newest keep_versions non-live
    prefixes survive even when ancient; older ones expire."""
    store = ManifestPointerStore()
    serving = str(tmp_path / "idx")
    prefixes = []
    for i in range(4):
        p = _publish_tiny(store, serving, f"v{i}")
        store.quarantine(serving)
        prefixes.append(p)
        _backdate(p, age_s=(10 - i) * 86400)  # older index = older mtime
    live = _publish_tiny(store, serving, "live")
    removed = store.gc(serving, keep_versions=2, grace_s=0)
    assert sorted(removed) == sorted(prefixes[:2])  # the two oldest
    for kept in prefixes[2:] + [live]:
        assert os.path.exists(kept)


@pytest.mark.parametrize("store", STORES, ids=STORE_IDS)
def test_gc_sweeps_crash_orphaned_staging(tmp_path, store):
    """A writer that crashed mid-build leaves a staged artifact (posix:
    .build-* dir; manifest: an unpublished version prefix + a .ptr.put-*
    scratch object). GC sweeps them after the grace window, not before."""
    serving = str(tmp_path / "idx")
    _publish_tiny(store, serving, "live")
    staged = store.stage(serving)
    os.makedirs(staged, exist_ok=True)
    open(os.path.join(staged, "part-0.parquet"), "w").write("orphan")
    scratch = None
    if isinstance(store, ManifestPointerStore):
        scratch = f"{serving}.ptr.put-99999-1"
        open(scratch, "w").write(os.path.abspath(staged))

    assert store.gc(serving, keep_versions=0, grace_s=3600) == []  # fresh: kept
    assert os.path.exists(staged)

    # an IN-PROGRESS build looks exactly like a crash orphan from the
    # root (stale top dir) but its task files keep landing — the grace
    # fence keys on the newest mtime in the tree, so it must survive
    _backdate(staged)
    open(os.path.join(staged, "part-1.parquet"), "w").write("mid-build")
    assert store.gc(serving, keep_versions=0, grace_s=3600) == []
    assert os.path.exists(staged)

    _backdate(staged)
    if scratch:
        _backdate(scratch)
    removed = store.gc(serving, keep_versions=0, grace_s=3600)
    assert staged in removed and not os.path.exists(staged)
    if scratch:
        assert scratch in removed and not os.path.exists(scratch)
    assert store.resolve(serving) is not None  # live untouched


def test_gc_posix_quarantine_ttl(tmp_path):
    """POSIX quarantine roots (failed-fence post-mortems) expire after the
    TTL; the newest keep_versions stay for inspection."""
    store = PosixRenameStore()
    serving = str(tmp_path / "idx")
    qroots = []
    for i in range(3):
        _publish_tiny(store, serving, f"v{i}")
        q = store.quarantine(serving)
        qroot = os.path.dirname(q)
        qroots.append(qroot)
        _backdate(qroot, age_s=(10 - i) * 86400)
        _backdate(q, age_s=(10 - i) * 86400)
    removed = store.gc(serving, keep_versions=1, grace_s=3600)
    assert sorted(removed) == sorted(qroots[:2])
    assert os.path.exists(qroots[2])


@pytest.mark.parametrize("store", STORES, ids=STORE_IDS)
def test_lifecycle_still_green_after_gc(spark, tmp_path, store):
    """GC mid-lifecycle must be invisible to the index: after an append
    and the harshest GC, the served rows and a subsequent compaction are
    unaffected (the sim_ivf_pq_delete_checked path keeps working)."""
    serving = _published_index(spark, tmp_path, store)
    append_ivf_pq_index(_copy_vectors(spark, n=2), serving, store=store)
    n_before = read_ivf_pq_index(spark, serving, store=store).count()
    store.gc(serving, keep_versions=0, grace_s=0)
    assert read_ivf_pq_index(spark, serving, store=store).count() == n_before
    dst = str(tmp_path / "v2")
    compact_ivf_pq_index(spark, serving, dst, store=store)
    assert read_ivf_pq_index(spark, dst, store=store).count() == n_before


def test_stream_append_through_manifest_store(spark, tmp_path):
    """The always-on streaming append leg also works through the
    rename-less store: micro-batches land inside the pointer-resolved
    version prefix and are visible through the seam-aware serve view —
    the last lifecycle leg not covered by the parameterized tests above."""
    import json

    from distributed_video_analytics_flink_spark.operators.similarity import (
        stream_append_ivf_pq_index,
    )

    store = ManifestPointerStore()
    serving = _published_index(spark, tmp_path, store, name="sidx")
    src_rows = (
        load_table(spark, SF, "embeddings")
        .filter(F.col("vec_id").between(1, 3))
        .collect()
    )
    data_dir = tmp_path / "incoming"
    data_dir.mkdir()
    for i, r in enumerate(src_rows):
        (data_dir / f"vecs-{i}.json").write_text(
            json.dumps(
                {
                    "vec_id": r["vec_id"] + 3_000_000,
                    "embedding": [float(x) for x in r["embedding"]],
                }
            )
        )
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    ).json(str(data_dir))
    q = stream_append_ivf_pq_index(
        stream, serving, str(tmp_path / "ck"), store=store
    )
    q.processAllAvailable()
    q.stop()
    served = read_ivf_pq_index(spark, serving, store=store)
    assert served.filter(F.col("vec_id") >= 3_000_000).count() == 3
    # appended rows live INSIDE the resolved version prefix (the pointer
    # target), never at the logical serving name
    assert not os.path.isdir(serving)
    live = store.resolve(serving)
    files = served.inputFiles()
    assert files and all(live in f for f in files)  # URI scheme varies


# ---------------------------------------------------------------------------
# 6. Live-writer pid fence + publish sentinel (r13, ADVICE r12 #4)
# ---------------------------------------------------------------------------


def test_gc_skips_staging_of_live_foreign_writer(tmp_path):
    """A staged .build-* dir whose embedded pid belongs to a LIVE other
    process must survive GC even past the grace window — a quiescent
    builder (long compute phase, no file writes) is not a crash orphan.
    pid 1 is always alive (init); os.kill(1, 0) raises EPERM, which the
    fence must treat as 'exists'."""
    store = PosixRenameStore()
    serving = str(tmp_path / "idx")
    _publish_tiny(store, serving, "live")
    staged = f"{serving}.build-1-12345"  # foreign live pid (init)
    os.makedirs(staged)
    open(os.path.join(staged, "part-0.parquet"), "w").write("quiescent")
    _backdate(staged)
    assert store.gc(serving, keep_versions=0, grace_s=3600) == []
    assert os.path.exists(staged)


def test_gc_own_pid_staging_still_collected(tmp_path):
    """Own-pid staged dirs rely on the grace fence alone (within one
    process the name cannot distinguish a live quiescent thread from a
    recycled-name orphan) — so an aged own-pid orphan IS collected, which
    is also what keeps the existing crash-orphan semantics unchanged."""
    store = PosixRenameStore()
    serving = str(tmp_path / "idx")
    _publish_tiny(store, serving, "live")
    staged = store.stage(serving)  # embeds os.getpid()
    os.makedirs(staged)
    open(os.path.join(staged, "part-0.parquet"), "w").write("orphan")
    _backdate(staged)
    removed = store.gc(serving, keep_versions=0, grace_s=3600)
    assert staged in removed and not os.path.exists(staged)


def test_manifest_gc_pid_fence_only_for_unpublished(tmp_path):
    """Manifest store: the pid fence protects NEVER-PUBLISHED prefixes of
    live foreign writers, but a published-then-superseded prefix (carries
    the _PUBLISHED sentinel publish() stamps) ages out under the reader
    grace alone — retention stays bounded under a long-lived publisher."""
    store = ManifestPointerStore()
    serving = str(tmp_path / "idx")

    # two published versions from a "foreign live" writer (pid 1): v1 is
    # superseded by v2; a third prefix is staged but never published
    def _staged_as_pid1() -> str:
        root = f"{serving}.versions"
        os.makedirs(root, exist_ok=True)
        import os as _os

        p = os.path.join(root, f"v-1-999-{_os.urandom(3).hex()}")
        os.makedirs(p)
        open(os.path.join(p, "data.parquet"), "w").write("x")
        return p

    v1 = _staged_as_pid1()
    store.publish(v1, serving)
    store.quarantine(serving)  # unpublish: v1 is now superseded
    v2 = _staged_as_pid1()
    store.publish(v2, serving)
    unpublished = _staged_as_pid1()

    _backdate(v1)
    _backdate(unpublished)
    removed = store.gc(serving, keep_versions=0, grace_s=3600)
    assert v1 in removed and not os.path.exists(v1)  # sentinel: grace only
    assert unpublished not in removed and os.path.exists(unpublished)
    assert store.resolve(serving) == v2  # live untouched


def test_publish_sentinel_invisible_to_serving_scan(spark, tmp_path):
    """The _PUBLISHED sentinel must not change what the index serves:
    rows through the manifest store are identical before/after a publish
    that stamps it (underscore prefix = invisible to Spark scans)."""
    store = ManifestPointerStore()
    serving = _published_index(spark, tmp_path, store)
    live = store.resolve(serving)
    assert os.path.exists(os.path.join(live, "_PUBLISHED"))
    n = read_ivf_pq_index(spark, serving, store=store).count()
    assert n > 0
