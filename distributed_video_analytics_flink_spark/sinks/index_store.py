"""The two store primitives the at-rest IVF+PQ index lifecycle needs —
PUBLISH (atomically expose a fully-written version) and LIST (the
file-set snapshot behind compaction's fences) — extracted behind one
seam, with both production shapes implemented:

- :class:`PosixRenameStore` — POSIX/HDFS: atomic single-directory
  ``rename`` is the publish primitive (the Hive/Iceberg-v1 commit
  posture). This is byte-for-byte the behavior the lifecycle had before
  the seam existed, and the default.
- :class:`ManifestPointerStore` — object stores (S3): there is NO atomic
  directory rename, so a version is written under an immutable
  versioned prefix and published by atomically writing ONE small
  pointer object naming it (the Iceberg/Delta commit pattern). Locally
  the atomic conditional PUT is emulated with ``os.link`` of a
  fully-written pointer file — link is create-if-absent WITH full
  content, so a reader can never observe an empty or half-written
  pointer; on S3 this maps to a conditional PUT (If-None-Match) of the
  pointer object. No directory is ever renamed.

The lifecycle *semantics* (snapshot-first fencing, tombstone-at-serve,
quarantine-not-delete, race-loser validation) live in
``operators/similarity.py`` and are primitive-agnostic — they call only
this interface, so the fence tests run parameterized over both stores
(tests/test_index_store.py). The data plane is already store-agnostic:
codes and tombstones are plain partitioned parquet through Spark.

Reference provenance: the reference persists results through Cassandra
and never versions an index (DataCassandraSink.java); the lifecycle this
seam serves is the engine's LLM-pipeline extension (SCALE.md, "Index
sidecar IO assumes a rename-capable store")."""

from __future__ import annotations

import os
import shutil
import threading


class PublishConflict(Exception):
    """The serving name is already published (another process won the
    publish race). The caller decides whether the existing version is
    acceptable — the build's race-loser path validates and adopts it."""


class PosixRenameStore:
    """Publish = atomic directory rename; list = os.walk. Correct on
    POSIX filesystems and HDFS, where single-directory rename is atomic
    and fails when the destination exists."""

    def stage(self, serving: str) -> str:
        """A sibling staging directory for a new version. The writer
        creates it (Spark's parquet write does); publish() renames it
        onto the serving name."""
        return f"{serving}.build-{os.getpid()}-{threading.get_ident()}"

    def publish(self, staged: str, serving: str) -> None:
        try:
            os.rename(staged, serving)
        except OSError as exc:
            raise PublishConflict(str(exc)) from exc

    def resolve(self, serving: str) -> str | None:
        """Physical directory of the live version (the serving name
        itself here), or None if nothing is published."""
        return serving if os.path.isdir(serving) else None

    def list_files(self, serving: str) -> frozenset:
        """Every .parquet under the live version — data AND tombstone
        sidecars — as the fence's snapshot unit."""
        live = self.resolve(serving)
        out = []
        if live is not None:
            for root, _dirs, files in os.walk(live):
                for f in files:
                    if f.endswith(".parquet"):
                        out.append(os.path.join(root, f))
        return frozenset(out)

    def quarantine(self, serving: str) -> str:
        """Unpublish PRESERVING bytes: move the directory to a fresh
        quarantine path (mkdtemp guarantees an empty target even on
        repeated fence failures from the same thread). A reader that
        already resolved keeps valid open handles — rename only moves
        the directory entry. Returns where the copy is preserved; if
        even the rename fails, the copy stays in place and its own path
        is returned."""
        import tempfile

        try:
            qroot = tempfile.mkdtemp(
                prefix=os.path.basename(serving) + ".quarantine-",
                dir=os.path.dirname(serving) or ".",
            )
            quarantine = os.path.join(qroot, "index")
            try:
                os.rename(serving, quarantine)
            except OSError:
                os.rmdir(qroot)  # don't leak the unused empty quarantine
                raise
        except OSError:
            return serving  # rename failed: left in place
        return quarantine

    def discard_staged(self, staged: str) -> None:
        shutil.rmtree(staged, ignore_errors=True)


class ManifestPointerStore:
    """Publish = atomic create-if-absent write of ONE small pointer
    object naming an immutable versioned prefix; list = LIST against the
    resolved prefix. The object-store commit pattern: data objects are
    written once under ``{serving}.versions/<token>/`` and never moved —
    only the pointer changes hands. A crash before the pointer write
    leaves the serving name unpublished (readers resolve to None/the old
    version, never to a half-written prefix)."""

    def _pointer(self, serving: str) -> str:
        return f"{serving}.ptr"

    def stage(self, serving: str) -> str:
        """A fresh immutable version prefix. The token is
        process-unique + random so concurrent builders never collide;
        the prefix is write-once by contract (appends to a LIVE version
        land inside its prefix, which object stores allow — objects are
        immutable, prefixes are not)."""
        token = f"v-{os.getpid()}-{threading.get_ident()}-{os.urandom(4).hex()}"
        root = f"{serving}.versions"
        os.makedirs(root, exist_ok=True)
        return os.path.join(root, token)

    def publish(self, staged: str, serving: str) -> None:
        """Atomic conditional PUT of the pointer: the content is fully
        written to a scratch object first, then linked to the pointer
        name — link fails with EEXIST if already published (the publish
        race) and a reader can never see a partial pointer."""
        import errno

        ptr = self._pointer(serving)
        tmp = f"{ptr}.put-{os.getpid()}-{threading.get_ident()}"
        with open(tmp, "w") as fh:
            fh.write(os.path.abspath(staged))
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, ptr)
        except OSError as exc:
            if exc.errno == errno.EEXIST:  # lost the race: pointer taken
                raise PublishConflict(str(exc)) from exc
            raise  # anything else is a real IO failure, not a lost race
        finally:
            os.unlink(tmp)

    def resolve(self, serving: str) -> str | None:
        try:
            with open(self._pointer(serving)) as fh:
                live = fh.read().strip()
        except OSError:
            return None
        return live if os.path.isdir(live) else None

    def list_files(self, serving: str) -> frozenset:
        live = self.resolve(serving)
        out = []
        if live is not None:
            for root, _dirs, files in os.walk(live):
                for f in files:
                    if f.endswith(".parquet"):
                        out.append(os.path.join(root, f))
        return frozenset(out)

    def quarantine(self, serving: str) -> str:
        """Unpublish by deleting the POINTER (one small-object DELETE —
        atomic everywhere); the version prefix is untouched, so a reader
        mid-scan and the operator's post-mortem both keep the bytes.
        Returns the preserved prefix."""
        live = self.resolve(serving)
        try:
            os.unlink(self._pointer(serving))
        except OSError:
            return serving  # pointer already gone / undeletable
        return live if live is not None else serving

    def discard_staged(self, staged: str) -> None:
        shutil.rmtree(staged, ignore_errors=True)


# The default store for every lifecycle entry point: local disk and HDFS
# have atomic rename, and the test/bench environment is local disk.
DEFAULT_INDEX_STORE = PosixRenameStore()
