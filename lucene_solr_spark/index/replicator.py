"""The lucene/replicator module: publish/checkForUpdate/obtain/release
index replication over the engine's immutable segment layout.

Reference (lucene/replicator/src/java/org/apache/lucene/replicator/):
- Replicator.java:41-78 — the four-method contract: publish a Revision,
  checkForUpdate(currVersion) → SessionToken or None (client is always
  updated to the NEWEST revision), obtainFile within a session,
  release the session.
- LocalReplicator.java — ref-counted revisions (a published revision
  stays alive while sessions reference it; the previous revision decRefs
  on publish), session expiration (default 30 min; an expired session
  raises SessionExpiredException on access), publish of an EQUAL version
  releases the new revision and no-ops, publish of an OLDER version
  releases it and raises, closed replicator raises AlreadyClosed.
- IndexRevision.java:53,89-121 — version = the commit generation in
  base-16; comparisons parse and compare the generation numbers;
  the revision holds its commit via SnapshotDeletionPolicy so files
  survive until release().
- ReplicationClient.java:141-220 — requiredFiles = revision files the
  client copy lacks (by name + size), copied into the handler directory,
  then the handler flips to the new revision atomically.

Engine mapping: a revision snapshots the index root (stats.json,
lineage, docs/terms/postings parquet dirs) via HARD LINKS — the
SnapshotDeletionPolicy analog: segment parquet is immutable and a link
tree pins the bytes at zero copy cost until release() unlinks them. The
version is the lineage row count in base-16 (generation: appends and
merges only ever add lineage rows). The client copies only missing
files (name+size check, exactly requiredFiles) and flips a completed
sync atomically by writing the version marker LAST, so a crashed sync
never yields a half-visible index — the replica dir stays openable by
Searcher at the previous revision.

On a shared-storage Spark cluster replication is free (SURVEY's
"native" ruling); this module exists for the reference's OTHER topology
— independent searcher nodes with local disks pulling published
revisions — and for taking consistent snapshots of a live index.
"""

from __future__ import annotations

import os
import shutil
import time

__all__ = ["IndexRevision", "LocalReplicator", "ReplicationClient",
           "SessionExpiredException", "SessionToken"]


class SessionExpiredException(Exception):
    pass


class AlreadyClosedException(Exception):
    pass


_RADIX = 16


def _rev_version(generation: int) -> str:
    return "%x" % generation  # Long.toString(gen, 16)


def _lineage_generation(root: str) -> int:
    """Monotone generation: number of committed lineage rows (appends and
    merges only add rows), falling back to 0 for a bare index."""
    lineage = os.path.join(root, "lineage")
    if not os.path.isdir(lineage):
        return 0
    n = 0
    for dirpath, _, files in os.walk(lineage):
        n += sum(1 for f in files
                 if f.endswith(".parquet") or f.endswith(".json"))
    return n


# two IndexRevision objects at the same generation share one snapshot
# dir — refcount it so releasing one (e.g. publish of an equal version
# releases the NEW revision, LocalReplicator.java) can't delete the
# bytes out from under the other (the SnapshotDeletionPolicy refcount)
_SNAPSHOT_REFS: dict[str, int] = {}


class IndexRevision:
    """A consistent snapshot of the index root, pinned by hard links."""

    def __init__(self, root: str, snapshot_dir: str | None = None):
        self.root = root
        self.generation = _lineage_generation(root)
        self.version = _rev_version(self.generation)
        self.snapshot = snapshot_dir or os.path.join(
            root, "_revisions", self.version)
        if not os.path.isdir(self.snapshot):
            self._link_tree(root, self.snapshot)
        _SNAPSHOT_REFS[self.snapshot] = _SNAPSHOT_REFS.get(self.snapshot, 0) + 1
        # source -> [(filename, size)]
        self.source_files: dict[str, list[tuple[str, int]]] = {"index": []}
        for dirpath, _, files in os.walk(self.snapshot):
            rel = os.path.relpath(dirpath, self.snapshot)
            for f in files:
                name = f if rel == "." else os.path.join(rel, f)
                size = os.path.getsize(os.path.join(dirpath, f))
                self.source_files["index"].append((name, size))
        self.source_files["index"].sort()

    @staticmethod
    def _link_tree(src: str, dst: str) -> None:
        for dirpath, dirnames, files in os.walk(src):
            rel = os.path.relpath(dirpath, src)
            if rel.split(os.sep)[0] == "_revisions":
                dirnames[:] = []
                continue
            out = dst if rel == "." else os.path.join(dst, rel)
            os.makedirs(out, exist_ok=True)
            for f in files:
                s = os.path.join(dirpath, f)
                d = os.path.join(out, f)
                if not os.path.exists(d):
                    try:
                        os.link(s, d)
                    except OSError:
                        shutil.copy2(s, d)  # cross-device fallback

    def compare_to_version(self, version: str) -> int:
        gen = int(version, _RADIX)
        return (self.generation > gen) - (self.generation < gen)

    def compare_to(self, other: "IndexRevision") -> int:
        return ((self.generation > other.generation)
                - (self.generation < other.generation))

    def open(self, source: str, filename: str):
        if source != "index":
            raise ValueError(f"unknown source {source!r}")
        path = os.path.join(self.snapshot, filename)
        if not os.path.exists(path):
            raise FileNotFoundError(filename)
        return open(path, "rb")

    def release(self) -> None:
        n = _SNAPSHOT_REFS.get(self.snapshot, 1) - 1
        if n <= 0:
            _SNAPSHOT_REFS.pop(self.snapshot, None)
            shutil.rmtree(self.snapshot, ignore_errors=True)
        else:
            _SNAPSHOT_REFS[self.snapshot] = n


class IndexAndTaxonomyRevision:
    """IndexAndTaxonomyRevision.java:47-180: one revision spanning the
    search index and its side taxonomy (here: a facet index dir), with
    two sources ('index', 'taxo') and a composite
    '<indexGen>:<taxoGen>' version compared index-generation-first."""

    INDEX_SOURCE = "index"
    TAXONOMY_SOURCE = "taxo"

    def __init__(self, index_root: str, taxo_root: str):
        self._index = IndexRevision(index_root)
        self._taxo = IndexRevision(taxo_root)
        self.generation = (self._index.generation, self._taxo.generation)
        self.version = (f"{_rev_version(self._index.generation)}:"
                        f"{_rev_version(self._taxo.generation)}")
        self.source_files = {
            self.INDEX_SOURCE: self._index.source_files["index"],
            self.TAXONOMY_SOURCE: self._taxo.source_files["index"],
        }

    def compare_to_version(self, version: str) -> int:
        ig, tg = (int(p, _RADIX) for p in version.split(":"))
        cmp = (self.generation[0] > ig) - (self.generation[0] < ig)
        if cmp:
            return cmp
        return (self.generation[1] > tg) - (self.generation[1] < tg)

    def compare_to(self, other: "IndexAndTaxonomyRevision") -> int:
        cmp = ((self.generation[0] > other.generation[0])
               - (self.generation[0] < other.generation[0]))
        if cmp:
            return cmp
        return ((self.generation[1] > other.generation[1])
                - (self.generation[1] < other.generation[1]))

    def open(self, source: str, filename: str):
        if source == self.INDEX_SOURCE:
            return self._index.open("index", filename)
        if source == self.TAXONOMY_SOURCE:
            return self._taxo.open("index", filename)
        raise ValueError(f"unknown source {source!r}")

    def release(self) -> None:
        self._index.release()
        self._taxo.release()


class SessionToken:
    def __init__(self, session_id: str, revision):
        self.id = session_id
        self.version = revision.version
        self.source_files = revision.source_files


class _RefCountedRevision:
    def __init__(self, revision: IndexRevision):
        self.revision = revision
        self.refcount = 1

    def inc_ref(self) -> None:
        self.refcount += 1

    def dec_ref(self) -> None:
        if self.refcount <= 0:
            raise RuntimeError("this revision is already released")
        self.refcount -= 1
        if self.refcount == 0:
            self.revision.release()


class LocalReplicator:
    """LocalReplicator.java, method for method."""

    DEFAULT_SESSION_EXPIRATION_THRESHOLD = 1000 * 60 * 30  # ms

    def __init__(self):
        self._current: _RefCountedRevision | None = None
        self._sessions: dict[str, dict] = {}
        self._next_session = 0
        self._closed = False
        self.expiration_threshold_ms = \
            self.DEFAULT_SESSION_EXPIRATION_THRESHOLD

    def _ensure_open(self) -> None:
        if self._closed:
            raise AlreadyClosedException(
                "This replicator has already been closed")

    def publish(self, revision: IndexRevision) -> None:
        self._ensure_open()
        if self._current is not None:
            cmp = revision.compare_to(self._current.revision)
            if cmp == 0:
                revision.release()
                return
            if cmp < 0:
                revision.release()
                raise ValueError(
                    f"Cannot publish an older revision: rev={revision.version}"
                    f" current={self._current.revision.version}")
        old = self._current
        self._current = _RefCountedRevision(revision)
        if old is not None:
            old.dec_ref()
        self._check_expired_sessions()

    def check_for_update(self, current_version: str | None) -> SessionToken | None:
        self._ensure_open()
        if self._current is None:
            return None
        if current_version is not None and \
                self._current.revision.compare_to_version(current_version) <= 0:
            return None
        self._current.inc_ref()
        self._next_session += 1
        sid = str(self._next_session)
        token = SessionToken(sid, self._current.revision)
        self._sessions[sid] = {
            "token": token, "rev": self._current,
            "last_access": time.monotonic() * 1000}
        return token

    def _check_expired_sessions(self) -> None:
        now = time.monotonic() * 1000
        for sid in [s for s, e in self._sessions.items()
                    if e["last_access"] < now - self.expiration_threshold_ms]:
            self._release_session(sid)

    def _release_session(self, sid: str) -> None:
        entry = self._sessions.pop(sid, None)
        if entry is not None:
            entry["rev"].dec_ref()

    def release(self, session_id: str) -> None:
        self._ensure_open()
        self._release_session(session_id)

    def obtain_file(self, session_id: str, source: str, filename: str):
        self._ensure_open()
        entry = self._sessions.get(session_id)
        now = time.monotonic() * 1000
        if entry is not None and \
                entry["last_access"] < now - self.expiration_threshold_ms:
            self._release_session(session_id)
            entry = None
        if entry is None:
            raise SessionExpiredException(
                f"session ({session_id}) expired while obtaining file: "
                f"source={source} file={filename}")
        entry["last_access"] = now
        return entry["rev"].revision.open(source, filename)

    def close(self) -> None:
        if not self._closed:
            for sid in list(self._sessions):
                self._release_session(sid)
            self._closed = True


class ReplicationClient:
    """ReplicationClient.doUpdate as a pull-sync into a replica dir."""

    VERSION_FILE = "replica.version"

    def __init__(self, replicator: LocalReplicator, replica_dir: str,
                 source_dirs: dict[str, str] | None = None):
        """source_dirs routes each revision source to a directory — the
        PerSessionDirectoryFactory/IndexAndTaxonomyReplicationHandler
        split (e.g. {'index': ..., 'taxo': ...}); default: everything
        under replica_dir with non-index sources in subdirs."""
        self.replicator = replicator
        self.replica_dir = replica_dir
        self.source_dirs = source_dirs or {}
        os.makedirs(replica_dir, exist_ok=True)

    def _dir_for(self, source: str) -> str:
        if source in self.source_dirs:
            return self.source_dirs[source]
        return (self.replica_dir if source == "index"
                else os.path.join(self.replica_dir, source))

    @property
    def current_version(self) -> str | None:
        p = os.path.join(self.replica_dir, self.VERSION_FILE)
        if os.path.exists(p):
            with open(p) as f:
                return f.read().strip() or None
        return None

    def _required_files(self, token: SessionToken,
                        source: str) -> list[tuple[str, int]]:
        """requiredFiles: revision files missing locally or with a
        different size (ReplicationClient.java:186-210)."""
        base = self._dir_for(source)
        out = []
        for name, size in token.source_files[source]:
            local = os.path.join(base, name)
            if not os.path.exists(local) or os.path.getsize(local) != size:
                out.append((name, size))
        return out

    def update_now(self) -> bool:
        """One doUpdate cycle; True if a new revision was synced."""
        token = self.replicator.check_for_update(self.current_version)
        if token is None:
            return False
        try:
            for source in token.source_files:
                base = self._dir_for(source)
                for name, _ in self._required_files(token, source):
                    dst = os.path.join(base, name)
                    os.makedirs(os.path.dirname(dst) or base, exist_ok=True)
                    with self.replicator.obtain_file(token.id, source, name) \
                            as src, open(dst + ".tmp", "wb") as out:
                        shutil.copyfileobj(src, out, length=16384)
                    os.replace(dst + ".tmp", dst)
                # drop local files the revision no longer carries (stale
                # segment dirs after a merge), EXCEPT the version marker
                keep = {name for name, _ in token.source_files[source]}
                other_dirs = {os.path.relpath(self._dir_for(s), base)
                              for s in token.source_files if s != source}
                for dirpath, _, files in os.walk(base):
                    rel = os.path.relpath(dirpath, base)
                    if any(rel == o or rel.startswith(o + os.sep)
                           for o in other_dirs if not o.startswith("..")):
                        continue  # another source's subtree
                    for f in files:
                        name = f if rel == "." else os.path.join(rel, f)
                        if name not in keep and f != self.VERSION_FILE and \
                                not f.endswith(".tmp"):
                            os.remove(os.path.join(dirpath, f))
            # the version marker flips LAST: a crash mid-sync leaves the
            # replica readable at its previous committed revision
            with open(os.path.join(self.replica_dir, self.VERSION_FILE),
                      "w") as f:
                f.write(token.version)
            return True
        finally:
            self.replicator.release(token.id)
