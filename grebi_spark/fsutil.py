"""Scheme-aware filesystem helpers (JVM Hadoop FileSystem).

Driver-side artifact maintenance (index compaction sweeps, segment
discovery) must see hdfs:// and s3a:// roots the same way the Spark
reader does — os/glob only sees the driver's local disk and would
silently find nothing on a remote root.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_ls(spark: SparkSession, path, dirs_only: bool = False):
    """listStatus through the JVM Hadoop FileSystem. ``path`` is a
    string or a jvm Path; returns [] for a missing path."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path) if isinstance(path, str) else path
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return []
    statuses = list(fs.listStatus(jpath))
    if dirs_only:
        statuses = [s for s in statuses if s.isDirectory()]
    return statuses


def fs_of(spark: SparkSession, path: str):
    """(jvm, FileSystem) for ``path``'s scheme."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath.getFileSystem(spark._jsc.hadoopConfiguration())


# --- versioned artifact roots (blue/green publication) -----------------------
#
# One layout shared by every durable artifact the engine maintains (the
# ANN index and the graph-state snapshots): a root holds version
# directories v1, v2, …; a version becomes visible only when its
# _COMMITTED marker and the root's CURRENT pointer land (the Iceberg
# version-hint shape). A crash mid-write leaves the previous version
# serving; publication and rollback are O(1) pointer swaps that never
# move data, so in-flight readers keep the directory they resolved.
#
# CONCURRENT PUBLISHERS: enforced, not just documented. Version-name
# election is a CAS (claim_version atomically creates v<N>/_CLAIMED, so
# two concurrent publishers write DISJOINT directories), and
# publish_version serializes its delete+rename pointer swing behind an
# atomic create-if-absent lock file (_PUBLISH_LOCK, with stale-lock
# breaking for a crashed holder). Readers are unrestricted and
# crash-safe at any concurrency. next_version remains the pure peek;
# writers should claim_version.


def next_version(spark: SparkSession, root: str) -> str:
    """The next unused version name (v1, v2, …) under ``root`` — a pure
    PEEK by listing; two concurrent callers can elect the same name.
    Writers use ``claim_version`` (the CAS form) instead."""
    vs = [
        int(s.getPath().getName()[1:])
        for s in hadoop_ls(spark, root, dirs_only=True)
        if s.getPath().getName().startswith("v")
        and s.getPath().getName()[1:].isdigit()
    ]
    return f"v{max(vs) + 1 if vs else 1}"


def _atomic_create(spark: SparkSession, path: str, body: bytes = b"") -> bool:
    """Create ``path`` if and only if it does not already exist,
    atomically; True when THIS caller created it. HDFS/S3A-style
    filesystems: ``FileSystem.create(overwrite=false)`` is an atomic
    create-if-absent. file://: Hadoop's local FS implements that as a
    RACY exists-then-create, so route through
    ``java.io.File.createNewFile`` (O_CREAT|O_EXCL — truly atomic).

    ``body`` is written INSIDE the claim (on file:// via a
    truncate-in-place ``FileOutputStream`` on the file we just
    created; on hdfs-style through the creating stream itself) — a
    caller that claimed and then re-created the path with
    ``create(overwrite=true)`` to write content would depend on the
    filesystem's overwrite being truncate-in-place rather than
    delete+create, and a delete+create overwrite would open a window
    where the path is absent and a second claimer wins too."""
    jvm, fs = fs_of(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path)
    scheme = fs.getUri().getScheme()
    if scheme in (None, "file"):
        f = jvm.java.io.File(p.toUri().getPath())
        parent = f.getParentFile()
        if parent is not None:
            parent.mkdirs()
        if not f.createNewFile():
            return False
        if body:
            out = jvm.java.io.FileOutputStream(f)  # truncate-in-place
            out.write(bytearray(body))
            out.close()
        return True
    try:
        out = fs.create(p, False)
        if body:
            out.write(bytearray(body))
        out.close()
        return True
    except Exception:
        return False


def claim_version(spark: SparkSession, root: str) -> str:
    """Atomically CLAIM the next unused version name: elect by listing,
    then CAS-create ``v<N>/_CLAIMED``; a lost race re-elects (the
    winner's directory now shows up in the listing). Concurrent
    publishers therefore write disjoint version directories — the
    election half of the old single-writer contract, enforced. A
    claimed-but-never-committed directory is invisible to readers
    (resolve/committed_versions key on _COMMITTED) and is swept by
    prune."""
    for _ in range(1000):
        name = next_version(spark, root)
        if _atomic_create(spark, f"{root}/{name}/_CLAIMED"):
            return name
    raise IOError(f"could not claim a version name under {root}")


def _read_small(spark: SparkSession, path: str) -> str | None:
    """Tiny-file read through the scheme-aware FS; None when absent or
    unreadable (e.g. deleted between exists and open)."""
    jvm, fs = fs_of(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(path)
    try:
        stream = fs.open(p)
        try:
            return bytes(stream.readAllBytes()).decode()
        finally:
            stream.close()
    except Exception:
        return None


# a break guard older than this belongs to a dead process: the guarded
# section is stat+rename+delete (microseconds), never a held lock
_BREAK_GUARD_STALE_SEC = 10.0


def acquire_publish_lock(
    spark: SparkSession,
    root: str,
    timeout_sec: float = 60.0,
    stale_sec: float = 600.0,
) -> str:
    """Take ``root``'s publisher lock (atomic create-if-absent of
    _PUBLISH_LOCK) and return this holder's OWNER TOKEN. A lock older
    than ``stale_sec`` is presumed to belong to a crashed holder and is
    broken; waiting past ``timeout_sec`` raises rather than deadlocking
    a maintenance job.

    Stale-break safety (two waiters observing the same stale lock must
    not cascade into deleting each other's FRESH locks): the break is a
    RENAME to a unique tombstone, not a delete — rename is atomic, so
    of N racing breakers exactly one moves the stale file. The
    stat→rename window itself is serialized behind a BREAK GUARD
    (atomic create of _PUBLISH_LOCK.breaker): without it, a breaker
    preempted between its stale re-stat and its rename can rename a
    FRESH lock that another waiter broke-and-reclaimed in the gap —
    check-then-act with an unbounded preemption window (observed under
    a loaded machine). Inside the guard, the re-stat-then-rename is
    preemption-safe because no other breaker may act until the guard
    is released; claims (atomic create-if-absent) never harm a live
    lock, so they stay outside the guard. A crashed breaker's guard is
    aged out after ``_BREAK_GUARD_STALE_SEC`` (the guarded section is
    microseconds — a stale guard means a dead process). The owner
    token is written INSIDE the atomic claim (no second create), and
    lets ``release_publish_lock`` delete ONLY its own lock — a
    >stale_sec holder whose lock was broken and replaced must not
    delete the usurper's."""
    import time as _time
    import uuid as _uuid

    jvm, fs = fs_of(spark, root)
    P = jvm.org.apache.hadoop.fs.Path
    lock = f"{root}/_PUBLISH_LOCK"
    guard = f"{root}/_PUBLISH_LOCK.breaker"
    token = _uuid.uuid4().hex
    deadline = _time.monotonic() + timeout_sec

    while not _atomic_create(spark, lock, body=token.encode()):
        if _time.monotonic() > deadline:  # checked EVERY iteration — the
            # stale-break/vanished branches must not starve it
            raise TimeoutError(
                f"publish lock at {lock} held longer than {timeout_sec}s"
            )
        try:
            st = fs.getFileStatus(P(lock))
            observed_mtime = st.getModificationTime()
            if _time.time() - observed_mtime / 1000.0 > stale_sec:
                if not _atomic_create(spark, guard):
                    # another breaker is mid-break; age out a crashed
                    # one, then re-loop (the next claim may already
                    # succeed against the broken lock)
                    try:
                        gst = fs.getFileStatus(P(guard))
                        if (
                            _time.time() - gst.getModificationTime() / 1000.0
                            > _BREAK_GUARD_STALE_SEC
                        ):
                            fs.delete(P(guard), False)
                    except Exception:
                        pass
                    _time.sleep(0.01)
                    continue
                try:
                    # guarded re-stat: only break if the lock is STILL
                    # the stale file first observed
                    st2 = fs.getFileStatus(P(lock))
                    if st2.getModificationTime() == observed_mtime:
                        tomb = P(
                            f"{root}/_PUBLISH_LOCK.tomb.{_uuid.uuid4().hex}"
                        )
                        if fs.rename(P(lock), tomb):
                            fs.delete(tomb, False)
                except Exception:
                    pass  # lock vanished mid-guard — nothing to break
                finally:
                    fs.delete(P(guard), False)
                continue
        except Exception:
            continue  # lock vanished between create and stat — retry now
        _time.sleep(0.05)
    return token


def release_publish_lock(
    spark: SparkSession, root: str, token: str | None = None
) -> None:
    """Release the publisher lock. With ``token`` (what
    ``acquire_publish_lock`` returned), the delete happens ONLY if the
    lock body still carries that token — a holder whose lock was
    stale-broken and replaced by another publisher leaves the usurper's
    fresh lock alone. ``token=None`` keeps the legacy unconditional
    delete for operator tooling that knows it is the only writer."""
    jvm, fs = fs_of(spark, root)
    lock = f"{root}/_PUBLISH_LOCK"
    if token is not None and _read_small(spark, lock) != token:
        return  # not ours any more (broken + re-acquired) — hands off
    fs.delete(jvm.org.apache.hadoop.fs.Path(lock), False)


def publish_version(spark: SparkSession, root: str, vname: str) -> None:
    """Make ``vname`` the served version: land its _COMMITTED marker,
    then swing the CURRENT pointer (tmp-write + rename). Readers that
    resolved the OLD version keep their directory — nothing under it is
    deleted — so an in-flight query completes against the artifact it
    opened (blue/green isolation, asserted by the suite). The swing is
    serialized behind the root's publisher lock: delete+rename is
    atomic per rename but not as a pair, and two unserialized swings
    could interleave into a missing or torn CURRENT."""
    token = acquire_publish_lock(spark, root)
    try:
        jvm, fs = fs_of(spark, root)
        P = jvm.org.apache.hadoop.fs.Path
        out = fs.create(P(f"{root}/{vname}/_COMMITTED"), True)
        out.close()
        tmp = P(f"{root}/CURRENT.tmp")
        o = fs.create(tmp, True)
        o.write(bytearray(vname.encode()))
        o.close()
        cur = P(f"{root}/CURRENT")
        fs.delete(cur, False)
        if not fs.rename(tmp, cur):
            raise IOError(f"could not publish {vname} at {root}")
    finally:
        release_publish_lock(spark, root, token)


def committed_versions(spark: SparkSession, root: str) -> list[int]:
    """Version numbers under ``root`` whose _COMMITTED marker landed —
    uncommitted directories (a crash mid-write) are invisible here."""
    jvm, fs = fs_of(spark, root)
    P = jvm.org.apache.hadoop.fs.Path
    return sorted(
        int(s.getPath().getName()[1:])
        for s in hadoop_ls(spark, root, dirs_only=True)
        if s.getPath().getName().startswith("v")
        and s.getPath().getName()[1:].isdigit()
        and fs.exists(P(f"{root}/{s.getPath().getName()}/_COMMITTED"))
    )


def resolve_version_dir(spark: SparkSession, root: str) -> str:
    """The directory actually serving: CURRENT's version if published;
    else CURRENT.tmp's (the fully-written intent record of a swing that
    crashed between pointer delete and rename — completing it, not
    undoing it, matters for ROLLBACK swings, where falling back to the
    highest committed version would silently re-serve the bad version
    being rolled away from); else the highest _COMMITTED version; else
    the root itself (a pre-versioning flat layout, still readable)."""
    jvm, fs = fs_of(spark, root)
    P = jvm.org.apache.hadoop.fs.Path

    def read_pointer(path) -> str | None:
        if not fs.exists(path):
            return None
        stream = fs.open(path)
        try:
            return bytes(stream.readAllBytes()).decode().strip()
        finally:
            stream.close()

    name = read_pointer(P(f"{root}/CURRENT"))
    if name:
        return f"{root}/{name}"
    # the tmp pointer is written complete BEFORE the old CURRENT is
    # deleted (publish_version), so whenever CURRENT is absent the tmp
    # names the intended version — honor it if that version committed
    tmp_name = read_pointer(P(f"{root}/CURRENT.tmp"))
    if tmp_name and fs.exists(P(f"{root}/{tmp_name}/_COMMITTED")):
        return f"{root}/{tmp_name}"
    committed = committed_versions(spark, root)
    if committed:
        return f"{root}/v{max(committed)}"
    return root


def rollback_version(spark: SparkSession, root: str) -> str:
    """Swing CURRENT back to the highest _COMMITTED version BELOW the
    one now serving — an O(1) pointer swap; no version's files move, so
    a reader that opened the rolled-back version finishes against it.
    Returns the version name now serving; raises when there is nothing
    earlier to roll back to."""
    serving = resolve_version_dir(spark, root).rsplit("/", 1)[-1]
    if not (serving.startswith("v") and serving[1:].isdigit()):
        raise ValueError(f"{root} has no versioned layout to roll back")
    cur_n = int(serving[1:])
    earlier = [n for n in committed_versions(spark, root) if n < cur_n]
    if not earlier:
        raise ValueError(f"{root}: {serving} is the oldest committed version")
    vname = f"v{max(earlier)}"
    publish_version(spark, root, vname)
    return vname


def prune_versions_report(
    spark: SparkSession, root: str, claim_grace_sec: float = 600.0
) -> tuple[int, list[str]]:
    """Delete every version directory except CURRENT's — run once old
    readers are drained. Returns ``(removed, spared)`` where ``spared``
    is the list of claimed-but-uncommitted version names the grace
    window protected: callers that sweep a SHARED data pool (the
    manifest snapshots' reachability prune) must also spare those
    publishers' freshly written data files, which only the in-flight
    manifest — not the kept one — will reference.

    ``claim_grace_sec``: with concurrent publishers (claim_version +
    the publish lock), a maintenance prune can race an IN-FLIGHT save —
    the save claimed its directory but hasn't committed yet. The grace
    makes prune skip uncommitted directories whose ``_CLAIMED`` marker
    is younger than the grace; older uncommitted claims are crash
    debris and are swept. Safe by DEFAULT (600 s — a generous save
    duration): sparing a live publisher must not depend on every prune
    caller remembering to opt in. Pass 0 for the aggressive
    single-writer sweep when the operator KNOWS no save is in flight
    (e.g. after confirming a publisher crashed)."""
    import time as _time

    jvm, fs = fs_of(spark, root)
    P = jvm.org.apache.hadoop.fs.Path
    keep = resolve_version_dir(spark, root).rsplit("/", 1)[-1]
    removed, spared = 0, []
    for s in hadoop_ls(spark, root, dirs_only=True):
        name = s.getPath().getName()
        if not (name.startswith("v") and name[1:].isdigit()) or name == keep:
            continue
        if claim_grace_sec > 0 and not fs.exists(
            P(f"{root}/{name}/_COMMITTED")
        ):
            try:
                st = fs.getFileStatus(P(f"{root}/{name}/_CLAIMED"))
                age = _time.time() - st.getModificationTime() / 1000.0
                if age < claim_grace_sec:
                    spared.append(name)  # in-flight publisher — spare it
                    continue
            except Exception:
                pass  # no claim marker: plain torn dir, sweep
        fs.delete(P(f"{root}/{name}"), True)
        removed += 1
    return removed, spared


def prune_versions(
    spark: SparkSession, root: str, claim_grace_sec: float = 600.0
) -> int:
    """``prune_versions_report`` returning just the removed count — for
    self-contained version layouts (each version dir holds its own
    files, e.g. the ANN index) where spared claims need no further
    protection."""
    removed, _spared = prune_versions_report(
        spark, root, claim_grace_sec=claim_grace_sec
    )
    return removed
