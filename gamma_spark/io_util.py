"""Crash-safe small-file IO helpers.

The reference gets sidecar durability from its dump.done ordering
(`search/gamma_engine.cc:1101-1146`): the marker is written only after
the payload is complete, so readers never observe a torn payload. The
in-place stores here (BucketedDocStore meta, Bm25Index /
EmbeddingNearDupIndex stats+ledger sidecars) rewrite their sidecar on
every commit, so the equivalent guarantee needs write-to-temp +
``os.replace``: POSIX rename is atomic within a filesystem, so a
reader (including the torn-swap recovery path that *keys on* meta.json,
table.py ``_recover_torn_swap``) sees either the whole old file or the
whole new file, never a truncated prefix.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import os


class ConcurrentWriterError(RuntimeError):
    """A second writer tried to enter a single-writer commit section."""


@contextlib.contextmanager
def writer_lock(dir_path: str, name: str = "writer.lock", block: bool = False):
    """``flock``-backed lockfile making the single-writer contracts
    self-enforcing (Bm25Index.append / EmbeddingNearDupIndex.append /
    BucketedDocStore commits): a second concurrent writer FAILS FAST
    with :class:`ConcurrentWriterError` instead of silently losing a
    ledger entry to a read-modify-write race. ``block=True`` WAITS for
    the holder instead (kernel wait queue, no polling) — the mode for
    callers that want to serialize appends rather than reject them.
    NOT re-entrant: each entry opens a fresh fd, and flock exclusion is
    per-open-file-description, so a nested ``block=True`` acquire in
    the same process deadlocks against itself (a nested ``block=False``
    acquire fails fast with :class:`ConcurrentWriterError`). Callers
    hold at most one lock per store, never nested.

    The exclusion is a kernel ``flock(LOCK_EX)``, not lockfile
    *existence*, so crash recovery is automatic: the kernel releases
    the lock when the holder dies, and the next writer acquires even
    though the stale file is still on disk. This replaces the earlier
    pid-file steal protocol, whose read-check-unlink sequence had a
    TOCTOU window where two waiters could both classify a dead
    holder's lock as stale and both end up inside the critical
    section (one unlinking the other's freshly won lock).

    Two classic flock pitfalls are closed explicitly:

    * open→flock vs unlink race: after winning the flock we verify
      the lock *path* still names the inode we locked (the previous
      holder may have unlinked it between our ``open`` and our
      ``flock``, and a third writer may have locked a fresh file at
      the same path). Inode mismatch → close and retry on the fresh
      file, so two writers can never hold locks on different inodes
      of the same path.
    * the pid written into the file is DIAGNOSTIC ONLY (for the error
      message); lock state never depends on file content, so there is
      no unreadable-pid ambiguity and nothing to steal.

    These sidecar stores are driver-local by contract (see
    ``_compact_parquet``), so a local-filesystem flock is a valid
    exclusion oracle; a multi-host deployment over shared storage
    needs an external coordinator instead.
    """
    os.makedirs(dir_path, exist_ok=True)
    lock = os.path.join(dir_path, name)
    fd = None
    flags = fcntl.LOCK_EX | (0 if block else fcntl.LOCK_NB)
    while fd is None:
        fd = os.open(lock, os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, flags)
        except OSError as exc:
            if not isinstance(exc, BlockingIOError):
                # ENOLCK/EINTR etc: close BEFORE propagating, or the fd
                # (and any partially won lock state) leaks for the life
                # of the process
                os.close(fd)
                raise
            try:
                with open(lock) as fh:
                    holder = fh.read().strip() or "?"
            except OSError:
                holder = "?"
            os.close(fd)
            raise ConcurrentWriterError(
                f"single-writer lock {lock} is held by pid {holder}; "
                "concurrent appends to this store are not supported — "
                "serialize writers (a crashed writer's lock releases "
                "automatically)"
            )
        try:
            same_inode = os.fstat(fd).st_ino == os.stat(lock).st_ino
        except FileNotFoundError:
            same_inode = False
        except OSError:
            # EACCES/ENOTDIR etc: close BEFORE propagating, or the won
            # flock leaks for the life of the process and every later
            # writer sees a phantom live holder
            os.close(fd)
            raise
        if not same_inode:
            os.close(fd)
            fd = None  # locked a just-unlinked inode: retry on the path
    try:
        os.ftruncate(fd, 0)
        os.write(fd, str(os.getpid()).encode())
        yield
    finally:
        # Unlink BEFORE releasing: a waiter that opened this inode in
        # the meantime fails the inode re-check above and retries on
        # the fresh path, so the unlink can't hand two writers locks
        # on different inodes.
        with contextlib.suppress(FileNotFoundError):
            os.unlink(lock)
        os.close(fd)


def atomic_write_json(path: str, obj) -> None:
    """Serialize ``obj`` as JSON at ``path`` atomically.

    Writes to ``<path>.tmp`` in the same directory (same filesystem, so
    the final ``os.replace`` is a metadata-only atomic rename), fsyncs
    the temp file so the rename can't be reordered before the data
    blocks, then replaces. A crash at any point leaves either the old
    complete file or the new complete file (plus at worst a stale
    ``.tmp`` that the next write overwrites).

    NOTE: the fixed ``.tmp`` name means two CONCURRENT writers of the
    same path can interleave tmp writes and cross-commit — this helper
    provides rename-atomicity only, not mutual exclusion. All callers
    are single-writer by contract, now enforced with
    :func:`writer_lock` around their commit sections.
    """
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)
    # fsync the PARENT DIRECTORY so the rename itself is durable before
    # anything that follows it: the swap protocol journals swap.json and
    # then renames bucket dirs — on power loss a persisted bucket rename
    # with an unpersisted journal rename would make recovery classify a
    # torn swap as "crashed before any rename" and discard the trash
    # holding the only copies of the old buckets
    try:
        dfd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        # directory fsync is best-effort on filesystems/platforms that
        # refuse it; rename-atomicity still holds
        pass


def read_json_or_none(path: str):
    """Load JSON from ``path``; ``None`` if missing or unparsable.

    Used by recovery paths that must classify a sidecar written by a
    *pre-atomic* build (or torn by a crash mid-write under the old
    protocol) without themselves crashing: an unparsable journal means
    "crashed before any rename was journaled durable" and is treated as
    no-op cleanup, never as a signal to roll documents back.
    """
    if not os.path.exists(path):
        return None
    try:
        with open(path) as fh:
            return json.load(fh)
    except (ValueError, OSError):
        return None
