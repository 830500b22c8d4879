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
import json
import os


class ConcurrentWriterError(RuntimeError):
    """A second writer tried to enter a single-writer commit section."""


@contextlib.contextmanager
def writer_lock(dir_path: str, name: str = "writer.lock"):
    """``O_EXCL`` lockfile making the single-writer contracts
    self-enforcing (Bm25Index.append / EmbeddingNearDupIndex.append /
    BucketedDocStore commits): a second concurrent writer FAILS FAST
    with :class:`ConcurrentWriterError` instead of silently losing a
    ledger entry to a read-modify-write race.

    Crash recovery: the lock records the holder's pid; a lock whose
    pid is no longer alive ON THIS HOST is stale (the writer crashed
    between acquire and release) and is stolen. An unreadable/empty
    pid is treated as ALIVE (conservative — the acquire-to-write-pid
    window is microseconds, and wrongly stealing a live writer's lock
    is the one failure this helper exists to prevent). These sidecar
    stores are driver-local by contract (see ``_compact_parquet``), so
    pid liveness is a valid staleness oracle; a multi-host deployment
    over shared storage needs an external coordinator instead.
    """
    os.makedirs(dir_path, exist_ok=True)
    lock = os.path.join(dir_path, name)
    fd = None
    while fd is None:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            pid = 0
            try:
                with open(lock) as fh:
                    pid = int(fh.read().strip() or "-1")
            except (OSError, ValueError):
                pid = -1  # vanished or torn: conservative -> alive
            alive = True
            if pid > 0:
                try:
                    os.kill(pid, 0)
                except ProcessLookupError:
                    alive = False
                except PermissionError:
                    alive = True
            if alive:
                raise ConcurrentWriterError(
                    f"single-writer lock {lock} is held by pid {pid}; "
                    "concurrent appends to this store are not supported "
                    "— serialize writers or remove a stale lock from a "
                    "crashed one"
                )
            # holder is a dead local pid: steal and retry the O_EXCL
            with contextlib.suppress(FileNotFoundError):
                os.unlink(lock)
    try:
        os.write(fd, str(os.getpid()).encode())
        os.fsync(fd)
        os.close(fd)
        yield
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.unlink(lock)


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
