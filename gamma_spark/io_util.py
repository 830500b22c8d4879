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

import json
import os


def atomic_write_json(path: str, obj) -> None:
    """Serialize ``obj`` as JSON at ``path`` atomically.

    Writes to ``<path>.tmp`` in the same directory (same filesystem, so
    the final ``os.replace`` is a metadata-only atomic rename), fsyncs
    the temp file so the rename can't be reordered before the data
    blocks, then replaces. A crash at any point leaves either the old
    complete file or the new complete file (plus at worst a stale
    ``.tmp`` that the next write overwrites).
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
