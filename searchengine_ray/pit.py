"""Point-in-time index snapshots — the Lucene open-``IndexReader`` / ES
``open_point_in_time`` API analog.

A Lucene reader pins the commit point it was opened on: deletes and
merges that happen afterwards are invisible to it, and the segment files
it references survive (incref'd) until the reader closes. This engine's
index mutations follow a write-new-then-rename convention throughout
(``delete.py`` appends NEW tombstone files; ``expunge_deletes`` /
``force_merge`` / ``maybe_merge`` stage fresh directories and rename
them over the old path), so committed data inodes are never modified in
place — which makes a PIT snapshot a pure METADATA operation: hardlink
every data file into a snapshot tree (zero bytes copied) and byte-copy
only the small ``*.json`` manifests (those ARE rewritten in place by the
merge policies). An engine opened on the snapshot path serves the frozen
view bitwise, at any later time, regardless of what has happened to the
live index since.

Scale shape: a snapshot costs O(#files) metadata ops and no data bytes
per node — Lucene's incref-the-segment-files design. On object storage
the same semantics come from pinning the manifest (object keys are
already immutable); hardlinks are the local-filesystem spelling of the
same idea. Closing a PIT removes only the snapshot tree's links; the
live index never notices.
"""

from __future__ import annotations

import itertools
import os
import shutil


_PIT_SEQ = itertools.count()


class PointInTime:
    """Handle to one snapshot. ``path`` serves like any index dir; use as
    a context manager or call :meth:`close` to release it."""

    def __init__(self, path: str, live_dir: str):
        self.path = path
        self.live_dir = live_dir
        self._open = True

    def close(self) -> None:
        if self._open:
            shutil.rmtree(self.path, ignore_errors=True)
            self._open = False

    def __enter__(self) -> "PointInTime":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def open_pit(
    index_dir: str, pit_root: str = "/tmp/se_ray_pits"
) -> PointInTime:
    """Snapshot ``index_dir`` into a fresh tree under ``pit_root``:
    hardlinks for data files (parquet/npy/...), byte-copies for ``*.json``
    (rewritten in place by merge policies). Raises if the index dir does
    not exist."""
    src_root = os.path.abspath(index_dir)
    if not os.path.isdir(src_root):
        raise ValueError(f"no index at {index_dir!r}")
    dst_root = os.path.join(
        pit_root, f"pit_{os.getpid()}_{next(_PIT_SEQ):06d}"
    )
    os.makedirs(dst_root)
    for base, dirs, files in os.walk(src_root):
        rel = os.path.relpath(base, src_root)
        out = dst_root if rel == "." else os.path.join(dst_root, rel)
        for d in dirs:
            os.makedirs(os.path.join(out, d), exist_ok=True)
        for f in files:
            s, t = os.path.join(base, f), os.path.join(out, f)
            if f.endswith(".json"):
                shutil.copy2(s, t)
            else:
                os.link(s, t)
    return PointInTime(dst_root, src_root)
