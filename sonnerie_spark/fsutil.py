"""Durability helpers shared by the commit path, the dedup ledgers and
the sketch stores.

Rename-based publication (write under a tmp name, ``os.rename`` to the
visible name) is atomic against CONCURRENT READERS and safe under a
process kill, but not by itself durable under power loss: the data
blocks, the tmp files' directory entries, and the rename itself are all
in the page cache until the kernel flushes them, and the disk may make
the rename durable BEFORE the data it publishes. The reference pays for
the stronger contract explicitly — create_tx.rs:210-264 ``commit()``
flushes and ``sync_all``s the transaction file before the rename — so
the Spark engine does the same: fsync the tree being published, rename,
then fsync the parent directory that now holds the new entry.

These run on the driver against a local/POSIX mount. On object stores
(S3 et al.) Spark's committers provide the durability contract instead
and these paths aren't used.
"""

from __future__ import annotations

import os


def fsync_file(path: str) -> None:
    """fsync one file by path."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def fsync_dir(path: str) -> None:
    """fsync a directory — makes its entries (creates/renames) durable.
    POSIX allows opening a directory O_RDONLY for exactly this."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def fsync_tree(path: str) -> None:
    """fsync every file and directory under ``path``, files before
    their directories (bottom-up): fsyncing only one file inside the
    tree leaves the rest — and the rename that publishes it — at the
    filesystem's mercy."""
    for root, _dirs, files in os.walk(path, topdown=False):
        for f in files:
            fsync_file(os.path.join(root, f))
        fsync_dir(root)


def snapshot_files(root: str) -> set[str]:
    """The set of file paths currently under ``root`` — take BEFORE an
    append so :func:`fsync_new_files` can sync only what the append
    wrote. Listing-only (no reads); cost is O(files under root), which
    the callers keep bounded (compacted index layouts)."""
    if not os.path.isdir(root):
        return set()
    # normalized exactly like fsync_new_files' walk, so a trailing
    # slash or relative root can't make the before-set match nothing
    # (which would re-fsync the whole tree on every append)
    root = os.path.abspath(root)
    out: set[str] = set()
    for r, _dirs, files in os.walk(root):
        for f in files:
            out.add(os.path.join(r, f))
    return out


def fsync_new_files(root: str, before: set[str]) -> None:
    """fsync every file under ``root`` that is not in ``before``, then
    the directories holding them and their ancestors up to ``root``
    (a new file in a NEW subdirectory needs the parent's entry for
    that subdirectory made durable too)."""
    if not os.path.isdir(root):
        return
    root = os.path.abspath(root)
    dirty: set[str] = set()
    for r, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(r, f)
            if p not in before:
                fsync_file(p)
                dirty.add(r)
    synced: set[str] = set()
    for d in dirty:
        cur = os.path.abspath(d)
        while cur not in synced and cur.startswith(root):
            fsync_dir(cur)
            synced.add(cur)
            if cur == root:
                break
            cur = os.path.dirname(cur)
