"""Advisory single-writer file locks with stale-lock expiry.

Shared by the LogStore per-session compaction lock and the VersionedTable
mutation lock. Both protocols are crash-safe *around* the lock (state
changes only at the CURRENT ``os.replace``; an interrupted writer commits
nothing), so the only job here is mutual exclusion plus not letting a
crashed writer wedge the resource forever.

Staleness is **age-based** (lock mtime older than ``stale_after``), not
pid-liveness: these locks can sit on a shared filesystem where a pid from
another host means nothing, and pid reuse makes a false "alive" verdict
possible on one host. A crashed writer's lock therefore expires after a
bounded wait instead of needing manual removal; a *live* long-running
writer must finish within ``stale_after`` (size it to the slowest expected
mutation — commits are cheap; the data write dominates). The takeover
window (two waiters both seeing a stale lock, both removing, one winning
``O_EXCL``) resolves to a single owner because acquisition is always
``O_CREAT | O_EXCL``; a waiter that loses the re-acquire race sees the
winner's *fresh* lock and raises. At real 100 TB multi-writer deployments
this moves into a catalog service (Hive/Glue/ZooKeeper-style) — the
file-lock form is the single-cluster stand-in with the same semantics.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager

#: default staleness horizon (seconds). Generous: a partition-granular
#: upsert's data write at target scale; crashed-writer recovery latency.
DEFAULT_STALE_AFTER = 1800.0


def _takeover_if_stale(lock: str, stale_after: float) -> bool:
    """True if a stale lock was removed (caller may retry O_EXCL)."""
    try:
        age = time.time() - os.stat(lock).st_mtime
    except FileNotFoundError:
        return True  # holder released between our O_EXCL failure and here
    if age <= stale_after:
        return False
    try:
        os.remove(lock)
    except FileNotFoundError:
        pass  # another waiter swept it first; both retry, one wins O_EXCL
    return True


@contextmanager
def file_lock(lock: str, err_msg: str, stale_after: float = DEFAULT_STALE_AFTER):
    """Hold ``lock`` (O_EXCL create) for the duration of the block.

    Raises RuntimeError(err_msg) when a *fresh* lock is held elsewhere;
    silently takes over a lock older than ``stale_after`` seconds.
    """
    acquired = False
    for _ in range(2):  # initial attempt + one retry after stale takeover
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(
                fd,
                json.dumps({"pid": os.getpid(), "acquired_at": time.time()}).encode(),
            )
            os.close(fd)
            acquired = True
            break
        except FileExistsError:
            if not _takeover_if_stale(lock, stale_after):
                raise RuntimeError(err_msg) from None
    if not acquired:  # lost the post-takeover race to a concurrent waiter
        raise RuntimeError(err_msg)
    try:
        yield
    finally:
        try:
            os.remove(lock)
        except OSError:
            pass
