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
mutation — commits are cheap; the data write dominates).

Two identity guarantees make the expiry protocol safe against the races
an unconditional ``os.remove`` would open:

* **Token-checked release.** Each acquisition writes a unique token into
  the lock file; the ``finally`` block re-reads the file and removes it
  only when the token matches. A writer that legitimately overran
  ``stale_after`` (its lock stolen by a waiter) therefore does NOT delete
  the new holder's lock on exit — it leaves it alone, preserving the
  single-writer guarantee for the successor.
* **Identity-conditional takeover.** A waiter never blind-removes a lock
  it judged stale: it atomically renames the path aside to a unique temp
  name and compares the renamed file's ``(st_ino, st_mtime_ns)`` against
  the earlier ``stat``. Match ⇒ it claimed exactly the stale lock it
  observed (only one waiter's rename can succeed; losers see ENOENT and
  retry ``O_EXCL``). Mismatch ⇒ a concurrent takeover already re-acquired
  between our ``stat`` and ``rename``; the displaced *fresh* lock is
  restored via ``os.link`` (atomic, non-clobbering) and the waiter backs
  off. mtime participates so filesystem inode reuse cannot fake a match.

At real 100 TB multi-writer deployments this moves into a catalog service
(Hive/Glue/ZooKeeper-style) — the file-lock form is the single-cluster
stand-in with the same semantics.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from contextlib import contextmanager

#: default staleness horizon (seconds). Generous: a partition-granular
#: upsert's data write at target scale; crashed-writer recovery latency.
DEFAULT_STALE_AFTER = 1800.0


def _takeover_if_stale(lock: str, stale_after: float) -> bool:
    """True if a stale lock was claimed and removed (caller may retry O_EXCL).

    Claiming is identity-conditional: the observed-stale path is renamed
    aside atomically, and the rename is honored only when the renamed
    file's (inode, mtime_ns) matches the pre-rename stat — otherwise we
    displaced a lock some concurrent takeover winner created *after* our
    stat, and we restore it (``os.link`` back; atomic, fails EEXIST rather
    than clobbering yet another newer lock).
    """
    try:
        st = os.stat(lock)
    except FileNotFoundError:
        return True  # holder released between our O_EXCL failure and here
    if time.time() - st.st_mtime <= stale_after:
        return False
    claim = f"{lock}.stale-{uuid.uuid4().hex}"
    try:
        os.rename(lock, claim)
    except FileNotFoundError:
        return True  # another waiter claimed it first; both retry, one wins O_EXCL
    got = os.stat(claim)
    if (got.st_ino, got.st_mtime_ns) == (st.st_ino, st.st_mtime_ns):
        os.remove(claim)  # exactly the stale lock we observed: expired
        return True
    # We displaced a FRESH lock created by a concurrent takeover winner.
    # Put it back without clobbering (link is atomic; EEXIST means an even
    # newer lock appeared — leave that one in place) and back off.
    try:
        os.link(claim, lock)
    except OSError:
        pass
    os.remove(claim)
    return False


@contextmanager
def file_lock(lock: str, err_msg: str, stale_after: float = DEFAULT_STALE_AFTER):
    """Hold ``lock`` (O_EXCL create) for the duration of the block.

    Raises RuntimeError(err_msg) when a *fresh* lock is held elsewhere;
    silently takes over a lock older than ``stale_after`` seconds. Release
    is ownership-checked: the lock file is removed only if it still holds
    this acquisition's token.
    """
    token = uuid.uuid4().hex
    acquired = False
    for _ in range(2):  # initial attempt + one retry after stale takeover
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(
                fd,
                json.dumps(
                    {"pid": os.getpid(), "acquired_at": time.time(), "token": token}
                ).encode(),
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
        # Remove only OUR lock: if we overran stale_after and a waiter took
        # over, the file now carries the successor's token — leave it.
        try:
            with open(lock, "r", encoding="utf-8") as fh:
                owner = json.load(fh).get("token")
        except (OSError, ValueError):
            owner = None
        if owner == token:
            try:
                os.remove(lock)
            except OSError:
                pass
