"""Single-writer lock for the incremental stores (r10 verdict #6).

The three stores (``LshDedupIndex``, ``IvfLayoutStore``,
``MgSummaryStore``) commit through a read-modify-write of one meta
JSON. Within one driver the ``foreachBatch`` legs serialize epochs, but
a batch append racing a streaming append on the SAME store (two
sessions, or a maintenance job beside a live stream) could (a) lose a
ledger update — defeating the replay guard — and (b) worse: a
concurrent ``compact()``'s GC sweep would ``rmtree`` an in-flight
append's not-yet-committed batch dir, leaving the append's meta commit
pointing at a missing directory. So the lock is held for the WHOLE
mutating operation (dir writes included), not just the meta swap:
concurrent writers serialize; that IS the single-writer contract,
enforced instead of assumed.

Scope and staleness (the honest notes):

- The lock is a pid file beside the meta, made visible by ``os.link``
  of a fully-written private temp file — atomic on POSIX local
  filesystems and on NFS, and never observable empty (an ``O_CREAT|
  O_EXCL``-then-write shape would leave an unstealable empty lock if
  the holder dies between the two calls). A lost ``link`` reply (NFS:
  the server applied it, the client retry sees EEXIST) is detected by
  the classic ``st_nlink == 2`` check on the temp file, so a writer
  never times out on a lock it actually holds. Filesystems WITHOUT
  hard links (some FUSE/SMB mounts) fall back to the ``O_CREAT|
  O_EXCL``-then-write shape: mutual exclusion intact, at the cost of
  re-opening the empty-lock crash window on those mounts only.
- It is a SAME-HOST lock in its staleness handling: the holder's pid
  is written into the file, and a contender that finds the pid dead
  (``kill(pid, 0)`` -> ESRCH) steals the lock. Cross-host writers get
  mutual exclusion but a crashed remote holder looks alive forever —
  on a multi-host deployment, keep the documented single-writer
  contract (one driver owns a store) and treat a timeout as the signal
  to go look.
- Pid reuse can make a dead holder look alive; the timeout error names
  the lock path and pid so an operator can remove a provably stale
  lock by hand.
- A contender hard-killed while WAITING leaves its private temp pid
  file behind (its ``finally`` never ran); every acquisition sweeps
  SAME-HOST temp files whose embedded pid is dead (the name carries a
  host token — a pid is only checkable where it lives, and unlinking a
  live remote waiter's temp file would crash its next ``os.link`` with
  FileNotFoundError), plus foreign/legacy names past an age threshold,
  so crash-prone stores don't accumulate dot-files.
- The steal has a small race: between reading a dead pid and
  unlinking, a third writer may have stolen + re-locked, and the
  unlink would remove the NEW holder's file. The window is
  microseconds, requires a writer to have CRASHED first, and the
  consequence is two writers serialized by the meta's atomic
  ``os.replace`` — the dir-sweep hazard needs a compact racing an
  append in exactly that window. Accepted and documented rather than
  escalating to fcntl record locks (not atomic over NFS).
"""

from __future__ import annotations

import contextlib
import errno
import hashlib
import os
import socket
import time
import uuid

LOCK_NAME = "_write.lock"

# foreign-host temp files can't be liveness-checked (pids are per-host)
# — they are swept only past this age. Live waiters REFRESH their temp
# file's mtime every poll (see the wait loop), so crossing the
# threshold genuinely means orphaned even for waiters whose
# lock_timeout exceeds it (a maintenance job queued behind a
# full-corpus compact legitimately waits longer than any constant).
# Residual risk: a PRE-refresh (legacy) writer on another host waiting
# past this age could still be swept — documented, narrow, and bounded
# by one process generation of mixed versions.
FOREIGN_TMP_MAX_AGE = 3600.0


def _host_token() -> str:
    """Fixed-width host id for temp-file names: a hash, not the raw
    hostname, so dots/odd chars in hostnames can't break the dot-split
    name grammar."""
    return hashlib.sha1(socket.gethostname().encode()).hexdigest()[:8]


class StoreLockHeld(RuntimeError):
    """Another writer holds the store's write lock (and looks alive)."""


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def _sweep_dead_tmp_files(store_dir: str) -> None:
    """GC private temp pid files (``.{LOCK_NAME}.<pid>.<host>.<hex>``)
    left by contenders hard-killed while waiting — their cleanup never
    ran, and nothing else would ever remove them (r11 review).

    Liveness via ``kill(pid, 0)`` is a SAME-HOST judgement: on a shared
    (NFS) store, a waiter on another host whose pid happens to be dead
    locally is alive and mid-``os.link`` — unlinking its temp file
    turns its next retry into FileNotFoundError, crashing a live
    contender (r11 advice). So the pid check applies only to names
    carrying OUR host token; foreign or legacy (pre-token) names fall
    back to an age threshold no plausible wait outlives."""
    prefix = f".{LOCK_NAME}."
    host = _host_token()
    try:
        names = os.listdir(store_dir)
    except OSError:
        return
    now = time.time()
    for name in names:
        if not name.startswith(prefix):
            continue
        parts = name[len(prefix) :].split(".")
        try:
            pid = int(parts[0])
        except (IndexError, ValueError):
            continue
        if pid == os.getpid():
            continue
        path = os.path.join(store_dir, name)
        if len(parts) >= 3 and parts[1] == host:
            dead = not _pid_alive(pid)
        else:
            # another host's waiter, or a pre-token name whose host is
            # unknowable: sweep only on age. Live waiters REFRESH their
            # temp file's mtime every poll (see the wait loop), so
            # crossing the threshold genuinely means orphaned — do not
            # shorten FOREIGN_TMP_MAX_AGE on a "no wait lasts that
            # long" argument; the refresh, not the constant, is what
            # protects long-queued waiters (r12 review)
            try:
                dead = now - os.stat(path).st_mtime > FOREIGN_TMP_MAX_AGE
            except OSError:
                continue
        if dead:
            with contextlib.suppress(OSError):
                os.unlink(path)


@contextlib.contextmanager
def store_write_lock(
    store_dir: str, timeout: float = 60.0, poll: float = 0.05
):
    """Hold ``store_dir/_write.lock`` for the duration of one mutating
    store operation. Blocks up to ``timeout`` seconds waiting for a
    live holder, steals from a dead same-host holder, raises
    ``StoreLockHeld`` (naming path and pid) past the deadline."""
    lock_path = os.path.join(store_dir, LOCK_NAME)
    deadline = time.monotonic() + timeout
    _sweep_dead_tmp_files(store_dir)
    # the pid goes into a private temp file FIRST, then os.link makes it
    # the lock atomically (fails if one exists) — creating the lock with
    # O_CREAT|O_EXCL and writing the pid afterwards left a window where
    # a holder killed between the two calls leaves an EMPTY lock no
    # contender can ever steal (holder reads as 0, the dead-pid check
    # never fires, every writer blocks until a human deletes the file —
    # r11 review finding). link() is also the classic NFS-safe shape.
    tmp_path = os.path.join(
        store_dir,
        f".{LOCK_NAME}.{os.getpid()}.{_host_token()}.{uuid.uuid4().hex}",
    )
    with open(tmp_path, "w") as fh:
        fh.write(str(os.getpid()))
    link_works = True
    try:
        while True:
            acquired = False
            if link_works:
                try:
                    os.link(tmp_path, lock_path)
                    acquired = True
                except FileExistsError:
                    # NFS lost-reply: the server may have applied our
                    # link and dropped the response, so the client retry
                    # sees EEXIST for a lock we HOLD. st_nlink == 2 on
                    # the temp proves ownership (the classic recipe) —
                    # without it we'd poll our own pid to a timeout and
                    # leak a lock owned by a live process (r11 review).
                    try:
                        if os.stat(tmp_path).st_nlink == 2:
                            acquired = True
                    except OSError:
                        pass
                except OSError as exc:
                    # ONLY a provable no-hardlink-support errno selects
                    # the fallback: a transient NFS error (ESTALE, EIO)
                    # treated as "no links" would silently downgrade to
                    # O_CREAT|O_EXCL — not reliably atomic on old NFS
                    # clients, and it re-opens the empty-lock window —
                    # on exactly the mount the link recipe exists for
                    # (r11 review). Anything else propagates loudly.
                    if exc.errno not in (
                        errno.EPERM,
                        errno.EOPNOTSUPP,
                        errno.ENOTSUP,
                        errno.ENOSYS,
                    ):
                        raise
                    link_works = False
                    continue
            else:
                try:
                    fd = os.open(
                        lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                    )
                    try:
                        os.write(fd, str(os.getpid()).encode())
                    finally:
                        os.close(fd)
                    acquired = True
                except FileExistsError:
                    pass
            if acquired:
                break
            try:
                with open(lock_path) as fh:
                    holder = int(fh.read().strip() or "0")
            except (OSError, ValueError):
                holder = 0  # vanished or hand-made junk; re-poll
            if holder and holder != os.getpid() and not _pid_alive(holder):
                # dead same-host holder: steal (see module docstring
                # for the accepted read-then-unlink race window)
                with contextlib.suppress(OSError):
                    os.unlink(lock_path)
                continue
            if time.monotonic() >= deadline:
                raise StoreLockHeld(
                    f"store at {store_dir} is write-locked by pid "
                    f"{holder or '<unknown>'} ({lock_path}); waited "
                    f"{timeout:g}s — stores are single-writer, and a "
                    "provably stale lock can be removed by hand"
                ) from None
            time.sleep(poll)
            # refresh the temp file's mtime while waiting: the foreign-
            # host sweep is age-based (pids aren't checkable across
            # hosts), and a waiter sized to queue behind a long compact
            # (lock_timeout > FOREIGN_TMP_MAX_AGE is legitimate — see
            # dedup_index's sizing note) must not age into looking like
            # an orphan mid-wait (r12 review)
            with contextlib.suppress(OSError):
                os.utime(tmp_path, None)
    finally:
        with contextlib.suppress(OSError):
            os.unlink(tmp_path)
    try:
        yield
    finally:
        with contextlib.suppress(OSError):
            os.unlink(lock_path)
