"""Single-writer store lock (r10 verdict #6): mutual exclusion, loud
timeout naming the holder, dead-holder steal, and the store-level
contract — two concurrent appends to one store both commit (no lost
meta update) because each holds the lock for its whole operation."""

from __future__ import annotations

import os
import subprocess
import threading
import time

import numpy as np
import pytest

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.ivf_store import (
    IvfLayoutStore,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.store_lock import (
    LOCK_NAME,
    StoreLockHeld,
    store_write_lock,
)
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.streaming.heavy_hitters import (
    MgSummaryStore,
)

from tests.test_ivf_store import _blob_vectors, _centroids, _frame


def test_lock_is_released_on_exit_and_on_error(tmp_path):
    lock = tmp_path / LOCK_NAME
    with store_write_lock(str(tmp_path)):
        assert lock.exists()
        assert int(lock.read_text()) == os.getpid()
    assert not lock.exists()
    with pytest.raises(RuntimeError, match="boom"):
        with store_write_lock(str(tmp_path)):
            raise RuntimeError("boom")
    assert not lock.exists()


def test_contention_times_out_loudly_naming_holder(tmp_path):
    with store_write_lock(str(tmp_path)):
        # same-pid holder looks alive -> the contender must wait, then
        # raise naming the path and pid (locks are NOT reentrant: a
        # nested acquire from the holder is the same loud timeout)
        t0 = time.monotonic()
        with pytest.raises(StoreLockHeld, match=str(os.getpid())):
            with store_write_lock(str(tmp_path), timeout=0.3, poll=0.02):
                pass
        assert time.monotonic() - t0 >= 0.3


def test_dead_holder_lock_is_stolen(tmp_path):
    # a real process that has exited: its pid provably fails kill(pid,0)
    proc = subprocess.Popen(["true"])
    proc.wait()
    (tmp_path / LOCK_NAME).write_text(str(proc.pid))
    with store_write_lock(str(tmp_path), timeout=2.0):
        assert int((tmp_path / LOCK_NAME).read_text()) == os.getpid()
    assert not (tmp_path / LOCK_NAME).exists()


def test_writers_serialize_no_overlap(tmp_path):
    """Two threads through the lock never overlap their critical
    sections, and both complete (blocking acquire, not failure)."""
    active, max_active, done = [0], [0], []
    lk = threading.Lock()

    def writer(i):
        with store_write_lock(str(tmp_path), timeout=30.0, poll=0.01):
            with lk:
                active[0] += 1
                max_active[0] = max(max_active[0], active[0])
            time.sleep(0.15)
            with lk:
                active[0] -= 1
        done.append(i)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert max_active[0] == 1
    assert sorted(done) == [0, 1, 2]


def test_concurrent_ivf_appends_lose_nothing(spark, tmp_path):
    """The r10 advice scenario: a batch append racing a streaming
    append on one store. Pre-r11 the unlocked meta read-modify-write
    could drop one writer's ledger entry; now each append holds the
    store lock for its whole operation, so both ids commit and the
    vector count is exact."""
    rng = np.random.default_rng(97)
    store_path = str(tmp_path / "s")
    base = [r for b in range(4) for r in _blob_vectors(rng, b, 10, b * 1000)]
    IvfLayoutStore(spark, store_path).build(_frame(spark, base), _centroids(spark))

    d1 = _frame(spark, _blob_vectors(rng, 0, 7, 5000))
    d2 = _frame(spark, _blob_vectors(rng, 1, 9, 6000))
    errs = []

    def run(delta, bid):
        try:
            # each thread opens its own handle, like two writers would
            IvfLayoutStore(spark, store_path).append(delta, bid)
        except Exception as e:  # surfaced below — a thread must not die
            errs.append(e)

    t1 = threading.Thread(target=run, args=(d1, "race-a"))
    t2 = threading.Thread(target=run, args=(d2, "race-b"))
    t1.start(); t2.start()
    t1.join(); t2.join()
    assert not errs, errs

    store = IvfLayoutStore(spark, store_path)
    assert set(store.committed_batches()) == {"base", "race-a", "race-b"}
    assert store.drift()["n_vectors"] == len(base) + 7 + 9


def test_mg_merge_waits_for_external_holder(tmp_path):
    """merge_epoch blocks while another writer holds the lock, then
    completes — the single-writer contract is enforced, not assumed."""
    store = MgSummaryStore(str(tmp_path), k=3)
    release = threading.Event()
    entered = threading.Event()

    def hold():
        with store_write_lock(str(tmp_path)):
            entered.set()
            release.wait(5.0)

    holder = threading.Thread(target=hold)
    holder.start()
    assert entered.wait(5.0)

    merged = threading.Event()

    def merge():
        store.merge_epoch([("a", 1)], 1, "q-epoch-0")
        merged.set()

    merger = threading.Thread(target=merge)
    merger.start()
    assert not merged.wait(0.3), "merge ran while the lock was held"
    release.set()
    assert merged.wait(10.0)
    holder.join(); merger.join()
    assert store.total_weight() == 1

def test_lock_never_observable_empty(tmp_path):
    """r11 review: the pre-fix O_CREAT|O_EXCL-then-write acquisition
    could leave an EMPTY lock if the holder died between the calls —
    unstealable forever (holder parses to 0, the dead-pid check never
    fires). The link-based acquire makes the pid visible atomically
    WITH the lock: whenever the file exists, it parses to a live pid."""
    stop = threading.Event()
    lock = tmp_path / LOCK_NAME

    def cycler():
        for _ in range(300):
            with store_write_lock(str(tmp_path), poll=0.001):
                pass
        stop.set()

    t = threading.Thread(target=cycler)
    t.start()
    while not stop.is_set():
        try:
            content = lock.read_text()
        except OSError:
            continue  # between unlink and next link — absent is fine
        # present -> complete: pid already written when it became visible
        assert content == str(os.getpid()), f"observable lock: {content!r}"
    t.join()


def test_no_stray_tmp_files_after_exit_error_or_timeout(tmp_path):
    """The private pid temp file behind the link acquire must not
    accumulate across normal exits, error exits, or lost contention."""
    with store_write_lock(str(tmp_path)):
        pass
    with pytest.raises(RuntimeError, match="boom"):
        with store_write_lock(str(tmp_path)):
            raise RuntimeError("boom")
    with store_write_lock(str(tmp_path)):
        with pytest.raises(StoreLockHeld):
            with store_write_lock(str(tmp_path), timeout=0.2, poll=0.02):
                pass
    assert list(tmp_path.iterdir()) == []


def test_store_lock_timeout_is_plumbed(tmp_path):
    """r11 review (r10 verdict #3's sibling): the stores expose
    ``lock_timeout`` so a stream expected to queue behind a long
    compact()/rebuild() can size its wait — the 60 s hardwired default
    would kill the foreachBatch epoch in StoreLockHeld."""
    store = MgSummaryStore(str(tmp_path), k=3, lock_timeout=0.25)
    release = threading.Event()
    entered = threading.Event()

    def hold():
        with store_write_lock(str(tmp_path)):
            entered.set()
            release.wait(5.0)

    holder = threading.Thread(target=hold)
    holder.start()
    assert entered.wait(5.0)
    t0 = time.monotonic()
    with pytest.raises(StoreLockHeld):
        store.merge_epoch([("a", 1)], 1, "q-epoch-0")
    assert time.monotonic() - t0 < 5.0  # the caller's budget, not 60 s
    release.set()
    holder.join()


def test_dead_waiters_tmp_files_are_swept(tmp_path):
    """A contender hard-killed while WAITING leaks its private temp pid
    file (its cleanup never runs); the next acquisition sweeps temps
    whose embedded pid is dead — and leaves a LIVE waiter's alone."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators.store_lock import (
        _host_token,
    )

    host = _host_token()
    proc = subprocess.Popen(["true"])
    proc.wait()
    dead = tmp_path / f".{LOCK_NAME}.{proc.pid}.{host}.deadbeef"
    dead.write_text(str(proc.pid))
    live = tmp_path / f".{LOCK_NAME}.{os.getpid()}.{host}.cafebabe"
    live.write_text(str(os.getpid()))
    junk = tmp_path / f".{LOCK_NAME}.notapid.{host}.ffff"
    junk.write_text("junk")
    with store_write_lock(str(tmp_path)):
        pass
    assert not dead.exists()
    assert live.exists()   # live pid: not ours to sweep
    assert junk.exists()   # unparsable: left for a human
    live.unlink(); junk.unlink()
    assert list(tmp_path.iterdir()) == []


def test_foreign_host_waiters_are_age_gated_not_pid_checked(tmp_path):
    """r11 advice: on a shared (NFS) store, ``kill(pid, 0)`` judges a
    REMOTE waiter by a pid that means nothing here — unlinking its temp
    file crashes the live contender's next ``os.link`` with
    FileNotFoundError. Foreign host tokens (and legacy pre-token names,
    whose host is unknowable) must survive the sweep while fresh and
    fall only to the age threshold."""
    from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import (
        store_lock,
    )

    proc = subprocess.Popen(["true"])
    proc.wait()  # a pid that is LOCALLY dead — the misjudgement input
    old = time.time() - store_lock.FOREIGN_TMP_MAX_AGE - 60
    fresh_foreign = tmp_path / f".{LOCK_NAME}.{proc.pid}.00000000.aaaa"
    fresh_foreign.write_text(str(proc.pid))
    stale_foreign = tmp_path / f".{LOCK_NAME}.{proc.pid}.00000000.bbbb"
    stale_foreign.write_text(str(proc.pid))
    os.utime(stale_foreign, (old, old))
    fresh_legacy = tmp_path / f".{LOCK_NAME}.{proc.pid}.cccc"
    fresh_legacy.write_text(str(proc.pid))
    stale_legacy = tmp_path / f".{LOCK_NAME}.{proc.pid}.dddd"
    stale_legacy.write_text(str(proc.pid))
    os.utime(stale_legacy, (old, old))
    with store_write_lock(str(tmp_path)):
        pass
    assert fresh_foreign.exists()  # live remote waiter: NOT ours to judge
    assert fresh_legacy.exists()   # host unknowable: age-gated too
    assert not stale_foreign.exists()
    assert not stale_legacy.exists()
    fresh_foreign.unlink(); fresh_legacy.unlink()
    assert list(tmp_path.iterdir()) == []


def test_waiter_refreshes_tmp_mtime_while_polling(tmp_path):
    """r12 review: the foreign-host sweep is AGE-based, and a waiter
    legitimately queued longer than FOREIGN_TMP_MAX_AGE (maintenance
    behind a full-corpus compact) must not age into looking like an
    orphan — the wait loop refreshes the temp file's mtime each poll,
    so crossing the threshold genuinely means orphaned."""
    import glob

    (tmp_path / LOCK_NAME).write_text(str(os.getpid()))  # held by us
    mtimes: list[float] = []

    def waiter():
        try:
            with store_write_lock(str(tmp_path), timeout=0.9, poll=0.03):
                pass
        except StoreLockHeld:
            pass

    t = threading.Thread(target=waiter)
    t.start()
    deadline = time.monotonic() + 0.8
    while time.monotonic() < deadline:
        for f in glob.glob(str(tmp_path / f".{LOCK_NAME}.*")):
            try:
                mtimes.append(os.stat(f).st_mtime)
            except OSError:
                pass
        time.sleep(0.05)
    t.join()
    (tmp_path / LOCK_NAME).unlink()
    assert mtimes and max(mtimes) > min(mtimes)  # refreshed while waiting


def test_lost_link_reply_detected_by_nlink(tmp_path, monkeypatch):
    """NFS lost-reply shape: the link is APPLIED but the caller sees
    EEXIST. st_nlink==2 on the private temp proves ownership — without
    the check the writer polls its own pid to a timeout and leaks a
    live-pid lock every later writer waits on."""
    real_link = os.link
    calls = []

    def lossy_link(src, dst, **kw):
        real_link(src, dst, **kw)
        calls.append(dst)
        raise FileExistsError(dst)

    monkeypatch.setattr(os, "link", lossy_link)
    with store_write_lock(str(tmp_path), timeout=1.0):
        assert (tmp_path / LOCK_NAME).read_text() == str(os.getpid())
    assert not (tmp_path / LOCK_NAME).exists()
    assert len(calls) == 1  # acquired on the first (lost-reply) attempt


def test_no_hardlink_filesystem_falls_back(tmp_path, monkeypatch):
    """Mounts without hard links (some FUSE/SMB): os.link raises a
    non-EEXIST OSError; acquisition falls back to O_CREAT|O_EXCL
    instead of crashing every mutating store operation."""
    import errno

    def no_link(src, dst, **kw):
        raise OSError(errno.EPERM, "hard links not supported")

    monkeypatch.setattr(os, "link", no_link)
    with store_write_lock(str(tmp_path), timeout=1.0):
        assert (tmp_path / LOCK_NAME).read_text() == str(os.getpid())
    assert not (tmp_path / LOCK_NAME).exists()
    # mutual exclusion still enforced in fallback mode
    with store_write_lock(str(tmp_path), timeout=1.0):
        with pytest.raises(StoreLockHeld):
            with store_write_lock(str(tmp_path), timeout=0.2, poll=0.02):
                pass


def test_transient_link_errors_propagate_loudly(tmp_path, monkeypatch):
    """A transient NFS error (ESTALE/EIO) must NOT silently downgrade
    acquisition to the non-link shape — it propagates (r11 review)."""
    import errno

    def stale_link(src, dst, **kw):
        raise OSError(errno.ESTALE, "stale file handle")

    monkeypatch.setattr(os, "link", stale_link)
    with pytest.raises(OSError) as ei:
        with store_write_lock(str(tmp_path), timeout=1.0):
            pass
    assert ei.value.errno == errno.ESTALE
    # and nothing was left behind
    assert list(tmp_path.iterdir()) == []
