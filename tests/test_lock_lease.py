"""Lease-based mutation locks (round-11 verdict task 3): a holder that dies
on ANOTHER host — or crashes between the O_EXCL open and the pid write —
must not block mutations forever; a live holder (local or remote) must
never be swept, because its heartbeat keeps the lease fresh."""

import os
import subprocess
import threading
import time

import pytest

from feature_store_implementation_spark.store import offline as off


def _write_lock(lock, pid, host, age_s=0.0):
    with open(lock, "w") as lf:
        lf.write(f"{pid}\n{host}")
    if age_s:
        old = time.time() - age_s
        os.utime(lock, (old, old))


def test_expired_remote_lock_is_reclaimed(tmp_path):
    lock = str(tmp_path / "m.lock")
    proc = subprocess.Popen(["true"])
    proc.wait()
    _write_lock(lock, proc.pid, "some-other-host", age_s=off.LOCK_LEASE_TTL_S + 5)
    with off._pid_lock(lock, "test mutation"):
        pid, host = off._lock_holder(lock)
        assert (pid, host) == (os.getpid(), os.uname().nodename)
    assert not os.path.exists(lock)


def test_fresh_remote_lock_is_never_reclaimed(tmp_path):
    lock = str(tmp_path / "m.lock")
    _write_lock(lock, 999999, "some-other-host")  # mtime = now: lease fresh
    with pytest.raises(RuntimeError, match="in flight"):
        with off._pid_lock(lock, "test mutation"):
            pass
    assert os.path.exists(lock)  # untouched


def test_half_written_lock_ages_out(tmp_path):
    """A crash between O_EXCL open and the pid write leaves a lock parsing
    as (0, "") — no pid to probe, no host to trust. It never heartbeats,
    so the lease clock clears it."""
    lock = str(tmp_path / "m.lock")
    open(lock, "w").close()  # empty: parses as (0, "")
    with pytest.raises(RuntimeError, match="in flight"):  # young: stays
        with off._pid_lock(lock, "test mutation"):
            pass
    old = time.time() - off.LOCK_LEASE_TTL_S - 5
    os.utime(lock, (old, old))
    with off._pid_lock(lock, "test mutation"):
        pass
    assert not os.path.exists(lock)


def test_heartbeat_keeps_the_lease_fresh(tmp_path, monkeypatch):
    """While held, the heartbeat touches the lock mtime, so a slow holder's
    lease never expires mid-mutation. Beat interval shrunk for the test."""
    monkeypatch.setattr(off, "LOCK_HEARTBEAT_S", 0.05)
    lock = str(tmp_path / "m.lock")
    seen = []
    entered = threading.Event()
    release = threading.Event()

    def hold():
        with off._pid_lock(lock, "held mutation"):
            entered.set()
            release.wait(10)

    t = threading.Thread(target=hold, daemon=True)
    t.start()
    assert entered.wait(5)
    # backdate, then observe the heartbeat pull the mtime forward again
    old = time.time() - 3600
    os.utime(lock, (old, old))
    for _ in range(100):
        time.sleep(0.05)
        if os.stat(lock).st_mtime > old + 1:
            seen.append(True)
            break
    release.set()
    t.join(5)
    assert seen, "heartbeat never refreshed the lock mtime"
    assert not os.path.exists(lock)


def test_stuck_takeover_sidecar_ages_out(tmp_path):
    """The takeover sidecar's own writer can die holding it; it ages out
    on the same lease clock instead of wedging takeovers forever."""
    lock = str(tmp_path / "m.lock")
    sidecar = lock + ".takeover"
    proc = subprocess.Popen(["true"])
    proc.wait()
    _write_lock(lock, proc.pid, os.uname().nodename)  # dead LOCAL holder
    old = time.time() - off.LOCK_LEASE_TTL_S - 5
    open(sidecar, "w").close()
    os.utime(sidecar, (old, old))
    with off._pid_lock(lock, "test mutation"):
        pass
    assert not os.path.exists(sidecar)


def test_swept_holder_release_leaves_successor_lock_alone(tmp_path):
    """A holder whose lease was swept mid-mutation must NOT unlink the
    contender's lock on exit: the release re-checks the recorded holder
    and only removes its own lock (review r11)."""
    lock = str(tmp_path / "m.lock")
    with off._pid_lock(lock, "test mutation"):
        # simulate the lease sweep + a successor acquiring: replace the
        # lock with one recording a different (remote) holder
        os.remove(lock)
        _write_lock(lock, 4242, "other-host")
    # the original holder exited — the successor's lock must survive
    assert os.path.exists(lock)
    assert off._lock_holder(lock) == (4242, "other-host")
    os.remove(lock)


def test_release_removes_own_lock(tmp_path):
    lock = str(tmp_path / "m.lock")
    with off._pid_lock(lock, "test mutation"):
        assert os.path.exists(lock)
    assert not os.path.exists(lock)


def test_lock_contention_is_typed(tmp_path):
    """Contention raises LockContention (a RuntimeError subclass) so
    callers can degrade gracefully without swallowing real faults."""
    lock = str(tmp_path / "m.lock")
    _write_lock(lock, 999999, "some-other-host")
    with pytest.raises(off.LockContention):
        with off._pid_lock(lock, "test mutation"):
            pass


def test_blocking_lock_waits_out_a_short_holder(tmp_path):
    """_pid_lock_blocking (round-12 commit sequencing): a momentary live
    holder delays the acquirer instead of failing it."""
    lock = str(tmp_path / "m.lock")
    got = []

    def holder():
        with off._pid_lock(lock, "first"):
            time.sleep(0.4)

    t = threading.Thread(target=holder)
    t.start()
    time.sleep(0.1)  # ensure the holder owns the lock
    with off._pid_lock_blocking(lock, "second", timeout=10.0):
        got.append(off._lock_holder(lock))
    t.join()
    assert got and got[0] == (os.getpid(), os.uname().nodename)
    assert not os.path.exists(lock)


def test_blocking_lock_times_out_on_stuck_live_holder(tmp_path):
    lock = str(tmp_path / "m.lock")
    _write_lock(lock, 999999, "some-other-host")  # fresh lease, never yields
    t0 = time.monotonic()
    with pytest.raises(off.LockContention):
        with off._pid_lock_blocking(lock, "test mutation", timeout=0.3):
            pass
    assert time.monotonic() - t0 < 5.0
