"""Stale shuffle-spill reaping in the session factory (session.py).

A SIGKILLed JVM never runs Spark's shutdown hook, so its local-dir
spill survives — fatal on the RAM-backed tmpfs default (observed: 84 GB
of orphaned spill from one OOM-killed ×100 bench run starved the whole
box). ``_local_dir`` keys the dir by (pid, process starttime) and reaps
dirs whose owner is gone — including pid-RECYCLED dirs, where the pid
exists but belongs to a younger process; these tests drive that logic
against a temp base.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

from warcsum_spark.session import (
    _STALE_DIR_MAX_AGE_SEC,
    _local_dir,
    _proc_starttime,
)


def _with_base(tmp_path, fn):
    old = os.environ.get("WARCSUM_LOCAL_DIR")
    os.environ["WARCSUM_LOCAL_DIR"] = str(tmp_path)
    try:
        return fn()
    finally:
        if old is None:
            del os.environ["WARCSUM_LOCAL_DIR"]
        else:
            os.environ["WARCSUM_LOCAL_DIR"] = old


def _my_dirname() -> str:
    st = _proc_starttime(os.getpid())
    suffix = f"-{st}" if st is not None else ""
    return f"pid-{os.getpid()}{suffix}"


def test_returns_per_pid_starttime_dir(tmp_path):
    got = _with_base(tmp_path, _local_dir)
    assert got == str(tmp_path / _my_dirname())
    # the starttime token must be present on Linux (this sandbox)
    if os.path.exists(f"/proc/{os.getpid()}/stat"):
        assert got.count("-") >= 2, "starttime token missing from dir name"


def test_reaps_dead_owners_keeps_live_and_foreign(tmp_path):
    # a dead pid: spawn a process that exits immediately
    p = subprocess.Popen([sys.executable, "-c", "pass"])
    p.wait()
    dead = tmp_path / f"pid-{p.pid}"
    dead.mkdir()
    (dead / "shuffle.data").write_bytes(b"x" * 64)
    mine = tmp_path / _my_dirname()
    mine.mkdir()
    (mine / "keep").write_text("live")
    other = tmp_path / "blockmgr-foreign"  # not pid-prefixed: untouched
    other.mkdir()

    _with_base(tmp_path, _local_dir)

    assert not dead.exists(), "dead owner's spill must be reaped"
    assert (mine / "keep").exists(), "own dir must survive"
    assert other.exists(), "non-pid dirs are not ours to delete"


def test_reaps_recycled_pid(tmp_path):
    """A dir whose recorded (pid, starttime) names a LIVE pid but a
    different starttime was orphaned by a crashed process whose pid the
    OS later recycled — the exact case os.kill(pid, 0) alone misses."""
    live = os.getppid() or 1  # a pid that exists and is not us
    st = _proc_starttime(live)
    if st is None:
        return  # no /proc on this platform; covered by age fallback
    recycled = tmp_path / f"pid-{live}-{st - 1}"
    recycled.mkdir()
    (recycled / "shuffle.data").write_bytes(b"x" * 64)
    current = tmp_path / f"pid-{live}-{st}"
    current.mkdir()
    (current / "keep").write_text("live")

    _with_base(tmp_path, _local_dir)

    assert not recycled.exists(), "recycled-pid orphan must be reaped"
    assert (current / "keep").exists(), "matching-starttime dir survives"


def test_legacy_dir_age_fallback(tmp_path):
    """Legacy ``pid-<pid>`` dirs (no starttime token) with a live pid
    can't prove ownership either way — reaped only past the age bound."""
    live = os.getppid() or 1
    old_dir = tmp_path / f"pid-{live}"
    old_dir.mkdir()
    (old_dir / "shuffle.data").write_bytes(b"x" * 64)
    stale_mtime = time.time() - _STALE_DIR_MAX_AGE_SEC - 60
    os.utime(old_dir, (stale_mtime, stale_mtime))

    fresh = tmp_path / f"pid-{live}x"  # int() fails → ignored, survives
    fresh.mkdir()

    _with_base(tmp_path, _local_dir)

    assert not old_dir.exists(), "over-age legacy dir with live pid reaped"
    assert fresh.exists()


def test_legacy_dir_live_and_fresh_survives(tmp_path):
    live = os.getppid() or 1
    legacy = tmp_path / f"pid-{live}"
    legacy.mkdir()

    _with_base(tmp_path, _local_dir)

    assert legacy.exists(), "fresh legacy dir with live pid must survive"


def test_missing_base_is_fine(tmp_path):
    got = _with_base(tmp_path / "nope", _local_dir)
    assert got.endswith(_my_dirname())
