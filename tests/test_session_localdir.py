"""Stale shuffle-spill reaping in the session factory (session.py).

A SIGKILLed JVM never runs Spark's shutdown hook, so its local-dir
spill survives — fatal on the RAM-backed tmpfs default (observed: 84 GB
of orphaned spill from one OOM-killed ×100 bench run starved the whole
box). ``_local_dir`` keys the dir by pid and reaps dirs whose owner is
gone; these tests drive that logic against a temp base.
"""

from __future__ import annotations

import os
import subprocess
import sys

from warcsum_spark.session import _local_dir


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


def test_returns_per_pid_dir(tmp_path):
    got = _with_base(tmp_path, _local_dir)
    assert got == str(tmp_path / f"pid-{os.getpid()}")


def test_reaps_dead_owners_keeps_live_and_foreign(tmp_path):
    # a dead pid: spawn a process that exits immediately
    p = subprocess.Popen([sys.executable, "-c", "pass"])
    p.wait()
    dead = tmp_path / f"pid-{p.pid}"
    dead.mkdir()
    (dead / "shuffle.data").write_bytes(b"x" * 64)
    mine = tmp_path / f"pid-{os.getpid()}"
    mine.mkdir()
    (mine / "keep").write_text("live")
    other = tmp_path / "blockmgr-foreign"  # not pid-prefixed: untouched
    other.mkdir()

    _with_base(tmp_path, _local_dir)

    assert not dead.exists(), "dead owner's spill must be reaped"
    assert (mine / "keep").exists(), "own dir must survive"
    assert other.exists(), "non-pid dirs are not ours to delete"


def test_missing_base_is_fine(tmp_path):
    got = _with_base(tmp_path / "nope", _local_dir)
    assert got.endswith(f"pid-{os.getpid()}")
