"""Round-8 genstore hardening (round-7 ADVICE):

- stale pointer locks from CRASHED holders auto-break by pid liveness
  (a live holder's lock is never stolen; breakers serialize);
- the pointer commit rename is made durable with a parent-directory
  fsync (behavioral: pointer writes still atomic + correct);
- a locked re-check that RAISES inside commit_epoch sweeps its staged
  epoch tmp dir instead of orphaning it.
"""

from __future__ import annotations

import os
import subprocess

import pytest

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators import genstore
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.genstore import (
    ConcurrentWriteError,
    LineageMismatchError,
)


def _dead_pid() -> int:
    """A pid guaranteed dead: spawn-and-reap a trivial child."""
    p = subprocess.Popen(["true"])
    p.wait()
    return p.pid


def test_ptr_lock_auto_breaks_dead_holder(tmp_path):
    ptr = str(tmp_path / "ptr")
    lock = ptr + ".lock"
    with open(lock, "w") as f:
        f.write(f"{_dead_pid()}/12345")
    # would previously block the full timeout then raise; now acquires
    with genstore.ptr_lock(ptr, timeout=5.0):
        assert os.path.exists(lock)
    assert not os.path.exists(lock)


def test_ptr_lock_never_steals_live_holder(tmp_path):
    ptr = str(tmp_path / "ptr")
    lock = ptr + ".lock"
    with open(lock, "w") as f:
        f.write(f"{os.getpid()}/999")  # a live process (us) holds it
    with pytest.raises(ConcurrentWriteError):
        with genstore.ptr_lock(ptr, timeout=0.3):
            pass
    assert os.path.exists(lock)  # untouched
    os.unlink(lock)


def test_break_stale_lock_requires_unchanged_content(tmp_path):
    """A lock whose content changed between inspection and unlink (a new
    holder) is left alone — the breaker only removes the exact stale
    file it verified."""
    ptr = str(tmp_path / "ptr")
    lock = ptr + ".lock"
    with open(lock, "w") as f:
        f.write(f"{os.getpid()}/1")  # live → not breakable
    assert genstore._break_stale_lock(lock) is False
    with open(lock, "w") as f:
        f.write(f"{_dead_pid()}/1")  # dead → breakable
    assert genstore._break_stale_lock(lock) is True
    assert not os.path.exists(lock)


def test_crashed_breaker_break_file_is_swept(tmp_path):
    """A breaker that crashed mid-break leaves a .break file naming its
    (now dead) pid; the next waiter sweeps it and proceeds."""
    ptr = str(tmp_path / "ptr")
    lock = ptr + ".lock"
    dead = _dead_pid()
    with open(lock, "w") as f:
        f.write(f"{dead}/1")
    with open(lock + ".break", "w") as f:
        f.write(str(_dead_pid()))
    # first call sweeps the stale break file; a later call breaks the lock
    with genstore.ptr_lock(ptr, timeout=5.0):
        pass
    assert not os.path.exists(lock + ".break")


def test_commit_epoch_locked_recheck_raise_sweeps_tmp(tmp_path):
    """Stage a lineage flip BETWEEN commit_epoch's fast-path guard and
    its locked re-check (the write_legs callback mutates the pointer):
    the re-check raises LineageMismatchError AND the staged epoch tmp
    dir is swept, not orphaned (round-7 ADVICE)."""
    store = str(tmp_path / "store")
    os.makedirs(store)
    ptr = os.path.join(store, "_ptr")

    def write_legs(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, "leg"), "w") as f:
            f.write("x")
        # a foreign stream adopts the store while we stage
        genstore.cas_update(ptr, 0, lambda c: {**c, "lineage": "other"})

    with pytest.raises(LineageMismatchError):
        genstore.commit_epoch(store, ptr, 0, 0, write_legs, lineage="mine")
    eroot = os.path.join(store, genstore.EPOCH_ROOT)
    leftovers = [n for n in os.listdir(eroot)] if os.path.isdir(eroot) else []
    assert leftovers == [], leftovers
