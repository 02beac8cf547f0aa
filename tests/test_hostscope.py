"""Round-9 host-scoped liveness (round-8 VERDICT #2 / ADVICE): the
stale-lock auto-break and the lease sweep decide "crashed" with a
kill-0 probe that only means anything on the host that RECORDED the
pid. Lock and lease files now carry ``pid[/tid]@hostname``; a foreign
host's entry is never auto-broken or swept here (on shared storage a
live remote maintainer/reader would otherwise read as dead locally and
have its lock stolen / its pinned generation vacuumed mid-scan) —
recovery for a genuinely crashed remote holder is the timeout + manual
path. Same-host behavior is unchanged, including legacy files written
before hostnames were recorded (their documented scope was single-host).
"""

from __future__ import annotations

import os
import subprocess

import pytest

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators import genstore
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.genstore import (
    ConcurrentWriteError,
)

_FOREIGN = "some-other-host.example"


def _dead_pid() -> int:
    p = subprocess.Popen(["true"])
    p.wait()
    return p.pid


def test_foreign_host_lock_never_broken(tmp_path):
    """A dead-LOCALLY pid recorded by another host is not provably dead
    there — the lock stays and the waiter times out loudly instead of
    stealing a possibly-live remote maintainer's lock."""
    ptr = str(tmp_path / "ptr")
    lock = ptr + ".lock"
    with open(lock, "w") as f:
        f.write(f"{_dead_pid()}/1@{_FOREIGN}")
    assert genstore._break_stale_lock(lock) is False
    with pytest.raises(ConcurrentWriteError, match="another host"):
        with genstore.ptr_lock(ptr, timeout=0.3):
            pass
    assert os.path.exists(lock)  # untouched


def test_same_host_lock_with_hostname_breaks(tmp_path):
    """The new lock format (pid/tid@host) still auto-breaks when the
    recording host is THIS host and the pid is dead."""
    ptr = str(tmp_path / "ptr")
    lock = ptr + ".lock"
    with open(lock, "w") as f:
        f.write(f"{_dead_pid()}/1@{os.uname().nodename}")
    with genstore.ptr_lock(ptr, timeout=5.0):
        pass
    assert not os.path.exists(lock)


def test_lock_records_hostname(tmp_path):
    ptr = str(tmp_path / "ptr")
    with genstore.ptr_lock(ptr):
        with open(ptr + ".lock") as f:
            content = f.read()
        pid, host = genstore._parse_holder(content)
        assert pid == os.getpid()
        assert host == os.uname().nodename


def test_foreign_host_breaker_file_not_swept(tmp_path):
    """A crashed-breaker .break file from another host blocks local
    breaking (conservatively) instead of being swept by a local
    liveness probe."""
    ptr = str(tmp_path / "ptr")
    lock = ptr + ".lock"
    brk = lock + ".break"
    with open(lock, "w") as f:
        f.write(f"{_dead_pid()}/1")  # same-host stale (legacy format)
    with open(brk, "w") as f:
        f.write(f"{_dead_pid()}@{_FOREIGN}")
    assert genstore._break_stale_lock(lock) is False
    assert os.path.exists(brk)


def test_foreign_host_lease_counts_live_and_survives(tmp_path):
    """A lease recorded by another host always reads as live here —
    never swept, and its generation dirname stays protected."""
    d = os.path.join(str(tmp_path), genstore._LEASE_ROOT)
    os.makedirs(d)
    name = f"data-00000003.{_dead_pid()}-1-deadbeef"
    with open(os.path.join(d, name), "w") as f:
        f.write(f"{_dead_pid()}@{_FOREIGN}")
    assert genstore.leased_dirnames(str(tmp_path)) == {"data-00000003"}
    assert os.path.exists(os.path.join(d, name))  # not swept


def test_same_host_dead_lease_swept_new_format(tmp_path):
    d = os.path.join(str(tmp_path), genstore._LEASE_ROOT)
    os.makedirs(d)
    pid = _dead_pid()
    with open(os.path.join(d, f"data-00000004.{pid}-1-cafe0000"), "w") as f:
        f.write(f"{pid}@{os.uname().nodename}")
    assert genstore.leased_dirnames(str(tmp_path)) == set()
    assert os.listdir(d) == []


def test_lease_filename_carries_host_token(tmp_path):
    """Two hosts' readers with coinciding pid/tid must not overwrite
    each other's lease file — the filename embeds a host token."""
    with genstore.gen_lease(str(tmp_path), "data-00000009"):
        d = os.path.join(str(tmp_path), genstore._LEASE_ROOT)
        (name,) = os.listdir(d)
        holder = name.rpartition(".")[2]
        assert holder.count("-") == 2  # pid-tid-hosttoken
        with open(os.path.join(d, name)) as f:
            _, host = genstore._parse_holder(f.read())
        assert host == os.uname().nodename
