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
  the two) cannot be re-committed by the replay and double-count.
  Epoch ids are monotone within a checkpoint lineage (one lineage per
  store — the documented contract), which is what makes a single
  watermark sufficient.

This module owns the parts of that contract that must not drift between
the two stores: pointer serialization, epoch naming/commit/listing, and
the fold bookkeeping. Generation DIRECTORY layout (one data dir vs a
postings+doclen pair, hardlink swaps) stays in each store.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable

EPOCH_ROOT = "eph"


def epoch_name(epoch_id: int) -> str:
    return f"ep-{int(epoch_id):010d}"


def epoch_id_of(name: str) -> int:
    return int(name.split("-", 1)[1])


def read_ptr(ptr_path: str, default_gen) -> dict:
    """``{"gen": <store-specific value>, "folded": [names],
    "watermark": int}``. Legacy pointers (plain string, or JSON without
    a watermark) parse with watermark -1 and nothing folded."""
    try:
        with open(ptr_path) as f:
            raw = f.read().strip()
    except OSError:
        return {"gen": default_gen, "folded": [], "watermark": -1}
    try:
        val = json.loads(raw)
        if isinstance(val, dict):
            return {
                "gen": val["gen"],
                "folded": list(val.get("folded", [])),
                "watermark": int(val.get("watermark", -1)),
            }
    except ValueError:
        pass
    return {"gen": raw, "folded": [], "watermark": -1}


def write_ptr(ptr_path: str, gen, folded: list[str], watermark: int) -> None:
    """One atomic pointer replace — the commit point."""
    tmp = ptr_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"gen": gen, "folded": sorted(set(folded)),
             "watermark": int(watermark)},
            f,
        )
    os.replace(tmp, ptr_path)


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


def commit_epoch(
    store_path: str,
    epoch_id: int,
    watermark: int,
    write_legs: Callable[[str], None],
) -> bool:
    """Exactly-once epoch commit: stage via ``write_legs(tmp_dir)`` and
    publish with one atomic directory rename. Returns False (a no-op)
    when the epoch is already committed OR already folded into a
    generation (id at-or-below the watermark) — the two ways a retried
    epoch can reappear."""
    if int(epoch_id) <= int(watermark):
        return False
    eroot = os.path.join(store_path, EPOCH_ROOT)
    os.makedirs(eroot, exist_ok=True)
    final = os.path.join(eroot, epoch_name(epoch_id))
    if os.path.isdir(final):
        return False
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    write_legs(tmp)
    os.rename(tmp, final)
    return True


def fold_bookkeeping(prev: dict, newly_folded: list[str]) -> tuple[list[str], int]:
    """(folded_all, new_watermark) for a publish that folds
    ``newly_folded``: the watermark advances to the largest folded epoch
    id so a post-sweep replay of any of them is refused."""
    folded_all = sorted(set(prev.get("folded", [])) | set(newly_folded))
    wm = int(prev.get("watermark", -1))
    for name in newly_folded:
        wm = max(wm, epoch_id_of(name))
    return folded_all, wm


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
