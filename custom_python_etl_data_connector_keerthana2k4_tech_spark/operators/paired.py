"""Crash-consistent PAIRED maintenance for hybrid retrieval deployments.

A hybrid/RRF deployment keeps TWO indexes over the same document set —
the lexical postings store and the IVF-PQ vector store — and every
upsert/delete must land in BOTH. Each store's own verbs are individually
crash-safe (CAS generation flips, operators/genstore.py), but a pair of
independent publishes has no cross-store atomicity: a crash between the
postings leg and the vector leg leaves the pair silently drifted, and
when the drift is a half-landed UPSERT (same ids, one leg stale) even an
id-level audit reconciles it as consistent.

This module closes that window with an INTENT LOG (transactional
outbox):

1. ``paired_upsert`` / ``paired_delete`` STAGE the mutation payload
   (the docs/vectors/ids as parquet) plus an ``intent.json`` record in a
   temp directory and COMMIT the intent with one atomic rename — all
   BEFORE the first store publishes anything;
2. each leg applies through the store's own crash-safe verb and then
   writes a ``leg-*.done`` marker (fsynced);
3. only after BOTH legs land is the intent directory removed.

A crash anywhere leaves either (a) no committed intent (staging orphan —
nothing applied, swept on resume), or (b) a committed intent whose
unmarked legs ``resume_paired`` re-applies from the STAGED payload —
replaying a leg that published but crashed before its marker is
idempotent (same rows, same stamp ⇒ same store state). Convergence is
checkable with ``operators/reconcile.reconcile_stores``, which also
compares per-doc MUTATION STAMPS: both legs of a paired mutation write
the same monotone sequence number (``mstamp``) into their store's rows,
so a half-landed upsert that resume has not yet repaired surfaces as
``stamp_mismatch`` instead of hiding behind matching id sets.

Concurrency: paired verbs assume the stores' single-maintainer contract;
a pending intent makes new paired verbs fail loudly
(``PendingIntentError``) until ``resume_paired`` repairs it, and the
stamp sequence is serialized on the genstore pointer lock. Scale: the
staged payload is one parquet round-trip of the mutation batch (the
rows being upserted — never the corpus), and both legs reuse the
stores' touched-partition-only rewrites.

Reference parity: the reference upserts into a single Mongo collection
(/root/reference/etl_connector.py:167-191 ``upsert_to_mongo``) — one
store, nothing paired, no cross-store consistency to keep; this is
north-star extension territory (SURVEY §2.3).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.genstore import ptr_lock

_INTENT_ROOT = "_paired_intent"
_SEQ_FILE = "seq"
_INTENT_FILE = "intent.json"


class PendingIntentError(RuntimeError):
    """A paired verb found an unresolved intent from a crashed (or
    failed) earlier paired mutation — the pair may be drifted. Run
    ``resume_paired(ps, vs)`` to re-apply the missing leg(s) from the
    staged payload, then retry."""


def _fsync_dir(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _root(postings_store) -> str:
    """The intent log lives next to the POSTINGS store's pointer (the
    first leg) — one well-known place both the verbs and resume look."""
    return os.path.join(postings_store.path, _INTENT_ROOT)


def _next_stamp(root: str) -> int:
    """The monotone mutation-stamp sequence (serialized on the genstore
    pointer lock; written atomically so a crash never loses or repeats
    a stamp that an intent already recorded)."""
    os.makedirs(root, exist_ok=True)
    seq = os.path.join(root, _SEQ_FILE)
    with ptr_lock(seq):
        try:
            with open(seq) as f:
                cur = int(f.read().strip() or "0")
        except (OSError, ValueError):
            cur = 0
        nxt = cur + 1
        tmp = f"{seq}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(str(nxt))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, seq)
        _fsync_dir(root)
    return nxt


def pending_intents(postings_store) -> list[str]:
    """Committed-but-unresolved intent names (oldest first). Non-empty
    means a paired mutation crashed mid-flight — run ``resume_paired``."""
    root = _root(postings_store)
    if not os.path.isdir(root):
        return []
    return sorted(
        n
        for n in os.listdir(root)
        if n.startswith("intent-")
        and not n.endswith(".tmp")
        and os.path.isfile(os.path.join(root, n, _INTENT_FILE))
    )


def _stage(root: str, stamp: int, op: str, payloads: dict[str, DataFrame]) -> str:
    """Write the payload parquet(s) + intent record into a temp dir and
    commit the intent with ONE atomic rename: either the whole intent
    exists (payload included) or none of it does."""
    os.makedirs(root, exist_ok=True)
    name = f"intent-{int(stamp):010d}"
    final = os.path.join(root, name)
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    for leg_name, df in payloads.items():
        df.write.mode("overwrite").parquet(os.path.join(tmp, leg_name))
    with open(os.path.join(tmp, _INTENT_FILE), "w") as f:
        json.dump({"op": op, "stamp": int(stamp)}, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, final)
    _fsync_dir(root)
    return final


def _mark_done(intent_dir: str, leg: str) -> None:
    marker = os.path.join(intent_dir, f"leg-{leg}.done")
    with open(marker, "w") as f:
        f.write(str(os.getpid()))
        f.flush()
        os.fsync(f.fileno())
    _fsync_dir(intent_dir)


def _apply(ps, vs, intent_dir: str) -> list[str]:
    """Apply (or re-apply) an intent's missing legs from the STAGED
    payload; clear the intent only after both legs' markers exist.
    Returns the legs applied in this call."""
    spark = ps.spark
    with open(os.path.join(intent_dir, _INTENT_FILE)) as f:
        meta = json.load(f)
    stamp = int(meta["stamp"])
    if meta["op"] == "upsert":
        legs = [
            ("postings", lambda: ps.upsert(
                spark.read.parquet(os.path.join(intent_dir, "docs")),
                stamp=stamp,
            )),
            ("vectors", lambda: vs.upsert(
                spark.read.parquet(os.path.join(intent_dir, "vecs")),
                stamp=stamp,
            )),
        ]
    elif meta["op"] == "delete":
        ids = spark.read.parquet(os.path.join(intent_dir, "ids"))
        legs = [
            ("postings", lambda: ps.delete(ids)),
            ("vectors", lambda: vs.delete(ids)),
        ]
    else:  # pragma: no cover - guarded at stage time
        raise ValueError(f"unknown paired op {meta['op']!r}")
    applied = []
    for leg_name, fn in legs:
        if os.path.exists(os.path.join(intent_dir, f"leg-{leg_name}.done")):
            continue
        fn()
        _mark_done(intent_dir, leg_name)
        applied.append(leg_name)
    shutil.rmtree(intent_dir)
    return applied


def _check_clear(ps) -> str:
    root = _root(ps)
    pending = pending_intents(ps)
    if pending:
        raise PendingIntentError(
            f"{len(pending)} unresolved paired intent(s) {pending[:3]} under "
            f"{root} — a paired mutation crashed between legs; run "
            "resume_paired(ps, vs) to repair before new paired verbs"
        )
    return root


def paired_upsert(
    ps, vs, docs: DataFrame, vecs: DataFrame, stamp: int | None = None
) -> int:
    """Crash-consistently upsert the SAME document slice into both
    stores of a paired deployment: ``docs`` is the (id, text) frame for
    the postings store, ``vecs`` the (id, embedding) frame for the
    IVF-PQ store — same id set (the caller's contract; drift between
    the two frames is itself what ``reconcile_stores`` exists to
    catch). The payload is staged + the intent committed atomically
    BEFORE either store publishes; both legs write ``stamp`` (default:
    the next monotone sequence number) as the rows' mutation stamp.
    Returns the stamp. Raises ``PendingIntentError`` when an earlier
    paired mutation is unresolved."""
    root = _check_clear(ps)
    if stamp is None:
        stamp = _next_stamp(root)
    intent_dir = _stage(root, stamp, "upsert", {"docs": docs, "vecs": vecs})
    _apply(ps, vs, intent_dir)
    return int(stamp)


def paired_delete(ps, vs, ids: DataFrame) -> int:
    """Crash-consistently delete the same ids from both stores (``ids``
    is any one-column frame). Same intent-log protocol as
    ``paired_upsert``; returns the mutation stamp the intent recorded
    (deletes remove rows, so the stamp only names the intent)."""
    root = _check_clear(ps)
    stamp = _next_stamp(root)
    intent_dir = _stage(root, stamp, "delete", {"ids": ids.toDF("id")})
    _apply(ps, vs, intent_dir)
    return int(stamp)


def resume_paired(ps, vs) -> list[dict]:
    """Repair after a crash: sweep staging orphans (intents that never
    committed — nothing was applied), then re-apply every committed
    intent's missing leg(s) from its staged payload, oldest first.
    Returns one ``{"stamp", "op", "legs_replayed"}`` row per resolved
    intent; after it returns, ``reconcile_stores(ps, vs)`` is empty
    barring out-of-band drift."""
    root = _root(ps)
    if not os.path.isdir(root):
        return []
    for n in os.listdir(root):
        if n.endswith(".tmp"):
            shutil.rmtree(os.path.join(root, n), ignore_errors=True)
    out = []
    for name in pending_intents(ps):
        d = os.path.join(root, name)
        with open(os.path.join(d, _INTENT_FILE)) as f:
            meta = json.load(f)
        applied = _apply(ps, vs, d)
        out.append(
            {"stamp": int(meta["stamp"]), "op": meta["op"], "legs_replayed": applied}
        )
    return out
