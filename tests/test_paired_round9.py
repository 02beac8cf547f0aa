"""Round-9 paired-maintenance hardening (round-8 VERDICT #3/#4/#5/#7 +
ADVICE):

- the pending-check + sequence bump + intent staging of every paired
  verb serialize under ONE intent-root lock, and a verb arriving while
  another's intent is unresolved raises PendingIntentError loudly — no
  silent second intent;
- a caller-supplied stamp must EXCEED the sequence's current value and
  advances it (a reused stamp could hide a half-landed upsert from the
  stamp audit);
- STREAMING ingest is paired: paired_streaming_append commits each
  micro-batch into both stores through the intent protocol — a staged
  crash between the two epoch commits converges on replay/resume, and
  stream==batch pair equality holds;
- repair_drift routes an out-of-band reconcile audit back through the
  paired verbs (upsert from source of truth, delete for gone ids);
- reconcile_stores audits a PINNED pair at its pinned generations.
"""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators import paired as pr
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.paired import (
    PendingIntentError,
    paired_commit_epoch,
    paired_delete,
    paired_streaming_append,
    paired_upsert,
    pending_intents,
    repair_drift,
    resume_paired,
)
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.postings_store import PostingsStore
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.pq_store import IVFPQStore
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.reconcile import (
    reconcile_stores,
    store_stamps,
)
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load


def _pair(spark, sf_dir, tmp_path, cap=60, held_mod=None):
    """Build a paired deployment over the shared id space; with
    ``held_mod``, hold out ids ≡ 0 (mod held_mod) from the builds so a
    test can stream them in afterwards."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < cap)
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < cap)
    ids = {r["doc_id"] for r in docs.select("doc_id").collect()} & {
        r["vec_id"] for r in emb.select("vec_id").collect()
    }
    docs = docs.filter(F.col("doc_id").isin(sorted(ids)))
    emb = emb.filter(F.col("vec_id").isin(sorted(ids)))
    if held_mod is not None:
        bdocs = docs.filter(F.col("doc_id") % held_mod != 0)
        bemb = emb.filter(F.col("vec_id") % held_mod != 0)
    else:
        bdocs, bemb = docs, emb
    ps = PostingsStore.build(
        spark, bdocs, "doc_id", "text", str(tmp_path / "p"), n_buckets=8
    )
    vs = IVFPQStore.build(spark, bemb, "vec_id", "embedding", str(tmp_path / "v"))
    return docs, emb, ps, vs


def _mut(docs, emb):
    mdocs = docs.filter(F.col("doc_id") % 5 == 2).withColumn(
        "text", F.concat(F.lit("edited copy "), F.col("text"))
    )
    mvecs = emb.filter(F.col("vec_id") % 5 == 2).withColumn(
        "embedding", F.reverse(F.col("embedding"))
    )
    return mdocs, mvecs


# ---------------------------------------------------------------------------
# VERDICT #5/#7: serialized check+stage, explicit-stamp validation
# ---------------------------------------------------------------------------


def test_explicit_stamp_must_exceed_sequence(spark, sf_dir, tmp_path):
    docs, emb, ps, vs = _pair(spark, sf_dir, tmp_path)
    mdocs, mvecs = _mut(docs, emb)
    s1 = paired_upsert(ps, vs, mdocs, mvecs)  # sequence -> 1
    assert s1 == 1
    with pytest.raises(ValueError, match="at-or-below"):
        paired_upsert(ps, vs, mdocs, mvecs, stamp=1)  # reuse refused
    with pytest.raises(ValueError, match="at-or-below"):
        paired_upsert(ps, vs, mdocs, mvecs, stamp=0)
    assert pending_intents(ps) == []  # refusals staged nothing
    s2 = paired_upsert(ps, vs, mdocs, mvecs, stamp=10)  # valid: advances
    assert s2 == 10
    s3 = paired_delete(
        ps, vs, docs.filter(F.col("doc_id") % 9 == 1).select("doc_id")
    )
    assert s3 == 11  # auto-stamp continues past the explicit one
    assert reconcile_stores(ps, vs).count() == 0


def test_concurrent_verb_mid_apply_raises_no_second_intent(
    spark, sf_dir, tmp_path
):
    """The round-8 VERDICT #5 race, staged deterministically: verb B
    arrives while verb A's intent is committed but A is still applying
    its legs. B must raise PendingIntentError and must NOT stage a
    second intent (the old check->stage gap allowed both to pass the
    check)."""
    docs, emb, ps, vs = _pair(spark, sf_dir, tmp_path)
    mdocs, mvecs = _mut(docs, emb)
    real = ps.upsert
    saw = {}

    def interposed(batch, stamp=0):
        with pytest.raises(PendingIntentError):
            paired_delete(ps, vs, docs.limit(1).select("doc_id"))
        saw["pending_during_apply"] = list(pending_intents(ps))
        return real(batch, stamp=stamp)

    ps.upsert = interposed
    s = paired_upsert(ps, vs, mdocs, mvecs)
    ps.upsert = real
    assert len(saw["pending_during_apply"]) == 1  # only A's intent ever
    assert pending_intents(ps) == []
    assert s == 1
    assert reconcile_stores(ps, vs).count() == 0


def test_two_thread_race_one_winner_loser_loud(spark, sf_dir, tmp_path):
    """Two paired verbs truly concurrently: the lock serializes the
    check+stage, so either both serialize cleanly (first finished before
    the second's check) or the loser raises PendingIntentError — never a
    silently stranded second intent."""
    docs, emb, ps, vs = _pair(spark, sf_dir, tmp_path)
    mdocs, mvecs = _mut(docs, emb)
    results = {}

    def run(name, slice_mod):
        try:
            md = mdocs.filter(F.col("doc_id") % 2 == slice_mod)
            mv = mvecs.filter(F.col("vec_id") % 2 == slice_mod)
            results[name] = ("ok", paired_upsert(ps, vs, md, mv))
        except (PendingIntentError, Exception) as e:  # noqa: BLE001
            results[name] = ("err", type(e).__name__)

    ts = [
        threading.Thread(target=run, args=(f"t{i}", i)) for i in range(2)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    oks = [v for v in results.values() if v[0] == "ok"]
    errs = [v for v in results.values() if v[0] == "err"]
    assert len(oks) >= 1
    assert all(e[1] in ("PendingIntentError", "ConcurrentWriteError") for e in errs)
    assert pending_intents(ps) == []  # nothing stranded silently
    assert reconcile_stores(ps, vs).count() == 0


# ---------------------------------------------------------------------------
# VERDICT #3: paired STREAMING ingest
# ---------------------------------------------------------------------------


def _stream_of(spark, frame, tmp_path, name):
    src = str(tmp_path / f"src_{name}")
    frame.write.mode("overwrite").parquet(src)
    return spark.readStream.schema(frame.schema).parquet(src)


def _joined(docs, emb):
    return docs.join(
        emb.select(F.col("vec_id"), F.col("embedding")),
        docs["doc_id"] == F.col("vec_id"),
    )


def test_paired_streaming_equals_batch_pair(spark, sf_dir, tmp_path):
    """Stream the held-out slice into both stores through the paired
    epoch sink; the final pair must equal the one-shot build over the
    full corpus (ids AND stamps), and reconcile must be empty."""
    docs, emb, ps, vs = _pair(spark, sf_dir, tmp_path, held_mod=3)
    held_docs = docs.filter(F.col("doc_id") % 3 == 0)
    held_emb = emb.filter(F.col("vec_id") % 3 == 0)
    stream = _stream_of(
        spark, _joined(held_docs, held_emb), tmp_path, "pairstream"
    )
    q = paired_streaming_append(ps, vs, stream, str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert pending_intents(ps) == []
    assert reconcile_stores(ps, vs).count() == 0
    got_ids = {r["doc_id"] for r in ps.doclen_reader().select("doc_id").collect()}
    assert got_ids == {r["doc_id"] for r in docs.select("doc_id").collect()}
    got_vids = {r["vid"] for r in vs.reader().select("vid").collect()}
    assert got_vids == {r["vec_id"] for r in emb.select("vec_id").collect()}
    # streamed rows carry the ingest default stamp 0 on BOTH sides
    stamps = store_stamps(ps, vs).collect()
    assert all(r["p_stamp"] == 0 and r["v_stamp"] == 0 for r in stamps)


def test_crash_between_epoch_legs_converges_on_restart(
    spark, sf_dir, tmp_path
):
    """The round-8 streaming gap, staged deterministically: the vector
    store's epoch commit crashes after the postings epoch landed. The
    epoch's intent survives; restarting the SAME stream replays the
    epoch, finds the matching intent, re-applies only the missing leg,
    and the pair converges — reconcile empty, no pending intents."""
    docs, emb, ps, vs = _pair(spark, sf_dir, tmp_path, held_mod=3)
    held = _joined(
        docs.filter(F.col("doc_id") % 3 == 0),
        emb.filter(F.col("vec_id") % 3 == 0),
    )
    ckpt = str(tmp_path / "ckpt_crash")

    real = vs._commit_epoch

    def crashing(batch, epoch_id, lineage=None):
        raise RuntimeError("staged crash between epoch legs")

    vs._commit_epoch = crashing
    stream = _stream_of(spark, held, tmp_path, "crashstream")
    q = paired_streaming_append(ps, vs, stream, ckpt)
    with pytest.raises(Exception, match="staged crash|StreamingQuery"):
        q.awaitTermination()
    vs._commit_epoch = real
    # half-landed epoch: intent pending, postings ahead of vectors
    assert len(pending_intents(ps)) == 1
    # new paired BATCH verbs refuse while the epoch intent is unresolved
    with pytest.raises(PendingIntentError):
        paired_delete(ps, vs, docs.limit(1).select("doc_id"))
    # restart the SAME checkpoint: the replayed epoch resumes its intent
    stream2 = _stream_of(spark, held, tmp_path, "crashstream")
    q2 = paired_streaming_append(ps, vs, stream2, ckpt)
    q2.awaitTermination()
    assert pending_intents(ps) == []
    assert reconcile_stores(ps, vs).count() == 0
    got_ids = {r["doc_id"] for r in ps.doclen_reader().select("doc_id").collect()}
    assert got_ids == {r["doc_id"] for r in docs.select("doc_id").collect()}


def test_crash_converges_via_resume_without_restart(spark, sf_dir, tmp_path):
    """If the stream never restarts, resume_paired repairs the
    half-landed epoch from the staged payload."""
    docs, emb, ps, vs = _pair(spark, sf_dir, tmp_path, held_mod=3)
    held = _joined(
        docs.filter(F.col("doc_id") % 3 == 0),
        emb.filter(F.col("vec_id") % 3 == 0),
    )
    real = vs._commit_epoch
    vs._commit_epoch = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("epoch crash")
    )
    with pytest.raises(RuntimeError, match="epoch crash"):
        paired_commit_epoch(ps, vs, held, 0, lineage="lin-A")
    vs._commit_epoch = real
    rep = resume_paired(ps, vs)
    assert [r["op"] for r in rep] == ["epoch"]
    assert [r["legs_replayed"] for r in rep] == [["vectors"]]
    assert reconcile_stores(ps, vs).count() == 0


def test_fully_committed_epoch_replay_is_noop(spark, sf_dir, tmp_path):
    docs, emb, ps, vs = _pair(spark, sf_dir, tmp_path, held_mod=3)
    held = _joined(
        docs.filter(F.col("doc_id") % 3 == 0),
        emb.filter(F.col("vec_id") % 3 == 0),
    )
    assert paired_commit_epoch(ps, vs, held, 0, lineage="lin-A") is True
    before_p = sorted(tuple(r) for r in ps.doclen_reader().collect())
    # replay: both stores committed under the same lineage -> skip, no
    # restaging (the intent root holds only the seq file)
    assert paired_commit_epoch(ps, vs, held, 0, lineage="lin-A") is False
    root = os.path.join(ps.path, "_paired_intent")
    assert [n for n in os.listdir(root) if n.startswith("intent-")] == []
    assert sorted(tuple(r) for r in ps.doclen_reader().collect()) == before_p
    assert reconcile_stores(ps, vs).count() == 0


def test_foreign_lineage_epoch_raises(spark, sf_dir, tmp_path):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.genstore import (
        LineageMismatchError,
    )

    docs, emb, ps, vs = _pair(spark, sf_dir, tmp_path, held_mod=3)
    held = _joined(
        docs.filter(F.col("doc_id") % 3 == 0),
        emb.filter(F.col("vec_id") % 3 == 0),
    )
    paired_commit_epoch(ps, vs, held, 0, lineage="lin-A")
    with pytest.raises(LineageMismatchError):
        paired_commit_epoch(ps, vs, held, 0, lineage="lin-B")
    # the refused foreign intent is left for resume (loud, not lossy);
    # resume re-raises the lineage mismatch rather than absorbing it
    with pytest.raises(LineageMismatchError):
        resume_paired(ps, vs)


# ---------------------------------------------------------------------------
# VERDICT #4: repair_drift
# ---------------------------------------------------------------------------


def test_repair_drift_closes_planted_audit(spark, sf_dir, tmp_path):
    """q402's construction repaired in one call: a postings-only stamped
    upsert (stamp_mismatch), a postings-only delete (vectors_only), and
    a vector-only delete (postings_only) — repair_drift re-upserts every
    drifted id still in the source of truth and deletes the rest; the
    audit is empty afterwards and repaired docs carry one fresh stamp on
    BOTH sides."""
    docs, emb, ps, vs = _pair(spark, sf_dir, tmp_path)
    mdocs, _ = _mut(docs, emb)
    ps.upsert(mdocs, stamp=7)  # stamp drift (vector leg never ran)
    ps.delete(docs.filter(F.col("doc_id") % 7 == 3).select("doc_id"))
    vs.delete(emb.filter(F.col("vec_id") % 11 == 4).select("vec_id"))
    audit = reconcile_stores(ps, vs)
    assert audit.count() > 0
    rep = repair_drift(ps, vs, audit, docs, emb)
    assert rep["upserted"] > 0 and rep["deleted"] == 0  # truth keeps all
    assert reconcile_stores(ps, vs).count() == 0
    # every DRIFTED id is back on both sides; an id deleted from BOTH
    # stores is consistent absence — not drift — so the audit never saw
    # it and repair correctly leaves it out (corpus diffs against the
    # source of truth are a different verb than drift repair)
    got = {r["doc_id"] for r in ps.doclen_reader().select("doc_id").collect()}
    want = {
        r["doc_id"]
        for r in docs.select("doc_id").collect()
        if not (r["doc_id"] % 7 == 3 and r["doc_id"] % 11 == 4)
    }
    assert got == want


def test_repair_drift_deletes_ids_gone_from_truth(spark, sf_dir, tmp_path):
    """Drifted ids ABSENT from the source of truth are paired-deleted
    from both stores."""
    docs, emb, ps, vs = _pair(spark, sf_dir, tmp_path)
    victims = docs.filter(F.col("doc_id") % 7 == 3)
    vs.delete(victims.select(F.col("doc_id").alias("vec_id")))  # one-sided
    audit = reconcile_stores(ps, vs)
    assert {r["side"] for r in audit.collect()} == {"postings_only"}
    truth_docs = docs.join(victims.select("doc_id"), "doc_id", "left_anti")
    truth_vecs = emb.join(
        victims.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_anti"
    )
    rep = repair_drift(ps, vs, audit, truth_docs, truth_vecs)
    assert rep["deleted"] > 0 and rep["upserted"] == 0
    assert reconcile_stores(ps, vs).count() == 0
    assert (
        ps.doclen_reader().filter(F.col("doc_id") % 7 == 3).count() == 0
    )


def test_repair_refused_while_intent_pending(spark, sf_dir, tmp_path):
    docs, emb, ps, vs = _pair(spark, sf_dir, tmp_path)
    mdocs, mvecs = _mut(docs, emb)
    real = vs.upsert
    vs.upsert = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom"))
    with pytest.raises(RuntimeError):
        paired_upsert(ps, vs, mdocs, mvecs)
    vs.upsert = real
    audit = reconcile_stores(ps, vs)
    with pytest.raises(PendingIntentError):
        repair_drift(ps, vs, audit, docs, emb)
    resume_paired(ps, vs)
    assert reconcile_stores(ps, vs).count() == 0


# ---------------------------------------------------------------------------
# VERDICT #6: reconcile over pinned generations
# ---------------------------------------------------------------------------


def test_reconcile_pinned_pair_vs_live(spark, sf_dir, tmp_path):
    """A pinned-pair eval (q401's shape) is auditable at its pinned
    generations: after an out-of-band single-store mutation the LIVE
    audit shows the drift while the PINNED audit of the pre-mutation
    pair stays empty."""
    docs, emb, ps, vs = _pair(spark, sf_dir, tmp_path)
    g0p, g0v = ps.current_gen(), vs.current_gen()
    mdocs, _ = _mut(docs, emb)
    ps.upsert(mdocs, stamp=9)  # vector leg deliberately skipped
    live = reconcile_stores(ps, vs)
    assert {r["side"] for r in live.collect()} == {"stamp_mismatch"}
    pinned = reconcile_stores(ps, vs, p_gen=g0p, v_gen=g0v)
    assert pinned.count() == 0
    # mixed: pinned postings vs live vectors is also consistent here
    # (the vector store never mutated)
    assert reconcile_stores(ps, vs, p_gen=g0p).count() == 0


# ---------------------------------------------------------------------------
# round-8 ADVICE: multi-stamp rows inside one store don't cross-product
# ---------------------------------------------------------------------------


def test_uncompacted_epoch_duplicate_doc_no_spurious_mismatch(
    spark, sf_dir, tmp_path
):
    """A doc carried twice inside one store — base row stamp N plus an
    uncompacted streaming-epoch row stamp 0, on BOTH sides — must not
    cross-product into spurious stamp_mismatch rows: each side
    aggregates one stamp per doc (max) before the join."""
    docs, emb, ps, vs = _pair(spark, sf_dir, tmp_path)
    mdocs, mvecs = _mut(docs, emb)
    paired_upsert(ps, vs, mdocs, mvecs)  # stamp 1 on both sides
    # the same docs re-arrive via independent (unpaired) epoch commits
    # with the ingest-default stamp 0 on BOTH stores
    ps._commit_epoch(mdocs, 0, lineage=None)
    vs._commit_epoch(mvecs, 0, lineage=None)
    assert reconcile_stores(ps, vs).count() == 0
