"""Cross-store consistency audit for paired retrieval indexes.

A hybrid/RRF deployment keeps TWO indexes over the same document set —
the lexical postings store and the IVF-PQ vector store — and every
upsert/delete must land in both. The crash-consistent path is
``operators/paired.py`` (intent-logged paired verbs with a resume
repair); this module is the operational safety net that DETECTS drift
however it arose:

- id drift: a document present in exactly one store (a one-sided
  delete, or an upsert whose insert leg only landed once);
- stamp drift (round 8): a document present in BOTH stores whose
  MUTATION STAMPS disagree — the half-landed paired upsert (same ids,
  one leg stale) that an id-only audit reconciles as "consistent".
  Paired maintenance writes its monotone sequence number to both
  stores' rows (``mstamp`` in the doclen sidecar and the codes leg);
  builds/appends/streaming epochs stamp 0 on both sides, so only a
  paired mutation that reached one store can produce a mismatch.

Run it after paired maintenance (q396's lifecycle) or on a schedule; an
empty result is the invariant.

Scale: the postings side reads only the doclen sidecar (doc_id + stamp,
one row per doc — never the postings), the vector side reads only the
id + stamp columns of the codes (column-pruned), and the audit is one
full-outer join of two id/stamp frames. Ids are compared as STRINGS —
lossless for both integer and string key spaces (round-7 ADVICE: a
long cast turns non-numeric keys into NULLs, which never match a join,
silently mislabeling every row as one-sided).

Reference parity: the reference has a single Mongo collection and no
secondary index to drift from it (/root/reference/etl_connector.py,
SURVEY §0) — north-star territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _id_stamp(df: DataFrame, id_col: str, stamp_alias: str) -> DataFrame:
    """(doc_id string, <stamp_alias> long) — stamp-less legacy legs read
    as stamp 0 (the build default)."""
    stamp = (
        F.col("mstamp").cast("long")
        if "mstamp" in df.columns
        else F.lit(0).cast("long")
    )
    return df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        stamp.alias(stamp_alias),
    ).distinct()


def reconcile_stores(postings_store, pq_store) -> DataFrame:
    """Audit a paired (postings, IVF-PQ) deployment: returns
    ``(doc_id, side)`` rows with side ``"postings_only"`` /
    ``"vectors_only"`` (id drift) / ``"stamp_mismatch"`` (both stores
    hold the doc but their mutation stamps disagree — a half-landed
    paired upsert). ``doc_id`` is rendered as a string (lossless for
    int and string key spaces). Empty == the pair is consistent."""
    docs = _id_stamp(postings_store.doclen_reader(), "doc_id", "p_stamp")
    vecs = _id_stamp(pq_store.reader(), "vid", "v_stamp")
    side = (
        F.when(F.col("v_stamp").isNull(), F.lit("postings_only"))
        .when(F.col("p_stamp").isNull(), F.lit("vectors_only"))
        .when(F.col("p_stamp") != F.col("v_stamp"), F.lit("stamp_mismatch"))
    )
    return (
        docs.join(vecs, "doc_id", "full_outer")
        .select("doc_id", side.alias("side"))
        .filter(F.col("side").isNotNull())
    )
