"""Cross-store consistency audit for paired retrieval indexes.

A hybrid/RRF deployment keeps TWO indexes over the same document set —
the lexical postings store and the IVF-PQ vector store — and every
upsert/delete must land in both. Nothing enforces that atomically
across stores (they are independent directories with independent
pointers), so the operational safety net is a cheap RECONCILE audit:
anti-join the two id sets and surface every document present in exactly
one side. Run it after paired maintenance (q396's lifecycle) or on a
schedule; an empty result is the invariant.

Scale: the postings side reads only the doclen sidecar (2 columns, one
row per doc — never the postings), the vector side reads only the id
column of the codes (column-pruned), and the two anti-joins shuffle
id-only frames. Reference parity: the reference has a single Mongo
collection and no secondary index to drift from it
(/root/reference/etl_connector.py, SURVEY §0) — north-star territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reconcile_stores(postings_store, pq_store) -> DataFrame:
    """Doc ids present in exactly one of a paired (postings, IVF-PQ)
    deployment: ``(doc_id, side)`` with side ``"postings_only"`` /
    ``"vectors_only"``. Empty == the pair is consistent. Ids are
    compared as longs (both fixtures key by integer ids); a deployment
    with string keys casts before pairing."""
    docs = (
        postings_store.doclen_reader()
        .select(F.col("doc_id").cast("long").alias("doc_id"))
        .distinct()
    )
    vecs = (
        pq_store.reader()
        .select(F.col("vid").cast("long").alias("doc_id"))
        .distinct()
    )
    only_p = docs.join(vecs, "doc_id", "left_anti").select(
        "doc_id", F.lit("postings_only").alias("side")
    )
    only_v = vecs.join(docs, "doc_id", "left_anti").select(
        "doc_id", F.lit("vectors_only").alias("side")
    )
    return only_p.unionByName(only_v)
