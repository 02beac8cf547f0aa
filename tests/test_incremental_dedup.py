"""operators/dedup.incremental_near_dedup: append-only batch-by-batch
near-dedup pinned against full-corpus near_dedup and its containment
invariants.

Reference parity: the reference's idempotent upsert dedups by EXACT key
one record at a time (/root/reference/etl_connector.py:167-191); this is
the north-star near-duplicate generalization of the same
admit-if-not-seen contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.dedup import (
    incremental_near_dedup,
    jaccard_pairs,
    near_dedup,
)

THRESH = 0.8


def _docs(spark):
    base = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
        (3, "alpha beta gamma delta epsilon eta"),  # near-dup of 1
        (4, "completely different words entirely here now"),
        (5, "unrelated content about some other topic"),
        (6, "completely different words entirely here today"),  # near-dup of 4
        (7, "singleton text that matches nothing else at all"),
        (8, "alpha beta gamma delta epsilon theta"),  # near-dup of 1/3
    ]
    return spark.createDataFrame(base, "doc_id long, text string")


def test_two_batch_incremental_equals_full(spark):
    docs = _docs(spark)
    full = sorted(r["doc_id"] for r in near_dedup(docs, "doc_id", "text", THRESH).collect())

    b1 = docs.filter(F.col("doc_id") <= 4)
    b2 = docs.filter(F.col("doc_id") > 4)
    kept1, store1 = incremental_near_dedup(b1, None, "doc_id", "text", THRESH)
    kept2, store2 = incremental_near_dedup(b2, store1, "doc_id", "text", THRESH)
    inc = sorted(r["doc_id"] for r in store2.select("doc_id").collect())
    assert inc == full  # bridge-free fixture: identical corpora


def test_invariants_on_fixture_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    kept1, store1 = incremental_near_dedup(b1, None, "doc_id", "text", THRESH)
    kept2, store2 = incremental_near_dedup(b2, store1, "doc_id", "text", THRESH)

    n_store1 = store1.count()
    assert store2.count() == n_store1 + kept2.count()
    # invariant 1: no two admitted docs are within threshold
    pairs = jaccard_pairs(store2, "doc_id", "text", threshold=THRESH)
    assert pairs.count() == 0
    # invariant 2: every dropped batch-2 doc connects to an admitted doc
    dropped = b2.join(store2.select("doc_id"), "doc_id", "left_anti")
    n_dropped = dropped.count()
    if n_dropped:
        all_pairs = jaccard_pairs(
            docs, "doc_id", "text", threshold=THRESH
        ).select("id_a", "id_b")
        touching = (
            all_pairs.join(
                dropped.select(F.col("doc_id").alias("d")),
                (F.col("id_a") == F.col("d")) | (F.col("id_b") == F.col("d")),
                "left_semi",
            ).count()
        )
        assert touching > 0  # dropped docs are dropped for a reason


def test_idempotent_reprocessing(spark):
    """Re-submitting an already-processed batch admits nothing new."""
    docs = _docs(spark)
    kept1, store1 = incremental_near_dedup(docs, None, "doc_id", "text", THRESH)
    kept2, store2 = incremental_near_dedup(
        docs.withColumn("doc_id", F.col("doc_id") + 100),
        store1,
        "doc_id",
        "text",
        THRESH,
    )
    # every re-submitted doc is a near/exact dup of the store -> all dropped
    assert kept2.count() == 0
    assert store2.count() == store1.count()
