"""Bucket-partitioned postings store (operators/postings_store.py):
phrase results must equal the direct in-memory operator, appends (batch
and streaming) must grow the index consistently, and the bucket
predicate must land in PartitionFilters."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.postings import build_postings, phrase_match
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.postings_store import PostingsStore
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

DOCS_DDL = "doc_id long, text string, lang string, source string, n_chars long"
PHRASE = ["table", "scan"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_store_phrase_equals_direct_operator(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    store = PostingsStore.build(
        spark, docs, "doc_id", "text", str(tmp_path / "ix"), n_buckets=16
    )
    direct = phrase_match(build_postings(docs, "doc_id", "text"), PHRASE)
    got = store.phrase(PHRASE)
    assert _rows(got) == _rows(direct)
    assert len(_rows(got)) > 0  # the fixture really contains the phrase

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    scan = plan[plan.index("PartitionFilters"):]
    assert "bucket" in scan[: scan.index("]")]


def test_batch_and_streaming_append_grow_the_index(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    store = PostingsStore.build(
        spark, half_a, "doc_id", "text", str(tmp_path / "ix"), n_buckets=16
    )
    partial = _rows(store.phrase(PHRASE))

    src = str(tmp_path / "incoming")
    half_b.write.parquet(src)
    stream = spark.readStream.schema(DOCS_DDL).parquet(src)
    store.streaming_append(stream, str(tmp_path / "ckpt")).awaitTermination()

    full = phrase_match(build_postings(docs, "doc_id", "text"), PHRASE)
    assert _rows(store.phrase(PHRASE)) == _rows(full)
    assert set(partial) <= set(_rows(full))

    # reload from disk: params round-trip
    again = PostingsStore(spark, str(tmp_path / "ix"))
    assert again.n_buckets == 16
    assert _rows(again.phrase(PHRASE)) == _rows(full)


# -- BM25 ranked retrieval (round 5) ------------------------------------------

TERMS = ["table", "sort", "hash"]


def test_ranked_bm25_prunes_to_term_buckets(spark, sf_dir, tmp_path):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions.text import py_hex_hash60

    docs = load(spark, sf_dir, "documents")
    store = PostingsStore.build(
        spark, docs, "doc_id", "text", str(tmp_path / "ix"), n_buckets=16
    )
    got = store.ranked_bm25(TERMS, topk=10)
    rows = _rows(got)
    assert len(rows) == 10
    # plan: bucket IN (...) in PartitionFilters; distributed top-k (no
    # global window / single-partition sort)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    scan = plan[plan.index("PartitionFilters"):]
    assert "bucket" in scan[: scan.index("]")]
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    # <= |terms| bucket directories in the pruning predicate: the IN-list
    # of the PartitionFilters entry is exactly the terms' bucket ids
    import re

    want = {py_hex_hash60(t) % 16 for t in TERMS}
    m = re.search(r"bucket[^ ]* IN \(([^)]*)\)", scan[: scan.index("]")])
    assert m, f"no bucket IN pruning predicate: {scan[:200]}"
    pruned = {int(x) for x in m.group(1).split(",")}
    assert pruned == want


def test_ranked_bm25_append_equals_rebuild(spark, sf_dir, tmp_path):
    """The doclen sidecar must track appends: a store grown in two parts
    ranks identically to a one-shot build (stats included)."""
    docs = load(spark, sf_dir, "documents")
    p0 = docs.filter(F.col("doc_id") % 3 < 2)
    p1 = docs.filter(F.col("doc_id") % 3 == 2)
    grown = PostingsStore.build(
        spark, p0, "doc_id", "text", str(tmp_path / "a"), n_buckets=16
    )
    grown.append(p1)
    oneshot = PostingsStore.build(
        spark, docs, "doc_id", "text", str(tmp_path / "b"), n_buckets=16
    )
    assert _rows(grown.ranked_bm25(TERMS, topk=25)) == _rows(
        oneshot.ranked_bm25(TERMS, topk=25)
    )


def test_ranked_bm25_edge_cases(spark, sf_dir, tmp_path):
    import pytest

    docs = load(spark, sf_dir, "documents")
    store = PostingsStore.build(
        spark, docs, "doc_id", "text", str(tmp_path / "ix"), n_buckets=16
    )
    with pytest.raises(ValueError, match="empty term set"):
        store.ranked_bm25([])
    # a term absent from the corpus contributes nothing (and an all-absent
    # query returns an empty ranking, not an error)
    assert store.ranked_bm25(["zzzznotaword"], topk=5).count() == 0
    both = store.ranked_bm25(TERMS + ["zzzznotaword"], topk=10)
    alone = store.ranked_bm25(TERMS, topk=10)
    assert _rows(both) == _rows(alone)


def test_doclen_missing_raises_descriptive(spark, sf_dir, tmp_path):
    import shutil

    import pytest

    docs = load(spark, sf_dir, "documents").limit(50)
    store = PostingsStore.build(
        spark, docs, "doc_id", "text", str(tmp_path / "ix"), n_buckets=8
    )
    shutil.rmtree(store._doclen_path())
    with pytest.raises(FileNotFoundError, match="doclen sidecar"):
        store.ranked_bm25(TERMS)


def test_ranked_bm25_after_streaming_growth(spark, sf_dir, tmp_path):
    """The doclen sidecar must also track STREAMING appends (foreachBatch
    routes through append): a stream-grown store ranks identically to a
    one-shot build."""
    docs = load(spark, sf_dir, "documents")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    grown = PostingsStore.build(
        spark, half_a, "doc_id", "text", str(tmp_path / "ix"), n_buckets=16
    )
    src = str(tmp_path / "incoming")
    half_b.write.parquet(src)
    stream = spark.readStream.schema(DOCS_DDL).parquet(src)
    grown.streaming_append(stream, str(tmp_path / "ckpt")).awaitTermination()

    oneshot = PostingsStore.build(
        spark, docs, "doc_id", "text", str(tmp_path / "b"), n_buckets=16
    )
    assert _rows(grown.ranked_bm25(TERMS, topk=25)) == _rows(
        oneshot.ranked_bm25(TERMS, topk=25)
    )
