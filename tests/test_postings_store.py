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
