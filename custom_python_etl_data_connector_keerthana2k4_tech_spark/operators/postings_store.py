"""Persistent positional postings store: the on-disk inverted index
behind ``operators/postings.py``'s scale claim.

Postings rows (token, doc_id, pos) are written partitioned by a stable
TOKEN-HASH BUCKET (``hex_hash60(token) % n_buckets`` — the cross-engine
md5 hash with a driver-side twin, functions/text.py), so a phrase
query's bucket set is computable on the driver and the ``bucket IN``
predicate becomes PartitionFilters — a k-token phrase opens at most k
bucket directories, never the corpus. Appends (batch or streaming
``foreachBatch``) encode with the same layout, so the index grows under
ingest; queries reuse ``postings.phrase_match`` unchanged on the pruned
reader (the operator is layout-agnostic — the store only narrows what
gets scanned).

Why hash buckets and not one directory per token: real vocabularies are
millions of tokens (file-system metadata death); a fixed bucket count
keeps directory fan-out constant while still pruning ~(1 - k/n_buckets)
of the bytes per query. Reference parity: no text/search surface in the
reference at all (SURVEY §0, §2.2).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions.text import hex_hash60, py_hex_hash60
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.postings import build_postings, phrase_match

_PARAMS_FILE = "_postings_params.json"
_DATA_DIR = "data"
_DOCLEN_DIR = "doclen"


class PostingsStore:
    """A bucket-partitioned positional inverted index on disk."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, _PARAMS_FILE)) as f:
            p = json.load(f)
        self.n_buckets: int = p["n_buckets"]
        self.id_col: str = p["id_col"]
        self.text_col: str = p["text_col"]

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        docs: DataFrame,
        id_col: str,
        text_col: str,
        path: str,
        n_buckets: int = 64,
    ) -> "PostingsStore":
        os.makedirs(path, exist_ok=True)
        tmp = os.path.join(path, _PARAMS_FILE + ".tmp")
        with open(tmp, "w") as f:
            json.dump(
                {"n_buckets": n_buckets, "id_col": id_col, "text_col": text_col}, f
            )
        os.replace(tmp, os.path.join(path, _PARAMS_FILE))
        store = cls(spark, path)
        store._encode(docs).write.mode("overwrite").partitionBy("bucket").parquet(
            store._data_path()
        )
        store._doclen(docs).write.mode("overwrite").parquet(store._doclen_path())
        return store

    def _data_path(self) -> str:
        return os.path.join(self.path, _DATA_DIR)

    def _doclen_path(self) -> str:
        return os.path.join(self.path, _DOCLEN_DIR)

    def _doclen(self, docs: DataFrame) -> DataFrame:
        """(doc_id, dlen) — dlen counts the same slots build_postings
        emits (single-space split, empties kept), so the sidecar always
        agrees with the postings rows per doc."""
        return docs.select(
            F.col(self.id_col).alias("doc_id"),
            F.size(F.split(F.col(self.text_col), " ")).cast("long").alias("dlen"),
        )

    def _encode(self, docs: DataFrame) -> DataFrame:
        postings = build_postings(docs, self.id_col, self.text_col)
        return postings.withColumn(
            "bucket",
            (hex_hash60(F.col("token")) % self.n_buckets).cast("int"),
        )

    def append(self, docs: DataFrame) -> None:
        self._encode(docs).write.mode("append").partitionBy("bucket").parquet(
            self._data_path()
        )
        self._doclen(docs).write.mode("append").parquet(self._doclen_path())

    def streaming_append(self, stream: DataFrame, checkpoint_dir: str):
        """Index new documents as they arrive (idempotent per epoch via
        the checkpoint); returns the started StreamingQuery."""
        return (
            stream.writeStream.foreachBatch(lambda b, _eid: self.append(b))
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def reader(self) -> DataFrame:
        return self.spark.read.parquet(self._data_path())

    def ranked_bm25(
        self, terms: list[str], topk: int = 10,
        k1: float = 1.2, b: float = 0.75,
    ) -> DataFrame:
        """Okapi BM25 ranked retrieval FROM the store — the query a
        retrieval user actually runs (phrase() is the exact-match
        sibling). Plan: the query terms' bucket directories prune via
        PartitionFilters (<= |terms| dirs opened, plan-asserted in
        tests), tf/df derive from the pruned postings only, and the
        corpus-level length stats come from the ``doclen`` sidecar the
        store maintains at build/append time (a 2-column frame whose
        aggregate is a 1-row broadcast) — so scoring never rescans the
        corpus text. Scoring is q171's operand-identical BM25 tree
        (plans/round4.py), and the final top-k is an orderBy+limit
        (TakeOrderedAndProject — distributed partial top-k, no global
        window). Ties break on doc_id. Returns doc_id, bm25,
        n_terms_hit (the top ``topk`` by score)."""
        if not terms:
            raise ValueError("empty term set")
        buckets = sorted({py_hex_hash60(t) % self.n_buckets for t in terms})
        pruned = (
            self.reader()
            .filter(F.col("bucket").isin(buckets))
            .filter(F.col("token").isin(list(terms)))
        )
        tf = pruned.groupBy("doc_id", "token").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        )
        dl = self.doclen_reader().select(
            F.col("doc_id").alias("d_id"), "dlen"
        )
        stats = dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("dlen").cast("double") / F.count(F.lit(1))).alias("avg_len"),
        )
        dfreq = tf.groupBy("token").agg(
            F.count(F.lit(1)).cast("long").alias("df")
        ).select(F.col("token").alias("f_term"), "df")
        idf = F.log(
            ((F.col("n_docs") - F.col("df")).cast("double") + 0.5)
            / (F.col("df").cast("double") + 0.5)
            + 1
        )
        contrib = idf * (
            (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + (F.lit(b) * F.col("dlen")) / F.col("avg_len"))
            )
        )
        scored = (
            tf.join(F.broadcast(dfreq), tf.token == F.col("f_term"))
            .join(dl, tf.doc_id == F.col("d_id"))
            .crossJoin(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(
                F.sum(contrib).cast("double").alias("bm25"),
                F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
            )
        )
        return scored.orderBy(F.desc("bm25"), "doc_id").limit(topk)

    def doclen_reader(self) -> DataFrame:
        """The (doc_id, dlen) sidecar; raises a descriptive error for
        stores built before the sidecar existed (rebuild to enable
        ranked retrieval)."""
        if not os.path.isdir(self._doclen_path()):
            raise FileNotFoundError(
                "this postings store has no doclen sidecar (built by an "
                "older version?) — rebuild the store to enable ranked_bm25"
            )
        return self.spark.read.parquet(self._doclen_path())

    def phrase(self, phrase: list[str]) -> DataFrame:
        """Exact phrase search reading ONLY the phrase tokens' buckets
        (driver-computed via the cross-engine hash twin; the bucket IN
        predicate lands in PartitionFilters)."""
        buckets = sorted({py_hex_hash60(tok) % self.n_buckets for tok in phrase})
        pruned = self.reader().filter(F.col("bucket").isin(buckets))
        return phrase_match(pruned.select("token", "doc_id", "pos"), phrase)
