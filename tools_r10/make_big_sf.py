"""Synthesize a scaled documents/embeddings corpus for the lifecycle
cohort's scaling experiment (round-9 VERDICT #8: confirm the fused /
overlapped store verbs' advantage at a scale where DATA, not driver
scheduling, dominates).

/root/testdata is read-only and driver-generated with no generator
shipped, so this replicates the sf0.1 documents/embeddings tables K
times with deterministic id offsets (text/vectors reused verbatim —
the distributions that drive bucket fan-out, token frequencies, and
cluster assignment are preserved; ids stay unique). Writes
$OUT (default /tmp/sfbig)/{documents,embeddings}.parquet. Only these
two tables are consumed by the lifecycle cohort.

Usage: K=100 OUT=/tmp/sfbig python tools_r10/make_big_sf.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.session import get_spark
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load


def main() -> None:
    k = int(os.environ.get("K", "100"))
    out = os.environ.get("OUT", "/tmp/sfbig")
    src = os.environ.get("SRC", "/root/testdata/sf0.1")
    spark = get_spark(app_name="make-big-sf")
    docs = load(spark, src, "documents")
    e = load(spark, src, "embeddings")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = spark.range(k).select(F.col("id").alias("__rep"))
    big_docs = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("__rep") * max_doc).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    big_e = e.crossJoin(reps).select(
        (F.col("vec_id") + F.col("__rep") * max_doc).alias("vec_id"),
        "embedding", "label",
    )
    big_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    big_e.repartition(16).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    print(
        "rows:",
        spark.read.parquet(os.path.join(out, "documents.parquet")).count(),
        spark.read.parquet(os.path.join(out, "embeddings.parquet")).count(),
    )


if __name__ == "__main__":
    main()
