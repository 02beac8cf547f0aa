"""Corrupt-tolerant JSONL ingestion with dead-letter routing.

The file-source analog of the REST reader's payload-shape defenses: the
reference probes response shapes and logs-and-skips invalid records
(R4 normalization, /root/reference/etl_connector.py:100-117; R7
validation + skip, :194-203, :221-223). For file ingestion the same
contract is: parse what parses, quarantine what doesn't, lose NOTHING
silently — Spark's PERMISSIVE mode + ``columnNameOfCorruptRecord``
expressed as one reusable source operator.

Scale notes: the JSON scan is splittable per line, so corrupt-record
routing is embarrassingly parallel; both outputs derive from ONE read
of the files (a cached single scan serves the two filters), and the
quarantine frame preserves raw lines byte-for-byte for replay after a
parser fix — the R8-style reprocess-don't-drop posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl_with_deadletter(
    spark: SparkSession,
    path: str,
    schema: StructType,
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines at ``path`` against ``schema``; return
    ``(good, dead)``: parsed rows, and a quarantine frame of
    ``(raw_line)`` for every line that failed to parse or conform.

    The declared schema is extended with the corrupt-record column, so
    malformed lines land there instead of being dropped (PERMISSIVE
    default) or killing the job (FAILFAST). A parsed row is "good"
    when the corrupt column is null. NOTE: per Spark semantics the
    corrupt column captures the raw text only for unparseable JSON;
    a parseable object with a wrong field type also lands there.
    """
    if any(f.name == CORRUPT_COL for f in schema.fields):
        raise ValueError(f"schema must not already contain {CORRUPT_COL}")
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()
    )
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    dead = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, dead
