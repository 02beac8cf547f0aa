"""Round-30 additions: positional inverted index / phrase search.

q375 answers exact phrase queries from a positional postings table
(``operators/postings.py``) — the IR-classic plan (token filter pushed
to the scan, one position-shifted semi-join per continuation token)
that q196's trigram SUBSTRING search deliberately does not cover: this
is word-level adjacency over an index, not char-level containment over
a scan.

The reference has no text or search surface (complete operator
inventory /root/reference/etl_connector.py:53-242; SURVEY §0, §2.2) —
north-star extension, oracle-paired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

_PHRASES = [["table", "scan"], ["merge", "sort", "join"]]


def _phrase_oracle() -> str:
    branches = []
    for ph in _PHRASES:
        joins, wheres = [], [f"a.tok = '{ph[0]}'"]
        for i, tok in enumerate(ph[1:], start=1):
            joins.append(
                f"JOIN toks t{i} ON t{i}.doc_id = a.doc_id "
                f"AND t{i}.pos = a.pos + {i} AND t{i}.tok = '{tok}'"
            )
        branches.append(f"""
    SELECT '{' '.join(ph)}' AS phrase, a.doc_id,
           CAST(count(*) AS BIGINT) AS n_matches,
           min(a.pos) AS first_pos
    FROM toks a {' '.join(joins)}
    WHERE {' AND '.join(wheres)}
    GROUP BY 2""")
    return f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             CAST(generate_subscripts(ws, 1) - 1 AS BIGINT) AS pos,
             unnest(ws) AS tok
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    )
    {' UNION ALL '.join(branches)}
    """


@query("q375_phrase_search", oracle=_phrase_oracle())
def q375_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over a positional postings table: per phrase
    and document, the occurrence count and first hit position. The plan
    builds token postings in one narrow explode scan, filters to the
    phrase's tokens BEFORE any shuffle, and resolves word adjacency as
    position-shifted SEMI-joins on (doc_id, pos) — k-1 equi-joins for a
    k-token phrase, duplicate occurrences can't multiply rows. At 100 TB
    the postings table is built once and written bucketed by token
    (operators/postings.py scale notes); a query then reads only its
    own tokens' lists and this exact join plan runs unchanged."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.postings import (
        build_postings,
        phrase_match,
    )

    docs = load(spark, sf_dir, "documents")
    postings = build_postings(docs, "doc_id", "text")
    out = None
    for ph in _PHRASES:
        hit = phrase_match(postings, ph).select(
            F.lit(" ".join(ph)).alias("phrase"),
            "doc_id",
            "n_matches",
            "first_pos",
        )
        out = hit if out is None else out.unionByName(hit)
    return out


@query("q376_postings_store_phrase", oracle=_phrase_oracle())
def q376_postings_store_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q375's phrase search THROUGH the persistent bucket-partitioned
    postings store (operators/postings_store.py): the index is built on
    disk (token-hash-bucket partitioning), and each phrase reads only
    its own tokens' bucket directories — the bucket IN predicate lands
    in PartitionFilters (plan-asserted in tests/test_postings_store.py).
    Same oracle as q375: the on-disk layout must be invisible to
    results, so any encode/prune/layout fault surfaces as a value
    mismatch under the driver gate."""
    import tempfile

    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.postings_store import (
        PostingsStore,
    )

    docs = load(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="q376_postings_") + "/ix"
    store = PostingsStore.build(
        spark, docs, "doc_id", "text", root, n_buckets=16
    )
    out = None
    for ph in _PHRASES:
        hit = store.phrase(ph).select(
            F.lit(" ".join(ph)).alias("phrase"),
            "doc_id",
            "n_matches",
            "first_pos",
        )
        out = hit if out is None else out.unionByName(hit)
    return out
