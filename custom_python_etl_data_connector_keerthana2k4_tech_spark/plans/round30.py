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
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.stores import shared_postings_store

    store = shared_postings_store(spark, sf_dir)
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


# ---------------------------------------------------------------------------
# q378: composite retrieval pipeline (phrase recall -> embedding rerank)
# ---------------------------------------------------------------------------

_RETR_PHRASE = ["table", "scan"]
_RETR_K = 10


def _retrieval_oracle() -> str:
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions.vectors import sql_quantize

    return f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             CAST(generate_subscripts(ws, 1) - 1 AS BIGINT) AS pos,
             unnest(ws) AS tok
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    hits AS (
      SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_matches,
             min(a.pos) AS first_pos
      FROM toks a
      JOIN toks t1 ON t1.doc_id = a.doc_id AND t1.pos = a.pos + 1
                  AND t1.tok = '{_RETR_PHRASE[1]}'
      WHERE a.tok = '{_RETR_PHRASE[0]}'
      GROUP BY 1
    ),
    q AS (
      SELECT unnest({sql_quantize('embedding')}) AS qx,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings WHERE vec_id = 0
    ),
    c AS (
      SELECT e.vec_id, unnest({sql_quantize('e.embedding')}) AS cx,
             generate_subscripts(e.embedding, 1) AS i
      FROM embeddings e JOIN hits h ON e.vec_id = h.doc_id
      WHERE e.vec_id <> 0
    ),
    dots AS (
      SELECT c.vec_id AS doc_id,
             sum(q.qx * c.cx) AS dot,
             sum(q.qx * q.qx) AS q_nsq,
             sum(c.cx * c.cx) AS c_nsq
      FROM q JOIN c USING (i)
      GROUP BY 1
    ),
    scored AS (
      SELECT doc_id,
             CAST(dot AS DOUBLE)
               / (sqrt(CAST(q_nsq AS DOUBLE)) * sqrt(CAST(c_nsq AS DOUBLE)))
               AS cosine
      FROM dots
    )
    SELECT s.doc_id, h.n_matches, h.first_pos, s.cosine,
           CAST(s.rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY cosine DESC, doc_id) AS rank
      FROM scored
    ) s JOIN hits h ON h.doc_id = s.doc_id
    WHERE s.rank <= {_RETR_K}
    """


@query("q378_retrieval_pipeline", oracle=_retrieval_oracle())
def q378_retrieval_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrieval composite a serving stack runs: lexical RECALL
    (exact phrase match over the positional postings, q375's operator)
    followed by semantic RERANK (exact quantized-integer cosine of each
    candidate's embedding against the query vector, q46's operator) —
    top-{k} with the phrase evidence (n_matches, first_pos) carried
    through. Plan: one explode scan for postings, a semi-join to gate
    the embeddings scan to candidates, one broadcast query vector, one
    top-k. At 100 TB both legs are index reads (token buckets for the
    phrase, vector store lists for the rerank); the composition itself
    adds no extra shuffle. Oracle replays both legs relationally."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.postings import (
        build_postings,
        phrase_match,
    )
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.similarity import cosine_topk

    docs = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    hits = phrase_match(
        build_postings(docs, "doc_id", "text"), _RETR_PHRASE
    )
    cand = e.join(
        hits.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    ranked = cosine_topk(
        cand, e.filter(F.col("vec_id") == 0), "vec_id", "embedding", k=_RETR_K
    )
    return (
        ranked.select(
            F.col("neighbor_id").alias("doc_id"), "cosine", "rank"
        )
        .join(hits, "doc_id")
        .select("doc_id", "n_matches", "first_pos", "cosine", "rank")
    )
