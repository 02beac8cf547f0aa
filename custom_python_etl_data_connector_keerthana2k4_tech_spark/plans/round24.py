"""Round-24 addition: concat-then-chunk sequence-packing audit — the
packing strategy LLM pretraining actually uses (documents concatenated in
corpus order, the token stream cut every context-length tokens), audited
for boundary damage: how many documents straddle a chunk boundary (their
attention window sees a cut), and how full the chunks run.

Complements q39 (FFD bin packing, the no-straddle strategy): FFD wastes
padding to keep documents whole; concat-and-chunk wastes nothing but cuts
documents. This query prices that trade.

The reference computes none of this (complete operator surface:
/root/reference/etl_connector.py:53-242; SURVEY §2.1-2.2). Oracle-paired
(DuckDB) and auto-gated by tests/test_oracle.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions import text as TXT
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

_CONTEXT = 256  # tokens per packed chunk


@query(
    "q351_packing_boundary_audit",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {TXT.sql_word_count('text')} AS tok FROM documents
      WHERE {TXT.sql_word_count('text')} >= 1
    ), c AS (
      SELECT doc_id, tok,
             sum(tok) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM d
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(tok), 0) AS BIGINT) AS total_tokens,
           CAST(coalesce((max(cum) + {_CONTEXT} - 1) // {_CONTEXT}, 0)
                AS BIGINT) AS n_chunks,
           CAST(count(*) FILTER ((cum - tok) // {_CONTEXT}
                                 <> (cum - 1) // {_CONTEXT}) AS BIGINT)
             AS n_straddling,
           CASE WHEN count(*) > 0 THEN
             CAST(count(*) FILTER ((cum - tok) // {_CONTEXT}
                                   <> (cum - 1) // {_CONTEXT}) AS DOUBLE)
               / count(*) END AS straddle_rate,
           CASE WHEN count(*) > 0 THEN
             CAST(max(cum) AS DOUBLE)
               / (((max(cum) + {_CONTEXT} - 1) // {_CONTEXT}) * {_CONTEXT})
             END AS fill_rate
    FROM c
    """,
)
def q351_packing_boundary_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk packing audit at context length 256: documents
    concatenate in doc_id order and the token stream is cut every 256
    tokens; a document is DAMAGED when its first and last token fall in
    different chunks. Reports chunk count, straddle rate (the fraction of
    documents that get cut) and fill rate (1.0 minus only the final
    chunk's padding — the whole point of this packing). Scale: the
    cumulative token position is DOC-grain, so it runs as
    operators/ranks.with_running_sums (range repartition + per-range
    windows + broadcast offsets), never an unpartitioned window over
    millions of documents; everything after is one exact-BIGINT
    aggregate. The oracle keeps the plain window cumsum. Reference has
    no text analytics (SURVEY §2.2)."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.ranks import with_running_sums

    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", TXT.word_count("text").cast("long").alias("tok"))
        .filter(F.col("tok") >= 1)
    )
    c = with_running_sums(d, [F.col("doc_id").asc()], {"cum": "tok"})
    first_chunk = F.floor((F.col("cum") - F.col("tok")) / _CONTEXT)
    last_chunk = F.floor((F.col("cum") - 1) / _CONTEXT)
    straddles = (first_chunk != last_chunk).cast("long")
    n_chunks = F.floor((F.max("cum") + _CONTEXT - 1) / _CONTEXT).cast("long")
    n = F.count(F.lit(1))
    # coalesce/guard the empty-corpus case so both engines report
    # (0 docs, 0 tokens, 0 chunks, NULL rates) — Spark's empty sum is NULL
    # while DuckDB's FILTER count is 0, and 0/0 diverges (NULL vs NaN)
    return c.agg(
        n.cast("long").alias("n_docs"),
        F.coalesce(F.sum("tok"), F.lit(0)).cast("long").alias("total_tokens"),
        F.coalesce(n_chunks, F.lit(0)).alias("n_chunks"),
        F.coalesce(F.sum(straddles), F.lit(0)).cast("long").alias(
            "n_straddling"
        ),
        F.when(n > 0, F.sum(straddles).cast("double") / n).alias(
            "straddle_rate"
        ),
        F.when(
            n > 0,
            F.max("cum").cast("double")
            / (n_chunks * F.lit(_CONTEXT)).cast("double"),
        ).alias("fill_rate"),
    )


# ---------------------------------------------------------------------------
# BPE merge table (tokenizer-training readout; iterative, rows-only gate)
# ---------------------------------------------------------------------------


@query("q352_bpe_merge_table", oracle=None)  # iterative training loop — not SQL-expressible
def q352_bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 10 BPE merges learned from the corpus, in application
    order — the actual tokenizer-training readout
    (operators/bpe.train_bpe): one corpus pass to the word-frequency
    dictionary, then vocab-bounded merge iterations (JVM-side folds,
    deterministic count-desc/lexicographic argmax). Rows are
    deterministic, so the driver's rows-only gate pins them; training is
    separately pinned bit-identical to a pure-Python reference in
    tests/test_bpe.py. Reference has no tokenization (SURVEY §2.2)."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.bpe import train_bpe

    docs = load(spark, sf_dir, "documents")
    merges, dictionary = train_bpe(docs, "text", n_merges=10)
    rows = [(i + 1, a, b, a + b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "step int, left string, right string, merged string"
    )


# ---------------------------------------------------------------------------
# Multiset (bag) set operations: INTERSECT ALL / EXCEPT ALL
# ---------------------------------------------------------------------------


@query(
    "q353_multiset_reconciliation",
    oracle="""
    WITH a AS (
      SELECT o_custkey, o_orderpriority FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
    ), b AS (
      SELECT o_custkey, o_orderpriority FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
    UNION ALL
    SELECT 'except_all', CAST(count(*) AS BIGINT)
    FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    UNION ALL
    SELECT 'except_all_rev', CAST(count(*) AS BIGINT)
    FROM (SELECT * FROM b EXCEPT ALL SELECT * FROM a)
    """,
)
def q353_multiset_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (the §2 set-op family's ALL variants,
    completing q22-q24's DISTINCT forms): reconcile two order-year
    multisets of (customer, priority) — INTERSECT ALL keeps matched
    MULTIPLICITY (min of the two counts per row value, what a
    reconciliation actually audits; DISTINCT intersect would hide repeat
    orders), EXCEPT ALL the surplus on each side. Scale: Spark plans both
    as one hash aggregation per side plus a join on the full row value —
    no sort, partial-aggregable, exactly like the DISTINCT forms; counts
    are exact BIGINTs. Reference has no set operations (SURVEY §2.2)."""
    o = load(spark, sf_dir, "orders")

    def year_slice(y0: str, y1: str) -> DataFrame:
        return o.filter(
            (F.col("o_orderdate") >= y0) & (F.col("o_orderdate") < y1)
        ).select("o_custkey", "o_orderpriority")

    a = year_slice("1996-01-01", "1997-01-01")
    b = year_slice("1997-01-01", "1998-01-01")
    rows = [
        a.intersectAll(b).agg(
            F.lit("intersect_all").alias("op"),
            F.count(F.lit(1)).cast("long").alias("n"),
        ),
        a.exceptAll(b).agg(
            F.lit("except_all").alias("op"),
            F.count(F.lit(1)).cast("long").alias("n"),
        ),
        b.exceptAll(a).agg(
            F.lit("except_all_rev").alias("op"),
            F.count(F.lit(1)).cast("long").alias("n"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
