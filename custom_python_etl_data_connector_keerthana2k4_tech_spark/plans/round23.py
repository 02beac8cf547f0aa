"""Round-23 additions: the last missing TPC-H shape (Q21 double-correlated
exists/not-exists) plus four corpus-engineering operators a training-data
pipeline runs before committing a mix — per-source novelty rate (who
contributes new content vs duplicated mass), Matryoshka embedding fidelity
(how much vector energy survives dimension truncation), pairwise
source-vocabulary overlap (which sources to dedup against each other), and
boilerplate-shingle mass (template text that token counts overstate).

The reference computes none of these (complete operator surface:
/root/reference/etl_connector.py:53-242; SURVEY §2.1-2.2). All five are
oracle-paired (DuckDB) and auto-gated by tests/test_oracle.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions import text as TXT
from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions.vectors import (
    int_dot,
    quantize,
    sql_quantize,
)
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.relational import DSUM
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

# ---------------------------------------------------------------------------
# TPC-H Q21 shape: suppliers who kept multi-supplier orders waiting
# ---------------------------------------------------------------------------


@query(
    "q346_tpch_q21_waiting_suppliers",
    oracle="""
    WITH per AS (
      SELECT l_orderkey, l_suppkey, max(l_shipdate) AS smax
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM per p
    JOIN supplier ON s_suppkey = p.l_suppkey
    WHERE EXISTS (
            SELECT 1 FROM per o
            WHERE o.l_orderkey = p.l_orderkey
              AND o.l_suppkey <> p.l_suppkey)
      AND NOT EXISTS (
            SELECT 1 FROM per o
            WHERE o.l_orderkey = p.l_orderkey
              AND o.l_suppkey <> p.l_suppkey
              AND o.smax >= p.smax)
    GROUP BY 1, 2
    """,
)
def q346_tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (the sweep's last missing query): per supplier, the
    number of multi-supplier orders where THIS supplier shipped strictly
    last — EXISTS another supplier on the order, NOT EXISTS one shipping
    as late or later (the fixture has no commit/receipt dates, so lateness
    is the strictly-latest max l_shipdate; the double correlation is
    preserved exactly). Scale: ONE map-side-combinable rollup collapses the
    fact to (order, supplier) grain; both correlated subqueries then become
    a single keyed window over that frame (count of co-suppliers, the
    order-wide max, and the tie count — strictly-last means at-the-max AND
    alone there), so nothing ever rejoins raw lineitem. The supplier dim
    broadcasts into the final count. The ORACLE keeps the textbook
    EXISTS / NOT EXISTS formulation as the independent cross-check.
    Reference has no joins or subqueries (SURVEY §2.2)."""
    li = load(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("smax")
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per.select(
        "l_orderkey",
        "l_suppkey",
        "smax",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.max("smax").over(w).alias("omax"),
    ).withColumn(
        "n_at_max",
        F.sum((F.col("smax") == F.col("omax")).cast("int")).over(w),
    )
    waiting = flagged.filter(
        (F.col("n_supp") >= 2)
        & (F.col("smax") == F.col("omax"))
        & (F.col("n_at_max") == 1)
    )
    sup = F.broadcast(
        load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        waiting.join(sup, waiting["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Per-source novelty rate (who mints new content vs re-crawls)
# ---------------------------------------------------------------------------


@query(
    "q347_source_novelty",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, {TXT.sql_words('text')} AS ws FROM documents
    ), tri AS (
      SELECT DISTINCT doc_id, source,
             unnest(list_transform(generate_series(1, len(ws) - 2),
                    i -> array_to_string(list_slice(ws, i, i + 2), ' '))) AS g
      FROM d WHERE len(ws) >= 3
    ), firsts AS (
      SELECT g, min(doc_id) AS first_doc FROM tri GROUP BY 1
    )
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_tri,
           CAST(count(*) FILTER (t.doc_id = f.first_doc) AS BIGINT) AS n_novel,
           CAST(count(*) FILTER (t.doc_id = f.first_doc) AS DOUBLE)
             / count(*) AS novelty_rate
    FROM tri t JOIN firsts f ON t.g = f.g
    GROUP BY 1
    """,
)
def q347_source_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source novelty rate: of each source's distinct-per-doc trigram
    occurrences, the fraction whose GLOBAL first appearance (min doc_id)
    is that very document — sources that re-crawl or mirror existing
    content score near zero and are dedup candidates before they inflate
    the mix (the per-source attribution of q259's Heaps curve). Scale:
    trigram extraction is a narrow transform; the only wide operations are
    one min-aggregate keyed on the trigram (type-bounded, map-side
    combinable) and one join of occurrences back to their first-doc row —
    no windows, no driver state. Exact BIGINTs into one division.
    Reference has no text analytics (SURVEY §2.2)."""
    d = load(spark, sf_dir, "documents")
    ws = TXT.words("text")
    tri = (
        d.select("doc_id", "source", ws.alias("ws"))
        .filter(F.size("ws") >= 3)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, size(ws) - 2),"
                        " i -> concat_ws(' ', ws[i - 1], ws[i], ws[i + 1]))"
                    )
                )
            ).alias("g"),
        )
    )
    firsts = tri.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = (F.col("doc_id") == F.col("first_doc")).cast("long")
    return (
        tri.join(firsts, "g")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tri"),
            F.sum(novel).cast("long").alias("n_novel"),
            (F.sum(novel).cast("double") / F.count(F.lit(1))).alias(
                "novelty_rate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Matryoshka embedding fidelity (energy kept by dimension truncation)
# ---------------------------------------------------------------------------

_MATRYOSHKA_HEAD = 16


@query(
    "q348_matryoshka_fidelity",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, {sql_quantize('embedding')} AS qv FROM embeddings
    ), e AS (
      SELECT vec_id, unnest(qv) AS x, generate_subscripts(qv, 1) AS i FROM q
    ), s AS (
      SELECT vec_id,
             sum(x * x) AS full_nsq,
             sum(CASE WHEN i <= {_MATRYOSHKA_HEAD} THEN x * x ELSE 0 END)
               AS head_nsq
      FROM e GROUP BY 1
    ), f AS (
      SELECT sqrt(CAST(head_nsq AS DOUBLE) / CAST(full_nsq AS DOUBLE))
               AS fidelity
      FROM s WHERE full_nsq > 0
    )
    SELECT CAST(floor(fidelity * 20) AS BIGINT) AS band,
           CAST(count(*) AS BIGINT) AS n,
           {DSUM('fidelity')} / count(*) AS avg_fidelity
    FROM f GROUP BY 1
    """,
)
def q348_matryoshka_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit: per embedding, the fraction of vector
    NORM retained by the first 16 of 64 dimensions (the cosine between
    a vector and its zero-padded truncation), banded into twentiles — the
    go/no-go readout for serving truncated embeddings (MRL-style) from an
    index built on full ones. Scale: everything is a narrow per-row array
    expression on the 1e-6-quantized integer grid (exact cross-engine
    norms) plus ONE aggregate keyed on a 20-value band — scan bandwidth,
    no joins, no windows. Reference has no vector surface (SURVEY §2.2)."""
    e = load(spark, sf_dir, "embeddings").select(quantize("embedding").alias("qv"))
    head = F.slice("qv", 1, _MATRYOSHKA_HEAD)
    s = e.select(
        int_dot(F.col("qv"), F.col("qv")).alias("full_nsq"),
        int_dot(head, head).alias("head_nsq"),
    ).filter(F.col("full_nsq") > 0)
    fid = F.sqrt(
        F.col("head_nsq").cast("double") / F.col("full_nsq").cast("double")
    )
    return (
        s.select(fid.alias("fidelity"))
        .groupBy(F.floor(F.col("fidelity") * 20).cast("long").alias("band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (
                F.sum(F.col("fidelity").cast("decimal(30,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_fidelity"),
        )
    )


# ---------------------------------------------------------------------------
# Pairwise source-vocabulary overlap (dedup planning matrix)
# ---------------------------------------------------------------------------


@query(
    "q349_source_vocab_overlap",
    oracle=f"""
    WITH v AS (
      SELECT DISTINCT source, unnest({TXT.sql_words('text')}) AS w
      FROM documents
    ), sz AS (
      SELECT source, CAST(count(*) AS BIGINT) AS vocab FROM v GROUP BY 1
    ), common AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b, sa.vocab AS vocab_a, sb.vocab AS vocab_b,
           n_common,
           CAST(n_common AS DOUBLE)
             / (sa.vocab + sb.vocab - n_common) AS jaccard
    FROM common
    JOIN sz sa ON sa.source = source_a
    JOIN sz sb ON sb.source = source_b
    """,
)
def q349_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap between sources: Jaccard similarity of
    each source pair's distinct-word vocabularies — the planning matrix
    that says WHICH sources need cross-dedup (q43/q44) before mixing and
    which are genuinely disjoint. Scale: one distinct on (source, word)
    bounds everything by vocabulary x sources; the pair join is keyed on
    the word (hash join, map-side combinable counts), so the quadratic is
    over the handful of sources, never over words or docs. Exact BIGINTs
    into one division per pair. Reference has no set operations
    (SURVEY §2.2)."""
    d = load(spark, sf_dir, "documents")
    v = d.select(
        "source", F.explode(TXT.words("text")).alias("w")
    ).distinct()
    sz = v.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    a = v.select(F.col("source").alias("source_a"), "w")
    b = v.select(F.col("source").alias("source_b"), "w")
    common = (
        a.join(b, "w")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sz.select(
        F.col("source").alias("source_a"), F.col("vocab").alias("vocab_a")
    )
    sb = sz.select(
        F.col("source").alias("source_b"), F.col("vocab").alias("vocab_b")
    )
    return (
        common.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "vocab_a",
            "vocab_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Boilerplate-shingle mass per source (template text audit)
# ---------------------------------------------------------------------------

_BOILERPLATE_DF = 0.05  # a shingle is boilerplate in a source when it
# appears in more than this fraction of the source's documents


@query(
    "q350_boilerplate_mass",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, {TXT.sql_words('text')} AS ws FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, source,
             unnest(list_transform(generate_series(1, len(ws) - 4),
                    i -> array_to_string(list_slice(ws, i, i + 4), ' '))) AS g
      FROM d WHERE len(ws) >= 5
    ), docs AS (
      SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM sh GROUP BY 1
    ), df AS (
      SELECT s.source, s.g, CAST(count(*) AS BIGINT) AS df, max(n_docs) AS n_docs
      FROM sh s JOIN docs USING (source)
      GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(DISTINCT CASE WHEN df > {_BOILERPLATE_DF} * n_docs
                                    THEN g END) AS BIGINT)
             AS n_boiler_shingles,
           CAST(sum(df) AS BIGINT) AS total_mass,
           CAST(sum(CASE WHEN df > {_BOILERPLATE_DF} * n_docs THEN df
                         ELSE 0 END) AS BIGINT) AS boiler_mass,
           CAST(sum(CASE WHEN df > {_BOILERPLATE_DF} * n_docs THEN df
                         ELSE 0 END) AS DOUBLE) / sum(df) AS boiler_ratio
    FROM df GROUP BY 1
    """,
)
def q350_boilerplate_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate audit: per source, the share of (doc, 5-gram-shingle)
    mass carried by shingles present in more than 5% of that
    source's documents — headers, footers and templates that inflate raw
    token counts without adding signal; the number that decides whether a
    source needs boilerplate-stripping before it enters the mix. Scale:
    shingling is narrow; document frequency is one groupBy keyed on
    (source, shingle) with map-side combine; the per-source doc counts
    broadcast. Threshold comparisons and masses are exact BIGINTs into
    one division. Reference has no text analytics (SURVEY §2.2)."""
    d = load(spark, sf_dir, "documents")
    ws = TXT.words("text")
    sh = (
        d.select("doc_id", "source", ws.alias("ws"))
        .filter(F.size("ws") >= 5)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, size(ws) - 4),"
                        " i -> concat_ws(' ', ws[i - 1], ws[i], ws[i + 1],"
                        " ws[i + 2], ws[i + 3]))"
                    )
                )
            ).alias("g"),
        )
    )
    docs = sh.groupBy("source").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    df = (
        sh.join(F.broadcast(docs), "source")
        .groupBy("source", "g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.max("n_docs").alias("n_docs"),
        )
    )
    is_boiler = F.col("df") > F.lit(_BOILERPLATE_DF) * F.col("n_docs")
    return df.groupBy("source").agg(
        F.countDistinct(F.when(is_boiler, F.col("g"))).cast("long").alias(
            "n_boiler_shingles"
        ),
        F.sum("df").cast("long").alias("total_mass"),
        F.sum(F.when(is_boiler, F.col("df")).otherwise(0))
        .cast("long")
        .alias("boiler_mass"),
        (
            F.sum(F.when(is_boiler, F.col("df")).otherwise(0)).cast("double")
            / F.sum("df")
        ).alias("boiler_ratio"),
    )
