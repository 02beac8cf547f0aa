"""Round-3 additions to the declared query surface (SURVEY §2.3 extensions).

North-star LLM-pipeline operators beyond the reference's ETL surface
(the reference implements none of these — its full operator inventory is
/root/reference/etl_connector.py:53-242, SURVEY §2.1): bigram language-model
statistics, revenue-concentration (Lorenz/Gini) profiling for data-mix
auditing, and deterministic k-means clustering over embedding vectors.

All batch queries here are oracle-paired (DuckDB) except k-means, which is
pytest-verified against a NumPy twin (tests/test_kmeans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.kmeans import kmeans
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

# ---------------------------------------------------------------------------
# Bigram language-model counts (n-gram conditional probabilities)
# ---------------------------------------------------------------------------


@query(
    "q134_bigram_lm",
    oracle="""
    WITH d AS (
      SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '') AS toks
      FROM documents
    ), s AS (
      SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
      FROM d WHERE len(toks) >= 2
    ), b AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM s
    ), c AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2
    )
    SELECT w1, w2, n,
           CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY w1) AS p
    FROM c
    """,
)
def q134_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model statistics: within-document adjacent token
    pairs -> count and conditional probability P(w2 | w1). The bigram
    extraction is a narrow per-row ``transform(sequence(...))`` over the
    token array — zero shuffle, so it runs at raw scan bandwidth; the
    only shuffle is the final (w1, w2) aggregation, which map-side
    combines (Zipf-distributed bigrams compress heavily in the partial
    aggregate). P(w2|w1) is a window over the already-aggregated frame
    (|distinct bigrams| rows, not |corpus| rows). The integer/integer
    division makes the probability bit-identical across engines. At
    100 TB this is the canonical first step of tokenizer/LM data prep;
    the reference has no text analytics at all (SURVEY §2.2)."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower("text"), "[^a-z]+"), lambda x: x != F.lit("")
    )
    bigrams = docs.select(toks.alias("toks")).filter(F.size("toks") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"
            )
        ).alias("bg")
    )
    counts = bigrams.groupBy(
        F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    ).agg(F.count(F.lit(1)).alias("n"))
    return counts.withColumn(
        "p",
        F.col("n").cast("double") / F.sum("n").over(Window.partitionBy("w1")),
    )


# ---------------------------------------------------------------------------
# Revenue concentration: Lorenz deciles + Gini (data-mix inequality profile)
# ---------------------------------------------------------------------------


@query(
    "q135_lorenz_deciles",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(30,10))) AS rev
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT rev, ntile(10) OVER (ORDER BY rev, o_custkey) AS decile
      FROM rev
    ), d AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
             sum(rev) AS revenue
      FROM ranked GROUP BY decile
    )
    SELECT decile, n_customers,
           CAST(revenue AS DOUBLE) AS revenue,
           CAST(revenue / sum(revenue) OVER () AS DOUBLE) AS rev_share,
           CAST(sum(revenue) OVER (ORDER BY decile)
                / sum(revenue) OVER () AS DOUBLE) AS cum_share
    FROM d
    """,
)
def q135_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve by revenue decile: how concentrated is spend across
    customers (the dual, for training corpora, is "how concentrated are
    tokens across sources" — the same shape audits a data mix). One
    shuffle aggregates orders to per-customer revenue in exact DECIMAL
    (double summation order would diverge across engines); the ntile /
    share windows then run over the aggregated frame (|customers|,
    then 10 rows), never over raw orders. Deterministic tie-break: the
    ntile ordering includes o_custkey. At 100 TB the per-customer
    rollup is the only full-data pass; everything after is metadata-
    sized. The reference has no aggregation surface (SURVEY §2.2)."""
    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(30,10)")).alias("rev"))
    )
    ranked = rev.select(
        "rev", F.ntile(10).over(Window.orderBy("rev", "o_custkey")).alias("decile")
    )
    d = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"), F.sum("rev").alias("revenue")
    )
    total = Window.partitionBy()
    running = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return d.select(
        "decile",
        "n_customers",
        F.col("revenue").cast("double").alias("revenue"),
        (F.col("revenue") / F.sum("revenue").over(total))
        .cast("double")
        .alias("rev_share"),
        (F.sum("revenue").over(running) / F.sum("revenue").over(total))
        .cast("double")
        .alias("cum_share"),
    )


# ---------------------------------------------------------------------------
# Deterministic k-means over embeddings (iterative vector clustering)
# ---------------------------------------------------------------------------


@query("q136_kmeans_embeddings")  # no SQL oracle: iterative; NumPy twin in tests
def q136_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means (k=8, 5 iterations) over the embeddings
    table: the semantic-clustering primitive behind corpus mixing,
    diversity sampling, and semantic dedup. Assignment is a pure Column
    expression (distances via ``transform``/``aggregate`` over a
    broadcast centroid literal — JVM-side, no Python in the hot path);
    the update step aggregates (cluster, dim) partial sums, so per-
    iteration cost is one scan + one k×dim-sized shuffle. Only the
    k×dim centroid matrix ever reaches the driver — the N-row
    assignment stays distributed, which is what lets the same loop run
    at 100 TB. Init is the first k rows by vec_id (seeded determinism;
    rerun-stable across engines). Oracle: none (iterative, not SQL-
    expressible); tests/test_kmeans.py checks exact agreement with a
    NumPy twin at sf0.001/0.01."""
    assigned, _ = kmeans(
        load(spark, sf_dir, "embeddings"), vec_col="embedding", id_col="vec_id",
        k=8, iters=5,
    )
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum("dist_sq"), 6).alias("inertia"),
    )
