"""Round-6 additions to the declared query surface (SURVEY §2.3 extensions).

Multi-group and robust statistics (Kruskal-Wallis H, Theil-Sen slope),
LM-based corpus quality scoring (the CCNet-style bigram-perplexity
filter), temperature-scaled data-mix allocation, and two more classic
TPC-H shapes (Q8 market share, Q22 idle-rich-customers anti-join).

The reference has no statistics, joins, or text analytics anywhere
(/root/reference/etl_connector.py:53-242 is its complete operator
surface, SURVEY §2.1-2.2). All queries here are oracle-paired (DuckDB)
and auto-gated by tests/test_oracle.py; operator semantics additionally
covered in tests/test_round6.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

# ---------------------------------------------------------------------------
# Kruskal-Wallis H (k-sample rank test, doubled-rank integers)
# ---------------------------------------------------------------------------


@query(
    "q246_kruskal_wallis",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority AS grp, o_totalprice AS x FROM orders
    ), r AS (
      SELECT grp,
             rank() OVER (ORDER BY x) AS rmin,
             count(*) OVER (PARTITION BY x) AS nties
      FROM s
    ), g AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(2 * rmin + nties - 1) AS BIGINT) AS rank_sum2
      FROM r GROUP BY 1
    ), terms AS (
      SELECT CAST(sum(CAST(round(
               (CAST(rank_sum2 AS DOUBLE) * CAST(rank_sum2 AS DOUBLE))
               / (4 * n_g) * 1e3) AS BIGINT)) AS BIGINT) AS tq,
             CAST(sum(n_g) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k
      FROM g
    ), ties AS (
      SELECT CAST(coalesce(sum(t * t * t - t), 0) AS BIGINT) AS tie_term
      FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM s GROUP BY x) tg
    )
    SELECT n, k,
           12.0 / (CAST(n AS DOUBLE) * (n + 1)) * (CAST(tq AS DOUBLE) / 1e3)
             - 3.0 * (n + 1) AS h_stat,
           (12.0 / (CAST(n AS DOUBLE) * (n + 1)) * (CAST(tq AS DOUBLE) / 1e3)
             - 3.0 * (n + 1))
           / (1.0 - CAST(tie_term AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * n - n))
             AS h_corrected
    FROM terms, ties
    """,
)
def q246_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H: do the five order priorities draw prices from
    one distribution? The k-sample extension of q237's Mann-Whitney —
    one global rank pass, per-group rank sums in exact doubled-rank
    integers (2*rank_min + ties - 1 == 2*avg_rank, q187's identity),
    then each group's rank_sum^2/(4*n_g) term is milli-quantized to a
    BIGINT so the k-term sum is order-independent across engines; the
    tie-corrected H divides by q237's same t^3 - t correction. The
    global rank is the scale cost — bucket first (q139) at fact
    scale, as q187 documents. The reference has no statistics
    (SURVEY §2.2)."""
    s = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").alias("x"),
    )
    r = s.select(
        "grp",
        F.rank().over(Window.orderBy("x")).alias("rmin"),
        F.count(F.lit(1)).over(Window.partitionBy("x")).alias("nties"),
    )
    g = r.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(2 * F.col("rmin") + F.col("nties") - 1)
        .cast("long")
        .alias("rank_sum2"),
    )
    r2 = F.col("rank_sum2").cast("double")
    terms = g.agg(
        F.sum(
            F.round(r2 * r2 / (4 * F.col("n_g")) * F.lit(1e3)).cast("long")
        )
        .cast("long")
        .alias("tq"),
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).alias("k"),
    )
    ties = (
        s.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.coalesce(
                F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    nd = F.col("n").cast("double")
    h = (
        12.0 / (nd * (F.col("n") + 1)) * (F.col("tq").cast("double") / 1e3)
        - 3.0 * (F.col("n") + 1)
    )
    return terms.crossJoin(F.broadcast(ties)).select(
        "n",
        "k",
        h.alias("h_stat"),
        (
            h
            / (
                1.0
                - F.col("tie_term").cast("double")
                / (nd * nd * F.col("n") - F.col("n"))
            )
        ).alias("h_corrected"),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend (median of pairwise slopes per group)
# ---------------------------------------------------------------------------


@query(
    "q247_theil_sen_slope",
    oracle="""
    WITH wk AS (
      SELECT c_nationkey,
             CAST(date_diff('day', DATE '1995-01-02',
                            date_trunc('week', o_orderdate)) AS BIGINT)
               AS x,
             CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) * 100 AS BIGINT)
               AS y_cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ), slopes AS (
      SELECT a.c_nationkey,
             CAST(b.y_cents - a.y_cents AS DOUBLE) / (b.x - a.x) AS slope
      FROM wk a JOIN wk b
        ON a.c_nationkey = b.c_nationkey AND a.x < b.x
    )
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_pairs,
           quantile_cont(slope, 0.5) AS sen_slope_cents_per_day
    FROM slopes JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1
    """,
)
def q247_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen estimator of each nation's weekly-revenue trend: the
    MEDIAN of all pairwise slopes — the robust companion to q120's
    least-squares trend (one wild week moves OLS arbitrarily, but
    breaks Theil-Sen only past 29% contamination). The pair expansion
    is quadratic ONLY in the week-grain frame (calendar-sized however
    big the fact table is — the same aggregate-space discipline as
    q118's sweep line), keyed on nation so the self-join is
    hash-partitioned. Each slope is one double division of exact
    integers (cents, epoch days); the median is the engine-exact
    interpolated percentile path shared with q35/q146. The reference
    has no statistics (SURVEY §2.2)."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    wk = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_nationkey",
            F.datediff(
                F.date_trunc("week", "o_orderdate"), F.lit("1995-01-02")
            )
            .cast("long")
            .alias("x"),
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(30,10)")) * 100)
            .cast("long")
            .alias("y_cents")
        )
    )
    a = wk.alias("a")
    b = wk.alias("b")
    slopes = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.c_nationkey").alias("c_nationkey"),
        (
            (F.col("b.y_cents") - F.col("a.y_cents")).cast("double")
            / (F.col("b.x") - F.col("a.x"))
        ).alias("slope"),
    )
    return (
        slopes.join(
            F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.percentile("slope", F.lit(0.5)).alias(
                "sen_slope_cents_per_day"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Bigram-LM document quality score (CCNet-style perplexity filter)
# ---------------------------------------------------------------------------


@query(
    "q248_lm_quality_score",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         x -> x <> '') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
      FROM d WHERE len(toks) >= 2
    ), bg AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM s
    ), c12 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2
    ), c1 AS (
      SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY 1
    ), v AS (
      SELECT CAST(count(DISTINCT w2) AS BIGINT) AS vocab FROM bg
    ), scored AS (
      SELECT bg.doc_id,
             CAST(round(ln(CAST(c12.c12 + 1 AS DOUBLE)
                           / (c1.c1 + v.vocab)) * 1e9) AS BIGINT) AS lq
      FROM bg JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
              JOIN c1 ON bg.w1 = c1.w1, v
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(lq) AS DOUBLE) / 1e9 / count(*) AS avg_logprob
    FROM scored GROUP BY 1
    """,
)
def q248_lm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-based quality scoring: train a Laplace-smoothed bigram
    language model on the corpus (q134's count frames), then score
    every document by its average bigram log-probability — the
    CCNet-style perplexity filter that separates fluent text from
    gibberish far better than q41's surface heuristics, computed
    with no external model. Per-bigram log terms are nano-quantized
    to BIGINTs before the per-document sum (q216/q242's trick), so
    document scores are order-independent and bit-identical across
    engines. Plan: one shuffle-free bigram extraction feeds the two
    count rollups AND the scoring join (all keyed on the bigram /
    unigram — aggregate-space sizes), then one doc-keyed aggregation.
    The vocabulary count rides in as a 1-row broadcast. The reference
    has no text analytics (SURVEY §2.2)."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower("text"), "[^a-z]+"), lambda x: x != F.lit("")
    )
    bg = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = bg.agg(F.count_distinct("w2").alias("vocab"))
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.col("c12") + 1).cast("double")
                    / (F.col("c1") + F.col("vocab"))
                )
                * F.lit(1e9)
            )
            .cast("long")
            .alias("lq"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.sum("lq").cast("double") / 1e9 / F.count(F.lit(1))).alias(
            "avg_logprob"
        ),
    )


# ---------------------------------------------------------------------------
# Temperature-scaled data-mix allocation (integer Hamilton apportionment)
# ---------------------------------------------------------------------------

MIX_TOKEN_BUDGET = 10_000_000
MIX_TEMPERATURE = 0.7


@query(
    "q249_temperature_mix",
    oracle=f"""
    WITH src AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(round(pow(CAST(count(*) AS DOUBLE), {MIX_TEMPERATURE})
                        * 1e9) AS BIGINT) AS wq
      FROM documents GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(wq) AS BIGINT) AS wtot FROM src
    ), q AS (
      SELECT source, n_docs, wq,
             CAST({MIX_TOKEN_BUDGET} * wq AS BIGINT) // wtot AS floor_units,
             CAST({MIX_TOKEN_BUDGET} * wq AS BIGINT) % wtot AS rem
      FROM src, tot
    ), lk AS (
      SELECT CAST({MIX_TOKEN_BUDGET} - sum(floor_units) AS BIGINT)
        AS leftover FROM q
    )
    SELECT source, n_docs,
           CAST(floor_units
                + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                            <= leftover THEN 1 ELSE 0 END
             AS BIGINT) AS token_quota
    FROM q, lk
    """,
)
def q249_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled training-mix quotas: per-source sampling
    budgets proportional to n_docs^0.7 — the standard
    up-weight-the-tail mix rule (T=1 is proportional, T=0 uniform)
    that q100's rebalancer consumes. The temperature weights are
    nano-quantized to BIGINTs (one deterministic pow+round each),
    then apportioned with q239's exact largest-remainder method —
    quotas sum to the budget EXACTLY, integer arithmetic end to end,
    remainder ties broken by source name. One aggregation pass over
    the corpus; everything downstream is source-grain with a 1-row
    broadcast total. The reference has no sampling surface
    (SURVEY §2.2)."""
    src = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "source",
            "n_docs",
            F.round(
                F.pow(F.col("n_docs").cast("double"), F.lit(MIX_TEMPERATURE))
                * F.lit(1e9)
            )
            .cast("long")
            .alias("wq"),
        )
    )
    tot = src.agg(F.sum("wq").cast("long").alias("wtot"))
    b = F.lit(MIX_TOKEN_BUDGET).cast("long")
    q = (
        src.crossJoin(F.broadcast(tot))
        .withColumn("quota_num", b * F.col("wq"))
        .select(
            "source",
            "n_docs",
            F.expr("quota_num div wtot").alias("floor_units"),
            (F.col("quota_num") % F.col("wtot")).alias("rem"),
        )
    )
    lk = q.agg((b - F.sum("floor_units")).cast("long").alias("leftover"))
    w = Window.orderBy(F.desc("rem"), F.asc("source"))
    return q.crossJoin(F.broadcast(lk)).select(
        "source",
        "n_docs",
        (
            F.col("floor_units")
            + F.when(F.row_number().over(w) <= F.col("leftover"), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("token_quota"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: national market share within a region
# ---------------------------------------------------------------------------


@query(
    "q250_market_share",
    oracle="""
    WITH rev AS (
      SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(30,10))
               * (1 - CAST(l_discount AS DECIMAL(30,10))) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA'
    )
    SELECT o_year,
           CAST(coalesce(sum(CASE WHEN supp_nation = 'NATION_5'
                                  THEN volume END), 0) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share,
           CAST(sum(volume) AS DOUBLE) AS total_volume
    FROM rev GROUP BY 1
    """,
)
def q250_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_5 suppliers' share of revenue sold into
    AMERICA-region customers, by order year — the second star-join
    stress test after q61's Q5 (this one fans the fact table out
    through BOTH dimension arms: supplier-side nation and
    customer-side nation->region). All five dimension tables
    broadcast, so the only shuffles are fact-fact (lineitem x orders
    on the order key) and the final year-grain aggregation; the
    region cut prunes through the customer arm before aggregation.
    Volume accumulates in DECIMAL; the share is one double division.
    The reference has no joins (SURVEY §2.2)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"),
    )
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "AMERICA")),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            (
                F.col("l_extendedprice").cast("decimal(30,10)")
                * (1 - F.col("l_discount").cast("decimal(30,10)"))
            ).alias("volume"),
            "supp_nation",
        )
    )
    return rev.groupBy("o_year").agg(
        (
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_5", F.col("volume")
                    )
                ),
                F.lit(0),
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share"),
        F.sum("volume").cast("double").alias("total_volume"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: idle rich customers (scalar subquery + anti-join)
# ---------------------------------------------------------------------------


@query(
    "q251_idle_rich_customers",
    oracle="""
    WITH cutoff AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE)
               / count(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE)
             AS total_acctbal
    FROM customer, cutoff
    WHERE c_acctbal > cutoff.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY 1
    """,
)
def q251_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive account
    balance who have never ordered, rolled up by market segment — the
    canonical scalar-subquery + anti-join composition (where's the
    money NOT moving). The average-balance cutoff is a 1-row
    broadcast; the no-orders test is a left-anti join on the customer
    key, which Spark executes without materializing the negation
    (the alternative NOT IN formulation degenerates under nulls —
    anti-join is the null-safe plan). At 100 TB the anti-join
    shuffles only the distinct order custkeys against the customer
    dimension. Balance sums accumulate in DECIMAL with one final
    double cast. The reference has no subqueries or joins
    (SURVEY §2.2)."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    o = load(spark, sf_dir, "orders").select("o_custkey")
    cutoff = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(30,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(cutoff)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(30,10)"))
        .cast("double")
        .alias("total_acctbal"),
    )
