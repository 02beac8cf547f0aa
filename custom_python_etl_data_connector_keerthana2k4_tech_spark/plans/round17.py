"""Round-17 additions: comparative text statistics, STL-style series
decomposition strength, fulfillment SLA accounting, and temporal
relational division — the "which terms define each source" readout
(Monroe et al. log-odds with informative Dirichlet prior), seasonal and
trend strength of the daily series, the share of orders fully shipped
within SLA per month, and users who performed every event type in the
catalog (universal quantification over the behavior dimension).

The reference computes none of these (complete operator surface:
/root/reference/etl_connector.py:53-242; SURVEY §2.1-2.2). All four are
oracle-paired (DuckDB) and auto-gated by tests/test_oracle.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.relational import DSUM, dsum
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

# ---------------------------------------------------------------------------
# Distinctive terms per source: log-odds with informative Dirichlet prior
# ---------------------------------------------------------------------------


@query(
    "q318_distinctive_terms",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ), tf AS (
      SELECT source, w, count(*) AS y_sw
      FROM toks WHERE w <> '' GROUP BY 1, 2
    ), term AS (
      SELECT w, sum(y_sw) AS y_w FROM tf GROUP BY 1 HAVING sum(y_sw) >= 50
    ), src AS (
      SELECT source, sum(y_sw) AS n_s FROM tf GROUP BY 1
    ), corpus AS (
      SELECT sum(y_sw) AS big_n FROM tf
    ), scored AS (
      SELECT tf.source, tf.w,
             ln((tf.y_sw + 1000.0 * term.y_w / corpus.big_n)
                / (src.n_s + 1000.0 - tf.y_sw
                   - 1000.0 * term.y_w / corpus.big_n))
             - ln((term.y_w - tf.y_sw + 1000.0 * term.y_w / corpus.big_n)
                  / (corpus.big_n - src.n_s + 1000.0
                     - (term.y_w - tf.y_sw)
                     - 1000.0 * term.y_w / corpus.big_n)) AS delta,
             1.0 / (tf.y_sw + 1000.0 * term.y_w / corpus.big_n)
               + 1.0 / (term.y_w - tf.y_sw + 1000.0 * term.y_w / corpus.big_n)
               AS var
      FROM tf
      JOIN term ON tf.w = term.w
      JOIN src ON tf.source = src.source
      CROSS JOIN corpus
    )
    SELECT source, w AS term, round(z, 6) AS z, CAST(rk AS INT) AS rk
    FROM (
      SELECT source, w, delta / sqrt(var) AS z,
             row_number() OVER (PARTITION BY source
                                ORDER BY delta / sqrt(var) DESC, w ASC) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
)
def q318_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three most DISTINCTIVE terms per source by Monroe et al.'s
    log-odds-ratio with an informative Dirichlet prior (alpha0=1000
    spread by corpus frequency): the comparative-text statistic that
    answers "what does this source talk about more than everyone else"
    without TF-IDF's rare-word bias — the screen that catches a source
    drifting into spam or boilerplate vocabulary. Terms below 50 corpus
    occurrences are excluded (prior dominates). Scale: one
    tokenize-explode pass to (source, term) counts; margins join on the
    aggregate frames (term dim broadcastable); z and the per-source
    top-3 rank run on the scored frame with deterministic tie-breaks.
    Integer counts feed identical ln/sqrt on both engines; z rounded to
    the 1e-6 comparison grain. Reference has no text surface
    (SURVEY §2.2)."""
    toks = load(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    tf = toks.filter(F.col("w") != "").groupBy("source", "w").agg(F.count("*").alias("y_sw"))
    term = tf.groupBy("w").agg(F.sum("y_sw").alias("y_w")).filter(F.col("y_w") >= 50)
    src = tf.groupBy("source").agg(F.sum("y_sw").alias("n_s"))
    corpus = tf.agg(F.sum("y_sw").alias("big_n"))
    alpha = 1000.0 * F.col("y_w") / F.col("big_n")
    delta = F.log(
        (F.col("y_sw") + alpha) / (F.col("n_s") + 1000.0 - F.col("y_sw") - alpha)
    ) - F.log(
        (F.col("y_w") - F.col("y_sw") + alpha)
        / (
            F.col("big_n")
            - F.col("n_s")
            + 1000.0
            - (F.col("y_w") - F.col("y_sw"))
            - alpha
        )
    )
    var = 1.0 / (F.col("y_sw") + alpha) + 1.0 / (F.col("y_w") - F.col("y_sw") + alpha)
    scored = (
        tf.join(F.broadcast(term), "w")
        .join(F.broadcast(src), "source")
        .crossJoin(F.broadcast(corpus))
        .select("source", "w", (delta / F.sqrt(var)).alias("z"))
    )
    return (
        scored.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(F.desc("z"), F.asc("w"))
            ),
        )
        .filter(F.col("rk") <= 3)
        .select(
            "source",
            F.col("w").alias("term"),
            F.round("z", 6).alias("z"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# Seasonal and trend strength of the daily order series (STL-style)
# ---------------------------------------------------------------------------


@query(
    "q319_seasonal_strength",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             dayname(CAST(o_orderdate AS DATE)) AS dow,
             count(*) AS x
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ), ma AS (
      SELECT day, dow, x,
             sum(x) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                          AND 3 FOLLOWING) AS w7,
             count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
                            AND 3 FOLLOWING) AS c7
      FROM daily
    ), interior AS (
      SELECT dow, x, 7 * x - w7 AS detr FROM ma WHERE c7 = 7
    ), dowm AS (
      SELECT dow, count(*) AS nd, sum(detr) AS sd FROM interior GROUP BY 1
    ), parts AS (
      SELECT i.x, i.detr,
             i.detr - CAST(d.sd AS DOUBLE) / d.nd AS resid
      FROM interior i JOIN dowm d ON i.dow = d.dow
    ), mom AS (
      SELECT count(*) AS n,
             {DSUM('x')} AS sx, {DSUM('x * x')} AS sxx,
             {DSUM('detr')} AS st, {DSUM('detr * detr')} AS stt,
             {DSUM('resid')} AS sr, {DSUM('resid * resid')} AS srr
      FROM parts
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           greatest(0.0, 1 - (srr / n - (sr / n) * (sr / n))
                           / (stt / n - (st / n) * (st / n)))
             AS seasonal_strength,
           greatest(0.0, 1 - (stt / n - (st / n) * (st / n)) / 49.0
                           / (sxx / n - (sx / n) * (sx / n)))
             AS trend_strength
    FROM mom
    """,
)
def q319_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style decomposition strengths for the 1996 daily series: the
    7-day centered moving average is the trend, day-of-week means of the
    detrended series are the seasonal component, and the two strengths
    are 1 - Var(remainder)/Var(one-level-up) — the pair of numbers that
    says whether a forecaster needs a seasonal term (q163), a trend term
    (q245), or neither. Scale: the fact collapses to <=366 day rows;
    the MA is an ordered 7-row window; detrended values 7x - W7 are
    exact integers (scale 7 cancels in each ratio via the /49 variance
    rescale); all variances accumulate in decimal. Reference has no
    statistics (SURVEY §2.2)."""
    daily = (
        load(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01"))
        .groupBy(
            F.col("o_orderdate").cast("date").alias("day"),
            F.date_format(F.col("o_orderdate").cast("date"), "EEEE").alias("dow"),
        )
        .agg(F.count("*").alias("x"))
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    ma = daily.select(
        "day",
        "dow",
        "x",
        F.sum("x").over(w7).alias("w7"),
        F.count("*").over(w7).alias("c7"),
    )
    interior = ma.filter(F.col("c7") == 7).select(
        "dow", "x", (7 * F.col("x") - F.col("w7")).alias("detr")
    )
    dowm = interior.groupBy("dow").agg(F.count("*").alias("nd"), F.sum("detr").alias("sd"))
    parts = interior.join(F.broadcast(dowm), "dow").select(
        "x",
        "detr",
        (F.col("detr") - F.col("sd").cast("double") / F.col("nd")).alias("resid"),
    )
    n = F.count("*")
    sx, sxx = dsum("x"), dsum(F.col("x") * F.col("x"))
    st, stt = dsum("detr"), dsum(F.col("detr") * F.col("detr"))
    sr, srr = dsum("resid"), dsum(F.col("resid") * F.col("resid"))
    var_x = sxx / n - (sx / n) * (sx / n)
    var_t = stt / n - (st / n) * (st / n)
    var_r = srr / n - (sr / n) * (sr / n)
    return parts.agg(
        n.cast("long").alias("n_days"),
        F.greatest(F.lit(0.0), 1 - var_r / var_t).alias("seasonal_strength"),
        F.greatest(F.lit(0.0), 1 - var_t / 49.0 / var_x).alias("trend_strength"),
    )


# ---------------------------------------------------------------------------
# Fulfillment SLA: share of orders fully shipped within 60 days, by month
# ---------------------------------------------------------------------------


@query(
    "q320_fulfillment_sla",
    oracle="""
    WITH per_order AS (
      SELECT o_orderkey,
             strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             max(date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE))) AS worst_lag
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    )
    SELECT month,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN worst_lag <= 60 THEN 1 ELSE 0 END) AS BIGINT)
             AS within_sla,
           CAST(sum(CASE WHEN worst_lag <= 60 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS fill_rate
    FROM per_order GROUP BY 1
    """,
)
def q320_fulfillment_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment SLA accounting: per order month of 1996, the share of
    orders whose SLOWEST line shipped within 60 days — order-complete
    fill rate, the all-lines-or-nothing metric that per-line latency
    percentiles (q146) silently overstate. Scale: the order-date cut
    pushes into the orders scan AND prunes the lineitem side through the
    join; one groupBy(orderkey) computes the worst lag (max is
    map-side combinable), then a 12-row month rollup. Exact integer day
    lags and counts; one division. Reference has no joins
    (SURVEY §2.2)."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    per_order = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(
            F.max(
                F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
            ).alias("worst_lag")
        )
    )
    within = F.sum(F.when(F.col("worst_lag") <= 60, 1).otherwise(0))
    return per_order.groupBy("month").agg(
        F.count("*").cast("long").alias("n_orders"),
        within.cast("long").alias("within_sla"),
        (within.cast("double") / F.count("*")).alias("fill_rate"),
    )


# ---------------------------------------------------------------------------
# Temporal relational division: customers active every month of 1996
# ---------------------------------------------------------------------------


@query(
    "q321_behavioral_division",
    oracle="""
    WITH u AS (
      SELECT user_id, count(DISTINCT event_type) AS n_types,
             count(*) AS n_events,
             count(DISTINCT CAST(ts AS DATE)) AS active_days
      FROM events GROUP BY 1
    ), total AS (
      SELECT count(DISTINCT event_type) AS k FROM events
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           CAST(active_days AS BIGINT) AS active_days
    FROM u CROSS JOIN total WHERE n_types = k
    """,
)
def q321_behavioral_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral relational division: users who have performed EVERY
    event type in the catalog — universal quantification over the
    behavior dimension (the event-log twin of q115's part-set division),
    the fully-activated segment onboarding funnels aim for. The divisor
    set is discovered from the data itself (one-row distinct-type count
    broadcast), so a new event type automatically tightens the bar.
    Scale: one groupBy(user) with distinct counts replaces the textbook
    double-NOT-EXISTS nesting — no type dimension join, no anti-join
    cascade, map-side combinable. Exact integers. Reference has no
    subqueries (SURVEY §2.2)."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types"),
        F.count("*").alias("n_events"),
        F.countDistinct(F.col("ts").cast("date")).alias("active_days"),
    )
    total = ev.agg(F.countDistinct("event_type").alias("k"))
    return (
        u.join(F.broadcast(total))
        .filter(F.col("n_types") == F.col("k"))
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("active_days").cast("long").alias("active_days"),
        )
    )
