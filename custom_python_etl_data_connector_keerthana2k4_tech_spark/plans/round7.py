"""Round-7 additions to the declared query surface (SURVEY §2.3 extensions).

Classifier agreement (Cohen's kappa over the lang-ID confusion frame),
audience continuity (week-over-week Jaccard), information theory of
event sequences (Markov entropy rate), lead-lag discovery between two
daily series (cross-correlation function), and two more TPC-H shapes
(Q6 forecast-revenue scan, Q4-style existence check).

The reference has no statistics, joins, or evaluation surface anywhere
(/root/reference/etl_connector.py:53-242 is its complete operator
surface, SURVEY §2.1-2.2). All queries here are oracle-paired (DuckDB)
and auto-gated by tests/test_oracle.py; operator semantics additionally
covered in tests/test_round7.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions import text as TXT
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

# ---------------------------------------------------------------------------
# Cohen's kappa: chance-corrected agreement of lang-ID vs stored labels
# ---------------------------------------------------------------------------


@query(
    "q261_cohens_kappa",
    oracle=f"""
    WITH s AS (
      SELECT lang AS label, {TXT.sql_lang_id('text')} AS pred FROM documents
    ), cells AS (
      SELECT label, pred, CAST(count(*) AS BIGINT) AS c
      FROM s GROUP BY 1, 2
    ), marg AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(CASE WHEN label = pred THEN c END) AS BIGINT)
               AS n_agree
      FROM cells
    ), pe AS (
      SELECT CAST(sum(lc * pc) AS BIGINT) AS pe_num
      FROM (SELECT label AS k, CAST(sum(c) AS BIGINT) AS lc
            FROM cells GROUP BY 1) l
      JOIN (SELECT pred AS k, CAST(sum(c) AS BIGINT) AS pc
            FROM cells GROUP BY 1) p
        ON l.k = p.k
    )
    SELECT n, n_agree,
           CAST(n_agree AS DOUBLE) / n AS po,
           CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS pe,
           (CAST(n_agree AS DOUBLE) / n
              - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n))
           / (1.0 - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n))
             AS kappa
    FROM marg, pe
    """,
)
def q261_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the heuristic lang-ID classifier and the
    stored language labels: chance-corrected agreement, the one-number
    summary of q180's confusion matrix (raw accuracy flatters any
    classifier on a skewed label mix; kappa subtracts what marginal
    guessing would score). The observed-agreement and expected-
    agreement terms are exact BIGINT cell counts and marginal
    products — the chance term joins the two marginal frames on the
    class key (class-count-sized), so nothing beyond the one
    classify-and-count pass touches raw data. Same single-definition
    discipline as q180: ONE classifier expression rendered to both
    engines from functions/text.py. The reference has no evaluation
    surface (SURVEY §2.2)."""
    s = load(spark, sf_dir, "documents").select(
        F.col("lang").alias("label"), TXT.lang_id("text").alias("pred")
    )
    cells = s.groupBy("label", "pred").agg(F.count(F.lit(1)).alias("c"))
    marg = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("label") == F.col("pred"), F.col("c")))
        .cast("long")
        .alias("n_agree"),
    )
    lmarg = cells.groupBy(F.col("label").alias("k")).agg(
        F.sum("c").cast("long").alias("lc")
    )
    pmarg = cells.groupBy(F.col("pred").alias("k")).agg(
        F.sum("c").cast("long").alias("pc")
    )
    pe = (
        lmarg.join(pmarg, "k")
        .agg(F.sum(F.col("lc") * F.col("pc")).cast("long").alias("pe_num"))
    )
    nd = F.col("n").cast("double")
    po = F.col("n_agree").cast("double") / F.col("n")
    ped = F.col("pe_num").cast("double") / (nd * F.col("n"))
    return marg.crossJoin(F.broadcast(pe)).select(
        "n",
        "n_agree",
        po.alias("po"),
        ped.alias("pe"),
        ((po - ped) / (1.0 - ped)).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Week-over-week audience overlap (Jaccard + retention of active users)
# ---------------------------------------------------------------------------


@query(
    "q262_audience_overlap",
    oracle="""
    WITH wu AS (
      SELECT DISTINCT date_trunc('week', ts) AS wk, user_id FROM events
    ), sz AS (
      SELECT wk, CAST(count(*) AS BIGINT) AS n FROM wu GROUP BY 1
    ), inter AS (
      SELECT a.wk AS wk, CAST(count(*) AS BIGINT) AS n_both
      FROM wu a JOIN wu b
        ON a.user_id = b.user_id
       AND b.wk = a.wk + INTERVAL 7 DAY
      GROUP BY 1
    )
    SELECT sa.wk AS week_start, sa.n AS n_this, sb.n AS n_next,
           CAST(coalesce(i.n_both, 0) AS BIGINT) AS n_both,
           CAST(coalesce(i.n_both, 0) AS DOUBLE)
             / (sa.n + sb.n - coalesce(i.n_both, 0)) AS jaccard,
           CAST(coalesce(i.n_both, 0) AS DOUBLE) / sa.n AS retention
    FROM sz sa JOIN sz sb ON sb.wk = sa.wk + INTERVAL 7 DAY
    LEFT JOIN inter i ON i.wk = sa.wk
    """,
)
def q262_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week audience continuity: for each adjacent week pair,
    the Jaccard overlap and retention of active users — the
    set-valued sibling of q193's DAU/WAU stickiness (stickiness says
    how MUCH activity repeats; Jaccard says whether it is the SAME
    people). One distinct pass builds (week, user); the intersection
    is a self-join on user_id with the +7-day week shift folded into
    the join condition, so co-active pairs never materialize beyond
    week-adjacent matches; sizes and intersections then meet in
    week-grain frames. Exact BIGINT set sizes, two double divisions.
    At 100 TB the distinct is the only raw-data pass, and the
    user-keyed self-join shuffles the deduplicated (week, user)
    frame once. The reference has no set operations (SURVEY §2.2)."""
    ev = load(spark, sf_dir, "events")
    wu = ev.select(
        F.date_trunc("week", "ts").alias("wk"), "user_id"
    ).distinct()
    sz = wu.groupBy("wk").agg(F.count(F.lit(1)).alias("n"))
    a = wu.alias("a")
    b = wu.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (
                F.col("b.wk")
                == F.col("a.wk") + F.expr("INTERVAL 7 DAY")
            ),
        )
        .groupBy(F.col("a.wk").alias("iwk"))
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sz.alias("sa")
    sb = sz.alias("sb")
    both = F.coalesce(F.col("n_both"), F.lit(0))
    return (
        sa.join(
            sb,
            F.col("sb.wk") == F.col("sa.wk") + F.expr("INTERVAL 7 DAY"),
        )
        .join(inter, F.col("iwk") == F.col("sa.wk"), "left")
        .select(
            F.col("sa.wk").alias("week_start"),
            F.col("sa.n").alias("n_this"),
            F.col("sb.n").alias("n_next"),
            both.cast("long").alias("n_both"),
            (
                both.cast("double")
                / (F.col("sa.n") + F.col("sb.n") - both)
            ).alias("jaccard"),
            (both.cast("double") / F.col("sa.n")).alias("retention"),
        )
    )


# ---------------------------------------------------------------------------
# Markov entropy rate of event-type sequences
# ---------------------------------------------------------------------------


@query(
    "q263_markov_entropy_rate",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ), c AS (
      SELECT event_type AS s_from, next_type AS s_to,
             CAST(count(*) AS BIGINT) AS c_ij
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ), ci AS (
      SELECT s_from, CAST(sum(c_ij) AS BIGINT) AS c_i FROM c GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(c_ij) AS BIGINT) AS n FROM c
    ), terms AS (
      SELECT CAST(round((CAST(c.c_ij AS DOUBLE) / tot.n)
                        * ln(CAST(c.c_ij AS DOUBLE) / ci.c_i)
                        * 1e9) AS BIGINT) AS tq
      FROM c JOIN ci ON c.s_from = ci.s_from, tot
    )
    SELECT (SELECT n FROM tot) AS n_transitions,
           (SELECT CAST(count(*) AS BIGINT) FROM ci) AS n_states,
           -CAST(sum(tq) AS DOUBLE) / 1e9 AS entropy_rate_nats,
           exp(-CAST(sum(tq) AS DOUBLE) / 1e9) AS perplexity
    FROM terms
    """,
)
def q263_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the first-order event-type Markov chain:
    H = -sum_ij (c_ij/N) ln(c_ij/c_i) nats per step, with its
    perplexity e^H — how predictable the NEXT user action is given
    the current one (q122 publishes the transition matrix; this is
    its one-number compression, and the honest baseline any
    next-event model must beat: perplexity ~= number of effective
    choices per step). Transition counts come from one lead() window
    per user (one shuffle); every (i,j) term is nano-quantized to a
    BIGINT using empirical-weight algebra that cancels to c_ij/N
    times a log of exact integer ratios — order-independent and
    engine-exact, q242's discipline. All post-window frames are
    state-grain. The reference has no sequence analytics
    (SURVEY §2.2)."""
    ev = load(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(wseq).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    c = seq.groupBy(
        F.col("event_type").alias("s_from"),
        F.col("next_type").alias("s_to"),
    ).agg(F.count(F.lit(1)).alias("c_ij"))
    ci = c.groupBy("s_from").agg(F.sum("c_ij").cast("long").alias("c_i"))
    tot = c.agg(F.sum("c_ij").cast("long").alias("n"))
    n_states = ci.agg(F.count(F.lit(1)).alias("n_states"))
    terms = (
        c.join(F.broadcast(ci), "s_from")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                (F.col("c_ij").cast("double") / F.col("n"))
                * F.log(F.col("c_ij").cast("double") / F.col("c_i"))
                * F.lit(1e9)
            )
            .cast("long")
            .alias("tq")
        )
    )
    h = -F.col("tqsum").cast("double") / 1e9
    return (
        terms.agg(F.sum("tq").cast("long").alias("tqsum"))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n_states))
        .select(
            F.col("n").alias("n_transitions"),
            "n_states",
            h.alias("entropy_rate_nats"),
            F.exp(h).alias("perplexity"),
        )
    )


# ---------------------------------------------------------------------------
# Lead-lag cross-correlation between two daily series
# ---------------------------------------------------------------------------

CCF_MAX_LAG = 7


@query(
    "q264_lead_lag_ccf",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(CASE WHEN event_type = 'click' THEN 1 END)
               AS BIGINT) AS x,
             CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END)
               AS BIGINT) AS y
      FROM events GROUP BY 1
    ), seq AS (
      SELECT row_number() OVER (ORDER BY day) AS rn, x, y FROM daily
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
      FROM seq
    ), dev AS (
      SELECT rn,
             CAST(x * (SELECT n FROM stats) - (SELECT sx FROM stats)
               AS BIGINT) AS dx,
             CAST(y * (SELECT n FROM stats) - (SELECT sy FROM stats)
               AS BIGINT) AS dy
      FROM seq
    ), den AS (
      SELECT sqrt(CAST(sum(dx * dx) AS DOUBLE))
               * sqrt(CAST(sum(dy * dy) AS DOUBLE)) AS d
      FROM dev
    ), lags AS (
      SELECT unnest(generate_series(-{CCF_MAX_LAG}, {CCF_MAX_LAG})) AS k
    ), num AS (
      SELECT lags.k, CAST(sum(a.dx * b.dy) AS BIGINT) AS nq
      FROM lags JOIN dev a ON TRUE JOIN dev b ON b.rn = a.rn + lags.k
      GROUP BY 1
    )
    SELECT num.k AS lag_days,
           CAST(num.nq AS DOUBLE) / den.d AS ccf
    FROM num, den
    """,
)
def q264_lead_lag_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between daily click volume and daily purchase
    volume at lags -7..+7: a positive peak at lag k means clicks lead
    purchases by k days — the lead-lag discovery step before any
    demand forecast regresses one series on the other (q252's ACF is
    this query with x == y). Centered deviations stay in exact
    integer space via the n*x - sum_x scaling (no division before the
    end), lag products are exact BIGINT sums over the day-grain
    self-join (counts are small enough that n*x products fit int64
    comfortably at any calendar length), and the single denominator
    is two IEEE sqrts of exact integers. One fact pass builds the
    daily frame; the 15-lag expansion is calendar-sized. The
    reference has no time-series surface (SURVEY §2.2)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("x"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("y"),
    )
    seq = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("rn"), "x", "y"
    )
    stats = seq.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
    )
    dev = seq.crossJoin(F.broadcast(stats)).select(
        "rn",
        (F.col("x") * F.col("n") - F.col("sx")).cast("long").alias("dx"),
        (F.col("y") * F.col("n") - F.col("sy")).cast("long").alias("dy"),
    )
    den = dev.agg(
        (
            F.sqrt(F.sum(F.col("dx") * F.col("dx")).cast("double"))
            * F.sqrt(F.sum(F.col("dy") * F.col("dy")).cast("double"))
        ).alias("d")
    )
    lags = spark.range(-CCF_MAX_LAG, CCF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("k")
    )
    a = dev.alias("a")
    b = dev.alias("b")
    num = (
        F.broadcast(lags)
        .join(a, F.lit(True))
        .join(b, F.col("b.rn") == F.col("a.rn") + F.col("k"))
        .groupBy("k")
        .agg(
            F.sum(F.col("a.dx") * F.col("b.dy")).cast("long").alias("nq")
        )
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("k").alias("lag_days"),
        (F.col("nq").cast("double") / F.col("d")).alias("ccf"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: forecast revenue change (pure scan-aggregate)
# ---------------------------------------------------------------------------


@query(
    "q265_tpch_q6_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))
                    * CAST(l_discount AS DECIMAL(30,10))) AS DOUBLE)
             AS revenue_effect,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q265_tpch_q6_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the revenue that would have been gained by
    eliminating small mid-range discounts in one shipping year — the
    benchmark's pure scan-aggregate, and the cleanest pushdown
    showcase in the suite: ALL four predicates (date range, discount
    band, quantity cap) reach the parquet scan as PushedFilters, so
    row-group min/max statistics skip most of a 100 TB table before a
    single row is decoded, and the surviving rows fold into one
    DECIMAL partial sum per task. No join, no window, one exchange of
    a single row. The reference has no predicates beyond null checks
    (SURVEY §2.1 R7)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(30,10)")
                * F.col("l_discount").cast("decimal(30,10)")
            )
            .cast("double")
            .alias("revenue_effect"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: priorities of orders with late-shipped lines (EXISTS)
# ---------------------------------------------------------------------------


@query(
    "q266_late_shipment_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_late_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY 1
    """,
)
def q266_late_shipment_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q4 shape: how many orders per priority had at least one
    line shipped more than 60 days after ordering — the canonical
    EXISTS / semi-join report (does priority actually buy you
    speed?). The existence test is a LEFT SEMI join on the order key
    with the lateness comparison as a join-side predicate, so each
    order contributes at most once no matter how many late lines it
    has — no fan-out, no distinct needed. The orders date cut pushes
    to the scan and shrinks the semi-join's probe side first. One
    key-partitioned shuffle pair + a priority-grain rollup. Exact
    BIGINT counts. The reference has no subqueries (SURVEY §2.2)."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )
