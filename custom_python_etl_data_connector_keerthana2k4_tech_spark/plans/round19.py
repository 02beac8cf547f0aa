"""Round-19 additions: extreme-value, completeness, and decomposition
analytics — Gumbel block-maxima fit with a return level (capacity
planning for peak load), mean-excess ladder (peaks-over-threshold tail
profile), Lincoln-Petersen capture-recapture (how many documents exist
that NO source captured), shift-share decomposition of regional revenue
growth, and weekly growth accounting (new / retained / resurrected /
churned actives).

The reference computes none of these (complete operator surface:
/root/reference/etl_connector.py:53-242; SURVEY §2.1-2.2). All five are
oracle-paired (DuckDB) and auto-gated by tests/test_oracle.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.relational import DSUM, dsum
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

_EULER = 0.5772156649015329

# ---------------------------------------------------------------------------
# Gumbel block-maxima fit + 12-month return level
# ---------------------------------------------------------------------------


@query(
    "q327_gumbel_block_maxima",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             date_trunc('month', o_orderdate) AS month,
             count(*) AS x
      FROM orders GROUP BY 1, 2
    ), maxima AS (
      SELECT month, max(x) AS mx FROM daily GROUP BY 1
    ), mom AS (
      SELECT count(*) AS n, {DSUM('mx')} AS s, {DSUM('mx * mx')} AS ss
      FROM maxima
    ), fit AS (
      SELECT n,
             s / n AS m,
             sqrt(ss / n - (s / n) * (s / n))
               * sqrt(6.0) / pi() AS beta
      FROM mom
    )
    SELECT CAST(n AS BIGINT) AS n_blocks,
           m - {_EULER} * beta AS mu,
           beta,
           (m - {_EULER} * beta)
             - beta * ln(-ln(1 - 1.0 / 12)) AS return_level_12mo
    FROM fit
    """,
)
def q327_gumbel_block_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value capacity planning: monthly maxima of the daily order
    count fitted to a Gumbel distribution by method of moments
    (beta = s*sqrt(6)/pi, mu = mean - gamma*beta), plus the 12-month
    return level — the peak-day volume expected to be exceeded about
    once a year, which is the number you provision for (complements the
    capacity profile q257 and the CCDF ladder q228 with an actual
    extrapolation). Scale: the fact collapses to day cells, then to
    <=1 row per month; moments accumulate in decimal so both engines fit
    identical parameters. Reference has no statistics (SURVEY §2.2)."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderdate").cast("date").alias("day"),
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(F.count("*").alias("x"))
    )
    maxima = daily.groupBy("month").agg(F.max("x").alias("mx"))
    mom = maxima.agg(
        F.count("*").alias("n"),
        dsum("mx").alias("s"),
        dsum(F.col("mx") * F.col("mx")).alias("ss"),
    )
    m = F.col("s") / F.col("n")
    beta = F.sqrt(F.col("ss") / F.col("n") - m * m) * math.sqrt(6.0) / math.pi
    mu = m - _EULER * beta
    return mom.select(
        F.col("n").cast("long").alias("n_blocks"),
        mu.alias("mu"),
        beta.alias("beta"),
        (mu - beta * F.log(-F.log(F.lit(1 - 1.0 / 12)))).alias("return_level_12mo"),
    )


# ---------------------------------------------------------------------------
# Mean-excess ladder (peaks-over-threshold tail profile)
# ---------------------------------------------------------------------------


@query(
    "q328_mean_excess_ladder",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS x
      FROM orders GROUP BY 1
    ), th AS (
      SELECT unnest([0.90, 0.95, 0.99]) AS p,
             unnest(quantile_cont(CAST(x AS DOUBLE), [0.90, 0.95, 0.99])) AS u
      FROM daily
    )
    SELECT p, round(u, 6) AS threshold,
           CAST(count(CASE WHEN x > u THEN 1 END) AS BIGINT) AS n_exceed,
           {DSUM('CASE WHEN x > u THEN x - u ELSE 0 END')}
             / count(CASE WHEN x > u THEN 1 END) AS mean_excess
    FROM daily CROSS JOIN th
    GROUP BY p, u
    """,
)
def q328_mean_excess_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold tail profile: at the 90th/95th/99th
    percentile thresholds of daily volume, the mean excess E[X-u | X>u].
    A mean excess that GROWS with u flags a heavy tail (provision for
    the Gumbel/Frechet regime, q327); flat-or-falling means thin tails
    and the historical p99 is safe. Scale: the fact collapses to the day
    frame; the 3-row threshold ladder comes from one exact-percentile
    aggregate of that frame and broadcasts back (intentional
    constant-size nested loop); exceedance sums accumulate in decimal.
    Reference has no statistics (SURVEY §2.2)."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count("*").alias("x"))
    )
    probs = [0.90, 0.95, 0.99]
    th = daily.agg(
        F.percentile(F.col("x").cast("double"), F.lit(probs)).alias("us")
    ).select(
        F.posexplode(F.col("us")).alias("idx", "u"),
    ).select(
        F.element_at(F.lit(probs), F.col("idx") + 1).alias("p"), "u"
    )
    exceed = F.count(F.when(F.col("x") > F.col("u"), 1))
    return (
        daily.crossJoin(F.broadcast(th))
        .groupBy("p", "u")
        .agg(
            exceed.cast("long").alias("n_exceed"),
            (
                dsum(F.when(F.col("x") > F.col("u"), F.col("x") - F.col("u")).otherwise(0.0))
                / exceed
            ).alias("mean_excess"),
        )
        .select("p", F.round("u", 6).alias("threshold"), "n_exceed", "mean_excess")
    )


# ---------------------------------------------------------------------------
# Capture-recapture estimate of the un-captured document population
# ---------------------------------------------------------------------------


@query(
    "q329_capture_recapture",
    oracle="""
    WITH canon AS (
      SELECT source,
             trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
               AS canon
      FROM documents
    ), ranked AS (
      SELECT source, count(DISTINCT canon) AS n_docs,
             row_number() OVER (ORDER BY count(DISTINCT canon) DESC,
                                source ASC) AS rk
      FROM canon GROUP BY 1
    ), s1 AS (SELECT source, n_docs FROM ranked WHERE rk = 1),
    s2 AS (SELECT source, n_docs FROM ranked WHERE rk = 2),
    overlap AS (
      SELECT count(DISTINCT a.canon) AS m
      FROM canon a JOIN canon b ON a.canon = b.canon
      JOIN s1 ON a.source = s1.source
      JOIN s2 ON b.source = s2.source
    )
    SELECT s1.source AS source_1, s2.source AS source_2,
           CAST(s1.n_docs AS BIGINT) AS n1, CAST(s2.n_docs AS BIGINT) AS n2,
           CAST(overlap.m AS BIGINT) AS m_overlap,
           (CAST(s1.n_docs + 1 AS DOUBLE) * (s2.n_docs + 1))
             / (overlap.m + 1) - 1 AS chapman_estimate
    FROM s1 CROSS JOIN s2 CROSS JOIN overlap
    """,
)
def q329_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lincoln-Petersen capture-recapture over the two largest sources:
    treating each source's canonical-document set as an independent
    capture, the Chapman estimator (n1+1)(n2+1)/(m+1) - 1 estimates the
    TOTAL document population — including documents neither source
    crawled — the coverage question ("how much of the web did we miss")
    that per-source counts cannot answer (builds on q210's mirror
    census). Scale: canonicalization is a narrow map; per-source
    distincts and the pairwise overlap are aggregate-frame operations
    keyed on the canonical hash; the two chosen sources are deterministic
    (count desc, name asc). Exact integers into one division.
    Reference has no set operations (SURVEY §2.2)."""
    canon = load(spark, sf_dir, "documents").select(
        "source",
        F.trim(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
        ).alias("canon"),
    )
    ranked = (
        canon.groupBy("source")
        .agg(F.countDistinct("canon").alias("n_docs"))
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("n_docs"), F.asc("source"))),
        )
    )
    s1 = ranked.filter(F.col("rk") == 1).select(
        F.col("source").alias("source_1"), F.col("n_docs").alias("n1")
    )
    s2 = ranked.filter(F.col("rk") == 2).select(
        F.col("source").alias("source_2"), F.col("n_docs").alias("n2")
    )
    a = canon.join(F.broadcast(s1), F.col("source") == F.col("source_1")).select(
        F.col("canon").alias("ca")
    )
    b = canon.join(F.broadcast(s2), F.col("source") == F.col("source_2")).select(
        F.col("canon").alias("cb")
    )
    overlap = (
        a.join(b, F.col("ca") == F.col("cb"))
        .agg(F.countDistinct("ca").alias("m"))
    )
    return (
        s1.crossJoin(F.broadcast(s2))
        .crossJoin(F.broadcast(overlap))
        .select(
            "source_1",
            "source_2",
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            F.col("m").cast("long").alias("m_overlap"),
            (
                (F.col("n1") + 1).cast("double") * (F.col("n2") + 1) / (F.col("m") + 1) - 1
            ).alias("chapman_estimate"),
        )
    )


# ---------------------------------------------------------------------------
# Shift-share decomposition of regional revenue growth
# ---------------------------------------------------------------------------


@query(
    "q330_shift_share",
    oracle=f"""
    WITH base AS (
      SELECT n_name AS nation, c_mktsegment AS segment,
             CAST(year(o_orderdate) AS INT) AS yr,
             o_totalprice
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation ON n_nationkey = c_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    ), cell AS (
      SELECT nation, segment,
             {DSUM("CASE WHEN yr = 1996 THEN o_totalprice ELSE 0 END")} AS r96,
             {DSUM("CASE WHEN yr = 1997 THEN o_totalprice ELSE 0 END")} AS r97
      FROM base GROUP BY 1, 2
    ), seg AS (
      SELECT segment,
             {DSUM('r96')} AS s96, {DSUM('r97')} AS s97
      FROM cell GROUP BY 1
    ), tot AS (
      SELECT {DSUM('r96')} AS t96, {DSUM('r97')} AS t97 FROM cell
    ), decomp AS (
      SELECT c.nation,
             CAST(sum(CAST(c.r97 - c.r96 AS DECIMAL(30,10))) AS DOUBLE)
               AS actual_growth,
             CAST(sum(CAST(c.r96 * (tot.t97 / tot.t96 - 1) AS DECIMAL(30,10)))
                  AS DOUBLE) AS national_effect,
             CAST(sum(CAST(c.r96 * (seg.s97 / seg.s96 - tot.t97 / tot.t96)
                           AS DECIMAL(30,10))) AS DOUBLE) AS mix_effect,
             CAST(sum(CAST(c.r97 - c.r96 * seg.s97 / seg.s96
                           AS DECIMAL(30,10))) AS DOUBLE)
               AS competitive_effect
      FROM cell c JOIN seg ON c.segment = seg.segment CROSS JOIN tot
      GROUP BY 1
    )
    SELECT nation, round(actual_growth, 4) AS actual_growth,
           round(national_effect, 4) AS national_effect,
           round(mix_effect, 4) AS mix_effect,
           round(competitive_effect, 4) AS competitive_effect
    FROM decomp
    """,
)
def q330_shift_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift-share decomposition of each nation's 1996->1997 revenue
    growth into the national tide (what growing-with-the-market would
    deliver), the segment-mix effect (being concentrated in fast or slow
    segments), and the residual competitive effect — the
    regional-economics accounting identity (three effects sum exactly to
    actual growth) that q177's volume/price bridge doesn't cover. Scale:
    one fact pass builds (nation x segment x year) decimal cells;
    segment and grand totals are joins over that bounded frame with a
    one-row totals broadcast. Output rounded to 1e-4 so the final
    double products compare cleanly. Reference has no joins
    (SURVEY §2.2)."""
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = (
        load(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.year("o_orderdate").alias("yr"),
            "o_totalprice",
        )
    )
    cell = base.groupBy("nation", "segment").agg(
        dsum(F.when(F.col("yr") == 1996, F.col("o_totalprice")).otherwise(0.0)).alias("r96"),
        dsum(F.when(F.col("yr") == 1997, F.col("o_totalprice")).otherwise(0.0)).alias("r97"),
    )
    seg = cell.groupBy("segment").agg(dsum("r96").alias("s96"), dsum("r97").alias("s97"))
    tot = cell.agg(dsum("r96").alias("t96"), dsum("r97").alias("t97"))
    g_nat = F.col("t97") / F.col("t96") - 1
    g_seg = F.col("s97") / F.col("s96")
    joined = cell.join(F.broadcast(seg), "segment").crossJoin(F.broadcast(tot))
    decomp = joined.groupBy("nation").agg(
        dsum(F.col("r97") - F.col("r96")).alias("actual_growth"),
        dsum(F.col("r96") * g_nat).alias("national_effect"),
        dsum(F.col("r96") * (g_seg - F.col("t97") / F.col("t96"))).alias("mix_effect"),
        dsum(F.col("r97") - F.col("r96") * g_seg).alias("competitive_effect"),
    )
    return decomp.select(
        "nation",
        F.round("actual_growth", 4).alias("actual_growth"),
        F.round("national_effect", 4).alias("national_effect"),
        F.round("mix_effect", 4).alias("mix_effect"),
        F.round("competitive_effect", 4).alias("competitive_effect"),
    )


# ---------------------------------------------------------------------------
# Weekly growth accounting: new / retained / resurrected / churned
# ---------------------------------------------------------------------------


@query(
    "q331_growth_accounting",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
               // 7 AS week
      FROM events
    ), first_week AS (
      SELECT user_id, min(week) AS w0 FROM uw GROUP BY 1
    ), labeled AS (
      SELECT cur.week,
             sum(CASE WHEN f.w0 = cur.week THEN 1 ELSE 0 END) AS new_users,
             sum(CASE WHEN f.w0 < cur.week AND prev.user_id IS NOT NULL
                      THEN 1 ELSE 0 END) AS retained,
             sum(CASE WHEN f.w0 < cur.week AND prev.user_id IS NULL
                      THEN 1 ELSE 0 END) AS resurrected
      FROM uw cur
      JOIN first_week f ON cur.user_id = f.user_id
      LEFT JOIN uw prev ON prev.user_id = cur.user_id
                        AND prev.week = cur.week - 1
      GROUP BY 1
    ), churn AS (
      SELECT p.week + 1 AS week, count(*) AS churned
      FROM uw p LEFT JOIN uw nxt ON nxt.user_id = p.user_id
                                 AND nxt.week = p.week + 1
      WHERE nxt.user_id IS NULL
      GROUP BY 1
    )
    SELECT l.week,
           CAST(l.new_users AS BIGINT) AS new_users,
           CAST(l.retained AS BIGINT) AS retained,
           CAST(l.resurrected AS BIGINT) AS resurrected,
           CAST(COALESCE(c.churned, 0) AS BIGINT) AS churned
    FROM labeled l LEFT JOIN churn c ON l.week = c.week
    """,
)
def q331_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: each week's active users split into new
    (first-ever week), retained (also active last week), and resurrected
    (returning after a gap), plus the churned count (active last week,
    absent this week) — the four-way identity behind every growth
    dashboard, strictly finer than DAU/WAU stickiness (q193) or the
    daily new-vs-returning split (q212). Scale: the fact collapses to
    the distinct (user, week) frame once; first-week is one groupBy;
    adjacency is equi-joins on (user, week-1) — all hash-partitionable
    by user, no windows over raw events. Exact integers. Reference has
    no set operations (SURVEY §2.2)."""
    uw = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            (F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01")).cast("long") / 7)
            .cast("long")
            .alias("week"),
        )
        .distinct()
    )
    first_week = uw.groupBy("user_id").agg(F.min("week").alias("w0"))
    prev = uw.select(F.col("user_id").alias("p_user"), (F.col("week") + 1).alias("p_week"))
    labeled = (
        uw.join(first_week, "user_id")
        .join(
            prev,
            (F.col("user_id") == F.col("p_user")) & (F.col("week") == F.col("p_week")),
            "left",
        )
        .groupBy("week")
        .agg(
            F.sum(F.when(F.col("w0") == F.col("week"), 1).otherwise(0)).alias("new_users"),
            F.sum(
                F.when((F.col("w0") < F.col("week")) & F.col("p_user").isNotNull(), 1).otherwise(
                    0
                )
            ).alias("retained"),
            F.sum(
                F.when((F.col("w0") < F.col("week")) & F.col("p_user").isNull(), 1).otherwise(0)
            ).alias("resurrected"),
        )
    )
    nxt = uw.select(F.col("user_id").alias("n_user"), (F.col("week") - 1).alias("n_week"))
    churn = (
        uw.join(
            nxt,
            (F.col("user_id") == F.col("n_user")) & (F.col("week") == F.col("n_week")),
            "left_anti",
        )
        .groupBy((F.col("week") + 1).alias("week"))
        .agg(F.count("*").alias("churned"))
    )
    return (
        labeled.join(churn, "week", "left")
        .select(
            "week",
            F.col("new_users").cast("long").alias("new_users"),
            F.col("retained").cast("long").alias("retained"),
            F.col("resurrected").cast("long").alias("resurrected"),
            F.coalesce(F.col("churned"), F.lit(0)).cast("long").alias("churned"),
        )
    )
