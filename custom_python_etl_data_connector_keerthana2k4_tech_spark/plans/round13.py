"""Round-13 additions: spectral/forecast/uplift/survival evaluation —
single-frequency DFT power of the weekly cycle (periodogram probe),
AR(1) fit with an out-of-period one-step backtest against the naive
forecaster, Qini uplift-by-decile (incremental-conversion accounting),
Nelson-Aalen cumulative hazard (the additive twin of q216's
Kaplan-Meier product), and expected calibration error summarizing
q290's reliability bins.

The reference computes no statistics (its complete operator surface is
/root/reference/etl_connector.py:53-242; SURVEY §2.1-2.2). All five
queries are oracle-paired (DuckDB) and auto-gated by
tests/test_oracle.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.relational import DAVG, DSUM, davg, dsum
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

# ---------------------------------------------------------------------------
# Single-frequency DFT: weekly-cycle power of the daily order series
# ---------------------------------------------------------------------------

_TWO_PI_OVER_7 = 2.0 * math.pi / 7.0


@query(
    "q300_dft_weekly_power",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '1996-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
             count(*) AS x
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1
    ), m AS (
      SELECT sum(x) AS s, count(*) AS n FROM daily
    ), c AS (
      SELECT t, x - CAST(m.s AS DOUBLE) / m.n AS cx,
             cos({_TWO_PI_OVER_7} * t) AS ct,
             sin({_TWO_PI_OVER_7} * t) AS st,
             m.n AS n
      FROM daily CROSS JOIN m
    )
    SELECT CAST(max(n) AS BIGINT) AS n_days,
           {DSUM('cx * ct')} AS a,
           {DSUM('cx * st')} AS b,
           2.0 * sqrt({DSUM('cx * ct')} * {DSUM('cx * ct')}
                      + {DSUM('cx * st')} * {DSUM('cx * st')}) / max(n)
             AS weekly_amplitude,
           2.0 * ({DSUM('cx * ct')} * {DSUM('cx * ct')}
                  + {DSUM('cx * st')} * {DSUM('cx * st')})
             / (max(n) * {DSUM('cx * cx')}) AS power_share
    FROM c
    """,
)
def q300_dft_weekly_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-frequency discrete Fourier probe at period 7: the cosine
    and sine projections of the centered 1996 daily-order series, the
    implied weekly amplitude, and the share of series variance that the
    weekly line carries — the spectral complement to the weekday index
    (q183) and ACF (q252): those measure the cycle's SHAPE, this
    measures how much of the total energy it owns. Scale: the fact
    collapses to <=366 day cells in one pass; the projections are three
    decimal-accumulated sums over that calendar-bounded frame with one
    one-row mean broadcast. Trig terms are evaluated once per day cell,
    and outputs are amplitude-scale (not raw power) so 1-ULP libm
    differences between engines stay far below the 1e-6 comparison
    grain. Reference has no statistics (SURVEY §2.2)."""
    daily = (
        load(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01"))
        .groupBy(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1996-01-01"))
            .cast("long")
            .alias("t")
        )
        .agg(F.count("*").alias("x"))
    )
    m = daily.agg(F.sum("x").alias("s"), F.count("*").alias("n"))
    c = daily.join(F.broadcast(m)).select(
        (F.col("x") - F.col("s").cast("double") / F.col("n")).alias("cx"),
        F.cos(F.lit(_TWO_PI_OVER_7) * F.col("t")).alias("ct"),
        F.sin(F.lit(_TWO_PI_OVER_7) * F.col("t")).alias("st"),
        "n",
    )
    a = dsum(F.col("cx") * F.col("ct"))
    b = dsum(F.col("cx") * F.col("st"))
    n = F.max("n")
    return c.agg(
        n.cast("long").alias("n_days"),
        a.alias("a"),
        b.alias("b"),
        (2.0 * F.sqrt(a * a + b * b) / n).alias("weekly_amplitude"),
        (2.0 * (a * a + b * b) / (n * dsum(F.col("cx") * F.col("cx")))).alias("power_share"),
    )


# ---------------------------------------------------------------------------
# AR(1) fit + out-of-period one-step backtest vs naive
# ---------------------------------------------------------------------------


@query(
    "q301_ar1_backtest",
    oracle=f"""
    WITH d96 AS (
      SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS x
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1
    ), m AS (
      SELECT sum(x) AS s, count(*) AS n FROM d96
    ), lag96 AS (
      SELECT x, lag(x) OVER (ORDER BY day) AS xp FROM d96
    ), fit AS (
      SELECT CAST(sum((m.n * x - m.s) * (m.n * xp - m.s)) AS DOUBLE)
               / sum((m.n * xp - m.s) * (m.n * xp - m.s)) AS phi,
             CAST(max(m.s) AS DOUBLE) / max(m.n) AS mu
      FROM lag96 CROSS JOIN m WHERE xp IS NOT NULL
    ), d97 AS (
      SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS x
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY 1
    ), lag97 AS (
      SELECT x, lag(x) OVER (ORDER BY day) AS xp FROM d97
    )
    SELECT max(f.phi) AS phi,
           CAST(count(*) AS BIGINT) AS n_test,
           {DAVG('abs(x - (f.mu + f.phi * (xp - f.mu)))')} AS mae_ar1,
           {DAVG('abs(x - xp)')} AS mae_naive
    FROM lag97 CROSS JOIN fit f WHERE xp IS NOT NULL
    """,
)
def q301_ar1_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) demand model with an honest out-of-period backtest: phi is
    the lag-1 regression coefficient of the 1996 daily series (computed
    from n-scaled integer deviations, so the fit is exact), and the
    one-step forecasts mu + phi*(x_prev - mu) are scored on 1997
    against the naive x_prev forecaster — the accept/reject gate every
    forecasting deployment needs (complements q163's seasonal-naive
    WAPE and q245's Holt backtest). Scale: two date-pruned passes
    collapse the fact to day frames; lags are ordered windows over
    those calendar-bounded frames; the fitted (phi, mu) is a one-row
    broadcast into the test frame. Reference has no statistics
    (SURVEY §2.2)."""
    def day_frame(year: int):
        return (
            load(spark, sf_dir, "orders")
            .filter(
                (F.col("o_orderdate") >= f"{year}-01-01")
                & (F.col("o_orderdate") < f"{year + 1}-01-01")
            )
            .groupBy(F.col("o_orderdate").cast("date").alias("day"))
            .agg(F.count("*").alias("x"))
        )

    d96 = day_frame(1996)
    m = d96.agg(F.sum("x").alias("s"), F.count("*").alias("n"))
    lag96 = d96.select(
        "x", F.lag("x").over(Window.orderBy("day")).alias("xp")
    )
    dev = lambda col: F.col("n") * F.col(col) - F.col("s")  # noqa: E731
    fit = (
        lag96.join(F.broadcast(m))
        .filter(F.col("xp").isNotNull())
        .agg(
            (
                F.sum(dev("x") * dev("xp")).cast("double")
                / F.sum(dev("xp") * dev("xp"))
            ).alias("phi"),
            (F.max("s").cast("double") / F.max("n")).alias("mu"),
        )
    )
    lag97 = day_frame(1997).select(
        "x", F.lag("x").over(Window.orderBy("day")).alias("xp")
    )
    pred = F.col("mu") + F.col("phi") * (F.col("xp") - F.col("mu"))
    return (
        lag97.join(F.broadcast(fit))
        .filter(F.col("xp").isNotNull())
        .agg(
            F.max("phi").alias("phi"),
            F.count("*").cast("long").alias("n_test"),
            davg(F.abs(F.col("x") - pred)).alias("mae_ar1"),
            davg(F.abs(F.col("x") - F.col("xp"))).alias("mae_naive"),
        )
    )


# ---------------------------------------------------------------------------
# Qini uplift curve by score decile
# ---------------------------------------------------------------------------


@query(
    "q302_qini_curve",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(((user_id * 2654435761) % 4294967296) // 2147483648
                  AS BIGINT) AS arm,
             CAST((((user_id * 2246822519) % 4294967296) * 10) // 4294967296
                  AS BIGINT) AS decile,
             max(CASE WHEN event_type = 'purchase' AND value > 95
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1
    ), cells AS (
      SELECT decile,
             sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nt,
             sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS nc,
             sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS ct,
             sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS cc
      FROM u GROUP BY 1
    ), cum AS (
      SELECT decile,
             sum(nt) OVER (ORDER BY decile DESC) AS cnt,
             sum(nc) OVER (ORDER BY decile DESC) AS cnc,
             sum(ct) OVER (ORDER BY decile DESC) AS cct,
             sum(cc) OVER (ORDER BY decile DESC) AS ccc
      FROM cells
    )
    SELECT decile,
           CAST(cnt AS BIGINT) AS n_treat,
           CAST(cnc AS BIGINT) AS n_ctrl,
           CASE WHEN cnc > 0
                THEN cct - ccc * CAST(cnt AS DOUBLE) / cnc END AS qini
    FROM cum
    """,
)
def q302_qini_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini uplift curve: targeting users from the highest model decile
    down, the cumulative incremental conversions of the treated arm over
    the rate-matched control arm — THE uplift-model acceptance chart
    (random targeting gives a flat curve; a working model front-loads
    the gain). Arm and decile come from the HIGH bits of two independent
    Knuth multiplicative hashes — low bits/residues of dense integer ids
    correlate (parity arm x residue decile left whole deciles
    control-free), high bits of distinct multipliers do not; re-runs
    stay bit-identical.
    Scale: one groupBy(user) collapses the fact, the decile frame is 10
    cells, and the cumulative accounting is a window over those cells
    — exact BIGINTs everywhere with one division per row. Reference has
    no statistics (SURVEY §2.2)."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 95), 1
                ).otherwise(0)
            ).alias("conv")
        )
        .select(
            F.floor(
                F.pmod(F.col("user_id") * 2654435761, F.lit(4294967296)) / F.lit(2147483648)
            )
            .cast("long")
            .alias("arm"),
            F.floor(
                F.pmod(F.col("user_id") * 2246822519, F.lit(4294967296)) * 10 / F.lit(4294967296)
            )
            .cast("long")
            .alias("decile"),
            "conv",
        )
    )
    cells = u.groupBy("decile").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("nt"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("nc"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias("cc"),
    )
    wdesc = Window.orderBy(F.desc("decile")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = cells.select(
        "decile",
        F.sum("nt").over(wdesc).alias("cnt"),
        F.sum("nc").over(wdesc).alias("cnc"),
        F.sum("ct").over(wdesc).alias("cct"),
        F.sum("cc").over(wdesc).alias("ccc"),
    )
    return cum.select(
        "decile",
        F.col("cnt").cast("long").alias("n_treat"),
        F.col("cnc").cast("long").alias("n_ctrl"),
        F.when(
            F.col("cnc") > 0,
            F.col("cct") - F.col("ccc") * F.col("cnt").cast("double") / F.col("cnc"),
        ).alias("qini"),
    )


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard (additive twin of Kaplan-Meier q216)
# ---------------------------------------------------------------------------


@query(
    "q303_nelson_aalen",
    oracle="""
    WITH u AS (
      SELECT user_id, min(ts) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
             max(ts) AS tmax
      FROM events GROUP BY 1
    ), obs AS (
      SELECT CASE WHEN tp IS NOT NULL THEN date_diff('day', t0, tp)
                  ELSE date_diff('day', t0, tmax) END AS t,
             CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM u
    ), risk AS (
      SELECT t, CAST(count(CASE WHEN ev = 1 THEN 1 END) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS leaving
      FROM obs GROUP BY t
    ), tab AS (
      SELECT t, d,
             CAST(sum(leaving) OVER (ORDER BY t DESC
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS n_risk
      FROM risk
    ), terms AS (
      SELECT t, d, n_risk,
             CAST(floor(1000000000 * CAST(d AS DOUBLE) / n_risk) AS BIGINT)
               AS h_nano
      FROM tab WHERE d > 0
    )
    SELECT CAST(t AS BIGINT) AS t, d, n_risk,
           CAST(sum(h_nano) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                AS DOUBLE) / 1000000000 AS cum_hazard
    FROM terms
    """,
)
def q303_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard of days-to-first-purchase with
    right censoring at last activity: H(t) = sum over event days of
    d/n_risk — the additive estimator that stays well-behaved where
    Kaplan-Meier's product (q216, same risk-table machinery) hits
    zero-survival cliffs, and the standard input to hazard-ratio
    eyeballing. Scale: one groupBy(user) collapses the fact; the risk
    table is day-grain; n_risk is a reverse-cumulative window; each
    hazard increment is nano-quantized (floor(1e9*d/n) of one exact
    division) before the ordered cumulative sum, so both engines add
    identical integers. Reference has no statistics (SURVEY §2.2)."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("t0"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
            F.max("ts").alias("tmax"),
        )
    )
    obs = u.select(
        F.when(
            F.col("tp").isNotNull(), F.datediff(F.col("tp").cast("date"), F.col("t0").cast("date"))
        )
        .otherwise(F.datediff(F.col("tmax").cast("date"), F.col("t0").cast("date")))
        .cast("long")
        .alias("t"),
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    risk = obs.groupBy("t").agg(
        F.count(F.when(F.col("ev") == 1, 1)).cast("long").alias("d"),
        F.count("*").cast("long").alias("leaving"),
    )
    tab = risk.select(
        "t",
        "d",
        F.sum("leaving")
        .over(Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("n_risk"),
    )
    terms = tab.filter(F.col("d") > 0).select(
        "t",
        "d",
        "n_risk",
        F.floor(F.lit(1_000_000_000) * F.col("d").cast("double") / F.col("n_risk"))
        .cast("long")
        .alias("h_nano"),
    )
    return terms.select(
        "t",
        "d",
        "n_risk",
        (
            F.sum("h_nano")
            .over(Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double")
            / 1_000_000_000
        ).alias("cum_hazard"),
    )


# ---------------------------------------------------------------------------
# Expected calibration error (summary of q290's reliability bins)
# ---------------------------------------------------------------------------


@query(
    "q304_expected_calibration_error",
    oracle=f"""
    WITH scored AS (
      SELECT ((user_id * 2654435761) % 1000) / 1000.0 AS score,
             CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
      FROM events
    ), bins AS (
      SELECT CAST(floor(score * 10) AS INT) AS bin, count(*) AS n,
             {DAVG('score')} AS conf, {DAVG('y')} AS acc
      FROM scored GROUP BY 1
    )
    SELECT CAST(sum(n) AS BIGINT) AS n_total,
           CAST(count(*) AS BIGINT) AS n_bins,
           {DSUM('n * abs(acc - conf)')} / sum(n) AS ece,
           max(abs(acc - conf)) AS mce
    FROM bins
    """,
)
def q304_expected_calibration_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected and maximum calibration error: the bin-weighted (ECE)
    and worst-bin (MCE) gap between predicted confidence and observed
    rate over q290's reliability bins — the one-number calibration
    verdict that decides whether the isotonic recalibration (q292) is
    worth deploying. Scale: the per-bin frame is 10 cells from one
    conditional pass; the summary is a second aggregate of that frame —
    no broadcast, no second fact pass. Decimal-exact averages feed an
    exact weighted absolute sum. Reference has no statistics
    (SURVEY §2.2)."""
    score = (F.pmod(F.col("user_id") * 2654435761, F.lit(1000)) / 1000.0).alias("score")
    y = F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0).alias("y")
    scored = load(spark, sf_dir, "events").select(score, y)
    bins = scored.groupBy(F.floor(F.col("score") * 10).cast("int").alias("bin")).agg(
        F.count("*").alias("n"),
        davg("score").alias("conf"),
        davg("y").alias("acc"),
    )
    gap = F.abs(F.col("acc") - F.col("conf"))
    return bins.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("n_bins"),
        (dsum(F.col("n") * gap) / F.sum("n")).alias("ece"),
        F.max(gap).alias("mce"),
    )
