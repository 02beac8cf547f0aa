"""Round-20 additions: causal and tail inference — the Hill tail-index
estimator (how heavy is the order-value tail, built on the distributed
exact-quantile operator), a difference-in-differences readout, a
Simpson's-paradox sign-reversal screen (aggregate vs within-brand
slopes), a negative-binomial overdispersion fit, and EXACT Shapley
attribution over three exposure channels (closed-form, 8 coalition
cells).

The reference computes none of these (complete operator surface:
/root/reference/etl_connector.py:53-242; SURVEY §2.1-2.2). All five are
oracle-paired (DuckDB) and auto-gated by tests/test_oracle.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.relational import DSUM, dsum
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

# ---------------------------------------------------------------------------
# Hill tail-index estimator over the order-value distribution
# ---------------------------------------------------------------------------


@query(
    "q332_hill_tail_index",
    oracle=f"""
    WITH th AS (
      SELECT quantile_cont(o_totalprice, 0.99) AS u FROM orders
    )
    SELECT CAST(count(CASE WHEN o_totalprice > u THEN 1 END) AS BIGINT)
             AS n_tail,
           round(max(u), 6) AS threshold,
           1.0 / ({DSUM('CASE WHEN o_totalprice > u THEN ln(o_totalprice / u) '
                        'ELSE 0 END')}
                  / count(CASE WHEN o_totalprice > u THEN 1 END))
             AS hill_alpha
    FROM orders CROSS JOIN th
    """,
)
def q332_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the order-value tail index over the top 1%:
    alpha = 1 / mean(ln(x/u)) for exceedances of the p99 threshold —
    alpha <= 2 means infinite-variance revenue concentration (VaR q186
    and the CCDF ladder q228 are then the only honest risk summaries);
    large alpha means the tail is effectively exponential. Scale: the
    threshold comes from operators/quantiles.exact_quantiles — the
    range-bucketed two-phase exact quantile whose scans are all
    full-parallel (NOT the single-thread percentile UDAF) — and the tail
    pass is one conditional decimal aggregate with the threshold as a
    literal. The oracle recomputes the identical quantile_cont
    threshold. Reference has no statistics (SURVEY §2.2)."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.quantiles import exact_quantiles

    orders = load(spark, sf_dir, "orders")
    u = exact_quantiles(orders, "o_totalprice", [0.99])[0]
    tail = F.count(F.when(F.col("o_totalprice") > u, 1))
    return orders.agg(
        tail.cast("long").alias("n_tail"),
        F.round(F.lit(u), 6).alias("threshold"),
        (
            1.0
            / (
                dsum(
                    F.when(
                        F.col("o_totalprice") > u, F.log(F.col("o_totalprice") / F.lit(u))
                    ).otherwise(0.0)
                )
                / tail
            )
        ).alias("hill_alpha"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences around the mid-January policy date
# ---------------------------------------------------------------------------


@query(
    "q333_diff_in_diff",
    oracle="""
    WITH cells AS (
      SELECT CAST(((user_id * 2654435761) % 4294967296) // 2147483648
                  AS BIGINT) AS arm,
             CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 0 ELSE 1 END
               AS post,
             count(*) AS n,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
      FROM events GROUP BY 1, 2
    ), wide AS (
      SELECT
        max(CASE WHEN arm = 1 AND post = 1 THEN CAST(c AS DOUBLE) / n END) AS tp,
        max(CASE WHEN arm = 1 AND post = 0 THEN CAST(c AS DOUBLE) / n END) AS tb,
        max(CASE WHEN arm = 0 AND post = 1 THEN CAST(c AS DOUBLE) / n END) AS cp,
        max(CASE WHEN arm = 0 AND post = 0 THEN CAST(c AS DOUBLE) / n END) AS cb,
        max(CASE WHEN arm = 1 AND post = 1
                 THEN CAST(c AS DOUBLE) / n * (1 - CAST(c AS DOUBLE) / n) / n END)
          + max(CASE WHEN arm = 1 AND post = 0
                 THEN CAST(c AS DOUBLE) / n * (1 - CAST(c AS DOUBLE) / n) / n END)
          + max(CASE WHEN arm = 0 AND post = 1
                 THEN CAST(c AS DOUBLE) / n * (1 - CAST(c AS DOUBLE) / n) / n END)
          + max(CASE WHEN arm = 0 AND post = 0
                 THEN CAST(c AS DOUBLE) / n * (1 - CAST(c AS DOUBLE) / n) / n END)
          AS var_sum
      FROM cells
    )
    SELECT (tp - tb) - (cp - cb) AS did,
           sqrt(var_sum) AS se,
           ((tp - tb) - (cp - cb)) / sqrt(var_sum) AS z
    FROM wide
    """,
)
def q333_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the change in purchase share for the
    treated arm minus the change for control across the 2024-01-15
    boundary — the causal readout that survives level differences
    between arms that a plain post-period comparison (q130) would
    misattribute, with a four-cell binomial standard error. Scale: one
    conditional pass collapses the fact to a 2x2 integer cell frame;
    everything after is scalar arithmetic on exact counts. Arm is the
    high-bit Knuth hash. Reference has no statistics (SURVEY §2.2)."""
    cells = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.floor(
                F.pmod(F.col("user_id") * 2654435761, F.lit(4294967296)) / F.lit(2147483648)
            )
            .cast("long")
            .alias("arm"),
            F.when(F.col("ts") < "2024-01-15", 0).otherwise(1).alias("post"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("c"),
        )
    )
    rate = F.col("c").cast("double") / F.col("n")
    pvar = rate * (1 - rate) / F.col("n")

    def cell(a, p, expr):
        return F.max(F.when((F.col("arm") == a) & (F.col("post") == p), expr))

    wide = cells.agg(
        cell(1, 1, rate).alias("tp"),
        cell(1, 0, rate).alias("tb"),
        cell(0, 1, rate).alias("cp"),
        cell(0, 0, rate).alias("cb"),
        (
            cell(1, 1, pvar) + cell(1, 0, pvar) + cell(0, 1, pvar) + cell(0, 0, pvar)
        ).alias("var_sum"),
    )
    did = (F.col("tp") - F.col("tb")) - (F.col("cp") - F.col("cb"))
    return wide.select(
        did.alias("did"),
        F.sqrt(F.col("var_sum")).alias("se"),
        (did / F.sqrt(F.col("var_sum"))).alias("z"),
    )


# ---------------------------------------------------------------------------
# Simpson's-paradox screen: aggregate vs within-brand discount slopes
# ---------------------------------------------------------------------------


@query(
    "q334_sign_reversal_screen",
    oracle="""
    WITH pts AS (
      SELECT p_brand,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(round(l_discount * 100) AS BIGINT) AS d
      FROM lineitem JOIN part ON p_partkey = l_partkey
    ), brand AS (
      SELECT p_brand, count(*) AS n,
             sum(d) AS sd, sum(q) AS sq, sum(d * q) AS sdq, sum(d * d) AS sdd
      FROM pts GROUP BY 1
    ), overall AS (
      SELECT CAST(tn * tdq - td * tq AS DOUBLE)
               / (tn * tdd - td * td) AS slope_all
      FROM (SELECT sum(n) AS tn, sum(sd) AS td, sum(sq) AS tq,
                   sum(sdq) AS tdq, sum(sdd) AS tdd
            FROM brand)
    ), slopes AS (
      SELECT p_brand, n,
             CAST(n * sdq - sd * sq AS DOUBLE)
               / (n * sdd - sd * sd) AS slope_brand
      FROM brand WHERE n * sdd - sd * sd > 0
    )
    SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
           round(slope_brand, 8) AS slope_brand,
           round(slope_all, 8) AS slope_all,
           sign(slope_brand) <> sign(slope_all) AS reversed
    FROM slopes CROSS JOIN overall
    """,
)
def q334_sign_reversal_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen: the OLS slope of quantity on discount
    computed overall AND within each brand, flagging brands whose
    within-slope sign contradicts the aggregate — the structural check
    that q315's stratified odds ratio performs for proportions, here for
    a continuous dose-response (q229/q325). Every moment is an exact
    BIGINT (quantity integral, discount in integer percent), so slope
    signs are unambiguous; slopes are rounded to 1e-8 for comparison.
    Scale: one fact pass builds per-brand integer moments; the overall
    slope is an aggregate OF that frame broadcast back one-row.
    Reference has no statistics (SURVEY §2.2)."""
    part = F.broadcast(load(spark, sf_dir, "part").select("p_partkey", "p_brand"))
    pts = (
        load(spark, sf_dir, "lineitem")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_brand",
            F.col("l_quantity").cast("long").alias("q"),
            F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        )
    )
    brand = pts.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.sum("d").alias("sd"),
        F.sum("q").alias("sq"),
        F.sum(F.col("d") * F.col("q")).alias("sdq"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
    )
    overall = brand.agg(
        (
            (F.sum("n") * F.sum("sdq") - F.sum("sd") * F.sum("sq")).cast("double")
            / (F.sum("n") * F.sum("sdd") - F.sum("sd") * F.sum("sd"))
        ).alias("slope_all")
    )
    slope_b = (F.col("n") * F.col("sdq") - F.col("sd") * F.col("sq")).cast("double") / (
        F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd")
    )
    return (
        brand.filter(F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd") > 0)
        .crossJoin(F.broadcast(overall))
        .select(
            "p_brand",
            F.col("n").cast("long").alias("n_lines"),
            F.round(slope_b, 8).alias("slope_brand"),
            F.round("slope_all", 8).alias("slope_all"),
            (F.signum(slope_b) != F.signum(F.col("slope_all"))).alias("reversed"),
        )
    )


# ---------------------------------------------------------------------------
# Negative-binomial overdispersion fit of per-user weekly purchase counts
# ---------------------------------------------------------------------------


@query(
    "q335_negbin_fit",
    oracle=f"""
    WITH counts AS (
      SELECT user_id,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) // 7 AS week,
             count(CASE WHEN event_type = 'purchase' THEN 1 END) AS k
      FROM events GROUP BY 1, 2
    ), mom AS (
      SELECT count(*) AS n, {DSUM('k')} AS s, {DSUM('k * k')} AS ss
      FROM counts
    )
    SELECT CAST(n AS BIGINT) AS n_cells,
           s / n AS mean_k,
           (ss / n - (s / n) * (s / n)) / (s / n) AS dispersion,
           CASE WHEN ss / n - (s / n) * (s / n) > s / n
                THEN (s / n) * (s / n)
                     / (ss / n - (s / n) * (s / n) - s / n) END AS nb_r,
           CASE WHEN ss / n - (s / n) * (s / n) > s / n
                THEN (s / n) / (ss / n - (s / n) * (s / n)) END AS nb_p
    FROM mom
    """,
)
def q335_negbin_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial fit (method of moments) of per-user weekly
    purchase counts: r = m^2/(s^2 - m), p = m/s^2 — the parametric
    upgrade of q207's dispersion index that actually yields a usable
    count model for simulation and anomaly thresholds; NULL parameters
    when the data is UNDER-dispersed (Poisson or binomial territory —
    fitting NB would be wrong, and the query says so). Scale: one
    groupBy(user, week) conditional count, decimal moments of that
    bounded frame, scalar closed form. Reference has no statistics
    (SURVEY §2.2)."""
    counts = (
        load(spark, sf_dir, "events")
        .groupBy(
            "user_id",
            (F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01")).cast("long") / 7)
            .cast("long")
            .alias("week"),
        )
        .agg(F.count(F.when(F.col("event_type") == "purchase", 1)).alias("k"))
    )
    mom = counts.agg(
        F.count("*").alias("n"),
        dsum("k").alias("s"),
        dsum(F.col("k") * F.col("k")).alias("ss"),
    )
    m = F.col("s") / F.col("n")
    var = F.col("ss") / F.col("n") - m * m
    over = var > m
    return mom.select(
        F.col("n").cast("long").alias("n_cells"),
        m.alias("mean_k"),
        (var / m).alias("dispersion"),
        F.when(over, m * m / (var - m)).alias("nb_r"),
        F.when(over, m / var).alias("nb_p"),
    )


# ---------------------------------------------------------------------------
# Exact Shapley attribution over three exposure channels
# ---------------------------------------------------------------------------


@query(
    "q336_shapley_attribution",
    oracle="""
    WITH u AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               + 2 * max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               + 4 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               AS mask,
             max(CASE WHEN event_type = 'purchase' AND value > 95
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1
    ), v AS (
      SELECT mask, CAST(sum(conv) AS DOUBLE) / count(*) AS rate
      FROM u GROUP BY 1
    ), grid AS (
      SELECT m.mask, COALESCE(v.rate, 0.0) AS rate
      FROM (SELECT unnest(generate_series(0, 7)) AS mask) m
      LEFT JOIN v ON v.mask = m.mask
    ), wide AS (
      SELECT max(CASE WHEN mask = 0 THEN rate END) AS v0,
             max(CASE WHEN mask = 1 THEN rate END) AS v1,
             max(CASE WHEN mask = 2 THEN rate END) AS v2,
             max(CASE WHEN mask = 3 THEN rate END) AS v3,
             max(CASE WHEN mask = 4 THEN rate END) AS v4,
             max(CASE WHEN mask = 5 THEN rate END) AS v5,
             max(CASE WHEN mask = 6 THEN rate END) AS v6,
             max(CASE WHEN mask = 7 THEN rate END) AS v7
      FROM grid
    )
    SELECT channel, round(shapley, 8) AS shapley FROM (
      SELECT 'view' AS channel,
             (2.0 * (v1 - v0) + 1.0 * (v3 - v2) + 1.0 * (v5 - v4)
              + 2.0 * (v7 - v6)) / 6 AS shapley
      FROM wide
      UNION ALL
      SELECT 'click',
             (2.0 * (v2 - v0) + 1.0 * (v3 - v1) + 1.0 * (v6 - v4)
              + 2.0 * (v7 - v5)) / 6
      FROM wide
      UNION ALL
      SELECT 'signup',
             (2.0 * (v4 - v0) + 1.0 * (v5 - v1) + 1.0 * (v6 - v2)
              + 2.0 * (v7 - v3)) / 6
      FROM wide
    )
    """,
)
def q336_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley attribution of high-value conversion across three
    exposure channels (view/click/signup): the characteristic function
    is the conversion rate per exact exposure set (8 coalition cells),
    and each channel's Shapley value applies the closed-form weights
    |S|!(n-|S|-1)!/n! — the game-theoretic credit split that last-touch
    (q140) and U-shaped (q258) heuristics approximate. Empty coalition
    cells contribute rate 0 through an explicit 8-row mask grid so both
    engines agree on missing sets. Scale: one groupBy(user) builds
    (mask, conv); the coalition frame is 8 cells; the Shapley formula is
    scalar arithmetic with exact-rational inputs. At n channels the cell
    frame is 2^n — the exact method's honest limit (sampling
    permutations past ~15 channels). Reference has no statistics
    (SURVEY §2.2)."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (
                F.max(F.when(F.col("event_type") == "view", 1).otherwise(0))
                + 2 * F.max(F.when(F.col("event_type") == "click", 1).otherwise(0))
                + 4 * F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0))
            ).alias("mask"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") > 95), 1
                ).otherwise(0)
            ).alias("conv"),
        )
    )
    v = u.groupBy("mask").agg((F.sum("conv").cast("double") / F.count("*")).alias("rate"))
    grid = (
        spark.range(0, 8)
        .select(F.col("id").cast("int").alias("mask"))
        .join(F.broadcast(v), "mask", "left")
        .select("mask", F.coalesce(F.col("rate"), F.lit(0.0)).alias("rate"))
    )
    wide = grid.agg(
        *[
            F.max(F.when(F.col("mask") == i, F.col("rate"))).alias(f"v{i}")
            for i in range(8)
        ]
    )
    c = {i: F.col(f"v{i}") for i in range(8)}
    view = (2.0 * (c[1] - c[0]) + (c[3] - c[2]) + (c[5] - c[4]) + 2.0 * (c[7] - c[6])) / 6
    click = (2.0 * (c[2] - c[0]) + (c[3] - c[1]) + (c[6] - c[4]) + 2.0 * (c[7] - c[5])) / 6
    signup = (2.0 * (c[4] - c[0]) + (c[5] - c[1]) + (c[6] - c[2]) + 2.0 * (c[7] - c[3])) / 6
    out = wide.select(
        F.explode(
            F.array(
                F.struct(F.lit("view").alias("channel"), F.round(view, 8).alias("shapley")),
                F.struct(F.lit("click").alias("channel"), F.round(click, 8).alias("shapley")),
                F.struct(
                    F.lit("signup").alias("channel"), F.round(signup, 8).alias("shapley")
                ),
            )
        ).alias("s")
    )
    return out.select("s.channel", "s.shapley")
