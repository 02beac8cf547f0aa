"""Round-12 additions: monitoring & ML-support statistics — population
stability index (the industry-standard drift score), a Gini decision
stump (best single-feature split), degree assortativity of the
co-purchase graph, hold-out top-1 accuracy of a Markov next-event
predictor, the Hurst exponent via rescaled-range analysis (long-memory
screen for daily series), and the Cochran-Armitage trend test for
ordered proportions.

The reference computes no statistics of any kind (its complete operator
surface is /root/reference/etl_connector.py:53-242; SURVEY §2.1-2.2).
All six queries are oracle-paired (DuckDB) and auto-gated by
tests/test_oracle.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.relational import DSUM, dsum
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

# ---------------------------------------------------------------------------
# Population stability index (PSI) between two periods
# ---------------------------------------------------------------------------


@query(
    "q294_psi_drift",
    oracle="""
    WITH binned AS (
      SELECT CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
                  THEN 'base' ELSE 'cur' END AS period,
             least(greatest(CAST(floor(o_totalprice / 10000) AS INT), 0), 9)
               AS bin
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    ), cells AS (
      SELECT bin,
             sum(CASE WHEN period = 'base' THEN 1 ELSE 0 END) + 1 AS n_base,
             sum(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) + 1 AS n_cur
      FROM binned GROUP BY 1
    ), tot AS (
      SELECT sum(n_base) AS tb, sum(n_cur) AS tc FROM cells
    )
    SELECT bin,
           CAST(n_base AS DOUBLE) / tb AS p_base,
           CAST(n_cur AS DOUBLE) / tc AS p_cur,
           (CAST(n_cur AS DOUBLE) / tc - CAST(n_base AS DOUBLE) / tb)
             * ln((CAST(n_cur AS DOUBLE) / tc)
                  / (CAST(n_base AS DOUBLE) / tb)) AS psi_term
    FROM cells CROSS JOIN tot
    """,
)
def q294_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of the order-value distribution, 1996
    baseline vs 1997: fixed $10k-wide value bands, Laplace +1 counts so
    empty cells never produce infinities, per-bin
    (p_cur - p_base) * ln(p_cur / p_base) terms (their sum is THE model-
    monitoring drift score credit scoring standardized on). Scale: one
    conditional-count pass over the date-pruned fact (both year
    predicates push to the scan), a 10-cell frame, and a one-row totals
    broadcast — the fact shuffles once into 10 integer cells. Integer
    counts make both engines' ratios bit-identical. Reference has no
    statistics (SURVEY §2.2)."""
    binned = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
        )
        .select(
            F.when(F.col("o_orderdate") < "1997-01-01", "base").otherwise("cur").alias("period"),
            F.least(
                F.greatest(F.floor(F.col("o_totalprice") / 10000).cast("int"), F.lit(0)),
                F.lit(9),
            ).alias("bin"),
        )
    )
    cells = binned.groupBy("bin").agg(
        (F.sum(F.when(F.col("period") == "base", 1).otherwise(0)) + 1).alias("n_base"),
        (F.sum(F.when(F.col("period") == "cur", 1).otherwise(0)) + 1).alias("n_cur"),
    )
    tot = cells.agg(F.sum("n_base").alias("tb"), F.sum("n_cur").alias("tc"))
    pb = F.col("n_base").cast("double") / F.col("tb")
    pc = F.col("n_cur").cast("double") / F.col("tc")
    return cells.join(F.broadcast(tot)).select(
        "bin",
        pb.alias("p_base"),
        pc.alias("p_cur"),
        ((pc - pb) * F.log(pc / pb)).alias("psi_term"),
    )


# ---------------------------------------------------------------------------
# Gini decision stump: best single split of purchase propensity on hour
# ---------------------------------------------------------------------------


@query(
    "q295_gini_stump",
    oracle="""
    WITH cells AS (
      SELECT CAST(hour(ts) AS INT) AS h, count(*) AS n,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
      FROM events GROUP BY 1
    ), pre AS (
      SELECT h, n, pos,
             sum(n) OVER (ORDER BY h) AS cn,
             sum(pos) OVER (ORDER BY h) AS cpos,
             sum(n) OVER () AS tn,
             sum(pos) OVER () AS tpos
      FROM cells
    ), splits AS (
      SELECT h AS threshold,
             (CAST(cn AS DOUBLE) / tn)
               * (2.0 * cpos / cn * (1.0 - CAST(cpos AS DOUBLE) / cn))
             + (CAST(tn - cn AS DOUBLE) / tn)
               * (2.0 * (tpos - cpos) / (tn - cn)
                  * (1.0 - CAST(tpos - cpos AS DOUBLE) / (tn - cn)))
               AS weighted_gini
      FROM pre WHERE cn < tn
    )
    SELECT threshold, weighted_gini,
           CAST(row_number() OVER (ORDER BY weighted_gini ASC, threshold ASC)
                AS INT) AS rk
    FROM splits QUALIFY rk = 1
    """,
)
def q295_gini_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best decision stump on hour-of-day for purchase propensity: the
    split threshold minimizing weighted Gini impurity — the inner loop of
    tree induction, run as a data-quality probe for whether a feature
    carries signal. Scale: the fact collapses to 24 (hour, count, pos)
    cells in one map-side-combinable pass; prefix sums + the impurity
    formula are windows over that constant frame; the argmin is a
    deterministic rank with threshold tie-break. All inputs to every
    division are exact BIGINTs. Reference has no statistics
    (SURVEY §2.2)."""
    cells = (
        load(spark, sf_dir, "events")
        .groupBy(F.hour("ts").cast("int").alias("h"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("pos"),
        )
    )
    worder = Window.orderBy("h")
    wall = Window.partitionBy()
    pre = cells.select(
        "h",
        F.sum("n").over(worder).alias("cn"),
        F.sum("pos").over(worder).alias("cpos"),
        F.sum("n").over(wall).alias("tn"),
        F.sum("pos").over(wall).alias("tpos"),
    )
    cn, cpos = F.col("cn"), F.col("cpos")
    tn, tpos = F.col("tn"), F.col("tpos")
    left = (cn.cast("double") / tn) * (
        2.0 * cpos / cn * (1.0 - cpos.cast("double") / cn)
    )
    right = ((tn - cn).cast("double") / tn) * (
        2.0 * (tpos - cpos) / (tn - cn) * (1.0 - (tpos - cpos).cast("double") / (tn - cn))
    )
    splits = pre.filter(cn < tn).select(
        F.col("h").alias("threshold"), (left + right).alias("weighted_gini")
    )
    return (
        splits.withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.asc("weighted_gini"), F.asc("threshold")))
            .cast("int"),
        )
        .filter(F.col("rk") == 1)
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the co-purchase graph
# ---------------------------------------------------------------------------


@query(
    "q296_degree_assortativity",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), und AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ), deg AS (
      SELECT u, count(*) AS d FROM und GROUP BY 1
    ), ed AS (
      SELECT du.d AS x, dv.d AS y
      FROM und JOIN deg du ON und.u = du.u JOIN deg dv ON und.v = dv.u
    )
    SELECT CAST(count(*) AS BIGINT) AS m,
           (count(*) * CAST(sum(x * y) AS DOUBLE) - CAST(sum(x) AS DOUBLE) * sum(y))
             / (count(*) * CAST(sum(x * x) AS DOUBLE) - CAST(sum(x) AS DOUBLE) * sum(x))
             AS assortativity
    FROM ed
    """,
)
def q296_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph: Pearson correlation
    of endpoint degrees over the (symmetric) edge list — positive means
    hubs co-purchase with hubs (rich-club catalogs), negative means
    hub-and-spoke. Completes the graph-profile kit (q149 degrees, q117
    triangles, q254 modularity, q260 two-hop). The symmetric edge list
    makes x/y exchangeable, so the Pearson denominator reduces to the
    x-variance alone. Scale: the edge frame comes from the shared
    PERSISTED copurchase_edges basket expansion (it feeds both the degree
    aggregation and the edge join — no recompute); degrees are one
    groupBy; the two degree joins are hash joins on node keys; every
    moment is an exact BIGINT sum (degree products), so the single final
    division is the only floating step. Reference has no graph surface
    (SURVEY §2.2)."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.extensions import copurchase_und_edges

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    und = copurchase_und_edges(li)
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    ed = (
        und.join(deg.select(F.col("u").alias("du"), F.col("d").alias("x")), F.col("u") == F.col("du"))
        .join(deg.select(F.col("u").alias("dv"), F.col("d").alias("y")), F.col("v") == F.col("dv"))
        .select("x", "y")
    )
    m = F.count("*")
    sxy = F.sum(F.col("x") * F.col("y"))
    sx = F.sum("x")
    sy = F.sum("y")
    sxx = F.sum(F.col("x") * F.col("x"))
    return ed.agg(
        m.cast("long").alias("m"),
        (
            (m * sxy.cast("double") - sx.cast("double") * sy)
            / (m * sxx.cast("double") - sx.cast("double") * sx)
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Markov next-event predictor: hold-out top-1 accuracy
# ---------------------------------------------------------------------------


@query(
    "q297_markov_holdout_accuracy",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    ), train AS (
      SELECT event_type, next_type, count(*) AS cnt
      FROM seq
      WHERE next_type IS NOT NULL AND ts < TIMESTAMP '2024-01-21'
      GROUP BY 1, 2
    ), pred AS (
      SELECT event_type, next_type AS predicted FROM (
        SELECT event_type, next_type,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cnt DESC, next_type ASC) AS rk
        FROM train
      ) WHERE rk = 1
    )
    SELECT s.event_type,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN s.next_type = p.predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS hits,
           CAST(sum(CASE WHEN s.next_type = p.predicted THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS top1_accuracy
    FROM seq s JOIN pred p ON s.event_type = p.event_type
    WHERE s.next_type IS NOT NULL AND s.ts >= TIMESTAMP '2024-01-21'
    GROUP BY 1
    """,
)
def q297_markov_holdout_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline evaluation of the Markov next-event model (q122's
    transition matrix turned predictor): train argmax transitions on the
    first 20 days, score top-1 accuracy per source state on held-out
    transitions — the eval loop that decides whether sequence features
    earn their pipeline cost. Scale: ONE window pass (user-keyed
    lead) builds all transitions; the train aggregate collapses to the
    5x5 state grid; the predictor is a 5-row broadcast probe into the
    test transitions. Tie-break on (count desc, type asc) keeps the
    predictor deterministic. Integer hit counts; one final division.
    Reference has no windows or sequences (SURVEY §2.2)."""
    seq = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    train = (
        seq.filter(F.col("next_type").isNotNull() & (F.col("ts") < "2024-01-21"))
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("cnt"))
    )
    pred = (
        train.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(F.desc("cnt"), F.asc("next_type"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select(F.col("event_type").alias("pe"), F.col("next_type").alias("predicted"))
    )
    test = seq.filter(F.col("next_type").isNotNull() & (F.col("ts") >= "2024-01-21"))
    hits = F.sum(F.when(F.col("next_type") == F.col("predicted"), 1).otherwise(0))
    return (
        test.join(F.broadcast(pred), F.col("event_type") == F.col("pe"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            hits.cast("long").alias("hits"),
            (hits.cast("double") / F.count("*")).alias("top1_accuracy"),
        )
    )


# ---------------------------------------------------------------------------
# Hurst exponent via rescaled-range (R/S) analysis
# ---------------------------------------------------------------------------


@query(
    "q298_hurst_exponent",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '1996-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) AS di,
             count(*) AS x
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1
    ), sized AS (
      SELECT w, di // w AS blk, di, x FROM daily
      CROSS JOIN (SELECT unnest([8, 16, 32, 64]) AS w)
      WHERE di < (366 // w) * w
    ), blocks AS (
      SELECT w, blk, di, x,
             sum(x) OVER (PARTITION BY w, blk) AS s,
             count(*) OVER (PARTITION BY w, blk) AS bn,
             sum(x) OVER (PARTITION BY w, blk ORDER BY di) AS pre,
             row_number() OVER (PARTITION BY w, blk ORDER BY di) AS i
      FROM sized
    ), stats AS (
      SELECT w, blk,
             max(bn * pre - i * s) - min(bn * pre - i * s) AS scaled_range,
             max(bn) AS bn,
             sum((bn * x - s) * (bn * x - s)) AS scaled_ss
      FROM blocks GROUP BY 1, 2
    ), rs AS (
      SELECT w,
             {DSUM('CAST(scaled_range AS DOUBLE) * sqrt(CAST(bn AS DOUBLE)) / sqrt(CAST(scaled_ss AS DOUBLE))')}
               / count(*) AS avg_rs
      FROM stats WHERE scaled_ss > 0 AND bn = w
      GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_scales,
           (count(*) * {DSUM('ln(w) * ln(avg_rs)')}
              - {DSUM('ln(w)')} * {DSUM('ln(avg_rs)')})
             / (count(*) * {DSUM('ln(w) * ln(w)')}
                - {DSUM('ln(w)')} * {DSUM('ln(w)')}) AS hurst
    FROM rs
    """,
)
def q298_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the 1996 daily-order series via rescaled-range
    analysis: for block sizes 8/16/32/64 days, each block's range of
    cumulative deviations over its standard deviation, averaged per
    scale, then the log-log OLS slope — H > 0.5 flags long-memory
    (trending) demand, H < 0.5 mean reversion; the long-horizon
    complement to ACF (q252) and the runs test (q275). Scale: the fact
    collapses to <=366 day cells first; block statistics are windows
    over (scale x block) partitions of that calendar-bounded frame. All
    block moments are pre-scaled to exact BIGINTs (bn*pre - i*s and
    bn*x - s are integers), so the only floating steps are the final
    sqrt/ln/OLS — bit-identical on both engines. Reference has no
    statistics (SURVEY §2.2)."""
    daily = (
        load(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01"))
        .groupBy(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1996-01-01"))
            .cast("long")
            .alias("di")
        )
        .agg(F.count("*").alias("x"))
    )
    scales = spark.range(0, 1).select(
        F.explode(F.array(*[F.lit(w) for w in (8, 16, 32, 64)])).alias("w")
    )
    sized = daily.crossJoin(F.broadcast(scales)).filter(
        F.col("di") < (F.lit(366) / F.col("w")).cast("long") * F.col("w")
    ).select("w", (F.col("di") / F.col("w")).cast("long").alias("blk"), "di", "x")
    wblk = Window.partitionBy("w", "blk")
    word = Window.partitionBy("w", "blk").orderBy("di")
    blocks = sized.select(
        "w",
        "blk",
        "di",
        "x",
        F.sum("x").over(wblk).alias("s"),
        F.count("*").over(wblk).alias("bn"),
        F.sum("x").over(word).alias("pre"),
        F.row_number().over(word).alias("i"),
    )
    scaled_dev = F.col("bn") * F.col("pre") - F.col("i") * F.col("s")
    stats = blocks.groupBy("w", "blk").agg(
        (F.max(scaled_dev) - F.min(scaled_dev)).alias("scaled_range"),
        F.max("bn").alias("bn"),
        F.sum(
            (F.col("bn") * F.col("x") - F.col("s")) * (F.col("bn") * F.col("x") - F.col("s"))
        ).alias("scaled_ss"),
    )
    rs = (
        stats.filter((F.col("scaled_ss") > 0) & (F.col("bn") == F.col("w")))
        .groupBy("w")
        .agg(
            (
                dsum(
                    F.col("scaled_range").cast("double")
                    * F.sqrt(F.col("bn").cast("double"))
                    / F.sqrt(F.col("scaled_ss").cast("double"))
                )
                / F.count("*")
            ).alias("avg_rs")
        )
    )
    n = F.count("*")
    slx = dsum(F.log(F.col("w")))
    sly = dsum(F.log(F.col("avg_rs")))
    slxy = dsum(F.log(F.col("w")) * F.log(F.col("avg_rs")))
    slxx = dsum(F.log(F.col("w")) * F.log(F.col("w")))
    return rs.agg(
        n.cast("long").alias("n_scales"),
        ((n * slxy - slx * sly) / (n * slxx - slx * slx)).alias("hurst"),
    )


# ---------------------------------------------------------------------------
# Cochran-Armitage trend test for ordered proportions
# ---------------------------------------------------------------------------


@query(
    "q299_cochran_armitage",
    oracle="""
    WITH cells AS (
      SELECT least(CAST(floor(value / 20) AS INT), 4) AS band,
             count(*) AS n,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
      FROM events GROUP BY 1
    ), tot AS (
      SELECT sum(n) AS nt, sum(pos) AS rt,
             sum(band * n) AS sn, sum(band * band * n) AS snn,
             sum(band * pos) AS sp
      FROM cells
    )
    SELECT CAST(nt AS BIGINT) AS n_total,
           CAST(nt * sp - rt * sn AS DOUBLE)
             / sqrt(CAST(rt AS DOUBLE) * (nt - rt) * (nt * snn - sn * sn) / nt)
             AS ca_z
    FROM tot
    """,
)
def q299_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage test for a LINEAR trend in purchase proportion
    across ordered value bands (scores 0..4) — the right test when the
    alternative is monotone dose-response, where plain chi-square (q147)
    wastes power on unordered deviations. Scale: one conditional-count
    pass collapses the fact to 5 (band, n, pos) cells; every moment in
    the z statistic (nt*sp - rt*sn and the variance term) is an exact
    BIGINT product of those cell counts, so both engines perform one
    identical sqrt and one division. Reference has no statistics
    (SURVEY §2.2)."""
    cells = (
        load(spark, sf_dir, "events")
        .groupBy(F.least(F.floor(F.col("value") / 20).cast("int"), F.lit(4)).alias("band"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("pos"),
        )
    )
    nt = F.sum("n")
    rt = F.sum("pos")
    sn = F.sum(F.col("band") * F.col("n"))
    snn = F.sum(F.col("band") * F.col("band") * F.col("n"))
    sp = F.sum(F.col("band") * F.col("pos"))
    return cells.agg(
        nt.cast("long").alias("n_total"),
        (
            (nt * sp - rt * sn).cast("double")
            / F.sqrt(rt.cast("double") * (nt - rt) * (nt * snn - sn * sn) / nt)
        ).alias("ca_z"),
    )
