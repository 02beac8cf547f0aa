"""Round-8 additions to the declared query surface (SURVEY §2.3 extensions).

Five more TPC-H shapes re-expressed over the fixture star schema
(Q7 bilateral trade flows, Q13 customer order-count distribution,
Q15 top revenue supplier, Q17 small-quantity bracket revenue, and a
Q21-style solo-late-supplier report adapted to the columns the fixture
carries), plus five distribution/association statistics a data-quality
pipeline runs before training-mix decisions: exact two-sample
Kolmogorov-Smirnov, categorical mutual information, Cramér's V with
full-grid chi-square, the Wald-Wolfowitz runs test, and permutation
entropy of a daily series — and a mixed-language document screen built
on the shared lang-ID definition.

The reference has no joins, statistics, or text analysis anywhere
(/root/reference/etl_connector.py:53-242 is its complete operator
surface, SURVEY §2.1-2.2). All queries here are oracle-paired (DuckDB)
and auto-gated by tests/test_oracle.py; operator semantics additionally
covered in tests/test_round8.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions import text as TXT
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.relational import DSUM, dsum
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

# ---------------------------------------------------------------------------
# TPC-H Q7 shape: bilateral trade flows between two nations by ship year
# ---------------------------------------------------------------------------


@query(
    "q267_tpch_q7_trade_flows",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {DSUM('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
    ) shipping
    GROUP BY 1, 2, 3
    """,
)
def q267_tpch_q7_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue shipped between two trading nations in
    either direction, split by supplier nation / customer nation /
    ship year. The scale choices: both nation dims broadcast (the
    nation filter collapses each to one row, so the supplier and
    customer joins become broadcast hashes too once AQE sees the
    post-filter sizes); the two-year ship-date cut is pushed into the
    lineitem scan; and the only fact-fact shuffle left is
    lineitem ⋈ orders on orderkey. Revenue accumulates in DECIMAL
    (dsum) so both engines agree bit-for-bit. The reference has no
    join surface at all (SURVEY §2.2)."""
    n1 = F.broadcast(
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = F.broadcast(
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: distribution of customers by order count
# ---------------------------------------------------------------------------


@query(
    "q268_tpch_q13_custdist",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q268_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed exactly k orders,
    INCLUDING the zero-order customers the inner left join keeps
    (count(o_orderkey) ignores the null-extended rows, so they land
    in the k=0 bucket — an inner join would silently drop them).
    Two cascaded aggregations: the first shuffles on c_custkey
    (same key as the join, so AQE reuses the exchange), the second
    collapses to at most a few hundred distinct counts. All-integer
    output. The reference has no outer-join surface (SURVEY §2.2)."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: top revenue supplier over one quarter
# ---------------------------------------------------------------------------


@query(
    "q269_tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(30,10))) * 100) AS BIGINT)
               AS total_rev_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_rev_cents
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev_cents = (SELECT max(total_rev_cents) FROM rev)
    """,
)
def q269_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with the maximum revenue over
    one quarter. The reference formulation is a view + scalar-subquery
    max; here the max-equality becomes a rank()==1 window over the
    ALREADY-AGGREGATED supplier-grain frame (supplier-count rows, not
    fact rows), which keeps ties exactly like the = max predicate and
    costs one tiny single-partition window instead of a second scan of
    the view. Revenue is pinned to integer cents via a DECIMAL rollup
    so the max comparison is exact — a double sum could make the
    oracle and engine disagree about who is 'the' top supplier.
    Supplier dim joins broadcast. The reference has no aggregation
    surface (SURVEY §2.2)."""
    rev = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(30,10)")
                )
                * 100,
                0,
            )
            .cast("long")
            .alias("total_rev_cents")
        )
    )
    top = rev.withColumn(
        "rk", F.rank().over(Window.orderBy(F.desc("total_rev_cents")))
    ).filter(F.col("rk") == 1)
    supp = F.broadcast(
        load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return top.join(supp, F.col("l_suppkey") == F.col("s_suppkey")).select(
        "s_suppkey", "s_name", "total_rev_cents"
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: small-quantity-order revenue for one brand
# ---------------------------------------------------------------------------


@query(
    "q270_tpch_q17_small_qty",
    oracle=f"""
    WITH bl AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#11'
    ), pq AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(count(*) AS BIGINT) AS cnt
      FROM bl GROUP BY 1
    )
    SELECT {DSUM('l_extendedprice')} / 7.0 AS avg_yearly
    FROM bl JOIN pq USING (l_partkey)
    WHERE CAST(l_quantity AS BIGINT) * 5 * cnt < sum_qty
    """,
)
def q270_tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: yearly revenue lost if small-quantity orders
    (below 20% of the per-part average) for one brand were no longer
    filled. The correlated per-part avg-quantity subquery becomes a
    per-part aggregate joined back — and because the correlation is
    per part, the aggregate is computed AFTER the broadcast brand
    filter, so at 100 TB the avg runs over the ~1/brand-count
    slice instead of the whole fact table. The 20%-of-average
    predicate is rearranged into pure integers (qty*5*cnt < sum):
    fixture quantities are integral, so both engines compare exact
    BIGINTs instead of a double 0.2*avg at the bracket boundary. One
    fact shuffle on l_partkey shared by the aggregate and the join
    (AQE reuses the exchange). The reference has no subquery surface
    (SURVEY §2.2)."""
    part = F.broadcast(
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#11")
        .select("p_partkey")
    )
    bl = (
        load(spark, sf_dir, "lineitem")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    pq = bl.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        bl.join(pq, "l_partkey")
        .filter(
            F.col("l_quantity").cast("long") * 5 * F.col("cnt")
            < F.col("sum_qty")
        )
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape (adapted): solo-late suppliers on multi-supplier orders
# ---------------------------------------------------------------------------


@query(
    "q271_solo_late_suppliers",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY 1, 2
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM li l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.late = 1
      AND EXISTS (SELECT 1 FROM li l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM li l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late = 1)
    GROUP BY 1
    """,
)
def q271_solo_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape adapted to the fixture's columns (lateness =
    shipped >90 days after the order date, since l_commitdate /
    l_receiptdate aren't carried): suppliers who were the ONLY late
    shipper on an order that involved at least two suppliers. The
    oracle keeps Q21's EXISTS / NOT EXISTS formulation; the engine
    collapses both correlated probes into one window over the
    (order, supplier)-grain frame — count(*) and sum(late) per
    orderkey answer 'is there another supplier' and 'is anyone else
    late' without re-joining li to itself twice. That is one shuffle
    on orderkey over an already-aggregated frame versus Q21's
    textbook plan of two extra semi/anti joins of the full fact
    table. Supplier dim broadcasts. The reference has no subquery
    surface (SURVEY §2.2)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    flagged = li.select(
        "l_suppkey",
        "late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("late").over(w).alias("n_late"),
    ).filter(
        (F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
    )
    supp = F.broadcast(
        load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        flagged.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Exact two-sample Kolmogorov-Smirnov test (integer-maximized D)
# ---------------------------------------------------------------------------


@query(
    "q272_ks_two_sample",
    oracle="""
    WITH s AS (
      SELECT o_totalprice AS x,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS grp
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ), c AS (
      SELECT x,
             CAST(count(CASE WHEN grp = 1 THEN 1 END) AS BIGINT) AS c1,
             CAST(count(CASE WHEN grp = 0 THEN 1 END) AS BIGINT) AS c2
      FROM s GROUP BY x
    ), r AS (
      SELECT sum(c1) OVER (ORDER BY x) AS r1,
             sum(c2) OVER (ORDER BY x) AS r2,
             sum(c1) OVER () AS n1,
             sum(c2) OVER () AS n2
      FROM c
    ), agg AS (
      SELECT CAST(max(abs(r1 * n2 - r2 * n1)) AS BIGINT) AS dnum,
             CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2
      FROM r
    )
    SELECT n1, n2,
           CAST(dnum AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2) AS ks_d,
           sqrt(CAST(n1 AS DOUBLE) * n2 / (CAST(n1 AS DOUBLE) + n2))
             * (CAST(dnum AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2))
             AS ks_scaled
    FROM agg
    """,
)
def q272_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov: the maximum ECDF gap
    between URGENT and LOW order prices — the distribution-shape
    companion to q237's Mann-Whitney (which only sees location
    shifts; KS also catches variance/shape changes). The trick that
    keeps it exact: D is maximized in INTEGER space as
    max|r1*n2 - r2*n1| over the value-grain cumulative counts, and
    only the winning integer is divided once into a double. The
    cumulative counts run over the DISTINCT-price frame — which can
    itself be huge for a continuous score, so they run as
    operators/ranks.with_running_sums (range repartition + per-range
    windows + broadcast offsets, both ECDFs in ONE pass) and the
    totals n1,n2 join back as a broadcast single row. The reference
    has no statistics (SURVEY §2.2)."""
    s = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            F.col("o_totalprice").alias("x"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("grp"),
        )
    )
    c = s.groupBy("x").agg(
        F.count(F.when(F.col("grp") == 1, 1)).alias("c1"),
        F.count(F.when(F.col("grp") == 0, 1)).alias("c2"),
    )
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.ranks import with_running_sums

    cum = with_running_sums(
        c, [F.col("x").asc()], {"r1": "c1", "r2": "c2"}
    )
    totals = c.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    r = cum.select("r1", "r2").crossJoin(F.broadcast(totals))
    agg = r.agg(
        F.max(F.abs(F.col("r1") * F.col("n2") - F.col("r2") * F.col("n1")))
        .cast("long")
        .alias("dnum"),
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    d = F.col("dnum").cast("double") / (n1d * F.col("n2"))
    return agg.select(
        "n1",
        "n2",
        d.alias("ks_d"),
        (F.sqrt(n1d * F.col("n2") / (n1d + F.col("n2"))) * d).alias(
            "ks_scaled"
        ),
    )


# ---------------------------------------------------------------------------
# Categorical mutual information (source x lang association, exact counts)
# ---------------------------------------------------------------------------


@query(
    "q273_mutual_information",
    oracle="""
    WITH cells AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ), m AS (
      SELECT c,
             sum(c) OVER () AS n,
             sum(c) OVER (PARTITION BY source) AS cs,
             sum(c) OVER (PARTITION BY lang) AS cl
      FROM cells
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_cells,
           sum((CAST(c AS DOUBLE) / n)
               * ln((CAST(c AS DOUBLE) * n)
                    / (CAST(cs AS DOUBLE) * cl))) AS mi_nats
    FROM m
    """,
)
def q273_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between document source and language: how
    many nats knowing the source tells you about the language — the
    association-strength screen behind training-mix decisions (if
    MI ~ 0 the source split carries no language signal; if high, a
    per-source language rebalance like q100/q249 is warranted).
    One classify-free count pass collapses the corpus to the
    source x lang cell frame; the joint, row-margin and
    column-margin totals all come from windows over that tiny frame
    (no joins, no second scan), and every count stays an exact
    BIGINT until the final p*ln(p-ratio) terms. Summation over
    ~|sources|x|langs| cells is rounding-stable at 6dp. The
    reference has no statistics surface (SURVEY §2.2)."""
    cells = (
        load(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    m = cells.select(
        "c",
        F.sum("c").over(Window.partitionBy()).alias("n"),
        F.sum("c").over(Window.partitionBy("source")).alias("cs"),
        F.sum("c").over(Window.partitionBy("lang")).alias("cl"),
    )
    cd = F.col("c").cast("double")
    return m.agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(
            (cd / F.col("n"))
            * F.log(
                (cd * F.col("n"))
                / (F.col("cs").cast("double") * F.col("cl"))
            )
        ).alias("mi_nats"),
    )


# ---------------------------------------------------------------------------
# Cramér's V over the full source x lang grid (zero-observed cells included)
# ---------------------------------------------------------------------------


@query(
    "q274_cramers_v",
    oracle="""
    WITH cells AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ), sm AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS cs FROM cells GROUP BY 1
    ), lm AS (
      SELECT lang, CAST(sum(c) AS BIGINT) AS cl FROM cells GROUP BY 1
    ), grid AS (
      SELECT sm.source, lm.lang, sm.cs, lm.cl,
             CAST(coalesce(cells.c, 0) AS BIGINT) AS o
      FROM sm CROSS JOIN lm
      LEFT JOIN cells ON cells.source = sm.source AND cells.lang = lm.lang
    ), tot AS (
      SELECT CAST(sum(o) AS BIGINT) AS n,
             CAST(count(DISTINCT source) AS BIGINT) AS r,
             CAST(count(DISTINCT lang) AS BIGINT) AS k
      FROM grid
    ), chi AS (
      SELECT sum(power(CAST(o AS DOUBLE)
                         - CAST(cs AS DOUBLE) * cl / (SELECT n FROM tot), 2)
                 / (CAST(cs AS DOUBLE) * cl / (SELECT n FROM tot))) AS chi2
      FROM grid
    )
    SELECT n, r, k, chi2,
           CAST((r - 1) * (k - 1) AS BIGINT) AS dof,
           sqrt(chi2 / (CAST(n AS DOUBLE) * least(r - 1, k - 1))) AS cramers_v
    FROM tot, chi
    """,
)
def q274_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for source x lang: q147's chi-square turned into a
    0..1 effect size comparable across tables of different shape —
    and unlike q147, the expected-count sum runs over the FULL
    category grid (margin cross product, zero-observed cells
    included), because a structurally-empty cell still contributes
    its expected mass to chi-square. The grid is the cross of the
    two margin frames (|sources| x |langs| rows, intentionally a
    broadcast nested-loop — it never touches raw data), with the
    observed cells left-joined on. Margins and n stay exact BIGINTs;
    the (o-e)^2/e terms are the only doubles. The reference has no
    statistics surface (SURVEY §2.2)."""
    cells = (
        load(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sm = cells.groupBy("source").agg(F.sum("c").cast("long").alias("cs"))
    lm = cells.groupBy("lang").agg(F.sum("c").cast("long").alias("cl"))
    grid = (
        sm.crossJoin(F.broadcast(lm))
        .join(cells, ["source", "lang"], "left")
        .select(
            "source",
            "lang",
            "cs",
            "cl",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("o"),
        )
    )
    tot = grid.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("source").alias("r"),
        F.countDistinct("lang").alias("k"),
    )
    g = grid.crossJoin(F.broadcast(tot))
    e = F.col("cs").cast("double") * F.col("cl") / F.col("n")
    chi = g.groupBy("n", "r", "k").agg(
        F.sum(F.pow(F.col("o").cast("double") - e, 2) / e).alias("chi2")
    )
    return chi.select(
        "n",
        "r",
        "k",
        "chi2",
        ((F.col("r") - 1) * (F.col("k") - 1)).cast("long").alias("dof"),
        F.sqrt(
            F.col("chi2")
            / (
                F.col("n").cast("double")
                * F.least(F.col("r") - 1, F.col("k") - 1)
            )
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on the daily order-count up/down sequence
# ---------------------------------------------------------------------------


@query(
    "q275_runs_test",
    oracle="""
    WITH d AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM orders GROUP BY 1
    ), ch AS (
      SELECT day, c - lag(c) OVER (ORDER BY day) AS diff FROM d
    ), s AS (
      SELECT day, CASE WHEN diff > 0 THEN 1 ELSE 0 END AS up
      FROM ch WHERE diff IS NOT NULL AND diff <> 0
    ), runs AS (
      SELECT up,
             CASE WHEN lag(up) OVER (ORDER BY day) IS NULL
                    OR lag(up) OVER (ORDER BY day) <> up
                  THEN 1 ELSE 0 END AS is_start
      FROM s
    ), agg AS (
      SELECT CAST(sum(is_start) AS BIGINT) AS n_runs,
             CAST(count(CASE WHEN up = 1 THEN 1 END) AS BIGINT) AS n_up,
             CAST(count(CASE WHEN up = 0 THEN 1 END) AS BIGINT) AS n_down
      FROM runs
    )
    SELECT n_runs, n_up, n_down,
           (CAST(n_runs AS DOUBLE)
              - (2.0 * n_up * n_down / (CAST(n_up AS DOUBLE) + n_down) + 1))
           / sqrt(2.0 * n_up * n_down
                  * (2.0 * n_up * n_down - CAST(n_up AS DOUBLE) - n_down)
                  / (power(CAST(n_up AS DOUBLE) + n_down, 2)
                     * (CAST(n_up AS DOUBLE) + n_down - 1))) AS z
    FROM agg
    """,
)
def q275_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test: is the daily order volume's up/down
    sequence random, or does it trend/oscillate? (Too few runs =
    momentum, too many = mean reversion — the nonparametric cousin
    of q252's ACF that needs no stationarity assumption.) Day-over-
    day signs come from exact BIGINT count differences (no-change
    days dropped, the standard treatment); a run starts wherever the
    sign differs from its lag, so n_runs is a sum of indicator
    integers. All windows run over the day-grain aggregate (a few
    thousand rows at any fact scale). Only the final z maps the
    three exact integers through the textbook mean/variance in
    doubles. The reference has no statistics surface (SURVEY §2.2)."""
    d = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wday = Window.orderBy("day")
    s = (
        d.select("day", (F.col("c") - F.lag("c").over(wday)).alias("diff"))
        .filter(F.col("diff").isNotNull() & (F.col("diff") != 0))
        .select("day", F.when(F.col("diff") > 0, 1).otherwise(0).alias("up"))
    )
    runs = s.select(
        "up",
        F.when(
            F.lag("up").over(wday).isNull()
            | (F.lag("up").over(wday) != F.col("up")),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    agg = runs.agg(
        F.sum("is_start").cast("long").alias("n_runs"),
        F.count(F.when(F.col("up") == 1, 1)).alias("n_up"),
        F.count(F.when(F.col("up") == 0, 1)).alias("n_down"),
    )
    nu = F.col("n_up").cast("double")
    ndn = F.col("n_down").cast("double")
    mu = 2.0 * F.col("n_up") * F.col("n_down") / (nu + F.col("n_down")) + 1
    var = (
        2.0
        * F.col("n_up")
        * F.col("n_down")
        * (2.0 * F.col("n_up") * F.col("n_down") - nu - F.col("n_down"))
        / (F.pow(nu + F.col("n_down"), 2) * (nu + F.col("n_down") - 1))
    )
    return agg.select(
        "n_runs",
        "n_up",
        "n_down",
        ((F.col("n_runs").cast("double") - mu) / F.sqrt(var)).alias("z"),
    )


# ---------------------------------------------------------------------------
# Permutation entropy of the daily event-count series (order-3 patterns)
# ---------------------------------------------------------------------------


@query(
    "q276_permutation_entropy",
    oracle="""
    WITH d AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ), t AS (
      SELECT c AS c0,
             lead(c, 1) OVER (ORDER BY day) AS c1,
             lead(c, 2) OVER (ORDER BY day) AS c2
      FROM d
    ), p AS (
      SELECT (CASE WHEN c1 > c0 THEN 4 ELSE 0 END
              + CASE WHEN c2 > c0 THEN 2 ELSE 0 END
              + CASE WHEN c2 > c1 THEN 1 ELSE 0 END) AS pat
      FROM t WHERE c2 IS NOT NULL
    ), h AS (
      SELECT pat, CAST(count(*) AS BIGINT) AS k, sum(count(*)) OVER () AS n
      FROM p GROUP BY 1
    )
    SELECT CAST(max(n) AS BIGINT) AS n_windows,
           CAST(count(*) AS BIGINT) AS n_patterns,
           sum(-(CAST(k AS DOUBLE) / n) * ln(CAST(k AS DOUBLE) / n))
             AS perm_entropy,
           sum(-(CAST(k AS DOUBLE) / n) * ln(CAST(k AS DOUBLE) / n))
             / ln(6.0) AS normalized
    FROM h
    """,
)
def q276_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation entropy (order 3) of the daily event-count series:
    the Shannon entropy of the distribution of ordinal patterns each
    sliding 3-day window traces (Bandt-Pompe). Low entropy = the
    series repeats the same up/down shapes (strong determinism);
    near ln(6) = shape-random. Complements q252 (ACF measures LINEAR
    memory; permutation entropy sees any monotone structure). The
    ordinal pattern is encoded as a 3-bit integer of exact BIGINT
    comparisons — no ranks, no doubles — over the day-grain
    aggregate; the pattern histogram is at most 6 rows, and entropy
    is the only double arithmetic. The reference has no time-series
    surface (SURVEY §2.2)."""
    d = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wday = Window.orderBy("day")
    t = d.select(
        F.col("c").alias("c0"),
        F.lead("c", 1).over(wday).alias("c1"),
        F.lead("c", 2).over(wday).alias("c2"),
    )
    p = t.filter(F.col("c2").isNotNull()).select(
        (
            F.when(F.col("c1") > F.col("c0"), 4).otherwise(0)
            + F.when(F.col("c2") > F.col("c0"), 2).otherwise(0)
            + F.when(F.col("c2") > F.col("c1"), 1).otherwise(0)
        ).alias("pat")
    )
    h = (
        p.groupBy("pat")
        .agg(F.count(F.lit(1)).alias("k"))
        .select("pat", "k", F.sum("k").over(Window.partitionBy()).alias("n"))
    )
    kd = F.col("k").cast("double")
    ent = F.sum(-(kd / F.col("n")) * F.log(kd / F.col("n")))
    return h.agg(
        F.max("n").cast("long").alias("n_windows"),
        F.count(F.lit(1)).alias("n_patterns"),
        ent.alias("perm_entropy"),
        (ent / F.log(F.lit(6.0))).alias("normalized"),
    )


# ---------------------------------------------------------------------------
# Mixed-language document screen (half-vs-half lang-ID disagreement)
# ---------------------------------------------------------------------------


@query(
    "q277_mixed_lang_screen",
    oracle=f"""
    WITH s AS (
      SELECT
        {TXT.sql_lang_id("substr(text, 1, CAST(floor(length(text) / 2) AS INT))")}
          AS lang_head,
        {TXT.sql_lang_id(
            "substr(text, CAST(floor(length(text) / 2) AS INT) + 1, length(text))"
        )}
          AS lang_tail
      FROM documents
    )
    SELECT lang_head, lang_tail,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS share
    FROM s GROUP BY 1, 2
    """,
)
def q277_mixed_lang_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-language document screen: classify each document's first
    and second half independently with the SAME lang-ID definition
    (functions/text.py renders it to both engines) and report the
    head x tail language matrix — off-diagonal mass flags documents
    that switch language mid-text, which single-label lang-ID (q40,
    q180) silently averages away and which contaminate monolingual
    training mixes. The halves split on character length with an
    exact truncating cast, so both engines classify byte-identical
    substrings; one scan, one tiny-matrix aggregate, a window for
    the share denominator. The reference has no text analysis
    (SURVEY §2.2)."""
    docs = load(spark, sf_dir, "documents")
    half = (F.length("text") / 2).cast("int")
    s = docs.select(
        TXT.lang_id(F.expr("substr(text, 1, CAST(floor(length(text) / 2) AS INT))"))
        .alias("lang_head"),
        TXT.lang_id(
            F.expr(
                "substr(text, CAST(floor(length(text) / 2) AS INT) + 1,"
                " length(text))"
            )
        ).alias("lang_tail"),
    )
    return (
        s.groupBy("lang_head", "lang_tail")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "lang_head",
            "lang_tail",
            "n_docs",
            (
                F.col("n_docs").cast("double")
                / F.sum("n_docs").over(Window.partitionBy())
            ).alias("share"),
        )
    )
