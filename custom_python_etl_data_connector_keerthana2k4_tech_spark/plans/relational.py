"""Relational query surface (SURVEY §2.3, categories the reference lacks —
§2.2 — delivered by built-in Spark and oracle-tested).

Determinism rules for the differential gate (FIXTURES.md §3):
- Alias every computed column identically in Spark and oracle SQL.
- Double SUMs go through DECIMAL(30,10): decimal addition is exact and
  order-independent, so Spark and DuckDB produce bit-identical doubles after
  the final cast — no dependence on float summation order or rounding rules.
  AVG is expressed as decimal-sum / count for the same reason.
- Per-row computed doubles are left raw: identical IEEE-754 ops on identical
  inputs are bit-identical across engines.
- Every window/rank orders by a unique tiebreaker so results are
  deterministic.
- Integer aggregates in DuckDB are CAST to BIGINT (DuckDB widens to
  HUGEINT, Spark keeps LongType).

Scale notes (100 TB thinking, checked via .explain on local runs):
- Filters/projections sit directly on the parquet scan (pushdown + pruning).
- Fixed-size dims (region/nation) broadcast explicitly; other joins shuffle
  on their equi keys with AQE handling skew and runtime strategy switches.
- Aggregations are partial (map-side combine) by construction via groupBy;
  decimal sums keep the combine exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load


def dsum(col: Column | str) -> Column:
    """Order-independent double sum: exact DECIMAL accumulation, then a
    deterministic cast back to double (matches oracle helper ``DSUM``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(30,10)")).cast("double")


def davg(col: Column | str) -> Column:
    """avg = exact decimal sum / count (deterministic double division)."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c)


def DSUM(expr: str) -> str:
    """Oracle-side twin of ``dsum`` (DuckDB SQL fragment)."""
    return f"CAST(sum(CAST({expr} AS DECIMAL(30,10))) AS DOUBLE)"


def DAVG(expr: str) -> str:
    return f"({DSUM(expr)} / count({expr}))"


# ---------------------------------------------------------------------------
# Aggregation: TPC-H Q1 shape (flagship)
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {DSUM('l_quantity')}                                     AS sum_qty,
           {DSUM('l_extendedprice')}                                AS sum_base_price,
           {DSUM('l_extendedprice * (1 - l_discount)')}             AS sum_disc_price,
           {DSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {DAVG('l_quantity')}                                     AS avg_qty,
           {DAVG('l_extendedprice')}                                AS avg_price,
           {DAVG('l_discount')}                                     AS avg_disc,
           count(*)                                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by + 8 aggregates over the fact table. One shuffle (partial agg
    map-side); the shipdate filter is pushed to the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Filter predicates (R7 generalization): comparison, BETWEEN, IN, LIKE, null
# ---------------------------------------------------------------------------


@query(
    "q02_filter_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_size BETWEEN 10 AND 30
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND p_type LIKE '%AN%'
      AND p_retailprice > 900.0
      AND p_name IS NOT NULL
    """,
)
def q02_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate filter; all conjuncts push down to the scan."""
    part = load(spark, sf_dir, "part")
    return part.filter(
        F.col("p_size").between(10, 30)
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & F.col("p_type").like("%AN%")
        & (F.col("p_retailprice") > 900.0)
        & F.col("p_name").isNotNull()
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


@query(
    "q03_project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
           CAST(year(l_shipdate) AS INT) AS ship_year
    FROM lineitem
    WHERE l_orderkey < 1000
    """,
)
def q03_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projection / rename / literal — reference R6 generalized.
    Raw doubles: identical IEEE ops are bit-identical across engines."""
    li = load(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.filter(F.col("l_orderkey") < 1000).select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("charged"),
        F.year("l_shipdate").cast("int").alias("ship_year"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "q04_join_inner",
    oracle=f"""
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           {DSUM('o.o_totalprice')} AS segment_revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY c.c_mktsegment
    """,
)
def q04_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join; customer is small relative to orders so AQE/stats
    pick broadcast at this SF; at 100 TB both sides shuffle on custkey."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("segment_revenue"),
        )
    )


@query(
    "q05_join_multiway",
    oracle=f"""
    SELECT n.n_name,
           {DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
      JOIN orders o   ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q05_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: fact-fact shuffle join + broadcast dimension joins.
    nation/region are broadcast explicitly (fixed-size dims at any SF)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "q06_join_left_outer",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           count(o.o_orderkey)                          AS n_orders,
           coalesce({DSUM('o.o_totalprice')}, 0.0)      AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q06_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


@query(
    "q07_join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nationkey, count(*) AS n_customers
                FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
                FROM supplier GROUP BY 1)
    SELECT coalesce(cn.nationkey, sn.nationkey) AS nationkey,
           coalesce(cn.n_customers, 0) AS n_customers,
           coalesce(sn.n_suppliers, 0) AS n_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
)
def q07_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates (nations having customers vs
    suppliers); right-outer is the mirrored case of the same plan."""
    cn = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    sn = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    joined = cn.join(sn, cn.nationkey == sn.nationkey, "full_outer")
    return joined.select(
        F.coalesce(cn.nationkey, sn.nationkey).alias("nationkey"),
        F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
        F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
    )


@query(
    "q08_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
    """,
)
def q08_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one big order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q09_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def q09_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no pending orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q10_join_theta",
    oracle="""
    SELECT e1.user_id,
           count(*) AS n_pairs,
           min(epoch_us(e2.ts) - epoch_us(e1.ts)) AS min_gap_us
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id AND e1.ts < e2.ts
    GROUP BY e1.user_id
    """,
)
def q10_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + theta self-join (SURVEY §2.3): ordered event pairs per user.
    The equi key bounds the blow-up; the theta predicate applies post-
    shuffle. At scale: same plan, AQE skew-split on hot users."""
    e1 = load(spark, sf_dir, "events").alias("e1")
    e2 = load(spark, sf_dir, "events").alias("e2")
    return (
        e1.join(
            e2,
            (F.col("e1.user_id") == F.col("e2.user_id")) & (F.col("e1.ts") < F.col("e2.ts")),
        )
        .groupBy(F.col("e1.user_id").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(F.unix_micros("e2.ts") - F.unix_micros("e1.ts")).alias("min_gap_us"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregation extensions: stats, distinct, rollup/cube/grouping sets
# ---------------------------------------------------------------------------


@query(
    "q11_agg_stats",
    oracle=f"""
    SELECT o_orderpriority,
           count(*)                                   AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT)  AS n_customers,
           {DSUM('o_totalprice')}                     AS revenue,
           {DAVG('o_totalprice')}                     AS avg_price,
           min(o_totalprice)                          AS min_price,
           max(o_totalprice)                          AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q11_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        dsum("o_totalprice").alias("revenue"),
        davg("o_totalprice").alias("avg_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "q12_rollup",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           {DSUM('c.c_acctbal')} AS total_acctbal
    FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def q12_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals region -> nation -> grand total."""
    c = load(spark, sf_dir, "customer")
    n = F.broadcast(load(spark, sf_dir, "nation"))
    r = F.broadcast(load(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(dsum("c_acctbal").alias("total_acctbal"))
    )


@query(
    "q13_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {DSUM('l_quantity')} AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q13_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q14_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           {DSUM('o_totalprice')} AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q14_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via Spark SQL (same Catalyst plan as the
    DataFrame rollup/cube variants)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               {DSUM('o_totalprice')} AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q15_distinct_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q15_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
    )


@query("q16_distinct_approx", oracle=None)  # HLL sketch != DuckDB's — rows-only check
def q16_distinct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++).

    PERMANENTLY no-oracle, by design: this surfaces Spark's
    engine-internal HLL++ sketch, whose register layout and hash differ
    from DuckDB's approx sketch — no SQL can replay it cross-engine, so
    the driver scoreboard records a rows-only check here forever.
    Coverage comes from two siblings instead: pytest bounds this
    estimate's relative error against the exact count
    (tests/test_oracle.py::test_approx_distinct_error_bound), and
    q359_hll_distinct (operators/hll.py) is the first-principles
    HyperLogLog built from explicit registers — fully oracle-paired,
    including its merge algebra (q368)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "q17_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey)
    """,
)
def q17_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking trio per customer; o_orderkey tiebreak => deterministic."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "q18_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           CAST(sum(CAST(o_totalprice AS DECIMAL(30,10))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg_3
    FROM orders
    """,
)
def q18_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate + bounded moving frame (rowsBetween). Decimal
    accumulation keeps sliding-frame re-association exact on both engines."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dec = F.col("o_totalprice").cast("decimal(30,10)")
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    moving = w.rowsBetween(-2, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec).over(running).cast("double").alias("running_spend"),
        (F.sum(dec).over(moving).cast("double") / F.count(F.lit(1)).over(moving)).alias(
            "moving_avg_3"
        ),
    )


@query(
    "q19_window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(datediff('day', lag(o_orderdate) OVER w, o_orderdate) AS INT) AS days_since_prev,
           lead(o_totalprice) OVER w AS next_price,
           first_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS first_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q19_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic functions: lag/lead/first over an ordered per-key window."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).cast("int").alias(
            "days_since_prev"
        ),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "first_price"
        ),
    )


@query(
    "q20_topk",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, {DSUM('o.o_totalprice')} AS revenue
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
)
def q20_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: agg + orderBy + limit (TakeOrderedAndProject — per-
    partition heaps then a driver merge; no full global sort at scale)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(dsum("o_totalprice").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


@query(
    "q21_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, acctbal_rank, c_acctbal FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS acctbal_rank
      FROM customer) t
    WHERE acctbal_rank <= 5
    """,
)
def q21_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window (the scalable per-group top-k)."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("acctbal_rank"),
        )
        .filter(F.col("acctbal_rank") <= 5)
        .select("c_mktsegment", "c_custkey", "acctbal_rank", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "q22_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q22_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "q23_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q23_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.intersect(op)


@query(
    "q24_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def q24_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.subtract(o)


# ---------------------------------------------------------------------------
# Dedup (R8 semantics as a query) — exact, by key, last-write-wins
# ---------------------------------------------------------------------------


@query(
    "q25_dedup_by_key",
    oracle="""
    SELECT user_id, event_id, event_type, value FROM (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def q25_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user — the reference's upsert dedup (R8,
    etl_connector.py:181) expressed as a query; event_id desc tiebreak."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.upsert import dedup_last_write_wins

    e = load(spark, sf_dir, "events")
    return dedup_last_write_wins(e, "user_id", ["ts", "event_id"]).select(
        "user_id", "event_id", "event_type", "value"
    )


# ---------------------------------------------------------------------------
# Scalar functions: string / date / math / conditional
# ---------------------------------------------------------------------------


@query(
    "q26_string_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_name)                         AS name_lower,
           upper(p_brand)                        AS brand_upper,
           trim(p_type)                          AS type_trim,
           substring(p_name, 1, 5)               AS name_prefix,
           p_brand || '/' || p_type              AS brand_type,
           CAST(length(p_name) AS INT)           AS name_len,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_words
    FROM part WHERE p_partkey <= 500
    """,
)
def q26_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.filter(F.col("p_partkey") <= 500).select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim("p_type").alias("type_trim"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("int").alias("name_len"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.size(F.split("p_name", " ")).alias("n_words"),
    )


@query(
    "q27_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)    AS order_year,
           CAST(month(o_orderdate) AS INT)   AS order_month,
           date_trunc('month', o_orderdate)  AS month_start,
           CAST(datediff('day', o_orderdate, TIMESTAMP '1998-12-31 00:00:00') AS INT)
                                             AS days_to_eoy,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date_str
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def q27_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("timestamp"), F.col("o_orderdate"))
        .cast("int")
        .alias("days_to_eoy"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
    )


@query(
    "q28_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 1000.0)            AS abs_diff,
           CAST(floor(l_quantity) AS BIGINT)        AS qty_floor,
           CAST(ceil(l_discount * 100) AS BIGINT)   AS disc_pct_ceil,
           pow(l_quantity, 2)                       AS qty_sq,
           ln(l_extendedprice)                      AS log_price,
           sqrt(l_quantity)                         AS qty_sqrt
    FROM lineitem WHERE l_orderkey <= 500
    """,
)
def q28_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") <= 500).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 1000.0).alias("abs_diff"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.log(F.col("l_extendedprice")).alias("log_price"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
    )


@query(
    "q29_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END                    AS balance_band,
           coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'CAR') AS segment_recode,
           greatest(c_acctbal, 0.0)                AS acctbal_floor0
    FROM customer
    """,
)
def q29_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("balance_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")), F.lit("CAR")).alias(
            "segment_recode"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("acctbal_floor0"),
    )


# ---------------------------------------------------------------------------
# Array / JSON (R4 semi-structured normalization as queries)
# ---------------------------------------------------------------------------


@query(
    "q30_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k,
           CAST(json_extract(props, '$.missing') AS BIGINT) AS prop_missing
    FROM events WHERE event_id <= 2000
    """,
)
def q30_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured projection (reference R4/R6 over JSON payloads):
    typed extraction with missing-path -> NULL."""
    e = load(spark, sf_dir, "events")
    return e.filter(F.col("event_id") <= 2000).select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
        F.get_json_object("props", "$.missing").cast("long").alias("prop_missing"),
    )


@query(
    "q31_json_agg",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(count(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50
                      THEN 1 END) AS BIGINT) AS n_high
    FROM events
    GROUP BY event_type
    """,
)
def q31_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct, then aggregate — schema-on-read path
    the reference probes dynamically (etl_connector.py:102-117)."""
    e = load(spark, sf_dir, "events")
    parsed = e.select("event_type", F.from_json("props", "k BIGINT").alias("p"))
    return parsed.groupBy("event_type").agg(
        F.sum("p.k").alias("sum_k"),
        F.count(F.when(F.col("p.k") > 50, 1)).alias("n_high"),
    )


@query(
    "q32_array_ops",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 50
    """,
)
def q32_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split -> explode -> aggregate (word counts; the explode-normalize
    pattern of reference R4, etl_connector.py:115-120)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(50)
    )


@query(
    "q33_time_bucket_agg",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           {DSUM('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q33_time_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation in batch (the streaming window agg of
    SURVEY §2.3 run over bounded input; streaming variant in streaming/)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q34_session_windows",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM events
    ),
    m AS (
      SELECT user_id, ts, value,
             CASE WHEN prev IS NULL OR ts >= prev + INTERVAL 2 HOUR
                  THEN 1 ELSE 0 END AS new_sess
      FROM o
    ),
    s AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 2 HOUR AS session_end,
           user_id,
           count(*) AS n_events,
           {DSUM('value')} AS total_value
    FROM s
    GROUP BY user_id, sid
    """,
)
def q34_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window aggregation in batch (streaming/ops.session_counts is
    the streaming twin — same F.session_window plan on an unbounded frame).
    The oracle reproduces Spark's session semantics (session ends at
    last_event + gap; an event at exactly that instant opens a new session)
    via gaps-and-islands SQL, proving the dynamic-window operator
    cross-engine, not just stream-vs-batch."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "2 hours").alias("sess"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


@query(
    "q36_keyed_upsert",
    oracle="""
    WITH existing AS (
      SELECT event_id, ts, user_id, event_type, value
      FROM events WHERE event_id % 2 = 0
    ),
    batch AS (
      SELECT event_id, ts, user_id, event_type, value * 2 AS value
      FROM events WHERE event_id % 3 = 0
    ),
    merged AS (
      SELECT *, 0 AS pri FROM existing
      UNION ALL
      SELECT *, 1 AS pri FROM batch
    )
    SELECT event_id, ts, user_id, event_type, value FROM (
      SELECT *, row_number() OVER (PARTITION BY event_id
                                   ORDER BY ts DESC, pri DESC) AS rn
      FROM merged) t
    WHERE rn = 1
    """,
)
def q36_keyed_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8 as a query: merge an incoming batch into an existing keyed table
    with last-write-wins on event_id, incoming-batch priority on ties
    (operators/upsert.upsert_dataframe — the reference's replace_one upsert,
    etl_connector.py:167-191, as one distributed merge). The oracle mirrors
    the window-dedup merge in SQL."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.upsert import upsert_dataframe

    e = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    existing = e.filter(F.col("event_id") % 2 == 0)
    batch = e.filter(F.col("event_id") % 3 == 0).withColumn(
        "value", F.col("value") * 2
    )
    return upsert_dataframe(existing, batch, key="event_id", order_by=["ts"])


@query(
    "q35_percentiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.5)  AS p50,
           quantile_cont(value, 0.75) AS p75,
           CAST(count(*) AS BIGINT)   AS n
    FROM events
    GROUP BY event_type
    """,
)
def q35_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``: both sort and linearly interpolate, so the
    doubles match bit-for-bit). The approximate twin at scale is
    ``percentile_approx`` (one pass, mergeable sketch) — exact percentile
    is a full sort per group and is the operator you replace first at
    100 TB."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.percentile("value", 0.25).alias("p25"),
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.75).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )
