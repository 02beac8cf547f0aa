"""Round-9 additions: the six TPC-H shapes still missing from the surface
(Q2, Q9, Q11, Q12, Q16, Q20), completing the 22-query TPC-H sweep re-expressed
over the fixture star schema. The fixture has no partsupp table, so Q2/Q11/Q20
derive their part-supplier facts from lineitem (unit price, shipped value,
shipped quantity) — the plan shapes (correlated min, scalar-threshold filter,
correlated-aggregate semi-join) are preserved exactly.

The reference implements no joins, subqueries, or aggregation anywhere
(/root/reference/etl_connector.py:53-242 is its complete operator surface;
SURVEY §2.1-2.2) — these deliver the §2.3 declared relational surface. All
six are oracle-paired (DuckDB) and auto-gated by tests/test_oracle.py; plan
shapes are additionally guarded by tests/test_plans.py (broadcast dims, no
accidental cartesians, pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import query
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.relational import DSUM, dsum
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

# ---------------------------------------------------------------------------
# TPC-H Q2 shape: minimum-cost supplier per part within a region
# ---------------------------------------------------------------------------


@query(
    "q278_tpch_q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
       AND p_type = 'SMALL' AND p_size <= 15
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
      GROUP BY 1, 2
    ), best AS (
      SELECT l_partkey, l_suppkey, unit_cost,
             min(unit_cost) OVER (PARTITION BY l_partkey) AS part_min
      FROM costs
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           round(unit_cost, 6) AS unit_cost
    FROM best
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE unit_cost = part_min
    """,
)
def q278_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated-min subquery): for every SMALL part of
    size <= 15, the EUROPE supplier(s) achieving the minimum observed unit
    price (min over lineitem of extendedprice/quantity — the fixture's
    partsupp stand-in). Scale strategy: the filtered part and the
    region-restricted supplier dim both broadcast, so the only wide
    operation over the 100 TB fact is one groupBy on (partkey, suppkey) —
    the per-part correlated min is a window over that already-aggregated
    (small) frame, not over raw lineitem. Reference has no joins or
    subqueries (SURVEY §2.2)."""
    part = F.broadcast(
        load(spark, sf_dir, "part")
        .filter((F.col("p_type") == "SMALL") & (F.col("p_size") <= 15))
        .select("p_partkey", "p_name")
    )
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = F.broadcast(
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        load(spark, sf_dir, "lineitem")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            eligible.select("s_suppkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = costs.withColumn(
        "part_min", F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("unit_cost") == F.col("part_min"))
    return (
        best.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(eligible, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: product-line profit by supplier nation and order year
# ---------------------------------------------------------------------------


@query(
    "q279_tpch_q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, {DSUM('amount')} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.6 * p_retailprice * l_quantity AS amount
      FROM lineitem
      JOIN part ON p_partkey = l_partkey AND p_name LIKE '%gear%'
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON n_nationkey = s_nationkey
    ) profit
    GROUP BY 1, 2
    """,
)
def q279_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on '%gear%' product lines, by supplier nation
    and order year; cost is proxied as 60% of p_retailprice per unit (the
    fixture carries no ps_supplycost). Scale strategy: part (name-filtered),
    supplier, and nation all broadcast — the part filter also prunes
    lineitem early via the broadcast hash — leaving lineitem ⋈ orders on
    orderkey as the single fact-fact sort-merge shuffle. Profit accumulates
    in DECIMAL (dsum) so Spark and DuckDB agree bit-for-bit regardless of
    partial-aggregation order. Reference has no aggregation (SURVEY §2.2)."""
    part = F.broadcast(
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    supplier = F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    nation = F.broadcast(load(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        load(spark, sf_dir, "lineitem")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: parts carrying an outsized share of one nation's value
# ---------------------------------------------------------------------------


@query(
    "q280_tpch_q11_important_parts",
    oracle=f"""
    WITH v AS (
      SELECT l_partkey, {DSUM('l_extendedprice * (1 - l_discount)')} AS part_value
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_3'
      GROUP BY 1
    )
    SELECT l_partkey AS partkey, part_value
    FROM v
    WHERE part_value > (SELECT {DSUM('part_value')} * 0.001 FROM v)
    """,
)
def q280_tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (scalar-subquery threshold): parts whose shipped
    value from NATION_3 suppliers exceeds 0.1% of that nation's total
    shipped value. Scale strategy: the nation-filtered supplier dim
    broadcasts into the lineitem scan; one groupBy(partkey) shuffle builds
    the per-part values; the grand total is a one-row aggregate of that
    (already small) frame broadcast back as a nested-loop of constant size
    — never a shuffle of the fact. Value sums accumulate in DECIMAL (dsum)
    on both engines so the > threshold comparison is exact. Reference has
    no subqueries (SURVEY §2.2)."""
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_sup = F.broadcast(
        supplier.join(
            F.broadcast(nation.select("n_nationkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey")
    )
    v = (
        load(spark, sf_dir, "lineitem")
        .join(nat_sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("part_value"))
    )
    threshold = v.agg((dsum("part_value") * 0.001).alias("threshold"))
    return (
        v.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("partkey"), "part_value")
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: priority mix of late-shipped lines by return flag
# ---------------------------------------------------------------------------


@query(
    "q281_tpch_q12_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > o_orderdate
    GROUP BY 1
    """,
)
def q281_tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: for lines shipped during 1996 strictly after their
    order date (the fixture's commit/receipt stand-in), how many belong to
    high- vs low-priority orders, per return flag (the fixture's shipmode
    stand-in). Scale strategy: the ship-date range predicate pushes into
    the lineitem scan (row-group skipping), the shipped-after-ordered theta
    predicate rides ON the equi-join so it filters during the one
    sort-merge shuffle, and the priority split is a conditional-sum
    map-side partial aggregate over 3 groups. Reference has no joins or
    conditional aggregation (SURVEY §2.2)."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    return (
        orders.join(
            lineitem,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: supplier variety per part attribute bucket
# ---------------------------------------------------------------------------


@query(
    "q282_tpch_q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q282_tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers have shipped each
    (brand, type, size) bucket, excluding one brand, one type, and
    suppliers with negative balances (the fixture's complaints stand-in).
    Scale strategy: lineitem first collapses to DISTINCT (partkey, suppkey)
    pairs — one shuffle that shrinks the 100 TB fact to the part×supplier
    cross section — then the filtered part dim broadcasts in, the excluded
    suppliers broadcast as a left-anti probe (NOT IN with guaranteed
    non-null keys), and the final count(DISTINCT) groups by the three part
    attributes. Reference has no distinct or anti-join surface
    (SURVEY §2.2)."""
    ps = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = F.broadcast(
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    excluded = F.broadcast(
        load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    return (
        ps.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(excluded, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 shape: suppliers with excess single-year shipments
# ---------------------------------------------------------------------------


@query(
    "q283_tpch_q20_excess_shipments",
    oracle=f"""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             {DSUM('l_quantity')} AS qty_total,
             {DSUM("CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01' "
                   "AND l_shipdate < TIMESTAMP '1997-01-01' "
                   "THEN l_quantity ELSE 0 END")} AS qty_1996
      FROM lineitem
      JOIN part ON p_partkey = l_partkey AND p_name LIKE 'small%'
      GROUP BY 1, 2
    )
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_5'
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM shipped WHERE qty_1996 > 0.5 * qty_total
    )
    """,
)
def q283_tpch_q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (correlated-aggregate semi-join): NATION_5 suppliers
    for whom some 'small%' part had more than half its all-time shipped
    quantity concentrated in 1996 — the fixture's availqty-vs-shipped
    stand-in. Scale strategy: the name-filtered part dim broadcasts into
    the lineitem scan; one groupBy (suppkey, partkey) computes total and
    conditional 1996 quantity in the same shuffle (no second pass over the
    fact); the qualifying suppkey set then left-semi probes the supplier
    dim. Quantity sums accumulate in DECIMAL (dsum) so the 0.5x comparison
    is exact on both engines. Reference has no semi-joins (SURVEY §2.2)."""
    part = F.broadcast(
        load(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    )
    in_1996 = (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    shipped = (
        load(spark, sf_dir, "lineitem")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            dsum("l_quantity").alias("qty_total"),
            dsum(F.when(in_1996, F.col("l_quantity")).otherwise(F.lit(0.0))).alias("qty_1996"),
        )
    )
    qualifying = (
        shipped.filter(F.col("qty_1996") > 0.5 * F.col("qty_total")).select("l_suppkey").distinct()
    )
    nation = F.broadcast(
        load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5").select("n_nationkey")
    )
    return (
        load(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )
