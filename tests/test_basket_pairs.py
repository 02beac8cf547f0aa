"""copurchase_pairs (q93 core): basket-array expansion must agree with the
naive self-join formulation — including the multiplicity corner the fixture
data may never hit, an item repeated *within* one order."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.extensions import copurchase_pairs


def _self_join_pairs(li):
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def test_basket_expansion_matches_self_join_with_repeats(spark):
    rows = [
        (1, 10), (1, 10), (1, 20), (1, 30),  # repeated part in one order
        (2, 5), (2, 5),                       # only repeats -> no pairs
        (3, 7),                               # singleton order
        (4, 20), (4, 10),                     # unsorted arrival order
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = sorted(map(tuple, copurchase_pairs(li).collect()))
    want = sorted(map(tuple, _self_join_pairs(li).collect()))
    assert got == want
    # the repeated 10 in order 1 doubles its pairs; order 4 adds one more
    assert got == [(10, 20, 3), (10, 30, 2), (20, 30, 1)]


def test_basket_expansion_matches_self_join_on_fixture(spark, sf_dir):
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
    )
    got = sorted(map(tuple, copurchase_pairs(li).collect()))
    want = sorted(map(tuple, _self_join_pairs(li).collect()))
    assert got == want
