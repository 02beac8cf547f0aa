"""table_diff contract: applying the emitted change feed to OLD must
reconstruct NEW exactly, and an empty diff means identical snapshots."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.diff import table_diff
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.upsert import apply_cdc
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load


def _snapshots(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("double")
    old = o.filter(F.col("o_orderkey") % 11 != 3).select(
        "o_orderkey", "o_orderstatus", price.alias("price")
    )
    new = o.filter(F.col("o_orderkey") % 13 != 7).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 5 == 0, price * 1.1).otherwise(price).alias("price"),
    )
    return old, new


def test_diff_then_apply_roundtrips(spark, sf_dir):
    old, new = _snapshots(spark, sf_dir)
    feed = table_diff(old, new, keys=["o_orderkey"]).withColumn(
        "op", F.upper(F.substring("op", 1, 1))  # insert/update/delete -> I/U/D
    )
    rebuilt = apply_cdc(old, feed, key="o_orderkey", order_by=["o_orderkey"])
    assert rebuilt.exceptAll(new).count() == 0
    assert new.exceptAll(rebuilt).count() == 0


def test_identical_snapshots_diff_empty(spark, sf_dir):
    old, _ = _snapshots(spark, sf_dir)
    assert table_diff(old, old, keys=["o_orderkey"]).count() == 0


def test_null_payloads_compare_null_safely(spark):
    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None)], "k int, v string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, None), (4, "y")], "k int, v string"
    )
    got = {(r["op"], r["k"]) for r in table_diff(old, new, keys=["k"]).collect()}
    # k=1: null==null -> unchanged; k=2: x->null update; k=3 delete; k=4 insert
    assert got == {("update", 2), ("delete", 3), ("insert", 4)}
