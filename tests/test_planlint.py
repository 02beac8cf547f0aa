"""plans/planlint: the plan-health report must reproduce what the CI plan
guards assert — pushdown visible, broadcasts counted, funnels flagged."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans import registry
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.planlint import plan_report


def test_report_on_clean_query(spark, sf_dir):
    df = registry.queries()["q04_join_inner"](spark, sf_dir)
    r = plan_report(df)
    assert r.n_broadcast_hash_joins >= 1
    assert r.n_cartesian_products == 0
    assert r.n_unpartitioned_windows == 0
    assert r.scans and all(len(s["read_columns"]) <= 12 for s in r.scans)
    assert r.ok(), r.warnings


def test_report_flags_pushdown(spark, sf_dir):
    df = registry.queries()["q02_filter_predicates"](spark, sf_dir)
    r = plan_report(df)
    assert any(s["pushed_filters"] for s in r.scans)


def test_report_flags_unpartitioned_window(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bad = li.withColumn(
        "rn", F.row_number().over(Window.orderBy("l_orderkey", "l_linenumber",
                                                 "l_partkey", "l_suppkey"))
    )
    r = plan_report(bad)
    assert r.n_unpartitioned_windows == 1
    assert not r.ok()
    assert any("unpartitioned Window" in w for w in r.warnings)


def test_report_flags_cartesian(spark, sf_dir):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    cart = a.join(b)  # no condition
    r = plan_report(cart)
    # Spark plans a small unconditioned join as BNLJ or cartesian; either
    # way the report surfaces it
    assert r.n_cartesian_products + r.n_bnl_joins >= 1


def test_report_counts_codegen_on_final_plan(spark, sf_dir):
    df = registry.queries()["q01_pricing_summary"](spark, sf_dir)
    # initial AQE plan: codegen ids not yet assigned
    assert plan_report(df).n_exchanges >= 1
    # executed: the FINAL adaptive plan carries codegen stages
    r = plan_report(df, execute=True)
    assert r.n_codegen_stages >= 1
    assert r.n_exchanges >= 1
