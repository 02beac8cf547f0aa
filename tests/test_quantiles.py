"""operators/quantiles.exact_quantiles: quantile_cont-exact distributed
quantiles (range-bucketed two-phase) pinned against Spark's built-in exact
percentile UDAF and edge cases.

Reference has no statistics surface (/root/reference/etl_connector.py:53-242).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.quantiles import exact_quantiles

PROBS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def test_matches_builtin_percentile_on_lineitem(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = exact_quantiles(li, "l_extendedprice", PROBS)
    want = li.agg(
        F.percentile("l_extendedprice", F.lit(PROBS)).alias("qs")
    ).collect()[0]["qs"]
    assert got == pytest.approx(want, abs=1e-9)


def test_matches_builtin_on_skewed_column(spark, sf_dir):
    """events.value plus a constant spike — exercises the skewed-bucket
    recursion (collect_limit forces refinement)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.when(F.col("event_id") % 3 == 0, F.lit(42.0))
        .otherwise(F.col("value"))
        .alias("v")
    )
    got = exact_quantiles(ev, "v", PROBS, buckets=16, collect_limit=50)
    want = ev.agg(F.percentile("v", F.lit(PROBS)).alias("qs")).collect()[0]["qs"]
    assert got == pytest.approx(want, abs=1e-9)


def test_edge_cases(spark):
    one = spark.createDataFrame([(7.5,)], "v double")
    assert exact_quantiles(one, "v", [0.0, 0.5, 1.0]) == [7.5, 7.5, 7.5]
    const = spark.createDataFrame([(3.0,)] * 10, "v double")
    assert exact_quantiles(const, "v", [0.25, 0.75]) == [3.0, 3.0]
    two = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    assert exact_quantiles(two, "v", [0.5]) == pytest.approx([1.5])
