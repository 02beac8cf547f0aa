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


def test_depth_capped_skew_stays_bounded(spark):
    """An epsilon-wide two-value cluster drives every refinement into the
    same bucket until the depth cap; the degenerate branch must respect
    collect_limit (distinct-value aggregation, no unbounded raw collect)
    and still be quantile_cont-exact."""
    eps = 2.0**-40
    rows = [(1.0,)] * 600 + [(1.0 + eps,)] * 400 + [(2.0,)] * 5
    df = spark.createDataFrame(rows, "v double")
    got = exact_quantiles(df, "v", PROBS, buckets=4, collect_limit=10)
    want = df.agg(F.percentile("v", F.lit(PROBS)).alias("qs")).collect()[0]["qs"]
    assert got == pytest.approx(want, abs=0.0)


@pytest.mark.slow
def test_bisect_path_exact(spark):
    """Force the value-bisection escape hatch (distinct count above
    collect_limit at the depth cap) and check exact order statistics."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.quantiles import (
        _rank_value_bisect,
    )

    vals = [float(v) for v in range(1000, 0, -1)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    assert _rank_value_bisect(df, "v", 0, 10) == 1.0
    assert _rank_value_bisect(df, "v", 137, 10) == 138.0
    assert _rank_value_bisect(df, "v", 999, 10) == 1000.0


def test_bisect_adjacent_doubles_midpoint_rounds_up(spark):
    """Two ADJACENT doubles whose arithmetic midpoint rounds UP to the max
    under ties-to-even (mn=1+2^-52, mx=1+2^-51), with more duplicates than
    collect_limit: without the symmetric mid>=mx guard the bisection never
    shrinks the candidate range and spins Spark jobs forever."""
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.quantiles import (
        _rank_value_bisect,
    )

    mn = 1.0 + 2.0**-52
    mx = 1.0 + 2.0**-51
    assert (mn + mx) / 2.0 == mx  # the adversarial rounding premise
    rows = [(mn,)] * 30 + [(mx,)] * 30
    df = spark.createDataFrame(rows, "v double")
    assert _rank_value_bisect(df, "v", 0, 10) == mn
    assert _rank_value_bisect(df, "v", 29, 10) == mn
    assert _rank_value_bisect(df, "v", 30, 10) == mx
    assert _rank_value_bisect(df, "v", 59, 10) == mx


@pytest.mark.slow
def test_degenerate_many_distinct_in_ulp_range(spark):
    """Ulp-dense distinct values (> collect_limit of them) inside a
    degenerate range: the bisection path must return exact quantiles."""
    base = 1.0
    eps = 2.0**-50
    rows = [(base + k * eps,) for k in range(64)] * 3
    df = spark.createDataFrame(rows, "v double")
    got = exact_quantiles(df, "v", [0.0, 0.5, 1.0], buckets=2, collect_limit=5)
    want = df.agg(
        F.percentile("v", F.lit([0.0, 0.5, 1.0])).alias("qs")
    ).collect()[0]["qs"]
    assert got == pytest.approx(want, abs=0.0)
