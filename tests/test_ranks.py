"""operators/ranks: distributed global rank / ntile must be bit-identical
to the single-partition window form on every input shape — ties broken by
the caller's tie-break column, ascending and descending orders, ntile
remainder buckets, and empty input."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.ranks import (
    with_global_rank,
    with_ntile,
    with_running_sums,
)


@pytest.fixture(scope="module")
def frame(spark):
    # heavy ties in v (only 7 distinct values over 500 rows) so boundary
    # rows genuinely depend on the id tie-break; a few negative values.
    rows = [(i, (i * i) % 7 - 3) for i in range(500)]
    return spark.createDataFrame(rows, "id long, v long")


def _window_rank(df, order):
    return df.withColumn(
        "expected", F.row_number().over(Window.orderBy(*order)).cast("long")
    )


@pytest.mark.parametrize("num_partitions", [1, 5, 64])
def test_global_rank_matches_window(frame, num_partitions):
    order = [F.col("v").asc(), F.col("id").asc()]
    got = with_global_rank(frame, order, out="r", num_partitions=num_partitions)
    joined = got.join(_window_rank(frame, order), ["id", "v"])
    assert joined.filter(F.col("r") != F.col("expected")).count() == 0
    # ranks are a permutation of 1..n
    n = frame.count()
    assert got.agg(F.min("r"), F.max("r"), F.countDistinct("r")).collect()[
        0
    ] == (1, n, n)


def test_global_rank_descending(frame):
    order = [F.col("v").desc(), F.col("id").desc()]
    got = with_global_rank(frame, order, out="r", num_partitions=7)
    joined = got.join(_window_rank(frame, order), ["id", "v"])
    assert joined.filter(F.col("r") != F.col("expected")).count() == 0


@pytest.mark.parametrize("k", [2, 3, 4, 7])
def test_ntile_matches_window(frame, k):
    order = [F.col("v").asc(), F.col("id").asc()]
    got = with_ntile(frame, order, k, out="b", num_partitions=9)
    exp = frame.withColumn(
        "expected", F.ntile(k).over(Window.orderBy("v", "id")).cast("long")
    )
    joined = got.join(exp, ["id", "v"])
    assert joined.filter(F.col("b") != F.col("expected")).count() == 0


def test_ntile_remainder_bucket_sizes(spark):
    # n=10, k=4 -> sizes 3,3,2,2 (SQL ntile: first n%k buckets get +1)
    df = spark.createDataFrame([(i,) for i in range(10)], "id long")
    got = with_ntile(df, [F.col("id").asc()], 4, out="b", num_partitions=3)
    sizes = {
        r["b"]: r["n"]
        for r in got.groupBy("b").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {1: 3, 2: 3, 3: 2, 4: 2}


def test_empty_input(spark):
    df = spark.createDataFrame([], "id long, v long")
    assert with_global_rank(df, [F.col("v").asc()], out="r").count() == 0
    assert with_ntile(df, [F.col("v").asc()], 4, out="b").count() == 0


@pytest.mark.parametrize("num_partitions", [1, 6, 64])
def test_running_sums_match_window(spark, num_partitions):
    from decimal import Decimal

    rows = [
        (i, i % 11, float((i * 7) % 13) - 6.0, Decimal(i % 5) / 4)
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "id long, lv long, dv double, cv decimal(20,6)"
    )
    # sprinkle NULLs, including a whole low range of NULL lv so some range
    # partition's local prefix is all-NULL (offset-only case)
    df = df.select(
        "id",
        F.when(F.col("id") >= 25, F.col("lv")).alias("lv"),
        F.when(F.col("id") % 17 != 0, F.col("dv")).alias("dv"),
        "cv",
    )
    got = with_running_sums(
        df,
        [F.col("id").asc()],
        {"cum_l": "lv", "cum_d": "dv", "cum_c": "cv"},
        num_partitions=num_partitions,
    )
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    exp = df.select(
        "id",
        F.sum("lv").over(w).alias("e_l"),
        F.sum("dv").over(w).alias("e_d"),
        F.sum("cv").over(w).alias("e_c"),
    )
    j = got.join(exp, "id")
    assert (
        j.filter(
            ~(F.col("cum_l").eqNullSafe(F.col("e_l")))
            | ~(F.col("cum_c").eqNullSafe(F.col("e_c")))
        ).count()
        == 0
    )
    # doubles: same values, allow refold epsilon
    bad = j.filter(
        F.abs(F.col("cum_d") - F.col("e_d")) > 1e-9
    ).count()
    assert bad == 0


def test_running_sums_empty(spark):
    df = spark.createDataFrame([], "id long, v long")
    assert (
        with_running_sums(df, [F.col("id").asc()], {"cum": "v"}).count() == 0
    )


def test_rank_plan_has_no_single_partition_window(frame):
    """The whole point: the plan must not contain an unpartitioned Window
    (one-task global sort). Range repartition + mapInPandas only."""
    got = with_global_rank(
        frame, [F.col("v").asc(), F.col("id").asc()], out="r"
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "rangepartitioning" in plan


@pytest.mark.parametrize("inclusive", [True, False])
@pytest.mark.parametrize("num_partitions", [1, 6, 64])
def test_running_max_matches_window(spark, inclusive, num_partitions):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.ranks import with_running_max

    rows = [(i, ((i * 13) % 29) - 7) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v long").select(
        "id", F.when(F.col("id") % 11 != 0, F.col("v")).alias("v")
    )
    got = with_running_max(
        df,
        [F.col("id").asc()],
        {"cm": "v"},
        inclusive=inclusive,
        num_partitions=num_partitions,
    )
    upper = 0 if inclusive else -1
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, upper)
    exp = df.select("id", F.max("v").over(w).alias("e"))
    j = got.join(exp, "id")
    assert j.filter(~F.col("cm").eqNullSafe(F.col("e"))).count() == 0
