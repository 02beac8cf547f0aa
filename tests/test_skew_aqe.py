"""AQE skew-join handling: a runtime-skewed sort-merge join must be
split by AdaptiveSparkPlan (skew=true) instead of one straggler task
processing the hot key — the mechanism SCALE.md's join section relies on
at 100 TB, exercised for real here (not just configured).

Reference has no joins at all (/root/reference/etl_connector.py,
SURVEY §2.2).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture
def skew_tuned(spark):
    """Shrink AQE's skew thresholds so a test-sized hot key triggers the
    split; restore session confs afterwards."""
    keys = [
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "50KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_sort_merge_join(skew_tuned, tmp_path):
    spark = skew_tuned
    left_path = str(tmp_path / "left")
    right_path = str(tmp_path / "right")
    # left: 400k rows, ~95% on hot key 0; right: uniform small dimension-ish
    # fact (too big to broadcast with threshold -1)
    spark.range(400_000).select(
        F.when(F.col("id") % 20 == 0, F.col("id") % 50).otherwise(0).alias("k"),
        F.col("id").alias("payload"),
    ).write.mode("overwrite").parquet(left_path)
    spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
    ).write.mode("overwrite").parquet(right_path)

    joined = spark.read.parquet(left_path).join(
        spark.read.parquet(right_path), "k"
    )
    # execute THE DataFrame's own QueryExecution (a writer would clone it)
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan[:3000]


def test_same_join_without_skew_is_not_split(skew_tuned, tmp_path):
    """Control: a uniform key distribution under identical thresholds must
    NOT be flagged as skewed — the optimization is targeted, not blanket."""
    spark = skew_tuned
    left_path = str(tmp_path / "left_u")
    right_path = str(tmp_path / "right_u")
    spark.range(400_000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("payload")
    ).write.mode("overwrite").parquet(left_path)
    spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
    ).write.mode("overwrite").parquet(right_path)

    joined = spark.read.parquet(left_path).join(
        spark.read.parquet(right_path), "k"
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" not in plan
