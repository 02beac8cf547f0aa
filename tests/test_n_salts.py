"""Round-8 ADVICE fix: _default_n_salts must not run a corpus count()
per call — it sizes from parallelism, applying the sqrt(N) cap only via
Catalyst's FREE plan-statistics row estimate."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.pq import _cheap_rowcount, _default_n_salts


def test_default_n_salts_runs_no_job(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    n = _default_n_salts(df, "vec_id")
    after = tracker.getJobIdsForGroup(None)
    assert n >= 1
    assert len(after) == len(before), "salt sizing must not launch a Spark job"


def test_default_n_salts_caps_by_sqrt_when_estimate_known(spark):
    # a local relation's row count IS known to Catalyst — cap applies
    small = spark.range(9).select(F.col("id").alias("vec_id"))
    est = _cheap_rowcount(small)
    n = _default_n_salts(small, "vec_id")
    par = spark.sparkContext.defaultParallelism
    if est is not None:
        assert n == max(1, min(2 * par, 3))  # sqrt(9) = 3
    else:
        assert n == 2 * par


def test_default_n_salts_parallelism_fallback(spark, sf_dir):
    # parquet scan without CBO stats: no row estimate -> 2x parallelism
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if _cheap_rowcount(df) is None:
        assert _default_n_salts(df, "vec_id") == 2 * spark.sparkContext.defaultParallelism
