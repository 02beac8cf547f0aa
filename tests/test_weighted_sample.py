"""q107: Efraimidis-Spirakis weighted sampling must bias toward heavy rows
and stay deterministic across runs/partitionings."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans import registry
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load


def test_sample_biases_toward_weight(spark, sf_dir):
    got = registry.queries()["q107_weighted_sample"](spark, sf_dir)
    sampled_avg = got.agg(F.avg("w")).first()[0]
    pop_avg = (
        load(spark, sf_dir, "orders")
        .agg(F.avg(F.col("o_totalprice").cast("double")))
        .first()[0]
    )
    # price-proportional inclusion -> sampled mean well above population mean
    assert sampled_avg > pop_avg * 1.1, (sampled_avg, pop_avg)


def test_sample_deterministic_across_partitionings(spark, sf_dir):
    q = registry.queries()["q107_weighted_sample"]
    a = sorted(r["o_orderkey"] for r in q(spark, sf_dir).collect())
    b = sorted(
        r["o_orderkey"]
        for r in q(spark, sf_dir).repartition(7).collect()
    )
    assert a == b
