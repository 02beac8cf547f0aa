"""q102 heavy hitters: with sketch capacity above the distinct-key count the
frequent-items estimates must be exact, and the returned set must be a valid
top-k (tie-aware at the rank boundary)."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans import registry


def test_heavy_hitter_counts_exact_and_topk(spark, sf_dir):
    got = {
        r["l_partkey"]: r["est_orders"]
        for r in registry.queries()["q102_heavy_hitters"](spark, sf_dir).collect()
    }
    assert len(got) == 20
    exact = {
        r["l_partkey"]: r["n"]
        for r in (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .groupBy("l_partkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    # capacity > distinct keys -> every estimate is the true count
    for k, v in got.items():
        assert exact[k] == v, (k, v, exact[k])
    # top-k property: nothing outside the result out-counts anything inside
    floor = min(got.values())
    outside_max = max(v for k, v in exact.items() if k not in got)
    assert outside_max <= floor
