"""q103: per-day HLL sketches unioned to months must estimate the exact
per-month distinct-user counts within HLL's error envelope, and the union
must be insensitive to merge order (associativity is what makes the sketch
state materializable)."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans import registry
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load


def test_hll_rollup_tracks_exact_counts(spark, sf_dir):
    got = {
        r["month"]: (r["approx_users"], r["n_days"])
        for r in registry.queries()["q103_hll_rollup"](spark, sf_dir).collect()
    }
    exact = {
        r["month"]: r["n"]
        for r in (
            load(spark, sf_dir, "events")
            .groupBy(F.date_trunc("month", "ts").alias("month"))
            .agg(F.count_distinct("user_id").alias("n"))
            .collect()
        )
    }
    assert set(got) == set(exact)
    for m, (est, _) in got.items():
        # lgConfigK=12 default -> relative error ~1.6%; allow 5% headroom
        assert abs(est - exact[m]) <= max(2.0, 0.05 * exact[m]), (m, est, exact[m])


def test_hll_union_is_merge_order_insensitive(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    one = daily.agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))).first()[0]
    # different pre-grouping -> different merge tree, same estimate
    two = (
        daily.withColumn("g", F.dayofweek("day"))
        .groupBy("g")
        .agg(F.hll_union_agg("sk").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")))
        .first()[0]
    )
    assert one == two
