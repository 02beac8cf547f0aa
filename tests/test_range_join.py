"""bucketed_range_join == naive theta join, on fixture data and corners."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.joins import bucketed_range_join
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load


def _pairs(df):
    return sorted(
        (r.event_id, r.event_id_r) for r in df.select("event_id", "event_id_r").collect()
    )


def test_matches_naive_theta_join(spark, sf_dir):
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    lower, upper = 1, 10 * 60 * 1_000_000  # (0, 10min]

    fast = bucketed_range_join(
        e, e, on="user_id", left_time="ts", right_time="ts",
        lower_us=lower, upper_us=upper,
    )

    a = e
    b = e.select(
        F.col("event_id").alias("event_id_r"),
        F.col("user_id"),
        F.col("ts").alias("ts_r"),
    )
    delta = F.unix_micros("ts_r") - F.unix_micros("ts")
    naive = a.join(b, "user_id").filter((delta >= lower) & (delta <= upper))

    assert _pairs(fast) == _pairs(naive)
    assert fast.count() > 0  # fixture has close-together events


def test_inclusive_bounds_and_zero_gap(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 1, t0),
        (2, 1, t0),                                  # gap 0
        (3, 1, t0 + dt.timedelta(seconds=60)),       # gap 60s
        (4, 1, t0 + dt.timedelta(seconds=61)),       # gap 61s from id1
        (5, 2, t0),                                  # other key
    ]
    e = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = bucketed_range_join(
        e, e, on="user_id", left_time="ts", right_time="ts",
        lower_us=0, upper_us=60 * 1_000_000,
    )
    got = _pairs(out)
    # inclusive both ends; gap 0 pairs appear in both directions (1,2)+(2,1)
    assert (1, 3) in got and (2, 3) in got          # exactly at upper bound
    assert (1, 2) in got and (2, 2) in got          # zero gap, self-pairs too
    assert (1, 4) not in got                        # 61s > upper
    assert all(not (a == 5) ^ (b == 5) for a, b in got)  # keys never mix
