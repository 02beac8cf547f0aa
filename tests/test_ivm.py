"""operators/ivm: incremental view maintenance of grouped count/sum views
from a wide change feed — refresh(view(old), diff(old,new)) == view(new)
exactly, without rescanning the base.

Reference recomputes per run, no aggregate surface
(/root/reference/etl_connector.py:53-242).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.diff import table_diff_wide
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.ivm import (
    group_agg_view,
    incremental_group_agg,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _old_new(spark, sf_dir):
    """Two snapshots of events with inserts, deletes, and group-migrating
    updates between them; the metric is an exact integer."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    old = ev.filter(F.col("event_id") % 7 != 0)  # new has inserts (the %7 rows)
    new = (
        ev.filter(F.col("event_id") % 5 != 0)  # and deletes (the %5 rows)
        .withColumn(  # and updates that MIGRATE group + change the metric
            "event_type",
            F.when(F.col("event_id") % 11 == 0, F.lit("migrated")).otherwise(
                F.col("event_type")
            ),
        )
        .withColumn(
            "cents",
            F.when(F.col("event_id") % 3 == 0, F.col("cents") * 2).otherwise(
                F.col("cents")
            ),
        )
    )
    return old, new


def test_refresh_equals_rebuild(spark, sf_dir):
    old, new = _old_new(spark, sf_dir)
    prev = group_agg_view(old, ["event_type"], ["cents"])
    feed = table_diff_wide(old, new, ["event_id"])
    got = incremental_group_agg(prev, feed, ["event_type"], ["cents"])
    want = group_agg_view(new, ["event_type"], ["cents"])
    assert _rows(got) == _rows(want)


def test_refresh_handles_group_birth_and_death(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 5)], "id long, g string, v long"
    )
    # group b dies (row 3 deleted), group c is born (row 4 inserted),
    # row 2 migrates a -> c with a new value
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "c", 25), (4, "c", 7)], "id long, g string, v long"
    )
    got = incremental_group_agg(
        group_agg_view(old, ["g"], ["v"]),
        table_diff_wide(old, new, ["id"]),
        ["g"],
        ["v"],
    )
    assert _rows(got) == _rows(group_agg_view(new, ["g"], ["v"]))
    assert {r.g for r in got.collect()} == {"a", "c"}  # b is gone


def test_empty_feed_is_identity(spark):
    base = spark.createDataFrame([(1, "a", 10)], "id long, g string, v long")
    view = group_agg_view(base, ["g"], ["v"])
    feed = table_diff_wide(base, base, ["id"])
    assert feed.count() == 0
    got = incremental_group_agg(view, feed, ["g"], ["v"])
    assert _rows(got) == _rows(view)
