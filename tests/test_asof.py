"""asof_join semantics (operators/joins.py): backward/forward, inclusive
ties, tolerance, unmatched keys, and equivalence to the naive range-join
formulation on real fixture data."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.joins import asof_join
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 100.0),
            (1, ts("2024-01-01 11:00:00"), 110.0),
            (2, ts("2024-01-01 10:30:00"), 200.0),
        ],
        "key bigint, qts timestamp, price double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, ts("2024-01-01 09:59:00")),  # before any quote -> null
            (1, ts("2024-01-01 10:00:00")),  # exact tie -> inclusive match 100
            (1, ts("2024-01-01 10:59:59")),  # -> 100
            (1, ts("2024-01-01 12:00:00")),  # -> 110
            (2, ts("2024-01-01 10:31:00")),  # -> 200
            (3, ts("2024-01-01 10:00:00")),  # key with no quotes -> null
        ],
        "key bigint, tts timestamp",
    )


def _prices(df):
    return {
        (r.key, r.tts.isoformat()): r.price
        for r in df.select("key", "tts", "price").collect()
    }


def test_backward_inclusive_and_unmatched(quotes, trades):
    out = asof_join(trades, quotes, on="key", left_time="tts", right_time="qts")
    assert _prices(out) == {
        (1, "2024-01-01T09:59:00"): None,
        (1, "2024-01-01T10:00:00"): 100.0,  # tie is inclusive
        (1, "2024-01-01T10:59:59"): 100.0,
        (1, "2024-01-01T12:00:00"): 110.0,
        (2, "2024-01-01T10:31:00"): 200.0,
        (3, "2024-01-01T10:00:00"): None,  # no right rows for key
    }


def test_forward(quotes, trades):
    out = asof_join(
        trades, quotes, on="key", left_time="tts", right_time="qts",
        direction="forward",
    )
    assert _prices(out) == {
        (1, "2024-01-01T09:59:00"): 100.0,  # next quote at-or-after
        (1, "2024-01-01T10:00:00"): 100.0,  # tie is inclusive
        (1, "2024-01-01T10:59:59"): 110.0,
        (1, "2024-01-01T12:00:00"): None,  # nothing after
        (2, "2024-01-01T10:31:00"): None,
        (3, "2024-01-01T10:00:00"): None,
    }


def test_tolerance_nulls_stale_matches(quotes, trades):
    out = asof_join(
        trades, quotes, on="key", left_time="tts", right_time="qts",
        tolerance=F.expr("INTERVAL 30 MINUTES"),
    )
    got = _prices(out)
    assert got[(1, "2024-01-01T10:59:59")] is None  # 10:00 quote is ~1h stale
    assert got[(1, "2024-01-01T10:00:00")] == 100.0  # 0 gap passes
    assert got[(2, "2024-01-01T10:31:00")] == 200.0  # 1 min gap passes


def test_row_count_preserved(quotes, trades):
    """As-of is left-join-shaped: exactly one output row per left row."""
    out = asof_join(trades, quotes, on="key", left_time="tts", right_time="qts")
    assert out.count() == trades.count()


def test_overlapping_column_suffixed(spark, quotes):
    left = quotes.select("key", F.col("qts").alias("tts"), F.lit(1.0).alias("price"))
    out = asof_join(left, quotes, on="key", left_time="tts", right_time="qts")
    assert "price" in out.columns and "price_right" in out.columns


def test_matches_naive_range_join_on_fixture(spark, sf_dir):
    """Window formulation == naive (range join + pick latest) on events x
    per-day orders, including events with no prior order (left join)."""
    events = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    od = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("ots"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    fast = asof_join(events, od, on="user_id", left_time="ts", right_time="ots")

    naive = (
        events.join(
            od,
            (events["user_id"] == od["user_id"]) & (od["ots"] <= events["ts"]),
            "left",
        )
        .groupBy("event_id", events["user_id"], "ts")
        .agg(F.max(F.struct("ots", "n_orders")).alias("m"))
        .select("event_id", "user_id", "ts", "m.ots", "m.n_orders")
    )
    f = {r.event_id: (r.ots, r.n_orders) for r in fast.collect()}
    n = {r.event_id: (r.ots, r.n_orders) for r in naive.collect()}
    assert f == n
