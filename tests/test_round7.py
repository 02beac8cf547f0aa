"""Round-7 operator semantics: kappa on planted agreement, zero-entropy
deterministic chains, CCF peak at a planted lag, and the Q4-shape
existence semantics (oracle hash-matches are in tests/test_oracle.py).
"""

from __future__ import annotations

import datetime

import pytest

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import queries

_QS = queries()

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_kappa_is_one_on_perfect_agreement(spark, tmp_path):
    # English docs full of English markers, German docs of German markers:
    # the classifier agrees with every label -> po = 1, kappa = 1.
    docs = [
        (1, "the and is of to in that it was for", "en", "web", 40),
        (2, "the of and a to is in was he that", "en", "web", 40),
        (3, "der die und in den von zu das mit sich", "de", "web", 40),
        (4, "und der die das ist nicht von mit auf des", "de", "web", 40),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    r = _QS["q261_cohens_kappa"](spark, str(tmp_path)).collect()[0]
    assert r["po"] == 1.0
    assert r["kappa"] == pytest.approx(1.0)


def test_entropy_rate_zero_for_deterministic_chain(spark, tmp_path):
    # Every 'view' is always followed by 'click' and vice versa: the next
    # state is certain -> entropy rate 0, perplexity 1.
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 1,
         "view" if i % 2 == 0 else "click", 0.0, "{}")
        for i in range(20)
    ]
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    r = _QS["q263_markov_entropy_rate"](spark, str(tmp_path)).collect()[0]
    assert r["entropy_rate_nats"] == pytest.approx(0.0, abs=1e-9)
    assert r["perplexity"] == pytest.approx(1.0, abs=1e-9)
    assert r["n_states"] == 2


def test_ccf_peaks_at_planted_lag(spark, tmp_path):
    # Purchases mirror clicks exactly 2 days later: CCF must peak at +2
    # with correlation ~1.
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    pattern = [5, 1, 8, 2, 9, 1, 7, 3, 6, 2, 8, 1, 9, 4, 5, 2, 7, 1, 8, 3]
    for d, n in enumerate(pattern):
        for _ in range(n):  # n clicks on day d
            eid += 1
            rows.append((eid, base + datetime.timedelta(days=d), 1,
                         "click", 0.0, "{}"))
        for _ in range(n):  # n purchases on day d+2
            eid += 1
            rows.append((eid, base + datetime.timedelta(days=d + 2), 1,
                         "purchase", 0.0, "{}"))
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    out = {r["lag_days"]: r["ccf"]
           for r in _QS["q264_lead_lag_ccf"](spark, str(tmp_path)).collect()}
    best = max(out, key=lambda k: out[k])
    assert best == 2
    assert out[2] > 0.8


def test_late_shipment_existence_semantics(spark, tmp_path):
    # Order 1: two late lines -> counted ONCE. Order 2: on-time only ->
    # not counted. Order 3: outside the date window -> not counted.
    d = datetime.datetime
    orders = [
        (1, 1, "O", 10.0, d(1997, 3, 1), "1-URGENT"),
        (2, 1, "O", 10.0, d(1997, 4, 1), "1-URGENT"),
        (3, 1, "O", 10.0, d(1996, 1, 1), "5-LOW"),
    ]
    li = [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d(1997, 6, 1)),  # late
        (1, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", d(1997, 7, 1)),  # late
        (2, 3, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d(1997, 4, 10)),  # ok
        (3, 4, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d(1996, 9, 1)),  # late but
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {
        r["o_orderpriority"]: r["n_late_orders"]
        for r in _QS["q266_late_shipment_priority"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {"1-URGENT": 1}
